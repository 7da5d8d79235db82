package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once parquet sink for `foreachBatch` (SURVEY §1.1: the
  * reference commits offsets WITH state in one transaction; the Spark
  * translation is idempotent per-epoch output + checkpointed offsets).
  *
  * Structured Streaming guarantees at-least-once `foreachBatch`
  * invocation with a MONOTONIC, checkpoint-stable batchId. Writing each
  * batch as a FULL overwrite of its own `batch_id=<id>` directory makes
  * replays overwrite themselves instead of duplicating — replay-safe
  * end-to-end exactly-once, the same recipe a production job uses for
  * object-store sinks.
  *
  * Scale note: one directory per epoch, files within sized by upstream
  * partitioning; no global coordination, no driver-side state beyond
  * the checkpoint Spark already keeps.
  */
class IdempotentParquetSink(dir: String) extends Serializable {

  /** The foreachBatch body: (df, batchId) => idempotent write. */
  def write(batch: DataFrame, batchId: Long): Unit =
    batch.write
      .mode("overwrite")
      .parquet(s"$dir/batch_id=$batchId")

  /** Everything committed so far (partition-discovers batch_id dirs). */
  def readAll(spark: SparkSession): DataFrame =
    spark.read
      .option("basePath", dir)
      .parquet(s"$dir/batch_id=*")
}

/** AT-MOST-ONCE parquet sink for `foreachBatch` — the third leg of the
  * reference's delivery-guarantee triple (SURVEY §1.1: at-most-once /
  * at-least-once / exactly-once side by side; this repo's other two
  * legs are raw `foreachBatch` and [[IdempotentParquetSink]]).
  *
  * The classical construction: COMMIT THE OFFSET BEFORE PROCESSING. A
  * zero-byte epoch marker is created first; Structured Streaming's
  * at-least-once replay then finds the marker and SKIPS the epoch, so a
  * batch that crashed mid-write is dropped — never retried, never
  * duplicated. The trade-off this makes visible (and the test pins): a
  * deterministic poison row loses its whole epoch here, where the
  * at-least-once sink would crash-loop on it and the exactly-once sink
  * would replay it safely after the poison is fixed.
  *
  * Scale note: one marker + one directory per epoch, both driver-side
  * metadata ops; data files are written by executors exactly as in the
  * idempotent sink. No coordination beyond the filesystem. */
class AtMostOnceParquetSink(dir: String) extends Serializable {
  import org.apache.hadoop.fs.Path

  private def marker(batchId: Long) = new Path(s"$dir/_committed_$batchId")

  /** The foreachBatch body: marker first, data second. */
  def write(batch: DataFrame, batchId: Long): Unit = {
    val m = marker(batchId)
    val fs = m.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(m)) return // replay of a committed epoch: DROP it
    fs.create(m, false).close() // commit BEFORE processing
    batch.write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")
  }

  /** Rows that actually landed (epochs dropped by a failure are absent). */
  def readAll(spark: SparkSession): DataFrame =
    spark.read
      .option("basePath", dir)
      .parquet(s"$dir/batch_id=*")
}
