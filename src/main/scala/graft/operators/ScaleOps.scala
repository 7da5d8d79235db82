package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale join utilities: the two standard answers to the two
  * standard ways a 100 TB join dies.
  *
  *  - SKEW (one hot key owns a partition): [[saltedInnerJoin]] splits
  *    each left key across `salts` sub-partitions deterministically and
  *    replicates the right side `salts`×, so a bot user with 10⁸ rows
  *    becomes `salts` tasks instead of one straggler. Exact — result
  *    equality with the plain join is unit-tested. (Spark's AQE skew
  *    handling covers sort-merge joins automatically; salting is the
  *    explicit form for when AQE can't split — e.g. aggregations over
  *    the join, or hash joins.)
  *
  *  - SHUFFLE (both sides exchange on every join): [[bucketWrite]] +
  *    [[bucketedJoin]] persist both sides bucketed by the join key, so
  *    repeated joins are ZERO-exchange (the plan contains no shuffle —
  *    unit-asserted). At 100 TB this converts the dominant recurring
  *    cost of a star-schema pipeline into a one-time write.
  */
object ScaleOps {

  /** Exact inner equi-join with deterministic left-side salting.
    * No `rand()` — the salt is a hash of the whole left row (§7.4: no
    * nondeterministic functions), so replays and retries partition
    * identically. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  /** Persist `df` bucketed+sorted by `key` into the session catalog —
    * the co-location contract both sides of [[bucketedJoin]] rely on. */
  def bucketWrite(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key. With both
    * sides bucketed `buckets`-way on `key`, Catalyst plans a sort-merge
    * join with NO exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
