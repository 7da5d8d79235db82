package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale note: every loader is a plain vectorized parquet scan. Catalyst
  * pushes filters and projections down to the scan (visible as
  * `PushedFilters` / `ReadSchema` in `.explain("formatted")`), which is the
  * property that keeps these queries viable at 100 TB: a cluster reads only
  * the row groups and columns a query touches. Nothing here caches or
  * collects; all composition stays in the logical plan.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped in two physical generations of the testdata:
    * parquet TIMESTAMP(NANOS) (read as a nanos long via the session-level
    * `spark.sql.legacy.parquet.nanosAsLong` flag, then truncated to µs) and,
    * since the 2026-08-13 regen, native timestamp[us] without UTC adjustment
    * (read as TIMESTAMP_NTZ). The loader branches on the dtype actually
    * loaded so both generations normalize to the same logical column:
    * `ts: TimestampType` at µs precision. The session TZ is pinned UTC
    * ([[LocalSession]]), so the NTZ→Timestamp cast is value-identical, and
    * DuckDB reads the µs-native file directly — both engines see identical
    * µs timestamps either way (SURVEY §1.2). */
  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Defensive for foreign sessions (the driver passes its own session,
    // which may not have been built via LocalSession): idempotent no-op
    // when already set at session build, required only for the legacy
    // nanos read; inert when the file stores a real timestamp type.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Same defensive treatment for the timezone (r11 advice): the
    // NTZ→Timestamp cast below is value-identical ONLY under UTC, and
    // every date_trunc/unix_micros downstream assumes it — a non-UTC
    // foreign session would silently shift every event timestamp.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unexpected dtype $other; Tables.eventsRaw knows " +
            "LongType (legacy nanos), TimestampNTZType (µs-native), TimestampType")
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
