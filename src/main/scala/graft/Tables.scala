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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp (PARQUET_TYPE_ILLEGAL). With the session-level
    * `spark.sql.legacy.parquet.nanosAsLong` flag (set at session build in
    * [[LocalSession]]) it reads as a nanos long; truncate to µs — exactly
    * what DuckDB does on read (SURVEY §1.2), so both engines see identical
    * µs timestamps. */
  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // Defensive for foreign sessions (the driver passes its own session,
    // which may not have been built via LocalSession): idempotent no-op
    // when already set at session build, required for the nanos read.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
