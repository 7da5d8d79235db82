package graft

import org.apache.spark.sql.SparkSession

/** One place to build the local session all mains + tests share, so every
  * session-level knob (timezone, shuffle width, the nanos-parquet legacy
  * flag) is set once at build time instead of mutated mid-query.
  *
  * Scale note: `spark.sql.shuffle.partitions` defaults to the local core
  * count here; on a real cluster this is the one line a deployment changes
  * (or leaves to AQE coalescing — AQE stays enabled, Spark 4 default).
  */
object LocalSession {
  def build(cores: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); Spark 4 only reads it via
      // this legacy flag (as a nanos long — Tables.events truncates to µs,
      // matching DuckDB's read; SURVEY §1.2). Session-level, set at build.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions { ext =>
        graft.functions.DotF64.install(ext)
        graft.functions.JaccardStr.install(ext)
        graft.functions.OverlapCount.install(ext)
        graft.functions.SimHash16.install(ext)
        graft.functions.CharHist64.install(ext)
        graft.functions.HistL1.install(ext)
      }
      .getOrCreate()
    // getOrCreate can return a pre-existing session the extensions never
    // saw — the post-hoc registrations are idempotent.
    graft.functions.DotF64.register(spark)
    graft.functions.JaccardStr.register(spark)
    graft.functions.OverlapCount.register(spark)
    graft.functions.SimHash16.register(spark)
    graft.functions.CharHist64.register(spark)
    graft.functions.HistL1.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec logs "No Partition Defined" at WARN for every
    // §7.4.12-sanctioned BOUNDED unpartitioned window (calendar/cell-
    // sized frames, provably aggregate-scale — the scaladocs at each
    // site carry the bound). The repeats eat the 2000-char tail budget
    // the one-line bench JSON must survive in (r15 verdict item 4), so
    // that single logger is raised to ERROR; all other WARNs stay.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    spark
  }
}
