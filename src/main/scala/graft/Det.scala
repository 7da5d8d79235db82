package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism contract helpers (SURVEY.md §7.4).
  *
  * Every oracle-checked aggregate must produce bit-identical values in
  * Spark and DuckDB. The hazard is floating-point *reduction order*:
  * `SUM(double)` depends on partition/merge order, which differs between
  * engines (and between runs on a real cluster). The fix: cast each value
  * to DECIMAL(18,4) (exact, deterministic per-row rounding), sum in the
  * exact decimal domain, round, and cast the final scalar to DOUBLE once
  * (decimal→double is a single correctly-rounded IEEE division in both
  * engines). Per-row double arithmetic (e.g. `price * (1 - disc)`) is fine
  * — IEEE ops are deterministic — only reductions need the decimal detour.
  *
  * This also holds on a 1000-executor cluster: decimal sums are
  * associative/commutative, so Spark's partial→final aggregation (and AQE
  * re-planning) cannot change the result.
  */
object Det {
  val Dec: DecimalType = DecimalType(18, 4)

  /** Deterministic SUM: decimal-cast, exact sum, round(4), cast double. */
  def dsum(c: Column): Column = round(sum(c.cast(Dec)), 4).cast(DoubleType)

  /** Deterministic AVG = dsum / count. The division is double/int64 IEEE
    * division of two already-deterministic operands — no post-rounding
    * (rounding a double re-introduces engine-specific rounding paths). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL twins (DuckDB 1.0.0 dialect) — keep in lockstep with the above. */
  def sqlSum(x: String): String =
    s"CAST(ROUND(SUM(CAST(($x) AS DECIMAL(18,4))), 4) AS DOUBLE)"
  def sqlAvg(x: String): String = s"${sqlSum(x)} / COUNT(*)"

  /** Deterministic SUM of `base * factor` where `factor` is a double with
    * more than 4 true decimal digits (e.g. (1-disc)*(1+tax), 4dp): casting
    * the *product* to DECIMAL(18,4) would round exactly at a .00005
    * boundary, where Spark's and DuckDB's double→decimal casts disagree.
    * Instead cast base (≤2dp) at 4dp and factor (≤4dp) at 8dp — both far
    * from their cast boundaries — and multiply exactly in decimal. */
  def dsumProd(base: Column, factor: Column): Column =
    round(sum(base.cast(Dec) * factor.cast(DecimalType(14, 8))), 4)
      .cast(DoubleType)

  def sqlSumProd(base: String, factor: String): String =
    s"""CAST(ROUND(SUM(CAST($base AS DECIMAL(18,4))
       | * CAST(($factor) AS DECIMAL(14,8))), 4) AS DOUBLE)""".stripMargin

  /** md5-derived 32-bit hash — the engine-portable deterministic hash
    * used for split buckets, per-domain sampling ranks, etc. (never
    * `rand()`, never engine-specific hashes like xxhash64). Identically
    * computable in DuckDB via [[sqlMd5h32]]. */
  def md5h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB twin of [[md5h32]]. */
  def sqlMd5h32(x: String): String =
    s"('0x' || substr(md5($x), 1, 8))::BIGINT"

  /** JVM twin of [[md5h32]] for Scala-side code (streaming state folds
    * hash inside the executor): first 8 hex chars of md5(utf8) as a
    * long — bit-identical to the Column and SQL forms (pinned by the
    * TriangleKmvSuite mirror law). */
  def jvmMd5h32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Oracle table reference. The driver is expected to bind bare table
    * names as DuckDB views over the sf parquet dir (SURVEY §2 preamble);
    * one edit here switches every oracle to read_parquet(...) if round-1
    * t2 reports missing tables. */
  def tbl(name: String): String = name
}
