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

  /** [[bucketWrite]] that first clears any STALE table/location: a fresh
    * JVM starts with an empty in-memory catalog but the warehouse
    * directory persists, and `saveAsTable` refuses to create a managed
    * table over an orphaned location — so repeated Verify/Bench runs
    * need the drop-then-write form. Idempotent; safe when neither
    * exists. */
  def bucketRewrite(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    bucketWrite(df, table, key, buckets)
  }

  /** Bloom-prefiltered membership probe — the sketch that replaces a
    * corpus×corpus membership JOIN for cross-dataset dedup / contam
    * screening at 100 TB. The build side collapses to ONE binary row
    * (per-partition filters merge in a TypedImperativeAggregate), which
    * broadcasts; the probe side is then a pure map-side scan — zero
    * shuffle of either dataset (plan-pinned in ScaleOpsSuite).
    *
    * Contract: NO false negatives (every probe value present in the
    * build side has `might_match` = true — callers can drop
    * `might_match = false` rows outright); false POSITIVES at ≈ the
    * configured `fpp` (so a keep-decision needs an exact verify join
    * over the tiny surviving fraction; a drop-decision needs nothing).
    * NULL probe values yield NULL (unknown membership), matching SQL
    * three-valued logic.
    *
    * @param expectedItems build-side cardinality estimate; numBits is
    *                      sized from it as ⌈−n·ln(fpp)/ln²2⌉ (the
    *                      standard Bloom formula). */
  /** Bloom bit-count for `expectedItems` at `fpp` (the standard formula
    * ⌈−n·ln(fpp)/ln²2⌉), failing LOUDLY when BloomFilterAggregate would
    * silently CLAMP the sizing to the session caps — at corpus scale
    * that clamp quietly degrades the advertised fpp toward 1 and the
    * "fpp-sized survivor set" becomes the whole probe side. The caps
    * are read through SQLConf so the guard tracks the RUNTIME's actual
    * clamp values: session.conf.get with a hardcoded fallback only sees
    * user-set values, so a Spark upgrade changing the built-in defaults
    * would silently drift the guard away from BloomFilterAggregate's
    * real behavior (r10 advice). */
  private def sizedBloomBits(spark: SparkSession, expectedItems: Long,
                             fpp: Double): Long = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val sqlConf = spark.sessionState.conf
    val maxItems = sqlConf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits = sqlConf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sizing (items=$expectedItems, bits=$numBits) exceeds the " +
        s"session caps (maxNumItems=$maxItems, maxNumBits=$maxBits) and " +
        "would be silently clamped, degrading fpp; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits " +
        "or lower expectedItems/fpp")
    numBits
  }

  /** Materialize the build side's Bloom sketch as bytes — ONE job, the
    * ingest-tier form of [[bloomPrefilter]]: build the sketch once over
    * the existing corpus, then probe every incoming (micro-)batch
    * statelessly with the sketch as a LITERAL
    * ([[graft.streaming.StreamOps.bloomIngestProbe]]). None = empty
    * build side (the aggregate is NULL) — probes must then read
    * definite-false. Same sizing + clamp guard as the inline form. */
  /** Bound the sketch-build's partial-buffer shuffle. EVERY map
    * partition serializes a FULL-SIZE partial bloom buffer to the one
    * final reducer, so the build shuffle is partitions × numBits/8
    * bytes regardless of data — measured in ScaleRehearsal (r10): at
    * 6M items / fpp 0.01 / 32 partitions that is 32 × 7.2 MB
    * (~107 MB compressed), the screen's whole shuffle cost. On a
    * 10k-partition corpus scan it would be tens of GB into one task —
    * `buildPartitions` coalesces the build projection first (0 =
    * leave the scan's layout), trading build-scan parallelism for a
    * bounded partial count; size it ≈ the executor count. */
  private def buildSide(build: DataFrame, buildCol: String,
                        buildPartitions: Int): DataFrame = {
    val proj = build.select(col(buildCol))
    if (buildPartitions > 0) proj.coalesce(buildPartitions) else proj
  }

  def bloomSketch(build: DataFrame, buildCol: String,
                  expectedItems: Long, fpp: Double,
                  buildPartitions: Int = 0): Option[Array[Byte]] = {
    graft.functions.BloomFns.register(build.sparkSession)
    val numBits = sizedBloomBits(build.sparkSession, expectedItems, fpp)
    val row = buildSide(build, buildCol, buildPartitions)
      .agg(call_function("graft_bloom_agg",
        xxhash64(col(buildCol)), lit(expectedItems), lit(numBits)).as("__bf"))
      .head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  def bloomPrefilter(build: DataFrame, buildCol: String,
                     probe: DataFrame, probeCol: String,
                     expectedItems: Long, fpp: Double,
                     buildPartitions: Int = 0): DataFrame = {
    require(!probe.columns.contains("might_match"),
      "probe already has a might_match column (a previous screen's " +
        "verdict?) — withColumn would silently overwrite it; rename it " +
        "before re-screening")
    graft.functions.BloomFns.register(build.sparkSession)
    val numBits = sizedBloomBits(build.sparkSession, expectedItems, fpp)
    // might_contain requires its bloom input be a constant or a SCALAR
    // SUBQUERY (not a join column) — Dataset.scalar() (Spark 4) embeds
    // the one-row build aggregate as exactly that; the physical plan is
    // a broadcast-reused subquery, the probe stays a pure map
    val bf = buildSide(build, buildCol, buildPartitions)
      .agg(call_function("graft_bloom_agg",
        xxhash64(col(buildCol)), lit(expectedItems), lit(numBits)).as("__bf"))
    // Two NULL guards: xxhash64(NULL) is NOT null (it hashes the null
    // marker), so the documented NULL→NULL semantics for a NULL probe
    // VALUE need the when(); and an EMPTY build side makes the
    // aggregate itself NULL, which must read as a definite "not a
    // member" (false) for every real probe value — not a NULL that
    // silently fails BOTH branches of a might_match filter.
    probe.withColumn("might_match",
      when(col(probeCol).isNotNull,
        coalesce(
          call_function("graft_might_contain", bf.scalar(),
            xxhash64(col(probeCol))),
          lit(false))))
  }
}
