package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders
import java.nio.file.Files

/** SURVEY §2.1/§2.4/§2.8 unit-only capabilities: CSV/JSON source
  * round-trips, approx_count_distinct tolerance, a typed Aggregator
  * UDAF, and the registered-UDF surface. */
class CapabilitiesSuite extends SparkSuite {

  private lazy val sample = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_returnflag"), col("l_shipdate"))
    .limit(200)

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.withColumn("ship_s", col("l_shipdate").cast("string")).drop("l_shipdate")
      .collect().map(_.toSeq).toSet

  test("CSV source: schema-explicit write/read round-trip is lossless") {
    val dir = Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType),
      StructField("l_shipdate", TimestampNTZType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(canon(back) === canon(sample))
  }

  test("malformed-record handling (r14): PERMISSIVE quarantines, DROPMALFORMED filters, FAILFAST throws — the dirty-ingest contract") {
    // A 100 TB ingest WILL contain broken rows; the three documented
    // CSV modes are the contract a pipeline picks from. Plant one bad
    // row among two good ones and pin each mode's behavior.
    val dir = Files.createTempDirectory("graft_badcsv").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      "id,qty\n1,10\nnot_a_number,oops,extra\n3,30\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType),
      StructField("_corrupt_record", StringType)))
    // Spark disallows referencing ONLY _corrupt_record from a raw scan
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — read full rows, then split
    val rows = spark.read.option("header", "true")
      .option("mode", "PERMISSIVE").schema(schema).csv(dir).collect()
    val bad = rows.filter(!_.isNullAt(2)).map(_.getString(2))
    assert(bad.toSeq === Seq("not_a_number,oops,extra"),
      s"quarantined: ${bad.toSeq}")
    assert(rows.count(_.isNullAt(2)) === 2)
    val dropped = spark.read.option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(StructType(schema.dropRight(1))).csv(dir)
    assert(dropped.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .toSeq === Seq((1L, 10L), (3L, 30L)))
    val failfast = spark.read.option("header", "true")
      .option("mode", "FAILFAST")
      .schema(StructType(schema.dropRight(1))).csv(dir)
    intercept[org.apache.spark.SparkException](failfast.collect())
  }

  test("AQE partition coalescing (r14): a small shuffle's reducer count shrinks below the configured 32 — the many-small-files guard") {
    // With AQE on (the session default), a shuffle whose data is tiny
    // must NOT fan out to spark.sql.shuffle.partitions reducers — the
    // runtime coalesces post-shuffle partitions, which at warehouse
    // scale is the difference between 32 files and 32,000.
    val df = Tables.nation(spark, sf)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    val parts = df.rdd.getNumPartitions
    assert(parts < 32, s"AQE did not coalesce: $parts partitions")
  }

  test("JSON source: schema-explicit write/read round-trip is lossless") {
    val dir = Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType),
      StructField("l_shipdate", TimestampNTZType)))
    val back = spark.read.schema(schema).json(dir)
    assert(canon(back) === canon(sample))
  }

  test("ORC source: write/read round-trip is lossless (self-describing schema)") {
    val dir = Files.createTempDirectory("graft_orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.map(f => f.name -> f.dataType) ===
      sample.schema.map(f => f.name -> f.dataType))
    assert(canon(back) === canon(sample))
  }

  test("approx_count_distinct within 5% of exact (the first sketch anyone reaches for at 100 TB)") {
    val df = Tables.lineitem(spark, sf)
    val exact = df.select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    // HLL++ error is ~rsd (1σ); assert within 3×rsd, and that tightening
    // the rsd parameter actually tightens the estimate's bound.
    val approx5 = df.select(approx_count_distinct(col("l_orderkey"), 0.05)).collect()(0).getLong(0)
    assert(math.abs(approx5 - exact).toDouble / exact <= 0.15,
      s"approx=$approx5 exact=$exact")
    val approx1 = df.select(approx_count_distinct(col("l_orderkey"), 0.01)).collect()(0).getLong(0)
    assert(math.abs(approx1 - exact).toDouble / exact <= 0.03,
      s"approx=$approx1 exact=$exact")
  }

  test("mergeable HLL sketch bytes (r14): partial per-group sketches union to the global estimate — the rollup contract") {
    // approx_count_distinct returns only the NUMBER; warehouse rollups
    // need the SKETCH BYTES so daily partials merge into weekly/monthly
    // counts without rescanning. Spark 4 ships Apache DataSketches HLL:
    // hll_sketch_agg → binary, hll_union_agg → merged binary,
    // hll_sketch_estimate → count. Contract pinned here: the union of
    // per-group sketches estimates the SAME cardinality as one global
    // sketch (merge = union, associative), within HLL's error at
    // lgConfigK=12 (~1.6% rsd → assert 5%).
    val df = Tables.lineitem(spark, sf)
    val exact = df.select(countDistinct(col("l_orderkey"))).head.getLong(0)
    val partials = df.groupBy(col("l_returnflag"))
      .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
    val merged = partials
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      .head.getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged HLL est=$merged exact=$exact")
    val global = df
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 12))"))
      .head.getLong(0)
    // merge-vs-global: estimates of the same set from the same lgConfigK
    // — NOT bit-identical (DataSketches sparse→dense mode transitions
    // differ between one-shot and union builds; measured 1467 vs 1473 on
    // 1.5k keys), but both must sit inside the same error envelope
    assert(math.abs(global - exact).toDouble / exact <= 0.05,
      s"global HLL est=$global exact=$exact")
    assert(math.abs(merged - global).toDouble / exact <= 0.04,
      s"union-of-partials $merged strayed from single global sketch $global")
  }

  test("count-min sketch (r14): point-frequency estimates never underestimate and hit exact counts on a small domain") {
    // The frequency sibling of Misra-Gries: CMS answers "how often did
    // key x occur" from a fixed-size mergeable summary, one-sided error
    // (over-count only, bounded by eps·n at confidence 1−delta).
    val df = Tables.lineitem(spark, sf)
    val exact = df.groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val skBytes = df.agg(
      expr("count_min_sketch(l_returnflag, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head.getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val n = exact.values.sum
    exact.foreach { case (k, c) =>
      val est = sketch.estimateCount(k)
      assert(est >= c, s"CMS underestimated $k: $est < $c")
      assert(est <= c + math.ceil(0.001 * n).toLong,
        s"CMS overran eps*n bound for $k: $est vs $c + ${0.001 * n}")
    }
  }

  test("approx_percentile brackets the exact percentile (accuracy-bounded sketch)") {
    // The other sketch a 100 TB pipeline reaches for (quality-score
    // thresholds over a corpus): with accuracy a, the rank error is
    // bounded by n/a, so at accuracy 10000 over 60k rows the returned
    // value must sit within ±1.2% of the true rank 50 value.
    val vals = Tables.lineitem(spark, sf).select(col("l_extendedprice"))
    val approx = vals.select(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)")).head.getDouble(0)
    val n = vals.count()
    val below = vals.filter(col("l_extendedprice") <= approx).count().toDouble / n
    assert(below > 0.45 && below < 0.55,
      s"approx p50 landed at true rank $below")
  }

  test("typed Aggregator UDAF matches the built-in average") {
    val mean = new Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double): (Double, Long) = (b._1 + a, b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)): Double = r._1 / r._2
      def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder = Encoders.scalaDouble
    }
    spark.udf.register("graft_mean", udaf(mean))
    val out = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("graft_mean(l_quantity)").as("m"), avg(col("l_quantity")).as("a"))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(math.abs(r.getAs[Double]("m") - r.getAs[Double]("a")) < 1e-9))
  }

  test("partitioned parquet sink + partition-pruned scan (only matching directories read)") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter:\n$plan")
    // the scan's file listing is restricted to the one partition dir
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("event_type=click"), s"pruning failed:\n$scanned")
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(pruned.count() === expected && expected > 0)
  }

  test("registered UDF surface matches the equivalent built-in expression") {
    spark.udf.register("graft_tier", (p: Double) =>
      if (p > 300000) "high" else if (p > 100000) "mid" else "low")
    val out = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("graft_tier(o_totalprice)").as("via_udf"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("via_builtin"))
    assert(out.filter(col("via_udf") =!= col("via_builtin")).count() === 0)
    assert(out.select("via_udf").distinct().count() === 3)
  }

  test("q_agg_moments matches Spark's native skewness/kurtosis definitions (population g1 / excess g2)") {
    // the graded query computes the moments from exact decimal power
    // sums (§7.4 — native skewness()/kurtosis() merge partials in float
    // order); same definition, so the values must agree to float noise
    val exact = SparkEntry.queries("q_agg_moments")(spark, sf)
      .select(col("l_returnflag"), col("skewness"), col("kurtosis"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(exact.keySet === native.keySet)
    exact.foreach { case (k, (sk, ku)) =>
      assert(math.abs(sk - native(k)._1) < 1e-6, s"skew mismatch at $k")
      assert(math.abs(ku - native(k)._2) < 1e-6, s"kurt mismatch at $k")
    }
  }

  test("q_agg_regr2 matches a driver-side normal-equation solve (two-regressor OLS semantics)") {
    val out = SparkEntry.queries("q_agg_regr2")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"),
        col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .groupBy(_._1)
    rows.foreach { case (flag, rs) =>
      val n = rs.length.toDouble
      def s(f: ((String, Double, Double, Double)) => Double) = rs.map(f).sum
      val (s1, s2, sy) = (s(_._2), s(_._3), s(_._4))
      val c11 = n * s(t => t._2 * t._2) - s1 * s1
      val c22 = n * s(t => t._3 * t._3) - s2 * s2
      val c12 = n * s(t => t._2 * t._3) - s1 * s2
      val c1y = n * s(t => t._2 * t._4) - s1 * sy
      val c2y = n * s(t => t._3 * t._4) - s2 * sy
      val cyy = n * s(t => t._4 * t._4) - sy * sy
      val det = c11 * c22 - c12 * c12
      val b1 = (c22 * c1y - c12 * c2y) / det
      val b2 = (c11 * c2y - c12 * c1y) / det
      val b0 = (sy - b1 * s1 - b2 * s2) / n
      val r2 = (b1 * c1y + b2 * c2y) / cyy
      val (gb1, gb2, gb0, gr2) = out(flag)
      // driver-side float sums are order-noisy vs the exact decimal agg
      assert(math.abs(gb1 - b1) / math.abs(b1) < 1e-4, s"b_qty at $flag")
      assert(math.abs(gb2 - b2) / math.abs(b2) < 1e-4, s"b_disc at $flag")
      assert(math.abs(gb0 - b0) / math.abs(b0) < 1e-4, s"intercept at $flag")
      assert(math.abs(gr2 - r2) < 1e-6 && gr2 >= 0 && gr2 <= 1, s"r2 at $flag")
    }
  }

  test("anomalyOn: a planted 12x spike day flags, ordinary jitter days do not (robust med/MAD gate)") {
    import spark.implicits._
    // day k gets counts(k) events; med = 10, MAD = 1, spike z = 90
    val counts = Seq(8, 9, 10, 10, 11, 12, 9, 11, 100)
    val events = counts.zipWithIndex.flatMap { case (c, day) =>
      (0 until c).map(j => (19100L + day) * 86400000000L + j * 1000000L)
    }.toDF("us").select(expr("timestamp_micros(us)").as("ts"))
    val out = queries.EventOps.anomalyOn(events)
      .select("n", "med", "mad", "robust_z", "flagged").collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), Option(r.get(3)), r.getInt(4))))
      .toMap
    assert(out(100L) === ((10.0, 1.0, Some(90.0), 1)))
    assert(out(8L) === ((10.0, 1.0, Some(2.0), 0)))
    assert(out(10L) === ((10.0, 1.0, Some(0.0), 0)))
    assert(out.values.map(_._4).sum === 1) // exactly the spike flags
    spark.catalog.clearCache()
  }

  test("changepointOn: a planted 10→20 step lands the split on the last low day; single-day types drop out") {
    import spark.implicits._
    // type a: daily counts 10,10,10,20,20,20 → N=6, S_N=90;
    //   D_k = |6·S_k − k·90| peaks at k=3 (D=90) → cp = day 3,
    //   cusum 90/6=15, means 10 vs 20. type b: one active day → no split.
    val rows = Seq.tabulate(6)(d => ("a", d, if (d < 3) 10 else 20)) :+
      (("b", 0, 4))
    val events = rows.flatMap { case (t, day, c) =>
      (0 until c).map(j =>
        (t, (19200L + day) * 86400000000L + j * 1000000L))
    }.toDF("event_type", "us")
      .select(col("event_type"), expr("timestamp_micros(us)").as("ts"))
    val out = queries.EventOps.changepointOn(events).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("event_type") === "a")
    assert(r.getAs[Int]("k") === 3 && r.getAs[Long]("n_days") === 6L)
    assert(r.getAs[Long]("s_k") === 30L && r.getAs[Long]("s_n") === 90L)
    assert(r.getAs[Long]("dstat") === 90L)
    assert(r.getAs[Double]("cusum") === 15.0)
    assert(r.getAs[Double]("mean_before") === 10.0)
    assert(r.getAs[Double]("mean_after") === 20.0)
    assert(r.getAs[java.sql.Timestamp]("cp_day").toInstant
      .equals(java.time.Instant.ofEpochSecond((19200L + 2) * 86400L)))
  }

  test("q_agg_mahal: top-3 per group, d2 positive-descending, and the covariance term steers a planted pair") {
    val out = SparkEntry.queries("q_agg_mahal")(spark, sf).collect()
    val byFlag = out.groupBy(_.getString(0))
    assert(byFlag.keySet.size === 3)
    byFlag.foreach { case (flag, rows) =>
      assert(rows.length === 3, s"$flag: expected top-3")
      val d2s = rows.sortBy(_.getInt(1)).map(_.getDouble(6))
      assert(d2s.forall(_ > 0) && d2s.sameElements(d2s.sorted.reverse),
        s"$flag: d2 not descending: ${d2s.toSeq}")
    }
    // the covariance term is live: on a planted correlated cloud, the
    // against-the-grain point (unremarkable marginals) must outrank an
    // along-the-diagonal extreme — the case per-column z cannot see
    def d2Of(rows: Seq[(Double, Double)], pt: (Double, Double)): Double = {
      val n = rows.length.toDouble
      val (sx, sy) = (rows.map(_._1).sum, rows.map(_._2).sum)
      val c11 = n * rows.map(t => t._1 * t._1).sum - sx * sx
      val c22 = n * rows.map(t => t._2 * t._2).sum - sy * sy
      val c12 = n * rows.map(t => t._1 * t._2).sum - sx * sy
      val (dx, dy) = (pt._1 - sx / n, pt._2 - sy / n)
      (c22 * dx * dx - 2 * c12 * dx * dy + c11 * dy * dy) * n * n /
        (c11 * c22 - c12 * c12)
    }
    val diag = (1 to 20).map(i => (i.toDouble, i.toDouble))
    val cloud = diag ++ Seq((5.0, 16.0), (21.0, 21.0))
    assert(d2Of(cloud, (5.0, 16.0)) > d2Of(cloud, (21.0, 21.0)),
      "covariance term lost: anti-diagonal point should dominate")
  }

  test("q_llm_canondedup: case/punctuation/whitespace twins cluster; byte-dups counted inside the canon cluster") {
    // the graded corpus is already canonical (lowercase, single-space),
    // so canon clusters == exact clusters there; the planted variants
    // exercise the actual normalization — run the same builder exprs
    // via the graded query's canon chain on a planted frame
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "The  Quick Brown FOX"),   // case + double space
      (3L, "the quick, brown fox!"),  // punctuation
      (4L, "the quick brown fox"),    // byte-identical to 1
      (5L, "a different document"))
      .toDF("doc_id", "text")
    val canon = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val out = docs
      .select(col("doc_id"), md5(canon).as("ch"), md5(col("text")).as("eh"))
    val clusters = out.groupBy(col("ch"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("eh")).as("nef"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toSeq.sorted
    // one 4-doc canon cluster with 3 distinct byte forms + a singleton
    assert(clusters === Seq((1L, 1L), (4L, 3L)))
  }

  test("q_agg_gini equals a driver-side exact cents-domain Gini (trapezoid Lorenz replay)") {
    val out = SparkEntry.queries("q_agg_gini")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val groups = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice")).collect()
      .map(r => (r.getString(0),
        BigInt(new java.math.BigDecimal(r.getDouble(1))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).toBigIntegerExact)))
      .groupBy(_._1)
    groups.foreach { case (st, rows) =>
      val vals = rows.map(_._2).sorted
      var s = BigInt(0); var x = BigInt(0)
      vals.foreach { c => val prev = s; s += c; x += prev + s }
      val g = BigDecimal(1.0
        - x.toDouble / (BigInt(vals.length) * s).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(st) - g) < 1e-9, s"gini mismatch at $st")
      assert(out(st) > 0 && out(st) < 1)
    }
  }

  test("abtestOn: a planted one-sided conversion effect is significant; arms follow the md5 split exactly") {
    import spark.implicits._
    // assign variants with the SAME hash the engine uses, then give
    // every variant-0 user a purchase and no variant-1 user one
    val ids = (1L to 40L)
    val vmap = spark.range(1, 41).select(col("id"),
        (graft.Det.md5h32(col("id").cast("string")) % 2).as("v"))
      .as[(Long, Long)].collect().toMap
    assert(vmap.values.toSet === Set(0L, 1L)) // both arms populated
    val events = ids.flatMap { u =>
      val base = Seq((u, "view"))
      if (vmap(u) == 0L) base :+ ((u, "purchase")) else base
    }.zipWithIndex.map { case ((u, t), i) =>
      (u, t, 1700000000000000L + i * 1000000L)
    }.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"))
    val r = queries.EventOps.abtestOn(events).collect().head
    val nA = r.getAs[Long]("n_a"); val nB = r.getAs[Long]("n_b")
    assert(nA === vmap.values.count(_ == 0L) && nA + nB === 40L)
    assert(r.getAs[Double]("rate_a") === 1.0 &&
      r.getAs[Double]("rate_b") === 0.0)
    assert(r.getAs[Int]("significant") === 1)
    assert(r.getAs[Double]("z") > 1.96)
  }

  test("abtestTOn: a planted mean shift is significant with the right sign; identical arms are not") {
    import spark.implicits._
    val vmap = spark.range(1, 41).select(col("id"),
        (graft.Det.md5h32(col("id").cast("string")) % 2).as("v"))
      .as[(Long, Long)].collect().toMap
    // two events per user; arm 0 pays 10.00 per event with ±1 jitter,
    // arm 1 pays 2.00 — a large standardized shift
    def frame(shift: Boolean) = (1L to 40L).flatMap { u =>
      val base = if (!shift || vmap(u) == 0L) 10.0 else 2.0
      Seq((u, base + (u % 3) - 1.0), (u, base + ((u + 1) % 3) - 1.0))
    }.zipWithIndex.map { case ((u, v), i) =>
      (u, "view", 1700000000000000L + i * 1000000L, v)
    }.toDF("user_id", "event_type", "us", "value")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"), col("value"))
    val shifted = queries.EventOps.abtestTOn(frame(shift = true))
      .collect().head
    assert(shifted.getAs[Int]("significant") === 1)
    assert(shifted.getAs[Double]("t") > 1.96) // arm 0 mean is higher
    assert(shifted.getAs[Double]("mean_cents_a")
      > shifted.getAs[Double]("mean_cents_b"))
    val flat = queries.EventOps.abtestTOn(frame(shift = false))
      .collect().head
    assert(flat.getAs[Int]("significant") === 0)
  }

  test("rfmOn: quartile scores land exactly on a planted 8-user pyramid (strict-compare cut semantics)") {
    import spark.implicits._
    // user i (1..8): i events, all on day 19000+i, value 10 each →
    // freq = i, monetary = 10i, recency = 8 − i days; 8 distinct values
    // per metric → disc quartile cuts at the 2nd/4th/6th order stats
    val events = (1 to 8).flatMap(i => (0 until i).map(j =>
      (i.toLong, (19000L + i) * 86400000000L + j * 1000000L, 10.0)))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"),
        col("value"))
    val out = queries.EventOps.rfmOn(events)
      .select("user_id", "r_score", "f_score", "m_score", "rfm")
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val fm = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 2, 5 -> 3, 6 -> 3, 7 -> 4, 8 -> 4)
    val rs = Map(0 -> 4, 1 -> 3, 2 -> 3, 3 -> 2, 4 -> 2, 5 -> 1, 6 -> 1, 7 -> 1)
    (1 to 8).foreach { i =>
      val (r, f, m, seg) = out(i.toLong)
      assert(f === fm(i) && m === fm(i), s"f/m score off for user $i")
      assert(r === rs(8 - i), s"r score off for user $i")
      assert(seg === r * 100 + f * 10 + m)
    }
    spark.catalog.clearCache()
  }

  test("q_agg_boxplot: quartiles ordered inside [min,max]; outlier counts equal a driver-side fence replay") {
    val rows = SparkEntry.queries("q_agg_boxplot")(spark, sf).collect()
    assert(rows.length === 3)
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val (st, q1, med, q3) = (r.getString(0), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      val (mn, mx) = (r.getDouble(2), r.getDouble(6))
      assert(mn <= q1 && q1 <= med && med <= q3 && q3 <= mx, s"$st order")
      // fences from the unrounded quartiles differ from these rounded
      // ones by < 1e-6 while prices are 2dp — the replay is exact
      val (fLo, fHi) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
      assert(r.getLong(7) === raw(st).count(_ < fLo - 1e-4).toLong ||
        r.getLong(7) === raw(st).count(_ < fLo + 1e-4).toLong, s"$st lo")
      assert(r.getLong(8) === raw(st).count(_ > fHi - 1e-4).toLong ||
        r.getLong(8) === raw(st).count(_ > fHi + 1e-4).toLong, s"$st hi")
    }
  }

  test("q_event_markov: per-prev probabilities are n/rowsum and sum to 1") {
    val rows = SparkEntry.queries("q_event_markov")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (prev, g) =>
      val tot = g.map(_._2).sum
      g.foreach { case (_, n, p) =>
        assert(p === n.toDouble / tot, s"$prev p mismatch") }
      assert(math.abs(g.map(_._3).sum - 1.0) < 1e-12, s"$prev row sum")
    }
    spark.catalog.clearCache()
  }

  test("q_event_decay: hot_cents equals a driver-side shift replay (cent quantization + arithmetic halving)") {
    val raw = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val refDd = raw.map(_._2).max
    val expected = raw.groupBy(_._1).view.mapValues { g =>
      g.map { case (_, dd, v) =>
        val cents = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact
        cents >> math.min(refDd - dd, 62L).toInt
      }.sum
    }.toMap
    val out = SparkEntry.queries("q_event_decay")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === expected && out.nonEmpty)
  }

  test("newretOn: first-seen day counts as new, later days as returning, same-day repeats dedupe") {
    import spark.implicits._
    // u1 active days {0,1}; u2 {1}; u3 {0,2} with two same-day events
    val events = Seq((1L, 0L, 0L), (1L, 1L, 1L), (2L, 1L, 2L),
      (3L, 0L, 3L), (3L, 0L, 4L), (3L, 2L, 5L))
      .toDF("user_id", "day", "j")
      .select(col("user_id"),
        expr("timestamp_micros(day * 86400000000 + j)").as("ts"))
    val out = queries.EventOps.newretOn(events)
      .select(expr("unix_micros(day) div 86400000000"),
        col("dau"), col("new_users"), col("returning_users"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(0L -> ((2L, 2L, 0L)), 1L -> ((2L, 1L, 1L)),
      2L -> ((1L, 0L, 1L))))
    spark.catalog.clearCache()
  }

  test("attribOn: purchases credit the last PRIOR non-purchase touch; first-event and simultaneous-later purchases go direct") {
    import spark.implicits._
    // u1 view→click→purchase (credit click); u2 purchase first (direct)
    // then view→purchase (view); u3 view→purchase→purchase (view twice:
    // the carry skips intervening purchases); u4 purchase at the same ts
    // as a LATER-id click — the strictly-prior frame must not see it
    val events = Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "purchase", 30L, 3L),
      (2L, "purchase", 10L, 4L), (2L, "view", 20L, 5L), (2L, "purchase", 30L, 6L),
      (3L, "view", 10L, 7L), (3L, "purchase", 20L, 8L), (3L, "purchase", 30L, 9L),
      (4L, "purchase", 10L, 10L), (4L, "click", 10L, 11L))
      .toDF("user_id", "event_type", "us", "event_id")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"), col("event_id"))
    val out = queries.EventOps.attribOn(events)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map("click" -> ((1L, 1.0 / 6)),
      "direct" -> ((2L, 2.0 / 6)), "view" -> ((3L, 3.0 / 6))))
  }

  test("linkpredOn: two rare shared parts outrank three commodity hubs (the RA hub discount), sub-threshold pairs drop") {
    import spark.implicits._
    // suppliers 1,2 share rare parts 101,102 (deg 2 → wt 500000 each);
    // suppliers 3,4 share hub parts 201..203, each padded to deg 10 by
    // disjoint filler suppliers (wt 100000) — more common parts, less RA
    val rare = Seq(101L, 102L).flatMap(p => Seq((p, 1L), (p, 2L)))
    val hubs = Seq(201L, 202L, 203L).zipWithIndex.flatMap { case (p, i) =>
      Seq((p, 3L), (p, 4L)) ++ (0 until 8).map(j => (p, 100L + i * 8 + j))
    }
    val out = queries.GraphOps.linkpredOn(
      (rare ++ hubs).toDF("p", "sp"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L, 2L, 1000000L), (3L, 4L, 3L, 300000L)))
    spark.catalog.clearCache()
  }

  test("assortOn: a star is exactly -1, a degree-regular triangle NULL-guards, power sums hand-check") {
    import spark.implicits._
    // star K1,3 both orientations: m=6, sx=sy=12, sxx=syy=30, sxy=18
    // → vx=vy=36, num=6·18−144=−36 → assort = −36/36 = −1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val s = queries.GraphOps.assortOn(star).collect().head
    assert(s.getAs[Long]("m_edges") === 6L &&
      s.getAs[Long]("n_nodes") === 4L)
    assert(s.getAs[Double]("mean_deg") === 2.0)
    assert(s.getAs[Double]("assort") === -1.0)
    spark.catalog.clearCache()
    // triangle both orientations: every degree 2 → zero variance → NULL
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 1L), (3L, 2L), (1L, 3L)).toDF("src", "dst")
    val t = queries.GraphOps.assortOn(tri).collect().head
    assert(t.getAs[Long]("m_edges") === 6L && t.isNullAt(t.fieldIndex("assort")))
    spark.catalog.clearCache()
  }

  test("SparkEntry contract: query and oracle key sets are identical (every graded query is oracle-checked)") {
    // the driver's correctness gate compares each queries(name) result
    // against oracleSql(name) in DuckDB — a key present on one side
    // only would silently weaken the gate to a rows-only check
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
    assert(SparkEntry.queries.size >= 94)
  }

  test("HeavyHitters (Misra-Gries) guarantee holds under every partitioning: frequent items surface within the floor") {
    // the sketch's value is the CONTRACT, not the exact estimates: any
    // item with true count > n/(k+1) appears, with estimate in
    // [true - floor, true], on ANY layout — verified here across three
    // very different partitionings of the same word stream against the
    // exact counts.
    import graft.operators.HeavyHitters
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("item"))
    val exact = words.groupBy(col("item")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 50
    Seq(words.repartition(1), words.repartition(7), words.repartition(32))
      .foreach { layout =>
        val sk = HeavyHitters.sketch(layout, k).collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        spark.catalog.clearCache()
        val floor = sk.headOption.map(_._2._2).getOrElse(0L)
        assert(floor <= n / (k + 1))
        exact.foreach { case (item, true_) =>
          if (true_ > n / (k + 1)) {
            val (est, fl) = sk.getOrElse(item,
              fail(s"frequent item '$item' (count $true_ > ${n / (k + 1)}) missing"))
            assert(est <= true_ && est >= true_ - fl,
              s"'$item' est=$est outside [${true_ - fl}, $true_]")
          }
        }
        // every reported estimate is a lower bound — never an overcount
        sk.foreach { case (item, (est, _)) =>
          assert(est <= exact.getOrElse(item, 0L), s"'$item' overcounted")
        }
      }
  }

  test("sketch-prescreened exact top-K ≡ plain top-K on a skewed vocab ≫ k corpus, any partitioning (q_text_hhwords contract)") {
    // the graded corpora have ~30 token types, where the sketch holds
    // everything; THIS corpus is the real case — 2000 rare singletons
    // drowning 20 hot words, vocabulary 40× the counter budget — and
    // the composition must still equal the exact top-K because the
    // K-th true count clears the floor n/(k+1) (the MG guarantee the
    // prescreen's exactness rides on).
    import graft.operators.HeavyHitters
    import spark.implicits._
    val hot = (0 until 20).flatMap(i => Seq.fill(500 - 10 * i)(s"hot_$i"))
    val rare = (0 until 2000).map(i => s"rare_$i")
    val all = new scala.util.Random(42).shuffle((hot ++ rare).toVector)
    val k = 50; val topK = 10
    val n = all.size.toLong
    val exactTop = all.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(topK)
    // guard condition of the composition: K-th true count > floor
    assert(exactTop.last._2 > n / (k + 1),
      "test corpus must satisfy the coverage condition")
    Seq(1, 7, 32).foreach { parts =>
      val words = all.toDF("word").repartition(parts)
      val cand = HeavyHitters.candidates(words, k)
        .select(col("item").as("word"))
      val got = words.join(broadcast(cand), Seq("word"), "left_semi")
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(topK)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      spark.catalog.clearCache()
      assert(got === exactTop, s"parts=$parts")
    }
  }
}
