package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.Summary

/** The mergeable quantile sketch's contract (SURVEY §2.4 sketch family,
  * r13): deterministic rank-error bound H·n/k for any update/merge
  * history, merge associativity of the guarantee, and the Spark-side
  * coreset plan shape. Unit-only beside the oracle-graded exact
  * Percentiles engine — the approx_count_distinct / Misra-Gries
  * precedent (estimates are layout-dependent inside the bound; the
  * GUARANTEE is what's pinned). */
class QuantileSketchSuite extends SparkSuite {
  import spark.implicits._

  private def scCheck(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  /** true ranks of v in xs: (# strictly below, # at-or-below). */
  private def ranks(xs: Seq[Double], v: Double): (Long, Long) =
    (xs.count(_ < v).toLong, xs.count(_ <= v).toLong)

  /** The bound assertion: the estimate's true-rank interval must cover
    * the target rank ceil(q·n) to within errBound. */
  private def assertWithinBound(xs: Seq[Double], s: Summary, q: Double): Unit = {
    val est = s.quantile(q).get
    val target = math.max(1L, math.ceil(q * xs.size).toLong)
    val (below, atOrBelow) = ranks(xs, est)
    val err = s.errBound
    assert(below < target + err && atOrBelow >= target - err,
      s"q=$q est=$est target=$target ranks=($below,$atOrBelow) bound=$err n=${xs.size}")
  }

  test("error bound H*n/k holds vs the exact definition on the orders table, k=200") {
    val xs = Tables.orders(spark, sf).select(col("o_totalprice"))
      .as[Double].collect().toSeq
    val s = new Summary(200)
    xs.foreach(s.update)
    assert(s.n === xs.size.toLong)
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach(q =>
      assertWithinBound(xs, s, q))
    // the bound is a real screen at this k: a few percent of n, not n
    assert(s.errBound <= 0.05 * xs.size,
      s"bound ${s.errBound} is uselessly loose for n=${xs.size}, k=200")
  }

  test("ScalaCheck law: bound holds for any input and any merge split") {
    val input: Gen[List[Double]] =
      Gen.chooseNum(1, 4000).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)))
    scCheck("kll-bound")(Prop.forAll(input, Gen.chooseNum(8, 64),
      Gen.chooseNum(1, 7)) { (xs0, k2, parts) =>
      val xs = xs0.map(x => (x: Double))
      val k = k2 * 2 // even
      // random split into `parts` chunks, one Summary each, merged —
      // the distributed fold under an arbitrary partitioning
      val chunks = xs.grouped(math.max(1, xs.size / parts)).toSeq
      val merged = new Summary(k)
      chunks.foreach { c =>
        val s = new Summary(k)
        c.foreach(s.update)
        merged.mergeInPlace(s)
      }
      merged.n == xs.size.toLong && Seq(0.1, 0.5, 0.9).forall { q =>
        val est = merged.quantile(q).get
        val target = math.max(1L, math.ceil(q * xs.size).toLong)
        val (below, atOrBelow) = ranks(xs, est)
        below < target + merged.errBound &&
          atOrBelow >= target - merged.errBound
      }
    })
  }

  test("ScalaCheck law: snapshot/restore round-trip is BIT-EXACT — fold(A++B) == fold(B) . restore(fold(A))") {
    val input: Gen[(List[Double], List[Double])] = for {
      a <- Gen.listOf(Gen.chooseNum(-1e6, 1e6))
      b <- Gen.listOf(Gen.chooseNum(-1e6, 1e6))
    } yield (a, b)
    scCheck("kll-roundtrip")(Prop.forAll(input, Gen.chooseNum(3, 32)) {
      case ((a, b), k2) =>
        val k = k2 * 2
        val whole = new Summary(k)
        (a ++ b).foreach(whole.update)
        val first = new Summary(k)
        a.foreach(first.update)
        val (n, par, lv) = first.snapshot
        val resumed = QuantileSketch.restore(k, n, par, lv)
        b.foreach(resumed.update)
        val (n1, p1, l1) = whole.snapshot
        val (n2, p2, l2) = resumed.snapshot
        // identical STRUCTURE, not merely identical estimates — the
        // state-store round-trip changes nothing about the future
        n1 == n2 && p1 == p2 && l1 == l2 &&
          Seq(0.1, 0.5, 0.9).forall(q => whole.quantile(q) == resumed.quantile(q))
    })
  }

  test("exactness below capacity: fewer than k items = exact lower quantile") {
    val s = new Summary(64)
    val xs = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    xs.foreach(s.update)
    assert(s.maxLevel === 0 && s.errBound === 0.0)
    assert(s.quantile(0.0).contains(1.0))
    assert(s.quantile(0.5).contains(5.0)) // rank ceil(2.5)=3 of sorted
    assert(s.quantile(1.0).contains(9.0))
  }

  test("NaN skipped, empty sketch undefined, odd/low k rejected, k-mismatch merge rejected") {
    val s = new Summary(8)
    s.update(Double.NaN)
    assert(s.n === 0L && s.quantile(0.5).isEmpty)
    intercept[IllegalArgumentException](new Summary(7))
    intercept[IllegalArgumentException](new Summary(2))
    intercept[IllegalArgumentException](s.mergeInPlace(new Summary(16)))
  }

  test("Spark quantiles(): n exact, err_bound = H*n/k, estimates within bound; coreset stays summary-sized") {
    val df = Tables.orders(spark, sf).select(col("o_totalprice"))
    val xs = df.as[Double].collect().toSeq
    val k = 128
    val out = QuantileSketch.quantiles(df, k, Seq(0.1, 0.5, 0.9)).collect()
    assert(out.length === 3)
    val n = out(0).getAs[Long]("n")
    assert(n === xs.size.toLong)
    val bound = out(0).getAs[Double]("err_bound")
    // the union-of-partition-coresets bound: H_max*n/k (H from the
    // shipped weights). Recompute H independently from the coreset.
    val maxW = QuantileSketch.coreset(df, k).agg(max(col("w"))).head.getLong(0)
    val h = java.lang.Long.numberOfTrailingZeros(maxW)
    assert(bound === h.toDouble * n / k, s"err_bound=$bound h=$h n=$n")
    out.foreach { r =>
      val q = r.getAs[Double]("q")
      val est = r.getAs[Double]("v_est")
      val target = math.max(1L, math.ceil(q * n).toLong)
      val (below, atOrBelow) = ranks(xs, est)
      assert(below < target + bound && atOrBelow >= target - bound,
        s"q=$q est=$est target=$target ranks=($below,$atOrBelow) bound=$bound")
    }
    // the shuffle-side promise: coreset rows ≤ k*(H+1)*partitions
    val parts = df.rdd.getNumPartitions
    val csRows = QuantileSketch.coreset(df, k).count()
    assert(csRows <= k.toLong * (h + 1) * parts,
      s"coreset $csRows rows exceeds k(H+1)P = ${k.toLong * (h + 1) * parts}")
  }

  test("grouped quantilesBy: per-group bound holds vs the exact definition; null group is a key; empty groups absent") {
    val df = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice"))
    val byG = df.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSeq)
    val out = QuantileSketch.quantilesBy(df, Seq("o_orderstatus"),
      "o_totalprice", 128, Seq(0.25, 0.5, 0.9)).collect()
    assert(out.map(_.getString(0)).distinct.sorted.toSeq ===
      byG.keys.toSeq.sorted)
    out.foreach { r =>
      val xs = byG(r.getString(0))
      val q = r.getAs[Double]("q")
      val est = r.getAs[Double]("v_est")
      val n = r.getAs[Long]("n")
      val bound = r.getAs[Double]("err_bound")
      assert(n === xs.size.toLong, s"group ${r.getString(0)} n mismatch")
      val target = math.max(1L, math.ceil(q * n).toLong)
      val (below, atOrBelow) = ranks(xs, est)
      assert(below < target + bound && atOrBelow >= target - bound,
        s"group ${r.getString(0)} q=$q est=$est target=$target " +
          s"ranks=($below,$atOrBelow) bound=$bound")
    }
    // a null group value is a legitimate key; null values are skipped
    val mixed = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (None, Some(5.0)), (Some("a"), None))
      .toDF("g", "x")
    val m = QuantileSketch.quantilesBy(mixed, Seq("g"), "x", 8, Seq(0.5))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getAs[Double]("v_est"), r.getAs[Long]("n"))).toMap
    assert(m === Map(Some("a") -> ((1.0, 2L)), None -> ((5.0, 1L))))
  }

  test("duplicate-heavy input: err_bound uses the RAW coreset H, not the value-collapsed weight (r14 ADVICE fix)") {
    // a CONSTANT column is the worst case: the value-collapse sums all
    // weights into one row (≈ n per partition), so deriving H from the
    // collapsed max would report ~log2(n)·n/k where the realized bound
    // is H_raw·n/k (and the true error is 0)
    val k = 64
    val df = spark.range(5000).select(lit(42.0).as("x"))
    val out = QuantileSketch.quantiles(df, k, Seq(0.5)).collect()
    assert(out.length === 1)
    val n = out(0).getAs[Long]("n")
    assert(n === 5000L)
    val maxW = QuantileSketch.coreset(df, k).agg(max(col("w"))).head.getLong(0)
    val h = java.lang.Long.numberOfTrailingZeros(maxW)
    val bound = out(0).getAs[Double]("err_bound")
    assert(bound === h.toDouble * n / k,
      s"bound=$bound expected H_raw*n/k=${h.toDouble * n / k}")
    // the collapsed weight for the single value is n itself — the old
    // derivation would have reported round(log2(n))·n/k, strictly looser
    assert(bound < math.round(math.log(n.toDouble) / math.log(2.0)).toDouble * n / k)
    assert(out(0).getAs[Double]("v_est") === 42.0)
    // grouped form, same degenerate shape per group
    val g = spark.range(4000).select((col("id") % 2).as("g"), lit(7.0).as("x"))
    val gout = QuantileSketch.quantilesBy(g, Seq("g"), "x", k, Seq(0.5)).collect()
    assert(gout.length === 2)
    gout.foreach { r =>
      assert(r.getAs[Double]("v_est") === 7.0)
      val gn = r.getAs[Long]("n")
      assert(gn === 2000L)
      // the bound must stay well under the collapsed-weight derivation
      assert(r.getAs[Double]("err_bound") <
        math.round(math.log(gn.toDouble) / math.log(2.0)).toDouble * gn / k)
    }
  }

  test("facade Graft.approxQuantiles: casts the column, empty input yields zero rows") {
    val out = Graft.approxQuantiles(
      Tables.orders(spark, sf).select(col("o_orderkey")), "o_orderkey",
      64, Seq(0.5)).collect()
    assert(out.length === 1 && out(0).getAs[Long]("n") > 0L)
    val empty = Graft.approxQuantiles(
      Seq.empty[Double].toDF("x"), "x", 64, Seq(0.5)).collect()
    assert(empty.isEmpty)
  }
}
