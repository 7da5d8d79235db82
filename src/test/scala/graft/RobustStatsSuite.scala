package graft

/** Behavior pins for the r15 wave-G estimators: Hodges-Lehmann
  * pseudo-median (Aggregates.hlOn), the Wald-Wolfowitz runs test
  * (EventOps.runsOn), and the count-min sketch (Aggregates.cmsOn) —
  * oracle parity lives in q_agg_hodgeslehmann / q_event_runstest /
  * q_agg_cms; these pin semantics on planted closed-form fixtures and
  * JVM replays. */
class RobustStatsSuite extends SparkSuite {
  import spark.implicits._

  private def hl(vals: Seq[Double]) = {
    val r = Graft.hodgesLehmann(vals.map(("a", _)).toDF("g", "v"), "g", "v")
      .collect()(0)
    spark.catalog.clearCache()
    (r.getLong(1), r.getDouble(2))
  }

  test("HL: {1,2,6} has 6 Walsh averages, lower median 2.0") {
    assert(hl(Seq(1.0, 2.0, 6.0)) === ((6L, 2.0)))
  }

  test("HL: a 1000x outlier barely moves the pseudo-median (robustness)") {
    // Walsh averages of {1,2,3,1000} sorted: 1,1.5,2,2,2.5,3,500.5,...
    // -> 5th of 10 = 2.5 where the mean is 251.5.
    assert(hl(Seq(1.0, 2.0, 3.0, 1000.0)) === ((10L, 2.5)))
  }

  test("HL: tied values weight the diagonal by w(w+1)/2") {
    // {5,5,7}: (5,5) w=3, (5,7) w=2, (7,7) w=1 -> k=3 falls in the
    // 5.0 cell.
    assert(hl(Seq(5.0, 5.0, 7.0)) === ((6L, 5.0)))
  }

  private def runs(ns: Seq[Long]) = {
    val df = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("d", "n")
    val r = Graft.runsTest(df, "d", "n").collect()(0)
    spark.catalog.clearCache()
    // an empty sign set leaves the SUM columns NULL (the engine's
    // documented empty-sum semantics) -> surface as -1 for asserts
    def gl(i: Int) = if (r.isNullAt(i)) -1L else r.getLong(i)
    (r.getLong(0), gl(1), gl(2), gl(3),
      if (r.isNullAt(4)) Double.NaN else r.getDouble(4))
  }

  test("runs test: alternating series replays the closed-form z (positive)") {
    // [1,10,2,9,3,8,4,7]: med 4 drops its day; signs b a b a b a a
    // -> R = 6 over n1 = 4 above / n2 = 3 below.
    val (nu, na, nb, nr, z) = runs(Seq(1L, 10L, 2L, 9L, 3L, 8L, 4L, 7L))
    assert((nu, na, nb, nr) === ((7L, 4L, 3L, 6L)))
    val two = 2.0 * 4 * 3; val nn = 7.0
    val e = 1.0 + two / nn
    val v = (two * (two - nn)) / (nn * nn * (nn - 1.0))
    val expZ = BigDecimal((6.0 - e) / math.sqrt(v))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(z === expZ)
    assert(z > 0, "alternation = more runs than chance")
  }

  test("runs test: blocked series under-runs (negative z); degenerate side is NULL") {
    val (_, _, _, nr, z) = runs(Seq(10L, 9L, 8L, 7L, 1L, 2L, 3L))
    assert(nr === 2L)
    assert(z < 0, "blocking = fewer runs than chance")
    // all values equal -> every day sits ON the median -> nothing to test
    val (nu0, _, _, _, z0) = runs(Seq(5L, 5L, 5L, 5L))
    assert(nu0 === 0L && z0.isNaN)
  }

  test("CUPED: perfectly pre-period-explained metric -> theta 1, rho2 1, adjusted diff 0") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val B = 1704067200000000L
    // 40 users, Y(day 1) == X(day 0) == u dollars: whatever the md5
    // arm split does to the RAW diff, CUPED must cancel it exactly.
    val rows = (1 to 40).flatMap { u =>
      Seq((u.toLong, B + u * 1000L, u.toDouble),
        (u.toLong, B + 86400000000L + u * 1000L, u.toDouble))
    }
    val df = rows.toDF("user_id", "ts_us", "value")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("value"))
    val r = graft.queries.EventOps.cupedOn(df).collect()(0)
    val (na, nb) = (r.getLong(0), r.getLong(1))
    assert(na > 0 && nb > 0 && na + nb === 40L)
    assert(r.getDouble(2) === 1.0, "theta must be exactly cov/var = 1")
    val rawDiff = r.getDouble(3)
    assert(r.getDouble(4) === 0.0,
      s"CUPED must cancel the raw arm imbalance ($rawDiff) exactly")
    assert(r.getDouble(5) === 1.0, "rho2 = 1 when X explains Y fully")
  }

  test("HL mirror law: engine == driver-side weighted Walsh median on random multisets") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 8) {
      val xs = Seq.fill(3 + rng.nextInt(12))(rng.nextInt(20).toDouble)
      // driver mirror: all Walsh averages (i <= j over the multiset's
      // SORTED elements), lower median at ceil(W/2)
      val sorted = xs.sorted
      val walsh = (for {
        i <- sorted.indices; j <- i until sorted.length
      } yield (sorted(i) + sorted(j)) / 2.0).sorted
      val expect = walsh((walsh.size + 1) / 2 - 1)
      val (n, got) = hl(xs)
      assert(n === walsh.size.toLong, s"pair count for $xs")
      assert(got === expect, s"HL($xs): engine $got vs mirror $expect")
    }
  }

  test("runs-test mirror law: engine z == driver replay on random distinct series") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 8) {
      // distinct values sidestep the tie-drop subtleties the fixtures pin
      val ns = rng.shuffle((1L to (5 + rng.nextInt(20)).toLong).toList)
      val (nu, na, nb, nr, z) = runs(ns)
      val med = ns.sorted.apply((ns.size + 1) / 2 - 1)
      val signs = ns.filter(_ != med).map(v => if (v > med) 1 else 0)
      val r = 1 + signs.sliding(2).count(p => p.size == 2 && p(0) != p(1))
      val (n1, n2) = (signs.count(_ == 1).toDouble, signs.count(_ == 0).toDouble)
      assert((nu, na, nb, nr) ===
        ((signs.size.toLong, n1.toLong, n2.toLong, r.toLong)))
      if (n1 > 0 && n2 > 0 && signs.size > 1 && 2.0 * n1 * n2 - (n1 + n2) > 0) {
        val two = 2.0 * n1 * n2; val nn = n1 + n2
        val e = 1.0 + two / nn
        val v = (two * (two - nn)) / (nn * nn * (nn - 1.0))
        val raw = (r - e) / math.sqrt(v)
        val expZ = BigDecimal(raw)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(z === expZ, s"z for $ns")
      } else assert(z.isNaN)
    }
  }

  test("CMS: estimates replay the JVM fold exactly; overcount is one-sided") {
    // narrow w = 16 + a 61-singleton tail to force real collisions
    val data = Seq.fill(100)(1L) ++ Seq.fill(50)(2L) ++ Seq.fill(10)(3L) ++
      (100L to 160L)
    val got = Graft.cmsFrequency(data.toDF("k"), "k", 4, 16, 3).collect()
    val ctr = scala.collection.mutable.Map[(Int, Long), Long]()
      .withDefaultValue(0L)
    for (v <- data; i <- 0 until 4)
      ctr((i, Det.jvmMd5h32(s"$i#$v") % 16)) += 1
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = truth.toSeq.sortBy { case (k, n) => (-n, k) }.take(3)
      .map { case (k, n) =>
        (k, n, (0 until 4).map(i => ctr((i, Det.jvmMd5h32(s"$i#$k") % 16))).min)
      }
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === exp)
    got.foreach(r => assert(r.getLong(3) >= 0L, "CMS undercounted"))
  }
}
