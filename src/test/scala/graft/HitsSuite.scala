package graft

/** Behavior pins for operators.Hits (oracle parity lives in
  * q_graph_hits; this suite pins the L1-normalized semantics, the
  * duplicate-edge contract, and the scale-plan shape). */
class HitsSuite extends SparkSuite {
  import spark.implicits._

  private def hits(edges: Seq[(Long, Long)], iters: Int = 2)
      : (Map[Long, Double], Map[Long, Double]) = {
    val rows = graft.operators.Hits.run(edges.toDF("src", "dst"), iters)
      .collect()
    (rows.filter(_.getString(1) == "hub")
       .map(r => r.getLong(0) -> r.getDouble(2)).toMap,
     rows.filter(_.getString(1) == "auth")
       .map(r => r.getLong(0) -> r.getDouble(2)).toMap)
  }

  test("star basket: the lone hub holds all hub mass; symmetric items tie") {
    val (h, a) = hits(Seq(1L -> 10L, 1L -> 11L, 1L -> 12L))
    assert(h === Map(1L -> 1.0), "a single src must own the whole L1 hub mass")
    assert(a.keySet === Set(10L, 11L, 12L))
    assert(a.values.toSet.size === 1, s"symmetric authorities must tie: $a")
    assert(a(10L) === 0.333333, "each of 3 symmetric auths gets 1/3 at 6dp")
  }

  test("more good in-links -> higher authority; pointing at it -> higher hub") {
    // i1 is in both baskets, i2 only in b1; b1 points at the stronger set.
    val (h, a) = hits(Seq(1L -> 10L, 1L -> 11L, 2L -> 10L))
    assert(a(10L) > a(11L), s"the doubly-linked item must out-rank: $a")
    assert(h(1L) > h(2L),
      s"the basket holding MORE authority mass must out-rank: $h")
  }

  test("roles each L1-normalize: scores sum to 1 within rounding") {
    val (h, a) = hits(Seq(1L -> 10L, 1L -> 11L, 2L -> 10L, 3L -> 12L))
    assert(math.abs(h.values.sum - 1.0) < 1e-4, s"hub mass: ${h.values.sum}")
    assert(math.abs(a.values.sum - 1.0) < 1e-4, s"auth mass: ${a.values.sum}")
  }

  test("duplicate input edges count once (the distinct contract)") {
    val once = hits(Seq(1L -> 10L, 1L -> 11L, 2L -> 10L))
    val duped = hits(Seq(1L -> 10L, 1L -> 10L, 1L -> 11L,
      2L -> 10L, 2L -> 10L, 2L -> 10L))
    assert(once === duped)
  }

  test("iterations must be >= 1; empty edges yield an empty frame") {
    intercept[IllegalArgumentException] {
      graft.operators.Hits.run(Seq((1L, 2L)).toDF("src", "dst"), 0)
    }
    val empty = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Hits.run(empty, 2).count() === 0L)
  }

  test("plan: no CartesianProduct beyond 1-row normalizer broadcasts, no Window") {
    // The half-step sums are order-free exact-integer hash aggregates;
    // a Window would mean an edge-sized sort per half-step (the rejected
    // PageRank first cut), a CartesianProduct would mean the normalizer
    // stopped being a 1-row broadcast.
    val df = graft.operators.Hits.run(
      Seq(1L -> 10L, 1L -> 11L, 2L -> 10L, 3L -> 11L).toDF("src", "dst"), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"Hits planned a CartesianProduct:\n$plan")
    assert(!plan.contains("Window"),
      s"Hits re-grew a Window stage (edge-sized sort per half-step):\n$plan")
  }

  test("mirror law: equals a driver-side quantized-L1 replay on a small graph") {
    // Naive replay of the DEFINED semantics: q(x) = round-half-up(x*1e12),
    // exact BigInt sums, one double division, 6dp.
    val edges = Seq(1L -> 10L, 1L -> 11L, 2L -> 10L, 2L -> 12L,
      3L -> 11L, 3L -> 12L, 3L -> 13L).distinct
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q(x: Double): BigInt = BigDecimal(x * 1e12)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
    val srcs = edges.map(_._1).distinct
    var eh = srcs.map(_ -> 1.0 / srcs.size).toMap
    var ea = Map.empty[Long, Double]
    for (_ <- 1 to 2) {
      val ar = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => q(eh(e._1))).sum }
      val at = ar.values.sum
      ea = ar.map { case (d, raw) =>
        d -> r6(raw.toDouble / at.toDouble) }
      val hr = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => q(ea(e._2))).sum }
      val ht = hr.values.sum
      eh = hr.map { case (s, raw) => s -> r6(raw.toDouble / ht.toDouble) }
    }
    val (h, a) = hits(edges)
    assert(h === eh, s"hub mirror drift: spark=$h replay=$eh")
    assert(a === ea, s"auth mirror drift: spark=$a replay=$ea")
  }
}
