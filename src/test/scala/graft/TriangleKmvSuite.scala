package graft

import org.apache.spark.sql.functions._

/** Behavior pins for the r15 triangle census family (GraphOps.trianglesOn
  * / triangleStatsOn / localCcOn, oracle parity in q_graph_triangle /
  * q_graph_localcc) and the KMV distinct sketch (Aggregates.kmvOn, oracle
  * parity in q_agg_kmv). Planted closed-form graphs + a brute-force
  * mirror law + a JVM hash replay of the KMV estimator. */
class TriangleKmvSuite extends SparkSuite {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) = {
    val r = Graft.triangleCensus(edges.toDF("s", "t"), "s", "t").collect()(0)
    spark.catalog.clearCache()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) Double.NaN else r.getDouble(4))
  }

  test("K4: every wedge closes — transitivity exactly 1") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(census(k4) === ((4L, 6L, 12L, 4L, 1.0)))
  }

  test("4-cycle: wedges but no triangle — transitivity exactly 0") {
    assert(census(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
      === ((4L, 4L, 4L, 0L, 0.0)))
  }

  test("edgeless-wedge graph (single edge): transitivity is NULL, not 0/0") {
    val (n, e, w, t, tr) = census(Seq(1L -> 2L))
    assert((n, e, w, t) === ((2L, 1L, 0L, 0L)))
    assert(tr.isNaN, "no wedge -> NULL transitivity (guarded division)")
  }

  test("bowtie (two triangles sharing an edge): 2 triangles, 8 wedges, 0.75") {
    val bt = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(census(bt) === ((4L, 5L, 8L, 2L, 0.75)))
  }

  test("star hub: zero triangles; the hub is never a wedge source") {
    // degree orientation points every spoke INTO the hub, so the 10⁶-hub
    // cost argument reduces to: out-degree of the hub is 0.
    val star = (2L to 9L).map(i => 1L -> i)
    val (n, e, w, t, tr) = census(star)
    assert((n, e, w, t) === ((9L, 8L, 28L, 0L)))
    assert(tr === 0.0)
  }

  test("canonicalization: self-loops, duplicates, reversed orientations") {
    val messy = Seq(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L,
      2L -> 2L)
    assert(census(messy) === ((3L, 3L, 3L, 1L, 1.0)),
      "messy input must census like the clean triangle")
  }

  test("brute-force mirror: pseudo-random 30-node graph") {
    val n = 30L
    val edges = for {
      i <- 1L until n; j <- (i + 1) to n
      if (i * 7 + j * 13) % 5 == 0
    } yield (i, j)
    val adj = edges.toSet
    def has(a: Long, b: Long) = adj.contains((a min b, a max b))
    val brute = (for {
      a <- 1L to n; b <- (a + 1) to n; c <- (b + 1) to n
      if has(a, b) && has(a, c) && has(b, c)
    } yield 1).size.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val (nn, ne, nw, nt, _) = census(edges)
    assert(ne === edges.size.toLong)
    assert(nn === deg.size.toLong)
    assert(nw === wedges)
    assert(nt === brute, s"engine $nt vs brute-force $brute triangles")
  }

  test("localcc: bowtie per-node coefficients and total-order ranking") {
    val bt = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val got = Graft.localClustering(bt.toDF("s", "t"), "s", "t", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    spark.catalog.clearCache()
    // shared-edge nodes 2,3: deg 3, 2 triangles, cc = 4/6; outer 1,4:
    // deg 2, 1 triangle, cc = 1. Rank: (tri desc, node asc).
    assert(got.toSeq === Seq((2L, 3L, 2L, 0.666667), (3L, 3L, 2L, 0.666667),
      (1L, 2L, 1L, 1.0), (4L, 2L, 1L, 1.0)))
  }

  test("truss histogram: bowtie shared edge carries support 2; pendant edge keeps support 0") {
    val bt = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L)
    val got = graft.queries.GraphOps.trussOn(bt.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    // (4,5) closes nothing -> support 0; the shared (2,3) edge sits in
    // both triangles -> support 2; the four outer edges -> support 1.
    assert(got === Seq((0L, 1L), (1L, 4L), (2L, 1L)))
  }

  test("truss peel: the cascade kills the bowtie; K4 is 2-truss-stable") {
    // bowtie: only the shared (2,3) edge has support 2, so round 1
    // keeps 1 edge — which then sits in NO triangle, so round 2 kills
    // it too: the cascade, pinned. (Also pins the subgraph identity
    // the engine's prune-don't-re-enumerate optimization rests on.)
    val bt = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
      .toDF("a", "b")
    val got = graft.queries.GraphOps.trussPeelOn(bt, 2, 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    assert(got === Seq((1, 1L), (2, 0L)))
    // K4: every edge sits in exactly 2 triangles — a fixed point.
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("a", "b")
    val g2 = graft.queries.GraphOps.trussPeelOn(k4, 2, 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    assert(g2 === Seq((1, 6L), (2, 6L)))
  }

  // --- KMV ---

  /** JVM replay of Det.md5h32: first 8 hex chars of md5(utf8) as long. */
  private def jvmH32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private def kmv(pairs: Seq[(String, String)], k: Int) =
    Graft.kmvDistinct(pairs.toDF("g", "v"), "g", "v", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("KMV estimating branch replays the JVM hash-sort formula exactly") {
    val vals = (1 to 2000).map(_.toString)
    val k = 64
    val hk = vals.map(jvmH32).distinct.sorted.apply(k - 1)
    val expectEst = (k - 1).toLong * 4294967296L / hk
    assert(kmv(vals.map(("a", _)), k)
      === Seq(("a", 2000L, hk, expectEst)))
    // 1/sqrt(k) standard error: 2000 ± ~3 sigma
    assert(math.abs(expectEst - 2000L) < 800,
      s"estimate $expectEst implausibly far from 2000")
  }

  test("KMV sub-k groups are exact; duplicates never perturb the sketch") {
    val base = (1 to 100).map(i => ("b", i.toString))
    val dups = base ++ base ++ base
    val Seq((g, nTrue, _, est)) = kmv(dups, 256)
    assert((g, nTrue, est) === (("b", 100L, 100L)),
      "below k the estimator IS the exact count")
  }

  test("KMV per-group independence: mixed sub-k and super-k groups") {
    val a = (1 to 3000).map(i => ("big", "x" + i))
    val b = (1 to 10).map(i => ("small", "y" + i))
    val gotMap = kmv(a ++ b, 32).map(r => r._1 -> ((r._2, r._4))).toMap
    assert(gotMap("small") === ((10L, 10L)))
    val (bt, be) = gotMap("big")
    assert(bt === 3000L)
    assert(be > 1500L && be < 6000L, s"k=32 estimate $be off 3000 by > 2x")
  }

  private def ams(keys: Seq[Long]) =
    graft.queries.Aggregates.amsOn(keys.toDF("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).head

  test("AMS: a single-key corpus is estimated EXACTLY (every signed sum is ±n)") {
    val (exact, est, ratio) = ams(Seq.fill(37)(5L))
    assert(exact === 37L * 37L)
    assert(est === 37L * 37L, "single key: every z_i = ±37, mean of squares exact")
    assert(ratio === Some(1.0))
  }

  test("AMS replays the JVM sign-sum formula exactly; the estimate is in the unbiased estimator's range") {
    val keys = (1 to 500).flatMap(i => Seq.fill(1 + i % 7)(i.toLong))
    val exact = keys.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
    val zs = (0 until 8).map { i =>
      keys.map(k => if (Det.jvmMd5h32(s"$i#$k") % 2 == 0) 1L else -1L).sum
    }
    val expectEst = zs.map(z => z * z).sum / 8
    val (gotExact, gotEst, _) = ams(keys)
    assert(gotExact === exact)
    assert(gotEst === expectEst, "engine sketch != JVM mirror")
    // unbiased with relative sd sqrt(2/8): 4 sigma guard
    assert(gotEst > exact / 5 && gotEst < exact * 5,
      s"estimate $gotEst implausibly far from $exact")
  }

  test("AMS inner product: single shared key is estimated EXACTLY (matched signs square out)") {
    val out = graft.queries.Aggregates.amsJoinOn(
        Seq.fill(13)(5L).toDF("k"), Seq.fill(7)(5L).toDF("k"))
      .collect().head
    assert(out.getLong(0) === 91L) // 13·7
    assert(out.getLong(1) === 91L, "same key ⇒ every zᵃᵢ·zᵇᵢ = 13·7 exactly")
    assert(out.getDouble(2) === 1.0)
  }

  test("AMS inner product: disjoint key sets audit to join_exact 0 with a NULL ratio; JVM mirror holds") {
    val a = (1 to 300).flatMap(i => Seq.fill(1 + i % 3)(i.toLong))
    val b = (250 to 500).map(_.toLong)
    val out = graft.queries.Aggregates.amsJoinOn(a.toDF("k"), b.toDF("k"))
      .collect().head
    val exact = {
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // keys is a Set — map on it would DEDUPE equal products
      ca.keys.toSeq.filter(cb.contains).map(k => ca(k) * cb(k)).sum
    }
    def zs(keys: Seq[Long]) = (0 until 8).map { i =>
      keys.map(k => if (Det.jvmMd5h32(s"$i#$k") % 2 == 0) 1L else -1L).sum
    }
    val expEst = zs(a).zip(zs(b)).map { case (x, y) => x * y }.sum / 8
    assert(out.getLong(0) === exact)
    assert(out.getLong(1) === expEst, "engine sketch != JVM mirror")
    val disj = graft.queries.Aggregates.amsJoinOn(
        Seq(1L, 2L).toDF("k"), Seq(9L, 9L).toDF("k")).collect().head
    assert(disj.getLong(0) === 0L && disj.isNullAt(2),
      "empty join must audit 0 with a structural NULL ratio")
  }

  test("AMS linearity: the sketch of a union is the sum of the sketches (mergeability)") {
    val a = (1 to 200).map(_.toLong)
    val b = (100 to 400).map(_.toLong)
    def zs(keys: Seq[Long]) = (0 until 8).map { i =>
      keys.map(k => if (Det.jvmMd5h32(s"$i#$k") % 2 == 0) 1L else -1L).sum
    }
    val merged = zs(a).zip(zs(b)).map { case (x, y) => x + y }
    assert(zs(a ++ b) === merged,
      "per-row signed sums must add across partitions/streams")
    // and the engine's estimate off the union equals the JVM fold
    val (_, gotEst, _) = ams(a ++ b)
    assert(gotEst === merged.map(z => z * z).sum / 8)
  }
}
