package graft

import org.apache.spark.sql.functions._

class KCoreSuite extends SparkSuite {
  import spark.implicits._

  /** Symmetrize an undirected pair list (the GraphOps edge contract). */
  private def sym(pairs: Seq[(Long, Long)]) = {
    val p = pairs.toDF("src", "dst")
    p.union(p.select(col("dst"), col("src")))
  }

  // triangle {1,2,3} with a pendant path 3-4-5 hanging off it
  private val triPath = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))

  test("2-core peels the pendant path CASCADE (one degree cut would only drop the leaf)") {
    val out = operators.KCore.peel(sym(triPath), k = 2, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // round 1 drops 5 (deg 1); that pushes 4 to deg 1 → round 2 drops it
    assert(out === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("one round is NOT enough for the cascade — fixed-round semantics are real") {
    val out = operators.KCore.peel(sym(triPath), k = 2, rounds = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // only the leaf is gone; 4 survives round 1 with its stale degree 2
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 4L))
  }

  test("k=1 is the identity peel; early exit keeps extra rounds free") {
    val base = sym(triPath).groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    val out = operators.KCore.peel(sym(triPath), k = 1, rounds = 10)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out === base)
  }

  test("k above the max degree empties the graph (no rows, not a crash)") {
    val out = operators.KCore.peel(sym(triPath), k = 10, rounds = 2)
    assert(out.count() === 0)
  }

  test("graded q_graph_kcore at sf0.001 peels nothing below k (every survivor has >= k surviving neighbors)") {
    val out = SparkEntry.queries("q_graph_kcore")(spark, sf)
    val minDeg = out.agg(min(col("deg"))).head.getLong(0)
    assert(out.count() > 0)
    assert(minDeg >= queries.GraphOps.CoreK)
  }

  test("BFS: path-graph hop histogram from the min-id seed; unreached stays absent under the rounds cap") {
    // path 1-2-3-4-5 plus a disconnected pair 10-11: seed is 1
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)))
    val full = operators.Bfs.hops(g, 6).as[(Long, Long)].collect().toSeq
    assert(full === Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)),
      s"path distances wrong: $full")
    // the cap is semantic: rounds = 2 reaches only 3 nodes
    val capped = operators.Bfs.hops(g, 2).as[(Long, Long)].collect().toSeq
    assert(capped === Seq((0L, 1L), (1L, 1L), (2L, 1L)),
      s"rounds-cap semantics drifted: $capped")
  }

  test("BFS: empty edge frame yields an empty histogram, not a NULL-seed (dist=0, n_nodes=1) row (r17, ADVICE)") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(operators.Bfs.hops(empty, 6).count() === 0L)
  }

  test("BFS: early exit is result-identical — extra rounds past full reach change nothing") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val r3 = operators.Bfs.hops(g, 3).as[(Long, Long)].collect().toSeq
    val r10 = operators.Bfs.hops(g, 10).as[(Long, Long)].collect().toSeq
    assert(r3 === Seq((0L, 1L), (1L, 2L)))
    assert(r10 === r3)
  }

  test("graded q_graph_bfs at sf0.001: seed row present, every reached node counted once") {
    val out = SparkEntry.queries("q_graph_bfs")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(out.head === ((0L, 1L)), s"seed row wrong: ${out.head}")
    // the co-purchase graph is fully reached within the 6-round cap
    // at every graded sf (measured; the constant's scaladoc) — the
    // histogram must sum to the node count
    val nodes = queries.GraphOps.copurchaseEdges(spark, sf)
      .select(col("src")).distinct().count()
    assert(out.map(_._2).sum === nodes)
    spark.catalog.clearCache()
  }

  test("kbfs (r18): multi-seed path-graph mirror — per-seed distances exact; one seed reproduces hops; early exit free") {
    // path 1-2-3-4-5, seeds {1, 3}: from 1 one node per hop 0..4;
    // from 3 the fan is (0→{3}, 1→{2,4}, 2→{1,5})
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val seeds = Seq((1L, 1L), (3L, 3L)).toDF("seed", "node")
    val out = operators.Bfs.hopsFrom(g, seeds, 6)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
      (3L, 0L, 1L), (3L, 1L, 2L), (3L, 2L, 2L)), s"got $out")
    // extra rounds past full reach change nothing (early exit law)
    val more = operators.Bfs.hopsFrom(g, seeds, 12)
      .as[(Long, Long, Long)].collect().toSeq
    assert(more === out)
    // single-seed hopsFrom == hops on the same seed
    val one = operators.Bfs
      .hopsFrom(g, Seq((1L, 1L)).toDF("seed", "node"), 6)
      .select(col("dist"), col("n_nodes"))
      .as[(Long, Long)].collect().toSeq
    val ref = operators.Bfs.hops(g, 6).as[(Long, Long)].collect().toSeq
    assert(one === ref)
    spark.catalog.clearCache()
  }

  test("harmonic (r19): disconnected-component fixture — closeness and harmonic RANK the two seeds differently") {
    // component 1: triangle {1,2,3} — seed 1 reaches 2 nodes at dist 1
    //   closeness(1) = 2/2 = 1.0 (a perfect score from a tiny island)
    //   harmonic(1)  = 2/1 = 2.0
    // component 2: star 10—{11..16} plus tails 11—17, 12—18 — seed 10
    //   reaches 8 nodes, Σd = 6·1 + 2·2 = 10
    //   closeness(10) = 8/10 = 0.8  < closeness(1)   (island wins)
    //   harmonic(10)  = 6/1 + 2/2 = 7.0 > harmonic(1) (reach wins)
    val comp1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val comp2 = (11L to 16L).map(l => (10L, l)) ++
      Seq((11L, 17L), (12L, 18L))
    val g = sym(comp1 ++ comp2)
    val seeds = Seq((1L, 1L), (10L, 10L)).toDF("seed", "node")
    val hops = operators.Bfs.hopsFrom(g, seeds, 6)
    val h = queries.GraphOps.harmonicFold(hops)
      .select(col("seed"), col("n_reached"), col("harmonic_micro"))
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, m) => s -> ((n, m)) }.toMap
    assert(h(1L) === ((3L, 2000000L)), s"triangle seed: ${h(1L)}")
    assert(h(10L) === ((9L, 7000000L)), s"star seed: ${h(10L)}")
    // closeness over the SAME hops ranks them the OTHER way
    val c = hops.groupBy(col("seed"))
      .agg(sum(col("n_nodes")).as("n_reached"),
        sum(col("dist") * col("n_nodes")).as("sum_dist"))
      .withColumn("c_micro",
        expr("cast((cast(n_reached - 1 as decimal(38,0)) * 1000000) div sum_dist as bigint)"))
      .select(col("seed"), col("c_micro"))
      .as[(Long, Long)].collect().toMap
    assert(c(1L) === 1000000L && c(10L) === 800000L)
    assert(c(1L) > c(10L) && h(1L)._2 < h(10L)._2,
      "the fixture must flip the ranking between the two centralities")
    // facade: one-directional input, caller columns, seed dedup
    val f = Graft.harmonicCentrality(
        (comp1 ++ comp2).toDF("u", "v"), "u", "v", Seq(1L, 10L, 1L))
      .select(col("seed"), col("harmonic_micro"))
      .as[(Long, Long)].collect().toMap
    assert(f === Map(1L -> 2000000L, 10L -> 7000000L))
    // eccentricity (r19): the worst-case fold over the same hops —
    // triangle seed ecc 1, star-with-tails seed ecc 2, all-integer
    val ec = Graft.eccentricity(
        (comp1 ++ comp2).toDF("u", "v"), "u", "v", Seq(1L, 10L))
      .select(col("seed"), col("n_reached"), col("ecc"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(ec === Map(1L -> ((3L, 1L)), 10L -> ((9L, 2L))), s"got $ec")
    spark.catalog.clearCache()
  }

  test("costFrom (r19): a longer-hop cheaper path displaces a settled entry — the case hop-BFS cannot express") {
    // 1—2 at w=1 (cost 10⁶), 1—3 and 3—2 at w=4 (cost 250000 each):
    // the 2-hop route to node 2 costs 500000 < the direct 10⁶
    val ew = Seq((1L, 2L, 1L), (1L, 3L, 4L), (3L, 2L, 4L))
    val g = symW(ew).select(col("src"), col("dst"),
      expr("cast(1000000 div w as bigint)").as("cost"))
    val seeds = Seq((1L, 1L)).toDF("seed", "node")
    val d6 = operators.Bfs.costFrom(g, seeds, 6)
      .select(col("node"), col("d")).as[(Long, Long)].collect().toMap
    assert(d6 === Map(1L -> 0L, 2L -> 500000L, 3L -> 250000L), s"got $d6")
    // at rounds = 1 only the direct edge exists — round 2 IMPROVES it
    val d1 = operators.Bfs.costFrom(g, seeds, 1)
      .select(col("node"), col("d")).as[(Long, Long)].collect().toMap
    assert(d1(2L) === 1000000L, s"1-round distance must be direct: $d1")
    spark.catalog.clearCache()
  }

  test("costFrom (r19): uniform costs reproduce hopsFrom x cost exactly — the weight-blind law") {
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val g = sym(k4a ++ k4b ++ Seq((4L, 5L)))
    val seeds = Seq((1L, 1L), (6L, 6L)).toDF("seed", "node")
    val hops = operators.Bfs.hopsFrom(g, seeds, 6)
      .select(col("seed"), col("dist"), col("n_nodes"))
      .as[(Long, Long, Long)].collect().toSet
    val costs = operators.Bfs.costFrom(
        g.withColumn("cost", lit(7L)), seeds, 6)
      .groupBy(col("seed"), (col("d") / 7L).cast("long").as("dist"))
      .agg(count(lit(1)).as("n_nodes"))
      .select(col("seed"), col("dist"), col("n_nodes"))
      .as[(Long, Long, Long)].collect().toSet
    assert(costs === hops, s"uniform-cost law broke: $costs vs $hops")
    // and the weightedCloseness facade on the same graph at w=1:
    // cost = 10⁶ per hop, so sum_cost = 10⁶·Σdist and wclose_micro
    // equals the unweighted closeness_micro
    val fw = Graft.weightedCloseness(
        (k4a ++ k4b ++ Seq((4L, 5L))).map { case (a, b) => (a, b, 1L) }
          .toDF("u", "v", "wt"), "u", "v", "wt", Seq(1L, 6L, 99L))
      .select(col("seed"), col("n_reached"), col("sum_cost"),
        col("wclose_micro"))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // seed 1: dists (0,1,1,1,2,3,3,3) -> sum 14; (8-1)*1e6/14 = 500000
    assert(fw(1L) === ((8L, 14000000L, 500000L)), s"got ${fw(1L)}")
    assert(fw.size === 2, s"phantom seed survived: ${fw.keySet}")
    spark.catalog.clearCache()
  }

  test("betweenness (r19): exact on a path graph — interior nodes carry the hand-computed Brandes dependencies") {
    // path 1-2-3-4-5, pivot 1: δ(4) = 1, δ(3) = 2, δ(2) = 3 (each
    // interior node brokers every pair (1, beyond)); endpoint 5
    // brokers nothing (absent); the seed is excluded
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val seeds = Seq((1L, 1L)).toDF("seed", "node")
    val r = operators.Betweenness.pivotBetweenness(g, seeds, 6, 100)
      .select(col("node"), col("bc_micro"))
      .as[(Long, Long)].collect().toMap
    assert(r === Map(2L -> 3000000L, 3L -> 2000000L, 4L -> 1000000L),
      s"path dependencies drifted: $r")
    // mid-path pivot 3: only its immediate flanks broker (δ = 1 each)
    val seeds3 = Seq((3L, 3L)).toDF("seed", "node")
    val r3 = operators.Betweenness.pivotBetweenness(g, seeds3, 6, 100)
      .select(col("node"), col("bc_micro"))
      .as[(Long, Long)].collect().toMap
    assert(r3 === Map(2L -> 1000000L, 4L -> 1000000L), s"got $r3")
    spark.catalog.clearCache()
  }

  test("betweenness (r19): diamond fixture — sigma > 1 splits dependency exactly; bc_est is the (n/k) extrapolation") {
    // 1-{2,3}-4-{5,6}: σ(4) = 2 via the two arms; δ(4) = 2 (both 5
    // and 6 route through it), δ(2) = δ(3) = (1∕2)(1 + 2) = 1.5 →
    // FLOOR-micros 1500000 exactly (σ_v·(10⁶ + dq_w)) div σ_w =
    // (1·3·10⁶) div 2
    val g = sym(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L)))
    val seeds = Seq((1L, 1L)).toDF("seed", "node")
    val r = operators.Betweenness.pivotBetweenness(g, seeds, 6, 100)
      .select(col("node"), col("bc_micro"), col("bc_est"))
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r.view.mapValues(_._1).toMap ===
      Map(2L -> 1500000L, 3L -> 1500000L, 4L -> 2000000L), s"got $r")
    // bc_est = bc_micro · n_nodes ∕ (pivots · 10⁶); n = 6, k = 1
    assert(r(4L)._2 === 12.0 && r(2L)._2 === 9.0)
    // the facade symmetrizes one-directional caller input, drops
    // self-loops and phantom seeds, and keeps column names
    val f = Graft.betweennessApprox(
        Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
          (4L, 6L), (2L, 2L)).toDF("u", "v"),
        "u", "v", Seq(1L, 999L))
      .select(col("node"), col("bc_micro"))
      .as[(Long, Long)].collect().toMap
    assert(f === r.view.mapValues(_._1).toMap, s"facade drifted: $f")
    spark.catalog.clearCache()
  }

  test("betweenness (r19): randomized law — engine == exact BigInt driver replay of both sweeps") {
    val rnd = new scala.util.Random(7)
    def mirror(und: Seq[(Long, Long)], pivots: Seq[Long],
               rounds: Int): Map[Long, BigInt] = {
      val adj = (und ++ und.map { case (a, b) => (b, a) })
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val acc = scala.collection.mutable.Map.empty[Long, BigInt]
      pivots.foreach { s =>
        // forward: exact BFS layers with path counts
        var dist = Map(s -> 0)
        var sigma = Map(s -> BigInt(1))
        var frontier = Set(s)
        var r = 0
        while (frontier.nonEmpty && r < rounds) {
          r += 1
          val nxt = scala.collection.mutable.Map.empty[Long, BigInt]
          frontier.foreach { u =>
            adj.getOrElse(u, Set.empty).foreach { v =>
              if (!dist.contains(v))
                nxt(v) = nxt.getOrElse(v, BigInt(0)) + sigma(u)
            }
          }
          nxt.foreach { case (v, sg) =>
            dist += v -> r; sigma += v -> sg }
          frontier = nxt.keySet.toSet
        }
        // backward: floor-micros dependency, deepest level first
        val dq = scala.collection.mutable.Map.empty[Long, BigInt]
        val maxD = if (dist.isEmpty) -1 else dist.values.max
        (maxD - 1 to 0 by -1).foreach { lev =>
          dist.filter(_._2 == lev).keys.foreach { v =>
            val terms = adj.getOrElse(v, Set.empty).toSeq
              .filter(w => dist.get(w).contains(lev + 1))
              .map(w => (sigma(v) * (BigInt(1000000) + dq.getOrElse(w,
                BigInt(0)))) / sigma(w))
            if (terms.nonEmpty) dq(v) = terms.sum
          }
        }
        dq.foreach { case (v, q) =>
          if (v != s) acc(v) = acc.getOrElse(v, BigInt(0)) + q }
      }
      acc.toMap
    }
    (1 to 4).foreach { trial =>
      val n = 7 + rnd.nextInt(6)
      val und = (for {
        a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      if (und.nonEmpty) {
        val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val pivots = nodes.take(2)
        val seeds = pivots.map(i => (i, i)).toDF("seed", "node")
        val got = operators.Betweenness
          .pivotBetweenness(sym(und), seeds, 6, 1000)
          .select(col("node"), col("bc_micro"))
          .as[(Long, Long)].collect().toMap
        val want = mirror(und, pivots, 6)
          .map { case (k, v) => k -> v.toLong }
        assert(got === want, s"trial $trial: engine $got != mirror $want")
      }
      spark.catalog.clearCache()
    }
  }

  test("betweenness (r20, ADVICE): out-of-contract path counts fail LOUDLY — the sigma bound is asserted, never silently NULLed") {
    // sigma-multiplier gadget: 6 chained width-1000 bipartite fans
    // (collector -> 1000 mids -> next collector) multiply the path
    // count by 1000 per stage — sigma(c6) = 10^18 > the documented
    // 1e15 bound, where the decimal(38,0) dependency product would
    // overflow to NULL and sum() would silently drop terms.
    val stages = 6
    val width = 1000
    val und = (1 to stages).flatMap { k =>
      val prev = (k - 1) * 10000L
      val cur = k * 10000L
      (1 to width).flatMap(i =>
        Seq((prev, k * 10000L + i), (k * 10000L + i, cur)))
    }
    val seeds = Seq((0L, 0L)).toDF("seed", "node")
    val ex = intercept[IllegalStateException] {
      operators.Betweenness
        .pivotBetweenness(sym(und), seeds, 2 * stages, 5).collect()
    }
    assert(ex.getMessage.contains("sigma"),
      s"wrong failure shape: ${ex.getMessage}")
    spark.catalog.clearCache()
  }

  test("s-core (r20): weight-1 edges reproduce the k-core exactly — every strength a count") {
    val g1 = sym(triPath).withColumn("w", lit(1L))
    val sc = operators.KCore.peelW(g1, s = 2L, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val kc = operators.KCore.peel(sym(triPath), k = 2, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(sc === kc, s"weight-1 law broke: $sc vs $kc")
    spark.catalog.clearCache()
  }

  test("s-core (r20): the two directions the count peel cannot express — heavy pendant survives, feather hub peeled") {
    // triangle {1,2,3} each edge w=2 (strengths 4); pendant 4 hangs off
    // 1 with ONE heavy w=5 edge (deg 1, strength 5); hub 5 fans to all
    // three triangle nodes with w=1 feathers (deg 3, strength 3)
    val ew = Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 2L),
      (1L, 4L, 5L), (5L, 1L, 1L), (5L, 2L, 1L), (5L, 3L, 1L))
    // s-core at s=4: pendant 4 SURVIVES (strength 5), hub 5 is PEELED
    // (strength 3 < 4; its feathers then vanish from 1,2,3 — who stay)
    val sc = operators.KCore.peelW(symW(ew), s = 4L, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(sc.keySet === Set(1L, 2L, 3L, 4L), s"s-core drifted: $sc")
    assert(sc(4L) === 5L && sc(1L) === 9L, s"strengths drifted: $sc")
    // k-core at k=2 decides the OPPOSITE way on both: pendant 4 (deg 1)
    // peeled, hub 5 (deg 3) kept
    val kc = operators.KCore.peel(
        symW(ew).select(col("src"), col("dst")), k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(!kc.contains(4L) && kc.contains(5L), s"k-core drifted: $kc")
    spark.catalog.clearCache()
  }

  test("s-core (r20): the strength cascade is real — dropping a partner pushes a dependent below s in the NEXT round") {
    // node 10 holds s=6 only through partner 20 (w=4) + anchor-backed
    // 30 (w=2); 20's strength is 4+1 = 5 < 6 → peeled round 1, which
    // drops 10 to 2 < 6 → peeled round 2 (one strength cut misses it);
    // 30 and its heavy anchor 50 survive forever
    val ew = Seq((10L, 20L, 4L), (10L, 30L, 2L), (20L, 40L, 1L),
      (30L, 50L, 10L))
    val r1 = operators.KCore.peelW(symW(ew), s = 6L, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1.contains(10L) && !r1.contains(20L),
      s"round-1 peel drifted: $r1")
    val r4 = operators.KCore.peelW(symW(ew), s = 6L, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r4 === Map(30L -> 10L, 50L -> 10L),
      s"cascade end state drifted: $r4")
    spark.catalog.clearCache()
  }

  test("graded q_graph_score at sf0.001: the peel is the identity (every strength >= 12 — the kcore 'peels nothing' precedent)") {
    val out = SparkEntry.queries("q_graph_score")(spark, sf)
    val minSt = out.agg(min(col("strength"))).head.getLong(0)
    assert(out.count() === 210L)
    assert(minSt >= queries.GraphOps.ScoreS)
    spark.catalog.clearCache()
  }

  test("betweennessW (r20): uniform costs reproduce hop betweenness exactly — the weight-blind law, randomized") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      val n = 7 + rnd.nextInt(6)
      val und = (for {
        a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      if (und.nonEmpty) {
        val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val seeds = nodes.take(2).map(i => (i, i)).toDF("seed", "node")
        val hop = operators.Betweenness
          .pivotBetweenness(sym(und), seeds, 6, 1000)
          .select(col("node"), col("bc_micro"))
          .as[(Long, Long)].collect().toMap
        val wtd = operators.BetweennessW
          .pivotBetweennessW(sym(und).withColumn("cost", lit(1L)),
            seeds, 6, 1000)
          .select(col("node"), col("wbc_micro"))
          .as[(Long, Long)].collect().toMap
        assert(wtd === hop, s"trial $trial: weighted $wtd != hop $hop")
      }
      spark.catalog.clearCache()
    }
  }

  test("betweennessW (r20): the cheap long path carries the dependency the hop engine gives the direct edge") {
    // 1—2 cost 1, 2—3 cost 1, 1—3 cost 5: minimal cost to 3 is 2 via
    // broker 2; hop-shortest to 3 is the DIRECT edge, so the hop
    // engine sees NO broker at all — the fixture is exactly the
    // weighted-vs-hop split
    val g = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L))
    val ce = symW(g).select(col("src"), col("dst"), col("w").as("cost"))
    val seeds = Seq((1L, 1L)).toDF("seed", "node")
    val wtd = operators.BetweennessW.pivotBetweennessW(ce, seeds, 6, 100)
      .select(col("node"), col("wbc_micro"))
      .as[(Long, Long)].collect().toMap
    assert(wtd === Map(2L -> 1000000L), s"weighted broker drifted: $wtd")
    val hop = operators.Betweenness
      .pivotBetweenness(ce.select(col("src"), col("dst")), seeds, 6, 100)
      .select(col("node"), col("bc_micro"))
      .as[(Long, Long)].collect().toMap
    assert(hop === Map.empty[Long, Long],
      s"hop engine must see no broker here: $hop")
    spark.catalog.clearCache()
  }

  test("betweennessW (r20): sigma splits across equal-cost arms exactly — the weighted diamond") {
    // 1-{2,3}-4-5: both arms cost 2+2, σ(4) = σ(5) = 2. Brandes from
    // seed 1: δ(4) = (σ₄∕σ₅)·(1+δ₅) = 1 → dq₄ = (2·10⁶) div 2 = 10⁶;
    // each arm gets δ = (σ_arm∕σ₄)·(1+δ₄) = ½·2 = 1 → dq =
    // (1·(10⁶+10⁶)) div 2 = 10⁶ — the exact 1:1 σ split
    val g = Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L),
      (4L, 5L, 1L))
    val ce = symW(g).select(col("src"), col("dst"), col("w").as("cost"))
    val seeds = Seq((1L, 1L)).toDF("seed", "node")
    val wtd = operators.BetweennessW.pivotBetweennessW(ce, seeds, 6, 100)
      .select(col("node"), col("wbc_micro"))
      .as[(Long, Long)].collect().toMap
    assert(wtd === Map(2L -> 1000000L, 3L -> 1000000L, 4L -> 1000000L),
      s"diamond split drifted: $wtd")
    spark.catalog.clearCache()
  }

  test("betwsweep (r20): few pivots misrank, more recover — the two-component fixture, hand-computed overlaps") {
    // component A holds the two top-degree hubs (1: 4 leaves + bridge,
    // 2: 3 leaves + bridge): the k=2 pivots are BOTH in A and see only
    // each other's leaves — top set {1, 2}. Component B is a 5-node
    // path 100..104 with 2 leaves on each end (so 100/104 rank 3rd and
    // 4th by degree): at k=4 the B pivots activate and B's interior
    // brokers score 8·10⁶ each (101: 5+3, 102: 4+4, 103: 3+5),
    // displacing A's 4·10⁶ and 3·10⁶ entirely — overlap 0 of 2, while
    // the k=max row anchors at 100%.
    val und = Seq((1L, 2L),
      (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 21L), (2L, 22L), (2L, 23L),
      (100L, 101L), (101L, 102L), (102L, 103L), (103L, 104L),
      (100L, 200L), (100L, 201L), (104L, 202L), (104L, 203L))
    val out = queries.GraphOps.betwsweepOn(sym(und), Seq(2, 4), 3)
      .select(col("k_pivots"), col("n_top"), col("n_overlap"),
        col("overlap_micro"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 2L, 0L, 0L), (4L, 3L, 3L, 1000000L)),
      s"sweep fixture drifted: $out")
    spark.catalog.clearCache()
  }

  test("central/wcentral (r20): the fused rows are BIT-identical to the standalone centralities — the composition law, graded both sides") {
    // the standing pricing note turned into a law: one hopsFrom pass
    // must reproduce closeness, harmonic, and ecc exactly
    val cen = SparkEntry.queries("q_graph_central")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    val clo = SparkEntry.queries("q_graph_closeness")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val har = SparkEntry.queries("q_graph_harmonic")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ecc = SparkEntry.queries("q_graph_ecc")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cen.nonEmpty && cen.keySet === clo.keySet)
    cen.foreach { case (s, (_, cm, hm, ec)) =>
      assert(cm === clo(s) && hm === har(s) && ec === ecc(s),
        s"fused row diverged at seed $s: ($cm, $hm, $ec) vs " +
          s"(${clo(s)}, ${har(s)}, ${ecc(s)})")
    }
    // the weighted side: wcentral's closeness leg == q_graph_wcloseness
    val wcen = SparkEntry.queries("q_graph_wcentral")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    val wclo = SparkEntry.queries("q_graph_wcloseness")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(wcen === wclo && wcen.nonEmpty,
      s"weighted fused row diverged: $wcen vs $wclo")
    spark.catalog.clearCache()
  }

  test("louvain2 (r20): ring-of-cliques — level 1 is provably stuck, level 2 merges the pairs; exact Q pins") {
    // 10 triangles in a ring (the resolution-limit fixture): per-clique
    // communities score Q = 0.65 exactly; merging adjacent pairs
    // scores 0.675; NO single-node move improves (a bridge endpoint
    // loses 2 in-edges to gain 1), so level 1 must stand pat and the
    // contraction must find the 5 pair-merges within the 6-move budget
    val cliques = (0 until 10).map { i =>
      val b = 100L * i
      Seq((b + 1, b + 2, 1L), (b + 1, b + 3, 1L), (b + 2, b + 3, 1L))
    }
    val bridges = (0 until 10).map { i =>
      (100L * i + 3, 100L * ((i + 1) % 10) + 1, 1L)
    }
    val ew = symW(cliques.flatten ++ bridges)
    val l0 = (0 until 10).flatMap { i =>
      val b = 100L * i
      Seq((b + 1, b + 1), (b + 2, b + 1), (b + 3, b + 1))
    }.toDF("node", "label")
    val (l1, l2) = queries.GraphOps.louvain2On(ew, l0, 6)
    // level 1 stands pat
    val l1m = l1.as[(Long, Long)].collect().toMap
    assert(l1m === l0.as[(Long, Long)].collect().toMap,
      "a single-node move fired on the stuck fixture")
    // level 2: 5 communities of 6 nodes, adjacent cliques paired
    val l2g = l2.as[(Long, Long)].collect().toSeq.groupBy(_._2)
    assert(l2g.size === 5 && l2g.values.forall(_.size === 6),
      s"pairing drifted: ${l2g.view.mapValues(_.map(_._1).sorted).toMap}")
    // exact Q pins: 0.65 -> 0.675 (both exactly representable in micro)
    val q1 = queries.GraphOps.modularityWOn(ew, l1)
      .select(col("q_micro")).head.getLong(0)
    val q2 = queries.GraphOps.modularityWOn(ew, l2)
      .select(col("q_micro")).head.getLong(0)
    assert(q1 === 650000L && q2 === 675000L, s"Q pins drifted: $q1, $q2")
    spark.catalog.clearCache()
  }

  test("louvain2 (r20): randomized law — Q never decreases across levels (base <= l1 <= l2 in exact micro)") {
    val rnd = new scala.util.Random(29)
    (1 to 3).foreach { trial =>
      val n = 8 + rnd.nextInt(5)
      val und = (for {
        a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.35
      } yield (a, b, 1L + rnd.nextInt(4).toLong)).toSeq
      if (und.nonEmpty) {
        val ew = symW(und)
        val l0 = operators.LabelProp.runW(ew, 2)
        val (l1, l2) = queries.GraphOps.louvain2On(ew, l0, 4)
        def q(l: org.apache.spark.sql.DataFrame) = queries.GraphOps
          .modularityWOn(ew, l).select(col("q_micro")).head.getLong(0)
        val (q0, q1v, q2v) = (q(l0), q(l1), q(l2))
        assert(q0 <= q1v && q1v <= q2v,
          s"trial $trial: Q decreased across levels: $q0, $q1v, $q2v")
      }
      spark.catalog.clearCache()
    }
  }

  test("LabelProp: disjoint triangles each converge to one community; a bridge does not merge them in 3 rounds") {
    // triangles {1,2,3} and {11,12,13}, bridged by one 3–11 edge
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L)))
    val out = operators.LabelProp.run(g, 3)
      .as[(Long, Long)].collect().toMap
    // each triangle settles on a single internal label; the bridge
    // gives 3 and 11 one extra foreign vote — not a majority
    assert(Set(1L, 2L, 3L).map(out).size === 1)
    assert(Set(11L, 12L, 13L).map(out).size === 1)
    assert(out(1L) !== out(11L), "bridge merged distinct communities")
    // a replay of the same rounds is bit-identical (determinism)
    val again = operators.LabelProp.run(g, 3)
      .as[(Long, Long)].collect().toMap
    assert(again === out)
  }

  test("modularity (r17): two-clique-bridge fixture — exact Q pin; Q(labelprop) > Q(single community) = 0") {
    // two K4s {1..4}, {5..8}, one bridge 4–5: m = 13, M2 = 26.
    // Known-good partition {1-4 | 5-8}: A = 24 (directed in-community),
    // dsum = 13 per side, B = 338 ⟹ Q = 24/26 − 338/676 = 11/26 =
    // 0.423076923…, floor-micros 423076.
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val g = sym(k4a ++ k4b ++ Seq((4L, 5L)))
    val goodLabels = (1L to 8L).map(n => (n, if (n <= 4) 1L else 5L))
      .toDF("node", "label")
    val pinned = queries.GraphOps.modularityOn(g, goodLabels)
      .collect()(0)
    assert(pinned.getAs[Long]("n_comms") === 2L)
    assert(pinned.getAs[Long]("m_edges") === 13L)
    assert(pinned.getAs[Long]("q_micro") === 423076L)
    assert(pinned.getAs[Double]("q_modularity") === 0.423076)
    // the judge's done-criterion: the labelprop partition must beat
    // the single-community baseline (exactly 0 by construction)
    val lp = operators.LabelProp.run(g, 3)
    val qLp = queries.GraphOps.modularityOn(g, lp)
      .collect()(0).getAs[Long]("q_micro")
    val single = lp.select(col("node"), lit(1L).as("label"))
    val qOne = queries.GraphOps.modularityOn(g, single)
      .collect()(0).getAs[Long]("q_micro")
    assert(qOne === 0L, s"single-community Q must be exactly 0, got $qOne")
    assert(qLp > qOne, s"labelprop Q=$qLp did not beat single-community")
    spark.catalog.clearCache()
  }

  test("conductance (r17): two-clique-bridge fixture — exact phi pin; whole-graph community ships the null guard") {
    // same fixture as the modularity pin: K4 {1..4} — bridge — K4
    // {5..8}; per side vol = 13 directed edges, cut = 1 (the bridge),
    // phi = 10⁶ div min(13, 26−13) = 76923 floor-micros
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val g = sym(k4a ++ k4b ++ Seq((4L, 5L)))
    val goodLabels = (1L to 8L).map(n => (n, if (n <= 4) 1L else 5L))
      .toDF("node", "label")
    val out = queries.GraphOps.conductanceOn(g, goodLabels, 10).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_nodes") === 4L)
      assert(r.getAs[Long]("vol_deg") === 13L)
      assert(r.getAs[Long]("cut_deg") === 1L)
      assert(r.getAs[Long]("phi_micro") === 76923L)
    }
    // the whole-graph community has no outside: phi is NULL, not 0/0
    val single = goodLabels.select(col("node"), lit(1L).as("label"))
    val one = queries.GraphOps.conductanceOn(g, single, 10).collect()(0)
    assert(one.getAs[Long]("cut_deg") === 0L)
    assert(one.isNullAt(one.fieldIndex("phi_micro")))
    spark.catalog.clearCache()
  }

  test("richclub (r17): a planted K5 club over leaf-padded hubs scores phi = 1 exactly; empty club ships NULL") {
    // nodes 1..5 form K5 AND each carries 10 private leaves, so their
    // degree is 14 (> 8) while every leaf has degree 1: the >8 club is
    // exactly the K5 — 20 directed edges over 5·4 possible → φ = 1.
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val leaves = for (h <- 1L to 5L; j <- 0L until 10L)
      yield (h, 100L + h * 10L + j)
    val out = queries.GraphOps
      .richclubOn(sym(k5 ++ leaves), Seq(8L, 100L)).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(8L).getAs[Long]("n_nodes") === 5L)
    assert(out(8L).getAs[Long]("n_edges_dir") === 20L)
    assert(out(8L).getAs[Long]("phi_micro") === 1000000L)
    assert(out(100L).getAs[Long]("n_nodes") === 0L)
    assert(out(100L).isNullAt(out(100L).fieldIndex("phi_micro")))
    spark.catalog.clearCache()
  }

  test("modularity (r17): empty labeled edge set ships the null-guarded row, not a division error") {
    val g = sym(Seq((1L, 2L)))
    val noLabels = Seq.empty[(Long, Long)].toDF("node", "label")
    val r = queries.GraphOps.modularityOn(g, noLabels).collect()(0)
    assert(r.getAs[Long]("n_comms") === 0L)
    assert(r.isNullAt(r.fieldIndex("q_micro")))
    spark.catalog.clearCache()
  }

  /** Symmetrize an undirected weighted pair list. */
  private def symW(pairs: Seq[(Long, Long, Long)]) = {
    val p = pairs.toDF("src", "dst", "w")
    p.union(p.select(col("dst"), col("src"), col("w")))
  }

  test("modularity_w/conductance_w (r18): weight-1 edges reproduce the unweighted engines exactly") {
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val pairs = k4a ++ k4b ++ Seq((4L, 5L))
    val gw = symW(pairs.map { case (a, b) => (a, b, 1L) })
    val goodLabels = (1L to 8L).map(n => (n, if (n <= 4) 1L else 5L))
      .toDF("node", "label")
    val qw = queries.GraphOps.modularityWOn(gw, goodLabels).collect()(0)
    // the unweighted pin from the r17 fixture, verbatim
    assert(qw.getAs[Long]("n_comms") === 2L)
    assert(qw.getAs[Long]("w_total") === 13L)
    assert(qw.getAs[Long]("q_micro") === 423076L)
    val cw = queries.GraphOps.conductanceWOn(gw, goodLabels, 10).collect()
    assert(cw.length === 2)
    cw.foreach { r =>
      assert(r.getAs[Long]("vol_w") === 13L)
      assert(r.getAs[Long]("cut_w") === 1L)
      assert(r.getAs[Long]("phi_micro") === 76923L)
    }
    spark.catalog.clearCache()
  }

  test("modularity_w (r18): heavier in-community edges raise Q — exact hand-computed pin") {
    // bridge fixture with in-clique weight 3, bridge weight 1:
    // A = 24·3 = 72, W2 = 72 + 2 = 74, dsum = 37/side, B = 2·37² = 2738
    // ⟹ Q_w = 72/74 − 2738/5476 = 0.47297297…, floor-micros 472972 —
    // strictly above the unweighted 423076 (the bridge's relative
    // weight shrank).
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b, 3L)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b, 3L)
    val gw = symW(k4a ++ k4b ++ Seq((4L, 5L, 1L)))
    val goodLabels = (1L to 8L).map(n => (n, if (n <= 4) 1L else 5L))
      .toDF("node", "label")
    val qw = queries.GraphOps.modularityWOn(gw, goodLabels).collect()(0)
    assert(qw.getAs[Long]("w_total") === 37L)
    assert(qw.getAs[Long]("q_micro") === 472972L)
    assert(qw.getAs[Long]("q_micro") > 423076L)
    spark.catalog.clearCache()
  }

  test("labelprop_w (r19): weight-1 edges reproduce unweighted labelprop exactly") {
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val pairs = k4a ++ k4b ++ Seq((4L, 5L))
    val g = sym(pairs)
    val gw = symW(pairs.map { case (a, b) => (a, b, 1L) })
    val u = operators.LabelProp.run(g, 3).as[(Long, Long)].collect().toMap
    val w = operators.LabelProp.runW(gw, 3).as[(Long, Long)].collect().toMap
    assert(w === u)
    spark.catalog.clearCache()
  }

  test("labelprop_w (r19): a heavy edge outvotes two unit edges — the weighted vote flips the label") {
    // star: 0—1 (w1), 0—2 (w1), 0—3 (w3). Round 1 from identity labels:
    // node 0 sees labels {1, 2, 3} with weights {1, 1, 3} — the
    // unweighted vote ties at count 1 and breaks to the SMALLEST label
    // (1); the weighted vote picks 3 (wsum 3 > 1). Leaves see only
    // node 0 in both.
    val tri = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 3L))
    val u = operators.LabelProp.run(
        sym(tri.map { case (a, b, _) => (a, b) }), 1)
      .as[(Long, Long)].collect().toMap
    val w = operators.LabelProp.runW(symW(tri), 1)
      .as[(Long, Long)].collect().toMap
    assert(u(0L) === 1L, s"unweighted tie must break small: $u")
    assert(w(0L) === 3L, s"heavy edge must win the weighted vote: $w")
    assert(Seq(1L, 2L, 3L).forall(n => u(n) === 0L && w(n) === 0L))
    spark.catalog.clearCache()
  }

  test("refine_w (r19): weight-1 edges reproduce unweighted refine exactly on the mislabeled-bridge fixture") {
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val pairs = k4a ++ k4b ++ Seq((4L, 5L))
    val badLabels = (1L to 8L).map(n => (n, if (n <= 3) 1L else 5L))
      .toDF("node", "label")
    val u = queries.GraphOps.refineOn(sym(pairs), badLabels, 6)
      .as[(Long, Long)].collect().toMap
    val w = queries.GraphOps
      .refineWOn(symW(pairs.map { case (a, b) => (a, b, 1L) }), badLabels, 6)
      .as[(Long, Long)].collect().toMap
    assert(w === u)
    assert(w(4L) === 1L, "weight-1 refine must still move 4 home")
    spark.catalog.clearCache()
  }

  test("refine_w (r19): a HEAVY bridge flips the argmax — the weighted scorer keeps the node the unweighted scorer moves") {
    // The mislabeled-bridge fixture with the bridge at weight 10 and
    // in-clique edges at weight 1. Unweighted (weight-blind) refine
    // moves node 4 home to {1,2,3} (ΔQ·M2² = 136 > 0 — the r18 pin).
    // Weighted: W2 = 44, s_4 = 13, moving 4 → {1,2,3} has
    // ΔA·W2 = 2·(3−10)·44 = −616 and ΔB = 2·13·(9−35) + 2·13² = −338,
    // so ΔQ_w·W2² = −616 + 338 = −278 < 0; every other candidate is
    // also negative, so the weighted loop EXHAUSTS with node 4 staying
    // in the right clique's community — the heavy bridge holds it.
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val heavy = (k4a ++ k4b).map { case (a, b) => (a, b, 1L) } ++
      Seq((4L, 5L, 10L))
    val badLabels = (1L to 8L).map(n => (n, if (n <= 3) 1L else 5L))
      .toDF("node", "label")
    val u = queries.GraphOps
      .refineOn(sym(heavy.map { case (a, b, _) => (a, b) }), badLabels, 6)
      .as[(Long, Long)].collect().toMap
    assert(u(4L) === 1L, "unweighted refine must move 4 home")
    val w = queries.GraphOps.refineWOn(symW(heavy), badLabels, 6)
      .as[(Long, Long)].collect().toMap
    assert(w(4L) === 5L, s"heavy bridge must hold node 4: $w")
    // and the exhausted weighted result IS the weighted optimum among
    // the two: Q_w(stay) > Q_w(move home)
    val gw = symW(heavy)
    val qStay = queries.GraphOps.modularityWOn(gw, badLabels)
      .collect()(0).getAs[Long]("q_micro")
    val homeLabels = (1L to 8L).map(n => (n, if (n <= 4) 1L else 5L))
      .toDF("node", "label")
    val qMove = queries.GraphOps.modularityWOn(gw, homeLabels)
      .collect()(0).getAs[Long]("q_micro")
    assert(qStay > qMove,
      s"weighted Q must favor keeping 4 with the heavy bridge: $qStay <= $qMove")
    spark.catalog.clearCache()
  }

  test("refine (r18): a mislabeled bridge-fixture node moves home and Q strictly rises to the optimum pin") {
    // node 4 mislabeled into the right clique's community: in-community
    // directed edges A = 6 (triangle 123) + 12 (K4b) + 2 (bridge, both
    // endpoints now in 5's community) = 20, dsum = (9, 17), B = 370 ⟹
    // Q0 = 20/26 − 370/676 = 0.221893 (floor-micros 221893). The best
    // move is 4 → home (ΔQ·M2² = 4·26 + 32 = 136 > 0); after it the
    // partition is the r17 good-partition pin 423076 and the loop
    // exhausts (no single move improves the optimum).
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val g = sym(k4a ++ k4b ++ Seq((4L, 5L)))
    val badLabels = (1L to 8L).map(n => (n, if (n <= 3) 1L else 5L))
      .toDF("node", "label")
    val q0 = queries.GraphOps.modularityOn(g, badLabels)
      .collect()(0).getAs[Long]("q_micro")
    assert(q0 === 221893L)
    val refined = queries.GraphOps.refineOn(g, badLabels, 6)
    val q1 = queries.GraphOps.modularityOn(g, refined)
      .collect()(0).getAs[Long]("q_micro")
    assert(q1 === 423076L)
    assert(q1 > q0, s"refine did not strictly raise Q: $q0 -> $q1")
    // idempotence at the optimum: re-refining the refined partition
    // is the identity (exhaustion on the first round)
    val again = queries.GraphOps.refineOn(g, refined, 6)
      .as[(Long, Long)].collect().toMap
    assert(again === refined.as[(Long, Long)].collect().toMap)
    spark.catalog.clearCache()
  }

  test("projmod (r18): planted two-block bipartite ACCEPT — the full projection+LPA+fold pipeline scores Q = 0.5 exactly") {
    // suppliers {1..4} share parts {100..105} (6 each), suppliers
    // {11..14} share {200..205}; suppliers 4 and 11 share ONLY part
    // 300. Pair affinities: 12 within-block pairs at nc = 6, one
    // cross pair at nc = 1 → mean = 73/13, the above-mean cut keeps
    // exactly the within pairs (6·13 = 78 > 73) and drops the bridge
    // (13 < 73). The projection is two disjoint K4s; LPA gives one
    // label per block; Q = 24/24 − 2·12²/24² = 0.5 → 500000 micros —
    // the ACCEPT direction for the WHOLE graded pipeline, not just
    // the fold.
    val ps = (
      (for (sp <- 1L to 4L; p <- 100L to 105L) yield (p, sp)) ++
      (for (sp <- 11L to 14L; p <- 200L to 205L) yield (p, sp)) ++
      Seq((300L, 4L), (300L, 11L))).toDF("p", "sp")
    val edges = queries.GraphOps.projectionEdges(ps)
    val e = edges.as[(Long, Long)].collect().toSet
    assert(e.size === 24, s"projection edge count drifted: ${e.size}")
    assert(!e.contains((4L, 11L)) && !e.contains((11L, 4L)),
      "below-mean bridge survived the affinity cut")
    val q = queries.GraphOps.modularityOn(edges,
      operators.LabelProp.run(edges, 3)).collect()(0)
    assert(q.getAs[Long]("n_comms") === 2L)
    assert(q.getAs[Long]("m_edges") === 12L)
    assert(q.getAs[Long]("q_micro") === 500000L)
    // the facade carries caller column names onto the same engine
    val f = Graft.affinityProjection(
        ps.toDF("item", "actor"), "item", "actor")
      .as[(Long, Long)].collect().toSet
    assert(f === e)
    spark.catalog.clearCache()
  }

  test("refine (r18): randomized law — engine == exact BigInt driver replay, and Q never decreases") {
    val rnd = new scala.util.Random(42)
    // the exact greedy trajectory, replayed driver-side in BigInt
    def mirror(dir: Seq[(Long, Long)], labels0: Map[Long, Long],
               moves: Int): Map[Long, Long] = {
      var lab = labels0
      val deg = dir.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      val m2 = BigInt(dir.size)
      var done = false
      var r = 0
      while (!done && r < moves) {
        r += 1
        val dsum = lab.toSeq.groupBy(_._2).map { case (l, ns) =>
          l -> ns.map(x => deg.getOrElse(x._1, 0L)).sum }
        val kv = dir.groupBy(e => (e._1, lab(e._2)))
          .map { case (k, es) => k -> es.size.toLong }
        val pos = kv.toSeq.collect {
          case ((v, b), kvb) if b != lab(v) =>
            val a = lab(v)
            val kva = kv.getOrElse((v, a), 0L)
            val da = BigInt(2) * (BigInt(kvb) - BigInt(kva))
            val db = BigInt(2) * deg(v) * (BigInt(dsum(b)) - BigInt(dsum(a))) +
              BigInt(2) * deg(v) * deg(v)
            (da * m2 - db, v, b)
        }.filter(_._1 > 0)
        if (pos.isEmpty) done = true
        else {
          val best = pos.reduce { (x, y) =>
            if (y._1 > x._1 || (y._1 == x._1 &&
              (y._2 < x._2 || (y._2 == x._2 && y._3 < x._3)))) y else x
          }
          lab = lab.updated(best._2, best._3)
        }
      }
      lab
    }
    (1 to 4).foreach { trial =>
      val n = 8 + rnd.nextInt(5)
      val und = (for {
        a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      if (und.nonEmpty) {
        val dir = und ++ und.map { case (a, b) => (b, a) }
        val nodes = dir.map(_._1).distinct
        val lab0 = nodes.map(v => v -> (1L + rnd.nextInt(3))).toMap
        val g = sym(und)
        val l0df = lab0.toSeq.toDF("node", "label")
        val q0 = queries.GraphOps.modularityOn(g, l0df)
          .collect()(0).getAs[Long]("q_micro")
        val refined = queries.GraphOps.refineOn(g, l0df, 5)
        val got = refined.as[(Long, Long)].collect().toMap
        val want = mirror(dir, lab0, 5)
        assert(got === want, s"trial $trial diverged from the exact replay")
        val q1 = queries.GraphOps.modularityOn(g, refined)
          .collect()(0).getAs[Long]("q_micro")
        assert(q1 >= q0, s"trial $trial: Q decreased $q0 -> $q1")
        spark.catalog.clearCache()
      }
    }
  }
}
