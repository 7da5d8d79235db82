package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Hash-min connected components: hand-built graphs (multi-round chain,
  * disjoint components, dup/self-loop edges) plus a randomized mirror
  * against a driver-side union-find. */
class ConnectedComponentsSuite extends SparkSuite {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rep")).toMap
    spark.catalog.clearCache() // release the final persisted label table
    out
  }

  /** Driver-side union-find oracle. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("path graph needs multiple rounds; min label reaches the far end") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(cc(chain) === (1L to 9L).map(_ -> 1L).toMap)
  }

  test("disjoint components get their own min reps; dups/self-loops tolerated") {
    val edges = Seq((2L, 3L), (3L, 7L), (7L, 2L), (2L, 3L), (5L, 5L), (10L, 11L))
    assert(cc(edges) === Map(2L -> 2L, 3L -> 2L, 7L -> 2L, 5L -> 5L,
      10L -> 10L, 11L -> 10L))
  }

  test("randomized mirror vs driver-side union-find") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(120)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    assert(cc(edges) === brute(edges))
  }

  test("empty edge list converges to an empty labeling (no NPE on the null SUM)") {
    assert(cc(Seq.empty[(Long, Long)]) === Map.empty)
  }

  test("non-convergence throws instead of returning a partial labeling") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    intercept[IllegalArgumentException] {
      ConnectedComponents.run(chain.toDF("a", "b"), maxIter = 2).collect()
    }
    spark.catalog.clearCache()
  }

  test("PROPERTY: path graphs swept across the maxIter boundary — exact result or clean throw, never partial") {
    // The documented adversarial case: hash-min needs ~diameter rounds,
    // and large-star/small-star is deliberately NOT implemented (dedup
    // components are near-cliques). This sweep pins the CONTRACT that
    // makes that omission safe: for every path length, the caller gets
    // either the exact fixpoint or the convergence `require` — a
    // diameter past the cap can never silently return the intermediate
    // (wrong) labeling. Min reaches the far end of an n-node path after
    // n-1 propagation rounds (round 1 is fused into init) plus one
    // no-change round to detect the fixpoint.
    val maxIter = 5
    (3 to 10).foreach { n =>
      val chain = (1L to n.toLong).sliding(2).map(s => (s(0), s(1))).toSeq
      try {
        val out = ConnectedComponents.run(chain.toDF("a", "b"), maxIter)
          .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rep")).toMap
        // converged ⟹ EXACT: every node labeled with the global min
        assert(out === (1L to n.toLong).map(_ -> 1L).toMap,
          s"n=$n converged to a non-fixpoint labeling: $out")
        assert(n <= maxIter + 1, s"n=$n cannot converge in $maxIter rounds yet returned")
      } catch {
        case _: IllegalArgumentException =>
          assert(n > maxIter, s"n=$n (diameter ${n - 1}) should fit in $maxIter rounds")
      } finally spark.catalog.clearCache()
    }
  }
}
