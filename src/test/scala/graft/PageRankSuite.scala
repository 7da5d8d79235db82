package graft

import org.apache.spark.sql.functions._

/** Behavior pins for operators.PageRank (the exactness-vs-mirror law
  * lives in PropertySuite; the oracle parity in q_graph_pagerank). */
class PageRankSuite extends SparkSuite {
  import spark.implicits._

  private def pr(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Double] =
    graft.operators.PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("star: the hub's targets outrank the hub; every node keeps the floor") {
    val r = pr(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L))
    assert(r.keySet === Set(1L, 2L, 3L, 4L))
    assert(r(2L) === r(3L) && r(3L) === r(4L), "symmetric targets must tie")
    assert(r(2L) > r(1L), "targets receive mass, the source only the floor")
    // floor = (1-d)/N after any iteration with no in-edges
    assert(r(1L) === BigDecimal(0.15 / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("cycle: symmetric nodes stay exactly tied at 1/N-rounded mass") {
    val r = pr(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L))
    assert(r.values.toSet.size === 1, s"cycle must stay symmetric: $r")
    // r' = 0.15/3 + 0.85*(1/3), every iteration a fixed point at 6dp
    assert(r(1L) === 0.333333)
  }

  test("duplicate input edges count once (the distinct contract)") {
    val once = pr(Seq(1L -> 2L, 3L -> 2L))
    val duped = pr(Seq(1L -> 2L, 1L -> 2L, 3L -> 2L, 3L -> 2L, 3L -> 2L))
    assert(once === duped)
  }

  test("dangling node: receives rank, contributes nothing, no NaN/null") {
    val r = pr(Seq(1L -> 2L)) // 2 has no out-edges
    assert(r(2L) > r(1L) && !r(2L).isNaN && !r(1L).isNaN)
    // non-redistributing formulation: total mass may shrink, never grow
    assert(r.values.sum <= 1.0 + 1e-9)
  }

  test("iterations = 0 returns the uniform start; negative throws") {
    val r = pr(Seq(1L -> 2L, 2L -> 3L), iters = 0)
    assert(r.values.toSet === Set(1.0 / 3.0))
    intercept[IllegalArgumentException] {
      graft.operators.PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), -1)
    }
  }

  test("empty edge list yields an empty ranking (no NPE, no 0-division row)") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.PageRank.run(empty, 3).count() === 0L)
  }

  test("plan: rank refresh joins are equi-joins — no cartesian beyond the 1-row N broadcast") {
    val df = graft.operators.PageRank.run(
      Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst"), 3)
    val plan = df.queryExecution.executedPlan.toString
    val cartesians = "CartesianProduct".r.findAllIn(plan).length
    assert(cartesians === 0,
      s"PageRank planned a CartesianProduct (the N carrier must stay a " +
        s"broadcast nested loop over ONE row):\n$plan")
  }

  test("plan: the contribution sum is a hash aggregate — NO per-hop Window") {
    // The rejected first-cut design summed contributions through an
    // ordered running-sum window: an EDGE-SIZED sort + exchange per hop,
    // the 100-TB bottleneck. The quantized-decimal design needs no
    // ordering at all (exact integer sum, map-side combining) — pin
    // that no Window node can sneak back into the iteration body.
    val df = graft.operators.PageRank.run(
      Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L).toDF("src", "dst"), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"PageRank re-grew a Window stage (edge-sized sort per hop):\n$plan")
  }
}
