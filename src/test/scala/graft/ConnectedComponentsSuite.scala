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
}
