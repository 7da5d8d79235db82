package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge.eagerCut

/** Scratch probe (not graded): decompose Betweenness.forward's slow
  * round 3 at 16 pivots on the graded sf0.1 graph into variants. */
object ScratchSigma {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dec = "decimal(38,0)"
    val e0 = graft.queries.GraphOps.copurchaseEdges(spark, sfDir)
    val e = e0.select(col("src"), col("dst")).persist()
    e.count()
    val seeds = e.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      .orderBy(col("dg").desc, col("src").asc).limit(16)
      .select(col("src").as("seed"), col("src").as("node"))
    def round(settled: org.apache.spark.sql.DataFrame,
              frontier: org.apache.spark.sql.DataFrame, r: Int) = e
      .join(frontier
        .select(col("seed"), col("node").as("src"), col("sigma")),
        Seq("src"))
      .groupBy(col("seed"), col("dst").as("node"))
      .agg(sum(col("sigma")).as("sigma"))
      .join(settled.select(col("seed"), col("node")),
        Seq("seed", "node"), "left_anti")
      .select(col("seed"), col("node"), lit(r).cast("long").as("d"),
        col("sigma").cast(dec).as("sigma"))
    var (settled, _) = eagerCut(seeds.select(col("seed"), col("node"),
      lit(0).cast("long").as("d"), lit(1).cast(dec).as("sigma")))
    var frontier = settled
    (1 to 2).foreach { r =>
      val (nxt, c) = eagerCut(round(settled, frontier, r))
      println(s"[sigma] round $r new=$c")
      settled = settled.unionByName(nxt)
      frontier = nxt
    }
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val res = f
      println(f"[sigma] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($res)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save(); "-"
    }
    time("fanout join only (noop)") {
      noop(e.join(frontier.select(col("seed"), col("node").as("src"),
        col("sigma")), Seq("src")))
    }
    time("fanout count rows") {
      e.join(frontier.select(col("seed"), col("node").as("src")),
        Seq("src")).count()
    }
    time("join+agg dec38, no anti (noop)") {
      noop(e.join(frontier.select(col("seed"), col("node").as("src"),
          col("sigma")), Seq("src"))
        .groupBy(col("seed"), col("dst").as("node"))
        .agg(sum(col("sigma")).as("sigma")))
    }
    time("join+agg long, no anti (noop)") {
      noop(e.join(frontier.select(col("seed"), col("node").as("src"),
          col("sigma").cast("long").as("sl")), Seq("src"))
        .groupBy(col("seed"), col("dst").as("node"))
        .agg(sum(col("sl")).as("sigma")))
    }
    time("full round dec38 (noop)") {
      noop(round(settled, frontier, 3))
    }
    time("full round dec38 (eagerCut)") {
      eagerCut(round(settled, frontier, 3))._2
    }
    time("full round long (noop)") {
      noop(e.join(frontier.select(col("seed"), col("node").as("src"),
          col("sigma").cast("long").as("sl")), Seq("src"))
        .groupBy(col("seed"), col("dst").as("node"))
        .agg(sum(col("sl")).as("sigma"))
        .join(settled.select(col("seed"), col("node")),
          Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(3L).as("d"), col("sigma")))
    }
    spark.stop()
  }
}
