package graft

import org.apache.spark.sql.functions._

/** Scratch microbenchmark (not graded): isolate the per-row cost of the
  * betweenness σ aggregation shapes — decimal(38,0) sum vs long sum vs
  * decimal(18,0) sum at the betwsweep level-3 cardinality. */
object ScratchAgg {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val base = spark.range(15000000L)
      .select((col("id") % 132000).as("k"), (col("id") % 1000 + 1).as("v"))
      .persist()
    base.count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      time(s"sum long        run$i") {
        noop(base.groupBy("k").agg(sum(col("v"))))
      }
      time(s"sum dec38       run$i") {
        noop(base.groupBy("k").agg(sum(col("v").cast("decimal(38,0)"))))
      }
      time(s"sum dec18       run$i") {
        noop(base.groupBy("k").agg(sum(col("v").cast("decimal(18,0)"))))
      }
      time(s"sum dec38 post-shuffle run$i") {
        noop(base.repartition(32, col("k"))
          .groupBy("k").agg(sum(col("v").cast("decimal(38,0)"))))
      }
    }
    spark.stop()
  }
}
