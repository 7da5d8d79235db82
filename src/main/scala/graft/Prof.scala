package graft

/** Scratch profiler (not graded): time selected queries warm vs cold. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_scan", "q_llm_neardup", "q_llm_ngram", "q_llm_minhash",
        "q_llm_ann", "q_topk_group", "q_stream_session", "q_llm_embdup_lsh",
        "q_llm_ivf", "q_join_theta")
    // warmup: pay the cold floor on a trivial query
    SparkEntry.queries("q_scan")(spark, sfDir).count()
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // outside the timed window
        println(f"[prof] $n%-20s run$i $elapsed%8.3f s")
      }
    }
    spark.stop()
  }
}
