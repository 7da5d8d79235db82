package graft

import org.apache.spark.sql.functions._

/** Scratch A/B harness (not graded) for the q_llm_editdup prescreen
  * economics: counts length-band candidates, L1-prescreen survivors,
  * and DP survivors, and times the verify leg with and without the
  * prescreen. Evidence feeds BASELINE.md's editdup section. */
object EditAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val maxD = 64
    val docs = Tables.documents(spark, sfDir)
    val t = docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
      length(col("text")).as("len"),
      call_function("graft_charhist", col("text")).as("hist"))
      .persist()
    t.count()
    val bkt = expr(s"len div $maxD")
    val a = t.select(col("doc_id").as("doc_a"), col("text").as("t_a"),
      col("len").as("l_a"), col("hist").as("h_a"), bkt.as("bk"),
      col("lang").as("a_lang"), col("source").as("a_source"))
    val b = t.select(col("doc_id").as("doc_b"), col("text").as("t_b"),
      col("len").as("l_b"), col("hist").as("h_b"),
      explode(array(bkt - 1, bkt, bkt + 1)).as("bkp"),
      col("lang").as("b_lang"), col("source").as("b_source"))
    val baseCond = col("bk") === col("bkp") && col("doc_a") < col("doc_b") &&
      abs(col("l_a") - col("l_b")) <= maxD &&
      col("a_lang") === col("b_lang") && col("a_source") === col("b_source")
    val cand = a.join(b, baseCond).persist()
    val nCand = cand.count()
    val l1 = call_function("graft_l1", col("h_a"), col("h_b"))
    val nPre = cand.filter(l1 <= 2 * maxD).count()
    val nDp = cand.filter(expr(s"levenshtein(t_a, t_b, $maxD)").between(0, maxD)).count()
    println(s"[editab] candidates=$nCand l1_survivors=$nPre dp_survivors=$nDp " +
      f"prune=${100.0 * (nCand - nPre) / math.max(nCand, 1)}%.1f%%")
    // timed verify legs over the persisted candidate set (DP cost only)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[editab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }
    time("verify_dp_only") {
      cand.filter(expr(s"levenshtein(t_a, t_b, $maxD)").between(0, maxD)).count()
    }
    time("verify_l1_then_dp") {
      cand.filter(l1 <= 2 * maxD)
        .filter(expr(s"levenshtein(t_a, t_b, $maxD)").between(0, maxD)).count()
    }
    // L1 distribution of DP-failing candidates: how separable are they?
    cand.withColumn("l1", l1)
      .withColumn("pass", expr(s"levenshtein(t_a, t_b, $maxD)").between(0, maxD))
      .groupBy(col("pass"))
      .agg(count(lit(1)).as("n"), min("l1"), expr("percentile(l1, 0.1)"),
        expr("percentile(l1, 0.5)"), expr("percentile(l1, 0.9)"), max("l1"))
      .show(false)
    spark.stop()
  }
}
