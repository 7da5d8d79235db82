package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift audits between two samples of one corpus — the
  * QA pass a training pipeline runs after every split/sample/reweight
  * step ("did the hash split bias doc lengths per language?").
  *
  * Scale shape is the [[Percentiles]] engine's: the corpus collapses to
  * its DISTINCT (group, value) pairs first (hash-agg with map-side
  * combine — shuffle ∝ distinct values, never ∝ rows), then cumulative
  * windows partitioned by group walk the pooled value axis. Window
  * parallelism = group count, the same documented trade as the
  * percentile engine; the row count under each window is bounded by the
  * value domain (doc lengths, scores), not the corpus.
  *
  * Float discipline (§7.4): counts stay integers end-to-end; each CDF
  * step is ONE IEEE division of exact int64s, the gap ONE subtraction +
  * abs — all deterministic primitives, so results ship UNROUNDED and
  * still compare bitwise across engines. No transcendentals.
  */
object Drift {

  private val WorkCols =
    Seq("__ks_a", "__ks_ca", "__ks_cb", "__ks_cum_a", "__ks_cum_b",
      "__ks_na", "__ks_nb", "__ks_gap", "__ks_mx")

  private def checkNames(groupCols: Seq[String], valueCol: String): Unit = {
    val reserved = Seq("ks_stat", "ks_at", "n_a", "n_b") ++ WorkCols
    val clash = (groupCols :+ valueCol).intersect(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with ksDrift's " +
        "output (ks_stat, ks_at, n_a, n_b) or its __ks_* working " +
        "columns; rename them before calling")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per group:
    * KS = max over the pooled value axis of ∣F_A(v) − F_B(v)∣, where
    * F_A/F_B are the empirical CDFs of the rows with `sideA`
    * true/false. 0 = identical distributions, 1 = disjoint supports —
    * THE nonparametric "did this split/sample shift the distribution"
    * number (Smirnov 1939; critical value at α: c(α)·√((nA+nB)/(nA·nB)),
    * left to the caller — the statistic is the engine's job, the
    * threshold is policy).
    *
    * Exact, not sketched: every distinct value is a candidate argmax, so
    * the max is over the full pooled support. NULL values and NULL side
    * flags are excluded before counting. A group where either side is
    * empty has no defined KS — ks_stat/ks_at are NULL there (explicit
    * `when` guard: engines disagree on x/0 semantics, NULL is the
    * portable answer).
    *
    * @param df        input rows.
    * @param groupCols audit strata (e.g. language); empty = one global
    *                  statistic.
    * @param valueCol  numeric/orderable column whose distribution is
    *                  compared.
    * @param sideA     boolean column/expression: true → sample A,
    *                  false → sample B, NULL → excluded.
    * @return one row per group: groupCols…, ks_stat (double, unrounded),
    *         ks_at (valueCol's type — the SMALLEST value attaining the
    *         max gap, so ties are deterministic), n_a, n_b (long). */
  def ksDrift(df: DataFrame, groupCols: Seq[String], valueCol: String,
              sideA: Column): DataFrame = {
    checkNames(groupCols, valueCol)
    val gc = groupCols.map(col)
    val wCum = Window.partitionBy(gc: _*).orderBy(col(valueCol).asc)
    val wAll = Window.partitionBy(gc: _*)
    df.filter(col(valueCol).isNotNull && sideA.isNotNull)
      .select((gc :+ col(valueCol) :+ sideA.as("__ks_a")): _*)
      // pooled distinct-value counts per side: the ONLY row-proportional
      // stage, and it combines map-side (shuffle ∝ distinct values)
      .groupBy((gc :+ col(valueCol)): _*)
      .agg(sum(when(col("__ks_a"), 1L).otherwise(0L)).as("__ks_ca"),
        sum(when(!col("__ks_a"), 1L).otherwise(0L)).as("__ks_cb"))
      .withColumn("__ks_cum_a", sum(col("__ks_ca")).over(wCum))
      .withColumn("__ks_cum_b", sum(col("__ks_cb")).over(wCum))
      .withColumn("__ks_na", sum(col("__ks_ca")).over(wAll))
      .withColumn("__ks_nb", sum(col("__ks_cb")).over(wAll))
      .withColumn("__ks_gap",
        when(col("__ks_na") > 0 && col("__ks_nb") > 0,
          abs(col("__ks_cum_a").cast("double") / col("__ks_na").cast("double")
            - col("__ks_cum_b").cast("double") / col("__ks_nb").cast("double"))))
      // argmax needs the group max beside each row; same partitioning,
      // zero extra shuffle (third Window node on the existing exchange)
      .withColumn("__ks_mx", max(col("__ks_gap")).over(wAll))
      .groupBy(gc: _*)
      .agg(max(col("__ks_gap")).as("ks_stat"),
        min(when(col("__ks_gap") === col("__ks_mx"), col(valueCol)))
          .as("ks_at"),
        max(col("__ks_na")).as("n_a"),
        max(col("__ks_nb")).as("n_b"))
  }
}
