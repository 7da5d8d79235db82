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

  import org.apache.spark.sql.types.DecimalType
  private val Dec38 = DecimalType(38, 0)
  private val Dec19 = DecimalType(19, 0)

  private val WorkCols =
    Seq("__ks_a", "__ks_ca", "__ks_cb", "__ks_cum_a", "__ks_cum_b",
      "__ks_na", "__ks_nb", "__ks_gap", "__ks_mx", "__ks_dv", "__ks_num",
      "__ks_s")

  private def checkNames(groupCols: Seq[String], valueCol: String): Unit = {
    val reserved = Seq("ks_stat", "ks_at", "emd", "tv", "n_a", "n_b") ++ WorkCols
    val clash = (groupCols :+ valueCol).intersect(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with the drift " +
        "family's outputs (ks_stat, ks_at, emd, tv, n_a, n_b) or their " +
        "__ks_* working columns; rename them before calling")
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

  /** Two-sample 1-D Wasserstein-1 (earth mover's) distance per group:
    * EMD = ∫∣F_A − F_B∣ dv over the pooled value axis — [[ksDrift]]'s
    * magnitude-sensitive companion (KS reports the worst POINT gap;
    * EMD the total probability mass × distance that must move, so a
    * small-but-everywhere shift and a large-but-local one separate).
    * Same engine shape and exclusion rules as [[ksDrift]].
    *
    * Float discipline — stronger than [[ksDrift]]'s: EMD is a SUM, and
    * a sum of doubles is summation-order-dependent (non-portable across
    * engines AND across Spark layouts). So the sum never touches
    * floats: each term ∣cum_a·n_b − cum_b·n_a∣·Δv is exact integer
    * arithmetic carried in DECIMAL(38,0) (headroom to corpus scale;
    * the oracle's HUGEINT twin), the aggregate is an exact decimal sum
    * (order-free), and the ONLY float work is the final
    * sum∕(n_a·n_b) division, rounded to 6dp to insulate the one
    * decimal→double conversion's ulp.
    *
    * @return groupCols…, emd (double, 6dp; NULL if either side is
    *         empty; 0.0 for identical single-point supports), n_a,
    *         n_b (long). */
  def emdDrift(df: DataFrame, groupCols: Seq[String], valueCol: String,
               sideA: Column): DataFrame = {
    checkNames(groupCols, valueCol)
    val gc = groupCols.map(col)
    val wCum = Window.partitionBy(gc: _*).orderBy(col(valueCol).asc)
    val wAll = Window.partitionBy(gc: _*)
    df.filter(col(valueCol).isNotNull && sideA.isNotNull)
      .select((gc :+ col(valueCol) :+ sideA.as("__ks_a")): _*)
      .groupBy((gc :+ col(valueCol)): _*)
      .agg(sum(when(col("__ks_a"), 1L).otherwise(0L)).as("__ks_ca"),
        sum(when(!col("__ks_a"), 1L).otherwise(0L)).as("__ks_cb"))
      .withColumn("__ks_cum_a", sum(col("__ks_ca")).over(wCum))
      .withColumn("__ks_cum_b", sum(col("__ks_cb")).over(wCum))
      .withColumn("__ks_na", sum(col("__ks_ca")).over(wAll))
      .withColumn("__ks_nb", sum(col("__ks_cb")).over(wAll))
      // value step to the next pooled value; the last value's CDFs are
      // both 1 beyond it, so its (NULL-lead) term is rightly dropped
      .withColumn("__ks_dv", lead(col(valueCol), 1).over(wCum) - col(valueCol))
      .withColumn("__ks_num",
        abs(col("__ks_cum_a").cast(Dec38) * col("__ks_nb").cast(Dec19)
            - col("__ks_cum_b").cast(Dec38) * col("__ks_na").cast(Dec19))
          * col("__ks_dv").cast(Dec19))
      .groupBy(gc: _*)
      .agg(sum(col("__ks_num")).as("__ks_s"),
        max(col("__ks_na")).as("n_a"),
        max(col("__ks_nb")).as("n_b"))
      .select(gc :+
        when(col("n_a") > 0 && col("n_b") > 0,
          round(coalesce(col("__ks_s").cast("double"), lit(0.0))
            / (col("n_a").cast("double") * col("n_b").cast("double")), 6))
          .as("emd") :+
        col("n_a") :+ col("n_b"): _*)
  }

  /** Two-sample total-variation distance per group:
    * TV = ½ · Σ over the pooled support of ∣p_A(v) − p_B(v)∣, where
    * p_A/p_B are the empirical pmfs of the rows with `sideA`
    * true/false. 0 = identical distributions, 1 = disjoint supports —
    * the L1 sibling of [[ksDrift]] (KS is the sup-norm of the CDF gap;
    * TV the half-L1 norm of the pmf gap) and the bound behind every
    * "a classifier can distinguish the splits with advantage ≤ TV"
    * argument, which is why distribution-shift audits quote it.
    *
    * Scale shape: identical to [[ksDrift]]'s distinct-value collapse,
    * but with NO cumulative window at all — each pooled value's term is
    * local, so after the hash-agg (shuffle ∝ distinct values) the whole
    * statistic is one more map-side-combining agg. Cheapest of the
    * family; the per-group windows of KS/EMD are not needed.
    *
    * Float discipline (§7.4, the [[emdDrift]] rule): TV is a SUM, so
    * the sum never touches floats — each term ∣ca·n_b − cb·n_a∣ is
    * exact integer arithmetic in DECIMAL(38,0) (the oracle's HUGEINT
    * twin), aggregated order-free; the ONLY float work is the final
    * sum∕(2·n_a·n_b) division, rounded to 6dp to insulate the one
    * decimal→double conversion's ulp.
    *
    * @return one row per group: groupCols…, tv (double, 6dp; NULL if
    *         either side is empty), n_a, n_b (long). */
  def tvDrift(df: DataFrame, groupCols: Seq[String], valueCol: String,
              sideA: Column): DataFrame = {
    checkNames(groupCols, valueCol)
    val gc = groupCols.map(col)
    val wAll = Window.partitionBy(gc: _*)
    df.filter(col(valueCol).isNotNull && sideA.isNotNull)
      .select((gc :+ col(valueCol) :+ sideA.as("__ks_a")): _*)
      .groupBy((gc :+ col(valueCol)): _*)
      .agg(sum(when(col("__ks_a"), 1L).otherwise(0L)).as("__ks_ca"),
        sum(when(!col("__ks_a"), 1L).otherwise(0L)).as("__ks_cb"))
      .withColumn("__ks_na", sum(col("__ks_ca")).over(wAll))
      .withColumn("__ks_nb", sum(col("__ks_cb")).over(wAll))
      .withColumn("__ks_num",
        abs(col("__ks_ca").cast(Dec38) * col("__ks_nb").cast(Dec19)
          - col("__ks_cb").cast(Dec38) * col("__ks_na").cast(Dec19)))
      .groupBy(gc: _*)
      .agg(sum(col("__ks_num")).as("__ks_s"),
        max(col("__ks_na")).as("n_a"),
        max(col("__ks_nb")).as("n_b"))
      .select(gc :+
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("__ks_s").cast("double")
            / (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")), 6))
          .as("tv") :+
        col("n_a") :+ col("n_b"): _*)
  }

  /** Pearson chi-squared independence audit between two categorical
    * columns, with Cramér's V — "is my corpus's `source` mix the same
    * in every `lang`?", the stratification-bias check behind mixture
    * reweighting. NULL categories are excluded.
    *
    * Scale shape: the corpus collapses to its contingency cells first
    * (hash-agg, shuffle ∝ ∣A∣·∣B∣ distinct pairs — for audit columns
    * that is KBs at any corpus size); everything after runs on the
    * cell table. Row/column/grand totals are windows over the cells.
    * Each cell's (O−E)²∕E term is rational with a CELL-SPECIFIC
    * denominator, so (unlike [[emdDrift]]) the sum cannot stay integer:
    * instead it runs as an ORDERED running-sum window in (a, b) order —
    * layout-independent inside Spark and order-matched to the oracle —
    * and chi2/V ship ROUNDED at 6dp so a summation-order ulp can never
    * flip the compare. Cramér's V uses sqrt, which IEEE 754 REQUIRES
    * correctly rounded (unlike ln/exp — why this audit is exactly
    * gradeable and a PSI/KL one is not).
    *
    * @return ONE row: chi2 (double, 6dp), dof (long), cramers_v
    *         (double, 6dp; NULL when dof = 0), n_cells, n (long). */
  def chiSquared(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("__ks_o"))
    val wA = Window.partitionBy(col(aCol))
    val wB = Window.partitionBy(col(bCol))
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy(col(aCol).asc, col(bCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("__ks_ra", sum(col("__ks_o")).over(wA))
      .withColumn("__ks_cb", sum(col("__ks_o")).over(wB))
      .withColumn("__ks_n", sum(col("__ks_o")).over(wAll))
      .withColumn("__ks_e",
        col("__ks_ra").cast("double") * col("__ks_cb").cast("double")
          / col("__ks_n").cast("double"))
      .withColumn("__ks_t",
        (col("__ks_o").cast("double") - col("__ks_e"))
          * (col("__ks_o").cast("double") - col("__ks_e")) / col("__ks_e"))
      .withColumn("__ks_run", sum(col("__ks_t")).over(wOrd))
      .agg(max(col("__ks_run")).as("chi2"),
        ((countDistinct(col(aCol)) - 1) * (countDistinct(col(bCol)) - 1))
          .as("__ks_dof"),
        (least(countDistinct(col(aCol)), countDistinct(col(bCol))) - 1)
          .as("__ks_mindim"),
        count(lit(1)).as("n_cells"),
        max(col("__ks_n")).as("n"))
      // empty input still yields the one global row (it is a global
      // aggregate) — but with NULL dof, not the (0−1)·(0−1)=1 artifact
      .select(round(col("chi2"), 6).as("chi2"),
        when(col("n_cells") > 0, col("__ks_dof")).as("dof"),
        when(col("__ks_mindim") > 0,
          round(sqrt(col("chi2") / (col("n").cast("double") *
            col("__ks_mindim").cast("double"))), 6)).as("cramers_v"),
        col("n_cells"), col("n"))
  }
}
