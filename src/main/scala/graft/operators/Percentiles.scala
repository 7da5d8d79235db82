package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT percentiles over arbitrary (group, value) columns —
  * the engine behind the graded `q_agg_pctile` / `q_agg_pctile_disc` and
  * [[graft.Graft.percentiles]] / [[graft.Graft.percentilesDisc]].
  *
  * Spark's native `percentile()` buffers every distinct value of a group
  * inside a heap-only ObjectHashAggregate buffer (no spill): with few
  * groups that is an executor OOM at corpus scale. This plan is bounded
  * at any scale:
  *
  *  1. pre-aggregate `(group, value) → count` — one map-side-combining
  *     hash agg, shuffle ∝ DISTINCT values per group, never rows;
  *  2. cumulative-count window over the distinct values — WindowExec
  *     sorts spill to disk, unlike the aggregation buffer;
  *  3. locate each requested rank by flagging the one distinct value
  *     whose cumulative range covers it, and reduce with `max(when…)` —
  *     a plain hash aggregate down to one row per group.
  *
  * Determinism (§7.4): the continuous form interpolates in double with a
  * fixed expression shape, so an engine twin running the same CTE
  * produces the identical IEEE sequence; the discrete form carries ZERO
  * float arithmetic (integer rank math, the answer is a stored value).
  */
object Percentiles {

  private def marked(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     weightCol: Option[String] = None): DataFrame = {
    val gc = groupCols.map(col)
    val wRun = Window.partitionBy(groupCols.map(col): _*).orderBy(col("v"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    // unweighted = weight 1 per row (sum(1) ≡ count, same plan shape);
    // weights must be integral (non-integral values TRUNCATE toward
    // zero via the long cast) — ranks stay exact integer arithmetic.
    // NULL weights count as 0, and zero-total values are dropped below.
    val w = weightCol.map(c => coalesce(col(c).cast("long"), lit(0L)))
      .getOrElse(lit(1L))
    // NULL values are EXCLUDED, matching SQL percentile_cont/_disc —
    // counted in, they would shift every rank AND sort to opposite ends
    // on Spark (nulls first) vs DuckDB (nulls last).
    df.filter(col(valueCol).isNotNull)
      .groupBy((gc :+ col(valueCol).as("v")): _*)
      .agg(sum(w).as("cnt"))
      .filter(col("cnt") > 0)
      .withColumn("cum_end", sum("cnt").over(wRun))
      .withColumn("n", sum("cnt").over(wAll))
      .withColumn("cum_start", col("cum_end") - col("cnt"))
  }

  /** Continuous (interpolated, SQL `percentile_cont`) percentiles: rank
    * r = p·(n−1) over the 0-based sorted multiset, linear interpolation
    * between the two neighbouring stored values, computed in double.
    * NULL values are excluded (SQL semantics); a group with only NULLs
    * disappears from the result.
    *
    * @param ps (fraction in [0,1], output column name) per percentile.
    * @return one row per group: groupCols…, one double column per
    *         requested percentile, `n` (group count). */
  def cont(df: DataFrame, groupCols: Seq[String], valueCol: String,
           ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (p, _) => p >= 0 && p <= 1 },
      s"percentile fractions must be in [0,1]: ${ps.map(_._1)}")
    val gc = groupCols.map(col)
    val withRanks = ps.zipWithIndex.foldLeft(marked(df, groupCols, valueCol)) {
      case (acc, ((p, _), i)) =>
        acc.withColumn(s"r$i", lit(p) * (col("n") - 1).cast("double"))
    }
    // the single distinct value whose cumulative range covers rank k
    def hit(r: Column, edge: Column => Column): Column = {
      val k = edge(r).cast("long")
      max(when(col("cum_start") <= k && k < col("cum_end"),
        col("v").cast("double")))
    }
    val aggs = ps.zipWithIndex.flatMap { case (_, i) =>
      Seq(hit(col(s"r$i"), floor).as(s"lo$i"),
        hit(col(s"r$i"), ceil).as(s"hi$i"),
        max(col(s"r$i")).as(s"r$i"))
    } :+ max(col("n")).as("n")
    val outs = ps.zipWithIndex.map { case ((_, name), i) =>
      (col(s"lo$i") +
        (col(s"r$i") - floor(col(s"r$i"))) * (col(s"hi$i") - col(s"lo$i")))
        .as(name)
    }
    withRanks.groupBy(gc: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((gc ++ outs) :+ col("n"): _*)
  }

  /** Discrete (type-1 order statistic, SQL `percentile_disc`)
    * percentiles: the smallest STORED value whose cumulative count
    * reaches ⌈p·n⌉. The fraction is an exact rational `num/den` so the
    * rank is pure integer arithmetic (⌈a/b⌉ = (a+b−1) div b) — no float
    * boundary at any n, which a double `ceil(p*n)` cannot guarantee
    * when p·n lands on an integer.
    *
    * @param ps (numerator, denominator, output column name) per
    *           percentile, e.g. (1, 2, "median").
    * @param weightCol optional INTEGRAL per-row weight: the result
    *                  becomes the weighted percentile — the smallest
    *                  value whose cumulative WEIGHT reaches ⌈p·W⌉ (W =
    *                  total group weight), exactly equivalent to
    *                  replicating each row `weight` times. Ranks stay
    *                  pure integer arithmetic. Non-integral weights
    *                  TRUNCATE toward zero; NULL weights count as 0;
    *                  values whose total weight is 0 are dropped.
    *                  NULL values are excluded, as in [[cont]].
    * @return one row per group: groupCols…, one column per requested
    *         percentile in the VALUE column's own type, `n` (count or
    *         total weight). */
  def disc(df: DataFrame, groupCols: Seq[String], valueCol: String,
           ps: Seq[(Int, Int, String)],
           weightCol: Option[String] = None): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (a, b, _) => b > 0 && a >= 0 && a <= b },
      s"percentile rationals must be 0 <= num/den <= 1: ${ps.map(t => (t._1, t._2))}")
    val gc = groupCols.map(col)
    val withRanks = ps.zipWithIndex.foldLeft(
      marked(df, groupCols, valueCol, weightCol)) {
      case (acc, ((num, den, _), i)) =>
        // clamp to rank 1: ⌈0·n⌉ = 0 matches no cumulative range, but
        // percentile_disc(0) is defined as the group minimum
        acc.withColumn(s"k$i",
          expr(s"greatest(1L, ($num * n + ${den - 1}) div $den)"))
    }
    // the distinct value covering 1-based rank k: cum_start < k ≤ cum_end
    val aggs = ps.zipWithIndex.map { case ((_, _, name), i) =>
      max(when(col("cum_start") < col(s"k$i") && col(s"k$i") <= col("cum_end"),
        col("v"))).as(name)
    } :+ max(col("n")).as("n")
    withRanks.groupBy(gc: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((gc ++ ps.map(t => col(t._3))) :+ col("n"): _*)
  }
}
