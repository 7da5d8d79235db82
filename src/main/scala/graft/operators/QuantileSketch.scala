package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile sketch (KLL-family fixed-capacity compactor
  * hierarchy — Karnin/Lang/Liberty FOCS 2016 shape, with DETERMINISTIC
  * alternating-parity compaction instead of coin flips) — the fourth
  * standard sketch of a 100 TB pipeline, next to approx_count_distinct
  * (HLL), the Misra-Gries heavy hitters, and the bloom membership
  * screen. The exact [[Percentiles]] engine is scale-safe but pays a
  * shuffle ∝ distinct values; at 100 TB the screening-grade percentile
  * is a sketch whose shuffle is O(k·log(n/k)·partitions) rows
  * REGARDLESS of input size — this is that screen.
  *
  * Shape (the [[HeavyHitters]] discipline): each input partition folds
  * its rows through a compactor hierarchy — level i holds ≤ k items of
  * weight 2^i; a full level sorts, keeps every other item (parity
  * alternating per level), and promotes the k/2 survivors to level i+1
  * — then ONLY the ≤ k·(H+1) coreset rows per partition are shipped.
  * The union of per-partition coresets is itself a weighted coreset
  * (merge = union; no re-compaction needed at these sizes), and the
  * estimate is the exact weighted quantile over that tiny table.
  *
  * Error contract (unit-pinned + ScalaCheck law, layout-independent):
  * one compaction at level i perturbs any rank by ≤ 2^i, and at most
  * n/(k·2^i) compactions can occur at level i (each consumes k·2^i
  * mass of the n total), so each level contributes ≤ n/k rank error
  * and the whole sketch ≤ H·n/k, H = highest realized level. Summing
  * per-partition bounds keeps the guarantee under ANY partitioning:
  * rank error ≤ H_max·n/k with H_max the largest realized level. Both
  * n (= Σ weights) and H (= log2(max weight)) are recoverable from the
  * coreset itself, so the reported `err_bound` column needs no second
  * pass. The GUARANTEE is partition-invariant; the estimates are
  * deterministic given a partitioning but not across partitionings —
  * why this is a unit-only capability beside the oracle-graded exact
  * engine (the [[HeavyHitters]]/approx_count_distinct precedent).
  * NULL and NaN values are skipped (documented; the exact engine's
  * callers filter them upstream).
  */
object QuantileSketch {

  /** Driver-side compactor hierarchy — the same code path the
    * mapPartitions fold runs per partition; exposed for the property
    * suite to exercise update/merge laws without a SparkSession. */
  final class Summary(val k: Int) extends Serializable {
    require(k >= 4 && k % 2 == 0, s"k must be even and >= 4, got $k")
    private[QuantileSketch] val levels = ArrayBuffer(ArrayBuffer.empty[Double])
    private[QuantileSketch] val parity = ArrayBuffer(false)
    var n: Long = 0L

    /** Exact structural snapshot (n, parity flags, level contents) —
      * the state-store round-trip form for streaming monitors; restore
      * with [[QuantileSketch.restore]] reproduces the sketch
      * BIT-EXACTLY (same future compactions, same estimates). */
    def snapshot: (Long, Seq[Boolean], Seq[Seq[Double]]) =
      (n, parity.toList, levels.map(_.toList).toList)

    def update(v: Double): Unit = if (!v.isNaN) {
      levels(0) += v
      n += 1L
      compress()
    }

    /** Merge `other` into this sketch (union per level, then one
      * compaction sweep). Weight-conservation caveat (r14, ADVICE):
      * a merge can leave a level ODD-sized at compaction (the update
      * path always compacts at exactly k, which is even), and an
      * odd-size compaction promotes ceil/floor(m/2) items, drifting
      * Σ coreset weights by ±2^i per such compaction. `n` (summed
      * exactly here) is therefore AUTHORITATIVE after any merge;
      * [[quantile]] already targets ranks against `n`, never Σw. The
      * DataFrame paths ([[coreset]]/[[coresetBy]]) union per-partition
      * coresets without ever merging sketches, so Σw = n holds exactly
      * there. Callers composing mergeInPlace with the weighted-quantile
      * path must carry `n` alongside rather than re-deriving it. */
    def mergeInPlace(other: Summary): Unit = {
      require(other.k == k, s"cannot merge sketches of k=$k and k=${other.k}")
      while (levels.size < other.levels.size) {
        levels += ArrayBuffer.empty[Double]; parity += false
      }
      var i = 0
      while (i < other.levels.size) {
        levels(i) ++= other.levels(i); i += 1
      }
      n += other.n
      compress()
    }

    private def compress(): Unit = {
      var i = 0
      while (i < levels.size) {
        if (levels(i).size >= k) {
          val sorted = levels(i).sorted
          if (i + 1 == levels.size) {
            levels += ArrayBuffer.empty[Double]; parity += false
          }
          // alternating parity: successive compactions at a level keep
          // odd then even indices, so the ±2^i rank perturbations
          // alternate sign (the bound below doesn't rely on it; the
          // alternation just centers the realized error)
          val start = if (parity(i)) 1 else 0
          parity(i) = !parity(i)
          var j = start
          while (j < sorted.size) { levels(i + 1) += sorted(j); j += 2 }
          levels(i).clear()
        }
        i += 1
      }
    }

    /** Highest realized level (items of weight 2^H exist or existed). */
    def maxLevel: Int = levels.size - 1

    /** Deterministic worst-case rank error of any quantile estimate:
      * H·n/k (see the object scaladoc derivation). */
    def errBound: Double = maxLevel.toDouble * n / k

    /** (value, weight) coreset rows. */
    def coreset: Iterator[(Double, Long)] = {
      val ls = levels // stable ref for the iterator
      Iterator.range(0, ls.size).flatMap { i =>
        val w = 1L << i
        ls(i).iterator.map(v => (v, w))
      }
    }

    /** Lower weighted quantile over the coreset: smallest v whose
      * cumulative weight reaches ceil(q·n) — the [[Percentiles.disc]]
      * rank convention, so exact-vs-sketch comparisons are like for
      * like. Undefined (None) on an empty sketch. */
    def quantile(q: Double): Option[Double] = {
      require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
      if (n == 0L) None
      else {
        val target = math.max(1L, math.ceil(q * n).toLong)
        val sorted = coreset.toArray.sortBy(_._1)
        var cum = 0L
        var i = 0
        var out = sorted.last._1
        var found = false
        while (i < sorted.length && !found) {
          cum += sorted(i)._2
          if (cum >= target) { out = sorted(i)._1; found = true }
          i += 1
        }
        Some(out)
      }
    }
  }

  /** Rebuild a [[Summary]] from a [[Summary.snapshot]] — bit-exact:
    * the restored sketch compacts and estimates identically to the
    * original (pinned in the streaming parity suite's split-batch
    * case). */
  def restore(k: Int, n: Long, parity: Seq[Boolean],
              levels: Seq[Seq[Double]]): Summary = {
    val s = new Summary(k)
    s.levels.clear()
    levels.foreach(l => s.levels += ArrayBuffer(l: _*))
    if (s.levels.isEmpty) s.levels += ArrayBuffer.empty[Double]
    s.parity.clear()
    parity.foreach(s.parity += _)
    while (s.parity.size < s.levels.size) s.parity += false
    s.n = n
    s
  }

  /** Per-partition GROUPED fold → (groupCols…, v, w) weighted coreset
    * rows: one [[Summary]] per group key per partition (memory
    * O(groups-per-partition · k·(H+1)); high-cardinality group keys
    * should pre-repartition by group so each partition holds ~G/P
    * sketches). Shuffle-free; output ≤ groups · k·(H+1) rows per
    * partition at ANY input size. Null group values are legitimate
    * keys (SQL GROUP BY semantics); null/NaN values are skipped. */
  def coresetBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame = {
    require(groupCols.nonEmpty, "use coreset() for the ungrouped form")
    val in = df.select(groupCols.map(col) :+
      col(valueCol).cast("double").as("__v"): _*)
    val g = groupCols.size
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields.dropRight(1) ++ Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType)))
    in.mapPartitions { it =>
      val sums = scala.collection.mutable.HashMap.empty[Seq[Any], Summary]
      it.foreach { r =>
        if (!r.isNullAt(g)) {
          val key = (0 until g).map(r.get)
          sums.getOrElseUpdate(key, new Summary(k)).update(r.getDouble(g))
        }
      }
      sums.iterator.flatMap { case (key, s) =>
        // Seq[Any] — a bare Seq(v, w) would unify Double|Long and
        // numerically WIDEN the weight to Double, breaking the encoder
        s.coreset.map { case (v, w) => Row.fromSeq(key ++ Seq[Any](v, w)) }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Grouped [[quantiles]]: per group, one row per q with the estimate,
    * exact group count n, and that group's H·n/k bound (H from the
    * group's own shipped weights). Same screen economics per group. */
  def quantilesBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty)
    val gc = groupCols.map(col)
    // mw = max RAW coreset weight per value, carried through the
    // value-collapse: identical values accumulate SUMMED weight across
    // levels/partitions, so max of the collapsed w could exceed 2^H and
    // overstate the bound; max-of-per-value-max of the raw weights is
    // exactly 2^H_max (each raw weight is a true power of two) — r14,
    // ADVICE fix
    val cs = coresetBy(df, groupCols, valueCol, k)
      .groupBy(gc :+ col("v"): _*)
      .agg(sum(col("w")).as("w"), max(col("w")).as("mw"))
    val tot = cs.groupBy(gc: _*).agg(sum(col("w")).as("n"),
      (round(log2(max(col("mw")))).cast("double") * sum(col("w")) / k)
        .as("err_bound"))
    val cum = cs.withColumn("cw",
      sum(col("w")).over(Window.partitionBy(gc: _*).orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val qdf = df.sparkSession.createDataFrame(qs.map(Tuple1.apply)).toDF("q")
    // null-safe group join: a NULL group value is a legitimate key
    // (SQL GROUP BY semantics), which a plain equi-join would drop
    val totR = tot.select(groupCols.map(c => col(c).as(s"__t_$c")) ++
      Seq(col("n"), col("err_bound")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__t_$c")).reduce(_ && _)
    cum.join(totR, cond)
      .drop(groupCols.map(c => s"__t_$c"): _*)
      .crossJoin(qdf)
      .filter(col("cw") >= greatest(lit(1L), ceil(col("q") * col("n"))))
      .groupBy(gc ++ Seq(col("q"), col("n"), col("err_bound")): _*)
      .agg(min(col("v")).as("v_est"))
      .select(gc ++ Seq(col("q"), col("v_est"), col("n"),
        col("err_bound")): _*)
      .orderBy(gc :+ col("q"): _*)
  }

  /** Per-partition fold → (v, w) weighted coreset rows. Input: the
    * single double column of `values`. Shuffle-free; the output is
    * ≤ k·(H+1) rows per partition at ANY input size. */
  def coreset(values: Dataset[Row], k: Int): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    values.mapPartitions { it =>
      val s = new Summary(k)
      it.foreach { r => if (!r.isNullAt(0)) s.update(r.getDouble(0)) }
      s.coreset
    }.toDF("v", "w")
  }

  /** Approximate quantiles of `valueCol` at each q in `qs`: one row per
    * q with the estimate, the exact total count n (= Σ coreset
    * weights), and the deterministic rank-error bound H·n/k. The plan
    * is the 100-TB screen shape: scan-side fold (zero shuffle), then a
    * value-collapsed aggregate of the ≤ k·(H+1)·partitions coreset
    * rows, an ordered cumsum window over that AGGREGATE (the §7.4.12
    * bounded-window discipline), and a qs-sized cross of the 1-row
    * totals — no stage touches more than the summary. */
  def quantiles(values: Dataset[Row], k: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty)
    // mw = max RAW coreset weight (a true power of two) carried through
    // the value-collapse — max of the SUMMED w would overstate H on
    // duplicate-heavy inputs (a constant column would report ~log2(n)
    // instead of the realized level) — r14, ADVICE fix
    val cs = coreset(values, k)
      .groupBy(col("v")).agg(sum(col("w")).as("w"), max(col("w")).as("mw"))
    // H = log2(max raw weight) is an exact small integer; round() (not
    // a truncating cast) absorbs log2's few-ulp slack on powers of two
    val tot = cs.agg(sum(col("w")).as("n"),
      (round(log2(max(col("mw")))).cast("double") * sum(col("w")) / k)
        .as("err_bound"))
    val cum = cs.withColumn("cw",
      sum(col("w")).over(Window.orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val qdf = values.sparkSession.createDataFrame(
      qs.map(Tuple1.apply)).toDF("q")
    qdf.crossJoin(tot)
      .join(cum, col("cw") >= greatest(lit(1L), ceil(col("q") * col("n"))))
      .groupBy(col("q"), col("n"), col("err_bound"))
      .agg(min(col("v")).as("v_est"))
      .select(col("q"), col("v_est"), col("n"), col("err_bound"))
      .orderBy(col("q"))
  }
}
