package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the production coarse
  * quantizer for [[graft.queries.LlmOps.ivfQuery]] (whose graded default
  * is the deterministic every-100th-vector quantizer; SURVEY §2.10 named
  * real centroids as the stubbed knob).
  *
  * Shape: the centroid table is k × dim doubles — driver-small by
  * construction — so each Lloyd iteration is (a) a broadcast argmin
  * assignment over the corpus (one pass, no shuffle of the vectors
  * beyond their source partitioning) and (b) a per-dimension mean via
  * posexplode + two hash aggregations (shuffle ∝ k · dim, not corpus).
  * The driver loop over `iters` iterations is the standard Spark
  * k-means architecture (MLlib's KMeans does the same); at 100 TB add
  * a `.sample` before `centroids` and the plan is production IVF
  * training.
  *
  * Determinism: init = the k lowest vec_ids; assignment ties break by
  * cent_id. Per-dimension AVG is a float reduction whose order Spark
  * does not fix, so k-means output is NOT bit-reproducible across
  * cluster layouts — which is why it is unit-tested (cluster recovery)
  * rather than oracle-graded.
  */
object KMeans {

  /** @param vecs (vec_id: long, e: array&lt;double&gt;) — e of uniform length.
    * @return (cent_id: int from 1, ce: array&lt;double&gt;) — at most k rows
    *         (a centroid that captures no vectors drops out). */
  def centroids(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    var cents = vecs.orderBy(col("vec_id")).limit(k)
      .select(row_number().over(Window.orderBy(col("vec_id"))).as("cent_id"),
        col("e").as("ce"))
    // Materialize the centroid table on the driver after every Lloyd
    // step (it is k × dim doubles — driver-small BY CONSTRUCTION; MLlib's
    // KMeans does the same). Without this, `cents` is an iters-deep lazy
    // plan: every downstream action re-runs the whole chain of broadcast
    // assignments, and Catalyst planning cost grows linearly with iters.
    // This is control-flow collect of a bounded table, not a corpus
    // collect — the corpus is only ever scanned, never gathered.
    for (_ <- 1 to iters)
      cents = step(vecs, cents)
        .select(col("cent_id"), col("ce"))
        .as[(Int, Seq[Double])].collect().toSeq
        .toDF("cent_id", "ce")
    cents
  }

  /** One Lloyd iteration: argmin-L2 assignment, then new centroids as
    * per-dimension means. */
  def step(vecs: DataFrame, cents: DataFrame): DataFrame =
    nearest(vecs, cents)
      .select(col("cent_id"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("cent_id"), col("pos")).agg(avg(col("v")).as("m"))
      .groupBy(col("cent_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("ce"))

  /** Assign each vector to its nearest centroid (argmin L2, ties by
    * cent_id) — exposed for the recovery unit test. */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    nearest(vecs, cents).select(col("vec_id"), col("cent_id"))

  private def nearest(vecs: DataFrame, cents: DataFrame): DataFrame = {
    // The centroid table is bounded (k × dim), so it collapses to ONE
    // array-valued row that broadcasts, and each vector picks its argmin
    // centroid per-row (scored transform + comparator sort, ties by
    // cent_id): assignment costs ZERO shuffle at any corpus size. The
    // previous form (crossJoin + row_number over a vec_id window)
    // shuffled and sorted the corpus × k expansion rows every iteration.
    val centArr = cents
      .agg(collect_list(struct(col("cent_id"), col("ce"))).as("cs"))
    vecs.crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        """element_at(array_sort(
             transform(cs, c -> struct(
               aggregate(zip_with(e, c.ce, (x, y) -> (x - y) * (x - y)),
                 CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d2,
               c.cent_id AS cent_id)),
             (l, r) -> CASE
               WHEN l.d2 < r.d2
                 OR (isnan(r.d2) AND NOT isnan(l.d2)) THEN -1
               WHEN l.d2 > r.d2
                 OR (isnan(l.d2) AND NOT isnan(r.d2)) THEN 1
               WHEN l.cent_id < r.cent_id THEN -1
               WHEN l.cent_id > r.cent_id THEN 1
               ELSE 0 END), 1)"""))
      .select(col("vec_id"), col("e"), col("best.cent_id").as("cent_id"))
  }
}
