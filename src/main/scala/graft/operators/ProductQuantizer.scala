package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding ANN — the memory half of the
  * 100-TB similarity-search story. [[graft.queries.LlmOps.ivfQuery]]
  * bounds the COMPUTE per probe (inverted lists); PQ bounds the BYTES
  * per vector: a dim-d float vector becomes `m` small centroid codes
  * (64×f32 = 256 B → 8 codes ≈ 8 B at m = 8, k ≤ 256 — a 32×
  * compression), so a corpus that cannot hold raw vectors in memory
  * holds codes, and distances come from per-probe lookup tables
  * (asymmetric distance computation, ADC — Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the public
  * FAISS IndexIVFPQ design).
  *
  * Pipeline: [[codebooks]] trains an independent k-means per subspace
  * (vectors sliced into m contiguous dim∕m blocks; [[KMeans]] per
  * slice — the codebook table is m·k·(dim∕m) = k·dim doubles, driver-
  * small by construction). [[encode]] maps each vector to its per-
  * subspace argmin centroid — a broadcast argmin pass, ZERO shuffle at
  * any corpus size. [[adcSearch]] scores probes against CODES only:
  * each probe precomputes its m×k table of subspace distances once
  * (probe × broadcast codebooks), the corpus scan then sums m array
  * lookups per (probe, vector) and the top-k rank runs as
  * WindowGroupLimit — the corpus is never shuffled, never joined wide,
  * and never decoded back to floats.
  *
  * Determinism: inherits [[KMeans]]'s caveat — per-dimension means are
  * float reductions whose order Spark does not fix, so codebooks are
  * not bit-reproducible across cluster layouts; PQ is therefore
  * unit-tested (recall floor, code bounds, ADC-vs-exact agreement)
  * rather than oracle-graded, exactly like the k-means quantizer knob
  * of q_llm_ivf. Everything AFTER the codebooks is deterministic given
  * them (argmin ties break by cent_id; rank ties by vec_id).
  */
object ProductQuantizer {

  /** Train per-subspace codebooks.
    * @param vecs (vec_id: long, e: array&lt;double&gt;), uniform length dim.
    * @param m    subspace count; must divide dim.
    * @param k    centroids per subspace.
    * @return (sub: int 0..m−1, cent_id: int 1..k, ce: array&lt;double&gt; of
    *         dim∕m) — ≤ m·k rows, driver-small. */
  def codebooks(vecs: DataFrame, dim: Int, m: Int, k: Int,
                iters: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map { s =>
      KMeans.centroids(
        vecs.select(col("vec_id"),
          slice(col("e"), s * dsub + 1, dsub).as("e")),
        k, iters)
        .select(lit(s).as("sub"), col("cent_id"), col("ce"))
    }.reduce(_ unionAll _)
  }

  /** Encode each vector as its m per-subspace argmin codes (L2, ties →
    * lowest cent_id). Plan: codebooks collapse to ONE broadcast row;
    * the corpus pass is pure map — zero shuffle.
    * @return (vec_id, code: array&lt;int&gt; of length m, one cent_id per
    *         subspace in subspace order). */
  def encode(vecs: DataFrame, books: DataFrame, dim: Int, m: Int): DataFrame = {
    val dsub = dim / m
    val bk = books.agg(collect_list(struct(col("sub"), col("cent_id"),
      col("ce"))).as("bks"))
    vecs.crossJoin(broadcast(bk))
      .withColumn("code", expr(
        s"""transform(sequence(0, ${m - 1}), s ->
             element_at(array_sort(
               transform(filter(bks, b -> b.sub = s), b -> struct(
                 aggregate(zip_with(slice(e, s * $dsub + 1, $dsub), b.ce,
                     (x, y) -> (x - y) * (x - y)),
                   CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d2,
                 b.cent_id AS cent_id)),
               (l, r) -> CASE
                 WHEN l.d2 < r.d2 THEN -1 WHEN l.d2 > r.d2 THEN 1
                 WHEN l.cent_id < r.cent_id THEN -1
                 WHEN l.cent_id > r.cent_id THEN 1 ELSE 0 END),
             1).cent_id)"""))
      .select(col("vec_id"), col("code"))
  }

  /** ADC top-k: score every corpus CODE against each probe via the
    * probe's precomputed m×k distance table; keep the k best per probe
    * (ties → lowest corpus vec_id; self-matches excluded).
    * @param codes  (vec_id, code) from [[encode]].
    * @param books  codebooks from [[codebooks]].
    * @param probes (vec_id, e) raw probe vectors — a BOUNDED set (the
    *               q_llm_knn broadcast-probes contract).
    * @return (probe_id, vec_id, rk 1..k, ad2: approximate squared L2). */
  def adcSearch(codes: DataFrame, books: DataFrame, probes: DataFrame,
                dim: Int, m: Int, k: Int): DataFrame = {
    val dsub = dim / m
    val bk = books.agg(collect_list(struct(col("sub"), col("cent_id"),
      col("ce"))).as("bks"))
    // per-probe lookup table: dt[s+1][j] = L2²(probe slice s, centroid
    // j of subspace s) — m×k doubles per probe, built ONCE per probe
    // against the broadcast codebooks (cent_ids are 1..k dense from
    // KMeans; a dropped empty centroid would leave a hole, so index by
    // position after sorting by cent_id and map code→position)
    val pt = probes.crossJoin(broadcast(bk))
      .withColumn("dt", expr(
        s"""transform(sequence(0, ${m - 1}), s ->
             transform(array_sort(filter(bks, b -> b.sub = s),
                 (l, r) -> CASE WHEN l.cent_id < r.cent_id THEN -1
                   WHEN l.cent_id > r.cent_id THEN 1 ELSE 0 END),
               b -> struct(b.cent_id AS cent_id,
                 aggregate(zip_with(slice(e, s * $dsub + 1, $dsub), b.ce,
                     (x, y) -> (x - y) * (x - y)),
                   CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d2)))"""))
      .select(col("vec_id").as("probe_id"), col("dt"))
    val scored = codes.crossJoin(broadcast(pt))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("ad2", expr(
        s"""aggregate(sequence(0, ${m - 1}), CAST(0 AS DOUBLE), (acc, s) ->
              acc + filter(element_at(dt, s + 1),
                c -> c.cent_id = element_at(code, s + 1))[0].d2)"""))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("ad2").asc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rk"), col("ad2"))
  }
}
