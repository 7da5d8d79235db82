package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables => T}

/** SURVEY §2.10 + north-star LLM-data-pipeline operators: exact dedup,
  * MinHash-LSH / n-gram-Jaccard near-dup, SimHash fingerprints,
  * brute-force kNN + LSH-bucketed ANN over embeddings, embedding-cosine
  * near-dup, token frequency, corpus stats.
  *
  * Scale design (the 100 TB story, per operator):
  *  - Exact dedup: hash-groupBy on md5(text) — shuffle ∝ distinct hashes.
  *  - MinHash-LSH: tokenize → k seeded min-hashes per doc (one hash-agg) →
  *    band equi-joins. Each band join is a *shuffle hash join on the band
  *    key* — candidate generation never goes quadratic; only docs landing
  *    in the same bucket meet. This is the textbook LSH plan that holds at
  *    petabyte scale, vs the O(n²) blocked Jaccard used for verification.
  *  - Blocked pairwise Jaccard (near-dup, ngram): pairs are generated
  *    *within (lang, source) blocks only* — block sizes stay bounded, so
  *    cost is Σ|block|², not |corpus|².
  *  - kNN: broadcast the tiny probe set against the corpus — the corpus is
  *    never shuffled; norms are precomputed per row before the join.
  *  - ANN: sign-bit LSH bucket as equi-join key — the scale path where
  *    brute force dies.
  * All similarity math is computed as sequential folds in double and
  * rounded at 6dp before ordering (§7.4) with unique-id tiebreaks.
  */
object LlmOps {
  type Q = (SparkSession, String) => DataFrame
  import Det.{davg, dsum, sqlAvg, sqlSum, tbl}

  private val NumSeeds = 8
  private val seeds: Seq[Int] = 0 until NumSeeds

  /** md5-derived 32-bit hash, identically computable in DuckDB:
    * ('0x' || substr(md5(s), 1, 8))::BIGINT. */
  private def md5h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  private def tokensCol: Column = array_distinct(split(col("text"), " "))

  /** Sequential double fold: dot product of two double arrays. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def toDouble(a: Column): Column = transform(a, _.cast("double"))

  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  val queries: Map[String, Q] = Map(
    // Exact content dedup: every doc annotated with its md5 cluster
    // (size, keeper = min doc_id). Non-trivial clusters appear via the
    // normalized fingerprint variant in TextOps.
    "q_llm_dedup" -> ((s, d) => {
      val w = Window.partitionBy(col("h"))
      T.documents(s, d)
        .withColumn("h", md5(col("text")))
        .select(col("doc_id"), col("h"),
          count(lit(1)).over(w).as("cluster_size"),
          min(col("doc_id")).over(w).as("keeper"))
        .orderBy(col("doc_id"))
    }),

    // Token-set Jaccard ≥ 0.8 between pairs in the same (lang, source)
    // block. Jaccard = |∩| / (|a| + |b| - |∩|), int sizes → one double
    // division, identical in both engines.
    "q_llm_neardup" -> ((s, d) => {
      val t = T.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), tokensCol.as("tk"))
      val a = t.select(col("doc_id").as("doc_a"), col("lang"), col("source"),
        col("tk").as("tk_a"))
      val b = t.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("source").as("source_b"), col("tk").as("tk_b"))
      a.join(b, col("lang") === col("lang_b") && col("source") === col("source_b")
          && col("doc_a") < col("doc_b"))
        .withColumn("common", size(array_intersect(col("tk_a"), col("tk_b"))))
        .withColumn("jacc",
          col("common") / (size(col("tk_a")) + size(col("tk_b")) - col("common")))
        .filter(col("jacc") >= 0.8)
        .select(col("doc_a"), col("doc_b"), round(col("jacc"), 6).as("jacc"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // MinHash + LSH candidate pairs: 8 seeded min-hashes, 4 bands × 2 rows;
    // candidates share ≥1 band; est_sim = fraction of agreeing positions.
    "q_llm_minhash" -> ((s, d) => {
      val toks = T.documents(s, d)
        .select(col("doc_id"), explode(tokensCol).as("tok"))
      val hashed = toks.select(
        (col("doc_id") +: seeds.map(i =>
          md5h32(concat(lit(s"$i#"), col("tok"))).as(s"h$i"))): _*)
      val sig = hashed.groupBy(col("doc_id"))
        .agg(min(col("h0")).as("m0"),
          seeds.tail.map(i => min(col(s"h$i")).as(s"m$i")): _*)
      val a = sig.select(sig.columns.map(c => col(c).as(s"a_$c")): _*)
      val b = sig.select(sig.columns.map(c => col(c).as(s"b_$c")): _*)
      // One equi-join per band (shuffle hash join on the band key pair).
      val bands = (0 until NumSeeds / 2).map { bd =>
        a.join(b,
          col(s"a_m${2 * bd}") === col(s"b_m${2 * bd}")
            && col(s"a_m${2 * bd + 1}") === col(s"b_m${2 * bd + 1}")
            && col("a_doc_id") < col("b_doc_id"))
          .select(col("a_doc_id").as("doc_a"), col("b_doc_id").as("doc_b"))
      }
      val cand = bands.reduce(_ unionAll _).distinct()
      val matches = seeds.map(i =>
        when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
        .reduce(_ + _)
      cand
        .join(a, col("doc_a") === col("a_doc_id"))
        .join(b, col("doc_b") === col("b_doc_id"))
        .select(col("doc_a"), col("doc_b"), (matches / lit(NumSeeds)).as("est_sim"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // 16-bit SimHash signature per doc from md5-derived token hashes:
    // bit b of the signature = majority vote of bit b over distinct tokens.
    "q_llm_simhash" -> ((s, d) => {
      val toks = T.documents(s, d)
        .select(col("doc_id"), explode(tokensCol).as("tok"))
        .withColumn("h", conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long"))
      val votes = (0 until 16).map(bit =>
        sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as(s"v$bit"))
      val sigExpr = (0 until 16).map(bit =>
        when(col(s"v$bit") > 0, 1L << bit).otherwise(0L)).reduce(_ + _)
      toks.groupBy(col("doc_id"))
        .agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), sigExpr.as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // 3-gram shingle Jaccard ≥ 0.2 within (lang, source) blocks — order-
    // sensitive near-dup (catches reordered-token false-positives of
    // q_llm_neardup).
    "q_llm_ngram" -> ((s, d) => {
      val sh = T.documents(s, d)
        .withColumn("tk", split(col("text"), " "))
        .filter(size(col("tk")) >= 3)
        .withColumn("sh", array_distinct(
          transform(sequence(lit(1), size(col("tk")) - 2), i =>
            concat_ws(" ", element_at(col("tk"), i),
              element_at(col("tk"), i + 1), element_at(col("tk"), i + 2)))))
        .select(col("doc_id"), col("lang"), col("source"), col("sh"))
      val a = sh.select(col("doc_id").as("doc_a"), col("lang"), col("source"),
        col("sh").as("sh_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("source").as("source_b"), col("sh").as("sh_b"))
      a.join(b, col("lang") === col("lang_b") && col("source") === col("source_b")
          && col("doc_a") < col("doc_b"))
        .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jacc",
          col("common") / (size(col("sh_a")) + size(col("sh_b")) - col("common")))
        .filter(col("jacc") >= 0.2)
        .select(col("doc_a"), col("doc_b"), round(col("jacc"), 6).as("jacc"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Brute-force cosine top-5 for probe vectors (vec_id < 5) — the exact
    // baseline an ANN variant is judged against. Probe side broadcasts.
    "q_llm_knn" -> ((s, d) => {
      val base = T.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("e"))
        .withColumn("nrm", norm(col("e")))
      val probes = base.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("e").as("pe"), col("nrm").as("pn"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      base.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("sim", round(dot(col("pe"), col("e")) / (col("pn") * col("nrm")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("sim"))
        .orderBy(col("probe_id"), col("rk"))
    }),

    // LSH-bucketed ANN: bucket = sign bits of dims 1..4 (equi-join key).
    // Probes search only their own bucket — the plan that survives when
    // the corpus no longer fits a cross join.
    "q_llm_ann" -> ((s, d) => {
      val bucketOf = (0 until 4).map(i =>
        when(element_at(col("e"), i + 1) > 0, 1 << i).otherwise(0)).reduce(_ + _)
      val base = T.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("e"))
        .withColumn("nrm", norm(col("e")))
        .withColumn("bucket", bucketOf)
      val probes = base.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("e").as("pe"),
          col("nrm").as("pn"), col("bucket").as("pbucket"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      base.join(broadcast(probes), col("bucket") === col("pbucket")
          && col("vec_id") =!= col("probe_id"))
        .withColumn("sim", round(dot(col("pe"), col("e")) / (col("pn") * col("nrm")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("sim"))
        .orderBy(col("probe_id"), col("rk"))
    }),

    // Embedding-cosine near-duplicate pairs within label blocks.
    "q_llm_embdup" -> ((s, d) => {
      val base = T.embeddings(s, d)
        .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("e"))
        .withColumn("nrm", norm(col("e")))
      val a = base.select(col("vec_id").as("vec_a"), col("label"),
        col("e").as("ea"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
        col("e").as("eb"), col("nrm").as("nb"))
      a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
        .withColumn("sim", round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
        .filter(col("sim") >= 0.35)
        .select(col("vec_a"), col("vec_b"), col("label"), col("sim"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Token frequency: top-20 words (tie → lexicographic).
    "q_llm_wordcount" -> ((s, d) =>
      T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(20)),

    // Corpus stats per (lang, source).
    "q_llm_textstats" -> ((s, d) =>
      T.documents(s, d).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          davg(col("n_chars")).as("avg_chars"),
          max(length(col("text"))).as("max_len"),
          dsum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"), col("source")))
  )

  private val doc = tbl("documents"); private val emb = tbl("embeddings")

  /** DuckDB twins. Shared fragments kept textually identical across
    * queries so both engines compute the same double op sequence. */
  private val dotSql =
    "list_aggregate(list_transform(ea, (x, i) -> x * eb[i]), 'sum')"
  private def normSql(e: String) =
    s"sqrt(list_aggregate(list_transform($e, x -> x * x), 'sum'))"

  private val minhashHash = (i: Int) =>
    s"MIN(('0x' || substr(md5('$i#' || tok), 1, 8))::BIGINT) AS m$i"

  val oracle: Map[String, String] = Map(
    "q_llm_dedup" ->
      s"""SELECT doc_id, md5(text) AS h,
            COUNT(*) OVER (PARTITION BY md5(text)) AS cluster_size,
            MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
          FROM $doc ORDER BY doc_id""",
    "q_llm_neardup" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
              list_distinct(string_split(text, ' ')) AS tk FROM $doc)
          SELECT doc_a, doc_b, round(jacc, 6) AS jacc FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(len(list_intersect(a.tk, b.tk)) AS INTEGER)
                / (CAST(len(a.tk) AS INTEGER) + CAST(len(b.tk) AS INTEGER)
                   - CAST(len(list_intersect(a.tk, b.tk)) AS INTEGER)) AS jacc
            FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
              AND a.doc_id < b.doc_id) x
          WHERE jacc >= 0.8 ORDER BY doc_a, doc_b""",
    "q_llm_minhash" -> {
      val mins = seeds.map(minhashHash).mkString(",\n              ")
      val bandCond = (0 until NumSeeds / 2).map(bd =>
        s"(a.m${2 * bd} = b.m${2 * bd} AND a.m${2 * bd + 1} = b.m${2 * bd + 1})")
        .mkString(" OR ")
      val matches = seeds.map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH toks AS (
            SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
            FROM $doc),
          sig AS (
            SELECT doc_id,
              $mins
            FROM toks GROUP BY doc_id)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            ($matches) / $NumSeeds AS est_sim
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandCond)
          ORDER BY doc_a, doc_b"""
    },
    "q_llm_simhash" -> {
      val votes = (0 until 16).map(bit =>
        s"SUM(CASE WHEN (h >> $bit) & 1 = 1 THEN 1 ELSE -1 END) AS v$bit")
        .mkString(",\n              ")
      val sig = (0 until 16).map(bit =>
        s"CASE WHEN v$bit > 0 THEN ${1L << bit} ELSE 0 END").mkString(" + ")
      s"""WITH toks AS (
            SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
            FROM $doc),
          h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h
            FROM toks),
          v AS (SELECT doc_id,
              $votes
            FROM h GROUP BY doc_id)
          SELECT doc_id, CAST($sig AS BIGINT) AS simhash
          FROM v ORDER BY doc_id"""
    },
    "q_llm_ngram" ->
      s"""WITH sh AS (
            SELECT doc_id, lang, source,
              list_distinct(list_filter(
                list_transform(tk, (x, i) ->
                  CASE WHEN i <= len(tk) - 2
                       THEN x || ' ' || tk[i + 1] || ' ' || tk[i + 2] END),
                s -> s IS NOT NULL)) AS sh
            FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS tk
                  FROM $doc WHERE len(string_split(text, ' ')) >= 3) t)
          SELECT doc_a, doc_b, round(jacc, 6) AS jacc FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER)
                / (CAST(len(a.sh) AS INTEGER) + CAST(len(b.sh) AS INTEGER)
                   - CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER)) AS jacc
            FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source
              AND a.doc_id < b.doc_id) x
          WHERE jacc >= 0.2 ORDER BY doc_a, doc_b""",
    "q_llm_knn" ->
      s"""WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
              ${normSql("CAST(embedding AS DOUBLE[])")} AS nrm
            FROM $emb),
          pairs AS (
            SELECT p.vec_id AS probe_id, c.vec_id,
              round(list_aggregate(list_transform(p.e, (x, i) -> x * c.e[i]), 'sum')
                / (p.nrm * c.nrm), 6) AS sim
            FROM base p JOIN base c ON p.vec_id < 5 AND c.vec_id <> p.vec_id)
          SELECT probe_id, CAST(rk AS INTEGER) AS rk, vec_id AS neighbor_id, sim
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
              ORDER BY sim DESC, vec_id ASC) AS rk FROM pairs) x
          WHERE rk <= 5 ORDER BY probe_id, rk""",
    "q_llm_ann" ->
      s"""WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
              ${normSql("CAST(embedding AS DOUBLE[])")} AS nrm,
              (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
              + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
              + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
            FROM $emb),
          pairs AS (
            SELECT p.vec_id AS probe_id, c.vec_id,
              round(list_aggregate(list_transform(p.e, (x, i) -> x * c.e[i]), 'sum')
                / (p.nrm * c.nrm), 6) AS sim
            FROM base p JOIN base c ON p.vec_id < 5 AND c.bucket = p.bucket
              AND c.vec_id <> p.vec_id)
          SELECT probe_id, CAST(rk AS INTEGER) AS rk, vec_id AS neighbor_id, sim
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
              ORDER BY sim DESC, vec_id ASC) AS rk FROM pairs) x
          WHERE rk <= 3 ORDER BY probe_id, rk""",
    "q_llm_embdup" ->
      s"""WITH base AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
              ${normSql("CAST(embedding AS DOUBLE[])")} AS nrm
            FROM $emb)
          SELECT vec_a, vec_b, label, sim FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
              round(list_aggregate(list_transform(a.e, (x, i) -> x * b.e[i]), 'sum')
                / (a.nrm * b.nrm), 6) AS sim
            FROM base a JOIN base b ON a.label = b.label
              AND a.vec_id < b.vec_id) x
          WHERE sim >= 0.35 ORDER BY vec_a, vec_b""",
    "q_llm_wordcount" ->
      s"""SELECT word, COUNT(*) AS n
          FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM $doc) t
          GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""",
    "q_llm_textstats" ->
      s"""SELECT lang, source, COUNT(*) AS n_docs,
            ${sqlAvg("n_chars")} AS avg_chars,
            CAST(MAX(length(text)) AS INTEGER) AS max_len,
            ${sqlSum("n_chars")} AS sum_chars
          FROM $doc GROUP BY lang, source ORDER BY lang, source"""
  )
}
