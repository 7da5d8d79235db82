package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables => T}

/** North-star multimodal-column operators: image/audio/video payloads as
  * opaque `binary` columns with typed metadata, plus the frame/patch
  * sampling and feature-extraction plumbing a training-data pipeline
  * runs before the actual decoder.
  *
  * The corpus has no binary table, so payloads are derived
  * deterministically as the UTF-8 bytes of `documents.text` — every
  * operator below runs REAL binary ops in Spark (cast to binary,
  * byte-substring, byte md5, hex). The DuckDB twins compute on the text
  * side (DuckDB 1.0 lacks substring/md5 over BLOB), which is byte-exact
  * here because the corpus is pure ASCII (1 char = 1 byte) — pinned by
  * the unit suite.
  *
  * The DECODE step itself (jpeg/wav/mp4 → tensors) needs libraries this
  * environment does not ship; it is stubbed with deterministic fakes
  * that stand where magic-number sniffing / codec calls would run (see
  * also [[graft.multimodal.DecodeStub]] for the mapPartitions form).
  * What is real and graded: the schema, the byte-level plumbing, the
  * chunk explosion, and the plan shapes.
  *
  * Scale notes: all three queries are embarrassingly parallel per-row
  * map work over the scan — no shuffle except the final presentation
  * sort; chunk explosion multiplies rows before any wide operation, so
  * at 100 TB the chunker runs as a pure map stage feeding whatever
  * consumes the frames (dedup, feature extraction, batching).
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame
  import Det.tbl

  private val ChunkBytes = 16

  /** q_mm_framesample: per-payload frame budget. */
  private val MaxFrames = 8

  /** Integer byte value at 1-based position i of a binary column. */
  private def byteVal(payload: org.apache.spark.sql.Column, i: Int) =
    conv(hex(substring(payload, i, 1)), 16, 10).cast("int")

  /** q_mm_chunkdup's engine over any frame with a binary `payload`
    * column — the ScaleRehearsal chunk-dedup probe enters here. */
  private[graft] def chunkDedupOn(docs: DataFrame): DataFrame = {
    val p = col("payload")
    docs
      .filter(length(p) >= 1)
      .select(
        when(byteVal(p, 1) % 3 === 0, "image")
          .when(byteVal(p, 1) % 3 === 1, "audio")
          .otherwise("video").as("kind_stub"),
        explode(sequence(lit(0),
          expr(s"(length(payload) + ${ChunkBytes - 1}) div $ChunkBytes")
            - 1)).as("chunk_idx"),
        col("payload"))
      .select(col("kind_stub"),
        expr(s"md5(substring(payload, chunk_idx * $ChunkBytes + 1, $ChunkBytes))")
          .as("h"),
        expr(s"length(substring(payload, chunk_idx * $ChunkBytes + 1, $ChunkBytes))")
          .cast("long").as("nb"))
      .groupBy(col("kind_stub"), col("h"))
      .agg(count(lit(1)).as("copies"), max(col("nb")).as("nb"))
      .groupBy(col("kind_stub"))
      .agg(sum(col("copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("copies") - 1).as("n_dups"),
        sum((col("copies") - 1) * col("nb")).as("bytes_dedupable"))
      .orderBy(col("kind_stub"))
  }

  /** q_mm_cdc: rolling-hash window, boundary modulus, and the
    * polynomial base (engine-portable integer arithmetic — the
    * md5-for-rand discipline: no float, no engine RNG). A cut lands
    * after byte i when the base-31 polynomial of the w=8 bytes ending
    * at i is ≡ 0 (mod 61) — expected chunk ≈ 61 B against the corpus's
    * ~300 B payloads (measured ~5 cuts/doc at sf0.01). */
  private[graft] val CdcWindow = 8
  private[graft] val CdcMod = 61
  private[graft] val CdcBase = 31

  /** q_mm_cdc's engine over any frame with a binary `payload` column —
    * content-defined chunking dedup (the rolling-hash sibling of
    * [[chunkDedupOn]]'s fixed 16-byte blocks): chunk boundaries cut
    * where a position-local window hash hits 0 mod [[CdcMod]], so an
    * INSERTION only reshapes chunks up to the first boundary past the
    * edit — the shifted copy's remaining chunks realign and dedup,
    * which fixed blocks structurally miss (every block after the
    * insertion shifts; planted fixture pinned in MultimodalSuite).
    *
    * Semantics: boundary positions are PURE per-position functions
    * (hash of the w bytes ending at i — no sequential state, no
    * min/max chunk clamp), so the cut set is order-free and the oracle
    * mirrors it verbatim; a cut at exactly n is a no-op (the chunk
    * ends at n regardless — excluded on both engines); docs shorter
    * than w form one whole-doc chunk (CDC degrades to exact dedup).
    * All-integer: byte·31^j sums peak at 8·255·31⁷ ≈ 5.6e13 — BIGINT.
    *
    * Scale shape: the cut scan is a pure per-row map (O(w) byte reads
    * per position — work ∝ bytes, the honest CDC cost, zero shuffle);
    * the chunk explode is ∝ bytes∕avg_chunk; then the dedupstats
    * two-stacked-hash-agg shape — shuffle ∝ DISTINCT chunks (viral
    * chunks combine map-side), then ∝ kinds. */
  private[graft] def cdcDedupOn(docs: DataFrame): DataFrame = {
    val p = col("payload")
    cdcChunkRows(
      docs
        .filter(length(p) >= 1)
        .select(
          when(byteVal(p, 1) % 3 === 0, "image")
            .when(byteVal(p, 1) % 3 === 1, "audio")
            .otherwise("video").as("kind_stub"),
          col("payload")),
      Seq("kind_stub"))
      .groupBy(col("kind_stub"), col("h"))
      .agg(count(lit(1)).as("copies"), max(col("nb")).as("nb"))
      .groupBy(col("kind_stub"))
      .agg(sum(col("copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("copies") - 1).as("n_dups"),
        sum((col("copies") - 1) * col("nb")).as("bytes_dedupable"))
      .orderBy(col("kind_stub"))
  }

  /** The per-row CDC chunk projection shared by [[cdcDedupOn]] and the
    * streaming ingest probe
    * ([[graft.streaming.StreamOps.cdcIngestProbe]]): expects a binary
    * `payload` column (empty payloads filtered here — Spark's
    * sequence() would descend, not empty out), carries `carry` columns
    * through, and emits one row per chunk with its md5 `h` and byte
    * length `nb`. A PURE per-row map (cut scan O(bytes·window), chunk
    * explode ∝ bytes∕avg_chunk) — stateless and therefore
    * streaming-safe with no watermark or state store. */
  private[graft] def cdcChunkRows(docs: DataFrame,
                                  carry: Seq[String]): DataFrame = {
    val terms = (0 until CdcWindow).map(j =>
      s"CAST(conv(hex(substring(payload, i - $j, 1)), 16, 10) AS BIGINT)" +
        s" * ${BigInt(CdcBase).pow(j)}").mkString(" + ")
    val cc = carry.map(col)
    docs
      .filter(length(col("payload")) >= 1)
      // sequence(w, max(n, w)) never descends; i < n drops the no-op
      // cut at n; short docs filter to zero cuts = one whole-doc chunk
      .withColumn("cuts", expr(
        s"""filter(sequence(CAST($CdcWindow AS BIGINT),
              greatest(CAST(length(payload) AS BIGINT),
                       CAST($CdcWindow AS BIGINT))),
            i -> i < length(payload) AND ($terms) % $CdcMod = 0)"""))
      .withColumn("bounds", expr(
        """concat(array(CAST(0 AS BIGINT)), cuts,
             array(CAST(length(payload) AS BIGINT)))"""))
      .select(cc :+ explode(expr(
        """transform(sequence(2, size(bounds)), k ->
             substring(payload,
               CAST(element_at(bounds, k - 1) + 1 AS INT),
               CAST(element_at(bounds, k) - element_at(bounds, k - 1)
                    AS INT)))""")).as("chunk"): _*)
      .select(cc :+ md5(col("chunk")).as("h")
        :+ length(col("chunk")).cast("long").as("nb"): _*)
  }

  /** The (kind_stub, byte_val, cnt) first-16-bytes histogram shared by
    * q_mm_bytehist (raw rows) and q_mm_diversity (its langmix tail). */
  private def byteHistOn(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      // empty payloads emit no rows on either engine (Spark's
      // sequence(1, 0) would DESCEND, not empty out — filter first)
      .filter(length(col("payload")) >= 1)
      .select(
        when(byteVal(col("payload"), 1) % 3 === 0, "image")
          .when(byteVal(col("payload"), 1) % 3 === 1, "audio")
          .otherwise("video").as("kind_stub"),
        explode(sequence(lit(1),
          least(length(col("payload")), lit(16)))).as("i"),
        col("payload"))
      .select(col("kind_stub"),
        expr("CAST(conv(hex(substring(payload, i, 1)), 16, 10) AS INT)")
          .as("byte_val"))
      .groupBy(col("kind_stub"), col("byte_val"))
      .agg(count(lit(1)).as("cnt"))

  val queries: Map[String, Q] = Map(
    // Power-of-2 payload size histogram per sniffed kind (r14) — the
    // storage-profile audit every multimodal lake report leads with
    // (q_text_lenhist's log-scale profile at (kind, bytes) grain):
    // bucket = LENGTH(bin(n_bytes)) = floor(log2)+1, INTEGER-EXACT
    // both engines. Plan: per-row map (sniff + bucket) → one map-side-
    // combining hash agg (shuffle ∝ kinds × ≤64 buckets).
    "q_mm_sizehist" -> ((s, d) =>
      T.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(
          when(byteVal(col("payload"), 1) % 3 === 0, "image")
            .when(byteVal(col("payload"), 1) % 3 === 1, "audio")
            .otherwise("video").as("kind_stub"),
          length(col("payload")).as("n_bytes"))
        .groupBy(col("kind_stub"), length(bin(col("n_bytes"))).as("b"))
        .agg(count(lit(1)).as("n_payloads"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"),
          sum(col("n_bytes").cast("long")).as("sum_bytes"))
        .orderBy(col("kind_stub"), col("b"))),

    // Payload metadata: size, content hash, header magic, and a stubbed
    // content-type sniff (first byte mod 3 stands where magic-number
    // dispatch would run).
    "q_mm_meta" -> ((s, d) =>
      T.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("content_md5"),
          hex(substring(col("payload"), 1, 4)).as("header_hex"),
          when(byteVal(col("payload"), 1) % 3 === 0, "image")
            .when(byteVal(col("payload"), 1) % 3 === 1, "audio")
            .otherwise("video").as("kind_stub"))
        .orderBy(col("doc_id"))),

    // Frame/patch sampling: explode each payload into fixed 16-byte
    // chunks (the shape of frame extraction / audio windowing), keyed
    // (doc_id, chunk_idx); per-chunk length + content hash.
    "q_mm_chunks" -> ((s, d) =>
      T.documents(s, d)
        .filter(col("doc_id") < 50)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("n_bytes", length(col("payload")))
        .withColumn("chunk_idx",
          explode(sequence(lit(0),
            expr(s"(n_bytes + ${ChunkBytes - 1}) div $ChunkBytes") - 1)))
        .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
          expr(s"length(substring(payload, chunk_idx * $ChunkBytes + 1, $ChunkBytes))")
            .cast("int").as("chunk_len"),
          expr(s"md5(substring(payload, chunk_idx * $ChunkBytes + 1, $ChunkBytes))")
            .as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Payload dedup storage audit — exact content dedup on the BINARY
    // path, rolled up per sniffed media kind: how many payloads, how
    // many distinct contents, how many dups, and the bytes a
    // content-addressed store would save (the capacity number a
    // multimodal corpus plans around; copies of one content share its
    // size by definition). Two stacked map-side-combining hash aggs —
    // shuffle ∝ distinct contents then ∝ kinds, never a window over
    // the hash (a viral payload's copies combine map-side).
    "q_mm_dedupstats" -> ((s, d) => {
      val p = col("payload")
      T.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(
          when(byteVal(p, 1) % 3 === 0, "image")
            .when(byteVal(p, 1) % 3 === 1, "audio")
            .otherwise("video").as("kind_stub"),
          md5(p).as("h"), length(p).cast("long").as("nb"))
        .groupBy(col("kind_stub"), col("h"))
        .agg(count(lit(1)).as("copies"), max(col("nb")).as("nb"))
        .groupBy(col("kind_stub"))
        .agg(sum(col("copies")).as("n_payloads"),
          count(lit(1)).as("n_distinct"),
          sum(col("copies") - 1).as("n_dups"),
          sum((col("copies") - 1) * col("nb")).as("bytes_dedupable"))
        .orderBy(col("kind_stub"))
    }),

    // Chunk-level dedup storage audit (r14) — q_mm_dedupstats at the
    // BLOCK grain: payloads split into the fixed 16-byte chunks of
    // q_mm_chunks, deduped by chunk content per sniffed kind — the
    // content-defined-chunking economics a block-addressed store
    // banks on, where two payloads sharing a prefix dedup their common
    // blocks even though whole-payload dedup (q_mm_dedupstats) sees two
    // distinct contents. Plan: budget-bounded explode (rows ∝ bytes∕16
    // — this IS the block-dedup workload's honest size), then the
    // dedupstats two-stacked-hash-agg shape: shuffle ∝ DISTINCT chunks
    // (viral blocks combine map-side), then ∝ kinds; never a window
    // over the chunk hash. Integer byte math end to end; empty
    // payloads filtered structurally on both engines (Spark
    // sequence(0,−1) would DESCEND).
    "q_mm_chunkdup" -> ((s, d) =>
      chunkDedupOn(T.documents(s, d).withColumn("payload",
        col("text").cast("binary")))),

    // Content-defined chunking dedup audit (r17) — the rolling-hash
    // sibling of q_mm_chunkdup's fixed 16-byte blocks: boundaries cut
    // where the base-31 hash of the 8 bytes ending at a position hits
    // 0 mod 61, so an insertion-shifted copy realigns and dedups past
    // the first post-edit boundary — the case fixed blocks
    // structurally miss (planted shifted-copy fixture pinned in
    // MultimodalSuite: CDC dedups it, fixed blocks don't). Semantics,
    // determinism (pure per-position integer hash — no sequential
    // state, no float) and the ∝-bytes scale shape in cdcDedupOn's
    // scaladoc; same output grain as chunkdup for side-by-side reads.
    "q_mm_cdc" -> ((s, d) =>
      cdcDedupOn(T.documents(s, d).withColumn("payload",
        col("text").cast("binary")))),

    // Cross-modality CDC dedup audit (r18) — q_mm_cdc answers "how
    // much dedups WITHIN each kind's store"; this prices the
    // architecture question a 100 TB lake actually faces: how many
    // extra bytes does a modality-AGNOSTIC chunk store reclaim over
    // three per-kind stores? Per cross-kind chunk hash the extra
    // saving is exactly (n_kinds − 1)·nb — each additional kind's
    // store keeps its own copy of a chunk global dedup stores once.
    // Honest measured finding: the overlap is real but small on this
    // corpus (57∕61 cross-kind chunks, 360∕427 extra bytes at
    // sf0.001∕0.01 — short common substrings, e.g. shared phrases,
    // landing in same-boundary chunks across kind stubs). Engine:
    // the same cdcChunkRows projection (kind carried), a
    // (kind, hash) map-side-combining agg, a hash-grain kind fold
    // with n_kinds ≥ 2, ONE 1-row global sum — shuffle ∝ distinct
    // (kind, chunk), output one row forever; all exact integers,
    // COALESCE(…, 0) makes the no-overlap row deterministic.
    "q_mm_crosskind" -> ((s, d) => {
      val p = col("payload")
      val chunks = cdcChunkRows(
        T.documents(s, d).withColumn("payload", col("text").cast("binary"))
          .filter(length(p) >= 1)
          .select(
            when(byteVal(p, 1) % 3 === 0, "image")
              .when(byteVal(p, 1) % 3 === 1, "audio")
              .otherwise("video").as("kind_stub"),
            col("payload")),
        Seq("kind_stub"))
      chunks.groupBy(col("kind_stub"), col("h"))
        .agg(count(lit(1)).as("k_copies"), max(col("nb")).as("nb"))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("n_kinds"),
          sum(col("k_copies")).as("copies"), max(col("nb")).as("nb2"))
        .filter(col("n_kinds") >= 2)
        .agg(count(lit(1)).as("n_chunks_xkind"),
          coalesce(sum(col("copies")), lit(0L)).as("n_copies"),
          coalesce(sum((col("n_kinds") - 1) * col("nb2")), lit(0L))
            .as("extra_bytes"))
    }),

    // Stubbed decode + feature extraction: fake decoded dimensions from
    // header bytes (where the codec would report them) and a real
    // byte-level feature (mean of the first 8 byte values, 6dp).
    "q_mm_features" -> ((s, d) => {
      val p = col("payload")
      val byteSum8 = (1 to 8).map(i => byteVal(p, i)).reduce(_ + _)
      T.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(p).as("n_bytes"),
          (byteVal(p, 1) % 64 + 1).as("width_stub"),
          (byteVal(p, 2) % 64 + 1).as("height_stub"),
          (expr("length(payload) div 256") + 1).as("n_frames_stub"),
          round(byteSum8 / lit(8.0), 6).as("mean_byte8"))
        .orderBy(col("doc_id"))
    }),

    // Budgeted keyframe sampling (r12) — the video-pipeline step between
    // q_mm_chunks (ALL frames) and the decoder: pick ≤ MaxFrames frames
    // per payload at a uniform integer stride, stride = ⌈n_chunks ∕
    // MaxFrames⌉, sampled indices 0, s, 2s, … < n_chunks (frame 0 always
    // kept — the keyframe convention). All integer math; the sampled-set
    // row count is exactly ⌈n_chunks ∕ stride⌉ per doc, so output is
    // bounded by MaxFrames × docs no matter how large payloads grow —
    // the property that makes the stage safe to fan into a decoder at
    // 100 TB (q_mm_chunks' output is ∝ bytes; this one is ∝ docs).
    // Plan: pure per-row map + generator over the scan, zero shuffle
    // before the presentation sort (the family contract); Spark
    // sequence(0, n−1, s) ≡ DuckDB range(0, n, s) — both emit the
    // multiples of s below n.
    "q_mm_framesample" -> ((s, d) =>
      T.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("n_chunks",
          expr(s"(length(payload) + ${ChunkBytes - 1}) div $ChunkBytes"))
        .filter(col("n_chunks") >= 1) // stride-0 guard for empty payloads
        .withColumn("stride",
          expr(s"(n_chunks + ${MaxFrames - 1}) div $MaxFrames"))
        .withColumn("chunk_idx",
          explode(expr("sequence(0, n_chunks - 1, stride)")))
        .select(col("doc_id"),
          col("n_chunks").cast("int").as("n_chunks"),
          col("stride").cast("int").as("stride"),
          col("chunk_idx").cast("int").as("chunk_idx"),
          expr(s"md5(substring(payload, chunk_idx * $ChunkBytes + 1, $ChunkBytes))")
            .as("frame_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Header byte-value histogram per media kind (r12) — the
    // corruption/format-drift signature over the binary column: the
    // distribution of the first 16 header bytes per sniffed kind (a
    // codec change, encoding corruption, or mislabeled batch shifts
    // this fingerprint before any decoder runs — the cheap gate a
    // multimodal pipeline checks per ingest batch). Byte positions
    // explode map-side (≤16 rows/payload regardless of payload size —
    // header-bounded, unlike q_mm_chunks' ∝ bytes), then ONE
    // map-side-combining hash agg: shuffle ∝ kinds × 256 no matter the
    // corpus. Integer byte values end to end.
    "q_mm_bytehist" -> ((s, d) =>
      byteHistOn(s, d).orderBy(col("kind_stub"), col("byte_val")))
    ,

    // Header-byte diversity per sniffed kind (r14) — the corruption /
    // mis-sniff tripwire: a media kind whose first-16-bytes histogram
    // is too concentrated (low Gini-Simpson, one dominant byte) is
    // padding or a stuck encoder; too flat is random corruption. The
    // q_text_langmix tail over the SAME shared histogram q_mm_bytehist
    // reports raw (byteHistOn — one derivation, two graded views):
    // dominant byte (ties → smallest value), its share, and
    // 1 − Σ(c∕n)² from EXACT integer power sums on DECIMAL(38,0)/
    // HUGEINT (n² crosses BIGINT near 10¹⁰ sampled bytes per kind —
    // inside 100-TB range), single unrounded IEEE divisions (§7.4
    // rule 1). Plan: the histogram's explode-agg (shuffle ∝ kind×256)
    // then one ∝-kinds collapse; mode via min-of-struct, never a
    // window.
    "q_mm_diversity" -> ((s, d) => {
      val dec = "decimal(38,0)"
      byteHistOn(s, d).groupBy(col("kind_stub")).agg(
          sum(col("cnt")).as("n_bytes"),
          count(lit(1)).as("n_distinct"),
          sum(col("cnt").cast(dec) * col("cnt")).as("s2"),
          min(struct((-col("cnt")).as("nc"), col("byte_val").as("b")))
            .as("m"))
        .select(col("kind_stub"), col("n_bytes"), col("n_distinct"),
          col("m.b").as("top_byte"), (-col("m.nc")).as("top_n"),
          ((-col("m.nc")).cast("double") / col("n_bytes").cast("double"))
            .as("top_share"),
          ((col("n_bytes").cast(dec) * col("n_bytes") - col("s2"))
            .cast("double")
            / (col("n_bytes").cast(dec) * col("n_bytes")).cast("double"))
            .as("simpson_div"))
        .orderBy(col("kind_stub"))
    }),

    // Byte-level SimHash near-dup (r12) — the perceptual-hash analog
    // for OPAQUE payloads: 16-bit majority-vote signature over distinct
    // 4-byte grams, banded candidates within the sniffed-kind block,
    // hamming ≤ 3 verified — q_llm_simdup's EXACT pigeonhole machinery
    // (LlmOps.simhashSigsOn/simDupPairsOn, reused verbatim) pointed at
    // byte grams instead of tokens: a re-encoded/lightly-corrupted copy
    // shares most byte windows the way a lightly-edited doc shares most
    // tokens — caught before any decoder runs. Gram build is pure
    // per-row map (transform over a length-guarded sequence — §7.4.9);
    // len < 4 payloads drop structurally on both engines.
    "q_mm_simdup" -> ((s, d) => {
      val base = T.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .filter(length(col("payload")) >= 4)
        .select(col("doc_id"),
          when(byteVal(col("payload"), 1) % 3 === 0, "image")
            .when(byteVal(col("payload"), 1) % 3 === 1, "audio")
            .otherwise("video").as("kind_stub"),
          array_distinct(expr(
            "transform(sequence(1, length(payload) - 3)," +
              " i -> hex(substring(payload, i, 4)))")).as("tk"))
      // signature stage: the AGGREGATE form, not the compiled
      // graft_simhash16 expression — measured A/B (BASELINE.md r12):
      // byte-gram rows carry ~n_chars grams each, and the explode +
      // vote agg redistributes that md5 work across every core while
      // the per-row expression serializes it inside few heavy rows
      // (2.3 s vs 3.9 s warm at sf0.1) — the opposite verdict from the
      // light word-token rows, recorded honestly
      LlmOps.simDupPairsOn(
          LlmOps.simhashSigsAggOn(base, Seq("kind_stub")), Seq("kind_stub"))
        .select(col("doc_a"), col("doc_b"), col("kind_stub"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    })
  )

  private val doc = tbl("documents")

  /** DuckDB twins — text-side byte math (ASCII ⇒ char == byte; see the
    * object scaladoc). */
  private def sqlByteVal(i: Int) =
    s"CAST(('0x' || hex(substring(text, $i, 1)::BLOB)) AS INT)"

  val oracle: Map[String, String] = Map(
    // Same integer LENGTH(bin()) bucket (the q_text_lenhist twin).
    "q_mm_sizehist" ->
      s"""WITH m AS (
            SELECT CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                        WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind_stub,
              octet_length(text::BLOB) AS n_bytes
            FROM $doc)
          SELECT kind_stub, CAST(LENGTH(bin(n_bytes)) AS INTEGER) AS b,
            COUNT(*) AS n_payloads,
            CAST(MIN(n_bytes) AS INTEGER) AS min_bytes,
            CAST(MAX(n_bytes) AS INTEGER) AS max_bytes,
            CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes
          FROM m GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_mm_meta" ->
      s"""SELECT doc_id,
            CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
            md5(text) AS content_md5,
            hex(substring(text, 1, 4)::BLOB) AS header_hex,
            CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                 WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                 ELSE 'video' END AS kind_stub
          FROM $doc ORDER BY doc_id""",
    "q_mm_chunks" ->
      s"""SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
            CAST(length(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes)) AS INTEGER) AS chunk_len,
            md5(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes)) AS chunk_md5
          FROM (
            SELECT doc_id, text,
              UNNEST(range(0, (octet_length(text::BLOB) + ${ChunkBytes - 1}) // $ChunkBytes)) AS chunk_idx
            FROM $doc WHERE doc_id < 50) t
          ORDER BY doc_id, chunk_idx""",
    "q_mm_dedupstats" ->
      s"""WITH p AS (SELECT
              CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                   WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS kind_stub,
              md5(text) AS h,
              CAST(octet_length(text::BLOB) AS BIGINT) AS nb
            FROM $doc),
          g AS (SELECT kind_stub, h, COUNT(*) AS copies, MAX(nb) AS nb
                FROM p GROUP BY 1, 2)
          SELECT kind_stub,
            CAST(SUM(copies) AS BIGINT) AS n_payloads,
            COUNT(*) AS n_distinct,
            CAST(SUM(copies - 1) AS BIGINT) AS n_dups,
            CAST(SUM((copies - 1) * nb) AS BIGINT) AS bytes_dedupable
          FROM g GROUP BY 1 ORDER BY kind_stub""",
    // The dedupstats rollup over q_mm_chunks' fixed-16-byte explode
    // (substring on the ASCII corpus: char == byte, the chunks-oracle
    // precedent).
    "q_mm_chunkdup" ->
      s"""WITH c AS (
            SELECT
              CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                   WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS kind_stub,
              md5(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes))
                AS h,
              CAST(length(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes))
                AS BIGINT) AS nb
            FROM (
              SELECT text,
                UNNEST(range(0, (octet_length(text::BLOB) + ${ChunkBytes - 1}) // $ChunkBytes))
                  AS chunk_idx
              FROM $doc WHERE octet_length(text::BLOB) >= 1) t),
          g AS (SELECT kind_stub, h, COUNT(*) AS copies, MAX(nb) AS nb
                FROM c GROUP BY 1, 2)
          SELECT kind_stub,
            CAST(SUM(copies) AS BIGINT) AS n_chunks,
            COUNT(*) AS n_distinct,
            CAST(SUM(copies - 1) AS BIGINT) AS n_dups,
            CAST(SUM((copies - 1) * nb) AS BIGINT) AS bytes_dedupable
          FROM g GROUP BY 1 ORDER BY kind_stub""",
    // The CDC twin: the identical base-31 window polynomial per
    // position (list_filter over range — DuckDB's range(w, n+1) is
    // empty when n < w, matching the engine's greatest() guard), the
    // same bounds-concat chunk slicing, then the chunkdup rollup.
    // ASCII-corpus assumption (r17 ADVICE): the twin slices chunks
    // with character-based substring on VARCHAR while the engine
    // slices the BINARY payload by bytes — they agree because the
    // documents corpus is ASCII (1 char = 1 byte; the same contract
    // the other text↔binary twins state). A multi-byte corpus would
    // need ::BLOB slicing on the DuckDB side.
    "q_mm_cdc" -> {
      val terms = (0 until CdcWindow).map(j =>
        s"CAST(('0x' || hex(substring(text, i - $j, 1)::BLOB)) AS BIGINT)" +
          s" * ${BigInt(CdcBase).pow(j)}").mkString(" + ")
      s"""WITH d AS (
            SELECT text,
              CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                   WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS kind_stub,
              CAST(octet_length(text::BLOB) AS BIGINT) AS n
            FROM $doc WHERE octet_length(text::BLOB) >= 1),
          cut AS (
            SELECT text, kind_stub, n,
              list_filter(range($CdcWindow, n + 1),
                i -> i < n AND ($terms) % $CdcMod = 0) AS cuts
            FROM d),
          bd AS (
            SELECT kind_stub, text,
              list_concat(list_concat([CAST(0 AS BIGINT)], cuts), [n])
                AS bounds
            FROM cut),
          ch AS (
            SELECT kind_stub,
              md5(substring(text, CAST(bounds[k - 1] + 1 AS INT),
                CAST(bounds[k] - bounds[k - 1] AS INT))) AS h,
              bounds[k] - bounds[k - 1] AS nb
            FROM bd, UNNEST(range(2, len(bounds) + 1)) t(k)),
          g AS (SELECT kind_stub, h, COUNT(*) AS copies, MAX(nb) AS nb
                FROM ch GROUP BY 1, 2)
          SELECT kind_stub,
            CAST(SUM(copies) AS BIGINT) AS n_chunks,
            COUNT(*) AS n_distinct,
            CAST(SUM(copies - 1) AS BIGINT) AS n_dups,
            CAST(SUM((copies - 1) * nb) AS BIGINT) AS bytes_dedupable
          FROM g GROUP BY 1 ORDER BY kind_stub"""
    },
    // The cross-kind chunk rollup: the cdc twin's chain through g,
    // then the per-hash kind fold; COUNT(*) is never NULL and the
    // sums COALESCE to 0 so the degenerate row is deterministic.
    "q_mm_crosskind" -> {
      val terms = (0 until CdcWindow).map(j =>
        s"CAST(('0x' || hex(substring(text, i - $j, 1)::BLOB)) AS BIGINT)" +
          s" * ${BigInt(CdcBase).pow(j)}").mkString(" + ")
      s"""WITH d AS (
            SELECT text,
              CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                   WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS kind_stub,
              CAST(octet_length(text::BLOB) AS BIGINT) AS n
            FROM $doc WHERE octet_length(text::BLOB) >= 1),
          cut AS (
            SELECT text, kind_stub, n,
              list_filter(range($CdcWindow, n + 1),
                i -> i < n AND ($terms) % $CdcMod = 0) AS cuts
            FROM d),
          bd AS (
            SELECT kind_stub, text,
              list_concat(list_concat([CAST(0 AS BIGINT)], cuts), [n])
                AS bounds
            FROM cut),
          ch AS (
            SELECT kind_stub,
              md5(substring(text, CAST(bounds[k - 1] + 1 AS INT),
                CAST(bounds[k] - bounds[k - 1] AS INT))) AS h,
              bounds[k] - bounds[k - 1] AS nb
            FROM bd, UNNEST(range(2, len(bounds) + 1)) t(k)),
          g AS (SELECT kind_stub, h, COUNT(*) AS copies, MAX(nb) AS nb
                FROM ch GROUP BY 1, 2),
          x AS (SELECT h, COUNT(*) AS n_kinds, SUM(copies) AS copies,
                  MAX(nb) AS nb
                FROM g GROUP BY h HAVING COUNT(*) >= 2)
          SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks_xkind,
            CAST(COALESCE(SUM(copies), 0) AS BIGINT) AS n_copies,
            CAST(COALESCE(SUM((n_kinds - 1) * nb), 0) AS BIGINT)
              AS extra_bytes
          FROM x""".stripMargin
    },
    "q_mm_features" ->
      s"""SELECT doc_id,
            CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
            (${sqlByteVal(1)} % 64 + 1) AS width_stub,
            (${sqlByteVal(2)} % 64 + 1) AS height_stub,
            (CAST(octet_length(text::BLOB) // 256 AS INTEGER) + 1) AS n_frames_stub,
            round((${(1 to 8).map(sqlByteVal).mkString(" + ")}) / 8.0, 6) AS mean_byte8
          FROM $doc ORDER BY doc_id""",
    "q_mm_framesample" ->
      s"""SELECT doc_id, CAST(n_chunks AS INTEGER) AS n_chunks,
            CAST(stride AS INTEGER) AS stride,
            CAST(chunk_idx AS INTEGER) AS chunk_idx,
            md5(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes)) AS frame_md5
          FROM (
            SELECT doc_id, text, n_chunks, stride,
              UNNEST(range(0, n_chunks, stride)) AS chunk_idx
            FROM (
              SELECT doc_id, text,
                (octet_length(text::BLOB) + ${ChunkBytes - 1}) // $ChunkBytes AS n_chunks,
                ((octet_length(text::BLOB) + ${ChunkBytes - 1}) // $ChunkBytes
                  + $MaxFrames - 1) // $MaxFrames AS stride
              FROM $doc) b
            WHERE n_chunks >= 1) t
          ORDER BY doc_id, chunk_idx""",
    // generate_series is inclusive-both-ends (the Spark sequence twin);
    // header positions capped at 16, kind from the first byte.
    "q_mm_bytehist" ->
      s"""SELECT kind_stub, byte_val, COUNT(*) AS cnt FROM (
            SELECT
              CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                   WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS kind_stub,
              CAST(('0x' || hex(substring(text, g.i, 1)::BLOB)) AS INT)
                AS byte_val
            FROM $doc,
              unnest(generate_series(1,
                least(octet_length(text::BLOB), 16))) AS g(i)
            WHERE octet_length(text::BLOB) >= 1) z
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // The bytehist CTE + the langmix mode/power-sum tail (HUGEINT —
    // the Spark side's DECIMAL(38,0) twin), two single int→double
    // divisions.
    "q_mm_diversity" ->
      s"""WITH h AS (
            SELECT kind_stub, byte_val, COUNT(*) AS cnt FROM (
              SELECT
                CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                     WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind_stub,
                CAST(('0x' || hex(substring(text, g.i, 1)::BLOB)) AS INT)
                  AS byte_val
              FROM $doc,
                unnest(generate_series(1,
                  least(octet_length(text::BLOB), 16))) AS g(i)
              WHERE octet_length(text::BLOB) >= 1) z
            GROUP BY 1, 2),
          mx AS (SELECT kind_stub, MAX(cnt) AS cmax FROM h GROUP BY 1),
          tp AS (
            SELECT h.kind_stub, MIN(h.byte_val) AS top_byte
            FROM h JOIN mx ON h.kind_stub = mx.kind_stub
              AND h.cnt = mx.cmax
            GROUP BY 1),
          g AS (
            SELECT kind_stub, CAST(SUM(cnt) AS BIGINT) AS n_bytes,
              COUNT(*) AS n_distinct,
              SUM(CAST(cnt AS HUGEINT) * cnt) AS s2
            FROM h GROUP BY 1)
          SELECT g.kind_stub, n_bytes, n_distinct, top_byte,
            CAST(cmax AS BIGINT) AS top_n,
            CAST(cmax AS DOUBLE) / CAST(n_bytes AS DOUBLE) AS top_share,
            CAST(CAST(n_bytes AS HUGEINT) * n_bytes - s2 AS DOUBLE)
              / CAST(CAST(n_bytes AS HUGEINT) * n_bytes AS DOUBLE)
              AS simpson_div
          FROM g JOIN mx ON g.kind_stub = mx.kind_stub
            JOIN tp ON g.kind_stub = tp.kind_stub
          ORDER BY g.kind_stub""",
    // The q_llm_simdup vote/band chain verbatim over byte-gram tokens
    // (hex of 4-char windows — char == byte on the ASCII corpus).
    "q_mm_simdup" -> {
      import LlmOps.{SimBandBits, SimBands, SimHamMax}
      val votes = (0 until 16).map(bit =>
        s"SUM(CASE WHEN (h >> $bit) & 1 = 1 THEN 1 ELSE -1 END) AS v$bit")
        .mkString(",\n              ")
      val sig = (0 until 16).map(bit =>
        s"CASE WHEN v$bit > 0 THEN ${1L << bit} ELSE 0 END").mkString(" + ")
      val bandMask = (1 << SimBandBits) - 1
      s"""WITH base AS (
            SELECT doc_id,
              CASE WHEN ${sqlByteVal(1)} % 3 = 0 THEN 'image'
                   WHEN ${sqlByteVal(1)} % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS kind_stub,
              text
            FROM $doc WHERE octet_length(text::BLOB) >= 4),
          toks AS (
            SELECT doc_id, kind_stub, UNNEST(list_distinct(
              list_transform(range(1, length(text) - 2),
                i -> hex(substring(text, i, 4)::BLOB)))) AS tok
            FROM base),
          h AS (SELECT doc_id, kind_stub,
              ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h
            FROM toks),
          v AS (SELECT doc_id, kind_stub,
              $votes
            FROM h GROUP BY 1, 2),
          sig AS (SELECT doc_id, kind_stub, CAST($sig AS BIGINT) AS simhash
            FROM v),
          bands AS (
            SELECT doc_id, kind_stub, band,
              (simhash >> (band * $SimBandBits)) & $bandMask AS bv
            FROM sig CROSS JOIN
              (SELECT UNNEST([${(0 until SimBands).mkString(",")}]) AS band) b),
          cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM bands x JOIN bands y
              ON x.kind_stub = y.kind_stub AND x.band = y.band
              AND x.bv = y.bv AND x.doc_id < y.doc_id)
          SELECT doc_a, doc_b, sa.kind_stub,
            CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER)
              AS hamming
          FROM cand JOIN sig sa ON doc_a = sa.doc_id
                    JOIN sig sb ON doc_b = sb.doc_id
          WHERE bit_count(xor(sa.simhash, sb.simhash)) <= $SimHamMax
          ORDER BY doc_a, doc_b"""
    }
  )
}
