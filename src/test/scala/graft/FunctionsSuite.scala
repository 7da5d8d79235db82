package graft

import graft.functions.DotF64
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** The custom Catalyst expression surface: graft_dot (native codegen
  * dot product) and graft_jaccard (native codegen set Jaccard) must
  * agree bitwise with their built-ins-only composites and be reachable
  * from SQL text. */
class FunctionsSuite extends SparkSuite {
  import spark.implicits._
  import graft.functions.JaccardStr

  test("graft_jaccard == size(array_intersect)/sizes composite bitwise on randomized distinct arrays") {
    JaccardStr.register(spark)
    val rng = new scala.util.Random(5)
    val vocab = (1 to 25).map(i => s"w$i")
    val rows = (1 to 300).map { i =>
      (i.toLong, rng.shuffle(vocab).take(1 + rng.nextInt(12)),
        rng.shuffle(vocab).take(1 + rng.nextInt(12)))
    }
    val df = rows.toDF("id", "a", "b")
    val mismatches = df
      .withColumn("native", call_function("graft_jaccard", col("a"), col("b")))
      .withColumn("common", size(array_intersect(col("a"), col("b"))))
      .withColumn("composite",
        col("common") / (size(col("a")) + size(col("b")) - col("common")))
      .filter(!(col("native") <=> col("composite")))
      .count()
    assert(mismatches === 0L)
  }

  test("graft_overlap == size(array_intersect) bitwise on randomized arrays incl. duplicates") {
    graft.functions.OverlapCount.register(spark)
    val rng = new scala.util.Random(11)
    val vocab = (1 to 25).map(i => s"w$i")
    // NOT distinct-only: duplicate elements on either side must count
    // once, matching array_intersect's dedup (remove-on-match)
    val rows = (1 to 300).map { i =>
      def arr = Seq.fill(1 + rng.nextInt(14))(vocab(rng.nextInt(vocab.size)))
      (i.toLong, arr, arr)
    }
    val df = rows.toDF("id", "a", "b")
    val mismatches = df
      .withColumn("native", call_function("graft_overlap", col("a"), col("b")))
      .withColumn("composite",
        size(array_intersect(col("a"), col("b"))).cast("long"))
      .filter(!(col("native") <=> col("composite")))
      .count()
    assert(mismatches === 0L)
  }

  test("graft_overlap from SQL text; null array -> null; whole-stage codegen; division parity with the composite") {
    graft.functions.OverlapCount.register(spark)
    val r = spark.sql(
      """SELECT graft_overlap(array('a','b','c'), array('b','c','d')) AS two,
                graft_overlap(array('a'), array('b')) AS zero,
                graft_overlap(CAST(NULL AS ARRAY<STRING>), array('a')) AS nl,
                graft_overlap(array('a','a','b'), array('a')) AS dedup""")
      .collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L)
    assert(r.isNullAt(2))
    assert(r.getLong(3) === 1L, "duplicates must count once")
    // the graded q_llm_contain verify shape stays inside codegen, and
    // its division is bitwise the composite's (exact ints, one IEEE op)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tk"))
    val df = docs.select(
      (call_function("graft_overlap", col("tk"), col("tk")) / size(col("tk"))).as("c"),
      (size(array_intersect(col("tk"), col("tk"))) / size(col("tk"))).as("comp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_overlap") && plan.contains("*(1)"),
      s"graft_overlap fell out of whole-stage codegen:\n$plan")
    assert(df.filter(!(col("c") <=> col("comp"))).count() === 0L)
  }

  test("graft_jaccard from SQL text; null array -> null; disjoint -> 0; identical -> 1") {
    JaccardStr.register(spark)
    val r = spark.sql(
      """SELECT graft_jaccard(array('a','b'), array('b','a')) AS eq,
                graft_jaccard(array('a'), array('b')) AS disj,
                graft_jaccard(CAST(NULL AS ARRAY<STRING>), array('a')) AS nl,
                graft_jaccard(array('a','b','c'), array('b','c','d')) AS half""")
      .collect()(0)
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 0.0)
    assert(r.isNullAt(2))
    assert(r.getDouble(3) === 0.5)
  }

  test("graft_jaccard participates in whole-stage codegen") {
    JaccardStr.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_jacwsc").toString
    Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tk"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(call_function("graft_jaccard", col("tk"), col("tk")).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_jaccard"),
      s"graft_jaccard fell out of whole-stage codegen:\n$plan")
    assert(df.filter(col("j") =!= 1.0).count() === 0L)
  }

  test("graft_minhash_sig from SQL text; short token arrays -> null; stays in whole-stage codegen") {
    graft.functions.MinHashSig.register(spark,
      LlmOps.hashA.toSeq, LlmOps.hashB.toSeq, LlmOps.HashP)
    // < 3 tokens: no shingles, null signature (callers filter those)
    val r = spark.sql(
      """SELECT graft_minhash_sig(array('a', 'b')) AS short,
                size(graft_minhash_sig(array('a','b','c','d'))) AS n""")
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getInt(1) === LlmOps.NumHashes)
    // codegen presence over a parquet scan (same shape as the jaccard pin)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhwsc").toString
    Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(call_function("graft_minhash_sig", col("tk")).as("ms"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_minhash_sig"),
      s"graft_minhash_sig fell out of whole-stage codegen:\n$plan")
  }

  test("graft_simhash16 == the explode+vote aggregate form BITWISE on the corpus, for word tokens AND byte grams; dups vote once; stays in codegen") {
    graft.functions.SimHash16.register(spark)
    // word-token caller shape (q_llm_simhash/simdup)
    val words = Tables.documents(spark, sf)
      .select(col("doc_id"), lit("x").as("blk"),
        array_distinct(split(col("text"), " ")).as("tk"))
    // byte-gram caller shape (q_mm_simdup)
    val grams = Tables.documents(spark, sf)
      .withColumn("payload", col("text").cast("binary"))
      .filter(length(col("payload")) >= 4)
      .select(col("doc_id"), lit("x").as("blk"),
        array_distinct(expr(
          "transform(sequence(1, length(payload) - 3)," +
            " i -> hex(substring(payload, i, 4)))")).as("tk"))
    Seq(words, grams).foreach { docs =>
      val fast = queries.LlmOps.simhashSigsOn(docs, Seq("blk"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val agg = queries.LlmOps.simhashSigsAggOn(docs, Seq("blk"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(fast === agg && fast.nonEmpty)
    }
    // a repeated token votes once (Set semantics = array_distinct)
    val dup = spark.sql(
      """SELECT graft_simhash16(array('a','a','b')) AS d,
                graft_simhash16(array('a','b')) AS u""").collect()(0)
    assert(dup.getLong(0) === dup.getLong(1))
    // codegen presence over a parquet scan (the jaccard/minhash pin)
    val dir = java.nio.file.Files.createTempDirectory("graft_shwsc").toString
    Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(call_function("graft_simhash16", col("tk")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_simhash16"),
      s"graft_simhash16 fell out of whole-stage codegen:\n$plan")
  }

  test("graft_simhash16 edge inputs: NULL element votes -1/bit like the aggregate twin; empty array = sig-0 row vs explode drop") {
    graft.functions.SimHash16.register(spark)
    // null-element arrays: compiled form must match the aggregate twin
    // (md5(NULL)=NULL -> otherwise(-1) on every bit), and a null entry
    // is distinct from the "" token.
    val docs = spark.sql(
      """SELECT * FROM VALUES
           (1L, 'x', array('a', CAST(NULL AS STRING), 'b')),
           (2L, 'x', array(CAST(NULL AS STRING))),
           (3L, 'x', array('', CAST(NULL AS STRING))),
           (4L, 'x', array('a', 'b'))
         AS t(doc_id, blk, tk)""")
    val fast = queries.LlmOps.simhashSigsOn(docs, Seq("blk"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val agg = queries.LlmOps.simhashSigsAggOn(docs, Seq("blk"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fast === agg && fast.size === 4)
    // an all-null array votes -1 on all 16 bits -> signature 0
    assert(fast(2L) === 0L)
    // empty array: documented divergence — compiled emits a sig-0 row,
    // the explode-based twin drops the doc.
    val empty = spark.sql(
      "SELECT * FROM VALUES (9L, 'x', array_remove(array('q'), 'q')) AS t(doc_id, blk, tk)")
    val fe = queries.LlmOps.simhashSigsOn(empty, Seq("blk")).collect()
    val ae = queries.LlmOps.simhashSigsAggOn(empty, Seq("blk")).collect()
    assert(fe.length === 1 && fe(0).getLong(2) === 0L)
    assert(ae.isEmpty)
  }

  test("MinHashSig.register: same family = quiet no-op, DIFFERENT family really replaces") {
    // r9 review find: the idempotent-quiet guard must not become
    // first-registration-WINS — a caller supplying their own hash family
    // would silently keep computing with the stale constants. Run in a
    // cloned session so the shared session's registration is untouched.
    val s2 = spark.newSession()
    def sig(): Long = s2.sql(
      "SELECT graft_minhash_sig(array('a','b','c','d'))[0] AS m")
      .collect()(0).getLong(0)
    graft.functions.MinHashSig.register(s2,
      LlmOps.hashA.toSeq, LlmOps.hashB.toSeq, LlmOps.HashP)
    val libSig = sig()
    // same family again: result unchanged (and no replacement happens —
    // the quiet path — though quietness itself isn't assertable here)
    graft.functions.MinHashSig.register(s2,
      LlmOps.hashA.toSeq, LlmOps.hashB.toSeq, LlmOps.HashP)
    assert(sig() === libSig)
    // a different family must actually take effect
    val a2 = LlmOps.hashA.toSeq.map(_ + 1)
    graft.functions.MinHashSig.register(s2, a2, LlmOps.hashB.toSeq, LlmOps.HashP)
    assert(sig() !== libSig, "different hash family was silently ignored")
    // and registering the library family back restores the signatures
    graft.functions.MinHashSig.register(s2,
      LlmOps.hashA.toSeq, LlmOps.hashB.toSeq, LlmOps.HashP)
    assert(sig() === libSig)
  }

  test("MinHashSig.register: two sessions with DIFFERENT families stay independent") {
    // r10 advice closure pin: the known-family record is per-session
    // (WeakHashMap keyed by SparkSession, MinHashSig.scala), never a
    // JVM-global last-wins. Two sessions carrying different families
    // must each keep computing with their OWN constants, and a repeat
    // register on either side must not cross-contaminate the other.
    val sA = spark.newSession()
    val sB = spark.newSession()
    def sig(s: org.apache.spark.sql.SparkSession): Long = s.sql(
      "SELECT graft_minhash_sig(array('a','b','c','d'))[0] AS m")
      .collect()(0).getLong(0)
    val famA = LlmOps.hashA.toSeq
    val famB = LlmOps.hashA.toSeq.map(_ + 7)
    graft.functions.MinHashSig.register(sA, famA, LlmOps.hashB.toSeq, LlmOps.HashP)
    graft.functions.MinHashSig.register(sB, famB, LlmOps.hashB.toSeq, LlmOps.HashP)
    val aSig = sig(sA)
    val bSig = sig(sB)
    assert(aSig !== bSig, "distinct families must produce distinct signatures")
    // a JVM-global record would make these re-registers no-op on the
    // WRONG session's family; per-session records keep both stable
    graft.functions.MinHashSig.register(sA, famA, LlmOps.hashB.toSeq, LlmOps.HashP)
    graft.functions.MinHashSig.register(sB, famB, LlmOps.hashB.toSeq, LlmOps.HashP)
    assert(sig(sA) === aSig, "session A drifted after re-register")
    assert(sig(sB) === bSig, "session B drifted after re-register")
  }

  test("graft_dot == HOF fold bitwise on all sf0.001 embedding pairs (probes < 5)") {
    DotF64.register(spark)
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val probes = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("p_id"), col("e").as("pe"))
    val pairs = base.crossJoin(broadcast(probes))
    val mismatches = pairs
      .withColumn("native", call_function("graft_dot", col("pe"), col("e")))
      .withColumn("hof", LlmOps.dotHof(col("pe"), col("e")))
      .filter(!(col("native") <=> col("hof"))) // null-safe exact equality
      .count()
    assert(mismatches === 0L)
    assert(pairs.count() === 500L * 5L)
  }

  test("graft_dot is callable from SQL text (FunctionRegistry injection)") {
    DotF64.register(spark)
    val out = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(out === 32.0)
  }

  test("graft_dot null/length semantics: null array -> null; common-prefix fold") {
    DotF64.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a,
                graft_dot(array(1.0d, 2.0d, 3.0d), array(10.0d)) AS b""")
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 10.0)
  }

  test("graft_dot participates in whole-stage codegen (no fallback in the plan)") {
    DotF64.register(spark)
    // arrays must already be array<double>: a lambda-based transform in the
    // same projection would block codegen for the whole stage (that is the
    // very problem this expression exists to avoid)
    val dir = java.nio.file.Files.createTempDirectory("graft_dotwsc").toString
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(call_function("graft_dot", col("e"), col("e")).as("d"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"),
      s"graft_dot fell out of whole-stage codegen:\n$plan")
    assert(df.agg(min(col("d"))).collect()(0).getDouble(0) >= 0.0) // Σx² ≥ 0
  }

  test("graft_charhist: ASCII counts by lead byte & 63; multibyte chars count ONCE; total == char count (r15)") {
    graft.functions.CharHist64.register(spark)
    graft.functions.HistL1.register(spark)
    val r = spark.sql(
      """SELECT graft_charhist('aab') AS h1,
                graft_charhist('') AS h0,
                graft_charhist('héé') AS hm,
                graft_charhist(CAST(NULL AS STRING)) AS hn""").collect()(0)
    val h1 = r.getSeq[Int](0)
    assert(h1.length === 64 && h1.sum === 3)
    assert(h1('a' & 63) === 2 && h1('b' & 63) === 1)
    assert(r.getSeq[Int](1).sum === 0)
    // 'é' is 2 UTF-8 bytes (0xC3 0xA9): continuation byte skipped, so
    // each char contributes exactly one unit — 3 chars, 3 units
    val hm = r.getSeq[Int](2)
    assert(hm.sum === 3 && hm('h' & 63) === 1 && hm(0xC3 & 63) === 2)
    assert(r.isNullAt(3))
  }

  test("graft_l1: elementwise abs-diff sum; LOSSLESS edit bound ceil(L1/2) <= levenshtein on randomized pairs (r15)") {
    graft.functions.CharHist64.register(spark)
    graft.functions.HistL1.register(spark)
    assert(spark.sql(
      "SELECT graft_l1(array(1,5,0), array(3,2,4))").collect()(0).getInt(0) === 9)
    // Empirical check of the prescreen's safety theorem: for any pair,
    // ceil(graft_l1(hist_a, hist_b) / 2) <= levenshtein(a, b). Random
    // near-dup-ish strings (shared prefix + noise) + unicode mixes.
    val rng = new scala.util.Random(17)
    val alpha = "abcdefgh éß日"
    def randStr() = {
      val n = rng.nextInt(40)
      (0 until n).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    }
    val rows = (1 to 400).map { i =>
      val base = randStr()
      val mutated = base.map(c =>
        if (rng.nextInt(10) == 0) alpha(rng.nextInt(alpha.length)) else c) +
        (if (rng.nextBoolean()) randStr().take(3) else "")
      (i, base, mutated)
    }
    val viol = rows.toDF("id", "a", "b")
      .withColumn("l1", call_function("graft_l1",
        call_function("graft_charhist", col("a")),
        call_function("graft_charhist", col("b"))))
      .withColumn("ed", levenshtein(col("a"), col("b")))
      .filter(ceil(col("l1") / 2.0) > col("ed"))
      .count()
    assert(viol === 0L, "char-histogram L1/2 exceeded true edit distance — prescreen would be LOSSY")
  }

  test("graft_minhash_sig arity mismatch is a clean error naming the signature, not a NoSuchElementException") {
    Seq("SELECT graft_minhash_sig()",
        "SELECT graft_minhash_sig(array('a'), array('b'))").foreach { sql =>
      val e = intercept[Exception] { spark.sql(sql).collect() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          String.valueOf(x.getMessage) +: messages(x.getCause))
      assert(messages(e).exists(_.contains("expects exactly 1 argument")),
        s"unhelpful arity error for [$sql]: $e")
    }
  }
}
