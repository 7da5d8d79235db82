package graft

import graft.multimodal.{DecodeStub, Payload}
import graft.queries.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: the ASCII byte==char equivalence
  * the oracles rely on, chunking losslessness, and the mapPartitions
  * decode-stub contract. */
class MultimodalSuite extends SparkSuite {
  import spark.implicits._

  test("oracle precondition: the corpus is pure ASCII (binary ops == text ops)") {
    val nonAscii = Tables.documents(spark, sf)
      .filter(!col("text").rlike("^[\\x20-\\x7e]*$")).count()
    assert(nonAscii === 0L)
    // and byte length == char length on every row
    val diff = Tables.documents(spark, sf)
      .filter(length(col("text").cast("binary")) =!= length(col("text"))).count()
    assert(diff === 0L)
  }

  test("q_mm_chunks is a lossless partition of the payload") {
    val chunks = MultimodalOps.queries("q_mm_chunks")(spark, sf).collect()
    val sizes = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select(col("doc_id"), length(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === sizes.keySet)
    byDoc.foreach { case (id, rs) =>
      // chunk lengths sum back to the payload size; only the last chunk is short
      assert(rs.map(_.getAs[Int]("chunk_len")).sum === sizes(id))
      val idxs = rs.map(_.getAs[Int]("chunk_idx")).sorted
      assert(idxs.toSeq === (0 until rs.length))
      assert(rs.sortBy(_.getAs[Int]("chunk_idx")).dropRight(1)
        .forall(_.getAs[Int]("chunk_len") === 16))
    }
  }

  test("q_mm_chunkdup: planted shared prefix dedups at the block grain where whole-payload dedup sees distinct contents") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chunkdup").toString
    // 'A' (65 % 3 == 2) sniffs video, '0' (48 % 3 == 0) sniffs image.
    // video docs share their first 16-byte block but differ after —
    // whole-payload dedup sees 2 distinct contents, block dedup saves 16B.
    Seq(
      (1L, "A" * 16 + "B" * 16),       // chunks: A16, B16
      (2L, "A" * 16 + "C" * 10),       // chunks: A16 (dup), C10 (short tail)
      (3L, "0123456789"))              // image: one 10-byte chunk
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = MultimodalOps.queries("q_mm_chunkdup")(spark, dir).collect()
      .map(r => r.getAs[String]("kind_stub") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("n_dups"), r.getAs[Long]("bytes_dedupable"))))
      .toMap
    assert(out === Map(
      "video" -> ((4L, 3L, 1L, 16L)),
      "image" -> ((1L, 1L, 0L, 0L))))
    // the whole-payload audit on the same corpus sees zero dups
    val whole = MultimodalOps.queries("q_mm_dedupstats")(spark, dir)
      .collect().map(r => r.getAs[String]("kind_stub") ->
        r.getAs[Long]("n_dups")).toMap
    assert(whole === Map("video" -> 0L, "image" -> 0L))
  }

  test("q_mm_diversity is exactly the langmix tail of q_mm_bytehist (one shared derivation, two graded views)") {
    val hist = MultimodalOps.queries("q_mm_bytehist")(spark, sf).collect()
      .map(r => (r.getAs[String]("kind_stub"), r.getAs[Int]("byte_val"),
        r.getAs[Long]("cnt")))
    val expected = hist.groupBy(_._1).view.mapValues { rows =>
      val n = rows.map(_._3).sum
      val s2 = rows.map(c => BigInt(c._3) * BigInt(c._3)).sum
      val cmax = rows.map(_._3).max
      val topByte = rows.filter(_._3 == cmax).map(_._2).min
      (n, rows.length.toLong, topByte, cmax,
        cmax.toDouble / n.toDouble,
        (BigInt(n) * BigInt(n) - s2).toDouble / (BigInt(n) * BigInt(n)).toDouble)
    }.toMap
    val out = MultimodalOps.queries("q_mm_diversity")(spark, sf).collect()
      .map(r => r.getAs[String]("kind_stub") ->
        ((r.getAs[Long]("n_bytes"), r.getAs[Long]("n_distinct"),
          r.getAs[Int]("top_byte"), r.getAs[Long]("top_n"),
          r.getAs[Double]("top_share"), r.getAs[Double]("simpson_div"))))
      .toMap
    spark.catalog.clearCache()
    assert(out.keySet === expected.keySet)
    out.foreach { case (k, v) => assert(v === expected(k), s"kind $k") }
    assert(out.values.forall(v => v._6 > 0 && v._6 < 1))
  }

  test("q_mm_meta header_hex is the hex of the first 4 UTF-8 bytes") {
    val row = MultimodalOps.queries("q_mm_meta")(spark, sf)
      .orderBy(col("doc_id")).limit(1).collect()(0)
    val text = Tables.documents(spark, sf).orderBy(col("doc_id"))
      .limit(1).collect()(0).getAs[String]("text")
    val expected = text.getBytes("UTF-8").take(4).map(b => f"$b%02X").mkString
    assert(row.getAs[String]("header_hex") === expected)
  }

  test("DecodeStub: 1:1 rows, partitioning preserved, deterministic output") {
    val payloads = (1L to 100L).map(i =>
      Payload(i, if (i % 2 == 0) "image" else "audio",
        s"payload-$i-${"x" * (i % 7).toInt}".getBytes("UTF-8")))
    val ds = spark.createDataset(payloads).repartition(8)
    val out = DecodeStub.decode(ds)
    assert(out.rdd.getNumPartitions === ds.rdd.getNumPartitions) // map stage: no shuffle
    val rows = out.collect()
    assert(rows.length === 100)
    // deterministic: same input → same checksums on a second run
    val again = DecodeStub.decode(ds).collect()
    assert(rows.map(r => r.doc_id -> r.checksum).toMap
      === again.map(r => r.doc_id -> r.checksum).toMap)
    // the fake dimensions come from header bytes: 'p' = 0x70 = 112
    val d1 = rows.find(_.doc_id == 1L).get
    assert(d1.width === 112 % 64 + 1)
    assert(d1.kind === "audio")
  }

  /** Deterministic non-periodic printable byte stream — per-index
    * String.hashCode avalanche (spec-fixed across JVMs), so no
    * repeated 16-gram and the fixed-block audit sees zero duplicate
    * blocks. (A multiplicative stepper mod 90 is NEAR-PERIODIC and
    * planted accidental block dups — measured before this form.) */
  private def scrambled(n: Int): String =
    (0 until n).map(i =>
      (33 + (math.abs(s"cdc-fixture-$i".hashCode) % 90)).toChar).mkString

  test("q_mm_cdc (r17): an insertion-shifted copy dedups under CDC and NOT under fixed 16-byte blocks") {
    val base = scrambled(600)
    // insertion keeps the kind byte class ('Z' = 90 ≡ 0 ≡ '!' = 33
    // mod 3 — both docs stay in the same per-kind dedup group)
    val docs = Seq((1L, base), (2L, "ZZZ" + base))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val cdc = MultimodalOps.cdcDedupOn(docs).collect()
    val cdcDups = cdc.map(_.getAs[Long]("n_dups")).sum
    val cdcBytes = cdc.map(_.getAs[Long]("bytes_dedupable")).sum
    assert(cdcDups >= 1,
      s"CDC found no shared chunks on a shifted copy: ${cdc.mkString(";")}")
    assert(cdcBytes > 0)
    val fixed = MultimodalOps.chunkDedupOn(docs).collect()
    val fixedDups = fixed.map(_.getAs[Long]("n_dups")).sum
    assert(fixedDups === 0L,
      s"fixed blocks unexpectedly aligned: ${fixed.mkString(";")}")
  }

  test("q_mm_cdc: docs shorter than the window form one whole-doc chunk — CDC degrades to exact dedup") {
    val docs = Seq((1L, "abcde"), (2L, "abcde"), (3L, "vwxyz"))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    // all three share byte-1 kind ('a','a','v' — 97%3=1 audio, 118%3=1
    // audio): one kind row with 3 chunks, 2 distinct, 1 dup of 5 bytes
    val out = MultimodalOps.cdcDedupOn(docs).collect()
    val tot = (out.map(_.getAs[Long]("n_chunks")).sum,
      out.map(_.getAs[Long]("n_distinct")).sum,
      out.map(_.getAs[Long]("n_dups")).sum,
      out.map(_.getAs[Long]("bytes_dedupable")).sum)
    assert(tot === ((3L, 2L, 1L, 5L)), s"got $tot: ${out.mkString(";")}")
  }

  test("q_mm_cdc: exact JVM mirror of the cut rule — engine chunk count equals the driver-side polynomial replay") {
    // the textbook replay: 1-based cut position i (8 ≤ i < n) where
    // Σ_{j<8} byte(i−j)·31^j ≡ 0 (mod 61); chunks = cuts + 1, and the
    // mirror's slices reassemble to the doc by construction
    def jvmCuts(s: String): Seq[Int] = {
      val b = s.getBytes("UTF-8").map(_ & 0xff)
      val n = b.length
      (8 until n).filter { i =>
        val h = (0 until 8).map(j => BigInt(b(i - 1 - j)) * BigInt(31).pow(j)).sum
        h % 61 == 0
      }
    }
    // edge lengths around the window (7/8/9), longer scrambled bodies,
    // and a reversed twin — every boundary case of the cut rule
    val texts = Seq(scrambled(600), scrambled(300).reverse, "tinydoc",
      scrambled(7), scrambled(8), scrambled(9), scrambled(63),
      scrambled(64), scrambled(1000), "x")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val expChunks = texts.map(t => jvmCuts(t).size + 1L).sum
    val out = MultimodalOps.cdcDedupOn(docs).collect()
    assert(out.map(_.getAs[Long]("n_chunks")).sum === expChunks,
      s"engine chunking diverged from the JVM mirror: ${out.mkString(";")}")
  }
}
