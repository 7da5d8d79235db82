package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ProductQuantizer pins: structure, broadcast-map plan shape, and the
  * ADC recall floor vs exact L2 on the real embeddings fixture.
  * Unit-only like the k-means quantizer it builds on (codebook means
  * are float reductions — not bit-stable across layouts), so the pins
  * here are behavioral, not bitwise. */
class ProductQuantizerSuite extends SparkSuite {

  // m=32 (2 dims/subspace) on the 64-dim fixture: these embeddings are
  // near-random, PQ's hardest regime — finer subspaces buy recall
  // (measured sweep: m=8/k=16 → 0.30, m=16/k=32 → 0.52, m=32/k=16 →
  // 0.66) while still compressing 256 B → 32 codes
  private val Dim = 64
  private val M = 32
  private val K = 16

  private def vecs: DataFrame =
    Tables.embeddings(spark, sf).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))

  private lazy val books =
    graft.operators.ProductQuantizer.codebooks(vecs, Dim, M, K, iters = 3)
      .persist()

  test("codebooks: m subspaces, <=k centroids each, slice-width vectors") {
    val rows = books.collect()
    assert(rows.map(_.getInt(0)).toSet === (0 until M).toSet)
    (0 until M).foreach { s =>
      val cents = rows.filter(_.getInt(0) == s)
      assert(cents.nonEmpty && cents.length <= K, s"sub $s: ${cents.length}")
      assert(cents.forall(_.getSeq[Double](2).length == Dim / M))
      val ids = cents.map(_.getInt(1))
      assert(ids.distinct.length == ids.length, s"sub $s: dup cent_ids")
    }
  }

  test("encode: one in-range code per subspace; zero exchange in the plan") {
    val enc = graft.operators.ProductQuantizer.encode(vecs, books, Dim, M)
    val bySub = books.collect().groupBy(_.getInt(0))
      .map { case (s, r) => s -> r.map(_.getInt(1)).toSet }
    val rows = enc.collect()
    assert(rows.length === vecs.count())
    rows.foreach { r =>
      val code = r.getSeq[Int](1)
      assert(code.length === M)
      code.zipWithIndex.foreach { case (c, s) =>
        assert(bySub(s).contains(c), s"vec ${r.getLong(0)} sub $s code $c")
      }
    }
    // the CORPUS side must reach the broadcast join without any shuffle
    // (the codebook side legitimately shuffles its bounded m×k table
    // into the collect_list + BroadcastExchange build)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val shuffled = enc.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike
        if e.toString.contains("embeddings.parquet") => e
    }
    assert(shuffled.isEmpty,
      s"encode shuffled the corpus (must be a pure broadcast map pass):\n" +
        enc.queryExecution.executedPlan)
  }

  test("adcSearch: recall@10 vs exact L2 clears the floor; top-k runs as WindowGroupLimit") {
    val probes = vecs.filter(col("vec_id") < 5)
    val res = graft.operators.ProductQuantizer.adcSearch(
      graft.operators.ProductQuantizer.encode(vecs, books, Dim, M),
      books, probes, Dim, M, k = 10)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"ADC top-k not group-limited:\n$plan")
    val approx = res.collect()
      .groupBy(_.getLong(0)).map { case (p, r) => p -> r.map(_.getLong(1)).toSet }
    // exact L2 top-10 mirror (same tie rule: d2 asc, vec_id asc)
    val all = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val exact = (0L until 5L).map { p =>
      val pe = all(p)
      p -> all.toSeq.filter(_._1 != p)
        .map { case (id, e) =>
          (id, e.zip(pe).map { case (x, y) => (x - y) * (x - y) }.sum) }
        .sortBy { case (id, d2) => (d2, id) }.take(10).map(_._1).toSet
    }.toMap
    val recall = (0L until 5L).map { p =>
      approx(p).intersect(exact(p)).size.toDouble / 10.0 }.sum / 5.0
    // deterministic fixture + deterministic training ⇒ recall is a
    // constant of the code; the floor has headroom below the measured
    // value so a genuine quantization regression trips it, noise can't
    assert(recall >= 0.5, f"ADC recall@10 = $recall%.2f < 0.5")
    // every approx hit of a self-free search excludes the probe itself
    assert(approx.forall { case (p, ids) => !ids.contains(p) })
  }

  test("streaming ingest: encode over a MemoryStream == batch codes (stateless, static codebooks)") {
    // the PQ form of the neardup/bloom ingest probes: new vectors
    // arriving on a stream encode against the FROZEN codebooks as a
    // pure stream-static broadcast map — no streaming state at all
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val sample = vecs.filter(col("vec_id") < 20).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val ms = MemoryStream[(Long, Seq[Double])](spark)
    val enc = graft.operators.ProductQuantizer.encode(
      ms.toDF().toDF("vec_id", "e"), books, Dim, M)
    val q = enc.writeStream.format("memory").queryName("pq_ingest")
      .outputMode("append").start()
    try {
      ms.addData(sample.take(10).toSeq); q.processAllAvailable()
      ms.addData(sample.drop(10).toSeq); q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        s"PQ encode grew streaming state: ${q.lastProgress.prettyJson}")
    } finally q.stop()
    val streamed = spark.table("pq_ingest").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val batch = graft.operators.ProductQuantizer.encode(
        vecs.filter(col("vec_id") < 20), books, Dim, M)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(streamed === batch)
    assert(streamed.size === 20)
  }

  test("adcSearch distances: nonnegative, and monotone within a probe's rank order") {
    val probes = vecs.filter(col("vec_id") === 0)
    val rows = graft.operators.ProductQuantizer.adcSearch(
      graft.operators.ProductQuantizer.encode(vecs, books, Dim, M),
      books, probes, Dim, M, k = 10)
      .orderBy(col("rk")).collect()
    assert(rows.forall(_.getDouble(3) >= 0.0))
    val ds = rows.map(_.getDouble(3))
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => a <= b },
      s"ranks not ordered by ad2: ${ds.mkString(",")}")
  }
}
