package graft

import graft.operators.KMeans
import graft.queries.LlmOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Lloyd's k-means (the production IVF coarse quantizer) on planted
  * clusters, and IVF-with-k-means end-to-end against brute-force truth. */
class KMeansSuite extends SparkSuite {
  import spark.implicits._

  /** n vectors in kTrue tight gaussian clusters (σ=0.05 around centers
    * drawn at σ=3 — inter-center distance ≫ intra-cluster spread). */
  private def clustered(n: Int, kTrue: Int, dim: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(kTrue)(Array.fill(dim)(rng.nextGaussian() * 3))
    (0 until n).map { i =>
      val c = centers(i % kTrue)
      (i.toLong, c.map(x => x + 0.05 * rng.nextGaussian()).toSeq, i % kTrue)
    }
  }

  test("k-means recovers planted clusters; assignment is label-pure") {
    val data = clustered(100, 5, 16, 11)
    val vecs = data.map { case (id, e, _) => (id, e) }.toDF("vec_id", "e")
    val cents = KMeans.centroids(vecs, k = 5, iters = 5)
    assert(cents.count() === 5)
    val asg = KMeans.assign(vecs, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cent_id")).toMap
    val byLabel = data.groupBy(_._3).view.mapValues(_.map(d => asg(d._1)).toSet).toMap
    assert(byLabel.values.forall(_.size == 1),
      s"a planted cluster split across centroids: $byLabel")
    assert(byLabel.values.map(_.head).toSet.size === 5,
      s"two planted clusters merged: $byLabel")
  }

  test("IVF with k-means centroids == exact kNN on separated clusters (nprobe=1)") {
    val data = clustered(200, 10, 64, 23)
    val dir = Files.createTempDirectory("graft_ivfkm").toString
    data.map { case (id, e, lab) => (id, e.map(_.toFloat), lab) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
    val km = KMeans.centroids(vecs, k = 10, iters = 5)
    val ivf = LlmOps.ivfQuery(spark, dir, nprobe = 1, k = 3,
        centroids = Some(km)).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

    // brute-force truth from the float-rounded stored vectors
    val dense = vecs.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Double]]("e").toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = (0L until 5L).map { p =>
      p -> dense.keys.filter(_ != p).toSeq
        .sortBy(n => (-cos(dense(p), dense(n)), n)).take(3).toSet
    }.toMap
    assert(ivf === truth,
      s"IVF(nprobe=1, k-means) diverged from exact kNN:\nivf=$ivf\ntruth=$truth")
  }
}
