package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

/** Scale utilities: salted join exactness under skew, and zero-exchange
  * bucketed joins. */
class ScaleOpsSuite extends SparkSuite {
  import spark.implicits._

  test("salted join == plain join on sf0.001 (orders x customer)") {
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_name"))
    val plain = orders.join(cust, orders("o_custkey") === cust("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString)
    val salted = ScaleOps.saltedInnerJoin(orders, cust, "o_custkey", "c_custkey", 8)
      .select(col("o_orderkey"), col("c_name"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString)
    assert(salted === plain && plain.nonEmpty)
  }

  test("salted join spreads a hot key across salt partitions") {
    // 10k rows of ONE key — the shape that makes an unsalted join a
    // single straggler task
    val hot = (1 to 10000).map(i => (42L, i)).toDF("k", "payload")
    val dim = Seq((42L, "x"), (7L, "y")).toDF("k2", "v")
    val out = ScaleOps.saltedInnerJoin(hot, dim, "k", "k2", 8)
    assert(out.count() === 10000L)
    // the salt column really takes multiple values across the hot key
    val salts = hot.withColumn("__salt",
      pmod(xxhash64(hot.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts >= 4, s"salting degenerated to $salts partitions")
  }

  test("bucketed join on co-bucketed tables plans with ZERO exchanges") {
    Seq("t_orders_b", "t_lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    ScaleOps.bucketWrite(
      Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "t_orders_b", "o_orderkey", 8)
    ScaleOps.bucketWrite(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "t_lineitem_b", "o_orderkey", 8)
    // at sf0.001 the planner would rather broadcast (which bypasses
    // bucketing entirely); disable it so the plan is the one a 100 TB
    // fact-fact join would get — SMJ over co-bucketed scans
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ScaleOps.bucketedJoin(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n$plan")
      // and it is still a correct join
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
