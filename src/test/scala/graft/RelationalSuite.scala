package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Unit checks for §2.1–§2.7 on sf0.001: hand-replicated semantics and
  * algebraic laws, independent of the DuckDB oracle. */
class RelationalSuite extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_filter replicates a driver-side evaluation of the predicate") {
    val got = q("q_filter").select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val expected = Tables.part(spark, sf).collect().filter { r =>
      val name = r.getAs[String]("p_name"); val tpe = r.getAs[String]("p_type")
      val size = r.getAs[Int]("p_size"); val brand = r.getAs[String]("p_brand")
      (name.contains("red") || Set("ECONOMY", "PROMO")(tpe)) &&
        size >= 10 && size <= 30 && brand != "Brand#13"
    }.map(_.getAs[Long]("p_partkey")).toSet
    assert(got === expected && got.nonEmpty)
  }

  test("q_join_left keeps every customer exactly once; missing orders count 0") {
    val out = q("q_join_left")
    assert(out.count() === Tables.customer(spark, sf).count())
    val totalOrders = out.agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(totalOrders === Tables.orders(spark, sf).count())
  }

  test("semi and anti joins partition the customer set") {
    val semi = q("q_join_semi").select("c_custkey").collect().map(_.getLong(0)).toSet
    val anti = q("q_join_anti").select("c_custkey").collect().map(_.getLong(0)).toSet
    // different predicates (open orders vs urgent orders) → not complements,
    // but each must be consistent with a driver-side replication
    val orders = Tables.orders(spark, sf).collect()
    val open = orders.filter(_.getAs[String]("o_orderstatus") == "O")
      .map(_.getAs[Long]("o_custkey")).toSet
    val urgent = orders.filter(_.getAs[String]("o_orderpriority") == "1-URGENT")
      .map(_.getAs[Long]("o_custkey")).toSet
    val all = Tables.customer(spark, sf).collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(semi === all.intersect(open))
    assert(anti === all.diff(urgent))
  }

  test("q_join_asof (window plan) == independent join+rank plan") {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
    val w = Window.partitionBy(col("p_id")).orderBy(col("c_us").desc, col("c_id").desc)
    val viaJoin = p.join(c, col("user_id") === col("c_user")
        && col("c_us") <= col("p_us"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("p_id"), col("c_id"), col("c_us"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val viaWindow = q("q_join_asof").select(col("p_id"), col("c_id"), col("c_us"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(viaWindow === viaJoin && viaWindow.nonEmpty)
  }

  test("q_join_asof_near: planted tie→back, same-µs click→back delta 0, fwd-only, and no-click→none") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_near").toString
    // (id, us, user, type): u1 fwd nearer; u2 exact tie → back;
    // u3 no clicks → none; u4 same-µs click → back, delta 0;
    // u5 forward-only
    Seq(
      (1L, 10L, 1L, "click"), (2L, 15L, 1L, "purchase"), (3L, 18L, 1L, "click"),
      (4L, 10L, 2L, "click"), (5L, 15L, 2L, "purchase"), (6L, 20L, 2L, "click"),
      (7L, 10L, 3L, "purchase"),
      (40L, 30L, 4L, "click"), (41L, 30L, 4L, "purchase"), (42L, 31L, 4L, "click"),
      (50L, 10L, 5L, "purchase"), (51L, 12L, 5L, "click"))
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_join_asof_near")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(3), Option(r.get(4)), Option(r.get(6))))).toMap
    assert(out(2L) === (("fwd", Some(3L), Some(3L))))
    assert(out(5L) === (("back", Some(4L), Some(-5L))))
    assert(out(7L) === (("none", None, None)))
    assert(out(41L) === (("back", Some(40L), Some(0L))))
    assert(out(50L) === (("fwd", Some(51L), Some(2L))))
  }

  test("q_agg_group: per-row avg identities and total count") {
    val rows = q("q_agg_group").collect()
    val liCount = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("count_order")).sum === liCount)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_qty")
        === r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order"))
    }
  }

  test("q_agg_rollup: grand-total row counts every customer") {
    val total = q("q_agg_rollup")
      .filter(col("g_r") === 1 && col("g_n") === 1).collect()
    assert(total.length === 1)
    assert(total(0).getAs[Long]("n_cust") === Tables.customer(spark, sf).count())
  }

  test("q_agg_cube: all four grouping combinations present, totals consistent") {
    val out = q("q_agg_cube").collect()
    val combos = out.map(r => (r.getAs[Int]("g_p"), r.getAs[Int]("g_s"))).toSet
    assert(combos === Set((0, 0), (0, 1), (1, 0), (1, 1)))
    val grand = out.filter(r => r.getAs[Int]("g_p") == 1 && r.getAs[Int]("g_s") == 1)
    assert(grand.map(_.getAs[Long]("n_orders")).sum === Tables.orders(spark, sf).count())
  }

  test("q_agg_minmaxby replicates driver-side argmax with tiebreak") {
    val expected = Tables.customer(spark, sf).collect()
      .groupBy(_.getAs[Int]("c_nationkey"))
      .map { case (nk, rs) =>
        val best = rs.minBy(r => (-r.getAs[Double]("c_acctbal"), r.getAs[Long]("c_custkey")))
        nk -> (best.getAs[Long]("c_custkey"), best.getAs[Double]("c_acctbal"))
      }
    val got = q("q_agg_minmaxby").collect()
      .map(r => r.getAs[Int]("c_nationkey") ->
        (r.getAs[Long]("c_custkey"), r.getAs[Double]("c_acctbal"))).toMap
    assert(got === expected)
  }

  test("q_topk_group: per-group top-3 replicated for every customer") {
    val expected = Tables.orders(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
      .toSeq.flatMap { case (ck, rs) =>
        rs.sortBy(r => (-r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
          .take(3).zipWithIndex
          .map { case (r, i) => (ck, i + 1, r.getAs[Long]("o_orderkey")) }
      }.toSet
    val got = q("q_topk_group").collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Int]("rk"),
        r.getAs[Long]("o_orderkey"))).toSet
    assert(got === expected)
  }

  test("q_limit is the 100-row prefix of q_sort's ordering") {
    val sorted = q("q_sort").select(col("o_orderkey")).collect().map(_.getLong(0))
    val limited = q("q_limit").select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(limited.length === 100)
    // q_sort ties broken by orderdate then orderkey; q_limit by orderkey only —
    // compare as sets over the same totalprice threshold instead of prefix when
    // they disagree on tie order
    val sortedPrice = q("q_sort").select(col("o_totalprice")).collect().map(_.getDouble(0))
    val limitedPrice = q("q_limit").select(col("o_totalprice")).collect().map(_.getDouble(0))
    assert(limitedPrice.toSeq === sortedPrice.take(100).toSeq)
  }

  test("set operation laws: intersect/except/union vs driver-side sets") {
    val building = Tables.customer(spark, sf).collect()
      .filter(_.getAs[String]("c_mktsegment") == "BUILDING")
      .map(_.getAs[Long]("c_custkey")).toSet
    val rich = Tables.customer(spark, sf).collect()
      .filter(_.getAs[Double]("c_acctbal") > 5000)
      .map(_.getAs[Long]("c_custkey")).toSet
    val open = Tables.orders(spark, sf).collect()
      .filter(_.getAs[String]("o_orderstatus") == "O")
      .map(_.getAs[Long]("o_custkey")).toSet
    assert(q("q_intersect").collect().map(_.getLong(0)).toSet === building.intersect(rich))
    assert(q("q_except").collect().map(_.getLong(0)).toSet === building.diff(open))
    val ua = q("q_union_all").collect().map(_.getAs[Long]("o_orderkey"))
    val u = q("q_union").collect().map(_.getLong(0))
    assert(u.toSet.subsetOf(ua.toSet) && u.length === u.toSet.size)
  }

  test("q_win_rank replicated for one nation (rn, rank, dense_rank)") {
    val nk = 1
    val rs = Tables.customer(spark, sf).collect()
      .filter(_.getAs[Int]("c_nationkey") == nk)
      .sortBy(r => (-r.getAs[Double]("c_acctbal"), r.getAs[Long]("c_custkey")))
    val expected = rs.zipWithIndex.map { case (r, i) =>
      val bal = r.getAs[Double]("c_acctbal")
      val rnk = rs.indexWhere(_.getAs[Double]("c_acctbal") == bal) + 1
      val drnk = rs.map(_.getAs[Double]("c_acctbal")).distinct.sorted(Ordering[Double].reverse)
        .indexOf(bal) + 1
      (r.getAs[Long]("c_custkey"), i + 1, rnk, drnk)
    }.toSet
    val got = q("q_win_rank").filter(col("c_nationkey") === nk).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Int]("rn"),
        r.getAs[Int]("rnk"), r.getAs[Int]("drnk"))).toSet
    assert(got === expected && got.nonEmpty)
  }

  test("q_win_lag: gap_us is null exactly for each user's first event") {
    val out = q("q_win_lag").collect()
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect()
    val firstPerUser = events.groupBy(_.getAs[Long]("user_id")).map { case (_, rs) =>
      rs.minBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id"))).getAs[Long]("event_id")
    }.toSet
    val nullGaps = out.filter(_.isNullAt(5)).map(_.getAs[Long]("event_id")).toSet
    assert(nullGaps === firstPerUser)
  }

  test("q_win_frame running revenue replicated for one customer in the decimal domain") {
    val out = q("q_win_frame").collect()
    val ck = out.head.getAs[Long]("o_custkey")
    val mine = Tables.orders(spark, sf).collect()
      .filter(_.getAs[Long]("o_custkey") == ck)
      .sortBy(r => (r.getAs[java.time.LocalDateTime]("o_orderdate")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getAs[Long]("o_orderkey")))
    var acc = BigDecimal(0)
    val expected = mine.map { r =>
      acc += BigDecimal(r.getAs[Double]("o_totalprice"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      r.getAs[Long]("o_orderkey") -> acc.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = out.filter(_.getAs[Long]("o_custkey") == ck)
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Double]("running_rev")).toMap
    assert(got === expected && got.nonEmpty)
  }

  test("q_agg_histogram: buckets replicate driver-side floor(price/20000); boundary lands up") {
    // the bucket edge case the oracle could mask: a price EXACTLY on a
    // bucket boundary (20000.0 / 20000.0 = 1.0 exactly in IEEE double —
    // the division is exact because 20000 = 2^5 · 625 and the quotient
    // is representable) must land in the UPPER bucket in both engines.
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    import spark.implicits._
    Seq((1L, 0.0), (2L, 19999.9921875), (3L, 20000.0), (4L, 20000.015625),
      (5L, 40000.0), (6L, 39999.984375))
      .toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_agg_histogram")(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_orders")).toMap
    assert(out === Map(0L -> 2L, 1L -> 3L, 2L -> 1L),
      s"boundary prices bucketed wrong: $out")
  }

  test("q_agg_eqdepth: quartile cuts and the strict-compare tie rule on a planted value set") {
    // values (1,2,2,3,4,5,6,7): disc cuts c1=2, c2=3, c3=5; the
    // duplicated 2 EQUALS c1 so both copies stay LOW (bucket counts
    // are deterministically unequal, never split): (3,1,2,2)
    val dir = java.nio.file.Files.createTempDirectory("graft_eqd").toString
    import spark.implicits._
    Seq(1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_agg_eqdepth")(spark, dir).collect()
      .map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("min_v"),
          r.getAs[Double]("max_v")))).toMap
    assert(out === Map(
      1 -> ((3L, 1.0, 2.0)), 2 -> ((1L, 3.0, 3.0)),
      3 -> ((2L, 4.0, 5.0)), 4 -> ((2L, 6.0, 7.0))))
  }
}
