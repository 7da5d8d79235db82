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

  test("AQE splits a planted skewed join partition at runtime (the no-salt path)") {
    // The scaling contract (README) leans on AQE skew-join splitting for
    // hot keys that salting doesn't cover; this pins that the runtime
    // re-plan actually engages on a planted hot key. Thresholds are
    // lowered to make local data cross them; the MECHANISM is identical
    // at production sizes with default thresholds.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
      // 300k rows of ONE key + 50k uniform: the hot key's partition
      // dwarfs the median, the classic straggler shape
      val left = spark.range(350000).select(
        when(col("id") < 300000, lit(42L)).otherwise(col("id")).as("k"),
        concat(lit("payload_payload_payload_payload_payload_"), col("id")).as("p"))
      val right = spark.range(400000).select(
        col("id").as("k2"), concat(lit("v"), col("id")).as("v"))
      val j = left.join(right, col("k") === col("k2"))
      // execute THIS QueryExecution (an action like count() builds its
      // own plan on top and leaves j's adaptive plan un-finalized)
      j.queryExecution.toRdd.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"adaptive plan not finalized:\n$plan")
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the planted skew:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join on co-bucketed tables plans with ZERO exchanges") {
    ScaleOps.bucketRewrite(
      Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "t_orders_b", "o_orderkey", 8)
    ScaleOps.bucketRewrite(
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

  test("q_join_bucketed (graded): join AND aggregation ride the bucket layout — only the presentation sort exchanges") {
    // The graded query keys its aggregate on the bucket key, so with the
    // dim broadcast disabled (the 100 TB fact-fact regime) the ENTIRE
    // plan — SMJ plus groupBy — reuses the bucketed distribution: no
    // hashpartitioning exchange anywhere, only the ORDER BY's range
    // exchange. Also re-runs the builder twice to pin the rewrite path
    // (fresh catalogs / stale warehouse dirs must not fail).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q_join_bucketed")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed plan still hash-shuffles:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges <= 1, s"expected only the sort exchange:\n$plan")
      // count BEFORE rebuilding: the rewrite replaces the files under
      // any previously-built DataFrame's cached listing
      val n1 = df.count()
      // idempotent rebuild (the Verify/Bench repeat path)
      assert(SparkEntry.queries("q_join_bucketed")(spark, sf).count() === n1 && n1 > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bloomPrefilter: zero false negatives, fpp-bounded false positives, probe side never shuffles") {
    import spark.implicits._
    val build = (0L until 1000L).toDF("k")
    val probe = (0L until 2000L).toDF("p")
    val flagged = ScaleOps.bloomPrefilter(build, "k", probe, "p",
      expectedItems = 1000L, fpp = 0.01)
    val rows = flagged.collect()
      .map(r => r.getAs[Long]("p") -> r.getAs[Boolean]("might_match")).toMap
    // the contract that makes drop-decisions safe: NO false negatives
    val falseNeg = (0L until 1000L).filterNot(rows(_))
    assert(falseNeg.isEmpty, s"members missed by the bloom: $falseNeg")
    // false positives ≈ fpp of the non-members; 10× slack kills flake
    val falsePos = (1000L until 2000L).count(rows(_))
    assert(falsePos <= 100, s"false-positive rate blew past 10x fpp: $falsePos/1000")
    // NULL probe value = NULL membership (SQL three-valued logic)
    val nullRow = ScaleOps.bloomPrefilter(build, "k",
      Seq[java.lang.Long](null).toDF("p"), "p", 1000L, 0.01).collect()(0)
    assert(nullRow.isNullAt(nullRow.fieldIndex("might_match")))
    // the scale contract: the 1-row sketch is an inlined scalar
    // subquery (its only exchange is the SinglePartition merge of the
    // per-partition filters); the probe side is a pure map — no
    // hash/range repartitioning of EITHER dataset
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery"), s"bloom not a scalar subquery:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning")
        && !plan.contains("Exchange rangepartitioning"),
      s"bloomPrefilter shuffled a dataset:\n$plan")
  }

  test("bloomPrefilter edges: empty build = definite false, oversize sizing and column collisions fail fast") {
    import spark.implicits._
    val probe = (0L until 5L).toDF("p")
    // EMPTY build: the bloom aggregate itself is NULL — that must read
    // as "not a member" (false) for real probe values, or the
    // documented filter/negated-filter composition silently drops
    // every row (r9 review find)
    val emptyBuild = Seq.empty[Long].toDF("k")
    val got = ScaleOps.bloomPrefilter(emptyBuild, "k", probe, "p", 10L, 0.01)
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Boolean]("might_match"))
    assert(got.forall(!_._2) && got.length === 5,
      s"empty build must flag every probe false: ${got.toSeq}")
    // sizing beyond the session caps would be silently CLAMPED by the
    // aggregate (fpp degrades toward 1 with no signal) — fail loudly
    val big = intercept[IllegalArgumentException] {
      ScaleOps.bloomPrefilter(emptyBuild, "k", probe, "p",
        expectedItems = 100000000L, fpp = 0.01)
    }
    assert(big.getMessage.contains("maxNumBits"))
    // a probe that already carries might_match (a previous screen) must
    // not be silently overwritten
    val rescreen = intercept[IllegalArgumentException] {
      ScaleOps.bloomPrefilter(emptyBuild, "k",
        probe.withColumn("might_match", lit(true)), "p", 10L, 0.01)
    }
    assert(rescreen.getMessage.contains("might_match"))
  }

  test("bloom-prescreened exact membership == the plain exact join (the screen is semantics-free)") {
    // The composition that makes the sketch USABLE in a correctness-
    // gated pipeline: prefilter (drops most non-members for free), then
    // the exact join over survivors only. No false negatives ⇒ the
    // result is IDENTICAL to joining everything — pinned on the real
    // fixture corpus (train-split text hashes probed by the test split,
    // the q_llm_ingest shape).
    val docs = Tables.documents(spark, sf)
      .withColumn("b", graft.Det.md5h32(col("doc_id").cast("string")) % 10)
      .withColumn("h", md5(col("text")))
    val train = docs.filter(col("b") < 8).select(col("h").as("h0")).distinct()
    // plant one guaranteed member probe (the sf0.001 splits happen to
    // share no text hash, which would leave the dup path unexercised)
    val planted = docs.filter(col("b") < 8).limit(1)
      .select(lit(-1L).as("doc_id"), col("h"))
    val test0 = docs.filter(col("b") >= 8).select(col("doc_id"), col("h"))
      .unionAll(planted)
    val plain = test0.join(train, col("h") === col("h0"), "left")
      .select(col("doc_id"), col("h0").isNotNull.cast("int").as("is_dup"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val screened = ScaleOps.bloomPrefilter(train, "h0", test0, "h", 10000L, 0.01)
    val survivors = screened.filter(col("might_match"))
      .join(train, col("h") === col("h0"), "left")
      .select(col("doc_id"), col("h0").isNotNull.cast("int").as("is_dup"))
    val dropped = screened.filter(!col("might_match"))
      .select(col("doc_id"), lit(0).as("is_dup"))
    val composed = survivors.unionAll(dropped)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(composed === plain, "bloom prescreen changed membership results")
    assert(plain.nonEmpty && plain.values.sum > 0, "fixture has no dups to screen")
  }
}
