package graft

/** The cache contract (SparkEntry scaladoc): query builders may
  * `persist()` multi-consumer intermediates — a returned DataFrame is
  * lazy, so the builder cannot unpersist after its own action — and the
  * RUNNER owns the sweep: Verify, Bench, and Prof all call
  * `spark.catalog.clearCache()` after every query. This suite pins that
  * the sweep actually returns the session to ZERO persisted RDDs for the
  * persist()-heavy queries, so a long-lived library session that follows
  * the contract cannot accumulate cached projections. (q_llm_cc is
  * exercised for sweep-compatibility too, but its assertion tolerates the
  * final label table: `localCheckpoint` blocks are released by the
  * ContextCleaner on dereference, not by the SQL cache sweep.)
  */
class CacheHygieneSuite extends SparkSuite {

  private def persisted: Map[Int, org.apache.spark.rdd.RDD[_]] =
    spark.sparkContext.getPersistentRDDs.toMap

  test("Verify-style clearCache sweep leaves zero persistent RDDs after every persist()-using query") {
    // every graded query whose builder persists a multi-consumer
    // intermediate (funnel's event projection, the AllPairs token
    // projections, LSH signature/posting tables, the IVF assignment)
    val persistUsers = Seq("q_event_funnel", "q_llm_neardup", "q_llm_ngram",
      "q_llm_tri", "q_llm_minhash", "q_llm_simhash", "q_llm_simdup",
      "q_llm_ivf", "q_text_tfidf", "q_text_hhwords", "q_llm_contain",
      "q_session_funnel", "q_event_wau", "q_event_cooccur",
      "q_graph_pagerank", "q_llm_dsir", "q_text_colloc",
      "q_event_fillforward",
      // r12 third wave persist users
      "q_llm_clustco", "q_event_rfm", "q_event_anomaly", "q_llm_winnowdup",
      "q_event_newret", "q_graph_linkpred", "q_event_funnel_win",
      "q_mm_simdup", "q_event_acf", "q_llm_semdedup", "q_agg_topshare",
      // r13 persist users
      "q_event_stickiness",
      // r14 persist users (the day-grain table feeding both consumers)
      "q_event_lagcorr", "q_event_trend",
      // r15-16 persist users (now EAGER per Graft.eager — the sweep
      // contract is unchanged: persist in the builder, runner clears)
      "q_graph_hits", "q_graph_triangle", "q_graph_trusspeel",
      "q_agg_kendall", "q_agg_spearman", "q_agg_hodgeslehmann",
      // r16 wave 2 (annrecall's eager truth table; bfs's per-round
      // distance caches; srcsim's signature + shingle-set tables)
      "q_llm_annrecall", "q_graph_bfs", "q_llm_srcsim",
      // r17 persist users (annsweep's shared scan/truth/candidate
      // tables; modularity/conductance's edge + label tables;
      // fcstnaive's day-grain table)
      "q_llm_annsweep", "q_graph_modularity", "q_graph_conductance",
      "q_event_fcstnaive", "q_llm_simsweep", "q_graph_richclub",
      "q_llm_dupshare")
    persistUsers.foreach { name =>
      spark.catalog.clearCache() // clean slate regardless of suite order
      // EARLIER suites may have left locally-checkpointed RDDs that only
      // the ContextCleaner reclaims (clearCache cannot); the leak check
      // must only see what THIS query creates, so snapshot first and
      // exclude checkpoint blocks (test 2 covers those).
      val before = persisted.keySet
      SparkEntry.queries(name)(spark, sf).count()
      spark.catalog.clearCache() // the documented runner-side sweep
      val leaked = persisted.filterNot { case (id, r) =>
        before(id) || r.isCheckpointed }
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} RDD(s) past the clearCache sweep: " +
          leaked.map { case (id, r) => s"#$id ${r.name}" }.mkString(", "))
    }
  }

  test("q_llm_cc: sweep drops the SQL-cached intermediates; only checkpoint blocks await the ContextCleaner") {
    spark.catalog.clearCache()
    SparkEntry.queries("q_llm_cc")(spark, sf).count()
    spark.catalog.clearCache()
    // the builder's persist()s (pair list, symmetrized edges) must be
    // gone; what MAY remain are locally-checkpointed round tables from
    // the iteration, which the ContextCleaner reclaims asynchronously
    // once their references drop
    val leftovers = persisted.values.toSeq
    assert(leftovers.forall(_.isCheckpointed),
      "non-checkpoint RDDs survived the sweep: " +
        leftovers.filterNot(_.isCheckpointed)
          .map(_.getClass.getSimpleName).mkString(", "))
  }

  test("iterative operators keep an O(1) cached footprint, not O(iterations) (r16)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    spark.catalog.clearCache()
    val before = persisted.keySet
    def fresh = persisted.keySet.diff(before).size
    // HITS at 3 iterations: pre-r16 this held 2·iters+1 = 7 cached
    // frames at return (every half-step's raw table); the in-loop
    // unpersist must leave exactly edges + the LAST (aRaw, hRaw) pair.
    // (3, not deeper: the LOGICAL tree quadruples per iteration — the
    // score fans into the normalizer agg + the projection — so a deep
    // loop must localCheckpoint per the operator's scaladoc; the
    // graded query runs 2.)
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 11L),
      (3L, 12L), (4L, 10L)).toDF("src", "dst")
    val out = graft.operators.Hits.run(edges, iterations = 3)
    assert(out.count() > 0)
    assert(fresh <= 4,
      s"Hits.run left $fresh cached RDD(s) — expected O(1) " +
        "(edges + final half-step pair), got an O(iterations) leak")
    spark.catalog.clearCache()
    // deep mode (> DeepIters): half-steps localCheckpoint (lineage
    // truncation — the logical tree would otherwise quadruple per
    // iteration); only checkpoint blocks + the edge cache may remain
    val deepBefore = persisted.keySet
    val deepOut = graft.operators.Hits.run(edges, iterations = 6)
    assert(deepOut.count() > 0)
    val deepFresh = persisted.filterNot { case (id, r) =>
      deepBefore(id) || r.isCheckpointed }
    assert(deepFresh.size <= 1,
      s"deep Hits.run left ${deepFresh.size} non-checkpoint cached " +
        s"RDD(s): ${deepFresh.keys.mkString(", ")}")
    spark.catalog.clearCache()
    // trussPeelOn at 3 rounds: superseded round frames (e_{r-1},
    // tris_{r-1}) must release one round later — bounded survivors
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 4L), (4L, 5L)).toDF("a", "b")
    val peel = graft.queries.GraphOps.trussPeelOn(und, minSup = 2, rounds = 3)
    assert(peel.count() === 3)
    // trianglesOn persists 3 shared frames (e, deg, oriented) that the
    // runner sweep owns; the loop itself may hold ≤ 1 superseded pair +
    // the live (e, tris) pair beyond those
    assert(fresh <= 7,
      s"trussPeelOn left $fresh cached RDD(s) — expected O(1), " +
        "not O(rounds)")
    spark.catalog.clearCache()
  }

  test("Graft.runScoped: drops exactly the query's cache entries, host caches intact (r13)") {
    import org.apache.spark.sql.functions.col
    spark.catalog.clearCache()
    val before = persisted.keySet
    // the HOST application's own cache, which clearCache would evict
    // but the scoped runner must not
    val hostDf = Tables.nation(spark, sf).select(col("n_nationkey"))
    hostDf.persist()
    assert(hostDf.count() > 0)
    assert(hostDf.storageLevel.useMemory, "host cache did not engage")
    // a persist()-heavy graded query, materialized inside the scope
    val n = Graft.runScoped("q_agg_topshare", spark, sf)(_.count())
    assert(n > 0L)
    // the engine's entries are gone ...
    val leaked = persisted.filterNot { case (id, r) =>
      before(id) || r.isCheckpointed }
    // ... except the host's one RDD
    assert(leaked.size === 1 && hostDf.storageLevel.useMemory,
      s"runScoped left ${leaked.size} RDD(s) / host useMemory=" +
        s"${hostDf.storageLevel.useMemory}: " +
        leaked.map { case (id, r) => s"#$id ${r.name}" }.mkString(", "))
    hostDf.unpersist(blocking = true)
    // empty scope is a no-op; nested scopes compose
    val r = Graft.cacheScoped(spark) {
      Graft.cacheScoped(spark) {
        Graft.runScoped("q_llm_simhash", spark, sf)(_.count())
      }
    }
    assert(r > 0L)
    val after = persisted.filterNot { case (id, rdd) =>
      before(id) || rdd.isCheckpointed }
    assert(after.isEmpty,
      s"nested scopes leaked: ${after.keys.mkString(", ")}")
  }
}
