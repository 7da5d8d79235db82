package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The 100 TB contract, enforced: these tests pin the PHYSICAL PLAN
  * properties the queries are designed around — pushdown, pruning,
  * broadcast choices, absence of joins/cartesians where the plan must
  * not have them. A regression that silently turns a broadcast join
  * into a shuffle join (or re-introduces the as-of join expansion)
  * fails here even though results stay correct. */
class PlanAssertionsSuite extends SparkSuite {

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }
  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString
  /** Occurrences of a physical-node token in a plan string. */
  private def countOf(plan: String, token: String): Int =
    plan.sliding(token.length).count(_ == token)

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("GLOBAL determinism pin: no layout- or time-dependent expression in ANY graded query") {
    // The §7.4 contract says every graded result is reproducible across
    // runs, engines, and cluster layouts. These expressions break that
    // by construction, so none may appear in any analyzed plan — a new
    // query that sneaks one in fails here before it can flake the
    // oracle. (Analysis only — nothing executes, so this sweeps all
    // queries in seconds.)
    val banned = Seq("rand(", "randn(", "uuid(", "shuffle(",
      "monotonically_increasing_id", "spark_partition_id",
      "input_file_name", "current_timestamp", "current_date", "now()")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.analyzed.toString.toLowerCase
        banned.filter(plan.contains).map(b => s"$name uses $b")
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("GLOBAL §7.4.12 pin: every unpartitioned Window in EVERY graded plan reads a bounded child (Aggregate or post-Limit)") {
    // An unpartitioned window is ONE partition at any scale. The
    // contract (§7.4 rule 12, pinned individually for budget/qnorm
    // since r12): such a window may only run over a provably-bounded
    // frame — a collapse Aggregate (bucket tables, contingency cells,
    // 1-row pivots) or a post-Limit frame (zipf's ≤256 checkpoint
    // rows). A new query sneaking a corpus-wide global window fails
    // here before it can melt at 100×.
    import org.apache.spark.sql.catalyst.plans.logical._
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _: LocalLimit => true
      case u: UnaryNode => bounded(u.child)
      // a join of two bounded frames is bounded (≤ their product):
      // q_event_runstest's sign sequence = days-Aggregate × 1-row
      // median — the lag window over it is days-bounded
      case b: BinaryNode => bounded(b.left) && bounded(b.right)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
        }
        // the SparkEntry cache contract: clear between queries — an
        // earlier query's persist() of a shared fragment (e.g.
        // mannkendall's (day, n) collapse) would otherwise substitute
        // an InMemoryRelation LEAF into this query's optimized plan
        // and hide the bounding Aggregate from the walk
        spark.catalog.clearCache()
        if (bad.isEmpty) None
        else Some(name + bad.map(w => s"\n--- offending window child:\n" +
          w.child.treeString.take(2000)).mkString)
    }
    assert(offenders.isEmpty,
      s"corpus-wide unpartitioned windows in: $offenders")
  }

  test("GLOBAL order pin: every graded result is explicitly sorted (or provably single-row)") {
    // The driver's oracle compare hashes rows in result order, so an
    // unordered graded query is a latent layout-dependent flake even if
    // it happens to pass today.
    import org.apache.spark.sql.catalyst.plans.logical._
    def ordered(p: LogicalPlan): Boolean = p match {
      case _: Sort => true
      case GlobalLimit(_, child) => ordered(child)
      case LocalLimit(_, child) => ordered(child)
      case Project(_, child) => ordered(child)
      case w: WithCTE => ordered(w.plan) // recursive CTE: ORDER BY is the main query's root
      case _ => false
    }
    // global aggregates produce exactly one row — order vacuous
    val singleRow = Set("q_agg_global", "q_text_chisq", "q_event_abtest",
      "q_event_abtest_t", "q_sql_tpch14", "q_sql_tpch19", "q_sql_tpch6",
      "q_sql_tpch17", "q_agg_anova", "q_agg_kruskal", "q_agg_mwu",
      // global agg × 1-row broadcast count — single row by construction
      "q_graph_assort",
      // r15 single-row statistics: global aggregates (× 1-row
      // broadcasts) end to end — order vacuous
      "q_agg_jackknife", "q_event_cuped", "q_event_mannkendall",
      "q_event_oddsratio", "q_event_runstest", "q_graph_triangle",
      // r16 sketch certificates: global agg × 1-row broadcast sketch —
      // single row by construction
      "q_agg_ams", "q_event_amsjoin",
      // r17: global fold over the community table — single row by
      // construction (the assort/ams shape)
      "q_graph_modularity",
      // r18: the weighted fold (same shape) and the refine output
      // (global fold × 1-row broadcast base score) — single row by
      // construction
      "q_graph_modularity_w", "q_graph_refine", "q_graph_projmod",
      "q_mm_crosskind",
      // r19: the fully-weighted refine output — same global fold ×
      // 1-row broadcast base-score shape as q_graph_refine
      "q_graph_refine_w",
      // r20: the two-level loop's output — global fold × two 1-row
      // broadcast level scores, single row by construction
      "q_graph_louvain2")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !singleRow(name) =>
        val r = if (ordered(fn(spark, sf).queryExecution.analyzed)) None
          else Some(name)
        spark.catalog.clearCache() // the SparkEntry cache contract
        r
      case _ => None
    }
    assert(offenders.isEmpty, s"unordered graded queries: $offenders")
  }

  test("q_scan_prune: filter reaches the parquet scan; only 3 columns read") {
    val plan = planString(q("q_scan_prune"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("q_join_inner: dim side broadcasts via SIZE STATS at graded scale — no forced hint on SF-linear customer") {
    val df = q("q_join_inner")
    // r15 (judge fix): customer is SF-linear, so the hint is gone. The
    // analyzed plan must carry NO broadcast ResolvedHint; the physical
    // plan still picks BroadcastHashJoin here because customer fits under
    // autoBroadcastJoinThreshold at graded scale — and would degrade to a
    // shuffle join at 100 TB instead of a driver OOM.
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "forced broadcast hint crept back onto an SF-linear dimension")
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"dim join not broadcast at graded scale (size stats):\n$plan")
  }

  test("q_join_multi: fixed dims hinted, SF-linear dims broadcast by size stats; only lineitem-orders shuffles") {
    val df = q("q_join_multi")
    // only nation/region may carry hints — customer/supplier must not.
    val hinted = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.size <= 2,
      s"expected at most 2 broadcast hints (nation, region), got ${hinted.size}")
    val hintStr = hinted.mkString("\n")
    assert(!hintStr.contains("customer") && !hintStr.contains("supplier"),
      s"SF-linear dim carries a forced broadcast hint:\n$hintStr")
    val plan = planString(df)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$plan")
    // the one big pair may be shuffled (SortMergeJoin/ShuffledHashJoin)
    // but must NOT be a nested-loop/cartesian
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"big join degenerated:\n$plan")
  }

  test("q_join_range: equi key drives a hash join (no hint on SF-linear part), band is a post-filter") {
    val df = q("q_join_range")
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "forced broadcast hint crept back onto SF-linear part")
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), s"range join not an equi hash join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated:\n$plan")
  }

  test("q_join_asof: NO join operator — one window pass over a union") {
    val plan = optimized(q("q_join_asof"))
    assert(!plan.toLowerCase.contains("join"), s"as-of re-grew a join:\n$plan")
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
  }

  test("q_topk_group / q_stream_topk: per-group top-k runs as WindowGroupLimit before the full sort") {
    Seq("q_topk_group", "q_stream_topk", "q_session_topk").foreach { name =>
      val plan = planString(q(name))
      assert(plan.contains("WindowGroupLimit"), s"$name not group-limited:\n$plan")
    }
  }

  test("q_limit: ordered limit plans as TakeOrderedAndProject (no global sort materialization)") {
    val plan = planString(q("q_limit"))
    assert(plan.contains("TakeOrderedAndProject"), s"limit not take-ordered:\n$plan")
  }

  test("q_llm_knn: probe side broadcasts; corpus is never shuffled before scoring") {
    val plan = planString(q("q_llm_knn"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"probes not broadcast:\n$plan")
  }

  test("q_llm_neardup: candidate generation is an equi-join (no nested loop, no cartesian)") {
    val plan = planString(q("q_llm_neardup"))
    assert(!plan.contains("CartesianProduct"), s"neardup went cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"neardup went BNLJ:\n$plan")
  }

  test("q_llm_contain: candidate generation is an equi-join; corpus scanned once through the cache") {
    val df = q("q_llm_contain")
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct"), s"contain went cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"contain went BNLJ:\n$plan")
    assert(plan.contains("InMemoryTableScan"),
      s"contain lost its cached tokenized projection:\n$plan")
    spark.catalog.clearCache()
  }

  test("q_llm_neardup / q_llm_ngram: the corpus parquet is scanned ONCE (cached projection feeds all consumers)") {
    // The r7 shave: feature explode + both verify join sides read one
    // persisted tokenized projection. A regression (e.g. a select that
    // breaks cache reuse) silently re-plans extra parquet scans — three
    // of them before r7 — which at 100 TB is two full corpus re-reads
    // and re-tokenizations per query.
    // Count UNCACHED file scans by tree walk: InMemoryTableScan holds
    // its cached plan as a field (not a child), so the one scan that
    // fills the cache is invisible here — every remaining
    // FileSourceScanExec is a consumer bypassing the cache.
    import org.apache.spark.sql.execution.FileSourceScanExec
    def uncached(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => uncached(a.inputPlan)
      case f: FileSourceScanExec => 1
      case other => other.children.map(uncached).sum
    }
    Seq("q_llm_neardup", "q_llm_ngram").foreach { name =>
      val df = q(name)
      val n = uncached(df.queryExecution.executedPlan)
      assert(n == 0,
        s"$name has $n parquet scan(s) bypassing the cached projection:\n${planString(df)}")
      assert(planString(df).contains("InMemoryTableScan"),
        s"$name lost its cached projection entirely")
      spark.catalog.clearCache() // release the persisted projections
    }
  }

  test("q_llm_minhash: banded candidate join is an equi-join; no all-pairs operator anywhere") {
    val plan = planString(q("q_llm_minhash"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"minhash degenerated to all-pairs:\n$plan")
  }

  test("q_llm_ngram: prefix-filtered candidates are equi-joined; no all-pairs operator") {
    val plan = planString(q("q_llm_ngram"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"ngram degenerated to all-pairs:\n$plan")
  }

  test("q_llm_embdup_lsh: banded candidate join is an equi-join; no all-pairs operator") {
    val plan = planString(q("q_llm_embdup_lsh"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"embdup_lsh degenerated to all-pairs:\n$plan")
  }

  test("q_llm_substr: window-dedup stats join on the hash key only — no pair join, no window operator") {
    val plan = planString(q("q_llm_substr"))
    // the flag join-back must stay an equi-join (≤1 match per window row);
    // a pair-expanding self-join or cartesian would be quadratic in the
    // posting size of a boilerplate window
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"substr audit degenerated:\n$plan")
    // per-doc stats are map-side-combining aggregates, never a window
    // over the window-hash (a hot window would funnel into one partition)
    assert(!plan.contains("Window"), s"substr regressed to a window plan:\n$plan")
  }

  test("q_llm_ivf: list assignment is per-row over the broadcast quantizer — the only Window is the bounded per-probe top-k") {
    // the top-nprobe assignment must NOT be a row_number window over the
    // corpus × |centroids| crossJoin expansion (that shuffles and sorts
    // an expansion of the one table guaranteed enormous at 100 TB); it
    // runs per-row against the collapsed centroid array, so exactly one
    // Window remains: top-k per probe, partitioned by the tiny probe set
    val plan = planString(q("q_llm_ivf"))
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(windows == 1, s"expected exactly 1 Window (per-probe top-k), got $windows:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"ivf went cartesian:\n$plan")
  }

  test("q_unpivot: melt is a single-scan Expand, not one scan per metric") {
    // the unpivot must plan as ONE parquet scan feeding an Expand
    // (rows × |metrics| map-side); the naive UNION-of-scans form reads
    // the table |metrics| times
    val plan = planString(q("q_unpivot"))
    assert(plan.contains("Expand"), s"unpivot lost its Expand:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
  }

  test("q_llm_kmeans1: the Lloyd pass has no Window and no corpus-expansion join") {
    // assignment is the same per-row broadcast argmax as q_llm_ivf but
    // with NO probe side — so no Window may appear anywhere, and the
    // update step must be a partial-aggregating hash agg (shuffle
    // bounded by K × dims), never a key window over the members
    val plan = planString(q("q_llm_kmeans1"))
    assert(!plan.contains("Window"), s"kmeans1 grew a window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"kmeans1 went cartesian:\n$plan")
    // the UPDATE step specifically: two HashAggregates keyed on
    // (cent_id, pos) — partial + final. A bare >=2 count would be
    // satisfied by the quantizer's own count() aggregates and miss the
    // update step degrading.
    assert("HashAggregate\\(keys=\\[cent_id".r.findAllIn(plan).length >= 2,
      s"update step lost map-side combining:\n$plan")
  }

  test("q_event_zscore: per-key baseline is an aggregate + join-back, never a key window") {
    // a window over user_id would funnel a hot user's events into one
    // partition; the design is hash agg (shuffle ∝ users) + join-back
    val plan = planString(q("q_event_zscore"))
    assert(!plan.contains("Window"), s"zscore regressed to a window plan:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2, // partial+final
      s"baseline lost map-side combining:\n$plan")
  }

  test("q_dedup / q_llm_dedup / q_text_fingerprint: keep-first and cluster stats are aggregates, not key-partitioned windows") {
    // a Window over the dedup key funnels a mega-cluster into one
    // partition; these must stay map-side-combining aggregates
    Seq("q_dedup", "q_llm_dedup", "q_text_fingerprint").foreach { name =>
      val plan = planString(q(name))
      assert(!plan.contains("Window"), s"$name regressed to a window plan:\n$plan")
      assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
        s"$name lost its aggregate:\n$plan")
    }
  }

  test("q_agg_group: hash aggregate with map-side partial aggregation") {
    val plan = planString(q("q_agg_group"))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, // partial + final
      s"expected partial+final hash aggregate:\n$plan")
    assert(!plan.contains("SortAggregate"), s"fell back to sort aggregate:\n$plan")
  }

  test("q_llm_split / q_text_scrub / q_text_rep / q_llm_wsample: pure per-row map work — the only exchange is the final presentation sort") {
    Seq("q_llm_split", "q_text_scrub", "q_text_rep", "q_llm_wsample").foreach { name =>
      val plan = planString(q(name))
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges <= 1, // rangepartitioning for the ORDER BY only
        s"$name shuffles beyond the output sort ($exchanges exchanges):\n$plan")
      assert(!plan.toLowerCase.contains("join") && !plan.contains("Window"),
        s"$name grew a join/window:\n$plan")
    }
  }

  test("q_llm_chunk: generator over per-row map work — the only exchange is the output sort") {
    val plan = planString(q("q_llm_chunk"))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"chunk shuffles beyond the output sort:\n$plan")
    assert(plan.contains("Generate"), s"expected the posexplode generator:\n$plan")
    assert(!plan.toLowerCase.contains("join") && !plan.contains("Window"),
      s"chunk grew a join/window:\n$plan")
  }

  test("q_llm_sample / q_text_tfidf: per-group top-k runs as WindowGroupLimit (no full group sort state)") {
    Seq("q_llm_sample", "q_text_tfidf").foreach { name =>
      val plan = planString(q(name))
      assert(plan.contains("WindowGroupLimit"), s"$name rank not group-limited:\n$plan")
    }
  }

  test("q_llm_pack: one hash-partition exchange (the sharded window), plus only the output sort") {
    val plan = planString(q("q_llm_pack"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx === 1, s"expected exactly 1 window exchange, got $hashEx:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"pack grew a join:\n$plan")
  }

  test("q_llm_ksdrift: corpus collapses to distinct (lang, length) pairs; all three windows ride ONE group exchange; text never read") {
    val df = q("q_llm_ksdrift")
    val plan = planString(df)
    // exactly 3 exchanges: the pooled hash agg (∝ distinct values — the
    // only row-proportional stage), the lang window partition, and the
    // presentation sort. A 4th would mean a window or the final agg
    // stopped reusing the lang partitioning.
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 3,
      s"ksDrift expected 3 exchanges (pool, group, sort), got $exchanges:\n$plan")
    assert("Window".r.findAllIn(plan).length === 3, // cum, totals, argmax-max
      s"ksDrift window fusion changed:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"ksDrift grew a join:\n$plan")
    // text is the byte-dominant column — the scan must prune it, or a
    // 100 TB audit reads the whole corpus to compare two histograms
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.inputPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val read = scans(df.queryExecution.executedPlan)
      .flatMap(_.requiredSchema.fieldNames).toSet
    assert(read == Set("doc_id", "lang", "n_chars"),
      s"ksDrift scan reads $read — text must stay pruned")
  }

  test("q_llm_emddrift: same distinct-value collapse as ksdrift; exact-decimal sum (no float aggregate); text pruned") {
    val df = q("q_llm_emddrift")
    val plan = planString(df)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 3,
      s"emdDrift expected 3 exchanges (pool, group, sort), got $exchanges:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"emdDrift grew a join:\n$plan")
    // the integral must be summed as decimal (exact, order-free); a
    // sum(double) in the final aggregate would be layout-dependent
    val agg = df.queryExecution.optimizedPlan.toString
    assert(agg.contains("sum(__ks_num"), s"emdDrift lost its decimal sum:\n$agg")
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.inputPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val read = scans(df.queryExecution.executedPlan)
      .flatMap(_.requiredSchema.fieldNames).toSet
    assert(read == Set("doc_id", "lang", "n_chars"),
      s"emdDrift scan reads $read — text must stay pruned")
  }

  test("q_text_chisq: corpus collapses to contingency cells BEFORE the single-partition window section") {
    // The windows (row/col/grand totals, ordered sum) run on ONE
    // partition by design — sound only because the input is the cell
    // table (≤ |lang|·|source| rows), never the corpus. The pin: every
    // SinglePartition exchange must sit ABOVE the cell-collapse
    // aggregate, so corpus rows can never reach the serial section.
    // (Textual: the plan tree is a straight line here, so "below a
    // node" = later toString lines; NOTE AdaptiveSparkPlanExec
    // .inputPlan is pre-EnsureRequirements — it has NO exchanges — so a
    // structural walk would vacuously pass. The toString shows the
    // prepared plan.)
    val df = q("q_text_chisq")
    val lines = planString(df).linesIterator.toSeq
    val lastSingle = lines.lastIndexWhere(_.contains("Exchange SinglePartition"))
    assert(lastSingle >= 0,
      s"expected the single-partition window section:\n${planString(df)}")
    val below = lines.drop(lastSingle + 1)
    assert(below.count(_.contains("HashAggregate")) >= 2, // partial+final cells
      s"corpus rows reach the single-partition section unaggregated:\n${planString(df)}")
    assert(!planString(df).toLowerCase.contains("join"),
      s"chisq grew a join:\n${planString(df)}")
  }

  test("q_llm_contam: probe is an equi-join against the distinct train vocabulary — no all-pairs operator") {
    val plan = planString(q("q_llm_contam"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"contam probe degenerated:\n$plan")
  }

  test("q_agg_pctile / _disc / _mad / q_agg_wmedian: percentile is window-located over distinct-value counts — no heap-buffered percentile aggregate") {
    // Native percentile() buffers every distinct value of a group inside
    // a heap-only ObjectHashAggregate buffer (no spill) — with 3 status
    // groups that's an OOM at 100×. The scale-safe plan pre-aggregates
    // (status, value) → count and locates the rank with a spillable
    // window, so neither "percentile" nor ObjectHashAggregate may appear.
    Seq("q_agg_pctile", "q_agg_pctile_disc", "q_agg_mad", "q_agg_wmedian",
        "q_agg_wmedian_cont").foreach { name =>
      val plan = planString(q(name))
      assert(!plan.toLowerCase.contains("percentile"),
        s"$name: native percentile aggregate is back:\n$plan")
      assert(!plan.contains("ObjectHashAggregate"),
        s"$name: heap-only object aggregation buffer reappeared:\n$plan")
      assert(plan.contains("Window"), s"$name: rank locate lost its window:\n$plan")
    }
  }

  test("q_llm_bloomscreen: scalar-subquery bloom prescreen; survivors broadcast-eligible in the verify; corpus never aggregated corpus-wide") {
    // The 100-TB shape this query exists to prove: the corpus collapses
    // to a one-row sketch consumed as a scalar subquery (the probe side
    // never shuffles FOR THE SCREEN), the definite-false branch carries
    // no join at all, and the verify joins put the SURVIVORS on the
    // broadcast-eligible side (r10 re-orientation, measured in
    // ScaleRehearsal: the r9 LeftOuter form could only build the corpus
    // side, forcing a corpus shuffle however few survivors remained).
    // At graded sf both verify joins must therefore BE broadcasts, and
    // no corpus-wide distinct aggregate may appear — the found-set
    // dedup aggregates ≤ survivors rows AFTER the corpus join.
    // the found-side join's pre-AQE size estimate is unknowable (it
    // hangs below a join + aggregate), so the eligibility claim is
    // asserted on the FINAL adaptive plan: run, then check what AQE
    // actually chose. The graded sf0.001 corpus yields ZERO survivors
    // (no cross-bucket dups, no false positives) — AQE then deletes
    // the whole verified branch (also asserted: the ideal outcome) —
    // so the verify-join shape is pinned on a PLANTED corpus whose
    // batch doc 19 duplicates train doc 0 (bucket facts per
    // PipelineOpsSuite).
    import org.apache.spark.sql.functions.{length => flen}
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // count() would execute a DIFFERENT QueryExecution
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
      p
    }
    val graded = finalPlan(q("q_llm_bloomscreen"))
    assert(graded.contains("might_contain"), s"bloom probe gone:\n$graded")
    assert(!graded.contains("SortMergeJoin") && !graded.contains("CartesianProduct"),
      s"graded bloomscreen shuffles or degenerates:\n$graded")
    val sess = spark
    import sess.implicits._
    val planted = Seq(
      (0L, "alpha beta gamma"), (1L, "delta epsilon zeta"),
      (2L, "eta theta iota"), (19L, "alpha beta gamma"),
      (26L, "fresh new content")).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
      .withColumn("n_chars", flen($"text").cast("long"))
    val plan = finalPlan(
      graft.queries.PipelineOps.bloomScreenDedup(planted))
    assert(plan.contains("might_contain"), s"bloom probe gone:\n$plan")
    val bjoins = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bjoins === 2, s"expected 2 broadcast verify joins, got $bjoins:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"verify join shuffles despite tiny survivors:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"bloomscreen degenerated:\n$plan")
  }

  test("q_llm_pipeline: composing split → dedup → pack adds no operator beyond the stages' own") {
    // split is a pure map filter, dedup is ONE hash aggregate + an
    // equi-join-back (never a window over the content hash), pack is
    // ONE partition window — so the whole composition may contain
    // exactly one Window and one equi-join, and nothing degenerate.
    val plan = planString(q("q_llm_pipeline"))
    val windows = "Window ".r.findAllIn(plan).length
    assert(windows === 1, s"expected exactly the pack window, got $windows:\n$plan")
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins === 1, s"expected exactly the dedup join-back, got $joins:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pipeline degenerated:\n$plan")
  }

  test("q_llm_shuffle: one shard-hash window, never a global sort by the random key") {
    // The design point: training-order shuffle at 100 TB is a hash
    // exchange + per-partition sort, NOT orderBy(random_key) (range
    // exchange + global sort) and NOT row_number over an unpartitioned
    // window (single-task). Exactly one Window, partitioned by shard.
    val plan = planString(q("q_llm_shuffle"))
    val windows = "Window ".r.findAllIn(plan).length
    assert(windows === 1, s"expected exactly the shard window, got $windows:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"window not hash-partitioned by shard:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"something collapsed to one partition:\n$plan")
  }

  test("q_text_hhwords: candidate set broadcasts into a semi join; top-K is TakeOrderedAndProject") {
    // The prescreen contract: the exact pass filters the scan through
    // the BROADCAST candidate set (shuffle ∝ candidates, never ∝
    // vocabulary) and the final top-K never globally sorts the counts.
    val plan = planString(q("q_text_hhwords"))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidate semi join not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K regressed to a global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"hhwords degenerated:\n$plan")
  }

  test("q_text_novelty: df join-back is an equi-join, aggregation partials map-side, no window") {
    val plan = planString(q("q_text_novelty"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"novelty degenerated:\n$plan")
    assert(!plan.contains("Window "), s"unexpected window:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"no map-side partial aggregation:\n$plan")
  }

  test("q_join_skew: the salted join is an equi-join on (key, salt) — no cartesian, no BNLJ, no key-only hot partition") {
    val plan = planString(q("q_join_skew"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"salted join degenerated:\n$plan")
    assert(plan.contains("__salt"), s"salt column optimized away entirely:\n$plan")
  }

  test("q_text_vocab: two stacked hash aggregates, no join, no window") {
    val plan = planString(q("q_text_vocab"))
    assert(!plan.toLowerCase.contains("join"), s"vocab grew a join:\n$plan")
    assert(!plan.contains("WindowExec"), s"vocab grew a window:\n$plan")
  }

  test("q_llm_keepbest: keeper selection is a struct-max aggregate, never a per-cluster window") {
    // the keep-best argmax must partial-aggregate map-side (a viral
    // near-dup cluster combines before the shuffle) — the pair
    // generation upstream legitimately uses per-DOC windows, so the pin
    // checks for the aggregate form, not window absence
    val plan = planString(q("q_llm_keepbest"))
    assert(plan.contains("partial_max") || plan.contains("partial_finalmerge"),
      s"keep-best argmax lost its map-side partial aggregation:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"keepbest went cartesian:\n$plan")
  }

  test("q_llm_outlier: centroid table broadcasts, scoring never shuffles the corpus, top-3 runs as WindowGroupLimit") {
    val plan = planString(q("q_llm_outlier"))
    assert(plan.contains("BroadcastHashJoin"), s"centroids not broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"outlier rank not group-limited:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"outlier went cartesian:\n$plan")
  }

  test("q_llm_tri: triangle closure is an equi-join over the pair list — no cartesian, no BNLJ") {
    val plan = planString(q("q_llm_tri"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle enumeration degenerated to all-pairs:\n$plan")
  }

  test("q_llm_pqadc: codebooks/probe tables broadcast, corpus never hash-shuffled before scoring, top-k is WindowGroupLimit") {
    // The PQ/ADC scale contract: the only exchanges touching corpus-
    // proportional rows are the WindowGroupLimit top-k's (map-side
    // partial limit first — ≤ partitions × probes × k rows move) and
    // the presentation sort; encode and scoring ride broadcasts.
    val plan = planString(q("q_llm_pqadc"))
    assert(plan.contains("WindowGroupLimit"), s"pqadc rank not group-limited:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"pqadc went cartesian:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx <= 1, // the top-k window's final-merge exchange only
      s"pqadc hash-shuffles beyond the top-k merge ($hashEx):\n$plan")
  }

  test("q_graph_pagerank edges: ONE lineitem scan — both orientations explode from one distinct pair set") {
    // The r11 verdict's only weak plan: leg 2 re-scanned lineitem raw
    // and shipped every duplicate (supplier,part) row into the
    // operator's union-distinct. The r12 derivation computes the
    // distinct pair set once and explodes both orientations from it, so
    // each evaluation of the edge lineage costs exactly one fact-table
    // scan and no join.
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.inputPlan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(scans).sum
    }
    val edges = graft.queries.GraphOps.copurchaseEdges(spark, sf)
    val n = scans(edges.queryExecution.executedPlan)
    assert(n === 1, s"edge derivation scans lineitem $n times:\n${planString(edges)}")
    assert(!planString(edges).toLowerCase.contains("join"),
      s"edge derivation grew a join:\n${planString(edges)}")
    // and the distinct runs BEFORE the explode (2·n_distinct dedup mass,
    // never n_rows): the plan's Generate sits above the aggregate
    val plan = planString(edges)
    val gen = plan.linesIterator.indexWhere(_.contains("Generate"))
    val agg = plan.linesIterator.indexWhere(_.contains("HashAggregate"))
    assert(gen >= 0 && agg > gen,
      s"explode does not ride the collapsed pair set:\n$plan")
  }

  test("q_event_retention: events collapse to distinct (user,hour) BEFORE the cohort join") {
    // The join (and everything downstream) must run on the collapsed
    // activity table, not raw events — at 100 TB the distinct is what
    // keeps the join input ∝ users × active hours instead of ∝ events.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = q("q_event_retention").queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, s"retention lost its cohort join:\n$plan")
    joins.foreach { j =>
      assert(j.left.collectFirst { case a: Aggregate => a }.nonEmpty &&
        j.right.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"cohort join runs on un-collapsed events:\n$plan")
    }
  }

  test("q_event_wau: no window, no range join; explode rides the collapsed pair set") {
    // The 7-day WAU must be the offset-explode dual, not a day-range
    // self-join (a range join rescans the pair set per report day) and
    // not a sliding count-distinct window (unsupported/partition-bound).
    // The explode's child must already be an Aggregate (the distinct
    // (user, day) collapse) — at 100 TB that collapse is what keeps the
    // 7× expansion ∝ active pairs instead of ∝ raw events.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join}
    val df = q("q_event_wau")
    val plan = df.queryExecution.optimizedPlan
    val phys = planString(df)
    assert(!phys.contains("Window"), s"WAU must not use a window:\n$phys")
    assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoop"),
      s"WAU degenerated into a non-equi join:\n$phys")
    val gens = plan.collect { case g: Generate => g }
    assert(gens.nonEmpty, s"offset-explode missing:\n$plan")
    gens.foreach { g =>
      // the collapse is an Aggregate, or the persisted InMemoryRelation
      // wrapping it (the distinct pair set is cached for its 3 consumers)
      val collapsed = g.child.collectFirst { case a: Aggregate => a }.nonEmpty ||
        g.child.toString.contains("InMemoryRelation")
      assert(collapsed, s"explode runs on un-collapsed events:\n$plan")
    }
    // the day-restriction is a semi-join over the calendar-sized day
    // set — broadcastable by size at any corpus scale
    val semis = plan.collect { case j: Join if j.joinType.sql == "LEFT SEMI" => j }
    assert(semis.nonEmpty, s"report-day restriction semi-join missing:\n$plan")
  }

  test("q_event_ewma: all 8 taps fold into ONE window exchange") {
    // 8 lag() taps over the same (user_id, ts, event_id) window spec
    // must plan as a single WindowExec on a single user-hash exchange —
    // a per-tap window (or a re-sort between taps) would multiply the
    // only shuffle this query has.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = q("q_event_ewma")
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size == 1, s"expected exactly 1 Window node, got ${wins.size}")
    assert(wins.head.windowExpressions.size >= 7,
      "taps did not fold into the single window")
    val phys = planString(df)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(phys).length <= 1,
      s"more than one user-hash exchange:\n$phys")
  }

  test("q_llm_dsir: weight table broadcasts back onto the shingle stream; top-k is TakeOrdered") {
    // The per-doc scoring join must be broadcast (the weight table is
    // B = 1024 rows at ANY corpus size) — a shuffle join there would
    // re-exchange the whole shingle stream; and the global top-100 must
    // be TakeOrderedAndProject (per-partition heaps), never a full sort.
    val phys = planString(q("q_llm_dsir"))
    assert(phys.contains("BroadcastHashJoin"),
      s"weight join not broadcast:\n$phys")
    assert(phys.contains("TakeOrderedAndProject"),
      s"top-k is not TakeOrdered:\n$phys")
    assert(!phys.contains("CartesianProduct"),
      s"cartesian leaked into dsir:\n$phys")
  }

  test("q_agg_bitmask: one map-side-combining hash aggregate, no join, no window") {
    // bitmaps exist to make the presence-set aggregation cheap: the
    // whole query must be a single partial+final hash agg over the scan
    val plan = planString(q("q_agg_bitmask"))
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"expected partial+final hash aggregate:\n$plan")
    assert(!plan.toLowerCase.contains("join") && !plan.contains("WindowExec"),
      s"bitmask grew a join/window:\n$plan")
  }

  test("q_event_cooccur: distinct-first self-join is an equi-join; per-type counts broadcast back") {
    // The self-join must run over the COLLAPSED (user, type) pair set
    // (∝ users × types, never events) as a plain equi-join on user_id;
    // the n_a/n_b join-backs are |types|-row tables and must broadcast.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = q("q_event_cooccur")
    val phys = planString(df)
    assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoop"),
      s"cooccur degenerated into a non-equi join:\n$phys")
    assert("BroadcastHashJoin".r.findAllIn(phys).length >= 2,
      s"per-type count join-backs not broadcast:\n$phys")
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    // every join input is the distinct collapse (Aggregate) or a
    // derivative of the persisted pair set (InMemoryRelation)
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val collapsed = side.collectFirst { case a: Aggregate => a }.nonEmpty ||
          side.toString.contains("InMemoryRelation")
        assert(collapsed, s"join side reads un-collapsed events:\n$side")
      }
    }
  }

  test("q_text_zipf: vocab never globally sorts — top-R is TakeOrdered; rank window runs post-limit") {
    // The rank window is DELIBERATELY post-limit: it sees ≤ ZipfMaxRank
    // rows, so the single-partition exchange it needs is a constant-size
    // move, while the vocabulary itself only ever passes a hash agg and
    // per-partition top-R heaps.
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Window => LWindow}
    val df = q("q_text_zipf")
    val phys = planString(df)
    assert(phys.contains("TakeOrderedAndProject"),
      s"top-R regressed to a global vocab sort:\n$phys")
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size == 1, s"expected exactly 1 rank window, got ${wins.size}")
    val postLimit = wins.head.collectFirst {
      case l: GlobalLimit => l
      case l: LocalLimit => l
    }.nonEmpty
    assert(postLimit,
      "rank window is not post-limit — it would sort the whole vocabulary")
  }

  test("q_session_stats: the session agg rides the sessionizer's user-hash exchange — no second event-stream shuffle") {
    // groupBy(user_id, sess) is keyed by a superset of the window's
    // partition key, so hashpartitioning(user_id) already clusters the
    // groups: Spark must plan the aggregate WITHOUT another exchange of
    // the event stream (at 100 TB that reuse halves the query's shuffle).
    val phys = planString(q("q_session_stats"))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(phys).length <= 1,
      s"session stats re-shuffles the event stream:\n$phys")
    assert(!phys.toLowerCase.contains("join"), s"grew a join:\n$phys")
  }

  test("q_text_colloc: one-row total broadcasts; top-k is TakeOrdered; no cartesian beyond the scalar") {
    val phys = planString(q("q_text_colloc"))
    assert(phys.contains("TakeOrderedAndProject"),
      s"top-k regressed to a global sort:\n$phys")
    assert(!phys.contains("CartesianProduct"),
      s"a real cartesian leaked in:\n$phys")
    // the only nested-loop join allowed is the broadcast ONE-ROW total
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(phys).length
    assert(bnlj <= 1, s"unexpected extra nested-loop joins:\n$phys")
  }

  test("q_event_fillforward: grid explodes from the collapsed per-day table; equi-joins only") {
    // The daily grid must be derived from the per-(user, day) COLLAPSE
    // (shuffle ∝ active pairs, never events) and re-attached by plain
    // equi-joins — a range join or cartesian against the calendar would
    // rescan per day at 100 TB.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    val df = q("q_event_fillforward")
    val phys = planString(df)
    assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoop"),
      s"fillforward degenerated into a non-equi join:\n$phys")
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.nonEmpty, s"span explode missing")
    gens.foreach { g =>
      val collapsed = g.child.collectFirst { case a: Aggregate => a }.nonEmpty ||
        g.child.toString.contains("InMemoryRelation")
      assert(collapsed, s"grid explodes from un-collapsed events:\n${g.child}")
    }
  }

  test("q_mm_framesample: generator over per-row map work — the only exchange is the output sort") {
    val plan = planString(q("q_mm_framesample"))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"framesample shuffles beyond the output sort:\n$plan")
    assert(plan.contains("Generate"), s"expected the stride-sequence generator:\n$plan")
    assert(!plan.toLowerCase.contains("join") && !plan.contains("WindowExec"),
      s"framesample grew a join/window:\n$plan")
  }

  test("r12 stats aggregates (moments, regr2, gini): no join, no cartesian; gini's one window reads the distinct-value collapse") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    for (name <- Seq("q_agg_moments", "q_agg_regr2")) {
      val plan = planString(q(name))
      assert("HashAggregate".r.findAllIn(plan).length >= 2,
        s"$name: expected partial+final hash aggregate:\n$plan")
      assert(!plan.toLowerCase.contains("join") && !plan.contains("WindowExec"),
        s"$name grew a join/window:\n$plan")
    }
    val gini = q("q_agg_gini")
    assert(!planString(gini).toLowerCase.contains("join"))
    val wins = gini.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size === 1 && wins.head.partitionSpec.nonEmpty)
    assert(wins.head.child.collectFirst { case a: Aggregate => a }.nonEmpty,
      "gini's cumulative window reads un-collapsed rows")
  }

  test("q_event_rfm: percentile cuts broadcast back; no cartesian of corpus-sized sides") {
    val phys = planString(q("q_event_rfm"))
    assert(!phys.contains("CartesianProduct"), s"rfm cartesian:\n$phys")
    // the 4 one-row broadcasts: gday + 3 cut tables (BroadcastNestedLoop
    // for the one-row cross joins is the intended plan)
    assert("BroadcastExchange".r.findAllIn(phys).length >= 4,
      s"rfm cut tables not broadcast:\n$phys")
  }

  test("q_llm_winnowdup: posting pair join and set-size join-backs are equi joins, never cartesian") {
    val phys = planString(q("q_llm_winnowdup"))
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoop"),
      s"winnowdup degenerated into a non-equi join:\n$phys")
  }

  test("q_graph_kcore: returned plan is one degree agg over the checkpointed peel result (rounds ran eagerly)") {
    // like ConnectedComponents, each peel round localCheckpoints eagerly
    // — the semi-join shape lives inside the rounds (exercised by
    // KCoreSuite's cascade semantics); the RETURNED plan must be just
    // partial+final count over the checkpoint scan, nothing wider
    val phys = planString(q("q_graph_kcore"))
    assert(!phys.contains("CartesianProduct"), s"kcore cartesian:\n$phys")
    assert("HashAggregate".r.findAllIn(phys).length >= 2,
      s"kcore final degree agg missing:\n$phys")
    assert(phys.contains("Scan ExistingRDD") || phys.contains("LocalTableScan"),
      s"kcore final plan does not read the checkpointed edges:\n$phys")
    assert(!phys.toLowerCase.contains("join"),
      s"kcore returned an un-truncated iteration plan:\n$phys")
  }

  test("q_graph_cosim: through-part equi join (no cartesian), top-k as WindowGroupLimit") {
    val phys = planString(q("q_graph_cosim"))
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoop"),
      s"cosim degenerated into a non-equi join:\n$phys")
    assert(phys.contains("WindowGroupLimit"),
      s"cosim top-k lost its per-partition heap:\n$phys")
  }

  test("q_session_path: the (user, sess) window and head agg RIDE the sessionizer's user-hash exchange; top-k is TakeOrdered") {
    val phys = planString(q("q_session_path"))
    // two shuffles total: the sessionizer's user hash + the path agg's
    // (∝ distinct paths); the (user, sess) window and head groupBy must
    // satisfy their clustering from the user partitioning (sort only)
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(phys).length
    assert(exchanges === 2,
      s"expected 2 hash exchanges (user + path agg), got $exchanges:\n$phys")
    assert(phys.contains("TakeOrderedAndProject"),
      s"session_path top-k lost its per-partition heap:\n$phys")
  }

  test("q_llm_qnorm: both unpartitioned windows run over the score-bucket aggregate, never the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = q("q_llm_qnorm").queryExecution.optimizedPlan
      .collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.partitionSpec.isEmpty)
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"unpartitioned window reads un-collapsed rows:\n$w")
    }
  }

  test("q_graph_linkpred: through-part equi join (no cartesian), top-k as TakeOrdered — never a full pair sort") {
    val phys = planString(q("q_graph_linkpred"))
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoop"),
      s"linkpred degenerated into a non-equi join:\n$phys")
    assert(phys.contains("TakeOrderedAndProject"),
      s"linkpred top-k lost its per-partition heap:\n$phys")
  }

  test("q_llm_budget: the global (unpartitioned) cumsum window runs over the BUCKET aggregate, never the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = q("q_llm_budget")
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    val global = wins.filter(_.partitionSpec.isEmpty)
    assert(global.nonEmpty, "expected the bucket-cumsum window")
    // each unpartitioned window must sit on an Aggregate (the
    // per-quality collapse — tens of rows at any corpus size); the
    // per-doc boundary window is partitioned by the bucket key
    global.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"unpartitioned window reads un-collapsed rows:\n$w")
    }
    wins.filterNot(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.partitionSpec.nonEmpty)
    }
    // broadcast join-back, no shuffle of the corpus side for the flags
    val phys = planString(df)
    assert(phys.contains("BroadcastHashJoin"),
      s"bucket join-back not broadcast:\n$phys")
  }

  test("q_win_timerange (r13): ONE user-hash exchange; the INTERVAL range frame is a single WindowExec") {
    // The trailing-1h frame must ride one user-hash exchange and plan
    // as one Window node — a per-metric window or an extra exchange
    // would double the only shuffle a rolling event-time metric needs.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = q("q_win_timerange")
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size == 1, s"expected exactly 1 Window node, got ${wins.size}")
    assert(wins.head.partitionSpec.nonEmpty, "frame lost its user partition")
    val phys = planString(df)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(phys).length == 1,
      s"expected exactly one user-hash exchange:\n$phys")
  }

  test("q_event_scd2 (r13): both windows RIDE one user-hash exchange (the change filter preserves distribution)") {
    // lag (change detection) and lead (range close) share the user
    // partitioning; the filter between them preserves hash
    // distribution, so the whole SCD build costs ONE shuffle + the
    // presentation sort. Two user-hash exchanges = the filter broke
    // distribution reuse; fail before it ships.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = q("q_event_scd2")
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size == 2, s"expected lag + lead Window nodes, got ${wins.size}")
    assert(wins.forall(_.partitionSpec.nonEmpty))
    val phys = planString(df)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(phys).length == 1,
      s"expected exactly one user-hash exchange:\n$phys")
    assert(!phys.contains("CartesianProduct") && !phys.contains("SortMergeJoin"),
      s"SCD build must be window-only, no join:\n$phys")
  }

  test("q_join_asof_tol (r13): facade-engine as-of — NO join operator, one user-hash exchange, both frames in one WindowExec") {
    // graded through Graft.asofJoin: must keep the q_join_asof plan
    // shape — a union + interleaved window, never a join+rank
    // expansion (the 31x hot-key rehearsal is the why, BASELINE r13)
    val phys = planString(q("q_join_asof_tol"))
    assert(!phys.contains("Join"), s"as-of planned a join:\n$phys")
    assert("Exchange hashpartitioning\\(key".r.findAllIn(phys).length == 1,
      s"expected exactly one key-hash exchange:\n$phys")
    assert(phys.contains("Window"), s"no window operator:\n$phys")
  }

  test("q_sql_tpch10 / q_sql_tpch18 (r13): dims broadcast, top-k is TakeOrdered, no cartesian") {
    Seq("q_sql_tpch10", "q_sql_tpch18").foreach { name =>
      val phys = planString(q(name))
      assert(phys.contains("TakeOrderedAndProject"),
        s"$name: LIMIT after ORDER BY should be TakeOrdered:\n$phys")
      assert(phys.contains("BroadcastHashJoin"),
        s"$name: no broadcast join at graded scale:\n$phys")
      assert(!phys.contains("CartesianProduct"),
        s"$name: cartesian leaked:\n$phys")
    }
  }

  test("q_sql_tpch4 / tpch21 / tpch22 (r14): correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins — never nested-loop") {
    // Q4: one LeftSemi; Q21: LeftSemi + LeftAnti; Q22: LeftAnti + a
    // 1-row scalar-subquery broadcast. All correlations are single
    // equi-keys by construction (the orders-join-inside-subquery
    // rewrite), so none may survive as BroadcastNestedLoopJoin over a
    // fact table or a CartesianProduct.
    val q4 = planString(q("q_sql_tpch4"))
    assert(q4.contains("LeftSemi"), s"tpch4 EXISTS not a semi join:\n$q4")
    val q21 = planString(q("q_sql_tpch21"))
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      s"tpch21 EXISTS/NOT EXISTS not semi+anti:\n$q21")
    val q22 = planString(q("q_sql_tpch22"))
    assert(q22.contains("LeftAnti"), s"tpch22 NOT EXISTS not anti:\n$q22")
    Seq("q_sql_tpch4" -> q4, "q_sql_tpch21" -> q21, "q_sql_tpch22" -> q22)
      .foreach { case (n, p) =>
        assert(!p.contains("CartesianProduct"), s"$n: cartesian leaked:\n$p")
      }
  }

  test("q_sql_tpch1 (r14): pure scan aggregate — shipdate filter pushed, single agg exchange, no join") {
    val phys = planString(q("q_sql_tpch1"))
    assert(phys.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed to parquet:\n$phys")
    assert(!phys.contains("Join"), s"Q1 must be join-free:\n$phys")
    assert("Exchange hashpartitioning".r.findAllIn(phys).length == 1,
      s"expected exactly one agg exchange:\n$phys")
  }

  test("q_sql_tpch2 / tpch20 (r14): correlated scalar equality and nested INs decorrelate — no cartesian, no per-row subquery loop") {
    // Q2's defining shape is the correlated MAX-equality per part —
    // Spark must decorrelate it into an aggregate + join, never a
    // nested-loop re-execution; Q20's nested INs become semi joins.
    val q2 = planString(q("q_sql_tpch2"))
    assert(!q2.contains("CartesianProduct"), s"tpch2 cartesian:\n$q2")
    assert(q2.contains("BroadcastHashJoin") || q2.contains("SortMergeJoin"),
      s"tpch2 lost its joins:\n$q2")
    val q20 = planString(q("q_sql_tpch20"))
    assert(q20.contains("LeftSemi"), s"tpch20 INs not semi joins:\n$q20")
    assert(!q20.contains("CartesianProduct"), s"tpch20 cartesian:\n$q20")
  }

  test("q_llm_editdup (r14): length-band candidates are an EQUI-join — never a block cartesian") {
    val phys = planString(q("q_llm_editdup"))
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"),
      s"editdup degenerated to an all-pairs join:\n$phys")
    // the join keys must include the length bucket, not just the block
    assert(phys.contains("bk"), s"bucket key missing from the plan:\n$phys")
  }

  test("q_text_rarity / q_text_keyness (r14): top-k never global-sorts; no cartesian over the corpus") {
    // rarity: TakeOrdered top-k, the only window-free path; keyness:
    // the per-source rank prefilters as WindowGroupLimit. Both
    // crossJoin a 1-ROW broadcast total (legitimate); the corpus-sized
    // sides must stay equi-joined.
    val rar = planString(q("q_text_rarity"))
    assert(rar.contains("TakeOrderedAndProject"),
      s"rarity top-k not TakeOrdered:\n$rar")
    assert(!rar.contains("Window"), s"rarity grew a window:\n$rar")
    val key = planString(q("q_text_keyness"))
    assert(key.contains("WindowGroupLimit"),
      s"keyness per-source top-k not group-limited:\n$key")
    assert(!key.contains("CartesianProduct"), s"keyness cartesian:\n$key")
  }

  test("r14 daily family (lagcorr/trend): ONE parquet scan through the persisted day-grain aggregate") {
    // lagcorr's two series slices and trend's two join sides must all
    // read the single persisted (type, day) aggregate — an uncached
    // FileSourceScanExec is a full raw-event re-read at 100 TB.
    import org.apache.spark.sql.execution.FileSourceScanExec
    def uncached(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => uncached(a.inputPlan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(uncached).sum
    }
    Seq("q_event_lagcorr", "q_event_trend").foreach { name =>
      val df = q(name)
      val n = uncached(df.queryExecution.executedPlan)
      assert(n == 0,
        s"$name has $n scan(s) bypassing the cached day table:\n${planString(df)}")
      assert(planString(df).contains("InMemoryTableScan"),
        s"$name lost its cached day-grain table")
      spark.catalog.clearCache()
    }
  }

  test("r14 map-agg newcomers (seasonality/chunkdup/benford/quiet/diversity): no join, no cartesian; every window type-partitioned over an aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window => LWindow}
    Seq("q_event_seasonality", "q_mm_chunkdup", "q_event_benford",
      "q_event_quiet", "q_mm_diversity").foreach { name =>
      val opt = q(name).queryExecution.optimizedPlan
      assert(opt.collect { case j: Join => j }.isEmpty,
        s"$name grew a join:\n$opt")
      opt.collect { case w: LWindow => w }.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"$name window is unpartitioned:\n$opt")
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"$name window reads raw rows, not an aggregate:\n$opt")
      }
      val phys = planString(q(name))
      assert(!phys.contains("CartesianProduct"), s"$name cartesian:\n$phys")
    }
  }

  test("q_join_asof_fwd (r14): facade third direction keeps the windowed plan — NO join, one key-hash exchange") {
    val phys = planString(q("q_join_asof_fwd"))
    assert(!phys.contains("Join"), s"forward as-of planned a join:\n$phys")
    assert("Exchange hashpartitioning\\(key".r.findAllIn(phys).length == 1,
      s"expected exactly one key-hash exchange:\n$phys")
    assert(phys.contains("Window"), s"no window operator:\n$phys")
  }

  test("q_event_pit (r14): the PIT lookup is NOT a range join — windowed as-of over the union, no join operator") {
    // "active SCD2 range at t" = "latest change ≤ t": the compacted
    // change rows interleave with purchases in one more window pass.
    // A regression to the BETWEEN range join (the oracle's independent
    // machinery) would explode per-user candidates at 100 TB.
    val phys = planString(q("q_event_pit"))
    assert(!phys.contains("Join"), s"PIT lookup planned a join:\n$phys")
    assert(phys.contains("Window"), s"no window operator:\n$phys")
    assert(!phys.contains("CartesianProduct"), s"PIT cartesian:\n$phys")
  }

  test("q_sql_tpch8 / tpch15 (r14): snowflake dims broadcast / CTE reuse keeps one fact scan per consumer, no cartesian") {
    val q8 = planString(q("q_sql_tpch8"))
    // part gates the fact scan; supplier/customer/nation×2/region all
    // broadcast at graded scale
    assert("BroadcastHashJoin".r.findAllIn(q8).length >= 5,
      s"tpch8 snowflake legs not broadcast:\n$q8")
    assert(!q8.contains("CartesianProduct"), s"tpch8 cartesian:\n$q8")
    val q15 = planString(q("q_sql_tpch15"))
    // the scalar MAX over the revenue CTE broadcasts one row back; the
    // revenue-to-supplier match must stay an equi-join
    assert(!q15.contains("CartesianProduct") &&
      !q15.contains("BroadcastNestedLoopJoin"),
      s"tpch15 degenerated:\n$q15")
  }

  test("q_graph_triangle / q_graph_localcc (r15): wedge join stays an equi-join; top-k is TakeOrderedAndProject") {
    // Degree-ordered enumeration: the only allowed quadratic is the
    // within-source wedge join (equi on src). A cartesian — e.g. a
    // regression that drops the src equi-key and leaves only the
    // ordering conjunct — is the 100 TB killer pinned here.
    val t = planString(q("q_graph_triangle"))
    assert(!t.contains("CartesianProduct"), s"triangle cartesian:\n$t")
    spark.catalog.clearCache()
    val l = planString(q("q_graph_localcc"))
    assert(!l.contains("CartesianProduct"), s"localcc cartesian:\n$l")
    assert(l.contains("TakeOrderedAndProject"),
      s"localcc top-k not take-ordered:\n$l")
    spark.catalog.clearCache()
  }

  test("q_agg_kmv (r15): bottom-k ranks as WindowGroupLimit — the k-bounded-shuffle contract") {
    val p = planString(q("q_agg_kmv"))
    assert(p.contains("WindowGroupLimit"),
      s"kmv bottom-k not group-limited:\n$p")
    assert(!p.contains("CartesianProduct"), s"kmv cartesian:\n$p")
  }

  test("q_agg_ams (r16): the sketch is one windowless agg; the 1-row estimate broadcasts into the audit") {
    val p = planString(q("q_agg_ams"))
    assert(!p.contains("Window"), s"ams grew a window:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row estimate not broadcast:\n$p")
    // the only sort anywhere may be inside an expression, not an
    // operator: no corpus-sized Sort node
    assert(!p.contains("SortMergeJoin"), s"ams shuffled a join:\n$p")
  }

  test("q_llm_annrecall (r16): truth/approx joins are hash joins off the cached truth — no cartesian beyond the sanctioned probe broadcast") {
    val p = planString(q("q_llm_annrecall"))
    assert(!p.contains("CartesianProduct"), s"annrecall cartesian:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"truth table not read through the eager cache:\n$p")
  }

  test("q_graph_modularity / q_graph_conductance (r17): label join-backs are equi-joins off the cached tables; totals broadcast — no cartesian") {
    val pm = planString(q("q_graph_modularity"))
    assert(!pm.contains("CartesianProduct"), s"modularity cartesian:\n$pm")
    assert(pm.contains("InMemoryTableScan"),
      s"modularity does not read the eager caches:\n$pm")
    spark.catalog.clearCache()
    val pc = planString(q("q_graph_conductance"))
    assert(!pc.contains("CartesianProduct"), s"conductance cartesian:\n$pc")
    assert(pc.contains("TakeOrderedAndProject"),
      s"conductance top-k is not TakeOrdered:\n$pc")
    spark.catalog.clearCache()
  }

  test("q_event_fcstnaive (r17): ONE type-hash window pass computes both lags; day-grain table cached; no cartesian") {
    val p = planString(q("q_event_fcstnaive"))
    assert(!p.contains("CartesianProduct"), s"fcstnaive cartesian:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"fcstnaive does not read the cached day grain:\n$p")
    assert(countOf(p, "Window") === 1,
      s"both lags must ride ONE window pass:\n$p")
    spark.catalog.clearCache()
  }

  test("q_text_heaps (r17): two 1-row aggregates stack — no window, no corpus sort, no cartesian") {
    val p = planString(q("q_text_heaps"))
    assert(!p.contains("CartesianProduct"), s"heaps cartesian:\n$p")
    assert(!p.contains("Window"), s"heaps grew a window:\n$p")
    spark.catalog.clearCache()
  }

  test("q_event_gapsweep / q_graph_richclub (r17): one window pass / one conditional fold per side — no cartesian, no per-threshold rescans") {
    val pg = planString(q("q_event_gapsweep"))
    assert(!pg.contains("CartesianProduct"), s"gapsweep cartesian:\n$pg")
    assert(countOf(pg, "Window") === 1,
      s"gapsweep must compute every threshold off ONE window pass:\n$pg")
    spark.catalog.clearCache()
    val pr = planString(q("q_graph_richclub"))
    assert(!pr.contains("CartesianProduct"), s"richclub cartesian:\n$pr")
    assert(!pr.contains("Window"), s"richclub grew a window:\n$pr")
    spark.catalog.clearCache()
  }

  test("q_llm_simsweep (r17): candidates ride the graded AllPairs equi-join; thresholds fold over one cached pair table") {
    val p = planString(q("q_llm_simsweep"))
    assert(!p.contains("CartesianProduct"), s"simsweep cartesian:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"simsweep does not read the cached pair table:\n$p")
    spark.catalog.clearCache()
  }

  test("q_llm_dupshare (r17): keeper agg + join-back + per-source fold — no window, no cartesian") {
    val p = planString(q("q_llm_dupshare"))
    assert(!p.contains("CartesianProduct"), s"dupshare cartesian:\n$p")
    assert(!p.contains("Window"), s"dupshare grew a window:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"dupshare does not read the cached projection:\n$p")
    spark.catalog.clearCache()
  }

  test("q_llm_annsweep (r17): grid candidates come from equi-joins off the one cached scan — no cartesian beyond 1-row/probe broadcasts") {
    val p = planString(q("q_llm_annsweep"))
    assert(!p.contains("CartesianProduct"), s"annsweep cartesian:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"annsweep does not read the shared eager caches:\n$p")
    spark.catalog.clearCache()
  }

  test("q_graph_bfs / q_graph_corenum (r16): driver-assembled iteratives — returned plans read materialized state, no corpus re-derivation") {
    // both lambdas run their rounds eagerly (bounded driver actions);
    // the RETURNED plan must read MATERIALIZED state — since r21 the
    // frontier loop checkpoints each round's NEW rows, so the BFS
    // histogram folds a union of checkpointed LogicalRDD pieces
    // (no cache, no parquet at all), like corenum's checkpointed
    // rounds
    val pb = planString(q("q_graph_bfs"))
    assert(!pb.contains("CartesianProduct"), s"bfs cartesian:\n$pb")
    assert(pb.contains("Scan ExistingRDD") && !pb.contains("FileScan"),
      s"bfs result not off checkpointed frontier pieces:\n$pb")
    spark.catalog.clearCache()
    val pc = planString(q("q_graph_corenum"))
    assert(!pc.contains("CartesianProduct"), s"corenum cartesian:\n$pc")
    assert(pc.contains("Scan ExistingRDD") && !pc.contains("FileScan"),
      s"corenum result not off checkpointed rounds:\n$pc")
    spark.catalog.clearCache()
  }

  test("q_graph_modularity_w / q_graph_conductance_w (r18): the weighted folds keep the r17 plan shapes — equi join-backs, no cartesian") {
    val pm = planString(q("q_graph_modularity_w"))
    assert(!pm.contains("CartesianProduct"), s"modularity_w cartesian:\n$pm")
    assert(pm.contains("InMemoryTableScan"),
      s"modularity_w does not read the eager caches:\n$pm")
    spark.catalog.clearCache()
    val pc = planString(q("q_graph_conductance_w"))
    assert(!pc.contains("CartesianProduct"),
      s"conductance_w cartesian:\n$pc")
    assert(pc.contains("TakeOrderedAndProject"),
      s"conductance_w top-k is not TakeOrdered:\n$pc")
    spark.catalog.clearCache()
  }

  test("q_graph_kbfs / q_graph_closeness (r18): multi-seed rounds run eagerly — returned plans read the materialized distance state") {
    // the bfs pin generalized: since r21 hopsFrom checkpoints each
    // round's frontier piece, so the RETURNED plan is the histogram/
    // closeness fold over the union of checkpointed pieces — never a
    // corpus re-derivation
    val pk = planString(q("q_graph_kbfs"))
    assert(!pk.contains("CartesianProduct"), s"kbfs cartesian:\n$pk")
    assert(pk.contains("Scan ExistingRDD") && !pk.contains("FileScan"),
      s"kbfs result not off checkpointed frontier pieces:\n$pk")
    spark.catalog.clearCache()
    val pc = planString(q("q_graph_closeness"))
    assert(!pc.contains("CartesianProduct"), s"closeness cartesian:\n$pc")
    assert(pc.contains("Scan ExistingRDD") && !pc.contains("FileScan"),
      s"closeness result not off checkpointed frontier pieces:\n$pc")
    assert(!pc.contains("Window"), s"closeness grew a window:\n$pc")
    spark.catalog.clearCache()
    // r19: the harmonic fold rides the same materialized state
    val ph = planString(q("q_graph_harmonic"))
    assert(!ph.contains("CartesianProduct"), s"harmonic cartesian:\n$ph")
    assert(ph.contains("Scan ExistingRDD") && !ph.contains("FileScan"),
      s"harmonic result not off checkpointed frontier pieces:\n$ph")
    assert(!ph.contains("Window"), s"harmonic grew a window:\n$ph")
    spark.catalog.clearCache()
    // r19 post-seal: wcloseness folds the checkpointed Bellman-Ford
    // distance table (costFrom materializes every round)
    val pw = planString(q("q_graph_wcloseness"))
    assert(!pw.contains("CartesianProduct"), s"wcloseness cartesian:\n$pw")
    assert(pw.contains("Scan ExistingRDD"),
      s"wcloseness result not off checkpointed distances:\n$pw")
    assert(!pw.contains("Window"), s"wcloseness grew a window:\n$pw")
    spark.catalog.clearCache()
    // r20: the FUSED rows keep the same shapes — one distance pass,
    // one seed-grain fold, nothing extra
    val pf = planString(q("q_graph_central"))
    assert(!pf.contains("CartesianProduct"), s"central cartesian:\n$pf")
    assert(pf.contains("Scan ExistingRDD") && !pf.contains("FileScan"),
      s"central result not off checkpointed frontier pieces:\n$pf")
    assert(!pf.contains("Window"), s"central grew a window:\n$pf")
    spark.catalog.clearCache()
    val pwf = planString(q("q_graph_wcentral"))
    assert(!pwf.contains("CartesianProduct"), s"wcentral cartesian:\n$pwf")
    assert(pwf.contains("Scan ExistingRDD"),
      s"wcentral result not off checkpointed distances:\n$pwf")
    assert(!pwf.contains("Window"), s"wcentral grew a window:\n$pwf")
    spark.catalog.clearCache()
  }

  test("q_graph_refine (r18): the returned plan is the modularity fold of checkpointed labels x a 1-row broadcast base score — no cartesian, no window") {
    // the move loop runs eagerly in the lambda (the corenum
    // precedent); the returned plan folds the final localCheckpointed
    // label table (LogicalRDD) against the eagerly-cached edge list,
    // with the base score attached as a 1-row broadcast
    val p = planString(q("q_graph_refine"))
    assert(!p.contains("CartesianProduct"), s"refine cartesian:\n$p")
    assert(!p.contains("Window"), s"refine grew a window:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"refine result not off checkpointed labels:\n$p")
    spark.catalog.clearCache()
  }

  test("q_graph_betweenness (r19): the returned plan is a top-k over checkpointed dependency state — TakeOrderedAndProject, no cartesian, no window") {
    // both sweeps run eagerly in the lambda (the refine/kbfs
    // precedent); the returned plan aggregates the localCheckpointed
    // per-level dependency frames against two 1-row broadcast scalars
    val p = planString(q("q_graph_betweenness"))
    assert(!p.contains("CartesianProduct"), s"betweenness cartesian:\n$p")
    assert(!p.contains("Window"), s"betweenness grew a window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"betweenness top-k must never be a full sort:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"betweenness result not off checkpointed dependency state:\n$p")
    spark.catalog.clearCache()
  }

  test("q_graph_betweenness_w (r20): weighted brokerage keeps the betweenness shapes — TakeOrderedAndProject top-k, no cartesian, no window, checkpointed fixpoint state") {
    // distances/σ/dq all run eagerly as bounded fixpoints in the
    // lambda; the returned plan aggregates the localCheckpointed dq
    // frame against the two 1-row broadcast scalars
    val p = planString(q("q_graph_betweenness_w"))
    assert(!p.contains("CartesianProduct"), s"betweenness_w cartesian:\n$p")
    assert(!p.contains("Window"), s"betweenness_w grew a window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"betweenness_w top-k must never be a full sort:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"betweenness_w result not off checkpointed dq state:\n$p")
    spark.catalog.clearCache()
  }

  test("q_graph_betwsweep (r20): the audit reads ONE checkpointed dependency table — per-k folds are filters, the seed-rank window stays 16 rows, no cartesian") {
    // the whole point at scale: one double sweep serves every k, so
    // the returned plan is a union of TakeOrderedAndProject tops over
    // the SAME checkpointed dq frame + the tiny overlap join — never
    // a re-sweep per k and never a corpus-sized window
    val p = planString(q("q_graph_betwsweep"))
    assert(!p.contains("CartesianProduct"), s"betwsweep cartesian:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"betwsweep not off checkpointed per-k tops:\n$p")
    spark.catalog.clearCache()
  }

  test("q_graph_score (r20): the s-core peel keeps kcore's shape — checkpointed edge state, strength hash agg, no cartesian, no window") {
    val p = planString(q("q_graph_score"))
    assert(!p.contains("CartesianProduct"), s"score cartesian:\n$p")
    assert(!p.contains("Window"), s"score grew a window:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"score result not off checkpointed peel state:\n$p")
    spark.catalog.clearCache()
  }

  test("q_graph_louvain2 (r20): the two-level loop keeps the refine shapes — no cartesian, no window, checkpointed labels at both levels") {
    val p = planString(q("q_graph_louvain2"))
    assert(!p.contains("CartesianProduct"), s"louvain2 cartesian:\n$p")
    assert(!p.contains("Window"), s"louvain2 grew a window:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"louvain2 result not off checkpointed labels:\n$p")
    spark.catalog.clearCache()
  }

  test("q_graph_refine_w (r19): the weighted loop keeps the refine shapes — no cartesian, no window, checkpointed labels") {
    val p = planString(q("q_graph_refine_w"))
    assert(!p.contains("CartesianProduct"), s"refine_w cartesian:\n$p")
    assert(!p.contains("Window"), s"refine_w grew a window:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"refine_w result not off checkpointed labels:\n$p")
    spark.catalog.clearCache()
  }

  test("q_graph_labelprop_w (r19): the weighted vote keeps labelprop's shape — struct-max aggregate argmax, no window over the edge list, no cartesian") {
    val p = planString(q("q_graph_labelprop_w"))
    assert(!p.contains("CartesianProduct"), s"labelprop_w cartesian:\n$p")
    assert(!p.contains("Window"), s"labelprop_w argmax must be the struct-max AGGREGATE, not a window:\n$p")
    spark.catalog.clearCache()
  }
}
