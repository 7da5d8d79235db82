package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.nio.file.Files

/** SURVEY §5.2.4: batch ≡ stream parity through MemoryStream
  * micro-batches, watermark late-drop, the flatMapGroupsWithState
  * causal tracker, and the exactly-once sink (idempotent replay +
  * checkpoint restart).
  *
  * Mini-events fixture per FIXTURES.md: 2 users, 11 events containing
  * an out-of-order pair per user, one exact (user, type, ts) duplicate,
  * a session gap of exactly 30min (boundary) and one of 31min, and an
  * event exactly on an hour boundary.
  */
class StreamingParitySuite extends SparkSuite {
  import spark.implicits._

  /** 2024-01-01T00:00:00Z in µs. */
  private val B = 1704067200000000L
  private def min(m: Long): Long = B + m * 60000000L

  private val miniEvents: Seq[Event] = Seq(
    Event(1, min(5), 1, "click", 10.0),
    Event(2, min(20), 1, "view", 1.5),
    Event(3, min(10), 1, "click", 2.0),   // out of order (20 -> 10): violation
    Event(4, min(50), 1, "click", 7.0),   // gap of exactly 30min after 20min
    Event(5, min(60), 1, "purchase", 5.0), // exactly on the hour boundary
    Event(6, min(0), 2, "view", 3.0),
    Event(7, min(0), 2, "view", 4.0),     // duplicate (user, type, ts); higher id
    Event(8, min(29), 2, "click", 1.0),   // 29min gap: same session
    Event(9, min(60), 2, "purchase", 2.5),
    Event(10, min(55), 2, "purchase", 1.0), // out of order (60 -> 55): violation
    Event(11, min(91), 2, "error", 0.5)   // 31min gap after 60: new session
  )
  private val batches: Seq[Seq[Event]] =
    Seq(miniEvents.take(4), miniEvents.slice(4, 8), miniEvents.drop(8))

  private def withTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(col("ts_us")))

  private def batchDf: DataFrame = withTs(miniEvents.toDF())

  /** Runs `core` over the mini events as a 3-micro-batch stream in
    * `complete` mode and returns the final result. */
  private def streamComplete(name: String, core: DataFrame => DataFrame): DataFrame = {
    val ms = MemoryStream[Event](spark)
    val q = core(withTs(ms.toDF()))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("tumbling window: stream (3 micro-batches, complete mode) == batch") {
    assert(canon(streamComplete("tumble_par", StreamOps.tumble))
      === canon(StreamOps.tumble(batchDf)))
  }

  test("sliding window: stream == batch") {
    assert(canon(streamComplete("slide_par", StreamOps.slide))
      === canon(StreamOps.slide(batchDf)))
  }

  test("session window: stream == batch, 30min gap boundary pins MERGE semantics") {
    val stream = streamComplete("sess_par", StreamOps.session)
    assert(canon(stream) === canon(StreamOps.session(batchDf)))
    // user 1: events at 5,10,20,50,60 — the EXACTLY-30min gap after
    // minute 20 still merges (Spark opens a new session only on a gap
    // strictly greater than the duration), so one 5-event session.
    // This is the §7.3.3 boundary pin; the oracle uses `>` accordingly.
    val u1 = stream.filter(col("user_id") === 1)
      .select(col("n_events")).collect().map(_.getLong(0)).sorted.toSeq
    assert(u1 === Seq(5L))
    // user 2: 29min gap keeps one session (0,0,29,55,60), 31min gap opens one.
    val u2 = stream.filter(col("user_id") === 2)
      .select(col("n_events")).collect().map(_.getLong(0)).sorted.toSeq
    assert(u2 === Seq(1L, 5L))
  }

  test("keyed dedup: streaming first-arrival == batch keep-earliest when arrival respects (ts, id)") {
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.dedupFirstArrival(withTs(ms.toDF()))
      .writeStream.format("memory").queryName("dedup_par").outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("dedup_par")
      .select(col("user_id"), col("event_type"), col("event_id")).as[(Long, String, Long)]
      .collect().toSet
    // streaming semantics: first ARRIVAL per key (arrival = event_id order)
    val firstArrival = miniEvents.groupBy(e => (e.user_id, e.event_type))
      .values.map(_.minBy(_.event_id))
      .map(e => (e.user_id, e.event_type, e.event_id)).toSet
    assert(streamed === firstArrival)
    // where arrival order respects (ts, id) — every key except the
    // intentionally out-of-order (2, purchase) — first-arrival equals
    // the batch keep-earliest rule
    val keepEarliest = miniEvents.groupBy(e => (e.user_id, e.event_type))
      .values.map(g => g.minBy(e => (e.ts_us, e.event_id)))
      .map(e => (e.user_id, e.event_type, e.event_id)).toSet
    assert(streamed.filterNot(_ == ((2L, "purchase", 9L)))
      === keepEarliest.filterNot(_ == ((2L, "purchase", 10L))))
    // the duplicate (user 2, view, ts 0): the earlier event_id won
    assert(streamed.contains((2L, "view", 6L)) && !streamed.contains((2L, "view", 7L)))
  }

  test("dedupWithinWatermark: exact inside the horizon, state expires after it") {
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.dedupWithinWatermark(
        withTs(ms.toDF()).withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      // first arrival emits; in-horizon duplicate suppressed
      ms.addData(Seq(Event(1, min(0), 1, "view", 1.0),
        Event(2, min(5), 1, "view", 1.0)))
      q.processAllAvailable()
      // unrelated key advances the watermark to min(50) > min(0)+10min,
      // expiring (1, view)'s dedup state
      ms.addData(Seq(Event(3, min(60), 9, "click", 1.0)))
      q.processAllAvailable()
      // re-arrival AFTER expiry emits again (state is bounded, not
      // forever); its own in-batch duplicate is still suppressed
      ms.addData(Seq(Event(4, min(55), 1, "view", 1.0),
        Event(5, min(56), 1, "view", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_wm").select(col("event_id"))
      .as[Long].collect().toSet
    assert(ids === Set(1L, 3L, 4L), s"got $ids")
  }

  test("causal tracker: flatMapGroupsWithState stream == same function in batch == expected") {
    // batch evaluation of the very same function
    val batchOut = StreamOps.causalTracker(miniEvents.toDS())
      .collect().map(c => c.user_id -> (c.n_events, c.n_violations)).toMap
    // streamed evaluation, 3 micro-batches, last Update emission per key wins
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.causalTracker(ms.toDS())
      .writeStream.format("memory").queryName("causal_par").outputMode("update").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val streamOut = spark.table("causal_par")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("n_violations")).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(batchOut === Map(1L -> (5L, 1L), 2L -> (6L, 1L)))
    assert(streamOut === batchOut)
  }

  test("EWMA smoother: stateful twin == oracle-checked q_event_ewma on sf0.001 (bitwise)") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.ewmaSmooth(events)
      .collect().map(o => o.event_id -> o.ewma).toMap
    val batch = graft.queries.EventOps.queries("q_event_ewma")(spark, sf)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(twin.keySet === batch.keySet)
    // bitwise: the shared left-assoc chain means not-approximately-equal
    twin.foreach { case (id, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(batch(id)), s"event $id: $v != ${batch(id)}")
    }
    assert(twin.nonEmpty)
  }

  test("EWMA smoother: per-key in-order micro-batches == single batch (state carries the tap window)") {
    // per-key (ts, id)-ordered delivery split so taps cross the batch
    // boundary: user 1's 5 events arrive 2+2+1
    val es = Seq(
      Event(1, min(0), 1, "view", 1.0), Event(2, min(1), 1, "click", 2.0),
      Event(3, min(2), 1, "view", 4.0), Event(4, min(3), 1, "click", 8.0),
      Event(5, min(4), 1, "purchase", 16.0),
      Event(6, min(0), 2, "view", 3.0), Event(7, min(5), 2, "click", 5.0))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.ewmaSmooth(ms.toDS())
      .writeStream.format("memory").queryName("ewma_par").outputMode("update").start()
    try Seq(es.take(2), es.slice(2, 4), es.drop(4)).foreach { b =>
      ms.addData(b); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ewma_par")
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    val whole = StreamOps.ewmaSmooth(es.toDS())
      .collect().map(o => o.event_id -> o.ewma).toMap
    assert(streamed === whole)
    // spot-check the chain: event 3 = 4*.5 + 2*.25 + 1*.125
    assert(whole(3L) === 4.0 * 0.5 + 2.0 * 0.25 + 1.0 * 0.125)
    // event 5 has 4 taps: 16*.5 + 8*.25 + 4*.125 + 2*.0625 + 1*.03125
    assert(whole(5L) ===
      16.0 * 0.5 + 8.0 * 0.25 + 4.0 * 0.125 + 2.0 * 0.0625 + 1.0 * 0.03125)
  }

  test("windowed funnel: stateful twin == graded q_event_funnel_win on sf0.001; a lapsed deadline stays lapsed across batches") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.funnelWindowed(events).collect()
      .map(o => o.user_id -> ((o.s_view, o.s_click, o.s_purchase))).toMap
    val batch = graft.queries.EventOps
      .queries("q_event_funnel_win")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(twin === batch)
    assert(twin.nonEmpty)
    spark.catalog.clearCache()
    // deadlines across batches: u1's click lands inside the 1-day
    // window; u2's identical click arrives past it and must NOT convert
    val day = 86400000000L
    val mini = Seq(
      Event(1L, 0L, 1L, "view", 1.0), Event(2L, day - 1L, 1L, "click", 1.0),
      Event(3L, 0L, 2L, "view", 1.0), Event(4L, day + 1L, 2L, "click", 1.0))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.funnelWindowed(ms.toDS())
      .writeStream.format("memory").queryName("fwin_mini")
      .outputMode("update").start()
    try {
      ms.addData(mini.take(1) ++ mini.drop(2).take(1)); q.processAllAvailable()
      ms.addData(mini.slice(1, 2) ++ mini.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("fwin_mini").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3))))
      .groupBy(_._1).view.mapValues(_.last._2).toMap
    assert(last(1L) === ((1, 1, 0)))
    assert(last(2L) === ((1, 0, 0)))
  }

  test("newret monitor: day-aggregated feed == graded q_event_newret on sf0.001; split same-day slice emits once") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.newretMonitor(events).collect()
      .groupBy(_.day_us).view.mapValues { g =>
        val nw = g.map(_.is_new.toLong).sum
        (g.length.toLong, nw, g.length - nw) }.toMap
    val batch = graft.queries.EventOps.queries("q_event_newret")(spark, sf)
      .select(unix_micros(col("day")), col("dau"), col("new_users"),
        col("returning_users"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(twin === batch)
    assert(twin.nonEmpty)
    // a same-day slice split across batches must not double-emit, and
    // day 2 of user 7 must flag returning
    val mini = Seq((10L, 1L, 1L), (10L, 2L, 2L), (11L, 3L, 3L)).map {
      case (day, id, j) => Event(id, day * 86400000000L + j, 7L, "view", 1.0)
    }
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.newretMonitor(ms.toDS())
      .writeStream.format("memory").queryName("newret_mini")
      .outputMode("append").start()
    try {
      ms.addData(mini.take(1)); q.processAllAvailable()
      ms.addData(mini.drop(1)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("newret_mini").collect()
      .map(r => (r.getLong(1) / 86400000000L, r.getInt(2)))
    assert(rows.sorted.toSeq === Seq((10L, 1), (11L, 0)))
  }

  test("quantile monitor: per-key sketch == driver-side fold of the same ordered values on sf0.001; split-batch state round-trip is bit-exact") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val k = 64
    val twin = StreamOps.quantileMonitor(events, k).collect()
      .map(o => o.user_id -> ((o.n, o.p50, o.p90, o.err_bound))).toMap
    // driver-side truth: the identical (ts, id)-ordered fold per key —
    // the sketch is deterministic, so equality is EXACT, not bounded
    val byUser = events.collect().toSeq
      .groupBy(_.user_id).view.mapValues { es =>
        val s = new graft.operators.QuantileSketch.Summary(k)
        es.sortBy(e => (e.ts_us, e.event_id)).foreach(e => s.update(e.value))
        (s.n, s.quantile(0.5).get, s.quantile(0.9).get, s.errBound)
      }.toMap
    assert(twin === byUser)
    assert(twin.nonEmpty)
    spark.catalog.clearCache()
    // split-batch: restore(fold(A)) then fold(B) must equal fold(A++B)
    // bit-for-bit — the state round-trip exactness claim
    val vals = (1 to 300).map(i => Event(i.toLong, i.toLong * 1000, 5L,
      "view", (i * 37 % 101).toDouble))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.quantileMonitor(ms.toDS(), k)
      .writeStream.format("memory").queryName("kll_mini")
      .outputMode("update").start()
    try {
      ms.addData(vals.take(137)); q.processAllAvailable()
      ms.addData(vals.drop(137)); q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("kll_mini").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .last
    val whole = new graft.operators.QuantileSketch.Summary(k)
    vals.foreach(e => whole.update(e.value))
    assert(last === ((whole.n, whole.quantile(0.5).get,
      whole.quantile(0.9).get, whole.errBound)))
  }

  test("transformWithState quantile sketch (r19): RocksDB stream == fMGWS twin == driver fold; split-batch round trip bit-exact") {
    // Wave 4, fourth member — the structural-snapshot state (nested
    // Seqs through the product encoder) surviving the RocksDB store.
    val k = 64
    val all = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
      .sortBy(e => (e.ts_us, e.event_id))
    val expected = StreamOps.quantileMonitor(
        spark.createDataset(all), k).collect()
      .map(o => o.user_id -> ((o.n, o.p50, o.p90, o.err_bound))).toMap
    // the driver-side truth: the identical ordered fold per key
    val byUser = all.groupBy(_.user_id).view.mapValues { es =>
      val s = new graft.operators.QuantileSketch.Summary(k)
      es.sortBy(e => (e.ts_us, e.event_id)).foreach(e => s.update(e.value))
      (s.n, s.quantile(0.5).get, s.quantile(0.9).get, s.errBound)
    }.toMap
    spark.catalog.clearCache()
    assert(expected === byUser && byUser.nonEmpty,
      "fMGWS twin drifted from the driver fold — fix that first")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable
      .Map.empty[Long, (Long, Double, Double, Double)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.quantileTws(ms.toDS(), k)
      .writeStream
      .foreachBatch { (ds: Dataset[QuantOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o =>
            buf(o.user_id) = ((o.n, o.p50, o.p90, o.err_bound)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twskll_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      // 3 ordered batches: the round trip restore∘fold ≡ fold must be
      // BIT-exact for the final standings to equal the one-shot twin
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS quantile never converged: ${buf.synchronized(buf.size)} " +
            s"keys vs ${expected.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  test("scd2 monitor: last-write-wins materialization == graded q_event_scd2 on sf0.001; a change across batches closes the carried range") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    // upsert materialization: last emission per (user, from_us, from_id)
    val twin = StreamOps.scd2Monitor(events).collect()
      .groupBy(o => (o.user_id, o.eff_from_us, o.eff_from_id))
      .view.mapValues(_.last).toMap.values
      .map(o => (o.user_id, o.attr, o.eff_from_us, o.eff_from_id,
        o.eff_to_us, o.is_current)).toSet
    val batch = graft.queries.EventOps.queries("q_event_scd2")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getInt(5))).toSet
    assert(twin === batch)
    assert(twin.nonEmpty)
    spark.catalog.clearCache()
    // a change arriving in batch 2 must CLOSE the range opened in
    // batch 1 (revising its row), and open the new current range
    val mini = Seq(
      Event(1L, 100L, 7L, "view", 1.0), Event(2L, 200L, 7L, "view", 1.0),
      Event(3L, 300L, 7L, "click", 1.0))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.scd2Monitor(ms.toDS())
      .writeStream.format("memory").queryName("scd2_mini")
      .outputMode("update").start()
    try {
      ms.addData(mini.take(2)); q.processAllAvailable()
      ms.addData(mini.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("scd2_mini").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    // emissions in order: open view@100, then (close view, open click)
    assert(rows.toSeq.sortBy(r => (r._3, r._5)) === Seq(
      (7L, "view", 100L, 1L, -1L, 1),
      (7L, "view", 100L, 1L, 300L, 0),
      (7L, "click", 300L, 3L, -1L, 1)))
  }

  test("transformWithState SCD2 (r19): RocksDB stream == fMGWS twin == graded q_event_scd2; change across batches closes the carried range") {
    // Wave 4, third member — the un-TTL'd port (expiry would break
    // the tiling invariant; dimension state is O(entities) by nature).
    val all = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
      .sortBy(e => (e.ts_us, e.event_id))
    def materialize(rows: Iterable[Scd2Out]) = rows
      .groupBy(o => (o.user_id, o.eff_from_us, o.eff_from_id))
      .view.mapValues(_.last).toMap.values
      .map(o => (o.user_id, o.attr, o.eff_from_us, o.eff_from_id,
        o.eff_to_us, o.is_current)).toSet
    val expected = materialize(
      StreamOps.scd2Monitor(spark.createDataset(all)).collect().toSeq)
    val graded = graft.queries.EventOps.queries("q_event_scd2")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getInt(5))).toSet
    spark.catalog.clearCache()
    assert(expected === graded && graded.nonEmpty,
      "fMGWS twin drifted from the graded query — fix that first")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // upsert buffer keyed like the materialization — last write wins
    val buf = scala.collection.mutable.Map
      .empty[(Long, Long, Long), Scd2Out]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.scd2Tws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[Scd2Out], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o =>
            buf((o.user_id, o.eff_from_us, o.eff_from_id)) = o)
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsscd2_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def got() = buf.synchronized {
        buf.values.map(o => (o.user_id, o.attr, o.eff_from_us,
          o.eff_from_id, o.eff_to_us, o.is_current)).toSet
      }
      while (got() != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS SCD2 never converged: ${got().size} rows vs ${expected.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
    // a change arriving in batch 2 CLOSES the range opened in batch 1
    val mini = Seq(
      Event(1L, 100L, 7L, "view", 1.0), Event(2L, 200L, 7L, "view", 1.0),
      Event(3L, 300L, 7L, "click", 1.0))
    val ms2 = MemoryStream[Event](s2)
    val buf2 = scala.collection.mutable.Map
      .empty[(Long, Long, Long), Scd2Out]
    val q2 = StreamOps.scd2Tws(ms2.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[Scd2Out], _: Long) =>
        val rows = ds.collect()
        buf2.synchronized {
          rows.foreach(o =>
            buf2((o.user_id, o.eff_from_us, o.eff_from_id)) = o)
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsscd22_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(mini.take(2), mini.drop(2)).foreach(ms2.addData(_))
      val want = Set(
        (7L, "view", 100L, 1L, 300L, 0),
        (7L, "click", 300L, 3L, -1L, 1))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def got2() = buf2.synchronized {
        buf2.values.map(o => (o.user_id, o.attr, o.eff_from_us,
          o.eff_from_id, o.eff_to_us, o.is_current)).toSet
      }
      while (got2() != want) {
        assert(System.nanoTime() < deadline,
          s"TWS SCD2 straddle never converged: ${got2()}")
        Thread.sleep(100)
      }
    } finally q2.stop()
  }

  test("timegap monitor: emitted gap multiset == the batch lag window on sf0.001; the gap spans a batch boundary, a key's first event emits nothing") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.timeGapMonitor(events).collect()
      .map(o => (o.event_type, o.gap_us)).groupBy(identity)
      .view.mapValues(_.length).toMap
    // the batch side: the IDENTICAL lag the graded q_event_interarrival
    // feeds its percentile engine
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val batch = events.toDF()
      .select(col("event_type"),
        (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(twin === batch)
    assert(twin.nonEmpty)
    spark.catalog.clearCache()
    // cross-batch: u7's second event arrives in batch 2 → ONE gap row
    // spanning the boundary; the first event emitted nothing
    val mini = Seq(Event(1L, 100L, 7L, "view", 1.0),
      Event(2L, 350L, 7L, "click", 1.0))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.timeGapMonitor(ms.toDS())
      .writeStream.format("memory").queryName("timegap_mini")
      .outputMode("append").start()
    try {
      ms.addData(mini.take(1)); q.processAllAvailable()
      ms.addData(mini.drop(1)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("timegap_mini").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq((7L, "click", 250L)))
  }

  test("lifetime monitor: survival curve from last-write-wins rows == graded q_event_survival on sf0.001; growth re-emits across batches, in-span repeats fold silently") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    // upsert materialization: last emission per user is their lifetime;
    // compose the survival curve exactly as the batch tail does
    val lifetimes = StreamOps.lifetimeMonitor(events).collect()
      .groupBy(_.user_id).view.mapValues(_.last.lifetime_days).toMap
    val counts = lifetimes.values.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val nUsers = lifetimes.size.toLong
    val twin = counts.keys.toSeq.sorted.map { l =>
      val surviving = counts.filter(_._1 >= l).values.sum
      (l, counts(l), surviving, nUsers, surviving.toDouble / nUsers)
    }
    val batch = graft.queries.EventOps.queries("q_event_survival")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(twin === batch)
    assert(twin.nonEmpty)
    spark.catalog.clearCache()
    // growth across a batch boundary re-emits the user's row; a repeat
    // INSIDE the known span emits nothing (last-write-wins holds)
    val mini = Seq(
      Event(1L, 10L * 86400000000L, 7L, "view", 1.0),
      Event(2L, 12L * 86400000000L + 5L, 7L, "view", 1.0),
      Event(3L, 11L * 86400000000L, 7L, "view", 1.0)) // inside [10, 12]
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.lifetimeMonitor(ms.toDS())
      .writeStream.format("memory").queryName("lifetime_mini")
      .outputMode("update").start()
    try {
      ms.addData(mini.take(1)); q.processAllAvailable()
      ms.addData(mini.slice(1, 2)); q.processAllAvailable()
      ms.addData(mini.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("lifetime_mini").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      (7L, 10L * 86400000000L, 0L),   // batch 1: first sighting
      (7L, 10L * 86400000000L, 2L)))  // batch 2: grew; batch 3: silent
  }

  test("daily-count monitor: lagcorr tail from last-write-wins rows == graded q_event_lagcorr on sf0.001") {
    val events = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    // ONE maintained day-grain table feeds changepoint AND lagcorr —
    // the monitor is the shared stateful ingress of the daily family
    val counts = StreamOps.dailyCountMonitor(events).collect()
      .groupBy(o => (o.event_type, o.day_us)).view
      .mapValues(_.last.n).toMap
    def series(t: String) = counts.collect {
      case ((`t`, d), n) => d / 86400000000L -> n }.toMap
    val (xs, ys) = (series("view"), series("purchase"))
    val twin = (0 to 3).flatMap { lag =>
      val pairs = xs.toSeq.collect { case (d, x) if ys.contains(d + lag) =>
        (BigInt(x), BigInt(ys(d + lag))) }
      if (pairs.isEmpty) None else {
        val n = pairs.size
        val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val vx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        val vy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
        val xc = if (vx > 0 && vy > 0)
          Some(BigDecimal((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble)
            / (math.sqrt(vx) * math.sqrt(vy)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
        Some((lag, n.toLong, xc))
      }
    }
    val batch = graft.queries.EventOps.queries("q_event_lagcorr")(spark, sf)
      .collect().map(r => (r.getAs[Int]("lag"), r.getAs[Long]("n_pairs"),
        Option(r.getAs[java.lang.Double]("xcorr")).map(_.doubleValue)))
      .toSeq
    spark.catalog.clearCache()
    assert(twin === batch)
    assert(twin.nonEmpty)
  }

  test("daily-count monitor: quiet, seasonality and trend tails from last-write-wins rows == their graded queries on sf0.001") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    // the one maintained (type, day, n) table feeds the entire daily
    // family: changepoint, lagcorr (pinned above), quiet, seasonality,
    // trend — five graded queries off ONE O(keys) stateful ingress
    val byType = StreamOps.dailyCountMonitor(events).collect()
      .groupBy(o => (o.event_type, o.day_us)).view
      .mapValues(_.last.n).toMap
      .groupBy(_._1._1).view.mapValues(m =>
        m.toSeq.map { case ((_, d), n) => (d / 86400000000L, n) }
          .sortBy(_._1)).toMap

    val quietTwin = byType.view.mapValues { days =>
      val ds = days.map(_._1)
      val gaps = ds.zip(ds.tail).map { case (a, b) => b - a - 1 }
      (ds.max - ds.min + 1, ds.size.toLong,
        ds.max - ds.min + 1 - ds.size,
        if (gaps.isEmpty) 0L else math.max(gaps.max, 0L),
        gaps.count(_ > 0).toLong)
    }.toMap
    val quietBatch = graft.queries.EventOps.queries("q_event_quiet")(
      spark, sf).collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(quietTwin === quietBatch)

    val seasTwin = byType.view.mapValues { days =>
      val cells = days.groupBy(_._1 % 7).view.mapValues(_.map(_._2).sum)
      val n = cells.values.sum
      val s2 = cells.values.map(c => BigInt(c) * BigInt(c)).sum
      val (topDow, topN) = cells.toSeq.map { case (d, c) => (-c, d) }
        .min match { case (nc, d) => (d, -nc) }
      (n, cells.size.toLong, topDow, topN,
        topN.toDouble / n.toDouble,
        (BigInt(7) * s2 - BigInt(n) * BigInt(n)).toDouble / n.toDouble)
    }.toMap
    val seasBatch = graft.queries.EventOps.queries("q_event_seasonality")(
      spark, sf).collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(seasTwin === seasBatch)

    val trendTwin = byType.view.mapValues { days =>
      val slopes = for {
        (d1, n1) <- days; (d2, n2) <- days if d1 < d2
      } yield ((n2 - n1).toDouble / (d2 - d1).toDouble, d1, d2)
      val sorted = slopes.sortBy(identity)
      val m = sorted.size
      (m.toLong, sorted((m + 1) / 2 - 1)._1)
    }.toMap
    val trendBatch = graft.queries.EventOps.queries("q_event_trend")(
      spark, sf).collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    spark.catalog.clearCache()
    assert(trendTwin === trendBatch)
    assert(trendTwin.nonEmpty && quietTwin.nonEmpty)
  }

  test("pit monitor: streaming point-in-time enrichment == graded q_event_pit on sf0.001; run start carries across batches") {
    val events = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.pitMonitor(events).collect()
      .map(o => o.p_id -> ((o.ctx_attr.orNull, o.ctx_from_us, o.ctx_age_us)))
      .toMap
    val batch = graft.queries.EventOps.queries("q_event_pit")(spark, sf)
      .collect().map(r => r.getAs[Long]("p_id") ->
        ((r.getAs[String]("ctx_attr"),
          Option(r.getAs[java.lang.Long]("ctx_from_us")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("ctx_age_us")).map(_.longValue))))
      .toMap
    assert(twin === batch)
    assert(twin.nonEmpty)
    // the attribute RUN (not just the attr) must survive a batch split:
    // view@10 (b1), view@20 (b2, compacts into the SAME run), purchase
    // @25 (b2) → age 15 from run start 10, not 5 from the later view
    val mini = Seq(
      Event(1L, 10L, 7L, "view", 1.0), Event(2L, 20L, 7L, "view", 1.0),
      Event(3L, 25L, 7L, "purchase", 1.0),
      Event(4L, 30L, 7L, "click", 1.0), Event(5L, 30L, 7L, "purchase", 1.0))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.pitMonitor(ms.toDS())
      .writeStream.format("memory").queryName("pit_mini")
      .outputMode("append").start()
    try {
      ms.addData(mini.take(1)); q.processAllAvailable()
      ms.addData(mini.drop(1)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("pit_mini").collect()
      .map(r => r.getLong(1) -> ((r.getAs[String]("ctx_attr"),
        r.getAs[Long]("ctx_age_us")))).toMap
    assert(rows === Map(
      3L -> (("view", 15L)),   // run start 10 carried from batch 1
      5L -> (("click", 0L))))  // same-µs change applies before the fact
  }

  test("daily-count monitor: CUSUM changepoint from last-write-wins rows == graded q_event_changepoint on sf0.001; counts grow across batches") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    // upsert materialization: last emission per (type, day) is the
    // current count; the CUSUM tail composes exactly as the batch query
    val counts = StreamOps.dailyCountMonitor(events).collect()
      .groupBy(o => (o.event_type, o.day_us)).view
      .mapValues(_.last.n).toMap
    val twin = counts.groupBy(_._1._1).flatMap { case (t, m) =>
      val days = m.toSeq.map { case ((_, d), n) => (d, n) }.sortBy(_._1)
      val nD = days.size
      if (nD < 2) None
      else {
        val s = days.map(_._2).scanLeft(0L)(_ + _).drop(1)
        val sn = s.last
        val cands = (1 until nD).map(k =>
          (math.abs(nD.toLong * s(k - 1) - k.toLong * sn), k))
        val dmax = cands.map(_._1).max
        val k = cands.filter(_._1 == dmax).map(_._2).min
        Some((t, days(k - 1)._1, k, nD.toLong, s(k - 1), sn, dmax))
      }
    }.toSeq.sortBy(_._1)
    val batch = graft.queries.EventOps.queries("q_event_changepoint")(
      spark, sf).collect().map(r => (r.getString(0),
        r.getAs[java.sql.Timestamp]("cp_day").toInstant.toEpochMilli * 1000L,
        r.getAs[Int]("k"), r.getAs[Long]("n_days"), r.getAs[Long]("s_k"),
        r.getAs[Long]("s_n"), r.getAs[Long]("dstat"))).toSeq
    assert(twin === batch)
    assert(twin.nonEmpty)
    spark.catalog.clearCache()
    // a second batch touching a known (type, day) re-emits the grown
    // count; an untouched key stays silent
    val D = 86400000000L
    val mini = Seq(
      Event(1L, 10L * D, 7L, "view", 1.0),
      Event(2L, 10L * D + 5L, 8L, "view", 1.0),
      Event(3L, 11L * D, 7L, "click", 1.0),
      Event(4L, 10L * D + 9L, 9L, "view", 1.0))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.dailyCountMonitor(ms.toDS())
      .writeStream.format("memory").queryName("daycount_mini")
      .outputMode("update").start()
    try {
      ms.addData(mini.take(3)); q.processAllAvailable()
      ms.addData(mini.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("daycount_mini").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(rows === Seq(
      ("click", 11L * D, 1L),
      ("view", 10L * D, 2L),   // batch 1: two views that day
      ("view", 10L * D, 3L))) // batch 2: grew to 3; click day silent
  }

  test("transformWithState daily-count maintainer (r15): RocksDB stream == fMGWS twin == batch day grain; CUSUM tail == graded q_event_changepoint") {
    // The GRADED daily family's ingress on the successor state API:
    // sf0.001 events streamed in 3 micro-batches through the TTL'd
    // ValueState processor under the RocksDB provider; the last-write-
    // wins (type, day, n) table must equal BOTH the fMGWS twin's and
    // the direct batch aggregate — and composing the changepoint tail
    // from it must reproduce the graded query byte-for-byte (the other
    // four daily tails are pinned to the same map by the fMGWS tests).
    val evDs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val all = evDs.collect().toSeq
    val grain = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .groupBy(col("event_type"),
        (expr("unix_micros(ts) div 86400000000") * 86400000000L).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // TimeMode.ProcessingTime (the TTL's requirement) makes the engine
    // re-trigger for state cleanup, so processAllAvailable never
    // latches — the ttlCount-test discipline applies: a throttling
    // trigger + a polled foreachBatch buffer with a deadline.
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.dailyCountMonitorTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[DayCountOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { buf ++= rows.map(o => (o.event_type, o.day_us, o.n)) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsdaily_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def lww = buf.synchronized(buf.toSeq)
      .groupBy(o => (o._1, o._2)).view.mapValues(_.map(_._3).max).toMap
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (lww != grain) {
        assert(System.nanoTime() < deadline,
          s"TWS table never converged to the batch day grain: " +
            s"${lww.size} keys vs ${grain.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
    // counts only grow, so max emission per key == the final upsert
    val twsMap = lww
    val fmgws = StreamOps.dailyCountMonitor(evDs).collect()
      .groupBy(o => (o.event_type, o.day_us)).view
      .mapValues(_.last.n).toMap
    assert(twsMap === fmgws)
    assert(twsMap === grain)
    // CUSUM changepoint tail composed from the TWS table
    val twin = twsMap.groupBy(_._1._1).flatMap { case (t, m) =>
      val days = m.toSeq.map { case ((_, d), n) => (d, n) }.sortBy(_._1)
      val nD = days.size
      if (nD < 2) None
      else {
        val s = days.map(_._2).scanLeft(0L)(_ + _).drop(1)
        val sn = s.last
        val cands = (1 until nD).map(k =>
          (math.abs(nD.toLong * s(k - 1) - k.toLong * sn), k))
        val dmax = cands.map(_._1).max
        val k = cands.filter(_._1 == dmax).map(_._2).min
        Some((t, days(k - 1)._1, k, nD.toLong, s(k - 1), sn, dmax))
      }
    }.toSeq.sortBy(_._1)
    val batch = graft.queries.EventOps.queries("q_event_changepoint")(
      spark, sf).collect().map(r => (r.getString(0),
        r.getAs[java.sql.Timestamp]("cp_day").toInstant.toEpochMilli * 1000L,
        r.getAs[Int]("k"), r.getAs[Long]("n_days"), r.getAs[Long]("s_k"),
        r.getAs[Long]("s_n"), r.getAs[Long]("dstat"))).toSeq
    assert(twin === batch)
    assert(twin.nonEmpty)
    // seasonal-naive forecast tail composed from the same TWS table
    // (r17 — q_event_fcstnaive joins the daily family): gap-filled
    // calendar, lag-7/lag-1 absolute errors, floor-micros
    val D = 86400000000L
    val fcstTwin = twsMap.groupBy(_._1._1).flatMap { case (t, m) =>
      val byDay = m.map { case ((_, d), n) => (d, n) }
      val (d0, d1) = (byDay.keys.min, byDay.keys.max)
      val series = (0L to (d1 - d0) / D)
        .map(k => byDay.getOrElse(d0 + k * D, 0L))
      if (series.size < 8) None
      else {
        val scored = (7 until series.size)
        val sae7 = scored.map(i => math.abs(series(i) - series(i - 7))).sum
        val sae1 = scored.map(i => math.abs(series(i) - series(i - 1))).sum
        Some((t, scored.size.toLong, sae7, sae1,
          sae7 * 1000000L / scored.size, sae1 * 1000000L / scored.size))
      }
    }.toSeq.sortBy(_._1)
    val fcstBatch = graft.queries.EventOps.queries("q_event_fcstnaive")(
      spark, sf).collect().map(r => (r.getString(0),
        r.getAs[Long]("n_scored"), r.getAs[Long]("sae7"),
        r.getAs[Long]("sae1"), r.getAs[Long]("mae7_micro"),
        r.getAs[Long]("mae1_micro"))).toSeq
    assert(fcstTwin === fcstBatch && fcstBatch.nonEmpty,
      "fcstnaive tail composed from the TWS day grain != graded query")
    spark.catalog.clearCache()
  }

  test("transformWithState daily-count TTL: an idle (type, day) counter expires and recounts from cold (r15)") {
    // The at-scale point of the TWS port: the store itself evicts
    // dormant day counters. A 150 ms TTL + an idle wait makes the
    // same key recount from zero, while without expiry it would grow.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val D = 86400000000L
    def ev(id: Long) = Event(id, 10L * D + id, 7L, "view", 1.0)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.dailyCountMonitorTws(ms.toDS(),
        java.time.Duration.ofSeconds(1))
      .writeStream
      .foreachBatch { (ds: Dataset[DayCountOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { buf ++= rows.map(_.n) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsttl_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def awaitRows(k: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.size) < k) {
        assert(System.nanoTime() < deadline,
          s"sink never reached $k rows: ${buf.synchronized(buf.toSeq)}")
        Thread.sleep(50)
      }
    }
    try {
      ms.addData(Seq(ev(1), ev(2))); awaitRows(1)
      Thread.sleep(5000) // let the 1 s TTL lapse while the key idles
      ms.addData(Seq(ev(3))); awaitRows(2)
    } finally q.stop()
    val ns = buf.synchronized(buf.toSeq)
    assert(ns === Seq(2L, 1L), // expired: 2 then back to 1, not 3
      s"TTL did not expire the idle counter: $ns")
  }

  test("attrib monitor: per-touch credit counts == graded q_event_attrib on sf0.001; the touch carries across batches") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.attribMonitor(events).collect()
      .groupBy(_.touch_type).view.mapValues(_.length.toLong).toMap
    val batch = graft.queries.EventOps.queries("q_event_attrib")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twin === batch)
    assert(twin.values.sum > 0)
    // the carry must survive a batch boundary: view in batch 1 credits
    // the purchase arriving in batch 2; a purchase-first user is direct
    val mini = Seq(
      Event(1L, 10L, 7L, "view", 1.0), Event(2L, 20L, 8L, "purchase", 1.0),
      Event(3L, 30L, 7L, "purchase", 1.0), Event(4L, 40L, 7L, "purchase", 1.0))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.attribMonitor(ms.toDS())
      .writeStream.format("memory").queryName("attrib_mini")
      .outputMode("append").start()
    try {
      ms.addData(mini.take(2)); q.processAllAvailable()
      ms.addData(mini.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attrib_mini").collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(rows === Map(2L -> "direct", 3L -> "view", 4L -> "view"))
  }

  test("streak monitor: stateful twin == graded q_event_streak on sf0.001; split replay carries streaks across batches") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.streakMonitor(events)
      .collect().map(o => o.user_id ->
        ((o.n_active_days, o.longest_streak, o.current_streak))).toMap
    val batch = graft.queries.EventOps.queries("q_event_streak")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(twin === batch)
    assert(twin.nonEmpty)
    // a streak SPLIT ACROSS batches must keep extending: days 10,11 in
    // batch 1 and 12 in batch 2 → current 3; a gap then resets
    val mini = Seq((10L, 1L), (11L, 2L), (12L, 3L), (15L, 4L)).map {
      case (day, id) => Event(id, day * 86400000000L + 5L, 7L, "view", 1.0)
    }
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.streakMonitor(ms.toDS())
      .writeStream.format("memory").queryName("streak_mini")
      .outputMode("update").start()
    try {
      ms.addData(mini.take(2)); q.processAllAvailable()
      ms.addData(mini.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("streak_mini").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet === Set((2L, 2L, 2L), (4L, 3L, 1L)))
  }

  test("moments monitor: stateful twin == batch decimal power-sum combine on sf0.001 (bitwise doubles)") {
    // the streaming analog of the graded q_agg_moments discipline: the
    // batch side sums exact cents powers as DECIMAL(38,0) and runs the
    // identical IEEE combine — every emitted double must match bitwise
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.momentsMonitor(events)
      .collect().map(o => o.user_id ->
        ((o.n, o.mean_cents, o.var_cents, o.skewness, o.kurtosis))).toMap
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // cents via the double→DECIMAL(18,2) cast (HALF_UP on the shortest
    // decimal representation — the same quantization the twin's scala
    // BigDecimal(double).setScale(2, HALF_UP) performs), then exact
    // integer powers as longs (49002⁴ < 2⁶³) summed in DECIMAL(38,0)
    val c = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val g = Tables.events(spark, sf).groupBy(col("user_id")).agg(
      count(lit(1)).as("n"),
      sum(c.cast(dec38)).as("s1"), sum((c * c).cast(dec38)).as("s2"),
      sum((c * c * c).cast(dec38)).as("s3"),
      sum((c * c * (c * c)).cast(dec38)).as("s4"))
    val batch = g.collect().map { r =>
      val n = r.getLong(1); val nD = n.toDouble
      val Seq(d1, d2, d3, d4) = (2 to 5).map(i =>
        r.getDecimal(i).toBigInteger.doubleValue)
      val m2 = (nD * d2 - d1 * d1) / (nD * nD)
      val m3 = (nD * nD * d3 - 3.0 * nD * d1 * d2 + 2.0 * d1 * d1 * d1) /
        (nD * nD * nD)
      val m4 = (nD * nD * nD * d4 - 4.0 * nD * nD * d1 * d3 +
        6.0 * nD * d1 * d1 * d2 - 3.0 * d1 * d1 * d1 * d1) /
        (nD * nD * nD * nD)
      val ok = n > 1 && m2 > 0
      r.getLong(0) -> ((n, d1 / nD, m2,
        if (ok) Some(m3 / (m2 * math.sqrt(m2))) else None,
        if (ok) Some(m4 / (m2 * m2) - 3.0) else None))
    }.toMap
    assert(twin === batch)
    assert(twin.nonEmpty && twin.values.exists(_._4.isDefined))
  }

  test("moments monitor: ANY micro-batch split and arrival order reach identical final sums") {
    val es = miniEvents
    def finalStandings(bs: Seq[Seq[Event]]): Map[Long, (Long, Double, Double)] = {
      val ms = MemoryStream[Event](spark)
      val name = s"mm_par_${bs.size}_${bs.head.head.event_id}"
      val q = StreamOps.momentsMonitor(ms.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    }
    val whole = finalStandings(Seq(es))
    val shuffledSplit = finalStandings(
      Seq(es.reverse.take(3), es.reverse.slice(3, 9), es.reverse.drop(9)))
    assert(whole === shuffledSplit)
  }

  test("bitmask monitor: stateful twin == batch bit_or/bit_xor aggregate on sf0.001 (bit-exact)") {
    // the streaming analog of the graded q_agg_bitmask bit algebra:
    // hour-of-day presence + parity masks per user over the event log
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.bitmaskMonitor(events)
      .collect().map(o => o.user_id -> ((o.hour_or, o.hour_xor, o.n_events, o.n_active_hours))).toMap
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), hour(ts)))").as("o"),
        expr("bit_xor(shiftleft(CAST(1 AS BIGINT), hour(ts)))").as("x"),
        count(lit(1)).as("n"))
      .withColumn("h", bit_count(col("o")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(twin === batch)
    assert(twin.nonEmpty)
  }

  test("bitmask monitor: ANY micro-batch split and arrival order reach the identical final masks") {
    // OR/XOR commutativity+associativity is the twin's whole contract:
    // replay the mini events REVERSED and re-split — final standings per
    // key must equal the single-batch run over the original order
    val es = miniEvents
    def finalStandings(bs: Seq[Seq[Event]]): Map[Long, (Long, Long, Long)] = {
      val ms = MemoryStream[Event](spark)
      val name = s"bm_par_${bs.size}_${bs.head.head.event_id}"
      val q = StreamOps.bitmaskMonitor(ms.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      // Update mode re-emits standings per batch; the LAST row per key
      // (max n_events) is the final state
      spark.table(name).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).maxBy(_._3) }
    }
    val whole = finalStandings(Seq(es))
    val shuffledSplit = finalStandings(
      Seq(es.reverse.take(3), es.reverse.slice(3, 9), es.reverse.drop(9)))
    assert(whole === shuffledSplit)
  }

  test("causal tracker equals the oracle-checked batch q_causal on sf0.001") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val tracked = StreamOps.causalTracker(events)
      .collect().map(c => c.user_id -> (c.n_events, c.n_violations)).toMap
    val oracle = graft.queries.EventOps.queries("q_causal")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tracked === oracle)
    assert(tracked.nonEmpty)
  }

  test("windowed top-k leaderboard: stateful twin == oracle-checked q_stream_topk on sf0.001") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.windowTopkMonitor(events, k = 3)
      .collect().map(o => (o.window_us, o.rk) -> ((o.user_id, o.value))).toMap
    val batch = graft.queries.EventOps.queries("q_stream_topk")(spark, sf)
      .collect().map { r =>
        // window starts are whole hours — epoch ms × 1000 is exact µs
        (r.getTimestamp(0).getTime * 1000L, r.getInt(3)) ->
          ((r.getLong(1), r.getDouble(2)))
      }.toMap
    assert(twin === batch)
    assert(twin.nonEmpty)
  }

  test("windowed top-k leaderboard: standings update per micro-batch; final == batch") {
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.windowTopkMonitor(ms.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_mon")
      .outputMode("update").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val all = spark.table("topk_mon").as[TopkOut].collect()
    // final emission per window = the one with the largest n_events
    val fin = all.groupBy(_.window_us).map { case (w, os) =>
      val lastN = os.map(_.n_events).max
      w -> os.filter(_.n_events == lastN).sortBy(_.rk)
        .map(o => (o.rk, o.user_id, o.value)).toSeq
    }
    val batch = StreamOps.windowTopkMonitor(miniEvents.toDS(), k = 2)
      .collect().groupBy(_.window_us).map { case (w, os) =>
        w -> os.sortBy(_.rk).map(o => (o.rk, o.user_id, o.value)).toSeq }
    assert(fin === batch)
    // mid-stream standings EXIST for the first window (it re-emitted)
    assert(all.groupBy(_.window_us).exists(_._2.map(_.n_events).distinct.size > 1),
      "no window ever updated its standings across batches")
  }

  test("running agg (incremental view): stateful twin == oracle-checked q_stream_agg_state on sf0.001") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val twin = StreamOps.runningAgg(events)
      .collect().map(r => r.event_id -> (r.running_n, r.running_val)).toMap
    val batch = graft.queries.EventOps.queries("q_stream_agg_state")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(twin === batch)
    assert(twin.size === 1000)
  }

  test("watermark drops late rows from append-mode windowed aggregation") {
    val ms = MemoryStream[Event](spark)
    val agg = StreamOps.tumble(
      withTs(ms.toDF()).withWatermark("ts", "10 minutes"))
    val q = agg.writeStream.format("memory").queryName("wm_drop")
      .outputMode("append").start()
    try {
      ms.addData(Seq(Event(1, min(5), 1, "view", 1.0),
        Event(2, min(90), 1, "view", 1.0))) // watermark -> 01:20
      q.processAllAvailable()
      ms.addData(Seq(Event(3, min(30), 1, "view", 1.0),  // LATE: 00:30 < 01:20
        Event(4, min(160), 1, "view", 1.0))) // watermark -> 02:30
      q.processAllAvailable()
      ms.addData(Seq(Event(5, min(240), 1, "view", 1.0))) // close [02:00,03:00)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("wm_drop")
      .select(col("window_start").cast("long"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // [00:00) closed with n=1 — the late minute-30 row was dropped.
    assert(out(B / 1000000L) === 1L)
    // [01:00) closed with n=1, [02:00) closed with n=1.
    assert(out(min(60) / 1000000L) === 1L)
    assert(out(min(120) / 1000000L) === 1L)
  }

  test("exactly-once sink: replayed epoch overwrites itself; checkpoint restart does not double-write") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val cp = Files.createTempDirectory("graft_cp").toString
    val sink = new IdempotentParquetSink(dir)
    val ms = MemoryStream[Event](spark)
    def start(): StreamingQuery =
      withTs(ms.toDF()).writeStream
        .foreachBatch((df: Dataset[Row], id: Long) => sink.write(df, id))
        .option("checkpointLocation", cp).start()
    val q1 = start()
    try { ms.addData(batches.head); q1.processAllAvailable() } finally q1.stop()
    val afterB1 = sink.readAll(spark).count()
    assert(afterB1 === 4L)
    // At-least-once redelivery: re-running epoch 0 must not duplicate.
    sink.write(withTs(batches.head.toDF()), 0L)
    assert(sink.readAll(spark).count() === 4L)
    // Restart from the same checkpoint: only NEW data lands.
    val q2 = start()
    try { ms.addData(batches(1)); q2.processAllAvailable() } finally q2.stop()
    assert(sink.readAll(spark).count() === 8L)
    assert(sink.readAll(spark).select(col("event_id")).distinct().count() === 8L)
  }

  test("at-most-once sink: a poisoned epoch is DROPPED on replay — never duplicated, never retried") {
    // The reference's delivery triple, third leg (SURVEY §1.1):
    // commit-the-offset-BEFORE-processing. Epoch 1 carries a
    // deterministic poison row that kills its parquet write AFTER the
    // marker committed; the restarted query replays epoch 1, the sink
    // finds the marker and skips, so epoch 1's rows are lost — the
    // at-most-once contract — while epochs 0 and 2 land exactly once.
    val dir = Files.createTempDirectory("graft_amo_sink").toString
    val cp = Files.createTempDirectory("graft_amo_cp").toString
    val sink = new AtMostOnceParquetSink(dir)
    val ms = MemoryStream[Event](spark)
    def start(): StreamingQuery =
      withTs(ms.toDF())
        .withColumn("value", when(col("event_id") === 6,
          raise_error(lit("poison row")).cast("double"))
          .otherwise(col("value")))
        .writeStream
        .foreachBatch((df: Dataset[Row], id: Long) => sink.write(df, id))
        .option("checkpointLocation", cp).start()
    val q1 = start()
    try {
      ms.addData(batches.head) // epoch 0: clean
      q1.processAllAvailable()
      ms.addData(batches(1)) // epoch 1: contains event_id 6 (poison)
      intercept[Exception] { q1.processAllAvailable() }
    } finally q1.stop()
    assert(sink.readAll(spark).count() === 4L) // epoch 0 only
    // Restart replays epoch 1 (Spark is at-least-once); the sink's
    // pre-committed marker turns the replay into a drop — the poison is
    // never re-evaluated and the query moves on to epoch 2.
    val q2 = start()
    try { ms.addData(batches(2)); q2.processAllAvailable() } finally q2.stop()
    val ids = sink.readAll(spark).select(col("event_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val kept = (batches.head ++ batches(2)).map(_.event_id).sorted
    assert(ids === kept, "epochs 0+2 exactly once, epoch 1 dropped")
    assert(!ids.contains(6L) && !ids.contains(5L), "the whole poisoned epoch is gone")
  }

  test("stateful state survives a checkpoint restart: gap audit resumes from the last id") {
    // The reference's offsets-with-state commit (§1.1): per-key
    // flatMapGroupsWithState state is persisted in the checkpoint's
    // state store and must be recovered on restart — the post-restart
    // batch sees the PRE-restart lastId, so the jump 2 -> 5 counts as
    // one gap of 2 even though the runs never shared a JVM query.
    val cp = Files.createTempDirectory("graft_gap_cp").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    def ev(id: Long, u: Long) = Event(id, min(id), u, "view", 1.0)
    val ms = MemoryStream[Event](spark)
    def start(): StreamingQuery = StreamOps.gapAudit(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[GapOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          buf ++= rows.map(o =>
            (o.user_id, o.n_events, o.n_gaps, o.missing_total, o.max_gap))
        }
        ()
      }
      .option("checkpointLocation", cp).outputMode("update").start()
    val q1 = start()
    try { ms.addData(Seq(ev(1, 1), ev(2, 1))); q1.processAllAvailable() }
    finally q1.stop()
    assert(buf.synchronized(buf.last) === ((1L, 2L, 0L, 0L, 0L)))
    val q2 = start()
    try { ms.addData(Seq(ev(5, 1))); q2.processAllAvailable() }
    finally q2.stop()
    // 3 events total, one gap (ids 3,4 missing), width 2 — only correct
    // if lastId=2 was recovered from the checkpointed state
    assert(buf.synchronized(buf.last) === ((1L, 3L, 1L, 2L, 2L)))
  }

  test("RocksDB state store: gap audit state survives a checkpoint restart under the at-scale provider") {
    // SURVEY §3.4 names RocksDB as the 100×-state backend (state no
    // longer bounded by executor heap). Same recovery scenario as the
    // HDFS-provider test above, but run in a CLONED session (own
    // SQLConf — the shared session and any concurrently running suite
    // keep the default provider) with
    // spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider,
    // proving the state semantics are provider-independent and the
    // checkpoint really went through RocksDB.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cp = Files.createTempDirectory("graft_rocks_cp").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    def ev(id: Long, u: Long) = Event(id, min(id), u, "view", 1.0)
    val ms = MemoryStream[Event](s2)
    def start(): StreamingQuery = StreamOps.gapAudit(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[GapOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          buf ++= rows.map(o =>
            (o.user_id, o.n_events, o.n_gaps, o.missing_total, o.max_gap))
        }
        ()
      }
      .option("checkpointLocation", cp).outputMode("update").start()
    val q1 = start()
    try { ms.addData(Seq(ev(1, 1), ev(2, 1))); q1.processAllAvailable() }
    finally q1.stop()
    assert(buf.synchronized(buf.last) === ((1L, 2L, 0L, 0L, 0L)))
    val q2 = start()
    try { ms.addData(Seq(ev(5, 1))); q2.processAllAvailable() }
    finally q2.stop()
    // identical recovery semantics to the default provider
    assert(buf.synchronized(buf.last) === ((1L, 3L, 1L, 2L, 2L)))
    // and the state dir proves RocksDB wrote it (zip snapshots /
    // changelogs — the default HDFS provider writes .delta/.snapshot)
    val stateFiles = listStateFiles(cp)
    assert(stateFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB artifacts under $cp/state: $stateFiles")
  }

  test("transformWithState gap audit == flatMapGroupsWithState gap audit across a restart (Spark 4 state API)") {
    // Same recovery scenario as the two tests above, on the SUCCESSOR
    // state API (typed named ValueState via StatefulProcessor).
    // transformWithState requires the RocksDB provider, so a cloned
    // session supplies it; identical final audits across an identical
    // batch split + restart pin the two APIs as interchangeable here.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cp = Files.createTempDirectory("graft_tws_cp").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    def ev(id: Long, u: Long) = Event(id, min(id), u, "view", 1.0)
    val ms = MemoryStream[Event](s2)
    def start(): StreamingQuery = StreamOps.gapAuditTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[GapOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          buf ++= rows.map(o =>
            (o.user_id, o.n_events, o.n_gaps, o.missing_total, o.max_gap))
        }
        ()
      }
      .option("checkpointLocation", cp).outputMode("update").start()
    val q1 = start()
    try { ms.addData(Seq(ev(1, 1), ev(2, 1))); q1.processAllAvailable() }
    finally q1.stop()
    assert(buf.synchronized(buf.last) === ((1L, 2L, 0L, 0L, 0L)))
    val q2 = start()
    try { ms.addData(Seq(ev(5, 1))); q2.processAllAvailable() }
    finally q2.stop()
    // the jump 2 -> 5 counts as one gap of 2 — identical to the
    // flatMapGroupsWithState audit's recovery semantics
    assert(buf.synchronized(buf.last) === ((1L, 3L, 1L, 2L, 2L)))
  }

  test("RocksDB changelog checkpointing: gap audit recovery with per-batch changelogs instead of full snapshots") {
    // r9: the 100×-STATE-SIZE recovery story. Full-snapshot checkpointing
    // re-uploads the whole RocksDB instance per commit — at corpus-scale
    // state (billions of keys) that is the streaming bottleneck. Spark
    // 4's rocksdb.changelogCheckpointing=true uploads only the batch's
    // delta as a .changelog and snapshots lazily in the background, so
    // commit cost is ∝ CHANGED keys, not total state. Same restart
    // scenario as the tws test above; recovery then replays
    // snapshot + changelog chain. Asserted: identical audit semantics
    // AND .changelog artifacts actually present in the checkpoint (the
    // proof the commit path really was changelog-based).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    val cp = Files.createTempDirectory("graft_clog_cp").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    def ev(id: Long, u: Long) = Event(id, min(id), u, "view", 1.0)
    val ms = MemoryStream[Event](s2)
    def start(): StreamingQuery = StreamOps.gapAuditTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[GapOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          buf ++= rows.map(o =>
            (o.user_id, o.n_events, o.n_gaps, o.missing_total, o.max_gap))
        }
        ()
      }
      .option("checkpointLocation", cp).outputMode("update").start()
    val q1 = start()
    try { ms.addData(Seq(ev(1, 1), ev(2, 1))); q1.processAllAvailable() }
    finally q1.stop()
    assert(buf.synchronized(buf.last) === ((1L, 2L, 0L, 0L, 0L)))
    val q2 = start()
    try { ms.addData(Seq(ev(5, 1))); q2.processAllAvailable() }
    finally q2.stop()
    // recovery across the restart must replay the changelog chain to the
    // same lastId=2 state the snapshot-based providers recover
    assert(buf.synchronized(buf.last) === ((1L, 3L, 1L, 2L, 2L)))
    val stateFiles = listStateFiles(cp)
    assert(stateFiles.exists(_.endsWith(".changelog")),
      s"changelog checkpointing produced no .changelog files under $cp/state: $stateFiles")
  }

  /** File names under a checkpoint's state dir — walk stream CLOSED
    * (an unclosed Files.walk leaks directory handles for the JVM's
    * lifetime; on a loaded runner that compounds into fd exhaustion). */
  private def listStateFiles(cp: String): List[String] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(cp, "state"))
    try s.iterator().asScala.map(_.getFileName.toString).toList
    finally s.close()
  }

  test("weightedSample on a stream == on the batch (the deterministic filter is batch-split-invariant)") {
    // The r9 weighted sampler is stateless, so it runs on a stream
    // unchanged — and because inclusion depends only on the row itself
    // (hash-vs-weight), the streamed selection across ANY micro-batch
    // split must equal the batch selection over the same rows.
    val ms = MemoryStream[Event](spark)
    val q = graft.queries.PipelineOps
      .weightedSample(ms.toDF(), "event_id", "value", 12)
      .writeStream.format("memory").queryName("wsample_par")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("wsample_par")
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    val batch = graft.queries.PipelineOps
      .weightedSample(miniEvents.toDF(), "event_id", "value", 12)
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(streamed === batch, s"stream/batch sample diverged: $streamed vs $batch")
    assert(batch.nonEmpty && batch.size < miniEvents.size,
      s"fixture sample is degenerate (all or nothing): $batch")
  }

  test("windowed leaderboard: streamed per-window user sums rank to the batch top-k (q_stream_topk's stage)") {
    // q_stream_topk's aggregation stage runs as a standard streaming
    // windowed agg (update mode); ranking the groups' final sums equals
    // the batch two-phase form — the leaderboard pattern end-to-end
    val ms = MemoryStream[Event](spark)
    val agg = withTs(ms.toDF())
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(graft.Det.dsum(col("value")).as("val"))
      .select(col("w.start").as("window_start"), col("user_id"), col("val"))
    val q = agg.writeStream.format("memory").queryName("topk_par")
      .outputMode("update").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // final state per (window, user) = the max update (decimal sums of
    // the all-positive fixture values only grow)
    val streamed = spark.table("topk_par")
      .groupBy(col("window_start"), col("user_id"))
      .agg(max(col("val")).as("val"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("val").desc, col("user_id").asc)
    val ranked = streamed.withColumn("rk", row_number().over(rw))
      .filter(col("rk") <= 3).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[Long]("user_id")) -> (r.getAs[Double]("val"), r.getAs[Int]("rk")))
      .toMap
    // batch truth: the same two-phase form over the full fixture
    val batchAgg = batchDf
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(graft.Det.dsum(col("value")).as("val"))
      .select(col("w.start").as("window_start"), col("user_id"), col("val"))
    val batch = batchAgg.withColumn("rk", row_number().over(rw))
      .filter(col("rk") <= 3).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[Long]("user_id")) -> (r.getAs[Double]("val"), r.getAs[Int]("rk")))
      .toMap
    assert(ranked === batch && ranked.nonEmpty)
  }

  test("warm start: batch-bootstrapped state + live stream == streaming the full history") {
    // the lambda handoff: fold history into per-key state in BATCH,
    // start the live stream FROM it, and land exactly where streaming
    // everything would have — including a gap that SPANS the handoff
    // (user 1's last historical id is 2; first live id is 5)
    def ev(id: Long, u: Long) = Event(id, min(id), u, "view", 1.0)
    val history = Seq(ev(1, 1), ev(2, 1), ev(4, 2))
    val live = Seq(ev(5, 1), ev(9, 1), ev(6, 2), ev(7, 2))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val boot = StreamOps.gapBootstrapState(
      s2.createDataset(history)(org.apache.spark.sql.Encoders.product[Event]))
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.gapAuditFrom(ms.toDS(), boot)
      .writeStream.format("memory").queryName("warmstart_par")
      .outputMode("update").start()
    try {
      live.grouped(2).foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val warm = s2.table("warmstart_par")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("n_gaps")).as("g"),
        max(col("missing_total")).as("m"), max(col("max_gap")).as("x"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // truth: the plain stateful audit over the FULL history in batch
    val full = StreamOps.gapAudit((history ++ live).toDS()).collect()
      .map(o => o.user_id -> ((o.n_events, o.n_gaps, o.missing_total, o.max_gap))).toMap
    assert(warm === full)
    // the handoff-spanning gap (2 -> 5) was seen exactly once
    assert(warm(1L) === ((4L, 2L, 5L, 3L)))
  }

  test("warm start survives a checkpoint restart without re-applying the bootstrap") {
    // initial state must seed each key ONCE EVER — a restart recovers
    // from the checkpoint, and re-running handleInitialState there
    // would double-count the bootstrapped history
    def ev(id: Long, u: Long) = Event(id, min(id), u, "view", 1.0)
    val history = Seq(ev(1, 1), ev(2, 1))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val boot = StreamOps.gapBootstrapState(
      s2.createDataset(history)(org.apache.spark.sql.Encoders.product[Event]))
    val cp = Files.createTempDirectory("graft_warm_cp").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    val ms = MemoryStream[Event](s2)
    def start(): StreamingQuery = StreamOps.gapAuditFrom(ms.toDS(), boot)
      .writeStream
      .foreachBatch { (ds: Dataset[GapOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          buf ++= rows.map(o =>
            (o.user_id, o.n_events, o.n_gaps, o.missing_total, o.max_gap))
        }
        ()
      }
      .option("checkpointLocation", cp).outputMode("update").start()
    val q1 = start()
    try { ms.addData(Seq(ev(5, 1))); q1.processAllAvailable() }
    finally q1.stop()
    // bootstrap (ids 1,2) + live id 5: 3 events, one gap of 2
    assert(buf.synchronized(buf.last) === ((1L, 3L, 1L, 2L, 2L)))
    val q2 = start()
    try { ms.addData(Seq(ev(6, 1))); q2.processAllAvailable() }
    finally q2.stop()
    // after restart: id 6 continues 5 seamlessly — if the bootstrap
    // re-applied, n_events/missing would jump instead
    assert(buf.synchronized(buf.last) === ((1L, 4L, 1L, 2L, 2L)))
  }

  test("transformWithState MapState: per-type running counts == batch groupBy across a batch split") {
    // the MapState (sub-keyed view) shape of the new state API; counts
    // are order-insensitive so this pins the map semantics — point
    // updates per (key, type) accumulating across micro-batches
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.typeCountsTws(ms.toDS())
      .writeStream.format("memory").queryName("typecounts_par")
      .outputMode("update").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // counts only grow, so the final value per (user, type) is the max
    val streamed = s2.table("typecounts_par")
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("n")).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = miniEvents.groupBy(e => (e.user_id, e.event_type))
      .map { case (k, v) => k -> v.length.toLong }
    assert(streamed === batch && streamed.nonEmpty)
  }

  test("transformWithState ListState: rolling 3-event sum == batch ROWS frame across a batch split") {
    // the bounded-buffer (ListState) shape of the new state API: per
    // event, the decimal sum of the last <=3 values in event_id order,
    // against the batch rowsBetween(-2, 0) window frame
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.rollingSumTws(ms.toDS())
      .writeStream.format("memory").queryName("roll3_par")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = s2.table("roll3_par").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("roll3_val")).toMap
    // batch truth: decimal mov-3 sum over the same per-key event_id order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id").asc)
      .rowsBetween(-2, 0)
    val batch = miniEvents.toDF()
      .withColumn("roll3_val",
        round(sum(col("value").cast(graft.Det.Dec)).over(w), 4).cast("double"))
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("roll3_val")).toMap
    assert(streamed === batch && streamed.size === miniEvents.size)
  }

  test("transformWithState event-time timers: inactivity closes the session via the engine callback") {
    // the push-based half of the new state API: no later event of the
    // key arrives — the ENGINE's timer callback emits the closed
    // session once the watermark passes last-event + gap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.sessionTimerTws(ms.toDS())
      .writeStream.format("memory").queryName("timer_sess")
      .outputMode("append").start()
    try {
      // one open session for user 5 (events at 0 and 10min)
      ms.addData(Seq(Event(1, min(0), 5, "view", 1.0),
        Event(2, min(10), 5, "view", 2.5)))
      q.processAllAvailable()
      assert(s2.table("timer_sess").count() === 0) // watermark behind
      // a DIFFERENT key far ahead advances the watermark past
      // 10min + 30min; the next batch runs user 5's expired timer
      ms.addData(Seq(Event(3, min(120), 9, "view", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(4, min(130), 9, "view", 1.0)))
      q.processAllAvailable()
      val rows = s2.table("timer_sess").collect()
        .filter(_.getAs[Long]("user_id") == 5L)
        .map(r => (r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
          r.getAs[Long]("n_events"), r.getAs[Double]("v")))
      assert(rows.toSeq === Seq((min(0), min(40), 2L, 3.5)))
    } finally q.stop()
  }

  test("transformWithState timers: a later same-key event past the gap closes the session inline and re-opens") {
    // the other close path: the key's OWN next event exceeds the gap
    // before the timer fires — the old session must emit exactly once
    // (inline), its timer must be de-registered, and the new session
    // must still close via the timer later
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.sessionTimerTws(ms.toDS())
      .writeStream.format("memory").queryName("timer_sess2")
      .outputMode("append").start()
    try {
      ms.addData(Seq(Event(1, min(0), 5, "view", 1.0)))
      q.processAllAvailable()
      // 31min later (> 30min gap): closes [0, 30min) inline, re-opens
      ms.addData(Seq(Event(2, min(31), 5, "view", 2.0)))
      q.processAllAvailable()
      val inline = s2.table("timer_sess2").collect()
        .map(r => (r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
          r.getAs[Long]("n_events"), r.getAs[Double]("v")))
      assert(inline.toSeq === Seq((min(0), min(30), 1L, 1.0)))
      // advance the watermark far past 31min + 30min via another key:
      // the re-opened session closes via its (re-registered) timer,
      // and the old session's deleted timer never double-fires
      ms.addData(Seq(Event(3, min(180), 9, "view", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(4, min(190), 9, "view", 1.0)))
      q.processAllAvailable()
      val all = s2.table("timer_sess2").collect()
        .filter(_.getAs[Long]("user_id") == 5L)
        .map(r => (r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
          r.getAs[Long]("n_events"), r.getAs[Double]("v"))).sortBy(_._1)
      assert(all.toSeq === Seq((min(0), min(30), 1L, 1.0),
        (min(31), min(61), 1L, 2.0)))
    } finally q.stop()
  }

  test("chained stateful operators: dedup then tumbling agg in ONE streaming query == batch") {
    // Spark 4 runs multiple stateful operators in one append-mode
    // query: exact-duplicate removal (watermarked dropDuplicates)
    // feeding a tumbling count — the dedup-then-aggregate pipeline as
    // a single streaming dataflow, not two queries with a sink
    // between. Dedup key includes ts (exact dups only), so the kept
    // row's window — and the counts — are deterministic.
    val ms = MemoryStream[Event](spark)
    val chain = withTs(ms.toDF())
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type", "ts")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
    val q = chain.writeStream.format("memory").queryName("chain_par")
      .outputMode("append").start()
    try {
      // one micro-batch: the fixture's ts-out-of-order events (id 6/7
      // at min 0 AFTER id 4 at min 50) must not be late-dropped by the
      // dedup's watermark — the watermark only advances between
      // batches, so a single batch keeps them all; the late-drop
      // behavior itself is pinned by the dedicated watermark test
      ms.addData(miniEvents)
      q.processAllAvailable()
      // sentinel far ahead closes hour-0 and hour-1 windows
      ms.addData(Seq(Event(99, min(300), 99, "view", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(100, min(310), 99, "view", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("chain_par").collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime -> r.getAs[Long]("n"))
      .toMap
    // batch truth over the same fixture (no sentinel): the one exact
    // (user, type, ts) dup collapses; windows hour-0 = 7, hour-1 = 3
    val batch = batchDf.dropDuplicates("user_id", "event_type", "ts")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime -> r.getAs[Long]("n"))
      .toMap
    assert(batch.values.sum === 10L)
    assert(streamed === batch)
  }

  test("session windows close and emit in append mode once the watermark passes") {
    val ms = MemoryStream[Event](spark)
    val agg = StreamOps.session(
      withTs(ms.toDF()).withWatermark("ts", "10 minutes"))
    val q = agg.writeStream.format("memory").queryName("sess_wm")
      .outputMode("append").start()
    try {
      // one session: events at 0 and 10min (gap < 30) for user 5
      ms.addData(Seq(Event(1, min(0), 5, "view", 1.0),
        Event(2, min(10), 5, "view", 2.0)))
      q.processAllAvailable()
      // nothing can be final yet (watermark = 0min < session end 40min)
      assert(spark.table("sess_wm").count() === 0)
      // an event far ahead pushes the watermark past session end + gap
      ms.addData(Seq(Event(3, min(120), 5, "view", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(4, min(240), 5, "view", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess_wm")
      .select(col("session_start").cast("long"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the first session [0, 40min) closed with exactly its 2 events
    assert(rows(B / 1000000L) === 2L)
  }

  test("dropDuplicatesWithinWatermark: dedups inside the horizon, expires state after it") {
    val ms = MemoryStream[Event](spark)
    val dedup = withTs(ms.toDF())
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val q = dedup.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      // two duplicates 5min apart: second dropped
      ms.addData(Seq(Event(1, min(0), 9, "view", 1.0),
        Event(2, min(5), 9, "view", 1.0)))
      q.processAllAvailable()
      // 10h later: watermark has not yet passed the first entry's expiry
      // at batch start (wm = -25min), so this one is STILL deduped...
      ms.addData(Seq(Event(3, min(600), 9, "view", 1.0)))
      q.processAllAvailable()
      // ...but it advanced the watermark far past the expiry, so the
      // state is evicted and the key is re-admitted — bounded state is
      // the entire point of the watermarked variant.
      ms.addData(Seq(Event(4, min(1200), 9, "view", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("wm_dedup")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(emitted === Set(1L, 4L))
  }

  test("windowed aggregation state survives a checkpoint restart") {
    val dir = Files.createTempDirectory("graft_wm_sink").toString
    val cp = Files.createTempDirectory("graft_wm_cp").toString
    val sink = new IdempotentParquetSink(dir)
    val ms = MemoryStream[Event](spark)
    def start(): StreamingQuery =
      StreamOps.tumble(withTs(ms.toDF()))
        .writeStream
        .foreachBatch((df: Dataset[Row], id: Long) => sink.write(df, id))
        .outputMode("update")
        .option("checkpointLocation", cp).start()
    // 3 events in the [00:00, 01:00) window before the stop...
    val q1 = start()
    try {
      ms.addData(Seq(Event(1, min(5), 1, "view", 1.0),
        Event(2, min(10), 1, "view", 1.0), Event(3, min(20), 1, "view", 1.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    // ...2 more after the restart: the final update for that window must
    // say n=5, proving the aggregation state was restored, not reset.
    val q2 = start()
    try {
      ms.addData(Seq(Event(4, min(30), 1, "view", 1.0),
        Event(5, min(40), 1, "view", 1.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    val lastN = sink.readAll(spark)
      .filter(col("window_start").cast("long") === B / 1000000L)
      .orderBy(col("batch_id").desc)
      .select(col("n")).collect().head.getLong(0)
    assert(lastN === 5L)
  }

  test("END-TO-END: events stream → causal tracker → exactly-once sink, with restart, equals batch q_causal") {
    // The reference's whole identity in one pipeline: per-key causal
    // audit over an unbounded stream, surviving a failure/restart,
    // landing exactly-once, and agreeing with the SQL-oracle-checked
    // batch form on real data (sf0.001, 1000 events, 50 users).
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
      .collect().sortBy(_.event_id).toSeq
    val chunks = events.grouped(400).toSeq // 3 micro-batches
    val dir = Files.createTempDirectory("graft_e2e_sink").toString
    val cp = Files.createTempDirectory("graft_e2e_cp").toString
    val sink = new IdempotentParquetSink(dir)
    val ms = MemoryStream[Event](spark)
    def start(): StreamingQuery =
      StreamOps.causalTracker(ms.toDS())
        .writeStream
        .foreachBatch((df: Dataset[CausalOut], id: Long) => sink.write(df.toDF(), id))
        .outputMode("update")
        .option("checkpointLocation", cp).start()
    val q1 = start()
    try { ms.addData(chunks(0)); q1.processAllAvailable() } finally q1.stop() // "failure"
    val q2 = start() // restart from checkpoint: state must carry over
    try {
      ms.addData(chunks(1)); q2.processAllAvailable()
      ms.addData(chunks(2)); q2.processAllAvailable()
    } finally q2.stop()
    // latest emission per key across all epochs = final per-key totals
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("batch_id").desc)
    val streamed = sink.readAll(spark)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"), col("n_violations"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.queries.EventOps.queries("q_causal")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed === batch)
    assert(streamed.values.map(_._1).sum === 1000L)
  }

  test("streaming ingest dedup: stream-static hash probe == batch ingestDedup") {
    // The streaming form of q_llm_ingest: a document stream probed
    // against the static corpus content-hash set. ids 0/1 land in
    // corpus buckets (<8), 16/19 in batch buckets (8/9) — same planted
    // fixture as the batch PipelineOpsSuite test.
    val shared = "identical corpus content here"
    val all = Seq(
      (0L, shared), (1L, "other corpus text"),
      (16L, shared), (19L, "genuinely new content"))
    val allDf = all.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val corpusH = allDf
      .withColumn("bucket",
        graft.Det.md5h32(col("doc_id").cast("string")) % 10)
      .filter(col("bucket") < 8)
      .select(md5(col("text")).as("h0")).distinct()
    val ms = MemoryStream[(Long, String)](spark)
    val flags = ms.toDF().toDF("doc_id", "text")
      .withColumn("h", md5(col("text")))
      .join(broadcast(corpusH), col("h") === col("h0"), "left")
      .select(col("doc_id"), col("h0").isNotNull.cast("int").as("is_dup"))
    val q = flags.writeStream.format("memory").queryName("ingest_par")
      .outputMode("append").start()
    try {
      ms.addData(Seq((16L, shared)))
      q.processAllAvailable()
      ms.addData(Seq((19L, "genuinely new content")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ingest_par").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.queries.PipelineOps.ingestDedup(allDf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("is_dup")).toMap
    assert(streamed === batch)
    assert(batch === Map(16L -> 1, 19L -> 0))
  }

  test("merged streams: union of two sources preserves per-key causal semantics (the reference's stream merge)") {
    // The reference's merge model (SURVEY §1.1): keys are partitioned
    // across sources — every key's events arrive via ONE stream, in that
    // stream's order — and the merge must preserve per-key processing
    // without imposing any global order across sources. Here user 1
    // rides source A and user 2 source B, fed in alternating
    // micro-batches; the unioned stream's causal audit must equal the
    // single-source batch evaluation over everything.
    val msA = MemoryStream[Event](spark)
    val msB = MemoryStream[Event](spark)
    val q = StreamOps.causalTracker(msA.toDS().union(msB.toDS()))
      .writeStream.format("memory").queryName("merge_par")
      .outputMode("update").start()
    val (u1, u2) = miniEvents.partition(_.user_id == 1L)
    try {
      msA.addData(u1.take(3)); msB.addData(u2.take(2))
      q.processAllAvailable()
      msA.addData(u1.drop(3)); msB.addData(u2.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val merged = spark.table("merge_par")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("n_violations")).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = StreamOps.causalTracker(miniEvents.toDS())
      .collect().map(c => c.user_id -> (c.n_events, c.n_violations)).toMap
    assert(merged === batch && merged === Map(1L -> (5L, 1L), 2L -> (6L, 1L)))
  }

  test("sequence-gap audit: stream == batch == graded q_seq_gap; planted gaps counted") {
    // planted gaps: user 1 rides ids 1,2,5,9 (gaps 2 and 3); user 2
    // rides 4,6,7 (gap 1) — fed in per-key order across 2 batches
    def ev(id: Long, u: Long) = Event(id, min(id), u, "view", 1.0)
    val gapped = Seq(ev(1, 1), ev(2, 1), ev(4, 2), ev(5, 1), ev(9, 1), ev(6, 2), ev(7, 2))
    val expected = Map(1L -> (4L, 2L, 5L, 3L), 2L -> (3L, 1L, 1L, 1L))
    val batchOut = StreamOps.gapAudit(gapped.toDS()).collect()
      .map(o => o.user_id -> ((o.n_events, o.n_gaps, o.missing_total, o.max_gap))).toMap
    assert(batchOut === expected)
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.gapAudit(ms.toDS())
      .writeStream.format("memory").queryName("gap_par")
      .outputMode("update").start()
    try {
      ms.addData(gapped.take(3)); q.processAllAvailable()
      ms.addData(gapped.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("gap_par")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("n_gaps")).as("g"),
        max(col("missing_total")).as("m"), max(col("max_gap")).as("x"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(streamed === expected)
    // and the stateful function agrees with the graded batch query on
    // the full events table
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fn = StreamOps.gapAudit(events).collect()
      .map(o => o.user_id -> ((o.n_events, o.n_gaps, o.missing_total, o.max_gap))).toMap
    val graded = graft.queries.EventOps.queries("q_seq_gap")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_gaps"),
          r.getAs[Long]("missing_total"), r.getAs[Long]("max_gap")))).toMap
    assert(fn === graded && fn.nonEmpty)
  }

  test("gapsweep monitor (r17): per-key counters summed over users == graded q_event_gapsweep; boundaries carry across batches") {
    // batch evaluation of the stateful fold over the full sf0.001
    // events table must reproduce the graded 3-row sweep exactly
    val events = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fold = StreamOps.gapsweepMonitor(events).collect()
    val totals = Map(
      15L -> fold.map(_.s15).sum, 30L -> fold.map(_.s30).sum,
      60L -> fold.map(_.s60).sum)
    val nEv = fold.map(_.n_events).sum
    val graded = graft.queries.EventOps.queries("q_event_gapsweep")(
      spark, sf).collect()
      .map(r => r.getAs[Long]("gap_min") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))).toMap
    spark.catalog.clearCache()
    graded.foreach { case (m, (ne, ns)) =>
      assert(nEv === ne, s"event count drifted at $m")
      assert(totals(m) === ns, s"session count drifted at threshold $m")
    }
    // a session boundary straddling a micro-batch split: user 9's
    // 20-min and 45-min gaps arrive in three separate batches — the
    // carried last-ts must classify each gap exactly as in batch
    val B = 1704067200000000L
    val mini = Seq(Event(1, B, 9L, "view", 1.0),
      Event(2, B + 20L * 60000000L, 9L, "view", 1.0),
      Event(3, B + 65L * 60000000L, 9L, "view", 1.0))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.gapsweepMonitor(ms.toDS())
      .writeStream.format("memory").queryName("gapsw_par")
      .outputMode("update").start()
    try mini.grouped(1).foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val last = spark.table("gapsw_par").orderBy(col("n_events").desc)
      .collect()(0)
    assert((last.getAs[Long]("n_events"), last.getAs[Long]("s15"),
      last.getAs[Long]("s30"), last.getAs[Long]("s60"))
      === ((3L, 3L, 2L, 1L)),
      "cross-batch gap classification drifted")
  }

  test("retention tracker: O(1) mask state == graded q_event_retention, including an out-of-order cohort rebase") {
    def agg(rows: Seq[RetOut]): Map[(Long, Long), Long] =
      rows.flatMap(r => (0 to 3).filter(k => (r.mask & (1 << k)) != 0)
          .map(k => (r.cohort_us, k.toLong)))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // planted rebase: user 9's hour-2 event arrives BEFORE its hour-0
    // cohort event; the shift must relocate the hour-2 bit to offset 2
    val planted = Seq(
      Event(1, min(120), 9, "view", 1.0),  // hour 2 first
      Event(2, min(5), 9, "view", 1.0),    // hour 0 — rebases cohort
      Event(3, min(65), 9, "view", 1.0))   // hour 1
    val ms = MemoryStream[Event](spark)
    val buf = scala.collection.mutable.Map.empty[Long, RetOut]
    val q = StreamOps.retention(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[RetOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { rows.foreach(r => buf(r.user_id) = r) }
        ()
      }
      .outputMode("update").start()
    try {
      planted.grouped(1).foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = agg(buf.synchronized(buf.values.toSeq))
    // B is a whole hour, so user 9's cohort is exactly min(0)
    assert(streamed === Map((min(0), 0L) -> 1L, (min(0), 1L) -> 1L,
      (min(0), 2L) -> 1L))
    // full-table parity: batch evaluation of the same fold == the graded
    // query (cohort compared at µs = date_trunc('hour') equivalence)
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fn = agg(StreamOps.retention(events).collect().toSeq)
    val graded = graft.queries.EventOps.queries("q_event_retention")(spark, sf)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("cohort").getTime * 1000L,
        r.getAs[Long]("k")) -> r.getAs[Long]("n_users")).toMap
    assert(fn === graded && fn.nonEmpty)
  }

  test("path tracker: stream == batch == graded q_event_paths transition counts") {
    // per-key transitions of miniEvents in event_id order:
    // user 1: click→view→click→click→purchase; user 2:
    // view→view→click→purchase→purchase→error — 9 steps total.
    val expected = Map(
      ("click", "click") -> 1L, ("click", "purchase") -> 2L,
      ("click", "view") -> 1L, ("purchase", "error") -> 1L,
      ("purchase", "purchase") -> 1L, ("view", "click") -> 2L,
      ("view", "view") -> 1L)
    def toCounts(rows: Array[PathStep]): Map[(String, String), Long] =
      rows.groupBy(p => (p.prev_type, p.next_type))
        .map { case (k, v) => k -> v.length.toLong }
    val batchOut = toCounts(StreamOps.paths(miniEvents.toDS()).collect())
    assert(batchOut === expected)
    // stream: same function over 3 micro-batches; state (one last-type
    // row per key) carries transitions across the batch boundary, and
    // each step is emitted exactly once
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.paths(ms.toDS())
      .writeStream.format("memory").queryName("paths_par")
      .outputMode("update").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("paths_par")
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === expected)
    // and the stateful extraction aggregates to the graded corpus query
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fn = toCounts(StreamOps.paths(events).collect())
    val graded = graft.queries.EventOps.queries("q_event_paths")(spark, sf)
      .collect().map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("next_type")) -> r.getAs[Long]("n")).toMap
    assert(fn === graded && fn.nonEmpty)
  }

  test("second-order path tracker: stream == batch == graded q_event_markov2 trigram counts") {
    // miniEvents trigrams in event_id order — user 1:
    // click→view→click→click→purchase; user 2:
    // view→view→click→purchase→purchase→error — 7 trigrams total.
    val expected = Map(
      ("click", "view", "click") -> 1L, ("view", "click", "click") -> 1L,
      ("click", "click", "purchase") -> 1L, ("view", "view", "click") -> 1L,
      ("view", "click", "purchase") -> 1L,
      ("click", "purchase", "purchase") -> 1L,
      ("purchase", "purchase", "error") -> 1L)
    def toCounts(rows: Array[TrigramStep]): Map[(String, String, String), Long] =
      rows.groupBy(t => (t.prev2, t.prev1, t.next_type))
        .map { case (k, v) => k -> v.length.toLong }
    val batchOut = toCounts(StreamOps.paths2(miniEvents.toDS()).collect())
    assert(batchOut === expected)
    // stream: the two-slot state must carry trigrams across micro-batch
    // boundaries (a trigram spanning three batches still emits once)
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.paths2(ms.toDS())
      .writeStream.format("memory").queryName("paths2_par")
      .outputMode("update").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("paths2_par")
      .groupBy(col("prev2"), col("prev1"), col("next_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(streamed === expected)
    // and the stateful extraction aggregates to the graded corpus query
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fn = toCounts(StreamOps.paths2(events).collect())
    val graded = graft.queries.EventOps.queries("q_event_markov2")(spark, sf)
      .collect().map(r => (r.getAs[String]("prev2"), r.getAs[String]("prev1"),
        r.getAs[String]("next_type")) -> r.getAs[Long]("n")).toMap
    assert(fn === graded && fn.nonEmpty)
  }

  test("funnel tracker: stream == same function in batch == graded q_event_funnel; order-sensitivity preserved") {
    // mini-events funnel truth: user 1 has view@5, clicks@10/50, purchase@60
    // → full conversion; user 2 has views@0, click@29, purchases@55/60
    // → full conversion. Order-sensitivity is covered by the graded
    // query's own fixture test; here the STREAM must agree while
    // receiving the events split across 3 micro-batches.
    val expected = Map(1L -> ((1, 1, 1)), 2L -> ((1, 1, 1)))
    val batchOut = StreamOps.funnel(miniEvents.toDS()).collect()
      .map(o => o.user_id -> ((o.s_view, o.s_click, o.s_purchase))).toMap
    assert(batchOut === expected)
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.funnel(ms.toDS())
      .writeStream.format("memory").queryName("funnel_par")
      .outputMode("update").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    // update mode re-emits per batch; the LAST row per user is the final state
    val streamed = spark.table("funnel_par")
      .groupBy(col("user_id"))
      .agg(max(col("s_view")).as("v"), max(col("s_click")).as("c"),
        max(col("s_purchase")).as("p"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(streamed === expected)
    // and batch evaluation of the stateful function equals the graded
    // query on the full sf0.001 events table (every user, every flag)
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fn = StreamOps.funnel(events).collect()
      .map(o => o.user_id -> ((o.s_view, o.s_click, o.s_purchase))).toMap
    val graded = graft.queries.EventOps.queries("q_event_funnel")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("s_view"), r.getAs[Int]("s_click"),
          r.getAs[Int]("s_purchase")))).toMap
    spark.catalog.clearCache()
    assert(fn === graded && fn.nonEmpty)
  }

  test("funnel tracker contract is ONE-SIDED: a click arriving after its purchase was processed cannot resurrect it") {
    // The documented degradation under causal-delivery violation (the
    // same one-sided contract as dedupFirstArrival/asofEnrich): event
    // time says view@0 -> click@10 -> purchase@20 converts fully, and
    // batch evaluation sees exactly that; but if the click ARRIVES in a
    // later micro-batch than the purchase, the purchase was already
    // judged without a qualifying click and stays unconverted. This
    // pins that the scaladoc's delivery precondition is real, not
    // decorative.
    val evs = Seq(
      Event(1, min(0), 9L, "view", 1.0),
      Event(2, min(20), 9L, "purchase", 1.0),
      Event(3, min(10), 9L, "click", 1.0))
    val batchOut = StreamOps.funnel(evs.toDS()).collect()
      .map(o => o.user_id -> ((o.s_view, o.s_click, o.s_purchase))).toMap
    assert(batchOut === Map(9L -> ((1, 1, 1))), "single-group batch sees the full funnel")
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.funnel(ms.toDS())
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode("update").start()
    try {
      ms.addData(evs.take(2)); q.processAllAvailable() // view + purchase
      ms.addData(evs.drop(2)); q.processAllAvailable() // the late click
    } finally q.stop()
    val last = spark.table("funnel_ooo")
      .groupBy(col("user_id"))
      .agg(max(col("s_view")).as("v"), max(col("s_click")).as("c"),
        max(col("s_purchase")).as("p"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(last === Map(9L -> ((1, 1, 0))),
      "late click sets stage 2, but the already-processed purchase is not resurrected")
  }

  test("as-of enrichment: stream == same function in batch == expected on mini events") {
    val expected = Set(
      // user 1, purchase 5 @60min: latest click is 4 @50min
      (5L, 1L, min(60), Some(4L), Some(min(50)), Some(10L * 60000000L)),
      // user 2, purchases 9 @60min and 10 @55min: only click is 8 @29min
      (9L, 2L, min(60), Some(8L), Some(min(29)), Some(31L * 60000000L)),
      (10L, 2L, min(55), Some(8L), Some(min(29)), Some(26L * 60000000L)))
    val batchOut = StreamOps.asofEnrich(miniEvents.toDS()).collect()
      .map(o => (o.p_id, o.user_id, o.p_us, o.c_id, o.c_us, o.gap_us)).toSet
    assert(batchOut === expected)
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.asofEnrich(ms.toDS())
      .writeStream.format("memory").queryName("asof_par")
      .outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("asof_par").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    assert(streamed === expected)
  }

  test("as-of enrichment in batch mode == the graded q_join_asof on the full events table") {
    val events = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val fn = StreamOps.asofEnrich(events).collect()
      .map(o => (o.p_id, o.user_id, o.p_us, o.c_id, o.c_us, o.gap_us)).toSet
    val graded = graft.queries.CoreRelational.queries("q_join_asof")(spark, sf)
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("p_us"),
        Option(r.get(r.fieldIndex("c_id"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("c_us"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("gap_us"))).map(_.asInstanceOf[Long]))).toSet
    assert(fn === graded && fn.nonEmpty)
  }

  test("transformWithState as-of enrichment (r16): RocksDB stream == fMGWS twin == graded q_join_asof") {
    // The reference's core per-key causal pattern on the successor
    // state API: sf0.001 click/purchase events streamed in 3 ORDERED
    // micro-batches (global (ts, event_id) order implies the per-key
    // in-order delivery both twins contract on) through the TTL'd
    // ValueState processor under RocksDB; the appended enrichments
    // must equal the fMGWS twin's batch output AND the graded as-of
    // join.
    val all = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(e => (e.ts_us, e.event_id))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ProcessingTime mode (the TTL's requirement) re-triggers for state
    // cleanup — the dailyCountMonitorTws polling discipline applies
    type Row6 = (Long, Long, Long, Option[Long], Option[Long], Option[Long])
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row6]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.asofEnrichTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[AsofOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          buf ++= rows.map(o =>
            (o.p_id, o.user_id, o.p_us, o.c_id, o.c_us, o.gap_us))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsasof_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    val expected = StreamOps.asofEnrich(
      Tables.events(spark, sf)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value")).as[Event])
      .collect()
      .map(o => (o.p_id, o.user_id, o.p_us, o.c_id, o.c_us, o.gap_us)).toSet
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.size) < expected.size) {
        assert(System.nanoTime() < deadline,
          s"TWS enrichment never reached ${expected.size} rows: " +
            s"${buf.synchronized(buf.size)}")
        Thread.sleep(100)
      }
    } finally q.stop()
    val streamed = buf.synchronized(buf.toSeq).toSet
    assert(streamed === expected, "TWS stream != fMGWS twin")
    val graded = graft.queries.CoreRelational.queries("q_join_asof")(spark, sf)
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("p_us"),
        Option(r.get(r.fieldIndex("c_id"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("c_us"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("gap_us"))).map(_.asInstanceOf[Long]))).toSet
    spark.catalog.clearCache()
    assert(streamed === graded && streamed.nonEmpty,
      "TWS stream != graded q_join_asof")
  }

  test("transformWithState funnel (r17): RocksDB stream == fMGWS twin == graded q_event_funnel") {
    // Wave 2 of the successor-API ports: sf0.001 events streamed in 3
    // ORDERED micro-batches (global (ts, stage, event_id) order implies
    // the per-key in-order delivery the twin contracts on) through the
    // TTL'd ValueState processor under RocksDB; the last-write-wins
    // per-user flags must equal the fMGWS twin AND the graded query.
    def stageRank(t: String): Int =
      t match { case "view" => 0; case "click" => 1; case "purchase" => 2; case _ => 3 }
    val all = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
      .sortBy(e => (e.ts_us, stageRank(e.event_type), e.event_id))
    val graded = graft.queries.EventOps.queries("q_event_funnel")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("s_view"), r.getAs[Int]("s_click"),
          r.getAs[Int]("s_purchase")))).toMap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.Map.empty[Long, (Int, Int, Int)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.funnelTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[FunnelOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o =>
            buf(o.user_id) = ((o.s_view, o.s_click, o.s_purchase)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsfunnel_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != graded) {
        assert(System.nanoTime() < deadline,
          s"TWS funnel never converged: ${buf.synchronized(buf.size)} " +
            s"users vs ${graded.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
    // and the fMGWS twin agrees on the identical input
    val evDs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fmgws = StreamOps.funnel(evDs).collect()
      .map(o => o.user_id -> ((o.s_view, o.s_click, o.s_purchase))).toMap
    spark.catalog.clearCache()
    assert(fmgws === graded && graded.nonEmpty)
  }

  test("transformWithState gap-sweep (r18): RocksDB stream == fMGWS twin == graded q_event_gapsweep totals; cross-batch straddle exact") {
    // Wave 3 of the successor-API ports: sf0.001 events streamed in 3
    // ORDERED micro-batches (global (ts, event_id) order implies the
    // per-key in-order delivery the twin contracts on) through the
    // TTL'd ValueState processor under RocksDB; last-write-wins
    // per-user counters must equal the fMGWS twin, and their sums the
    // graded 3-row sweep.
    val all = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
      .sortBy(e => (e.ts_us, e.event_id))
    val expected = StreamOps.gapsweepMonitor(
        spark.createDataset(all)).collect()
      .map(o => o.user_id -> ((o.n_events, o.s15, o.s30, o.s60))).toMap
    val graded = graft.queries.EventOps.queries("q_event_gapsweep")(
        spark, sf).collect()
      .map(r => r.getAs[Long]("gap_min") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))).toMap
    spark.catalog.clearCache()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.gapsweepTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[GapSweepOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o =>
            buf(o.user_id) = ((o.n_events, o.s15, o.s30, o.s60)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsgapsw_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS gap-sweep never converged: ${buf.synchronized(buf.size)} " +
            s"users vs ${expected.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
    val streamed = buf.synchronized(buf.toMap)
    assert(streamed === expected && streamed.nonEmpty,
      "TWS stream != fMGWS twin")
    // summing the per-user counters reproduces the graded 3-row sweep
    graded.foreach { case (m, (ne, ns)) =>
      assert(streamed.values.map(_._1).sum === ne,
        s"event count drifted at threshold $m")
      val got = m match {
        case 15L => streamed.values.map(_._2).sum
        case 30L => streamed.values.map(_._3).sum
        case 60L => streamed.values.map(_._4).sum
      }
      assert(got === ns, s"session count drifted at threshold $m")
    }
    // a session boundary straddling a micro-batch split under TWS:
    // user 9's 20-min and 45-min gaps arrive in three batches — the
    // carried last-ts must classify each gap exactly as in batch
    val B = 1704067200000000L
    val mini = Seq(Event(1, B, 9L, "view", 1.0),
      Event(2, B + 20L * 60000000L, 9L, "view", 1.0),
      Event(3, B + 65L * 60000000L, 9L, "view", 1.0))
    val ms2 = MemoryStream[Event](s2)
    val buf2 = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    val q2 = StreamOps.gapsweepTws(ms2.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[GapSweepOut], _: Long) =>
        val rows = ds.collect()
        buf2.synchronized {
          rows.foreach(o =>
            buf2(o.user_id) = ((o.n_events, o.s15, o.s30, o.s60)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsgapsw2_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      mini.grouped(1).foreach(ms2.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf2.synchronized(buf2.get(9L)) != Some((3L, 3L, 2L, 1L))) {
        assert(System.nanoTime() < deadline,
          s"TWS straddle never converged: ${buf2.synchronized(buf2.toMap)}")
        Thread.sleep(100)
      }
    } finally q2.stop()
  }

  test("transformWithState streak (r19): RocksDB stream == fMGWS twin == graded q_event_streak; split streak extends across batches") {
    // Wave 4 of the successor-API ports: sf0.001 events streamed in 3
    // ORDERED micro-batches through the TTL'd ValueState processor
    // under RocksDB; last-write-wins per-user standings must equal the
    // fMGWS twin and therefore the graded gaps-and-islands query.
    val all = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
      .sortBy(e => (e.ts_us, e.event_id))
    val expected = StreamOps.streakMonitor(
        spark.createDataset(all)).collect()
      .map(o => o.user_id ->
        ((o.n_active_days, o.longest_streak, o.current_streak))).toMap
    val graded = graft.queries.EventOps.queries("q_event_streak")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    spark.catalog.clearCache()
    assert(expected === graded && graded.nonEmpty,
      "fMGWS twin drifted from the graded query — fix that first")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.streakTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[StreakOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf(o.user_id) =
            ((o.n_active_days, o.longest_streak, o.current_streak)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsstreak_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS streak never converged: ${buf.synchronized(buf.size)} " +
            s"users vs ${expected.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
    // a streak split ACROSS batches under TWS: days 10,11 in batch 1
    // and 12 in batch 2 extend to current 3; the day-15 gap resets —
    // the carried (lastDay, current) must fold exactly as in batch
    val mini = Seq((10L, 1L), (11L, 2L), (12L, 3L), (15L, 4L)).map {
      case (day, id) => Event(id, day * 86400000000L + 5L, 7L, "view", 1.0)
    }
    val ms2 = MemoryStream[Event](s2)
    val buf2 = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val q2 = StreamOps.streakTws(ms2.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[StreakOut], _: Long) =>
        val rows = ds.collect()
        buf2.synchronized {
          rows.foreach(o => buf2(o.user_id) =
            ((o.n_active_days, o.longest_streak, o.current_streak)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsstreak2_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(mini.take(2), mini.slice(2, 3), mini.drop(3)).foreach(ms2.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf2.synchronized(buf2.get(7L)) != Some((4L, 3L, 1L))) {
        assert(System.nanoTime() < deadline,
          s"TWS streak straddle never converged: ${buf2.synchronized(buf2.toMap)}")
        Thread.sleep(100)
      }
    } finally q2.stop()
  }

  test("transformWithState attribution (r19): RocksDB stream == fMGWS twin == graded q_event_attrib; cross-batch touch carry exact") {
    // Wave 4, second member: Append-mode emissions — every purchase
    // credited exactly once, the carried touch surviving batch splits.
    val all = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
      .sortBy(e => (e.ts_us, e.event_id))
    val expected = StreamOps.attribMonitor(
        spark.createDataset(all)).collect()
      .map(o => o.event_id -> o.touch_type).toMap
    val graded = graft.queries.EventOps.queries("q_event_attrib")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(expected.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        === graded && graded.nonEmpty,
      "fMGWS twin drifted from the graded query — fix that first")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.Map.empty[Long, String]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.attribTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[AttribOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf(o.event_id) = o.touch_type)
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsattrib_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS attribution never converged: ${buf.synchronized(buf.size)} " +
            s"purchases vs ${expected.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
    // the carry across a batch split: a view in batch 1 credits the
    // purchase in batch 2; a purchase-first user is direct
    val mini = Seq(
      Event(1L, 10L, 7L, "view", 1.0), Event(2L, 20L, 8L, "purchase", 1.0),
      Event(3L, 30L, 7L, "purchase", 1.0), Event(4L, 40L, 7L, "purchase", 1.0))
    val ms2 = MemoryStream[Event](s2)
    val buf2 = scala.collection.mutable.Map.empty[Long, String]
    val q2 = StreamOps.attribTws(ms2.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[AttribOut], _: Long) =>
        val rows = ds.collect()
        buf2.synchronized {
          rows.foreach(o => buf2(o.event_id) = o.touch_type)
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsattrib2_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(mini.take(2), mini.drop(2)).foreach(ms2.addData(_))
      val want = Map(2L -> "direct", 3L -> "view", 4L -> "view")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf2.synchronized(buf2.toMap) != want) {
        assert(System.nanoTime() < deadline,
          s"TWS attrib straddle never converged: ${buf2.synchronized(buf2.toMap)}")
        Thread.sleep(100)
      }
    } finally q2.stop()
  }

  test("transformWithState attribution WINDOW (r20, ADVICE): a touch stale past the event-time window credits direct even when intervening purchases kept the state row alive") {
    // the r19 ADVICE failure mode: TTL refreshes on every st.update —
    // including purchase-only batches — so TTL alone never expires a
    // touch under steady traffic. The window is now measured from the
    // CARRIED touch timestamp: purchases inside 24h credit the touch,
    // a purchase 25h after the touch is direct, with the purchases
    // themselves being the only intervening activity.
    val hourUs = 3600L * 1000000L
    val evs = Seq(
      Event(1L, 0L, 7L, "click", 1.0),
      Event(2L, 1L * hourUs, 7L, "purchase", 1.0),   // inside: click
      Event(3L, 23L * hourUs, 7L, "purchase", 1.0),  // inside: click
      Event(4L, 25L * hourUs, 7L, "purchase", 1.0))  // stale: direct
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event](s2)
    val buf = scala.collection.mutable.Map.empty[Long, String]
    val q = StreamOps.attribTws(ms.toDS(),
        window = Some(java.time.Duration.ofHours(24)))
      .writeStream
      .foreachBatch { (ds: Dataset[AttribOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { rows.foreach(o => buf(o.event_id) = o.touch_type) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsattribw_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      // batch split between the in-window and stale purchases: the
      // touch TIMESTAMP must carry through RocksDB, not just the touch
      Seq(evs.take(2), evs.drop(2)).foreach(ms.addData(_))
      val want = Map(2L -> "click", 3L -> "click", 4L -> "direct")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != want) {
        assert(System.nanoTime() < deadline,
          s"windowed TWS attrib never converged: ${buf.synchronized(buf.toMap)}")
        Thread.sleep(100)
      }
    } finally q.stop()
    // the unwindowed twin credits the touch at ANY age — the split the
    // window parameter exists to express
    val twin = StreamOps.attribMonitor(spark.createDataset(evs)).collect()
      .map(o => o.event_id -> o.touch_type).toMap
    assert(twin === Map(2L -> "click", 3L -> "click", 4L -> "click"))
  }

  test("transformWithState funnel TTL: an idle part-way funnel expires and restarts from stage 0 (r17)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.funnelTws(ms.toDS(), java.time.Duration.ofSeconds(1))
      .writeStream
      .foreachBatch { (ds: Dataset[FunnelOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          buf ++= rows.map(o => (o.s_view, o.s_click, o.s_purchase))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsfunnelttl_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def awaitRows(k: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.size) < k) {
        assert(System.nanoTime() < deadline,
          s"sink never reached $k rows: ${buf.synchronized(buf.toSeq)}")
        Thread.sleep(50)
      }
    }
    try {
      ms.addData(Seq(Event(1, min(0), 7L, "view", 1.0),
        Event(2, min(10), 7L, "click", 1.0)))
      awaitRows(1) // warm: (1,1,0)
      Thread.sleep(5000) // the 1 s TTL lapses while user 7 idles
      ms.addData(Seq(Event(3, min(20), 7L, "purchase", 1.0)))
      awaitRows(2) // cold restart: purchase with no click is a no-op
      ms.addData(Seq(Event(4, min(30), 7L, "view", 1.0),
        Event(5, min(40), 7L, "click", 1.0),
        Event(6, min(50), 7L, "purchase", 1.0)))
      awaitRows(3) // fresh full funnel
    } finally q.stop()
    val rows = buf.synchronized(buf.toSeq)
    assert(rows === Seq((1, 1, 0), (0, 0, 0), (1, 1, 1)),
      s"TTL restart semantics drifted: $rows")
  }

  test("transformWithState paths (r17): RocksDB stream == fMGWS twin == graded q_event_paths transition counts") {
    val all = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(e => (e.ts_us, e.event_id))
    val evDs = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fmgws = StreamOps.paths(evDs).collect()
      .groupBy(p => (p.prev_type, p.next_type)).view
      .mapValues(_.length.toLong).toMap
    val graded = graft.queries.EventOps.queries("q_event_paths")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1))
        -> r.getAs[Long]("n")).toMap
    spark.catalog.clearCache()
    assert(fmgws === graded && graded.nonEmpty)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.pathsTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[PathStep], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { buf ++= rows.map(p => (p.prev_type, p.next_type)) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twspaths_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    val expectedSteps = fmgws.values.sum
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.size.toLong) < expectedSteps) {
        assert(System.nanoTime() < deadline,
          s"TWS paths never reached $expectedSteps steps: " +
            s"${buf.synchronized(buf.size)}")
        Thread.sleep(100)
      }
    } finally q.stop()
    val streamed = buf.synchronized(buf.toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(streamed === graded, "TWS paths != graded transition counts")
  }

  test("transformWithState paths TTL: an expired trailing type emits no transition on return (r17)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.pathsTws(ms.toDS(), java.time.Duration.ofSeconds(1))
      .writeStream
      .foreachBatch { (ds: Dataset[PathStep], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { buf ++= rows.map(p => (p.prev_type, p.next_type)) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twspathsttl_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def awaitSteps(k: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.size) < k) {
        assert(System.nanoTime() < deadline,
          s"sink never reached $k steps: ${buf.synchronized(buf.toSeq)}")
        Thread.sleep(50)
      }
    }
    try {
      ms.addData(Seq(Event(1, min(0), 7L, "view", 1.0),
        Event(2, min(10), 7L, "click", 1.0)))
      awaitSteps(1) // warm: view → click
      Thread.sleep(5000) // the 1 s TTL lapses while user 7 idles
      ms.addData(Seq(Event(3, min(20), 7L, "purchase", 1.0),
        Event(4, min(30), 7L, "view", 1.0)))
      awaitSteps(2) // cold: purchase emits NOTHING; purchase → view does
    } finally q.stop()
    val steps = buf.synchronized(buf.toSeq)
    assert(steps === Seq(("view", "click"), ("purchase", "view")),
      s"TTL cold-start semantics drifted: $steps")
  }

  test("transformWithState retention (r17): RocksDB stream == fMGWS twin == graded q_event_retention") {
    // The commutative fold needs NO ordering contract: arbitrary
    // thirds streamed through the TTL'd ValueState processor under
    // RocksDB; last-write-wins masks aggregated to (cohort, k,
    // n_users) must equal the graded query.
    def agg(rows: Seq[(Long, Int)]): Map[(Long, Long), Long] =
      rows.flatMap { case (cohort, mask) =>
        (0 to 3).filter(k => (mask & (1 << k)) != 0)
          .map(k => (cohort, k.toLong)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val all = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val graded = graft.queries.EventOps.queries("q_event_retention")(spark, sf)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("cohort").getTime * 1000L,
        r.getAs[Long]("k")) -> r.getAs[Long]("n_users")).toMap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.Map.empty[Long, (Long, Int)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.retentionTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[RetOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf(o.user_id) = ((o.cohort_us, o.mask)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsret_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (agg(buf.synchronized(buf.values.toSeq)) != graded) {
        assert(System.nanoTime() < deadline,
          s"TWS retention never converged to the graded cohort table")
        Thread.sleep(100)
      }
    } finally q.stop()
    // and the fMGWS twin agrees on the identical input
    val evDs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val fmgws = agg(StreamOps.retention(evDs).collect().toSeq
      .map(o => (o.cohort_us, o.mask)))
    spark.catalog.clearCache()
    assert(fmgws === graded && graded.nonEmpty)
  }

  test("transformWithState retention TTL: an expired user rebases as a fresh cohort on return (r17)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.retentionTws(ms.toDS(), java.time.Duration.ofSeconds(1))
      .writeStream
      .foreachBatch { (ds: Dataset[RetOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { buf ++= rows.map(o => (o.cohort_us, o.mask)) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsretttl_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def awaitRows(k: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.size) < k) {
        assert(System.nanoTime() < deadline,
          s"sink never reached $k rows: ${buf.synchronized(buf.toSeq)}")
        Thread.sleep(50)
      }
    }
    val HourUs = 3600000000L
    try {
      ms.addData(Seq(Event(1, 0L, 7L, "view", 1.0)))
      awaitRows(1) // cohort hour 0, mask 1
      Thread.sleep(5000) // the 1 s TTL lapses while user 7 idles
      ms.addData(Seq(Event(2, 2L * HourUs, 7L, "view", 1.0)))
      awaitRows(2) // expired: rebases as a FRESH cohort at hour 2
    } finally q.stop()
    val rows = buf.synchronized(buf.toSeq)
    assert(rows === Seq((0L, 1), (2L * HourUs, 1)),
      s"without expiry this would be (0, 0b101); got $rows")
  }

  test("transformWithState as-of TTL: an idle last-click expires; the purchase enriches NULL, a fresh click re-arms (r16)") {
    // The at-scale point of the TWS port: the store itself evicts a
    // dormant user's last click. A 1 s TTL + an idle wait makes the
    // next purchase enrich from cold (NULL), while a fresh click
    // afterwards re-arms enrichment.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    type Row6 = (Long, Long, Long, Option[Long], Option[Long], Option[Long])
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row6]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.asofEnrichTws(ms.toDS(),
        java.time.Duration.ofSeconds(1))
      .writeStream
      .foreachBatch { (ds: Dataset[AsofOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          buf ++= rows.map(o =>
            (o.p_id, o.user_id, o.p_us, o.c_id, o.c_us, o.gap_us))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsasofttl_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def awaitRows(k: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.size) < k) {
        assert(System.nanoTime() < deadline,
          s"sink never reached $k rows: ${buf.synchronized(buf.toSeq)}")
        Thread.sleep(50)
      }
    }
    try {
      ms.addData(Seq(Event(1, min(0), 7L, "click", 1.0),
        Event(2, min(10), 7L, "purchase", 1.0)))
      awaitRows(1) // warm: enriched by click 1
      Thread.sleep(5000) // let the 1 s TTL lapse while user 7 idles
      ms.addData(Seq(Event(3, min(20), 7L, "purchase", 1.0)))
      awaitRows(2) // cold: the expired click cannot enrich
      ms.addData(Seq(Event(4, min(30), 7L, "click", 1.0),
        Event(5, min(40), 7L, "purchase", 1.0)))
      awaitRows(3) // re-armed by click 4
    } finally q.stop()
    val rows = buf.synchronized(buf.toSeq).sortBy(_._1)
    assert(rows.map(r => (r._1, r._4)) ===
      Seq((2L, Some(1L)), (3L, None), (5L, Some(4L))),
      s"TTL expiry semantics drifted: $rows")
  }

  test("streaming near-dup ingest: LSH band probe == batch probe; copy hits all bands, unrelated doc none") {
    // Incremental NEAR-dup: new docs are minhash-banded per-row
    // (stateless) and probed against the static corpus band index.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"), // exact copy of 1
      (6L, "solo words nothing shared here at all"))
      .toDF("doc_id", "text")
    val index = graft.queries.LlmOps.minhashBands(corpus)
    val newDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta"), // copy → dup of 1,2
      (101L, "totally different fresh content words here"))
    val ms = MemoryStream[(Long, String)](spark)
    val probed = graft.streaming.StreamOps.neardupIngestProbe(
      ms.toDF().toDF("doc_id", "text"), index)
    val q = probed.writeStream.format("memory").queryName("neardup_ingest")
      .outputMode("append").start()
    try {
      ms.addData(Seq(newDocs.head))
      q.processAllAvailable()
      ms.addData(Seq(newDocs(1)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("neardup_ingest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // identical text ⇒ identical signature ⇒ ALL 8 bands collide,
    // against both copies in the corpus; the unrelated doc hits nothing
    assert(streamed.map(t => (t._1, t._2)).distinct.toSet ===
      Set((100L, 1L), (100L, 2L)))
    assert(streamed.filter(t => t._2 == 1L).map(_._3).sorted.toSeq ===
      (0 until graft.queries.LlmOps.Bands))
    // batch evaluation of the SAME call is identical row-for-row
    val batch = graft.streaming.StreamOps.neardupIngestProbe(
      newDocs.toDF("doc_id", "text"), index).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(streamed.sorted.toSeq === batch.sorted.toSeq)
  }

  test("streaming CDC ingest: chunk probe == batch probe; shifted copy collides, unrelated payload does not") {
    // the q_mm_cdc fixture generator: deterministic printable bytes
    def scrambled(tag: String, n: Int) = (1 to n).map(i =>
      (33 + (math.abs(s"$tag-$i".hashCode) % 90)).toChar).mkString
    val base = scrambled("cdc-ingest", 600)
    val corpus = Seq(
      (1L, base),
      (2L, scrambled("cdc-other", 500))) // unrelated standing doc
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
      .select("doc_id", "payload")
    val index = graft.streaming.StreamOps.cdcChunkIndex(corpus)
    val newDocs = Seq(
      (100L, "ZZZ" + base), // insertion-shifted copy of 1
      (101L, scrambled("cdc-novel", 400))) // unrelated upload
    val ms = MemoryStream[(Long, String)](spark)
    val probed = graft.streaming.StreamOps.cdcIngestProbe(
      ms.toDF().toDF("doc_id", "text")
        .withColumn("payload", col("text").cast("binary"))
        .select("doc_id", "payload"),
      index)
    val q = probed.writeStream.format("memory").queryName("cdc_ingest")
      .outputMode("append").start()
    try {
      ms.addData(Seq(newDocs.head))
      q.processAllAvailable()
      ms.addData(Seq(newDocs(1)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cdc_ingest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nominated = streamed.map(t => (t._1, t._2)).distinct.toSet
    // CDC realignment: the shifted copy shares chunks with its
    // original once boundaries resync past the insertion
    assert(nominated.contains((100L, 1L)),
      s"shifted copy missed its original: $nominated")
    // distinct scrambles share no content → no cross hits
    assert(!nominated.contains((100L, 2L)), s"false hit: $nominated")
    assert(!nominated.exists(_._1 == 101L),
      s"unrelated payload nominated: $nominated")
    // batch evaluation of the SAME call is identical row-for-row
    val batch = graft.streaming.StreamOps.cdcIngestProbe(
      newDocs.toDF("doc_id", "text")
        .withColumn("payload", col("text").cast("binary"))
        .select("doc_id", "payload"),
      index).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(streamed.sorted.toSeq === batch.sorted.toSeq)
    spark.catalog.clearCache()
  }

  test("streaming cross-kind CDC fold: maintained state == one-shot == graded q_mm_crosskind totals; same-batchId redelivery is a no-op (r19)") {
    val S = graft.streaming.StreamOps
    def asDocs(df: DataFrame) = df
      .withColumn("payload", col("text").cast("binary"))
      .filter(length(col("payload")) >= 1)
      .select(
        when(expr("CAST(conv(hex(substring(payload, 1, 1)), 16, 10) AS INT)")
          % 3 === 0, "image")
          .when(expr("CAST(conv(hex(substring(payload, 1, 1)), 16, 10) AS INT)")
            % 3 === 1, "audio")
          .otherwise("video").as("kind_stub"),
        col("payload"))
    // the graded documents table arrives in 2 micro-batches (odd/even
    // doc_id split — cross-kind chunks span the batches)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val stateDir = Files.createTempDirectory("xkind_state").toString
    val cp = Files.createTempDirectory("xkind_cp").toString
    val rows = docs.as[(Long, String)].collect().toSeq
    val batches = Seq(rows.filter(_._1 % 2 == 0), rows.filter(_._1 % 2 == 1))
    val ms = MemoryStream[(Long, String)](spark)
    val q = S.crosskindMaintainer(
        asDocs(ms.toDF().toDF("doc_id", "text")), stateDir)
      .option("checkpointLocation", cp).start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val state = S.crosskindState(spark, stateDir).get
    val streamTotals = S.crosskindTotals(state).collect()(0)
    // graded parity: the maintained state's decision fold == the
    // graded q_mm_crosskind one-shot over the same corpus
    val graded = graft.queries.MultimodalOps
      .queries("q_mm_crosskind")(spark, sf).collect()(0)
    spark.catalog.clearCache()
    assert(streamTotals.toSeq === graded.toSeq,
      s"stream ${streamTotals.toSeq} != graded ${graded.toSeq}")
    assert(streamTotals.getAs[Long]("n_chunks_xkind") > 0L,
      "fixture has no cross-kind chunk — the parity is vacuous")
    // same-batchId REDELIVERY: the marker guard makes the fold a no-op
    // (the copies-sum is NOT duplicate-proof, unlike CC — the guard is
    // the idempotence mechanism, so test it directly)
    val before = state.collect().map(_.toSeq).toSet
    S.crosskindFoldBatch(asDocs(batches(1).toDF("doc_id", "text")),
      1L, stateDir)
    val after = S.crosskindState(spark, stateDir).get
      .collect().map(_.toSeq).toSet
    assert(after === before, "redelivered batch mutated the state")
    // a FRESH batchId does fold — the guard is per delivery, not per
    // content: a novel payload adds its (kind, chunk) rows
    val novel = Seq((9999999L, "xkind novel growth probe payload"))
    S.crosskindFoldBatch(asDocs(novel.toDF("doc_id", "text")), 99L, stateDir)
    assert(S.crosskindState(spark, stateDir).get.count() > before.size,
      "fresh batch id did not fold")
    spark.catalog.clearCache()
  }

  test("cross-kind fold crash safety: the marker is the commit point — an unmarked state rewrite refolds from the prior commit; a marker without its parquet fails loudly (r20, ADVICE)") {
    val S = graft.streaming.StreamOps
    def asDocs(df: DataFrame) = df
      .withColumn("payload", col("text").cast("binary"))
      .select(lit("image").as("kind_stub"), col("payload"))
    val b0 = Seq((1L, "alpha shared content block one"),
      (2L, "beta payload two")).toDF("doc_id", "text")
    val b1 = Seq((3L, "alpha shared content block one"),
      (4L, "gamma payload four")).toDF("doc_id", "text")
    val fsDir = Files.createTempDirectory("xkind_crash").toString
    val dir = new org.apache.hadoop.fs.Path(fsDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // clean two-fold run = the expected end state
    val cleanDir = Files.createTempDirectory("xkind_clean").toString
    S.crosskindFoldBatch(asDocs(b0), 0L, cleanDir)
    S.crosskindFoldBatch(asDocs(b1), 1L, cleanDir)
    val expected = S.crosskindState(spark, cleanDir).get
      .collect().map(_.toSeq).toSet
    // crashed run: fold 0 commits, then batch 1 "crashes" AFTER its
    // state parquet is written but BEFORE the marker lands — simulated
    // by writing garbage to the versioned path with no marker
    S.crosskindFoldBatch(asDocs(b0), 0L, fsDir)
    Seq(("zz", 123L, 1L, 3L)).toDF("kind_stub", "h", "k_copies", "nb")
      .write.mode("overwrite").parquet(s"$fsDir/state-1")
    // the retry must IGNORE the unmarked state-1, refold batch 1 from
    // the batch-0 commit, and land on the clean-run state exactly
    S.crosskindFoldBatch(asDocs(b1), 1L, fsDir)
    val recovered = S.crosskindState(spark, fsDir).get
      .collect().map(_.toSeq).toSet
    assert(recovered === expected,
      "crash-window retry diverged from the clean two-fold run")
    assert(!recovered.exists(_.head == "zz"),
      "the pre-crash partial state leaked into the recovery")
    // marker WITHOUT a complete state parquet = corruption, never an
    // empty bootstrap: the read side (and thus the next fold) fails
    val corrupt = Files.createTempDirectory("xkind_corrupt").toString
    val cdir = new org.apache.hadoop.fs.Path(corrupt)
    fs.create(new org.apache.hadoop.fs.Path(cdir, "_folded_7")).close()
    val ex = intercept[IllegalStateException] {
      S.crosskindState(spark, corrupt)
    }
    assert(ex.getMessage.contains("corruption"))
    spark.catalog.clearCache()
  }

  test("cross-kind legacy layout migrates: a marker with only the pre-versioned state/ parquet reads it and the next fold rewrites versioned (r21, ADVICE)") {
    val S = graft.streaming.StreamOps
    def asDocs(df: DataFrame) = df
      .withColumn("payload", col("text").cast("binary"))
      .select(lit("image").as("kind_stub"), col("payload"))
    val b0 = Seq((1L, "alpha shared content block one"),
      (2L, "beta payload two")).toDF("doc_id", "text")
    val b1 = Seq((3L, "gamma payload three")).toDF("doc_id", "text")
    // clean versioned run = the expected end state after migration
    val cleanDir = Files.createTempDirectory("xkind_vclean").toString
    S.crosskindFoldBatch(asDocs(b0), 0L, cleanDir)
    val expect0 = S.crosskindState(spark, cleanDir).get
      .collect().map(_.toSeq).toSet
    S.crosskindFoldBatch(asDocs(b1), 1L, cleanDir)
    val expect1 = S.crosskindState(spark, cleanDir).get
      .collect().map(_.toSeq).toSet
    // fabricate the r19 LEGACY layout: unversioned state/ + _folded_0,
    // no state-0 path (what an upgraded deployment finds on disk)
    val legacyDir = Files.createTempDirectory("xkind_legacy").toString
    val ldir = new org.apache.hadoop.fs.Path(legacyDir)
    val lfs = ldir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    S.crosskindState(spark, cleanDir) // (cleanDir state-0 was superseded)
    spark.read.parquet(s"$cleanDir/state-1") // sanity: versioned exists
    // rebuild batch-0's state content under the legacy path
    val tmp0 = Files.createTempDirectory("xkind_b0").toString
    S.crosskindFoldBatch(asDocs(b0), 0L, tmp0)
    spark.read.parquet(s"$tmp0/state-0").write
      .mode("overwrite").parquet(s"$legacyDir/state")
    lfs.create(new org.apache.hadoop.fs.Path(ldir, "_folded_0")).close()
    // the read side must fall back to the legacy parquet, not corrupt
    val migratedRead = S.crosskindState(spark, legacyDir).get
      .collect().map(_.toSeq).toSet
    assert(migratedRead === expect0,
      "legacy state/ read diverged from the versioned batch-0 state")
    // the next fold reads legacy, writes VERSIONED, and matches the
    // clean two-fold run exactly
    S.crosskindFoldBatch(asDocs(b1), 1L, legacyDir)
    assert(lfs.exists(new org.apache.hadoop.fs.Path(ldir,
      "state-1/_SUCCESS")), "post-migration fold did not write versioned")
    val migrated = S.crosskindState(spark, legacyDir).get
      .collect().map(_.toSeq).toSet
    assert(migrated === expect1,
      "migrated fold diverged from the clean versioned run")
    spark.catalog.clearCache()
  }

  test("streaming winnow ingest: fingerprint probe == batch probe; shared-run doc nominates, unrelated and boilerplate-capped do not") {
    // winnow sibling of the LSH band probe: arriving docs sketch
    // stateless and stream-static join the capped posting index
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = ((1L to 55L).map(i => (i, s"$run unique$i")) ++ Seq(
      (200L, "one two three four five six seven eight nine ten eleven"),
      (201L, "completely separate corpus content with other tokens here")))
      .toDF("doc_id", "text")
    val index = graft.queries.LlmOps.winnowPostingIndex(corpus)
    val newDocs = Seq(
      // shares an 11-token run with 200 → guaranteed shared fingerprint
      (300L, "one two three four five six seven eight nine ten eleven plus tail"),
      (301L, "wholly novel text matching nothing in the standing corpus"),
      // the 55-doc boilerplate run: its fingerprint df = 55 > cap →
      // dropped from the index → must NOT nominate 55 candidates
      (302L, s"$run freshtoken"))
    val ms = MemoryStream[(Long, String)](spark)
    val probed = graft.streaming.StreamOps.winnowIngestProbe(
      ms.toDF().toDF("doc_id", "text"), index)
    val q = probed.writeStream.format("memory").queryName("winnow_ingest")
      .outputMode("append").start()
    try {
      ms.addData(newDocs)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("winnow_ingest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nominated = streamed.map(t => (t._1, t._2)).distinct.toSet
    assert(nominated.contains((300L, 200L)), "shared-run candidate missing")
    assert(!nominated.exists(_._1 == 301L), "novel doc nominated")
    // 302's run-fingerprint was capped out of the index; its unique
    // window-2 fp may survive in ≤ cap corpus docs, but the full 55-way
    // boilerplate fan-out must not happen
    assert(nominated.count(_._1 == 302L) <= graft.queries.LlmOps.WinnowMaxPosting,
      s"boilerplate fanned out: ${nominated.count(_._1 == 302L)}")
    // batch evaluation of the SAME call is identical row-for-row
    val batch = graft.streaming.StreamOps.winnowIngestProbe(
      newDocs.toDF("doc_id", "text"), index).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.sorted.toSeq === batch.sorted.toSeq)
    assert(streamed.nonEmpty)
    spark.catalog.clearCache()
  }

  test("streaming incremental CC: per-batch pair folds == batch ConnectedComponents == graded q_llm_cc labels") {
    // The pair→cluster decision, maintained incrementally (r12): the
    // graded near-dup pair graph arrives in 3 micro-batches; after each
    // fold the parquet state is a full (node, rep) assignment, and the
    // FINAL state must equal the batch operator over all pairs — label
    // values included — and therefore the graded q_llm_cc assignment.
    val pairs = graft.queries.LlmOps.queries("q_llm_neardup")(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(pairs.size > 10, s"fixture too small to exercise folding: ${pairs.size}")
    spark.catalog.clearCache() // release the neardup builder's persists
    val batches = pairs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1)) // deterministic 3-way interleave: clusters span batches
    val stateDir = Files.createTempDirectory("graft_cc_state").toString
    val cp = Files.createTempDirectory("graft_cc_cp").toString
    val ms = MemoryStream[(Long, Long)](spark)
    val q = graft.streaming.StreamOps.ccClusterMaintainer(
        ms.toDF().toDF("doc_a", "doc_b"), stateDir)
      .option("checkpointLocation", cp).start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      val mid = spark.read.parquet(stateDir).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rep")).toMap
      // idempotent redelivery: re-folding batch 2 must not move a label
      ms.addData(batches(1)); q.processAllAvailable()
      val fin = spark.read.parquet(stateDir).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rep")).toMap
      assert(fin === mid, "redelivered pairs moved cluster labels")
      val batch = graft.operators.ConnectedComponents.run(
          pairs.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rep")).toMap
      assert(fin === batch, "incremental fold diverged from batch CC")
      val graded = graft.queries.LlmOps.queries("q_llm_cc")(spark, sf)
        .select(col("doc_id"), col("rep")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      assert(fin === graded, "incremental fold diverged from graded q_llm_cc")
    } finally q.stop()
  }

  test("streaming bloom ingest prescreen == batch bloomPrefilter; dups always flagged, zero streaming state") {
    // The cheap FIRST screen of a real ingest tier: the corpus collapses
    // once to a Bloom sketch literal, each micro-batch probes it
    // statelessly. Verdict parity with the batch prescreen is row-exact.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "the quick brown fox jumps over dogs"),
      (3L, "solo words nothing shared here at all"))
      .toDF("doc_id", "text")
    val newDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta"), // planted dup
      (101L, "totally different fresh content words here"), // clean
      (102L, "the quick brown fox jumps over dogs"), // planted dup
      (103L, "another clean document with novel text")) // clean
    val ms = MemoryStream[(Long, String)](spark)
    val probed = graft.streaming.StreamOps.bloomIngestProbe(
      ms.toDF().toDF("doc_id", "text"), "text", corpus, "text", 1000L, 0.01)
    val q = probed.writeStream.format("memory").queryName("bloom_ingest")
      .outputMode("append").start()
    try {
      ms.addData(newDocs.take(2))
      q.processAllAvailable()
      ms.addData(newDocs.drop(2))
      q.processAllAvailable()
      // zero streaming state: the probe is a stateless projection —
      // no state store operator may appear in the running query
      assert(q.lastProgress.stateOperators.isEmpty,
        s"bloom probe grew streaming state: ${q.lastProgress.prettyJson}")
    } finally q.stop()
    val streamed = spark.table("bloom_ingest").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // no false negatives, micro-batch split notwithstanding
    assert(streamed(100L) && streamed(102L),
      s"planted dups missed by the stream screen: $streamed")
    // batch evaluation of the SAME screen via bloomPrefilter is
    // verdict-identical row-for-row (including any false positives —
    // both paths probe the identically-sized, identically-hashed sketch)
    val batch = graft.operators.ScaleOps.bloomPrefilter(
      corpus.select(col("text")), "text",
      newDocs.toDF("doc_id", "text"), "text", 1000L, 0.01)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(streamed === batch,
      s"stream screen diverged from batch: stream=$streamed batch=$batch")
  }

  test("streaming drift monitor: per-batch KS over accumulated state; final emission == batch ksDrift exactly") {
    import graft.streaming.{DriftRowIn, DriftOut}
    // g1 interleaves sides across batches; g2 stays ONE-SIDED until the
    // last batch (the mid-stream None contract), then completes.
    val b1 = Seq(DriftRowIn("g1", 1L, true), DriftRowIn("g1", 3L, false),
      DriftRowIn("g2", 10L, true))
    val b2 = Seq(DriftRowIn("g1", 2L, true), DriftRowIn("g1", 4L, false),
      DriftRowIn("g2", 11L, true))
    val b3 = Seq(DriftRowIn("g1", 2L, false), DriftRowIn("g1", 5L, true),
      DriftRowIn("g2", 12L, false))
    val ms = MemoryStream[DriftRowIn](spark)
    val q = graft.streaming.StreamOps.ksDriftMonitor(ms.toDS())
      .writeStream.format("memory").queryName("drift_mon")
      .outputMode("update").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      // one-sided g2 must emit None, not a throw or an x/0 artifact
      val early = spark.table("drift_mon").as[DriftOut].collect()
        .filter(o => o.grp == "g2").sortBy(o => o.n_a + o.n_b).head
      assert(early.ks_stat.isEmpty && early.ks_at.isEmpty &&
        early.n_a == 1L && early.n_b == 0L, s"$early")
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // the monitor emits once per (group, batch); the final emission per
    // group is the one with the largest ingested count (monotone)
    val fin = spark.table("drift_mon").as[DriftOut].collect()
      .groupBy(_.grp).map { case (g, os) => g -> os.maxBy(o => o.n_a + o.n_b) }
    val batch = graft.operators.Drift.ksDrift(
        (b1 ++ b2 ++ b3).toDF("grp", "v", "a"), Seq("grp"), "v", col("a"))
      .collect().map { r =>
        r.getAs[String]("grp") ->
          ((Option(r.getAs[Any]("ks_stat")), Option(r.getAs[Any]("ks_at")),
            r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      }.toMap
    assert(fin.keySet == batch.keySet)
    fin.foreach { case (g, o) =>
      // EXACT double equality: both sides run the same IEEE program
      assert((o.ks_stat, o.ks_at, o.n_a, o.n_b) === batch(g),
        s"group $g: stream $o vs batch ${batch(g)}")
    }
  }

  test("stream-static join: stream enriched against a static dimension == batch join") {
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val ms = MemoryStream[Event](spark)
    val joined = withTs(ms.toDF()).join(broadcast(dim), Seq("user_id"))
      .select(col("event_id"), col("segment"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("ss_join").as[(Long, String)].collect().toSet
    val batch = batchDf.join(dim, Seq("user_id"))
      .select(col("event_id"), col("segment")).as[(Long, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 11)
  }

  test("stream-stream interval join: two watermarked streams == batch range join") {
    val msC = MemoryStream[Event](spark)
    val msP = MemoryStream[Event](spark)
    val joined = StreamOps.clickPurchaseIntervalJoin(
      withTs(msC.toDF()), withTs(msP.toDF()))
    val q = joined.writeStream.format("memory").queryName("iv_join")
      .outputMode("append").start()
    // both streams receive the full fixture; the op filters each side
    try batches.foreach { b => msC.addData(b); msP.addData(b); q.processAllAvailable() }
    finally q.stop()
    val pick = (df: DataFrame) => df
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .as[(Long, Long, Long)].collect().toSet
    val streamed = pick(spark.table("iv_join"))
    val batch = pick(StreamOps.clickPurchaseIntervalJoin(batchDf, batchDf))
    assert(streamed === batch)
    // fixture truth: user 1 click@50 -> purchase@60 (10min); user 2
    // click@29 -> purchase@55 (26min); purchase@60 is 31min after the
    // click — outside the 30min horizon. Clicks at 5/10 are too old.
    assert(streamed === Set((1L, 4L, 5L), (2L, 8L, 10L)))
  }

  test("stream-stream interval join: watermark evicts click state, late purchase finds no match") {
    // The scale contract of the join is that buffered state is BOUNDED
    // by watermark + horizon — pinned here by observing its consequence:
    // once the watermark has passed a click's join window, a late
    // matching purchase produces NO pair (the state is gone). Note the
    // inverse is deliberately NOT asserted: Spark may still match late
    // rows that arrive in the SAME micro-batch (watermarks bound state,
    // they do not censor intra-batch matches).
    val msC = MemoryStream[Event](spark)
    val msP = MemoryStream[Event](spark)
    val q = StreamOps.clickPurchaseIntervalJoin(
        withTs(msC.toDF()), withTs(msP.toDF()))
      .writeStream.format("memory").queryName("iv_late")
      .outputMode("append").start()
    try {
      // the watermark of each side is computed AFTER its event-type
      // filter, so each side needs its own far-future event to advance:
      // global watermark = min(click wm 145, purchase wm 140) = 140
      val b1 = Seq(Event(1, min(0), 1, "click", 1.0),
        Event(2, min(10), 1, "purchase", 1.0),
        Event(6, min(20), 2, "click", 1.0), // no purchase yet
        Event(3, min(200), 99, "purchase", 1.0),
        Event(8, min(205), 98, "click", 1.0))
      msC.addData(b1); msP.addData(b1); q.processAllAvailable()
      // state eviction runs at END of a batch with the watermark set at
      // its START — push one filler batch so eviction executes under
      // watermark=140 and click@20 (window closed at min 50) is removed
      val filler = Seq(Event(7, min(210), 97, "click", 1.0))
      msC.addData(filler); msP.addData(filler); q.processAllAvailable()
      // user 2's purchase@45 is inside click@20's 30min window, but the
      // watermark (min 140) passed that window long ago — state evicted,
      // so this late arrival must produce nothing
      val b2 = Seq(Event(5, min(45), 2, "purchase", 1.0))
      msC.addData(b2); msP.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("iv_late")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 2L)), s"evicted state still matched: $out")
  }

  test("file-directory streaming source: parquet files dropped per micro-batch == batch through the gap audit") {
    // The closest IMPLEMENTABLE analog to the reference's external
    // ingress in a zero-egress sandbox (SURVEY §0): a deployed pipeline
    // tails a landing-zone directory — every new file is a new message
    // batch. readStream.parquet(dir) discovers files added AFTER the
    // query starts, so dropping one file per processAllAvailable gives
    // three real micro-batches through the same stateful tracker the
    // MemoryStream tests exercise, closing the gap between "MemoryStream
    // proves semantics" and "a file source feeds the tracker".
    val landing = Files.createTempDirectory("graft_filesrc").toString
    val stage = Files.createTempDirectory("graft_filesrc_stage")
    val cp = Files.createTempDirectory("graft_filesrc_cp").toString
    def drop(i: Int, evs: Seq[Event]): Unit = {
      // write via a staging dir, then move the single part file in: the
      // landing zone must only ever contain COMPLETE files (the file
      // source has no notion of in-progress writes — same discipline a
      // real landing-zone producer follows)
      val tmp = stage.resolve(s"b$i").toString
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(landing, f"batch_$i%03d.parquet"))
      ()
    }
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
      .option("maxFilesPerTrigger", "1") // at scale: bound a micro-batch
      .parquet(landing)
      .as[Event]
    val q = StreamOps.gapAudit(src)
      .writeStream.format("memory").queryName("filesrc_gap")
      .option("checkpointLocation", cp).outputMode("update").start()
    try batches.zipWithIndex.foreach { case (b, i) =>
      drop(i, b); q.processAllAvailable()
    } finally q.stop()
    // last update per key wins; every tracked quantity is monotone
    val streamOut = spark.table("filesrc_gap")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("n_gaps")).as("g"),
        max(col("missing_total")).as("m"), max(col("max_gap")).as("x"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val batchOut = StreamOps.gapAudit(miniEvents.toDS()).collect()
      .map(o => o.user_id -> (o.n_events, o.n_gaps, o.missing_total, o.max_gap))
      .toMap
    assert(streamOut === batchOut, "file-source stream diverged from batch")
    assert(streamOut.nonEmpty)
  }

  test("file-directory streaming sink: parquet append lands every row exactly once across a restart (_spark_metadata log)") {
    // The OUT half of the landing-zone story: Spark's file sink commits
    // each micro-batch into the _spark_metadata transaction log, and
    // readers resolve the directory THROUGH that log — files from an
    // uncommitted batch are invisible, so a crash/restart can never
    // double-land or half-land a batch. This is the built-in
    // exactly-once file path (complementing the custom foreachBatch
    // sinks that pin the semantics by hand).
    val out = Files.createTempDirectory("graft_filesink_out").toString
    val cp = Files.createTempDirectory("graft_filesink_cp").toString
    val ms = MemoryStream[Event](spark)
    def start(): StreamingQuery = withTs(ms.toDF())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).outputMode("append").start()
    val q1 = start()
    try { ms.addData(batches(0)); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the checkpoint, then land the remaining batches
    val q2 = start()
    try {
      ms.addData(batches(1)); q2.processAllAvailable()
      ms.addData(batches(2)); q2.processAllAvailable()
    } finally q2.stop()
    assert(new java.io.File(out, "_spark_metadata").exists,
      "file sink wrote no transaction log")
    val got = spark.read.parquet(out)
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    // exactly once: every event lands, none twice, across the restart
    assert(got === miniEvents.map(_.event_id).sorted,
      s"file sink lost or duplicated rows: $got")
  }

  test("transformWithState TTL: idle state is evicted by the store; a live key keeps accumulating") {
    // The state-expiry primitive that bounds state for an unbounded,
    // mostly-dormant key population: a TTL'd ValueState row reads as
    // absent once its processing-time TTL lapses — no timers, no
    // eviction code. Two deterministic scenarios (no race on batch
    // scheduling): a 10-minute TTL must NOT expire between two
    // back-to-back batches (count accumulates 1 → 2), and a 1 s TTL
    // MUST expire across a 5 s pause (count restarts at 1) — the 5×
    // ratio (widened from 500 ms/3 s in r9) keeps a stalled runner's
    // scheduling jitter well inside the margin on both sides.
    // NOTE: TimeMode.ProcessingTime keeps the micro-batch loop ticking
    // even with no new data (TTL bookkeeping), so processAllAvailable
    // never settles — the test paces the loop with a short trigger and
    // POLLS the sink buffer instead (input rows are the only thing that
    // can append to it).
    def run(ttl: java.time.Duration, pauseMs: Long): Seq[Long] = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val cp = Files.createTempDirectory("graft_ttl_cp").toString
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      val ms = MemoryStream[Event](s2)
      val q = StreamOps.ttlCount(ms.toDS(), ttl)
        .writeStream
        .foreachBatch { (ds: Dataset[TtlCountOut], _: Long) =>
          val rows = ds.collect()
          buf.synchronized { buf ++= rows.map(_.n) }
          ()
        }
        .option("checkpointLocation", cp).outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("100 milliseconds"))
        .start()
      def awaitRows(k: Int): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (buf.synchronized(buf.size) < k) {
          assert(System.nanoTime() < deadline,
            s"sink never reached $k rows: ${buf.synchronized(buf.toSeq)}")
          Thread.sleep(50)
        }
      }
      try {
        ms.addData(Seq(Event(1, min(0), 1, "view", 1.0)))
        awaitRows(1)
        if (pauseMs > 0) Thread.sleep(pauseMs)
        ms.addData(Seq(Event(2, min(1), 1, "view", 1.0)))
        awaitRows(2)
      } finally q.stop()
      buf.synchronized(buf.toSeq)
    }
    assert(run(java.time.Duration.ofMinutes(10), 0) === Seq(1L, 2L),
      "state expired within its TTL — accumulation broken")
    assert(run(java.time.Duration.ofSeconds(1), 5000) === Seq(1L, 1L),
      "state survived past its TTL — eviction broken")
  }

  test("KMV tracker: stream across batches == batch sketch; duplicates and replays never perturb") {
    val k = 64
    // 500 users over 2 types; batch 2 REPLAYS the first 50 events
    // (at-least-once delivery) — a set-function sketch must not move.
    val evs = (1 to 500).map(i => Event(i, min(i % 60), i.toLong,
      if (i % 2 == 0) "click" else "view", 1.0))
    val sliced = Seq(evs.take(200), evs.slice(200, 400) ++ evs.take(50),
      evs.drop(400))
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.kmvMonitor(ms.toDS(), k)
      .writeStream.format("memory").queryName("kmv_par")
      .outputMode("update").start()
    try sliced.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    // final readout per type: n_bot is nondecreasing and h_k
    // nonincreasing over batches, so the last emission is the
    // (max n_bot, min h_k) row.
    val fin = spark.table("kmv_par").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.minBy(t => (-t._2, t._3))).toMap
    // batch twin: the graded engine over the same (type, user) rows
    val batch = graft.queries.Aggregates.kmvOn(
        evs.toDF().select(col("event_type").as("g"),
          col("user_id").cast("string").as("v")), k)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    for (tp <- Seq("click", "view")) {
      val (_, nBot, hk, est) = fin(tp)
      assert(nBot === k.toLong, s"$tp sketch not full at 250 distinct")
      assert((hk, est) === batch(tp),
        s"$tp stream (h_k, est) diverged from the batch sketch")
      // JVM replay: the same k-th minimum from a driver-side fold
      val ids = evs.filter(_.event_type == tp).map(_.user_id.toString)
      val hkJvm = ids.map(graft.Det.jvmMd5h32).distinct.sorted.apply(k - 1)
      assert(hk === hkJvm)
      assert(est === (k - 1).toLong * 4294967296L / hkJvm)
    }
  }

  test("CMS tracker: additive counters — stream across batches == JVM fold; probes never undercount") {
    val d = 4; val w = 16
    // skewed user stream: user 1 hot (60x), user 2 warm (25x), tail
    val evs = (1 to 100).map { i =>
      val u = if (i <= 60) 1L else if (i <= 85) 2L else (i + 100).toLong
      Event(i, min(i % 60), u, "click", 1.0)
    }
    val probes = Seq(1L, 2L, 999L) // hot, warm, never-seen
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.cmsMonitor(ms.toDS(), probes, d, w)
      .writeStream.format("memory").queryName("cms_par")
      .outputMode("update").start()
    try Seq(evs.take(40), evs.slice(40, 80), evs.drop(80))
      .foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    // final readout per probe = the row with max n (n is monotone)
    val fin = spark.table("cms_par").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    // JVM fold of the whole stream
    val ctr = scala.collection.mutable.Map[(Int, Long), Long]()
      .withDefaultValue(0L)
    for (e <- evs; i <- 0 until d)
      ctr((i, graft.Det.jvmMd5h32(s"$i#${e.user_id}") % w)) += 1
    val truth = evs.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    for (p <- probes) {
      val (_, n, est) = fin(p)
      assert(n === 100L, "final readout must cover the full stream")
      val expEst = (0 until d).map(i =>
        ctr((i, graft.Det.jvmMd5h32(s"$i#$p") % w))).min
      assert(est === expEst, s"probe $p diverged from the JVM fold")
      assert(est >= truth(p), s"probe $p undercounted")
    }
    // the hot probe's estimate dominates the warm one's (signal survives)
    assert(fin(1L)._3 > fin(2L)._3)
  }

  test("AMS tracker (r16): linear sketch folds across batches == the graded batch engine on the same prefix") {
    import org.apache.spark.sql.functions.lit
    val evs = (1 to 90).map { i =>
      val u = if (i <= 40) 1L else if (i <= 65) 2L else (i % 7 + 10).toLong
      Event(i, min(i % 60), if (i % 3 == 0) 7L else u,
        if (i % 2 == 0) "click" else "view", 1.0)
    }
    val ms = MemoryStream[Event](spark)
    val q = StreamOps.amsMonitor(ms.toDS())
      .writeStream.format("memory").queryName("ams_par")
      .outputMode("update").start()
    try Seq(evs.take(30), evs.slice(30, 70), evs.drop(70))
      .foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    // final readout per type = the row with max n (n is monotone)
    val fin = spark.table("ams_par").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    for (tp <- Seq("click", "view")) {
      val keys = evs.filter(_.event_type == tp)
      // the graded batch engine on the identical key multiset
      val batch = graft.queries.Aggregates.amsOn(
          keys.map(_.user_id).toDF("k"))
        .collect()(0)
      assert(fin(tp)._2 === keys.size.toLong)
      assert(fin(tp)._3 === batch.getAs[Long]("f2_est"),
        s"$tp: streaming fold != batch engine")
      // and the JVM fold mirror
      val z = (0 until 8).map(i => keys.map(e =>
        if (graft.Det.jvmMd5h32(s"$i#${e.user_id}") % 2 == 0) 1L
        else -1L).sum)
      assert(fin(tp)._3 === z.map(v => v * v).sum / 8)
    }
  }

  test("transformWithState KMV (r20, wave 5): RocksDB stream == fMGWS twin == graded kmvOn grain; a replayed slice never perturbs the set sketch") {
    val k = 64
    val evs = (1 to 500).map(i => Event(i, min(i % 60), i.toLong,
      if (i % 2 == 0) "click" else "view", 1.0))
    // the fMGWS twin's final standings (batch execution of the fold)
    val expected = StreamOps.kmvMonitor(spark.createDataset(evs), k)
      .collect().map(o => o.event_type -> ((o.n_bot, o.h_k, o.est))).toMap
    // anchored against the graded q_agg_kmv engine on the same rows
    val batch = graft.queries.Aggregates.kmvOn(
        evs.toDF().select(col("event_type").as("g"),
          col("user_id").cast("string").as("v")), k)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    spark.catalog.clearCache()
    for (tp <- Seq("click", "view"))
      assert((expected(tp)._2, expected(tp)._3) === batch(tp),
        s"$tp: fMGWS twin drifted from the graded engine — fix that first")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.kmvTws(ms.toDS(), k)
      .writeStream
      .foreachBatch { (ds: Dataset[KmvOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf(o.event_type) = ((o.n_bot, o.h_k, o.est)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twskmv_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      // 3 batches with an AT-LEAST-ONCE replay of the first 50 events
      // in batch 2 — the set function must land on the twin anyway
      Seq(evs.take(200), evs.slice(200, 400) ++ evs.take(50),
        evs.drop(400)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS KMV never converged: ${buf.synchronized(buf.toMap)}")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  test("transformWithState CMS (r20, wave 5): RocksDB stream == fMGWS twin across batch straddles; probes never undercount") {
    val d = 4; val w = 16
    val evs = (1 to 100).map { i =>
      val u = if (i <= 60) 1L else if (i <= 85) 2L else (i + 100).toLong
      Event(i, min(i % 60), u, "click", 1.0)
    }
    val probes = Seq(1L, 2L, 999L)
    val expected = StreamOps.cmsMonitor(
        spark.createDataset(evs), probes, d, w)
      .collect().map(o => (o.event_type, o.probe_user) -> ((o.n, o.est)))
      .toMap
    val truth = evs.groupBy(_.user_id).view.mapValues(_.size.toLong)
      .toMap.withDefaultValue(0L)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable
      .Map.empty[(String, Long), (Long, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.cmsTws(ms.toDS(), probes, d, w)
      .writeStream
      .foreachBatch { (ds: Dataset[CmsProbeOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o =>
            buf((o.event_type, o.probe_user)) = ((o.n, o.est)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twscms_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(evs.take(40), evs.slice(40, 80), evs.drop(80))
        .foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS CMS never converged: ${buf.synchronized(buf.toMap)}")
        Thread.sleep(100)
      }
    } finally q.stop()
    for (p <- probes)
      assert(expected(("click", p))._2 >= truth(p),
        s"probe $p undercounted — CMS one-sidedness broke")
  }

  test("transformWithState AMS (r20, wave 5 complete): RocksDB stream == fMGWS twin == graded amsOn grain across batch straddles") {
    val evs = (1 to 90).map { i =>
      val u = if (i <= 40) 1L else if (i <= 65) 2L else (i % 7 + 10).toLong
      Event(i, min(i % 60), if (i % 3 == 0) 7L else u,
        if (i % 2 == 0) "click" else "view", 1.0)
    }
    val expected = StreamOps.amsMonitor(spark.createDataset(evs))
      .collect().map(o => o.event_type -> ((o.n, o.f2_est))).toMap
    // anchored against the graded q_agg_ams engine on the same keys
    for (tp <- Seq("click", "view")) {
      val keys = evs.filter(_.event_type == tp)
      val batch = graft.queries.Aggregates.amsOn(
        keys.map(_.user_id).toDF("k")).collect()(0)
      assert(expected(tp)._2 === batch.getAs[Long]("f2_est"),
        s"$tp: fMGWS twin drifted from the graded engine — fix that first")
    }
    spark.catalog.clearCache()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.amsTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[AmsMonOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf(o.event_type) = ((o.n, o.f2_est)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsams_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(evs.take(30), evs.slice(30, 70), evs.drop(70))
        .foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS AMS never converged: ${buf.synchronized(buf.toMap)}")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  test("transformWithState causal audit (r20, wave 6): RocksDB stream == fMGWS twin == graded q_causal; violations survive batch straddles") {
    val all = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
      .sortBy(_.event_id)
    val expected = StreamOps.causalTracker(spark.createDataset(all))
      .collect().map(c => c.user_id -> ((c.n_events, c.n_violations)))
      .toMap
    val graded = graft.queries.EventOps.queries("q_causal")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    spark.catalog.clearCache()
    assert(expected === graded && graded.nonEmpty,
      "fMGWS twin drifted from the graded q_causal — fix that first")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.causalTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[CausalOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(c => buf(c.user_id) = ((c.n_events, c.n_violations)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twscausal_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      // arrival-order batches (event_id IS the arrival order): the
      // per-key max-ts watermark must straddle the splits for the
      // violation counts to land exactly
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS causal never converged: ${buf.synchronized(buf.size)} " +
            s"keys vs ${expected.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  test("transformWithState moments (r20, wave 6): RocksDB stream == fMGWS twin — exact BigInteger sums through string state, bitwise IEEE readout") {
    val evs = (1 to 240).map(i => Event(i, min(i % 60), (i % 5).toLong,
      "view", (i * 7 % 23) + i / 40.0))
    val expected = StreamOps.momentsMonitor(spark.createDataset(evs))
      .collect().map(o => o.user_id ->
        ((o.n, o.mean_cents, o.var_cents, o.skewness, o.kurtosis))).toMap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable
      .Map.empty[Long, (Long, Double, Double, Option[Double], Option[Double])]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.momentsTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[MomentsOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf(o.user_id) =
            ((o.n, o.mean_cents, o.var_cents, o.skewness, o.kurtosis)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsmom_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(evs.take(80), evs.slice(80, 160), evs.drop(160))
        .foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS moments never converged: ${buf.synchronized(buf.toMap)}")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  test("transformWithState bitmask (r20, wave 6): a deliberately SHUFFLED RocksDB replay lands bit-identical to the in-order fMGWS twin") {
    val evs = (1 to 300).map(i => Event(i, min(i * 37 % 300), (i % 7).toLong,
      "view", 1.0))
    val expected = StreamOps.bitmaskMonitor(spark.createDataset(evs))
      .collect().map(o => o.user_id ->
        ((o.hour_or, o.hour_xor, o.n_events, o.n_active_hours))).toMap
    // the OR/XOR fold is commutative AND associative: feed the stream
    // a hash-shuffled order across 3 batches and demand equality
    val shuffled = evs.sortBy(e => graft.Det.jvmMd5h32(e.event_id.toString))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable
      .Map.empty[Long, (Long, Long, Long, Int)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.bitmaskTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[BitmaskOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf(o.user_id) =
            ((o.hour_or, o.hour_xor, o.n_events, o.n_active_hours)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsbits_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(shuffled.take(100), shuffled.slice(100, 200), shuffled.drop(200))
        .foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toMap) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS bitmask never converged: ${buf.synchronized(buf.toMap)}")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  test("transformWithState inter-arrival feed (r20, wave 6): Append emissions == the fMGWS twin's multiset across batch straddles") {
    val evs = (1 to 120).map(i => Event(i, min(i * 13 % 240),
      (i % 4).toLong, if (i % 3 == 0) "click" else "view", 1.0))
      .sortBy(e => (e.ts_us, e.event_id))
    val expected = StreamOps.timeGapMonitor(spark.createDataset(evs))
      .collect().map(o => (o.user_id, o.event_type, o.gap_us)).sorted.toSeq
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.timeGapTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[TimeGapOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf += ((o.user_id, o.event_type, o.gap_us)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsgapfeed_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      // in-order batches (the ewma-class cross-batch contract); the
      // straddle: each batch's first gap reaches back into the
      // previous batch's carried last-timestamp
      Seq(evs.take(40), evs.slice(40, 80), evs.drop(80))
        .foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.sorted.toSeq) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS gap feed never converged: ${buf.synchronized(buf.size)} " +
            s"gaps vs ${expected.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  test("transformWithState new-vs-returning + lifetime (r20, wave 7): RocksDB streams == fMGWS twins across day straddles") {
    val dayUs = 86400000000L
    // 4 users over 6 days with returns and gaps; day boundaries
    // straddle the batch splits
    val evs = (1 to 96).map { i =>
      val u = (i % 4).toLong
      Event(i, (i / 4).toLong * (dayUs / 4) + u, u, "view", 1.0)
    }.sortBy(e => (e.ts_us, e.event_id))
    val expNew = StreamOps.newretMonitor(spark.createDataset(evs))
      .collect().map(o => (o.user_id, o.day_us, o.is_new)).toSet
    val expLife = StreamOps.lifetimeMonitor(spark.createDataset(evs))
      .collect().map(o => o.user_id -> ((o.first_day_us, o.lifetime_days)))
      .toMap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // new-vs-returning (Append: the emission set IS the feed)
    val bufN = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    val msN = MemoryStream[Event](s2)
    val qN = StreamOps.newretTws(msN.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[NewretOut], _: Long) =>
        val rows = ds.collect()
        bufN.synchronized {
          rows.foreach(o => bufN += ((o.user_id, o.day_us, o.is_new)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsnewret_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(evs.take(30), evs.slice(30, 70), evs.drop(70))
        .foreach(msN.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (bufN.synchronized(bufN.toSet) != expNew) {
        assert(System.nanoTime() < deadline,
          s"TWS newret never converged: ${bufN.synchronized(bufN.size)} " +
            s"rows vs ${expNew.size}")
        Thread.sleep(100)
      }
    } finally qN.stop()
    // lifetime (Update: last write per user is the standing)
    val bufL = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val msL = MemoryStream[Event](s2)
    val qL = StreamOps.lifetimeTws(msL.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[LifetimeOut], _: Long) =>
        val rows = ds.collect()
        bufL.synchronized {
          rows.foreach(o =>
            bufL(o.user_id) = ((o.first_day_us, o.lifetime_days)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twslife_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(evs.take(30), evs.slice(30, 70), evs.drop(70))
        .foreach(msL.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (bufL.synchronized(bufL.toMap) != expLife) {
        assert(System.nanoTime() < deadline,
          s"TWS lifetime never converged: ${bufL.synchronized(bufL.toMap)}")
        Thread.sleep(100)
      }
    } finally qL.stop()
  }

  test("transformWithState point-in-time enrichment (r20, wave 7): RocksDB stream == fMGWS twin on the graded events — changes before facts at equal microseconds") {
    val all = Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
      .sortBy(e => (e.ts_us, e.event_id))
    val expected = StreamOps.pitMonitor(spark.createDataset(all))
      .collect()
      .map(o => (o.user_id, o.p_id, o.p_us, o.ctx_attr, o.ctx_from_us,
        o.ctx_age_us)).toSet
    spark.catalog.clearCache()
    assert(expected.nonEmpty)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable
      .Set.empty[(Long, Long, Long, Option[String], Option[Long], Option[Long])]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.pitTws(ms.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[PitOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized {
          rows.foreach(o => buf += ((o.user_id, o.p_id, o.p_us, o.ctx_attr,
            o.ctx_from_us, o.ctx_age_us)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twspit_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach(ms.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.toSet) != expected) {
        assert(System.nanoTime() < deadline,
          s"TWS pit never converged: ${buf.synchronized(buf.size)} " +
            s"facts vs ${expected.size}")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  test("transformWithState gap-feed TTL (r20): an idle-expired key's return emits NO stale cross-idle gap — the cold-start direction") {
    // the documented feature of the timeGapTws port (vs the
    // never-expiring twin, which would emit the cross-idle gap):
    // state lapses after 1 s of PROCESSING-time idleness, so the
    // returning event starts cold and only the NEXT in-batch pair
    // emits
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[Event](s2)
    val q = StreamOps.timeGapTws(ms.toDS(),
        ttl = java.time.Duration.ofSeconds(1))
      .writeStream
      .foreachBatch { (ds: Dataset[TimeGapOut], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { buf ++= rows.map(o => (o.user_id, o.gap_us)) }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsgapttl_cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def awaitRows(k: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (buf.synchronized(buf.size) < k) {
        assert(System.nanoTime() < deadline,
          s"sink never reached $k rows: ${buf.synchronized(buf.toSeq)}")
        Thread.sleep(50)
      }
    }
    try {
      ms.addData(Seq(Event(1, min(0), 7L, "view", 1.0),
        Event(2, min(10), 7L, "view", 1.0)))
      awaitRows(1) // warm: one 10-minute gap
      Thread.sleep(5000) // the 1 s TTL lapses while user 7 idles
      ms.addData(Seq(Event(3, min(60), 7L, "view", 1.0),
        Event(4, min(65), 7L, "view", 1.0)))
      awaitRows(2) // cold: NO 50-min cross-idle gap; only the 5-min pair
    } finally q.stop()
    val rows = buf.synchronized(buf.toSeq)
    assert(rows === Seq((7L, 10L * 60000000L), (7L, 5L * 60000000L)),
      s"gap-feed TTL semantics drifted: $rows")
  }

  test("transformWithState windowed top-k + KS drift (r20, wave 7 complete): map-valued state round-trips RocksDB; standings and gauges == the fMGWS twins") {
    // leaderboard: 3 hour-windows, value sums forcing rank flips
    val evs = (1 to 120).map { i =>
      Event(i, (i % 3).toLong * 3600000000L + i * 1000L,
        (i % 5).toLong, "view", (i % 7) + 0.25)
    }
    val expTop = StreamOps.windowTopkMonitor(spark.createDataset(evs), 3)
      .collect().map(o => (o.window_us, o.rk) ->
        ((o.user_id, o.value, o.n_events))).toMap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val bufT = scala.collection.mutable
      .Map.empty[(Long, Int), (Long, Double, Long)]
    val msT = MemoryStream[Event](s2)
    val qT = StreamOps.windowTopkTws(msT.toDS(), 3)
      .writeStream
      .foreachBatch { (ds: Dataset[TopkOut], _: Long) =>
        val rows = ds.collect()
        bufT.synchronized {
          rows.foreach(o => bufT((o.window_us, o.rk)) =
            ((o.user_id, o.value, o.n_events)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twstopk_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(evs.take(40), evs.slice(40, 80), evs.drop(80))
        .foreach(msT.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (bufT.synchronized(bufT.toMap) != expTop) {
        assert(System.nanoTime() < deadline,
          s"TWS topk never converged: ${bufT.synchronized(bufT.toMap)}")
        Thread.sleep(100)
      }
    } finally qT.stop()
    // KS drift: two groups, one genuinely drifted
    val rows = (1 to 200).map { i =>
      val grp = if (i % 2 == 0) "stable" else "drift"
      val a = i % 4 < 2
      val v = if (grp == "stable" || a) (i % 10).toLong
        else (i % 10).toLong + 7L
      DriftRowIn(grp, v, a)
    }
    val expKs = StreamOps.ksDriftMonitor(spark.createDataset(rows))
      .collect().map(o => o.grp -> ((o.ks_stat, o.ks_at, o.n_a, o.n_b)))
      .toMap
    val bufK = scala.collection.mutable
      .Map.empty[String, (Option[Double], Option[Long], Long, Long)]
    val msK = MemoryStream[DriftRowIn](s2)
    val qK = StreamOps.ksDriftTws(msK.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[DriftOut], _: Long) =>
        val outRows = ds.collect()
        bufK.synchronized {
          outRows.foreach(o =>
            bufK(o.grp) = ((o.ks_stat, o.ks_at, o.n_a, o.n_b)))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_twsks_cp").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    try {
      Seq(rows.take(70), rows.slice(70, 140), rows.drop(140))
        .foreach(msK.addData(_))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (bufK.synchronized(bufK.toMap) != expKs) {
        assert(System.nanoTime() < deadline,
          s"TWS ksdrift never converged: ${bufK.synchronized(bufK.toMap)}")
        Thread.sleep(100)
      }
    } finally qK.stop()
    assert(expKs("drift")._1.exists(_ > expKs("stable")._1.getOrElse(1.0)),
      "the planted drift must out-score the stable group")
  }
}
