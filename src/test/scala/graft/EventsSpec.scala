package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.stream.Events

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
              value: Double, props: String)

class EventsSpec extends SparkSpec {

  /** Streaming file sources glob whole DIRECTORIES; stage the events table
    * alone so the other testdata tables don't pollute the stream. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def t(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  private val events = Seq(
    Ev(1, t(0), 1, "view", 1.0, """{"k": 1}"""),
    Ev(2, t(5), 1, "click", 2.0, """{"k": 2}"""),
    Ev(3, t(50), 1, "view", 3.0, """{"k": 3}"""),   // >30min gap -> new session
    Ev(4, t(12), 2, "purchase", 4.0, """{"k": 4}"""))

  test("parseProps yields a typed map; propK extracts the int") {
    val parsed = Events.parseProps(df(events))
    assert(parsed.select(element_at(col("props_map"), "k")).collect()
      .map(_.getString(0)).sorted === Array("1", "2", "3", "4"))
    assert(df(events).select(Events.propK(col("props"))).collect()
      .map(_.getLong(0)).sorted === Array(1L, 2L, 3L, 4L))
  }

  test("byType aggregates count/value/k per event type") {
    val r = Events.byType(df(events)).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2), x.getLong(3))).toMap
    assert(r("view") === ((2L, 4.0, 4L)))
    assert(r("purchase") === ((1L, 4.0, 4L)))
  }

  test("tumblingCounts buckets into 10-minute windows") {
    val w = Events.tumblingCounts(df(events)).orderBy("window_start").collect()
    assert(w.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L, 1L))
    assert(w(0).getAs[Timestamp]("window_start") === t(0))
    assert(w(0).getAs[Timestamp]("window_end") === t(10))
  }

  test("sessionize splits on the inactivity gap and measures duration") {
    val s = Events.sessionize(df(events), gapMinutes = 30)
      .orderBy("user_id", "session_start").collect()
    assert(s.length === 3)
    val u1 = s.filter(_.getAs[Long]("user_id") == 1)
    assert(u1.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L))
    assert(u1(0).getAs[Double]("duration_sec") === 300.0)
    assert(u1(1).getAs[Double]("duration_sec") === 0.0)
  }

  test("streaming tumbling counts (AvailableNow) match the batch twin") {
    val streamed = Events.streamingTumblingCounts(spark, eventsDir,
      watermark = "10 years") // keep every window in complete-ish mode
    val qname = "ev_windows_test"
    val q = streamed.writeStream
      .format("memory").queryName(qname)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(qname)
    val want = Events.tumblingCounts(graft.tables.Tables.events(spark, "/root/testdata/sf0.001"))
    // append mode emits only watermark-closed windows; with the huge
    // watermark nothing closes, so validate against processed state instead
    // via update-mode re-run below. Here just assert the stream ran clean.
    assert(q.exception.isEmpty)
    val q2 = Events.streamingTumblingCounts(spark, eventsDir,
        watermark = "1 minute").writeStream
      .format("memory").queryName(qname + "2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    val closed = spark.table(qname + "2")
    // all but the final in-flight window(s) must match batch exactly
    val batch = want.collect().map(r => r.getAs[Timestamp]("window_start") ->
      (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    val stream = closed.collect().map(r => r.getAs[Timestamp]("window_start") ->
      (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    assert(stream.nonEmpty)
    stream.foreach { case (k, v) => assert(batch(k) === v, s"window $k") }
  }

  test("stream-static broadcast enrichment matches the batch twin") {
    val dim = spark.range(0, 1000).select(col("id").as("user_id"),
      concat(lit("seg"), pmod(col("id"), lit(3))).as("segment"))
    val q = Events.streamingSegmentCounts(spark, eventsDir, dim,
        watermark = "1 minute").writeStream
      .format("memory").queryName("seg_counts_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty)
    val batch = Events.segmentCounts(
        graft.tables.Tables.events(spark, "/root/testdata/sf0.001"), dim)
      .collect()
      .map(r => (r.getString(0), r.getAs[Timestamp](1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val stream = spark.table("seg_counts_stream").collect()
      .map(r => (r.getString(0), r.getAs[Timestamp](1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // append mode emits only watermark-closed windows; each must equal batch
    assert(stream.nonEmpty)
    stream.foreach { case (k, v) => assert(batch(k) === v, s"key $k") }
  }

  test("streaming session_window matches the batch session_window groupBy") {
    val q = Events.streamingSessionWindow(spark, eventsDir,
        watermark = "1 minute").writeStream
      .format("memory").queryName("sess_win_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty)
    val stream = spark.table("sess_win_stream").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start")) ->
        ((r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events")))).toMap
    val batch = SparkEntry.queries("q130_session_window")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start")) ->
        ((r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events")))).toMap
    // append mode emits only watermark-closed sessions; every emitted one
    // must agree with the batch computation exactly
    assert(stream.nonEmpty)
    stream.foreach { case (k, v) => assert(batch(k) === v, s"session $k") }
  }

  test("streaming approx-distinct users matches the batch twin bit-for-bit") {
    val q = Events.streamingDistinctUsers(spark, eventsDir,
        watermark = "1 minute").writeStream
      .format("memory").queryName("ev_hll_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty)
    val stream = spark.table("ev_hll_test").collect()
      .map(r => r.getAs[Timestamp]("window_start") ->
        (r.getAs[Long]("approx_users"), r.getAs[Long]("n_events"))).toMap
    val batch = Events.distinctUsersPerWindow(
        graft.tables.Tables.events(spark, "/root/testdata/sf0.001")).collect()
      .map(r => r.getAs[Timestamp]("window_start") ->
        (r.getAs[Long]("approx_users"), r.getAs[Long]("n_events"))).toMap
    assert(stream.nonEmpty)
    // HLL++ merge is commutative: closed windows agree EXACTLY, not within
    // tolerance — the property that makes the sketch safe to re-aggregate
    stream.foreach { case (k, v) => assert(batch(k) === v, s"window $k") }
  }

  test("streaming funnel state machine matches the batch RANGE-frame funnel") {
    val q = Events.streamingFunnel(spark, eventsDir).writeStream
      .format("memory").queryName("ev_funnel_test")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty)
    // Update mode: the last emitted row per user is the final state
    val last = spark.table("ev_funnel_test").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
      .groupBy(_._1).map { case (_, v) => v.last }.toSeq
    val streamed = (last.count(_._2).toLong, last.count(_._3).toLong)
    val batch = Events.funnel(
      graft.tables.Tables.events(spark, "/root/testdata/sf0.001")).head()
    assert(streamed === ((batch.getLong(1), batch.getLong(2))),
      s"stream=$streamed batch=(${batch.getLong(1)}, ${batch.getLong(2)})")
    // per-user parity against the oracle-checked batch twin (q178): the
    // state machine's final flags equal the RANGE-frame flags ROW-FOR-ROW,
    // not just in aggregate — stream == twin here, twin == oracle there
    val twin = Events.funnelPerUser(
        graft.tables.Tables.events(spark, "/root/testdata/sf0.001")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
    assert(last.toSet === twin, "streaming final state diverged from funnelPerUser")
  }

  test("streaming session windows close and match batch session starts") {
    val q = Events.streamingSessionize(spark, eventsDir,
        gap = "30 minutes", watermark = "1 minute").writeStream
      .format("memory").queryName("ev_sessions_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty)
    val streamed = spark.table("ev_sessions_test")
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = Events.sessionize(
        graft.tables.Tables.events(spark, "/root/testdata/sf0.001"), 30)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    // every watermark-closed streaming session must exist identically in batch
    streamed.foreach(s => assert(batch.contains(s), s"session $s"))
  }

  test("custom-state sessionizer (flatMapGroupsWithState) matches batch sessions") {
    val q = Events.streamingSessionizeCustom(spark, eventsDir,
        gapMinutes = 30, watermark = "1 minute").writeStream
      .format("memory").queryName("ev_custom_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty, q.exception.toString)
    val streamed = spark.table("ev_custom_sessions")
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = Events.sessionize(
        graft.tables.Tables.events(spark, "/root/testdata/sf0.001"), 30)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    streamed.foreach(s => assert(batch.contains(s), s"session $s"))
  }

  test("streamToLake lands micro-batches as lake commits with a change feed") {
    val lake = new graft.tables.LakeTable(spark,
      java.nio.file.Files.createTempDirectory("graft-stream-lake").toString)
    val q = Events.streamToLake(spark, eventsDir, lake, "events_bronze")
    q.awaitTermination(120000)
    assert(q.exception.isEmpty)
    assert(lake.exists("events_bronze"))
    assert(lake.read("events_bronze").count() ===
      graft.tables.Tables.events(spark, "/root/testdata/sf0.001").count())
    val (ok, detail) = lake.validate("events_bronze")
    assert(ok, detail)
  }

  test("streaming dedup drops retransmitted events within the watermark") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-ev").toString
    val dup = events ++ events.take(2) // retransmit two events
    df(dup).withColumn("ts_ns", expr("CAST(unix_micros(ts) AS BIGINT) * 1000"))
      .drop("ts").withColumnRenamed("ts_ns", "ts")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    // readEventStream expects ns-long ts, which we just wrote
    val q = Events.streamingDedup(spark, dir).writeStream
      .format("memory").queryName("ev_dedup_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty)
    assert(spark.table("ev_dedup_test").count() === events.size)
  }

  test("transformWithState per-user quota matches the batch twin exactly") {
    val q = Events.streamingPerUserQuota(spark, eventsDir, maxPerDay = 3)
      .writeStream
      .format("memory").queryName("ev_quota")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty, q.exception.toString)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getLong(4))
    val streamed = spark.table("ev_quota")
      .select("user_id", "epoch_day", "ts", "event_type", "admitted_rank")
      .collect().map(key).toSet
    val batch = Events.perUserQuotaBatch(
        graft.tables.Tables.events(spark, "/root/testdata/sf0.001"), maxPerDay = 3)
      .select("user_id", "epoch_day", "ts", "event_type", "admitted_rank")
      .collect().map(key).toSet
    assert(streamed.nonEmpty)
    // quota is a hard cap and the admitted sets agree row-for-row
    assert(streamed === batch)
    val perDay = spark.table("ev_quota")
      .groupBy("user_id", "epoch_day").count().collect().map(_.getLong(2))
    assert(perDay.forall(_ <= 3))
  }
}
