package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.operators.EventWindowQueries

/** Replay-gated streaming semantics: convergence to batch, and the
  * watermark actually dropping late rows (SURVEY.md §2.3 S5). */
class EventStreamsSpec extends AnyFunSuite with SparkFixture {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("s23 snapshot-lineage stream: emissions equal the final live table; deletes never emitted") {
    import org.apache.spark.sql.functions._
    val streamed = rows(EventStreams.s23_stream_cdc_source(spark, sf0001))
    // the scenario's construction makes "everything the stream emitted"
    // equal "the rows live at the end" — both MOR deletes landed before
    // their targets' slices ever streamed
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s23_events"
    val batch = rows(spark.table(tgt)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.operators.RelationalQueries.r2(sum(col("value"))).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type")))
    assert(streamed === batch)
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
  }

  test("graft-cdc 'cdc' mode streams the changelog; readStream.table points DV'd tables here") {
    import org.apache.spark.sql.functions.col
    graft.GraftBootstrap.ensure(spark, sf0001)
    val cat = graft.GraftBootstrap.CatalogName
    val tgt = s"$cat.tmp.s23_cdcmode"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    spark.sql(
      s"""CREATE TABLE $tgt (id BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES ('graft.dml.mode'='merge-on-read',
         |  'graft.dml.key'='id')""".stripMargin)
    spark.sql(s"INSERT INTO $tgt SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    spark.sql(s"DELETE FROM $tgt WHERE id IN (3, 7)")
    // the V1 fallback refuses while DVs are live — and names the source
    val e = intercept[Exception](spark.readStream.table(tgt))
    assert(e.getMessage.contains("graft-cdc"), e.getMessage)
    // the cdc stream serves it: initial snapshot at head (deletes
    // applied) as inserts, then a live MOR DELETE arrives as deletes
    val name = s"s23_cdcmode_sink_${System.nanoTime()}"
    val q = spark.readStream.format("graft-cdc")
      .option("table", tgt).option("mode", "cdc").load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      spark.sql(s"DELETE FROM $tgt WHERE id = 4")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name)
      .select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    spark.catalog.dropTempView(name)
    val inserts = (0L until 10L).filterNot(Set(3L, 7L)).map((_, "insert")).toSet
    assert(out === inserts + ((4L, "delete")),
      s"initial snapshot (3,7 never emitted) + the live delete of 4; got $out")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
  }

  test("streaming tumbling window converges to the batch answer") {
    val streamed = rows(EventStreams.s01b_tumbling_stream(spark, sf0001))
    val batch = rows(EventWindowQueries.s01_tumbling_window(spark, sf0001))
    assert(streamed === batch)
  }

  test("s17 capped sessions: state machine converges to the batch gap+cap answer") {
    val streamed = rows(EventStreams.s17_stream_capped_sessions(spark, sf0001))
    val batch = rows(EventWindowQueries.q89_capped_sessions(spark, sf0001))
    assert(streamed === batch)
    // Sanity only: the FIXTURE never produces a 5-event burst inside
    // one gap window (max gap-session size is 2 at sf0.001), so the cap
    // branch is NOT exercised here — the differential test below and
    // the TestGroupState unit test cover it on synthetic bursts.
    assert(batch.map(_(3).asInstanceOf[Long]).forall(_ <= 5))
  }

  test("s17/s18 plans: ONE stateful operator each; s18 has no join operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    // s17: watermark -> state machine, nothing else stateful
    val s17lp = EventStreams.cappedSessionTransform(src.toDF())
      .queryExecution.analyzed.toString
    assert("FlatMapGroupsWithState".r.findAllIn(s17lp).size === 1,
      s"s17: expected exactly one stateful operator:\n$s17lp")
    assert(!s17lp.contains("Aggregate"),
      s"s17: sessionization regressed to an aggregation:\n$s17lp")
    // s18: the as-of join must live IN the state machine — a Join node
    // would mean the operator regressed to a buffered symmetric join
    val s18lp = EventStreams.temporalJoinTransform(src.toDF())
      .queryExecution.analyzed.toString
    assert("FlatMapGroupsWithState".r.findAllIn(s18lp).size === 1,
      s"s18: expected exactly one stateful operator:\n$s18lp")
    assert(!s18lp.contains("Join ") && !s18lp.contains("Aggregate"),
      s"s18: temporal join must be pure per-key state:\n$s18lp")
  }

  test("q89 batch cap splits a burst exactly like a driver-side reference (cap exercised)") {
    import java.time.LocalDateTime
    import spark.implicits._
    // 3 users: a 12-event burst (5/5/2 chunks), a burst broken by a
    // gap mid-way (4 then 3), and a singleton — covers split, gap reset
    // within an island sequence, and the no-split path.
    def t(sec: Long) = LocalDateTime.ofEpochSecond(1700000000L + sec, 0,
      java.time.ZoneOffset.UTC)
    val rowsIn = Seq.newBuilder[(Long, LocalDateTime, Long, String, Double)]
    var id = 0L
    (0 until 12).foreach { i => rowsIn += ((id, t(i * 30L), 1L,
      if (i % 2 == 0) "click" else "view", 1.5)); id += 1 }
    (0 until 4).foreach { i => rowsIn += ((id, t(i * 30L), 2L, "click", 2.0)); id += 1 }
    (0 until 3).foreach { i => rowsIn += ((id, t(700 + i * 30L), 2L, "view", 2.0)); id += 1 }
    rowsIn += ((id, t(0L), 3L, "error", 9.0)); id += 1
    val df = rowsIn.result()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .select($"event_id", $"ts".cast("timestamp_ntz").as("ts"),
        $"user_id", $"event_type", $"value")
    val got = EventWindowQueries.cappedSessions(df).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    // user 1: 12 events all within the gap -> ONE island, chunks 5/5/2;
    // user 2: island of 4 (under cap), gap >= 10 min, island of 3;
    // user 3: singleton
    assert(got === Seq((1L, 5L), (1L, 5L), (1L, 2L), (2L, 4L), (2L, 3L), (3L, 1L)))
    assert(got.count(_._2 == 5L) == 2, "the cap branch must actually split")
  }

  test("s17 state machine: cap splits a burst 5/5/2, gap closes, timeout flushes") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val cs = EventStreams.CappedSessions
    def ev(id: Long, sec: Long, typ: String = "click", v: Double = 1.0) =
      TsEvent(id, Timestamp.valueOf(java.time.LocalDateTime
        .ofEpochSecond(1700000000L + sec, 0, java.time.ZoneOffset.UTC)), 7L, typ, v)
    def freshState(open: Option[OpenChunk], timedOut: Boolean) =
      TestGroupState.create[OpenChunk](
        org.apache.spark.api.java.Optional.ofNullable(open.orNull),
        GroupStateTimeout.EventTimeTimeout, 0L,
        org.apache.spark.api.java.Optional.of(0L), timedOut)

    // a 12-event burst 1s apart: cap must split 5/5, leaving 2 open
    val burst = (0 until 12).map(i => ev(i.toLong, i.toLong,
      if (i % 2 == 0) "click" else "view"))
    val st = freshState(None, timedOut = false)
    val closed = cs.update(7L, burst.iterator, st).toSeq
    assert(closed.map(_.n_events) === Seq(5L, 5L))
    assert(closed.forall(_.n_types === 2L), "both types in every full chunk")
    assert(st.get.n === 2L, "2-event remainder stays open in state")

    // a gap ≥ 10 min closes the remainder even though it is under cap
    val st2 = freshState(Some(st.get), timedOut = false)
    val afterGap = cs.update(7L, Iterator(ev(99L, 12L + 600L)), st2).toSeq
    assert(afterGap.map(_.n_events) === Seq(2L))
    assert(st2.get.n === 1L)

    // the event-time timeout flushes the open chunk and clears state
    val st3 = freshState(Some(st2.get), timedOut = true)
    val flushed = cs.update(7L, Iterator.empty, st3).toSeq
    assert(flushed.map(_.n_events) === Seq(1L))
    assert(!st3.exists, "timed-out session must leave no state behind")
  }

  test("s18 temporal join: state machine equals the batch as-of join across batches") {
    val got = EventStreams.s18_stream_temporal_join(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    // batch reference: per fact, the dim (event_id % 10 == 0) row with
    // the greatest ts <= fact.ts for the same user — computed naively
    // on the driver (sf0.001 is small)
    val events = EventStreams.eventsFor(spark, sf0001)
    val dims = events.filter(e => e.event_id % 10 == 0)
      .groupBy(_.user_id).view.mapValues(_.sortBy(e => EventStreams.micros(e.ts))).toMap
    val expected = events.filter(e => e.event_id % 10 != 0)
      .map { f =>
        val best = dims.getOrElse(f.user_id, Seq.empty)
          .filter(d => EventStreams.micros(d.ts) <= EventStreams.micros(f.ts))
          .lastOption
        (f.event_id, f.user_id, best.map(_.event_id).getOrElse(-1L))
      }.sortBy(_._1)
    assert(got === expected)
    // non-vacuous both ways: some facts enriched, some pre-dim facts null
    assert(expected.exists(_._3 >= 0) && expected.exists(_._3 == -1L))
  }

  test("s18b out-of-order replay converges to the same as-of answer") {
    val ordered = EventStreams.s18_stream_temporal_join(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    val ooo = EventStreams.s18b_stream_temporal_join_ooo(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(ooo === ordered, "arrival order must not change the temporal join")
    // the perturbation is non-vacuous: the jittered order genuinely
    // inverts some pairs relative to event time
    val events = EventStreams.eventsFor(spark, sf0001)
    val perturbedTs = events
      .sortBy(e => (EventStreams.micros(e.ts) + EventStreams.oooJitter(e.event_id), e.event_id))
      .map(e => EventStreams.micros(e.ts))
    assert(perturbedTs.zip(perturbedTs.tail).exists { case (a, b) => a > b },
      "jitter must actually reorder the feed")
  }

  test("s18b plan: watermark above ONE stateful operator, still no join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val lp = EventStreams.temporalJoinOooTransform(src.toDF())
      .queryExecution.analyzed.toString
    assert("FlatMapGroupsWithState".r.findAllIn(lp).size === 1,
      s"s18b: expected exactly one stateful operator:\n$lp")
    assert(lp.contains("EventTimeWatermark"),
      s"s18b: the arrival buffer must ride a watermark:\n$lp")
    assert(!lp.contains("Join ") && !lp.contains("Aggregate"),
      s"s18b: temporal join must be pure per-key state:\n$lp")
  }

  test("s19 streaming rollup equals q94's batch maintenance on the same corpus") {
    val streamed = rows(EventStreams.s19_stream_incremental_rollup(spark, sf0001))
    val batch = rows(graft.operators.EngineQueries.q94_incremental_rollup(spark, sf0001))
    assert(streamed === batch)
    assert(streamed.size > 1, "multi-source fixture required for a non-vacuous gate")
  }

  test("s19 plan: batch partials are ONE aggregate — no window, no join, no corpus term") {
    import spark.implicits._
    val batch = Seq((1L, "web", "a b c"), (2L, "books", "d e"))
      .toDF("doc_id", "source", "text")
    val lp = EventStreams.s19Partials(batch).queryExecution.optimizedPlan.toString
    assert("Aggregate".r.findAllIn(lp).size === 1,
      s"s19: expected exactly one aggregate over the batch:\n$lp")
    assert(!lp.contains("Join ") && !lp.contains("Window"),
      s"s19: per-batch partials must not join or window:\n$lp")
  }

  test("s19 delta-merge is exactly-once: a crash-after-commit replay does not double-ADD") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.GraftBootstrap.ensure(spark, sf0001)
    val cat = graft.GraftBootstrap.CatalogName
    val tgt = s"$cat.tmp.s19_replay_stats"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    def partials(rows: (String, Long, Long)*) =
      rows.toDF("source", "n_docs", "n_tokens")
    partials().withColumn("last_batch_id", lit(-1L)).writeTo(tgt).create()
    def snapshot() = spark.table(tgt)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // batch 0 commits (MERGE lands), then the checkpoint write is lost:
    // foreachBatch re-delivers THE SAME batchId with the same data
    val b0 = partials(("web", 10L, 100L), ("books", 2L, 50L))
    EventStreams.s19MergeStats(spark, tgt, b0, 0L)
    val afterCommit = snapshot()
    assert(afterCommit === Seq(("books", 2L, 50L, 0L), ("web", 10L, 100L, 0L)))
    EventStreams.s19MergeStats(spark, tgt, b0, 0L) // the replay
    assert(snapshot() === afterCommit, "replayed batch must be a no-op (no double-ADD)")
    // the next REAL batch still applies — both the ADD arm and the
    // INSERT arm — and stamps its own batchId
    EventStreams.s19MergeStats(spark, tgt, partials(("web", 1L, 7L), ("code", 3L, 30L)), 1L)
    assert(snapshot() === Seq(
      ("books", 2L, 50L, 0L), ("code", 3L, 30L, 1L), ("web", 11L, 107L, 1L)))
    // and a replay of THAT batch is again a no-op
    EventStreams.s19MergeStats(spark, tgt, partials(("web", 1L, 7L), ("code", 3L, 30L)), 1L)
    assert(snapshot() === Seq(
      ("books", 2L, 50L, 0L), ("code", 3L, 30L, 1L), ("web", 11L, 107L, 1L)))
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
  }

  test("s20 inline compaction: ingested content exact, final layout one file per partition") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    val got = EventStreams.s20_stream_ingest_compact(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = graft.Tables(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        (round(sum(col("value")) * 100) / 100).as("sum_value"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === batch, "maintenance must not lose or duplicate events")
    // layout: exactly one data file per partition after the last trigger
    val cat = graft.GraftBootstrap.CatalogName
    val loc = new Path(spark.sql(s"DESCRIBE TABLE EXTENDED $cat.tmp.s20_events_ingest")
      .filter(col("col_name") === "Location").head().getString(1))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    def filesPerPartition(p: Path): Seq[(String, Int)] =
      fs.listStatus(p).toSeq.filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
        .map(d => d.getPath.getName ->
          fs.listStatus(d.getPath).count(f => !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")))
    val layout = filesPerPartition(loc)
    assert(layout.nonEmpty && layout.forall(_._2 == 1),
      s"each partition must hold one file after inline compaction: $layout")
    // non-vacuity: the same 3-generation ingest WITHOUT maintenance
    // fragments (more than one file in at least one partition)
    import spark.implicits._
    val plain = s"$cat.tmp.s20_plain"
    spark.sql(s"DROP TABLE IF EXISTS $plain")
    val events = graft.Tables(spark, sf0001, "events")
      .select($"event_id", $"ts", $"event_type", $"value")
    events.limit(0).writeTo(plain).partitionedBy($"event_type").create()
    (0 until 3).foreach(g =>
      events.filter($"event_id" % 3 === g).writeTo(plain).append())
    val plainLoc = new Path(spark.sql(s"DESCRIBE TABLE EXTENDED $plain")
      .filter(col("col_name") === "Location").head().getString(1))
    assert(filesPerPartition(plainLoc).exists(_._2 > 1),
      "contrast ingest must fragment, or the compaction gate is vacuous")
    spark.sql(s"DROP TABLE IF EXISTS $plain")
  }

  test("s21 drift monitor: streaming emissions equal the batch divergence per generation") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.s21_stream_drift_monitor(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed.map(_._1) === Seq(0L, 1L, 2L), "one emission per generation")
    assert(streamed.forall(_._2 > 0), "every generation must carry tokens")
    // batch restatement: the same scorer over the whole corpus at once
    val docsDf = graft.Tables(spark, sf0001, "documents")
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val refHist = docsDf
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 4096)
      .groupBy("bucket").agg(count(lit(1)).as("c")).localCheckpoint()
    val refTotal = refHist.agg(sum("c")).head().getLong(0)
    val batch = graft.llm.TextAnalysis
      .klAgainstReference(docsDf, "text", (col("doc_id") % 3).as("gen"),
        refHist, refTotal)
      .orderBy(col("gen"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed === batch, "trigger boundaries must not change the divergences")
  }

  test("s22 streaming ANN ingest equals q98's batch index maintenance exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // identical corpus split, training base and frozen-centroid math,
    // so batch boundaries must be invisible: the streamed index answers
    // every probe exactly as q98's two-batch maintained index does
    val streamed = rows(EventStreams.s22_stream_ann_ingest(spark, sf0001))
    val batch = rows(graft.llm.LlmQueries.q98_ann_index_maintain(spark, sf0001))
    assert(streamed === batch, "trigger boundaries must not change the index")
    assert(streamed.nonEmpty && streamed.map(_._1).distinct.size > 1)
  }

  test("streaming into the catalog lands every event exactly once (single run)") {
    import org.apache.spark.sql.functions._
    val sunk = EventStreams.s11_stream_catalog_sink(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = graft.Tables(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        (round(sum(col("value")) * 100) / 100).as("sum_value"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(sunk === batch)
  }

  test("native streaming write (toTable) lands every event exactly once (single run)") {
    import org.apache.spark.sql.functions._
    val sunk = EventStreams.s15_stream_native_sink(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = graft.Tables(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        (round(sum(col("value")) * 100) / 100).as("sum_value"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(sunk === batch)
  }

  test("native streaming write: a replayed epoch after checkpoint loss is not double-appended") {
    import org.apache.spark.sql.functions._
    graft.GraftBootstrap.ensure(spark, sf0001)
    val cat = graft.GraftBootstrap.CatalogName
    val tgt = s"$cat.tmp.s15_restart"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val input = java.nio.file.Files.createTempDirectory("graft_s15r_in_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s15r_ck_")
    def gen(a: Long, b: Long) =
      spark.range(a, b).select(col("id"), (col("id") * 2).cast("double").as("v"))
    def start() = spark.readStream.schema(gen(0, 1).schema).parquet(input.toString)
      .writeStream.option("checkpointLocation", ckpt.toString).toTable(tgt)
    try {
      gen(0, 100).write.mode("append").parquet(input.toString)
      gen(0, 0).writeTo(tgt).create()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      assert(spark.table(tgt).count() === 100)
      // Simulate the crash Structured Streaming's sink contract names:
      // the sink committed epoch 0, but the engine died before recording
      // it in the checkpoint commit log — on restart the engine re-runs
      // epoch 0 with the same offsets, and the sink must be idempotent.
      val commit0 = new java.io.File(ckpt.toFile, "commits/0")
      assert(commit0.exists(), "expected checkpoint commit record for batch 0")
      assert(commit0.delete())
      // local ChecksumFs keeps a CRC sidecar; a real HDFS/object-store
      // crash loses both, so drop it too or the re-write trips on it
      new java.io.File(ckpt.toFile, "commits/.0.crc").delete()
      val q2 = start() // replays epoch 0
      try {
        q2.processAllAvailable()
        assert(spark.table(tgt).count() === 100,
          "replayed epoch must be suppressed by the stream-epoch log")
        // and the stream keeps running: new data still lands afterwards
        gen(100, 150).write.mode("append").parquet(input.toString)
        q2.processAllAvailable()
      } finally q2.stop()
      assert(spark.table(tgt).count() === 150)
      assert(spark.table(tgt).groupBy(col("id")).count()
        .filter(col("count") > 1).count() === 0, "no id may land twice")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tgt")
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(input.toString), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt.toString), true)
    }
  }

  test("native streaming write, COMPLETE mode: a replayed truncate epoch re-commits, never empties the table") {
    // The review-caught failure shape: complete mode truncates at epoch
    // START (preWriteDeletes at factory creation), so an abort-on-replay
    // would leave the table EMPTY after a checkpoint-loss restart. The
    // replayed truncate epoch must re-commit instead (value-idempotent:
    // same offsets, same full result).
    import org.apache.spark.sql.functions._
    graft.GraftBootstrap.ensure(spark, sf0001)
    val cat = graft.GraftBootstrap.CatalogName
    val tgt = s"$cat.tmp.s15_complete"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val input = java.nio.file.Files.createTempDirectory("graft_s15c_in_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s15c_ck_")
    def gen(a: Long, b: Long) = spark.range(a, b).select(col("id"),
      (col("id") % 3).cast("string").as("k"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    def start() = agg(spark.readStream.schema(gen(0, 1).schema)
      .parquet(input.toString))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt.toString).toTable(tgt)
    def landed() = spark.table(tgt).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    try {
      gen(0, 90).write.mode("append").parquet(input.toString)
      agg(gen(0, 0)).writeTo(tgt).create()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      assert(landed() === Seq(("0", 30L), ("1", 30L), ("2", 30L)))
      // crash between sink commit and checkpoint commit record
      assert(new java.io.File(ckpt.toFile, "commits/0").delete())
      new java.io.File(ckpt.toFile, "commits/.0.crc").delete()
      val q2 = start() // replays epoch 0: truncate already ran — must re-commit
      try {
        q2.processAllAvailable()
        assert(landed() === Seq(("0", 30L), ("1", 30L), ("2", 30L)),
          "replayed complete-mode epoch emptied or duplicated the table")
        gen(90, 120).write.mode("append").parquet(input.toString)
        q2.processAllAvailable()
      } finally q2.stop()
      assert(landed() === Seq(("0", 40L), ("1", 40L), ("2", 40L)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tgt")
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(input.toString), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt.toString), true)
    }
  }

  test("native streaming write into a PARTITIONED table registers partitions exactly once") {
    // the scaladoc's day-partitioned-ingest claim: the streaming write
    // must honor the batch path's partition-column clustering
    // requirement (RequiresDistributionAndOrdering on a streaming plan)
    // and register written partitions through the same two-phase commit
    import org.apache.spark.sql.functions._
    graft.GraftBootstrap.ensure(spark, sf0001)
    val cat = graft.GraftBootstrap.CatalogName
    val tgt = s"$cat.tmp.s15_part"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val input = java.nio.file.Files.createTempDirectory("graft_s15p_in_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s15p_ck_")
    def gen(a: Long, b: Long) = spark.range(a, b).select(col("id"),
      (col("id") % 3).cast("string").as("p"))
    try {
      gen(0, 90).write.mode("append").parquet(input.toString)
      gen(0, 0).writeTo(tgt).partitionedBy(col("p")).create()
      val q = spark.readStream.schema(gen(0, 1).schema).parquet(input.toString)
        .writeStream.option("checkpointLocation", ckpt.toString).toTable(tgt)
      try q.processAllAvailable() finally q.stop()
      assert(spark.table(tgt).count() === 90)
      assert(spark.table(tgt).filter(col("p") === "1").count() === 30)
      // partitions registered in the catalog, not just directories
      val parts = spark.sql(s"SHOW PARTITIONS $tgt").collect().map(_.getString(0))
      assert(parts.sorted.toSeq === Seq("p=0", "p=1", "p=2"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tgt")
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(input.toString), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt.toString), true)
    }
  }

  test("readStream.table through the graft catalog converges to the batch answer") {
    val streamed = rows(EventStreams.s01d_tumbling_catalog_stream(spark, sf0001))
    val batch = rows(EventWindowQueries.s01_tumbling_window(spark, sf0001))
    assert(streamed === batch)
  }

  test("streaming merge upsert: corrected re-delivery updates in place, never duplicates") {
    import org.apache.spark.sql.functions._
    val merged = EventStreams.s12_stream_merge_upsert(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = graft.Tables(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        (round(sum(when(col("event_id") % 10 === 0, col("value") * 2)
          .otherwise(col("value"))) * 100) / 100).as("sum_value"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(merged === batch)
  }

  /** Sequential reference of s14's semantics: walk band rows in
    * (seq, doc_id) order, accrete bucket members, flag a doc when any
    * of its buckets holds an earlier member at estimate ≥ tau (or the
    * same id — a re-delivery). Returns the flagged doc_id set. */
  private def nearDupReference(
      banded: Seq[(Long, Long, Int, Int, Seq[Long])], tau: Double): Set[Long] = {
    val members = collection.mutable.Map.empty[(Int, Int), Vector[(Long, Seq[Long])]]
    val flagged = collection.mutable.Set.empty[Long]
    banded.sortBy(r => (r._2, r._1)).foreach { case (id, _, band, key, sig) =>
      val bucket = members.getOrElse((band, key), Vector.empty)
      val redelivery = bucket.exists(_._1 == id)
      val hit = bucket.exists { case (_, msig) =>
        msig.iterator.zip(sig.iterator).count { case (a, b) => a == b }
          .toDouble / sig.size >= tau
      }
      if (redelivery || hit) flagged += id
      if (!redelivery) members((band, key)) = bucket :+ (id, sig)
    }
    flagged.toSet
  }

  private def seqDocsFor(dir: String): Seq[SeqDoc] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang")).as[Doc]
      .collect().toSeq.sortBy(_.doc_id)
      .map(d => SeqDoc(d.doc_id, d.text, d.lang, 0L))
  }

  test("streaming near-dedup equals the sequential reference across batch boundaries, non-vacuously") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = seqDocsFor(sf0001)
    val half = (docs.size + 1) / 2
    val batches = Seq(
      docs.take(half),
      docs.drop(half).map(_.copy(seq = 1L)))
    val src = MemoryStream[SeqDoc]
    val streaming = EventStreams.streamNearDupVerdicts(src.toDF())
    // the scale claim pinned: row-local signatures mean the bucket state
    // machine is the ONLY stateful stage — no aggregation anywhere in
    // the streaming plan
    val lp = streaming.queryExecution.analyzed.toString
    assert("FlatMapGroupsWithState".r.findAllIn(lp).size === 1,
      s"s14: expected exactly one stateful operator:\n$lp")
    assert(!lp.contains("Aggregate"),
      s"s14: signature computation regressed to an aggregation:\n$lp")
    val verdicts = streamToMemoryForTest(streaming) { query =>
      batches.foreach { b => src.addData(b); query.processAllAvailable() }
    }
    val streamedFlagged = verdicts.filter(col("dup"))
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    // reference over the SAME banded projection, computed in batch
    val banded = EventStreams.bandedDocs(
      batches.flatten.toDF(), n = 3, bands = 16, rowsPerBand = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3), r.getInt(4),
        r.getSeq[Long](5)))
      .toSeq
    val expected = nearDupReference(banded, tau = 0.8)
    assert(streamedFlagged === expected)
    // non-vacuous: the fixture's near-dup pairs really get suppressed,
    // and suppression is not a blanket drop
    assert(streamedFlagged.nonEmpty, "no near-dup was flagged — fixture drifted?")
    assert(streamedFlagged.size < docs.size / 2,
      s"${streamedFlagged.size} of ${docs.size} flagged — estimator collapsed")
    // every flag names a witness that arrived earlier
    val witnessed = verdicts.filter(col("dup")).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(witnessed.forall { case (d, w) => w <= d },
      "a dup verdict named a LATER witness")
  }

  test("near-dedup's greedy walk IS an order-free join: declarative reference equals the sequential one") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Proof-by-execution of the oracle-expressibility analysis
    // (streamNearDupVerdicts scaladoc): bucket membership accretes for
    // EVERY first occurrence regardless of its own verdict, so the
    // "greedy walk" is not recursive at all — a doc is flagged iff some
    // banded row of it shares a (band, key) bucket with an EARLIER row
    // (by (seq, doc_id)) at full-signature agreement ≥ tau, or with an
    // earlier row of the same doc_id (re-delivery). Stated here as a
    // plain exists-earlier equality join and asserted equal to the
    // sequential walk (which the streaming state machine is separately
    // gated against above). The walk is therefore SQL-expressible; what
    // keeps the driver gate rows-only is solely the signature family
    // (xxhash64 + murmur3 band keys), which DuckDB cannot replicate.
    val docs = seqDocsFor(sf0001)
    val half = (docs.size + 1) / 2
    val all = docs.take(half) ++ docs.drop(half).map(_.copy(seq = 1L))
    val bandedDf = EventStreams.bandedDocs(all.toDF(), n = 3, bands = 16,
      rowsPerBand = 2).localCheckpoint()
    val m = bandedDf.select(col("doc_id").as("m_id"), col("seq").as("m_seq"),
      col("band"), col("key"), col("sig").as("m_sig"))
    val agree = aggregate(zip_with(col("m_sig"), col("sig"),
      (a, b) => when(a === b, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
    val declarative = bandedDf.join(m, Seq("band", "key"))
      .filter(col("m_seq") < col("seq") ||
        (col("m_seq") === col("seq") && col("m_id") < col("doc_id")))
      .filter(col("m_id") === col("doc_id") ||
        agree.cast("double") / size(col("sig")) >= 0.8)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val sequential = nearDupReference(
      bandedDf.collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getSeq[Long](5))).toSeq, tau = 0.8)
    assert(declarative === sequential)
    assert(declarative.nonEmpty, "no near-dup flagged — fixture drifted?")
  }

  test("streaming near-dedup: an exactly re-delivered batch is fully suppressed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = seqDocsFor(sf0001)
    val half = (docs.size + 1) / 2
    val first = docs.take(half)
    val src = MemoryStream[SeqDoc]
    val verdicts = streamToMemoryForTest(
      EventStreams.streamNearDupVerdicts(src.toDF())) { query =>
      Seq(first,
        docs.drop(half).map(_.copy(seq = 1L)),
        first.map(_.copy(seq = 2L))) // generation 3: exact re-delivery
        .foreach { b => src.addData(b); query.processAllAvailable() }
    }
    // every re-delivered doc that banded must be flagged on re-delivery
    val redelivered = verdicts.filter(col("seq") === 2)
    val banded3 = redelivered.select(col("doc_id")).distinct().count()
    assert(banded3 > 0)
    val keptOnRedelivery = redelivered
      .groupBy(col("doc_id")).agg(max(col("dup")).as("dup"))
      .filter(!col("dup")).count()
    assert(keptOnRedelivery === 0,
      "an exactly re-delivered document survived the near-dedup gate")
  }

  test("bounded-state near-dedup converges to s14 inside the horizon") {
    val bounded = rows(EventStreams.s14b_stream_near_dedup_expiring(spark, sf0001))
    val unbounded = rows(EventStreams.s14_stream_near_dedup(spark, sf0001))
    assert(bounded === unbounded)
  }

  test("bounded-state near-dedup EXPIRES buckets past the horizon: late re-delivery is admitted") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = seqDocsFor(sf0001).take(40)
    val base = 1700000000L
    def at(hours: Double) = base + (hours * 3600).toLong
    val src = MemoryStream[SeqDoc]
    // stamp by seq: generation 0 at hour 0; dummies and the re-delivery
    // at hour 10 — far past the 2h horizon
    val stamped = src.toDF().withColumn("ingest_ts",
      timestamp_seconds(when(col("seq") === 0, lit(at(0))).otherwise(lit(at(10)))))
    val dummy = (tag: Long) =>
      SeqDoc(900000L + tag, s"expiry clock advance document number $tag " +
        "carrying enough words to band", "en", tag)
    val verdicts = streamToMemoryForTest(
      EventStreams.streamNearDupVerdictsExpiring(stamped)) { query =>
      // b1: originals at t=0 → buckets armed with timeout 2h
      src.addData(docs); query.processAllAvailable()
      // b2: far-future dummy advances the watermark to ~8h (10h − 2h)
      src.addData(Seq(dummy(1))); query.processAllAvailable()
      // b3: another dummy — the timeout sweep runs with the 8h watermark
      // and drops every b1 bucket (keys without data this batch)
      src.addData(Seq(dummy(2))); query.processAllAvailable()
      // b4: exact re-delivery AFTER expiry — state is gone, so the
      // re-delivered docs must be admitted as fresh
      src.addData(docs.map(_.copy(seq = 3L))); query.processAllAvailable()
    }
    // Fresh-start equivalence: with every generation-0 bucket expired,
    // the re-delivered generation is a brand-new corpus — its verdicts
    // (including its own INTRA-batch near-dups) must equal generation
    // 0's exactly. Un-expired state would flag every doc as a
    // re-delivery instead.
    def flaggedAt(seq: Long) = verdicts.filter(col("seq") === seq && col("dup"))
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    val gen0 = verdicts.filter(col("seq") === 0).select(col("doc_id")).distinct().count()
    assert(gen0 > 0)
    assert(flaggedAt(3) === flaggedAt(0),
      "post-horizon re-delivery did not behave as a fresh corpus — state never expired")
    assert(flaggedAt(3).size < gen0,
      "every re-delivered doc was flagged — expiry never happened")
    // (in-horizon suppression is covered by the convergence test above:
    // bounded === unbounded includes every flagged document)
  }

  /** Local memory-sink runner for ad-hoc streaming frames (the spec
    * builds its own MemoryStream sources; EventStreams' runToMemory is
    * private and its gated queries stage their own replays). */
  test("s18 temporal join EXPIRES idle users past the horizon: later facts re-enrich as NULL") {
    import java.time.LocalDateTime
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(hours: Double) = LocalDateTime.ofEpochSecond(
      1700000000L + (hours * 3600).toLong, 0, java.time.ZoneOffset.UTC)
    def dim(id: Long, h: Double, v: Double) = Event(id, at(h), 1L, "rate", v)
    def fact(id: Long, h: Double, u: Long = 1L) = Event(id, at(h), u, "click", 1.0)
    val src = MemoryStream[Event]
    // 2-hour idle horizon; the transform's own 1h watermark delay rides along
    val out = streamToMemoryForTest(
      EventStreams.temporalJoinTransform(src.toDF(), horizonMs = 2L * 3600 * 1000)) {
      query =>
        // b1: u1 gets a dimension row, then a fact → enriched
        src.addData(Seq(dim(10L, 0.0, 5.0), fact(11L, 0.1))); query.processAllAvailable()
        // b2: a fact INSIDE the horizon → still enriched (and refreshes it)
        src.addData(Seq(fact(12L, 1.0))); query.processAllAvailable()
        // b3/b4: another user's far-future facts advance the watermark
        // past (h1 + 2h); the timeout sweep then drops u1's dimension
        src.addData(Seq(fact(21L, 10.0, u = 2L))); query.processAllAvailable()
        src.addData(Seq(fact(22L, 10.5, u = 2L))); query.processAllAvailable()
        // b5: u1 returns AFTER expiry → NULL re-enrichment
        src.addData(Seq(fact(13L, 10.8))); query.processAllAvailable()
    }
    val byId = out.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(byId(11L) === Some(10L), "in-horizon fact must enrich")
    assert(byId(12L) === Some(10L), "horizon refresh must keep the dimension")
    assert(byId(21L) === None, "a user with no dimension enriches NULL")
    assert(byId(13L) === None,
      "post-expiry fact must re-enrich as NULL — state never expired")
  }

  private def streamToMemoryForTest(streaming: org.apache.spark.sql.DataFrame)(
      feed: org.apache.spark.sql.streaming.StreamingQuery => Unit)
      : org.apache.spark.sql.DataFrame = {
    val name = s"graft_spec_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val query = streaming.writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try feed(query)
      finally query.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val sink = spark.table(name)
    val out = spark.createDataFrame(sink.collectAsList(), sink.schema)
    spark.catalog.dropTempView(name)
    out
  }

  test("stateful throttle equals the single-pass greedy reference across batch boundaries") {
    val streamed = EventStreams.s06_stateful_throttle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val reference = EventStreams.throttleReference(
      EventStreams.eventsFor(spark, sf0001))
      .map(e => (e.user_id, e.event_id))
    assert(streamed === reference)
    assert(streamed.size < EventStreams.eventsFor(spark, sf0001).size,
      "throttle emitted everything — state had no effect")
  }

  test("ingest dedup: a re-ingested batch adds zero rows; counts equal batch distinct") {
    import org.apache.spark.sql.functions._
    // two identical ingests: every (lang, hash) key survives exactly once
    val out = EventStreams.s10_stream_dedup_ingest(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.Tables(spark, sf0001, "documents")
      .groupBy(col("lang"))
      .agg(countDistinct(sha2(graft.llm.TextOps.normText(col("text")), 256))
        .as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === expected)
  }

  test("watermarked dedup absorbs the re-delivery within the horizon, equals batch distinct") {
    import org.apache.spark.sql.functions._
    val out = EventStreams.s10c_stream_dedup_watermarked(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.Tables(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
      .groupBy(col("lang"))
      .agg(countDistinct(sha2(graft.llm.TextOps.normText(col("text")), 256))
        .as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === expected)
  }

  test("file-stream ingest dedup equals batch distinct and never stages rows on the driver") {
    import org.apache.spark.sql.functions._
    // the production shape: generation 2 lands as new part files and
    // must add zero rows to the deduped state
    val out = EventStreams.s10b_stream_dedup_files(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.Tables(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
      .groupBy(col("lang"))
      .agg(countDistinct(sha2(graft.llm.TextOps.normText(col("text")), 256))
        .as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === expected)
  }

  test("streaming curate: quality floor then dedup converges to the batch answer, non-vacuously") {
    import org.apache.spark.sql.functions._
    val out = EventStreams.s13_stream_curate(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val passing = graft.llm.TextAnalysis.withQuality(
      graft.Tables(spark, sf0001, "documents").filter(col("text").isNotNull), "text")
      .filter(col("quality") >= 0.5)
    val expected = passing.groupBy(col("lang"))
      .agg(countDistinct(sha2(graft.llm.TextOps.normText(col("text")), 256))
        .as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === expected)
    // the floor must actually bite, or this test gates nothing beyond s10
    val allDistinct = graft.Tables(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
      .select(countDistinct(sha2(graft.llm.TextOps.normText(col("text")), 256)))
      .collect()(0).getLong(0)
    assert(out.values.sum < allDistinct,
      "quality floor filtered nothing — the composition is vacuous")
  }

  test("stream-stream interval join equals the batch join across replay batches") {
    import org.apache.spark.sql.functions._
    // replay stages all clicks before all errors, so EVERY match below
    // was produced by joining against buffered click state
    val joined = rows(EventStreams.s07_interval_join(spark, sf001))
    assert(joined.nonEmpty, "no matches — the join produced nothing to gate")
    val events = graft.Tables(spark, sf001, "events")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val batch = errors.join(clicks, expr(
      "user_id = c_user AND click_ts >= error_ts - INTERVAL 1 HOUR AND click_ts <= error_ts"))
      .select(col("error_id"), col("click_id"), col("user_id"),
        col("error_ts"), col("click_ts"))
      .orderBy(col("error_id"), col("click_id"))
    assert(joined === rows(batch))
  }

  test("stream sink lands every event exactly once, and a replayed batch does not duplicate") {
    import org.apache.spark.sql.functions._
    val agg = rows(EventStreams.s09_stream_sink(spark, sf0001))
    val expected = rows(graft.Tables(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        (round(sum(col("value")) * 100) / 100).as("sum_value"))
      .orderBy(col("event_type")))
    assert(agg === expected)
    // Idempotence: replay batch 0's overwrite (the failure-retry case) —
    // the partition is replaced, not appended, so totals are unchanged.
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s09_events_sink"
    val before = spark.table(tgt).count()
    // materialize first: a static overwrite pre-deletes its target
    // partition at job start, so re-feeding it from a live scan of the
    // same partition would read deleted files
    val b0 = spark.table(tgt).filter(col("batch_id") === 0)
      .select("event_id", "ts", "user_id", "event_type", "value", "batch_id")
    val batch0 = spark.createDataFrame(b0.collectAsList(), b0.schema)
    batch0.writeTo(tgt).overwrite(col("batch_id") === lit(0L))
    assert(spark.table(tgt).count() === before,
      "replaying a batch duplicated its rows — the sink is not idempotent")
  }

  test("watermark drops the late batch: result is batch-1-only, not the full corpus") {
    val late = rows(EventStreams.s05_watermark_late(spark, sf0001))
    val full = rows(EventWindowQueries.s01_tumbling_window(spark, sf0001))
    assert(late !== full, "late rows were NOT dropped — watermark had no effect")
    // every (window, type) count in the late-data run is <= the full run's
    val fullMap = full.map(r => (r(0), r(1)) -> r(2).asInstanceOf[Long]).toMap
    late.foreach { r =>
      assert(r(2).asInstanceOf[Long] <= fullMap((r(0), r(1))))
    }
  }
}
