package graft.streaming

import java.time.LocalDateTime
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RelationalQueries.r2

/** One event row in the typed streaming source (ts is naive —
  * TIMESTAMP_NTZ — matching the fixture normalization in [[Tables]]). */
case class Event(
    event_id: Long, ts: LocalDateTime, user_id: Long,
    event_type: String, value: Double)

/** One emission of the stateful throttle (s06). */
case class Emitted(user_id: Long, event_id: Long, ts: LocalDateTime)

/** One document row for the streaming-ingest dedup replay (s10). */
case class Doc(doc_id: Long, text: String, lang: String)

/** A document row tagged with its ingest generation (s14): `seq` is the
  * caller's monotone batch tag — it orders re-deliveries after first
  * deliveries and rides through to the verdict. */
case class SeqDoc(doc_id: Long, text: String, lang: String, seq: Long)

/** One (LSH band bucket, document) row of the streaming near-dup
  * operator (s14): the doc's full minhash signature rides along for the
  * state-side similarity estimate. */
case class BandDoc(doc_id: Long, lang: String, seq: Long,
    band: Int, key: Int, sig: Seq[Long])

/** One bucket member in s14's state: id + minhash signature. */
case class BucketMember(doc_id: Long, sig: Seq[Long])

/** s14's per-bucket state: every document seen in this band bucket, in
  * arrival order. */
case class BucketMembers(members: Seq[BucketMember])

/** s14b's banded row: s14's [[BandDoc]] plus the WATERMARKED ingest
  * time the expiry clock runs on (carried as the timestamp itself —
  * the watermark metadata rides the attribute, and the event-time
  * timeout checker requires it present below the state machine). */
case class BandDocT(doc_id: Long, lang: String, seq: Long,
    band: Int, key: Int, sig: Seq[Long], event_ts: java.sql.Timestamp)

/** s14b's per-bucket state: members plus the newest ingest time seen —
  * the base of the bucket's expiry timeout. */
case class BucketMembersT(members: Seq[BucketMember], maxTsMs: Long)

/** Per-(bucket, document) verdict emitted by s14's state machine. */
case class BandVerdict(doc_id: Long, lang: String, seq: Long,
    dup: Boolean, dup_of: Long)

/** s17's input row: [[Event]] with the INSTANT-typed event time the
  * watermark and event-time timeout ride on (the timeout checker
  * requires the watermarked attribute below the state machine, exactly
  * as s14b's [[BandDocT]]). */
case class TsEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** s17's per-user state: the OPEN session chunk. `lastMicros` is the
  * island's previous-event clock (gap tests compare consecutive events,
  * so it carries across a cap split unchanged). */
case class OpenChunk(startMicros: Long, lastMicros: Long, n: Long,
    types: Seq[String], sum: Double)

/** One CLOSED capped session emitted by s17 (columns = q89's). */
case class CappedSession(user_id: Long, session_start: LocalDateTime,
    session_end: LocalDateTime, n_events: Long, n_types: Long,
    sum_value: Double)

/** s18's per-user state: the most recent DIMENSION row seen. */
case class DimState(event_id: Long, tsMicros: Long, value: Double)

/** One enriched fact emitted by s18's temporal join: the fact row plus
  * the as-of dimension (None when no dimension row preceded it). */
case class Enriched(event_id: Long, ts: LocalDateTime, user_id: Long,
    value: Double, rate_id: Option[Long], rate_value: Option[Double])

/** s18b's per-user state: events the watermark has not yet passed
  * (arrival buffer) plus the latest APPLIED dimension row. */
case class TemporalBuf(held: Seq[TsEvent], dim: Option[DimState])

/** Structured Streaming execution of the event-window inventory
  * (SURVEY.md §2.3 S1/S5): the SAME windowed-aggregation expressions as
  * the batch forms in EventWindowQueries, driven through a real
  * `StreamingQuery` over a deterministic MemoryStream replay.
  *
  * Replay is the streaming analogue of the DuckDB gate: batch
  * membership and watermark progression are fully determined by the
  * fixture data (no wall-clock, no timers), so results are
  * hash-comparable run-to-run and — for s05 — against a DuckDB oracle
  * that models the late-drop rule in plain SQL.
  *
  * Scale posture: a production deployment replaces MemoryStream with
  * `readStream` over the table directory; the aggregation state is
  * partitioned by (window, event_type) group keys exactly as in batch,
  * and the 10-minute watermark bounds state: windows older than
  * `watermark - window size` are evicted every trigger. The driver-side
  * `collect` here exists only to stage the deterministic replay.
  */
object EventStreams {

  private val runId = new AtomicInteger(0)

  private def collectEvents(spark: SparkSession, dir: String): Seq[Event] = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
      .collect().toSeq
  }

  private[streaming] def micros(ts: LocalDateTime): Long =
    ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ts.getNano / 1000L

  /** Run one streaming DataFrame into a memory sink, let `feed` drive
    * it, then return the MATERIALIZED result and drop the sink table —
    * the memory sink holds the full output, so leaving one uniquely-named
    * table per call would leak a result copy per invocation.
    *
    * State-store note: one delta file is committed per shuffle partition
    * per microbatch — at the session's 32 partitions a 3-batch replay
    * pays ~100 mostly-empty state commits, so replays run at 4 (restored
    * afterwards). A production readStream sizes this to the real key
    * cardinality instead. */
  private def runToMemory(
      spark: SparkSession, streaming: DataFrame, mode: String)(
      feed: org.apache.spark.sql.streaming.StreamingQuery => Unit): DataFrame = {
    val name = s"graft_stream_${runId.incrementAndGet()}"
    withShufflePartitions(spark, 4) {
      val query = streaming.writeStream
        .format("memory").queryName(name).outputMode(mode).start()
      try feed(query)
      finally query.stop()
    }
    val sink = spark.table(name)
    val out = spark.createDataFrame(sink.collectAsList(), sink.schema)
    spark.catalog.dropTempView(name)
    out
  }

  /** Run `body` with shuffle partitions temporarily set to `n`,
    * restoring the previous value even on failure — the one copy of the
    * save/set/restore juggling shared by the memory-sink replays and
    * the foreachBatch sinks (s11). */
  private def withShufflePartitions[A](spark: SparkSession, n: Int)(
      body: => A): A = {
    val partKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(partKey)
    spark.conf.set(partKey, n.toString)
    try body finally spark.conf.set(partKey, prev)
  }

  /** Feed `batches` one microbatch at a time through `transform`. */
  private def replay(
      spark: SparkSession,
      batches: Seq[Seq[Event]],
      transform: DataFrame => DataFrame,
      mode: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    runToMemory(spark, transform(src.toDF()), mode) { query =>
      batches.foreach { b => src.addData(b); query.processAllAvailable() }
    }
  }

  /** The S1 aggregation, shared verbatim between s01b and s05. The
    * output window start is presented as TIMESTAMP_NTZ either way (under
    * the UTC session an instant↔naive cast preserves the wall time). */
  private def tumblingAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  // --------------------------------------------------------------- s01c
  /** S1 through the FILE stream source (`readStream.parquet` over the
    * events fixture — the production shape, where MemoryStream replay is
    * the test shape). The raw `ts` is normalized to TIMESTAMP_NTZ inside
    * the streaming plan exactly as [[Tables]] does for batch, whichever
    * physical encoding the fixture stores. Same oracle as s01. */
  def s01c_tumbling_file_stream(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.setSessionConfs(spark)
    // The file source wants a directory to list; the fixture dir holds
    // one parquet per table, so glob-filter down to the events file.
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val src = Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir), "ts")
    runToMemory(spark, tumblingAgg(src), "complete")(_.processAllAvailable())
      .orderBy(col("window_start"), col("event_type"))
  }

  // --------------------------------------------------------------- s01b
  /** S1 through a real StreamingQuery (complete mode, single replay
    * batch): must produce byte-identical rows to the batch form — same
    * DuckDB oracle as s01. */
  def s01b_tumbling_stream(spark: SparkSession, dir: String): DataFrame =
    replay(spark, Seq(collectEvents(spark, dir)), tumblingAgg, "complete")
      .orderBy(col("window_start"), col("event_type"))

  // --------------------------------------------------------------- s01d
  /** S1 through the CATALOG identifier — `spark.readStream.table(...)`,
    * the first thing a real streaming user tries: no hand-fed path, no
    * hand-inferred schema; the stream gets both from the catalog via
    * [[graft.catalog.GraftTable.v1Table]]'s `V2TableWithV1Fallback`
    * delegation to Spark's FileStreamSource (the same V1 micro-batch
    * engine `readStream.parquet` uses — DSv2 file scans never stream).
    * The events fixture is first landed in a MANAGED graft table
    * through the catalog write path (its directory location is what a
    * real table has; the raw fixture is a single parquet FILE, which
    * the file stream's basePath contract rejects), then streamed back
    * by identifier. Same oracle as s01/s01b/s01c. */
  def s01d_tumbling_catalog_stream(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.ensure(spark, dir)
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s01d_events"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${graft.GraftBootstrap.CatalogName}.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .writeTo(tgt).create()
    val src = spark.readStream.table(tgt)
    runToMemory(spark, tumblingAgg(src), "complete")(_.processAllAvailable())
      .orderBy(col("window_start"), col("event_type"))
  }

  // ---------------------------------------------------------------- s23
  /** S1 through the SNAPSHOT-LINEAGE streaming source
    * ([[GraftChangeStream]] / `format("graft-cdc")`) over a table under
    * live merge-on-read DML — the stream the V1 file-source fallback
    * must refuse (raw listings cannot apply deletion vectors):
    *
    *  - v1 seeds 80% of the events into a MOR table; v2 MOR-DELETEs
    *    `event_id % 10 = 1` (a DV batch, zero files rewritten);
    *  - the stream starts: its initial batch is the full state AT the
    *    current snapshot, vectors applied — the deleted rows are never
    *    emitted;
    *  - the query STOPS (checkpointed), v3 appends the remaining 20%,
    *    v4 MOR-DELETEs `event_id % 10 = 5` (rows from v3, not yet
    *    emitted), and the query RESTARTS from the checkpoint: offset
    *    recovery replays against the same manifests, and the catch-up
    *    batch `(v2, v4]` emits v3's rows MINUS the in-range deletes;
    *  - the tumbling aggregate over everything emitted must equal the
    *    batch answer over the surviving rows — stated in SQL for the
    *    DuckDB hash gate.
    *
    * At 100 TB each trigger plans from manifest diffs (O(changed
    * files)) and scans only the changed files — never re-lists or
    * re-reads the processed corpus. */
  def s23_stream_cdc_source(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.ensure(spark, dir)
    val cat = graft.GraftBootstrap.CatalogName
    val tgt = s"$cat.tmp.s23_events"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    spark.sql(
      s"""CREATE TABLE $tgt (event_id BIGINT NOT NULL, ts TIMESTAMP_NTZ,
         |  user_id BIGINT, event_type STRING, value DOUBLE)
         |TBLPROPERTIES ('graft.dml.mode'='merge-on-read',
         |  'graft.dml.key'='event_id')""".stripMargin)
    Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .createOrReplaceTempView("s23_src")
    spark.sql(s"INSERT INTO $tgt SELECT * FROM s23_src WHERE event_id % 5 <> 0")
    spark.sql(s"DELETE FROM $tgt WHERE event_id % 10 = 1") // v2: live DV
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val ckpt = java.nio.file.Files.createTempDirectory("s23_ckpt").toString
    def run(): Unit = withShufflePartitions(spark, 4) {
      val src = spark.readStream.format("graft-cdc")
        .option("table", tgt).load()
      val q = tumblingAgg(src).writeStream
        .format("memory").queryName(name).outputMode("complete")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // phase 1: initial snapshot, v2's deletes applied
    spark.sql(s"INSERT INTO $tgt SELECT * FROM s23_src WHERE event_id % 5 = 0")
    spark.sql(s"DELETE FROM $tgt WHERE event_id % 10 = 5") // v4: deletes v3 rows
    run() // phase 2: checkpointed restart, catch-up batch (v2, v4]
    val sink = spark.table(name)
    val out = spark.createDataFrame(sink.collectAsList(), sink.schema)
    spark.catalog.dropTempView(name)
    out.orderBy(col("window_start"), col("event_type"))
  }

  // ---------------------------------------------------------------- s05
  /** S5 watermark/late-data: rows with `event_id % 20 == 0` older than
    * `max(ts) - 3h` are withheld from batch 1 and delivered late in
    * batch 2. After batch 1 the watermark sits at `max(ts) - 10min`;
    * every late row's window closed hours earlier, so ALL of them are
    * dropped — the final answer aggregates batch 1 only, which is
    * exactly what the DuckDB oracle states in SQL. A far-future sentinel
    * rides along in the late batch: the input-filter watermark for that
    * batch was already fixed by batch 1 (so the late rows still drop),
    * while the sentinel advances the watermark afterwards so append mode
    * flushes every real window in the trailing no-data microbatch; the
    * sentinel's own (never-finalized) window is excluded. */
  def s05_watermark_late(spark: SparkSession, dir: String): DataFrame = {
    val events = collectEvents(spark, dir)
    val maxTs = events.map(_.ts).max(Ordering.fromLessThan[LocalDateTime](_.isBefore(_)))
    val cutoff = maxTs.minusHours(3)
    val (late, onTime) = events.partition(e =>
      e.event_id % 20 == 0 && !e.ts.isAfter(cutoff))
    val sentinel = Event(-1L, maxTs.plusDays(1), -1L, "zzz_flush", 0.0)
    // Watermarks demand an instant-typed event time (TIMESTAMP, not
    // NTZ); under the UTC session the cast is wall-time preserving.
    replay(spark, Seq(onTime, late :+ sentinel),
      df => tumblingAgg(df.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")), "append")
      .filter(col("event_type") =!= "zzz_flush")
      .orderBy(col("window_start"), col("event_type"))
  }

  // ---------------------------------------------------------------- s06
  /** Custom state machine via `flatMapGroupsWithState` (the §2.2
    * streaming surface the built-in operators can't express): a greedy
    * per-user throttle that emits an event only if ≥ 10 minutes have
    * passed since the user's previously EMITTED event. The kept set
    * depends on which earlier rows were kept — a recursive chain no
    * window function states — so the per-group state (last emitted
    * timestamp) is the operator.
    *
    * Replay splits the corpus into 3 ts-ordered microbatches; state
    * carries each user's chain across batch boundaries, so the result is
    * identical to a single global greedy pass (asserted against an
    * in-memory reference in EventStreamsSpec, and hash-gated against a
    * DuckDB `WITH RECURSIVE` oracle that walks the same per-user chain).
    *
    * Scale posture: state is one long per user, partitioned by the group
    * key; at 10^9 users that's shards of an ~8 GB state store spread
    * across executors, with `GroupStateTimeout` available for eviction
    * in an unbounded-key production deployment. */
  def s06_stateful_throttle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val sorted = collectEvents(spark, dir)
      .sortBy(e => (micros(e.ts), e.event_id))
    val batchSize = math.max(1, (sorted.size + 2) / 3)
    val batches = sorted.grouped(batchSize).toSeq

    replay(spark, batches, { df =>
      import df.sparkSession.implicits._
      df.as[Event]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[Long, Emitted](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (user, events, state) =>
            val inOrder = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var last = state.getOption.getOrElse(Long.MinValue)
            val out = Seq.newBuilder[Emitted]
            inOrder.foreach { e =>
              val t = micros(e.ts)
              if (last == Long.MinValue || t - last >= 10L * 60 * 1000000) {
                out += Emitted(user, e.event_id, e.ts)
                last = t
              }
            }
            state.update(last)
            out.result().iterator
        }
        .toDF()
    }, "append").orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  // ---------------------------------------------------------------- s07
  /** Stream-stream INTERVAL join — the two-sided-state streaming
    * operator (§2.2) that neither windowed aggregation nor
    * `flatMapGroupsWithState` covers: errors join the same user's clicks
    * from the preceding hour. Both sides carry watermarks and the
    * join condition carries the time bound, so Spark can evict a click
    * once `watermark > click_ts + interval` — state stays proportional to
    * the active window, not the stream. Replay stages ALL clicks in
    * batch 1 and ALL errors in batch 2, so EVERY match exercises the
    * buffered-state path (the click side is pure state when the errors
    * arrive); the global watermark is the min across sides and the error
    * side has seen nothing during batch 1, so no click is evicted early
    * and the inner-join result equals the batch join — exactly the
    * DuckDB oracle. A production interleaved feed gets the bounded-state
    * eviction instead; s05 separately proves watermark dropping. */
  def s07_interval_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = collectEvents(spark, dir)
      .sortBy(e => (micros(e.ts), e.event_id))
    val clicks = events.filter(_.event_type == "click")
    val errors = events.filter(_.event_type == "error")
    val cSrc = MemoryStream[Event]
    val eSrc = MemoryStream[Event]
    // instant-typed event times for the watermarks (UTC session: the
    // cast preserves wall time), distinct column names per side
    val c = cSrc.toDF()
      .select($"event_id".as("click_id"), $"user_id".as("c_user"),
        $"ts".cast("timestamp").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val e = eSrc.toDF()
      .select($"event_id".as("error_id"), $"user_id".as("user_id"),
        $"ts".cast("timestamp").as("error_ts"))
      .withWatermark("error_ts", "10 minutes")
    val joined = e.join(c, expr(
      """user_id = c_user AND
        |click_ts >= error_ts - INTERVAL 1 HOUR AND
        |click_ts <= error_ts""".stripMargin))
      .select($"error_id", $"click_id", $"user_id",
        $"error_ts".cast("timestamp_ntz").as("error_ts"),
        $"click_ts".cast("timestamp_ntz").as("click_ts"))
    runToMemory(spark, joined, "append") { query =>
      cSrc.addData(clicks); query.processAllAvailable()
      eSrc.addData(errors); query.processAllAvailable()
    }.orderBy($"error_id", $"click_id")
  }

  // ---------------------------------------------------------------- s08
  /** Stream-STATIC enrichment join — the third streaming join shape
    * (§2.2) after windowed aggregation (s01/s05) and stream-stream
    * (s07): each microbatch of events joins a static dimension table
    * (customer) read through the catalog, then feeds a windowed
    * aggregate per nation. Stream-static joins are STATELESS — the
    * static side is simply re-planned per microbatch (broadcast when
    * stats say it fits, exactly as in batch), so the only streaming
    * state is the aggregation's. This is the canonical
    * training-pipeline shape: enrich an event firehose against slowly-
    * changing reference data without holding any join state.
    *
    * Replay drives two microbatches so the join provably runs per-batch;
    * complete mode converges to the batch answer, which the DuckDB
    * oracle states as a plain join + time-bucket aggregate. */
  def s08_stream_static_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables(spark, dir, "customer").select($"c_custkey", $"c_nationkey")
    val events = collectEvents(spark, dir)
      .sortBy(e => (micros(e.ts), e.event_id))
    val half = math.max(1, (events.size + 1) / 2)
    replay(spark, events.grouped(half).toSeq, { df =>
      df.join(cust, df("user_id") === cust("c_custkey"))
        .groupBy(window(col("ts"), "1 hour"), col("c_nationkey"))
        .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"),
          col("c_nationkey"), col("cnt"), col("sum_value"))
    }, "complete").orderBy(col("window_start"), col("c_nationkey"))
  }

  // ---------------------------------------------------------------- s09
  /** Streaming SINK into the catalog — the ingest half of the pipeline
    * (s01–s08 cover transforms; this covers landing the stream in a
    * governed table). `foreachBatch` drives the engine's own DSv2 batch
    * write per microbatch, with the EXACTLY-ONCE recipe: the sink table
    * is partitioned by `batch_id` and each microbatch STATIC-OVERWRITES
    * its own partition — a replayed/retried batch replaces its previous
    * attempt instead of duplicating it (idempotence through the
    * engine's overwrite-by-filter unwrap, the same path q24 gates).
    *
    * Scale posture: per-batch work is one partitioned write job whose
    * commit registers exactly one partition; state is zero (the
    * checkpoint's batch id is the only cursor). Batch sizes at 100 TB
    * come from source admission control (maxFilesPerTrigger etc.), not
    * from this sink. */
  def s09_stream_sink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.GraftBootstrap.ensure(spark, dir)
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s09_events_sink"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${graft.GraftBootstrap.CatalogName}.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    spark.sql(
      s"""CREATE TABLE $tgt (
         |  event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,
         |  event_type STRING, value DOUBLE, batch_id BIGINT)
         | USING parquet PARTITIONED BY (batch_id)""".stripMargin)
    val events = collectEvents(spark, dir).sortBy(e => (micros(e.ts), e.event_id))
    val batches = events.grouped(math.max(1, (events.size + 2) / 3)).toSeq
    val src = MemoryStream[Event]
    val query = src.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .writeTo(tgt).overwrite(col("batch_id") === lit(batchId))
        ()
      }
      .start()
    try batches.foreach { b => src.addData(b); query.processAllAvailable() }
    finally query.stop()
    spark.table(tgt)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), r2(sum($"value")).as("sum_value"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- s10
  /** Streaming ingest dedup — the continuous form of q27's exact dedup:
    * a document stream deduplicated on (lang, normalized content hash)
    * with `dropDuplicates`, replayed as two microbatches carrying the
    * SAME corpus (the re-crawl / double-ingest scenario). Batch 2 must
    * add ZERO rows — every key is already in state — and the gated
    * output is the per-language count of surviving rows.
    *
    * Determinism contract: `dropDuplicates` keeps the FIRST row that
    * reaches the state store per key, and shuffle fetch order is
    * randomized — so WHICH duplicate survives is nondeterministic (the
    * sf0.1 fixture really has duplicate-content groups). The gated
    * projection therefore exposes nothing survivor-dependent: the
    * per-(lang, hash) survivor COUNT is exactly the distinct-key count
    * regardless of arrival order, which is what the DuckDB oracle
    * states.
    *
    * Scale posture: state is one row per distinct key (lang + 64-char
    * hash, never document bodies); a production stream bounds state to
    * the ingest-time horizon with `dropDuplicatesWithinWatermark` — the
    * fixture documents carry no timestamps, so the unbounded replay is
    * the test shape. */
  /** The shared s10/s10b dedup contract — ONE definition site (the
    * embeddingPairsSql pattern) so the two gates cannot drift: filter
    * null text (a NULL hash would survive `dropDuplicates` as its own
    * key while the oracle's count(DISTINCT) ignores it — the matching
    * WHERE is in [[ingestDedupOracle]]), hash the normalized content,
    * keep one row per (lang, content_hash). */
  private def hashedDocs(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("content_hash",
        sha2(graft.llm.TextOps.normText(col("text")), 256))

  private def ingestDedup(docs: DataFrame): DataFrame =
    hashedDocs(docs)
      .dropDuplicates("lang", "content_hash")
      .select(col("doc_id"), col("lang"))

  /** Batch-SQL statement of [[ingestDedup]]'s converged state —
    * survivor-independent (per-language distinct-key counts), shared
    * verbatim by the s10 and s10b gates. */
  private val ingestDedupOracle: String =
    """SELECT lang,
      |  count(DISTINCT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))
      |    AS n_unique
      | FROM documents WHERE text IS NOT NULL
      | GROUP BY lang ORDER BY lang""".stripMargin

  def s10_stream_dedup_ingest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", $"text", $"lang").as[Doc].collect().toSeq
    val src = MemoryStream[Doc]
    runToMemory(spark, ingestDedup(src.toDF()), "append") { query =>
      Seq(docs, docs).foreach { b => src.addData(b); query.processAllAvailable() }
    }.groupBy(col("lang")).agg(count(lit(1)).as("n_unique"))
      .orderBy(col("lang"))
  }

  // --------------------------------------------------------------- s10c
  /** s10 with BOUNDED state — the `dropDuplicatesWithinWatermark` shape
    * SCALE.md names as the production default: state for a key is
    * dropped once the watermark passes its horizon, so a year-long
    * ingest holds state for the re-delivery window, not forever. The
    * fixture documents carry no timestamps, so ingest times are
    * synthesized deterministically (epoch + doc_id mod 3600 seconds —
    * the whole corpus spans under an hour) and the horizon (2 hours)
    * covers the replay's re-delivery gap: every batch-2 duplicate
    * arrives inside its first occurrence's window and is absorbed, so
    * the converged state equals exact dedup and the SAME oracle gates
    * all three s10 forms. */
  /** The bounded-state ingest-dedup OPERATOR (library form; s10c's gated
    * query applies the fixture defaults): hash the normalized content
    * per the shared s10 key contract, then expire dedup state once the
    * watermark on `tsCol` passes `horizon` — re-deliveries inside the
    * horizon are absorbed, state is O(keys seen within the horizon),
    * not O(corpus). The horizon is the deployment's re-delivery bound
    * (an at-least-once bus re-sends within minutes; a re-crawl within
    * days) — a knob, not a constant. */
  def dedupWithinHorizon(docsStream: DataFrame, tsCol: String = "ingest_ts",
                         horizon: String = "2 hours"): DataFrame =
    hashedDocs(docsStream)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("lang", "content_hash")
      .select(col("doc_id"), col("lang"))

  def s10c_stream_dedup_watermarked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", $"text", $"lang").as[Doc].collect().toSeq
    val src = MemoryStream[Doc]
    // fixture docs carry no timestamps: synthesize deterministic ingest
    // times spanning <1h, inside the default 2h horizon
    val stamped = src.toDF().withColumn("ingest_ts",
      timestamp_seconds(lit(1700000000L) + col("doc_id") % 3600))
    runToMemory(spark, dedupWithinHorizon(stamped), "append") { query =>
      Seq(docs, docs).foreach { b => src.addData(b); query.processAllAvailable() }
    }.groupBy(col("lang")).agg(count(lit(1)).as("n_unique"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------- s11
  /** Streaming INTO the catalog — s01d's write-side twin: a file stream
    * of the events fixture lands in a managed graft table via
    * `foreachBatch { _.writeTo(tgt).append() }`, each microbatch an
    * atomic two-phase (FS → catalog) batch commit. foreachBatch is the
    * idiomatic stream→batch-sink bridge (Spark's own docs route
    * non-streaming sinks through it), and the graft append path gives
    * per-batch atomicity: a reader never sees a half-published
    * microbatch. Across RESTARTS the guarantee is the file sink's
    * at-least-once — a batch replayed after a crash between FS commit
    * and checkpoint write would append twice; the idempotent form is
    * content-keyed dedup downstream (s10's operator) or MERGE on a key
    * (q52's operator), both in the inventory. Gated on the batch
    * aggregate of the landed table equaling the events oracle. */
  def s11_stream_catalog_sink(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.ensure(spark, dir)
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s11_events_sink"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${graft.GraftBootstrap.CatalogName}.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val events = Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    events.limit(0).writeTo(tgt).create() // schema from the catalog, data from the stream
    val src = Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir), "ts")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    withShufflePartitions(spark, 4) {
      val query = src.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.writeTo(tgt).append()
        }
        .start()
      try query.processAllAvailable()
      finally query.stop()
    }
    spark.table(tgt)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- s15
  /** s11 rewritten as a NATIVE streaming write — no `foreachBatch`
    * bridge: `df.writeStream.toTable("graft.db.t")` resolves the
    * catalog table, sees its STREAMING_WRITE capability and drives
    * [[graft.catalog.write.GraftStreamingWrite]], whose every epoch is
    * the same two-phase (FS → catalog) batch commit s11 ran by hand —
    * plus the per-query epoch log that makes a restart-replayed epoch a
    * no-op (asserted with a genuine kill-after-sink-commit replay in
    * EventStreamsSpec). This is the first thing a streaming user tries,
    * and s01d's write-side twin. Gated on s11's oracle: every event in
    * the landed table exactly once. */
  def s15_stream_native_sink(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.ensure(spark, dir)
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s15_events_sunk"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${graft.GraftBootstrap.CatalogName}.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val events = Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    events.limit(0).writeTo(tgt).create() // schema from the catalog, data from the stream
    val src = Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir), "ts")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s15_ckpt_")
    try {
      withShufflePartitions(spark, 4) {
        val query = src.writeStream
          .option("checkpointLocation", ckpt.toString)
          .toTable(tgt)
        try query.processAllAvailable()
        finally query.stop()
      }
      spark.table(tgt)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
        .orderBy(col("event_type"))
    } finally {
      val fs = new Path(ckpt.toString)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(ckpt.toString), true)
    }
  }

  // ---------------------------------------------------------------- s16
  /** The COMPLETE catalog-native streaming pipe — s01d's read half
    * composed with s15's write half in one query:
    * `spark.readStream.table(src).writeStream.toTable(tgt)`, no path
    * and no schema handed anywhere (both resolve through the catalog;
    * source streams via [[graft.catalog.GraftTable.v1Table]]'s
    * FileStreamSource delegation, sink drives
    * [[graft.catalog.write.GraftStreamingWrite]]'s per-epoch two-phase
    * commit). This is the end-to-end shape a catalog-streaming user
    * runs — table-to-table CDC-less replication / tiering — and it
    * exercises the two halves' contract against each other: the
    * streamed schema the source reports must be exactly what the sink
    * validates. Gated on s11's oracle: every event lands exactly once.
    *
    * At 100 TB: the pipe inherits both halves' postures — the source
    * lists only new files per microbatch (file-stream log, not a
    * directory diff), the sink's epoch commit registers partitions +
    * stats atomically; neither holds stream state. */
  def s16_stream_catalog_pipe(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.ensure(spark, dir)
    val srcT = s"${graft.GraftBootstrap.CatalogName}.tmp.s16_events_src"
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s16_events_pipe"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${graft.GraftBootstrap.CatalogName}.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $srcT")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val events = Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    events.writeTo(srcT).create()      // the upstream table being tailed
    events.limit(0).writeTo(tgt).create()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s16_ckpt_")
    try {
      withShufflePartitions(spark, 4) {
        val query = spark.readStream.table(srcT)
          .writeStream
          .option("checkpointLocation", ckpt.toString)
          .toTable(tgt)
        try query.processAllAvailable()
        finally query.stop()
      }
      spark.table(tgt)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
        .orderBy(col("event_type"))
    } finally {
      val fs = new Path(ckpt.toString)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(ckpt.toString), true)
    }
  }

  // ---------------------------------------------------------------- s20
  /** Streaming ingest with INLINE COMPACTION maintenance — the ops loop
    * a continuously-ingested partitioned table actually needs, composed
    * from inventory pieces: each micro-batch appends through the
    * catalog write path (s11's sink), then the SAME trigger runs the
    * in-place compaction rewrite (q49's operator) so the table never
    * accumulates the per-batch × per-shuffle-partition small files that
    * otherwise grow without bound under continuous ingest (the classic
    * streaming-into-parquet pathology: a year of 1-minute triggers is
    * half a million files per partition before the first maintenance
    * job). Correct under the engine's own concurrency story: the append
    * releases the table's write permit before compaction takes its
    * lease, compaction's dynamic self-overwrite has no pre-delete
    * window, and a reader between trigger N and N+1 sees either the
    * fragmented or the compacted layout of the SAME rows — never a
    * partial swap ([[graft.operators.Compaction]]'s staging argument).
    *
    * Replay caveat: the per-trigger APPEND here is at-least-once —
    * foreachBatch re-delivers the in-flight batch after a query
    * restart, and a plain append would double-ingest it. The gate runs
    * checkpoint-less (no restart, so no replay); a production ingest
    * wanting restart-exactly-once keys the write like s12 (MERGE on
    * event_id), uses the native epoch-logged sink (s15), or guards on
    * batchId like s19 — the compaction composition is identical around
    * any of them.
    *
    * Gated on s11's oracle (every event exactly once regardless of the
    * rewrites) + EventStreamsSpec asserting the final layout is ONE
    * file per partition while the same ingest WITHOUT maintenance
    * fragments.
    *
    * At 100 TB: per-trigger compaction cost is proportional to the
    * partitions the batch touched times their current size, so the
    * production cadence compacts every Nth trigger or per closed
    * event-time partition (date-partitioned tables compact yesterday
    * once, exactly q49's maintenance posture); running it every trigger
    * here exercises the composition at maximum interleaving. */
  def s20_stream_ingest_compact(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.ensure(spark, dir)
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s20_events_ingest"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${graft.GraftBootstrap.CatalogName}.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val events = Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    events.limit(0).writeTo(tgt)
      .partitionedBy(col("event_type")).create()
    val tmp = java.nio.file.Files.createTempDirectory("graft_s20_")
    val tmpPath = tmp.toString
    try {
      val src = Tables.normalizeTs(
        spark.readStream.schema(schema).parquet(tmpPath), "ts")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      withShufflePartitions(spark, 4) {
        val query = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.writeTo(tgt).append()
            graft.operators.Compaction.compact(batch.sparkSession, tgt)
          }
          .start()
        try {
          (0 until 3).foreach { gen =>
            events.filter(col("event_id") % 3 === gen)
              .write.mode("append").parquet(tmpPath)
            query.processAllAvailable()
          }
        } finally query.stop()
      }
      spark.table(tgt)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
        .orderBy(col("event_type"))
    } finally {
      val fs = new Path(tmpPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(tmpPath), true)
    }
  }

  // ---------------------------------------------------------------- s22
  /** STREAMING vector-store ingest — q98's persisted IVF index
    * maintained per micro-batch (the third column of the streaming ×
    * maintenance matrix: stats q94→s19, layout q49→s20, index
    * q98→this): the index is built once on the base corpus (centroids
    * frozen as metadata), then each arriving embedding batch runs
    * [[graft.llm.Similarity.ivfIndexIngest]] inside the trigger —
    * assignment against the stored centroids plus an append into only
    * the touched bucket partitions, cost ∝ batch. Because assignment is
    * a deterministic function of (vector, frozen centroids), the
    * streamed index equals the all-at-once build EXACTLY whatever the
    * batch boundaries — EventStreamsSpec gates set equality, and the
    * final query result is the emitted surface (rows-only: q98's
    * oracle-expressibility class).
    *
    * 100 TB posture: q98's ingest argument per trigger; the stream
    * holds NO state (the index tables are the state), so this is the
    * vector-database ingestion loop — readers query the catalog index
    * between any two triggers and see a complete, consistent index of
    * everything committed so far. Restart-safe: `ivfIndexIngest` is
    * idempotent by vec_id (touched-bucket anti-join), so foreachBatch's
    * at-least-once replay after a crash re-delivers a batch into a
    * no-op instead of duplicate index rows (SimilaritySpec gates the
    * replay). */
  def s22_stream_ann_ingest(spark: SparkSession, dir: String): DataFrame = {
    import graft.llm.Similarity
    graft.GraftBootstrap.ensure(spark, dir)
    val cat = graft.GraftBootstrap.CatalogName
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tmp")
    val centT = s"$cat.tmp.s22_ivf_centroids"
    val idxT = s"$cat.tmp.s22_ivf_index"
    spark.sql(s"DROP TABLE IF EXISTS $centT")
    spark.sql(s"DROP TABLE IF EXISTS $idxT")
    val emb = Tables(spark, dir, "embeddings")
    val norm = Similarity.normalized(emb, "vec_id", "embedding")
    Similarity.ivfIndexBuild(spark, centT, idxT,
      norm.filter(col("vec_id") % 4 =!= 0))
    val tmp = java.nio.file.Files.createTempDirectory("graft_s22_")
    val tmpPath = tmp.toString
    try {
      emb.filter(col("vec_id") % 8 === 0).write.mode("append").parquet(tmpPath)
      val src = spark.readStream.schema(emb.schema).parquet(tmpPath)
      withShufflePartitions(spark, 4) {
        val query = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            Similarity.ivfIndexIngest(batch.sparkSession, centT, idxT,
              Similarity.normalized(batch, "vec_id", "embedding"))
          }
          .start()
        try {
          query.processAllAvailable()
          emb.filter(col("vec_id") % 8 === 4).write.mode("append").parquet(tmpPath)
          query.processAllAvailable()
        } finally query.stop()
      }
      Similarity.ivfIndexQuery(spark, centT, idxT,
        norm.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("q_id"), col("rank"))
    } finally {
      val fs = new Path(tmpPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(tmpPath), true)
    }
  }

  // ---------------------------------------------------------------- s21
  /** Streaming DISTRIBUTION-DRIFT monitor — q93's divergence diagnostic
    * run per micro-batch against a FROZEN baseline (the "crawler
    * started pulling spam" alarm, live): the reference token-bucket
    * histogram is computed ONCE before the stream starts (B rows,
    * broadcast), and each arriving document batch is tokenized, bucket-
    * counted and scored as KL(batch ‖ reference) with q93's exact
    * quantized-ln arithmetic ([[graft.llm.TextAnalysis
    * .klAgainstReference]]) — one emission row per batch generation,
    * collected as the monitor's alert stream (bounded: one row per
    * trigger). Per-trigger cost is the batch tokenize plus a broadcast
    * join with the B-row baseline; NOTHING rescans the reference corpus
    * — the monitor posture q93's offline form cannot provide.
    *
    * Hash-gated: generations are `doc_id % 3`, so the DuckDB oracle
    * restates every emission in SQL (q93's oracle with the generation
    * as the grouping key) — the streaming monitor must produce
    * EXACTLY the batch divergences, trigger boundaries notwithstanding.
    *
    * 100 TB posture: the baseline is B buckets (~4096 rows) however
    * large the reference corpus; batch cost ∝ batch tokens; emissions
    * are one row per trigger. State lives in the frozen baseline, not
    * the state store. */
  def s21_stream_drift_monitor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docsDf = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    // the frozen baseline distribution
    val refFeats = docsDf
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 4096)
    val refHist = refFeats.groupBy("bucket")
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val refTotal = refHist.agg(sum("c")).head().getLong(0)

    val emissions =
      collection.mutable.ListBuffer.empty[(Long, Long, Double)]
    val tmp = java.nio.file.Files.createTempDirectory("graft_s21_")
    val tmpPath = tmp.toString
    try {
      docsDf.filter(col("doc_id") % 3 === 0).write.mode("append").parquet(tmpPath)
      val src = spark.readStream.schema(docsDf.schema).parquet(tmpPath)
      withShufflePartitions(spark, 4) {
        val query = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            emissions ++= graft.llm.TextAnalysis
              .klAgainstReference(batch, "text",
                (col("doc_id") % 3).as("gen"), refHist, refTotal)
              .collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            ()
          }
          .start()
        try {
          query.processAllAvailable()
          docsDf.filter(col("doc_id") % 3 === 1).write.mode("append").parquet(tmpPath)
          query.processAllAvailable()
          docsDf.filter(col("doc_id") % 3 === 2).write.mode("append").parquet(tmpPath)
          query.processAllAvailable()
        } finally query.stop()
      }
      emissions.toSeq.toDF("gen", "n_tokens", "kl_est_nats")
        .orderBy(col("gen"))
    } finally {
      val fs = new Path(tmpPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(tmpPath), true)
    }
  }

  // ---------------------------------------------------------------- s12
  /** Streaming MERGE upsert into the catalog — the idempotent form of
    * s11's append sink (the exactly-once-by-key shape a production
    * ingest actually runs, because foreachBatch is at-least-once across
    * restarts): each microbatch MERGEs into the target on `event_id`,
    * so a replayed or corrected delivery UPDATEs in place instead of
    * appending a duplicate. Exercised with a two-generation file
    * stream: generation 1 is the initial load (all inserts); generation
    * 2 re-delivers every 10th event with a corrected (doubled) value —
    * the final table must hold each event exactly once, with the last
    * delivered values.
    *
    * At 100 TB: MERGE's per-batch cost is the COW group rewrite of
    * matched files only (q52's machinery) — partition the target by
    * event-time date so a correction batch rewrites only the dates it
    * touches, and size microbatches with `maxFilesPerTrigger`. State is
    * the target table itself; the stream holds none. */
  def s12_stream_merge_upsert(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.ensure(spark, dir)
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s12_events_upsert"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${graft.GraftBootstrap.CatalogName}.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val events = Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    events.limit(0).writeTo(tgt).create()
    val tmp = java.nio.file.Files.createTempDirectory("graft_s12_")
    val tmpPath = tmp.toString
    try {
      events.write.mode("append").parquet(tmpPath) // generation 1: initial load
      val src = spark.readStream.schema(events.schema).parquet(tmpPath)
      withShufflePartitions(spark, 4) {
        val query = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.createOrReplaceTempView("s12_merge_src")
            batch.sparkSession.sql(
              s"""MERGE INTO $tgt t USING s12_merge_src s
                 |ON t.event_id = s.event_id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *
                 |""".stripMargin)
            ()
          }
          .start()
        try {
          query.processAllAvailable()
          // generation 2: corrected re-delivery for every 10th event
          events.filter(col("event_id") % 10 === 0)
            .withColumn("value", col("value") * 2)
            .write.mode("append").parquet(tmpPath)
          query.processAllAvailable()
        } finally query.stop()
      }
      spark.table(tgt)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_value"))
        .orderBy(col("event_type"))
    } finally {
      val fs = new Path(tmpPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(tmpPath), true)
    }
  }

  // --------------------------------------------------------------- s10b
  /** s10 through the FILE stream source — the production ingestion
    * shape (s01c's pattern): `readStream.parquet` over a two-generation
    * directory, where generation 2 is the re-crawl landing the SAME
    * corpus as new part files after the stream has consumed generation
    * 1. No MemoryStream, no driver-side row staging — generations are
    * written by distributed jobs and discovered by the source's file
    * listing. `dropDuplicates` must add zero rows for generation 2;
    * the gated projection is the survivor-independent per-language
    * distinct-key count (same oracle as s10).
    *
    * Scale posture: state is one row per distinct (lang, 64-char hash);
    * a production ingest bounds it with `dropDuplicatesWithinWatermark`
    * over the ingest-time horizon. The file source itself scales by
    * listing only NEW files per microbatch (`maxFilesPerTrigger`
    * throttles backfill). */
  def s10b_stream_dedup_files(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.setSessionConfs(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_s10b_")
    val tmpPath = tmp.toString
    try {
      val docsDf = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      docsDf.write.mode("append").parquet(tmpPath) // generation 1
      val src = spark.readStream.schema(docsDf.schema).parquet(tmpPath)
      runToMemory(spark, ingestDedup(src), "append") { query =>
        query.processAllAvailable()
        docsDf.write.mode("append").parquet(tmpPath) // generation 2: re-crawl
        query.processAllAvailable()
      }.groupBy(col("lang")).agg(count(lit(1)).as("n_unique"))
        .orderBy(col("lang"))
    } finally {
      // repeated Verify/Bench invocations must not accumulate temp copies
      val fs = new Path(tmpPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(tmpPath), true)
    }
  }

  // ---------------------------------------------------------------- s13
  /** Streaming curation ingest — q65's streamable stages run
    * CONTINUOUSLY: quality floor (q34's score) then exact content dedup
    * (s10's keyed state), over a file-source stream with a generation-2
    * re-crawl that must add zero rows. Gate validity: the quality score
    * derives from the NORMALIZED token stream only (n_tokens,
    * stop_ratio — see withQuality), so every exact-duplicate variant of
    * a document scores identically; whether the filter sees the
    * eventual dedup survivor or a case/whitespace variant therefore
    * cannot change the outcome, and the s10-style survivor-independent
    * projection (per-language distinct-key counts among
    * quality-passers) stays well-defined under nondeterministic arrival
    * order. The decontamination stage deliberately stays batch
    * (q57/q65): it needs the full probe corpus, not per-row state.
    *
    * Scale posture: the quality stage is stateless row-local columnar
    * work; dedup state is one row per distinct SURVIVING key — the
    * quality floor shrinks state, never grows it — and production
    * bounds it with [[dedupWithinHorizon]]'s watermark expiry; the file
    * source lists only new files per trigger. */
  private def curateStream(docsStream: DataFrame): DataFrame =
    graft.llm.TextAnalysis.withQuality(hashedDocs(docsStream), "text")
      .filter(col("quality") >= 0.5)
      .dropDuplicates("lang", "content_hash")
      .select(col("doc_id"), col("lang"))

  def s13_stream_curate(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.setSessionConfs(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_s13_")
    val tmpPath = tmp.toString
    try {
      val docsDf = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      docsDf.write.mode("append").parquet(tmpPath) // generation 1
      val src = spark.readStream.schema(docsDf.schema).parquet(tmpPath)
      runToMemory(spark, curateStream(src), "append") { query =>
        query.processAllAvailable()
        docsDf.write.mode("append").parquet(tmpPath) // generation 2: re-crawl
        query.processAllAvailable()
      }.groupBy(col("lang")).agg(count(lit(1)).as("n_keep"))
        .orderBy(col("lang"))
    } finally {
      val fs = new Path(tmpPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(tmpPath), true)
    }
  }

  // ---------------------------------------------------------------- s14
  /** Band-bucket rows for the streaming near-dup operator: ROW-LOCAL
    * minhash signatures (`array_min` over the salted-hash transform of
    * the doc's own shingle array — no explode, no pre-aggregation, so
    * the streaming plan has NO stateful stage before the bucket state
    * machine; the batch form in [[graft.llm.Dedup]] aggregates because
    * its shingle rows are shared with exact verification), then the
    * same `hash(bandComponents :+ bandIndex)` banding key q29 uses,
    * exploded to one row per (band, doc). Docs with no shingles
    * (< n tokens) are routed around banding — nothing to compare.
    * Usable on a batch OR streaming frame (the spec's reference runs it
    * in batch). Expects (doc_id, text, lang, seq). */
  private[streaming] def bandedDocs(docs: DataFrame, n: Int, bands: Int,
      rowsPerBand: Int, carryTs: Boolean = false): DataFrame = {
    val k = bands * rowsPerBand
    // codegen'd one-pass signature — the HOF form (k array_min·transform
    // lambdas) was this query's dominant cost; see MinHashSig's scaladoc
    val sigExpr = {
      import org.apache.spark.sql.graft.GraftSqlBridge.{column, expression}
      column(graft.functions.MinHashSig(expression(col("hs")), k))
    }
    // No-shingle docs are dropped through NULLNESS, not a filter:
    // MinHashSig yields NULL on an empty hash array, the guarded band
    // keys inherit the null, and non-outer posexplode emits zero rows
    // for it. An explicit `filter(size(hs) > 0)` here was a measured
    // 20× regression — predicate pushdown clones the whole
    // tokenize→shingle→hash chain into a pre-projection Filter (and the
    // scan's data filters), re-evaluating it per row outside codegen.
    val bandKeys = when(col("sig").isNotNull,
      array((0 until bands).map { b =>
        hash((0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)) :+ lit(b): _*)
      }: _*))
    docs
      .filter(col("text").isNotNull)
      // materialize toks/hs before the lambdas that consume them —
      // Catalyst does no CSE inside lambda bodies (the shingleRows 10×
      // lesson)
      .withColumn("toks", graft.llm.TextOps.tokens(col("text")))
      .withColumn("hs",
        transform(graft.llm.TextOps.shingles(col("toks"), n), s => xxhash64(s)))
      .withColumn("sig", sigExpr)
      .select(Seq(col("doc_id"), col("lang"), col("seq"),
        posexplode(bandKeys).as(Seq("band", "key")), col("sig")) ++
        (if (carryTs) Seq(col("event_ts")) else Nil): _*)
  }

  /** Streaming cross-batch NEAR-duplicate suppression — q59's
    * incremental-ingest semantics as a CONTINUOUS operator: a document
    * is flagged `dup` when any LSH band bucket it hashes into already
    * holds an earlier document whose minhash-estimated Jaccard reaches
    * `tau` (or the same doc_id — an exact re-delivery). First
    * occurrences claim their buckets; state carries bucket membership
    * across microbatch boundaries, so a near-dup arriving hours after
    * its original is still caught — the continuous form of the
    * NEW×PREV restriction.
    *
    * Determinism: batches replayed in (seq, doc_id) order give exactly
    * the sequential one-pass result — each bucket's members accrete in
    * global order and `find` compares against the EARLIEST match — so
    * the spec gates streaming-vs-batch-reference EQUALITY, not just
    * properties. The estimate is minhash agreement (k components ⇒
    * granularity 1/k); exactness lives in batch q28/q29 — this operator
    * is the ingest-time gatekeeper in front of them.
    *
    * Oracle-expressibility (why the driver gate is rows-only, q30's
    * class): the walk itself IS SQL-expressible — because membership
    * accretes for every first occurrence regardless of its own verdict,
    * flagging reduces to an order-free exists-earlier equality join
    * (doc flagged ⟺ some banded row shares a (band, key) bucket with an
    * earlier row at agreement ≥ tau, or an earlier row of the same id);
    * EventStreamsSpec executes that declarative form and gates it equal
    * to the sequential walk, so no recursive CTE is even needed. What
    * DuckDB cannot replicate is the SIGNATURE family: Spark's
    * int-salted xxhash64 components and murmur3 band keys have no
    * DuckDB equivalents, and swapping the family for an
    * oracle-friendly polynomial hash would re-roll q29's verified
    * designed-miss bound (see its oracle's fixture-regeneration caveat)
    * while gating a code path the library doesn't ship. Hence: verdicts
    * rows-only at the driver, walk-semantics hash-tight in ScalaTest.
    *
    * Scale posture: signatures are row-local columnar work (no shuffle
    * before the state machine); state is partitioned by the (band, key)
    * group key across executors and holds bucket members as (id, k
    * longs) — never text; bucket occupancy is the (bands × rowsPerBand)
    * knob, and a production deployment adds `GroupStateTimeout` expiry
    * for a bounded re-delivery horizon (s10c's watermark argument) plus
    * periodic state compaction to the batch index. The verdict stream
    * is append-only — sinkable, joinable, auditable (`dup_of` names the
    * witness). */
  def streamNearDupVerdicts(docsStream: DataFrame, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2, tau: Double = 0.8): DataFrame = {
    import docsStream.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    bandedDocs(docsStream, n, bands, rowsPerBand).as[BandDoc]
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[BucketMembers, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        val inOrder = rows.toSeq.sortBy(r => (r.seq, r.doc_id))
        var members = state.getOption.map(_.members.toVector).getOrElse(Vector.empty)
        val out = inOrder.map { r =>
          val redelivery = members.exists(_.doc_id == r.doc_id)
          lazy val hit = members.find { m =>
            m.sig.iterator.zip(r.sig.iterator).count { case (a, b) => a == b }
              .toDouble / r.sig.size >= tau
          }
          val verdict =
            if (redelivery) BandVerdict(r.doc_id, r.lang, r.seq, dup = true, r.doc_id)
            else hit match {
              case Some(m) => BandVerdict(r.doc_id, r.lang, r.seq, dup = true, m.doc_id)
              case None    => BandVerdict(r.doc_id, r.lang, r.seq, dup = false, -1L)
            }
          if (!redelivery) members :+= BucketMember(r.doc_id, r.sig)
          verdict
        }
        if (members.nonEmpty) state.update(BucketMembers(members))
        out.iterator
      }.toDF()
  }

  /** s14 with BOUNDED state — the `GroupStateTimeout` expiry the s14
    * scaladoc names as the production posture, as code (s10c's
    * argument applied to the bucket state machine): each bucket arms an
    * EVENT-TIME timeout at (newest member's ingest time + horizon);
    * once the watermark passes it, the bucket's members are dropped —
    * state is O(buckets touched within the horizon), not O(corpus).
    * The horizon is the deployment's re-delivery/duplication window
    * (an at-least-once bus re-sends within minutes; a re-crawl within
    * days): a near-dup arriving INSIDE it is suppressed exactly as
    * s14; one arriving after expiry is admitted — the declared
    * trade-off of bounding state, proven both ways in
    * EventStreamsSpec. Expects (doc_id, text, lang, seq, `tsCol`). */
  def streamNearDupVerdictsExpiring(docsStream: DataFrame, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2, tau: Double = 0.8,
      tsCol: String = "ingest_ts", horizonMs: Long = 2L * 3600 * 1000): DataFrame = {
    import docsStream.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val stamped = docsStream
      .withWatermark(tsCol, s"$horizonMs milliseconds")
      // alias keeps the watermark metadata on the carried attribute
      .withColumn("event_ts", col(tsCol))
    bandedDocs(stamped, n, bands, rowsPerBand, carryTs = true).as[BandDocT]
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[BucketMembersT, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) { (_, rows, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val inOrder = rows.toSeq.sortBy(r => (r.seq, r.doc_id))
          val prev = state.getOption
          var members = prev.map(_.members.toVector).getOrElse(Vector.empty)
          var maxTs = prev.map(_.maxTsMs).getOrElse(Long.MinValue)
          val out = inOrder.map { r =>
            val redelivery = members.exists(_.doc_id == r.doc_id)
            lazy val hit = members.find { m =>
              m.sig.iterator.zip(r.sig.iterator).count { case (a, b) => a == b }
                .toDouble / r.sig.size >= tau
            }
            val verdict =
              if (redelivery) BandVerdict(r.doc_id, r.lang, r.seq, dup = true, r.doc_id)
              else hit match {
                case Some(m) => BandVerdict(r.doc_id, r.lang, r.seq, dup = true, m.doc_id)
                case None    => BandVerdict(r.doc_id, r.lang, r.seq, dup = false, -1L)
              }
            if (!redelivery) members :+= BucketMember(r.doc_id, r.sig)
            maxTs = math.max(maxTs, r.event_ts.getTime)
            verdict
          }
          state.update(BucketMembersT(members, maxTs))
          state.setTimeoutTimestamp(maxTs + horizonMs)
          out.iterator
        }
      }.toDF()
  }

  def s14b_stream_near_dedup_expiring(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // s10c's stamping: deterministic ingest times spanning <1h, inside
    // the default 2h horizon — so nothing expires during the replay and
    // the bounded-state form must converge to s14's answer (asserted in
    // EventStreamsSpec; the expiry path itself is proven there with a
    // watermark pushed past the horizon).
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", $"text", $"lang").as[Doc].collect().toSeq
      .sortBy(_.doc_id)
    val half = (docs.size + 1) / 2
    val src = MemoryStream[SeqDoc]
    val stamped = streamNearDupVerdictsExpiring(
      src.toDF().withColumn("ingest_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 3600)))
    val verdicts = runToMemory(spark, stamped, "append") { query =>
      Seq(docs.take(half), docs.drop(half)).zipWithIndex.foreach { case (b, i) =>
        src.addData(b.map(d => SeqDoc(d.doc_id, d.text, d.lang, i.toLong)))
        query.processAllAvailable()
      }
    }
    // Self-witness verdicts (dup_of = doc_id) mark an exact RE-DELIVERY
    // of a doc whose original delivery was kept — excluding them keeps
    // survivorship keyed by the original, not conflated with it.
    val flagged = verdicts
      .filter(col("dup") && col("dup_of") =!= col("doc_id"))
      .select(col("doc_id")).distinct()
    Tables(spark, dir, "documents")
      .join(flagged, Seq("doc_id"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang"))
  }

  def s14_stream_near_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Two ingest generations split by doc_id: cross-half near-dup pairs
    // exercise the cross-batch state path.
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", $"text", $"lang").as[Doc].collect().toSeq
      .sortBy(_.doc_id)
    val half = (docs.size + 1) / 2
    val src = MemoryStream[SeqDoc]
    val verdicts = runToMemory(spark,
      streamNearDupVerdicts(src.toDF()), "append") { query =>
      Seq(docs.take(half), docs.drop(half)).zipWithIndex.foreach { case (b, i) =>
        src.addData(b.map(d => SeqDoc(d.doc_id, d.text, d.lang, i.toLong)))
        query.processAllAvailable()
      }
    }
    // Survivors: every ingested doc not flagged in any bucket (docs too
    // short to band have nothing to compare and are trivially kept).
    // Self-witness verdicts (dup_of = doc_id) mark an exact RE-DELIVERY
    // of a doc whose original delivery was kept — excluded so a replay
    // with re-deliveries cannot anti-join away the original.
    val flagged = verdicts
      .filter(col("dup") && col("dup_of") =!= col("doc_id"))
      .select(col("doc_id")).distinct()
    Tables(spark, dir, "documents")
      .join(flagged, Seq("doc_id"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------- s17
  /** s17's state machine, housed in its own SERIALIZABLE object: the
    * `flatMapGroupsWithState` closure ships to executors, and a lambda
    * that reached back into the (non-serializable) enclosing
    * EventStreams object for helpers would fail closure cleaning. */
  private[streaming] object CappedSessions extends Serializable {
    val GapMicros: Long = 10L * 60 * 1000000
    val Cap = 5

    def tsMicros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    def microsToLdt(us: Long): LocalDateTime =
      LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC)

    /** Spark's `round(x*100)/100` for DoubleType is
      * `BigDecimal.valueOf(x*100).setScale(0, HALF_UP)` — the state
      * machine quantizes its running sum with the identical rule so
      * s17's emissions hash-match q89's batch aggregate under the
      * shared oracle. */
    def r2Driver(x: Double): Double =
      java.math.BigDecimal.valueOf(x * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 100

    def close(user: Long, c: OpenChunk): CappedSession =
      CappedSession(user, microsToLdt(c.startMicros), microsToLdt(c.lastMicros),
        c.n, c.types.size.toLong, r2Driver(c.sum))

    def update(
        user: Long, events: Iterator[TsEvent],
        state: org.apache.spark.sql.streaming.GroupState[OpenChunk]): Iterator[CappedSession] =
      if (state.hasTimedOut) {
        val out = close(user, state.get)
        state.remove()
        Iterator.single(out)
      } else {
        val inOrder = events.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
        val out = Seq.newBuilder[CappedSession]
        var open = state.getOption
        inOrder.foreach { e =>
          val t = tsMicros(e.ts)
          open match {
            case Some(c) if t - c.lastMicros >= GapMicros || c.n >= Cap =>
              out += close(user, c)
              open = Some(OpenChunk(t, t, 1, Seq(e.event_type), e.value))
            case Some(c) =>
              val types =
                if (c.types.contains(e.event_type)) c.types
                else c.types :+ e.event_type
              open = Some(OpenChunk(c.startMicros, t, c.n + 1, types,
                c.sum + e.value))
            case None =>
              open = Some(OpenChunk(t, t, 1, Seq(e.event_type), e.value))
          }
        }
        open.foreach { c =>
          state.update(c)
          // An idle session times out at last-event + gap; never in the
          // past (setTimeoutTimestamp rejects ≤ watermark, and a chunk
          // whose horizon already passed should flush at the next
          // watermark tick).
          state.setTimeoutTimestamp(
            math.max(c.lastMicros / 1000 + GapMicros / 1000,
              state.getCurrentWatermarkMs() + 1))
        }
        out.result().iterator
      }
  }

  /** CAPPED sessionization as a `flatMapGroupsWithState` state machine —
    * q89's streaming twin, and the semantics `session_window` cannot
    * express: a session chunk closes when the next event is ≥ 10 minutes
    * away (s03's gap rule) OR when it already holds 5 events (the cap
    * that bounds bot bursts). The cap decision depends on how many
    * events the CURRENT chunk kept — recursive state no windowed
    * aggregation states — so the per-user state is the open chunk, and
    * idle sessions are closed by an EVENT-TIME TIMEOUT at
    * `last event + gap` once the watermark passes (the s05 sentinel
    * flushes the tail in the trailing no-data microbatch).
    *
    * Replay drives 3 ts-ordered microbatches; the state (open chunk +
    * island clock) carries sessions across batch boundaries, so the
    * result equals one global pass — exactly q89's batch answer, gated
    * by the SAME DuckDB oracle.
    *
    * Scale posture: state is one bounded chunk per ACTIVE user (≤ cap
    * counters + the small type set), partitioned by the group key; the
    * event-time timeout is the eviction policy — a user idle past the
    * gap leaves the store entirely, so state tracks concurrent activity,
    * not the corpus. */
  def s17_stream_capped_sessions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val sorted = collectEvents(spark, dir)
      .sortBy(e => (micros(e.ts), e.event_id))
    val maxTs = sorted.map(_.ts).max(Ordering.fromLessThan[LocalDateTime](_.isBefore(_)))
    val sentinel = Event(-1L, maxTs.plusDays(1), -1L, "zzz_flush", 0.0)
    val batchSize = math.max(1, (sorted.size + 2) / 3)
    val batches = sorted.grouped(batchSize).toSeq :+ Seq(sentinel)

    val src = MemoryStream[Event]
    val sessions = runToMemory(spark, cappedSessionTransform(src.toDF()),
      "append") { query =>
      batches.foreach { b => src.addData(b); query.processAllAvailable() }
    }
    sessions.filter(col("user_id") =!= -1L)
      .orderBy(col("user_id"), col("session_start"))
  }

  /** s17's streaming transform (exposed for the spec's plan pin):
    * watermark → keyed state machine — nothing else. */
  private[streaming] def cappedSessionTransform(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import df.sparkSession.implicits._
    df.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .as[TsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenChunk, CappedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        CappedSessions.update _)
      .toDF()
  }

  // ---------------------------------------------------------------- s18
  /** s18's state machine (serializable for the executor closure, the
    * [[CappedSessions]] rule). Rows arrive per-user; within a batch they
    * are sorted by event time, and the replay feeds batches in global
    * event-time order, so a single "latest dimension row" per user IS
    * the as-of join state. */
  private[streaming] object TemporalJoin extends Serializable {
    /** The dimension-stream membership rule (every 10th event is a
      * rate update; the rest are facts to enrich). */
    def isDim(id: Long): Boolean = id % 10 == 0

    /** Default idle horizon for state eviction: 90 days — comfortably
      * past the fixture's 30-day span (so the ASOF oracle is provably
      * unchanged) while still bounding state to the ACTIVE user set at
      * 100 TB. A deployment sets it to its dimension-staleness SLA. */
    val DefaultHorizonMs: Long = 90L * 24 * 3600 * 1000

    def update(horizonMs: Long)(
        user: Long, events: Iterator[TsEvent],
        state: org.apache.spark.sql.streaming.GroupState[DimState]): Iterator[Enriched] = {
      // idle-horizon eviction (the s14b pattern): once the watermark
      // passes (last activity + horizon), the user's dimension row is
      // dropped — a fact arriving after expiry re-enriches as NULL,
      // the declared trade of bounding state to active users
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // Dimension rows sort BEFORE facts at an equal timestamp: the
        // inclusive as-of rule (fact.ts >= dim.ts) grants a same-instant
        // dimension update to the fact regardless of event_id assignment.
        val inOrder = events.toSeq.sortBy(e =>
          (CappedSessions.tsMicros(e.ts), if (isDim(e.event_id)) 0 else 1, e.event_id))
        val out = Seq.newBuilder[Enriched]
        var dim = state.getOption
        var lastActivityMicros = Long.MinValue
        inOrder.foreach { e =>
          val t = CappedSessions.tsMicros(e.ts)
          lastActivityMicros = math.max(lastActivityMicros, t)
          if (isDim(e.event_id)) dim = Some(DimState(e.event_id, t, e.value))
          else out += Enriched(e.event_id, CappedSessions.microsToLdt(t), user,
            e.value, dim.map(_.event_id), dim.map(_.value))
        }
        dim.foreach { d =>
          state.update(d)
          // armed at ACTIVITY + horizon (facts refresh it too: an idle
          // user is one with no events at all, not just no dim updates)
          state.setTimeoutTimestamp(
            math.max(lastActivityMicros, d.tsMicros) / 1000L + horizonMs)
        }
        out.result().iterator
      }
    }
  }

  /** Streaming TEMPORAL (event-time as-of) enrichment — the Flink
    * "temporal table join" / CDC-enrichment shape Structured Streaming
    * has no built-in operator for: every FACT event joins the most
    * recent DIMENSION update (here: every 10th event is a rate update)
    * with `dim.ts <= fact.ts` for the same user. s08's stream-static
    * join re-reads a FROZEN dimension per microbatch; s07's interval
    * join buffers BOTH sides and emits every pair in the window; the
    * temporal join wants exactly one row — the dimension AS OF the
    * fact's event time — which is a per-key latest-value state machine,
    * not a symmetric join.
    *
    * State is ONE dimension row per user (the latest seen): under the
    * event-time-ordered replay a fact can enrich immediately — no
    * buffering, no timeout, no sentinel. A production feed with
    * out-of-order arrival buffers facts until the watermark passes
    * their timestamp before consulting the dimension state (the s05
    * machinery composed with this one); the ordered replay documents
    * the exact same join semantics without the wait.
    *
    * Hash-gated against DuckDB's NATIVE `ASOF LEFT JOIN` — the oracle
    * is the textbook statement of the operator. The fixture has no
    * duplicate (user, ts) pairs, so inclusive-vs-exclusive at equal
    * timestamps cannot bite.
    *
    * Scale posture: state is one small row per user key, sharded by
    * group key; dimension updates replace in place, and the idle-horizon
    * EVENT-TIME timeout drops users whose last activity the watermark
    * passed by the horizon — state tracks the ACTIVE user set, not the
    * user universe (expiry + post-expiry NULL re-enrichment gated in
    * EventStreamsSpec; the 90-day default exceeds the fixture span, so
    * the ASOF oracle is unchanged). The event-time timeout requires a
    * watermark, and the watermark doubles as the late-data filter:
    * facts later than the transform's `lateThresholdMs` (default 1 h)
    * are dropped, not enriched — callers feeding out-of-order data
    * size that parameter to their lateness SLA or use s18b's buffered
    * variant. */
  def s18_stream_temporal_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sorted = collectEvents(spark, dir)
      .sortBy(e => (micros(e.ts), e.event_id))
    val batchSize = math.max(1, (sorted.size + 2) / 3)
    val batches = sorted.grouped(batchSize).toSeq

    val src = MemoryStream[Event]
    val enriched = runToMemory(spark, temporalJoinTransform(src.toDF()),
      "append") { query =>
      batches.foreach { b => src.addData(b); query.processAllAvailable() }
    }
    enriched.orderBy(col("event_id"))
  }

  /** s18's streaming transform (exposed for the spec's plan pin): one
    * keyed state machine, NO join operator anywhere — the as-of
    * semantics live entirely in the per-key latest-value state, bounded
    * by the idle-horizon EVENT-TIME timeout (users whose last activity
    * the watermark passed by `horizonMs` drop their dimension row; a
    * later fact re-enriches as NULL — expiry gated in
    * EventStreamsSpec).
    *
    * LATE-DROP semantics: `EventTimeTimeout` requires a watermark, and
    * the watermark is also Structured Streaming's late-data filter —
    * facts arriving more than `lateThresholdMs` behind the stream's max
    * event time are DROPPED before the state machine sees them, not
    * enriched. The threshold is therefore a caller-visible parameter
    * (default 1 hour), independent of `horizonMs` (which governs how
    * long an idle user's dimension state survives, a much longer
    * scale). It is inert under the gate's event-time-ordered replay
    * (nothing ever arrives late); out-of-order feeds use s18b, which
    * buffers under the same watermark instead of dropping. */
  private[streaming] def temporalJoinTransform(df: DataFrame,
      horizonMs: Long = TemporalJoin.DefaultHorizonMs,
      lateThresholdMs: Long = 3600L * 1000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import df.sparkSession.implicits._
    df.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$lateThresholdMs milliseconds")
      .as[TsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DimState, Enriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        TemporalJoin.update(horizonMs) _)
      .toDF()
  }

  // --------------------------------------------------------------- s18b
  /** s18b's state machine: the temporal join under OUT-OF-ORDER
    * delivery — the watermark fact-buffering s18's scaladoc describes,
    * implemented. Per user the state is (held events not yet passed by
    * the watermark, latest applied dimension). Each invocation drains
    * the RIPE prefix — events with `ts <= watermark` — in event-time
    * order (dimension rows first at an equal instant, [[TemporalJoin]]'s
    * inclusive as-of rule): by the watermark contract every event at or
    * below the watermark has arrived, so the drained prefix is complete
    * and each fact's as-of dimension is final. Held events with
    * `ts > watermark` cannot influence a ripe fact (their timestamps are
    * strictly later), so draining early is safe, and an event-time
    * timeout at the earliest held timestamp re-invokes the key when the
    * watermark passes it. State is bounded by the watermark delay ×
    * per-user arrival rate — the standard stream-buffer bound — and
    * carries ONE dimension row beyond it. */
  private[streaming] object TemporalJoinOoo extends Serializable {
    def update(
        user: Long, events: Iterator[TsEvent],
        state: org.apache.spark.sql.streaming.GroupState[TemporalBuf]): Iterator[Enriched] = {
      val prev = state.getOption.getOrElse(TemporalBuf(Seq.empty, None))
      val wmMicros = state.getCurrentWatermarkMs() * 1000L
      val all = prev.held ++ events
      val (ripe, held) = all.partition(e => CappedSessions.tsMicros(e.ts) <= wmMicros)
      var dim = prev.dim
      val out = Seq.newBuilder[Enriched]
      ripe.sortBy(e => (CappedSessions.tsMicros(e.ts),
          if (TemporalJoin.isDim(e.event_id)) 0 else 1, e.event_id))
        .foreach { e =>
          val t = CappedSessions.tsMicros(e.ts)
          if (TemporalJoin.isDim(e.event_id)) dim = Some(DimState(e.event_id, t, e.value))
          else out += Enriched(e.event_id, CappedSessions.microsToLdt(t), user,
            e.value, dim.map(_.event_id), dim.map(_.value))
        }
      state.update(TemporalBuf(held, dim))
      if (held.nonEmpty) {
        // Wake this key when the watermark passes the earliest held
        // event (never ≤ the current watermark — the API rejects that).
        val minHeldMs = held.map(e => CappedSessions.tsMicros(e.ts)).min / 1000L
        state.setTimeoutTimestamp(
          math.max(minHeldMs, state.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }
  }

  /** Streaming temporal join under OUT-OF-ORDER delivery — s18's
    * operator composed with watermark buffering (the production posture
    * s18's scaladoc documents). The replay perturbs the feed with a
    * deterministic per-event jitter of up to ±[[OooJitterMicros]] and
    * streams in PERTURBED order, so batches interleave facts and
    * dimension updates across event time; the 2-hour watermark delay
    * strictly dominates the 2×30-minute inversion bound, so no event is
    * ever late behind the watermark and the drained prefix is always
    * complete. A far-future DIMENSION sentinel (emits nothing) pushes
    * the final watermark past the corpus; the trailing no-data
    * microbatch fires the event-time timeouts that flush every held
    * buffer. Gated on the SAME DuckDB native `ASOF LEFT JOIN` oracle as
    * s18: arrival order must not change the answer.
    *
    * Scale posture: per-key state is the watermark-deep arrival buffer
    * plus one dimension row, sharded by user key; eviction is the
    * watermark itself — exactly the bound a production out-of-order
    * feed pays in any streaming engine. */
  def s18b_stream_temporal_join_ooo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = collectEvents(spark, dir)
    val perturbed = events.sortBy(e =>
      (micros(e.ts) + oooJitter(e.event_id), e.event_id))
    val maxTs = events.map(e => micros(e.ts)).max
    // Dimension-row sentinel (event_id % 10 == 0) for a user outside the
    // fixture: advances the watermark, emits no output row.
    val sentinel = Event(-10L,
      CappedSessions.microsToLdt(maxTs + 3L * 3600 * 1000000L), -1L, "zzz_flush", 0.0)
    val batchSize = math.max(1, (perturbed.size + 4) / 5)
    val batches = perturbed.grouped(batchSize).toSeq :+ Seq(sentinel)

    val src = MemoryStream[Event]
    val enriched = runToMemory(spark, temporalJoinOooTransform(src.toDF()),
      "append") { query =>
      batches.foreach { b => src.addData(b); query.processAllAvailable() }
    }
    enriched.filter(col("user_id") =!= -1L).orderBy(col("event_id"))
  }

  /** Deterministic per-event arrival jitter in (−30 min, +30 min) —
    * a splitmix-style hash of the event id, so the perturbed order is
    * reproducible run-to-run (no RNG). */
  private[streaming] def oooJitter(id: Long): Long = {
    var h = id * 0x9E3779B97F4A7C15L
    h ^= (h >>> 31)
    java.lang.Long.remainderUnsigned(h, 2L * OooJitterMicros + 1) - OooJitterMicros
  }
  private[streaming] val OooJitterMicros: Long = 30L * 60 * 1000000

  /** s18b's streaming transform (exposed for the spec's plan pin):
    * watermark → ONE keyed state machine, still no join operator. */
  private[streaming] def temporalJoinOooTransform(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import df.sparkSession.implicits._
    df.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .as[TsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TemporalBuf, Enriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        TemporalJoinOoo.update _)
      .toDF()
  }

  // ---------------------------------------------------------------- s19
  /** STREAMING incremental rollup — q94's maintenance loop driven per
    * micro-batch: the hand-built streaming materialized view. Each
    * micro-batch of documents aggregates to per-source PARTIALS
    * (count + token sum, cost ∝ batch) which MERGE arithmetically into
    * the catalog stats table (matched sources ADD deltas, unseen
    * INSERT). Complete-mode streaming aggregation would hold every
    * source's running state in the state store AND rewrite the whole
    * sink each trigger; here the state IS the queryable catalog table
    * and each trigger touches one batch + one stats-table-sized merge.
    *
    * Exactly-once: an ADD-delta merge is NOT idempotent by itself
    * (s12's upsert-by-key is), and foreachBatch is an at-least-once
    * contract — a crash between the merge commit and the checkpoint
    * write replays the batch. The guard is the `last_batch_id` column
    * recorded IN the stats row BY THE SAME atomic MERGE that adds the
    * deltas ([[s19MergeStats]]): a replayed batch matches rows whose
    * `last_batch_id` already covers it and the conditional MATCHED
    * clause skips the ADD — the same descriptor-transactional idea as
    * the native sink's per-query epoch log (s15,
    * [[graft.catalog.write.GraftStreamingWrite]]), carried per-row
    * because the merge touches only the sources present in the batch.
    * EventStreamsSpec replays a committed batch (the crash-after-commit
    * schedule) and asserts no double-ADD. Gated on q94's oracle: the
    * maintained table must equal the full recompute. */
  def s19_stream_incremental_rollup(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftBootstrap.ensure(spark, dir)
    val tgt = s"${graft.GraftBootstrap.CatalogName}.tmp.s19_source_stats"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${graft.GraftBootstrap.CatalogName}.tmp")
    spark.sql(s"DROP TABLE IF EXISTS $tgt")
    val docs = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("text"))
    def stats(df: DataFrame): DataFrame = s19Partials(df)
    stats(docs).limit(0)
      .withColumn("last_batch_id", lit(-1L))
      .writeTo(tgt).create()
    val tmp = java.nio.file.Files.createTempDirectory("graft_s19_")
    val tmpPath = tmp.toString
    try {
      docs.filter(col("doc_id") % 3 === 0).write.mode("append").parquet(tmpPath)
      val src = spark.readStream.schema(docs.schema).parquet(tmpPath)
      withShufflePartitions(spark, 4) {
        val query = src.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            s19MergeStats(batch.sparkSession, tgt, stats(batch), batchId)
          }
          .start()
        try {
          query.processAllAvailable()
          docs.filter(col("doc_id") % 3 === 1).write.mode("append").parquet(tmpPath)
          query.processAllAvailable()
          docs.filter(col("doc_id") % 3 === 2).write.mode("append").parquet(tmpPath)
          query.processAllAvailable()
        } finally query.stop()
      }
      spark.table(tgt)
        .select(col("source"), col("n_docs"), col("n_tokens"))
        .orderBy(col("source"))
    } finally {
      val fs = new Path(tmpPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(tmpPath), true)
    }
  }

  /** s19's per-batch partial aggregate (exposed for the spec's plan
    * pin): ONE hash aggregate over the batch — no window, no join — so
    * per-trigger cost is proportional to the batch, never the corpus. */
  private[streaming] def s19Partials(df: DataFrame): DataFrame = df
    .select(col("source"), graft.llm.TextOps.tokens(col("text")).as("toks"))
    .groupBy(col("source"))
    .agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("n_tokens"))

  /** s19's idempotent delta-merge: ONE atomic MERGE both adds the batch
    * partials and records the batchId in the touched rows. The
    * conditional MATCHED clause (`t.last_batch_id < batchId`) makes a
    * replayed batch a no-op: foreachBatch replays with the same batchId
    * and the same offsets-derived data, every source it touched already
    * carries `last_batch_id >= batchId`, and the NOT-MATCHED arm cannot
    * fire because those sources now exist. Batch ids are strictly
    * increasing across a query's life (including restarts), so `<` is
    * the correct guard. Exposed for the spec's crash-after-commit
    * replay gate. */
  private[streaming] def s19MergeStats(
      spark: SparkSession, tgt: String, partials: DataFrame,
      batchId: Long): Unit = {
    val view = s"s19_partials_b$batchId"
    partials.createOrReplaceTempView(view)
    spark.sql(
      s"""MERGE INTO $tgt t USING $view b
         |ON t.source = b.source
         |WHEN MATCHED AND t.last_batch_id < ${batchId}L THEN UPDATE SET
         |  n_docs = t.n_docs + b.n_docs,
         |  n_tokens = t.n_tokens + b.n_tokens,
         |  last_batch_id = ${batchId}L
         |WHEN NOT MATCHED THEN INSERT (source, n_docs, n_tokens, last_batch_id)
         |  VALUES (b.source, b.n_docs, b.n_tokens, ${batchId}L)
         |""".stripMargin)
    spark.catalog.dropTempView(view)
    ()
  }

  /** Driver-side reference for s06 — one global greedy pass (used by the
    * spec to gate the streaming result). */
  private[streaming] def throttleReference(events: Seq[Event]): Seq[Emitted] =
    events.sortBy(e => (micros(e.ts), e.event_id))
      .groupBy(_.user_id).toSeq
      .flatMap { case (user, evs) =>
        var last = Long.MinValue
        evs.flatMap { e =>
          val t = micros(e.ts)
          if (last == Long.MinValue || t - last >= 10L * 60 * 1000000) {
            last = t; Some(Emitted(user, e.event_id, e.ts))
          } else None
        }
      }
      .sortBy(e => (e.user_id, micros(e.ts), e.event_id))

  /** Public variant of [[collectEvents]] for the spec. */
  private[streaming] def eventsFor(spark: SparkSession, dir: String): Seq[Event] =
    collectEvents(spark, dir)

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01b_tumbling_stream" -> (s01b_tumbling_stream _),
    "s01c_tumbling_file_stream" -> (s01c_tumbling_file_stream _),
    "s01d_tumbling_catalog_stream" -> (s01d_tumbling_catalog_stream _),
    "s23_stream_cdc_source" -> (s23_stream_cdc_source _),
    "s05_watermark_late" -> (s05_watermark_late _),
    "s06_stateful_throttle" -> (s06_stateful_throttle _),
    "s07_interval_join" -> (s07_interval_join _),
    "s08_stream_static_join" -> (s08_stream_static_join _),
    "s09_stream_sink" -> (s09_stream_sink _),
    "s10_stream_dedup_ingest" -> (s10_stream_dedup_ingest _),
    "s10b_stream_dedup_files" -> (s10b_stream_dedup_files _),
    "s10c_stream_dedup_watermarked" -> (s10c_stream_dedup_watermarked _),
    "s11_stream_catalog_sink" -> (s11_stream_catalog_sink _),
    "s12_stream_merge_upsert" -> (s12_stream_merge_upsert _),
    "s15_stream_native_sink" -> (s15_stream_native_sink _),
    "s16_stream_catalog_pipe" -> (s16_stream_catalog_pipe _),
    "s20_stream_ingest_compact" -> (s20_stream_ingest_compact _),
    "s21_stream_drift_monitor" -> (s21_stream_drift_monitor _),
    "s22_stream_ann_ingest" -> (s22_stream_ann_ingest _),
    "s13_stream_curate" -> (s13_stream_curate _),
    "s14_stream_near_dedup" -> (s14_stream_near_dedup _),
    "s14b_stream_near_dedup_expiring" -> (s14b_stream_near_dedup_expiring _),
    "s17_stream_capped_sessions" -> (s17_stream_capped_sessions _),
    "s18_stream_temporal_join" -> (s18_stream_temporal_join _),
    "s18b_stream_temporal_join_ooo" -> (s18b_stream_temporal_join_ooo _),
    "s19_stream_incremental_rollup" -> (s19_stream_incremental_rollup _),
  )

  val oracles: Map[String, String] = Map(
    // q89's oracle verbatim: the state machine must converge to the
    // batch gap-islands + capped-chunks answer.
    "s17_stream_capped_sessions" ->
      graft.operators.EventWindowQueries.cappedSessionsOracle,
    // q94's maintenance invariant verbatim: the per-micro-batch merged
    // table must equal the full recompute over all documents.
    "s19_stream_incremental_rollup" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')))
        |       AS BIGINT) AS n_tokens
        | FROM documents WHERE text IS NOT NULL
        | GROUP BY source ORDER BY source""".stripMargin,
    // The operator's textbook statement: DuckDB's native ASOF LEFT JOIN
    // (greatest dim.ts <= fact.ts per user; unmatched facts keep NULLs).
    "s18_stream_temporal_join" ->
      """WITH d AS (
        |  SELECT event_id, ts, user_id, value FROM events WHERE event_id % 10 = 0),
        | f AS (
        |  SELECT event_id, ts, user_id, value FROM events WHERE event_id % 10 != 0)
        | SELECT f.event_id, f.ts, f.user_id, f.value,
        |   d.event_id AS rate_id, d.value AS rate_value
        | FROM f ASOF LEFT JOIN d ON f.user_id = d.user_id AND f.ts >= d.ts
        | ORDER BY f.event_id""".stripMargin,
    // Same oracle as s18: out-of-order arrival must not change the
    // temporal-join answer.
    "s18b_stream_temporal_join_ooo" ->
      """WITH d AS (
        |  SELECT event_id, ts, user_id, value FROM events WHERE event_id % 10 = 0),
        | f AS (
        |  SELECT event_id, ts, user_id, value FROM events WHERE event_id % 10 != 0)
        | SELECT f.event_id, f.ts, f.user_id, f.value,
        |   d.event_id AS rate_id, d.value AS rate_value
        | FROM f ASOF LEFT JOIN d ON f.user_id = d.user_id AND f.ts >= d.ts
        | ORDER BY f.event_id""".stripMargin,
    // Identical to s01's oracle: streaming must converge to the batch
    // answer.
    "s01b_tumbling_stream" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS cnt, round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s01c_tumbling_file_stream" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS cnt, round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s01d_tumbling_catalog_stream" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS cnt, round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The snapshot-lineage stream's emissions restated: the seeded 80%
    // minus v2's MOR delete, plus the appended 20% minus v4's in-range
    // MOR delete — rows deleted before their slice streamed are NEVER
    // emitted.
    "s23_stream_cdc_source" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS cnt, round((sum(value)) * 100) / 100 AS sum_value
        | FROM events
        | WHERE (event_id % 5 <> 0 AND event_id % 10 <> 1)
        |    OR (event_id % 5 = 0 AND event_id % 10 <> 5)
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Every streamed event landed in the catalog table exactly once, so
    // the table's batch aggregate equals the plain events aggregate.
    "s11_stream_catalog_sink" ->
      """SELECT event_type, count(*) AS cnt,
        |  round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Native streaming write: same exactly-once landing as s11.
    "s15_stream_native_sink" ->
      """SELECT event_type, count(*) AS cnt,
        |  round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // The end-to-end pipe must also land every event exactly once.
    "s16_stream_catalog_pipe" ->
      """SELECT event_type, count(*) AS cnt,
        |  round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Inline compaction must never lose or duplicate an ingested event:
    // the maintained table's aggregate equals the plain events aggregate.
    "s20_stream_ingest_compact" ->
      """SELECT event_type, count(*) AS cnt,
        |  round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // q93's oracle with the generation (doc_id % 3) as the grouping key
    // and the FULL corpus as the reference histogram: the streaming
    // monitor's per-batch emissions must equal the batch restatement.
    "s21_stream_drift_monitor" ->
      """WITH t AS (
        |  SELECT CAST(doc_id % 3 AS BIGINT) AS gen,
        |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        | f AS (
        |  SELECT gen,
        |    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 4096 AS bucket
        |  FROM t),
        | bs AS (SELECT gen, bucket, count(*) AS cs FROM f GROUP BY 1, 2),
        | corp AS (SELECT bucket, CAST(sum(cs) AS BIGINT) AS c FROM bs GROUP BY 1),
        | ctot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM corp),
        | gtot AS (SELECT gen, CAST(sum(cs) AS BIGINT) AS ts FROM bs GROUP BY 1),
        | terms AS (
        |  SELECT bs.gen,
        |    CAST(round(CAST(cs AS DOUBLE) *
        |      (ln(CAST(cs + 1 AS DOUBLE)) - ln(CAST(ts + 4096 AS DOUBLE))
        |       - ln(CAST(c + 1 AS DOUBLE)) + ln(CAST(t + 4096 AS DOUBLE))) *
        |      1000000.0 / CAST(ts AS DOUBLE)) AS BIGINT) AS term_q
        |  FROM bs JOIN corp USING (bucket) JOIN gtot USING (gen) CROSS JOIN ctot),
        | agg AS (
        |  SELECT gen, CAST(sum(term_q) AS BIGINT) AS kl_q FROM terms GROUP BY 1)
        | SELECT agg.gen, gtot.ts AS n_tokens,
        |   CAST(kl_q AS DOUBLE) / 1000000.0 AS kl_est_nats
        | FROM agg JOIN gtot USING (gen) ORDER BY agg.gen""".stripMargin,
    // Upsert semantics: each event exactly once, every 10th carrying its
    // corrected (doubled — exact in binary) generation-2 value.
    "s12_stream_merge_upsert" ->
      """SELECT event_type, count(*) AS cnt,
        |  round((sum(CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // The late-drop rule in SQL: late rows never reach the aggregate.
    "s05_watermark_late" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
        | SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS cnt, round((sum(value)) * 100) / 100 AS sum_value
        | FROM events, mx
        | WHERE NOT (event_id % 20 = 0 AND ts <= m - INTERVAL 3 HOUR)
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The greedy per-user chain in SQL: each event joins its per-user
    // successor, carrying the last EMITTED timestamp forward — the same
    // recursion flatMapGroupsWithState runs as managed state.
    "s06_stateful_throttle" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        | ), chain AS (
        |  SELECT user_id, rn, ts AS last_ts, event_id, ts, TRUE AS emitted
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn,
        |    CASE WHEN e.ts >= c.last_ts + INTERVAL 10 MINUTE THEN e.ts
        |         ELSE c.last_ts END,
        |    e.event_id, e.ts,
        |    e.ts >= c.last_ts + INTERVAL 10 MINUTE
        |  FROM chain c JOIN e ON e.user_id = c.user_id AND e.rn = c.rn + 1
        | )
        | SELECT user_id, event_id, ts FROM chain WHERE emitted
        | ORDER BY user_id, ts, event_id""".stripMargin,
    // Every event landed exactly once across the per-batch overwrites.
    "s09_stream_sink" ->
      """SELECT event_type, count(*) AS cnt,
        |  round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Stream-static enrichment must converge to the plain batch
    // join + time-bucket aggregate.
    "s08_stream_static_join" ->
      """SELECT date_trunc('hour', e.ts) AS window_start, c.c_nationkey,
        |  count(*) AS cnt, round((sum(e.value)) * 100) / 100 AS sum_value
        | FROM events e JOIN customer c ON e.user_id = c.c_custkey
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Dedup-on-ingest must converge to the batch distinct-key count —
    // survivor-independent, since WHICH duplicate survives streaming
    // dedup is arrival-order-dependent. The file-source form (s10b)
    // converges to the same count — generation 2 re-delivers the
    // identical corpus.
    "s10_stream_dedup_ingest" -> ingestDedupOracle,
    "s10b_stream_dedup_files" -> ingestDedupOracle,
    "s10c_stream_dedup_watermarked" -> ingestDedupOracle,
    // Quality-then-dedup convergence: distinct keys among quality
    // passers, with the score rounded exactly as the operator rounds it
    // (r4) so the 0.5 boundary agrees cross-engine. Variant-stability
    // of the score (normalized tokens only) is what makes this
    // survivor-independent — see s13's docstring.
    "s13_stream_curate" ->
      """WITH t AS (
        |  SELECT lang,
        |    sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h,
        |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        | q AS (
        |  SELECT lang, h,
        |    round((least(1.0, len(toks) / 100.0)
        |           * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to','is'], x))) AS DOUBLE)
        |                    / len(toks))) * 10000) / 10000 AS quality
        |  FROM t)
        | SELECT lang, count(DISTINCT h) AS n_keep FROM q WHERE quality >= 0.5
        | GROUP BY lang ORDER BY lang""".stripMargin,
    // The streaming interval join must converge to the plain batch join.
    "s07_interval_join" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id,
        |  e.ts AS error_ts, c.ts AS click_ts
        | FROM events e JOIN events c
        |   ON e.event_type = 'error' AND c.event_type = 'click'
        |  AND e.user_id = c.user_id
        |  AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts
        | ORDER BY error_id, click_id""".stripMargin,
  )
}
