package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RelationalQueries.r2

/** Batch-equivalent forms of the streaming query inventory (SURVEY.md
  * §2.3 S1–S4). Each uses the *streaming-capable* operator (`window`,
  * `session_window`, `dropDuplicates`) so the identical expression runs
  * under Structured Streaming (graft.streaming.EventStreams); DuckDB
  * oracles are time-bucket / gaps-and-islands reformulations.
  */
object EventWindowQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  // ---------------------------------------------------------------- S1
  /** Tumbling 1-hour window × event_type. */
  def s01_tumbling_window(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"), r2(sum($"value")).as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type", $"cnt", $"sum_value")
      .orderBy($"window_start", $"event_type")
  }

  // ---------------------------------------------------------------- S2
  /** Sliding 1-hour window every 30 minutes — each event lands in exactly
    * two windows (Spark's TimeWindow expansion = a generator, no self
    * join). */
  def s02_sliding_window(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"),
        RelationalQueries.r2avg(sum($"value"), count(lit(1))).as("avg_value"))
      .select($"window.start".as("window_start"), $"cnt", $"avg_value")
      .orderBy($"window_start")
  }

  // ---------------------------------------------------------------- S3
  /** Session window, 10-minute gap, per user: window start = first event,
    * end = last event + gap; sessions merge while events arrive strictly
    * within the gap. DuckDB oracle is the gaps-and-islands formulation
    * with a `>= gap` new-session test (Spark windows are end-exclusive,
    * so an event exactly `gap` after the previous starts a new session).
    */
  def s03_session_window(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), r2(sum($"value")).as("sum_value"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start")
  }

  // ---------------------------------------------------------------- S4
  /** Stateful dedup on event_id, then count per type. (event_id is
    * unique in the synthetic data, so the kept-row choice is
    * deterministic; under streaming this is `dropDuplicates` state.) */
  def s04_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .dropDuplicates("event_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q89
  /** CAPPED sessionization — s03's gap sessions with a max-events split:
    * a session closes when the next event is ≥ `gap` away (s03's rule)
    * OR when it already holds `cap` events (runaway users — bot bursts,
    * instrumentation loops — are split into bounded chunks). The cap is
    * the semantics `session_window` cannot express (its merge is purely
    * gap-driven), so the streaming twin s17 is a `flatMapGroupsWithState`
    * custom state machine; THIS batch form states the identical result
    * with two windows (gap islands, then row_number-div-cap chunks) and
    * shares its DuckDB oracle with s17.
    *
    * Scale posture: one shuffle on user_id; both window passes and the
    * final aggregate reuse that partitioning (no second shuffle — the
    * chunk window's key (user_id, island) is a refinement of user_id).
    * Session stats are bounded by the cap, never by user activity. */
  def q89_capped_sessions(spark: SparkSession, dir: String): DataFrame =
    cappedSessions(events(spark, dir))

  /** q89's operator form on any (ts, event_id, user_id, event_type,
    * value) frame — spec-drivable: the fixture never produces a
    * 5-event burst inside one 10-minute gap window, so the cap branch
    * is gated differentially on a synthetic corpus in
    * EventStreamsSpec, not by the fixture hash gate. */
  private[graft] def cappedSessions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMinutes = 10
    val cap = 5
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val marked = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") >= col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wi = Window.partitionBy(col("user_id"), col("island"))
      .orderBy(col("ts"), col("event_id"))
    marked
      .withColumn("chunk", ((row_number().over(wi) - 1) / cap).cast("long"))
      .groupBy(col("user_id"), col("island"), col("chunk"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        r2(sum(col("value"))).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("n_types"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_tumbling_window" -> (s01_tumbling_window _),
    "s02_sliding_window" -> (s02_sliding_window _),
    "s03_session_window" -> (s03_session_window _),
    "s04_dedup" -> (s04_dedup _),
    "q89_capped_sessions" -> (q89_capped_sessions _),
  )

  /** q89/s17's shared oracle: gap islands then count-capped chunks —
    * the `>= gap` new-session test matches s03's end-exclusive rule. */
  private[graft] val cappedSessionsOracle: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, value, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      | islands AS (
      |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS island
      |  FROM marked),
      | chunked AS (
      |  SELECT *, CAST(floor((row_number() OVER (
      |      PARTITION BY user_id, island ORDER BY ts, event_id) - 1) / 5) AS BIGINT) AS chunk
      |  FROM islands)
      | SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |   count(*) AS n_events, count(DISTINCT event_type) AS n_types,
      |   round(sum(value) * 100) / 100 AS sum_value
      | FROM chunked GROUP BY user_id, island, chunk
      | ORDER BY user_id, session_start""".stripMargin

  val oracles: Map[String, String] = Map(
    "s01_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS cnt, round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s02_sliding_window" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
        |  FROM events)
        | SELECT window_start, count(*) AS cnt,
        |   round(round(sum(value) * 100) / count(*)) / 100 AS avg_value
        | FROM w GROUP BY window_start ORDER BY window_start""".stripMargin,
    "s03_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           >= INTERVAL '10 minutes'
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        | numbered AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM marked)
        | SELECT user_id, min(ts) AS session_start,
        |   max(ts) + INTERVAL '10 minutes' AS session_end,
        |   count(*) AS n_events, round((sum(value)) * 100) / 100 AS sum_value
        | FROM numbered GROUP BY user_id, sess_id
        | ORDER BY user_id, session_start""".stripMargin,
    "s04_dedup" ->
      """SELECT event_type, count(*) AS cnt FROM (
        |  SELECT DISTINCT event_id, event_type FROM events)
        | GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q89_capped_sessions" -> cappedSessionsOracle,
  )
}
