package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{Q, QOps, QueryModule, Tables}

/** Deterministic REPLAY harness: the StreamJobs pipelines run over the
  * driver's `events` fixture through a `MemoryStream`, flushed to
  * completion, and returned as a plain DataFrame — so the streaming half
  * of the engine (the reference's actual core, Streamer.scala:120-207) is
  * covered by the driver's DuckDB oracle hash channel, not only ScalaTest.
  *
  * Determinism contract (what makes a streaming pipeline hash-checkable):
  *  - All fixture rows are fed in ONE micro-batch (two for the
  *    cross-batch-state replay), so no row is ever late relative to the
  *    watermark and nothing is dropped — the streaming result is exactly
  *    the batch-semantics result the oracle SQL computes.
  *  - Event-time only: watermarks, session/tumbling windows and dedup keys
  *    are all functions of the fixture's `ts` column; no processing-time
  *    trigger state leaks into the output.
  *  - Append-mode aggregations only emit a window once the WATERMARK
  *    passes its end, and the watermark only advances between batches, so
  *    the replay appends two far-future sentinel batches (key = -1) to
  *    push the watermark past every real session/window, then filters the
  *    sentinel back out. (Sentinel 1 advances the watermark past the data;
  *    sentinel 2 advances it past sentinel 1's own windows so batch 3
  *    actually runs with the final watermark.)
  *  - Output rows are projected to the columns that are
  *    partitioning-independent (e.g. dedup emits the first-SEEN physical
  *    row per key — which row that is depends on task order — so the
  *    replay selects only the dedup key columns) and totally ordered.
  *
  * Driver-scale note: the fixture collect is bounded (events is 1e4 rows
  * at the verify SF, 1e5 at bench SF) — this is a correctness harness
  * replaying a finite fixture through the real streaming operators, not
  * the production ingest path (that is `readStream` in Sources.scala; the
  * pipelines under test here are byte-identical in both).
  */
object ReplayOps extends QueryModule {

  /** One replayed event: the (key, timestamp[, value]) shape every
    * StreamJobs aggregation consumes. */
  private case class Ev(key: Long, value: String, timestamp: Timestamp)

  private def ts(ms: Long) = new Timestamp(ms)

  /** Feed `batches` through `pipeline`, flush with two sentinel batches,
    * return the memory-sink table. `mk` builds the pipeline from the
    * streaming DataFrame (columns key, value, timestamp). */
  private def replay(
      spark: SparkSession,
      batches: Seq[Seq[Ev]],
      sinkName: String,
      sentinels: Boolean = true)(mk: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val out = mk(in.toDF())
    // re-runs in one session (test + Verify + Bench share sweeps) replace
    // the previous replay's sink table
    spark.catalog.dropTempView(sinkName)
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_replay_$sinkName")
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("memory").queryName(sinkName).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      if (sentinels) {
        val maxMs = batches.flatten.map(_.timestamp.getTime).max
        // far past any real session (30 min gap) or window (1 h) end
        in.addData(Ev(-1L, "s", ts(maxMs + 3L * 3600 * 1000)))
        q.processAllAvailable()
        in.addData(Ev(-1L, "s", ts(maxMs + 6L * 3600 * 1000)))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(sinkName)
  }

  /** events → Ev rows, one driver-side fixture collect (bounded, see
    * class doc), sorted by (ts, event_id) so batch splits are stable. */
  private def fixture(spark: SparkSession, dir: String): Array[Ev] = {
    import spark.implicits._
    Tables.t(spark, dir, "events")
      .orderBy("ts", "event_id")
      .select(col("user_id").as("key"), col("event_type").as("value"),
        col("ts").as("timestamp"))
      .as[Ev].collect()
  }

  /** Declarative streaming session windows (StreamJobs.sessionWindowCounts)
    * replayed to completion — same operator the batch `session_windows`
    * query runs over static data; oracle is that query's SQL reduced to
    * the streamed columns. */
  private def sessionReplay(spark: SparkSession, dir: String): DataFrame = {
    val evs = fixture(spark, dir)
    val out = replay(spark, Seq(evs.toSeq), "replay_sessions") { df =>
      StreamJobs.sessionWindowCounts(df, "30 minutes", "0 seconds")
    }
    // The Timestamp-encoder input is tz-aware; the fixture tables (and so
    // the oracle) are TIMESTAMP_NTZ. Same µs under the UTC session zone —
    // cast so the parquet types the driver compares agree too.
    QOps.ordered1(
      out.filter(col("key") >= 0)
        .select(col("key").as("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"), col("n")),
      col("user_id"), col("session_start"))
  }

  /** Tumbling event-time window counts (StreamJobs.windowedCounts, the
    * streaming form of the reference's reduceByKey) replayed to
    * completion. */
  private def windowCountsReplay(spark: SparkSession, dir: String): DataFrame = {
    val evs = fixture(spark, dir)
    val out = replay(spark, Seq(evs.toSeq), "replay_window_counts") { df =>
      StreamJobs.windowedCounts(df, "1 hour", "0 seconds")
    }
    QOps.ordered1(
      out.filter(col("key") >= 0)
        .select(col("window_start").cast("timestamp_ntz").as("window_start"),
          col("key").as("user_id"), col("n")),
      col("window_start"), col("user_id"))
  }

  /** Cross-batch streaming dedup (StreamJobs.streamingDedup, D1): distinct
    * (user, event_type) pairs; output projected to the dedup key (which
    * physical row is "first seen" is task-order dependent; the key set is
    * not). */
  private def dedupReplay(spark: SparkSession, dir: String): DataFrame = {
    val evs = fixture(spark, dir)
    val out = replay(spark, Seq(evs.toSeq), "replay_dedup", sentinels = false) {
      df => StreamJobs.streamingDedup(df, "0 seconds")
    }
    QOps.ordered1(
      out.select(col("key").as("user_id"), col("value").as("event_type")),
      col("user_id"), col("event_type"))
  }

  /** Watermark-bounded dedup (StreamJobs.streamingDedupWithinWatermark) fed
    * in TWO time-split micro-batches so the second batch's duplicates are
    * suppressed by cross-batch STATE, not within-batch aggregation. The
    * watermark delay spans the whole fixture (365 days) so no state is
    * evicted mid-replay and the result equals batch DISTINCT. */
  private def dedupWwReplay(spark: SparkSession, dir: String): DataFrame = {
    val evs = fixture(spark, dir)
    val (b1, b2) = evs.splitAt(evs.length / 2) // fixture is ts-sorted
    val out = replay(spark, Seq(b1.toSeq, b2.toSeq), "replay_dedup_ww",
      sentinels = false) { df =>
      StreamJobs.streamingDedupWithinWatermark(df, "365 days")
    }
    QOps.ordered1(
      out.select(col("key").as("user_id"), col("value").as("event_type")),
      col("user_id"), col("event_type"))
  }

  /** Windowed top-k (StreamJobs.windowedTopK — watermark-closed windows
    * ranked in foreachBatch, batch-keyed overwrite sink) replayed through a
    * real TopicTableSink dir and read back. k=3, 1 h tumbling windows. */
  private def topkReplay(spark: SparkSession, dir: String): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val evs = fixture(spark, dir)
    val in = MemoryStream[Ev]
    val sink = new TopicTableSink(
      java.nio.file.Files.createTempDirectory("graft_replay_topk").toString + "/t")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_replay_topk_ck")
    val q = StreamJobs.windowedTopK(in.toDF(), "1 hour", "0 seconds", 3, sink,
      checkpoint = Some(ckpt.toString))
    try {
      in.addData(evs.toSeq); q.processAllAvailable()
      val maxMs = evs.map(_.timestamp.getTime).max
      in.addData(Ev(-1L, "s", ts(maxMs + 3L * 3600 * 1000))); q.processAllAvailable()
      in.addData(Ev(-1L, "s", ts(maxMs + 6L * 3600 * 1000))); q.processAllAvailable()
    } finally q.stop()
    QOps.ordered1(
      sink.read(spark).filter(col("key") >= 0)
        .select(col("window_start").cast("timestamp_ntz").as("window_start"),
          col("key").as("user_id"), col("n"), col("rk")),
      col("window_start"), col("rk"))
  }

  /** Session-window SQL shared with the batch `session_windows` oracle
    * (TimeWindowOps), reduced to the replayed columns. */
  private val sessionSql =
    """WITH o AS (
      |  SELECT user_id, ts,
      |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), flagged AS (
      |  SELECT user_id, ts,
      |         CASE WHEN prev_ts IS NULL
      |                OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      |  FROM o
      |), numbered AS (
      |  SELECT user_id, ts,
      |         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged
      |)
      |SELECT user_id,
      |  MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  private val distinctPairSql =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("streaming_session_replay", sessionReplay, Some(sessionSql)),
    Q("streaming_window_counts_replay", windowCountsReplay, Some(
      """SELECT date_trunc('hour', ts) AS window_start, user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("streaming_dedup_replay", dedupReplay, Some(distinctPairSql)),
    Q("streaming_dedup_ww_replay", dedupWwReplay, Some(distinctPairSql)),
    Q("streaming_topk_replay", topkReplay, Some(
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS window_start, user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT window_start, user_id, n,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY window_start
        |                            ORDER BY n DESC, user_id) AS BIGINT) AS rk
        |  FROM c
        |)
        |SELECT window_start, user_id, n, rk FROM r WHERE rk <= 3
        |ORDER BY window_start, rk""".stripMargin))
  )
}
