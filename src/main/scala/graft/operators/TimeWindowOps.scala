package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time windowing over the stream table (SURVEY.md §7.3 M3): tumbling,
  * sliding, and session windows via the real `window()` / `session_window()`
  * operators — the Structured Streaming analogs of the reference's
  * processing-time micro-batches (Streamer.scala:57). The exact same
  * expressions run under `readStream` + watermark in graft.streaming;
  * these batch forms are the DuckDB-verifiable surface.
  *
  * Scale posture: window assignment is a narrow projection (no shuffle);
  * the only shuffle is the per-(window,key) aggregate, which partial-aggregates
  * map-side. Sliding windows multiply rows by window/slide (4× here) *after*
  * scan-side column pruning.
  */
object TimeWindowOps extends QueryModule {

  private def events(s: SparkSession, dir: String) = Tables.t(s, dir, "events")

  /** STL-style additive decomposition of the per-type daily series:
    * value = trend + seasonal + residual, entirely in exact µ-integer
    * arithmetic. Trend is a centered 7-day moving average (NULL at the
    * edges where the window is incomplete); seasonal is the per-day-of-week
    * mean of the detrended series, re-centered so the 7 effects sum to ~0
    * (classical decomposition — the one STL iteration every dashboard
    * actually uses); residual is the remainder. All divisions are integer
    * `div` (truncation toward zero in BOTH engines, checked on negatives);
    * day-of-week is computed as days-since-a-fixed-Monday mod 7 because
    * the engines disagree on dayofweek() numbering. Windows run over the
    * compressed (type, day) domain — bounded by the calendar, not the
    * event count — partitioned by type (the monthly_revenue_mom class).
    */
  private def stlDecomposeDaily(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val daily = events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 1e6).cast("long")).as("v_micro"))
    val w7 = W.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val trended = daily
      .withColumn("trend_micro",
        when(count(lit(1)).over(w7) === 7,
          expr("sum(v_micro) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) div 7")))
      .withColumn("det", col("v_micro") - col("trend_micro"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-05").cast("date")), lit(7)))
    val seasonalRaw = trended.filter(col("det").isNotNull)
      .groupBy(col("event_type"), col("dow"))
      .agg(expr("sum(det) div count(1)").as("s_raw"))
    val seasonal = seasonalRaw
      .withColumn("s_mean",
        expr("sum(s_raw) OVER (PARTITION BY event_type) div count(s_raw) OVER (PARTITION BY event_type)"))
      .withColumn("seasonal_micro", col("s_raw") - col("s_mean"))
      .select(col("event_type"), col("dow"), col("seasonal_micro"))
    trended
      .join(broadcast(seasonal), Seq("event_type", "dow"), "left_outer")
      .select(col("event_type"), col("day"), col("v_micro"),
        col("trend_micro"),
        when(col("trend_micro").isNotNull, col("seasonal_micro"))
          .as("seasonal_micro"),
        (col("det") - col("seasonal_micro")).as("residual_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  private val stlDecomposeDailySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS v_micro
      |  FROM events GROUP BY 1, 2
      |), trended AS (
      |  SELECT event_type, day, v_micro,
      |    CASE WHEN COUNT(*) OVER w7 = 7
      |         THEN SUM(v_micro) OVER w7 // 7 END AS trend_micro,
      |    -- double-mod: DuckDB % returns NEGATIVE remainders for pre-epoch
    |    -- days where Spark's pmod is always 0..6 — latent until a hostile
    |    -- fixture adds a pre-1970 timestamp
    |    ((date_diff('day', DATE '1970-01-05', day) % 7) + 7) % 7 AS dow
      |  FROM daily
      |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |), det AS (
      |  SELECT *, v_micro - trend_micro AS d FROM trended
      |), sraw AS (
      |  SELECT event_type, dow, SUM(d) // COUNT(*) AS s_raw
      |  FROM det WHERE d IS NOT NULL GROUP BY 1, 2
      |), seas AS (
      |  SELECT event_type, dow,
      |    s_raw - (SUM(s_raw) OVER (PARTITION BY event_type)
      |             // COUNT(s_raw) OVER (PARTITION BY event_type)) AS seasonal_micro
      |  FROM sraw
      |)
      |SELECT t.event_type, t.day, t.v_micro,
      |  t.trend_micro,
      |  CASE WHEN t.trend_micro IS NOT NULL THEN s.seasonal_micro END
      |    AS seasonal_micro,
      |  t.d - s.seasonal_micro AS residual_micro
      |FROM det t LEFT JOIN seas s
      |  ON s.event_type = t.event_type AND s.dow = t.dow
      |ORDER BY 1, 2""".stripMargin

  /** Watermark planning audit: how out-of-order does each event type's
    * stream actually arrive, and what watermark delay would a streaming
    * job need? Arrival order is event_id (the ingest sequence — the same
    * convention every tie-break in this catalog uses); an event's lateness
    * is how far the max event-time already SEEN at its arrival exceeds its
    * own event time (exact µs longs via unix_micros/epoch_us). Output per
    * type: out-of-order count, max lateness, and the count of events a
    * 1-minute / 10-minute / 30-minute watermark would each drop — the
    * table you read before choosing `withWatermark` for the StreamJobs
    * pipelines. Windows partition by type ordered by the unique event_id;
    * one shuffle, linear scans.
    */
  private def watermarkPlan(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val prior = W.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    events(s, dir)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("late_us",
        greatest(coalesce(max(col("us")).over(prior), col("us")) - col("us"),
          lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).cast("long")
          .as("ooo_n"),
        max(col("late_us")).cast("long").as("max_late_us"),
        sum(when(col("late_us") > 60L * 1000000L, 1L).otherwise(0L))
          .cast("long").as("drop_wm_1m"),
        sum(when(col("late_us") > 600L * 1000000L, 1L).otherwise(0L))
          .cast("long").as("drop_wm_10m"),
        sum(when(col("late_us") > 1800L * 1000000L, 1L).otherwise(0L))
          .cast("long").as("drop_wm_30m"))
      .orderBy(col("event_type"))
  }

  private val watermarkPlanSql: String =
    """WITH e AS (
      |  SELECT event_type, event_id, epoch_us(ts) AS us FROM events
      |), marked AS (
      |  SELECT event_type, us,
      |    GREATEST(COALESCE(MAX(us) OVER (PARTITION BY event_type
      |      ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us) - us,
      |      0) AS late_us
      |  FROM e
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ooo_n,
      |  CAST(MAX(late_us) AS BIGINT) AS max_late_us,
      |  CAST(SUM(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS drop_wm_1m,
      |  CAST(SUM(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS drop_wm_10m,
      |  CAST(SUM(CASE WHEN late_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS drop_wm_30m
      |FROM marked GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Daily tumbling window per event type. */
  private def tumblingDaily(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(
        window(col("ts"), "1 day").getField("start").cast("date").as("day"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 1e6).cast(DecimalType(38, 0)))
          .cast("string").cast("double") / 1e6).as("sum_value"))
      .orderBy(col("day"), col("event_type"))

  /** Sliding 1-hour window, 15-minute slide: each event lands in exactly 4
    * epoch-aligned windows. Output key = window start as epoch seconds
    * (bigint) — keeps the oracle comparison integer-exact.
    */
  private def slidingHour(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(
        unix_timestamp(window(col("ts"), "1 hour", "15 minutes").getField("start"))
          .as("window_start_sec"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("window_start_sec"))

  /** Session windows: per-user sessions with a 30-minute inactivity gap.
    * session_window merges an event into the open session iff its ts is
    * strictly inside [session_start, last_ts + gap); end = last_ts + gap.
    */
  private def sessionWindows(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 1e6).cast(DecimalType(38, 0)))
          .cast("string").cast("double") / 1e6).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window").getField("start").cast("timestamp_ntz").as("session_start"),
        col("session_window").getField("end").cast("timestamp_ntz").as("session_end"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Daily p50/p90/p99 bands per event type — the ops-dashboard latency/
    * value-band query. Same compressed-domain formulation as
    * exact_percentiles (aggregate to (type, day, value, cnt) FIRST, then
    * cumulate over the compressed domain): the windows partition by
    * (type, day) — parallelism grows with the calendar — and the cumsum
    * runs over distinct values, not raw rows. p_q = the smallest value
    * whose cumulative count reaches ⌈n·q⌉ (lower exact percentile, both
    * engines in lockstep: integer counts, IEEE ceil).
    */
  private def dailyPercentiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"), col("day"))
    events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("event_type"), col("day"))
      .agg(
        max(col("n")).as("n"),
        min(when(col("cum") >= ceil(col("n") * 0.5), col("value"))).as("p50"),
        min(when(col("cum") >= ceil(col("n") * 0.9), col("value"))).as("p90"),
        min(when(col("cum") >= ceil(col("n") * 0.99), col("value"))).as("p99"))
      .orderBy(col("event_type"), col("day"))
  }

  private val dailyPercentilesSql: String =
    """WITH g AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, value,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2, 3
      |), c AS (
      |  SELECT event_type, day, value, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type, day ORDER BY value
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type, day) AS BIGINT) AS n
      |  FROM g
      |)
      |SELECT event_type, day, MAX(n) AS n,
      |  MIN(CASE WHEN cum >= CEIL(n * 0.5) THEN value END) AS p50,
      |  MIN(CASE WHEN cum >= CEIL(n * 0.9) THEN value END) AS p90,
      |  MIN(CASE WHEN cum >= CEIL(n * 0.99) THEN value END) AS p99
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val SESSION_GAP_US = 1800L * 1000000L  // 30 min
  private val SESSION_CAP_US = 7200L * 1000000L  // 2 h hard cap

  /** Gap-sessionization WITH a hard duration cap — the event-level window
    * formulation (vs the session_window operator): is_new = gap > 30 min
    * over (user, ts, event_id), session_id = running sum of is_new, then
    * each session splits ARITHMETICALLY into 2-hour chunks by
    * (ts − session_start) div cap. No fold, no iteration: two window
    * passes partitioned by user (and by (user, session) for the start),
    * both linear per partition; the cap split is a pure per-row
    * projection. The "bound runaway sessions" variant every analytics
    * pipeline eventually needs — a gap-only session tracking a bot can
    * span days; the cap makes downstream per-session state O(cap).
    */
  private def sessionCapSplit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bySession = Window.partitionBy(col("user_id"), col("session_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        (col("prev_us").isNull ||
          col("us") - col("prev_us") > SESSION_GAP_US).cast("long"))
      .withColumn("session_id", sum(col("is_new")).over(cum))
      .withColumn("session_start", min(col("us")).over(bySession))
      .withColumn("chunk_idx",
        expr(s"(us - session_start) div $SESSION_CAP_US"))
      .groupBy(col("user_id"), col("session_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .orderBy(col("user_id"), col("session_id"), col("chunk_idx"))
  }

  private val sessionCapSplitSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
       |), marked AS (
       |  SELECT user_id, event_id, us,
       |    CASE WHEN LAG(us) OVER w IS NULL
       |           OR us - LAG(us) OVER w > ${1800L * 1000000L} THEN 1
       |         ELSE 0 END AS is_new
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
       |), sess AS (
       |  SELECT user_id, event_id, us,
       |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
       |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM marked
       |), st AS (
       |  SELECT user_id, event_id, us, session_id,
       |    MIN(us) OVER (PARTITION BY user_id, session_id) AS session_start
       |  FROM sess
       |)
       |SELECT user_id, session_id,
       |  (us - session_start) // ${7200L * 1000000L} AS chunk_idx,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(MIN(us) AS BIGINT) AS first_us, CAST(MAX(us) AS BIGINT) AS last_us
       |FROM st GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** RANGE interval frame: per user, trailing-1-hour event count and cents
    * sum at every event — the value-based frame family (ROWS frames are
    * covered by window_running_supplier). Ordered by epoch seconds so the
    * frame bound is integer-exact in both engines; RANGE semantics make
    * same-timestamp peers deterministic regardless of tie order.
    */
  private def windowRange1h(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-3600, 0)
    events(s, dir)
      .filter(col("user_id") < 20)
      .select(
        col("user_id"), col("event_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        count(lit(1)).over(w).as("trail_1h_n"),
        sum(round(col("value") * 100).cast("long")).over(w).as("trail_1h_cents"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Ordered funnel conversion (signup → click → purchase): per user, the
    * first signup, the first click strictly after it, the first purchase
    * strictly after that; then one global row counting users surviving each
    * stage. Three stacked window mins over the SAME user partitioning — one
    * shuffle, three Window operators, no self-joins (the naive funnel is a
    * 3-way self-join; this shape scans the events once). Timestamps compared
    * in exact epoch-µs longs.
    */
  private def funnelConversion(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1", min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("us") > col("t1"), col("us")))
          .over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("us") > col("t2"), col("us")))
          .over(w))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("t1").isNotNull, col("user_id"))).as("n_signup"),
        countDistinct(when(col("t2").isNotNull, col("user_id"))).as("n_click_after"),
        countDistinct(when(col("t3").isNotNull, col("user_id"))).as("n_purchase_after"))
  }

  /** Time-bounded funnel: signup → click within 7 days → purchase within 7
    * further days — the windowed form every product-analytics funnel
    * actually uses (an unbounded funnel counts conversions months later).
    * Same one-shuffle stacked-window-min shape as [[funnelConversion]];
    * the deadline rides each stage's predicate in exact epoch-µs longs.
    */
  private def funnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val week = 7L * 86400000000L
    events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1", min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("us") > col("t1") &&
          col("us") <= col("t1") + week, col("us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("us") > col("t2") &&
          col("us") <= col("t2") + week, col("us"))).over(w))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("t1").isNotNull, col("user_id"))).as("n_signup"),
        countDistinct(when(col("t2").isNotNull, col("user_id"))).as("n_click_7d"),
        countDistinct(when(col("t3").isNotNull, col("user_id"))).as("n_purchase_7d"))
  }

  private val funnelWindowedSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |), s1 AS (
      |  SELECT user_id, event_type, us,
      |         MIN(CASE WHEN event_type = 'signup' THEN us END)
      |           OVER (PARTITION BY user_id) AS t1
      |  FROM e
      |), s2 AS (
      |  SELECT user_id, event_type, us, t1,
      |         MIN(CASE WHEN event_type = 'click' AND us > t1
      |                   AND us <= t1 + 604800000000 THEN us END)
      |           OVER (PARTITION BY user_id) AS t2
      |  FROM s1
      |), s3 AS (
      |  SELECT user_id, t1, t2,
      |         MIN(CASE WHEN event_type = 'purchase' AND us > t2
      |                   AND us <= t2 + 604800000000 THEN us END)
      |           OVER (PARTITION BY user_id) AS t3
      |  FROM s2
      |)
      |SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS BIGINT)
      |    AS n_signup,
      |  CAST(COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS BIGINT)
      |    AS n_click_7d,
      |  CAST(COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS BIGINT)
      |    AS n_purchase_7d
      |FROM s3""".stripMargin

  /** Retention cohorts: users grouped by first-seen day, distinct-user
    * counts at day offsets 0-7. The cohort label is a window min (no
    * groupBy+join back); the final aggregate is the only wide shuffle.
    */
  private def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort_day", min(col("day")).over(w))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Gaps-and-islands: contiguous runs of the same event_type per user (the
    * SCD2 / change-tracking shape). A change flag from lag(), a running sum
    * to number the islands, then one aggregate per island — two window
    * passes over the SAME user partitioning and one shuffle. valid_from/to
    * are the island's bounds; ties broken by event_id so runs are total.
    */
  private def eventTypeIslands(s: SparkSession, dir: String): DataFrame = {
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byTime).isNull ||
          lag(col("event_type"), 1).over(byTime) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("chg")).over(byTime.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("island"), col("event_type"))
      .agg(
        min(col("ts")).cast("timestamp_ntz").as("valid_from"),
        max(col("ts")).cast("timestamp_ntz").as("valid_to"),
        count(lit(1)).as("run_len"))
      .orderBy(col("user_id"), col("island"))
  }

  /** DAU / WAU: daily active users and the 7-day rolling DISTINCT user
    * count. WAU is NOT a rolling sum of DAU — users active on several days
    * must count once — so each day joins the (day, user) pairs of its
    * trailing week (a 30-row day table broadcast against the deduplicated
    * user-day pairs) and re-deduplicates. Pair volume is days × active
    * users/day, bounded and shuffle-light at any corpus size.
    */
  private def dauWau(s: SparkSession, dir: String): DataFrame = {
    val userDays = events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct().cache()
    val days = userDays.select(col("day")).distinct()
      .withColumnRenamed("day", "d")
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = broadcast(days)
      .join(userDays, col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .withColumnRenamed("d", "day")
    dau.join(wau, "day")
      .orderBy(col("day"))
  }

  /** Calendar gap-fill (densification): every day in the observed range
    * appears exactly once, zero-filled where no event landed — the idiom
    * behind continuous reporting series (a bare GROUP BY day silently drops
    * empty days). The day spine is one sequence() explode over the min/max
    * bounds row; events aggregate BEFORE the join, so the spine joins
    * per-day totals, not raw rows.
    */
  private def dailyGapfill(s: SparkSession, dir: String): DataFrame = {
    val perDay = events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
    val spine = events(s, dir)
      .agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine.join(perDay, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("cents"), lit(0L)).as("cents"))
      .orderBy(col("day"))
  }

  /** Autocorrelation function (ACF) of the daily purchase-count series at
    * lags 1-7 — the seasonality / self-similarity diagnostic run before any
    * forecasting model. The series is the zero-filled calendar spine (so a
    * lag is always exactly k calendar days), centered in units of 1/n:
    * c_d = n·x_d − S (an exact long — no float mean subtraction), and
    * ACF_k = Σ c_d·c_{d+k} / Σ c_d² with both sums carried as
    * DECIMAL(19,0)-factor products (the ols_by_type overflow lesson) and
    * ONE final IEEE division. The lag pairing is an equi-join of the tiny
    * per-day aggregate against itself shifted k days (fan-out 7 on the
    * day domain, never on raw events); the 1-row (n, S) and denominator
    * aggregates cross-broadcast like tf_idf's corpus stats.
    */
  private def acfDaily(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val perDay = events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = events(s, dir)
      .agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    // consumed by the stats row and both join sides — Q caching contract
    val series = spine.join(perDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x")).cache()
    val st = series.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val cd = series.crossJoin(broadcast(st))
      .select(col("day"),
        (col("n") * col("x") - col("sx")).cast(DecimalType(19, 0)).as("c"))
      .cache()
    val den = cd.agg(sum(col("c") * col("c")).as("den"))
    val lhs = cd.select(col("day"), col("c").as("ca"),
        explode(sequence(lit(1), lit(7))).as("k"))
      .select(date_add(col("day"), col("k")).as("tday"),
        col("ca"), col("k").cast("long").as("k"))
    val rhs = cd.select(col("day").as("tday"), col("c").as("cb"))
    lhs.join(rhs, "tday")
      .groupBy(col("k"))
      .agg(sum(col("ca") * col("cb")).as("num"), count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(den))
      .select(col("k"), col("n_pairs"),
        (col("num").cast("double") / col("den").cast("double")).as("acf"))
      .orderBy(col("k"))
  }

  /** Piecewise trend around the detected changepoint — binary
    * segmentation step 2: after [[changepointDaily]] picks each type's
    * best split, fit an OLS slope to the daily-mean series on EACH side
    * (the "how fast was it moving before vs after" readout an alerting
    * triage wants next). Same prefix-sum split selection; slopes assemble
    * as single rationals over exact long sums (the ols_by_type pattern —
    * x is the day offset from the global epoch, bounded by the calendar),
    * with a NULL slope for degenerate 1-day segments on both engines.
    */
  private def segmentedTrend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 1e6).cast("long")).cast("long")
        .as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("m", expr("sum_micro div cnt"))
      .cache()
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val skD = col("sk").cast("double")
    val restD = (col("s") - col("sk")).cast("double")
    val kD = col("k").cast("double")
    val nkD = (col("n") - col("k")).cast("double")
    val sD = col("s").cast("double")
    val nD = col("n").cast("double")
    val wBest = Window.partitionBy(col("event_type"))
      .orderBy(col("score_micro").desc, col("day"))
    val best = daily
      .withColumn("k", row_number().over(wRun))
      .withColumn("sk", sum(col("m")).over(wRun).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("s", sum(col("m")).over(wAll).cast("long"))
      .filter(col("k") < col("n"))
      .withColumn("score_micro",
        round((skD * skD / kD + restD * restD / nkD - sD * sD / nD) / 1e6)
          .cast("long"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("chg_day"))
    val seg = daily.join(best, "event_type")
      .withColumn("segment",
        when(col("day") <= col("chg_day"), "1_before").otherwise("2_after"))
      .withColumn("x", datediff(col("day"), lit("2024-01-01").cast("date"))
        .cast("long"))
    val nL = col("n_days")
    val slopeNum = (nL * col("sxy") - col("sx") * col("sy")).cast("double")
    val slopeDen = (nL * col("sxx") - col("sx") * col("sx")).cast("double")
    seg.groupBy(col("event_type"), col("segment"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("m")).cast("long").as("sy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("x") * col("m")).cast("long").as("sxy"))
      .withColumn("slope_micro_per_day",
        when(nL >= 2L, round(slopeNum / slopeDen * 1e6).cast("long")))
      .select(col("event_type"), col("segment"), col("n_days"),
        col("slope_micro_per_day"))
      .orderBy(col("event_type"), col("segment"))
  }

  private val segmentedTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
      |      // CAST(COUNT(*) AS BIGINT) AS m
      |  FROM events GROUP BY 1, 2
      |), pfx AS (
      |  SELECT event_type, day, m,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
      |    CAST(SUM(m) OVER (PARTITION BY event_type ORDER BY day
      |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sk,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS s
      |  FROM daily
      |), best AS (
      |  SELECT event_type, day AS chg_day FROM (
      |    SELECT event_type, day,
      |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY
      |        CAST(ROUND((CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) /
      |                      CAST(k AS DOUBLE) +
      |                    CAST(s - sk AS DOUBLE) * CAST(s - sk AS DOUBLE) /
      |                      CAST(n - k AS DOUBLE) -
      |                    CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |                      CAST(n AS DOUBLE)) / 1e6) AS BIGINT) DESC,
      |        day) AS rn
      |    FROM pfx WHERE k < n)
      |  WHERE rn = 1
      |), seg AS (
      |  SELECT d.event_type,
      |    CASE WHEN d.day <= b.chg_day THEN '1_before' ELSE '2_after' END
      |      AS segment,
      |    CAST(d.day - DATE '2024-01-01' AS BIGINT) AS x, d.m
      |  FROM daily d JOIN best b ON b.event_type = d.event_type
      |), agg AS (
      |  SELECT event_type, segment, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(m) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(x * m) AS BIGINT) AS sxy
      |  FROM seg GROUP BY 1, 2
      |)
      |SELECT event_type, segment, n_days,
      |  CASE WHEN n_days >= 2 THEN
      |    CAST(ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE) /
      |               CAST(n_days * sxx - sx * sx AS DOUBLE) * 1e6) AS BIGINT)
      |  END AS slope_micro_per_day
      |FROM agg ORDER BY event_type, segment""".stripMargin

  /** Cross-correlation function between the daily click and purchase
    * series at lags −7..+7 — the lead-lag readout behind "do clicks
    * predict purchases k days later?" (the marketing-mix modeling
    * pre-flight; [[acfDaily]] is the self-correlation special case).
    * Same scaled-integer centering trick: c = n·x − Σx needs no division,
    * lag products accumulate exactly on DECIMAL, and ONE final IEEE
    * division by the fixed global normalization √(Σcx²)·√(Σcy²) per lag.
    * The series lives on the calendar spine (wall-clock-bounded domain);
    * negative lags mean clicks LAG purchases, positive mean clicks LEAD.
    */
  private def ccfDaily(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spine = events(s, dir)
      .agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    def daily(et: String, name: String) =
      spine.join(
        events(s, dir).filter(col("event_type") === et)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as(name)),
        Seq("day"), "left")
        .select(col("day"), coalesce(col(name), lit(0L)).as(name))
    val series = daily("click", "x").join(daily("purchase", "y"), "day").cache()
    val st = series.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"))
    val cd = series.crossJoin(broadcast(st))
      .select(col("day"),
        (col("n") * col("x") - col("sx")).cast(DecimalType(19, 0)).as("cx"),
        (col("n") * col("y") - col("sy")).cast(DecimalType(19, 0)).as("cy"))
      .cache()
    val den = cd.agg(sum(col("cx") * col("cx")).as("dx"),
      sum(col("cy") * col("cy")).as("dy"))
    val lhs = cd.select(col("day"), col("cx"),
        explode(sequence(lit(-7), lit(7))).as("k"))
      .select(date_add(col("day"), col("k")).as("tday"),
        col("cx"), col("k").cast("long").as("k"))
    val rhs = cd.select(col("day").as("tday"), col("cy"))
    lhs.join(rhs, "tday")
      .groupBy(col("k"))
      .agg(sum(col("cx") * col("cy")).as("num"), count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(den))
      .select(col("k"), col("n_pairs"),
        (col("num").cast("double") /
          (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double"))))
          .as("ccf"))
      .orderBy(col("k"))
  }

  private val ccfDailySql: String =
    """WITH spine AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      |  FROM (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
      |        FROM events)
      |), xs AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'click' GROUP BY 1
      |), ys AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1
      |), series AS (
      |  SELECT s.day, COALESCE(x.x, 0) AS x, COALESCE(y.y, 0) AS y
      |  FROM spine s LEFT JOIN xs x ON x.day = s.day
      |               LEFT JOIN ys y ON y.day = s.day
      |), st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |         CAST(SUM(y) AS BIGINT) AS sy
      |  FROM series
      |), cd AS (
      |  SELECT day, CAST(n * x - sx AS HUGEINT) AS cx,
      |         CAST(n * y - sy AS HUGEINT) AS cy
      |  FROM series CROSS JOIN st
      |), den AS (
      |  SELECT SUM(cx * cx) AS dx, SUM(cy * cy) AS dy FROM cd
      |), lagged AS (
      |  SELECT k.k, a.cx, b.cy
      |  FROM cd a
      |  CROSS JOIN (SELECT unnest(generate_series(-7, 7)) AS k) k
      |  JOIN cd b ON b.day = a.day + CAST(k.k AS INTEGER)
      |)
      |SELECT CAST(k AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(cx * cy) AS DOUBLE) /
      |    (sqrt(CAST((SELECT dx FROM den) AS DOUBLE)) *
      |     sqrt(CAST((SELECT dy FROM den) AS DOUBLE))) AS ccf
      |FROM lagged GROUP BY k ORDER BY k""".stripMargin

  /** Linear-interpolation gap-fill: a sparse daily series (a deterministic
    * md5 1/256 sample of purchase events, so most calendar days have no
    * observation) densified by interpolating between the nearest observed
    * neighbors — the imputation idiom for irregular telemetry. prev/next
    * observed points come from ignoreNulls last/first windows over the
    * calendar spine (a wall-clock-bounded domain like monthly_revenue_mom,
    * never data-proportional); the interpolated value is the exact integer
    * lerp (prev·gapR + next·gapL) div gap — every term non-negative, so
    * truncating and floor division agree across engines. Days outside the
    * observed hull stay NULL.
    */
  private def dailyInterp(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val perDay = events(s, dir)
      .filter(col("event_type") === "purchase" &&
        substring(md5(col("event_id").cast("string")), 1, 2) === "00")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val spine = events(s, dir)
      .agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val back = W.orderBy(col("day"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val fwd = W.orderBy(col("day"))
      .rowsBetween(W.currentRow, W.unboundedFollowing)
    spine.join(perDay, Seq("day"), "left")
      .withColumn("prev_d", last(when(col("cents").isNotNull, col("day")), ignoreNulls = true).over(back))
      .withColumn("prev_c", last(col("cents"), ignoreNulls = true).over(back))
      .withColumn("next_d", first(when(col("cents").isNotNull, col("day")), ignoreNulls = true).over(fwd))
      .withColumn("next_c", first(col("cents"), ignoreNulls = true).over(fwd))
      .select(col("day"), col("cents"),
        when(col("cents").isNotNull, lit(1L)).otherwise(lit(0L)).as("observed"),
        when(col("cents").isNotNull, col("cents"))
          .otherwise(expr(
            """(prev_c * datediff(next_d, day) + next_c * datediff(day, prev_d))
              |  div datediff(next_d, prev_d)""".stripMargin))
          .as("interp_cents"))
      .orderBy(col("day"))
  }

  /** Event debouncing: suppress repeats of the same (user, event_type)
    * arriving within 5 minutes of the previously KEPT occurrence — approx
    * here as "within 5 minutes of the previous occurrence", the lag-based
    * form (identical when inter-event gaps don't chain; the chained form is
    * the sessionization machinery above). The telemetry-dedup primitive:
    * one lag() over the per-(user, type) shuffle, then a per-type rollup of
    * kept/dropped counts. Exact µs arithmetic.
    */
  private def debounceEvents(s: SparkSession, dir: String): DataFrame = {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byKey))
      .withColumn("kept",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 300000000L, 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("kept")).as("n_kept"),
        (count(lit(1)) - sum(col("kept"))).as("n_dropped"))
      .orderBy(col("event_type"))
  }

  private val debounceEventsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
      |), flagged AS (
      |  SELECT event_type,
      |    CASE WHEN prev_us IS NULL OR us - prev_us > 300000000 THEN 1
      |         ELSE 0 END AS kept
      |  FROM (SELECT event_type, us,
      |          LAG(us) OVER (PARTITION BY user_id, event_type
      |                        ORDER BY us, event_id) AS prev_us
      |        FROM e)
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
      |  CAST(SUM(kept) AS BIGINT) AS n_kept,
      |  CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped
      |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin

  /** Nearest-in-time touch join: every purchase matched to its temporally
    * CLOSEST click/view by the same user, in either direction (ties to the
    * earlier touch) — the bidirectional generalization of the backward-only
    * as-of join behind attribution_last_touch, the shape sensor-alignment
    * and "context at event time" lookups need. Both directions ride ONE
    * per-user (µs, event_id) shuffle: an ignoreNulls last() over the
    * preceding frame and first() over the following frame give the
    * neighbor's timestamp and id from the same window order, so no
    * self-join and no second shuffle. Distances are exact µs longs;
    * purchases with no touch at all keep NULLs.
    */
  private def nearestTouch(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val byTime = W.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val back = byTime.rowsBetween(W.unboundedPreceding, -1)
    val fwd = byTime.rowsBetween(1, W.unboundedFollowing)
    val isTouch = col("event_type").isin("click", "view")
    val touchUs = when(isTouch, col("us"))
    val touchId = when(isTouch, col("event_id"))
    val prevCloser = col("next_us").isNull ||
      (col("prev_us").isNotNull &&
        col("us") - col("prev_us") <= col("next_us") - col("us"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", last(touchUs, ignoreNulls = true).over(back))
      .withColumn("prev_id", last(touchId, ignoreNulls = true).over(back))
      .withColumn("next_us", first(touchUs, ignoreNulls = true).over(fwd))
      .withColumn("next_id", first(touchId, ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        when(prevCloser, col("prev_id")).otherwise(col("next_id"))
          .as("touch_id"),
        when(prevCloser, col("prev_us") - col("us"))
          .otherwise(col("next_us") - col("us")).as("delta_us"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val nearestTouchSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
      |), n AS (
      |  SELECT user_id, event_id, event_type, us,
      |    LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN us END
      |               IGNORE NULLS) OVER wb AS prev_us,
      |    LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN event_id END
      |               IGNORE NULLS) OVER wb AS prev_id,
      |    FIRST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN us END
      |                IGNORE NULLS) OVER wf AS next_us,
      |    FIRST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN event_id END
      |                IGNORE NULLS) OVER wf AS next_id
      |  FROM e
      |  WINDOW
      |    wb AS (PARTITION BY user_id ORDER BY us, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    wf AS (PARTITION BY user_id ORDER BY us, event_id
      |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id, event_id, make_timestamp(us) AS ts,
      |  CASE WHEN next_us IS NULL OR (prev_us IS NOT NULL
      |            AND us - prev_us <= next_us - us)
      |       THEN prev_id ELSE next_id END AS touch_id,
      |  CASE WHEN next_us IS NULL OR (prev_us IS NOT NULL
      |            AND us - prev_us <= next_us - us)
      |       THEN prev_us - us ELSE next_us - us END AS delta_us
      |FROM n WHERE event_type = 'purchase'
      |ORDER BY user_id, event_id""".stripMargin

  /** First-order Markov transition matrix over per-user event sequences:
    * for every (src → dst) adjacent event-type pair, its count and the
    * row-normalized transition probability — the behavioral-model /
    * next-event-prediction primitive. One lead() over the (user, time)
    * partitioning (the same shuffle every sequence op here rides), then a
    * hash aggregate whose output is |types|² rows; the normalizing sum runs
    * partitioned by src, so no global window. The probability is one IEEE
    * division of two exact longs — bit-identical across engines.
    */
  private def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_type").as("src"),
        lead(col("event_type"), 1).over(byTime).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("src"))).cast("double"))
      .orderBy(col("src"), col("dst"))
  }

  /** Second-order path analysis: the top 20 three-step event-type paths
    * (e1 → e2 → e3) across per-user sequences — the "what do users do next"
    * extension of event_transitions. Two stacked lead() calls over the SAME
    * per-user (ts, event_id) total order — one shuffle, one Window operator
    * — then a hash aggregate whose domain is |types|³ (125 here), top-20
    * with full-path tie-break.
    */
  private def topPaths3(s: SparkSession, dir: String): DataFrame = {
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(byTime).as("e2"),
        lead(col("event_type"), 2).over(byTime).as("e3"))
      .filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** Cohort LTV curve: per first-seen-day cohort, purchase revenue (exact
    * cents) and its running cumulative at day offsets 0-7, plus the users
    * active at each offset. The cumulative window runs over the
    * PRE-AGGREGATED (cohort, offset) domain — ≤ 8 rows per cohort
    * partition — never over raw events; the cohort label is a window min
    * like retention_cohorts (no groupBy + join back).
    */
  private def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(lit(0L)).as("cents"))
      .withColumn("cohort_day", min(col("day")).over(byUser))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(sum(col("cents")).as("cents"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("cum_cents", sum(col("cents")).over(cum))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Shared base for the interval-analytics queries below: per-user gap
    * sessions (same definition as session_windows) reduced to their
    * [start, end) span in epoch-µs longs — integer-exact interval bounds
    * both engines agree on.
    */
  private def sessionSpans(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("user_id"),
        unix_micros(col("session_window").getField("start")).as("s_us"),
        unix_micros(col("session_window").getField("end")).as("e_us"))

  /** The sessionization prefix shared by the interval-analytics oracles —
    * identical to the session_windows oracle, reduced to µs spans. */
  private val sessSpansSqlPrefix: String =
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
      |), sess AS (
      |  SELECT user_id,
      |         epoch_us(MIN(ts)) AS s_us,
      |         epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS e_us
      |  FROM numbered GROUP BY user_id, sid
      |)""".stripMargin

  private val ConcurrencyBucketUs = 600000000L // 10 minutes
  private val OverlapBucketUs = 3600000000L // 1 hour

  /** Concurrency curve: per 10-minute bucket, how many sessions were active
    * and how many distinct users they belong to — the "live now" series.
    * Interval aggregation WITHOUT a join: each session explodes to the
    * buckets its [start, end) span covers (fan-out bounded by session
    * duration / bucket width, ~5 buckets for a gap-capped session), then
    * one hash aggregate per bucket. The classic scale-safe alternative to
    * stabbing every bucket against every interval.
    */
  private def sessionConcurrency(s: SparkSession, dir: String): DataFrame =
    sessionSpans(s, dir)
      .select(col("user_id"), explode(sequence(
        expr(s"s_us div $ConcurrencyBucketUs"),
        expr(s"(e_us - 1) div $ConcurrencyBucketUs"))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        (col("bucket") * lit(600L)).as("bucket_start_sec"),
        col("n_sessions"), col("n_users"))
      .orderBy(col("bucket_start_sec"))

  /** Interval self-overlap: for every session, how many sessions of OTHER
    * users overlap it in time — the concurrency-attribution / contention
    * primitive.
    *
    * NO pair generator at all (round 11): overlap COUNTS are rank
    * arithmetic, not pair enumeration. For half-open spans,
    * overlaps(i) = #{j : s_j < e_i} − #{j : e_j ≤ s_i} counts every span
    * intersecting i (including i itself: the two terms classify every
    * other span as started-before-my-end minus already-ended-at-my-start).
    * Same-user sessions are gap-disjoint by construction, so the own-user
    * term is exactly the self row and n_overlap = A − B − 1. Both ranks
    * come from PrefixOps two-level prefix sums over the merged
    * point/query list — two key-partitioned exchanges of 2·|sessions|
    * rows, no single-reducer window, no join whose cardinality grows with
    * CONCURRENCY. The round-10 banded pair join was correct but its
    * candidate volume is Σ_bucket (active sessions)², i.e. quadratic in
    * overlap density — 10× users over the same time span measured 33× the
    * cost (scale_ratio gate); the rank form is sort-linear and
    * byte-identical in output. Tie semantics are pinned by the merge
    * order: at equal timestamps, end-points sort before start-queries
    * (e_j ≤ s_i counts as ended) and end-queries before start-points
    * (s_j < e_i stays strict) — exactly the old sa < eb ∧ sb < ea
    * predicate.
    */
  private def sessionOverlapPairs(s: SparkSession, dir: String): DataFrame = {
    // cached: drives both prefix passes and the final join-back (the Q
    // per-query caching contract — the sweep clears between queries)
    val sess = sessionSpans(s, dir).cache()
    // one prefix pass: running count of POINT rows (c=1) at each QUERY row
    // (c=0), ordered by (v, k) so the tie direction encodes </≤
    def pass(pointV: org.apache.spark.sql.Column, pointK: Long,
        queryV: org.apache.spark.sql.Column, queryK: Long,
        out: String): DataFrame = {
      val pts = sess.select(pointV.as("v"), lit(pointK).as("k"),
        lit(1L).as("c"), lit(-1L).as("qu"), lit(-1L).as("qs"))
      val qs = sess.select(queryV.as("v"), lit(queryK).as("k"),
        lit(0L).as("c"), col("user_id").as("qu"), col("s_us").as("qs"))
      PrefixOps.withGlobalPrefix(pts.unionAll(qs), col("v"),
          Seq(col("v"), col("k"), col("qu"), col("qs")), sums = Seq("c"))
        .filter(col("c") === 0L)
        .select(col("qu").as("user_id"), col("qs").as("s_us"),
          col("g_run_c").as(out))
    }
    // A: #starts strictly before my end (starts sort AFTER queries at ties)
    val aCnt = pass(col("s_us"), 1L, col("e_us"), 0L, "a_cnt")
    // B: #ends at-or-before my start (ends sort BEFORE queries at ties)
    val bCnt = pass(col("e_us"), 0L, col("s_us"), 1L, "b_cnt")
    sess.join(aCnt, Seq("user_id", "s_us"))
      .join(bCnt, Seq("user_id", "s_us"))
      .select(
        col("user_id"),
        timestamp_micros(col("s_us")).cast("timestamp_ntz").as("session_start"),
        (col("a_cnt") - col("b_cnt") - lit(1L)).as("n_overlap"))
      .orderBy(col("user_id"), col("session_start"))
  }

  private val eventTransitionsSql: String =
    """WITH seqd AS (
      |  SELECT event_type AS src,
      |         LEAD(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS dst
      |  FROM events
      |), cnt AS (
      |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM seqd WHERE dst IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT src, dst, n,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
      |FROM cnt ORDER BY src, dst""".stripMargin

  /** Maximum drawdown of the per-type daily mean series: the largest drop
    * from a running peak — finance's risk staple, equally useful for "how
    * far did this metric fall from its high". One hash-aggregate to
    * (type, day), then windows PARTITIONED BY type over the calendar-bounded
    * daily table; the argmax day is picked by rank with a min-day tie-break
    * so both engines agree. All math in exact integer micros.
    */
  private def maxDrawdown(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 1e6).cast("long"))
        .cast("long")).as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("mean_micro", expr("sum_micro div cnt"))
    val peakW = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pickW = Window.partitionBy(col("event_type"))
      .orderBy(col("dd_micro").desc, col("day"))
    daily
      .withColumn("peak_micro", max(col("mean_micro")).over(peakW))
      .withColumn("dd_micro", col("peak_micro") - col("mean_micro"))
      .withColumn("rn", row_number().over(pickW))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("trough_day"),
        col("peak_micro"), col("mean_micro").as("trough_micro"),
        col("dd_micro").as("max_drawdown_micro"))
      .orderBy(col("event_type"))
  }

  private val maxDrawdownSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
      |      // CAST(COUNT(*) AS BIGINT) AS mean_micro
      |  FROM events GROUP BY 1, 2
      |), dd AS (
      |  SELECT event_type, day, mean_micro,
      |    CAST(MAX(mean_micro) OVER (PARTITION BY event_type ORDER BY day
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak_micro
      |  FROM daily
      |), ranked AS (
      |  SELECT event_type, day, mean_micro, peak_micro,
      |    peak_micro - mean_micro AS dd_micro,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |                       ORDER BY peak_micro - mean_micro DESC, day) AS rn
      |  FROM dd
      |)
      |SELECT event_type, day AS trough_day, peak_micro,
      |  mean_micro AS trough_micro, dd_micro AS max_drawdown_micro
      |FROM ranked WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** Additive day-of-week seasonal decomposition of the per-type daily mean
    * series (STL-lite): seasonal = the type's mean of daily means for that
    * weekday, residual = daily mean − seasonal. Two hash-aggregates plus a
    * broadcast join of the 7-row-per-type seasonal table — no windows at
    * all. Weekday numbering aligned to DuckDB's Sunday=0 convention
    * (Spark's dayofweek is Sunday=1); truncating div is identical in both
    * engines, negatives included.
    */
  private def seasonalDow(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 1e6).cast("long"))
        .cast("long")).as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("mean_micro", expr("sum_micro div cnt"))
      .withColumn("dow", (dayofweek(col("day")) - lit(1)).cast("long"))
    val seasonal = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("mean_micro")).cast("long").as("s_sum"),
        count(lit(1)).cast("long").as("s_cnt"))
      .select(col("event_type").as("se_t"), col("dow").as("se_d"),
        expr("s_sum div s_cnt").as("seasonal_micro"))
    daily.join(broadcast(seasonal),
        col("event_type") === col("se_t") && col("dow") === col("se_d"))
      .select(col("event_type"), col("day"), col("dow"), col("mean_micro"),
        col("seasonal_micro"),
        (col("mean_micro") - col("seasonal_micro")).as("residual_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Seasonal-adjusted anomaly days: the seasonal_dow residual series
    * z-scored per event type against its own exact-moment mean/σ, reporting
    * days beyond |z| > 2 — the "this Tuesday was NOT a normal Tuesday"
    * readout a raw-value z-score misses on weekly-cyclic metrics. One
    * per-type stats aggregate (DECIMAL carrier) broadcast back over the
    * calendar-bounded daily table; z is assembled in DOUBLE from exact
    * integers with identical expression text in both engines, so the
    * |z| > 2 cut is deterministic.
    */
  private def seasonalOutliers(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val resid = seasonalDow(s, dir)
    val stats = resid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("residual_micro").cast(dec)).as("sr"),
        sum((col("residual_micro") * col("residual_micro")).cast(dec)).as("srr"))
    // den2 > 0 guard: a zero-variance residual series (single-day type,
    // constant residuals) has no defined z — Spark ANSI aborts on the /0
    // where DuckDB yields NULL (hostile_events caught this); the CASE on
    // both sides also keeps sqrt off any fp-negative den2 (DuckDB's sqrt
    // ERRORS on negatives where Spark's returns NaN)
    resid.join(broadcast(stats), "event_type")
      .withColumn("den2", expr(
        "CAST(CAST(srr AS STRING) AS DOUBLE)/n - (CAST(CAST(sr AS STRING) AS DOUBLE)/n)*(CAST(CAST(sr AS STRING) AS DOUBLE)/n)"))
      .withColumn("z", when(col("den2") > 0, expr(
        "(CAST(residual_micro AS DOUBLE) - CAST(CAST(sr AS STRING) AS DOUBLE)/n) / sqrt(den2)")))
      .filter(abs(col("z")) > 2.0)
      .select(col("event_type"), col("day"), col("mean_micro"),
        col("seasonal_micro"), col("residual_micro"), col("z"))
      .orderBy(col("event_type"), col("day"))
  }

  private def seasonalOutliersSql(dowSql: String): String =
    s"""WITH resid AS (
       |${dowSql.replace("ORDER BY d.event_type, d.day", "")}
       |), stats AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |         SUM(residual_micro) AS sr,
       |         SUM(residual_micro * residual_micro) AS srr
       |  FROM resid GROUP BY event_type
       |)
       |, withz AS (
       |  SELECT r.event_type, r.day, r.mean_micro, r.seasonal_micro,
       |         r.residual_micro,
       |         CASE WHEN CAST(CAST(srr AS STRING) AS DOUBLE)/n
       |                   - (CAST(CAST(sr AS STRING) AS DOUBLE)/n)*(CAST(CAST(sr AS STRING) AS DOUBLE)/n) > 0
       |           THEN (CAST(r.residual_micro AS DOUBLE) - CAST(CAST(sr AS STRING) AS DOUBLE)/n)
       |                / sqrt(CAST(CAST(srr AS STRING) AS DOUBLE)/n
       |                       - (CAST(CAST(sr AS STRING) AS DOUBLE)/n)*(CAST(CAST(sr AS STRING) AS DOUBLE)/n))
       |         END AS z
       |  FROM resid r JOIN stats s ON r.event_type = s.event_type
       |)
       |SELECT event_type, day, mean_micro, seasonal_micro, residual_micro, z
       |FROM withz WHERE ABS(z) > 2
       |ORDER BY event_type, day""".stripMargin

  private val seasonalDowSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
      |      // CAST(COUNT(*) AS BIGINT) AS mean_micro
      |  FROM events GROUP BY 1, 2
      |), dow AS (
      |  SELECT event_type, day, mean_micro,
      |    CAST(dayofweek(day) AS BIGINT) AS dow
      |  FROM daily
      |), seasonal AS (
      |  SELECT event_type, dow,
      |    CAST(SUM(mean_micro) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
      |      AS seasonal_micro
      |  FROM dow GROUP BY 1, 2
      |)
      |SELECT d.event_type, d.day, d.dow, d.mean_micro, s.seasonal_micro,
      |  d.mean_micro - s.seasonal_micro AS residual_micro
      |FROM dow d JOIN seasonal s
      |  ON d.event_type = s.event_type AND d.dow = s.dow
      |ORDER BY d.event_type, d.day""".stripMargin

  /** Time-to-conversion distribution — signup → first purchase latency,
    * the survival-analysis staple of product analytics: per user the hours
    * from first signup to the first subsequent purchase, then the median
    * and p90 as exact order statistics over the COMPRESSED hour histogram
    * (calendar-bounded domain — the cum-sum window partitions on a
    * non-foldable constant, the PrefixOps trick, so no unpartitioned
    * WindowExec appears even though the domain is tiny). Second-level
    * diffs count boundary crossings in both engines (unix floor-then-
    * subtract ≡ date_diff('second')), so the hour bins agree exactly.
    */
  private def timeToConversion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, dir)
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(su, "user_id")
      .filter(col("ts") >= col("s_ts"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("p_ts"), min(col("s_ts")).as("s_ts"))
      .withColumn("hours",
        expr("(unix_timestamp(p_ts) - unix_timestamp(s_ts)) div 3600L"))
    val hist = conv.groupBy(col("hours")).agg(count(lit(1)).as("cnt"))
      .withColumn("g0", pmod(col("hours"), lit(1L)))
    val wCum = Window.partitionBy(col("g0")).orderBy(col("hours"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g0"))
    val ranked = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("nc", sum(col("cnt")).over(wAll))
    val stats = ranked.agg(
      max(col("nc")).cast("long").as("n_converted"),
      min(when(col("cum") >= ceil(col("nc") / 2.0), col("hours")))
        .cast("long").as("median_hours"),
      min(when(lit(10L) * col("cum") >= lit(9L) * col("nc"), col("hours")))
        .cast("long").as("p90_hours"))
    val nSign = su.agg(count(lit(1)).cast("long").as("n_signup_users"))
    broadcast(nSign).crossJoin(stats)
      .withColumn("conversion_ppm",
        expr("(n_converted * 1000000) div n_signup_users"))
      .select(col("n_signup_users"), col("n_converted"),
        col("conversion_ppm"), col("median_hours"), col("p90_hours"))
  }

  private val timeToConversionSql: String =
    """WITH su AS (
      |  SELECT user_id, MIN(ts) AS s_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |), conv AS (
      |  SELECT e.user_id, MIN(e.ts) AS p_ts, MIN(su.s_ts) AS s_ts
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
      |  GROUP BY 1
      |), hrs AS (
      |  SELECT date_diff('second', s_ts, p_ts) // 3600 AS hours FROM conv
      |), hist AS (
      |  SELECT hours, CAST(COUNT(*) AS BIGINT) AS cnt FROM hrs GROUP BY 1
      |), ranked AS (
      |  SELECT hours, cnt,
      |    SUM(cnt) OVER (ORDER BY hours ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER () AS nc
      |  FROM hist
      |), stats AS (
      |  SELECT CAST(MAX(nc) AS BIGINT) AS n_converted,
      |    CAST(MIN(CASE WHEN cum >= CEIL(nc / 2.0) THEN hours END) AS BIGINT)
      |      AS median_hours,
      |    CAST(MIN(CASE WHEN 10 * cum >= 9 * nc THEN hours END) AS BIGINT)
      |      AS p90_hours
      |  FROM ranked
      |), ns AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users FROM su
      |)
      |SELECT n_signup_users, n_converted,
      |  (n_converted * 1000000) // n_signup_users AS conversion_ppm,
      |  median_hours, p90_hours
      |FROM ns CROSS JOIN stats""".stripMargin

  /** Single best changepoint per event type over the daily-mean series —
    * the split k maximizing the between-segment SSE reduction
    * S_k²/k + (S−S_k)²/(n−k) − S²/n (binary-segmentation step 1, the
    * core of every alerting pipeline's "when did the metric move").
    * Prefix sums make every candidate split O(1); the windows partition
    * by event_type over the DAILY series, whose length is bounded by the
    * observation window in days (the kaplan_meier argument), never raw
    * rows. Scores assemble in doubles from exact integer sums with the
    * identical expression tree on both engines, quantize to micros, and
    * the argmax tie-breaks on earliest day — fully deterministic.
    */
  private def changepointDaily(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 1e6).cast("long")).cast("long")
        .as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("m", expr("sum_micro div cnt"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val skD = col("sk").cast("double")
    val restD = (col("s") - col("sk")).cast("double")
    val kD = col("k").cast("double")
    val nkD = (col("n") - col("k")).cast("double")
    val sD = col("s").cast("double")
    val nD = col("n").cast("double")
    val scored = daily
      .withColumn("k", row_number().over(wRun))
      .withColumn("sk", sum(col("m")).over(wRun).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("s", sum(col("m")).over(wAll).cast("long"))
      .filter(col("k") < col("n"))
      .withColumn("score_micro",
        round((skD * skD / kD + restD * restD / nkD - sD * sD / nD) / 1e6)
          .cast("long"))
      .withColumn("mean_before_micro", expr("sk div k"))
      .withColumn("mean_after_micro", expr("(s - sk) div (n - k)"))
    val wBest = Window.partitionBy(col("event_type"))
      .orderBy(col("score_micro").desc, col("day"))
    scored.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("chg_day"),
        col("n").as("n_days"), col("score_micro"),
        col("mean_before_micro"), col("mean_after_micro"))
      .orderBy(col("event_type"))
  }

  private val changepointDailySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
      |      // CAST(COUNT(*) AS BIGINT) AS m
      |  FROM events GROUP BY 1, 2
      |), pfx AS (
      |  SELECT event_type, day, m,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
      |    CAST(SUM(m) OVER (PARTITION BY event_type ORDER BY day
      |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sk,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS s
      |  FROM daily
      |), scored AS (
      |  SELECT event_type, day, n,
      |    CAST(ROUND((CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) /
      |                  CAST(k AS DOUBLE) +
      |                CAST(s - sk AS DOUBLE) * CAST(s - sk AS DOUBLE) /
      |                  CAST(n - k AS DOUBLE) -
      |                CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |                  CAST(n AS DOUBLE)) / 1e6) AS BIGINT) AS score_micro,
      |    sk // k AS mean_before_micro,
      |    (s - sk) // (n - k) AS mean_after_micro
      |  FROM pfx WHERE k < n
      |)
      |SELECT event_type, day AS chg_day, n AS n_days, score_micro,
      |  mean_before_micro, mean_after_micro
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |        ORDER BY score_micro DESC, day) AS rn FROM scored)
      |WHERE rn = 1 ORDER BY event_type""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("changepoint_daily", changepointDaily, Some(changepointDailySql)),
    Q("ccf_daily", ccfDaily, Some(ccfDailySql)),
    Q("segmented_trend", segmentedTrend, Some(segmentedTrendSql)),
    Q("max_drawdown", maxDrawdown, Some(maxDrawdownSql)),
    Q("time_to_conversion", timeToConversion, Some(timeToConversionSql)),
    Q("seasonal_dow", seasonalDow, Some(seasonalDowSql)),
    Q("seasonal_outliers", seasonalOutliers, Some(seasonalOutliersSql(seasonalDowSql))),
    Q("acf_daily", acfDaily, Some(
      """WITH per_day AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), bounds AS (
        |  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        |  FROM events
        |), spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        |  FROM bounds
        |), series AS (
        |  SELECT s.day, COALESCE(p.x, 0) AS x
        |  FROM spine s LEFT JOIN per_day p USING (day)
        |), st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
        |  FROM series
        |), cd AS (
        |  SELECT day, CAST(n * x - sx AS DECIMAL(19,0)) AS c FROM series, st
        |), den AS (
        |  SELECT SUM(c * c) AS den FROM cd
        |), lhs AS (
        |  SELECT day + CAST(k AS INTEGER) AS tday, c AS ca, CAST(k AS BIGINT) AS k
        |  FROM cd, (SELECT unnest(generate_series(1, 7)) AS k)
        |), agged AS (
        |  SELECT k, SUM(ca * cb) AS num, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM lhs JOIN (SELECT day AS tday, c AS cb FROM cd) b USING (tday)
        |  GROUP BY k
        |)
        |SELECT k, n_pairs, CAST(CAST(num AS STRING) AS DOUBLE) / CAST(CAST(den AS STRING) AS DOUBLE) AS acf
        |FROM agged, den ORDER BY k""".stripMargin)),
    Q("daily_interp", dailyInterp, Some(
      """WITH per_day AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type = 'purchase'
        |    AND substr(md5(CAST(event_id AS VARCHAR)), 1, 2) = '00'
        |  GROUP BY 1
        |), bounds AS (
        |  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        |  FROM events
        |), spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        |  FROM bounds
        |), joined AS (
        |  SELECT s.day, p.cents,
        |    LAST_VALUE(CASE WHEN p.cents IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS prev_d,
        |    LAST_VALUE(p.cents IGNORE NULLS)
        |      OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS prev_c,
        |    FIRST_VALUE(CASE WHEN p.cents IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND
        |            UNBOUNDED FOLLOWING) AS next_d,
        |    FIRST_VALUE(p.cents IGNORE NULLS)
        |      OVER (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND
        |            UNBOUNDED FOLLOWING) AS next_c
        |  FROM spine s LEFT JOIN per_day p USING (day)
        |)
        |SELECT day, cents,
        |  CAST(CASE WHEN cents IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS observed,
        |  CASE WHEN cents IS NOT NULL THEN cents
        |       ELSE (prev_c * date_diff('day', day, next_d)
        |             + next_c * date_diff('day', prev_d, day))
        |            // date_diff('day', prev_d, next_d) END AS interp_cents
        |FROM joined ORDER BY day""".stripMargin)),
    Q("nearest_touch", nearestTouch, Some(nearestTouchSql)),
    Q("debounce_events", debounceEvents, Some(debounceEventsSql)),
    Q("funnel_windowed", funnelWindowed, Some(funnelWindowedSql)),
    Q("event_transitions", eventTransitions, Some(eventTransitionsSql)),
    Q("top_paths_3", topPaths3, Some(
      """WITH seqd AS (
        |  SELECT event_type AS e1,
        |         LEAD(event_type, 1) OVER w AS e2,
        |         LEAD(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
        |FROM seqd WHERE e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin)),
    Q("cohort_ltv", cohortLtv, Some(
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         CASE WHEN event_type = 'purchase'
        |              THEN CAST(ROUND(value * 100) AS BIGINT)
        |              ELSE 0 END AS cents
        |  FROM events
        |), c AS (
        |  SELECT user_id, day, cents,
        |         MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM d
        |), agged AS (
        |  SELECT cohort_day,
        |         CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
        |         CAST(SUM(cents) AS BIGINT) AS cents,
        |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM c
        |  WHERE date_diff('day', cohort_day, day) <= 7
        |  GROUP BY 1, 2
        |)
        |SELECT cohort_day, day_offset, cents, n_users,
        |  CAST(SUM(cents) OVER (PARTITION BY cohort_day ORDER BY day_offset
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |FROM agged ORDER BY cohort_day, day_offset""".stripMargin)),
    Q("session_concurrency", sessionConcurrency, Some(
      sessSpansSqlPrefix +
        s""", occ AS (
           |  SELECT user_id,
           |         unnest(generate_series(s_us // $ConcurrencyBucketUs,
           |                                (e_us - 1) // $ConcurrencyBucketUs)) AS bucket
           |  FROM sess
           |)
           |SELECT bucket * 600 AS bucket_start_sec,
           |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
           |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
           |FROM occ GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("session_overlap_pairs", sessionOverlapPairs, Some(
      sessSpansSqlPrefix +
        """, cnt AS (
          |  SELECT a.user_id AS ua, a.s_us AS sa,
          |         CAST(COUNT(*) AS BIGINT) AS n_overlap
          |  FROM sess a JOIN sess b
          |    ON a.user_id <> b.user_id
          |   AND a.s_us < b.e_us AND b.s_us < a.e_us
          |  GROUP BY 1, 2
          |)
          |SELECT s.user_id,
          |  make_timestamp(s.s_us) AS session_start,
          |  COALESCE(c.n_overlap, 0) AS n_overlap
          |FROM sess s LEFT JOIN cnt c ON s.user_id = c.ua AND s.s_us = c.sa
          |ORDER BY s.user_id, session_start""".stripMargin)),
    Q("daily_gapfill", dailyGapfill, Some(
      """WITH per_day AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), bounds AS (
        |  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        |  FROM events
        |), spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        |  FROM bounds
        |)
        |SELECT s.day, COALESCE(p.n, 0) AS n, COALESCE(p.cents, 0) AS cents
        |FROM spine s LEFT JOIN per_day p USING (day)
        |ORDER BY s.day""".stripMargin)),
    Q("dau_wau", dauWau, Some(
      """WITH user_days AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), days AS (
        |  SELECT DISTINCT day AS d FROM user_days
        |), dau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM user_days GROUP BY 1
        |), wau AS (
        |  SELECT d AS day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
        |  FROM days JOIN user_days u
        |    ON u.day BETWEEN d - INTERVAL 6 DAY AND d
        |  GROUP BY 1
        |)
        |SELECT day, dau, wau FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin)),
    Q("event_type_islands", eventTypeIslands, Some(
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM events WHERE user_id < 50
        |), flagged AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         CASE WHEN prev_type IS NULL OR prev_type <> event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM o
        |), numbered AS (
        |  SELECT user_id, event_type, ts,
        |         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM flagged
        |)
        |SELECT user_id, island, event_type,
        |  MIN(ts) AS valid_from, MAX(ts) AS valid_to,
        |  CAST(COUNT(*) AS BIGINT) AS run_len
        |FROM numbered GROUP BY 1, 2, 3
        |ORDER BY user_id, island""".stripMargin)),
    Q("funnel_conversion", funnelConversion, Some(
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), s1 AS (
        |  SELECT user_id, event_type, us,
        |         MIN(CASE WHEN event_type = 'signup' THEN us END)
        |           OVER (PARTITION BY user_id) AS t1
        |  FROM e
        |), s2 AS (
        |  SELECT user_id, event_type, us, t1,
        |         MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
        |           OVER (PARTITION BY user_id) AS t2
        |  FROM s1
        |), s3 AS (
        |  SELECT user_id, t1, t2,
        |         MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
        |           OVER (PARTITION BY user_id) AS t3
        |  FROM s2
        |)
        |SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS BIGINT)
        |    AS n_signup,
        |  CAST(COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS BIGINT)
        |    AS n_click_after,
        |  CAST(COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS BIGINT)
        |    AS n_purchase_after
        |FROM s3""".stripMargin)),
    Q("retention_cohorts", retentionCohorts, Some(
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |), c AS (
        |  SELECT user_id, day,
        |         MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM d
        |)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM c
        |WHERE date_diff('day', cohort_day, day) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("window_range_1h", windowRange1h, Some(
      """SELECT user_id, event_id, ts,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS trail_1h_n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
        |    AS trail_1h_cents
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin)),
    Q("stl_decompose_daily", stlDecomposeDaily, Some(stlDecomposeDailySql)),
    Q("watermark_plan", watermarkPlan, Some(watermarkPlanSql)),
    Q("tumbling_daily", tumblingDaily, Some(
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(ROUND((value) * 1e6) AS HUGEINT)) AS STRING) AS DOUBLE) / 1e6 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("sliding_hour", slidingHour, Some(
      """SELECT CAST(FLOOR(epoch(ts) / 900) * 900 - g.i * 900 AS BIGINT) AS window_start_sec,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events CROSS JOIN generate_series(0, 3) g(i)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("session_windows", sessionWindows, Some(
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN prev_ts IS NULL
        |                OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM o
        |), numbered AS (
        |  SELECT user_id, ts, value,
        |         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id,
        |  MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(ROUND((value) * 1e6) AS HUGEINT)) AS STRING) AS DOUBLE) / 1e6 AS sum_value
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)),
    Q("daily_percentiles", dailyPercentiles, Some(dailyPercentilesSql)),
    Q("session_cap_split", sessionCapSplit, Some(sessionCapSplitSql))
  )
}
