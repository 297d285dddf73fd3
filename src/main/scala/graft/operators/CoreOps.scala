package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity operators, batch form (SURVEY.md §2).
  *
  * The reference consumes a Kafka stream of (key, value) string pairs; the
  * `events` table plays that role here (event_type ≈ key, props ≈ value,
  * ts supplies the event time the reference never had — FIXTURES.md §B).
  *
  * Coverage: A1 count-per-key (reference Streamer.scala:123-124), A2 distinct
  * message count (Streamer.scala:122-124), A3 per-batch count (Streamer.scala:130),
  * D1 distinct (Streamer.scala:173,197), P2 null-key fallback (HbaseWriter.scala:54-66),
  * P3/F1-F3 formatted batch summary (Streamer.scala:127-130), O5 KV upsert with
  * rowkey last-write-wins (Streamer.scala:163-165, KafkaStreamerToHbase.scala:154-158),
  * O6 bulk distinct put (Streamer.scala:166-174, HbaseWriter.scala:42-74).
  *
  * Micro-batches are modeled as event-time tumbling windows (hour-aligned), the
  * Structured Streaming analog of the reference's 2-second processing-time
  * discretization (Streamer.scala:57).
  */
object CoreOps extends QueryModule {

  private def events(s: SparkSession, dir: String): DataFrame = Tables.t(s, dir, "events")

  /** A1: per-key occurrence count — `messages.map(s => (s,1)).reduceByKey(_+_)`.
    * Catalyst plans partial+final HashAggregate (map-side combine), the exact
    * physical shape reduceByKey hand-rolled. Scale: shuffle only carries one row
    * per (key × partition) after partial agg; cardinality = |event_type| ≈ 5.
    */
  private def countPerKey(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** A2: number of distinct messages (the reference's dead `number_message`
    * lineage, implemented live). Exact distinct on (key, value).
    */
  private def distinctMessageCount(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"), col("props"))
      .distinct()
      .agg(count(lit(1)).as("n_distinct"))

  /** A3: per-batch record count — `x.count()` per micro-batch, batches modeled
    * as hour-aligned event-time tumbling windows. Uses the real `window()`
    * operator so the streaming form is identical code.
    */
  private def batchCount(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start")
        .cast("timestamp_ntz").as("batch_start"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("batch_start"))

  /** O3+P3+F1-F3+A4: the formatted per-batch summary line of Streamer.scala:130,
    * `"Spark - date:" + date + " from topic: " + topics + " - number of RDD (batches): "
    * + counter + " - number of message " + count`, with the driver-var batch
    * counter (A4) replaced by a deterministic batch sequence number (row_number
    * over batch start — the restart-safe analog of foreachBatch's batchId).
    */
  private def batchSummary(s: SparkSession, dir: String): DataFrame = {
    val perBatch = events(s, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start")
        .cast("timestamp_ntz").as("batch_start"))
      .agg(count(lit(1)).as("n"), max(col("ts")).as("max_ts"))
    val seq = Window.orderBy(col("batch_start"))
    perBatch
      .withColumn("batch_id", row_number().over(seq).cast("long"))
      .select(
        col("batch_start"),
        concat(
          lit("Spark - date:"), date_format(col("max_ts"), "yyyy/MM/dd HH:mm"),
          lit(" from topic: events - number of RDD (batches): "), col("batch_id"),
          lit(" - number of message "), col("n")
        ).as("summary"))
      .orderBy(col("batch_start"))
  }

  /** D1: exact dedup of (key, value) pairs — `x.distinct()` before the bulk write. */
  private def dedupDistinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"), col("props"))
      .dropDuplicates("event_type", "props")
      .orderBy(col("event_type"), col("props"))

  /** P2: null-key fallback routing (HbaseWriter.scala:54-66). The events table
    * has no null keys, so nulls are synthesized with nullif(event_type,'error'),
    * then routed: null → the literal "kafka empty message" row, else
    * key + "--|--" + value (the reference's exact payload format).
    */
  private def nullKeyFallback(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("key", nullif(col("event_type"), lit("error")))
      .select(
        when(col("key").isNull, lit("kafka empty message"))
          .otherwise(concat(col("key"), lit("--|--"), col("props"))).as("cell_value"))
      .groupBy(col("cell_value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("cell_value"))

  /** O5: KV single-put semantics — rowkey = epoch seconds, so all records within
    * one second collide on one rowkey and the LAST write wins
    * (Streamer.scala:163, KafkaStreamerToHbase.scala:154-158). Expressed
    * relationally: row_number over rowkey ordered by (ts, event_id) desc, keep 1.
    * Scale: the window shuffles once on rowkey; no driver state.
    */
  private def kvUpsertLww(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("rowkey"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("rowkey", unix_timestamp(col("ts")).cast("string"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("rowkey"),
        lit("cf1").as("cf"),
        lit("messages").as("qualifier"),
        concat(col("event_type"), lit("--|--"), col("props")).as("cell_value"))
      .orderBy(col("rowkey"))
  }

  /** O6: bulk put intent — distinct records, rowkey = epochSec + "-" + key,
    * cf1/content, payload key + "--|--" + value (Streamer.scala:173,
    * HbaseWriter.scala:55-57). The reference's driver-side ArrayList bug is
    * deliberately NOT replicated (SURVEY.md §7.5) — set semantics expressed
    * relationally. Distinct on the full output row.
    */
  private def kvBulkPut(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        concat(unix_timestamp(col("ts")).cast("string"), lit("-"), col("event_type"))
          .as("rowkey"),
        lit("cf1").as("cf"),
        lit("content").as("qualifier"),
        concat(col("event_type"), lit("--|--"), col("props")).as("cell_value"))
      .dropDuplicates("rowkey", "cell_value")
      .orderBy(col("rowkey"), col("cell_value"))

  override def queries: Seq[Q] = Seq(
    Q("count_per_key", countPerKey, Some(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    Q("distinct_message_count", distinctMessageCount, Some(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct
        |FROM (SELECT DISTINCT event_type, props FROM events)""".stripMargin)),
    Q("batch_count", batchCount, Some(
      """SELECT date_trunc('hour', ts) AS batch_start, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("batch_summary", batchSummary, Some(
      """WITH b AS (
        |  SELECT date_trunc('hour', ts) AS batch_start,
        |         CAST(COUNT(*) AS BIGINT) AS n, MAX(ts) AS max_ts
        |  FROM events GROUP BY 1
        |), s AS (
        |  SELECT batch_start, n, max_ts,
        |         CAST(ROW_NUMBER() OVER (ORDER BY batch_start) AS BIGINT) AS batch_id
        |  FROM b
        |)
        |SELECT batch_start,
        |       'Spark - date:' || strftime(max_ts, '%Y/%m/%d %H:%M')
        |       || ' from topic: events - number of RDD (batches): ' || batch_id
        |       || ' - number of message ' || n AS summary
        |FROM s ORDER BY batch_start""".stripMargin)),
    Q("dedup_distinct", dedupDistinct, Some(
      """SELECT DISTINCT event_type, props FROM events
        |ORDER BY event_type, props""".stripMargin)),
    Q("null_key_fallback", nullKeyFallback, Some(
      """SELECT CASE WHEN NULLIF(event_type, 'error') IS NULL
        |            THEN 'kafka empty message'
        |            ELSE event_type || '--|--' || props END AS cell_value,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("kv_upsert_lww", kvUpsertLww, Some(
      """WITH k AS (
        |  SELECT CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) AS rowkey,
        |         event_type, props, ts, event_id
        |  FROM events
        |), r AS (
        |  SELECT rowkey, event_type, props,
        |         ROW_NUMBER() OVER (PARTITION BY rowkey ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM k
        |)
        |SELECT rowkey, 'cf1' AS cf, 'messages' AS qualifier,
        |       event_type || '--|--' || props AS cell_value
        |FROM r WHERE rn = 1 ORDER BY rowkey""".stripMargin)),
    Q("kv_bulk_put", kvBulkPut, Some(
      """SELECT DISTINCT
        |  CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) || '-' || event_type AS rowkey,
        |  'cf1' AS cf, 'content' AS qualifier,
        |  event_type || '--|--' || props AS cell_value
        |FROM events ORDER BY rowkey, cell_value""".stripMargin))
  )
}
