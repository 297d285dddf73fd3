package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The Kafka wire schema (FIXTURES.md §B) — what
  * `spark.readStream.format("kafka")` yields and what the reference consumed
  * as (String, String) pairs (Streamer.scala:120, KafkaStreamerToHbase.scala:83).
  * No Kafka jar/broker ships in this image, so sources are MemoryStream /
  * file streams projecting this schema; a real Kafka source is a one-line
  * `.format("kafka")` swap (SURVEY.md §7.5).
  */
case class KafkaShaped(
    key: String,
    value: String,
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: java.sql.Timestamp)

/** Append-only "topic table" modeling a Kafka producer sink
  * (KafkaProducer.scala:8-11): parquet rows (topic, key, value, ts). */
final class TopicTableSink(path: String) extends Serializable {
  def append(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** KV-upsert sink with HBase cell semantics (HbaseWriter.scala:22-31):
  * rows (rowkey, cf, qualifier, cell_value, ts); last write per
  * (rowkey, cf, qualifier) wins — the observable rowkey-collision behavior of
  * Streamer.scala:163 / KafkaStreamerToHbase.scala:154-158 as a deterministic
  * relational rule. Modeled as read-union-dedup-overwrite parquet; at scale
  * this is a Delta/Hudi MERGE or a real wide-column store — the semantics
  * tested here are identical.
  */
final class KvUpsertSink(path: String) extends Serializable {
  def upsert(spark: SparkSession, batch: DataFrame): Unit = {
    val existing =
      try spark.read.parquet(path)
      catch { case _: Throwable => spark.emptyDataFrame }
    val all =
      if (existing.columns.sameElements(batch.columns)) existing.unionAll(batch)
      else batch
    val w = Window.partitionBy(col("rowkey"), col("cf"), col("qualifier"))
      .orderBy(col("ts").desc)
    val merged = all
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .cache()
    merged.count() // materialize before overwriting the input path
    merged.write.mode("overwrite").parquet(path + "_tmp")
    merged.unpersist()
    val fs = new java.io.File(path)
    if (fs.exists()) { org.apache.commons.io.FileUtils.deleteDirectory(fs) }
    new java.io.File(path + "_tmp").renameTo(fs)
  }
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** Structured Streaming rebuilds of the reference's two pipelines.
  * Batch-form equivalents of every transformation are the oracle-checked
  * queries in graft.operators.CoreOps; here the same expressions run
  * incrementally with foreachBatch/batchId — restart-safe where the
  * reference's driver `var counter` was not (SURVEY.md §2.3 A4).
  */
object StreamJobs {

  /** ≈ Streamer.main (Streamer.scala:120-202): per micro-batch, compute the
    * record count and distinct messages, emit one formatted summary line to
    * the topic table, upsert the summary cell, and bulk-write distinct
    * messages. batchId replaces the driver-side counter (exactly-once).
    */
  def summaryPipeline(
      input: DataFrame,
      topics: String,
      outTopic: String,
      topicSink: TopicTableSink,
      kvSink: KvUpsertSink,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    input.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val spark = df.sparkSession
        val cached = df.cache()
        try {
          val n = cached.count()
          // deterministic batch time = max event time (reference used wall clock)
          val batchTs = cached.agg(max(col("timestamp"))).head().getTimestamp(0)
          if (batchTs != null) {
            val epochSec = batchTs.getTime / 1000
            val fmt = new java.text.SimpleDateFormat("yyyy/MM/dd HH:mm")
            fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
            val summary = s"Spark - date:${fmt.format(batchTs)} from topic: " +
              s"$topics - number of RDD (batches): ${batchId + 1} - number of message $n"
            import spark.implicits._
            topicSink.append(
              Seq((outTopic, null: String, summary, batchTs))
                .toDF("topic", "key", "value", "ts"))
            kvSink.upsert(spark,
              Seq((epochSec.toString, "cf1", "messages", summary, batchTs))
                .toDF("rowkey", "cf", "qualifier", "cell_value", "ts"))
            // bulk table: distinct messages, rowkey = epochSec-key (O6 intent)
            kvSink.upsert(spark,
              cached
                .dropDuplicates("key", "value")
                .select(
                  concat(lit(epochSec.toString), lit("-"), coalesce(col("key"), lit("null")))
                    .as("rowkey"),
                  lit("cf1").as("cf"),
                  lit("content").as("qualifier"),
                  when(col("key").isNull, lit("kafka empty message"))
                    .otherwise(concat(col("key"), lit("--|--"), col("value")))
                    .as("cell_value"),
                  col("timestamp").as("ts")))
          }
        } finally cached.unpersist()
        ()
      }
      .start()
  }

  /** ≈ KafkaStreamerToHbase.main (KafkaStreamerToHbase.scala:87-167):
    * per-record KV writes where every record in a partition shares the
    * rowkey (epoch second) — so last-write-wins leaves ≤1 surviving cell per
    * second, expressed relationally instead of via executor-side mutation.
    */
  def perRecordPipeline(
      input: DataFrame,
      kvSink: KvUpsertSink,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    input.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        kvSink.upsert(df.sparkSession,
          df.select(
            (unix_timestamp(col("timestamp"))).cast("string").as("rowkey"),
            lit("cf1").as("cf"),
            lit("message").as("qualifier"),
            when(col("key").isNull, lit("kafka empty message"))
              .otherwise(concat(col("key"), lit("--|--"), col("value")))
              .as("cell_value"),
            col("timestamp").as("ts")))
        ()
      }
      .start()

  /** Continuous per-key counts with event-time window + watermark — the
    * streaming form of CoreOps.countPerKey/batchCount, with late-data drop
    * the reference never had. Append mode requires the watermark.
    */
  def windowedCounts(input: DataFrame, window_ : String, watermark: String): DataFrame =
    input
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), window_), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("key"), col("n"))

  /** Cross-batch streaming dedup with watermark (D1 generalized). */
  def streamingDedup(input: DataFrame, watermark: String): DataFrame =
    input
      .withWatermark("timestamp", watermark)
      .dropDuplicates("key", "value")

  /** Stream-stream interval join: right-side events joined to left-side
    * events with the same key within [left.ts, left.ts + window]. Watermarks
    * on both sides bound the join state (no unbounded buffering — the
    * at-scale requirement for stream-stream joins). No reference analog.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      window_ : String, watermark: String): DataFrame = {
    val l = left.withWatermark("timestamp", watermark)
      .select(col("key").as("l_key"), col("value").as("l_value"),
        col("timestamp").as("l_ts"))
    val r = right.withWatermark("timestamp", watermark)
      .select(col("key").as("r_key"), col("value").as("r_value"),
        col("timestamp").as("r_ts"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"interval $window_"))
  }

  /** Cross-batch per-key running counts via mapGroupsWithState — the
    * reference's driver-side `var counter` (A4, Streamer.scala:122,128)
    * generalized to per-key, fault-tolerant state: checkpointed by the state
    * store instead of lost on restart. Output mode: update.
    */
  def runningCountsPerKey(input: org.apache.spark.sql.Dataset[KafkaShaped])
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[(String, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    input.groupByKey(r => if (r.key == null) "" else r.key)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (key, n)
      }
  }

  /** The reference's foreachPartition open/write/close lifecycle
    * (KafkaStreamerToHbase.scala:88-167) as a real ForeachWriter; sinks each
    * record into a per-JVM buffer keyed by a test-supplied id. */
  final class BufferForeachWriter(bufferId: String) extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(row: Row): Unit =
      BufferForeachWriter.append(bufferId, row.mkString("|"))
    override def close(errorOrNull: Throwable): Unit = ()
  }
  object BufferForeachWriter {
    private val buffers =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.Queue[String]]()
    def append(id: String, s: String): Unit =
      buffers.computeIfAbsent(id, _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
        .add(s)
    def get(id: String): Seq[String] = {
      val q = buffers.get(id)
      if (q == null) Seq.empty
      else { val it = q.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next(); b.result() }
    }
    def clear(id: String): Unit = buffers.remove(id)
  }
}
