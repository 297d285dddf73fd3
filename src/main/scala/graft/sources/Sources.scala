package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources (SURVEY.md §2.1): the reference's single input is a Kafka direct
  * stream of (key, value) strings (Streamer.scala:107-120,
  * KafkaStreamerToHbase.scala:66-83). No Kafka jar/broker ships in this
  * image, so the source surface is:
  *
  *   - `kafkaShapedBatch`  — events table projected to the Kafka wire schema
  *   - `kafkaShapedStream` — a real `readStream` file source producing the
  *     same schema (micro-batch incremental scan, offset-tracked by the
  *     engine's own offset log — the Structured Streaming equivalent of the
  *     direct stream's driver-tracked offsets, SURVEY.md §4)
  *   - `memoryStream` in tests (StreamJobsSpec) for deterministic batches
  *
  * A real Kafka deployment swaps one line:
  * `spark.readStream.format("kafka").option("kafka.bootstrap.servers", …)
  *   .option("subscribe", topics)` — S3's comma-list subscribe included.
  */
object Sources {

  /** The Kafka wire schema as produced by spark-sql-kafka. */
  val kafkaWireSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  private def project(df: DataFrame, topic: String): DataFrame =
    df.select(
      col("event_type").as("key"),
      col("props").as("value"),
      lit(topic).as("topic"),
      (col("user_id") % 4).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"))

  /** events → Kafka-shaped batch DataFrame (event_type ≈ key, props ≈ value). */
  def kafkaShapedBatch(spark: SparkSession, dir: String,
      topic: String = "page_visits"): DataFrame =
    project(graft.Tables.t(spark, dir, "events"), topic)

  /** events → Kafka-shaped *streaming* DataFrame via the parquet file
    * source. maxFilesPerTrigger gives multi-batch behavior over static data.
    */
  def kafkaShapedStream(spark: SparkSession, dir: String,
      topic: String = "page_visits"): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // readStream needs the schema up front; peek at the file with a batch
    // read to learn which testdata generation is on disk (TIMESTAMP(NANOS)
    // read as long vs TIMESTAMP(MICROS) read as TIMESTAMP_NTZ) and declare
    // the matching source schema. Both branches normalize ts to TIMESTAMP
    // (µs under the UTC session zone), same as Tables.t.
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val raw = spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", tsType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType))))
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val normalized = tsType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
    project(normalized, topic)
  }
}
