package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Sources

/** Source surface (SURVEY.md §2.1): Kafka wire schema over batch and a real
  * readStream file source. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("kafka wire schema: model equals spark-sql-kafka's schema after the " +
      "documented one-line swap's CAST projection (drift guard)") {
    import org.apache.spark.sql.types._
    // Literal copy of the spark-sql-kafka source output schema, from the
    // public Structured Streaming + Kafka Integration Guide ("Each row in
    // the source has the following schema"): key/value are BINARY, plus
    // topic/partition/offset/timestamp/timestampType metadata. If an
    // upstream Spark release ever changes it, this literal goes stale and
    // the swap recipe in README.md must be revisited — that review is the
    // point of the pin.
    val sparkSqlKafka = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    // The README swap projects CAST(key AS STRING), CAST(value AS STRING)
    // (the reference consumed (String, String) pairs, Streamer.scala:120)
    // and keeps every metadata column except timestampType.
    val afterSwap = StructType(sparkSqlKafka.fields.toSeq.flatMap {
      case StructField("key", BinaryType, n, m) =>
        Some(StructField("key", StringType, n, m))
      case StructField("value", BinaryType, n, m) =>
        Some(StructField("value", StringType, n, m))
      case StructField("timestampType", _, _, _) => None
      case f => Some(f)
    })
    assert(Sources.kafkaWireSchema === afterSwap,
      "model wire schema drifted from the documented kafka swap projection")
    // and the modeled batch source actually produces it (names + types;
    // nullability is projection-dependent — lit(topic) is non-null)
    assert(Sources.kafkaShapedBatch(spark, sf001).schema.fields.toSeq
      .map(f => (f.name, f.dataType))
      === afterSwap.fields.toSeq.map(f => (f.name, f.dataType)))
  }

  test("kafkaShapedBatch projects the Kafka wire schema") {
    val df = Sources.kafkaShapedBatch(spark, sf001, "page_visits")
    assert(df.columns.toSeq ===
      Seq("key", "value", "topic", "partition", "offset", "timestamp"))
    assert(df.schema("timestamp").dataType.typeName === "timestamp")
    assert(df.count() === 1000)
    assert(df.select($"topic").distinct().as[String].collect().toSeq
      === Seq("page_visits"))
  }

  test("CSV and JSON-lines sources round-trip the events table with an " +
      "explicit schema (format breadth beyond parquet)") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .select($"event_id", $"user_id", $"event_type", $"value", $"props")
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    ev.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    ev.write.mode("overwrite").json(s"$dir/json")
    // explicit schema: inference is a scan-the-data-twice antipattern and
    // type-unstable (CSV would read event_id as int on small files)
    val schema = ev.schema
    val backCsv = spark.read.schema(schema).option("header", "true")
      .csv(s"$dir/csv")
    val backJson = spark.read.schema(schema).json(s"$dir/json")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy($"event_id")
        .select(concat_ws("|", $"event_id", $"user_id", $"event_type",
          round($"value" * 1e6).cast("long"), coalesce($"props", lit(""))))
        .as[String].collect().toSeq
    assert(canon(backCsv) === canon(ev))
    assert(canon(backJson) === canon(ev))
  }

  test("from_json on malformed records yields null rows, not failures " +
      "(PERMISSIVE default)") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT")
    val df = Seq("""{"k": 7}""", """{"k": """, "not json at all", null)
      .toDF("props")
      .select($"props", from_json($"props", schema).as("parsed"))
    val got = df.select($"parsed.k").as[Option[Int]].collect().toSeq
    assert(got === Seq(Some(7), None, None, None))
    // corrupt-record capture: the raw text is recoverable for a quarantine
    // column rather than silently dropped
    val cap = Seq("""{"k": 7}""", "broken").toDF("props")
      .select(from_json($"props", "k INT, _corrupt_record STRING",
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
      .select($"p._corrupt_record").as[Option[String]].collect().toSeq
    assert(cap === Seq(None, Some("broken")))
  }

  test("kafkaShapedStream streams the same records through readStream") {
    val q = Sources.kafkaShapedStream(spark, sf001)
      .groupBy($"key").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("src_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); graft.streaming.StreamQuiet.quietStop(q)
    val streamed = spark.sql("select * from src_counts")
      .as[(String, Long)].collect().toMap
    val batch = Sources.kafkaShapedBatch(spark, sf001)
      .groupBy($"key").count().as[(String, Long)].collect().toMap
    assert(streamed === batch)
  }
}
