package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Sources

/** Source surface (SURVEY.md §2.1): Kafka wire schema over batch and a real
  * readStream file source. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("kafkaShapedBatch projects the Kafka wire schema") {
    val df = Sources.kafkaShapedBatch(spark, sf001, "page_visits")
    assert(df.columns.toSeq ===
      Seq("key", "value", "topic", "partition", "offset", "timestamp"))
    assert(df.schema("timestamp").dataType.typeName === "timestamp")
    assert(df.count() === 1000)
    assert(df.select($"topic").distinct().as[String].collect().toSeq
      === Seq("page_visits"))
  }

  test("kafkaShapedStream streams the same records through readStream") {
    val q = Sources.kafkaShapedStream(spark, sf001)
      .groupBy($"key").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("src_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("select * from src_counts")
      .as[(String, Long)].collect().toMap
    val batch = Sources.kafkaShapedBatch(spark, sf001)
      .groupBy($"key").count().as[(String, Long)].collect().toMap
    assert(streamed === batch)
  }
}
