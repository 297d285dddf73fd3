package graft

import org.apache.spark.sql.functions._

/** Lake-layout write path: date-partitioned parquet + partition pruning —
  * the 100 TB read-path story: a day filter must prune to one directory,
  * never scan the table.
  */
class PartitionedWriteSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned write prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.t(spark, sf001, "events")
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(out)

    val read = spark.read.parquet(out).filter($"day" === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString

    // pruning happens at planning: only the matching partition dir is listed
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    val expected = Tables.t(spark, sf001, "events")
      .filter(date_format($"ts", "yyyy-MM-dd") === "2024-01-05").count()
    assert(read.count() === expected)
    assert(expected > 0)

    // and a projection only reads the requested columns
    val pruned = spark.read.parquet(out).select($"event_id")
      .queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema: struct<event_id:bigint>"), pruned)
  }
}
