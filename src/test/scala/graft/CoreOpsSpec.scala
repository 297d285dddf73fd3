package graft

import org.apache.spark.sql.functions._

/** Reference-quirk semantics (SURVEY.md §2, §7.5) on tiny in-memory data. */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kv upsert last-write-wins: one survivor per rowkey, the latest") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"rowkey").orderBy($"ts".desc)
    val rows = Seq(
      ("1000", "a", 1L), ("1000", "b", 2L), ("1000", "c", 3L),
      ("1001", "x", 4L)).toDF("rowkey", "v", "ts")
    val winner = rows.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"rowkey", $"v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(winner === Map("1000" -> "c", "1001" -> "x"))
  }

  test("null-key fallback routes to the literal reference row") {
    val df = Seq((null: String, "v1"), ("k", "v2")).toDF("key", "value")
      .select(when($"key".isNull, lit("kafka empty message"))
        .otherwise(concat($"key", lit("--|--"), $"value")).as("cell"))
    assert(df.as[String].collect().sorted === Array("k--|--v2", "kafka empty message"))
  }

  test("distinct-before-bulk dedups (key,value) pairs exactly") {
    val df = Seq(("a", "1"), ("a", "1"), ("a", "2"), ("b", "1"))
      .toDF("key", "value").dropDuplicates("key", "value")
    assert(df.count() === 3)
  }

  test("batch summary format matches the reference shape") {
    val q = SparkEntry.queries("batch_summary")(spark, sf001)
    val first = q.select($"summary").as[String].head()
    assert(first.matches(
      "Spark - date:\\d{4}/\\d{2}/\\d{2} \\d{2}:\\d{2} from topic: events" +
        " - number of RDD \\(batches\\): \\d+ - number of message \\d+"))
  }

  test("count_per_key totals equal table count (A1 vs A3)") {
    val perKey = SparkEntry.queries("count_per_key")(spark, sf001)
      .agg(sum($"n")).as[Long].head()
    val total = Tables.t(spark, sf001, "events").count()
    assert(perKey === total)
  }

  test("hll approx distinct is within the 5% band on every group") {
    // the band boolean IS the query's hash-channel contract (the oracle
    // emits literal TRUE); pin it Spark-side too
    val rows = SparkEntry.queries("hll_distinct")(spark, sf001)
      .select($"exact_users", $"hll_within_5pct").as[(Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, ok) =>
      assert(ok, s"HLL estimate left the 5% band at exact=$exact")
    }
  }

  test("every registered oracle query returns rows at sf0.001") {
    // cheap smoke over the whole registry (full value check is Verify+DuckDB)
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf001).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
