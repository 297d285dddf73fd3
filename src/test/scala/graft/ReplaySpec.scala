package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream ≡ batch: each deterministic replay query (streaming.ReplayOps —
  * the real StreamJobs pipelines over a MemoryStream of the events fixture)
  * must equal the same computation done in plain batch Spark. The driver's
  * DuckDB oracle checks the same equality against a second engine; this
  * spec keeps it pinned inside `sbt test`.
  */
class ReplaySpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(c => col(c).cast("string")): _*)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString(""))
  }

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf001)

  private val events = Tables.t(spark, sf001, "events")

  test("streaming_session_replay equals batch session_window aggregation") {
    val batch = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n"))
    assert(rows(run("streaming_session_replay")) === rows(batch))
  }

  test("streaming_window_counts_replay equals batch tumbling-hour counts") {
    val batch = events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(rows(run("streaming_window_counts_replay")) === rows(batch))
  }

  test("streaming dedup replays equal batch DISTINCT (single- and two-batch)") {
    val batch = events.select(col("user_id"), col("event_type")).distinct()
    assert(rows(run("streaming_dedup_replay")) === rows(batch))
    // two-batch variant: second batch's dups suppressed by cross-batch state
    assert(rows(run("streaming_dedup_ww_replay")) === rows(batch))
  }

  test("streaming_topk_replay equals batch per-window rank, final ranks only") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("n").desc, col("user_id"))
    val batch = events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
    assert(rows(run("streaming_topk_replay")) === rows(batch))
  }
}
