package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators beyond plain relational algebra (north-star M3 extensions):
  * as-of join, range join, GROUPING SETS through the SQL surface.
  * None exist in the reference (SURVEY.md §2.7).
  */
object AdvancedOps extends QueryModule {

  private def events(s: SparkSession, dir: String) = Tables.t(s, dir, "events")

  /** As-of join (point-in-time lookup): for every event, the timestamp of the
    * most recent 'error' event of the same user at-or-before it.
    *
    * Spark-first shape: no join at all — a single partitioned sort +
    * last_value(…, ignoreNulls) running frame. At 100 TB this is one shuffle
    * on user_id and a linear scan per partition — strictly cheaper than the
    * range-join formulation (which would shuffle both sides and binary-search
    * per probe); the classic sorted-merge as-of join expressed declaratively.
    */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(
        col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"),
        last(when(col("event_type") === "error", col("ts")), ignoreNulls = true)
          .over(w).cast("timestamp_ntz").as("asof_error_ts"))
      .orderBy(col("event_id"))
  }

  /** Range join: lineitem priced into literal bands via a broadcast
    * non-equi join (BroadcastNestedLoopJoin against 4 rows — the probe side
    * streams, nothing shuffles). */
  private def rangeJoinBands(s: SparkSession, dir: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      ("00_low", 0.0, 20000.0),
      ("01_mid", 20000.0, 60000.0),
      ("02_high", 60000.0, 100000.0),
      ("03_premium", 100000.0, Double.MaxValue)
    )).toDF("band", "lo", "hi")
    Tables.t(s, dir, "lineitem")
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      .orderBy(col("band"))
  }

  /** GROUPING SETS through the SQL surface (DataFrame API only exposes
    * rollup/cube): independent marginals without the cross terms. */
  private def groupingSetsSql(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events_gs")
    s.sql(
      """SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
        |       CAST(grouping_id() AS BIGINT) AS gid,
        |       COUNT(*) AS n
        |FROM events_gs
        |GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 10 AS BIGINT)), ())
        |ORDER BY gid, event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST
        |""".stripMargin)
  }

  /** Per-key top-k through the custom physical operator
    * (org.apache.spark.sql.graft.TopKPerKey): bounded-heap partial top-k per
    * input partition → hash exchange on key → final top-k. The shuffle
    * carries ≤ k·keys·partitions rows instead of the whole table; the window
    * row_number formulation (the oracle) fully sorts every group.
    */
  private def topkExec(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.t(s, dir, "orders")
    org.apache.spark.sql.graft.TopKPerKey(
      orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      keys = Seq(col("o_custkey")),
      orderBy = Seq(col("o_totalprice").desc, col("o_orderkey")),
      k = 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Skew-mitigated aggregation: two-phase salt (groupBy(key, salt) partial →
    * groupBy(key) final). Identical result to the direct aggregate — the
    * pattern matters at 100 TB when one key dominates: the first phase fans a
    * hot key over 16 reducers instead of one. (AQE skew handling covers
    * joins; aggregation salting is still manual.) Long-quantized cents keep
    * it order-independent and oracle-exact.
    */
  private def saltedAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(round(col("value") * 100).cast("long")).as("pc"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("pc")).as("value_cents"))
      .orderBy(col("event_type"))

  override def queries: Seq[Q] = Seq(
    Q("salted_agg", saltedAgg, Some(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    Q("topk_exec_per_customer", topkExec, Some(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin)),
    Q("asof_join", asofJoin, Some(
      """SELECT event_id, user_id, ts, event_type,
        |  LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS asof_error_ts
        |FROM events ORDER BY event_id""".stripMargin)),
    Q("range_join_bands", rangeJoinBands, Some(
      """SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |JOIN (VALUES ('00_low', 0.0, 20000.0),
        |             ('01_mid', 20000.0, 60000.0),
        |             ('02_high', 60000.0, 100000.0),
        |             ('03_premium', 100000.0, 1e308)) b(band, lo, hi)
        |  ON l_extendedprice >= b.lo AND l_extendedprice < b.hi
        |GROUP BY b.band ORDER BY b.band""".stripMargin)),
    Q("grouping_sets", groupingSetsSql, Some(
      """SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
        |  CAST(GROUPING(event_type, CAST(user_id % 10 AS BIGINT)) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 10 AS BIGINT)), ())
        |ORDER BY gid, event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin))
  )
}
