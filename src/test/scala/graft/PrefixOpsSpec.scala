package graft

import graft.operators.PrefixOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PrefixOps must agree exactly with the single-reducer window it replaces,
  * on every shape it is used for: ungrouped/grouped, asc/desc primaries,
  * running sums, and ntile for divisible, non-divisible, and total < n
  * group sizes — including bucket counts larger than the data so many
  * buckets are empty.
  */
class PrefixOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Tables.t(spark, sf001, "events")
    .select(col("event_id").cast("long").as("id"),
      col("event_type").as("g"),
      round(col("value") * 100).cast("long").as("v"))

  test("global rank + running sum match the unpartitioned window") {
    val w = Window.orderBy(col("v"), col("id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = ev
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("run", sum(col("v")).over(cum))
      .select("id", "rk", "run")
    val got = PrefixOps.withGlobalPrefix(
        ev, col("v"), Seq(col("v"), col("id")), sums = Seq("v"), buckets = 7)
      .select(col("id"), col("g_rank").as("rk"), col("g_run_v").as("run"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("descending primary via negated bucket key") {
    val w = Window.orderBy(col("v").desc, col("id"))
    val expected = ev.withColumn("rk", row_number().over(w).cast("long"))
      .select("id", "rk")
    val got = PrefixOps.withGlobalPrefix(
        ev, -col("v"), Seq(col("v").desc, col("id")), buckets = 5)
      .select(col("id"), col("g_rank").as("rk"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("grouped rank matches the partitioned window; g_n is the group size") {
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val expected = ev.withColumn("rk", row_number().over(w).cast("long"))
      .select("id", "rk")
    val pre = PrefixOps.withGlobalPrefix(
      ev, col("v"), Seq(col("v"), col("id")), groupKeys = Seq("g"), buckets = 8)
    val got = pre.select(col("id"), col("g_rank").as("rk"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    val sizes = ev.groupBy("g").count()
      .join(pre.select("g", "g_n").distinct(), "g")
      .filter(col("count") =!= col("g_n"))
    assert(sizes.isEmpty)
  }

  test("NULL group keys rank as their own group, like the window they replace") {
    val rows = Seq(
      (1L, Some("a"), 30L), (2L, Some("a"), 10L), (3L, None, 20L),
      (4L, None, 5L), (5L, Some("b"), 7L)).toDF("id", "g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val expected = rows.withColumn("rk", row_number().over(w).cast("long"))
      .select("id", "rk")
    val got = PrefixOps.withGlobalPrefix(
        rows, col("v"), Seq(col("v"), col("id")), groupKeys = Seq("g"),
        buckets = 4)
      .select(col("id"), col("g_rank").as("rk"))
    assert(got.count() === 5, "null-group rows must not be dropped")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("ntileFromRank reproduces ntile for divisible, ragged, and tiny totals") {
    for (total <- Seq(1, 3, 4, 7, 99, 100); n <- Seq(4, 10)) {
      val rows = (1 to total).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      val expected = rows.withColumn("t",
          ntile(n).over(Window.orderBy(col("id"))).cast("long"))
        .select("id", "t")
      val got = rows.withColumn("t",
          PrefixOps.ntileFromRank(col("id"), lit(total.toLong), n))
        .select("id", "t")
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"total=$total n=$n")
    }
  }

  test("buckets exceeding distinct keys leave no gaps in the rank") {
    val tiny = Seq((1L, 10L), (2L, 10L), (3L, 12L)).toDF("id", "v")
    val got = PrefixOps.withGlobalPrefix(
        tiny, col("v"), Seq(col("v"), col("id")), buckets = 64)
      .select("id", "g_rank").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
