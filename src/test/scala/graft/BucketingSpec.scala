package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located join story (SURVEY.md §7 / 100 TB posture):
  * both fact tables pre-hashed into the same bucket layout on the join key →
  * repeated joins plan with NO shuffle exchange on either side. At cluster
  * scale this is the difference between re-shuffling 100 TB per join and
  * reading co-located buckets.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.t(spark, sf001, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val ord = Tables.t(spark, sf001, "orders")
      .select($"o_orderkey", $"o_totalprice")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it computes the same thing as the unbucketed join
      val expected = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
        .orderBy($"l_orderkey").as[(Long, Double)].collect().toSeq
      val got = joined.orderBy($"l_orderkey").as[(Long, Double)].collect().toSeq
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
