package graft

import org.apache.spark.sql.functions._

/** Interval analytics (round 5): session concurrency buckets, banded
  * interval self-overlap, and market-basket triples — each checked against
  * an independent brute-force recomputation at sf0.001.
  */
class IntervalOpsSpec extends SparkSpec {
  import spark.implicits._

  /** (user_id, startUs, endUs) spans recomputed from session_windows —
    * the already-verified sessionization surface. */
  private lazy val spans: Seq[(Long, Long, Long)] =
    SparkEntry.queries("session_windows")(spark, sf001)
      .select($"user_id",
        unix_micros($"session_start".cast("timestamp")),
        unix_micros($"session_end".cast("timestamp")))
      .as[(Long, Long, Long)].collect().toSeq

  test("session_concurrency equals brute-force bucket stabbing") {
    val got = SparkEntry.queries("session_concurrency")(spark, sf001)
      .as[(Long, Long, Long)].collect().toSeq
    val B = 600000000L // 10 min in µs
    val expected = spans
      .flatMap { case (u, s, e) => (s / B to (e - 1) / B).map(b => (b, u)) }
      .groupBy(_._1)
      .map { case (b, us) => (b * 600L, us.size.toLong, us.map(_._2).distinct.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(got === expected)
    // spot-check semantics: every bucket a session covers is stabbed by it
    assert(got.map(_._2).sum === spans.map { case (_, s, e) => (e - 1) / B - s / B + 1 }.sum)
  }

  test("session_overlap_pairs equals the O(n^2) overlap count") {
    val got = SparkEntry.queries("session_overlap_pairs")(spark, sf001)
      .select($"user_id", unix_micros($"session_start".cast("timestamp")), $"n_overlap")
      .as[(Long, Long, Long)].collect().toSeq
    val expected = spans.map { case (u, s, e) =>
      val n = spans.count { case (u2, s2, e2) => u2 != u && s < e2 && s2 < e }
      (u, s, n.toLong)
    }.sortBy(t => (t._1, t._2))
    assert(got === expected)
    assert(got.exists(_._3 > 0), "fixture should contain at least one overlap")
    assert(got.size === spans.size, "every session appears, including zero-overlap ones")
  }

  test("frequent_triples equals brute-force triple counting") {
    val got = SparkEntry.queries("frequent_triples")(spark, sf001)
      .as[(String, String, String, Long)].collect().toSeq
    val orderBrands = Tables.t(spark, sf001, "lineitem")
      .join(Tables.t(spark, sf001, "part"), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toVector).toMap
    val support = scala.collection.mutable.Map[(String, String, String), Long]()
    orderBrands.values.foreach { bs =>
      for (i <- bs.indices; j <- i + 1 until bs.size; k <- j + 1 until bs.size)
        support((bs(i), bs(j), bs(k))) = support.getOrElse((bs(i), bs(j), bs(k)), 0L) + 1L
    }
    val expected = support.toSeq.filter(_._2 >= 10)
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }.take(20)
    assert(got === expected)
  }
}
