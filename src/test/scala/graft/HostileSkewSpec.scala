package graft

import org.apache.spark.sql.functions._

/** Shuffle-family semantics under adversarial KEY SKEW — one hot key
  * carrying ~50% of the rows (fixtures/hostile_skew,
  * tools/make_hostile_skew.py: events user 7777 = 50% of events, one hot
  * partkey/suppkey = 50% of lineitem). The synthetic tables are
  * near-uniform, so nothing else in the harness proves the catalog's
  * groupBy/window/join shuffles survive the first thing that kills a
  * pipeline at 100 TB: a hot key landing one giant partition on one task.
  *
  * Three guards:
  *  1. the groupBy/window/join families stay correct and deterministic
  *     with half the table on one key (a skew-broken plan typically OOMs,
  *     drops rows in a salted re-merge, or goes nondeterministic on
  *     per-partition tie-breaks);
  *  2. the catalog's own skew diagnostics (key_skew_report) and skew
  *     mitigation (skew_join_salted) actually see/handle THIS skew;
  *  3. AQE's skew-join splitting ENGAGES on the hot key once its
  *     size thresholds are scaled down to fixture bytes — the same
  *     OptimizeSkewedJoin rule that re-plans the real thing at cluster
  *     scale, observed via the skew=true marker in the executed plan.
  */
class HostileSkewSpec extends SparkSpec {

  private val dir = "fixtures/hostile_skew"
  private val HotUser = 7777L

  // shuffle-heavy events-backed queries: hash aggregates, windows over the
  // hot user's 1000-row partition, sessionization, self-joins, streaming
  // state stores fed 50%-one-key batches
  private val eventQueries = Seq(
    "count_per_key", "dau_wau", "daily_percentiles", "exact_percentiles",
    "window_moving_avg", "window_lead_lag", "sliding_hour", "tumbling_daily",
    "session_windows", "session_cap_split", "session_concurrency",
    "top_paths_3", "event_transitions", "pivot_user_events", "salted_agg",
    "funnel_conversion", "retention_cohorts", "collect_sorted",
    "attribution_last_touch", "time_to_conversion", "debounce_events",
    "streaming_window_counts_replay", "streaming_topk_replay",
    "streaming_sessionize_replay", "streaming_running_counts_replay",
    "streaming_heavy_hitters_replay", "streaming_dedup_replay")

  // lineitem-backed: the hot part/supplier flows through TPC-H aggregates,
  // top-k windows, and the co-purchase graph (where it becomes a
  // high-degree hub node)
  private val lineitemQueries = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q9_product_profit",
    "q18_large_orders", "topk_orders", "supplier_pareto",
    "window_running_supplier", "copurchase_pairs", "degree_distribution",
    "key_skew_report", "skew_join_salted")

  private def runTwice(name: String): Seq[String] = {
    val fn = SparkEntry.queries(name)
    def run() = fn(spark, dir).collect().map(_.toSeq.mkString("|")).toSeq
    val first = run()
    assert(run() == first, s"$name nondeterministic under key skew")
    spark.catalog.clearCache()
    first
  }

  test("events shuffle family survives a 50%-hot-key table, twice") {
    eventQueries.foreach { name =>
      val rows = runTwice(name)
      assert(rows.nonEmpty, s"$name empty on skew fixture")
    }
  }

  test("lineitem shuffle family survives a 50%-hot-key table, twice") {
    lineitemQueries.foreach { name =>
      val rows = runTwice(name)
      assert(rows.nonEmpty, s"$name empty on skew fixture")
    }
  }

  test("key_skew_report surfaces exactly this hot key") {
    val hotPart = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey")).orderBy(col("p_partkey")).limit(1)
      .collect()(0).getLong(0)
    val rep = SparkEntry.queries("key_skew_report")(spark, dir).collect()
    spark.catalog.clearCache()
    assert(rep.length == 1)
    val r = rep(0)
    assert(r.getAs[Long]("hot_key") == hotPart,
      s"hot_key ${r.getAs[Long]("hot_key")} != seeded hot part $hotPart")
    assert(r.getAs[Long]("max_freq") >= 6000L,
      "hot part must carry the seeded 6000 rows")
  }

  test("hot-user aggregates are exact despite the skewed partition") {
    // ground truth computed WITHOUT a user_id shuffle (filter then count)
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("user_id") === HotUser).count()
    assert(expected >= 1000L)
    val got = SparkEntry.queries("pivot_user_events")(spark, dir)
      .filter(col("user_id") === HotUser).collect()
    spark.catalog.clearCache()
    assert(got.length == 1, s"hot user missing from pivot: ${got.toSeq}")
    val total = Seq("click", "error", "purchase", "signup", "view")
      .map(t => got(0).getAs[Long](t)).sum
    assert(total == expected, s"hot-key pivot total $total != $expected")
  }

  test("AQE skew-join splitting engages on the hot key") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.exchange.reuse",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // fixture-scale thresholds: the hot user's partition is ~tens of KB,
      // not the 256 MB production default
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      // a self-join reuses one exchange for both sides; keep the stages
      // independent so the skew rule sees two splittable shuffle reads
      conf.set("spark.sql.exchange.reuse", "false")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the query below aggregates ON the join key, so unforced
      // OptimizeSkewedJoin declines (splitting breaks the partitioning the
      // agg wants and would add a shuffle); force is exactly what a
      // production job with a keyed downstream agg sets
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // carry the fat columns: skew detection reads COMPRESSED map-output
      // sizes, and a 2-long row compresses under any usable threshold at
      // fixture scale. The repartition(8) matters semantically: skew
      // splitting works at MAP-OUTPUT granularity, and a one-file scan is
      // ONE map task whose hot partition can never be subdivided — the
      // same reason a production job reading one giant unsplittable file
      // sees no skew relief until the scan parallelizes.
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_id"), col("ts"), col("props"),
          concat_ws(":", col("event_type"), col("event_id"), col("props"),
            col("value")).as("pad"))
        .repartition(8)
      val joined = ev.as("a").join(ev.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_id") < col("b.event_id"))
        .groupBy(col("a.user_id")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("a.user_id"))
      val rows = joined.collect()
      // semantic check: the hot user's self-join pair count is exact
      val hot = rows.find(_.getLong(0) == HotUser).get.getLong(1)
      val n = ev.filter(col("user_id") === HotUser).count()
      assert(hot == n * (n - 1) / 2, s"hot self-join pairs $hot != C($n,2)")
      // plan check: OptimizeSkewedJoin marked the join
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected skew=true in executed plan, got:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
  // round 13: window_running_supplier gained a hot-key gate — above
  // WRS_SINGLE_KEY_MAX rows on one supplier the per-supplier window (one
  // task per key, unsplittable by AQE) is replaced by the PrefixOps
  // two-level prefix form. The two physical paths must be ROW-identical on
  // exactly the data that flips the gate: this fixture's hot supplier
  // (50% of lineitem on one key). Sorted compare: fully-duplicate input
  // tuples order arbitrarily between themselves in both paths.
  test("window_running_supplier prefix path ≡ window path under key skew") {
    val base = operators.RelationalOps.wrsBase(spark, dir)
    def rows(prefix: Boolean): Seq[String] =
      operators.RelationalOps.windowRunningSupplierBy(base, prefix)
        .collect().map(_.toSeq.mkString("|")).toSeq.sorted
    val w = rows(prefix = false)
    val p = rows(prefix = true)
    assert(p.size == w.size, s"row count ${p.size} != ${w.size}")
    assert(p == w, "prefix path diverges from window path under key skew")
    spark.catalog.clearCache()
  }
}
