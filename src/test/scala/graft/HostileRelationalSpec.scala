package graft

import org.apache.spark.sql.functions._

/** Relational-family (TPC-H/graph/basket) semantics under hostile inputs.
  * The synthetic lineitem/orders/customer/part tables have no NULL join
  * keys, no zero/negative/fractional quantities, no rows exactly on the
  * q1/q6/q19 predicate boundaries and no duplicate-key fan-out, so the
  * DuckDB oracle can never exercise those edges at any SF. The committed
  * `fixtures/hostile_relational` tables (tools/make_hostile_relational.py)
  * add exactly those rows; the full 63-query relational-only Verify +
  * oracle compare runs green against them dev-side, and this spec pins the
  * Spark-side semantics so a regression is caught in `sbt test` without
  * DuckDB.
  *
  * Divergence classes this fixture caught in round 7 (all fixed, now
  * guarded here): double→DECIMAL(38,6) implicit-cast rounding 1 ulp apart
  * at a half-micro boundary (dsum → explicit ROUND quantization), SQL
  * division precedence in ratio oracles (q8/q14), ANSI divide-by-zero
  * abort on a zero-quantity row (q2), NULL l_orderkey counted as a basket
  * (assoc_rules) / aborting DuckDB's '0x'||md5 cast (basket split), NULL
  * price/size parts vacuously NOT-EXISTS-admitted to the skyline, and
  * Spark's truncating double→long cast vs DuckDB's rounding one
  * (weighted_median).
  */
class HostileRelationalSpec extends SparkSpec {

  private val dir = "fixtures/hostile_relational"

  // every catalog query whose inputs are only the seven relational tables —
  // the fixture dir deliberately holds nothing else, so an out-of-date
  // entry here fails loudly with file-not-found instead of silently
  // skipping (enumerated by running Verify against the fixture dir)
  private val relationalQueries = Seq(
    "anti_join_orderless", "assoc_rules", "benford_digits", "bfs_hops",
    "chi2_independence", "copurchase_pairs", "correlated_max_order",
    "cube_segment_priority", "customer_rfm", "degree_distribution",
    "frequent_triples", "gini_concentration", "harmonic_centrality",
    "hits_scores", "item_item_sim",
    "jaro_winkler_pairs", "k_anonymity_report", "kcore_peel", "key_skew_report",
    "l_diversity_report", "label_propagation", "link_prediction_cn",
    "merge_upsert",
    "monthly_revenue_mom", "not_in_heavy_parts", "pagerank",
    "pipe_syntax_agg",
    "percent_of_parent", "pii_scrub", "q10_returned_items",
    "q11_important_stock", "q12_shipmode_priority", "q13_order_distribution",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_cnt",
    "q17_small_quantity", "q18_large_orders", "q19_discount_revenue",
    "q1_pricing_summary", "q20_excess_suppliers", "q21_late_shipper",
    "q22_idle_customers", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_priority_count", "q5_local_supplier", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "range_join_bands", "recsys_ndcg_eval", "recsys_precision_eval",
    "rollup_returns", "scalar_subquery_above_avg", "semi_join_open_orders",
    "skyline_parts", "supplier_pareto", "topk_exec_per_customer",
    "topk_orders", "unpivot_measures", "weighted_median",
    "window_frame_values", "window_running_supplier", "window_share_rank",
    "window_topk_per_customer")

  test("every relational-only query survives the hostile fixture, twice") {
    relationalQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run() = fn(spark, dir).collect().map(_.toSeq.mkString("|")).toSeq
      val first = run()
      assert(run() == first, s"$name nondeterministic on hostile relational")
      spark.catalog.clearCache()
    }
  }

  test("zero-quantity rows yield NULL unit cost, never an ANSI abort (q2)") {
    // the fixture's one l_quantity = 0 row would make
    // l_extendedprice / l_quantity abort under ANSI; the guard must drop it
    // out of the MIN exactly as DuckDB's /0→NULL does
    val got = SparkEntry.queries("q2_min_cost_supplier")(spark, dir).collect()
    assert(got.nonEmpty)
  }

  test("NULL price/size parts are excluded from the skyline") {
    // DuckDB's NOT EXISTS is vacuously TRUE for the NULL-attribute part
    // (every comparison in the dominance subquery is NULL) — both engines
    // must drop it explicitly; with it the hostile skyline would be 3 rows
    val rows = SparkEntry.queries("skyline_parts")(spark, dir).collect()
    assert(rows.length === 2, "NULL-attribute part must not join the skyline")
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("fractional quantities round half-away through the weight path") {
    // 23.5 qty: Spark's plain double→long cast TRUNCATES (23) where
    // DuckDB's rounds (24) — the explicit ROUND makes both say 24, so
    // flag A's total weight is pinned at the rounded value
    val a = SparkEntry.queries("weighted_median")(spark, dir)
      .filter(col("l_returnflag") === "A").collect()
    assert(a.length === 1 && a.head.getAs[Long]("total_weight") === 49480L,
      "23.5 must contribute 24 (ROUND), not 23 (truncate)")
  }

  test("a NULL orderkey is not a basket") {
    // n_orders (and every lift denominator) must count only real orders;
    // DuckDB's COUNT(DISTINCT) skips NULL where a groupBy keeps the group
    val rules = SparkEntry.queries("assoc_rules")(spark, dir).collect()
    assert(rules.nonEmpty)
    spark.catalog.clearCache()
    // and the md5-bucketed split must not abort on concat('0x', md5(NULL))
    val eval = SparkEntry.queries("recsys_precision_eval")(spark, dir).collect()
    assert(eval.nonEmpty)
  }

  test("dsum's ROUND quantization is exact on the 1-ulp boundary row") {
    // 500.125·0.93·1.01 lands within one double ULP of a half-micro
    // boundary: the old implicit double→DECIMAL(38,6) cast summed one µ
    // apart across engines; the explicit-ROUND carrier pins the DuckDB
    // oracle-agreed total for the hostile '' flag group
    val r = SparkEntry.queries("q1_pricing_summary")(spark, dir)
      .filter(col("l_returnflag") === "" && col("l_linestatus") === "")
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("sum_charge") === 43.726125)
  }
}
