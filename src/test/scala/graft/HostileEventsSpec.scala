package graft

import org.apache.spark.sql.functions._

/** Stats/time-series-family semantics under hostile events. The synthetic
  * table has NO half-cent boundaries, signed zeros, (user_id, ts) tie
  * collisions, single-event users, zero-variance groups or non-scalar/
  * malformed props at any SF (verified by probe), so the DuckDB oracle can
  * never exercise the rounding/tie/degenerate-denominator edge cases there.
  * The `fixtures/hostile_events` table (tools/make_hostile_events.py) adds
  * exactly those rows; the full events-only Verify + oracle compare runs
  * green against it dev-side, and this spec pins the Spark-side semantics
  * so a regression is caught in `sbt test` without DuckDB.
  *
  * Divergence classes this fixture has already caught (and whose fixes it
  * now guards): ANSI cast aborts on non-scalar `$.k` (corr_manual,
  * ols_by_type, spearman_corr, json_props_stats), ANSI divide-by-zero
  * aborts on zero-variance/single-row groups where DuckDB yields NULL
  * (welch_ttest, seasonal_outliers, bootstrap_ci), quartic DECIMAL(38,0)
  * overflow on wide-spread groups (moments_by_type — now mean-shifted),
  * and negative-bucket left-shift (DuckDB error vs Spark silent sign
  * extension) in zorder_key.
  */
class HostileEventsSpec extends SparkSpec {

  private val dir = "fixtures/hostile_events"

  // every catalog query whose only input table is `events` — the fixture
  // dir deliberately holds nothing else, so an out-of-date entry here fails
  // loudly with file-not-found instead of silently skipping
  private val eventQueries = Seq(
    "ab_test_zscore", "acf_daily", "ar1_daily",
    "asof_join", "asof_join_exec", "asof_join_forward",
    "attribution_last_touch", "attribution_position", "batch_count",
    "batch_summary", "bootstrap_ci", "ccf_daily", "changepoint_daily",
    "cohort_ltv", "collect_sorted", "column_profile", "corr_manual",
    "count_per_key", "cuped_lift", "cusum_shift", "daily_gapfill",
    "daily_interp", "daily_percentiles", "dau_wau", "debounce_events",
    "dedup_distinct",
    "distinct_message_count", "ema_daily", "emd_pairwise",
    "equidepth_histogram", "event_transitions", "event_type_islands",
    "exact_percentiles", "funnel_conversion", "funnel_windowed",
    "grouping_sets", "hellinger_drift", "histogram_buckets", "holt_linear",
    "json_props_stats", "kaplan_meier", "kmv_distinct", "kmv_distinct_agg",
    "kmv_set_ops", "ks_test", "kv_bulk_put", "kv_upsert_lww",
    "lift_by_decile", "log_histogram_quantiles", "mad_outliers",
    "mann_whitney", "max_drawdown", "moments_by_type", "mutual_information",
    "nearest_touch", "null_key_fallback", "ols_by_type", "pivot_user_events",
    "psi_drift", "quantile_normalize", "retention_cohorts", "salted_agg",
    "gini_by_type", "source_concentration", "trimmed_mean",
    "dp_noisy_counts", "watermark_plan",
    "scd2_history", "seasonal_dow", "seasonal_outliers", "segmented_trend", "stl_decompose_daily",
    "session_cap_split", "session_concurrency", "session_overlap_pairs",
    "session_windows",
    "set_except_users", "set_intersect_users", "set_union_all_bands",
    "shapley_attribution", "skew_join_salted", "sliding_hour",
    "snapshot_diff", "spearman_corr", "theilsen_trend", "time_to_conversion",
    "top_paths_3", "tumbling_daily", "welch_ttest", "wilson_ci",
    "window_lead_lag", "window_moving_avg", "window_range_1h",
    "winsorize_clip", "zorder_key", "zorder_pruning_eval",
    // the streaming REPLAY queries (ReplayOps) read only events too: the
    // same-instant tie collisions and boundary values flow through the
    // real watermark/state-store pipelines here
    "streaming_session_replay", "streaming_window_counts_replay",
    "streaming_dedup_replay", "streaming_dedup_ww_replay",
    "streaming_topk_replay", "streaming_join_replay",
    "streaming_left_join_replay", "streaming_enrich_replay",
    "streaming_running_counts_replay", "streaming_heavy_hitters_replay",
    "streaming_temporal_enrich_replay", "streaming_sessionize_replay",
    "streaming_debounce_replay", "streaming_anomaly_exact_replay",
    "streaming_watermark_drop_replay",
    // round 8: the two reference mains, crash-restart, drift, float anomaly
    "streaming_summary_replay", "streaming_per_record_replay",
    "streaming_restart_replay", "streaming_drift_replay",
    "streaming_anomaly_float_replay",
    // round 9: gini sweep, VARIANT, full-outer join, chained dedup→agg,
    // transformWithState rate limiter
    "gini_split_sweep", "variant_props_stats",
    "streaming_full_join_replay", "streaming_dedup_agg_replay",
    "streaming_rate_limit_replay",
    // round 10: transformWithState event-time timers + RocksDB restart,
    // VARIANT field inventory, depth-2 tree sweep
    "streaming_tws_session_replay", "streaming_tws_restart_replay",
    "variant_field_inventory", "tree_depth2_sweep", "approx_quantiles_band",
    "streaming_tws_trail_replay")

  test("every events-backed query survives the hostile fixture, twice") {
    eventQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run() = fn(spark, dir).collect().map(_.toSeq.mkString("|")).toSeq
      val first = run()
      assert(run() == first, s"$name nondeterministic on hostile events")
      spark.catalog.clearCache()
    }
  }

  test("non-scalar and malformed props parse to NULL k, never abort") {
    // user 9011's six props rows: {}, {"other":3}, "", NULL,
    // {"k":{"nested":1}}, "not json at all" — all must contribute n_k = 0
    val got = SparkEntry.queries("json_props_stats")(spark, dir).collect()
    assert(got.nonEmpty)
    // the view group holds user 9011's rows; its n_k counts only the REAL
    // corpus's parseable ks — none of the six hostile rows
    val view = got.find(_.getString(0) == "view").get
    val baseViewN = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "view" && col("event_id") < 1000)
      .count()
    // +4: the tie-collision view rows (users 9003/9004/9005) carry VALID k
    // on purpose; only user 9011's six hostile-props rows must vanish
    assert(view.getAs[Long]("n_k") === baseViewN + 4,
      "hostile props rows must not contribute parsed k values")
  }

  test("zero-variance/single-row groups yield NULL stats, not aborts") {
    // event_type "" has exactly one row → corr/rho/slope undefined
    val corr = SparkEntry.queries("corr_manual")(spark, dir)
      .filter(col("event_type") === "").collect()
    assert(corr.length === 1 && corr.head.isNullAt(2),
      "single-row group must produce NULL corr_xy")
    val ols = SparkEntry.queries("ols_by_type")(spark, dir)
      .filter(col("event_type") === "").collect()
    assert(ols.length === 1 && ols.head.isNullAt(2) && ols.head.isNullAt(3))
  }

  test("half-cent boundaries round identically through the cents path") {
    // value 0.125 → 12.5 cents exactly in IEEE double; Spark round is
    // HALF_UP → 13. Pin it so a change in rounding mode (or a DuckDB
    // version with round-half-even) is caught as a loud diff here.
    val vc = SparkEntry.queries("quantile_normalize")(spark, dir)
      .filter(col("event_type") === "purchase" && col("vc") === 13L)
      .count()
    assert(vc >= 1, "0.125 must land in the 13-cent bucket (HALF_UP)")
  }

  test("as-of exec matches the window formulation under same-instant ties") {
    // users 9003/9004/9005 carry duplicate-ts rows (within AND across
    // users): the custom AsOfJoinExec's last-known carry must resolve the
    // (ts, event_id) tie exactly as the window formulation does
    def run(name: String) = {
      val r = SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toSeq.mkString("|")).toSeq
      spark.catalog.clearCache()
      r
    }
    assert(run("asof_join_exec") === run("asof_join"))
  }
}
