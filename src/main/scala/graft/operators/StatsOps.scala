package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical / sketch / string-distance operators (north-star analytics
  * surface; none in the reference — SURVEY.md §2.7).
  */
object StatsOps extends QueryModule {

  /** Moment arithmetic carrier: 128-bit everywhere. Products of two long
    * sums overflow int64 once n·Σx² passes ~9e18 (measured: the OLS
    * intercept numerator hits 6.6e19 already at sf0.1), and with the old
    * DECIMAL(19,0) factor casts the ACCUMULATORS themselves became the
    * bound (Σrank² ≈ n³/3 leaves int64 at n ≈ 3M rows/group — a real
    * per-group count at 100 TB). So: Spark accumulates in DECIMAL(38,0)
    * and assembles products as decimal(38)×decimal(38) (capped back to 38,
    * exact while the true value < 1e38); DuckDB accumulates in HUGEINT
    * (its native SUM(BIGINT) type, int128) and assembles HUGEINT products.
    * Both decimal/int128 → double conversions are correctly rounded, so
    * the assembled doubles stay bit-identical. Exactness bounds after this
    * change: corr/OLS to n ≈ 1e14 rows per group; Spearman (rank moments
    * grow n³) to n ≈ 3e9 rows per group — beyond that no 128-bit carrier
    * holds n⁴ and the mean-centered float formulation takes over.
    */
  private def d38(c: Column): Column = c.cast(DecimalType(38, 0))

  /** SQL twin of [[d38]]: exact HUGEINT (int128) product of two sums. */
  private def dmul(a: String, b: String): String =
    s"CAST($a AS HUGEINT) * CAST($b AS HUGEINT)"

  /** HLL approximate distinct (approx_count_distinct — Spark's
    * HyperLogLog++), in the HASH channel since round 10: the sketch's
    * register layout is engine-private, so instead of the raw estimate the
    * query emits the exact count plus the estimate's ±5 % error-band
    * verdict as a boolean — `|est − exact| · 20 ≤ exact`, all-integer. The
    * oracle computes the exact COUNT(DISTINCT) and asserts TRUE: for a
    * fixed rsd the HLL++ estimate is deterministic, so a regression in the
    * sketch (or a silent rsd change) flips the boolean and hash-fails. rsd
    * 0.01 keeps the 5 % band ≈5σ wide — deterministic headroom, not luck.
    */
  private def hllDistinct(s: SparkSession, dir: String): DataFrame =
    // Pre-dedup (event_type, user_id), THEN aggregate (round 12): mixing
    // countDistinct with approx_count_distinct triggers Spark's
    // distinct-aggregate rewrite, which evaluates the PARTIAL HLL++ sketch
    // per (event_type, user_id) group — a 1 639-long register buffer PER
    // USER flowing through the exchange (~13 KB × distinct users; measured
    // 3.1 s at sf0.1, plan showed a 1 641-column Exchange). Deduplicating
    // first makes both aggregates plain (COUNT + one sketch per TYPE, 5
    // buffers total). Results are bit-identical: HLL++ registers keep the
    // MAX rank per register, so duplicate inputs cannot change the sketch,
    // and COUNT over the deduped pairs is exactly COUNT(DISTINCT user_id)
    // (count(col) and countDistinct both skip NULLs).
    Tables.t(s, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(col("user_id")).as("exact_users"))
      .withColumn("hll_within_5pct",
        abs(col("approx_users") - col("exact_users")) * lit(20L)
          <= col("exact_users"))
      .select(col("event_type"), col("exact_users"), col("hll_within_5pct"))
      .orderBy(col("event_type"))

  private val hllDistinctSql: String =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS hll_within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Approximate-quantile sketch in the hash channel — the quantile twin of
    * [[hllDistinct]]'s error-band contract. `approx_percentile` (Spark's
    * Greenwald-Khanna summary, accuracy 10 000) is engine-private, so the
    * query emits, per (event_type, quantile), the EXACT type-1 quantile of
    * the centi-quantized value plus a boolean asserting the sketch result's
    * RANK INTERVAL sits within the GK guarantee: the returned value (with
    * duplicates on the centi grid) occupies ranks [cum−cnt+1, cum], and
    * the target rank q_ppm·n must fall within ε-band distance of that
    * interval (ε = 1/accuracy of n, doubled for merge headroom, +1 row →
    * band = 200·n + 10⁶ in ppm units).
    * All-integer, and — key to hashability — TRUE under ANY partition merge
    * order, because ε-boundedness is the sketch's invariant, not a value
    * pin. The oracle computes the exact quantile and asserts TRUE.
    *
    * rank(approx) is a lookup, not a second scan shape: approx_percentile
    * returns an actual data value, so its cumulative rank comes from the
    * same per-(type, vc) distribution table the exact quantile is read
    * from (cached; two consumers). The distribution table is
    * bounded-domain (centi-grid), so the cum window is the
    * exact_percentiles/mad_outliers class, never a raw-row sort. The
    * exact-rank inequality `cum·10⁶ ≥ q_ppm·n` replaces ceil(q·n) — no
    * float boundary to disagree on.
    */
  private def approxQuantilesBand(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.t(s, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("vc"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val dist = base.groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .cache()
    val qppm = Seq(250000L, 500000L, 750000L, 950000L)
    import s.implicits._
    val qtab = qppm.toDF("q_ppm")
    val exacts = dist.crossJoin(broadcast(qtab))
      .groupBy(col("event_type"), col("q_ppm"))
      .agg(max(col("n")).as("n"),
        min(when(d38(col("cum")) * lit(1000000L) >= col("q_ppm") * d38(col("n")),
          col("vc"))).as("exact_q"))
    val approx = base.groupBy(col("event_type"))
      .agg(percentile_approx(col("vc"),
        array(qppm.map(q => lit(q / 1e6)): _*), lit(10000)).as("aps"))
      .select(col("event_type"),
        explode(arrays_zip(
          array(qppm.map(lit(_)): _*).as("q_ppm"), col("aps").as("ap"))).as("z"))
      .select(col("event_type"), col("z.q_ppm").as("q_ppm"), col("z.ap").as("ap"))
    val lookup = dist.select(col("event_type").as("r_event_type"),
      col("vc"), col("cum"), col("cnt"))
    val ranked = approx.join(lookup,
        col("event_type") === col("r_event_type") && col("ap") === col("vc"))
      .select(col("event_type"), col("q_ppm"),
        (col("cum") - col("cnt") + lit(1L)).as("rk_lo"), col("cum").as("rk_hi"))
    // a tied value OCCUPIES the rank interval [cum−cnt+1, cum]; the GK
    // guarantee is that the interval comes within ε·n of the target rank,
    // so the check is interval-distance, not |max-rank − target|
    exacts.join(ranked, Seq("event_type", "q_ppm"))
      .select(col("event_type"), col("q_ppm"), col("n"), col("exact_q"),
        (col("q_ppm") * d38(col("n"))
            >= d38(col("rk_lo")) * lit(1000000L)
              - (d38(col("n")) * lit(200L) + lit(1000000L))
          && col("q_ppm") * d38(col("n"))
            <= d38(col("rk_hi")) * lit(1000000L)
              + (d38(col("n")) * lit(200L) + lit(1000000L))).as("gk_band_ok"))
      .orderBy(col("event_type"), col("q_ppm"))
  }

  private val approxQuantilesBandSql: String =
    """WITH base AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      |), dist AS (
      |  SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM base GROUP BY 1, 2
      |), cum AS (
      |  SELECT event_type, vc,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM dist
      |), qs AS (
      |  SELECT CAST(unnest([250000, 500000, 750000, 950000]) AS BIGINT)
      |    AS q_ppm
      |)
      |SELECT c.event_type, q.q_ppm, MAX(c.n) AS n,
      |  MIN(CASE WHEN CAST(c.cum AS HUGEINT) * 1000000
      |                >= q.q_ppm * CAST(c.n AS HUGEINT)
      |           THEN c.vc END) AS exact_q,
      |  TRUE AS gk_band_ok
      |FROM cum c CROSS JOIN qs q
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val KMV_K = 32
  private val TWO_52 = 4503599627370496.0 // 2^52, exactly representable

  /** KMV (k-minimum-values) approximate distinct count — the sketch whose
    * math IS cross-engine exact, unlike HLL++ (`hll_distinct` hash-checks
    * an error BAND because its register layout is engine-private). The estimator
    * is (k-1)/u_k with u_k the k-th smallest md5-derived hash mapped to
    * (0,1]; every quantity here is integer or an exact IEEE division, so
    * DuckDB reproduces the estimate bit-for-bit.
    *
    * Scale posture: one distinct shuffle on (group, hash), then the k
    * smallest hashes per group via the row_number≤k idiom — compiled to the
    * bounded-heap TopKPerKey operator, so the second shuffle carries k·groups
    * rows. This is how a sketch behaves at 100 TB: fixed memory per group.
    */
  private def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val dh = Tables.t(s, dir, "events")
      .select(col("event_type"), h.as("h")).distinct().cache()
    val counts = dh.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_hashes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
    // row_number<=k under an aggregate: bounded pre-shuffle either by the
    // TopKPerKey rewrite (Aggregate idiom, in sessions that install it) or by
    // Spark's own Partial WindowGroupLimit — at most k rows per group per
    // input partition cross the wire (PlanShapeSpec pins this)
    val kth = dh.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= KMV_K)
      .groupBy(col("event_type"))
      .agg(max(when(col("rk") === KMV_K, col("h"))).as("hk"))
    counts.join(kth, "event_type")
      .select(col("event_type"), col("n_distinct_hashes"),
        when(col("hk").isNotNull,
          lit((KMV_K - 1).toDouble) * TWO_52 / (col("hk") + 1).cast("double"))
          .otherwise(col("n_distinct_hashes").cast("double")).as("kmv_est"))
      .orderBy(col("event_type"))
  }

  private def kmvDistinctSql: String =
    s"""WITH dh AS (
       |  SELECT DISTINCT event_type,
       |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
       |      AS h
       |  FROM events
       |), r AS (
       |  SELECT event_type, h,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
       |  FROM dh
       |), counts AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct_hashes
       |  FROM dh GROUP BY 1
       |), kth AS (
       |  SELECT event_type, MAX(CASE WHEN rk = $KMV_K THEN h END) AS hk
       |  FROM r WHERE rk <= $KMV_K GROUP BY 1
       |)
       |SELECT c.event_type, c.n_distinct_hashes,
       |  CASE WHEN k.hk IS NOT NULL
       |       THEN ${KMV_K - 1}.0 * $TWO_52 / CAST(k.hk + 1 AS DOUBLE)
       |       ELSE CAST(c.n_distinct_hashes AS DOUBLE) END AS kmv_est
       |FROM counts c JOIN kth k USING (event_type)
       |ORDER BY c.event_type""".stripMargin

  /** Histogram via width_bucket: integer bucket per value, counts per bucket
    * — integer-exact in both engines. */
  private def histogram(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .groupBy(col("event_type"),
        width_bucket(col("value"), lit(0.0), lit(200.0), lit(20)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket"))

  /** Equi-depth histogram: 10 deciles per event_type over a TOTAL order
    * (value, event_id — deterministic bucket boundaries in both engines),
    * each decile reporting its value range and exact cents sum. The
    * complement of the equi-width `histogram_buckets`: equi-depth is what
    * an optimizer's statistics collector actually stores. Deciles come
    * from a two-level per-group rank ([[PrefixOps]]) + ntile arithmetic —
    * the old shape ran `ntile(10)` over raw rows with only one reducer per
    * event_type (5 partitions for the whole stream); this one spreads each
    * event_type across value-range buckets.
    */
  private def equidepthHistogram(s: SparkSession, dir: String): DataFrame =
    PrefixOps.withGlobalPrefix(
        Tables.t(s, dir, "events")
          .select(col("event_type"), col("value"), col("event_id")),
        col("value"), Seq(col("value"), col("event_id")),
        groupKeys = Seq("event_type"))
      .withColumn("decile", PrefixOps.ntileFromRank(col("g_rank"), col("g_n"), 10))
      .groupBy(col("event_type"), col("decile"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("lo"),
        max(col("value")).as("hi"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .orderBy(col("event_type"), col("decile"))

  private def equidepthHistogramSql: String =
    """WITH d AS (
      |  SELECT event_type, value,
      |         CAST(NTILE(10) OVER (PARTITION BY event_type
      |              ORDER BY value, event_id) AS BIGINT) AS decile
      |  FROM events
      |)
      |SELECT event_type, decile, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(value) AS lo, MAX(value) AS hi,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Pearson correlation from quantized first/second moments — built-in
    * corr() accumulates floating state in engine-specific order, so instead:
    * exact long sums of cents, correlation assembled per-group in double
    * (deterministic given exact sums). The two-level shape is the same
    * partial/final aggregate Catalyst plans for corr itself.
    */
  private def corrManual(s: SparkSession, dir: String): DataFrame = {
    val x = round(col("value") * 100).cast("long")          // cents
    // try_cast + drop incomplete pairs: $.k may be non-scalar or props
    // malformed (ANSI cast would abort on one bad row); pairwise-complete
    // observations is the standard corr convention (what Spark's own corr
    // does) and keeps n consistent with every sum
    val y = round(expr("try_cast(get_json_object(props, '$.k') AS DOUBLE)")
      * 100).cast("long")
    Tables.t(s, dir, "events")
      .select(col("event_type"), x.as("x"), y.as("y"))
      .filter(col("y").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // per-row products fit long (cents are row-bounded); the SUMS carry
        // n and must be 128-bit — see the d38 scaladoc
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x") * col("y"))).as("sxy"),
        sum(d38(col("x") * col("x"))).as("sxx"),
        sum(d38(col("y") * col("y"))).as("syy"))
      .select(
        col("event_type"), col("n"),
        {
          // zero-variance arm (n = 1, or a constant series): corr is
          // undefined → NULL, matching DuckDB's /0 → NULL; Spark ANSI
          // would abort instead without the guard (hostile_events)
          val ax = (d38(col("n")) * d38(col("sxx"))
            - d38(col("sx")) * d38(col("sx"))).cast("double")
          val ay = (d38(col("n")) * d38(col("syy"))
            - d38(col("sy")) * d38(col("sy"))).cast("double")
          when(ax > 0 && ay > 0,
            (d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy")))
              .cast("double") / (sqrt(ax) * sqrt(ay)))
            .as("corr_xy")
        })
      .orderBy(col("event_type"))
  }

  /** Per-group OLS regression (value on props.k) from the same exact
    * quantized moments as corr_manual: slope and intercept assembled as
    * single rationals over exact long sums — numerator and denominator are
    * exact, the one division is IEEE — so both engines produce identical
    * doubles. The distributed-regression shape: one partial/final aggregate,
    * k·groups driver state, nothing else.
    */
  private def olsByType(s: SparkSession, dir: String): DataFrame = {
    // try_cast + drop incomplete pairs — same rationale as corrManual
    val x = round(expr("try_cast(get_json_object(props, '$.k') AS DOUBLE)")
      * 100).cast("long")
    val y = round(col("value") * 100).cast("long")
    Tables.t(s, dir, "events")
      .select(col("event_type"), x.as("x"), y.as("y"))
      .filter(col("x").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x") * col("y"))).as("sxy"),
        sum(d38(col("x") * col("x"))).as("sxx"))
      .select(
        col("event_type"), col("n"),
        {
          // constant regressor (n = 1 or all-equal x): slope/intercept
          // undefined → NULL (DuckDB /0 semantics); guard for Spark ANSI
          val den = (d38(col("n")) * d38(col("sxx"))
            - d38(col("sx")) * d38(col("sx"))).cast("double")
          when(den > 0,
            (d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy")))
              .cast("double") / den).as("slope")
        },
        {
          val den = (d38(col("n")) * d38(col("sxx"))
            - d38(col("sx")) * d38(col("sx"))).cast("double")
          when(den > 0,
            ((d38(col("sy")) * d38(col("sxx")) - d38(col("sx")) * d38(col("sxy")))
              .cast("double") / den) / 100.0).as("intercept_units")
        })
      .orderBy(col("event_type"))
  }

  private def olsByTypeSql: String =
    s"""WITH q AS (
      |  SELECT event_type,
      |    CAST(ROUND(TRY_CAST(CASE WHEN json_valid(props)
      |      THEN json_extract_string(props, '$$.k') END AS DOUBLE) * 100)
      |      AS BIGINT) AS x,
      |    CAST(ROUND(value * 100) AS BIGINT) AS y
      |  FROM events
      |), qf AS (
      |  SELECT * FROM q WHERE x IS NOT NULL
      |), m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM qf GROUP BY event_type
      |)
      |SELECT event_type, n,
      |  CAST(CAST(${dmul("n", "sxy")} - ${dmul("sx", "sy")} AS STRING) AS DOUBLE)
      |    / CAST(CAST(${dmul("n", "sxx")} - ${dmul("sx", "sx")} AS STRING) AS DOUBLE) AS slope,
      |  (CAST(CAST(${dmul("sy", "sxx")} - ${dmul("sx", "sxy")} AS STRING) AS DOUBLE)
      |    / CAST(CAST(${dmul("n", "sxx")} - ${dmul("sx", "sx")} AS STRING) AS DOUBLE)) / 100.0
      |    AS intercept_units
      |FROM m ORDER BY event_type""".stripMargin

  /** Spearman rank correlation per group: ranks from row_number over a
    * TOTAL order (value, event_id — so both engines rank identically, the
    * unique-tiebreak convention instead of average-rank ties), then the
    * Pearson formula over exact integer rank sums. Two window passes + one
    * aggregate, all on the same group partitioning.
    *
    * Domain note: accumulators AND assembly both carry 128 bits (see
    * [[d38]]) — rank moments grow n³, so the per-row products are widened
    * before summing too. Exact to n ≈ 3e9 rows per group; past that the
    * n⁴ assembly exceeds any fixed 128-bit carrier and a mean-centered
    * float formulation is the correct tool.
    */
  private def spearmanCorr(s: SparkSession, dir: String): DataFrame = {
    // ranks via the PrefixOps two-level prefix sum, NOT raw-row windows
    // partitioned by event_type: event_type has a handful of values, so a
    // plain window funnels the whole corpus through ~5 reducers — the same
    // bounded-reducer class equidepth_histogram was flagged for. Each
    // PrefixOps pass buckets by its own monotone rank key, so the sort
    // parallelism is buckets × groups regardless of group cardinality.
    // (null yk — non-scalar $.k, malformed props — ranks NULLS FIRST by
    // the MinValue coalesce; the oracle says NULLS FIRST explicitly since
    // DuckDB's ASC default is NULLS LAST. try_cast: ANSI cast would abort
    // the query on one unparseable cell.)
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"),
        expr("try_cast(get_json_object(props, '$.k') AS DOUBLE)").as("yk"))
    val rx = PrefixOps.withGlobalPrefix(ev, col("value"),
        Seq(col("value"), col("event_id")), groupKeys = Seq("event_type"))
      .withColumnRenamed("g_rank", "rx").drop("g_n")
    val ranked = PrefixOps.withGlobalPrefix(rx,
        coalesce(col("yk"), lit(Double.MinValue)),
        Seq(col("yk"), col("event_id")), groupKeys = Seq("event_type"))
      .withColumnRenamed("g_rank", "ry").drop("g_n")
    ranked.select(col("event_type"), col("rx"), col("ry"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // ranks (unlike cents) grow with n, so even the per-row PRODUCTS
        // go 128-bit before accumulating: rx·ry ≈ n² leaves int64 at
        // n ≈ 3e9 rows per group
        sum(d38(col("rx"))).as("sx"), sum(d38(col("ry"))).as("sy"),
        sum(d38(col("rx")) * col("ry")).as("sxy"),
        sum(d38(col("rx")) * col("rx")).as("sxx"),
        sum(d38(col("ry")) * col("ry")).as("syy"))
      .select(
        col("event_type"), col("n"),
        {
          // n = 1 group: rank variance is 0, rho undefined → NULL
          // (DuckDB /0 → NULL; Spark ANSI would abort — hostile_events)
          val ax = (d38(col("n")) * d38(col("sxx"))
            - d38(col("sx")) * d38(col("sx"))).cast("double")
          val ay = (d38(col("n")) * d38(col("syy"))
            - d38(col("sy")) * d38(col("sy"))).cast("double")
          when(ax > 0 && ay > 0,
            (d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy")))
              .cast("double") / (sqrt(ax) * sqrt(ay)))
            .as("spearman_rho")
        })
      .orderBy(col("event_type"))
  }

  private def spearmanCorrSql: String =
    s"""WITH r AS (
      |  SELECT event_type,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |         ORDER BY value, event_id) AS BIGINT) AS rx,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |         ORDER BY TRY_CAST(CASE WHEN json_valid(props)
      |           THEN json_extract_string(props, '$$.k') END AS DOUBLE)
      |           NULLS FIRST, event_id)
      |         AS BIGINT) AS ry
      |  FROM events
      |), m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
      |    SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
      |    SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
      |    SUM(CAST(ry AS HUGEINT) * ry) AS syy
      |  FROM r GROUP BY event_type
      |)
      |SELECT event_type, n,
      |  CAST(CAST(${dmul("n", "sxy")} - ${dmul("sx", "sy")} AS STRING) AS DOUBLE)
      |    / (sqrt(CAST(CAST(${dmul("n", "sxx")} - ${dmul("sx", "sx")} AS STRING) AS DOUBLE))
      |       * sqrt(CAST(CAST(${dmul("n", "syy")} - ${dmul("sy", "sy")} AS STRING) AS DOUBLE)))
      |    AS spearman_rho
      |FROM m ORDER BY event_type""".stripMargin

  /** Edit-distance near-dup over the FULL corpus: each doc's K=5 nearest
    * neighbors (by levenshtein over 24-char prefixes) among doc pairs
    * sharing a COMPOUND blocking key (same integer DP definition in both
    * engines).
    *
    * Output contract (round 12): per-doc top-[[LEV_TOP_K]] neighbors,
    * ranked by (dist, nbr_id) — NOT all pairs within the distance
    * threshold. The all-pairs form measured ~n^1.5 OUTPUT mass on this
    * corpus (66 rows at sf0.01 → 140k at sf1 → ~45M projected at 100×):
    * wall-time scaled fine after the round-11 re-blocking but the output
    * itself became the scale defect — a diagnostic query whose result no
    * consumer reads row-by-row at that size. The top-K contract bounds
    * output at K·n (linear) while keeping the same blocking, candidate
    * generation, and distance definition; it is the same redesign
    * image_ahash_near_dups got in round 10. Both directions of each
    * surviving pair compete for a slot in each endpoint's list; the oracle
    * replays the identical ROW_NUMBER rank.
    *
    * Blocking (round 11): length band `length div 50` × one of
    * [[LEV_BANDS]] ALIGNED 6-char chunks of the folded prefix (chunk i =
    * chars 6i+1..6i+6). Round 10 measured the length-band-only form at 71×
    * cost for 10× data — `length div 50` has O(1) distinct values whose
    * populations grow with n, so Σ band² ≈ n²/#bands is quadratic. The
    * compound key splits every length band by prefix CONTENT, so block
    * populations track chunk diversity (which grows with corpus size on
    * natural text) instead of n. Miss model (replayed identically by the
    * oracle): a pair is found iff ≥1 aligned chunk matches exactly —
    * guaranteed for identical prefixes and for substitution-only pairs
    * with edits confined to ≤3 chunks (pigeonhole); indel-shifted and
    * edit-scattered pairs in the loose dist∈[4,12] tail trade off for
    * linear candidates (measured 67% of the old tail retained at both
    * sf0.01 and sf1.0 — the S-curve contract the LSH families already
    * carry). Zero-length prefixes never pair (the empty chunk key is
    * excluded — it is the one degenerate bucket whose population scales
    * with n).
    *
    * Stop-block cap (round 11b): blocks larger than [[LEV_BLOCK_CAP]] docs
    * are dropped from candidate generation entirely — the same stop-shingle
    * practice as containment_pairs' df cap. Without it, a chunk shared by a
    * fixed-vocabulary corpus' boilerplate openers (e.g. every doc starting
    * with the same 6 chars) forms a block whose population grows WITH n, so
    * its block² term stays quadratic: the compound key alone still measured
    * 15.4× at 10× data; with the cap, per-block work is ≤ CAP² and total
    * candidates are ≤ (occurrences/CAP)·CAP² = CAP·occurrences, linear.
    * CAP=32 sits below the gate SFs' largest block (31 docs at sf0.1), so
    * the capped query is byte-identical there, and caps the measured sf1
    * candidate volume at 520k vs 2.67M uncapped (measured block census,
    * round 11); the remaining 10×-window growth is sub-cap blocks filling
    * toward saturation on the fixed-vocabulary corpus — past it, every
    * block is cap-bound and candidates scale with occurrences alone. Miss model on top of
    * the chunk pigeonhole: a pair is lost iff EVERY matching chunk sits in
    * a >CAP block — i.e. both prefixes are boilerplate in all their shared
    * chunks, exactly the uninformative-prefix pairs edit-distance blocking
    * is meant to exclude. The oracle replays the identical cap.
    *
    * Non-ASCII codepoints are folded to a fixed '?' placeholder before the
    * DP: Spark's levenshtein counts CHARACTERS while DuckDB's counts BYTES,
    * so multi-byte text diverges (found by the hostile fixtures — a unicode
    * pair at char-distance 10 is byte-distance >12 and vanished from the
    * oracle). After folding, char length == byte length in both engines and
    * the distance is exact; distinct non-ASCII chars comparing equal is the
    * documented approximation. */
  private[graft] val LEV_BANDS = 4
  private[graft] val LEV_CHUNK = 6
  private[graft] val LEV_BLOCK_CAP = 32
  private val LEV_TOP_K = 5

  private def levenshteinPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextFunctions.register(s)
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(substring(col("text"), 1, 24), "[^\\x00-\\x7F]", "?")
          .as("prefix"),
        expr("length(text) div 50").cast("long").as("len_band"))
    val exploded = d.select(col("doc_id"), col("prefix"), col("len_band"),
      posexplode(array((0 until LEV_BANDS).map(i =>
        substring(col("prefix"), 1 + i * LEV_CHUNK, LEV_CHUNK)): _*))
        .as(Seq("bp", "key")))
      .filter(col("key") =!= "")
    // stop-block cap: keep only blocks small enough that block² is bounded
    // (the keep list is grouped on the join key, so this is one extra
    // key-partitioned agg + equi-join — no new shuffle shape)
    val keep = exploded.groupBy(col("len_band"), col("bp"), col("key"))
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= LEV_BLOCK_CAP)
      .drop("_bn")
    val sides = exploded.join(keep, Seq("len_band", "bp", "key"))
    val cand = sides.as("a").join(sides.as("b"),
        col("a.len_band") === col("b.len_band") && col("a.bp") === col("b.bp") &&
          col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.prefix").as("a_p"), col("b.prefix").as("b_p"))
      .distinct()
    val scored = cand
      // bit-parallel Myers DP (graft.functions.LevenshteinBP): the whole DP
      // column lives in one machine word, ~10× fewer ops than the cell DP
      // on these 24-char ASCII prefixes; values identical to levenshtein(),
      // so the oracle verifies with plain levenshtein()
      .select(col("a_id"), col("b_id"),
        expr("levenshtein_bp(a_p, b_p)").cast("long").as("dist"))
      .filter(col("dist") <= 12)
    // symmetrize (each surviving pair is a neighbor of BOTH endpoints),
    // then per-doc top-K by (dist, nbr_id). The row_number window is
    // partitioned by doc_id — shuffle-bounded, and the installed
    // RowNumberTopKRewrite turns the rank<=K filter into a bounded-heap
    // partial top-k before the shuffle, so per-doc candidate lists never
    // materialize past K on the build side.
    val directed = scored.select(col("a_id").as("doc_id"),
        col("b_id").as("nbr_id"), col("dist"))
      .unionAll(scored.select(col("b_id").as("doc_id"),
        col("a_id").as("nbr_id"), col("dist")))
    directed
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("dist"), col("nbr_id"))).cast("int"))
      .filter(col("rk") <= LEV_TOP_K)
      // K·n output, banded self-join child → ordered1, not orderBy
      .transform(graft.QOps.ordered1(_, col("doc_id"), col("rk")))
  }

  /** DuckDB mirror of the chunk banding, shared by the oracle. */
  private def levenshteinPairsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         regexp_replace(substr(text, 1, 24), '[^\\x00-\\x7F]', '?', 'g')
       |           AS prefix,
       |         CAST(length(text) // 50 AS BIGINT) AS len_band
       |  FROM documents
       |), bands AS (
       |  SELECT doc_id, prefix, len_band, i AS bp,
       |         substr(prefix, 1 + $LEV_CHUNK * i, $LEV_CHUNK) AS key
       |  FROM d CROSS JOIN (SELECT unnest(generate_series(0, ${LEV_BANDS - 1})) AS i)
       |  WHERE substr(prefix, 1 + $LEV_CHUNK * i, $LEV_CHUNK) <> ''
       |), keep AS (
       |  SELECT len_band, bp, key FROM bands
       |  GROUP BY 1, 2, 3 HAVING COUNT(*) <= $LEV_BLOCK_CAP
       |), kept AS (
       |  SELECT b.* FROM bands b
       |  JOIN keep k ON b.len_band = k.len_band AND b.bp = k.bp
       |             AND b.key = k.key
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |         a.prefix AS a_p, b.prefix AS b_p
       |  FROM kept a JOIN kept b
       |    ON a.len_band = b.len_band AND a.bp = b.bp AND a.key = b.key
       |   AND a.doc_id < b.doc_id
       |), scored AS (
       |  SELECT a_id, b_id, CAST(levenshtein(a_p, b_p) AS BIGINT) AS dist
       |  FROM cand
       |  WHERE levenshtein(a_p, b_p) <= 12
       |), directed AS (
       |  SELECT a_id AS doc_id, b_id AS nbr_id, dist FROM scored
       |  UNION ALL
       |  SELECT b_id AS doc_id, a_id AS nbr_id, dist FROM scored
       |)
       |SELECT doc_id, nbr_id, dist, CAST(rk AS INT) AS rk FROM (
       |  SELECT doc_id, nbr_id, dist,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id
       |                            ORDER BY dist, nbr_id) AS rk
       |  FROM directed)
       |WHERE rk <= $LEV_TOP_K
       |ORDER BY doc_id, rk""".stripMargin

  /** Ordered list aggregation: sort_array(collect_list) — deterministic
    * regardless of arrival order (the only safe way to emit arrays from a
    * distributed group-by). Emitted as a '|'-joined string so the result is
    * a hash-comparable scalar (the driver's checker can't hash array cells). */
  private def collectSorted(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"))
      .agg(array_join(sort_array(collect_list(col("event_type"))), "|").as("types"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  /** Two-proportion z-test over a deterministic hash split — the A/B
    * experiment readout: users split into arms by md5(user_id) mod 2 (the
    * same rand()-free assignment as train_val_split, so arms are stable
    * under reruns and appends), conversion = user made a high-value
    * purchase (value > 95 — "any purchase" saturates to 100% and makes
    * the test degenerate), z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)).
    * Counts are exact longs; the rates and z chain only IEEE
    * correctly-rounded ops (÷, ×, −, √) written with IDENTICAL association
    * in both engines, so the floats hash-match like the single-division
    * cases do. A degenerate pool (p̂ ∈ {0, 1} ⇒ zero standard error)
    * yields NULL rather than an ANSI divide-by-zero.
    */
  private def abTestZscore(s: SparkSession, dir: String): DataFrame = {
    val arm = pmod(
      conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10).cast("long"),
      lit(2L))
    Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 95.0, 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("arm", arm)
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0L, col("converted")).otherwise(0L)).as("x_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1L, col("converted")).otherwise(0L)).as("x_b"))
      .withColumn("rate_a", col("x_a").cast("double") / col("n_a").cast("double"))
      .withColumn("rate_b", col("x_b").cast("double") / col("n_b").cast("double"))
      .withColumn("p_pool",
        (col("x_a") + col("x_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("z",
        when(col("p_pool") > 0.0 && col("p_pool") < 1.0,
          (col("rate_a") - col("rate_b")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a").cast("double") +
                lit(1.0) / col("n_b").cast("double")))))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("rate_a"), col("rate_b"), col("z"))
  }

  /** Wilson 95% score intervals for each arm's conversion rate — the
    * interval that stays honest at small n and extreme rates where the
    * naive Wald ±z√(p(1−p)/n) collapses (the standard readout next to
    * [[abTestZscore]]'s point test). Same md5 arm split and conversion
    * definition; the interval assembles in doubles from exact long
    * (n, x) with the identical expression tree both engines, quantized
    * to micros. The whole query is one per-user aggregate + a 2-row arm
    * aggregate.
    */
  private def wilsonCi(s: SparkSession, dir: String): DataFrame = {
    val arm = pmod(
      conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10).cast("long"),
      lit(2L))
    val z = lit(1.959964)
    val nD = col("n").cast("double")
    val p = col("x").cast("double") / nD
    val z2n = z * z / nD
    val denom = lit(1.0) + z2n
    val center = (p + z2n / lit(2.0)) / denom
    val half = z * sqrt(p * (lit(1.0) - p) / nD + z * z / (lit(4.0) * nD * nD)) /
      denom
    Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 95.0, 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("arm", arm)
      .groupBy(col("arm"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("converted")).cast("long").as("x"))
      .withColumn("rate", p)
      .withColumn("lo_micro", round((center - half) * 1e6).cast("long"))
      .withColumn("hi_micro", round((center + half) * 1e6).cast("long"))
      .orderBy(col("arm"))
  }

  private val wilsonCiSql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 95
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS converted
      |  FROM events GROUP BY 1
      |), arms AS (
      |  SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) % 2 AS arm,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(converted) AS BIGINT) AS x
      |  FROM pu GROUP BY 1
      |)
      |SELECT arm, n, x,
      |  CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
      |  CAST(ROUND((
      |    (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
      |       + 1.959964 * 1.959964 / CAST(n AS DOUBLE) / 2.0)
      |    / (1.0 + 1.959964 * 1.959964 / CAST(n AS DOUBLE))
      |    - 1.959964 * SQRT(
      |        CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
      |          / CAST(n AS DOUBLE)
      |        + 1.959964 * 1.959964 /
      |          (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |      / (1.0 + 1.959964 * 1.959964 / CAST(n AS DOUBLE))) * 1e6)
      |    AS BIGINT) AS lo_micro,
      |  CAST(ROUND((
      |    (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
      |       + 1.959964 * 1.959964 / CAST(n AS DOUBLE) / 2.0)
      |    / (1.0 + 1.959964 * 1.959964 / CAST(n AS DOUBLE))
      |    + 1.959964 * SQRT(
      |        CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
      |          / CAST(n AS DOUBLE)
      |        + 1.959964 * 1.959964 /
      |          (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |      / (1.0 + 1.959964 * 1.959964 / CAST(n AS DOUBLE))) * 1e6)
      |    AS BIGINT) AS hi_micro
      |FROM arms ORDER BY arm""".stripMargin

  /** Gini coefficient of revenue concentration per nation — the inequality
    * metric behind "how concentrated is each market". Suppliers rank by
    * exact revenue cents WITHIN their nation (a partitioned window — no
    * global sort), then the closed form
    * G = (2·Σrk·x − (n+1)·Σx) / (n·Σx) assembles from exact long sums with
    * ONE IEEE division — bit-identical across engines. Ties rank by
    * (cents, suppkey) so the rank assignment is total. Long carriers hold
    * to ~10⁶ suppliers/nation × 10¹¹ total cents; swap the two products to
    * DECIMAL(38,0) beyond that.
    */
  private def giniConcentration(s: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      .join(broadcast(Tables.t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
    val byNation = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("cents"), col("l_suppkey"))
    perSupp
      .withColumn("rk", row_number().over(byNation).cast("long"))
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(col("cents")).as("tot_cents"),
        sum(col("rk") * col("cents")).as("rc"))
      .withColumn("gini",
        (lit(2L) * col("rc") - (col("n_suppliers") + lit(1L)) * col("tot_cents"))
          .cast("double") /
          (col("n_suppliers") * col("tot_cents")).cast("double"))
      .select(col("s_nationkey"), col("n_suppliers"), col("tot_cents"), col("gini"))
      .orderBy(col("s_nationkey"))
  }

  /** Join-key skew diagnostics — the report you run BEFORE picking a join
    * strategy at 100 TB: for lineitem.l_partkey, total rows, distinct keys,
    * the hottest key and its frequency, and the skew ratio
    * max_freq·n_keys/n_rows (1.0 = perfectly uniform). All counts exact
    * longs off one hash aggregate; the hottest key is a deterministic
    * TakeOrdered(1) (freq desc, key asc), 1-row cross-broadcast; the two
    * ratios are single IEEE divisions of exact longs.
    */
  private def keySkewReport(s: SparkSession, dir: String): DataFrame = {
    val freq = Tables.t(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("freq"))
      .cache() // feeds the totals AND the argmax (the Q contract)
    val hot = freq.orderBy(col("freq").desc, col("l_partkey")).limit(1)
      .select(col("l_partkey").as("hot_key"))
    freq.agg(
        sum(col("freq")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("freq")).as("max_freq"))
      .crossJoin(broadcast(hot))
      .select(
        col("n_rows"), col("n_keys"), col("max_freq"), col("hot_key"),
        (col("n_rows").cast("double") / col("n_keys").cast("double"))
          .as("avg_freq"),
        ((col("max_freq") * col("n_keys")).cast("double") /
          col("n_rows").cast("double")).as("skew_ratio"))
  }

  /** Deterministic train/val/test split — the assignment every training-data
    * pipeline needs: bucket = md5-derived 64-bit hash of doc_id mod 10,
    * 0-7 → train, 8 → val, 9 → test. Hash-based (not random) so the split is
    * stable under reruns, repartitioning, and incremental appends — the
    * property that makes it usable as a lineage-free split at 100 TB. Output:
    * per (lang, split) counts.
    */
  private def trainValSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"),
      lit(10L))
    Tables.t(s, dir, "documents")
      .withColumn("split",
        when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row gets key = -ln(u)/w where u is an md5-derived
    * uniform in (0,1) and w its weight (doc length here); the n smallest
    * keys ARE a weighted sample without replacement. rand()-free — u comes
    * from a 60-bit md5 slice, so the sample is reproducible across engines,
    * reruns, and repartitioning, and incremental appends only ever compete
    * new rows against the incumbents' keys.
    *
    * Scale posture: one projection + TakeOrdered(64) — per-partition
    * bounded heaps, no global sort, no window. Cross-engine exactness: the
    * uniform (h+0.5)/2^60 and the division by the integer weight are pure
    * IEEE ops on identical values; ln() is rounded to 9 decimals (the libm
    * guard) before the division.
    */
  private def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("w"),
        h.as("hv"))
      .filter(col("w") > 0)
      .withColumn("u", (col("hv") + lit(0.5)) / lit(1152921504606846976e0))
      .withColumn("skey", (lit(0.0) - round(log(col("u")), 9)) / col("w"))
      .orderBy(col("skey"), col("doc_id")).limit(64)
      .select(col("doc_id"), col("w"), col("skey"))
  }

  private def weightedSampleSql: String =
    """WITH h AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS w,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS hv
      |  FROM documents
      |  WHERE length(text) > 0
      |)
      |SELECT doc_id, w,
      |       (0e0 - ROUND(LN((hv + 0.5e0) / 1152921504606846976e0), 9)) / w
      |         AS skey
      |FROM h ORDER BY skey, doc_id LIMIT 64""".stripMargin

  /** Stratified deterministic sample: k=3 docs per language, chosen by
    * md5-hash order (not rand()) — reproducible across engines/partitions.
    * The per-group top-k shape (bounded heap at scale via TopKPerKey).
    */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"), col("h"))
      .orderBy(col("lang"), col("rk"))
  }

  /** The KMV estimate through the custom [[graft.functions.KmvSketchAgg]]
    * TypedImperativeAggregate instead of the windowed formulation: ONE
    * aggregation pass — partial sketches on the map side, k·8-byte binary
    * states across the exchange, merge on the reduce side — no DISTINCT
    * pre-shuffle at all (dedup happens inside the bounded state). Same
    * hashes, same estimator, same oracle as `kmv_distinct`.
    */
  private def kmvDistinctAgg(s: SparkSession, dir: String): DataFrame = {
    graft.functions.SketchFunctions.register(s)
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    Tables.t(s, dir, "events")
      .select(col("event_type"), h.as("h"))
      .groupBy(col("event_type"))
      .agg(expr(s"kmv_sketch(h, $KMV_K)").as("kmv_est"))
      .orderBy(col("event_type"))
  }

  private def kmvDistinctAggSql: String =
    s"""WITH dh AS (
       |  SELECT DISTINCT event_type,
       |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
       |      AS h
       |  FROM events
       |), r AS (
       |  SELECT event_type, h,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
       |  FROM dh
       |), counts AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct_hashes
       |  FROM dh GROUP BY 1
       |), kth AS (
       |  SELECT event_type, MAX(CASE WHEN rk = $KMV_K THEN h END) AS hk
       |  FROM r WHERE rk <= $KMV_K GROUP BY 1
       |)
       |SELECT c.event_type,
       |  CASE WHEN k.hk IS NOT NULL
       |       THEN ${KMV_K - 1}.0 * $TWO_52 / CAST(k.hk + 1 AS DOUBLE)
       |       ELSE CAST(c.n_distinct_hashes AS DOUBLE) END AS kmv_est
       |FROM counts c JOIN kth k USING (event_type)
       |ORDER BY c.event_type""".stripMargin

  /** KMV sketch SET ALGEBRA: union / intersection / Jaccard estimates for
    * every pair of event-type user sets, from the k-minimum-values sketches
    * alone — the θ-sketch trick. For a pair (A, B): X = the k smallest
    * hashes of K_A ∪ K_B estimates |A∪B| exactly like a single-set KMV
    * (any x ∈ X that belongs to A is necessarily in K_A, since it is below
    * A's k-th minimum — so the per-set sketches suffice); ρ = |{x ∈ X :
    * x ∈ A ∧ x ∈ B}| / |X| is an unbiased Jaccard estimate; intersection =
    * ρ · union. Every ingredient is integer or a correctly-rounded IEEE
    * division/product, so DuckDB replays the estimates bit-for-bit.
    *
    * Scale posture: per-type k-minimums ride the bounded-heap TopKPerKey
    * rewrite over the one distinct shuffle; everything downstream is
    * sketch-sized (≤ k·|types|² rows). The pair generator is a broadcast
    * self-join of the |types|-row domain — allowlisted BNLJ. When |X| < k
    * the sketches have seen every hash, and all three outputs reduce to
    * their exact values (CASE branch both engines).
    */
  private def kmvSetOps(s: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val dh = Tables.t(s, dir, "events")
      .select(col("event_type"), h.as("h")).distinct()
    val wk = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val kt = dh.withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= KMV_K)
      .select(col("event_type"), col("h"))
    val types = dh.select(col("event_type")).distinct()
    val pairs = types.as("a")
      .join(broadcast(types.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
    val candA = pairs.join(kt, col("ta") === col("event_type"))
      .select(col("ta"), col("tb"), col("h"),
        lit(1).as("ina"), lit(0).as("inb"))
    val candB = pairs.join(kt, col("tb") === col("event_type"))
      .select(col("ta"), col("tb"), col("h"),
        lit(0).as("ina"), lit(1).as("inb"))
    val cand = candA.unionAll(candB)
      .groupBy(col("ta"), col("tb"), col("h"))
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
    val wx = Window.partitionBy(col("ta"), col("tb")).orderBy(col("h"))
    val agg = cand.withColumn("rk", row_number().over(wx))
      .filter(col("rk") <= KMV_K)
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("nx"),
        max(when(col("rk") === KMV_K, col("h"))).as("hk"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L))
          .as("nab"))
    val unionEst = when(col("hk").isNotNull,
      lit((KMV_K - 1).toDouble * TWO_52) / (col("hk") + lit(1L)).cast("double"))
      .otherwise(col("nx").cast("double"))
    val jac = col("nab").cast("double") / col("nx").cast("double")
    agg.select(col("ta"), col("tb"),
      unionEst.as("union_est"),
      (jac * unionEst).as("intersect_est"),
      jac.as("jaccard_est"))
      .orderBy(col("ta"), col("tb"))
  }

  private def kmvSetOpsSql: String =
    s"""WITH dh AS (
       |  SELECT DISTINCT event_type,
       |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
       |      AS h
       |  FROM events
       |), kt AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
       |    FROM dh) WHERE rk <= $KMV_K
       |), ty AS (SELECT DISTINCT event_type FROM dh
       |), pairs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb
       |  FROM ty a JOIN ty b ON a.event_type < b.event_type
       |), cand AS (
       |  SELECT ta, tb, h, MAX(ina) AS ina, MAX(inb) AS inb FROM (
       |    SELECT p.ta, p.tb, k.h, 1 AS ina, 0 AS inb
       |    FROM pairs p JOIN kt k ON k.event_type = p.ta
       |    UNION ALL
       |    SELECT p.ta, p.tb, k.h, 0 AS ina, 1 AS inb
       |    FROM pairs p JOIN kt k ON k.event_type = p.tb
       |  ) GROUP BY 1, 2, 3
       |), agg AS (
       |  SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS nx,
       |         MAX(CASE WHEN rk = $KMV_K THEN h END) AS hk,
       |         CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
       |              AS BIGINT) AS nab
       |  FROM (
       |    SELECT ta, tb, h, ina, inb,
       |           ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rk
       |    FROM cand) WHERE rk <= $KMV_K
       |  GROUP BY 1, 2
       |), est AS (
       |  SELECT ta, tb,
       |    CASE WHEN hk IS NOT NULL
       |         THEN ${KMV_K - 1}.0 * $TWO_52 / CAST(hk + 1 AS DOUBLE)
       |         ELSE CAST(nx AS DOUBLE) END AS union_est,
       |    CAST(nab AS DOUBLE) / CAST(nx AS DOUBLE) AS jaccard_est
       |  FROM agg
       |)
       |SELECT ta, tb, union_est, jaccard_est * union_est AS intersect_est,
       |       jaccard_est
       |FROM est ORDER BY ta, tb""".stripMargin

  private val CMS_D = 4
  private val CMS_W = 1024

  /** Bucket j of a term for the Count-Min sketch: the j-th disjoint 16-bit
    * slice of md5(term), mod w. Four independent-enough hash rows, each
    * exactly replayable in DuckDB (`CAST('0x'||substr(md5,4j+1,4) AS
    * BIGINT) % w`).
    */
  private def cmsBucket(j: Int, term: Column): Column =
    conv(substring(md5(term), 4 * j + 1, 4), 16, 10).cast("long") % CMS_W

  /** Heavy-hitter frequency estimation through the custom
    * [[graft.functions.CmsSketchAgg]] Count-Min sketch: ONE pass over the
    * token stream builds a fixed 4×1024-counter sketch (partial sketches
    * per partition, elementwise-add merge across one exchange), then the
    * top-20 exact terms probe the broadcast sketch —
    * est = min_j counts[j·w + h_j(term)]. The estimate never undercounts;
    * collisions only inflate it (FunctionsSpec pins both properties).
    * Because the hash rows are md5 slices, the DuckDB oracle replays every
    * counter exactly — the cross-engine-checkable sketch, like
    * `kmv_distinct` vs the engine-private `hll_distinct`.
    *
    * Scale posture: sketch memory is d·w·8 bytes per partition regardless
    * of corpus size; the exact candidate side is a hash-agg + bounded
    * top-k. At 100 TB one would take candidates from the sketch itself or
    * a sampled pass; the exact side here doubles as the accuracy check.
    */
  private def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.functions.SketchFunctions.register(s)
    val toks = Tables.t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
    val sketch = toks
      .select(array((0 until CMS_D).map(j => cmsBucket(j, col("term"))): _*)
        .as("bs"))
      .agg(expr(s"cms_sketch(bs, $CMS_D, $CMS_W)").as("sk"))
    val cand = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(20)
    cand.crossJoin(broadcast(sketch))
      .select(col("term"), col("cnt"),
        least((0 until CMS_D).map(j =>
          element_at(col("sk"),
            (lit(j * CMS_W) + cmsBucket(j, col("term")) + lit(1))
              .cast("int"))): _*).as("cms_est"))
      .orderBy(col("cnt").desc, col("term"))
  }

  private def cmsHeavyHittersSql: String =
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
       |), tc AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1
       |), tb AS (
       |  SELECT term, j,
       |    CAST(concat('0x', substr(md5(term), 4 * j + 1, 4)) AS BIGINT)
       |      % $CMS_W AS bucket
       |  FROM tc, (SELECT unnest([0, 1, 2, 3]) AS j) u
       |), bc AS (
       |  SELECT j, bucket, CAST(SUM(cnt) AS BIGINT) AS bcnt
       |  FROM tb JOIN tc USING (term) GROUP BY 1, 2
       |), cand AS (
       |  SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 20
       |)
       |SELECT c.term, c.cnt, MIN(bc.bcnt) AS cms_est
       |FROM cand c
       |JOIN tb ON tb.term = c.term
       |JOIN bc ON bc.j = tb.j AND bc.bucket = tb.bucket
       |GROUP BY 1, 2
       |ORDER BY c.cnt DESC, c.term""".stripMargin

  /** Robust outlier detection per event_type: lower-median, median absolute
    * deviation (MAD), and the count of values beyond 3·MAD — the robust
    * z-score data-quality check. Both medians rank the COMPRESSED value
    * domain (groupBy (type, cents) first, cumulative count over distinct
    * values), so the windows scan |distinct values| rows, not |events| —
    * the same scale posture as exact_percentiles. All arithmetic in exact
    * integer cents; the lower median (smallest value whose cumulative count
    * reaches ⌈n/2⌉) avoids cross-engine interpolation entirely.
    */
  private def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
    def lowerMedian(df: DataFrame, valueCol: String, outName: String): DataFrame = {
      val wCum = Window.partitionBy(col("event_type")).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      df.groupBy(col("event_type"), col(valueCol))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") >= ceil(col("n") / 2.0), col(valueCol)))
          .as(outName))
    }
    val med = lowerMedian(ev, "vc", "med_c")
    // consumed twice (MAD ranking + the final outlier count) — Q contract
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("vc") - col("med_c")))
      .cache()
    val mad = lowerMedian(dev, "dev", "mad_c")
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        max(col("med_c")).as("med_c"),
        max(col("mad_c")).as("mad_c"),
        sum(when(col("dev") > lit(3) * col("mad_c"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("n"),
        (col("med_c").cast("double") / 100.0).as("median"),
        (col("mad_c").cast("double") / 100.0).as("mad"),
        col("n_outliers"))
      .orderBy(col("event_type"))
  }

  private val madOutliersSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events
      |), med AS (
      |  SELECT event_type, MIN(CASE WHEN cum >= CEIL(n / 2.0) THEN vc END) AS med_c
      |  FROM (SELECT event_type, vc, cnt,
      |          SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |                         ROWS UNBOUNDED PRECEDING) AS cum,
      |          SUM(cnt) OVER (PARTITION BY event_type) AS n
      |        FROM (SELECT event_type, vc, COUNT(*) AS cnt FROM ev GROUP BY 1, 2))
      |  GROUP BY event_type
      |), dev AS (
      |  SELECT ev.event_type, ABS(vc - med_c) AS dev, med_c
      |  FROM ev JOIN med USING (event_type)
      |), mad AS (
      |  SELECT event_type, MIN(CASE WHEN cum >= CEIL(n / 2.0) THEN dev END) AS mad_c
      |  FROM (SELECT event_type, dev, cnt,
      |          SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
      |                         ROWS UNBOUNDED PRECEDING) AS cum,
      |          SUM(cnt) OVER (PARTITION BY event_type) AS n
      |        FROM (SELECT event_type, dev, COUNT(*) AS cnt FROM dev GROUP BY 1, 2))
      |  GROUP BY event_type
      |)
      |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MAX(med_c) AS DOUBLE) / 100.0 AS median,
      |  CAST(MAX(m.mad_c) AS DOUBLE) / 100.0 AS mad,
      |  CAST(SUM(CASE WHEN dev > 3 * m.mad_c THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mutual information between event_type and the value's pooled decile
    * bucket — the feature-relevance diagnostic ("does this feature carry
    * signal about the label") run before training. Decile boundaries come
    * from the POOLED compressed value domain via [[PrefixOps]] and
    * broadcast back (the psi_drift shape); MI = Σ p_tb·ln(p_tb/(p_t·p_b)),
    * assembled exactly: integer count cross-products, ln through the
    * double-round ln-milli pattern, ONE final IEEE division per output.
    * Entropies H(type)/H(bucket) ride the same machinery, and NMI =
    * MI/min(H) normalizes. Everything after the one events pass is
    * aggregate-sized (|types|·10 cells).
    */
  private def mutualInformation(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
    val vcCounts = ev.groupBy(col("vc")).agg(count(lit(1)).as("cnt"))
    val ranked = PrefixOps.withGlobalPrefix(vcCounts, col("vc"),
      Seq(col("vc")), sums = Seq("cnt"))
    val bndAggs = (1 to 9).map { i =>
      min(when(col("g_run_cnt") >= ceil(col("g_tot_cnt") * i / 10.0),
        col("vc"))).as(s"b$i")
    }
    val bnds = ranked.agg(bndAggs.head, bndAggs.tail: _*)
      .select(array((1 to 9).map(i => col(s"b$i")): _*).as("bl"))
    val cells = ev.crossJoin(broadcast(bnds))
      .withColumn("b",
        expr("CAST(size(filter(bl, x -> vc >= x)) AS BIGINT)"))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("n_tb"))
      .cache()
    val nt = cells.groupBy(col("event_type")).agg(sum(col("n_tb")).as("n_t"))
    val nb = cells.groupBy(col("b")).agg(sum(col("n_tb")).as("n_b"))
    val tot = cells.agg(sum(col("n_tb")).as("n"))
    def lnMilli(c: Column): Column =
      round(round(log(c), 3) * 1000).cast("long")
    val joined = cells.join(broadcast(nt), "event_type")
      .join(broadcast(nb), "b")
      .crossJoin(broadcast(tot))
    val mi = joined
      .agg(sum(col("n_tb") * lnMilli((col("n_tb") * col("n")).cast("double") /
        (col("n_t") * col("n_b")).cast("double"))).as("mi_s"),
        max(col("n")).as("n"))
    val hT = nt.crossJoin(broadcast(tot))
      .agg(sum(col("n_t") *
        (lnMilli(col("n").cast("double")) - lnMilli(col("n_t").cast("double"))))
        .as("ht_s"))
    val hB = nb.crossJoin(broadcast(tot))
      .agg(sum(col("n_b") *
        (lnMilli(col("n").cast("double")) - lnMilli(col("n_b").cast("double"))))
        .as("hb_s"))
    mi.crossJoin(broadcast(hT)).crossJoin(broadcast(hB))
      .select(col("n"),
        (col("mi_s").cast("double") / col("n") / 1000.0).as("mi_nats"),
        (col("ht_s").cast("double") / col("n") / 1000.0).as("h_type_nats"),
        (col("hb_s").cast("double") / col("n") / 1000.0).as("h_bucket_nats"),
        (col("mi_s").cast("double") /
          least(col("ht_s"), col("hb_s")).cast("double")).as("nmi"))
  }

  private val mutualInformationSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events
      |), ranked AS (
      |  SELECT vc,
      |    SUM(cnt) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER () AS n
      |  FROM (SELECT vc, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1)
      |), bnds AS (
      |  SELECT list(bv ORDER BY i) AS bl FROM (
      |    SELECT i, MIN(CASE WHEN cum >= CEIL(n * i / 10.0) THEN vc END) AS bv
      |    FROM ranked CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS i)
      |    GROUP BY i)
      |), cells AS (
      |  SELECT event_type,
      |    CAST(len(list_filter((SELECT bl FROM bnds), x -> vc >= x))
      |         AS BIGINT) AS b,
      |    CAST(COUNT(*) AS BIGINT) AS n_tb
      |  FROM ev GROUP BY 1, 2
      |), nt AS (
      |  SELECT event_type, CAST(SUM(n_tb) AS BIGINT) AS n_t FROM cells GROUP BY 1
      |), nb AS (
      |  SELECT b, CAST(SUM(n_tb) AS BIGINT) AS n_b FROM cells GROUP BY 1
      |), tot AS (SELECT CAST(SUM(n_tb) AS BIGINT) AS n FROM cells),
      |mi AS (
      |  SELECT CAST(SUM(n_tb *
      |    CAST(ROUND(ROUND(ln(CAST(n_tb * n AS DOUBLE)
      |         / CAST(n_t * n_b AS DOUBLE)), 3) * 1000) AS BIGINT))
      |    AS BIGINT) AS mi_s,
      |    MAX(n) AS n
      |  FROM cells JOIN nt USING (event_type) JOIN nb USING (b) CROSS JOIN tot
      |), ht AS (
      |  SELECT CAST(SUM(n_t *
      |    (CAST(ROUND(ROUND(ln(CAST(n AS DOUBLE)), 3) * 1000) AS BIGINT)
      |     - CAST(ROUND(ROUND(ln(CAST(n_t AS DOUBLE)), 3) * 1000) AS BIGINT)))
      |    AS BIGINT) AS ht_s
      |  FROM nt CROSS JOIN tot
      |), hb AS (
      |  SELECT CAST(SUM(n_b *
      |    (CAST(ROUND(ROUND(ln(CAST(n AS DOUBLE)), 3) * 1000) AS BIGINT)
      |     - CAST(ROUND(ROUND(ln(CAST(n_b AS DOUBLE)), 3) * 1000) AS BIGINT)))
      |    AS BIGINT) AS hb_s
      |  FROM nb CROSS JOIN tot
      |)
      |SELECT n,
      |  CAST(mi_s AS DOUBLE) / n / 1000.0 AS mi_nats,
      |  CAST(ht_s AS DOUBLE) / n / 1000.0 AS h_type_nats,
      |  CAST(hb_s AS DOUBLE) / n / 1000.0 AS h_bucket_nats,
      |  CAST(mi_s AS DOUBLE) / CAST(LEAST(ht_s, hb_s) AS DOUBLE) AS nmi
      |FROM mi, ht, hb""".stripMargin

  /** Pairwise earth-mover's distance (1-D Wasserstein) between the value
    * distributions of every two event types — the distribution-drift
    * distance ("how different is checkout's spend profile from signup's")
    * that PSI only approximates binwise. For 1-D CDFs, EMD = ∫|F_a − F_b|dv
    * computed EXACTLY on the pooled compressed value grid: per type, the
    * cumulative count at every pooled distinct value (zero-filled grid
    * join, cum over the compressed domain partitioned by type), then
    * Σ |c_a·n_b − c_b·n_a|·Δv as exact longs with ONE final IEEE division
    * by n_a·n_b·100. Pair space is |types|² over the grid — aggregate-sized
    * everywhere past the one events pass.
    */
  private def emdPairwise(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
    val grid = ev.select(col("vc")).distinct()
    val types = ev.select(col("event_type")).distinct()
    val counts = ev.groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("vc"))
    // dense per-type grid: every pooled value appears for every type
    val cum = grid.crossJoin(broadcast(types))
      .join(counts, Seq("event_type", "vc"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("c", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("dv", lead(col("vc"), 1).over(wNext) - col("vc"))
      .filter(col("dv").isNotNull) // last grid point carries no mass span
      .select(col("event_type"), col("vc"), col("c"), col("n"), col("dv"))
      .cache()
    val a = cum.select(col("event_type").as("ta"), col("vc"),
      col("c").as("ca"), col("n").as("na"), col("dv"))
    val b = cum.select(col("event_type").as("tb"), col("vc").as("vcb"),
      col("c").as("cb"), col("n").as("nb"))
    a.join(b, col("vc") === col("vcb") && col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(sum(abs(col("ca") * col("nb") - col("cb") * col("na")) * col("dv"))
        .as("s"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .select(col("ta"), col("tb"),
        (col("s").cast("double") /
          (col("na") * col("nb")).cast("double") / 100.0).as("emd"))
      .orderBy(col("ta"), col("tb"))
  }

  private val emdPairwiseSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events
      |), grid AS (SELECT DISTINCT vc FROM ev),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |counts AS (
      |  SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM ev GROUP BY 1, 2
      |), cum AS (
      |  SELECT event_type, vc,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |                   ROWS UNBOUNDED PRECEDING) AS c,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n,
      |    LEAD(vc) OVER (PARTITION BY event_type ORDER BY vc) - vc AS dv
      |  FROM (
      |    SELECT t.event_type, g.vc, COALESCE(cn.cnt, 0) AS cnt
      |    FROM grid g CROSS JOIN types t
      |    LEFT JOIN counts cn ON cn.event_type = t.event_type AND cn.vc = g.vc)
      |)
      |SELECT a.event_type AS ta, b.event_type AS tb,
      |  CAST(SUM(ABS(a.c * b.n - b.c * a.n) * a.dv) AS DOUBLE)
      |    / CAST(MAX(a.n) * MAX(b.n) AS DOUBLE) / 100.0 AS emd
      |FROM cum a JOIN cum b
      |  ON a.vc = b.vc AND a.event_type < b.event_type
      |WHERE a.dv IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Winsorization per event_type: exact p05/p95 cut points, values clipped
    * into [p05, p95], and the robust (winsorized) mean — the standard
    * outlier-taming transform before training-statistics aggregation. The
    * cut points are exact order statistics (smallest value whose cumulative
    * count reaches ⌈p·n⌉, ⌈·⌉ as integer (p·n + d−1) div d) ranked over the
    * COMPRESSED (type, cents) domain like [[madOutliers]] — the windows
    * scan |distinct values| rows, not |events|. Cuts broadcast back; the
    * winsorized mean is an exact integer micros division (Σclipped·10⁴
    * stays int64 to ~9e14 cents per type; DECIMAL carrier past that).
    */
  private def winsorizeClip(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val cuts = ev.groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("event_type"))
      .agg(
        min(when(col("cum") >= expr("(n + 19) div 20"), col("vc"))).as("lo_c"),
        min(when(col("cum") >= expr("(n * 19 + 19) div 20"), col("vc")))
          .as("hi_c"))
    ev.join(broadcast(cuts), "event_type")
      .withColumn("clipped", least(greatest(col("vc"), col("lo_c")), col("hi_c")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        max(col("lo_c")).as("lo_c"),
        max(col("hi_c")).as("hi_c"),
        sum(when(col("vc") < col("lo_c") || col("vc") > col("hi_c"), 1L)
          .otherwise(0L)).as("n_clipped"),
        expr("(sum(clipped) * 10000L) div count(1)").as("win_mean_micro"))
      .orderBy(col("event_type"))
  }

  private val winsorizeClipSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events
      |), cuts AS (
      |  SELECT event_type,
      |    MIN(CASE WHEN cum >= (n + 19) // 20 THEN vc END) AS lo_c,
      |    MIN(CASE WHEN cum >= (n * 19 + 19) // 20 THEN vc END) AS hi_c
      |  FROM (SELECT event_type, vc, cnt,
      |          SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |                         ROWS UNBOUNDED PRECEDING) AS cum,
      |          SUM(cnt) OVER (PARTITION BY event_type) AS n
      |        FROM (SELECT event_type, vc, COUNT(*) AS cnt FROM ev GROUP BY 1, 2))
      |  GROUP BY event_type
      |)
      |SELECT ev.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MAX(lo_c) AS BIGINT) AS lo_c,
      |  CAST(MAX(hi_c) AS BIGINT) AS hi_c,
      |  CAST(SUM(CASE WHEN vc < lo_c OR vc > hi_c THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped,
      |  CAST(SUM(LEAST(GREATEST(vc, lo_c), hi_c)) * 10000 AS BIGINT) // COUNT(*)
      |    AS win_mean_micro
      |FROM ev JOIN cuts USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Trimmed mean per event_type: drop the lowest and highest 5% of ROWS
    * by rank, exact mean of the middle 90% — the robust-location
    * complement of [[winsorizeClip]] (winsorizing clips outliers to the
    * cut, trimming discards them). Computed entirely on the COMPRESSED
    * (type, cents, cnt) domain: a value-run occupying ranks
    * [r−cnt+1, r] contributes its overlap with the kept band
    * [lo+1, n−lo] (lo = n div 20) — pure integer interval arithmetic, no
    * per-row explode, windows over distinct values only.
    */
  private def trimmedMean(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("vc"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    ev.groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("r", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("lo", expr("n div 20"))
      .withColumn("k", greatest(lit(0L),
        least(col("r"), col("n") - col("lo"))
          - greatest(col("r") - col("cnt") + 1, col("lo") + 1) + 1))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        sum(col("k")).cast("long").as("n_kept"),
        sum(col("vc") * col("k")).cast("long").as("kept_cents"))
      .select(col("event_type"), col("n"), col("n_kept"),
        expr("(kept_cents * 10000L) div n_kept").as("trim_mean_micro"))
      .orderBy(col("event_type"))
  }

  private val trimmedMeanSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events
      |), g AS (
      |  SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM ev GROUP BY 1, 2
      |), c AS (
      |  SELECT event_type, vc, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM g
      |), k AS (
      |  SELECT event_type, vc, cnt, r, n, n // 20 AS lo,
      |    GREATEST(0, LEAST(r, n - n // 20)
      |      - GREATEST(r - cnt + 1, n // 20 + 1) + 1) AS k
      |  FROM c
      |)
      |SELECT event_type, MAX(n) AS n,
      |  CAST(SUM(k) AS BIGINT) AS n_kept,
      |  CAST(CAST(SUM(vc * k) AS BIGINT) * 10000 AS BIGINT)
      |    // CAST(SUM(k) AS BIGINT) AS trim_mean_micro
      |FROM k GROUP BY 1 ORDER BY 1""".stripMargin

  /** Gini coefficient of the per-type value distribution — the inequality
    * readout behind "is this source's signal concentrated in a few huge
    * rows" curation decisions. Exact closed form over sorted NON-NEGATIVE
    * cents (negative rows excluded — Gini's domain):
    * G = (2·W − (n+1)·S) / (n·S) with W = Σ rank·x. On the compressed
    * domain a run of `cnt` equal values x ending at rank r contributes
    * x·(cnt·r − cnt·(cnt−1)/2) to W — integer interval arithmetic again,
    * no explode. Output in exact ppm (floor), plus the double via the
    * string-routed conversion.
    */
  private def giniByType(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("vc"))
      .filter(col("vc") >= 0)
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    ev.groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("r", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        sum(d38(col("vc")) * col("cnt")).as("s"),
        // cnt·(cnt−1) is always even — integer div is exact; plain `/`
        // would grow a decimal scale (Spark) / go float (DuckDB)
        sum(expr("""CAST(vc AS DECIMAL(38,0)) *
          (CAST(cnt AS DECIMAL(38,0)) * r -
           (CAST(cnt AS DECIMAL(38,0)) * (cnt - 1)) div 2)"""
          .replaceAll("\n\\s*", " "))).as("w"))
      .select(col("event_type"), col("n"),
        expr("CAST((2 * w - (n + 1) * s) * 1000000 div (n * s) AS BIGINT)")
          .as("gini_ppm"))
      .orderBy(col("event_type"))
  }

  private val giniByTypeSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events
      |  WHERE CAST(ROUND(value * 100) AS BIGINT) >= 0
      |), g AS (
      |  SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM ev GROUP BY 1, 2
      |), c AS (
      |  SELECT event_type, vc, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM g
      |), m AS (
      |  SELECT event_type, MAX(n) AS n,
      |    SUM(CAST(vc AS HUGEINT) * cnt) AS s,
      |    SUM(CAST(vc AS HUGEINT) *
      |        (CAST(cnt AS HUGEINT) * r
      |          - (CAST(cnt AS HUGEINT) * (cnt - 1)) // 2)) AS w
      |  FROM c GROUP BY 1
      |)
      |SELECT event_type, n,
      |  CAST((2 * w - (n + 1) * s) * 1000000 // (n * s) AS BIGINT) AS gini_ppm
      |FROM m ORDER BY event_type""".stripMargin

  /** Herfindahl–Hirschman concentration of per-type activity across users
    * — "is this event type driven by a handful of users" (the per-source
    * analog guides training-mix curation: a source dominated by one
    * crawler is weaker evidence than the same token count spread wide).
    * HHI = Σ share² = Σcnt²/(Σcnt)² in exact ppm; one hash-aggregate to
    * (type, user, cnt), one to the type, both map-side-partial.
    */
  private def sourceConcentration(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    perUser.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("cnt")).cast("long").as("total"),
        sum(d38(col("cnt")) * col("cnt")).as("sq"))
      .select(col("event_type"), col("n_users"),
        expr("CAST((sq * 1000000) div (CAST(total AS DECIMAL(38,0)) * total) AS BIGINT)")
          .as("hhi_ppm"))
      .orderBy(col("event_type"))
  }

  private val sourceConcentrationSql: String =
    """WITH pu AS (
      |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST((SUM(CAST(cnt AS HUGEINT) * cnt) * 1000000)
      |    // (CAST(SUM(cnt) AS HUGEINT) * CAST(SUM(cnt) AS BIGINT)) AS BIGINT)
      |    AS hhi_ppm
      |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin

  /** Poisson(1) CDF thresholds scaled to 2¹⁶, precomputed as literals both
    * engines share: w = #{t ≤ u} for u uniform on [0, 2¹⁶) is a
    * deterministic Poisson(1) draw (16-bit CDF resolution shifts each
    * threshold by < 2⁻¹⁶ probability — irrelevant to bootstrap validity,
    * and it lets ONE md5 seed 8 replicas). */
  private val POIS_T: Seq[Long] = Seq(
    24109L, 48218L, 60273L, 64291L, 65296L, 65497L, 65530L)
  private val BOOT_B = 32

  /** Poisson-bootstrap confidence interval for the per-type mean — the
    * standard way to get uncertainty bands at scale WITHOUT resampling
    * shuffles: every row carries B=32 deterministic Poisson(1) weights,
    * each replica's mean is Σwx div Σw in exact integer micros, and the
    * 90% band is the 2nd/31st order statistic of the 32 replica means.
    * The 32 weights come from FOUR md5 digests per row (md5(event_id:k),
    * k = b div 8 — 8 disjoint 16-bit slices each, hashed BEFORE the
    * replica explode; a per-(row, replica) hash was 8× the md5 work and
    * dominated the sweep at 3.2M hashes). The explode feeds straight into
    * a map-side partial aggregate, so the shuffle carries ≤ 32·|types|
    * rows per partition regardless of corpus size; the final order stats
    * sort 32-element arrays per type.
    */
  private def bootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val hs = array((0 until BOOT_B / 8).map(k =>
      md5(concat(col("event_id").cast("string"), lit(s":$k")))): _*)
    val u = conv(expr("substr(element_at(hs, CAST(b div 8 + 1 AS INT)), " +
      "(b % 8) * 4 + 1, 4)"), 16, 10).cast("long")
    val w = POIS_T.reverse.foldLeft(lit(7L): Column)((acc, t) =>
      when(u < lit(t), lit(POIS_T.indexOf(t).toLong)).otherwise(acc))
    val reps = Tables.t(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 1e6).cast("long").as("x"), hs.as("hs"))
      .select(col("event_type"), col("x"), col("hs"),
        explode(sequence(lit(0), lit(BOOT_B - 1))).as("b"))
      .select(col("event_type"), col("b"), col("x"), w.as("w"))
      .groupBy(col("event_type"), col("b"))
      // nullif: a replica can Poisson-weight a tiny group to zero total
      // weight (its resample is empty — no defined mean); Spark ANSI
      // aborts on div-by-zero where DuckDB NULLs, so both sides say
      // NULLIF explicitly and drop the empty replicas below
      .agg(expr("sum(w * x) div nullif(sum(w), 0)").as("mean_b"))
      .filter(col("mean_b").isNotNull)
    val point = Tables.t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("sum(CAST(ROUND(value * 1e6) AS LONG)) div count(1)")
          .as("mean_micro"))
    reps.groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("mean_b"))).as("ms"))
      .join(point, "event_type")
      .select(col("event_type"), col("n"), col("mean_micro"),
        // try_element_at: with empty replicas dropped the band array can
        // hold fewer than BOOT_B means; ANSI element_at would abort where
        // DuckDB's ms[i] out-of-range is NULL
        expr("try_element_at(ms, 2)").as("boot_lo_micro"),
        expr(s"try_element_at(ms, ${BOOT_B - 1})").as("boot_hi_micro"))
      .orderBy(col("event_type"))
  }

  private def bootstrapCiSql: String = {
    val wCase = POIS_T.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")
    s"""WITH reps AS (
       |  SELECT event_type, b,
       |    CAST(ROUND(value * 1e6) AS BIGINT) AS x,
       |    $wCase AS w
       |  FROM (
       |    SELECT event_type, value, b,
       |      CAST(concat('0x', substr(
       |        md5(CAST(event_id AS VARCHAR) || ':' || CAST(b // 8 AS VARCHAR)),
       |        (b % 8) * 4 + 1, 4)) AS BIGINT) AS u
       |    FROM events
       |    CROSS JOIN (SELECT unnest(generate_series(0, ${BOOT_B - 1})) AS b))
       |), means AS (
       |  SELECT event_type, b,
       |    CAST(SUM(w * x) AS BIGINT)
       |      // NULLIF(CAST(SUM(w) AS BIGINT), 0) AS mean_b
       |  FROM reps GROUP BY 1, 2
       |), bands AS (
       |  SELECT event_type, list(mean_b ORDER BY mean_b) AS ms
       |  FROM means WHERE mean_b IS NOT NULL GROUP BY 1
       |), point AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
       |      // CAST(COUNT(*) AS BIGINT) AS mean_micro
       |  FROM events GROUP BY 1
       |)
       |SELECT p.event_type, p.n, p.mean_micro,
       |  ms[2] AS boot_lo_micro, ms[${BOOT_B - 1}] AS boot_hi_micro
       |FROM bands JOIN point p USING (event_type)
       |ORDER BY p.event_type""".stripMargin
  }

  /** Quantile normalization: every per-type value mapped onto the POOLED
    * value distribution at the same quantile — norm(v) = F_pool⁻¹(F_g(v)),
    * the batch-effect / feature-alignment transform. Exact semantics: r =
    * the value's max rank within its group (cumulative count over the
    * compressed (type, cents) domain), q = ⌈r·N/n_g⌉, and norm(v) = the
    * smallest pooled value whose cumulative count reaches q. The pooled
    * ranking runs through [[PrefixOps]] (value domain is data-proportional
    * — no unpartitioned window); the q-to-interval lookup is a BANDED range
    * join: each pooled value's rank interval [lo, hi] explodes to
    * rank-buckets (total fan-out Σ len/width + |pooled| ≈ |pooled| + 256),
    * the probe hits its q-bucket, and the exact lo ≤ q ≤ hi predicate
    * filters inside — the session_overlap_pairs pattern, never
    * probe × pooled. Output is per distinct (type, value): the transform's
    * codebook (value-domain-sized, the form a pipeline persists and
    * broadcast-applies).
    */
  private def quantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val grp = ev.groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("r", sum(col("cnt")).over(wCum))
      .withColumn("n_g", sum(col("cnt")).over(wAll))
    val pooledCounts = ev.groupBy(col("vc")).agg(count(lit(1)).as("pcnt"))
    // bucket width bw = n_pool div 256 + 1, derived per-row from n_pool —
    // the same pure function both the build and probe sides compute
    val pooled = PrefixOps.withGlobalPrefix(pooledCounts, col("vc"),
        Seq(col("vc")), sums = Seq("pcnt"))
      .select(col("vc").as("pvc"), col("g_run_pcnt").as("hi"),
        (col("g_run_pcnt") - col("pcnt") + 1).as("lo"),
        col("g_tot_pcnt").as("n_pool"),
        (expr("g_tot_pcnt div 256") + 1).as("bw"))
      .cache()
    val pooledB = pooled
      .select(col("pvc"), col("lo"), col("hi"),
        explode(sequence(expr("(lo - 1) div bw"), expr("(hi - 1) div bw")))
          .as("bucket"))
    val nPool = pooled.agg(max(col("n_pool")).as("n_pool"),
      max(col("bw")).as("bw"))
    grp.crossJoin(broadcast(nPool))
      .withColumn("q", expr("(r * n_pool + n_g - 1) div n_g"))
      .withColumn("bucket", expr("(q - 1) div bw"))
      .join(pooledB, Seq("bucket"))
      .filter(col("lo") <= col("q") && col("q") <= col("hi"))
      .select(col("event_type"), col("vc"), col("cnt"), col("q"),
        col("pvc").as("norm_vc"))
      .orderBy(col("event_type"), col("vc"))
  }

  private val quantileNormalizeSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events
      |), grp AS (
      |  SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT event_type, vc, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |                   ROWS UNBOUNDED PRECEDING) AS r,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n_g
      |  FROM grp
      |), pooled AS (
      |  SELECT vc AS pvc,
      |    SUM(pcnt) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS hi,
      |    SUM(pcnt) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) - pcnt + 1 AS lo
      |  FROM (SELECT vc, CAST(COUNT(*) AS BIGINT) AS pcnt FROM ev GROUP BY 1)
      |), np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pool FROM ev)
      |SELECT r.event_type, r.vc, r.cnt,
      |  CAST((r.r * np.n_pool + r.n_g - 1) // r.n_g AS BIGINT) AS q,
      |  p.pvc AS norm_vc
      |FROM ranked r CROSS JOIN np
      |JOIN pooled p
      |  ON p.lo <= (r.r * np.n_pool + r.n_g - 1) // r.n_g
      | AND (r.r * np.n_pool + r.n_g - 1) // r.n_g <= p.hi
      |ORDER BY r.event_type, r.vc""".stripMargin

  /** Exponential smoothing (α = ½) of the per-type DAILY value series —
    * ema_d = ⌊(ema_{d-1} + mean_d) / 2⌋ in exact integer micros. Two-level
    * shape: the heavy step is one hash-aggregate to (type, day, mean);
    * the recurrence — inherently sequential, floor-rounded so no scan
    * reformulation is exact — then folds over a CALENDAR-BOUNDED array
    * (~30 rows/key here, 365/key/year at any corpus size), never over raw
    * events. Prefix re-folds are O(days²) per key on post-aggregate data.
    */
  private def emaDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 1e6).cast("long"))
        .cast("long")).as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("mean_micro", expr("sum_micro div cnt"))
    daily
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("mean_micro"))))
        .as("xs"))
      .select(col("event_type"), explode(expr(
        """transform(sequence(1, size(xs)), d ->
          |  named_struct(
          |    'day', xs[d - 1].day,
          |    'mean_micro', xs[d - 1].mean_micro,
          |    'ema_micro', aggregate(slice(xs, 1, d), CAST(NULL AS BIGINT),
          |      (acc, x) -> coalesce((acc + x.mean_micro) div 2,
          |                           x.mean_micro))))""".stripMargin)).as("r"))
      .select(col("event_type"), col("r.day").as("day"),
        col("r.mean_micro").as("mean_micro"), col("r.ema_micro").as("ema_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  private val emaDailySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
      |      // CAST(COUNT(*) AS BIGINT) AS mean_micro
      |  FROM events GROUP BY 1, 2
      |), packed AS (
      |  SELECT event_type,
      |    list(day ORDER BY day) AS days,
      |    list(mean_micro ORDER BY day) AS means
      |  FROM daily GROUP BY 1
      |), unrolled AS (
      |  SELECT event_type, unnest(generate_series(1, len(days))) AS d,
      |         days, means
      |  FROM packed
      |)
      |SELECT event_type, days[d] AS day, means[d] AS mean_micro,
      |  list_reduce(list_slice(means, 1, d),
      |              (acc, x) -> (acc + x) // 2) AS ema_micro
      |FROM unrolled ORDER BY event_type, day""".stripMargin

  /** AR(1) autoregression of the per-type daily mean series: fit
    * x_d = c + φ·x_{d−1} by OLS over the lag-1 pairs — the persistence
    * readout (φ → 1: strong day-over-day memory; φ → 0: white noise)
    * behind every "is this metric mean-reverting" question, and the
    * model-fit complement of [[holtLinear]]'s smoother. Two-level shape:
    * the heavy pass is one hash-aggregate to the (type, day, mean) table;
    * the lag window runs over that CALENDAR-BOUNDED aggregate (365
    * rows/type/year at any corpus size), and φ/c assemble from exact d38
    * moments exactly like [[olsByType]] — zero-variance series → NULL via
    * the same guard-vs-/0→NULL convention.
    */
  private def ar1Daily(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 1e6).cast("long"))
        .cast("long")).as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("mean_micro", expr("sum_micro div cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val pairs = daily
      .withColumn("x", lag(col("mean_micro"), 1).over(w))
      .filter(col("x").isNotNull)
      .select(col("event_type"), col("x"), col("mean_micro").as("y"))
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x")) * col("y")).as("sxy"),
        sum(d38(col("x")) * col("x")).as("sxx"))
      .select(
        col("event_type"), col("n_pairs"),
        {
          val den = (d38(col("n_pairs")) * d38(col("sxx"))
            - d38(col("sx")) * d38(col("sx"))).cast("double")
          when(den > 0,
            (d38(col("n_pairs")) * d38(col("sxy"))
              - d38(col("sx")) * d38(col("sy"))).cast("double") / den)
            .as("phi")
        },
        {
          val den = (d38(col("n_pairs")) * d38(col("sxx"))
            - d38(col("sx")) * d38(col("sx"))).cast("double")
          when(den > 0,
            ((d38(col("sy")) * d38(col("sxx"))
              - d38(col("sx")) * d38(col("sxy"))).cast("double") / den) / 1e6)
            .as("intercept_units")
        })
      .orderBy(col("event_type"))
  }

  private val ar1DailySql: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
       |      // CAST(COUNT(*) AS BIGINT) AS mean_micro
       |  FROM events GROUP BY 1, 2
       |), p AS (
       |  SELECT event_type,
       |    LAG(mean_micro) OVER (PARTITION BY event_type ORDER BY day) AS x,
       |    mean_micro AS y
       |  FROM daily
       |), pf AS (
       |  SELECT * FROM p WHERE x IS NOT NULL
       |), m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx
       |  FROM pf GROUP BY 1
       |)
       |SELECT event_type, n_pairs,
       |  CASE WHEN CAST(CAST(${dmul("n_pairs", "sxx")} - ${dmul("sx", "sx")} AS STRING) AS DOUBLE) > 0 THEN
       |    CAST(CAST(${dmul("n_pairs", "sxy")} - ${dmul("sx", "sy")} AS STRING) AS DOUBLE)
       |      / CAST(CAST(${dmul("n_pairs", "sxx")} - ${dmul("sx", "sx")} AS STRING) AS DOUBLE)
       |  END AS phi,
       |  CASE WHEN CAST(CAST(${dmul("n_pairs", "sxx")} - ${dmul("sx", "sx")} AS STRING) AS DOUBLE) > 0 THEN
       |    (CAST(CAST(${dmul("sy", "sxx")} - ${dmul("sx", "sxy")} AS STRING) AS DOUBLE)
       |      / CAST(CAST(${dmul("n_pairs", "sxx")} - ${dmul("sx", "sx")} AS STRING) AS DOUBLE)) / 1e6
       |  END AS intercept_units
       |FROM m ORDER BY event_type""".stripMargin

  /** One-sided CUSUM change detection on the per-type daily mean series —
    * the classic sequential test for "did this metric's level shift up".
    * S_d = max(0, S_{d-1} + (x_d − μ − κ)) with μ the per-type mean of the
    * daily means and slack κ = μ/20, all in exact integer micros
    * (floor-div on non-negative operands, so both engines agree). Like
    * [[emaDaily]], the inherently-sequential recurrence folds over a
    * CALENDAR-BOUNDED per-type day array (heavy lifting = one hash-agg to
    * (type, day); the fold touches ≤ |days| elements however large the
    * corpus) — DuckDB replays it via list_reduce with a prepended zero
    * accumulator. `alarm` fires when the cumulated excess tops one day's
    * mean.
    */
  private def cusumShift(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 1e6).cast("long"))
        .cast("long")).as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("mean_micro", expr("sum_micro div cnt"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("mean_micro"))))
        .as("xs"))
      .withColumn("mu",
        expr("aggregate(xs, 0L, (a, x) -> a + x.mean_micro) div size(xs)"))
      .withColumn("kap", expr("mu div 20"))
      .select(col("event_type"), col("mu").as("mu_micro"), explode(expr(
        """transform(sequence(1, size(xs)), d ->
          |  named_struct(
          |    'day', xs[d - 1].day,
          |    'mean_micro', xs[d - 1].mean_micro,
          |    'cusum_micro', aggregate(slice(xs, 1, d), 0L,
          |      (acc, x) -> greatest(0L, acc + x.mean_micro - mu - kap))))"""
          .stripMargin)).as("r"))
      .select(col("event_type"), col("r.day").as("day"),
        col("r.mean_micro").as("mean_micro"),
        col("r.cusum_micro").as("cusum_micro"),
        (col("r.cusum_micro") > col("mu_micro")).as("alarm"))
      .orderBy(col("event_type"), col("day"))
  }

  private val cusumShiftSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
      |      // CAST(COUNT(*) AS BIGINT) AS mean_micro
      |  FROM events GROUP BY 1, 2
      |), packed AS (
      |  SELECT event_type,
      |    list(day ORDER BY day) AS days,
      |    list(mean_micro ORDER BY day) AS means
      |  FROM daily GROUP BY 1
      |), st AS (
      |  SELECT event_type, days, means,
      |    list_sum(means) // len(means) AS mu
      |  FROM packed
      |), unrolled AS (
      |  SELECT event_type, unnest(generate_series(1, len(days))) AS d,
      |         days, means, mu, mu // 20 AS kap
      |  FROM st
      |)
      |SELECT event_type, days[d] AS day, means[d] AS mean_micro,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(means, 1, d)),
      |              (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x - mu - kap))
      |    AS cusum_micro,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(means, 1, d)),
      |              (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x - mu - kap))
      |    > mu AS alarm
      |FROM unrolled ORDER BY event_type, day""".stripMargin

  /** Distribution drift per day vs a day-1 baseline — the population
    * stability index (PSI) every production ML monitor computes. Decile
    * boundaries come from the baseline day's COMPRESSED value domain via
    * [[PrefixOps]] (no unpartitioned window); each event then buckets by
    * counting boundaries ≤ value (an array fold against a broadcast 9-long
    * list — no per-row join). PSI = Σ (p−q)·ln(p/q) assembled exactly:
    * count cross-products in int64, ln(ratio) through the round-milli
    * pattern, ONE final IEEE division per day. Buckets empty on either
    * side are skipped (standard PSI practice); `n_buckets` surfaces it.
    * Carrier bound: c·nq stays int64 to ~3e9 events/day — past that the
    * d38 DECIMAL carrier pattern applies.
    */
  private def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("vc"))
    val d1 = ev.filter(col("day") === lit("2024-01-01").cast("date"))
    val vcCounts = d1.groupBy(col("vc")).agg(count(lit(1)).as("cnt"))
    val ranked = PrefixOps.withGlobalPrefix(vcCounts, col("vc"),
      Seq(col("vc")), sums = Seq("cnt"))
    val bndAggs = (1 to 9).map { i =>
      min(when(col("g_run_cnt") >= ceil(col("g_tot_cnt") * i / 10.0),
        col("vc"))).as(s"b$i")
    }
    val bnds = ranked.agg(bndAggs.head, bndAggs.tail: _*)
      .select(array((1 to 9).map(i => col(s"b$i")): _*).as("bl"))
    val dayCounts = ev.crossJoin(broadcast(bnds))
      .withColumn("b",
        expr("CAST(size(filter(bl, x -> vc >= x)) AS BIGINT)"))
      .groupBy(col("day"), col("b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("nd", sum(col("c")).over(Window.partitionBy(col("day"))))
    val base = dayCounts
      .filter(col("day") === lit("2024-01-01").cast("date"))
      .select(col("b"), col("c").as("qc"), col("nd").as("nq"))
    dayCounts.join(broadcast(base), "b")
      .withColumn("ln_milli",
        round(round(log((col("c") * col("nq")).cast("double") /
          (col("qc") * col("nd")).cast("double")), 3) * 1000).cast("long"))
      .groupBy(col("day"))
      .agg(
        sum((col("c") * col("nq") - col("qc") * col("nd")) * col("ln_milli"))
          .as("s_scaled"),
        max(col("nd")).as("nd"), max(col("nq")).as("nq"),
        count(lit(1)).as("n_buckets"))
      .select(col("day"), col("n_buckets"),
        (col("s_scaled").cast("double") /
          (col("nd") * col("nq")).cast("double") / 1000.0).as("psi"))
      .orderBy(col("day"))
  }

  private val psiDriftSql: String =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events
      |), vc_counts AS (
      |  SELECT vc, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev
      |  WHERE day = DATE '2024-01-01' GROUP BY 1
      |), ranked AS (
      |  SELECT vc,
      |    SUM(cnt) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER () AS n
      |  FROM vc_counts
      |), bnds AS (
      |  SELECT list(bv ORDER BY i) AS bl FROM (
      |    SELECT i, MIN(CASE WHEN cum >= CEIL(n * i / 10.0) THEN vc END) AS bv
      |    FROM ranked CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS i)
      |    GROUP BY i)
      |), day_counts AS (
      |  SELECT day, b, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT day,
      |      CAST(len(list_filter((SELECT bl FROM bnds), x -> vc >= x))
      |           AS BIGINT) AS b
      |    FROM ev)
      |  GROUP BY 1, 2
      |), with_nd AS (
      |  SELECT day, b, c,
      |    CAST(SUM(c) OVER (PARTITION BY day) AS BIGINT) AS nd
      |  FROM day_counts
      |), base AS (
      |  SELECT b, c AS qc, nd AS nq FROM with_nd
      |  WHERE day = DATE '2024-01-01'
      |)
      |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_buckets,
      |  CAST(SUM((c * nq - qc * nd) *
      |       CAST(ROUND(ROUND(ln(CAST(c * nq AS DOUBLE)
      |            / CAST(qc * nd AS DOUBLE)), 3) * 1000) AS BIGINT))
      |       AS DOUBLE)
      |    / CAST(MAX(nd) * MAX(nq) AS DOUBLE) / 1000.0 AS psi
      |FROM with_nd JOIN base USING (b)
      |GROUP BY day ORDER BY day""".stripMargin

  // Integer division parity note: Spark's `div` and DuckDB's `//` BOTH
  // truncate toward zero (verified: (-5)//2 = -2 in DuckDB), so plain
  // div/`//` pairs are exact on negative operands too — no floor shim.

  /** Mergeable quantile estimation from a log₂-bucket histogram — the
    * Prometheus `histogram_quantile` pattern, the third sketch of the trio
    * (KMV = distinct, CMS = frequency, this = quantiles). Each value lands
    * in bucket ⌊log₂(v_micro)⌋ computed EXACTLY as binary-digit count (no
    * libm), bucket counts are trivially mergeable longs (map-side combine
    * + any split/merge order), and the p50/p95 estimates are the lower
    * edge 2^bin of the first bucket whose cumulative count crosses the
    * rank. The exact percentile (compressed-domain order statistic) rides
    * along so the output quantifies its own sketch error — at 2× bucket
    * resolution the estimate is within one octave by construction.
    */
  private def logHistogramQuantiles(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"),
        greatest(round(col("value") * 1e6).cast("long"), lit(1L)).as("vm"))
      .withColumn("bin", (length(conv(col("vm"), 10, 2)) - lit(1)).cast("long"))
    val wCumB = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAllB = Window.partitionBy(col("event_type"))
    val sketch = ev.groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCumB))
      .withColumn("n", sum(col("cnt")).over(wAllB))
      .groupBy(col("event_type"))
      .agg(max(col("n")).cast("long").as("n"),
        min(when(col("cum") >= ceil(col("n") / 2.0), col("bin")))
          .cast("long").as("bin_p50"),
        min(when(lit(20L) * col("cum") >= lit(19L) * col("n"), col("bin")))
          .cast("long").as("bin_p95"))
      .withColumn("est_p50_micro", expr("shiftleft(1L, cast(bin_p50 as int))"))
      .withColumn("est_p95_micro", expr("shiftleft(1L, cast(bin_p95 as int))"))
    val wCumV = Window.partitionBy(col("event_type")).orderBy(col("vm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = ev.groupBy(col("event_type"), col("vm"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCumV))
      .withColumn("n", sum(col("cnt")).over(wAllB))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") >= ceil(col("n") / 2.0), col("vm")))
        .cast("long").as("exact_p50_micro"))
    sketch.join(exact, "event_type")
      .select(col("event_type"), col("n"), col("bin_p50"),
        col("est_p50_micro"), col("exact_p50_micro"),
        col("bin_p95"), col("est_p95_micro"))
      .orderBy(col("event_type"))
  }

  private val logHistogramQuantilesSql: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    GREATEST(CAST(ROUND(value * 1e6) AS BIGINT), 1) AS vm
      |  FROM events
      |), binned AS (
      |  SELECT event_type, vm,
      |    CAST(LENGTH(bin(vm)) - 1 AS BIGINT) AS bin
      |  FROM ev
      |), sk AS (
      |  SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM binned GROUP BY 1, 2
      |), skc AS (
      |  SELECT event_type, bin, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
      |                   ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM sk
      |), sketch AS (
      |  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      |    CAST(MIN(CASE WHEN cum >= CEIL(n / 2.0) THEN bin END) AS BIGINT)
      |      AS bin_p50,
      |    CAST(MIN(CASE WHEN 20 * cum >= 19 * n THEN bin END) AS BIGINT)
      |      AS bin_p95
      |  FROM skc GROUP BY 1
      |), vx AS (
      |  SELECT event_type, vm, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM binned GROUP BY 1, 2
      |), vxc AS (
      |  SELECT event_type, vm, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY vm
      |                   ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM vx
      |), exact AS (
      |  SELECT event_type,
      |    CAST(MIN(CASE WHEN cum >= CEIL(n / 2.0) THEN vm END) AS BIGINT)
      |      AS exact_p50_micro
      |  FROM vxc GROUP BY 1
      |)
      |SELECT s.event_type, s.n, s.bin_p50,
      |  CAST(1 AS BIGINT) << s.bin_p50 AS est_p50_micro,
      |  e.exact_p50_micro,
      |  s.bin_p95, CAST(1 AS BIGINT) << s.bin_p95 AS est_p95_micro
      |FROM sketch s JOIN exact e ON s.event_type = e.event_type
      |ORDER BY s.event_type""".stripMargin

  /** Table profiling (the deequ/dbt-docs column summary): per events
    * column — row count, null count, exact distinct count, and min/max
    * (numeric columns as quantized micros so no engine-specific float
    * formatting enters the output; string columns lexicographic). One
    * single-column aggregate per column, each a pruned parallel scan —
    * deliberately NOT one multi-distinct aggregate, which Catalyst plans
    * as an Expand ×|columns| over the full row width.
    */
  private def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    def prof(c: String, numeric: Boolean): DataFrame = {
      val base = ev.select(col(c))
      val (mnN, mxN) =
        if (numeric)
          (min(round(col(c).cast("double") * 1e6)).cast("long"),
            max(round(col(c).cast("double") * 1e6)).cast("long"))
        else (lit(null).cast("long"), lit(null).cast("long"))
      val (mnS, mxS) =
        if (numeric) (lit(null).cast("string"), lit(null).cast("string"))
        else (min(col(c).cast("string")), max(col(c).cast("string")))
      base.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col(c).isNull.cast("long")).cast("long").as("n_null"),
        countDistinct(col(c)).cast("long").as("n_distinct"),
        mnN.as("min_micro"), mxN.as("max_micro"),
        mnS.as("min_str"), mxS.as("max_str"))
        .select(lit(c).as("column") +: Seq("n", "n_null", "n_distinct",
          "min_micro", "max_micro", "min_str", "max_str").map(col): _*)
    }
    prof("event_id", numeric = true)
      .unionAll(prof("user_id", numeric = true))
      .unionAll(prof("value", numeric = true))
      .unionAll(prof("event_type", numeric = false))
      .unionAll(prof("props", numeric = false))
      .orderBy(col("column"))
  }

  private val columnProfileSql: String = {
    def prof(c: String, numeric: Boolean): String = {
      val (mnN, mxN) =
        if (numeric)
          (s"CAST(MIN(ROUND(CAST($c AS DOUBLE) * 1e6)) AS BIGINT)",
            s"CAST(MAX(ROUND(CAST($c AS DOUBLE) * 1e6)) AS BIGINT)")
        else ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)")
      val (mnS, mxS) =
        if (numeric) ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        else (s"MIN(CAST($c AS VARCHAR))", s"MAX(CAST($c AS VARCHAR))")
      s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $mnN AS min_micro, $mxN AS max_micro,
         |  $mnS AS min_str, $mxS AS max_str
         |FROM events""".stripMargin
    }
    Seq(prof("event_id", true), prof("user_id", true), prof("value", true),
      prof("event_type", false), prof("props", false))
      .mkString("\nUNION ALL\n") + "\nORDER BY \"column\""
  }

  /** Holt's linear-trend double exponential smoothing (α = β = ½) of the
    * per-type daily mean series, in exact integer micros with floor
    * division so both engines agree on negative levels/trends:
    *   l_d = (x_d + l_{d-1} + b_{d-1}) div 2,  b_d = (b_{d-1} + l_d − l_{d-1}) div 2
    * (l_1 = x_1, b_1 = 0; div truncates identically in both engines).
    * Same two-level scale posture as [[emaDaily]]:
    * the heavy pass is one hash-aggregate to (type, day); the inherently
    * sequential recurrence folds over a CALENDAR-BOUNDED per-type array
    * (≤365 entries/key/year at any corpus size). DuckDB replays the exact
    * recurrence with a recursive CTE over the packed arrays.
    */
  private def holtLinear(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 1e6).cast("long"))
        .cast("long")).as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("mean_micro", expr("sum_micro div cnt"))
    val lNew = "((acc.l + acc.b + x.mean_micro) div 2L)"
    val bNew = s"((acc.b + $lNew - acc.l) div 2L)"
    daily
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("mean_micro"))))
        .as("xs"))
      .select(col("event_type"), explode(expr(
        s"""transform(sequence(1, size(xs)), d ->
           |  named_struct(
           |    'day', xs[d - 1].day,
           |    'mean_micro', xs[d - 1].mean_micro,
           |    'st', aggregate(slice(xs, 1, d),
           |      named_struct('l', CAST(NULL AS BIGINT), 'b', 0L),
           |      (acc, x) -> if(acc.l IS NULL,
           |        named_struct('l', x.mean_micro, 'b', 0L),
           |        named_struct('l', $lNew, 'b', $bNew)))))""".stripMargin))
        .as("r"))
      .select(col("event_type"), col("r.day").as("day"),
        col("r.mean_micro").as("mean_micro"),
        col("r.st.l").as("level_micro"), col("r.st.b").as("trend_micro"),
        (col("r.st.l") + col("r.st.b")).as("forecast_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  private val holtLinearSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
      |      // CAST(COUNT(*) AS BIGINT) AS mean_micro
      |  FROM events GROUP BY 1, 2
      |), packed AS (
      |  SELECT event_type,
      |    list(day ORDER BY day) AS days,
      |    list(mean_micro ORDER BY day) AS means
      |  FROM daily GROUP BY 1
      |), h AS (
      |  SELECT event_type, 1 AS d, means[1] AS l, CAST(0 AS BIGINT) AS b
      |  FROM packed
      |  UNION ALL
      |  SELECT h.event_type, h.d + 1,
      |    (p.means[h.d + 1] + h.l + h.b) // 2,
      |    (h.b + ((p.means[h.d + 1] + h.l + h.b) // 2) - h.l) // 2
      |  FROM h JOIN packed p ON h.event_type = p.event_type
      |  WHERE h.d < len(p.means)
      |)
      |SELECT h.event_type, p.days[h.d] AS day, p.means[h.d] AS mean_micro,
      |  h.l AS level_micro, h.b AS trend_micro, h.l + h.b AS forecast_micro
      |FROM h JOIN packed p ON h.event_type = p.event_type
      |ORDER BY h.event_type, day""".stripMargin

  /** Theil–Sen robust trend: the median of all pairwise slopes of the
    * per-type daily mean series. Heavy pass = one hash-aggregate to
    * (type, day); the pair join runs over the CALENDAR-BOUNDED aggregated
    * table (≤365 days/year → ≤66k pairs/type/year however large the raw
    * corpus), partitioned per type. Slopes in truncating-div micros/day
    * (identical in both engines, negatives included); lower median picked
    * by rank so ties are value-identical.
    */
  private def theilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 1e6).cast("long"))
        .cast("long")).as("sum_micro"), count(lit(1)).as("cnt"))
      .withColumn("mean_micro", expr("sum_micro div cnt"))
      .select(col("event_type"), col("day"), col("mean_micro"))
    val a = daily.alias("a")
    val b = daily.alias("b")
    val pairs = a.join(b,
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .withColumn("dd", datediff(col("b.day"), col("a.day")).cast("long"))
      .withColumn("dm", col("b.mean_micro") - col("a.mean_micro"))
      .select(col("a.event_type").as("event_type"),
        expr("dm div dd").as("slope_micro"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("slope_micro"))
    val nDays = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("np", count(lit(1))
        .over(Window.partitionBy(col("event_type"))).cast("long"))
      .filter(col("rn") === expr("(np + 1L) div 2L"))
      .join(broadcast(nDays), "event_type")
      .select(col("event_type"), col("n_days"), col("np").as("n_pairs"),
        col("slope_micro").as("slope_micro_per_day"))
      .orderBy(col("event_type"))
  }

  private val theilSenSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
      |      // CAST(COUNT(*) AS BIGINT) AS mean_micro
      |  FROM events GROUP BY 1, 2
      |), p AS (
      |  SELECT a.event_type,
      |    (b.mean_micro - a.mean_micro)
      |      // CAST(date_diff('day', a.day, b.day) AS BIGINT) AS slope_micro
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day < b.day
      |), r AS (
      |  SELECT event_type, slope_micro,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |                            ORDER BY slope_micro) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
      |  FROM p
      |), nd AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY 1
      |)
      |SELECT r.event_type, nd.n_days, r.np AS n_pairs,
      |  r.slope_micro AS slope_micro_per_day
      |FROM r JOIN nd ON r.event_type = nd.event_type
      |WHERE r.rn = (r.np + 1) // 2
      |ORDER BY r.event_type""".stripMargin

  /** Mann–Whitney U (one-vs-rest per event type, with tie correction):
    * ranks the pooled `value` domain ONCE, then derives each type's rank
    * sum from per-(value, type) counts — no per-type re-ranking, no
    * unpartitioned raw-row window. The pooled ranking runs over the
    * COMPRESSED distinct-value domain through [[PrefixOps]]' two-level
    * prefix sum; with tied values grouped, the doubled average rank of a
    * value with r predecessors and multiplicity c is exactly 2r + c + 1,
    * keeping everything integer until the final z (identical IEEE
    * expression in both engines, emitted as round-to-micros).
    */
  private def mannWhitney(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.t(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 1e6).cast("long").as("vm"))
    val grp = q.groupBy(col("vm"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val tot = grp.groupBy(col("vm")).agg(sum(col("cnt")).cast("long").as("c"))
    val pfx = PrefixOps.withGlobalPrefix(tot, col("vm"), Seq(col("vm")),
        sums = Seq("c"))
      .select(col("vm"), col("c"), (col("g_run_c") - col("c")).as("rb"))
    val perType = grp.join(pfx, "vm")
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).cast("long").as("n_x"),
        sum(col("cnt") * (lit(2L) * col("rb") + col("c") + lit(1L)))
          .cast("long").as("r_x2"))
    val glob = tot.agg(sum(col("c")).cast("long").as("n"),
      sum(col("c") * col("c") * col("c") - col("c")).cast("long")
        .as("t_ties"))
    val nD = col("n").cast("double")
    val naD = col("n_x").cast("double")
    val nbD = col("n_b").cast("double")
    perType.crossJoin(broadcast(glob))
      .withColumn("n_b", col("n") - col("n_x"))
      .withColumn("u_x2", col("r_x2") - col("n_x") * (col("n_x") + lit(1L)))
      .withColumn("znum_x2", col("u_x2") - col("n_x") * col("n_b"))
      .withColumn("z_micro",
        round(col("znum_x2").cast("double") /
          (lit(2.0) * sqrt((naD * nbD / lit(12.0)) *
            ((nD + lit(1.0)) -
              col("t_ties").cast("double") / (nD * (nD - lit(1.0)))))) *
          lit(1e6)).cast("long"))
      .select(col("event_type"), col("n_x"), col("n_b"), col("u_x2"),
        col("z_micro"))
      .orderBy(col("event_type"))
  }

  private val mannWhitneySql: String =
    """WITH q AS (
      |  SELECT event_type, CAST(ROUND(value * 1e6) AS BIGINT) AS vm
      |  FROM events WHERE value IS NOT NULL
      |), grp AS (
      |  SELECT vm, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM q GROUP BY 1, 2
      |), tot AS (
      |  SELECT vm, CAST(SUM(cnt) AS BIGINT) AS c FROM grp GROUP BY 1
      |), pfx AS (
      |  SELECT vm, c,
      |    CAST(SUM(c) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING) - c
      |         AS BIGINT) AS rb
      |  FROM tot
      |), pt AS (
      |  SELECT g.event_type, CAST(SUM(g.cnt) AS BIGINT) AS n_x,
      |    CAST(SUM(g.cnt * (2 * p.rb + p.c + 1)) AS BIGINT) AS r_x2
      |  FROM grp g JOIN pfx p ON g.vm = p.vm
      |  GROUP BY 1
      |), gl AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(c * c * c - c) AS BIGINT) AS t_ties
      |  FROM tot
      |)
      |SELECT event_type, n_x, n - n_x AS n_b,
      |  r_x2 - n_x * (n_x + 1) AS u_x2,
      |  CAST(ROUND(
      |    CAST(r_x2 - n_x * (n_x + 1) - n_x * (n - n_x) AS DOUBLE) /
      |    (2.0 * SQRT((CAST(n_x AS DOUBLE) * CAST(n - n_x AS DOUBLE) / 12.0) *
      |      ((CAST(n AS DOUBLE) + 1.0) -
      |        CAST(t_ties AS DOUBLE) /
      |          (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))) * 1e6)
      |    AS BIGINT) AS z_micro
      |FROM pt CROSS JOIN gl
      |ORDER BY event_type""".stripMargin

  /** Pearson chi-square test of independence between customer market
    * segment and order priority. The full R×C grid (including zero cells,
    * which still contribute (0−E)²/E) is the broadcast cross of the two
    * marginal tables; the only corpus-sized work is one broadcast join +
    * two hash aggregates. Cell contributions are rounded to micros before
    * the order-independent long sum, so the total is associative-safe.
    */
  private def chi2Independence(s: SparkSession, dir: String): DataFrame = {
    val oc = Tables.t(s, dir, "orders")
      .join(broadcast(Tables.t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
    val cells = oc.groupBy(col("seg"), col("pri"))
      .agg(count(lit(1)).cast("long").as("o"))
    val rt = cells.groupBy(col("seg")).agg(sum(col("o")).cast("long").as("rt"))
    val ct = cells.groupBy(col("pri")).agg(sum(col("o")).cast("long").as("ct"))
    val n1 = cells.agg(sum(col("o")).cast("long").as("n"))
    val grid = broadcast(rt).crossJoin(broadcast(ct))
      .join(cells, Seq("seg", "pri"), "left")
      .withColumn("obs", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n1))
    val e = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
    val od = col("obs").cast("double")
    grid
      .withColumn("contrib_micro",
        round((od - e) * (od - e) / e * lit(1e6)).cast("long"))
      .agg(max(col("n")).as("n"),
        countDistinct(col("seg")).cast("long").as("n_segments"),
        countDistinct(col("pri")).cast("long").as("n_priorities"),
        sum(col("contrib_micro")).cast("long").as("chi2_micro"))
      .withColumn("df",
        (col("n_segments") - lit(1L)) * (col("n_priorities") - lit(1L)))
      .select(col("n"), col("n_segments"), col("n_priorities"), col("df"),
        col("chi2_micro"))
  }

  private val chi2IndependenceSql: String =
    """WITH oc AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS pri
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), cells AS (
      |  SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS o FROM oc GROUP BY 1, 2
      |), rt AS (
      |  SELECT seg, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1
      |), ct AS (
      |  SELECT pri, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1
      |), n1 AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
      |grid AS (
      |  SELECT rt.seg, ct.pri, rt.rt, ct.ct, n1.n,
      |    CAST(COALESCE(cells.o, 0) AS BIGINT) AS obs
      |  FROM rt CROSS JOIN ct CROSS JOIN n1
      |  LEFT JOIN cells ON cells.seg = rt.seg AND cells.pri = ct.pri
      |), contrib AS (
      |  SELECT n, seg, pri,
      |    CAST(ROUND(
      |      (CAST(obs AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      (CAST(obs AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) /
      |      (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
      |      AS contrib_micro
      |  FROM grid
      |)
      |SELECT MAX(n) AS n,
      |  CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_segments,
      |  CAST(COUNT(DISTINCT pri) AS BIGINT) AS n_priorities,
      |  (CAST(COUNT(DISTINCT seg) AS BIGINT) - 1) *
      |    (CAST(COUNT(DISTINCT pri) AS BIGINT) - 1) AS df,
      |  CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro
      |FROM contrib""".stripMargin

  /** Exact weighted median (and weighted p25/p75) of l_extendedprice per
    * return flag, weight = l_quantity: the smallest price whose running
    * weight reaches half the total. Scale posture is the exact_percentiles
    * recipe: aggregate FIRST to the compressed (flag, price) domain — the
    * cumulative window then runs over distinct prices per flag, not raw
    * rows, and is partitioned by flag (no global single-reducer sort).
    * Quantities are integral in this schema; summing them as longs keeps
    * the 2·cum ≥ q·total cut condition in exact integer math (q = 1,2,3
    * quartile numerators over a denominator of 4).
    */
  private def weightedMedian(s: SparkSession, dir: String): DataFrame = {
    // cumulative weights through PrefixOps: the per-flag price domain is
    // data-proportional (nearly one distinct price per row here), so a
    // flag-partitioned window would still funnel each flag through one
    // reducer at 100× — the equidepth_histogram lesson. Two-level prefix
    // sum keeps every stage parallel.
    val comp = Tables.t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      // explicit ROUND: Spark's double->long cast TRUNCATES where DuckDB's
      // rounds half-away (hostile 23.5 qty summed one apart) -- ROUND is
      // half-away in both engines, the catalog's safe quantizer
      .agg(sum(round(col("l_quantity")).cast("long")).as("w"))
    PrefixOps.withGlobalPrefix(comp,
      bucketBy = col("l_extendedprice"),
      order = Seq(col("l_extendedprice")),
      groupKeys = Seq("l_returnflag"),
      sums = Seq("w"))
      .withColumn("cum", col("g_run_w"))
      .withColumn("tot", col("g_tot_w"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("tot")).as("total_weight"),
        min(when(col("cum") * 4 >= col("tot"), col("l_extendedprice"))).as("wp25"),
        min(when(col("cum") * 2 >= col("tot"), col("l_extendedprice"))).as("w_median"),
        min(when(col("cum") * 4 >= col("tot") * 3, col("l_extendedprice"))).as("wp75"))
      .orderBy(col("l_returnflag"))
  }

  private def weightedMedianSql: String =
    """WITH comp AS (
      |  SELECT l_returnflag, l_extendedprice,
      |         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS w
      |  FROM lineitem GROUP BY l_returnflag, l_extendedprice
      |), cums AS (
      |  SELECT l_returnflag, l_extendedprice, w,
      |         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
      |                      ROWS UNBOUNDED PRECEDING) AS cum,
      |         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM comp
      |)
      |SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS total_weight,
      |       MIN(CASE WHEN cum * 4 >= tot THEN l_extendedprice END) AS wp25,
      |       MIN(CASE WHEN cum * 2 >= tot THEN l_extendedprice END) AS w_median,
      |       MIN(CASE WHEN cum * 4 >= tot * 3 THEN l_extendedprice END) AS wp75
      |FROM cums GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Kaplan-Meier survival estimate of user lifetime: per-user lifetime
    * t = days between first and last event; a user is a "death" (churn
    * observed) if they went quiet ≥ 1 full day before the observation
    * window's end (the synthetic window is only 30 days — a production
    * deployment would use ≥ 7/30 days), else right-censored. At each distinct lifetime t ascending:
    * at_risk = users with lifetime ≥ t, d = deaths at exactly t, and the
    * survival curve S(t) = Π (1 − d/at_risk) reported as ln S(t) — per-step
    * logs are quantized to longs (round(ln·1e6), the cross-engine-safe ln
    * pattern) so the cumulative sum is exact and order-free; S(t) is
    * exp(ln_survival) for the consumer.
    *
    * Scale posture: one per-user shuffle, then all windows run over the
    * COMPRESSED distinct-lifetime domain — bounded by the observation
    * window in days, not by user count (the monthly_revenue_mom class,
    * allowlisted in PlanShapeSpec). The d = at_risk boundary (S hits 0,
    * ln −∞) yields NULL lnq and stops the curve instead of poisoning it.
    */
  private def kaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    val life = ev.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
    val lab = life
      .crossJoin(broadcast(ev.agg(to_date(max(col("ts"))).as("dmax"))))
      .select(datediff(col("d1"), col("d0")).cast("long").as("t"),
        (datediff(col("dmax"), col("d1")) >= 1).as("churned"))
    val byT = lab.groupBy(col("t"))
      .agg(count(lit(1)).as("c_all"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"))
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("cum_all", sum(col("c_all")).over(wCum))
      .withColumn("n_total", sum(col("c_all")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("at_risk", col("n_total") - col("cum_all") + col("c_all"))
      .withColumn("lnq", when(col("d") < col("at_risk"),
        round(log(lit(1.0) - col("d").cast("double") / col("at_risk")) * 1e6)
          .cast("long")))
      .withColumn("ln_survival",
        sum(col("lnq")).over(wCum).cast("double") / 1e6)
      .select(col("t"), col("at_risk"), col("d"), col("ln_survival"))
      .orderBy(col("t"))
  }

  private def kaplanMeierSql: String =
    """WITH life AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      |  FROM events GROUP BY user_id
      |), lab AS (
      |  SELECT CAST(date_diff('day', l.d0, l.d1) AS BIGINT) AS t,
      |         date_diff('day', l.d1, m.dmax) >= 1 AS churned
      |  FROM life l CROSS JOIN (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events) m
      |), byt AS (
      |  SELECT t, CAST(COUNT(*) AS BIGINT) AS c_all,
      |         CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM lab GROUP BY t
      |), risk AS (
      |  SELECT t, c_all, d,
      |         CAST(SUM(c_all) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_all,
      |         CAST(SUM(c_all) OVER () AS BIGINT) AS n_total
      |  FROM byt
      |), f AS (
      |  SELECT t, n_total - cum_all + c_all AS at_risk, d,
      |         CASE WHEN d < n_total - cum_all + c_all THEN
      |           CAST(ROUND(LN(1 - CAST(d AS DOUBLE) / (n_total - cum_all + c_all)) * 1e6)
      |                AS BIGINT) END AS lnq
      |  FROM risk
      |)
      |SELECT t, at_risk, d,
      |       CAST(SUM(lnq) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e6
      |         AS ln_survival
      |FROM f ORDER BY t""".stripMargin

  /** Higher distribution moments per event type: population variance,
    * skewness, excess kurtosis — from exact power sums over µ-quantized
    * longs, SHIFTED per group before raising to powers. Skew/kurtosis are
    * shift-invariant and variance only needs the shifted mean, so pass 1
    * computes the truncated integer group mean m0 = S1 div n (one tiny
    * aggregate, broadcast back) and pass 2 raises c = v − m0 to powers:
    * the DECIMAL(38,0)/HUGEINT carrier then holds spread⁴·n instead of
    * |v|⁴·n — where the unshifted form overflowed 128 bits at
    * |value| ≈ 80 regardless of n (hostile_events caught exactly that).
    *
    * Carrier split (the sf10 scale envelope fix, COVERAGE.md): mean and
    * variance aggregate the µ-quantized (1e6) carrier — their s2 bound
    * spread²·n has ~1e20 headroom — but the CUBIC/QUARTIC sums run on a
    * CENTS-quantized (1e2) carrier, whose shifted 4th powers are 1e16×
    * smaller: spread⁴·n ≤ 1.7e38 now holds to ~1e18 rows/group at $500
    * spread instead of going marginal at sf10. Skew/kurtosis are
    * standardized (scale cancels), so the only semantic change is that
    * they are now moments of the cents-rounded distribution — lossless on
    * the driver tables (every `value` has exactly 2 decimals, probed) and
    * in lockstep in both engines on any data. Assembly happens in DOUBLE
    * with identical expression text in both engines; degenerate groups
    * (zero variance IN THE CENTS CARRIER — the guard must match the
    * carrier it divides) yield NULL skew/kurtosis via the same
    * guard-vs-/0→NULL convention as corr_manual.
    */
  private def momentsByType(s: SparkSession, dir: String): DataFrame = {
    val v = round(col("value") * 1e6).cast(DecimalType(38, 0))
    val v2 = round(col("value") * 1e2).cast(DecimalType(38, 0))
    val base = Tables.t(s, dir, "events")
      .select(col("event_type"), v.as("v"), v2.as("w"))
    val m0 = base.groupBy(col("event_type"))
      .agg(expr("CAST(sum(v) div count(1) AS DECIMAL(38,0))").as("m0"),
        expr("CAST(sum(w) div count(1) AS DECIMAL(38,0))").as("w0"))
    val c = col("v") - col("m0")
    val cw = col("w") - col("w0")
    val agg = base.join(broadcast(m0), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("m0")).as("m0"),
        sum(c).as("s1"), sum(c * c).as("s2"),
        sum(cw).as("t1"), sum(cw * cw).as("t2"),
        sum(cw * cw * cw).as("t3"), sum(cw * cw * cw * cw).as("t4"))
    val varE = expr(
      "CAST(CAST(s2 AS STRING) AS DOUBLE)/n - (CAST(CAST(s1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(s1 AS STRING) AS DOUBLE)/n)")
    val tVarE = expr(
      "CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)")
    agg.select(
      col("event_type"), col("n"),
      expr("(CAST(CAST(m0 AS STRING) AS DOUBLE) + CAST(CAST(s1 AS STRING) AS DOUBLE)/n) / 1e6").as("mean"),
      varE.divide(lit(1e12)).as("variance"),
      when(tVarE > 0, expr(
        """(CAST(CAST(t3 AS STRING) AS DOUBLE)/n
          |  - 3*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t2 AS STRING) AS DOUBLE)/n)
          |  + 2*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n))
          | / ((CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)) * sqrt(CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)))
          |""".stripMargin.replaceAll("\n", " "))).as("skewness"),
      when(tVarE > 0, expr(
        """(CAST(CAST(t4 AS STRING) AS DOUBLE)/n
          |  - 4*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t3 AS STRING) AS DOUBLE)/n)
          |  + 6*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t2 AS STRING) AS DOUBLE)/n)
          |  - 3*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n))
          | / ((CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n))
          |    * (CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n))) - 3
          |""".stripMargin.replaceAll("\n", " "))).as("kurtosis"))
      .orderBy(col("event_type"))
  }

  private def momentsByTypeSql: String =
    """WITH base AS (
      |  SELECT event_type,
      |         CAST(CAST(ROUND(value * 1e6) AS BIGINT) AS HUGEINT) AS v,
      |         CAST(CAST(ROUND(value * 1e2) AS BIGINT) AS HUGEINT) AS w
      |  FROM events
      |), m0t AS (
      |  SELECT event_type, SUM(v) // COUNT(*) AS m0, SUM(w) // COUNT(*) AS w0
      |  FROM base GROUP BY 1
      |), agg AS (
      |  SELECT b.event_type, CAST(COUNT(*) AS BIGINT) AS n, MAX(m.m0) AS m0,
      |         SUM(b.v - m.m0) AS s1, SUM((b.v - m.m0)*(b.v - m.m0)) AS s2,
      |         SUM(b.w - m.w0) AS t1, SUM((b.w - m.w0)*(b.w - m.w0)) AS t2,
      |         SUM((b.w - m.w0)*(b.w - m.w0)*(b.w - m.w0)) AS t3,
      |         SUM((b.w - m.w0)*(b.w - m.w0)*(b.w - m.w0)*(b.w - m.w0)) AS t4
      |  FROM base b JOIN m0t m USING (event_type)
      |  GROUP BY b.event_type
      |)
      |SELECT event_type, n,
      |  (CAST(CAST(m0 AS STRING) AS DOUBLE) + CAST(CAST(s1 AS STRING) AS DOUBLE)/n) / 1e6 AS mean,
      |  (CAST(CAST(s2 AS STRING) AS DOUBLE)/n - (CAST(CAST(s1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(s1 AS STRING) AS DOUBLE)/n)) / 1e12
      |    AS variance,
      |  CASE WHEN CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n) > 0 THEN
      |  (CAST(CAST(t3 AS STRING) AS DOUBLE)/n
      |    - 3*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t2 AS STRING) AS DOUBLE)/n)
      |    + 2*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n))
      |   / ((CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)) * sqrt(CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)))
      |  END AS skewness,
      |  CASE WHEN CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n) > 0 THEN
      |  (CAST(CAST(t4 AS STRING) AS DOUBLE)/n
      |    - 4*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t3 AS STRING) AS DOUBLE)/n)
      |    + 6*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t2 AS STRING) AS DOUBLE)/n)
      |    - 3*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n))
      |   / ((CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n))
      |      * (CAST(CAST(t2 AS STRING) AS DOUBLE)/n - (CAST(CAST(t1 AS STRING) AS DOUBLE)/n)*(CAST(CAST(t1 AS STRING) AS DOUBLE)/n))) - 3
      |  END AS kurtosis
      |FROM agg ORDER BY event_type""".stripMargin

  /** Benford first-significant-digit audit of l_extendedprice — the
    * fraud/data-quality screen: observed first-digit frequencies against
    * Benford's log10(1 + 1/d) expectation. The first digit is read from the
    * decimal rendering of the exact cents-quantized INTEGER (scaling by 100
    * never changes the leading significant digit), so no float formatting
    * is ever compared across engines; the Benford expectation is quantized
    * at 1e12 to absorb libm log10 ULP differences.
    */
  private def benfordDigits(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // Benford's law is defined on nonzero MAGNITUDES: abs() so a negative
    // price contributes its leading significant digit instead of the
    // literal '-' (which ANSI-aborted the digit->double cast), and cents=0
    // rows are excluded (digit '0' has no Benford expectation — its
    // log10(1 + 1/0) divides by zero). hostile_relational caught both.
    val cents = abs(round(col("l_extendedprice") * 100).cast("long"))
    Tables.t(s, dir, "lineitem")
      .select(cents.as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("obs_frac",
        col("n").cast("double") / sum(col("n")).over(wAll).cast("double"))
      .withColumn("benford_frac",
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")) * 1e12)
          .cast("long").cast("double") / 1e12)
      .withColumn("abs_dev", abs(col("obs_frac") - col("benford_frac")))
      .select(col("digit"), col("n"), col("obs_frac"), col("benford_frac"),
        col("abs_dev"))
      .orderBy(col("digit"))
  }

  private def benfordDigitsSql: String =
    """WITH d AS (
      |  SELECT substr(CAST(ABS(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS VARCHAR), 1, 1)
      |           AS digit
      |  FROM lineitem
      |  WHERE ABS(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) > 0
      |), g AS (
      |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
      |)
      |SELECT digit, n,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS obs_frac,
      |  CAST(CAST(ROUND(log10(1 + 1 / CAST(digit AS DOUBLE)) * 1e12) AS BIGINT) AS DOUBLE)
      |    / 1e12 AS benford_frac,
      |  ABS(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)
      |      - CAST(CAST(ROUND(log10(1 + 1 / CAST(digit AS DOUBLE)) * 1e12) AS BIGINT) AS DOUBLE)
      |        / 1e12) AS abs_dev
      |FROM g ORDER BY digit""".stripMargin

  /** CUPED variance-reduced A/B readout: per-user pre-period (days ≤ 15)
    * and post-period value sums, md5-hash arms, pooled
    * θ = cov(pre, post)/var(pre), adjusted metric
    * adj = post − θ·(pre − mean(pre)) — the standard experimentation
    * technique that shrinks metric variance using pre-experiment behaviour.
    * Reports per arm: n, raw and adjusted means, raw and adjusted
    * variances, and the variance-reduction fraction.
    *
    * Determinism: per-user sums are exact micro longs; θ and mean(pre)
    * come from one 1-row broadcast of DECIMAL-exact moment sums assembled
    * in DOUBLE with identical expression text; each user's adj is
    * RE-QUANTIZED to a micro long before the per-arm sums, so arm
    * aggregates stay order-free; the final variance assembly repeats the
    * identical-text pattern. Two shuffles total (user agg, arm agg).
    */
  private def cupedLift(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val arm = pmod(
      conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10).cast("long"),
      lit(2L))
    val perUser = Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(to_date(col("ts")) <= lit("2024-01-15"),
          round(col("value") * 1e6).cast("long")).otherwise(0L)).as("pre"),
        sum(when(to_date(col("ts")) > lit("2024-01-15"),
          round(col("value") * 1e6).cast("long")).otherwise(0L)).as("post"))
      .withColumn("arm", arm)
    val theta = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("pre").cast(dec)).as("sx"),
      sum(col("post").cast(dec)).as("sy"),
      sum((col("pre").cast(dec) * col("pre").cast(dec))).as("sxx"),
      sum((col("pre").cast(dec) * col("post").cast(dec))).as("sxy"))
    val adj = perUser.crossJoin(broadcast(theta))
      .withColumn("adjq", round(expr(
        """CAST(post AS DOUBLE)
           - (CAST(CAST(sxy AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sy AS STRING) AS DOUBLE)/n)
             / (CAST(CAST(sxx AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sx AS STRING) AS DOUBLE)/n)
             * (CAST(pre AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)/n)"""
          .replaceAll("\n\\s*", " "))).cast("long"))
    adj.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_arm"),
        sum(col("post").cast(dec)).as("ay"),
        sum((col("post").cast(dec) * col("post").cast(dec))).as("ayy"),
        sum(col("adjq").cast(dec)).as("aj"),
        sum((col("adjq").cast(dec) * col("adjq").cast(dec))).as("ajj"))
      .select(col("arm"), col("n_arm"),
        expr("CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm/1e6").as("mean_post"),
        expr("CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm/1e6").as("mean_adj"),
        expr("""(CAST(CAST(ayy AS STRING) AS DOUBLE)/n_arm - (CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm)*(CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm)) / 1e12""")
          .as("var_post"),
        expr("""(CAST(CAST(ajj AS STRING) AS DOUBLE)/n_arm - (CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm)*(CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm)) / 1e12""")
          .as("var_adj"),
        expr("""1 - (CAST(CAST(ajj AS STRING) AS DOUBLE)/n_arm - (CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm)*(CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm)) / (CAST(CAST(ayy AS STRING) AS DOUBLE)/n_arm - (CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm)*(CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm))""")
          .as("var_reduction"))
      .orderBy(col("arm"))
  }

  private def cupedLiftSql: String =
    """WITH per_user AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
      |      THEN CAST(ROUND(value * 1e6) AS BIGINT) ELSE 0 END) AS BIGINT) AS pre,
      |    CAST(SUM(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
      |      THEN CAST(ROUND(value * 1e6) AS BIGINT) ELSE 0 END) AS BIGINT) AS post,
      |    CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) % 2 AS BIGINT) AS arm
      |  FROM events GROUP BY user_id
      |), theta AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(pre AS HUGEINT)) AS sx, SUM(CAST(post AS HUGEINT)) AS sy,
      |    SUM(CAST(pre AS HUGEINT) * pre) AS sxx,
      |    SUM(CAST(pre AS HUGEINT) * post) AS sxy
      |  FROM per_user
      |), adj AS (
      |  SELECT arm, post,
      |    CAST(ROUND(CAST(post AS DOUBLE) - (CAST(CAST(sxy AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sy AS STRING) AS DOUBLE)/n) / (CAST(CAST(sxx AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sx AS STRING) AS DOUBLE)/n) * (CAST(pre AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)/n)) AS BIGINT) AS adjq
      |  FROM per_user CROSS JOIN theta
      |), arms AS (
      |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
      |    SUM(CAST(post AS HUGEINT)) AS ay,
      |    SUM(CAST(post AS HUGEINT) * post) AS ayy,
      |    SUM(CAST(adjq AS HUGEINT)) AS aj,
      |    SUM(CAST(adjq AS HUGEINT) * adjq) AS ajj
      |  FROM adj GROUP BY arm
      |)
      |SELECT arm, n_arm,
      |  CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm/1e6 AS mean_post,
      |  CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm/1e6 AS mean_adj,
      |  (CAST(CAST(ayy AS STRING) AS DOUBLE)/n_arm - (CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm)*(CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm)) / 1e12 AS var_post,
      |  (CAST(CAST(ajj AS STRING) AS DOUBLE)/n_arm - (CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm)*(CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm)) / 1e12 AS var_adj,
      |  1 - (CAST(CAST(ajj AS STRING) AS DOUBLE)/n_arm - (CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm)*(CAST(CAST(aj AS STRING) AS DOUBLE)/n_arm)) / (CAST(CAST(ayy AS STRING) AS DOUBLE)/n_arm - (CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm)*(CAST(CAST(ay AS STRING) AS DOUBLE)/n_arm)) AS var_reduction
      |FROM arms ORDER BY arm""".stripMargin

  /** Two-sample Kolmogorov-Smirnov test: click vs view `value`
    * distributions. D = max |F_a(x) − F_b(x)| over the MERGED value
    * domain, evaluated exactly: both empirical CDFs are integer
    * cumulative counts over the compressed (distinct-vm) domain via
    * [[PrefixOps]] (one two-level prefix pass carries BOTH running sums —
    * no unpartitioned window), and the max gap is taken on the
    * cross-multiplied integer |cum_a·n_b − cum_b·n_a| so no division
    * happens until the single final row. The α=0.05 decision compares
    * against the asymptotic critical value c(α)·sqrt((n_a+n_b)/(n_a·n_b))
    * — one sqrt on identical inputs, bit-equal across engines. Carrier
    * bound: cum·n stays int64 to ~3e9 rows per sample; past that the d38
    * carrier pattern applies.
    */
  private def ksTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .filter(col("event_type").isin("click", "view") &&
        col("value").isNotNull)
      .select(round(col("value") * 1e6).cast("long").as("vm"),
        (col("event_type") === "click").as("is_a"))
    val grp = ev.groupBy(col("vm")).agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).cast("long").as("ca"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).cast("long").as("cb"))
    val pfx = PrefixOps.withGlobalPrefix(grp, col("vm"), Seq(col("vm")),
      sums = Seq("ca", "cb"))
    val tot = grp.agg(sum(col("ca")).cast("long").as("n_a"),
      sum(col("cb")).cast("long").as("n_b"))
    val agg = pfx.crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(col("g_run_ca") * col("n_b") - col("g_run_cb") * col("n_a")))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("gap")).cast("long").as("d_num"))
    val d = col("d_num").cast("double") /
      (col("n_a") * col("n_b")).cast("double")
    agg
      .withColumn("d_micro", round(d * 1e6).cast("long"))
      .withColumn("reject_05",
        d > lit(1.3581015) * sqrt((col("n_a") + col("n_b")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")))
  }

  private val ksTestSql: String =
    """WITH ev AS (
      |  SELECT CAST(ROUND(value * 1e6) AS BIGINT) AS vm,
      |    event_type = 'click' AS is_a
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
      |), grp AS (
      |  SELECT vm,
      |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM ev GROUP BY 1
      |), pfx AS (
      |  SELECT vm,
      |    CAST(SUM(ca) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING)
      |         AS BIGINT) AS cum_a,
      |    CAST(SUM(cb) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING)
      |         AS BIGINT) AS cum_b
      |  FROM grp
      |), tot AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
      |         CAST(SUM(cb) AS BIGINT) AS n_b
      |  FROM grp
      |), agg AS (
      |  SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
      |    CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num
      |  FROM pfx CROSS JOIN tot
      |)
      |SELECT n_a, n_b, d_num,
      |  CAST(ROUND(CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) * 1e6)
      |       AS BIGINT) AS d_micro,
      |  CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) >
      |    1.3581015 * SQRT(CAST(n_a + n_b AS DOUBLE) /
      |                     CAST(n_a * n_b AS DOUBLE)) AS reject_05
      |FROM agg""".stripMargin

  /** Welch's unequal-variance t-test, each event type vs the rest of the
    * corpus (the robust default when arm sizes/variances differ — unlike
    * Student's t it does not pool). One partial-agg pass collects exact
    * micro-quantized power sums per type on the d38 carrier; the
    * complement arm is total − type (exact integer algebra on the
    * broadcast single-row global), so the corpus is read once. t and the
    * Welch–Satterthwaite df assemble in doubles from exact int128 moments
    * with the identical expression tree on both engines, then quantize.
    */
  private def welchTtest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events").filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 1e6).cast("long").as("vm"))
    val per = ev.groupBy(col("event_type")).agg(
      count(lit(1)).cast("long").as("n_x"),
      sum(d38(col("vm"))).as("s_x"),
      sum(d38(col("vm")) * d38(col("vm"))).as("q_x"))
    val tot = per.agg(sum(col("n_x")).cast("long").as("n"),
      sum(col("s_x")).as("s"), sum(col("q_x")).as("q"))
    val nxD = col("n_x").cast("double")
    val nyD = col("n_y").cast("double")
    val sxD = col("s_x").cast("double")
    val syD = col("s_y").cast("double")
    val qxD = col("q_x").cast("double")
    val qyD = col("q_y").cast("double")
    // degenerate arms (n ≤ 1: variance undefined; sse = 0: both arms
    // zero-variance) yield NULL t/df. DuckDB's x/0 is NULL natively; Spark
    // under ANSI mode ABORTS on division by zero — hostile_events caught a
    // single-event type killing the whole query — so the guards are
    // explicit `when`s here and the oracle leans on /0→NULL there.
    val vx = when(col("n_x") > 1, (qxD - sxD * sxD / nxD) / (nxD - lit(1.0)))
    val vy = when(col("n_y") > 1, (qyD - syD * syD / nyD) / (nyD - lit(1.0)))
    val tStat = when(col("sse") > 0,
      (sxD / nxD - syD / nyD) / sqrt(col("sse")))
    val dfW = when(col("sse") > 0, col("sse") * col("sse") /
      ((col("vx") / nxD) * (col("vx") / nxD) / (nxD - lit(1.0)) +
        (col("vy") / nyD) * (col("vy") / nyD) / (nyD - lit(1.0))))
    per.crossJoin(broadcast(tot))
      .withColumn("n_y", col("n") - col("n_x"))
      .withColumn("s_y", col("s") - col("s_x"))
      .withColumn("q_y", col("q") - col("q_x"))
      .withColumn("vx", vx)
      .withColumn("vy", vy)
      .withColumn("sse", col("vx") / nxD + col("vy") / nyD)
      .select(col("event_type"), col("n_x"), col("n_y"),
        round(tStat * 1e6).cast("long").as("t_micro"),
        round(dfW * 1e3).cast("long").as("df_milli"))
      .orderBy(col("event_type"))
  }

  private val welchTtestSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 1e6) AS BIGINT) AS vm
      |  FROM events WHERE value IS NOT NULL
      |), per AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_x,
      |    SUM(CAST(vm AS HUGEINT)) AS s_x,
      |    SUM(CAST(vm AS HUGEINT) * vm) AS q_x
      |  FROM ev GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(n_x) AS BIGINT) AS n, SUM(s_x) AS s, SUM(q_x) AS q
      |  FROM per
      |), arms AS (
      |  SELECT event_type, n_x, n - n_x AS n_y,
      |    s_x, s - s_x AS s_y, q_x, q - q_x AS q_y
      |  FROM per CROSS JOIN tot
      |), assembled AS (
      |  SELECT event_type, n_x, n_y,
      |    (CAST(CAST(q_x AS STRING) AS DOUBLE) -
      |      CAST(CAST(s_x AS STRING) AS DOUBLE) * CAST(CAST(s_x AS STRING) AS DOUBLE) / CAST(n_x AS DOUBLE))
      |      / (CAST(n_x AS DOUBLE) - 1.0) AS vx,
      |    (CAST(CAST(q_y AS STRING) AS DOUBLE) -
      |      CAST(CAST(s_y AS STRING) AS DOUBLE) * CAST(CAST(s_y AS STRING) AS DOUBLE) / CAST(n_y AS DOUBLE))
      |      / (CAST(n_y AS DOUBLE) - 1.0) AS vy,
      |    CAST(CAST(s_x AS STRING) AS DOUBLE) / CAST(n_x AS DOUBLE) AS mx,
      |    CAST(CAST(s_y AS STRING) AS DOUBLE) / CAST(n_y AS DOUBLE) AS my
      |  FROM arms
      |)
      |SELECT event_type, n_x, n_y,
      |  CAST(ROUND((mx - my) /
      |    SQRT(vx / CAST(n_x AS DOUBLE) + vy / CAST(n_y AS DOUBLE)) * 1e6)
      |    AS BIGINT) AS t_micro,
      |  CAST(ROUND(
      |    (vx / CAST(n_x AS DOUBLE) + vy / CAST(n_y AS DOUBLE)) *
      |    (vx / CAST(n_x AS DOUBLE) + vy / CAST(n_y AS DOUBLE)) /
      |    ((vx / CAST(n_x AS DOUBLE)) * (vx / CAST(n_x AS DOUBLE)) /
      |       (CAST(n_x AS DOUBLE) - 1.0) +
      |     (vy / CAST(n_y AS DOUBLE)) * (vy / CAST(n_y AS DOUBLE)) /
      |       (CAST(n_y AS DOUBLE) - 1.0)) * 1e3)
      |    AS BIGINT) AS df_milli
      |FROM assembled ORDER BY event_type""".stripMargin

  /** Hellinger distance of each day's event-type mix vs the day-1
    * baseline — the bounded-[0,1] categorical-drift complement to
    * [[psiDrift]]'s value-decile PSI (PSI needs ln and blows up on empty
    * buckets; Hellinger is sqrt-only — every operation correctly rounded
    * in IEEE — and handles zero cells exactly). The grid is days ×
    * broadcast type list, so types absent on a day still contribute their
    * (√0 − √q)² mass; per-cell terms quantize to picos before the
    * order-free long sum, and the final sqrt runs on that exact integer.
    */
  private def hellingerDrift(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("c"))
    val types = counts.select(col("event_type")).distinct()
    val days = counts.groupBy(col("day")).agg(sum(col("c")).cast("long").as("nd"))
    val base = counts.filter(col("day") === lit("2024-01-01").cast("date"))
      .select(col("event_type"), col("c").as("qc"))
    val baseTot = base.agg(sum(col("qc")).cast("long").as("nq"))
    val diff = sqrt(col("c").cast("double") / col("nd").cast("double")) -
      sqrt(col("qc").cast("double") / col("nq").cast("double"))
    days.crossJoin(broadcast(types))
      .join(counts, Seq("day", "event_type"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .join(broadcast(base), Seq("event_type"), "left")
      .withColumn("qc", coalesce(col("qc"), lit(0L)))
      .crossJoin(broadcast(baseTot))
      .withColumn("term_pico", round(diff * diff * 1e12).cast("long"))
      .groupBy(col("day"))
      .agg(sum(when(col("c") > 0L, 1L).otherwise(0L)).cast("long").as("n_types"),
        sum(col("term_pico")).cast("long").as("h2_pico"))
      .withColumn("hellinger",
        sqrt(col("h2_pico").cast("double") / 2e12))
      .orderBy(col("day"))
  }

  private val hellingerDriftSql: String =
    """WITH counts AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), days AS (
      |  SELECT day, CAST(SUM(c) AS BIGINT) AS nd FROM counts GROUP BY 1
      |), types AS (SELECT DISTINCT event_type FROM counts),
      |base AS (
      |  SELECT event_type, c AS qc FROM counts WHERE day = DATE '2024-01-01'
      |), bt AS (SELECT CAST(SUM(qc) AS BIGINT) AS nq FROM base),
      |grid AS (
      |  SELECT d.day, t.event_type, d.nd,
      |    COALESCE(c.c, 0) AS c, COALESCE(b.qc, 0) AS qc
      |  FROM days d CROSS JOIN types t
      |  LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
      |  LEFT JOIN base b ON b.event_type = t.event_type
      |), terms AS (
      |  SELECT day, c,
      |    CAST(ROUND(
      |      (SQRT(CAST(c AS DOUBLE) / CAST(nd AS DOUBLE)) -
      |       SQRT(CAST(qc AS DOUBLE) / CAST(nq AS DOUBLE))) *
      |      (SQRT(CAST(c AS DOUBLE) / CAST(nd AS DOUBLE)) -
      |       SQRT(CAST(qc AS DOUBLE) / CAST(nq AS DOUBLE))) * 1e12)
      |      AS BIGINT) AS term_pico
      |  FROM grid CROSS JOIN bt
      |)
      |SELECT day,
      |  CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_types,
      |  CAST(SUM(term_pico) AS BIGINT) AS h2_pico,
      |  SQRT(CAST(SUM(term_pico) AS DOUBLE) / 2e12) AS hellinger
      |FROM terms GROUP BY 1 ORDER BY day""".stripMargin

  /** Decile lift & gain chart — the first readout of any propensity
    * model eval: users ranked by an engagement score (click+view count),
    * cut into 10 equal-rank deciles, and each decile's purchase rate
    * compared to the global rate. The global rank rides [[PrefixOps]]
    * (two-level prefix sum — ranking billions of users never funnels one
    * reducer); decile assignment is pure rank arithmetic; lift and
    * cumulative gain are exact integer ppm (cross-multiplied before any
    * division). The only window left is the cumulative gain over the
    * fixed 10-row decile table. Carrier bound: n_conv·n_total stays int64
    * to ~3e9 users; past that the d38 pattern applies.
    */
  private def liftByDecile(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.t(s, dir, "events").groupBy(col("user_id")).agg(
      sum(when(col("event_type").isin("click", "view"), 1L).otherwise(0L))
        .cast("long").as("score"),
      max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .cast("long").as("label"))
    val ranked = PrefixOps.withGlobalPrefix(users, -col("score"),
      Seq(col("score").desc, col("user_id")))
    val dec = ranked
      .withColumn("decile", expr("((g_rank - 1) * 10) div g_n + 1"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("label")).cast("long").as("n_conv"),
        min(col("score")).cast("long").as("min_score"),
        max(col("score")).cast("long").as("max_score"))
    val tot = dec.agg(sum(col("n_users")).cast("long").as("nt"),
      sum(col("n_conv")).cast("long").as("ct"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.crossJoin(broadcast(tot))
      .withColumn("conv_ppm", expr("n_conv * 1000000 div n_users"))
      .withColumn("lift_micro",
        expr("(n_conv * nt * 1000000) div (n_users * ct)"))
      .withColumn("cum_conv", sum(col("n_conv")).over(w).cast("long"))
      .withColumn("cum_gain_ppm", expr("cum_conv * 1000000 div ct"))
      .select(col("decile"), col("n_users"), col("n_conv"), col("min_score"),
        col("max_score"), col("conv_ppm"), col("lift_micro"),
        col("cum_gain_ppm"))
      .orderBy(col("decile"))
  }

  private val liftByDecileSql: String =
    """WITH users AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0
      |             END) AS BIGINT) AS score,
      |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |         AS BIGINT) AS label
      |  FROM events GROUP BY 1
      |), ranked AS (
      |  SELECT score, label,
      |    ROW_NUMBER() OVER (ORDER BY score DESC, user_id) AS rk,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM users
      |), dec AS (
      |  SELECT ((rk - 1) * 10) // n + 1 AS decile,
      |    CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(label) AS BIGINT) AS n_conv,
      |    CAST(MIN(score) AS BIGINT) AS min_score,
      |    CAST(MAX(score) AS BIGINT) AS max_score
      |  FROM ranked GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(n_users) AS BIGINT) AS nt,
      |         CAST(SUM(n_conv) AS BIGINT) AS ct
      |  FROM dec
      |)
      |SELECT decile, n_users, n_conv, min_score, max_score,
      |  n_conv * 1000000 // n_users AS conv_ppm,
      |  (n_conv * nt * 1000000) // (n_users * ct) AS lift_micro,
      |  CAST(SUM(n_conv) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
      |       AS BIGINT) * 1000000 // ct AS cum_gain_ppm
      |FROM dec CROSS JOIN tot ORDER BY decile""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("lift_by_decile", liftByDecile, Some(liftByDecileSql)),
    Q("wilson_ci", wilsonCi, Some(wilsonCiSql)),
    Q("ks_test", ksTest, Some(ksTestSql)),
    Q("welch_ttest", welchTtest, Some(welchTtestSql)),
    Q("hellinger_drift", hellingerDrift, Some(hellingerDriftSql)),
    Q("cuped_lift", cupedLift, Some(cupedLiftSql)),
    Q("moments_by_type", momentsByType, Some(momentsByTypeSql)),
    Q("benford_digits", benfordDigits, Some(benfordDigitsSql)),
    Q("kaplan_meier", kaplanMeier, Some(kaplanMeierSql)),
    Q("weighted_median", weightedMedian, Some(weightedMedianSql)),
    Q("psi_drift", psiDrift, Some(psiDriftSql)),
    Q("mad_outliers", madOutliers, Some(madOutliersSql)),
    Q("ema_daily", emaDaily, Some(emaDailySql)),
    Q("ar1_daily", ar1Daily, Some(ar1DailySql)),
    Q("holt_linear", holtLinear, Some(holtLinearSql)),
    Q("column_profile", columnProfile, Some(columnProfileSql)),
    Q("log_histogram_quantiles", logHistogramQuantiles, Some(logHistogramQuantilesSql)),
    Q("theilsen_trend", theilSen, Some(theilSenSql)),
    Q("mann_whitney", mannWhitney, Some(mannWhitneySql)),
    Q("chi2_independence", chi2Independence, Some(chi2IndependenceSql)),
    Q("cusum_shift", cusumShift, Some(cusumShiftSql)),
    Q("winsorize_clip", winsorizeClip, Some(winsorizeClipSql)),
    Q("trimmed_mean", trimmedMean, Some(trimmedMeanSql)),
    Q("gini_by_type", giniByType, Some(giniByTypeSql)),
    Q("source_concentration", sourceConcentration, Some(sourceConcentrationSql)),
    Q("bootstrap_ci", bootstrapCi, Some(bootstrapCiSql)),
    Q("quantile_normalize", quantileNormalize, Some(quantileNormalizeSql)),
    Q("mutual_information", mutualInformation, Some(mutualInformationSql)),
    Q("emd_pairwise", emdPairwise, Some(emdPairwiseSql)),
    Q("weighted_sample", weightedSample, Some(weightedSampleSql)),
    Q("hll_distinct", hllDistinct, Some(hllDistinctSql)),
    Q("approx_quantiles_band", approxQuantilesBand, Some(approxQuantilesBandSql)),
    Q("kmv_distinct", kmvDistinct, Some(kmvDistinctSql)),
    Q("kmv_distinct_agg", kmvDistinctAgg, Some(kmvDistinctAggSql)),
    Q("kmv_set_ops", kmvSetOps, Some(kmvSetOpsSql)),
    Q("cms_heavy_hitters", cmsHeavyHitters, Some(cmsHeavyHittersSql)),
    Q("ols_by_type", olsByType, Some(olsByTypeSql)),
    Q("equidepth_histogram", equidepthHistogram, Some(equidepthHistogramSql)),
    Q("spearman_corr", spearmanCorr, Some(spearmanCorrSql)),
    Q("ab_test_zscore", abTestZscore, Some(
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 95
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |  FROM events GROUP BY 1
        |), armed AS (
        |  SELECT converted,
        |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) % 2 AS arm
        |  FROM pu
        |), agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b
        |  FROM armed
        |), rates AS (
        |  SELECT n_a, x_a, n_b, x_b,
        |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        |    CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p_pool
        |  FROM agg
        |)
        |SELECT n_a, x_a, n_b, x_b, rate_a, rate_b,
        |  CASE WHEN p_pool > 0 AND p_pool < 1 THEN
        |    (rate_a - rate_b) /
        |      SQRT(p_pool * (1.0 - p_pool) *
        |           (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |  END AS z
        |FROM rates""".stripMargin)),
    Q("gini_concentration", giniConcentration, Some(
      """WITH ps AS (
        |  SELECT l_suppkey,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM lineitem GROUP BY 1
        |), r AS (
        |  SELECT s_nationkey, cents,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY s_nationkey
        |                                 ORDER BY cents, l_suppkey) AS BIGINT) AS rk
        |  FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |), a AS (
        |  SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |         CAST(SUM(cents) AS BIGINT) AS tot_cents,
        |         CAST(SUM(rk * cents) AS BIGINT) AS rc
        |  FROM r GROUP BY 1
        |)
        |SELECT s_nationkey, n_suppliers, tot_cents,
        |  CAST(2 * rc - (n_suppliers + 1) * tot_cents AS DOUBLE)
        |    / CAST(n_suppliers * tot_cents AS DOUBLE) AS gini
        |FROM a ORDER BY s_nationkey""".stripMargin)),
    Q("key_skew_report", keySkewReport, Some(
      """WITH f AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM lineitem GROUP BY 1
        |), a AS (
        |  SELECT CAST(SUM(freq) AS BIGINT) AS n_rows,
        |         CAST(COUNT(*) AS BIGINT) AS n_keys,
        |         CAST(MAX(freq) AS BIGINT) AS max_freq
        |  FROM f
        |), h AS (
        |  SELECT l_partkey AS hot_key FROM f
        |  ORDER BY freq DESC, l_partkey LIMIT 1
        |)
        |SELECT n_rows, n_keys, max_freq, hot_key,
        |  CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS avg_freq,
        |  CAST(max_freq * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE) AS skew_ratio
        |FROM a CROSS JOIN h""".stripMargin)),
    Q("train_val_split", trainValSplit, Some(
      """SELECT lang,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 <= 7
        |       THEN 'train'
        |       WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 8
        |       THEN 'val' ELSE 'test' END AS split,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)),
    Q("stratified_sample", stratifiedSample, Some(
      """SELECT lang, rk, doc_id, h FROM (
        |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        |  FROM documents)
        |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin)),
    Q("histogram_buckets", histogram, Some(
      // DuckDB has no width_bucket; the explicit formula is bit-identical:
      // bucket width (200-0)/20 = 10.0 exactly, i = floor(v/10)+1, clamped
      """SELECT event_type,
        |  CAST(CASE WHEN value < 0.0 THEN 0
        |            WHEN value >= 200.0 THEN 21
        |            ELSE CAST(FLOOR(value / 10.0) AS BIGINT) + 1 END AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("corr_manual", corrManual, Some(
      s"""WITH q AS (
        |  SELECT event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS x,
        |    CAST(ROUND(TRY_CAST(CASE WHEN json_valid(props)
        |      THEN json_extract_string(props, '$$.k') END AS DOUBLE) * 100)
        |      AS BIGINT) AS y
        |  FROM events
        |), qf AS (
        |  SELECT * FROM q WHERE y IS NOT NULL
        |), m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM qf GROUP BY event_type
        |)
        |SELECT event_type, n,
        |  CAST(CAST(${dmul("n", "sxy")} - ${dmul("sx", "sy")} AS STRING) AS DOUBLE)
        |    / (sqrt(CAST(CAST(${dmul("n", "sxx")} - ${dmul("sx", "sx")} AS STRING) AS DOUBLE))
        |       * sqrt(CAST(CAST(${dmul("n", "syy")} - ${dmul("sy", "sy")} AS STRING) AS DOUBLE)))
        |    AS corr_xy
        |FROM m ORDER BY event_type""".stripMargin)),
    Q("levenshtein_pairs", levenshteinPairs, Some(levenshteinPairsSql)),
    Q("collect_sorted", collectSorted, Some(
      """SELECT user_id,
        |  array_to_string(list_sort(list(event_type)), '|') AS types,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events WHERE user_id < 10
        |GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
