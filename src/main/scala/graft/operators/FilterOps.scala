package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-filtering operators for a training-data pipeline (north star; no
  * reference analog — SURVEY.md §2.7): within-document repetition signals,
  * a Gopher-style rule filter, cross-document boilerplate detection, PII
  * pattern scrubbing, and source-mixture weighting. These are the quality
  * gates a 100 TB corpus passes through BEFORE dedup/training — published
  * heuristics (length, word-length, stopword, repetition thresholds in the
  * Gopher/C4 line of work), re-expressed as declarative Spark plans.
  *
  * Scale posture: every query is per-row projection + explode →
  * hash-aggregate (map-side partial) or a broadcast join against a
  * high-frequency set that is SMALL by construction (boilerplate = shingles
  * above a document-frequency floor; frequency tables shrink as thresholds
  * rise). No all-pairs shapes, no driver-side state.
  */
object FilterOps extends QueryModule {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  private val enStop = Seq("the", "a", "of", "and", "to")

  // ---- within-document repetition (Gopher repetition signals) -------------

  /** Per-document repetition metrics: duplicate-token fraction, duplicate-
    * bigram fraction, and the single most frequent bigram's share — the
    * classic "repetitive generation / boilerplate" drop signals. Docs with
    * <2 tokens have no bigram and are excluded in both engines.
    */
  private def repetitionScore(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .repartition(col("doc_id")) // single-file scan → parallelize the explode
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
    // bigram stats WITHIN the row: sort the per-doc bigram array and walk
    // runs with an aggregate HOF — the distinct count and the longest run
    // (= max per-bigram count) fall out of one pass, so the whole metric is
    // a projection: no explode fan-out, no groupBy shuffles, no join. The
    // null-seeded prev handles "" tokens (hostile corpus) that a sentinel
    // string would collide with.
    val bgs = sort_array(transform(
      sequence(lit(1), size(col("toks")) - 1),
      i => concat_ws(" ",
        element_at(col("toks"), i), element_at(col("toks"), i + 1))))
    val runStats = aggregate(
      bgs,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("ndist")),
      (acc, x) => {
        val same = acc.getField("prev") === x
        val newRun = when(same, acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), newRun.as("run"),
          greatest(acc.getField("best"), newRun).as("best"),
          (acc.getField("ndist") + when(same, lit(0L)).otherwise(lit(1L)))
            .as("ndist"))
      })
    base
      .withColumn("rs", runStats)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        (size(col("toks")) - 1).cast("long").as("n_bigrams"),
        col("rs.ndist").as("n_distinct_bigrams"),
        col("rs.best").as("top_bigram"))
      .select(
        col("doc_id"), col("n_tokens"),
        ((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"))
          .as("frac_dup_tokens"),
        ((col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams"))
          .as("frac_dup_bigrams"),
        (col("top_bigram").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
      .withColumn("flagged",
        (col("frac_dup_tokens") > 0.6 || col("top_bigram_frac") > 0.18)
          .cast("long"))
      .orderBy(col("doc_id"))
  }

  private def repetitionScoreSql: String =
    """WITH base AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2
      |), tok AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
      |  FROM base
      |), bg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |         i -> toks[i] || ' ' || toks[i+1])) AS bg
      |  FROM base
      |), bgc AS (
      |  SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2
      |), bga AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |         CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
      |         CAST(MAX(c) AS BIGINT) AS top_bigram
      |  FROM bgc GROUP BY 1
      |)
      |SELECT t.doc_id, t.n_tokens,
      |  CAST(t.n_tokens - t.n_distinct AS DOUBLE) / t.n_tokens AS frac_dup_tokens,
      |  CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams
      |    AS frac_dup_bigrams,
      |  CAST(b.top_bigram AS DOUBLE) / b.n_bigrams AS top_bigram_frac,
      |  CAST(CASE WHEN CAST(t.n_tokens - t.n_distinct AS DOUBLE) / t.n_tokens > 0.6
      |            OR CAST(b.top_bigram AS DOUBLE) / b.n_bigrams > 0.18
      |       THEN 1 ELSE 0 END AS BIGINT) AS flagged
      |FROM tok t JOIN bga b USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  // ---- Gopher-style rule filter -------------------------------------------

  /** Rule-based keep/drop filter: token count in [20, 100000], mean token
    * length in [2, 12], ≥2 stopword hits, ≥80% alphabetic tokens. Flags are
    * 0/1 longs so the row hashes identically across engines.
    */
  private def gopherQualityFilter(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("mean_tok_len",
        (col("n_chars") - (col("n_tokens") - 1)) / col("n_tokens").cast("double"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin(enStop.map(lit(_)): _*))).cast("long"))
      .withColumn("n_alpha_tok",
        size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("ok_len", col("n_tokens").between(20L, 100000L).cast("long"))
      .withColumn("ok_word_len", col("mean_tok_len").between(2.0, 12.0).cast("long"))
      .withColumn("ok_stop", (col("n_stop") >= 2L).cast("long"))
      .withColumn("ok_alpha",
        (col("n_alpha_tok").cast("double") >= col("n_tokens") * 0.8).cast("long"))
      .withColumn("keep",
        (col("ok_len") + col("ok_word_len") + col("ok_stop") + col("ok_alpha") === 4L)
          .cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("mean_tok_len"), col("n_stop"),
        col("ok_len"), col("ok_word_len"), col("ok_stop"), col("ok_alpha"), col("keep"))
      .orderBy(col("doc_id"))

  private def gopherQualityFilterSql: String = {
    val stopList = enStop.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents
       |), st AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    (n_chars - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE) AS mean_tok_len,
       |    CAST(len(list_filter(toks, t -> t IN ($stopList))) AS BIGINT) AS n_stop,
       |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS BIGINT)
       |      AS n_alpha_tok
       |  FROM m
       |), flags AS (
       |  SELECT doc_id, n_tokens, mean_tok_len, n_stop,
       |    CAST(CASE WHEN n_tokens BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS BIGINT)
       |      AS ok_len,
       |    CAST(CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END AS BIGINT)
       |      AS ok_word_len,
       |    CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS ok_stop,
       |    CAST(CASE WHEN CAST(n_alpha_tok AS DOUBLE) >= n_tokens * 0.8
       |         THEN 1 ELSE 0 END AS BIGINT) AS ok_alpha
       |  FROM st
       |)
       |SELECT doc_id, n_tokens, mean_tok_len, n_stop,
       |  ok_len, ok_word_len, ok_stop, ok_alpha,
       |  CAST(CASE WHEN ok_len + ok_word_len + ok_stop + ok_alpha = 4
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM flags ORDER BY doc_id""".stripMargin
  }

  // ---- cross-document boilerplate -----------------------------------------

  /** Boilerplate detection: shingles whose document frequency is ≥ 5 are
    * "boilerplate" (headers, footers, templates); each doc reports what
    * fraction of its shingles is boilerplate. The boilerplate set is small by
    * construction (high-df survivors only) → broadcast; the corpus side is
    * one explode + broadcast left join + per-doc aggregate, same 100 TB shape
    * as contamination_check.
    */
  private def boilerplateShingles(s: SparkSession, dir: String): DataFrame = {
    val sh = DedupOps.shingles(s, dir).cache()
    val boiler = sh.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 5L)
      .select(col("sh")).withColumn("hit", lit(1L))
    sh.join(broadcast(boiler), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  private def boilerplateShinglesSql: String =
    s"""WITH sh AS (${DedupOps.shinglesSql}),
       |boiler AS (
       |  SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1)
       |  WHERE df >= 5
       |)
       |SELECT s.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS boiler_frac
       |FROM sh s LEFT JOIN boiler b ON s.sh = b.sh
       |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  // ---- PII pattern scrubbing ----------------------------------------------

  private val EmailRe = "[a-zA-Z0-9#._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** PII scrubbing: count and mask email/phone patterns. The synthetic corpus
    * carries no natural PII, so the input is a deterministic per-customer
    * contact line derived from the customer table — the REGEXP machinery
    * (count + global replace, identical Java/RE2 pattern subset) is the
    * operator under test, and the oracle replays both the derivation and the
    * scrub. Purely per-row projection: trivially parallel at any scale.
    */
  private def piiScrub(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "customer")
      .withColumn("profile",
        concat(
          col("c_name"), lit(" <"), lower(col("c_name")),
          lit("@example.com> call 555-"),
          lpad((col("c_custkey") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("c_custkey") * 7 % 10000).cast("string"), 4, "0")))
      .select(
        col("c_custkey"),
        regexp_count(col("profile"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("profile"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(col("profile"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("scrubbed"))
      .orderBy(col("c_custkey"))

  private def piiScrubSql: String = {
    // single-quoted SQL strings keep backslashes literal -> same pattern text
    val email = EmailRe
    val phone = PhoneRe
    s"""WITH p AS (
       |  SELECT c_custkey,
       |    c_name || ' <' || lower(c_name) || '@example.com> call 555-'
       |      || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
       |      || lpad(CAST(c_custkey * 7 % 10000 AS VARCHAR), 4, '0') AS profile
       |  FROM customer
       |)
       |SELECT c_custkey,
       |  CAST(len(regexp_extract_all(profile, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(profile, '$phone')) AS BIGINT) AS n_phones,
       |  regexp_replace(regexp_replace(profile, '$email', '<EMAIL>', 'g'),
       |                 '$phone', '<PHONE>', 'g') AS scrubbed
       |FROM p ORDER BY c_custkey""".stripMargin
  }

  // ---- source mixture weighting -------------------------------------------

  /** Per-source inverse-frequency mixture weights: the "data mixing" step
    * that rebalances a multi-source corpus toward a uniform source mixture.
    * weight = total / (n_sources · n_docs) — exact integer ratios, one final
    * IEEE division. Two tiny aggregates + a broadcast of a sources-sized row.
    */
  private def sourceMixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val perSource = docs(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = perSource
      .agg(sum(col("n_docs")).as("total"), count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .select(
        col("source"), col("n_docs"),
        (col("total").cast("double") / (col("n_sources") * col("n_docs")))
          .as("weight"))
      .orderBy(col("source"))
  }

  private def sourceMixtureWeightsSql: String =
    """WITH per_source AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source
      |), totals AS (
      |  SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
      |         CAST(COUNT(*) AS BIGINT) AS n_sources
      |  FROM per_source
      |)
      |SELECT source, n_docs,
      |  CAST(total AS DOUBLE) / (n_sources * n_docs) AS weight
      |FROM per_source CROSS JOIN totals
      |ORDER BY source""".stripMargin

  /** Temperature-scaled source mixing (T = 2): the data-mixing step that
    * UP-samples small sources and DOWN-samples dominant ones by drawing
    * per-source quotas ∝ √n_s (count^(1/T)) and filling each quota with the
    * md5-first documents of that source. All quota arithmetic is exact:
    * √n is IEEE-correctly-rounded (unlike ln/exp, sqrt is exact per
    * IEEE 754), floored to integer millis, and the quota is an integer
    * ratio — no engine-dependent float path. The per-source rank is a
    * partitioned window (bounded-heap shape at scale); quotas ride a
    * broadcast of a sources-sized table.
    */
  private def temperatureMixture(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = docs(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("s_milli",
        floor(sqrt(col("n_docs").cast("double")) * 1000).cast("long"))
    val tot = perSource.agg(sum(col("s_milli")).as("tot_milli"))
    val quotas = perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("(120 * s_milli) div tot_milli").as("quota"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), "source")
      .filter(col("rk") <= col("quota"))
      .select(col("source"), col("rk"), col("doc_id"), col("quota"))
      .orderBy(col("source"), col("rk"))
  }

  private val temperatureMixtureSql: String =
    """WITH per_source AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT)
      |      AS s_milli
      |  FROM documents GROUP BY source
      |), quotas AS (
      |  SELECT source, n_docs,
      |    (120 * s_milli) // (SELECT CAST(SUM(s_milli) AS BIGINT)
      |                        FROM per_source) AS quota
      |  FROM per_source
      |), ranked AS (
      |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      |  FROM documents
      |)
      |SELECT source, rk, doc_id, quota
      |FROM ranked JOIN quotas USING (source)
      |WHERE rk <= quota
      |ORDER BY source, rk""".stripMargin

  /** Quality-budgeted corpus selection (top-p by score): within each source,
    * rank documents by a deterministic quality score (alpha-token fraction,
    * in exact milli units) and select from the top until half the source's
    * tokens are spent — the data-selection step behind "train on the best
    * X% of the crawl" pipelines. A document is kept iff it STARTS before the
    * budget boundary, so the output is a deterministic prefix of the ranked
    * order.
    *
    * Scale posture: the per-source running token sum rides
    * [[PrefixOps.withGlobalPrefix]] with `source` as the group key — two-
    * level prefix sum, no per-source single-reducer window even when one
    * source holds billions of documents (the shape the plain
    * `Window.partitionBy(source).orderBy(score)` would degrade to).
    */
  private def corpusToppSelect(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        round(lit(1000.0) * regexp_count(col("text"), lit("[a-z]+"))
          / size(split(col("text"), " "))).cast("long").as("score_milli"))
    PrefixOps.withGlobalPrefix(scored,
        bucketBy = -col("score_milli"),
        order = Seq(col("score_milli").desc, col("doc_id")),
        groupKeys = Seq("source"),
        sums = Seq("n_tokens"))
      .select(col("source"), col("doc_id"), col("score_milli"),
        col("g_rank").as("rk"), col("g_run_n_tokens").as("run_tokens"),
        when(col("g_run_n_tokens") - col("n_tokens")
          < expr("g_tot_n_tokens div 2"), 1L).otherwise(0L).as("selected"))
      .orderBy(col("source"), col("rk"))
  }

  private def corpusToppSelectSql: String =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(ROUND(1000.0 * len(regexp_extract_all(text, '[a-z]+'))
      |         / len(string_split(text, ' '))) AS BIGINT) AS score_milli
      |  FROM documents
      |), ranked AS (
      |  SELECT source, doc_id, score_milli, n_tokens,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
      |    CAST(SUM(n_tokens) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS run_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS tot
      |  FROM scored
      |  WINDOW w AS (PARTITION BY source ORDER BY score_milli DESC, doc_id)
      |)
      |SELECT source, doc_id, score_milli, rk, run_tokens,
      |  CAST(CASE WHEN run_tokens - n_tokens < tot // 2 THEN 1 ELSE 0 END
      |       AS BIGINT) AS selected
      |FROM ranked ORDER BY source, rk""".stripMargin

  /** K-anonymity audit over quasi-identifiers — the governance check a
    * training-data release runs before publishing user-derived tables: for
    * the QI tuple (mktsegment, nationkey), the size distribution of
    * equivalence classes, how many classes fall under k=5, and how many
    * ROWS sit in those under-k classes (the re-identification exposure).
    * One hash aggregate over the QI tuple + a bounded rollup; the
    * equivalence-class table is ≤ |QI-domain| however large the input.
    */
  /** Differentially-private noisy counts (ε = 1, Laplace mechanism) over
    * per-type event counts — the release primitive behind every DP
    * analytics surface, next to [[kAnonymityReport]]/[[lDiversityReport]]
    * in the privacy family. The Laplace draw is SEEDED, not sampled:
    * u ∈ (0,1) comes from an md5-derived micro-uniform per key, and the
    * inverse CDF −b·sign(u−½)·ln(1−2|u−½|) is evaluated with the argument
    * kept as an EXACT integer numerator (num = 1e6 − |2·u_micro + 1 − 1e6|,
    * an odd positive integer, so ln never sees 0) and the ln milli-
    * quantized — both engines produce bit-identical noise, which is what
    * makes a DP release auditable across engines. Determinism is a feature
    * here: same release twice = no extra privacy budget spent.
    *
    * Scale posture: one partial-aggregated count per type; noise is O(1)
    * arithmetic on the aggregate row.
    */
  private def dpNoisyCounts(s: SparkSession, dir: String): DataFrame = {
    // NULL type dropped in BOTH engines: DuckDB's concat() skips NULLs, so
    // '0x' || md5(NULL) ABORTS the cast while Spark's concat yields NULL —
    // the q21-class divergence; a NULL release key is meaningless anyway
    val counts = Tables.t(s, dir, "events")
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    counts
      .withColumn("u_micro",
        pmod(conv(substring(md5(concat(lit("dp:"), col("event_type"))), 1, 15),
          16, 10).cast("long"), lit(1000000L)))
      .withColumn("num",
        lit(1000000L) - abs(lit(2L) * col("u_micro") + 1L - 1000000L))
      .withColumn("sgn",
        when(lit(2L) * col("u_micro") + 1L > 1000000L, 1L).otherwise(-1L))
      .withColumn("ln_milli",
        round(round(log(col("num") / lit(1000000.0)), 3) * 1000).cast("long"))
      .withColumn("noise_milli", col("sgn") * -col("ln_milli"))
      .withColumn("noisy_milli", col("n") * 1000L + col("noise_milli"))
      .select(col("event_type"), col("n"), col("noise_milli"),
        col("noisy_milli"))
      .orderBy(col("event_type"))
  }

  private val dpNoisyCountsSql: String =
    """WITH counts AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1
      |), seeded AS (
      |  SELECT event_type, n,
      |    CAST(concat('0x', substr(md5('dp:' || event_type), 1, 15))
      |         AS BIGINT) % 1000000 AS u_micro
      |  FROM counts
      |), noise AS (
      |  SELECT event_type, n,
      |    1000000 - abs(2 * u_micro + 1 - 1000000) AS num,
      |    CASE WHEN 2 * u_micro + 1 > 1000000 THEN 1 ELSE -1 END AS sgn
      |  FROM seeded
      |)
      |SELECT event_type, n,
      |  CAST(sgn * -CAST(ROUND(ROUND(ln(num / 1000000.0), 3) * 1000)
      |              AS BIGINT) AS BIGINT) AS noise_milli,
      |  CAST(n * 1000 + sgn * -CAST(ROUND(ROUND(ln(num / 1000000.0), 3)
      |              * 1000) AS BIGINT) AS BIGINT) AS noisy_milli
      |FROM noise ORDER BY event_type""".stripMargin

  private def kAnonymityReport(s: SparkSession, dir: String): DataFrame = {
    val classes = Tables.t(s, dir, "customer")
      .groupBy(col("c_mktsegment").as("qi_segment"),
        col("c_nationkey").as("qi_nation"))
      .agg(count(lit(1)).cast("long").as("class_size"))
    classes.agg(
      count(lit(1)).cast("long").as("n_classes"),
      sum(col("class_size")).cast("long").as("n_rows"),
      min(col("class_size")).cast("long").as("min_class_size"),
      sum(when(col("class_size") < 5, 1L).otherwise(0L)).cast("long")
        .as("classes_under_k"),
      sum(when(col("class_size") < 5, col("class_size")).otherwise(0L))
        .cast("long").as("rows_at_risk"))
      .withColumn("k", lit(5L))
      .select(col("k"), col("n_classes"), col("n_rows"),
        col("min_class_size"), col("classes_under_k"), col("rows_at_risk"))
  }

  private val kAnonymityReportSql: String =
    """WITH classes AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(COUNT(*) AS BIGINT) AS class_size
      |  FROM customer GROUP BY 1, 2
      |)
      |SELECT CAST(5 AS BIGINT) AS k,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(class_size) AS BIGINT) AS n_rows,
      |  CAST(MIN(class_size) AS BIGINT) AS min_class_size,
      |  CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS classes_under_k,
      |  CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
      |       AS BIGINT) AS rows_at_risk
      |FROM classes""".stripMargin

  /** L-diversity audit — the companion check to [[kAnonymityReport]]:
    * k-anonymity bounds how many people share a quasi-identifier tuple,
    * but a class where everyone shares the same SENSITIVE value still
    * leaks it (the homogeneity attack). Over the same QI tuple
    * (mktsegment, nationkey) with account-balance band as the sensitive
    * attribute, reports the distribution of l = distinct sensitive values
    * per equivalence class: classes and rows at each l, flagging l = 1.
    * Two hash aggregates; the histogram domain is bounded by the band
    * count, the class table by |QI-domain|.
    */
  private def lDiversityReport(s: SparkSession, dir: String): DataFrame = {
    val classes = Tables.t(s, dir, "customer")
      .groupBy(col("c_mktsegment").as("qi_segment"),
        col("c_nationkey").as("qi_nation"))
      .agg(count(lit(1)).cast("long").as("class_size"),
        countDistinct(floor(col("c_acctbal") / 1000).cast("long"))
          .cast("long").as("l"))
    classes.groupBy(col("l"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("class_size")).cast("long").as("n_rows"),
        min(col("class_size")).cast("long").as("min_class_size"))
      .withColumn("homogeneous", col("l") === 1L)
      .orderBy(col("l"))
  }

  private val lDiversityReportSql: String =
    """WITH classes AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(COUNT(*) AS BIGINT) AS class_size,
      |    CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT))
      |         AS BIGINT) AS l
      |  FROM customer GROUP BY 1, 2
      |)
      |SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(class_size) AS BIGINT) AS n_rows,
      |  CAST(MIN(class_size) AS BIGINT) AS min_class_size,
      |  l = 1 AS homogeneous
      |FROM classes GROUP BY l ORDER BY l""".stripMargin

  /** T-closeness audit — third of the privacy trio: l-diversity counts
    * DISTINCT sensitive values per class, but a class whose value
    * distribution is merely skewed toward one band still leaks (the
    * skewness attack). Per QI class (mktsegment, nationkey), the ordered
    * earth-mover's distance between the class's sensitive-band
    * distribution and the global one: EMD = Σ_j |Σ_{i≤j}(p_i − q_i)| /
    * (m−1) over the m global bands, evaluated exactly in units of
    * class_size·N on a DECIMAL(38,0) carrier (cnt_i·N reaches N² — past
    * BIGINT at ~3e9 rows) with one integral division to milli. Rows with
    * NULL balance are excluded on both engines (DuckDB and Spark disagree
    * on NULL ordering inside the running sum, and a NULL band has no
    * position on the ordered grid).
    *
    * Scale posture: two hash aggregates over the table; the grid densify
    * is |classes| × |bands| (both bounded by attribute domains) via a
    * broadcast; running sums are windows PARTITIONED by class (≤ m rows
    * each); the 1-row (N, m) aggregate is a broadcast cross join.
    */
  private def tClosenessReport(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cust = Tables.t(s, dir, "customer")
      .filter(col("c_acctbal").isNotNull)
      .select(col("c_mktsegment").as("qi_segment"),
        col("c_nationkey").as("qi_nation"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val globalBands = cust.groupBy(col("band"))
      .agg(count(lit(1)).cast("long").as("g_cnt"))
    val tot = globalBands.agg(sum(col("g_cnt")).cast("long").as("n_total"),
      count(lit(1)).cast("long").as("m_bands"))
    val classes = cust.groupBy(col("qi_segment"), col("qi_nation"))
      .agg(count(lit(1)).cast("long").as("class_size"))
    val cells = cust.groupBy(col("qi_segment"), col("qi_nation"), col("band"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val grid = classes.join(broadcast(globalBands))
      .join(cells, Seq("qi_segment", "qi_nation", "band"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("diff",
        col("cnt").cast(dec) * col("n_total") -
          col("g_cnt").cast(dec) * col("class_size"))
    val w = Window.partitionBy(col("qi_segment"), col("qi_nation"))
      .orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("run", sum(col("diff")).over(w))
      .groupBy(col("qi_segment"), col("qi_nation"))
      .agg(max(col("class_size")).as("class_size"),
        sum(abs(col("run"))).as("t_num"),
        max(col("n_total")).as("n_total"), max(col("m_bands")).as("m_bands"))
      .select(col("qi_segment"), col("qi_nation"), col("class_size"),
        when(col("m_bands") > 1,
          expr("""(t_num * 1000) div
                  (CAST(class_size AS DECIMAL(38,0)) * n_total * (m_bands - 1))"""))
          .as("t_milli"))
      .withColumn("over_t", col("t_milli") > 200L)
      .orderBy(col("qi_segment"), col("qi_nation"))
  }

  private val tClosenessReportSql: String =
    """WITH cust AS (
      |  SELECT c_mktsegment AS qi_segment, c_nationkey AS qi_nation,
      |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
      |  FROM customer WHERE c_acctbal IS NOT NULL
      |), gb AS (
      |  SELECT band, CAST(COUNT(*) AS BIGINT) AS g_cnt FROM cust GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(g_cnt) AS BIGINT) AS n_total,
      |    CAST(COUNT(*) AS BIGINT) AS m_bands FROM gb
      |), classes AS (
      |  SELECT qi_segment, qi_nation, CAST(COUNT(*) AS BIGINT) AS class_size
      |  FROM cust GROUP BY 1, 2
      |), cells AS (
      |  SELECT qi_segment, qi_nation, band, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM cust GROUP BY 1, 2, 3
      |), grid AS (
      |  SELECT cl.qi_segment, cl.qi_nation, cl.class_size, g.band, g.g_cnt,
      |    COALESCE(ce.cnt, 0) AS cnt
      |  FROM classes cl CROSS JOIN gb g
      |  LEFT JOIN cells ce ON ce.qi_segment = cl.qi_segment
      |    AND ce.qi_nation = cl.qi_nation AND ce.band = g.band
      |), runs AS (
      |  SELECT qi_segment, qi_nation, class_size,
      |    SUM(CAST(cnt AS HUGEINT) * tot.n_total -
      |        CAST(g_cnt AS HUGEINT) * class_size)
      |      OVER (PARTITION BY qi_segment, qi_nation ORDER BY band
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
      |    tot.n_total, tot.m_bands
      |  FROM grid CROSS JOIN tot
      |)
      |SELECT qi_segment, qi_nation, class_size,
      |  CAST(CASE WHEN m_bands > 1 THEN
      |    (SUM(ABS(run)) * 1000) //
      |    (CAST(class_size AS HUGEINT) * n_total * (m_bands - 1))
      |  END AS BIGINT) AS t_milli,
      |  CAST(CASE WHEN m_bands > 1 THEN
      |    (SUM(ABS(run)) * 1000) //
      |    (CAST(class_size AS HUGEINT) * n_total * (m_bands - 1))
      |  END AS BIGINT) > 200 AS over_t
      |FROM runs
      |GROUP BY qi_segment, qi_nation, class_size, n_total, m_bands
      |ORDER BY qi_segment, qi_nation""".stripMargin

  // ---- curriculum phases --------------------------------------------------

  /** Curriculum-learning phase assignment: corpus docs ranked by composite
    * quality (worst → best) and cut into 4 equal-rank phases — the
    * easy-to-hard training schedule. The global rank rides
    * [[PrefixOps.withGlobalPrefix]] (two-level prefix sum, no
    * single-reducer window); the phase is pure rank arithmetic and the
    * report is one hash aggregate. Mean quality is exact: 1e-9-quantized
    * scores summed on a DECIMAL carrier.
    */
  private def curriculumPhases(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = TextOps.qualityScore(s, dir)
      .withColumn("qq", round(col("quality") * 1e9).cast("long"))
    val ranked = PrefixOps.withGlobalPrefix(q,
      bucketBy = col("qq"), order = Seq(col("qq"), col("doc_id")))
    ranked
      .withColumn("phase", expr("((g_rank - 1) * 4) div g_n + 1"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("qq").cast(dec)).cast("double") / count(lit(1)) / 1e9)
          .as("mean_quality"))
      .orderBy(col("phase"))
  }

  private def curriculumPhasesSql: String =
    s"""WITH scored AS (
       |${TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")}
       |), ranked AS (
       |  SELECT n_tokens,
       |         CAST(ROUND(quality * 1e9) AS BIGINT) AS qq,
       |         ROW_NUMBER() OVER (ORDER BY CAST(ROUND(quality * 1e9) AS BIGINT),
       |                            doc_id) AS rk,
       |         COUNT(*) OVER () AS n
       |  FROM scored
       |)
       |SELECT ((rk - 1) * 4) // n + 1 AS phase,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |       CAST(SUM(qq) AS DOUBLE) / COUNT(*) / 1e9 AS mean_quality
       |FROM ranked GROUP BY 1 ORDER BY phase""".stripMargin

  // ---- epoch planning -----------------------------------------------------

  /** Epoch plan for a fixed training-token budget split uniformly across
    * sources (the data-recipe table in every LLM report: how many full
    * epochs of each source, plus the fractional remainder, to hit its
    * share). One per-source token aggregate; the plan is pure integer
    * arithmetic on that ≤|sources|-row table — up-sampling factors
    * (epochs > 1) for small sources and down-sampling (0 full epochs,
    * fractional take) for large ones fall out of the same division.
    */
  private val EPOCH_BUDGET = 2000000L

  private def epochPlan(s: SparkSession, dir: String): DataFrame = {
    val perSource = docs(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val nSources = perSource.agg(count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(nSources))
      .withColumn("target_tokens", expr(s"$EPOCH_BUDGET div n_sources"))
      .withColumn("full_epochs", expr("target_tokens div n_tokens"))
      .withColumn("frac_epoch_milli",
        expr("((target_tokens % n_tokens) * 1000) div n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("full_epochs"), col("frac_epoch_milli"))
      .orderBy(col("source"))
  }

  private def epochPlanSql: String =
    s"""WITH per_source AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source
       |), ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM per_source)
       |SELECT source, n_docs, n_tokens,
       |       $EPOCH_BUDGET // n_sources AS target_tokens,
       |       ($EPOCH_BUDGET // n_sources) // n_tokens AS full_epochs,
       |       ((($EPOCH_BUDGET // n_sources) % n_tokens) * 1000) // n_tokens
       |         AS frac_epoch_milli
       |FROM per_source CROSS JOIN ns
       |ORDER BY source""".stripMargin

  /** Water-filling token-budget allocator — the fair-share complement of
    * [[epochPlan]]: given a total token budget (a third of the corpus
    * here), every source receives min(available, L) where the water level
    * L is the largest value whose total allocation fits the budget. Small
    * sources are fully funded; large ones are capped at a COMMON level, so
    * no source starves and no source dominates — the allocation rule
    * behind balanced data recipes. Pure integer arithmetic on the
    * ≤|sources|-row aggregate: ascending prefix sums locate the binding
    * segment (the largest K whose K smallest sources fit fully when
    * everyone else sits at source K's size), then one integer division
    * sets the level. The windows run over the per-source aggregate — never
    * the corpus — and the binding (K, prefix) pair broadcasts back as one
    * row.
    */
  private def tokenBudgetWaterfill(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val perSource = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("avail"))
    val totals = perSource.agg(sum(col("avail")).as("total"))
    val ranked = perSource.crossJoin(broadcast(totals))
      .withColumn("budget", expr("total div 3"))
      .withColumn("rn", row_number().over(
        W.orderBy(col("avail"), col("source"))).cast("long"))
      .withColumn("m", count(lit(1)).over(W.partitionBy()).cast("long"))
      .withColumn("prefix_incl",
        sum(col("avail")).over(W.orderBy(col("avail"), col("source"))
          .rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("feasible",
        // all smaller sources fully funded + everyone from here up at THIS
        // source's size still fits => this source is fully funded too
        col("prefix_incl") - col("avail")
          + (col("m") - col("rn") + 1) * col("avail") <= col("budget"))
      .cache()
    val binding = ranked.agg(
      max(when(col("feasible"), col("rn"))).as("k"),
      max(when(col("feasible"), col("prefix_incl"))).as("prefix_k"),
      max(col("budget")).as("b"), max(col("m")).as("mm"))
      .select(col("k"), col("prefix_k"),
        when(col("k").isNull, lit(0L)).otherwise(col("k")).as("k0"),
        when(col("prefix_k").isNull, lit(0L)).otherwise(col("prefix_k")).as("p0"),
        col("b"), col("mm"))
      .withColumn("level",
        when(col("k0") === col("mm"), Long.MaxValue)
          .otherwise(expr("(b - p0) div (mm - k0)")))
      .select(col("k0"), col("level"))
    ranked.crossJoin(broadcast(binding))
      .select(col("source"), col("avail").as("available"),
        when(col("rn") <= col("k0"), col("avail"))
          .otherwise(least(col("avail"), col("level"))).as("allocated"),
        (col("rn") <= col("k0")).as("fully_funded"))
      .orderBy(col("source"))
  }

  private def tokenBudgetWaterfillSql: String =
    """WITH per_source AS (
      |  SELECT source,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(SUM(avail) AS BIGINT) AS total,
      |         CAST(SUM(avail) AS BIGINT) // 3 AS budget,
      |         CAST(COUNT(*) AS BIGINT) AS m
      |  FROM per_source
      |), ranked AS (
      |  SELECT source, avail, budget, m,
      |    CAST(ROW_NUMBER() OVER (ORDER BY avail, source) AS BIGINT) AS rn,
      |    SUM(avail) OVER (ORDER BY avail, source
      |                     ROWS UNBOUNDED PRECEDING) AS prefix_incl
      |  FROM per_source CROSS JOIN tot
      |), flags AS (
      |  SELECT *,
      |    prefix_incl - avail + (m - rn + 1) * avail <= budget AS feasible
      |  FROM ranked
      |), bind AS (
      |  SELECT COALESCE(MAX(CASE WHEN feasible THEN rn END), 0) AS k0,
      |    COALESCE(MAX(CASE WHEN feasible THEN prefix_incl END), 0) AS p0,
      |    MAX(budget) AS b, MAX(m) AS mm
      |  FROM flags
      |), lvl AS (
      |  SELECT k0,
      |    CASE WHEN k0 = mm THEN 9223372036854775807
      |         ELSE (b - p0) // (mm - k0) END AS level
      |  FROM bind
      |)
      |SELECT source, avail AS available,
      |  -- CAST: `level` inherits HUGEINT from the prefix_incl window-SUM
      |  -- (via p0), and pandas renders HUGEINT as float64 ("452.0") where
      |  -- the Spark side emits int64 ("452") — the r6-root-caused dtype
      |  -- class; the BIGINT cast makes the driver's digest byte-identical
      |  CAST(CASE WHEN rn <= k0 THEN avail
      |            ELSE LEAST(avail, level) END AS BIGINT) AS allocated,
      |  rn <= k0 AS fully_funded
      |FROM flags CROSS JOIN lvl
      |ORDER BY source""".stripMargin

  // ---- bloom-prefiltered benchmark decontamination ------------------------

  /** Clean-corpus selection by two-phase bloom decontamination: keep only
    * corpus documents (doc_id ≥ 10) sharing ZERO 3-token shingles with the
    * benchmark set (doc_id < 10).
    *
    * Phase 0 builds Spark's own bloom filter over the benchmark shingles
    * (`bloom_agg` — one map-side pass, associative partial merge, ~1.2
    * bytes/item at 1% fpp) and ships the ~0.1 MB binary back as a literal.
    * Phase 1 probes every corpus shingle against it AT THE SCAN — no join,
    * no shuffle touches the fat side; only bloom positives survive. Phase 2
    * removes the bloom's false positives with an exact join, so the final
    * answer is exactly the anti-join semantics the oracle states — the
    * bloom parameters affect cost, never the result.
    *
    * vs `contamination_check` (broadcast exact set): at 100 TB the benchmark
    * side can be millions of long shingle strings — too fat to broadcast;
    * the bloom is size-bounded, and the verify join only sees the
    * already-pruned candidate slice. The one driver round-trip (the bloom
    * binary) is bounded by the filter size, never by data volume.
    */
  private def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.BloomFunctions.register(s)
    val sh = DedupOps.shingles(s, dir)
    val bench = sh.filter(col("doc_id") < 10).select(col("sh")).distinct()
    val bloom = bench
      .agg(call_function("bloom_agg", col("sh"), lit(100000L)).as("bf"))
      .head.getAs[Array[Byte]](0)
    val candidates = sh.filter(col("doc_id") >= 10)
      .filter(call_function("bloom_might_contain", lit(bloom), col("sh")))
    val confirmed = candidates
      .join(broadcast(bench), Seq("sh"))
      .select(col("doc_id")).distinct()
    docs(s, dir).filter(col("doc_id") >= 10)
      .join(confirmed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private def bloomDecontaminateSql: String =
    s"""WITH sh AS (
       |  ${DedupOps.shinglesSql.replace("\n", "\n  ")}
       |), bench AS (
       |  SELECT DISTINCT sh FROM sh WHERE doc_id < 10
       |), hits AS (
       |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.sh = b.sh
       |  WHERE s.doc_id >= 10
       |)
       |SELECT d.doc_id, d.source, d.n_chars FROM documents d
       |WHERE d.doc_id >= 10
       |  AND d.doc_id NOT IN (SELECT doc_id FROM hits)
       |ORDER BY d.doc_id""".stripMargin

  // ---- deterministic epoch shuffle ----------------------------------------

  /** Deterministic per-epoch global shuffle: every document gets a total
    * shuffle POSITION = its rank under a seeded md5-derived hash — the
    * reproducible "random order" a training run reads each epoch (same
    * seed → same order on any cluster, any partitioning; new epoch = new
    * seed string). The rank is computed with PrefixOps' two-level bucketed
    * prefix (the hash is its own bucket key — uniform by construction, so
    * buckets are balanced), NEVER an unpartitioned window: at 1e9 docs
    * this is 64 parallel sorts of ~1.6e7 rows plus a 64-row offsets
    * broadcast. `shard` = (pos−1) mod 8 is the round-robin file assignment
    * a writer would use (contiguous positions land on different shards, so
    * readers that consume shards in parallel still see a shuffled stream).
    */
  private def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    val hk = conv(substring(md5(concat(lit("ep1:"), col("doc_id"))), 1, 15),
      16, 10).cast("long")
    val ranked = graft.operators.PrefixOps.withGlobalPrefix(
      docs(s, dir).select(col("doc_id")).withColumn("hk", hk),
      col("hk"), Seq(col("hk"), col("doc_id")))
    ranked
      .select(col("doc_id"), col("g_rank").as("pos"),
        pmod(col("g_rank") - 1, lit(8L)).as("shard"))
      .orderBy(col("doc_id"))
  }

  private val epochShuffleSql =
    """WITH h AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5('ep1:' || doc_id), 1, 15)) AS BIGINT)
      |      AS hk
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS BIGINT) AS pos,
      |  CAST((ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1) % 8 AS BIGINT)
      |    AS shard
      |FROM h ORDER BY doc_id""".stripMargin

  // ---- train/val split leakage --------------------------------------------

  /** Split-leakage audit: after a train/val split (here the deterministic
    * doc_id%10 rule train_val_split uses), how many NEAR-DUPLICATE pairs
    * cross the boundary — i.e. how many val documents have a ≥0.5-Jaccard
    * twin in train? This is the eval-integrity number (a leaked val doc
    * measures memorization, not generalization). Ground truth is COMPLETE
    * for the threshold: any pair with Jaccard > 0 shares a 3-shingle, so
    * the shingle equi-join (the same blocked join every dedup query uses —
    * the all-pairs space never materializes) provably contains every
    * above-threshold pair. One output row: split sizes, cross-split dup
    * pairs, distinct leaked val docs, and the leak rate in millis.
    */
  private def splitLeakageReport(s: SparkSession, dir: String): DataFrame = {
    val sh = DedupOps.shingles(s, dir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc_id").as("a_id"), col("sh"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh")), "sh")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    val cross = inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n_sh", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n_sh", "nb"), "b_id")
      .filter(expr("(inter * 1000) div (na + nb - inter) >= 500"))
      // exactly one endpoint in val (doc_id % 10 >= 8)
      .filter((col("a_id") % 10 >= 8) =!= (col("b_id") % 10 >= 8))
      .select(col("a_id"), col("b_id"))
      .cache()
    val splits = docs(s, dir).agg(
      sum(when(col("doc_id") % 10 < 8, 1L).otherwise(0L)).as("n_train"),
      sum(when(col("doc_id") % 10 >= 8, 1L).otherwise(0L)).as("n_val"))
    val nCross = cross.agg(count(lit(1)).as("n_cross_pairs"))
    val leaked = cross.select(
        when(col("a_id") % 10 >= 8, col("a_id")).otherwise(col("b_id"))
          .as("val_id"))
      .distinct().agg(count(lit(1)).as("n_val_leaked"))
    splits.crossJoin(broadcast(nCross)).crossJoin(broadcast(leaked))
      .select(col("n_train"), col("n_val"), col("n_cross_pairs"),
        col("n_val_leaked"),
        // guarded like recall_milli: DuckDB errors on //0 where Spark's
        // div yields NULL, so an empty val split would diverge unguarded
        expr("CASE WHEN n_val > 0 THEN (n_val_leaked * 1000) div n_val END")
          .as("leak_milli"))
  }

  private def splitLeakageReportSql: String =
    s"""WITH sh AS (${DedupOps.shinglesSql}),
       |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |         CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), cross_dups AS (
       |  SELECT i.a_id, i.b_id
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.a_id
       |  JOIN sizes sb ON sb.doc_id = i.b_id
       |  WHERE (i.inter * 1000) // (sa.n_sh + sb.n_sh - i.inter) >= 500
       |    AND ((i.a_id % 10 >= 8) <> (i.b_id % 10 >= 8))
       |), m AS (
       |  SELECT
       |    (SELECT CAST(SUM(CASE WHEN doc_id % 10 < 8 THEN 1 ELSE 0 END)
       |            AS BIGINT) FROM documents) AS n_train,
       |    (SELECT CAST(SUM(CASE WHEN doc_id % 10 >= 8 THEN 1 ELSE 0 END)
       |            AS BIGINT) FROM documents) AS n_val,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cross_dups) AS n_cross_pairs,
       |    (SELECT CAST(COUNT(DISTINCT CASE WHEN a_id % 10 >= 8 THEN a_id
       |                                     ELSE b_id END) AS BIGINT)
       |     FROM cross_dups) AS n_val_leaked
       |)
       |SELECT n_train, n_val, n_cross_pairs, n_val_leaked,
       |  CAST(CASE WHEN n_val > 0 THEN (n_val_leaked * 1000) // n_val END
       |       AS BIGINT) AS leak_milli
       |FROM m""".stripMargin

  // ---- batch padding waste -------------------------------------------------

  /** Padding-waste report: how many pad tokens does fixed-size-32 batching
    * burn under (a) arrival order vs (b) length-bucketed order — the
    * measurement behind "dynamic batching saves X%" in every training-infra
    * writeup. Each strategy ranks the corpus scale-safely (PrefixOps
    * two-level prefix, no unpartitioned window), groups consecutive ranks
    * into batches of 32, and pays `rows_in_batch × batch_max − Σlen` pad
    * tokens per batch. Whitespace token counts — the catalog's standard
    * carrier (token_stats / token_budget_waterfill).
    */
  private def paddingWasteReport(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("len"))
    def strat(name: String, bucketBy: org.apache.spark.sql.Column,
        order: Seq[org.apache.spark.sql.Column]): DataFrame =
      graft.operators.PrefixOps.withGlobalPrefix(base, bucketBy, order)
        .withColumn("batch", expr("(g_rank - 1) div 32"))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("bn"), max(col("len")).as("bmax"),
          sum(col("len")).as("btok"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("btok")).as("total_tokens"),
          sum(col("bn") * col("bmax")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          expr("((padded_tokens - total_tokens) * 1000000) div padded_tokens")
            .as("waste_ppm"))
    strat("arrival", col("doc_id"), Seq(col("doc_id")))
      .unionAll(strat("length_bucketed", col("len"),
        Seq(col("len"), col("doc_id"))))
      .orderBy(col("strategy"))
  }

  private val paddingWasteReportSql =
    """WITH lens AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
      |  FROM documents
      |), ranked AS (
      |  SELECT 'arrival' AS strategy, len,
      |    ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
      |  FROM lens
      |  UNION ALL
      |  SELECT 'length_bucketed', len,
      |    ROW_NUMBER() OVER (ORDER BY len, doc_id) AS rk
      |  FROM lens
      |), batches AS (
      |  SELECT strategy, (rk - 1) // 32 AS batch,
      |    CAST(COUNT(*) AS BIGINT) AS bn,
      |    CAST(MAX(len) AS BIGINT) AS bmax,
      |    CAST(SUM(len) AS BIGINT) AS btok
      |  FROM ranked GROUP BY 1, 2
      |)
      |SELECT strategy,
      |  CAST(COUNT(*) AS BIGINT) AS n_batches,
      |  CAST(SUM(btok) AS BIGINT) AS total_tokens,
      |  CAST(SUM(bn * bmax) AS BIGINT) AS padded_tokens,
      |  CAST(((SUM(bn * bmax) - SUM(btok)) * 1000000) // SUM(bn * bmax)
      |       AS BIGINT) AS waste_ppm
      |FROM batches GROUP BY strategy ORDER BY strategy""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("epoch_shuffle", epochShuffle, Some(epochShuffleSql)),
    Q("split_leakage_report", splitLeakageReport, Some(splitLeakageReportSql)),
    Q("padding_waste_report", paddingWasteReport, Some(paddingWasteReportSql)),
    Q("curriculum_phases", curriculumPhases, Some(curriculumPhasesSql)),
    Q("epoch_plan", epochPlan, Some(epochPlanSql)),
    Q("token_budget_waterfill", tokenBudgetWaterfill,
      Some(tokenBudgetWaterfillSql)),
    Q("bloom_decontaminate", bloomDecontaminate, Some(bloomDecontaminateSql)),
    Q("dp_noisy_counts", dpNoisyCounts, Some(dpNoisyCountsSql)),
    Q("k_anonymity_report", kAnonymityReport, Some(kAnonymityReportSql)),
    Q("l_diversity_report", lDiversityReport, Some(lDiversityReportSql)),
    Q("t_closeness_report", tClosenessReport, Some(tClosenessReportSql)),
    Q("corpus_topp_select", corpusToppSelect, Some(corpusToppSelectSql)),
    Q("temperature_mixture", temperatureMixture, Some(temperatureMixtureSql)),
    Q("repetition_score", repetitionScore, Some(repetitionScoreSql)),
    Q("gopher_quality_filter", gopherQualityFilter, Some(gopherQualityFilterSql)),
    Q("boilerplate_shingles", boilerplateShingles, Some(boilerplateShinglesSql)),
    Q("pii_scrub", piiScrub, Some(piiScrubSql)),
    Q("source_mixture_weights", sourceMixtureWeights, Some(sourceMixtureWeightsSql))
  )
}
