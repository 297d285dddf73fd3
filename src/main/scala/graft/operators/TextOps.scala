package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (north star in
  * BASELINE.json; no reference analog — SURVEY.md §2.7): token statistics,
  * term frequencies, TF-IDF, n-gram-heuristic language ID, quality scoring,
  * and document fingerprinting over the `documents` table.
  *
  * Scale posture: everything is explode → hash-aggregate (map-side partial
  * agg) or per-row projection; no driver-side state, no collects. The
  * stopword table is a literal broadcast join (≤ tens of rows regardless of
  * corpus size). At 100 TB, token explosion multiplies rows ~50× before the
  * partial aggregate collapses them again — the shuffle carries only
  * (term, partial count) pairs.
  */
object TextOps extends QueryModule {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  /** Tiny per-language stopword lists (public common words). */
  private val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "los", "es" -> "que",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist",
    "fr" -> "le", "fr" -> "les", "fr" -> "et", "fr" -> "des", "fr" -> "un")

  private def stopwordSqlValues: String =
    stopwords.map { case (l, w) => s"('$l','$w')" }.mkString(", ")

  /** RAKE-style corpus keyword extraction (Rose et al.'s Rapid Automatic
    * Keyword Extraction, stopword-delimited): candidate phrases are maximal
    * runs of non-stopword tokens (length ≤ 4), word score =
    * degree/frequency where degree sums the lengths of every run the word
    * appears in, phrase score = Σ member-word scores. All scoring is exact
    * integer ppm (per-word truncated `deg·1e6 div freq`, summed), so both
    * engines rank identically — no float ever enters the order. Top 25
    * corpus keywords.
    *
    * Scale posture: the run segmentation is the sessionization idiom
    * (boundary flag → running sum) windowed PER DOCUMENT — parallelism is
    * the corpus; word stats and phrase stats are two hash aggregates; the
    * phrase-word scoring join explodes phrases back to ≤ 4 rows each. The
    * stopword table is a broadcast literal. Nothing is quadratic, nothing
    * is driver-side.
    */
  private def rakeKeywords(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sw = s.createDataFrame(stopwords).toDF("sw_lang", "sw_word")
    val toks = docs(s, dir)
      .filter(col("lang").isin("en", "es", "de", "fr"))
      .select(col("doc_id"), col("lang"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val marked = toks.join(broadcast(sw),
        col("lang") === col("sw_lang") && col("term") === col("sw_word"),
        "left")
      .withColumn("is_stop",
        (col("sw_word").isNotNull || col("term") === "").cast("long"))
      .select(col("doc_id"), col("pos"), col("term"), col("is_stop"))
    val wCum = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = marked
      .withColumn("run_id", sum(col("is_stop")).over(wCum))
      .filter(col("is_stop") === 0)
      .select(col("doc_id"), col("run_id"), col("pos"), col("term"))
    val withLen = runs.withColumn("run_len",
      count(lit(1)).over(Window.partitionBy(col("doc_id"), col("run_id")))
        .cast("long"))
    val wordScore = withLen.filter(col("run_len") <= 4)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("freq"), sum(col("run_len")).cast("long").as("deg"))
      .select(col("term"), expr("(deg * 1000000) div freq").as("wscore_ppm"))
    val phrases = runs
      .groupBy(col("doc_id"), col("run_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("term")))).as("xs"))
      .select(
        expr("array_join(transform(xs, x -> x.term), ' ')").as("phrase"),
        size(col("xs")).cast("long").as("n_words"))
      .filter(col("n_words") <= 4)
      .groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("n_occurrences"))
    phrases
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("term"))
      .join(wordScore, "term")
      .groupBy(col("phrase"), col("n_words"), col("n_occurrences"))
      .agg(sum(col("wscore_ppm")).cast("long").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("phrase"))
      .limit(25)
  }

  private def rakeKeywordsSql: String =
    s"""WITH sw(sw_lang, sw_word) AS (VALUES $stopwordSqlValues),
       |d AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS toks
       |  FROM documents WHERE lang IN ('en', 'es', 'de', 'fr')
       |), p0 AS (
       |  SELECT doc_id, lang, toks,
       |         unnest(generate_series(1, len(toks))) AS pos
       |  FROM d
       |), tok AS (
       |  SELECT doc_id, lang, pos, toks[pos] AS term FROM p0
       |), marked AS (
       |  SELECT k.doc_id, k.pos, k.term,
       |    CASE WHEN sw.sw_word IS NOT NULL OR k.term = '' THEN 1 ELSE 0 END
       |      AS is_stop
       |  FROM tok k LEFT JOIN sw
       |    ON k.lang = sw.sw_lang AND k.term = sw.sw_word
       |), seg AS (
       |  SELECT doc_id, pos, term, is_stop,
       |    CAST(SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
       |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
       |  FROM marked
       |), runs AS (
       |  SELECT doc_id, run_id, pos, term FROM seg WHERE is_stop = 0
       |), wl AS (
       |  SELECT doc_id, run_id, pos, term,
       |    CAST(COUNT(*) OVER (PARTITION BY doc_id, run_id) AS BIGINT)
       |      AS run_len
       |  FROM runs
       |), wscore AS (
       |  SELECT term,
       |    (CAST(SUM(run_len) AS BIGINT) * 1000000)
       |      // CAST(COUNT(*) AS BIGINT) AS wscore_ppm
       |  FROM wl WHERE run_len <= 4 GROUP BY 1
       |), phr AS (
       |  SELECT doc_id, run_id,
       |         string_agg(term, ' ' ORDER BY pos) AS phrase,
       |         CAST(COUNT(*) AS BIGINT) AS n_words
       |  FROM runs GROUP BY 1, 2
       |), pa AS (
       |  SELECT phrase, n_words, CAST(COUNT(*) AS BIGINT) AS n_occurrences
       |  FROM phr WHERE n_words <= 4 GROUP BY 1, 2
       |), pw AS (
       |  SELECT pa.phrase, pa.n_words, pa.n_occurrences,
       |         unnest(string_split(pa.phrase, ' ')) AS term
       |  FROM pa
       |)
       |SELECT phrase, n_words, n_occurrences,
       |  CAST(SUM(wscore_ppm) AS BIGINT) AS score_ppm
       |FROM pw JOIN wscore USING (term)
       |GROUP BY 1, 2, 3
       |ORDER BY score_ppm DESC, phrase LIMIT 25""".stripMargin

  /** Token statistics per document: whitespace tokens, distinct tokens,
    * alphabetic tokens (regex), a BPE-ish size estimate (chars/4 is the
    * classic approximation), and mean token length — all integer/rational
    * math, bit-exact vs the oracle.
    */
  private def tokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        regexp_count(col("text"), lit("[a-z]+")).cast("long").as("n_alpha"),
        ceil(col("n_chars") / 4.0).cast("long").as("bpe_est"),
        ((col("n_chars") - (size(col("toks")) - 1)) / size(col("toks")).cast("double"))
          .as("mean_token_len"))
      .orderBy(col("doc_id"))

  /** Global term frequencies, top 50. explode → partial-agg → top-k. */
  private def termFrequencies(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(50)

  /** TF-IDF: top-3 terms per document (doc_id < 100) by tf·ln(N/df).
    * tf/df/N stay integer until the final per-row double math; rounded to 3
    * decimals to absorb any cross-engine libm ulp drift in ln().
    */
  private def tfIdf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val tokens = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    // tf is deliberately NOT cached although it feeds both the score join
    // and the df aggregate: it is corpus-scale (unlike bm25_score's
    // few-term sliver), so pinning it would trade two embarrassingly
    // parallel pruned scans for a corpus-scale materialization — measured
    // slower here (0.47 → 0.74 s at sf0.1) and worse at 100 TB
    val tf = tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = d.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 3))
      .filter(col("doc_id") < 100)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
        col("tf"), col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Query terms for the BM25 / hybrid-retrieval queries (fixed, public). */
  private[operators] val bm25Terms = Seq("spark", "hash", "join", "vector")
  private[operators] def bm25TermsSql: String =
    bm25Terms.map(t => s"'$t'").mkString(", ")

  /** Okapi BM25 (k1=1.2, b=0.75) per-document scores for the fixed query
    * term set — (doc_id, n_terms, bm25), unordered. Cross-engine exact:
    * tf/df/dl/N stay integer; idf = round(ln(…), 6) is the single libm
    * call (rounded to absorb ulp drift); each term's contribution is
    * quantized to a 1e6-scaled long and summed AS LONGS (exact,
    * order-independent), final /1e6 back to double.
    *
    * Scale posture: the token explode collapses in a partial agg keyed by
    * the ≤|terms| query words, so the shuffle carries only matched
    * (doc, term, tf) slivers; doc length rides that same pass as a
    * grouping key (functionally dependent on doc_id — no second
    * corpus-scale join); df (≤|terms| rows) and the corpus stats (1 row)
    * are broadcasts.
    */
  private[operators] def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val d = docs(s, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"),
      split(col("text"), " ").as("toks"))
    val stats = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // cached: tf feeds both the score join and the df aggregate — without
    // the cache the corpus scan + explode + aggregate runs twice (the
    // PrefixOps diamond lesson, confirmed in this query's physical plan)
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(bm25Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(
        log(((col("n_docs") - col("df")) + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)), 6))
      .withColumn("s_term", round(
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl") * col("n_docs") / col("sum_dl")))
          * lit(1e6)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        (sum(col("s_term")) / lit(1e6)).as("bm25"))
  }

  /** The same scored CTE, shared verbatim by the bm25 and RRF oracles. */
  private[operators] def bm25ScoredSql: String =
    s"""d AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |         string_split(text, ' ') AS toks
       |  FROM documents
       |), stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(dl) AS BIGINT) AS sum_dl FROM d
       |), tf AS (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
       |  WHERE term IN ($bm25TermsSql)
       |  GROUP BY 1, 2, 3
       |), dfreq AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), s_terms AS (
       |  SELECT tf.doc_id,
       |    CAST(ROUND(
       |      ROUND(LN(((n_docs - df) + 0.5e0) / (df + 0.5e0) + 1e0), 6)
       |      * (tf * (1.2e0 + 1e0))
       |      / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl * n_docs / sum_dl))
       |      * 1e6) AS BIGINT) AS s_term
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
       |), bm AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |         CAST(SUM(s_term) AS BIGINT) / 1e6 AS bm25
       |  FROM s_terms GROUP BY 1
       |)""".stripMargin

  /** BM25 retrieval: top-20 documents for the fixed query (TakeOrdered —
    * never a global sort). */
  private def bm25Score(s: SparkSession, dir: String): DataFrame =
    bm25Scored(s, dir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("n_terms"), col("bm25"))

  private lazy val langIdSql: String =
    s"""WITH sw(cand_lang, word) AS (VALUES $stopwordSqlValues),
        |tokens AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), hits AS (
        |  SELECT doc_id, cand_lang, CAST(COUNT(*) AS BIGINT) AS hits
        |  FROM tokens JOIN sw USING (word) GROUP BY 1, 2
        |), ntok AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), scored AS (
        |  SELECT ntok.doc_id, ntok.lang, hits.cand_lang,
        |         COALESCE(hits.hits, 0) / CAST(ntok.n_tokens AS DOUBLE) AS score
        |  FROM ntok LEFT JOIN hits ON ntok.doc_id = hits.doc_id
        |), ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |            ORDER BY score DESC, cand_lang) AS rk
        |  FROM scored
        |)
        |SELECT doc_id, lang,
        |       CASE WHEN score > 0.0 THEN cand_lang ELSE 'und' END AS detected_lang,
        |       score
        |FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin

  /** Language-ID confusion matrix: the offline eval every classifier ships
    * with — per (true lang, detected lang) cell counts plus per-true-lang
    * recall, composed on top of the audited `lang_id` plan (two extra hash
    * aggregates over its per-doc verdicts; the per-lang total rides a
    * lang-partitioned window over the ≤\|langs\|² cell domain). */
  private def langConfusion(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
    langId(s, dir)
      .groupBy(col("lang"), col("detected_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("recall",
        when(col("lang") === col("detected_lang"),
          col("n").cast("double") / sum(col("n")).over(w).cast("double")))
      .orderBy(col("lang"), col("detected_lang"))
  }

  private def langConfusionSql(langIdSql: String): String =
    s"""WITH verdicts AS (
       |${langIdSql.replace("ORDER BY doc_id", "")}
       |), cells AS (
       |  SELECT lang, detected_lang, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM verdicts GROUP BY lang, detected_lang
       |)
       |SELECT lang, detected_lang, n,
       |  CASE WHEN lang = detected_lang THEN
       |    CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE)
       |  END AS recall
       |FROM cells ORDER BY lang, detected_lang""".stripMargin

  /** Zipf-law fit per source: OLS slope of ln(freq) on ln(rank) over each
    * source's full term-frequency table — the corpus-health diagnostic
    * (natural language tracks slope ≈ −1; template/boilerplate-heavy or
    * synthetic sources bend the curve). Ranks come from a window over the
    * compressed per-source term domain (partitioned — never raw tokens);
    * both logs are quantized to 1e-6 longs so the OLS sums are exact and
    * order-free on a DECIMAL(38,0) carrier (ln values ≤ ~21e6 as scaled
    * longs; Σx·y stays < 1e38 to ~1e24 terms); the slope/intercept assembly
    * runs in DOUBLE with identical expression text in both engines.
    */
  private def zipfSlope(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("term"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ranked = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("rk", row_number().over(w))
      .select(col("source"),
        round(log(col("rk").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("freq").cast("double")) * 1e6).cast("long").as("y"))
    ranked
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"))
      .select(col("source"), col("n_terms"),
        expr("""(CAST(CAST(sxy AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sy AS STRING) AS DOUBLE)/n_terms)
                / (CAST(CAST(sxx AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sx AS STRING) AS DOUBLE)/n_terms)"""
          .replaceAll("\n\\s*", " ")).as("zipf_slope"),
        expr("""(CAST(CAST(sy AS STRING) AS DOUBLE)/n_terms
                - (CAST(CAST(sxy AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sy AS STRING) AS DOUBLE)/n_terms)
                  / (CAST(CAST(sxx AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sx AS STRING) AS DOUBLE)/n_terms)
                  * (CAST(CAST(sx AS STRING) AS DOUBLE)/n_terms)) / 1e6"""
          .replaceAll("\n\\s*", " ")).as("ln_intercept"))
      .orderBy(col("source"))
  }

  private def zipfSlopeSql: String =
    """WITH tf AS (
      |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS freq
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY source, term
      |), ranked AS (
      |  SELECT source,
      |    CAST(ROUND(LN(CAST(ROW_NUMBER() OVER (PARTITION BY source
      |         ORDER BY freq DESC, term) AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |    CAST(ROUND(LN(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |  FROM tf
      |), sums AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
      |  FROM ranked GROUP BY source
      |)
      |SELECT source, n_terms,
      |  (CAST(CAST(sxy AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sy AS STRING) AS DOUBLE)/n_terms) / (CAST(CAST(sxx AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sx AS STRING) AS DOUBLE)/n_terms)
      |    AS zipf_slope,
      |  (CAST(CAST(sy AS STRING) AS DOUBLE)/n_terms - (CAST(CAST(sxy AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sy AS STRING) AS DOUBLE)/n_terms) / (CAST(CAST(sxx AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE)*CAST(CAST(sx AS STRING) AS DOUBLE)/n_terms) * (CAST(CAST(sx AS STRING) AS DOUBLE)/n_terms)) / 1e6
      |    AS ln_intercept
      |FROM sums ORDER BY source""".stripMargin

  /** Language ID: stopword-hit ratio per language, argmax with deterministic
    * tie-break; 'und' when nothing matches. N-gram-heuristic family.
    */
  private def langId(s: SparkSession, dir: String): DataFrame = {
    val sw = s.createDataFrame(stopwords).toDF("cand_lang", "word")
    val d = docs(s, dir)
    val tokens = d.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val hits = tokens.join(broadcast(sw), "word")
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("hits"))
    val nTok = d.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cand_lang"))
    nTok.join(hits, Seq("doc_id"), "left")
      .withColumn("score",
        coalesce(col("hits"), lit(0L)).cast("double") / col("n_tokens"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(
        col("doc_id"), col("lang"),
        when(col("score") > 0.0, col("cand_lang")).otherwise(lit("und"))
          .as("detected_lang"),
        col("score"))
      .orderBy(col("doc_id"))
  }

  /** Quality score: length saturation + uniqueness + stopword ratio, the
    * length/punct/stopword-ratio family. Integer-derived double math only.
    */
  private[operators] def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val enWords = stopwords.filter(_._1 == "en").map(_._2)
    docs(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin(enWords.map(lit(_)): _*))).cast("long"))
      .withColumn("n_punct", regexp_count(col("text"), lit("[.,!?;:]")).cast("long"))
      .select(
        col("doc_id"),
        col("n_tokens"), col("n_distinct"), col("n_stop"), col("n_punct"),
        (least(lit(1.0), col("n_tokens") / 50.0) * 0.3
          + (col("n_distinct").cast("double") / col("n_tokens")) * 0.3
          + (col("n_stop").cast("double") / col("n_tokens")) * 0.4
          - (col("n_punct").cast("double") / col("n_tokens")) * 0.1)
          .as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Oracle SQL for [[qualityScore]] — shared with DedupOps.clusterKeepBest,
    * which re-scores cluster members to pick the surviving document. */
  private[operators] val qualityScoreSql: String =
    """WITH base AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks, n_chars, text
      |  FROM documents
      |), m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(toks,
      |      t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop,
      |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct
      |  FROM base
      |)
      |SELECT doc_id, n_tokens, n_distinct, n_stop, n_punct,
      |  LEAST(1.0, n_tokens / 50.0) * 0.3
      |    + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3
      |    + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.4
      |    - (CAST(n_punct AS DOUBLE) / n_tokens) * 0.1 AS quality
      |FROM m ORDER BY doc_id""".stripMargin

  /** Document fingerprints: md5 of normalized text plus a 64-bit prefix
    * (hex→decimal) usable as a dedup key / shard key.
    */
  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        md5(lower(col("text"))).as("fp_md5"),
        conv(substring(md5(lower(col("text"))), 1, 15), 16, 10).cast("long")
          .as("fp64"))
      .orderBy(col("doc_id"))

  /** Rolling-hash fingerprint via the custom codegen expression
    * (graft.functions.RollingHash) — Rabin–Karp polynomial over utf-8 bytes.
    * Oracle: DuckDB list_reduce replays the modular chain over the HUGEINT
    * domain (h·257+b stays < 2^70 — BIGINT would overflow). `ascii()` yields
    * code points, not bytes, so the replay is exact for the all-ASCII corpus
    * (verified) — a multibyte corpus would need a byte-level oracle.
    * Also ScalaTest-verified against an independent BigInt reference.
    */
  private def rollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextFunctions.register(s)
    docs(s, dir)
      .select(col("doc_id"), expr("rolling_hash(text)").as("fp_roll"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination check: for every non-benchmark document, the
    * fraction of its distinct 3-token shingles that appear in the benchmark
    * set (docs 0-9 stand in for an eval benchmark). The operator every
    * training-data pipeline runs before shipping a corpus: contamination ≈ 1
    * means the doc IS the benchmark; > 0.1 is usually a drop.
    *
    * Scale posture: benchmark shingles are a broadcast (benchmarks are MBs,
    * corpora are TBs); the corpus side is one explode + broadcast-hash left
    * join + per-doc aggregate — no corpus-side shuffle before the aggregate.
    */
  private def contaminationCheck(s: SparkSession, dir: String): DataFrame = {
    val sh = DedupOps.shingles(s, dir)
    val bench = sh.filter(col("doc_id") < 10)
      .select(col("sh")).distinct().withColumn("hit", lit(1L))
    sh.filter(col("doc_id") >= 10)
      .join(broadcast(bench), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
    * algorithm): from every window of w = 4 consecutive 4-token-gram
    * hashes, select the RIGHTMOST MINIMUM; the selected (pos, hash) set is
    * the document's fingerprint, guaranteeing any shared run of ≥ w+k−1
    * tokens between two documents shares a fingerprint. Implemented
    * without materializing windows: position p is selected iff its
    * consecutive left-run of hashes ≥ h\[p\] (length a) and right-run of
    * hashes > h\[p\] (length b, strict — ties break rightward) can cover
    * some in-bounds window, i.e. max(w−1−b, p−(G−w+1), 0) ≤
    * min(a, p−1, w−1) for G grams — three lags + three leads per row, O(1)
    * per position, one per-doc window pass in BOTH engines (the brute
    * per-window form is w× the rows and a self-join). Grams hash through
    * the md5 '0x' family, so the fingerprints themselves are
    * engine-identical.
    */
  private def winnowingFingerprints(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val grams = docs(s, dir)
      .repartition(col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 7) // G = n_toks - 3 >= w = 4
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("toks")) - 3),
          i => struct(i.as("pos"), concat_ws(" ",
            element_at(col("toks"), i), element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))
            .as("g")))).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"),
        conv(substring(md5(concat(lit("wn:"), col("pg.g"))), 1, 15), 16, 10)
          .cast("long").as("h"))
    val byDoc = W.partitionBy(col("doc_id")).orderBy(col("pos"))
    def runLen(cmp: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column) =
      when(cmp(col("h"), 1).isNull || !cmp(col("h"), 1), 0)
        .when(cmp(col("h"), 2).isNull || !cmp(col("h"), 2), 1)
        .when(cmp(col("h"), 3).isNull || !cmp(col("h"), 3), 2)
        .otherwise(3)
    grams
      .withColumn("g_n", count(lit(1)).over(W.partitionBy(col("doc_id"))))
      .withColumn("a", runLen((h, j) => lag(col("h"), j).over(byDoc) >= h))
      .withColumn("b", runLen((h, j) => lead(col("h"), j).over(byDoc) > h))
      .filter(
        greatest(lit(3) - col("b"), col("pos") - (col("g_n") - lit(3)), lit(0))
          <= least(col("a"), col("pos") - 1, lit(3)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("h").as("fp"))
      .orderBy(col("doc_id"), col("pos"))
  }

  private val winnowingFingerprintsSql: String =
    """WITH grams AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |    CAST(concat('0x', substr(md5('wn:' || toks[i] || ' ' || toks[i+1]
      |      || ' ' || toks[i+2] || ' ' || toks[i+3]), 1, 15)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |       unnest(generate_series(1, len(toks) - 3)) AS t(i)
      |  WHERE len(toks) >= 7
      |), runs AS (
      |  SELECT doc_id, pos, h,
      |    COUNT(*) OVER (PARTITION BY doc_id) AS g_n,
      |    CASE WHEN lag(h, 1) OVER wd IS NULL OR lag(h, 1) OVER wd < h THEN 0
      |         WHEN lag(h, 2) OVER wd IS NULL OR lag(h, 2) OVER wd < h THEN 1
      |         WHEN lag(h, 3) OVER wd IS NULL OR lag(h, 3) OVER wd < h THEN 2
      |         ELSE 3 END AS a,
      |    CASE WHEN lead(h, 1) OVER wd IS NULL OR lead(h, 1) OVER wd <= h THEN 0
      |         WHEN lead(h, 2) OVER wd IS NULL OR lead(h, 2) OVER wd <= h THEN 1
      |         WHEN lead(h, 3) OVER wd IS NULL OR lead(h, 3) OVER wd <= h THEN 2
      |         ELSE 3 END AS b
      |  FROM grams
      |  WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)
      |)
      |SELECT doc_id, pos, h AS fp
      |FROM runs
      |WHERE GREATEST(3 - b, pos - (g_n - 3), 0) <= LEAST(a, pos - 1, 3)
      |ORDER BY doc_id, pos""".stripMargin

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023, arXiv:2302.03169): documents are scored
    * by how much more likely their hashed-bigram features are under a
    * TARGET corpus (here lang = 'en', the high-quality-target stand-in)
    * than under the RAW corpus — the standard recipe for selecting
    * pretraining data that "looks like" a trusted set. Bigrams hash into
    * 256 buckets (md5-derived, the engine-shared '0x'-cast family); each
    * bucket's add-1-smoothed log-probability under target and raw is
    * quantized to millis (round(ln, 3) — the cross-engine-safe ln
    * pattern), and a document's weight is the exact integer sum of its
    * occurrences' log-ratios. Two hash-agg passes over the bigram explode
    * plus one broadcast join of the 256-row ratio table: no shuffle is
    * data-proportional beyond the explode itself, so the shape holds at
    * corpus scale (DSIR's own use case is 100B+ tokens).
    */
  private def dsirImportanceWeights(s: SparkSession, dir: String): DataFrame = {
    val bg = docs(s, dir)
      .repartition(col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ",
            element_at(col("toks"), i), element_at(col("toks"), i + 1)))).as("bg"))
      .withColumn("b",
        pmod(conv(substring(md5(concat(lit("dsir:"), col("bg"))), 1, 15), 16, 10)
          .cast("long"), lit(256L)))
      // cached: feeds the raw counts, the target counts, the totals AND the
      // final scoring join — four passes over one explode otherwise
      .cache()
    val tgt = bg.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val raw = bg.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val totals = bg.agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
      count(lit(1)).as("nr"))
    val lr = raw.join(tgt, Seq("b"), "left_outer")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .withColumn("lr_milli",
        (round(round(log((col("ct") + 1.0) / (col("nt") + 256.0)), 3) * 1000) -
          round(round(log((col("cr") + 1.0) / (col("nr") + 256.0)), 3) * 1000))
          .cast("long"))
      .select(col("b"), col("lr_milli"))
    bg.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("lr_milli")).as("sum_lr_milli"))
      .withColumn("avg_logw",
        col("sum_lr_milli").cast("double") / col("n_grams") / 1000.0)
      .select(col("doc_id"), col("n_grams"), col("sum_lr_milli"), col("avg_logw"))
      .orderBy(col("doc_id"))
  }

  private val dsirImportanceWeightsSql: String =
    """WITH bg AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |           i -> toks[i] || ' ' || toks[i+1])) AS bg
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 2
      |), bb AS (
      |  SELECT doc_id, lang,
      |    CAST(concat('0x', substr(md5('dsir:' || bg), 1, 15)) AS BIGINT)
      |      % 256 AS b
      |  FROM bg
      |), raw AS (
      |  SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM bb GROUP BY 1
      |), tgt AS (
      |  SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
      |  FROM bb WHERE lang = 'en' GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
      |         CAST(COUNT(*) AS BIGINT) AS nr
      |  FROM bb
      |), lr AS (
      |  SELECT r.b,
      |    CAST(ROUND(ROUND(ln((COALESCE(t.ct, 0) + 1.0) / (nt + 256.0)), 3) * 1000) AS BIGINT)
      |    - CAST(ROUND(ROUND(ln((r.cr + 1.0) / (nr + 256.0)), 3) * 1000) AS BIGINT) AS lr_milli
      |  FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tot
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(lr_milli) AS BIGINT) AS sum_lr_milli,
      |  CAST(SUM(lr_milli) AS DOUBLE) / COUNT(*) / 1000.0 AS avg_logw
      |FROM bb JOIN lr USING (b)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bigram language-model scoring (perplexity proxy): corpus-level bigram
    * counts with add-1 smoothing over the bigram-context vocabulary, then
    * per-document mean log-probability. log-probs are quantized to millis
    * (round(ln, 3) — the cross-engine-safe ln pattern) and summed as longs,
    * so the mean is exact. The text-quality signal next to `quality_score`:
    * low avg_logp = the doc doesn't look like the corpus.
    */
  private def bigramLmScore(s: SparkSession, dir: String): DataFrame = {
    val bg = docs(s, dir)
      .repartition(col("doc_id")) // single-file scan → parallelize the explode
      .withColumn("toks", split(col("text"), " "))
      // 1-token doc → no bigram. Spark's sequence(1, 0) yields [1, 0]
      // (descending default step) → a spurious/erroring element_at, while
      // DuckDB's generate_series(1, 0) is empty; the guard makes both empty.
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ",
            element_at(col("toks"), i), element_at(col("toks"), i + 1)))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      // cached: bg feeds the bigram counts, the unigram counts AND the final
      // scoring join — without this the corpus scan + explode runs three times
      .cache()
    val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))
    bg.join(broadcast(c2), "bg")
      .join(broadcast(c1), "w1")
      .crossJoin(broadcast(v))
      .withColumn("lp_milli",
        round(round(log((col("c2") + 1.0) / (col("c1") + col("vocab"))), 3) * 1000)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_milli")).as("sum_lp_milli"))
      .withColumn("avg_logp",
        col("sum_lp_milli").cast("double") / col("n_bigrams") / 1000.0)
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility audit per source: characters per token and tokens
    * per document — the first table in any tokenizer-choice writeup
    * (fertility spikes flag sources the tokenizer fragments, e.g. code or
    * non-Latin text under a Latin-heavy vocab). Whitespace tokens here, as
    * everywhere in this catalog; ratios are exact milli integers via
    * `div`. One partial-aggregated pass; NULL text contributes to n_docs
    * but to neither sum (both engines skip NULL in SUM).
    */
  private def tokenizerFertility(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("sum_toks"))
      .withColumn("chars_per_tok_milli",
        expr("sum_chars * 1000 div sum_toks"))
      .withColumn("toks_per_doc_milli",
        expr("sum_toks * 1000 div n_docs"))
      .orderBy(col("source"))

  private val tokenizerFertilitySql: String =
    """WITH agg AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_chars,
      |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS sum_toks
      |  FROM documents GROUP BY 1
      |)
      |SELECT source, n_docs, sum_chars, sum_toks,
      |  sum_chars * 1000 // sum_toks AS chars_per_tok_milli,
      |  sum_toks * 1000 // n_docs AS toks_per_doc_milli
      |FROM agg ORDER BY source""".stripMargin

  /** T5-style span-corruption planning (Raffel et al. 2020's denoising
    * objective, arXiv:1910.10683 §3.1.4), made deterministic and
    * shuffle-parallel: instead of randomly permuting positions (a
    * sequential, seed-order-dependent recipe), each document is cut into
    * fixed 20-token blocks and the md5-minimal position inside each block
    * starts a 3-token noise span (clamped at the doc end) — ~15% corruption
    * with spans ≥ 17 tokens apart in expectation, no two spans overlapping
    * across block boundaries by more than the 2-token clamp slack, and the
    * SAME plan on every run and every engine (a reproducible-pretraining
    * requirement: the mask plan is part of the experiment). The per-block
    * argmin is a window over (doc, block) — bounded by block size 20,
    * never by corpus size.
    */
  private def spanCorruptionPlan(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    docs(s, dir)
      .repartition(col("doc_id"))
      .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
      .select(col("doc_id"), col("n_toks"),
        explode(sequence(lit(1L), col("n_toks"))).as("pos"))
      .withColumn("blk", expr("(pos - 1) div 20"))
      .withColumn("h",
        conv(substring(md5(concat(lit("sc:"), col("doc_id").cast("string"),
          lit(":"), col("pos").cast("string"))), 1, 15), 16, 10).cast("long"))
      .withColumn("rn", row_number().over(
        W.partitionBy(col("doc_id"), col("blk")).orderBy(col("h"), col("pos"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("blk"), col("pos").as("span_start"),
        least(lit(3L), col("n_toks") - col("pos") + 1L).as("span_len"))
      .orderBy(col("doc_id"), col("blk"))
  }

  private val spanCorruptionPlanSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents
      |), posn AS (
      |  SELECT doc_id, n_toks, CAST(i AS BIGINT) AS pos,
      |    (CAST(i AS BIGINT) - 1) // 20 AS blk,
      |    CAST(concat('0x', substr(md5('sc:' || CAST(doc_id AS VARCHAR)
      |      || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM d, unnest(generate_series(1, n_toks)) AS t(i)
      |), ranked AS (
      |  SELECT *, ROW_NUMBER()
      |    OVER (PARTITION BY doc_id, blk ORDER BY h, pos) AS rn
      |  FROM posn
      |)
      |SELECT doc_id, blk, pos AS span_start,
      |  LEAST(3, n_toks - pos + 1) AS span_len
      |FROM ranked WHERE rn = 1
      |ORDER BY doc_id, blk""".stripMargin

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing every serious n-gram LM uses, where [[bigramLmScore]] is
    * the add-1 baseline): P(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·) +
    * D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··) with discount D = 0.75 —
    * the continuation probability ranks words by how many DISTINCT
    * contexts they follow, not raw frequency (the "San Francisco" effect:
    * "Francisco" is frequent but predictable, so its continuation mass is
    * tiny). Every count (bigram, context, forward/backward continuation
    * fan-outs, distinct-bigram total) is an exact long from one bigram
    * relation; the probability is ONE double expression with identical
    * operator order in both engines, and log-probs go through the
    * round(ln, 3)·1000 milli-quantization pattern so the per-doc sum is
    * exact integer arithmetic.
    *
    * Scale posture: one corpus explode feeding five partial-aggregated
    * counts (all vocabulary- or bigram-vocabulary-sized); the scoring join
    * broadcasts those aggregates at bench SF — at 100 TB swap to plain
    * equi-joins on w1/w2, vocabulary-keyed shuffles, never corpus-keyed
    * (the bigramCollocations note applies verbatim).
    */
  private def knBigramScore(s: SparkSession, dir: String): DataFrame = {
    val bg = docs(s, dir)
      .repartition(col("doc_id")) // single-file scan → parallelize the explode
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2) // sequence(1, 0) guard, as bigram_lm_score
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => struct(
            element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
      .cache() // feeds all five count tables AND the scoring join
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val n1f = bg.groupBy(col("w1")).agg(countDistinct(col("w2")).as("n1f"))
    val n1b = bg.groupBy(col("w2")).agg(countDistinct(col("w1")).as("n1b"))
    val nb = bg.select(col("w1"), col("w2")).distinct()
      .agg(count(lit(1)).as("nbig"))
    bg.join(broadcast(c2), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .join(broadcast(n1f), Seq("w1"))
      .join(broadcast(n1b), Seq("w2"))
      .crossJoin(broadcast(nb))
      .withColumn("lp_milli",
        round(round(log(
          (col("c2") - 0.75) / col("c1")
            + lit(0.75) * col("n1f") / col("c1") * col("n1b") / col("nbig")),
          3) * 1000).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_milli")).as("sum_lp_milli"))
      .withColumn("avg_logp",
        col("sum_lp_milli").cast("double") / col("n_bigrams") / 1000.0)
      .select(col("doc_id"), col("n_bigrams"), col("sum_lp_milli"),
        col("avg_logp"))
      .orderBy(col("doc_id"))
  }

  private val knBigramScoreSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), bg AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      |  FROM d, unnest(generate_series(1, len(toks) - 1)) AS t(i)
      |  WHERE len(toks) >= 2
      |), c2t AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2
      |), c1t AS (
      |  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1
      |), n1ft AS (
      |  SELECT w1, CAST(COUNT(DISTINCT w2) AS BIGINT) AS n1f FROM bg GROUP BY 1
      |), n1bt AS (
      |  SELECT w2, CAST(COUNT(DISTINCT w1) AS BIGINT) AS n1b FROM bg GROUP BY 1
      |), nbt AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS nbig
      |  FROM (SELECT DISTINCT w1, w2 FROM bg)
      |), lp AS (
      |  SELECT doc_id,
      |    CAST(ROUND(ROUND(ln((c2 - 0.75) / c1
      |      + 0.75 * n1f / c1 * n1b / nbig), 3) * 1000) AS BIGINT) AS lp_milli
      |  FROM bg JOIN c2t USING (w1, w2) JOIN c1t USING (w1)
      |       JOIN n1ft USING (w1) JOIN n1bt USING (w2) CROSS JOIN nbt
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(lp_milli) AS BIGINT) AS sum_lp_milli,
      |  CAST(SUM(lp_milli) AS DOUBLE) / COUNT(*) / 1000.0 AS avg_logp
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** PMI-ranked collocations (phrase mining): token bigrams whose observed
    * count most exceeds what independent word frequencies predict —
    * PMI = ln(c_ab·N / (c_a·c_b)) — the standard phrase-extraction signal
    * for tokenizer/vocab curation. Unigram margins are counts of appearing
    * as a bigram's first/second word, so N, c_a, c_b, c_ab are all exact
    * longs from the SAME bigram relation; the ranking value is the PMI
    * argument as ONE IEEE division of two exact long products —
    * bit-identical across engines (ln would rank identically; the raw
    * ratio skips the transcendental). Min support 5, top 50. Long product
    * carriers hold while c_ab·N and c_a·c_b stay under 2⁶³ (≈ 10¹²-bigram
    * corpora with ≤ 10⁶-count pairs); past that, cast the two products to
    * DECIMAL(38,0) before the division, as gini_concentration prescribes.
    *
    * Scale posture: the corpus-sized explode aggregates immediately
    * (map-side partial) into the pair/margin count tables; the support
    * filter shrinks the pair table BEFORE the margin joins. The margins
    * are broadcast here (vocabulary-sized, fine at bench SF); at a 100 TB
    * corpus swap to plain equi-joins on the aggregated domains —
    * vocabulary-keyed shuffles, never corpus-keyed.
    */
  private def bigramCollocations(s: SparkSession, dir: String): DataFrame = {
    val bg = docs(s, dir)
      .repartition(col("doc_id")) // single-file scan → parallelize the explode
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2) // sequence(1, 0) guard, as bigram_lm_score
      .select(explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(
          element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .cache() // feeds the pair counts AND both margins (the Q contract)
    val cab = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val ca = bg.groupBy(col("w1")).agg(count(lit(1)).as("c_a"))
    val cb = bg.groupBy(col("w2")).agg(count(lit(1)).as("c_b"))
    val n = bg.agg(count(lit(1)).as("n_bg"))
    cab.filter(col("c_ab") >= 5)
      .join(broadcast(ca), "w1")
      .join(broadcast(cb), "w2")
      .crossJoin(broadcast(n))
      .withColumn("pmi_ratio",
        (col("c_ab") * col("n_bg")).cast("double") /
          (col("c_a") * col("c_b")).cast("double"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(50)
  }

  private val bigramCollocationsSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), bg AS (
      |  SELECT list_extract(toks, i) AS w1, list_extract(toks, i + 1) AS w2
      |  FROM d, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
      |  WHERE len(toks) >= 2
      |), cab AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2
      |), ca AS (
      |  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_a FROM bg GROUP BY 1
      |), cb AS (
      |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS c_b FROM bg GROUP BY 1
      |), n AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_bg FROM bg
      |)
      |SELECT w1, w2, c_ab, c_a, c_b,
      |  CAST(c_ab * n_bg AS DOUBLE) / CAST(c_a * c_b AS DOUBLE) AS pmi_ratio
      |FROM cab JOIN ca USING (w1) JOIN cb USING (w2) CROSS JOIN n
      |WHERE c_ab >= 5
      |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 50""".stripMargin

  // ---- training-prep: packing + chunking ----------------------------------

  private val PACK_BIN = 2048L

  /** Sequence packing (concat-then-chunk): documents are concatenated in
    * doc_id order WITHIN EACH SOURCE and cut into fixed 2048-token training
    * bins; each doc reports its token interval and the bins it spans. The
    * "pack the corpus into training sequences" bookkeeping step, as pure
    * window math (one running sum per source partition).
    *
    * Scale posture: packing is per-source (≡ per-shard in a real corpus), so
    * the window partitions by a parallel key — no single global cumsum
    * reducer; a 100 TB corpus packs every shard independently.
    */
  private def sequencePacking(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("end_tok", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .select(
        col("source"), col("doc_id"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok div $PACK_BIN").as("bin_first"),
        expr(s"(end_tok - 1) div $PACK_BIN").as("bin_last"))
      .withColumn("n_bins_spanned", col("bin_last") - col("bin_first") + 1)
      .orderBy(col("source"), col("doc_id"))
  }

  private def sequencePackingSql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT source, doc_id, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
       |  FROM d
       |)
       |SELECT source, doc_id, n_tokens,
       |  CAST(end_tok - n_tokens AS BIGINT) AS start_tok,
       |  CAST((end_tok - n_tokens) // $PACK_BIN AS BIGINT) AS bin_first,
       |  CAST((end_tok - 1) // $PACK_BIN AS BIGINT) AS bin_last,
       |  CAST((end_tok - 1) // $PACK_BIN - (end_tok - n_tokens) // $PACK_BIN
       |    + 1 AS BIGINT) AS n_bins_spanned
       |FROM c ORDER BY source, doc_id""".stripMargin

  private val SHARD_TOKENS = 2000L

  /** Deterministic data-loader shard plan: shuffle the corpus by a seeded
    * hash (no rand(), so the "random" order is reproducible and
    * re-derivable on any engine), then pack documents contiguously into
    * ~2000-token shards by exclusive-prefix division — the shard manifest
    * a training job reads to know which docs land in which file, with byte
    * offsets replaced by token offsets. Where [[sequencePacking]] packs
    * WITHIN each source, this is the corpus-GLOBAL plan, which is exactly
    * why it routes through [[graft.operators.PrefixOps.withGlobalPrefix]]
    * (two-level bucketed prefix sum) instead of an unpartitioned window:
    * the global cumulative token count is computed with a 64-way parallel
    * window stage plus a broadcast offsets table, never a single reducer.
    * The hash ordering doubles as shard BALANCE: documents arrive in
    * hash-uniform order, so every shard mixes sources/lengths instead of
    * inheriting the ingest order's skew.
    */
  private def shardPlan(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"),
        conv(substring(md5(concat(lit("shard:"), col("doc_id").cast("string"))),
          1, 15), 16, 10).cast("long").as("shard_key"))
    PrefixOps.withGlobalPrefix(base, col("shard_key"),
      Seq(col("shard_key"), col("doc_id")), sums = Seq("n_toks"))
      .select(col("doc_id"), col("shard_key"), col("n_toks"),
        expr(s"(g_run_n_toks - n_toks) div $SHARD_TOKENS").as("shard_id"),
        (col("g_run_n_toks") - col("n_toks")
          - expr(s"((g_run_n_toks - n_toks) div $SHARD_TOKENS) * $SHARD_TOKENS"))
          .as("shard_offset"))
      .orderBy(col("doc_id"))
  }

  private def shardPlanSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |    CAST(concat('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
       |      1, 15)) AS BIGINT) AS shard_key
       |  FROM documents
       |), pre AS (
       |  SELECT *, CAST(SUM(n_toks) OVER (ORDER BY shard_key, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
       |  FROM d
       |)
       |SELECT doc_id, shard_key, n_toks,
       |  (run - n_toks) // $SHARD_TOKENS AS shard_id,
       |  run - n_toks - ((run - n_toks) // $SHARD_TOKENS) * $SHARD_TOKENS
       |    AS shard_offset
       |FROM pre ORDER BY doc_id""".stripMargin

  private val CHUNK_LEN = 64
  private val CHUNK_STRIDE = 48

  /** Sliding-window document chunking (RAG / context-window prep): 64-token
    * chunks with stride 48 (16-token overlap); chunk_idx derives
    * arithmetically from the start offset so neither engine needs explode
    * ordinality. Narrow explode → per-row projection, trivially parallel.
    */
  private def docChunking(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .repartition(col("doc_id")) // single-file scan → parallelize the explode
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      .select(col("doc_id"), col("n"), col("toks"),
        explode(sequence(lit(1L), col("n"), lit(CHUNK_STRIDE.toLong))).as("start_tok"))
      .select(
        col("doc_id"),
        expr(s"(start_tok - 1) div $CHUNK_STRIDE + 1").as("chunk_idx"),
        col("start_tok"),
        least(lit(CHUNK_LEN.toLong), col("n") - col("start_tok") + 1).as("n_chunk_toks"),
        array_join(slice(col("toks"), col("start_tok").cast("int"), lit(CHUNK_LEN)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private def docChunkingSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents
       |), st AS (
       |  SELECT doc_id, toks, n,
       |         unnest(generate_series(1, n, $CHUNK_STRIDE)) AS start_tok
       |  FROM d
       |)
       |SELECT doc_id,
       |  CAST((start_tok - 1) // $CHUNK_STRIDE + 1 AS BIGINT) AS chunk_idx,
       |  start_tok,
       |  LEAST($CHUNK_LEN, n - start_tok + 1) AS n_chunk_toks,
       |  array_to_string(toks[start_tok:LEAST(start_tok + ${CHUNK_LEN - 1}, n)], ' ')
       |    AS chunk_text
       |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  private val CDC_WIN = 4
  private val CDC_MASK_HEX = "0" // last md5 hex digit → 1/16 boundary rate

  /** Content-defined chunking (the rolling-hash boundary scheme storage
    * dedup and incremental-sync systems use, applied to token streams): a
    * chunk boundary falls AFTER token i whenever the hash of the trailing
    * 4-token window ends in a fixed hex digit (expected chunk ≈ 16 tokens).
    * Because boundaries depend only on LOCAL content, an insertion early in
    * a document re-chunks only the window it touches — unlike fixed-stride
    * chunking (`doc_chunking`) where every downstream chunk shifts. Emits
    * one row per chunk with its fingerprint and corpus-wide copy count —
    * the signal a storage/dedup layer uses to dedupe shared spans across
    * near-identical documents.
    *
    * Scale posture: boundary flags are computed in one narrow projection
    * (array HOF over each doc, no self-join); the per-doc running boundary
    * count is a window PARTITIONED by doc_id riding the same doc_id
    * exchange the chunk reassembly groupBy reuses; the only extra shuffle
    * is the fingerprint copy-count (an inherent global groupBy), joined
    * back on the same key. md5-derived boundaries replay exactly in the
    * oracle.
    */
  private def cdcChunking(s: SparkSession, dir: String): DataFrame = {
    // chunking runs ENTIRELY in the array domain: boundary positions, chunk
    // spans, and fingerprints are one narrow projection per document — no
    // per-token explode, no per-doc window, no reassembly shuffle. The only
    // rows that ever leave the map side are the ~16×-smaller chunk rows,
    // and the only shuffle is the inherent fingerprint copy-count groupBy.
    // (The first formulation exploded tokens through a doc-partitioned
    // window + groupBy — same answer, 3 extra corpus-scale stages, measured
    // 2.6 s → this one at sf0.1.)
    val chunks = docs(s, dir)
      .repartition(col("doc_id")) // single-file scan → parallelize the HOFs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")))
      // boundaries AFTER position i (only i < n: a last-token boundary
      // opens no new chunk)
      .withColumn("bpos",
        filter(sequence(lit(1), col("n")),
          i => i >= CDC_WIN && i < col("n") &&
            substring(md5(concat_ws(" ",
              slice(col("toks"), i - (CDC_WIN - 1), lit(CDC_WIN)))), 32, 1)
              === CDC_MASK_HEX))
      .withColumn("starts",
        concat(array(lit(1)), transform(col("bpos"), p => p + 1)))
      .withColumn("ends", concat(col("bpos"), array(col("n"))))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("bpos"))), k =>
          struct(
            k.cast("long").as("chunk_idx"),
            (element_at(col("ends"), k + 1)
              - element_at(col("starts"), k + 1) + 1).cast("long").as("n_toks"),
            md5(concat_ws(" ", slice(col("toks"),
              element_at(col("starts"), k + 1),
              element_at(col("ends"), k + 1)
                - element_at(col("starts"), k + 1) + 1))).as("fp")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.n_toks"), col("c.fp"))
    val copies = chunks.groupBy(col("fp")).agg(count(lit(1)).as("n_copies"))
    chunks.join(copies, "fp")
      .select(col("doc_id"), col("chunk_idx"), col("n_toks"), col("fp"),
        col("n_copies"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private def cdcChunkingSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), p0 AS (
       |  SELECT doc_id, toks,
       |         unnest(generate_series(1, len(toks))) AS pos
       |  FROM t
       |), p1 AS (
       |  SELECT doc_id, pos, toks[pos] AS tok,
       |         pos >= $CDC_WIN AND substr(md5(${(0 until CDC_WIN).reverse
                  .map(k => s"toks[pos-$k]").mkString(" || ' ' || ")}), 32, 1)
                  = '$CDC_MASK_HEX' AS b
       |  FROM p0
       |), ch AS (
       |  SELECT doc_id, pos, tok,
       |         COALESCE(SUM(CASE WHEN b THEN 1 ELSE 0 END) OVER
       |           (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS chunk_idx
       |  FROM p1
       |), agg AS (
       |  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |         CAST(COUNT(*) AS BIGINT) AS n_toks,
       |         md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
       |  FROM ch GROUP BY doc_id, chunk_idx
       |), copies AS (
       |  SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_copies FROM agg GROUP BY fp
       |)
       |SELECT a.doc_id, a.chunk_idx, a.n_toks, a.fp, c.n_copies
       |FROM agg a JOIN copies c USING (fp)
       |ORDER BY a.doc_id, a.chunk_idx""".stripMargin

  private val DUP_GRAM = 5

  /** Exact-substring dedup by duplicated-span REMOVAL (the Lee et al.
    * "Deduplicating Training Data Makes Language Models Better" shape,
    * applied at token-gram granularity): any [[DUP_GRAM]]-token gram that
    * also appears in an earlier document (min doc_id keeps its copy) marks
    * its token span for removal; the output is the cleaned text with all
    * covered positions dropped, plus removal counts. Unlike
    * `shingle_novelty` (a per-doc metric), this is the TRANSFORMATION — a
    * user gets back a de-duplicated corpus, not a score.
    *
    * Scale posture: grams are hashed to 64 bits before the shuffle, so the
    * duplicate-detection exchange carries (doc_id, pos, 8-byte key) — never
    * gram strings (at 100 TB real pipelines hash 50-grams the same way; a
    * ~2⁻⁶⁰ collision over-masks one span, the standard trade). First-
    * occurrence is one hash aggregate; masked spans flatten into a per-doc
    * covered-position array (bounded by doc length) with NO per-position
    * explode on the rebuild side — the cleaned text is a single indexed
    * `filter` HOF over the original token array, codegen'd, shuffle-free.
    */
  private def dupSpanRemoval(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .repartition(col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")))
    // <DUP_GRAM tokens → no gram; guard against Spark's downward sequence
    val grams = base.filter(col("n") >= DUP_GRAM)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), col("n") - (DUP_GRAM - 1)),
          p => struct(p.as("p"),
            conv(substring(md5(array_join(
              slice(col("toks"), p, lit(DUP_GRAM)), " ")), 1, 15), 16, 10)
              .cast("long").as("gh")))).as("g"))
      .select(col("doc_id"), col("g.p").as("p"), col("g.gh").as("gh"))
    val firstDoc = grams.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("first_doc"))
    val cov = grams.join(firstDoc, "gh")
      .filter(col("doc_id") > col("first_doc"))
      .groupBy(col("doc_id"))
      .agg(flatten(collect_list(
        sequence(col("p"), col("p") + (DUP_GRAM - 1)))).as("cov"))
    base.join(cov, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), expr("CAST(array() AS ARRAY<INT>)")))
      .withColumn("kept",
        expr("filter(toks, (t, i) -> NOT array_contains(cov, i + 1))"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        (col("n") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("cleaned_text"))
      .orderBy(col("doc_id"))
  }

  private def dupSpanRemovalSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |         len(string_split(text, ' ')) AS n
       |  FROM documents
       |), grams AS (
       |  SELECT doc_id, p,
       |    CAST(concat('0x', substr(md5(
       |      array_to_string(toks[p:p + ${DUP_GRAM - 1}], ' ')), 1, 15))
       |      AS BIGINT) AS gh
       |  FROM (
       |    SELECT doc_id, toks,
       |           unnest(generate_series(1, n - ${DUP_GRAM - 1})) AS p
       |    FROM d WHERE n >= $DUP_GRAM)
       |), fd AS (
       |  SELECT gh, MIN(doc_id) AS first_doc FROM grams GROUP BY gh
       |), covpos AS (
       |  SELECT DISTINCT doc_id, pos FROM (
       |    SELECT g.doc_id,
       |           unnest(generate_series(g.p, g.p + ${DUP_GRAM - 1})) AS pos
       |    FROM grams g JOIN fd USING (gh) WHERE g.doc_id > fd.first_doc)
       |), covl AS (
       |  SELECT doc_id, list(pos) AS cov FROM covpos GROUP BY doc_id
       |), kept AS (
       |  SELECT d.doc_id, d.n,
       |    list_filter(d.toks,
       |      (t, i) -> NOT list_contains(COALESCE(c.cov, CAST([] AS BIGINT[])), i))
       |      AS kept
       |  FROM d LEFT JOIN covl c USING (doc_id)
       |)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  CAST(n - len(kept) AS BIGINT) AS n_removed,
       |  COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
       |FROM kept ORDER BY doc_id""".stripMargin

  /** Shingle novelty: the fraction of a document's distinct shingles whose
    * FIRST corpus occurrence (min doc_id) is this document — the marginal-
    * contribution metric behind "does this doc add anything new". First
    * occurrence is one aggregate over the shingle table; novelty is a
    * broadcast-joinless per-doc ratio (the first-seen table re-joins on the
    * same (doc, shingle) rows it came from).
    */
  private def shingleNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = DedupOps.shingles(s, dir).cache()
    val firstSeen = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, "sh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty", col("n_novel").cast("double") / col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  private def shingleNoveltySql: String =
    s"""WITH sh AS (${DedupOps.shinglesSql}),
       |first_seen AS (
       |  SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh
       |)
       |SELECT s.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_novel,
       |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS novelty
       |FROM sh s JOIN first_seen f USING (sh)
       |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  /** Vocabulary growth (the Heaps-law curve): cumulative distinct tokens
    * after each document in doc_id order. Each token contributes at its
    * first document (min doc_id) — one aggregate — and the curve is a
    * running sum over the per-doc new-token counts via the two-level
    * prefix sum in [[PrefixOps]]: no unpartitioned window, so the cumsum
    * parallelizes across doc_id buckets instead of funneling the whole
    * docs domain through one reducer.
    */
  private def vocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val firstDoc = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("new_tokens"))
    val perDoc = docs(s, dir).select(col("doc_id"))
      .join(firstDoc, col("doc_id") === col("first_doc"), "left")
      .select(col("doc_id"), coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
    PrefixOps.withGlobalPrefix(perDoc, col("doc_id"), Seq(col("doc_id")),
        sums = Seq("new_tokens"))
      .select(col("doc_id"), col("new_tokens"),
        col("g_run_new_tokens").as("vocab_size"))
      .filter(col("doc_id") % 50 === 0) // sample the curve, keep output small
      .orderBy(col("doc_id"))
  }

  private def vocabGrowthSql: String =
    """WITH first_doc AS (
      |  SELECT tok, MIN(doc_id) AS first_doc
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok
      |), per_doc AS (
      |  SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_tokens
      |  FROM first_doc GROUP BY 1
      |), curve AS (
      |  SELECT d.doc_id,
      |    COALESCE(p.new_tokens, 0) AS new_tokens,
      |    CAST(SUM(COALESCE(p.new_tokens, 0)) OVER (ORDER BY d.doc_id
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
      |  FROM (SELECT doc_id FROM documents) d
      |  LEFT JOIN per_doc p USING (doc_id)
      |)
      |SELECT doc_id, new_tokens, vocab_size FROM curve
      |WHERE doc_id % 50 = 0 ORDER BY doc_id""".stripMargin

  /** BPE-training inner step: global counts of ADJACENT token pairs — the
    * statistic a byte-pair-encoding trainer recomputes each merge round to
    * pick the next merge. explode → partial hash-agg → pre-shuffle top-k;
    * the shuffle carries (pair, partial count), never raw text. Docs with
    * fewer than two tokens are filtered BEFORE the index explode (Spark's
    * `sequence(1, 0)` runs downward — the known divergence class).
    */
  private def bpePairCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(50)

  private val bpePairCountsSql: String =
    """SELECT pair, CAST(COUNT(*) AS BIGINT) AS freq
      |FROM (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
      |             i -> toks[i] || ' ' || toks[i + 1])) AS pair
      |      FROM (SELECT string_split(text, ' ') AS toks FROM documents)
      |      WHERE len(toks) >= 2)
      |GROUP BY pair ORDER BY freq DESC, pair LIMIT 50""".stripMargin

  /** Unigram Shannon entropy per document — the information-density quality
    * signal (low entropy = templated/repetitive text). Exact cross-engine
    * arithmetic: per-(doc, term) ln(count) quantized to millis (the
    * double-round ulp-absorbing pattern from bigram_lm_score), summed as
    * BIGINT, and H = ln n − Σ c·ln c / n assembled in integer micros with
    * one final IEEE division. Two hash-aggregates over exploded tokens;
    * the shuffle carries (doc, term, partial count).
    */
  private def tokenEntropy(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
      .withColumn("lc_milli",
        round(round(log(col("c").cast("double")), 3) * 1000).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(col("c") * col("lc_milli")).as("s_milli"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_terms"),
        ((round(round(log(col("n_tokens").cast("double")), 3) * 1000)
            .cast("long") * 1000 -
          expr("(s_milli * 1000) div n_tokens")).cast("double") / 1e6)
          .as("entropy"))
      .orderBy(col("doc_id"))

  private val tokenEntropySql: String =
    """WITH tc AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2
      |), agg AS (
      |  SELECT doc_id,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms,
      |    CAST(SUM(c * CAST(ROUND(ROUND(ln(c), 3) * 1000) AS BIGINT))
      |         AS BIGINT) AS s_milli
      |  FROM tc GROUP BY 1
      |)
      |SELECT doc_id, n_tokens, n_terms,
      |  CAST(CAST(ROUND(ROUND(ln(n_tokens), 3) * 1000) AS BIGINT) * 1000
      |       - (s_milli * 1000) // n_tokens AS DOUBLE) / 1e6 AS entropy
      |FROM agg ORDER BY doc_id""".stripMargin

  private val BpeRounds = 4

  /** LEARNED byte-pair-encoding merges — trained operator #3 next to
    * k-means and the power-iteration PCA: the first `BpeRounds` merge
    * rules a BPE tokenizer trainer would learn from this corpus
    * (argmax adjacent-symbol pair by weighted count, merge, repeat).
    * [[bpePairCounts]] counts round-1 pairs; this runs the actual
    * training loop.
    *
    * Scale posture: the working table is the VOCABULARY (distinct words
    * with counts — bounded by the language, not the corpus; the corpus is
    * read once to build it). Each round is one explode + hash aggregate
    * over the vocab, a TakeOrdered(1) argmax, and a broadcast-merge
    * rewrite; rounds are materialized (cache + count, the dedup_clusters
    * lesson) so lineage stays flat. Words are symbol sequences in a
    * sentinel string form `<s1><s2>…` so the merge is ONE non-regex
    * replace — `replace` scans left-to-right non-overlapping in both
    * engines, which is exactly BPE's greedy merge order, and the
    * per-symbol <> wrapping makes cross-boundary false matches
    * structurally impossible. Argmax ties break (count desc, a, b) —
    * fully deterministic; the oracle replays all rounds as unrolled CTEs.
    * Only [a-z]+ words train (multi-byte char segmentation differs
    * between engines; a real byte-level trainer would pre-map to bytes).
    */
  /** Learned merge rules per data dir, memoized like the k-means/PQ
    * codebooks: training is deterministic and the result is `BpeRounds`
    * rows — exactly the "model" a real trainer persists, so carrying it
    * on the driver is the kmeans-centroid shape, never data. */
  private val bpeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, String, String, Long)]]()

  private def bpeBaseVocab(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("cnt"))
      .select(col("w").as("word"),
        regexp_replace(col("w"), "(.)", "<$1>").as("repr"), col("cnt"))

  /** The BPE training loop: `BpeRounds` argmax-merge rounds over the
    * vocabulary (each round's 1-row winner materialized and broadcast
    * into the next round's one-`replace` rewrite). */
  private def bpeLearn(s: SparkSession, dir: String): Seq[(Long, String, String, Long)] =
    bpeMemo.computeIfAbsent(dir, { _ =>
      var vocab = bpeBaseVocab(s, dir).cache()
      vocab.count()
      val bests = Seq.newBuilder[(Long, String, String, Long)]
      for (r <- 1 to BpeRounds) {
        val pc = vocab
          .withColumn("syms",
            split(expr("substring(repr, 2, length(repr) - 2)"), "><"))
          .filter(size(col("syms")) >= 2) // 1-symbol words carry no pairs
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
            .as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).cast("long").as("c"))
        val best = pc.orderBy(col("c").desc, col("a"), col("b")).limit(1)
          .select(col("a"), col("b"), col("c")).collect()
        if (best.nonEmpty) {
          val (a, b, c) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          bests += ((r.toLong, a, b, c))
          // a, b are [a-z]+ by the vocab filter — safe as SQL literals
          val next = vocab.select(col("word"),
            expr(s"replace(repr, '<$a><$b>', '<$a$b>')").as("repr"),
            col("cnt")).cache()
          next.count()
          vocab.unpersist()
          vocab = next
        }
      }
      vocab.unpersist()
      bests.result()
    })

  /** The final merged vocabulary (word, repr, cnt): the memoized rules
    * folded over the base vocab as literal replaces — one narrow pass. */
  private def bpeMergedVocab(s: SparkSession, dir: String): DataFrame =
    bpeLearn(s, dir).foldLeft(bpeBaseVocab(s, dir)) {
      case (df, (_, a, b, _)) =>
        df.withColumn("repr", expr(s"replace(repr, '<$a><$b>', '<$a$b>')"))
    }

  private def bpeLearnedMerges(s: SparkSession, dir: String): DataFrame =
    s.createDataFrame(bpeLearn(s, dir))
      .toDF("round", "sym_a", "sym_b", "pair_count")
      .withColumn("merged", concat(col("sym_a"), col("sym_b")))
      .orderBy(col("round"))

  /** Tokenizer-compression eval for the learned merges — the readout that
    * justifies a vocab size: per source, characters (= symbols before any
    * merge) vs symbols after the [[bpeLearn]] merges, as exact
    * integer ppm. The learned rules fold over the base vocab as literal
    * replaces ([[bpeMergedVocab]] — one narrow pass, no retraining); the
    * corpus term table joins the ≤vocabulary-sized merged-vocab broadcast
    * on the word itself; everything else is hash aggregates.
    */
  private def bpeCompression(s: SparkSession, dir: String): DataFrame = {
    val merged = bpeMergedVocab(s, dir).select(col("word"),
      size(split(expr("substring(repr, 2, length(repr) - 2)"), "><"))
        .cast("long").as("syms_after"))
    val srcWords = Tables.t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    srcWords.join(broadcast(merged), "word")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).cast("long").as("n_words"),
        sum(col("cnt") * length(col("word"))).cast("long").as("n_chars"),
        sum(col("cnt") * col("syms_after")).cast("long").as("n_tokens"))
      .withColumn("compression_ppm",
        expr("n_tokens * 1000000 div n_chars"))
      .orderBy(col("source"))
  }

  private val bpeCompressionSql: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val prev = s"v${r - 1}"
      s""",
         |s$r AS (
         |  SELECT string_split(substr(repr, 2, length(repr) - 2), '><')
         |           AS syms, cnt
         |  FROM $prev
         |), p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM s$r, unnest(generate_series(1, len(syms) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), b$r AS (
         |  SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1
         |), v$r AS (
         |  SELECT word, replace(repr, '<' || b$r.a || '><' || b$r.b || '>',
         |                 '<' || b$r.a || b$r.b || '>') AS repr, cnt
         |  FROM $prev CROSS JOIN b$r
         |)""".stripMargin
    }.mkString
    s"""WITH words AS (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) s
       |  WHERE regexp_full_match(w, '[a-z]+')
       |  GROUP BY 1
       |), v0 AS (
       |  SELECT word, regexp_replace(word, '(.)', '<\\1>', 'g') AS repr, cnt
       |  FROM words
       |)$rounds,
       |merged AS (
       |  SELECT word,
       |    CAST(len(string_split(substr(repr, 2, length(repr) - 2), '><'))
       |         AS BIGINT) AS syms_after
       |  FROM v$BpeRounds
       |), src_words AS (
       |  SELECT source, w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) s
       |  WHERE regexp_full_match(w, '[a-z]+')
       |  GROUP BY 1, 2
       |)
       |SELECT sw.source, CAST(SUM(sw.cnt) AS BIGINT) AS n_words,
       |  CAST(SUM(sw.cnt * length(sw.word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(sw.cnt * m.syms_after) AS BIGINT) AS n_tokens,
       |  CAST(SUM(sw.cnt * m.syms_after) AS BIGINT) * 1000000
       |    // CAST(SUM(sw.cnt * length(sw.word)) AS BIGINT) AS compression_ppm
       |FROM src_words sw JOIN merged m ON m.word = sw.word
       |GROUP BY 1 ORDER BY sw.source""".stripMargin
  }

  private val bpeLearnedMergesSql: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val prev = s"v${r - 1}"
      s""",
         |s$r AS (
         |  SELECT string_split(substr(repr, 2, length(repr) - 2), '><')
         |           AS syms, cnt
         |  FROM $prev
         |), p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM s$r, unnest(generate_series(1, len(syms) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), b$r AS (
         |  SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1
         |), v$r AS (
         |  SELECT replace(repr, '<' || b$r.a || '><' || b$r.b || '>',
         |                 '<' || b$r.a || b$r.b || '>') AS repr, cnt
         |  FROM $prev CROSS JOIN b$r
         |)""".stripMargin
    }.mkString
    val selects = (1 to BpeRounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, a AS sym_a, b AS sym_b, " +
        s"c AS pair_count, a || b AS merged FROM b$r"
    }.mkString("\nUNION ALL\n")
    s"""WITH words AS (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) s
       |  WHERE regexp_full_match(w, '[a-z]+')
       |  GROUP BY 1
       |), v0 AS (
       |  SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS repr, cnt
       |  FROM words
       |)$rounds
       |SELECT * FROM (
       |$selects
       |) ORDER BY round""".stripMargin
  }

  /** Tokenizer-vocabulary coverage: per-source out-of-vocabulary token
    * rate against the corpus top-1000 vocabulary (count desc, token asc —
    * a total order, so the cut is deterministic). The thing to check
    * before committing a tokenizer vocab: which sources a fixed vocab
    * under-serves. Scale posture: the vocab cut is a TakeOrderedAndProject
    * (bounded heap pre-shuffle, never a global sort) and the 1000-row
    * vocab broadcasts; the corpus side is one explode + broadcast-left
    * join + per-source aggregate — no fat shuffle. The rate is an exact
    * integer ppm.
    */
  private def oovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
    val vocab = toks.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("c"))
      .orderBy(col("c").desc, col("term")).limit(1000)
      .select(col("term"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
      .orderBy(col("source"))
  }

  private val oovRateSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), vocab AS (
      |  SELECT term FROM (
      |    SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1)
      |  ORDER BY c DESC, term LIMIT 1000
      |)
      |SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // CAST(COUNT(*) AS BIGINT) AS oov_ppm
      |FROM toks t LEFT JOIN vocab v ON t.term = v.term
      |GROUP BY 1 ORDER BY t.source""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("bpe_learned_merges", bpeLearnedMerges, Some(bpeLearnedMergesSql)),
    Q("bpe_compression", bpeCompression, Some(bpeCompressionSql)),
    Q("oov_rate", oovRate, Some(oovRateSql)),
    Q("bpe_pair_counts", bpePairCounts, Some(bpePairCountsSql)),
    Q("token_entropy", tokenEntropy, Some(tokenEntropySql)),
    Q("bm25_score", bm25Score, Some(
      s"""WITH ${bm25ScoredSql}
         |SELECT doc_id, n_terms, bm25 FROM bm
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)),
    Q("shingle_novelty", shingleNovelty, Some(shingleNoveltySql)),
    Q("dup_span_removal", dupSpanRemoval, Some(dupSpanRemovalSql)),
    Q("vocab_growth", vocabGrowth, Some(vocabGrowthSql)),
    Q("sequence_packing", sequencePacking, Some(sequencePackingSql)),
    Q("shard_plan", shardPlan, Some(shardPlanSql)),
    Q("doc_chunking", docChunking, Some(docChunkingSql)),
    Q("cdc_chunking", cdcChunking, Some(cdcChunkingSql)),
    Q("rolling_fingerprint", rollingFingerprint, Some(
      // iterate UTF-8 BYTES via hex pairs: the RollingHash expression hashes
      // bytes, while ascii(substr(text,i,1)) walks CODEPOINTS — identical on
      // ASCII, divergent on multi-byte text (hostile-fixture finding)
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        |SELECT doc_id,
        |  CAST(list_reduce(
        |    list_prepend(CAST(0 AS HUGEINT),
        |      list_transform(generate_series(1, length(hx) // 2),
        |        i -> CAST(CAST(concat('0x', substr(hx, 2 * i - 1, 2)) AS BIGINT)
        |                  AS HUGEINT))),
        |    (h, b) -> (h * 257 + b) % 2305843009213693951) AS BIGINT) AS fp_roll
        |FROM h ORDER BY doc_id""".stripMargin)),
    Q("contamination_check", contaminationCheck, Some(
      s"""WITH sh AS (${DedupOps.shinglesSql}),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10)
         |SELECT s.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_contaminated,
         |  CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS contamination
         |FROM sh s LEFT JOIN bench b ON s.sh = b.sh
         |WHERE s.doc_id >= 10
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin)),
    Q("bigram_collocations", bigramCollocations, Some(bigramCollocationsSql)),
    Q("dsir_importance_weights", dsirImportanceWeights,
      Some(dsirImportanceWeightsSql)),
    Q("winnowing_fingerprints", winnowingFingerprints,
      Some(winnowingFingerprintsSql)),
    Q("kn_bigram_score", knBigramScore, Some(knBigramScoreSql)),
    Q("span_corruption_plan", spanCorruptionPlan, Some(spanCorruptionPlanSql)),
    Q("tokenizer_fertility", tokenizerFertility, Some(tokenizerFertilitySql)),
    Q("bigram_lm_score", bigramLmScore, Some(
      """WITH bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(toks) - 1),
        |                i -> toks[i] || ' ' || toks[i+1])) AS bg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |), bgw AS (
        |  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bg
        |), c2 AS (
        |  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM bgw GROUP BY 1
        |), c1 AS (
        |  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bgw GROUP BY 1
        |), v AS (
        |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |), scored AS (
        |  SELECT bgw.doc_id,
        |         CAST(ROUND(ROUND(LN((c2.c2 + 1.0) / (c1.c1 + v.vocab)), 3) * 1000)
        |              AS BIGINT) AS lp_milli
        |  FROM bgw JOIN c2 USING (bg) JOIN c1 USING (w1) CROSS JOIN v
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(lp_milli) AS DOUBLE) / COUNT(*) / 1000.0 AS avg_logp
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    Q("token_stats", tokenStats, Some(
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha,
        |  CAST(CEIL(n_chars / 4.0) AS BIGINT) AS bpe_est,
        |  (n_chars - (len(string_split(text, ' ')) - 1))
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin)),
    Q("term_frequencies", termFrequencies, Some(
      """SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY freq DESC, term LIMIT 50""".stripMargin)),
    Q("rake_keywords", rakeKeywords, Some(rakeKeywordsSql)),
    Q("tf_idf", tfIdf, Some(
      """WITH tokens AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tokens GROUP BY 1, 2
        |), df AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), n AS (
        |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |         ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 3) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |  WHERE tf.doc_id < 100
        |), ranked AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |            ORDER BY tfidf DESC, term) AS BIGINT) AS rk
        |  FROM scored
        |)
        |SELECT doc_id, rk, term, tf, df, tfidf FROM ranked
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),
    Q("lang_id", langId, Some(langIdSql)),
    Q("lang_confusion", langConfusion, Some(langConfusionSql(langIdSql))),
    Q("zipf_slope", zipfSlope, Some(zipfSlopeSql)),
    Q("quality_score", qualityScore, Some(qualityScoreSql)),
    Q("doc_fingerprint", fingerprint, Some(
      """SELECT doc_id, md5(lower(text)) AS fp_md5,
        |  CAST(concat('0x', substr(md5(lower(text)), 1, 15)) AS BIGINT) AS fp64
        |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
