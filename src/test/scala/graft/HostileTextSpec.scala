package graft

import org.apache.spark.sql.functions._

/** Tokenization-family semantics under hostile text. The synthetic corpus
  * has ZERO documents with leading/trailing/double spaces, empty strings, or
  * multi-byte characters at any SF (verified by probe), so the DuckDB oracle
  * can never exercise the `split(' ')`-family edge cases there. The
  * `fixtures/hostile` corpus (tools/make_hostile.py) adds exactly those rows;
  * the full Verify + oracle compare runs green against it dev-side, and this
  * spec pins the Spark-side semantics so a regression is caught in `sbt test`
  * without DuckDB. Divergences this corpus has already caught (and whose
  * fixes it now guards): byte-vs-char levenshtein, byte-vs-codepoint payload
  * checksums/fingerprints, md5-of-NULL on empty resize output.
  */
class HostileTextSpec extends SparkSpec {

  private val dir = "fixtures/hostile"

  // every catalog query whose only input table is `documents` — the fixture
  // dir deliberately holds nothing else, so an out-of-date entry here fails
  // loudly with file-not-found instead of silently skipping
  private val docQueries = Seq(
    "token_stats", "quality_score", "lang_id", "term_frequencies", "tf_idf",
    "doc_fingerprint", "rolling_fingerprint", "sequence_packing",
    "doc_chunking", "shingle_novelty", "dup_span_removal", "vocab_growth",
    "bigram_lm_score", "bigram_collocations",
    "repetition_score", "gopher_quality_filter", "boilerplate_shingles",
    "contamination_check", "exact_dedup", "minhash_signatures",
    "minhash_lsh_pairs", "simhash", "simhash_pairs", "ngram_jaccard_pairs",
    "dedup_clusters", "cluster_keep_best", "incremental_dedup",
    "rake_keywords",
    "jaccard_prefix_join", "minhash_calibration", "clustering_agreement",
    "levenshtein_pairs", "bm25_score", "weighted_sample",
    "bpe_pair_counts", "token_entropy", "temperature_mixture",
    "cms_heavy_hitters", "corpus_topp_select",
    "multimodal_meta", "multimodal_features", "multimodal_resize",
    "multimodal_frame_sample", "source_mixture_weights",
    "payload_frame_dup", "cluster_size_histogram", "source_dedup_matrix",
    "jaccard_histogram", "cdc_chunking", "containment_pairs",
    "bloom_decontaminate", "lang_confusion", "zipf_slope",
    "curriculum_phases", "epoch_plan", "fellegi_sunter", "oov_rate",
    "bpe_learned_merges", "bpe_compression", "dsir_importance_weights",
    "winnowing_fingerprints", "token_budget_waterfill",
    "crossdoc_dup_spans", "dup_span_coverage", "kn_bigram_score",
    "span_corruption_plan", "tokenizer_fertility", "shard_plan",
    // streaming near-dup replay (ReplayOps) reads only documents: empty /
    // whitespace-only docs flow through the md5 band-key state pipeline
    "streaming_neardup_replay",
    // round 8: decode plumbing over real PNGs keyed by doc_id; blocking /
    // leakage / shuffle / padding reports over the hostile corpus
    "media_decode_real", "blocking_quality", "split_leakage_report",
    "epoch_shuffle", "padding_waste_report", "streaming_decontaminate_replay",
    "lsh_scurve_eval")

  test("every documents-backed query survives the hostile corpus, twice") {
    docQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run() = fn(spark, dir).collect().map(_.toSeq.mkString("|")).toSeq
      val first = run()
      assert(run() == first, s"$name nondeterministic on hostile corpus")
      spark.catalog.clearCache()
    }
  }

  test("token counts on hostile whitespace follow split-on-single-space") {
    val got = SparkEntry.queries("token_stats")(spark, dir)
      .filter(col("doc_id") >= 500)
      .select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      500L -> 1L,  // ""            -> [""]
      501L -> 2L,  // " "           -> ["", ""]
      502L -> 4L,  // "   "         -> ["", "", "", ""]
      503L -> 1L,  // "hello"
      504L -> 2L,  // "hello world"
      505L -> 2L,  // " leading"    -> ["", "leading"]
      506L -> 2L,  // "trailing "   -> ["trailing", ""] (split keeps trailing)
      507L -> 4L,  // " both sides "
      508L -> 3L,  // "double  space" -> ["double", "", "space"]
      511L -> 3L,  // "line\nbreak token stream": \n is not a delimiter
      514L -> 4L)  // "!!! ??? ... ---"
    expected.foreach { case (id, n) =>
      assert(got(id) == n, s"doc $id: expected $n tokens, got ${got(id)}")
    }
  }

  test("multimodal payloads count UTF-8 bytes, not characters") {
    val row = SparkEntry.queries("multimodal_features")(spark, dir)
      .filter(col("doc_id") === 512) // "héllo wörld café 世界": 19 chars
      .select("n_bytes", "head_byte")
      .collect().head
    // h(1) é(2) llo(3) sp(1) w(1) ö(2) rld(3) sp(1) caf(3) é(2) sp(1) 世界(6)
    assert(row.getLong(0) == 26, s"n_bytes: ${row.getLong(0)}")
    assert(row.getLong(1) == 'h'.toLong)
  }

  test("empty and whitespace-only docs produce well-defined chunk and pack rows") {
    val packs = SparkEntry.queries("sequence_packing")(spark, dir)
      .filter(col("doc_id").between(500, 502))
      .select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packs == Map(500L -> 1L, 501L -> 2L, 502L -> 4L))
    // chunking must not lose the empty doc or emit a zero-length chunk set
    val chunks = SparkEntry.queries("doc_chunking")(spark, dir)
      .filter(col("doc_id") === 500).count()
    assert(chunks == 1L, s"empty doc should yield exactly one chunk, got $chunks")
  }
}
