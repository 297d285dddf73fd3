package graft

import org.apache.spark.sql.functions._

/** Similarity/ANN-family semantics under hostile embeddings. The synthetic
  * table is unit-scale with no zero-norm vectors, exact duplicates, axis
  * vectors or sub-quantization components at any SF (verified by probe), so
  * the DuckDB oracle can never exercise the zero-norm-cosine or tie-break
  * edge cases there. The `fixtures/hostile_embeddings` table
  * (tools/make_hostile_embeddings.py) adds exactly those rows; the full
  * embeddings-only Verify + oracle compare runs green against it dev-side,
  * and this spec pins the Spark-side semantics so a regression is caught in
  * `sbt test` without DuckDB.
  *
  * Divergence class this fixture caught (now guarded centrally in
  * SimilarityOps.cosineQ): a zero-QUANTIZED-norm vector — all-zero, or all
  * components under the 1e-8 quantization floor — aborted nine queries
  * under Spark ANSI division-by-zero where DuckDB yields NULL.
  */
class HostileEmbeddingsSpec extends SparkSpec {

  private val dir = "fixtures/hostile_embeddings"

  // every catalog query whose only input table is `embeddings`
  private val embQueries = Seq(
    "ann_ivf", "ann_lsh", "ann_recall_eval", "cluster_balanced_sample",
    "cosine_near_dup", "cosine_topk", "cosine_topk_fast",
    "embedding_norm_outliers", "embedding_stats", "int8_quantization_error",
    "jl_projection",
    "kmeans_trained", "knn_classify", "label_centroids", "mutual_knn",
    "pca_projection", "pq_ann_eval", "pq_quantization", "semantic_dedup",
    // round 9: classifier eval + contrastive/RAG rerank
    "roc_auc", "calibration_bins", "hard_negatives", "mmr_diversify",
    // round 10: truncated-dimension retrieval eval
    "matryoshka_recall")

  test("every embeddings-backed query survives the hostile fixture, twice") {
    embQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run() = fn(spark, dir).collect().map(_.toSeq.mkString("|")).toSeq
      val first = run()
      assert(run() == first, s"$name nondeterministic on hostile embeddings")
      spark.catalog.clearCache()
    }
  }

  test("zero-norm vectors never surface a cosine, sub-quantization vectors " +
      "count as zero-norm") {
    // vec_ids 500/501 are all-zero; 507 is a 4e-7 fill whose every
    // component quantizes to 0 — none may appear as a top-k candidate
    // with a non-null cosine
    val topk = SparkEntry.queries("cosine_topk")(spark, dir)
    val zeroIds = Set(500L, 501L, 507L)
    val offending = topk.filter(col("c_id").isin(zeroIds.toSeq: _*)
        && col("cosine").isNotNull).count()
    assert(offending === 0, "zero-quantized-norm candidate got a cosine")
  }

  test("exact duplicates rank each other at cosine 1, ties broken by id") {
    // 502/503 are identical 0.1-fill vectors: each is the other's top
    // neighbor at exactly 1.0 (integer dot over quantized components —
    // no float fold noise)
    val pairs = SparkEntry.queries("cosine_near_dup")(spark, dir)
      .filter(col("a_id") === 502L && col("b_id") === 503L)
      .select(col("cosine")).collect()
    assert(pairs.length == 1 && pairs.head.getDouble(0) === 1.0,
      s"duplicate pair must land at exactly cosine 1.0: ${pairs.toSeq}")
  }
}
