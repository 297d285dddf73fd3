package graft

import graft.operators.MultimodalOps

/** Multimodal plumbing: typed binary payloads through batched mapPartitions. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBatch features are deterministic and consistent with metadata") {
    val feats = MultimodalOps.decodeBatch(spark, sf001).collect()
      .map(f => f.doc_id -> f).toMap
    val meta = MultimodalOps.mediaTable(spark, sf001)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    assert(feats.nonEmpty)
    feats.values.foreach { f =>
      // utf-8 of ascii text: byte length == char length
      assert(f.n_bytes === meta(f.doc_id))
      assert(f.n_frames === (f.n_bytes + 255) / 256)
      assert(f.head_byte >= 0 && f.head_byte < 256)
    }
    // determinism: second run bit-identical
    val again = MultimodalOps.decodeBatch(spark, sf001).collect()
      .map(f => f.doc_id -> f).toMap
    assert(again === feats)
  }

  test("payload column prunes away for metadata-only projections") {
    val plan = MultimodalOps.mediaTable(spark, sf001)
      .select($"doc_id", $"lang")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload") || !plan.contains("text"),
      s"metadata projection should not read text/payload:\n$plan")
  }
}
