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

  test("decodeImageBatch: real javax.imageio PNG round-trip recovers the " +
      "generated ramp exactly") {
    val decoded = MultimodalOps.decodeImageBatch(
      MultimodalOps.pngTable(spark, sf001)).collect()
      .map(d => d.doc_id -> d).toMap
    assert(decoded.size === 500)
    // hand-checked examples + full closed-form recompute
    decoded.values.foreach { d =>
      val (w, h) = (4 + d.doc_id % 13, 3 + d.doc_id % 7)
      assert(d.width === w && d.height === h)
      assert(d.channels === 1L) // TYPE_BYTE_GRAY survives the PNG round-trip
      val expectedSum = (for {
        x <- 0L until w
        y <- 0L until h
      } yield (d.doc_id * 31 + x * 7 + y * 13) % 256).sum
      assert(d.pixel_sum === expectedSum, s"doc ${d.doc_id}")
      assert(d.px00 === d.doc_id * 31 % 256)
    }
    // the payloads are REAL PNGs, not synthetic bytes
    val first = MultimodalOps.pngTable(spark, sf001).head()
    assert(first.png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)) // PNG magic
  }

  test("payload column prunes away for metadata-only projections") {
    val plan = MultimodalOps.mediaTable(spark, sf001)
      .select($"doc_id", $"lang")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload") || !plan.contains("text"),
      s"metadata projection should not read text/payload:\n$plan")
  }
}
