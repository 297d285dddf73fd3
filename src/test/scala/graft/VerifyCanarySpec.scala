package graft

import java.nio.file.Files

/** Canary for the driver's Verify → parquet → DuckDB channel (VERDICT r4 #1):
  * `sequence_packing` was driver-red / judge-green in round 4. This pins the
  * repo-side half of the channel — the query is run twice and written through
  * Verify's exact write path (coalesce(1), overwrite), and both the re-read
  * parquet and the second in-memory run must be value-identical to the first.
  * Any nondeterminism (ordering, overflow, codegen) would trip this locally
  * before the driver ever sees it.
  */
class VerifyCanarySpec extends SparkSpec {

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.collect().map(_.toSeq.mkString("|")).toSeq
  }

  test("sequence_packing is deterministic across runs and parquet round-trip") {
    val out = Files.createTempDirectory("canary").toString
    val first = rows("sequence_packing")
    // (source, doc_id) must be a total order key — the window's determinism
    // rests on it
    val keys = first.map(_.split("\\|").take(2).mkString("|"))
    assert(keys.distinct.size == keys.size, "(source, doc_id) not unique")

    SparkEntry.queries("sequence_packing")(spark, sf001)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/sequence_packing")
    val reread = spark.read.parquet(s"$out/sequence_packing")
      .orderBy("source", "doc_id")
      .collect().map(_.toSeq.mkString("|")).toSeq
    val second = rows("sequence_packing")

    assert(second == first, "second in-memory run differs from first")
    assert(reread == first, "parquet round-trip differs from in-memory result")
  }
}
