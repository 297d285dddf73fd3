package graft

import org.apache.spark.sql.functions._

/** Guards for the levenshtein_pairs blocking cap and top-K contract.
  *
  * Round-11 ADVICE: LEV_BLOCK_CAP=32 sat one doc above the measured largest
  * gate-SF block (31 at sf0.1) — a razor-thin data-dependent margin. If the
  * driver ever regenerates the testdata fixtures, a block silently crossing
  * the cap would change gate output with no signal. This census makes that
  * event a red test naming the offending block instead.
  */
class LevCensusSpec extends SparkSpec {
  import operators.StatsOps.{LEV_BANDS, LEV_BLOCK_CAP, LEV_CHUNK}

  private def blockCensus(dir: String) = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(substring(col("text"), 1, 24), "[^\\x00-\\x7F]", "?")
          .as("prefix"),
        expr("length(text) div 50").cast("long").as("len_band"))
    d.select(col("len_band"),
        posexplode(array((0 until LEV_BANDS).map(i =>
          substring(col("prefix"), 1 + i * LEV_CHUNK, LEV_CHUNK)): _*))
          .as(Seq("bp", "key")))
      .filter(col("key") =!= "")
      .groupBy(col("len_band"), col("bp"), col("key"))
      .agg(count(lit(1)).as("n"))
  }

  test("block census at the gate SFs stays under LEV_BLOCK_CAP") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val over = blockCensus(dir).filter(col("n") > LEV_BLOCK_CAP)
        .orderBy(desc("n")).limit(5).collect()
      assert(over.isEmpty,
        s"$dir: blocks over cap=$LEV_BLOCK_CAP (stop-block filter now " +
          s"ACTIVE at a gate SF — recall contract shifted): " +
          over.map(_.mkString("/")).mkString("; "))
    }
  }

  test("per-doc top-K output contract holds at sf0.001") {
    val out = SparkEntry.queries("levenshtein_pairs")(spark, sf001)
      .select(col("doc_id"), col("nbr_id"), col("dist"), col("rk")).collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.length <= 5, s"doc $doc has >K neighbors")
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length),
        s"doc $doc ranks not contiguous")
      // rank order must agree with (dist, nbr_id) order
      val keys = sorted.map(r => (r.getLong(2), r.getLong(1)))
      assert(keys.sortBy(identity).toSeq == keys.toSeq,
        s"doc $doc rank order violates (dist, nbr_id)")
      assert(rows.forall(_.getLong(2) <= 12), s"doc $doc dist > 12")
      assert(rows.forall(r => r.getLong(1) != doc), s"doc $doc self-neighbor")
    }
    // symmetric candidate set: doc B listing A at dist d implies the pair
    // survived the threshold, so A must ALSO have B unless A's list is full
    // of strictly-closer neighbors — spot-check the implication
    val have = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val (a, b, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (!have.contains((b, a))) {
        val bl = byDoc(b).map(_.getLong(2)).sorted
        assert(bl.length == 5 && bl.last <= d,
          s"pair ($a,$b,d=$d) missing from $b's non-full list")
      }
    }
  }
}
