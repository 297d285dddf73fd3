package graft

import org.apache.spark.sql.functions._

/** Small-file compaction: fewer files, identical row set, recoverable swap. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_layout").toString + "/t"

  test("compact merges a fragmented table without changing its rows") {
    val dir = tmp()
    Tables.t(spark, sf001, "orders")
      .repartition(16).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir)
      .orderBy($"o_orderkey").collect().toSeq

    val (nBefore, nAfter) = operators.Layout.compact(spark, dir, 1L << 30)
    assert(nBefore === 16)
    assert(nAfter === 1) // tiny table, one target-size file

    val afterRows = spark.read.parquet(dir)
      .orderBy($"o_orderkey").collect().toSeq
    assert(afterRows === beforeRows)
    // the swap leaves no staging/aside litter behind
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(f =>
      f.getName.endsWith(".compact_staging") || f.getName.endsWith(".old")))
  }

  test("compact on a valid-but-empty directory is a no-op, not a read failure") {
    val dir = tmp()
    assert(new java.io.File(dir).mkdirs()) // zero data files, e.g. a fresh sink
    assert(operators.Layout.compact(spark, dir, 1L << 30) === ((0, 0)))
    assert(new java.io.File(dir).exists()) // left in place, untouched
  }

  test("compact refuses partitioned directories instead of flattening them") {
    val dir = tmp()
    Tables.t(spark, sf001, "orders")
      .write.partitionBy("o_orderstatus").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      operators.Layout.compact(spark, dir, 1L << 30)
    }
    assert(e.getMessage.contains("subdirectories"))
  }

  test("compact recovers a swap that died between the renames") {
    val dir = tmp()
    Tables.t(spark, sf001, "orders").repartition(4).write.parquet(dir)
    val expected = spark.read.parquet(dir).count()
    // simulate the crash window: live moved aside, staging never moved in
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old")))
    val (nBefore, nAfter) = operators.Layout.compact(spark, dir, 1L << 30)
    assert(nBefore === 4 && nAfter === 1)
    assert(spark.read.parquet(dir).count() === expected)
  }

  test("mergeSchema reads across schema drift with null-padded old files") {
    // long-lived tables drift: new columns appear in new files only
    val dir = tmp()
    Tables.t(spark, sf001, "orders")
      .select($"o_orderkey", $"o_custkey")
      .write.parquet(dir + "/batch=1")
    Tables.t(spark, sf001, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        lit("v2").as("writer_version"))
      .write.parquet(dir + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ===
      Set("o_orderkey", "o_custkey", "o_totalprice", "writer_version", "batch"))
    val n = Tables.t(spark, sf001, "orders").count()
    assert(merged.count() === 2 * n)
    // old files surface the new columns as nulls, new files carry values
    assert(merged.filter($"batch" === 1 && $"o_totalprice".isNull).count() === n)
    assert(merged.filter($"batch" === 2 && $"o_totalprice".isNotNull).count() === n)
  }

  test("compact splits into multiple files when the target is small") {
    val dir = tmp()
    Tables.t(spark, sf001, "lineitem").write.parquet(dir)
    val bytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")).map(_.length).sum
    val (_, nAfter) = operators.Layout.compact(spark, dir, math.max(1L, bytes / 3))
    assert(nAfter >= 2, s"expected a multi-file layout, got $nAfter")
    assert(spark.read.parquet(dir).count() ===
      Tables.t(spark, sf001, "lineitem").count())
  }
}
