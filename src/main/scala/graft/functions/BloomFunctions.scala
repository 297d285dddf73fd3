package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface over Spark's own bloom-filter machinery — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair Catalyst injects
  * for runtime join filters, exposed as callable functions so operators can
  * build an explicit bloom ONCE and push it into a scan-side filter:
  *
  *   - `bloom_agg(value, est_items)` → BINARY: aggregate the XxHash64 of
  *     `value` into a bloom sized for `est_items` (both engines of the
  *     aggregation are Spark's sketch library — partial buffers merge
  *     associatively, so the build is one map-side pass + tiny shuffle).
  *   - `bloom_might_contain(bloom, value)` → BOOLEAN: membership probe of
  *     XxHash64(`value`) against a broadcast-as-literal bloom. No false
  *     negatives; callers must verify positives exactly when exactness
  *     matters (the two-phase shape `bloom_decontaminate` demonstrates).
  *
  * Scale rationale: a broadcast hash-set of N strings costs O(total bytes);
  * the bloom costs ~1.2 bytes/item at 1% fpp regardless of string length,
  * and the probe is applied BEFORE any join/shuffle — at 100 TB the corpus
  * side is pruned at the scan, and only the tiny candidate slice reaches
  * the exact verify join.
  */
object BloomFunctions {
  /** Register bloom_agg / bloom_might_contain for expr()/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_agg",
      exprs => new BloomFilterAggregate(
        new XxHash64(Seq(exprs(0))),
        Literal(exprs(1).eval().asInstanceOf[Number].longValue())),
      "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), new XxHash64(Seq(exprs(1)))),
      "built-in")
  }
}
