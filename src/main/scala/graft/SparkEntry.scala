package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by operator modules (each a [[QueryModule]]); this
  * object only aggregates them. Every oracle-checked query follows the
  * determinism rules documented on [[Q]].
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.CoreOps,
    operators.RelationalOps,
    operators.TimeWindowOps,
    operators.TextOps,
    operators.DedupOps,
    operators.SimilarityOps,
    operators.MultimodalOps,
    operators.AdvancedOps,
    operators.StatsOps,
    operators.FilterOps,
    streaming.ReplayOps
  )

  private lazy val all: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Count-per-key over the stream table — the Dataset analog of the
    * reference's core reduceByKey (Streamer.scala:123-124).
    */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreOps.queries.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
