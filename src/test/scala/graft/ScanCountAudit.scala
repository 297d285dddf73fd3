package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Dev-only scan auditor (test scope): for every registered query, counts
  * LIVE FileSourceScanExec nodes per table in the executed plan (tree
  * walk incl. subqueries — cached subtrees read via InMemoryTableScan are
  * not re-counted, unlike a naive string grep which also counts the
  * lineage text stored inside InMemoryRelation). A big table scanned ≥2
  * times in one action usually marks an uncached diamond.
  * `sbt "Test/runMain graft.ScanCountAudit <sfDir>"`
  */
object ScanCountAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      // AQE wraps the tree in AdaptiveSparkPlanExec (childless until
      // execution) which hides every node from collect — audit without it
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.RowNumberTopKRewrite.install(spark)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val scans = plan.collectWithSubqueries {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        }
        val multi = scans.groupBy(identity).view.mapValues(_.size)
          .filter(_._2 > 1).toSeq.sortBy(-_._2)
        if (multi.nonEmpty)
          println(s"[scan] $name  " +
            multi.map { case (t, c) => s"$t=$c" }.mkString(" "))
        spark.catalog.clearCache()
      } catch {
        case e: Throwable => println(s"[scan] $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
