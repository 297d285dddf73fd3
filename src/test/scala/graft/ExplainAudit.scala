package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor (test scope): prints the scan/exchange/top-k lines
  * of each named query's executed plan so pushdown, column pruning, and
  * sort-vs-TakeOrdered shapes can be eyeballed quickly.
  * `sbt "Test/runMain graft.ExplainAudit <sfDir> <query> ..."`
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.RowNumberTopKRewrite.install(spark)
    for (n <- args.drop(1)) {
      println(s"===== $n =====")
      val p = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(p.linesIterator.filter(l =>
        l.contains("FileScan") || l.contains("ReadSchema") ||
          l.contains("PushedFilters") || l.contains("Exchange") ||
          l.contains("TakeOrdered") || l.contains("Broadcast")).mkString("\n"))
    }
    spark.stop()
  }
}
