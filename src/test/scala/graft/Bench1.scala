package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (test scope — NOT part of the library or the
  * driver contract). `sbt "Test/runMain graft.Bench1 <sfDir> <query> ..."`
  * times each named query three times (min ≈ steady state) with the same
  * noop-sink methodology as graft.Bench.
  */
object Bench1 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.RowNumberTopKRewrite.install(spark)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    for (n <- names) {
      spark.catalog.clearCache()
      val ts = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[bench1] $n run$i $t%.3f s")
        t
      }
      println(f"[bench1] $n MIN ${ts.min}%.3f s")
    }
    spark.stop()
  }
}
