package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: sweep the catalog and name every query whose plan calls
  * `.cache()` on an already-cached subtree (the CacheManager "Asked to
  * cache already cached data." warning — harmless, but it buries the
  * signal that warning exists to give). Detection is a log4j2 appender on
  * the CacheManager logger, so the attribution is exact per query.
  *
  * `runMain graft.CacheAudit <sfDir>`
  */
object CacheAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.RowNumberTopKRewrite.install(spark)

    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    import org.apache.logging.log4j.core.LogEvent
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val appender = new AbstractAppender(
        "graft-cache-audit", null, null, false, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        if (e.getMessage.getFormattedMessage.contains("already cached"))
          hits.incrementAndGet()
    }
    appender.start()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val logCfg = ctx.getConfiguration
    logCfg.getRootLogger.addAppender(appender,
      org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()

    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.catalog.clearCache()
      val before = hits.get()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[cache-audit] $name ERR ${e.getMessage}") }
      val n = hits.get() - before
      if (n > 0) { flagged += 1; println(s"[cache-audit] $name: $n double-cache") }
    }
    println(s"[cache-audit] done: $flagged queries double-cache")
    spark.stop()
  }
}
