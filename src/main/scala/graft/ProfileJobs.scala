package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run a query N times and print per-JOB wall times, so the cost
  * of a multi-action operator (iterative loops, replay harnesses, convergence
  * probes) can be attributed to its individual Spark jobs instead of one
  * opaque total: `runMain graft.ProfileJobs <sfDir> <name> [n]`.
  * Measurement-only — never part of the driver contract.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.RowNumberTopKRewrite.install(spark)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var enabled = false
    // streaming replays: per-micro-batch duration breakdown (the engine
    // publishes queryPlanning / walCommit / addBatch / getBatch / state
    // commit times per batch — exactly the fixed-overhead attribution the
    // [job] lines cannot see because much of it is driver-side)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = if (enabled) {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        val st = p.stateOperators.map(s =>
          s"${s.operatorName}:commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}")
          .mkString(" ")
        println(s"[batch] ${p.name} #${p.batchId} rows=${p.numInputRows} $dur | $st")
      }
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (enabled) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (enabled) {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 20) println(f"[job] ${je.jobId}%4d ${ms / 1000}%7.3f s  $desc")
        }
      }
    })
    (1 to n).foreach { i =>
      spark.catalog.clearCache()
      enabled = i == n // job detail on the last (warm) run only
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      // let listener events drain before printing the total
      Thread.sleep(200)
      println(f"[profile] $name run $i: ${(t3 - t0) / 1e9}%.2f s " +
        f"(fn ${(t1 - t0) / 1e9}%.2f, plan ${(t2 - t1) / 1e9}%.2f, " +
        f"exec ${(t3 - t2) / 1e9}%.2f)")
    }
    spark.stop()
  }
}
