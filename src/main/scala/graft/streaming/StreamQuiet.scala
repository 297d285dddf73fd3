package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Quiet teardown for streaming queries.
  *
  * `q.stop()` interrupts any in-flight micro-batch; with a
  * ProcessingTimeTimeout (sessionize) or a ProcessingTime(0) trigger there
  * is almost always one — the engine keeps planning no-data batches — so a
  * green run still prints 4-deep
  * `CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT` / interrupted-task ERROR
  * stacks. Those train readers to ignore ERROR in a passing suite. This
  * helper raises the level of exactly the loggers that print the benign
  * interruption stacks for the duration of the stop, then restores them —
  * the stop outcome itself is unchanged, and a stop that THROWS still
  * propagates.
  *
  * The suppression is teardown-scoped and targeted: errors logged outside
  * a `quietStop` window (i.e. real mid-run failures) are untouched.
  */
object StreamQuiet {

  /** The loggers that emit the interrupted-commit teardown noise:
    * executor task failure, task-set abort chatter, the streaming
    * engine's own micro-batch error report, and the task-abort util log. */
  private val noisy = Seq(
    "org.apache.spark.executor.Executor",
    "org.apache.spark.scheduler.TaskSetManager",
    "org.apache.spark.sql.execution.streaming",
    "org.apache.spark.sql.execution.datasources.FileFormatWriter",
    "org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2Exec",
    "org.apache.spark.util.Utils")

  def quietStop(q: StreamingQuery): Unit = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.config.Configurator
    val prev =
      try Some(noisy.map(n => n -> LogManager.getLogger(n).getLevel))
      catch { case _: Throwable => None } // no log4j2 core: plain stop
    prev.foreach(_ => noisy.foreach(n =>
      Configurator.setLevel(n, org.apache.logging.log4j.Level.OFF)))
    try q.stop()
    finally prev.foreach { saved =>
      // stop() waits for the STREAM thread, but the interrupted executor
      // TASK threads log their abort stacks asynchronously on their own
      // threads — give them a beat before restoring the levels
      Thread.sleep(200)
      saved.foreach { case (n, l) => Configurator.setLevel(n, l) }
    }
  }
}
