package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Quiet teardown for streaming queries.
  *
  * `q.stop()` interrupts any in-flight micro-batch; with a
  * ProcessingTimeTimeout (sessionize) or a ProcessingTime(0) trigger there
  * is almost always one — the engine keeps planning no-data batches — so a
  * green run still prints 4-deep
  * `CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT` / interrupted-task ERROR
  * stacks. Those train readers to ignore ERROR in a passing suite.
  *
  * Suppression is MESSAGE-targeted, not logger-targeted: a log4j2 filter is
  * installed for the duration of the stop that DENIES only events whose
  * formatted message or cause chain carries one of the known-benign
  * interruption signatures (CANNOT_WRITE_STATE_STORE / CANNOT_COMMIT /
  * InterruptedException / TaskKilled). A genuine error logged by a
  * concurrent thread inside the window — earlier versions of this helper
  * set whole loggers to Level.OFF and would have dropped it — still
  * surfaces. The stop outcome itself is unchanged, and a stop that THROWS
  * still propagates.
  */
object StreamQuiet {

  /** Denies log events that are provably the interrupted-teardown class;
    * NEUTRAL on everything else. The signature must appear in the message
    * text or the cause chain — an abort with a real (non-interrupt) cause
    * passes through untouched. */
  private object BenignTeardownFilter
      extends org.apache.logging.log4j.core.filter.AbstractFilter {
    private val benign = java.util.regex.Pattern.compile(
      "CANNOT_WRITE_STATE_STORE|CANNOT_COMMIT|InterruptedException|TaskKilled" +
        // one-line cleanup notices when the stop interrupts a no-data batch:
        // mid-broadcast store, and the v2 writer's abort bracket (neither
        // attaches a throwable; the CAUSE of a real abort still surfaces
        // from whatever logger reported it)
        "|Store broadcast broadcast_\\d+ fail" +
        "|Data source write support MicroBatchWrite\\[epoch: \\d+.*abort" +
        // the v2 writer task's abort bracket and its completion-listener
        // echo when the stop interrupts a state-store commit (seen with
        // the RocksDB provider under transformWithState) — window-scoped,
        // so a same-shaped error outside a quietStop still surfaces
        "|Abort(ing|ed) commit for partition" +
        "|Error in TaskCompletionListener")

    private def matches(msg: String, thrown: Throwable): Boolean = {
      val sb = new java.lang.StringBuilder
      if (msg != null) sb.append(msg)
      var t = thrown
      var depth = 0
      while (t != null && depth < 10) {
        sb.append(' ').append(t.getClass.getName)
        if (t.getMessage != null) sb.append(' ').append(t.getMessage)
        t = t.getCause
        depth += 1
      }
      benign.matcher(sb).find()
    }

    override def filter(event: org.apache.logging.log4j.core.LogEvent)
        : org.apache.logging.log4j.core.Filter.Result = {
      val m = event.getMessage
      if (matches(if (m == null) null else m.getFormattedMessage,
          event.getThrown))
        org.apache.logging.log4j.core.Filter.Result.DENY
      else org.apache.logging.log4j.core.Filter.Result.NEUTRAL
    }

    /** Test seam: same predicate the filter applies to a live event. */
    def isBenign(msg: String, thrown: Throwable): Boolean = matches(msg, thrown)
  }

  /** Test-only view of the filter predicate. */
  private[graft] def benignTeardown(msg: String, thrown: Throwable): Boolean =
    BenignTeardownFilter.isBenign(msg, thrown)

  // Deferred removal: stop() waits for the STREAM thread, but interrupted
  // executor TASK threads flush their abort stacks asynchronously — an
  // inline grace sleep would sit inside every Bench-timed replay run
  // (measured: ~+0.4 s/query at min-of-2), so the filter is removed on a
  // daemon timer 300 ms after the LAST quietStop. Because the filter is
  // message-targeted, even the open window only drops the benign class.
  private val restorer = java.util.concurrent.Executors
    .newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "stream-quiet-restore"); t.setDaemon(true); t
    }
  private val lock = new Object
  private var installed: Option[Seq[org.apache.logging.log4j.core.config.LoggerConfig]] = None
  private var pending: java.util.concurrent.ScheduledFuture[_] = null

  def quietStop(q: StreamingQuery): Unit = {
    import org.apache.logging.log4j.LogManager
    try lock.synchronized {
      if (pending != null) { pending.cancel(false); pending = null }
      if (installed.isEmpty) { // install only when not already suppressing
        val ctx = LogManager.getContext(false)
          .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
        val cfg = ctx.getConfiguration
        // the root LoggerConfig is the ancestor every Spark logger routes
        // through in this harness's default config; dedup by identity in
        // case a custom config gives some logger its own node
        val targets = (LogManager.ROOT_LOGGER_NAME ::
            "org.apache.spark" :: Nil)
          .map(cfg.getLoggerConfig).distinct
        BenignTeardownFilter.start()
        targets.foreach(_.addFilter(BenignTeardownFilter))
        ctx.updateLoggers()
        installed = Some(targets)
      }
    } catch { case _: Throwable => () } // no log4j2 core: plain stop
    try q.stop()
    finally lock.synchronized {
      if (installed.nonEmpty && pending == null)
        pending = restorer.schedule(new Runnable {
          def run(): Unit = lock.synchronized {
            try {
              installed.foreach(_.foreach(_.removeFilter(BenignTeardownFilter)))
              LogManager.getContext(false)
                .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
                .updateLoggers()
            } catch { case _: Throwable => () }
            installed = None
            pending = null
          }
        }, 300, java.util.concurrent.TimeUnit.MILLISECONDS)
    }
  }
}
