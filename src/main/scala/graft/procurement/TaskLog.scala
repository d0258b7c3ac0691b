package graft.procurement

import java.nio.file.{Files, Path, Paths}

/** S9 — per-task structured run and exception logs.
  *
  * Mirrors the reference's `log_task_execution` (dags/pipeline.py:89-120)
  * and `log_exception` (dags/pipeline.py:123-155): every pipeline task
  * writes one success JSON under `tasks/<execution_date>/` with its status
  * and detail counters, and every failure writes one exception JSON under
  * `exceptions/<execution_date>/` carrying the error type, message, and
  * full stack trace, after which the failure is rethrown (the reference
  * raises AirflowException). File names are `<task>_<timestamp>.json`; the
  * timestamp carries milliseconds where the reference used seconds, so two
  * runs of one task inside a second cannot clobber each other.
  *
  * These are driver-side control-plane writes — a handful of KB per run —
  * so they never touch the Spark execution plan.
  */
object TaskLog {

  private val tsFormat = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd_HHmmssSSS").withZone(java.time.ZoneOffset.UTC)

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s""""${esc(k)}": $v""" }.mkString("{", ", ", "}")

  private def str(s: String): String = s""""${esc(s)}""""

  private def detailsJson(details: Map[String, String]): String =
    obj(details.toSeq.sortBy(_._1).map { case (k, v) => k -> str(v) })

  /** Create-new write with a sequence uniquifier: two attempts landing in
    * the same millisecond get `<base>.json` and `<base>_2.json` instead of
    * the second truncate-overwriting (and silently losing) the first — an
    * attempt record is evidence, never clobberable. `base` excludes the
    * `.json` suffix. */
  private def write(dir: Path, base: String, json: String): Path = {
    Files.createDirectories(dir)
    var seq = 1
    while (true) {
      val name = if (seq == 1) s"$base.json" else s"${base}_$seq.json"
      try return Files.writeString(dir.resolve(name), json + "\n",
        java.nio.file.StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => seq += 1 }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One success/status record: `tasks/<date>/<task>_<ts>.json`. Never
    * throws — a broken log directory must not convert a succeeded task
    * into a failure (the reference's log_task_execution likewise swallows
    * its own logging errors). */
  def logTask(logsDir: String, task: String, executionDate: String,
              status: String, details: Map[String, String] = Map.empty): Option[Path] = {
    val ts = tsFormat.format(java.time.Instant.now())
    try Some(write(Paths.get(logsDir, "tasks", executionDate), s"${task}_$ts",
      obj(Seq(
        "task_name" -> str(task),
        "timestamp" -> str(ts),
        "execution_date" -> str(executionDate),
        "status" -> str(status),
        "details" -> detailsJson(details)))))
    catch {
      case logErr: Throwable =>
        System.err.println(s"[tasklog] failed to write task log: $logErr")
        None
    }
  }

  /** One failure record with the full stack trace:
    * `exceptions/<date>/<task>_<ts>.json`. Never throws itself — a broken
    * log directory must not mask the original failure. */
  def logException(logsDir: String, task: String, executionDate: String,
                   e: Throwable, info: Map[String, String] = Map.empty): Option[Path] = {
    val ts = tsFormat.format(java.time.Instant.now())
    val sw = new java.io.StringWriter()
    e.printStackTrace(new java.io.PrintWriter(sw))
    try Some(write(Paths.get(logsDir, "exceptions", executionDate), s"${task}_$ts",
      obj(Seq(
        "task_name" -> str(task),
        "timestamp" -> str(ts),
        "execution_date" -> str(executionDate),
        "error_type" -> str(e.getClass.getName),
        "error_message" -> str(Option(e.getMessage).getOrElse("")),
        "traceback" -> str(sw.toString),
        "additional_info" -> detailsJson(info)))))
    catch {
      case logErr: Throwable =>
        System.err.println(s"[tasklog] failed to write exception log: $logErr")
        None
    }
  }

  /** Run `body` as a logged task: success JSON (with wall-clock duration
    * and `details` derived from the result) on completion, exception JSON
    * then rethrow on failure. */
  def timed[T](logsDir: String, task: String, executionDate: String,
               details: T => Map[String, String] = (_: T) => Map.empty[String, String])
              (body: => T): T = {
    val t0 = System.nanoTime()
    def dur = f"${(System.nanoTime() - t0) / 1e9}%.3f"
    try {
      val out = body
      // a buggy details extractor must not convert a succeeded task into
      // a failure — same contract as the guarded log writes
      val d = try details(out)
      catch { case e: Throwable => Map("details_error" -> e.toString) }
      logTask(logsDir, task, executionDate, "success",
        d + ("duration_sec" -> dur))
      out
    } catch {
      case e: Throwable =>
        logException(logsDir, task, executionDate, e, Map("duration_sec" -> dur))
        throw e
    }
  }

  /** Bounded task retry — the reference DAG's default_args
    * (dags/pipeline.py:806-811: `retries: 2, retry_delay: 5 minutes`), so a
    * task runs at most `retries + 1` times. Each attempt runs under
    * [[timed]] (its own success/exception JSON) and appends one line to
    * `attempts/<date>/<task>/attempt=N.log`, mirroring Airflow's
    * per-attempt `attempt=N.log` files; a failing non-final attempt waits
    * `retryDelayMs` and re-runs, the final failure rethrows. `sleep` is
    * injectable so specs exercise three attempts without the 5-minute
    * waits. Attempt-log writes are guarded like every other log write —
    * a broken log directory must not fail or extra-retry the task. */
  def timedWithRetry[T](logsDir: String, task: String, executionDate: String,
                        retries: Int = 2, retryDelayMs: Long = 5L * 60 * 1000,
                        details: T => Map[String, String] = (_: T) => Map.empty[String, String],
                        sleep: Long => Unit = Thread.sleep)
                       (body: => T): T = {
    val attempts = retries + 1
    def attemptLog(n: Int, status: String): Unit = {
      val dir = Paths.get(logsDir, "attempts", executionDate, task)
      try {
        Files.createDirectories(dir)
        Files.writeString(dir.resolve(s"attempt=$n.log"),
          s"[${tsFormat.format(java.time.Instant.now())}] task=$task " +
            s"attempt=$n/$attempts status=$status\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch {
        case e: Throwable =>
          System.err.println(s"[tasklog] failed to write attempt log: $e")
      }
    }
    def go(n: Int): T = {
      attemptLog(n, "start")
      try {
        val out = timed(logsDir, task, executionDate, details)(body)
        attemptLog(n, "success")
        out
      } catch {
        // retry ONLY recoverable failures: a fatal error (OutOfMemoryError,
        // LinkageError) or an interrupt must propagate immediately — re-running
        // an OOM'd task twice with 5-minute sleeps helps nobody, and
        // swallowing an interrupt into a retry cycle breaks cancellation
        case e: Throwable if n < attempts && scala.util.control.NonFatal(e) =>
          attemptLog(n, s"failed_retrying error=${e.getClass.getName}")
          sleep(retryDelayMs)
          go(n + 1)
        case e: Throwable =>
          attemptLog(n, s"failed_final error=${e.getClass.getName}")
          throw e
      }
    }
    go(1)
  }
}
