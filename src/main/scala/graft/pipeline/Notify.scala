package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable pipeline notifications — the runnable counterpart of the
  * reference's SNS publishes (stepfunctions/delta-lake.json:216-265: one
  * success publish and four failure handlers, each with a Subject and a
  * Message).
  *
  * SNS is a service boundary this engine maps to a local durable outbox:
  * one JSON file per (run_id, status) under `outboxDir`, written
  * temp-file-then-atomic-rename so a consumer never observes a torn
  * event, and keyed by filename so REDELIVERY IS IDEMPOTENT — publishing
  * the same (run_id, status) twice (the at-least-once retry a real
  * notifier must tolerate, and exactly what a Step Functions retry
  * policy produces) leaves exactly one event. Consumers tail the
  * directory (or `Notify.read` it as a DataFrame); swapping in a real
  * SNS/webhook client is a transport change, not a semantics change.
  */
object Notify {

  /** One notification. `status` mirrors the reference's terminal states
    * (SUCCESS plus the four failure handlers' subjects); `message` is
    * free-form — `Pipeline.run` puts the per-table count summary there.
    */
  final case class Event(
      runId: String,
      status: String,
      subject: String,
      message: String)

  /** Publish `event`, returning true if this call created the event and
    * false if an event with the same (run_id, status) already existed
    * (idempotent redelivery). `publishedAt` is caller-supplied so runs
    * are replayable and tests deterministic.
    */
  def publish(outboxDir: String, event: Event, publishedAt: String): Boolean = {
    // conservative allowlist, same as the status check below: the run id
    // becomes a filename PREFIX, and the promise is "path-safe token" on
    // every filesystem a consumer might parse filenames on — not merely
    // "no POSIX separator" (a newline/backslash/colon run id would mint
    // hostile <run>-<status>.json names; ADVICE r13)
    require(event.runId.nonEmpty && event.runId.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"notify: run id must be a non-empty [A-Za-z0-9_.-] token, got '${event.runId}'")
    require(event.status.nonEmpty && event.status.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-'),
      s"notify: status must be a [A-Za-z0-9_-] token, got '${event.status}'")
    val dir = Paths.get(outboxDir)
    Files.createDirectories(dir)
    val target = dir.resolve(s"${event.runId}-${event.status}.json")
    if (Files.exists(target)) return false
    val json =
      s"""{"run_id":${q(event.runId)},"status":${q(event.status)},""" +
      s""""subject":${q(event.subject)},"message":${q(event.message)},""" +
      s""""published_at":${q(publishedAt)}}""" + "\n"
    val tmp = Files.createTempFile(dir, ".tmp-", ".json")
    try {
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
      moveAtomic(tmp, target)
    } finally { Files.deleteIfExists(tmp); () }
  }

  /** First writer wins: if the atomic rename loses to a concurrent
    * publisher of the same event, report "already delivered" rather
    * than failing the pipeline.
    */
  private def moveAtomic(tmp: Path, target: Path): Boolean =
    try {
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.nio.file.FileSystemException =>
        if (Files.exists(target)) false else throw e
    }

  /** The five-string-column outbox event schema, pinned so consumers
    * never depend on JSON schema inference (which fails outright on an
    * empty or not-yet-created outbox).
    */
  val schema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    StructType(Seq("run_id", "status", "subject", "message", "published_at")
      .map(StructField(_, StringType, nullable = true)))
  }

  /** The outbox as a DataFrame (consumer side). The directory is read
    * without a glob (a glob path makes the reader's streaming-sink
    * metadata probe log a spurious FileNotFoundException stack per
    * read); only committed `<run>-<status>.json` files live here —
    * in-flight temps are dot-prefixed, which Spark readers skip.
    * A consumer may poll before the first publish: a missing outbox
    * directory yields an EMPTY frame with the pinned schema, not a
    * path-not-found/inference AnalysisException.
    */
  def read(spark: SparkSession, outboxDir: String): DataFrame =
    if (!Files.isDirectory(Paths.get(outboxDir)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).json(outboxDir)
        .select("run_id", "status", "subject", "message", "published_at")

  /** The outbox as a STREAM (consumer side): an exactly-once tail of
    * the directory for a downstream consumer — the subscription half of
    * the reference's SNS topic (delta-lake.json:216-265). File-source
    * semantics give the guarantee: each committed `<run>-<status>.json`
    * is immutable (atomic rename, never rewritten), so the source's
    * checkpointed file log processes every event exactly once across
    * restarts. Pair with `Trigger.AvailableNow` to drain-and-stop.
    */
  def readStream(spark: SparkSession, outboxDir: String): DataFrame = {
    Files.createDirectories(Paths.get(outboxDir))
    spark.readStream.schema(schema).json(outboxDir)
      .select("run_id", "status", "subject", "message", "published_at")
  }

  /** Minimal JSON string escaping (quote, backslash, control chars) —
    * event fields carry error messages, which contain anything.
    */
  private def q(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"').toString
  }
}
