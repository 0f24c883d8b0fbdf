package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

/** Failure-notification transport — the reference implementation behind
  * [[Runner]]'s `onFailure` hook, completing the analogy with the
  * reference's `default_args` failure wiring
  * (/root/reference/dags/pipeline_orchestration_dag.py:31-33:
  * `email_on_failure` + an alert address). The TRANSPORT is deliberately
  * a durable append-only outbox file, not SMTP: what is reference
  * behavior is WHICH failures produce a notification and WHAT it says
  * (ONE per stage whose retry budget exhausts — Airflow's
  * email_on_failure fires after retries, not per attempt; per-retry
  * mail is the separate email_on_retry flag the reference leaves off),
  * and that the alert survives the driver process. A deployment points
  * `drain` at its pager/email bridge; the pipeline code never changes.
  *
  * Records are single-line TSV (`pipeline, stage, error-class, first
  * line of the message`) so the outbox is greppable and a torn line is
  * impossible (one atomic append per failure, newlines in messages
  * flattened). Test-only component (SURVEY test-only list);
  * `PipelineSpec` pins once-per-exhausted-stage delivery (retries do
  * NOT multiply alerts), multi-stage attribution, skipped-stage
  * silence, message flattening, and drain order. */
object Notify {

  final case class Alert(pipeline: String, stage: String,
                         errorClass: String, message: String)

  /** An `onFailure` hook appending one alert line per `onFailure`
    * invocation to `path` (created on first use) — and Runner fires
    * `onFailure` once per stage whose retry budget exhausts, never per
    * attempt, so a run yields at most one line per failed stage (the
    * object-level contract above; wiring this hook per-attempt would
    * multiply alerts). Safe to share across stages. */
  def fileOutbox(pipeline: String, path: Path): (String, Throwable) => Unit =
    (stage, err) => {
      val msg = Option(err.getMessage).getOrElse("")
        .replaceAll("[\\t\\r\\n]+", " ").trim
      val line =
        s"$pipeline\t$stage\t${err.getClass.getSimpleName}\t$msg\n"
      Files.write(path, line.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

  /** Read the outbox oldest-first. */
  def drain(path: Path): Seq[Alert] =
    if (!Files.exists(path)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(path, StandardCharsets.UTF_8).asScala.toSeq
        .filter(_.nonEmpty)
        .map { l =>
          val f = l.split("\t", 4)
          Alert(f(0), f(1), f(2), if (f.length > 3) f(3) else "")
        }
    }
}
