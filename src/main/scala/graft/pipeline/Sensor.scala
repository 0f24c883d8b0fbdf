package graft.pipeline

import java.nio.file.{Files, Paths}

/** File-arrival sensor.
  *
  * Re-expresses the reference's `GCSObjectExistenceSensor`
  * (/root/reference/dags/pipeline_orchestration_dag.py:79-95): block the
  * pipeline until the expected landing files exist, with poll interval and
  * timeout. The streaming analog (a Structured Streaming file source that
  * picks up arrivals continuously) lives in graft.streaming.
  */
object Sensor {

  /** Wait until all `paths` exist, polling every `pollMs`, for at most
    * `timeoutMs`. Returns true iff all arrived in time. */
  def await(paths: Seq[String], timeoutMs: Long, pollMs: Long = 100L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (true) {
      if (paths.forall(p => Files.exists(Paths.get(p)))) return true
      if (System.nanoTime() >= deadline) return false
      Thread.sleep(pollMs)
    }
    false
  }
}
