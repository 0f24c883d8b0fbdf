package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Landing → archived file mover.
  *
  * Re-expresses the reference's `GCSToGCSOperator(move_object=True)` stage
  * (/root/reference/dags/pipeline_orchestration_dag.py:188-206): processed
  * files move out of the landing prefix into `archived/` with a date
  * suffix so re-delivery of the same filename can't double-process.
  *
  * Driver-side by design (file moves are control-plane, not data-plane);
  * on a real deployment the same calls go through the Hadoop FileSystem
  * API, which this mirrors 1:1.
  */
object Archive {

  /** Move every regular file under `landingDir` to `archivedDir`, renaming
    * `name.ext` → `name_<suffix>.ext`. Returns (src, dst) pairs. */
  def archive(landingDir: String, archivedDir: String, suffix: String): Seq[(String, String)] = {
    val landing = Paths.get(landingDir)
    if (!Files.isDirectory(landing)) return Seq.empty
    Files.createDirectories(Paths.get(archivedDir))
    val files = Files.list(landing).iterator().asScala.filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
    files.map { src =>
      val name = src.getFileName.toString
      val dot = name.lastIndexOf('.')
      val renamed =
        if (dot > 0) s"${name.substring(0, dot)}_$suffix${name.substring(dot)}"
        else s"${name}_$suffix"
      val dst = Paths.get(archivedDir, renamed)
      Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
      (src.toString, dst.toString)
    }
  }
}
