package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic runner: attribute "Broadcasting large task binary" warnings
  * to the query that triggers them. `graft.Bench` interleaves queries and
  * the TorrentBroadcast warning carries no query context, so a warning in
  * the bench tail is unattributable from the artifact alone (the r15
  * verdict's residual finding). This tool runs every benchQueries entry
  * sequentially with a stderr marker line before each, so the warning
  * lands between its query's markers:
  *
  *   SPARK_GRAFT_SF_DIR=... java ... graft.TaskBinaryScan 2>scan.log
  *   grep -E '^### |large task binary' scan.log
  *
  * stdout stays empty — this is not a bench; times here are meaningless
  * (no interleave, no reps) and must never be read as one.
  */
object TaskBinaryScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.silenceBoundedWindowWarning()
    SparkEntry.benchQueries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"### $name")
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"### $name FAILED: $e")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
