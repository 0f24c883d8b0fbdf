package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted physical plan of one (or every)
  * `SparkEntry.benchQueries` entry — the `.explain("formatted")` loop the
  * performance discipline runs after every operator lands (pushdown
  * reached the scan? exchanges only where the algebra demands? codegen
  * spans wide?). `BenchOne` measures; this shows WHY.
  *
  * Usage: `graft.ExplainOne <query> [sfDir]` — or `all` to dump every
  * plan (grep the output for `Exchange hashpartitioning` /
  * `PushedFilters` / `WholeStageCodegen` in bulk).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.silenceBoundedWindowWarning()
    val targets =
      if (name == "all") SparkEntry.benchQueries.toSeq.sortBy(_._1)
      else Seq(name -> SparkEntry.benchQueries(name))
    targets.foreach { case (n, fn) =>
      println(s"===== $n")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable =>
        println(s"[explain] $n failed: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
