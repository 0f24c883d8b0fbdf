package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * Each query is executed with a `noop`-format write so the FULL physical
  * plan runs — every projection, window and orderBy — instead of the
  * `count()`-pruned plan Catalyst would otherwise collapse to (a count lets
  * the optimizer drop the very projections being measured). A failing query
  * aborts the bench with the query name rather than folding a near-zero
  * time into the total.
  *
  * The sandbox VM is noisy (single-shot numbers have moved ±30% round to
  * round on unchanged queries), so each query runs `Reps` times
  * interleaved per query and the reported number is the MEDIAN; the raw
  * per-rep times ship in a `"spread"` object so a reader can judge the
  * variance directly. Compare against BASELINE.md medians.
  */
object Bench {
  val Reps = 3

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.size / 2) // odd Reps: the true median
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/scan paths so the first measured query isn't
    // charged for session bring-up
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            throw new RuntimeException(s"bench query $name failed", e)
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + median(v) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, v) =>
      // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
      // comma-decimal locale would emit malformed JSON
      "\"" + k + "\":" + v.map(t =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(r => median(r._2)).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"reps":$Reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
