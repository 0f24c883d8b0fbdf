package graft
import org.apache.spark.sql.SparkSession

/** Warm-state drift probe — the instrument for the one standing
  * unexplained performance fact (r17/r18 verdicts): a small set of
  * queries (q34/q16/q7) run ~1.5-1.8x their SOLO floors in every clean
  * in-suite sweep while their solo medians stay at the floor. The gate
  * never fires (canaries flat), cpu tracks wall (not starvation), and
  * the plans are identical — so the carrier is JVM state accumulated by
  * the PRECEDING suite position, and this main measures which state:
  *
  *   java ... graft.SuiteProbe <target> <reps> [prefixSpec]
  *
  * prefixSpec: `none` (solo — the BenchOne shape), `all` (every bench
  * query once, in name order, before timing — sweep-2 position), or a
  * comma list of family prefixes (`s`, `q`, `d,m,t`) to run only those
  * families first. Per timed rep prints wall seconds, process-CPU
  * seconds, JVM GC time delta (all collectors), and JIT compilation
  * time delta — GC pressure, down-clock and JIT churn separate on
  * sight: GC-carried drift inflates gcSec with wall; JIT churn inflates
  * jitSec early then decays; clock weather inflates cpu in the wall's
  * ratio with flat gc/jit.
  */
object SuiteProbe {
  def main(args: Array[String]): Unit = {
    val targets = args.headOption.getOrElse("q34_culprit_supplier")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 1) args(1).toInt else 6
    val prefixSpec = if (args.length > 2) args(2) else "none"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.silenceBoundedWindowWarning()
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    val cpuNow: () => Long =
      try {
        val b = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        () => b.getProcessCpuTime
      } catch { case _: Throwable => () => -1L }
    def runOnce(n: String): Unit = {
      SparkEntry.benchQueries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // warmup (Bench's shape), then the prefix
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Spark's own codegen-compile counter (the janino layer): per-rep
    // deltas in compilation COUNT are direct evidence of the generated-
    // class cache evicting a plan's classes between interleaved reps
    def cgCount: Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    val names = SparkEntry.benchQueries.keySet.toSeq.sorted
    val prefix: Seq[String] = prefixSpec match {
      case "none" => Nil
      case "all" => names.filterNot(targets.contains)
      case fams =>
        val ps = fams.split(",").map(_.trim).filter(_.nonEmpty)
        names.filter(n => !targets.contains(n) && ps.exists(p =>
          n.startsWith(p) && n.drop(p.length).headOption.exists(_.isDigit)))
    }
    val p0 = System.nanoTime()
    prefix.foreach(runOnce)
    println(f"[probe] prefix=$prefixSpec (${prefix.size} queries, " +
      f"${(System.nanoTime() - p0) / 1e9}%.1f s); timing ${targets.mkString(",")} x$reps")
    targets.foreach { name =>
      for (i <- 1 to reps) {
        val (g0, j0, n0, c0, t0) = (gcMs, jitMs, cgCount, cpuNow(), System.nanoTime())
        runOnce(name)
        val wall = (System.nanoTime() - t0) / 1e9
        val c1 = cpuNow()
        val cpu = if (c0 < 0 || c1 < 0) -1.0 else (c1 - c0) / 1e9
        println(f"$name rep $i%2d: wall $wall%7.3f s  cpu $cpu%7.2f s  " +
          f"gc ${(gcMs - g0) / 1000.0}%6.2f s  jit ${(jitMs - j0) / 1000.0}%6.2f s  " +
          f"codegen-compiles ${cgCount - n0}%3d")
      }
    }
    spark.stop()
  }
}
