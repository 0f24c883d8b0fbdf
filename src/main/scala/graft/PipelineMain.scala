package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.pipeline._

/** Runnable end-to-end pipeline — the reference DAG as a standalone job.
  *
  * Mirrors /root/reference/dags/pipeline_orchestration_dag.py:212's stage
  * chain: sensor → raw ingest → staging → quality gate → curation (SCD2 +
  * denormalized join) → archive, orchestrated by [[pipeline.Runner]] with
  * the same fail-fast semantics.
  *
  * Usage: graft.PipelineMain <sfDir> <workDir> [landingDir]
  * Writes each zone as parquet under workDir and prints per-stage status.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val workDir = if (args.length > 1) args(1) else Files.createTempDirectory("graft_run").toString
    val landing = if (args.length > 2) args(2) else {
      // default landing dir with a marker file so the sensor passes
      val l = Files.createTempDirectory("graft_landing")
      Files.writeString(l.resolve("Employee.csv"), "placeholder\n")
      l.toString
    }
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import Runner._
    def save(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$workDir/$name")

    val results = Runner.run(Seq(
      Stage("sense")(() =>
        require(Sensor.await(Seq(Paths.get(landing, "Employee.csv").toString), 10000),
          s"no landing file in $landing")),
      Stage("ingest_raw", Seq("sense"))(() =>
        save("raw_customer")(Ingest.p1IngestRaw(spark, sfDir))),
      Stage("staging_customer", Seq("ingest_raw"))(() =>
        save("staging_customer")(Staging.p2StagingCustomer(spark, sfDir))),
      Stage("staging_orders", Seq("ingest_raw"))(() =>
        save("staging_orders")(Staging.p3StagingOrders(spark, sfDir))),
      Stage("quality", Seq("staging_customer", "staging_orders"))(() => {
        val report = Quality.p4QualityChecks(spark, sfDir)
        save("quality_report")(report)
        // gate on the entity tables (the synthetic lineitem has planted
        // PK dups the report is expected to surface, not fail the run on)
        val gate = Quality.tableMetrics(Tables.load(spark, sfDir, "customer"),
          "customer", Seq("c_custkey"))
          .unionAll(Quality.tableMetrics(Tables.load(spark, sfDir, "orders"),
            "orders", Seq("o_orderkey")))
        require(Quality.gatePasses(gate), "quality gate failed")
      }),
      Stage("curate_scd2", Seq("quality"))(() =>
        save("curated_user_scd2")(Scd2.p5Scd2User(spark, sfDir))),
      Stage("curate_join", Seq("quality"))(() =>
        save("curated_customer")(Curated.p6CuratedJoin(spark, sfDir))),
      Stage("merge", Seq("curate_join"))(() =>
        save("merged_orders")(Merge.p7IncrementalMerge(spark, sfDir))),
      Stage("archive", Seq("curate_scd2", "curate_join", "merge"))(() => {
        val moved = Archive.archive(landing, s"$workDir/archived",
          java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString.replace("-", ""))
        require(moved.nonEmpty, "nothing archived")
      })))

    results.foreach(r => println(s"[pipeline] ${r.name}: ${r.status}"))
    val failed = results.exists(_.status != Runner.Succeeded)
    spark.stop()
    if (failed) sys.exit(1)
  }
}
