package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.pipeline._

/** Runnable end-to-end pipeline — the reference DAG as a standalone job.
  *
  * Mirrors /root/reference/dags/pipeline_orchestration_dag.py:212's stage
  * chain: per-entity sensor → raw ingest → staging, then quality gate →
  * curation (SCD2 + denormalized join) → archive, orchestrated by
  * [[pipeline.Runner]] with the same fail-fast semantics.
  *
  * Entities, landing patterns, sensor timeouts and the retry policy come
  * from [[pipeline.PipelineConfig]] (default: the shipped
  * graft-pipeline.properties; override with a 4th arg) — adding an entity
  * is a config change plus, at most, a staging transform registered below,
  * matching the reference's config-driven task generation
  * (dags/config/pipeline_config.yaml:31-46).
  *
  * Usage: graft.PipelineMain [sfDir] [workDir] [landingDir] [configPath]
  * Writes each zone as parquet under workDir and prints per-stage status.
  */
object PipelineMain {

  /** Entity-specific staging transforms (cleansing is per-schema logic;
    * everything around it is parameterized). */
  val stagingTransforms: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "customer" -> (Staging.p2StagingCustomer _),
      "orders" -> (Staging.p3StagingOrders _))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val workDir = if (args.length > 1) args(1) else Files.createTempDirectory("graft_run").toString
    val config = if (args.length > 3) PipelineConfig.load(args(3)) else PipelineConfig.default
    // validate before building stages: a config entity without a registered
    // staging transform must fail with a clear message, not a
    // NoSuchElementException halfway through DAG construction
    config.entities.foreach(e => require(stagingTransforms.contains(e.name),
      s"no staging transform registered for entity '${e.name}' " +
        s"(known: ${stagingTransforms.keys.toSeq.sorted.mkString(", ")})"))
    val landing = if (args.length > 2) args(2) else {
      // default landing dir with marker files so every entity's sensor passes
      val l = Files.createTempDirectory("graft_landing")
      config.entities.foreach(e => Files.writeString(l.resolve(e.pattern), "placeholder\n"))
      l.toString
    }
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import Runner._
    def save(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$workDir/$name")

    // per-entity sensor → ingest → staging, generated from config
    val entityStages = config.entities.flatMap { e =>
      Seq(
        Stage(s"sense_${e.name}", retries = config.retries,
          retryDelayMs = config.retryDelayMs)(() =>
          require(Sensor.await(Seq(Paths.get(landing, e.pattern).toString),
            e.sensorTimeoutMs, e.pokeIntervalMs),
            s"no ${e.pattern} in $landing")),
        Stage(s"ingest_${e.name}", Seq(s"sense_${e.name}"),
          retries = config.retries, retryDelayMs = config.retryDelayMs)(() =>
          save(s"raw_${e.name}")(Ingest.ingestRawEntity(spark, sfDir, e))),
        Stage(s"staging_${e.name}", Seq(s"ingest_${e.name}"),
          retries = config.retries, retryDelayMs = config.retryDelayMs)(() =>
          save(s"staging_${e.name}")(stagingTransforms(e.name)(spark, sfDir))))
    }
    val stagingDeps = config.entities.map(e => s"staging_${e.name}")
    val senseDeps = config.entities.map(e => s"sense_${e.name}")

    val tailStages = Seq(
      Stage("quality", stagingDeps, config.retries, config.retryDelayMs)(() => {
        val report = Quality.p4QualityChecks(spark, sfDir)
        save("quality_report")(report)
        // gate on the configured entity tables via their configured PKs
        // (the synthetic lineitem has planted PK dups the report is
        // expected to surface, not fail the run on)
        val gate = config.entities.map(e =>
            Quality.tableMetrics(Tables.load(spark, sfDir, e.table), e.table, e.pk))
          .reduce(_ unionAll _)
        require(Quality.gatePasses(gate), "quality gate failed")
      }),
      Stage("curate_scd2", Seq("quality"), config.retries, config.retryDelayMs)(() =>
        save("curated_user_scd2")(Scd2.p5Scd2User(spark, sfDir))),
      Stage("curate_join", Seq("quality"), config.retries, config.retryDelayMs)(() =>
        save("curated_customer")(Curated.p6CuratedJoin(spark, sfDir))),
      Stage("merge", Seq("curate_join"), config.retries, config.retryDelayMs)(() =>
        save("merged_orders")(Merge.p7IncrementalMerge(spark, sfDir))),
      Stage("archive", Seq("curate_scd2", "curate_join", "merge") ++ senseDeps,
        config.retries, config.retryDelayMs)(() => {
        val moved = Archive.archive(landing, s"$workDir/archived",
          java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString.replace("-", ""))
        require(moved.nonEmpty, "nothing archived")
      }))

    // failure hook: the reference's email_on_failure analog (no SMTP in a
    // library — log the notification target and the error)
    val onFailure: (String, Throwable) => Unit = (stage, e) =>
      System.err.println(s"[pipeline] NOTIFY ${config.notifyEmail.getOrElse("<none>")}: " +
        s"stage $stage failed: ${e.getMessage}")

    val results = Runner.run(entityStages ++ tailStages, onFailure)
    results.foreach(r => println(s"[pipeline] ${r.name}: ${r.status}"))
    val failed = results.exists(_.status != Runner.Succeeded)
    spark.stop()
    if (failed) sys.exit(1)
  }
}
