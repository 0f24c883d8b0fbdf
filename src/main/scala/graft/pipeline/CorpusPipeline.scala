package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.{Dedup, TextAnalysis}

/** The end-to-end LLM corpus-build pipeline, composed through the DAG
  * runner — the reference's orchestration story (the Airflow TaskGroup
  * chain of sense → ingest → quality → curate → archive,
  * /root/reference/dags/pipeline_orchestration_dag.py:212) applied to the
  * LLM-training-data surface instead of the employee/department schema:
  *
  * {{{
  * sense ─┬─ gate_quality ─────┐
  *        ├─ gate_expectations ┼─ filter ─ dedup ─ gate_drift ─
  *        └─ gate_fk ──────────┘
  *          ─ decontaminate ─ split ─ pack
  * }}}
  *
  * All four DQ hooks guard the chain exactly as the reference's
  * BigQueryCheckOperator guards curation: [[Quality.gatePasses]] (broken
  * load: empty table, null/dup doc ids), [[Quality.expectationGatePasses]]
  * (wrong VALUES: null text, impossible lengths, source cardinality),
  * [[Quality.fkGatePasses]] (the embeddings→documents spine, audited
  * UN-planted — the form whose zero-orphan default means what it says) up
  * front, and [[Quality.driftGatePasses]] mid-chain on the SOURCE-MIX
  * shift between the raw corpus and the post-filter+dedup survivors — the
  * gate that catches "our quality rules just silently deleted a domain"
  * (a real failure mode of C4-style filtering). A failing gate throws, so
  * the runner fail-fasts its dependents and the corpus is never built
  * from data that did not clear DQ.
  *
  * Stages hand off through parquet directories under `workDir` (each one
  * a `documents.parquet` dir readable by `Tables.load`), the way real
  * lakehouse pipelines checkpoint between jobs — every stage is
  * independently rerunnable and inspectable, and each runs the SAME
  * operator the standalone queries verify (t11 rules via
  * [[TextAnalysis.withFirstFail]], d1/d3 via [[Dedup]], t6's shingle
  * join, t5's split rule, t12's prefix-sum packing).
  *
  * Scale: nothing here adds a single operation beyond the member
  * operators' own plans — the pipeline is pure composition; handoffs are
  * columnar parquet; the only driver-side values are gate booleans.
  */
object CorpusPipeline {

  /** Max tolerated L1 distance (e6) between the raw and post-dedup
    * source-mix distributions — 0.2 total share moved across sources. */
  val DriftMaxL1E6 = 200000L

  /** A train document sharing at least this many distinct 3-shingles
    * with any eval-split document is decontaminated away. */
  val DecontamMinShingles = 1L

  /** The p17 value-bound suite on the corpus itself: a dead text column,
    * an exploded source cardinality, or an out-of-band document length
    * all stop the build before any compute is spent on it. */
  val CorpusExpectations: Seq[Expectation] = Seq(
    Expectation("documents", "text", "null_rate_e6", None, Some(0L)),
    Expectation("documents", "source", "n_distinct", Some(1L), Some(1000L)),
    Expectation("documents", "n_chars", "min_cents", Some(0L), None),
    Expectation("documents", "n_chars", "max_cents", None, Some(100000L * 100L)))

  /** The corpus star's referential spine (p18 edge config shape). */
  val CorpusFkEdges: Seq[(String, String, String, String)] =
    Seq(("embeddings", "vec_id", "documents", "doc_id"))

  private def writeDocs(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")

  /** The full stage list. `rawDir` is the landing zone (must contain
    * `documents.parquet` and `embeddings.parquet`); intermediate corpora
    * land under `workDir/{filtered,deduped,clean,train}/documents.parquet`
    * and the packed sequences at `workDir/packed.parquet`. */
  def stages(spark: SparkSession, rawDir: String, workDir: String,
             sensorTimeoutMs: Long = 10000L): Seq[Runner.Stage] = {
    val filteredDir = s"$workDir/filtered"
    val dedupedDir = s"$workDir/deduped"
    val cleanDir = s"$workDir/clean"
    val trainDir = s"$workDir/train"
    Seq(
      Runner.Stage("sense")(() => {
        if (!Sensor.await(Seq(s"$rawDir/documents.parquet",
            s"$rawDir/embeddings.parquet"), sensorTimeoutMs))
          throw new RuntimeException(s"corpus landing files absent in $rawDir")
      }),
      Runner.Stage("gate_quality", deps = Seq("sense"))(() => {
        val report = Quality.tableMetrics(
          Tables.load(spark, rawDir, "documents"), "documents", Seq("doc_id"))
        if (!Quality.gatePasses(report))
          throw new RuntimeException("corpus quality gate failed (p4 hook)")
      }),
      Runner.Stage("gate_expectations", deps = Seq("sense"))(() => {
        val report = Quality.p17ExpectationSuite(spark, rawDir, CorpusExpectations)
        if (!Quality.expectationGatePasses(report))
          throw new RuntimeException("corpus expectation gate failed (p17 hook)")
      }),
      Runner.Stage("gate_fk", deps = Seq("sense"))(() => {
        val report = Quality.p18FkAudit(spark, rawDir, CorpusFkEdges,
          simulatePartialParentLoad = false)
        if (!Quality.fkGatePasses(report))
          throw new RuntimeException("corpus FK gate failed (p18 hook)")
      }),
      Runner.Stage("filter",
        deps = Seq("gate_quality", "gate_expectations", "gate_fk"))(() =>
        writeDocs(TextAnalysis.filterKept(spark, rawDir), filteredDir)),
      Runner.Stage("dedup", deps = Seq("filter"))(() => {
        val docs = Tables.load(spark, filteredDir, "documents")
        // d1 exact keepers, then d3's near-dup pairs under the keep-min
        // rule (the larger id of every qualifying pair drops — the same
        // rule d13 sweeps); both operators run against the filtered dir
        val keepers = Dedup.d1DedupExact(spark, filteredDir)
          .filter(col("is_keeper") === 1L).select(col("doc_id"))
        val nearDupDrops = Dedup.d3DedupMinhash(spark, filteredDir)
          .select(col("doc_id_2").as("doc_id")).distinct()
        writeDocs(docs.join(keepers, Seq("doc_id"), "left_semi")
          .join(nearDupDrops, Seq("doc_id"), "left_anti"), dedupedDir)
      }),
      Runner.Stage("gate_drift", deps = Seq("dedup"))(() => {
        val a = Tables.load(spark, rawDir, "documents")
          .groupBy(col("source").as("bucket")).agg(count(lit(1)).as("n_a"))
        val b = Tables.load(spark, dedupedDir, "documents")
          .groupBy(col("source").as("bucket")).agg(count(lit(1)).as("n_b"))
        val counts = a.join(b, Seq("bucket"), "full_outer")
          .select(col("bucket"),
            coalesce(col("n_a"), lit(0L)).as("n_a"),
            coalesce(col("n_b"), lit(0L)).as("n_b"))
        if (!Quality.driftGatePasses(Quality.driftReport(counts), DriftMaxL1E6))
          throw new RuntimeException(
            "corpus drift gate failed (p14 hook): filtering skewed the source mix")
      }),
      Runner.Stage("decontaminate", deps = Seq("gate_drift"))(() => {
        val docs = Tables.load(spark, dedupedDir, "documents")
        // t6's shingle join, resolved to the TRAIN side: any train doc
        // sharing >= DecontamMinShingles distinct 3-shingles with an
        // eval-split doc is removed (the eval docs stay — they are the
        // benchmark being protected)
        val sh = docs
          .select(col("doc_id"), TextAnalysis.splitOf(col("doc_id")).as("split"),
            wsTokens(col("text")).as("toks"))
          .select(col("doc_id"), col("split"),
            explode(hashedShingles3FromToks(col("toks"))).as("h"))
          .filter(col("split").isin("train", "test"))
          .localCheckpoint(true)
        val contaminated = sh.filter(col("split") === "train")
          .select(col("doc_id"), col("h"))
          .join(sh.filter(col("split") === "test").select(col("h")).distinct(), Seq("h"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("h")).as("n_shared"))
          .filter(col("n_shared") >= DecontamMinShingles)
          .select(col("doc_id"))
        writeDocs(docs.join(contaminated, Seq("doc_id"), "left_anti"), cleanDir)
      }),
      Runner.Stage("split", deps = Seq("decontaminate"))(() => {
        val docs = Tables.load(spark, cleanDir, "documents")
        writeDocs(docs.filter(TextAnalysis.splitOf(col("doc_id")) === "train"),
          trainDir)
      }),
      Runner.Stage("pack", deps = Seq("split"))(() =>
        graft.operators.TextAnalysis.t12SequencePack(spark, trainDir)
          .write.mode("overwrite").parquet(s"$workDir/packed.parquet"))
    )
  }

  /** Run the whole chain under the per-name non-overlap guard. */
  def run(spark: SparkSession, rawDir: String, workDir: String,
          onFailure: (String, Throwable) => Unit = Runner.noFailureHook)
      : Seq[Runner.StageResult] =
    Runner.run("corpus_build", Runner.QueueRun,
      stages(spark, rawDir, workDir), onFailure)
}
