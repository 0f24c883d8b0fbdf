package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming shapes promoted onto the MEASURED oracle surface
  * (SURVEY §2's streaming family was test-only through round 18): each
  * entry drives a real Structured Streaming query — file source →
  * AvailableNow drain → durable state — and emits the drained state as
  * a deterministic frame the DuckDB oracle can restate as batch SQL.
  * The CORRECTNESS row is therefore a stream-vs-batch equivalence proof
  * executed through the actual streaming machinery (source listing
  * order, micro-batch boundaries, foreachBatch idempotence, state-dir
  * merge), not a unit replay of its parts. */
object StreamQueries {

  /** `st1_stream_dedup`: the streaming corpus-dedup ingest
    * ([[StreamPipelines.corpusDedupSink]] — d1's exact content dedup run
    * as a continuous crawl stage) drained over a DETERMINISTIC two-batch
    * arrival of the documents table: even doc_ids land as the older
    * input file, odd doc_ids as the newer one, `maxFilesPerTrigger=1`
    * makes each file its own micro-batch (the file source processes
    * oldest-first), and `Trigger.AvailableNow` drains the backlog and
    * stops. The accepted set is batch-ORDER-dependent — a hash seen in
    * batch 0 keeps its even-side min doc_id and blocks the odd side —
    * so the oracle must restate the streaming semantics (per-batch
    * keeper + anti-join against prior state), not just d1: exactly the
    * asymmetry that makes this a streaming CORRECTNESS row rather than
    * a re-labeled batch one. Output: one row per accepted document
    * (norm_hash, doc_id, src_batch), ordered by hash.
    *
    * Scale: the staging writes are the test-scale stand-in for a crawl
    * landing zone (production streams FROM such a zone; it doesn't
    * create one). Everything the stream files is fingerprint-sized —
    * text dies in each micro-batch's scan; the state merge is the
    * hash-keyed anti-join d8 ships at batch scale. */
  /** Recursively delete a run's scratch dir. The staged arrival files are
    * a full table copy; Bench times these queries every rep of every
    * sweep, so leaving them to accumulate in /tmp leaks a corpus copy per
    * rep. Called in a `finally` AFTER the drained state has been
    * localCheckpoint'ed (the returned frame must not depend on files
    * this deletes). Best-effort: cleanup failure must not fail the query. */
  private def deleteWork(work: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(work)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }

  def st1StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_st1").toString
    try st1Run(spark, dir, work) finally deleteWork(work)
  }

  private def st1Run(spark: SparkSession, dir: String, work: String): DataFrame = {
    val in = new java.io.File(work, "in"); in.mkdirs()
    val state = s"$work/state"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // stage the two arrival files with forced modification times so the
    // file source's oldest-first listing order is deterministic
    def stage(name: String, even: Boolean, mtime: Long): Unit = {
      val tmp = s"$work/stage_$name"
      docs.filter((col("doc_id") % 2 === 0) === even)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(in, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(mtime), s"cannot stamp mtime on $dst")
    }
    stage("a", even = true, 1000000000L)
    stage("b", even = false, 2000000000L)
    val q = StreamPipelines.corpusDedupSink(spark,
        StreamPipelines.fileDocumentsStream(spark, in.toString,
          maxFilesPerTrigger = 1),
        state)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    require(q.exception.isEmpty, s"st1 stream died: ${q.exception}")
    val batchDirs = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("b")).sortBy(_.getName.drop(1).toLong)
    require(batchDirs.length == 2,
      s"expected 2 micro-batches, got ${batchDirs.map(_.getName).toSeq}")
    // localCheckpoint (eager) pins the fingerprint-sized state in block
    // storage so the scratch dir — staged table copy, checkpoint, state —
    // can be deleted the moment this returns instead of leaking per rep
    batchDirs.map { d =>
      spark.read.parquet(d.getPath)
        .select(col("norm_hash"), col("doc_id"),
          lit(d.getName.drop(1).toLong).as("src_batch"))
    }.reduce(_ unionByName _).localCheckpoint(eager = true)
      .orderBy(col("norm_hash"), col("doc_id"))
  }

  /** st1 oracle: the STREAMING semantics as batch SQL — batch 0 keeps
    * the min even doc_id per hash; batch 1 keeps the min odd doc_id per
    * hash for hashes batch 0 did not file (the anti-join against prior
    * state). Stating plain d1 here would hash-mismatch whenever a hash's
    * global min id is odd but an even twin arrived first — the
    * batch-order dependence is the thing being verified. The batch-1 arm
    * is NOT EXISTS, not NOT IN: a NULL text yields a NULL hash, and NOT
    * IN against a set containing NULL drops EVERY batch-1 row, while the
    * engine's left_anti join keeps null-key rows (null never matches) —
    * NOT EXISTS has exactly the left_anti null semantics. */
  private val st1Oracle: String =
    """WITH n AS (
      | SELECT doc_id,
      |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
      | FROM documents),
      |a AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS doc_id
      | FROM n WHERE doc_id % 2 = 0 GROUP BY 1),
      |b AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS doc_id
      | FROM n WHERE doc_id % 2 = 1 GROUP BY 1)
      |SELECT h AS norm_hash, doc_id, CAST(0 AS BIGINT) AS src_batch FROM a
      |UNION ALL
      |SELECT b.h, b.doc_id, CAST(1 AS BIGINT)
      |FROM b WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.h = b.h)
      |ORDER BY norm_hash, doc_id""".stripMargin

  /** `st2_stream_upsert`: the incremental-merge stream
    * ([[StreamPipelines.upsertSink]] — p7's last-writer-wins merge run
    * as a continuous foreachBatch stage with versioned parquet state)
    * drained over a deterministic two-batch arrival of the events
    * change log: the older TIME HALF (ts below the data-derived
    * midpoint) lands as batch 0, the newer half as batch 1, so batch 1
    * OVERWRITES batch-0 state for every user active in both halves —
    * on this corpus that is most users, making the cross-batch merge
    * arm corpus-non-vacuous (st1's anti-join arm, by contrast, is
    * planted in StreamingSpec: the corpus has no exact dups). The final
    * drained state is per-user the latest event (ts desc, event_id desc
    * tie) — upsert is split-invariant, so the oracle states the global
    * argmax and the hash match proves the versioned two-batch merge
    * reproduces it THROUGH the streaming machinery (source listing,
    * micro-batch boundaries, version-dir merge chain, GC).
    *
    * Scale: state is user-grained (dimension-sized); each batch pays
    * one batch-sized window + a state rewrite — [[StreamPipelines.upsertBatch]]'s
    * documented shape. Integer columns only (epoch micros, value
    * cents). */
  def st2StreamUpsert(spark: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_st2").toString
    try st2Run(spark, dir, work) finally deleteWork(work)
  }

  private def st2Run(spark: SparkSession, dir: String, work: String): DataFrame = {
    val in = new java.io.File(work, "in"); in.mkdirs()
    val state = s"$work/state"
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        floor(col("value") * 100).cast("long").as("value_c"))
    val cut = ev.agg(
      expr("CAST((min(ts_us) + max(ts_us) + 1) div 2 AS BIGINT)").as("cut_us"))
    def stage(name: String, older: Boolean, mtime: Long): Unit = {
      val tmp = s"$work/stage_$name"
      val side = ev.crossJoin(broadcast(cut))
        .filter(if (older) col("ts_us") < col("cut_us")
                else col("ts_us") >= col("cut_us"))
        .drop("cut_us")
      side.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(in, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(mtime), s"cannot stamp mtime on $dst")
    }
    stage("a", older = true, 1000000000L)
    stage("b", older = false, 2000000000L)
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts_us LONG, " +
        "event_type STRING, value_c LONG")
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val q = StreamPipelines.upsertSink(spark, stream, state,
        Seq("user_id"), "ts_us", "event_id")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    require(q.exception.isEmpty, s"st2 stream died: ${q.exception}")
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName.drop(1).toLong)
    require(versions.contains(2L),
      s"expected the two-batch version chain, got v${versions.sorted.toSeq}")
    spark.read.parquet(s"$state/v${versions.max}")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), col("value_c"))
      .localCheckpoint(eager = true)
      .orderBy(col("user_id"))
  }

  /** st2 oracle: upsert over a time-split is split-invariant, so the
    * batch statement is the global per-user argmax on (ts, event_id). */
  private val st2Oracle: String =
    """SELECT user_id, event_id, ts_us, event_type, value_c FROM (
      | SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
      |  CAST(floor(value * 100) AS BIGINT) AS value_c,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      | FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_stream_dedup" -> (st1StreamDedup _),
    "st2_stream_upsert" -> (st2StreamUpsert _))

  val oracle: Map[String, String] = Map(
    "st1_stream_dedup" -> st1Oracle,
    "st2_stream_upsert" -> st2Oracle)
}
