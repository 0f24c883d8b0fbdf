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

  /** Stage one arrival file: write `side` as a single parquet file named
    * `name.parquet` under `in` with a forced modification time, so the
    * file source's oldest-first listing order is deterministic (the
    * st1/st2 staging rule, shared by st3/st4/st5). */
  private def stageFile(in: java.io.File, work: String, name: String,
                        side: DataFrame, mtime: Long): Unit = {
    val tmp = s"$work/stage_$name"
    side.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(in, s"$name.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    require(dst.setLastModified(mtime), s"cannot stamp mtime on $dst")
  }

  /** `st3_stream_quality`: the streaming quality gate
    * ([[StreamPipelines.qualityGateSink]] — t24's hashed-linear
    * classifier run as a continuous crawl-ingest filter) drained over a
    * deterministic two-batch arrival of the documents table (even
    * doc_ids older, odd newer — st1's split). Each micro-batch scores
    * its documents with the SAME model the batch operator applies,
    * admits score>0, and files a per-batch yield ledger. Output: one row
    * per ADMITTED document (doc_id, n_toks, score, src_batch), so the
    * oracle proves train/serve scoring parity THROUGH the streaming
    * machinery plus the batch-assignment bookkeeping; the per-batch
    * ledgers are replayed against the admitted rows as an engine-side
    * invariant before the frame is returned (a ledger that disagrees
    * with its own keep set fails the query, not just a test).
    *
    * Scale: scoring is t24's zero-join per-row fold; only (doc_id,
    * n_toks, score) outlive each micro-batch scan, and state is
    * append-only batch dirs. */
  def st3StreamQuality(spark: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_st3").toString
    try st3Run(spark, dir, work) finally deleteWork(work)
  }

  private def st3Run(spark: SparkSession, dir: String, work: String): DataFrame = {
    val in = new java.io.File(work, "in"); in.mkdirs()
    val state = s"$work/state"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    stageFile(in, work, "a", docs.filter(col("doc_id") % 2 === 0), 1000000000L)
    stageFile(in, work, "b", docs.filter(col("doc_id") % 2 =!= 0), 2000000000L)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val q = StreamPipelines.qualityGateSink(spark, stream, state)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    require(q.exception.isEmpty, s"st3 stream died: ${q.exception}")
    val batchIds = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("keep_b")).map(_.getName.drop(6).toLong).sorted
    require(batchIds.sameElements(Array(0L, 1L)),
      s"expected 2 micro-batches, got ${batchIds.toSeq}")
    val kept = batchIds.map { b =>
      val k = spark.read.parquet(s"$state/keep_b$b")
        .select(col("doc_id"), col("n_toks"), col("score"),
          lit(b).as("src_batch"))
      // the yield ledger must agree with its own keep set — the
      // streaming bookkeeping is part of what this row verifies
      val led = spark.read.parquet(s"$state/ledger_b$b")
        .select(col("n_keep")).head.getLong(0)
      val nk = k.count()
      require(led == nk, s"st3 batch $b ledger n_keep=$led but kept $nk")
      k
    }.reduce(_ unionByName _).localCheckpoint(eager = true)
    kept.orderBy(col("doc_id"))
  }

  /** st3 oracle: t24's score restated per document (the same md5-bucket
    * integer-weight fold), admitted at score>0, with src_batch the
    * even/odd arrival split. Scoring is per-row, so the streaming value
    * verified here is the machinery: per-batch scan boundaries, ledger
    * bookkeeping, batch provenance. */
  private def st3Oracle: String = {
    val weight = graft.operators.TextAnalysis.clfWeightSql
    val toks = graft.operators.TextAnalysis.toksCaseSql
    s"""SELECT doc_id, n_toks, score, src_batch FROM (
       | SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_toks,
       |  CAST(COALESCE(list_sum(list_transform(toks, t -> $weight)), 0)
       |    AS BIGINT) AS score,
       |  CAST(doc_id % 2 AS BIGINT) AS src_batch
       | FROM (SELECT doc_id, $toks AS toks FROM documents))
       |WHERE score > 0
       |ORDER BY doc_id""".stripMargin
  }

  /** `st4_stream_scd2`: the streaming SCD2 dimension build
    * ([[StreamPipelines.scd2Sink]] — p5's dbt-curation shape run as an
    * idempotent foreachBatch stage with versioned parquet state) drained
    * over st2's deterministic two-batch TIME split of the events change
    * log (older half below the data-derived midpoint arrives first).
    * The split satisfies the sink's stated replay condition — per-key
    * ascending event time across batches, ties co-located (the cut is a
    * constant, so equal timestamps land on one side) — under which the
    * accumulated state is ROW-IDENTICAL to the batch `p5_scd2_user`
    * over the full log: closing-at-next-change commutes with the batch
    * split. The oracle is therefore p5's own SQL, and the hash match
    * proves the batch-extension arithmetic (close the open version at
    * the batch's first change per key, renumber versions from the
    * key's prior max) THROUGH the streaming machinery.
    *
    * Scale: per-batch cost is one batch-sized window + one key-grained
    * join against dimension-sized state (the scd2Sink caveat applies:
    * whole-state rewrite per batch — right for a dimension). */
  def st4StreamScd2(spark: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_st4").toString
    try st4Run(spark, dir, work) finally deleteWork(work)
  }

  private def st4Run(spark: SparkSession, dir: String, work: String): DataFrame = {
    val in = new java.io.File(work, "in"); in.mkdirs()
    val state = s"$work/state"
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type"), col("value"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
    val cut = ev.agg(
      expr("CAST((min(ts_us) + max(ts_us) + 1) div 2 AS BIGINT)").as("cut_us"))
    def side(older: Boolean) = ev.crossJoin(broadcast(cut))
      .filter(if (older) col("ts_us") < col("cut_us")
              else col("ts_us") >= col("cut_us"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts"))
    stageFile(in, work, "a", side(older = true), 1000000000L)
    stageFile(in, work, "b", side(older = false), 2000000000L)
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, event_type STRING, " +
        "value DOUBLE, ts TIMESTAMP")
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val q = StreamPipelines.scd2Sink(spark, stream, state)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    require(q.exception.isEmpty, s"st4 stream died: ${q.exception}")
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName.drop(1).toLong)
    require(versions.contains(2L),
      s"expected the two-batch version chain, got v${versions.sorted.toSeq}")
    spark.read.parquet(s"$state/v${versions.max}")
      .select(col("user_id"), col("version"), col("event_type"),
        col("value"), col("effective_from_us"), col("effective_to_us"),
        col("is_current"))
      .localCheckpoint(eager = true)
      .orderBy(col("user_id"), col("version"))
  }

  /** `st5_stream_funnel`: the stateful streaming funnel
    * ([[StreamPipelines.funnelize]] — q20's ordered-funnel verdicts
    * emitted per CLOSED session from flatMapGroupsWithState with an
    * event-time watermark) drained over a deterministic arrival: one
    * file carrying the whole events table (watermark starts at 0, so
    * in-batch disorder cannot drop anything), then TWO far-future
    * sentinel files (a synthetic user −1, one and two years past the
    * corpus max). Sentinel 1's batch runs with the watermark already at
    * the corpus max — most sessions' event-time timeouts fire and their
    * verdicts emit; sentinel 2's batch runs with the watermark a year
    * past the corpus, closing every remaining real session REGARDLESS of
    * whether the engine schedules a trailing no-data batch — the drained
    * output is deterministic without depending on that scheduling
    * detail. The sentinel user's own session stays open (its timeout is
    * past the final watermark) and is filtered by user_id ≥ 0. The
    * oracle restates per-session ordered-funnel verdicts in batch SQL
    * over the gap split, so the hash match proves q20's step semantics
    * THROUGH the stateful-streaming machinery: state buffering, gap
    * splits, per-user session numbering across batches, event-time
    * timeout flushes.
    *
    * Scale: state is per-user open-tail only (closed sessions leave the
    * buffer); the emitted rows are session-grained. */
  def st5StreamFunnel(spark: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_st5").toString
    try st5Run(spark, dir, work) finally deleteWork(work)
  }

  private def st5Run(spark: SparkSession, dir: String, work: String): DataFrame = {
    import spark.implicits._
    val in = new java.io.File(work, "in"); in.mkdirs()
    val out = s"$work/out"
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts"), col("event_type"))
    stageFile(in, work, "a", ev, 1000000000L)
    val maxTsMs = ev.agg(max(col("ts"))).head.getTimestamp(0).getTime
    val yearMs = 365L * 86400L * 1000L
    def sentinel(offsetMs: Long) = Seq(
      (-1L, -1L, new java.sql.Timestamp(maxTsMs + offsetMs), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    stageFile(in, work, "b", sentinel(yearMs), 2000000000L)
    stageFile(in, work, "c", sentinel(2 * yearMs), 3000000000L)
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING")
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
      .as[StreamPipelines.FunnelEv]
    implicit val sp: SparkSession = spark
    val q = StreamPipelines.funnelize(stream)
      .filter(col("user_id") >= 0)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    require(q.exception.isEmpty, s"st5 stream died: ${q.exception}")
    spark.read.parquet(out)
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("reached1"), col("reached2"), col("reached3"),
        col("has1"), col("has2"), col("has3"))
      .localCheckpoint(eager = true)
      .orderBy(col("user_id"), col("session_id"))
  }

  /** st5 oracle: per-session ordered-funnel verdicts as batch SQL —
    * q20's gap split (the shared session CTE) and its at-or-after step
    * times, one row PER SESSION instead of q20's three global step
    * rows. Every real session closes by the final sentinel watermark,
    * so the drained set is exactly all sessions. */
  private def st5Oracle: String =
    s"""WITH ${graft.operators.Behavior.sessionCteSql},
       |base AS (
       | SELECT user_id, session_id, count(*) AS n_events,
       |  CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS has1,
       |  CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS has2,
       |  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS has3
       | FROM s GROUP BY 1, 2),
       |t1 AS (
       | SELECT user_id, session_id,
       |  min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
       | FROM s GROUP BY 1, 2),
       |t2 AS (
       | SELECT s.user_id, s.session_id,
       |  min(CASE WHEN s.event_type = 'click' AND s.ts_us >= t1.t1
       |    THEN s.ts_us END) AS t2
       | FROM s JOIN t1 USING (user_id, session_id) GROUP BY 1, 2),
       |t3 AS (
       | SELECT s.user_id, s.session_id,
       |  min(CASE WHEN s.event_type = 'purchase' AND s.ts_us >= t2.t2
       |    THEN s.ts_us END) AS t3
       | FROM s JOIN t2 USING (user_id, session_id) GROUP BY 1, 2)
       |SELECT b.user_id, b.session_id, b.n_events,
       | CAST(CASE WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached1,
       | CAST(CASE WHEN t2.t2 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached2,
       | CAST(CASE WHEN t3.t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached3,
       | b.has1, b.has2, b.has3
       |FROM base b
       | JOIN t1 USING (user_id, session_id)
       | JOIN t2 USING (user_id, session_id)
       | JOIN t3 USING (user_id, session_id)
       |ORDER BY user_id, session_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_stream_dedup" -> (st1StreamDedup _),
    "st2_stream_upsert" -> (st2StreamUpsert _),
    "st3_stream_quality" -> (st3StreamQuality _),
    "st4_stream_scd2" -> (st4StreamScd2 _),
    "st5_stream_funnel" -> (st5StreamFunnel _))

  val oracle: Map[String, String] = Map(
    "st1_stream_dedup" -> st1Oracle,
    "st2_stream_upsert" -> st2Oracle,
    "st3_stream_quality" -> st3Oracle,
    "st4_stream_scd2" -> graft.pipeline.Scd2.oracle,
    "st5_stream_funnel" -> st5Oracle)
}
