package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.functions.VectorFunctions

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("m1: decode output is invariant to batch size and partitioning") {
    val a = Multimodal.m1MultimodalMeta(spark, sf, batchSize = 1).collect().map(_.toString).sorted
    val b = Multimodal.m1MultimodalMeta(spark, sf, batchSize = 256).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("m1: stub decode agrees with the oracle formulas on a known payload") {
    val item = Multimodal.MediaItem(7L, "audio", Array.tabulate(64)(i => (i % 251).toByte))
    val f = Multimodal.decodeStub(item)
    assert(f.n_bytes == 64)
    assert(f.byte_sum == (0 until 64).map(i => i % 251).sum)
    assert(f.first_byte == 0)
    assert(f.channels == 1) // audio
    assert(f.width >= 64 && f.width < 64 + 1856)
    assert(f.height >= 64 && f.height < 64 + 1056)
  }

  test("m2: stride-2 sampling yields frames 0 and 2 per video doc, and " +
    "frame 0 starts at the payload's first byte") {
    val m2 = Multimodal.m2FrameSample(spark, sf).collect()
    val videoDocs = Multimodal.mediaTable(spark, sf)
      .filter(col("media_type") === "video").count()
    assert(m2.length == 2 * videoDocs, s"${m2.length} rows for $videoDocs videos")
    val byDoc = m2.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("frame_idx")).sorted.sameElements(Array(0L, 2L)))
      rows.foreach { r =>
        assert(r.getAs[String]("frame_fp").matches("[0-9a-f]{32}"))
        assert(r.getAs[Long]("byte_sum") >= 0 && r.getAs[Long]("byte_sum") <= 16 * 255)
      }
    }
    // frame 0 of each doc starts where m1 read the payload's first byte
    val m1First = Multimodal.m1MultimodalMeta(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("first_byte")).toMap
    m2.filter(_.getAs[Long]("frame_idx") == 0L).foreach(r =>
      assert(r.getAs[Long]("first_byte") == m1First(r.getAs[Long]("doc_id"))))
  }

  test("m3: seven overlapping windows per audio doc, stats bounded, and " +
    "the energy/peak agree with a direct payload recompute") {
    val m3 = Multimodal.m3AudioWindows(spark, sf).collect()
    val audio = Multimodal.mediaTable(spark, sf)
      .filter(col("media_type") === "audio")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("content")).toMap
    // 64-byte payload, window 16, hop 8 -> starts 0,8,...,48 = 7 windows
    assert(m3.length == 7 * audio.size, s"${m3.length} rows for ${audio.size} audio docs")
    m3.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rows) =>
      assert(rows.map(_.getAs[Long]("win_idx")).sorted.sameElements(0L to 6L))
      rows.foreach { r =>
        val start = r.getAs[Long]("start_byte").toInt
        assert(start == r.getAs[Long]("win_idx") * Multimodal.HopBytes)
        // recompute energy/peak straight from the payload bytes
        val win = audio(doc).slice(start, start + Multimodal.WinBytes)
          .map(b => (b & 0xff).toLong - 128L)
        assert(r.getAs[Long]("energy") == win.map(d => d * d).sum)
        assert(r.getAs[Long]("peak") == win.map(math.abs).max)
        assert(r.getAs[Long]("is_quiet") ==
          (if (r.getAs[Long]("energy") < Multimodal.QuietBelow) 1L else 0L))
        assert(r.getAs[String]("win_fp").matches("[0-9a-f]{32}"))
      }
    }
    // the flag must split the corpus (not land all-0/all-1 vacuously)
    val quiet = m3.count(_.getAs[Long]("is_quiet") == 1L)
    assert(quiet > 0 && quiet < m3.length, s"quiet=$quiet of ${m3.length}")
  }

  test("m5: payload-dedup accounting closes — planted identical texts " +
    "share a payload, per-modality items total the corpus, bytes balance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_m5").toString
    // doc_ids 0,3,6 are all 'image' (id % 3 == 0); two share a text so
    // their payloads are byte-identical; 1 ('audio') is unique
    Seq((0L, "same text"), (3L, "same text"), (6L, "other text"),
        (1L, "audio text"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.Multimodal.m5PayloadDedup(spark, dir).collect()
      .map(r => r.getAs[String]("media_type") ->
        ((r.getAs[Long]("n_items"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("n_dup_items"), r.getAs[Long]("max_copies"),
          r.getAs[Long]("bytes_total"), r.getAs[Long]("bytes_reclaimable")))).toMap
    assert(got("image") == ((3L, 2L, 1L, 2L, 192L, 64L)),
      s"image accounting: ${got("image")}")
    assert(got("audio") == ((1L, 1L, 0L, 1L, 64L, 0L)))
    assert(!got.contains("video"))
    // corpus: items total the documents table, bytes arithmetic closes
    val corpus = graft.operators.Multimodal.m5PayloadDedup(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(corpus.map(_.getAs[Long]("n_items")).sum == nDocs)
    corpus.foreach { r =>
      assert(r.getAs[Long]("n_items") - r.getAs[Long]("n_unique")
        == r.getAs[Long]("n_dup_items"))
      assert(r.getAs[Long]("bytes_total") == r.getAs[Long]("n_items") * 64L)
      assert(r.getAs[Long]("bytes_reclaimable")
        == r.getAs[Long]("n_dup_items") * 64L)
    }
  }

  test("m4: four tiles per image doc, and each tile's bytes/stats agree " +
    "with a direct 2D gather from the payload") {
    val m4 = Multimodal.m4ImageTiles(spark, sf).collect()
    val images = Multimodal.mediaTable(spark, sf)
      .filter(col("media_type") === "image")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("content")).toMap
    assert(m4.length == 4 * images.size, s"${m4.length} rows for ${images.size} image docs")
    m4.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rows) =>
      assert(rows.map(r => (r.getAs[Long]("tile_x"), r.getAs[Long]("tile_y"))).toSet ==
        Set((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)))
      rows.foreach { r =>
        val (tx, ty) = (r.getAs[Long]("tile_x").toInt, r.getAs[Long]("tile_y").toInt)
        // independent row-major gather straight from the payload bytes
        val pix = for {
          row <- 0 until Multimodal.TileH
          c <- 0 until Multimodal.TileW
        } yield (images(doc)((ty * Multimodal.TileH + row) * Multimodal.ImgW
          + tx * Multimodal.TileW + c) & 0xff).toLong
        assert(r.getAs[Long]("byte_sum") == pix.sum)
        assert(r.getAs[Long]("pix_min") == pix.min)
        assert(r.getAs[Long]("pix_max") == pix.max)
        assert(r.getAs[String]("tile_fp").matches("[0-9a-f]{32}"))
      }
      // the synthetic payload is repeat(md5, 4): a 16-byte period = every
      // 2 image rows, so tiles repeat VERTICALLY exactly (ty=0 ≡ ty=1)
      // while the left/right halves differ — a sharp check that the 2D
      // gather picks up exactly the bytes it should
      val fp = rows.map(r => (r.getAs[Long]("tile_x"), r.getAs[Long]("tile_y")) ->
        r.getAs[String]("tile_fp")).toMap
      assert(fp((0L, 0L)) == fp((0L, 1L)) && fp((1L, 0L)) == fp((1L, 1L)))
      assert(fp((0L, 0L)) != fp((1L, 0L)))
    }
  }

  test("vector functions: dot/l2/bucket deterministic and consistent") {
    import spark.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.l2(col("a")).as("na"),
      VectorFunctions.cosine(col("a"), col("b")).as("c"),
      VectorFunctions.cosineFast(col("a"), col("b")).as("cf")).collect()(0)
    assert(r.getDouble(0) == 24.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == r.getDouble(3)) // declarative == fused
    assert(math.abs(r.getDouble(2) - 24.0 / 25.0) < 1e-12)
    // hyperplane bucket: deterministic across evaluations
    val e = Tables.load(spark, sf, "embeddings").limit(20)
    val b1 = e.select(col("vec_id"), graft.functions.VectorFunctions
      .hyperplaneBucket(col("embedding"), graft.operators.Similarity.planes).as("bk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b2 = e.select(col("vec_id"), graft.functions.VectorFunctions
      .hyperplaneBucket(col("embedding"), graft.operators.Similarity.planes).as("bk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(b1.sameElements(b2))
    assert(b1.forall { case (_, bk) => bk >= 0 && bk < 256 })
  }

  test("m7: pair-audit verdicts match an exact Scala replica of the " +
    "planted anomalies, and every status is non-vacuous on the corpus") {
    import org.apache.spark.sql.functions.col
    def md5Hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bkt(id: Long, salt: String): Long =
      java.lang.Long.parseLong(md5Hex(s"$id:$salt").substring(0, 15), 16) % 100
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // replica: caption registry (with the stale-digest slice), media
    // store (with the truncated re-upload slice), then the verdict rule
    val expected = docs.flatMap { case (id, text) =>
      val cb = bkt(id, "cap"); val mb = bkt(id, "med")
      val hasCap = cb < Multimodal.CapBucketMax
      val want = if (cb >= Multimodal.StaleBucketMin) md5Hex(md5Hex(text))
                 else md5Hex(md5Hex(text) * 4)
      val medDigests =
        (if (mb < Multimodal.MedBucketMax) Seq(md5Hex(md5Hex(text) * 4)) else Seq.empty) ++
        (if (mb < Multimodal.DupBucketMax) Seq(md5Hex(md5Hex(text) * 2)) else Seq.empty)
      if (!hasCap && medDigests.isEmpty) None
      else {
        val nMedia = medDigests.size
        val status =
          if (!hasCap) "no_caption"
          else if (nMedia == 0) "no_media"
          else if (nMedia > 1) "dup_media"
          else if (!medDigests.contains(want)) "digest_mismatch"
          else "ok"
        Some(id -> (if (hasCap) 1L else 0L, nMedia.toLong,
          medDigests.distinct.size.toLong, status))
      }
    }.toMap
    val got = Multimodal.m7PairAudit(spark, sf)
      .select(col("pair_key"), col("n_captions"), col("n_media"),
        col("n_digests"), col("status")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(got == expected, {
      val diff = (expected.keySet ++ got.keySet)
        .filter(k => expected.get(k) != got.get(k)).take(5)
      s"verdict mismatch on keys $diff: expected ${diff.map(expected.get)}, got ${diff.map(got.get)}"
    })
    // each planted anomaly class actually fires on the shipped corpus —
    // a vacuous status would mean the audit never exercises its rule
    val statuses = expected.values.map(_._4).toSet
    assert(statuses == Set("ok", "no_caption", "no_media", "dup_media", "digest_mismatch"),
      s"vacuous or unknown statuses: $statuses")
  }

  test("m7: payload bytes die in the media scan — only constant-width " +
    "digests cross the join and aggregate (the m5 contract)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val exec = Multimodal.m7PairAudit(spark, sf)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
    // no binary column and no payload-width hex rendering may cross a
    // DATA-MOVING operator (exchange, join, aggregate, sort): the digest
    // is computed in the scan-side projection and is all that travels.
    // (The projection itself outputs the synthetic `content` it derives —
    // at a real deployment that IS the scan column — so narrow Projects
    // are exempt, movement is not.)
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val movers = exec.collect {
      case n: Exchange => n
      case n: BaseJoinExec => n
      case n: BaseAggregateExec => n
      case n: SortExec => n
    }
    assert(movers.nonEmpty, s"expected join/aggregate nodes in:\n$exec")
    movers.foreach { node =>
      node.output.foreach { a =>
        assert(a.dataType != org.apache.spark.sql.types.BinaryType,
          s"binary ${a.name} crosses ${node.nodeName}")
        assert(!a.name.toLowerCase.contains("content"),
          s"payload column ${a.name} crosses ${node.nodeName}")
      }
    }
  }

  test("m8: scrub verdicts match an exact Scala replica of the planted " +
    "corruption, every status is non-vacuous, and byte accounting balances") {
    import org.apache.spark.sql.functions.col
    def md5Hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bkt(id: Long, salt: String): Long =
      java.lang.Long.parseLong(md5Hex(s"$id:$salt").substring(0, 15), 16) % 100
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // replica: apply the plant's own precedence (truncation wins), then
    // the scrubber's verdict rule, then aggregate to the report grain
    val items = docs.map { case (id, text) =>
      val mt = Seq("image", "audio", "video")((id % 3).toInt)
      val m = md5Hex(text) * 4
      val sh =
        if (bkt(id, "m8t") < Multimodal.TruncBucketMax) m.substring(0, 96)
        else if (bkt(id, "m8z") < Multimodal.RotBucketMax)
          m.substring(0, 64) + "00" * 16 + m.substring(96, 128)
        else m
      val status =
        if (sh.length / 2 != 64) "short_read"
        else if (md5Hex(sh) != md5Hex(m)) "bitrot"
        else "ok"
      (mt, status, sh.length / 2L)
    }
    val expected = items.groupBy(t => (t._1, t._2)).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._3).sum, vs.length * 64L)
    }
    val got = Multimodal.m8ScrubAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected, s"report mismatch: expected $expected, got $got")
    // each corruption class fires on the shipped corpus — a vacuous
    // status would mean the scrubber never exercises its rule — and ok
    // items dominate (the plant corrupts ~8%, not the corpus)
    val byStatus = items.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStatus.keySet == Set("ok", "short_read", "bitrot"),
      s"vacuous or unknown statuses: ${byStatus.keySet}")
    assert(byStatus("ok") > byStatus("short_read") + byStatus("bitrot"))
    // short reads lose exactly one 16-byte frame each; everything else
    // stores its full 64 bytes
    val (sn, sb, _) = expected(expected.keySet.filter(_._2 == "short_read").head)
    assert(sb == sn * 48L)
  }

  test("m8: payload bytes die in the store scan — only constant-width " +
    "digests cross the join and aggregate (the m5/m7 contract)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val exec = Multimodal.m8ScrubAudit(spark, sf)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val movers = exec.collect {
      case n: Exchange => n
      case n: BaseJoinExec => n
      case n: BaseAggregateExec => n
      case n: SortExec => n
    }
    assert(movers.nonEmpty, s"expected join/aggregate nodes in:\n$exec")
    movers.foreach { node =>
      node.output.foreach { a =>
        assert(a.dataType != org.apache.spark.sql.types.BinaryType,
          s"binary ${a.name} crosses ${node.nodeName}")
        // "stored" exact: the payload column; stored_bytes is the BIGINT sum
        assert(!a.name.toLowerCase.contains("content") &&
          a.name.toLowerCase != "stored",
          s"payload column ${a.name} crosses ${node.nodeName}")
      }
    }
  }

  test("m6: every manifest prefix tracks the 3:2:1 mix to within one " +
    "item per modality until a modality exhausts, and seq is a total order") {
    import org.apache.spark.sql.functions._
    val rows = Multimodal.m6MixManifest(spark, sf)
      .select(col("seq"), col("media_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // seq is the contiguous 1..n total order
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    val weights = Multimodal.MixWeights.toMap
    val wSum = weights.values.sum
    val supply = rows.groupBy(_._2).view.mapValues(_.length).toMap
    // horizon: the first L at which some modality's stride demand
    // outruns its supply
    val horizon = weights.map { case (m, w) =>
      supply(m).toLong * wSum / w
    }.min.toInt
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    rows.take(horizon).zipWithIndex.foreach { case ((_, m), i) =>
      counts(m) += 1
      val l = i + 1
      weights.foreach { case (mod, w) =>
        val target = l.toDouble * w / wSum
        // the 3:2:1 stride schedule's true worst case is 5/6 of an item
        // (period scale=6, alphabetical tie-break) — assert the tight ±1
        // bound the docstring states; PropertySpec keeps ±|modalities|
        // for arbitrary weights
        assert(math.abs(counts(mod) - target) <= 1.0,
          s"prefix $l: $mod at ${counts(mod)} vs target $target")
      }
    }
  }

  test("m9: the tape closes exactly, bins bracket each item, the order is " +
    "m6's manifest, and every cost equals its extractor's real row count") {
    val rows = Multimodal.m9PackInterleaved(spark, sf).collect()
      .map(r => (r.getAs[Long]("seq"), r.getAs[Long]("doc_id"),
        r.getAs[String]("media_type"), r.getAs[Long]("cost_toks"),
        r.getAs[Long]("tape_off"), r.getAs[Long]("bin_first"),
        r.getAs[Long]("bin_last"))).sortBy(_._1)
    val B = Multimodal.MediaBinToks
    // tape closure: first offset 0, each next = prev + prev's cost
    assert(rows.head._5 == 0L)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._5 == a._5 + a._4,
        s"tape tears between seq ${a._1} and ${b._1}")
      case _ =>
    }
    // bin bracketing
    rows.foreach { r =>
      assert(r._6 == r._5 / B)
      assert(r._7 == math.max(r._5, r._5 + r._4 - 1) / B)
      assert(r._4 > 0, s"doc ${r._2}: full payloads must never cost 0")
    }
    // the packing order IS m6's manifest order
    val manifest = Multimodal.m6MixManifest(spark, sf).collect()
      .map(r => (r.getAs[Long]("seq"), r.getAs[Long]("doc_id"))).sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq == manifest.toSeq)
    // cost_toks == the REAL extractor's per-doc row count — the packer
    // budgets exactly what the encoders will consume
    def perDoc(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    val frames = perDoc(Multimodal.m2FrameSample(spark, sf))
    val wins = perDoc(Multimodal.m3AudioWindows(spark, sf))
    val tiles = perDoc(Multimodal.m4ImageTiles(spark, sf))
    rows.foreach { r =>
      val expected = r._3 match {
        case "video" => frames(r._2)
        case "audio" => wins(r._2)
        case "image" => tiles(r._2)
      }
      assert(r._4 == expected, s"doc ${r._2} (${r._3}): cost ${r._4} != extractor $expected")
    }
  }

  test("m10: the batch deal replays literally — md5 shuffle order, batch " +
    "math, modality mix and the exact same-source collision count") {
    import graft.operators.Multimodal
    def md5l(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mts = Array("image", "audio", "video")
    val byBatch = docs
      .sortBy { case (id, _) => (md5l(s"$id:m10"), id) }
      .zipWithIndex
      .map { case ((id, src), i) =>
        (i / Multimodal.BatchSize, src, mts(((id % 3)).toInt)) }
      .groupBy(_._1)
    val expected = byBatch.view.mapValues { rows =>
      val srcCounts = rows.groupBy(_._2).view.mapValues(_.length.toLong)
      val coll = srcCounts.values.map(c => c * (c - 1) / 2).sum
      val n = rows.length.toLong
      (n, rows.count(_._3 == "image").toLong, rows.count(_._3 == "audio").toLong,
        rows.count(_._3 == "video").toLong, srcCounts.size.toLong,
        srcCounts.values.max, coll,
        coll * 1000000L / math.max(n * (n - 1) / 2, 1L))
    }.toMap
    val got = Multimodal.m10BatchNegatives(spark, sf).collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_image"),
          r.getAs[Long]("n_audio"), r.getAs[Long]("n_video"),
          r.getAs[Long]("n_sources"), r.getAs[Long]("max_source"),
          r.getAs[Long]("collision_pairs"), r.getAs[Long]("collision_rate_e6")))
      .toMap
    assert(got == expected, "batch audit diverged from literal replay")
    assert(got.nonEmpty, "the shipped corpus must exercise the shape")
    // every full batch is exactly BatchSize; at most one remainder batch
    assert(got.values.count(_._1 != Multimodal.BatchSize) <= 1, "batch widths")
    // the md5 deal must actually mix sources: collisions exist (same
    // source twice in some batch) AND no batch is single-source
    assert(got.values.exists(_._7 > 0L), "no same-source collision anywhere")
    assert(got.values.forall(v => v._5 > 1L), "a single-source batch dealt")
  }

  test("m11: aspect bucketing replays literally — packed argmin over the " +
    "ladder, integer fit inside the bucket, pad/batch arithmetic — and " +
    "the corpus spreads over several buckets with every image conserved") {
    val rows = Multimodal.m11AspectBuckets(spark, sf).collect()
    val lad = Multimodal.AspectLadder
    val batch = Multimodal.AspectBatchSize
    // independent replay from the raw documents table
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .filter(_.getLong(0) % 3 == 0)
      .map { r =>
        val h60 = java.lang.Long.parseLong(md5hex(r.getString(1)).take(15), 16)
        (64L + h60 % 1856L, 64L + (h60 / 2048L) % 1056L)
      }
    val picked = docs.map { case (w, h) =>
      val pack = lad.zipWithIndex.map { case ((bw, bh), i) =>
        (math.max(w * bh, h * bw) * 1000000000L /
          math.min(w * bh, h * bw)) * 16 + i
      }.min
      val bid = (pack % 16).toInt
      val (bw, bh) = lad(bid)
      val (sw, sh) =
        if (w * bh >= h * bw) (bw, h * bw / w) else (w * bh / h, bh)
      // the fit is a FIT: scaled dims never exceed the bucket, and the
      // pinned axis is exact
      assert(sw <= bw && sh <= bh, s"($w,$h) -> ($sw,$sh) spills $bid")
      assert(sw == bw || sh == bh, s"($w,$h) pinned axis lost in $bid")
      (bid, bw * bh - sw * sh)
    }
    val expect = picked.groupBy(_._1).map { case (bid, xs) =>
      bid.toLong -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val perBucket = rows.filter(_.getAs[String]("key") != "~TOTAL")
      .map(r => r.getAs[Long]("bucket_id") -> r).toMap
    assert(perBucket.keySet == expect.keySet, "bucket occupancy diverged")
    expect.foreach { case (bid, (n, pad)) =>
      val r = perBucket(bid)
      val (bw, bh) = lad(bid.toInt)
      assert(r.getAs[String]("key") == s"${bw}x$bh" &&
        r.getAs[Long]("bw") == bw && r.getAs[Long]("bh") == bh, s"dims $bid")
      assert(r.getAs[Long]("n_images") == n, s"count $bid")
      assert(r.getAs[Long]("pad_px") == pad, s"pad $bid")
      assert(r.getAs[Long]("pad_e6") == pad * 1000000L / (n * bw * bh),
        s"pad_e6 $bid")
      val nb = (n + batch - 1) / batch
      assert(r.getAs[Long]("n_batches") == nb &&
        r.getAs[Long]("tail_slots") == nb * batch - n, s"batches $bid")
    }
    // the ladder discriminates on this corpus (bucketing is non-vacuous)
    // and every image lands in exactly one bucket
    assert(expect.size >= 3, s"only ${expect.size} buckets occupied")
    val tot = rows.find(_.getAs[String]("key") == "~TOTAL").get
    assert(tot.getAs[Long]("n_images") == docs.length.toLong &&
      tot.getAs[Long]("pad_px") == picked.map(_._2).sum,
      "~TOTAL does not foot to the images")
    info(s"${docs.length} images over ${expect.size}/${lad.size} buckets; " +
      s"overall pad ${tot.getAs[Long]("pad_e6")} e6")
  }

  test("m12: the per-row fold replays a literal JVM md5 segmentation — " +
    "signatures, hamming cuts, scene runs — and both cut regimes exist") {
    val fb = Multimodal.SceneFrameBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    def sig(bytes: Array[Byte]): Long = {
      val hx = bytes.map("%02x".format(_)).mkString
      val dig = md.digest(hx.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(dig.substring(0, 15), 16)
    }
    val expect = Multimodal.mediaTable(spark, sf)
      .filter(col("media_type") === "video").select("doc_id", "content")
      .collect().map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val n = bytes.length / fb
        val sigs = (0 until n).map(i => sig(bytes.slice(i * fb, (i + 1) * fb)))
        val hams = sigs.sliding(2).map(p =>
          java.lang.Long.bitCount(p(0) ^ p(1)).toLong).toSeq
        val cuts = hams.map(h => if (h >= Multimodal.SceneCutBits) 1L else 0L)
        // scene runs: split frame stream at cuts, longest segment
        val runs = cuts.foldLeft(List(1L)) { (acc, c) =>
          if (c == 1L) 1L :: acc else (acc.head + 1L) :: acc.tail }
        (r.getAs[Long]("doc_id"),
          (n.toLong, cuts.sum, cuts.sum + 1L, runs.max, hams.sum))
      }.toMap
    val got = Multimodal.m12SceneSegmentation(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"),
          r.getAs[Long]("n_scenes"), r.getAs[Long]("max_scene_len"),
          r.getAs[Long]("sum_ham"))).toMap
    assert(got == expect, "segmentation diverged from the literal replay")
    assert(got.nonEmpty)
    val cutCounts = got.values.map(_._2).toSeq
    assert(cutCounts.exists(_ > 0) && cutCounts.exists(_ == 0),
      "corpus must exercise both the cut and the no-cut regime")
    // zero-shuffle pin: nothing before the output sort exchanges
    val p = Multimodal.m12SceneSegmentation(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"segmentation must not shuffle before the output sort:\n$p")
    info(s"${got.size} videos, cut distribution " +
      cutCounts.groupBy(identity).view.mapValues(_.size).toMap.toSeq
        .sortBy(_._1).mkString(" "))
  }

  test("m13: the pyramid plan replays literal integer halving per image — " +
    "levels, pixels, overhead — and the level distribution has spread") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 0).select("doc_id", "text").collect()
      .map { r =>
        val hx = md.digest(r.getString(1).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val h60 = java.lang.Long.parseLong(hx.substring(0, 15), 16)
        val (w, h) = (64L + h60 % 1856L, 64L + (h60 / 2048L) % 1056L)
        val px = (0 to 6).map(k => (w >> k, h >> k))
          .takeWhile { case (sw, sh) =>
            math.min(sw, sh) >= Multimodal.PyramidMinSide }
          .map { case (sw, sh) => sw * sh }
        val (base, tot) = (w * h, px.sum)
        r.getAs[Long]("doc_id").toString ->
          (w, h, px.size.toLong, base, tot, (tot - base) * 1000000L / base)
      }.toMap
    val all = Multimodal.m13StoragePyramid(spark, sf).collect()
    val (totRow, perRows) = all.partition(_.getAs[String]("key") == "~TOTAL")
    val got = perRows.map(r => r.getAs[String]("key") ->
      (r.getAs[Long]("w"), r.getAs[Long]("h"), r.getAs[Long]("n_levels"),
        r.getAs[Long]("base_px"), r.getAs[Long]("total_px"),
        r.getAs[Long]("overhead_e6"))).toMap
    assert(got == expect, "pyramid plan diverged from the literal replay")
    assert(totRow.length == 1)
    val t = totRow.head
    assert(t.getAs[Long]("base_px") == expect.values.map(_._4).sum &&
      t.getAs[Long]("total_px") == expect.values.map(_._5).sum &&
      t.getAs[Long]("n_levels") == expect.values.map(_._3).sum,
      "~TOTAL must conserve the per-image sums")
    val lvls = expect.values.map(_._3).toSet
    assert(lvls.size >= 2, s"level distribution must have spread, got $lvls")
    info(s"${got.size} images over levels " + expect.values.groupBy(_._3)
      .view.mapValues(_.size).toMap.toSeq.sortBy(_._1).mkString(" ") +
      s"; corpus overhead ${t.getAs[Long]("overhead_e6")}e6")
  }

  test("m14: the codec confusion matrix replays literally — md5-prefix " +
    "sniff vs declared type per source, conservation, and both the " +
    "match diagonal and mismatch cells occur") {
    def md5Hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val types = Array("image", "audio", "video")
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val hex = md5Hex(r.getAs[String]("text"))
        val declared = types((r.getAs[Long]("doc_id") % 3).toInt)
        val sniffed = types((Integer.parseInt(hex.substring(0, 2), 16) % 3))
        (r.getAs[String]("source"), declared, sniffed, hex.length * 4L / 2L)
      }
    val expect = docs.groupBy(t => (t._1, t._2, t._3)).map { case (k, g) =>
      val n = g.length.toLong
      k -> ((n, g.map(_._4).sum, if (k._2 != k._3) n else 0L))
    }
    val out = operators.Multimodal.m14CodecAudit(spark, sf).collect()
    val (tot, per) = out.partition(_.getAs[String]("source") == "~TOTAL")
    assert(tot.length == 1 && per.nonEmpty)
    val got = per.map(r =>
      (r.getAs[String]("source"), r.getAs[String]("declared"),
        r.getAs[String]("sniffed")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_bytes"),
          r.getAs[Long]("mismatch_docs")))).toMap
    assert(got == expect, "confusion matrix diverged from the replay")
    assert(tot.head.getAs[Long]("n_docs") == docs.length.toLong,
      "~TOTAL does not conserve doc count")
    assert(tot.head.getAs[Long]("mismatch_docs") ==
      per.map(_.getAs[Long]("mismatch_docs")).sum)
    // both regimes must occur, and every type must appear on the diagonal
    assert(got.keys.exists(k => k._2 == k._3), "no matching payloads")
    assert(got.keys.exists(k => k._2 != k._3), "no mislabeled payloads")
    types.foreach(t => assert(got.keys.exists(k => k._2 == t && k._3 == t),
      s"type $t never matches — the sniffer convention is broken"))
    info(s"${per.length} cells; mismatch " +
      s"${tot.head.getAs[Long]("mismatch_docs")}/${docs.length}")
  }

  test("m15: the shard manifest replays literally — deterministic tape, " +
    "start-offset shard rule, modality mix, footing — and the cut is " +
    "partition-count invariant") {
    def md5Hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val types = Array("image", "audio", "video")
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "n_chars").collect()
      .map { r =>
        val id = r.getAs[Long]("doc_id")
        (md5Hex(id.toString), id,
          r.getAs[Long]("n_chars") + md5Hex(r.getAs[String]("text")).length * 4L / 2L,
          types((id % 3).toInt))
      }.sortBy(t => (t._1, t._2))
    val sb = operators.Multimodal.ShardBytes
    var off = 0L
    val taped = docs.map { case (k, id, n, mt) =>
      val o = off; off += n; (o / sb, id, n, mt, k)
    }
    val expect = taped.groupBy(_._1).map { case (s, g) =>
      val bytes = g.map(_._3).sum
      s.toString -> ((g.length.toLong, bytes, bytes - sb,
        g.count(_._4 == "image").toLong, g.count(_._4 == "audio").toLong,
        g.count(_._4 == "video").toLong,
        g.minBy(t => (t._5, t._2))._2))
    }
    val out = operators.Multimodal.m15ShardManifest(spark, sf).collect()
    val (tot, per) = out.partition(_.getAs[String]("shard") == "~TOTAL")
    val got = per.map(r => r.getAs[String]("shard") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("overflow_bytes"), r.getAs[Long]("n_image"),
        r.getAs[Long]("n_audio"), r.getAs[Long]("n_video"),
        r.getAs[Long]("first_doc")))).toMap
    assert(got == expect, "shard manifest diverged from the tape replay")
    assert(tot.length == 1 &&
      tot.head.getAs[Long]("n_docs") == docs.length.toLong &&
      tot.head.getAs[Long]("n_bytes") == docs.map(_._3).sum)
    // regimes: a real multi-shard cut, some shard overflowing its
    // nominal budget (the trailing-document rule), modality mix present
    assert(got.size >= 3, s"only ${got.size} shards — raise the corpus")
    assert(got.values.exists(_._3 > 0L), "no shard overflows nominal")
    assert(got.values.exists(v => v._4 > 0 && v._5 > 0 && v._6 > 0),
      "no mixed-modality shard")
    // partition invariance: 3 vs 7 ranges cut byte-identical shards
    val r3 = operators.Multimodal.m15ShardManifestRanged(spark, sf, 3)
      .collect().map(_.toString).sorted.toSeq
    val r7 = operators.Multimodal.m15ShardManifestRanged(spark, sf, 7)
      .collect().map(_.toString).sorted.toSeq
    assert(r3 == r7, "shard cut depends on the partition count")
    info(s"${got.size} shards over ${docs.length} docs; max overflow " +
      got.values.map(_._3).max)
  }
}
