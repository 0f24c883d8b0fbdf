package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Planted documents table (written as a real parquet dir so the
    * table-bound operators run end-to-end on it). */
  lazy val plantedDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_planted").toString
    Seq(
      (0L, "mail me at jane.doe@example.com or call 555-123-4567 ok", "src0"),
      (1L, "account 1234567890 and 9876543210 leaked", "src1"),
      (2L, "x y x y x y x y", "src2"),
      (3L, "a a a", "src3"),
      (4L, "", "src0"),
      (5L, "clean text with no pii at all", "src11"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t7: planted PII is counted and redacted; clean text is untouched") {
    val r = TextAnalysis.t7PiiRedact(spark, plantedDir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_emails") == 1)
    assert(r(0L).getAs[Long]("n_phones") == 1)
    assert(r(1L).getAs[Long]("n_long_ids") == 2)
    // redaction changes the hash iff something matched
    import org.apache.spark.sql.functions._
    val orig = Tables.load(spark, plantedDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("m")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(0L).getAs[String]("redacted_md5") != orig(0L))
    assert(r(1L).getAs[String]("redacted_md5") != orig(1L))
    assert(r(5L).getAs[String]("redacted_md5") == orig(5L), "clean text must be untouched")
  }

  test("t8: repetition ratios match hand-computed values") {
    val r = TextAnalysis.t8Repetition(spark, plantedDir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // "x y x y x y x y": 8 toks, 6 3-grams, 2 distinct -> dup (1-2/6)
    assert(r(2L).getAs[Long]("n_toks") == 8)
    assert(r(2L).getAs[Long]("n_3grams") == 6)
    assert(r(2L).getAs[Long]("n_distinct_3grams") == 2)
    assert(r(2L).getAs[Long]("dup_3gram_ratio_e6") == 666666L)
    assert(r(2L).getAs[Long]("top_tok_n") == 4)
    assert(r(2L).getAs[Long]("top_tok_ratio_e6") == 500000L)
    // "a a a": all one token
    assert(r(3L).getAs[Long]("top_tok_ratio_e6") == 1000000L)
    assert(r(3L).getAs[Long]("dup_3gram_ratio_e6") == 0L) // 1 of 1 3-gram distinct
    // empty text: all zeros, no nulls
    assert(r(4L).getAs[Long]("n_toks") == 0)
    assert(r(4L).getAs[Long]("top_tok_n") == 0)
    assert(r(4L).getAs[Long]("dup_3gram_ratio_e6") == 0L)
  }

  test("t9: per-source rates follow the policy and kept counts are " +
    "deterministic and bounded") {
    val a = TextAnalysis.t9SourceMix(spark, sf).collect()
    val b = TextAnalysis.t9SourceMix(spark, sf).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    a.foreach { row =>
      val src = row.getAs[String]("source")
      val expectRate = 30 + (src.filter(_.isDigit).toLong % 10) * 5
      assert(row.getAs[Long]("rate_pct") == expectRate, s"$src rate")
      assert(row.getAs[Long]("n_kept") >= 0 &&
        row.getAs[Long]("n_kept") <= row.getAs[Long]("n_docs"))
    }
    assert(a.map(_.getAs[String]("source")).distinct.length == a.length)
  }

  test("t1: token and char-class counts are consistent") {
    val r = TextAnalysis.t1TextStats(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val nChars = row.getAs[Long]("n_chars")
      assert(row.getAs[Long]("n_alpha") + row.getAs[Long]("n_digit") +
        row.getAs[Long]("n_space") <= nChars)
      assert(row.getAs[Long]("n_bpe_tokens") >= row.getAs[Long]("n_ws_tokens"))
      assert(row.getAs[Double]("avg_token_len") > 0)
    }
  }

  test("t2: ratios bounded, score in [0, 1e6]") {
    val r = TextAnalysis.t2TextQuality(spark, sf).collect()
    r.foreach { row =>
      Seq("stop_ratio_e6", "uniq_ratio_e6", "punct_ratio_e6", "digit_ratio_e6",
        "len_norm_e6", "quality_score_e6").foreach { c =>
        val v = row.getAs[Long](c)
        assert(v >= 0 && v <= 1000000, s"$c=$v out of range")
      }
    }
  }

  test("t3: every doc classified, scores justify the prediction") {
    val r = TextAnalysis.t3LangId(spark, sf).collect()
    r.foreach { row =>
      val pred = row.getAs[String]("predicted_lang")
      assert(Set("de", "en", "es", "fr", "zh", "und").contains(pred))
      val best = Seq("de", "en", "es", "fr").map(l => row.getAs[Long](s"score_$l")).max
      if (pred != "zh" && pred != "und")
        assert(row.getAs[Long](s"score_$pred") == best)
    }
  }

  test("t4: fingerprints deterministic; equal texts share fp") {
    val a = TextAnalysis.t4Fingerprint(spark, sf).collect()
    val b = TextAnalysis.t4Fingerprint(spark, sf).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    a.foreach { row =>
      assert(row.getAs[Long]("fp60") >= 0 && row.getAs[Long]("shingle_fp60") >= 0)
    }
  }

  /** Two-doc corpus with hand-computable collocation stats. */
  lazy val collocDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_colloc").toString
    Seq(
      (0L, "new york new york new york", "s"),
      (1L, "the cat sat the cat sat the cat sat", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t15: stratified sample hits the exact quota per stratum and " +
    "matches a brute-force recount of the md5 ranking") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.t15StratifiedSample(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("sample_rank"),
        r.getAs[Long]("doc_id")))
    // brute force: same salted rank via Spark SQL, in-memory top-k
    val ranked = Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        expr("CAST(conv(substring(md5(concat('t15|', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = ranked.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(TextAnalysis.StratQuota)
        .zipWithIndex.map { case (r, i) => (src, i + 1L, r._2) }
    }.toSet
    assert(got.toSet == expect, "sample must equal the rank-order pick exactly")
    // exact quota: every stratum yields min(quota, stratum size)
    val sizes = ranked.groupBy(_._1).view.mapValues(_.length).toMap
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length == math.min(TextAnalysis.StratQuota, sizes(src)))
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length.toLong),
        "ranks are dense from 1")
    }
    assert(got.nonEmpty)
  }

  test("t16: LM conditionals match hand arithmetic; bigram-less docs get " +
    "null scores") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    // model: c(a b)=3, c(b a)=1, c(b c)=1; prefixes: a->3, b->2
    // doc1 transitions: P(b|a)=1e6, P(a|b)=5e5, P(b|a)=1e6
    val got = TextAnalysis.t16LmScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"),
          Option(r.getAs[java.lang.Long]("lm_score_e6")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("min_cond_e6")).map(_.toLong)))).toMap
    assert(got(1L) == ((3L, Some(2500000L / 3), Some(500000L))))
    assert(got(2L) == ((2L, Some(750000L), Some(500000L))))
    assert(got(3L) == ((0L, None, None)), "no transitions -> null score")
    // corpus sanity: scores bounded by construction, every doc present
    val corpus = TextAnalysis.t16LmScore(spark, sf).collect()
    assert(corpus.length == Tables.load(spark, sf, "documents").count())
    corpus.filter(_.getAs[Long]("n_bigrams") > 0).foreach { r =>
      val s = r.getAs[Long]("lm_score_e6")
      assert(s >= 0 && s <= 1000000L, s"score out of range: $s")
      assert(r.getAs[Long]("min_cond_e6") <= s)
    }
  }

  test("t10: lift matches the hand computation; threshold and order hold") {
    val r = TextAnalysis.t10Collocations(spark, collocDir).collect()
    // unigrams: new 3, york 3, the 3, cat 3, sat 3 -> n1 = 15
    // bigrams (all): doc0 5 (new-york x3, york-new x2),
    //                doc1 8 (the-cat x3, cat-sat x3, sat-the x2) -> n2 = 13
    // pairs with c12 >= 3: new-york, the-cat, cat-sat
    assert(r.length == 3)
    val byPair = r.map(x => (x.getAs[String]("w1"), x.getAs[String]("w2")) -> x).toMap
    val ny = byPair(("new", "york"))
    assert(ny.getAs[Long]("pair_count") == 3)
    assert(ny.getAs[Long]("w1_count") == 3 && ny.getAs[Long]("w2_count") == 3)
    // lift = (3/13) / ((3/15) * (3/15)) = 5.76923... -> floor e6
    assert(ny.getAs[Long]("lift_e6") == 5769230L)
    // all three pairs have identical counts -> identical lift; order then
    // falls back to (w1, w2): cat-sat < new-york < the-cat
    assert(r.map(x => (x.getAs[String]("w1"), x.getAs[String]("w2"))).toSeq ==
      Seq(("cat", "sat"), ("new", "york"), ("the", "cat")))
  }

  /** One document per t11 rule (in attribution order) plus one clean doc.
    * Each planted doc passes every rule BEFORE the one it must fail. */
  lazy val funnelDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val kept = "the wandering abcdef ghijkl mnopqr stuvwx yzabcd efghij " +
      "klmnop qrstuv wxyzab cdefgh ijklmn opqrst uvwxyz bcdefg hijklm " +
      "nopqrs tuvwxy zabcde is fine" // 22 tokens, long words, 2 stopwords
    Seq(
      (0L, "only five tokens right here", "s"), // min_tokens (5 < 20)
      (1L, Seq.fill(80)("wandering").mkString(" "), "s"), // max_chars (799 > 450)
      (2L, Seq.fill(20)("123456").mkString(" "), "s"), // high_digit (digit ratio 0.86)
      (3L, Seq.fill(20)("ab?!").mkString(" "), "s"), // low_alpha (alpha ratio 0.40)
      (4L, Seq.fill(20)("wombat").mkString(" "), "s"), // few_stopwords (0 < 2)
      (5L, Seq.fill(8)("the wombat jumped").mkString(" "), "s"), // repetitive
      (6L, kept, "s")) // survives every rule
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t13: weights match the hand computation; rank cut and ties are " +
    "deterministic; every doc with tokens reports exactly min(3, vocab)") {
    val r = TextAnalysis.t13TfidfKeywords(spark, plantedDir).collect()
    // planted corpus: 6 docs. doc 3 = "a a a": tf(a)=3, df(a)=1 (no other
    // doc contains "a" as a token) -> weight = 3 * 6 / 1 = 18e6, rank 1,
    // and it is the doc's ONLY keyword (vocab of 1)
    val d3 = r.filter(_.getAs[Long]("doc_id") == 3L)
    assert(d3.length == 1)
    assert(d3.head.getAs[String]("term") == "a")
    assert(d3.head.getAs[Long]("tf") == 3L)
    assert(d3.head.getAs[Long]("df") == 1L)
    assert(d3.head.getAs[Long]("weight_e6") == 18000000L)
    // doc 2 = "x y x y x y x y": tf=4 each, df=1 each -> equal weights;
    // the tie breaks on the term string: x before y
    val d2 = r.filter(_.getAs[Long]("doc_id") == 2L)
      .sortBy(_.getAs[Long]("kw_rank"))
    assert(d2.map(_.getAs[String]("term")).toSeq == Seq("x", "y"))
    assert(d2.map(_.getAs[Long]("weight_e6")).distinct.length == 1)
    // empty doc 4 yields no keyword rows; everyone else caps at 3
    assert(!r.exists(_.getAs[Long]("doc_id") == 4L))
    r.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getAs[Long]("kw_rank")).sorted.toSeq ==
        (1L to rows.length.toLong))
    }
  }

  test("t14: MG candidates contain every true heavy hitter under any " +
    "partitioning, and the output equals a brute-force recount") {
    import spark.implicits._
    import graft.operators.HeavyHitters
    // planted stream: 'hot' 40%, 'warm' 30%, 120 singleton tokens (k=5
    // leaves 4 counters — the decrement path runs constantly)
    val toks = Seq.fill(200)("hot") ++ Seq.fill(150)("warm") ++
      (0 until 120).map(i => s"cold$i")
    val dir = java.nio.file.Files.createTempDirectory("graft_mg").toString
    // shuffle deterministically so heavy tokens interleave with the tail
    val text = new scala.util.Random(7).shuffle(toks).mkString(" ")
    Seq((0L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val n = toks.size
    (1 to 4).foreach { _ =>
      val cands = HeavyHitters.mgCandidates(spark, dir, k = 5)
      assert(cands.contains("hot") && cands.contains("warm"),
        s"freq > n/5 tokens missing from MG summary: $cands")
      assert(cands.size <= 4, "summary must keep at most k-1 counters")
    }
    // the mergeable-summaries combine, exercised directly (a local[n]
    // run with one small file may never merge two non-empty partials):
    // pointwise sum = {a:5, b:4, c:3, d:2, e:1}; k=4 -> subtract the
    // 4th-largest (2), keep >0
    val agg = new HeavyHitters.MisraGriesAgg(4)
    val merged = agg.merge(
      Map("a" -> 3L, "b" -> 4L, "c" -> 1L),
      Map("a" -> 2L, "c" -> 2L, "d" -> 2L, "e" -> 1L))
    assert(merged == Map("a" -> 3L, "b" -> 2L, "c" -> 1L), s"got $merged")
    // reduce's decrement path: full summary + unseen token shrinks all
    assert(agg.reduce(Map("a" -> 2L, "b" -> 1L, "c" -> 1L), "z") == Map("a" -> 1L))

    // the full operator on the real corpus == brute recount above n/k
    val out = graft.operators.HeavyHitters.t14HeavyHitters(spark, sf).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("n_occurrences")).toMap
    val brute = Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.wsTokens(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = brute.map(_._2).sum
    val expect = brute.filter(_._2 * HeavyHitters.MgK > total).toMap
    assert(out == expect, s"got ${out.size} heavy hitters, expected ${expect.size}")
  }

  test("t12: the tape is contiguous, bin arithmetic closes, and the " +
    "distributed prefix sum is invariant to the range count") {
    val r3 = TextAnalysis.t12SequencePackRanged(spark, sf, 3).collect()
    val r7 = TextAnalysis.t12SequencePackRanged(spark, sf, 7).collect()
    assert(r3.map(_.toString).toSeq == r7.map(_.toString).toSeq,
      "pack must not depend on how the range partitioner splits the tape")
    val sorted = r3.sortBy(_.getAs[Long]("tok_offset"))
    // contiguity: each doc starts exactly where the previous one ended
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(b.getAs[Long]("tok_offset") ==
        a.getAs[Long]("tok_offset") + a.getAs[Long]("n_toks"))
      case _ => ()
    }
    assert(sorted.head.getAs[Long]("tok_offset") == 0L)
    sorted.foreach { row =>
      val (off, n) = (row.getAs[Long]("tok_offset"), row.getAs[Long]("n_toks"))
      assert(row.getAs[Long]("start_bin") == off / TextAnalysis.BinTokens)
      assert(row.getAs[Long]("end_bin") == (off + n - 1) / TextAnalysis.BinTokens)
      assert(row.getAs[Long]("bin_offset") == off % TextAnalysis.BinTokens)
      assert(row.getAs[Long]("end_bin") >= row.getAs[Long]("start_bin"))
    }
    // the tape covers every non-empty doc exactly once
    val total = sorted.last.getAs[Long]("tok_offset") + sorted.last.getAs[Long]("n_toks")
    assert(total == sorted.map(_.getAs[Long]("n_toks")).sum)
  }

  test("t17: window layout, tail handling and fingerprints match a " +
    "hand-computed chunking; every corpus token lands in some chunk") {
    import org.apache.spark.sql.functions.col
    val W = TextAnalysis.ChunkTokens
    val S = TextAnalysis.ChunkStride
    assert(W == 32 && S == 24, "spec arithmetic assumes the shipped geometry")
    val dir = java.nio.file.Files.createTempDirectory("graft_chunks").toString
    import spark.implicits._
    def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    // 5 → 1 chunk; 32 → 1 (exactly one window); 33 → 2 (one-token tail
    // forces a second window); 80 → 3 (last window lands exactly on the
    // end); 81 → 4; 0 tokens → no chunks at all
    Seq((1L, doc(5)), (2L, doc(32)), (3L, doc(33)), (4L, doc(80)),
      (5L, doc(81)), (6L, "   "))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.t17ContextChunks(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("fp"), r.getAs[Long]("is_last")))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L, 5L), "zero-token doc chunked")
    assert(byDoc.map { case (d, cs) => d -> cs.length } ==
      Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    // spans: starts stride apart from 0; sizes min(n, start+W) - start;
    // is_last exactly on the final window
    for ((d, n) <- Seq(1L -> 5, 2L -> 32, 3L -> 33, 4L -> 80, 5L -> 81);
         (c, i) <- byDoc(d).zipWithIndex) {
      assert(c._3 == i.toLong * S, s"doc $d chunk $i start")
      assert(c._4 == math.min(n.toLong, c._3 + W) - c._3, s"doc $d chunk $i size")
      assert((c._6 == 1L) == (i == byDoc(d).length - 1), s"doc $d chunk $i is_last")
    }
    // fingerprint is md5 of the space-joined window slice
    def md5Hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val c81 = byDoc(5L)(3)
    assert(c81._5 == md5Hex((73 to 81).map(i => s"w$i").mkString(" ")),
      "tail window must carry exactly the last 9 tokens")
    // coverage on the real corpus: per doc, windows start at 0, advance by
    // exactly the stride, and the last one ends at the doc's token count
    // (== every token index is inside at least one window)
    val corpus = TextAnalysis.t17ContextChunks(spark, sf)
      .select(col("doc_id"), col("chunk_id"), col("tok_start"),
        col("n_tokens"), col("is_last")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(corpus.exists(_._2.length > 1), "corpus never exercises multi-chunk docs")
    val nToks = TextAnalysis.t1TextStats(spark, sf)
      .select(col("doc_id"), col("n_ws_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpus.foreach { case (d, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0L)
      sorted.zipWithIndex.foreach { case (c, i) => assert(c._3 == i.toLong * S) }
      assert(sorted.last._3 + sorted.last._4 == nToks(d),
        s"doc $d: chunks end at ${sorted.last._3 + sorted.last._4}, tokens ${nToks(d)}")
    }
  }

  test("t18: weights replay an independent recompute; a planted target-" +
    "vocabulary doc outscores an off-domain one; gramless docs are null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_t18").toString
    // src0/src5 are target (id % 5 == 0), src1/src2 raw-only. The target
    // docs share a distinctive vocabulary; doc 3 (raw) REUSES it, doc 4
    // uses its own — DSIR's whole point is that 3 must outscore 4.
    Seq(
      (0L, "solar flux telemetry calibration drift report", "src0"),
      (1L, "solar flux telemetry calibration drift report", "src5"),
      (2L, "solar flux telemetry calibration nominal pass", "src10"),
      (3L, "solar flux telemetry calibration drift alarm", "src1"),
      (4L, "cheap deals buy now limited offer click here", "src2"),
      (5L, "one", "src3"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.t18ImportanceWeights(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.size == 6, "one row per document, total")
    // independent recompute in plain Scala: same bigrams, hash, smoothing
    def md5_60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = Seq(
      0L -> ("solar flux telemetry calibration drift report", true),
      1L -> ("solar flux telemetry calibration drift report", true),
      2L -> ("solar flux telemetry calibration nominal pass", true),
      3L -> ("solar flux telemetry calibration drift alarm", false),
      4L -> ("cheap deals buy now limited offer click here", false),
      5L -> ("one", false))
    val B = TextAnalysis.ImpBuckets
    val grams = docs.flatMap { case (id, (txt, tgt)) =>
      txt.split("\\s+").toSeq.sliding(2).filter(_.size == 2)
        .map(w => (id, tgt, md5_60(w.mkString(" ")) % B)).toSeq
    }
    val tr = grams.size.toLong
    val tt = grams.count(_._2).toLong
    val byB = grams.groupBy(_._3)
    val ratio = byB.map { case (b, g) =>
      b -> ((g.count(_._2) + 1L) * (tr + B) * 1000000L) / ((g.size + 1L) * (tt + B))
    }
    docs.foreach { case (id, (txt, tgt)) =>
      val gs = grams.filter(_._1 == id)
      val row = r(id)
      assert(row.getAs[Long]("is_target") == (if (tgt) 1L else 0L))
      assert(row.getAs[Long]("n_grams") == gs.size.toLong, s"doc $id n_grams")
      if (gs.isEmpty) assert(row.isNullAt(row.fieldIndex("weight_e6")),
        s"doc $id must carry null weight")
      else assert(row.getAs[Long]("weight_e6") ==
        gs.map(g => ratio(g._3)).sum / gs.size, s"doc $id weight")
    }
    // the discriminative property: in-domain raw doc ≫ off-domain raw doc
    assert(r(3L).getAs[Long]("weight_e6") > r(4L).getAs[Long]("weight_e6"),
      "target-vocabulary raw doc must outscore the off-domain doc")
  }

  test("t19: per-source terciles are balanced within one, the keep cut is " +
    "head+middle, heads outscore tails, and unscored docs are dropped") {
    import org.apache.spark.sql.functions.col
    val rows = TextAnalysis.t19PerplexityPrune(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        Option(r.get(r.fieldIndex("lm_score_e6"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("bucket"))).map(_.asInstanceOf[Long]),
        r.getAs[Long]("is_kept")))
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.length == total, "one verdict row per document, total")
    val scored = rows.filter(_._4.isDefined)
    assert(scored.nonEmpty, "corpus must exercise the scored path")
    // unscored docs: null bucket, never kept
    rows.filter(_._4.isEmpty).foreach { r =>
      assert(r._5 == 0L, s"doc ${r._1}: unscored but kept")
    }
    scored.groupBy(_._2).foreach { case (src, docs) =>
      val byBucket = docs.groupBy(_._4.get).view.mapValues(_.length).toMap
      val sizes = (0L to 2L).map(b => byBucket.getOrElse(b, 0))
      // near-equal terciles: the exact-integer formula bounds the spread
      if (docs.length >= 3)
        assert(sizes.max - sizes.min <= 1, s"$src terciles $sizes")
      // keep cut = head+middle exactly
      docs.foreach(d => assert((d._5 == 1L) == (d._4.get <= 1L), s"$src ${d._1}"))
      // every head score >= every tail score (rank monotonicity)
      for (h <- docs.filter(_._4.get == 0L); t <- docs.filter(_._4.get == 2L))
        assert(h._3.get >= t._3.get, s"$src: head ${h._1} under tail ${t._1}")
    }
  }

  test("t11: each rule catches its planted doc; funnel arithmetic closes") {
    val r = TextAnalysis.t11FilterFunnel(spark, funnelDir).collect()
      .sortBy(_.getAs[Long]("rule_idx"))
    assert(r.length == 6)
    assert(r.map(_.getAs[String]("rule")).toSeq == Seq("min_tokens",
      "max_chars", "high_digit", "low_alpha", "few_stopwords", "repetitive"))
    // one planted failure per rule, evaluated in order
    r.foreach(row => assert(row.getAs[Long]("n_dropped") == 1L,
      row.getAs[String]("rule")))
    // funnel closes: first n_in is the corpus, links chain, last n_out = kept
    assert(r.head.getAs[Long]("n_in") == 7L)
    r.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("n_out") == b.getAs[Long]("n_in"))
      case _ => ()
    }
    assert(r.last.getAs[Long]("n_out") == 1L)
    r.foreach(row => assert(row.getAs[Long]("n_in") - row.getAs[Long]("n_dropped")
      == row.getAs[Long]("n_out")))
  }

  test("t20: the duplication profile replays exactly in Scala, and cross-" +
    "doc sharing is distinguished from intra-doc repetition") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(s: String) = {
      val t = s.replaceAll("^\\s+|\\s+$", "")
      if (t.isEmpty) Array.empty[String] else t.split("\\s+")
    }
    val k = Dedup.GramToks
    val grams = docs.flatMap { case (id, text) =>
      val tk = toks(text)
      if (tk.length < k) Seq.empty
      else (0 to tk.length - k).map(i => (id, tk.slice(i, i + k).mkString(" ")))
    }
    val gdf = grams.distinct.groupBy(_._2).map { case (g, occ) => g -> occ.length }
    val byDoc = grams.groupBy(_._1)
    val got = TextAnalysis.t20DupProfile(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val gs = byDoc.getOrElse(r.getLong(0), Array.empty[(Long, String)]).map(_._2)
      assert(r.getAs[Long]("n_grams") == gs.length, s"doc ${r.getLong(0)} grams")
      val dup = gs.count(g => gdf(g) >= 2).toLong
      assert(r.getAs[Long]("n_dup_grams") == dup, s"doc ${r.getLong(0)} dups")
      if (gs.nonEmpty) {
        assert(r.getAs[Long]("dup_share_e6") ==
          math.floor(dup * 1000000.0 / gs.length).toLong)
        assert(r.getAs[Long]("max_gram_df") == gs.map(gdf).max.toLong)
      } else assert(r.isNullAt(3) && r.isNullAt(4))
    }
    info(s"corpus docs with cross-doc gram sharing: " +
      s"${got.count(_.getAs[Long]("n_dup_grams") > 0)} of ${got.length}")
    // axis separation on a planted corpus: a doc repeating ITS OWN gram
    // is t8's business (df stays 1 here); two docs sharing a gram both
    // count as duplicated
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_t20").toString
    Seq(
      (1L, "a b c d e f g h a b c d e f g h"),
      (2L, "p q r s t u v w distinct tail one"),
      (3L, "p q r s t u v w another ending here"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.t20DupProfile(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_dup_grams")).toMap
    assert(planted(1L) == 0L, "intra-doc repetition must not count as duplication")
    assert(planted(2L) >= 1L && planted(3L) >= 1L, "shared gram must count in both docs")
  }

  test("t21: preference pairs are rank-aligned best-vs-worst per source " +
    "with strictly positive margins — replayed from t19's own ranks") {
    val ranks = TextAnalysis.t19PerplexityPrune(spark, sf).collect()
      .filter(!_.isNullAt(3)) // rank_in_source
      .map(r => (r.getAs[String]("source"), r.getLong(0),
        r.getAs[Long]("lm_score_e6"), r.getAs[Long]("rank_in_source"),
        r.getAs[Long]("n_scored")))
    val expected = ranks.groupBy(_._1).toSeq.flatMap { case (src, rs) =>
      val chosen = rs.filter(t => t._4 > t._5 - TextAnalysis.PrefK)
        .map(t => (t._5 - t._4 + 1) -> (t._2, t._3)).toMap
      val rejected = rs.filter(_._4 <= TextAnalysis.PrefK)
        .map(t => t._4 -> (t._2, t._3)).toMap
      for {
        i <- chosen.keySet.intersect(rejected.keySet).toSeq
        (cid, cs) = chosen(i); (rid, rjs) = rejected(i)
        if cid != rid && cs - rjs >= TextAnalysis.MinMarginE6
      } yield (src, i, cid, rid, cs, rjs, cs - rjs)
    }.sortBy(t => (t._1, t._2))
    val got = TextAnalysis.t21PreferencePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("pair_idx"), r.getLong(2),
        r.getLong(3), r.getAs[Long]("chosen_score_e6"),
        r.getAs[Long]("rejected_score_e6"), r.getAs[Long]("margin_e6")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == expected, "pair construction diverged from t19's ranks")
    got.foreach { p =>
      assert(p._7 >= 1L && p._5 > p._6, s"non-positive margin in $p")
      assert(p._2 >= 1L && p._2 <= TextAnalysis.PrefK)
    }
    val perSource = got.groupBy(_._1).view.mapValues(_.size)
    assert(perSource.values.forall(_ <= TextAnalysis.PrefK))
    info(s"${got.length} pairs over ${perSource.size} sources")
    assert(got.length >= 20, "the shipped corpus must yield a real pair set")
  }

  test("t22: the vocab-sized pair counting matches a literal Scala replay " +
    "of one BPE iteration over the raw token stream, merge order included") {
    val texts = Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val wordRe = "^[a-z0-9]+$".r
    val vocab = texts.iterator
      .flatMap(_.trim.split("\\s+").iterator.filter(_.nonEmpty))
      .map(_.toLowerCase)
      .filter(w => wordRe.findFirstIn(w).isDefined)
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCounts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((w, f) <- vocab; if w.length >= 2; i <- 0 until w.length - 1) {
      val p = w.substring(i, i + 2)
      val (wt, ty) = pairCounts.getOrElse(p, (0L, 0L))
      pairCounts(p) = (wt + f, ty) // types counted below, per distinct word
    }
    val typeCounts = vocab.keysIterator.filter(_.length >= 2)
      .flatMap(w => (0 until w.length - 1).map(i => w.substring(i, i + 2)).distinct)
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairCounts.toSeq
      .map { case (p, (wt, _)) => (p, wt, typeCounts(p)) }
      .sortBy { case (p, wt, _) => (-wt, p) }
      .take(TextAnalysis.BpeTopMerges)
    val got = TextAnalysis.t22BpeMerges(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_weighted"), r.getAs[Long]("n_types")))
      .toSeq
    assert(got == expected, "merge table diverged from the literal replay")
    assert(got.length == TextAnalysis.BpeTopMerges, "full merge table")
    info(s"top merge: ${got.head}")
  }

  test("t27: K-round BPE training replays a literal Scala trainer — " +
    "greedy leftmost merge application, identical pair choice, weighted " +
    "and type counts per round") {
    val texts = Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val wordRe = "^[a-z0-9]+$".r
    var words: Seq[(String, Long, Vector[String])] = texts.iterator
      .flatMap(_.trim.split("\\s+").iterator.filter(_.nonEmpty))
      .map(_.toLowerCase)
      .filter(w => wordRe.findFirstIn(w).isDefined)
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .collect { case (w, f) if w.length >= 2 =>
        (w, f, w.map(_.toString).toVector) }
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Long)]
    for (r <- 1 to TextAnalysis.BpeTrainRounds) {
      val weighted = scala.collection.mutable.Map.empty[(String, String), Long]
      val types = scala.collection.mutable.Map.empty[(String, String), Set[String]]
      for ((w, f, syms) <- words; if syms.length >= 2;
           i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        weighted(p) = weighted.getOrElse(p, 0L) + f
        types(p) = types.getOrElse(p, Set.empty) + w
      }
      val ((bl, br), wt) = weighted.toSeq
        .sortBy { case ((l, rr), v) => (-v, l, rr) }.head
      expected += ((r.toLong, bl, br, bl + br, wt, types((bl, br)).size.toLong))
      // greedy leftmost, non-overlapping: a just-merged symbol is never
      // re-read as its left half (the fold's last element is the merged
      // token, which can only match as a COMPLETE lhs of a later pair)
      words = words.map { case (w, f, syms) =>
        var acc = Vector.empty[String]
        for (s <- syms) {
          if (acc.nonEmpty && acc.last == bl && s == br)
            acc = acc.init :+ (bl + br)
          else acc = acc :+ s
        }
        (w, f, acc)
      }
    }
    val got = TextAnalysis.t27BpeTrain(spark, sf).collect()
      .map(r => (r.getAs[Long]("merge_round"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("n_weighted"), r.getAs[Long]("n_types"))).toSeq
    assert(got == expected.toSeq,
      "the merge table diverged from the literal K-round trainer")
    // a trainer is only exercised if some later round merges a
    // MULTI-character symbol earlier rounds created
    assert(got.exists { case (_, l, rr, _, _, _) =>
      l.length > 1 || rr.length > 1 },
      "no round consumed a merged symbol — K rounds degenerate to t22")
    info(got.map { case (r, _, _, m, w, _) => s"r$r:$m($w)" }.mkString(" "))
  }

  test("t29: encoding replays the trained merges literally — greedy " +
    "leftmost application per word in round order, per-doc counts and " +
    "the e6 compression ratio, 1-char words as single tokens") {
    // the trained merge table (its own correctness is the t27 test's job)
    val merges = TextAnalysis.t27BpeTrain(spark, sf).collect()
      .sortBy(_.getAs[Long]("merge_round"))
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    def encode(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (bl, br)) =>
        var acc = Vector.empty[String]
        for (s <- syms) {
          if (acc.nonEmpty && acc.last == bl && s == br)
            acc = acc.init :+ (bl + br)
          else acc = acc :+ s
        }
        acc
      }
    val wordRe = "^[a-z0-9]+$".r
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val ws = text.trim.split("\\s+").iterator.filter(_.nonEmpty)
        .map(_.toLowerCase).filter(w => wordRe.findFirstIn(w).isDefined).toSeq
      if (ws.isEmpty) None
      else {
        val nChars = ws.map(_.length.toLong).sum
        val nToks = ws.map(w => encode(w).length.toLong).sum
        Some((id, ws.size.toLong, nChars, nToks,
          nChars * 1000000L / nToks))
      }
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.t29BpeEncode(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("chars_per_token_e6"))).toSeq
    assert(got == expected, "per-doc encode card diverged from the " +
      "literal greedy application of the trained merges")
    // the encoder is only exercised if some word actually compressed
    assert(expected.exists { case (_, _, c, t, _) => t < c },
      "no word merged — the trained table never fired on the corpus")
    // planted sanity: a word made of the first trained merge pair
    // compresses by exactly that merge under the literal encoder
    merges.headOption.foreach { case (bl, br) =>
      assert(encode(bl + br).length < (bl + br).length ||
        (bl + br).length == 1, "the first merge does not fire on its own pair")
    }
    info(s"${got.size} docs, corpus chars/token e6 = " +
      s"${expected.map(_._3).sum * 1000000L / expected.map(_._4).sum}")
  }

  test("t30: temperature scaling replays the literal sqrt-weight recipe " +
    "— integer square-root weights, exact e6 shares, and the defining " +
    "property: small sources up-sample, large sources down-sample") {
    val bySource = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), "\\S+".r.findAllIn(r.getString(1)).size.toLong))
      .groupBy(_._1).view
      .mapValues(ts => (ts.size.toLong, ts.map(_._2).sum)).toMap
    val totTok = bySource.values.map(_._2).sum
    val wts = bySource.view.mapValues { case (_, t) =>
      math.sqrt(t.toDouble).toLong }.toMap
    val totW = wts.values.sum
    val expected = bySource.keys.toSeq.sorted.map { s =>
      val (d, t) = bySource(s)
      val w = wts(s)
      (s, d, t,
        BigInt(t) * 1000000 / totTok,
        BigInt(w) * 1000000 / totW,
        BigInt(w) * totTok * 1000000 / (BigInt(totW) * t))
    }
    val got = TextAnalysis.t30TemperatureMix(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), BigInt(r.getAs[Long]("natural_share_e6")),
        BigInt(r.getAs[Long]("temp_share_e6")),
        BigInt(r.getAs[Long]("boost_e6")))).toSeq
    assert(got == expected, "temperature mix diverged from the literal replay")
    // the recipe's point: α<1 compresses the share spectrum toward
    // uniform — below-average-supply sources gain share, above-average
    // ones lose it (both arms must exist or the corpus can't test this)
    val up = got.filter(r => r._6 > 1000000)
    val down = got.filter(r => r._6 < 1000000)
    assert(up.nonEmpty && down.nonEmpty,
      "corpus too uniform — no up- or no down-sampled source")
    // the boost crossover is t = (Σt/Σ√t)², NOT the mean — the exact
    // per-source values are already pinned by the replay equality above;
    // here pin only the recipe's separation property: every up-sampled
    // source has fewer tokens than every down-sampled one
    assert(up.map(_._3).max < down.map(_._3).min,
      "an up-sampled source out-sizes a down-sampled one")
    info(got.map(r => s"${r._1}:${r._5}e6(${r._6}e6)").mkString(" "))
  }

  test("t23: the frequency-of-frequencies banding replays the literal " +
    "rank-frequency curve — band totals, edges and cumulative ranks") {
    val freqs = Tables.load(spark, sf, "documents")
      .select("text").collect().iterator
      .flatMap(_.getString(0).trim.split("\\s+").iterator.filter(_.nonEmpty))
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).values.toSeq
    def fbin(f: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(f)
    val byBand = freqs.groupBy(fbin).view.mapValues { fs =>
      (fs.size.toLong, fs.sum, fs.min, fs.max)
    }.toMap
    val got = TextAnalysis.t23ZipfCurve(spark, sf).collect()
    val gotMap = got.map(r => r.getAs[Long]("fbin") ->
      (r.getAs[Long]("n_terms"), r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("min_freq"), r.getAs[Long]("max_freq"))).toMap
    assert(gotMap == byBand, "band aggregates diverged from literal replay")
    // cumulative rank: max_rank of band b = # terms with fbin >= b,
    // i.e. the rank of the band's last (least frequent) term
    val sorted = got.sortBy(-_.getAs[Long]("fbin"))
    var cum = 0L
    sorted.foreach { r =>
      cum += r.getAs[Long]("n_terms")
      assert(r.getAs[Long]("max_rank") == cum, s"max_rank at fbin ${r.get(0)}")
    }
    assert(cum == freqs.size.toLong, "total rank == vocabulary size")
    // a natural corpus occupies >1 band or the banding is vacuous
    assert(got.length > 1, "the shipped corpus must spread across bands")
  }

  test("t24: classifier inference replays literally — hashed buckets, " +
    "md5 weights, exact integer scores — and the filter discriminates") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def md5l(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    def weight(tok: String): Long = {
      val b = md5l(tok) % TextAnalysis.ClfBuckets
      md5l(s"w|$b") % TextAnalysis.ClfWeightMod - 1000L
    }
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val score = toks.map(weight).sum
      id -> (toks.length.toLong, score,
        score * 1000000L / math.max(toks.length.toLong, 1L),
        if (score > 0) "keep" else "drop")
    }.toMap
    val got = TextAnalysis.t24ClassifierScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("score"),
          r.getAs[Long]("score_rate_e6"), r.getAs[String]("label"))).toMap
    assert(got == expected, "classifier scores diverged from literal replay")
    assert(got.nonEmpty, "the shipped corpus must exercise the shape")
    // the filter must actually split the corpus, or thresholding at 0
    // is vacuous on this weight draw
    val labels = got.values.map(_._4).toSet
    assert(labels == Set("keep", "drop"), s"filter must discriminate: $labels")
  }

  test("t25: the confusion matrix replays from t3's own verified output, " +
    "marginals conserve the corpus, and the matrix is off-diagonal " +
    "somewhere (the eval is not vacuous)") {
    val preds = TextAnalysis.t3LangId(spark, sf).collect()
      .map(r => (r.getAs[String]("labeled_lang"), r.getAs[String]("predicted_lang")))
    val cells = preds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byLabel = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byPred = preds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = cells.map { case ((l, p), n) =>
      (l, p) -> (n, byLabel(l), byPred(p), n * 1000000L / byLabel(l),
        n * 1000000L / byPred(p), if (l == p) 1L else 0L)
    }
    val got = TextAnalysis.t25LangidEval(spark, sf).collect()
      .map(r => (r.getAs[String]("labeled_lang"), r.getAs[String]("predicted_lang")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_labeled"), r.getAs[Long]("n_predicted"),
          r.getAs[Long]("recall_share_e6"), r.getAs[Long]("precision_share_e6"),
          r.getAs[Long]("is_correct"))).toMap
    assert(got == expected, "confusion matrix diverged from t3's output")
    assert(got.values.map(_._1).sum == preds.length.toLong,
      "cells must conserve the corpus")
    assert(got.keys.exists { case (l, p) => l == p }, "some correct cell")
    assert(got.keys.exists { case (l, p) => l != p },
      "a perfect heuristic langid on synthetic text would be suspicious — " +
        "the eval must have something to report")
  }

  test("t26: every card statistic equals the VERIFIED source operator's " +
    "own output aggregated by source — d1 dups, t24 keeps, t3 langs") {
    val srcOf = Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val d1 = operators.Dedup.d1DedupExact(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("group_size") > 1L))
      .toMap
    val t24 = TextAnalysis.t24ClassifierScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[String]("label") == "keep")).toMap
    val t3 = TextAnalysis.t3LangId(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang"))
      .toMap
    val expected = srcOf.keys.toSeq.groupBy(srcOf).view.mapValues { ids =>
      val n = ids.size.toLong
      val toks = ids.map(id => t24(id)._1).sum
      val dups = ids.count(d1).toLong
      val keeps = ids.count(id => t24(id)._2).toLong
      (n, toks, dups, keeps, ids.map(t3).toSet.size.toLong,
        toks * 100 / n, dups * 1000000L / n, keeps * 1000000L / n)
    }.toMap
    val got = TextAnalysis.t26CorpusCard(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_dup_docs"), r.getAs[Long]("n_keep_docs"),
          r.getAs[Long]("n_langs"), r.getAs[Long]("mean_toks_e2"),
          r.getAs[Long]("dup_rate_e6"), r.getAs[Long]("keep_rate_e6"))).toMap
    assert(got == expected,
      "the card diverged from its source operators' own outputs")
    assert(got.nonEmpty && got.values.map(_._1).sum == srcOf.size.toLong,
      "every document lands in exactly one card row")
    info(s"${got.size} sources; keep rates " +
      s"${got.values.map(_._8).min}-${got.values.map(_._8).max} e6")
  }

  test("t28: the token-budget epoch plan replays literally — weights, " +
    "targets, the 4-epoch cap, one water-filling round — and both cap " +
    "arms are non-vacuous with conservation under the budget") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.t28EpochPlan(spark, sf).collect()
    // independent replay from the raw documents table
    val nat = Tables.load(spark, sf, "documents")
      .select(col("source"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    def weight(s: String): Long =
      1 + ("""\d+""".r.findFirstIn(s).map(_.toLong).getOrElse(0L) % 10)
    // nat.keys is a Set — materialize to Seq BEFORE mapping to weights/
    // deficits, or equal values collapse (src3 and src13 share weight 4)
    val srcs = nat.keys.toSeq
    val T = nat.values.sum
    val W = srcs.map(weight).sum
    val B = TextAnalysis.BudgetMult * T
    val cap = TextAnalysis.EpochCap
    val target = srcs.map(s => s -> B * weight(s) / W).toMap
    val capped = srcs.map(s => s -> (target(s) > cap * nat(s))).toMap
    val realized = srcs.map(s =>
      s -> math.min(target(s), cap * nat(s))).toMap
    val deficit = srcs.map(s => target(s) - realized(s)).sum
    val wu = srcs.filterNot(capped).map(weight).sum
    val extra = srcs.map(s => s ->
      (if (!capped(s) && wu > 0) deficit * weight(s) / wu else 0L)).toMap
    assert(rows.length == nat.size)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("weight") == weight(s), s"weight $s")
      assert(r.getAs[Long]("nat_toks") == nat(s), s"nat $s")
      assert(r.getAs[Long]("target_toks") == target(s), s"target $s")
      assert(r.getAs[Long]("capped") == (if (capped(s)) 1L else 0L), s"cap $s")
      assert(r.getAs[Long]("realized_toks") == realized(s), s"realized $s")
      assert(r.getAs[Long]("extra_toks") == extra(s), s"extra $s")
      val fin = realized(s) + extra(s)
      assert(r.getAs[Long]("final_toks") == fin, s"final $s")
      assert(r.getAs[Long]("epochs_e6") ==
        math.min(fin, (cap + 1) * nat(s)) * 1000000L / math.max(nat(s), 1L),
        s"epochs $s")
      assert(r.getAs[Long]("share_e6") == fin * 1000000L / B, s"share $s")
    }
    // both arms live: the high-weight sources cap, the low-weight ones
    // absorb the forfeit (the regime the operator exists for)
    assert(capped.values.exists(identity), "no source capped — vacuous")
    assert(capped.values.exists(!_), "every source capped — vacuous")
    assert(deficit > 0 && extra.values.exists(_ > 0),
      "the water-filling round moved nothing")
    // conservation: floors only ever LOSE tokens, never invent them
    val finals = rows.map(_.getAs[Long]("final_toks")).sum
    assert(finals <= B, "final plan exceeds the budget")
    assert(finals >= rows.map(_.getAs[Long]("realized_toks")).sum,
      "redistribution lost realized tokens")
    info(s"${rows.length} sources, ${capped.count(_._2)} capped, " +
      s"deficit $deficit of budget $B redistributed")
  }

  test("t31: total-variation divergence replays the literal dense " +
    "formula — the sparse union-vocabulary rewrite, the exact e6 TV, " +
    "and the deterministic most-divergent term") {
    // one flat (source, term) occurrence list — every count below is a
    // plain length over it, so no aggregation step can silently drop mass
    val occ = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.split("\\s+")
        .filter(_.nonEmpty).map(r.getString(0) -> _))
    val cST = occ.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nS = occ.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val g = occ.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nAll = occ.length.toLong
    val got = TextAnalysis.t31SourceDivergence(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_terms"),
          r.getAs[Long]("tv_e6"), r.getAs[String]("top_term"),
          r.getAs[Long]("top_gap_e6"))).toMap
    assert(got.keySet == nS.keySet)
    nS.keys.foreach { s =>
      val ns = nS(s)
      val c = cST.collect { case ((`s`, t), n) => t -> n }
      // the DENSE formula over the union vocabulary — every term of
      // every source, including the ones absent from s
      // .iterator: g.keys is a Set and a Set.map DEDUPS equal
      // deviations — two terms with identical |dev| must both count
      val tvNum = g.keys.iterator.map { t =>
        (BigInt(c.getOrElse(t, 0L)) * nAll - BigInt(g(t)) * ns).abs
      }.sum
      val (gotToks, gotTerms, gotTv, gotTop, gotGap) = got(s)
      assert(gotToks == ns && gotTerms == c.size.toLong)
      assert(BigInt(gotTv) == tvNum * 1000000 / (2 * BigInt(ns) * nAll),
        s"TV diverged for $s")
      // argmax over PRESENT terms only (an absent term's deviation
      // g_t*n_s never exceeds a present top at these corpora; the
      // operator's contract is the most divergent term OF the source)
      val topDev = c.keys.iterator.map { t =>
        (BigInt(c(t)) * nAll - BigInt(g(t)) * ns).abs }.max
      val topTerm = c.keys.filter(t =>
        (BigInt(c(t)) * nAll - BigInt(g(t)) * ns).abs == topDev).min
      assert(gotTop == topTerm, s"top term diverged for $s")
      assert(BigInt(gotGap) == topDev * 1000000 / (2 * BigInt(ns) * nAll))
      assert(gotTv > 0, s"source $s indistinguishable from the corpus — " +
        "the statistic is untested")
    }
    info(got.toSeq.sortBy(_._1)
      .map(r => s"${r._1}:${r._2._3}e6@${r._2._4}").mkString(" "))
  }

  test("t32: readability replays the literal integer Flesch formulas — " +
    "counts, e3 scores, bands — and multiple bands occur") {
    val expect = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect().map { r =>
      val text = r.getString(1)
      def cnt(re: String) =
        math.max(re.r.findAllIn(text).size.toLong, 1L)
      val s = cnt("[.!?]+"); val w = cnt("\\S+")
      val syl = cnt("[aeiouyAEIOUY]+")
      val fre = 206835L - 1015L * w / s - 84600L * syl / w
      val fk = 390L * w / s + 11800L * syl / w - 15590L
      val band = if (fre >= 90000L) "elementary" else if (fre >= 60000L) "plain"
        else if (fre >= 30000L) "difficult" else "academic"
      r.getAs[Long]("doc_id") -> (s, w, syl, fre, fk, band)
    }.toMap
    val got = operators.TextAnalysis.t32Readability(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_sentences"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_syllables"),
        r.getAs[Long]("fre_e3"), r.getAs[Long]("fk_grade_e3"),
        r.getAs[String]("band"))).toMap
    assert(got == expect, "readability diverged from the literal replay")
    val bands = got.values.map(_._6).toSet
    assert(bands.size >= 2, s"corpus must span multiple bands, got $bands")
    info(s"${got.size} docs over bands " + got.values.groupBy(_._6).view
      .mapValues(_.size).toMap.toSeq.sortBy(_._1).mkString(" "))
  }

  test("t33: n-gram coverage replays a literal set computation over t5's " +
    "split rule, and both full- and partial-coverage regimes occur") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hx = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hx.substring(0, 15), 16) % 100
    }
    def split(id: Long): String = {
      val b = bucket(id)
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val bySplit = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSeq
        val uni = toks.map(t => (1L, t))
        val bi = toks.sliding(2).filter(_.size == 2)
          .map(p => (2L, p(0) + " " + p(1))).toSeq
        split(r.getAs[Long]("doc_id")) -> (uni ++ bi)
      }
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    val train = bySplit.getOrElse("train", Set.empty)
    val expect = (for {
      sp <- Seq("test", "val"); n <- Seq(1L, 2L)
      grams = bySplit(sp).filter(_._1 == n)
      cov = grams.count(train.contains).toLong
    } yield (sp, n) -> (grams.size.toLong, cov,
      cov * 1000000L / grams.size)).toMap
    val got = operators.TextAnalysis.t33NgramCoverage(spark, sf).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("ngram_order")) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_covered"),
          r.getAs[Long]("coverage_e6"))).toMap
    assert(got == expect, "coverage diverged from the literal set replay")
    assert(got.values.exists(v => v._1 == v._2) &&
      got.values.exists(v => v._2 < v._1),
      "corpus must exercise both full and partial coverage")
    info(got.toSeq.sortBy(_._1).map { case ((sp, n), (g, c, e)) =>
      s"$sp/$n-gram: $c/$g (${e}e6)" }.mkString(" "))
  }

  test("t34: the length histogram replays a literal token-count fold — " +
    "log2 bins, truncation loss at L, conservation — both regimes occur") {
    val L = operators.TextAnalysis.ContextLenTokens
    val lens = Tables.load(spark, sf, "documents").select("text").collect()
      .map(r => "\\S+".r.findAllIn(r.getString(0)).size.toLong)
    val expect = lens.groupBy(n => 64L - java.lang.Long.numberOfLeadingZeros(n))
      .map { case (bin, ns) =>
        bin -> (ns.size.toLong, ns.sum, ns.map(n => math.max(n - L, 0L)).sum)
      }
    val all = operators.TextAnalysis.t34LengthHistogram(spark, sf).collect()
    val (totRow, perRows) = all.partition(_.getAs[String]("key") == "~TOTAL")
    val tot = lens.sum
    perRows.foreach { r =>
      val e = expect(r.getAs[Long]("fbin"))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("lost_tokens")) == e, s"bucket diverged at $r")
      assert(r.getAs[Long]("token_share_e6") == e._2 * 1000000L / tot &&
        r.getAs[Long]("loss_e6") == e._3 * 1000000L / math.max(e._2, 1L),
        s"shares diverged at $r")
    }
    assert(perRows.map(_.getAs[Long]("fbin")).toSet == expect.keySet)
    assert(totRow.length == 1 &&
      totRow.head.getAs[Long]("n_docs") == lens.length.toLong &&
      totRow.head.getAs[Long]("n_tokens") == tot &&
      totRow.head.getAs[Long]("lost_tokens") == expect.values.map(_._3).sum,
      "~TOTAL must conserve the per-bucket sums")
    // the threshold sits near the median: some buckets lose tokens and
    // some lose none, or the planning curve is degenerate
    assert(expect.values.exists(_._3 > 0L) && expect.values.exists(_._3 == 0L),
      "corpus must exercise both the truncated and the fits regime")
    info(expect.toSeq.sortBy(_._1).map { case (b, (d, n, l)) =>
      s"2^$b: $d docs $n toks lost $l" }.mkString(" ") +
      s"; corpus loss ${totRow.head.getAs[Long]("loss_e6")}e6 at L=$L")
  }

  test("t35: planted round-trip — exact/casefold/oov verdicts partition " +
    "the corpus, a mismatch row never appears, shares are e6-exact") {
    import spark.implicits._
    // known merge table: a+b -> ab, ab+c -> abc
    val merges = Seq(
      (1L, "a", "b", "ab", 0L, 0L),
      (2L, "ab", "c", "abc", 0L, 0L))
    // abc: full-merge exact (1 token); ABC: casefold loss; ba: merges
    // never fire (2 tokens); don't: OOV (apostrophe); abab: repeated
    // merged symbol, the global-replace stress for the decoder
    val docs = Seq(
      (0L, "abc ABC abc"),
      (1L, "ba don't ba"),
      (2L, "abab")).toDF("doc_id", "text")
    val got = TextAnalysis.t35Core(docs, merges).collect()
      .map(r => r.getAs[String]("verdict") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("n_chars"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("occ_share_e6")))).toMap
    // the falsifiable no-loss claim: decode(encode(w)) == w for every
    // in-vocab word, so the mismatch verdict must be unpopulated
    assert(!got.contains("mismatch"),
      "decode broke a planted word — the round-trip no-loss claim failed")
    assert(got("exact") == ((3L, 5L, 14L, 8L, 714285L)),
      s"exact arm diverged: ${got("exact")}")
    assert(got("casefold") == ((1L, 1L, 3L, 1L, 142857L)),
      s"casefold arm diverged: ${got("casefold")}")
    assert(got("oov") == ((1L, 1L, 5L, 0L, 142857L)),
      s"oov arm diverged: ${got("oov")}")
    assert(got("~TOTAL") == ((5L, 7L, 22L, 9L, 1000000L)),
      "~TOTAL must conserve the per-verdict sums")
  }

  test("t35: corpus run populates exact, never mismatch, and ~TOTAL " +
    "conserves the per-verdict sums") {
    // the synthetic corpus is all-lowercase alnum, so casefold/oov stay
    // empty here — the planted test above covers those regimes
    val rows = TextAnalysis.t35TokenizerRoundtrip(spark, sf).collect()
    val verdicts = rows.map(_.getAs[String]("verdict")).toSet
    assert(!verdicts.contains("mismatch"),
      "corpus round-trip minted a mismatch — decoder broke a real word")
    assert(verdicts.contains("exact"), s"no in-vocab word at all: $verdicts")
    val (tot, per) = rows.partition(_.getAs[String]("verdict") == "~TOTAL")
    assert(tot.length == 1)
    for (c <- Seq("n_types", "n_occ", "n_chars", "n_tokens"))
      assert(tot.head.getAs[Long](c) == per.map(_.getAs[Long](c)).sum,
        s"~TOTAL does not conserve $c")
  }

  test("t36: the Heaps curve replays literally — first-bucket type " +
    "attribution equals per-prefix distinct counts, cumulative sums and " +
    "the e6 ratio are exact, and the curve is monotone") {
    def toks(s: String): Array[String] = {
      val t = s.replaceAll("^\\s+|\\s+$", "")
      if (t.isEmpty) Array.empty[String] else t.split("\\s+")
    }
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> toks(r.getAs[String]("text")))
    val b = operators.TextAnalysis.HeapsBuckets
    val maxId = docs.map(_._1).max
    def bucket(id: Long): Long = id * b / (maxId + 1)
    // ground truth per checkpoint: distinct types over the PREFIX itself
    // (not via first-bucket attribution — proving the rewrite)
    val expect = (0L until b).map { c =>
      val prefix = docs.filter { case (id, _) => bucket(id) <= c }
      val nTokens = prefix.map(_._2.length.toLong).sum
      val nTypes = prefix.iterator.flatMap(_._2).toSet.size.toLong
      (c + 1) -> (prefix.length.toLong, nTokens, nTypes,
        nTypes * 1000000L / math.max(nTokens, 1L))
    }.toMap
    val got = operators.TextAnalysis.t36HeapsCurve(spark, sf).collect()
      .map(r => r.getAs[Long]("checkpoint") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_types"), r.getAs[Long]("type_token_e6"))).toMap
    assert(got == expect, "Heaps curve diverged from the per-prefix replay")
    assert(got.size == b, s"expected $b checkpoints")
    // tokens strictly accumulate, types never shrink, and the
    // type-token ratio must FALL — on this synthetic corpus (a fixed
    // ~31-word generator vocabulary) the curve saturates at checkpoint
    // 1, which is precisely the "new data adds no vocabulary" flat
    // regime the operator exists to surface; the falling ratio is the
    // signal that survives even that degenerate shape
    val byC = got.toSeq.sortBy(_._1).map(_._2)
    byC.sliding(2).foreach { case Seq(a, c) =>
      assert(c._2 > a._2, "tokens did not accumulate")
      assert(c._3 >= a._3, "type count shrank")
    case _ => () }
    assert(byC.head._3 > 0L, "no vocabulary at all")
    assert(byC.last._4 < byC.head._4,
      "type-token ratio never fell — even a saturated curve must dilute")
    info(s"types ${byC.head._3} -> ${byC.last._3}; " +
      s"ratio e6 ${byC.head._4} -> ${byC.last._4}")
  }
}
