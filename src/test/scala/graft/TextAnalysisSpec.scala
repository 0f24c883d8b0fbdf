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
}
