package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

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
