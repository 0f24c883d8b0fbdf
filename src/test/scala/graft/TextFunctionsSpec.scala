package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Edge-case behavior of the text Column primitives (empty/degenerate
  * inputs that the synthetic corpus doesn't contain). */
class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("wsTokens: empty and whitespace-only text yield empty arrays") {
    assert(one("").select(size(wsTokens(col("text")))).collect()(0).getInt(0) == 0)
    assert(one("   \t  ").select(size(wsTokens(col("text")))).collect()(0).getInt(0) == 0)
    assert(one(" a  b\tc ").select(wsTokens(col("text"))).collect()(0)
      .getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("shingles3: fewer than 3 tokens yields empty, duplicates collapse") {
    assert(one("a b").select(size(shingles3(col("text")))).collect()(0).getInt(0) == 0)
    assert(one("a b c").select(shingles3(col("text"))).collect()(0)
      .getSeq[String](0) == Seq("a b c"))
    // repeated trigram counted once (distinct)
    assert(one("x y x y x y x y").select(size(shingles3(col("text")))).collect()(0)
      .getInt(0) == 2) // "x y x" and "y x y"
  }

  test("normText: case folds, whitespace runs collapse, ends trim") {
    val r = one("  Hello\t WORLD  \n end ").select(normText(col("text"))).collect()(0).getString(0)
    assert(r == "hello world end")
  }

  test("md5Long60 is non-negative and stable") {
    val r = one("abc").select(md5Long60(col("text")), md5Long60(col("text"))).collect()(0)
    assert(r.getLong(0) >= 0 && r.getLong(0) == r.getLong(1))
    // matches first 15 hex chars of the md5
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest("abc".getBytes)
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(r.getLong(0) == expected)
  }

  test("strippedLength counts the complement class") {
    val r = one("ab1 2!c").select(
      strippedLength(col("text"), "[^A-Za-z]"),
      strippedLength(col("text"), "[^0-9]")).collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 2)
  }
}
