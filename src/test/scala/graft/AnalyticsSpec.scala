package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[8]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString),
    shufflePartitions = 8).getOrCreate()
}

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs non-empty on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned no rows")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("benchQueries covers exactly the verified query names — a bench " +
    "twin may swap the form, never add or drop an entry") {
    assert(SparkEntry.benchQueries.keySet == SparkEntry.queries.keySet,
      s"diverged: ${SparkEntry.benchQueries.keySet.diff(SparkEntry.queries.keySet)} / " +
        s"${SparkEntry.queries.keySet.diff(SparkEntry.benchQueries.keySet)}")
  }

  test("the bench metric line fits the driver's 2000-char output tail") {
    // the driver parses the stdout JSON from a 2000-char tail; sbt appends
    // a ~75-char [success] line after it. Project the line's length from
    // the live query set: per query `"name":NN.NNN,` plus the fixed
    // envelope. Fails BEFORE an operator addition silently overflows the
    // window and zeroes the round's bench (BENCH_r04/r05 `parsed: null`).
    // render the actual line shape with worst-case values under Bench's
    // ADAPTIVE rendering (%.1f + zero-strip under 10s -> "0.9"/"9.9";
    // %.0f capped at 999 above -> "999": every value is <= 3 chars), and
    // the basename sf tag the line actually carries. Budget: 2000-char
    // tail minus ~80 chars for the sbt "[success] Total time..." line
    // that lands after ours.
    // envelope includes the round-8 validity verdict at its widest form
    // (env_throttled:false); the >999s clamp renders in-band as the
    // 2-char per-query sentinel -1, never as an extra envelope field.
    // Keys are Bench's short `<family><number>` prefixes — project their
    // uniqueness here too, so a name collision fails the suite before it
    // makes the metric line ambiguous.
    val shorts = SparkEntry.benchQueries.keySet.toSeq.map(_.takeWhile(_ != '_'))
    assert(shorts.distinct.size == shorts.size,
      s"short bench keys collide: ${shorts.diff(shorts.distinct).distinct}")
    def sample(worst: String) = {
      val qs = shorts.map(n => "\"" + n + "\":" + worst).mkString("{", ",", "}")
      s"""{"metric":"total","value":99999.9,"unit":"sec","queries":$qs,"sf":"sf0.1","env_throttled":false}"""
    }
    // the four samples cover each fmt2 arm at its widest
    val worst = Seq("0.9", "9.9", "999", "-1").map(sample(_).length).max
    assert(worst < 2000 - 80,
      s"projected bench line $worst chars — trim decimals or shorten " +
        "names before the driver's 2000-char tail cuts the opening brace")
  }

  test("q1 aggregates are internally consistent") {
    val r = operators.Analytics.q1PricingSummary(spark, sf).collect()
    assert(r.map(_.getAs[Long]("count_order")).sum > 0)
    r.foreach { row =>
      assert(row.getAs[Double]("sum_disc_price") <= row.getAs[Double]("sum_base_price"))
    }
  }

  test("q9 emits at most 3 rows per brand with rn in 1..3") {
    val r = operators.Analytics.q9TopNPerGroup(spark, sf).collect()
    r.groupBy(_.getAs[String]("p_brand")).foreach { case (b, rows) =>
      assert(rows.length <= 3, s"brand $b has ${rows.length} rows")
      assert(rows.map(_.getAs[Long]("rn")).forall(n => n >= 1 && n <= 3))
    }
  }

  test("q12 sessions split on >30min gaps") {
    val r = operators.Analytics.q12Sessionize(spark, sf)
    // session durations only span events <=30min apart pairwise, so a
    // 1-event session has duration 0
    val single = r.filter("n_events = 1 AND duration_us <> 0").count()
    assert(single == 0)
  }
}
