package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AnalyticsExt

class AnalyticsExtSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q13: every matched as-of order precedes (or equals) the event time") {
    val r = AnalyticsExt.q13AsofJoin(spark, sf)
    val events = Tables.load(spark, sf, "events").count()
    assert(r.count() == events) // left as-of keeps all events
    // re-derive the order timestamps and check the asof invariant
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("asof_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
    val bad = r.join(orders, Seq("asof_orderkey")).filter(col("o_us") > col("ts_us"))
    assert(bad.count() == 0, "asof matched an order after the event")
    // and it is the LATEST such order
    val better = r.join(
      Tables.load(spark, sf, "orders").select(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us2")), Seq("user_id"))
      .filter(col("o_us2") <= col("ts_us"))
      .groupBy(col("event_id"), col("asof_orderkey")).agg(max(col("o_us2")).as("best_us"))
      .join(orders, Seq("asof_orderkey"))
      .filter(col("o_us") < col("best_us"))
    assert(better.count() == 0, "a later eligible order exists")
  }

  test("q14: per-group counts sum to the events total") {
    val r = AnalyticsExt.q14JsonExtract(spark, sf)
    val total = r.agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, sf, "events").count())
    assert(r.filter("min_k > max_k").count() == 0)
  }

  test("q18: sketches land within tolerance of the exact answers") {
    import org.apache.spark.sql.Row
    val approx = AnalyticsExt.q18ApproxStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val dErr = math.abs(a.getAs[Long]("approx_orders") - e.getAs[Long]("d")).toDouble /
        e.getAs[Long]("d")
      assert(dErr < 0.05, s"$flag approx distinct off by ${dErr * 100}%")
      val pErr = math.abs(a.getAs[Double]("approx_p50_price") - e.getAs[Double]("p50")) /
        e.getAs[Double]("p50")
      assert(pErr < 0.05, s"$flag approx p50 off by ${pErr * 100}%")
    }
  }

  test("q15: running totals are monotone per customer") {
    val r = AnalyticsExt.q15Rolling(spark, sf).collect()
    r.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("order_idx"))
      val rt = sorted.map(_.getAs[Double]("running_total"))
      assert(rt.zip(rt.tail).forall { case (a, b) => b >= a - 0.01 })
      assert(sorted.map(_.getAs[Long]("order_idx")).toSeq == (1L to sorted.length))
    }
  }

  test("q22: cube grains are mutually consistent — every marginal sums " +
    "to the grand total") {
    val rows = AnalyticsExt.q22Cube(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_orders")))
    val grand = rows.collect { case ("ALL", "ALL", n) => n }
    assert(grand.length == 1)
    val byYear = rows.collect { case (y, "ALL", n) if y != "ALL" => n }.sum
    val byStatus = rows.collect { case ("ALL", s, n) if s != "ALL" => n }.sum
    val leaves = rows.collect { case (y, s, n) if y != "ALL" && s != "ALL" => n }.sum
    assert(Seq(byYear, byStatus, leaves).forall(_ == grand.head),
      s"marginals ($byYear, $byStatus, $leaves) != grand ${grand.head}")
  }
}
