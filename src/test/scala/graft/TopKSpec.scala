package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.{Analytics, TopK}

class TopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q16 bounded-heap top-k equals the q9 window formulation") {
    val window = Analytics.q9TopNPerGroup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val agg = TopK.q16TopkAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(window.sameElements(agg))
  }

  test("q16 aggregates partially before the shuffle (bounded map-side state)") {
    val p = TopK.q16TopkAgg(spark, sf).queryExecution.executedPlan.toString
    // typed Aggregator runs as ObjectHashAggregate/SortAggregate with a
    // partial phase below the exchange
    assert(p.contains("partial"), s"no partial aggregation phase in:\n$p")
  }

  test("aggregator keeps at most k elements of state") {
    val a = new TopK.TopKAggregator[Int](3, (x: Int, y: Int) => x > y)(
      org.apache.spark.sql.Encoders.product[Tuple1[Seq[Int]]].asInstanceOf[org.apache.spark.sql.Encoder[Seq[Int]]],
      org.apache.spark.sql.Encoders.product[Tuple1[Seq[Int]]].asInstanceOf[org.apache.spark.sql.Encoder[Seq[Int]]])
    val buf = (1 to 100).foldLeft(a.zero)(a.reduce)
    assert(buf.length == 3 && buf == Seq(100, 99, 98))
    assert(a.merge(Seq(100, 50, 10), Seq(99, 98, 1)) == Seq(100, 99, 98))
  }
}
