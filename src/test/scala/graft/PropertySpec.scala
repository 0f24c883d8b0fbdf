package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.TopK.TopKAggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Property-based checks of the pure algorithmic cores (raw ScalaCheck
  * driven from ScalaTest — the plus-bridge artifact isn't vendored). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private def mkAgg(k: Int): TopKAggregator[Int] = {
    val enc = Encoders.product[Tuple1[Seq[Int]]].asInstanceOf[Encoder[Seq[Int]]]
    new TopKAggregator[Int](k, (x: Int, y: Int) => x > y)(enc, enc)
  }

  test("top-k aggregator: any fold/merge split equals global sort-take") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-1000, 1000)), Gen.chooseNum(1, 8)) {
      (xs: List[Int], k: Int) =>
        val agg = mkAgg(k)
        val expected = xs.sorted(Ordering[Int].reverse).take(k)
        val (l, r) = xs.splitAt(xs.length / 2)
        val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))
        xs.foldLeft(agg.zero)(agg.reduce) == expected && merged == expected
    })
  }

  test("prefix filter: pairs with jaccard >= tau always share a prefix element") {
    // replicate the d2 prefix-length arithmetic: n - ceil(4n/5) + 1
    def prefix(s: Set[String]): Set[String] = {
      val sorted = s.toSeq.sorted // any global total order works
      val n = sorted.length
      val pl = n - ((4 * n + 4) / 5) + 1
      sorted.take(pl).toSet
    }
    val genSet = Gen.chooseNum(3, 40).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)).map(_.toSet))
    check(Prop.forAll(genSet, genSet) { (a: Set[String], b: Set[String]) =>
      val jac =
        if (a.isEmpty || b.isEmpty) 0.0
        else a.intersect(b).size.toDouble / a.union(b).size
      jac < 0.8 || prefix(a).intersect(prefix(b)).nonEmpty
    })
  }

  test("exactPercentiles is bit-identical to the builtin percentile() " +
    "on random groups") {
    // not a pure-core property: drives real plans on generated data to
    // pin the IEEE interpolation sequence to the builtin's
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    // ~5% nulls in v (the builtin ignores them), a second value column
    // with a different null pattern, a 1-row group (integral pos, no
    // interpolation) and an all-null group (builtin yields null)
    val rows: Seq[(String, java.lang.Double, java.lang.Double)] =
      (1 to 2000).map { i =>
        val v: java.lang.Double =
          if (rnd.nextInt(20) == 0) null
          else Double.box(math.floor(rnd.nextDouble() * 100000) / 100.0)
        val w: java.lang.Double =
          if (rnd.nextInt(10) == 0) null else Double.box(rnd.nextDouble() * 10)
        (s"g${i % 7}", v, w)
      } ++ Seq(("g_single", Double.box(42.17), Double.box(1.0)),
        ("g_allnull", null, null))
    val df = rows.toDF("g", "v", "w")
    val mine = graft.operators.Analytics
      .exactPercentiles(df, "g", Seq(
        ("v", 0.5, "p50"), ("v", 0.95, "p95"), ("v", 0.25, "p25"),
        ("w", 0.5, "w50")))
      .collect().map(r => r.getString(0) -> r).toMap
    val builtin = df.groupBy(col("g")).agg(
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.95)").as("p95"),
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(w, 0.5)").as("w50"),
      count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(mine.keySet == builtin.keySet)
    builtin.foreach { case (g, b) =>
      val m = mine(g)
      for (c <- Seq("p50", "p95", "p25", "w50")) {
        assert(m.isNullAt(m.fieldIndex(c)) == b.isNullAt(b.fieldIndex(c)),
          s"$g.$c: null-ness differs from builtin")
        if (!b.isNullAt(b.fieldIndex(c)))
          assert(m.getAs[Double](c) == b.getAs[Double](c),
            s"$g.$c: ${m.getAs[Double](c)} != ${b.getAs[Double](c)} (not bit-identical)")
      }
      assert(m.getAs[Long]("n") == b.getAs[Long]("n"))
    }
  }

  test("hash-split buckets partition the id space deterministically") {
    check(Prop.forAll(Gen.chooseNum(0L, 1000000L)) { id: Long =>
      def split(x: Long): String = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(x.toString.getBytes).map("%02x".format(_)).mkString.take(15)
        val b = java.lang.Long.parseLong(hex, 16) % 100
        if (b < 80) "train" else if (b < 90) "val" else "test"
      }
      split(id) == split(id) && Set("train", "val", "test").contains(split(id))
    })
  }
}
