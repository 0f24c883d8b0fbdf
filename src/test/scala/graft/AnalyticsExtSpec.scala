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

  test("q23: band totals match a hand-built day layout and brute recompute") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q23").toString
    // one order per day on days 0..9 (x100 cents), plus a 3-order burst on
    // day 20 — isolated from the first run by more than the band width
    val rows = (0 to 9).map(d => (d.toLong, d, 1.00)) ++
      Seq((100L, 20, 3.00), (101L, 20, 4.00), (102L, 20, 5.00))
    rows.map { case (k, d, p) =>
      (k, java.sql.Timestamp.valueOf(java.time.LocalDate.ofEpochDay(d).atStartOfDay()), p)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = AnalyticsExt.q23RangeJoin(spark, dir).collect()
      .map(x => x.getAs[Long]("o_orderkey") ->
        (x.getAs[Long]("n_orders_7d"), x.getAs[Long]("cents_7d"))).toMap
    assert(r.size == 13)
    // day 0 sees days 0..3; day 5 sees 2..8; day 9 sees 6..9 (nothing at 10+)
    assert(r(0L) == ((4L, 400L)))
    assert(r(5L) == ((7L, 700L)))
    assert(r(9L) == ((4L, 400L)))
    // the burst is its own island: every day-20 order sees exactly the burst
    Seq(100L, 101L, 102L).foreach(k => assert(r(k) == ((3L, 1200L))))
    // brute-force recompute over the real sf table
    val got = AnalyticsExt.q23RangeJoin(spark, sf).collect()
    val days = Tables.load(spark, sf, "orders")
      .select(datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("c")).collect()
      .map(x => (x.getAs[Int]("d"), x.getAs[Long]("c")))
    val byDay = days.groupBy(_._1)
    def band(d: Int) = (d - 3 to d + 3).flatMap(byDay.get).flatten
    val lookup = days.map(_._1).distinct.map(d =>
      d -> (band(d).size.toLong, band(d).map(_._2).sum)).toMap
    got.foreach { x =>
      val d = x.getAs[Long]("day").toInt
      assert((x.getAs[Long]("n_orders_7d"), x.getAs[Long]("cents_7d")) == lookup(d))
    }
  }

  test("exactPercentiles: seeded-random groups (dups, nulls, singletons) " +
    "match a brute-force interpolation at p50/p95") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    // duplicates on purpose (values from a small domain) + nulls + a
    // singleton group + an all-null group
    val rows: Seq[(String, Option[Double])] =
      Seq.tabulate(300) { i =>
        val g = s"g${i % 3}"
        val v = if (rnd.nextInt(10) == 0) None
                else Some((rnd.nextInt(50) * 25).toDouble / 100.0)
        (g, v)
      } ++ Seq(("solo", Some(7.25)), ("voidg", None), ("voidg", None)) ++
        Seq.fill(4)(("const", Some(5.0))) // n>1 constant: mn==mx short-circuit
    val df = rows.toDF("grp", "v")
    // both forms: the sorted-window baseline and q10's distributed
    // selection (small bucket count + heavy duplicates stress multi-rank
    // buckets and the constant-group short-circuit)
    def run(f: => org.apache.spark.sql.DataFrame) = f.collect()
      .map(r => r.getAs[String]("grp") ->
        ((Option(r.getAs[java.lang.Double]("p50")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("p95")).map(_.toDouble)))).toMap
    val specsPct = Seq(("v", 0.5, "p50"), ("v", 0.95, "p95"))
    val got = run(graft.operators.Analytics.exactPercentiles(df, "grp", specsPct))
    val gotDist = run(graft.operators.Analytics
      .exactPercentilesDistributed(df, "grp", specsPct, buckets = 3))
    assert(gotDist == got, "distributed selection must equal the sorted form")
    def brute(xs: Seq[Double], p: Double): Option[Double] =
      if (xs.isEmpty) None
      else {
        val s = xs.sorted
        val pos = p * (s.length - 1)
        val (lo, hi) = (s(pos.floor.toInt), s(pos.ceil.toInt))
        Some(if (pos.floor == pos.ceil) lo
             else (pos.ceil - pos) * lo + (pos - pos.floor) * hi)
      }
    rows.groupBy(_._1).foreach { case (g, gr) =>
      val vs = gr.flatMap(_._2)
      assert(got(g)._1 == brute(vs, 0.5), s"p50 mismatch in $g")
      assert(got(g)._2 == brute(vs, 0.95), s"p95 mismatch in $g")
    }
    assert(got("solo") == ((Some(7.25), Some(7.25))))
    assert(got("voidg") == ((None, None)), "all-null group yields nulls")
  }

  test("q28: median/MAD/outlier arithmetic matches hand computation for " +
    "odd, even and constant (MAD=0) groups") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mad").toString
    // A (odd n=5, one wild point), B (even n=4, interpolated median),
    // C (constant: MAD = 0 -> no outliers, null z)
    (Seq.tabulate(4)(i => ("A", (i + 1).toDouble)) ++ Seq(("A", 100.0)) ++
      Seq.tabulate(4)(i => ("B", (i + 1).toDouble)) ++
      Seq.fill(3)(("C", 5.0)))
      .toDF("o_orderpriority", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val got = AnalyticsExt.q28AnomalyMad(spark, dir).collect()
      .map(r => r.getAs[String]("prio") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Long]("med_cents_x2"),
          r.getAs[Long]("mad_hcents_x2"), r.getAs[Long]("n_outliers"),
          Option(r.getAs[java.lang.Long]("max_z_e6")).map(_.toLong)))).toMap
    // A: cents 100..400,10000; med 300 -> x2 600; ad 400,200,0,200,19400;
    // MAD 200 -> x2 400; only the wild point beats 3*MAD; z = 2*19400/400
    assert(got("A") == ((5L, 600L, 400L, 1L, Some(97000000L))))
    // B: med 250 (interpolated) -> x2 500; ad 300,100,100,300; MAD 200
    assert(got("B") == ((4L, 500L, 400L, 0L, Some(1500000L))))
    // C: constant group — MAD 0, zero outliers, null z
    assert(got("C") == ((3L, 1000L, 0L, 0L, None)))
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

  test("q25: bin counts total the table, observed extrema sit inside " +
    "their bin boundaries, and bins are within range") {
    val rows = AnalyticsExt.q25Histogram(spark, sf).collect()
    val total = Tables.load(spark, sf, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n_items")).sum == total,
      "every row must land in exactly one bin")
    val idx = rows.map(_.getAs[Long]("bin_idx"))
    assert(idx.toSeq == idx.sorted.toSeq && idx.distinct.length == idx.length)
    assert(idx.forall(i => i >= 0 && i < AnalyticsExt.HistBins))
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("bin_lo_c"), r.getAs[Long]("bin_hi_c"))
      val (vmin, vmax) = (r.getAs[Long]("v_min_c"), r.getAs[Long]("v_max_c"))
      assert(vmin <= vmax)
      // ±1 cent slack: boundary cents recompute vmin + k*width in floating
      // point, which can land one ulp across the floor line vs the value
      assert(vmin >= lo - 1 && vmax <= hi + 1,
        s"bin ${r.getAs[Long]("bin_idx")}: [$vmin,$vmax] outside [$lo,$hi]")
    }
  }

  test("q31: salted join result == plain unsalted join; the planted hot " +
    "key genuinely carries ~30% of orders") {
    import org.apache.spark.sql.functions._
    def hot(c: org.apache.spark.sql.Column) =
      when(pmod(c, lit(10)) < 3, lit(0L)).otherwise(c.cast("long"))
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        hot(col("o_custkey")).as("seg_key"))
    val dim = Tables.load(spark, sf, "customer")
      .select(hot(col("c_custkey")).as("seg_key"))
      .groupBy(col("seg_key")).agg(count(lit(1)).as("n_seg_customers"))
    val plain = orders.join(dim, Seq("seg_key"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("seg_key") === 0L, 1L).otherwise(0L)).as("n_hot_orders"),
        sum(col("n_seg_customers")).as("sum_seg_customers"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val salted = graft.operators.SkewJoin.q31SkewJoin(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_orders"), r.getAs[Long]("n_hot_orders"),
          r.getAs[Long]("sum_seg_customers")))).toMap
    assert(salted == plain, "salting must not change the join result")
    val (tot, hotN) = (salted.values.map(_._1).sum, salted.values.map(_._2).sum)
    assert(hotN * 10 >= tot * 2 && hotN * 10 <= tot * 4,
      s"hot key carries $hotN/$tot — expected ~30%")
  }

  test("q33: the unrolled integer PageRank matches an independent Scala " +
    "replay node-for-node, and structure (not size) drives the rank") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val o2c = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cs = li.flatMap { case (ok, s) => o2c.get(ok).map(c => (c, s)) }.distinct
    val edges = cs.map { case (c, s) => (c * 2, s * 2 + 1) } ++
      cs.map { case (c, s) => (s * 2 + 1, c * 2) }
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val deg = adj.map { case (k, vs) => k -> vs.length.toLong }
    var rank: Map[Long, Long] = deg.map { case (k, _) => k -> 1000000L }.toMap
    for (_ <- 1 to AnalyticsExt.PrIters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, vs) <- adj; v <- vs) in(v) += rank(u) / deg(u)
      rank = deg.map { case (k, _) =>
        k -> (150000L + AnalyticsExt.PrDampNum * in(k) / AnalyticsExt.PrDampDen)
      }.toMap
    }
    val got = AnalyticsExt.q33GraphRank(spark, sf).collect()
    assert(got.length == deg.size, "one row per traded node")
    got.foreach { r =>
      val node = if (r.getAs[String]("side") == "customer")
        r.getAs[Long]("node_id") * 2 else r.getAs[Long]("node_id") * 2 + 1
      assert(r.getAs[Long]("degree") == deg(node), s"degree of node $node")
      assert(r.getAs[Long]("rank_e6") == rank(node), s"rank of node $node")
    }
    // random-walk mass concentrates on the (few, high-degree) supplier
    // side: the top-ranked node must be a supplier hub, and every rank
    // carries at least the teleport floor
    val top = got.maxBy(_.getAs[Long]("rank_e6"))
    assert(top.getAs[String]("side") == "supplier", "hub side")
    assert(got.forall(_.getAs[Long]("rank_e6") >= 150000L), "teleport floor")
  }

  test("q34: the de-correlated sole-culprit count matches a literal Scala " +
    "replay of the textbook EXISTS / NOT EXISTS semantics") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byOrder = li.groupBy(_._1)
    val expected = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((_, rows) <- byOrder) {
      val supps = rows.map(_._2).distinct
      val retSupps = rows.filter(_._3 == "R").map(_._2).distinct
      // multi-supplier order with exactly one returning supplier
      if (supps.length >= 2 && retSupps.length == 1)
        expected(retSupps.head) += 1L
    }
    val got = AnalyticsExt.q34CulpritSupplier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_culprit_orders")).toMap
    assert(got == expected.toMap, s"culprit counts diverged")
    assert(got.nonEmpty, "the shipped corpus must exercise the shape")
    info(s"${got.size} culprit suppliers, max ${got.values.max} orders")
  }

  test("q37: the degree-oriented wedge construction matches a literal " +
    "adjacency-set triangle census of the same co-purchase graph") {
    val po = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairCo = scala.collection.mutable.Map.empty[(Long, Long), Int].withDefaultValue(0)
    for ((_, parts) <- po.groupBy(_._1); ps = parts.map(_._2).sorted;
         i <- ps.indices; j <- (i + 1) until ps.length)
      pairCo((ps(i), ps(j))) += 1
    // .iterator first: collecting (u,v) tuples straight off a Map would
    // rebuild a Map keyed by u and silently dedup the edge list
    val edges = pairCo.iterator.collect {
      case (p, c) if c >= AnalyticsExt.TriMinCoOrders => p }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for ((u, v) <- edges) { adj(u) += v; adj(v) += u }
    // count each triangle once: for each edge (u<v), common neighbors w > v
    val triExact = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).count(w => w > v && edges.contains((u, w)) && edges.contains((v, w)))
    }.sum.toLong
    val nWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val r = AnalyticsExt.q37TriangleCount(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_nodes") == adj.size.toLong, "node count")
    assert(row.getAs[Long]("n_edges") == edges.size.toLong, "edge count")
    assert(row.getAs[Long]("n_wedges") == nWedges, "wedge count")
    assert(row.getAs[Long]("n_triangles") == triExact, "triangle count")
    val cc = if (nWedges == 0) 0L else 3L * triExact * 1000000L / nWedges
    assert(row.getAs[Long]("global_cc_e6") == cc, "clustering coefficient")
    assert(triExact > 0L, "the shipped corpus must contain triangles")
    info(s"${adj.size} nodes, ${edges.size} edges, $triExact triangles, cc_e6=$cc")
  }

  test("q42: the rule table replays brute-force — supports, confidence " +
    "and lift in the exact sequential integer arithmetic") {
    val baskets = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val supp = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pairCounts = baskets.values.toSeq
      .flatMap(ps => ps.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= operators.AnalyticsExt.BasketMinSupport).toMap
    val expected = pairCounts.map { case ((pa, pb), nb) =>
      val (na, nbq) = (supp(pa), supp(pb))
      val conf = nb * 1000000L / na
      (pa, pb) -> (nb, na, nbq, conf, conf * n / nbq)
    }
    val got = operators.AnalyticsExt.q42MarketBasket(spark, sf).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) ->
        (r.getAs[Long]("n_both"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("conf_e6"), r.getAs[Long]("lift_e6"))).toMap
    assert(got == expected, "rule table diverged from brute force")
    assert(got.nonEmpty, "the shipped corpus must exercise the shape")
    // lift must discriminate: some rule above 1.0 (positive association)
    // and some below, or the measure is vacuous on this corpus
    assert(got.values.exists(_._5 > 1000000L), "some positively-lifted rule")
    info(s"${got.size} rules over ${baskets.size} baskets")
  }

  test("q43: the KS statistic replays brute-force — exact cross-product " +
    "integers, inclusive CDFs, smallest argmax value") {
    val vals = Tables.load(spark, sf, "orders")
      .select(org.apache.spark.sql.functions.col("o_totalprice"),
        org.apache.spark.sql.functions.year(
          org.apache.spark.sql.functions.col("o_orderdate")).as("yr"))
      .collect()
      .map(r => (math.floor(r.getDouble(0) * 100).toLong, r.getInt(1) <= 1997))
    val a = vals.filter(_._2).map(_._1).sorted
    val b = vals.filterNot(_._2).map(_._1).sorted
    val (ta, tb) = (a.length.toLong, b.length.toLong)
    val support = (a ++ b).distinct.sorted
    def cdf(xs: Array[Long], v: Long): Long = xs.count(_ <= v).toLong
    val diffs = support.map(v => v -> math.abs(cdf(a, v) * tb - cdf(b, v) * ta))
    val ksNum = diffs.map(_._2).max
    val atC = diffs.filter(_._2 == ksNum).map(_._1).min
    val row = operators.AnalyticsExt.q43KsDrift(spark, sf).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[Long]("n_a") == ta && r.getAs[Long]("n_b") == tb)
    // ks_num/denom compute in Decimal(38,0) (the r15 overflow fix — exact
    // integers far past the 64-bit envelope) but EMIT as strings since
    // r16: an emitted DECIMAL column is hash-unsafe in the driver's
    // typed-value check even when values are bit-identical (r15's only
    // two red rows). Digits-exact compare via BigInt of the string.
    assert(new java.math.BigInteger(r.getAs[String]("ks_num")) ==
      java.math.BigInteger.valueOf(ksNum), "KS numerator diverged")
    assert(new java.math.BigInteger(r.getAs[String]("denom")) ==
      java.math.BigInteger.valueOf(ta * tb))
    assert(r.getAs[Long]("ks_e6") == ksNum * 1000000L / (ta * tb))
    assert(r.getAs[Long]("at_cents") == atC, "argmax value diverged")
    assert(ksNum > 0L, "the shipped corpus must show SOME drift")
    info(s"n_a=$ta n_b=$tb ks=${ksNum.toDouble / (ta * tb)} at $atC")
  }
}
