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

  test("misra-gries: any fold/merge tree keeps every token with " +
    "freq > n/k, with at most k-1 counters") {
    import graft.operators.HeavyHitters.MisraGriesAgg
    val genStream = Gen.listOf(Gen.chooseNum(0, 15).map(_.toString))
    check(Prop.forAll(genStream, Gen.chooseNum(2, 8),
      Gen.chooseNum(0, 1000), Gen.chooseNum(0, 1000)) {
      (toks: List[String], k: Int, c1: Int, c2: Int) =>
        val agg = new MisraGriesAgg(k)
        // three-way split folded independently, merged as a tree — the
        // shape Spark's partial aggregation actually produces
        val i = if (toks.isEmpty) 0 else c1 % (toks.length + 1)
        val j = if (toks.isEmpty) 0 else i + c2 % (toks.length - i + 1)
        val (a, rest) = toks.splitAt(i)
        val (b, c) = rest.splitAt(j - i)
        val merged = agg.merge(
          agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)),
          c.foldLeft(agg.zero)(agg.reduce))
        val n = toks.length
        val heavy = toks.groupBy(identity).collect {
          case (t, g) if g.size.toLong * k > n => t
        }
        heavy.forall(merged.contains) && merged.size <= k - 1
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
    val theSpecs = Seq(
      ("v", 0.5, "p50"), ("v", 0.95, "p95"), ("v", 0.25, "p25"),
      ("w", 0.5, "w50"))
    val mine = graft.operators.Analytics
      .exactPercentiles(df, "g", theSpecs)
      .collect().map(r => r.getString(0) -> r).toMap
    // the distributed selection (q10's plan) must be bit-identical too —
    // including a tiny bucket count that forces multi-target buckets
    val dist = graft.operators.Analytics
      .exactPercentilesDistributed(df, "g", theSpecs, buckets = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    val builtin = df.groupBy(col("g")).agg(
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.95)").as("p95"),
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(w, 0.5)").as("w50"),
      count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(mine.keySet == builtin.keySet)
    assert(dist.keySet == builtin.keySet)
    builtin.foreach { case (g, b) =>
      for ((label, m) <- Seq("sorted" -> mine(g), "distributed" -> dist(g))) {
        for (c <- Seq("p50", "p95", "p25", "w50")) {
          assert(m.isNullAt(m.fieldIndex(c)) == b.isNullAt(b.fieldIndex(c)),
            s"$g.$c ($label): null-ness differs from builtin")
          if (!b.isNullAt(b.fieldIndex(c)))
            assert(m.getAs[Double](c) == b.getAs[Double](c),
              s"$g.$c ($label): ${m.getAs[Double](c)} != ${b.getAs[Double](c)} (not bit-identical)")
        }
        assert(m.getAs[Long]("n") == b.getAs[Long]("n"))
      }
    }
  }

  test("intersect_count == |set(a) ∩ set(b)| on random long arrays " +
    "(duplicates, zeros, empties included)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val expr = graft.functions.IntersectCountExpr(Literal(1L), Literal(1L))
    // small value domain forces collisions/duplicates; explicit zeros hit
    // the empty-slot sentinel path
    val genArr = Gen.listOf(Gen.oneOf(Gen.chooseNum(-20L, 20L), Gen.const(0L)))
    check(Prop.forAll(genArr, genArr) { (a: List[Long], b: List[Long]) =>
      expr.computeCount(new GenericArrayData(a.toArray),
        new GenericArrayData(b.toArray)) == a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("simhash64 chunks == direct multiset recomputation on random words") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.SimHash64Expr(Literal("x"))
    def reference(words: List[String]): Seq[Long] = {
      val cnt = new Array[Int](64)
      words.foreach { w =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        for (j <- 0 until 4; b <- 0 until 16) {
          val v = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
          cnt(16 * j + b) += (v >>> b) & 1
        }
      }
      (0 until 4).map(j => (0 until 16).map(b =>
        if (2 * cnt(16 * j + b) - words.length > 0) 1L << b else 0L).sum)
    }
    // duplicate-heavy word lists: SimHash is a MULTISET function
    val genWords = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "döc", "e f", "a"))
    check(Prop.forAll(genWords) { ws: List[String] =>
      val got = expr.computeChunks(new GenericArrayData(
        ws.map(UTF8String.fromString).toArray)).toLongArray().toSeq
      got == reference(ws)
    })
    // null elements: no bits, but they DO count toward n — the declarative
    // form's exact algebra (md5(null) skips the sums, count(*) keeps the row)
    val withNull = expr.computeChunks(new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("bb"))))
      .toLongArray().toSeq
    val cnt2 = new Array[Int](64)
    Seq("a", "bb").foreach { w =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
      for (j <- 0 until 4; b <- 0 until 16)
        cnt2(16 * j + b) += ((((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)) >>> b) & 1
    }
    val expectNull = (0 until 4).map(j => (0 until 16).map(b =>
      if (2 * cnt2(16 * j + b) - 3 > 0) 1L << b else 0L).sum)
    assert(withNull == expectNull)
  }

  test("local union-find CC == reference transitive closure on random graphs") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def reference(pairs: List[(Long, Long)]): Map[Long, Long] = {
      // naive fixpoint over adjacency — independent of the union-find code
      val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      var label = adj.keys.map(v => v -> v).toMap
      var changed = true
      while (changed) {
        changed = false
        adj.foreach { case (v, ns) =>
          val m = math.min(label(v), ns.map(label).min)
          if (m < label(v)) { label += v -> m; changed = true }
        }
      }
      label
    }
    val genPairs = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L))))
      .map(_.filter(p => p._1 != p._2))
    val p = Prop.forAll(genPairs) { pairs: List[(Long, Long)] =>
      pairs.isEmpty || {
        val got = graft.operators.Dedup.ccLocal(pairs.toDF("a", "b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == reference(pairs)
      }
    }
    // each case runs a real (tiny) Spark job — fewer cases than pure props
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(r.passed, r.status.toString)
  }

  test("banded levenshtein == builtin under the d10 threshold rule on " +
    "random unicode strings (multi-byte and astral included)") {
    import graft.functions.BandedLevenshteinExpr
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    // alphabet spans 1-, 2-, 3- and 4-byte UTF-8 sequences so the
    // byte-cursor decode path is exercised at every width; a small
    // alphabet keeps real distances frequent (a large one makes every
    // pair max-distance and vacuously refuted)
    val alphabet = Vector("a", "b", "c", "é", "中", "𝄞", "🦀")
    val genStr = Gen.chooseNum(0, 200).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(alphabet)).map(_.mkString))
    check(Prop.forAll(genStr, genStr, Gen.chooseNum(1, 10)) {
      (a: String, b: String, den: Int) =>
        val expr = BandedLevenshteinExpr(Literal(a), Literal(b), den)
        val banded = expr.computeDist(UTF8String.fromString(a), UTF8String.fromString(b))
        val lev = UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b)).toLong
        val maxLen = math.max(a.codePointCount(0, a.length), b.codePointCount(0, b.length))
        banded == (if (den * lev <= maxLen) lev else -1L)
    })
  }

  test("stride scheduling: every prefix of the m6 mix order tracks the " +
    "weight recipe within one item per stream, for random weights and " +
    "supplies, up to the exhaustion horizon") {
    // pure-arithmetic replica of m6's rule: item r of stream m keys at
    // r * (scale / w_m); global order = sort by (key, stream, r)
    check(Prop.forAll(
      Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1, 6))),
      Gen.chooseNum(5, 200)) { (weights: List[Int], supplyBase: Int) =>
      val scale = weights.product * 2 // any common multiple works
      val supply = weights.indices.map(m => supplyBase + m * 7)
      val items = for {
        m <- weights.indices
        r <- 1 to supply(m)
      } yield (r.toLong * (scale / weights(m)), m, r)
      val ordered = items.sorted
      val wSum = weights.sum
      val horizon = weights.indices
        .map(m => supply(m).toLong * wSum / weights(m)).min.toInt
      val counts = Array.fill(weights.size)(0L)
      ordered.take(math.min(horizon, ordered.size)).zipWithIndex.forall {
        case ((_, m, _), i) =>
          counts(m) += 1
          val l = i + 1
          weights.indices.forall { mod =>
            math.abs(counts(mod) - l.toDouble * weights(mod) / wSum) <=
              weights.size
          }
      }
    })
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

  test("t17 window count: for every token count the sliding-window layout " +
    "covers all tokens, starts stride-apart, and never emits a redundant " +
    "tail window") {
    val W = graft.operators.TextAnalysis.ChunkTokens
    val S = graft.operators.TextAnalysis.ChunkStride
    check(Prop.forAll(Gen.chooseNum(1, 5000)) { n =>
      val nc = if (n <= W) 1L else (n - W + S - 1).toLong / S + 1
      val starts = (0L until nc).map(_ * S)
      val ends = starts.map(s => math.min(n.toLong, s + W))
      // full coverage: windows start at 0 and chain without gaps (stride
      // < window, so consecutive windows overlap), ending at n
      starts.head == 0L &&
        ends.last == n.toLong &&
        starts.zip(ends).sliding(2).forall {
          case Seq((_, e1), (s2, _)) => s2 < e1 // overlap, no gap
          case _ => true
        } &&
        // no redundant window: the last window's start is still inside
        // the tokens (it contributes at least one new token), and one
        // fewer window would leave a tail uncovered
        starts.last < n.toLong &&
        (nc == 1L || (nc - 2) * S + W < n)
    })
  }

  test("p24 rank identity: |{lo_g<=hi_f}| - |{hi_g<lo_f}| - 1 equals " +
    "brute pairwise overlap for every interval set") {
    val genIv = Gen.listOfN(2, Gen.chooseNum(0L, 30L)).map(l =>
      (l.min, l.max))
    check(Prop.forAll(Gen.nonEmptyListOf(genIv)) { ivs: List[(Long, Long)] =>
      ivs.zipWithIndex.forall { case ((lo, hi), i) =>
        val brute = ivs.zipWithIndex.count { case ((lo2, hi2), j) =>
          j != i && lo2 <= hi && hi2 >= lo }
        val loLE = ivs.count(_._1 <= hi)
        val hiLT = ivs.count(_._2 < lo)
        loLE - hiLT - 1 == brute
      }
    })
  }

  test("d18 interval union: merged spans cover exactly the union of " +
    "positions, disjointly, for every span set") {
    val genSpan = Gen.listOfN(2, Gen.chooseNum(1L, 40L)).map(l => (l.min, l.max))
    check(Prop.forAll(Gen.nonEmptyListOf(genSpan)) { spans: List[(Long, Long)] =>
      // the operator's rule: sort by (s, e); merge while s <= running max e
      val sorted = spans.distinct.sorted
      val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { case (s, e) =>
        if (merged.nonEmpty && s <= merged.last._2)
          merged(merged.size - 1) = (merged.last._1, math.max(merged.last._2, e))
        else merged += ((s, e))
      }
      val covered = spans.flatMap { case (s, e) => s to e }.toSet
      val mergedCover = merged.flatMap { case (s, e) => s to e }.toSet
      val disjoint = merged.toSeq.sliding(2).forall { w =>
        w.size < 2 || w(1)._1 > w(0)._2
      }
      mergedCover == covered && disjoint &&
        merged.map { case (s, e) => e - s + 1 }.sum == covered.size.toLong
    })
  }

  test("q43 KS cross-product form: max|cumA*nB - cumB*nA| over the " +
    "support equals the rational sup-distance of inclusive CDFs") {
    val genS = Gen.nonEmptyListOf(Gen.chooseNum(0L, 20L))
    check(Prop.forAll(genS, genS) { (a: List[Long], b: List[Long]) =>
      val (ta, tb) = (a.length.toLong, b.length.toLong)
      val support = (a ++ b).distinct.sorted
      val ksNum = support.map(v =>
        math.abs(a.count(_ <= v) * tb - b.count(_ <= v) * ta)).max
      // rational check: ksNum/(ta*tb) == sup |FA - FB| computed as
      // fractions (cross-multiply each candidate against the max)
      support.forall { v =>
        val diffNum = math.abs(a.count(_ <= v) * tb - b.count(_ <= v) * ta)
        diffNum <= ksNum
      } && support.exists { v =>
        math.abs(a.count(_ <= v) * tb - b.count(_ <= v) * ta) == ksNum
      }
    })
  }
}
