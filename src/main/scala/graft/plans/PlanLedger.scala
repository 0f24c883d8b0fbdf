package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, SinglePartition}
import org.apache.spark.sql.execution.{FileSourceScanExec, RDDScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape ledger: per-query physical-plan node counts, computed from
  * the plan TREE (`queryExecution.executedPlan`), not from grepping
  * `explain("formatted")` text. The round-19 ledger did the latter and
  * was blind to the one thing it exists for: in formatted mode an
  * exchange prints as a bare `Exchange` node line with its
  * `hashpartitioning(...)` on a separate `Arguments:` detail line, and
  * codegen prints as `[codegen id : n]` annotations — so the patterns
  * `Exchange hashpartitioning` / `WholeStageCodegen` matched NOTHING and
  * every query's exchange and codegen columns read zero (docs/PLANS_r19
  * pre-correction; r19 VERDICT "What's wrong" #1). Walking the tree
  * counts the nodes themselves, so a bucketed join that regresses to a
  * full shuffle shows up as +N in `exch_hash` in one
  * `diff docs/PLANS_r*.txt`.
  *
  * Tree-walk specifics (all public Spark 4 API):
  *   - AQE wraps the whole plan in `AdaptiveSparkPlanExec`, whose
  *     `children` is Nil — a naive `plan.collect` sees ONE node. The walk
  *     descends into `a.executedPlan` (pre-execution = the initial plan,
  *     which still contains every `ShuffleExchangeExec` AQE would later
  *     stage) and into `QueryStageExec.plan` for re-used fragments.
  *   - Subquery plans (scalar subqueries, DPP/bloom filters) hang off
  *     expressions, not `children`; `QueryPlan.subqueries` exposes them
  *     and the walk recurses so a shuffle inside a subquery is counted.
  *   - `WholeStageCodegenExec` only exists once codegen collapse has run,
  *     which it has by `executedPlan` — counting the node is exact where
  *     text-grepping `[codegen id]` annotations would multi-count spans.
  *
  * `PlanLedgerSpec` pins the generator to PlanSpec's strongest claims:
  * the bucketed joins (p29/p34-p38) count ZERO hash exchanges and the
  * shuffle-demanding shapes (q1/q3) count nonzero, so a formatted-mode
  * regression of this counter can never go unnoticed again.
  */
object PlanLedger {
  /** Column order of [[header]] and [[row]]. `exch_single` is the global
    * sort/limit/prefix-sum single-partition exchange class — kept in its
    * own column so bounded-by-design single-partition hops (SURVEY §5
    * "distributed prefix sums") never masquerade as key-hash shuffles. */
  val columns: Seq[String] = Seq(
    "exch_hash", "exch_range", "exch_single", "scan_parquet", "bcast_hj",
    "shuffled_j", "bnlj", "cartesian", "wscg", "window", "scan_rdd")

  /** Every node of the executed plan, descending through AQE wrappers,
    * query stages and subquery plans. Under AQE the pre-execution inner
    * plan has not been codegen-collapsed yet (AQE applies
    * `CollapseCodegenStages` per stage at stage-creation time), so the
    * walk applies the same public rule to the inner plan first — the
    * `wscg` column then reports exactly the spans non-AQE preparation
    * would insert, instead of a structural zero. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val own: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec =>
        nodes(org.apache.spark.sql.execution.CollapseCodegenStages(
          new java.util.concurrent.atomic.AtomicInteger(0))(a.executedPlan))
      case s: QueryStageExec => nodes(s.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    own ++ p.subqueries.flatMap(nodes)
  }

  def counts(plan: SparkPlan): Map[String, Int] = {
    val ns = nodes(plan)
    def c(f: PartialFunction[SparkPlan, Boolean]): Int =
      ns.count(n => f.applyOrElse(n, (_: SparkPlan) => false))
    Map(
      "exch_hash" -> c { case e: ShuffleExchangeExec =>
        e.outputPartitioning.isInstanceOf[HashPartitioning] },
      "exch_range" -> c { case e: ShuffleExchangeExec =>
        e.outputPartitioning.isInstanceOf[RangePartitioning] },
      "exch_single" -> c { case e: ShuffleExchangeExec =>
        e.outputPartitioning == SinglePartition },
      "scan_parquet" -> c { case _: FileSourceScanExec => true },
      "bcast_hj" -> c { case _: BroadcastHashJoinExec => true },
      "shuffled_j" -> c {
        case _: SortMergeJoinExec => true
        case _: ShuffledHashJoinExec => true },
      "bnlj" -> c { case _: BroadcastNestedLoopJoinExec => true },
      "cartesian" -> c { case _: CartesianProductExec => true },
      "wscg" -> c { case _: WholeStageCodegenExec => true },
      "window" -> c { case _: WindowExec => true },
      "scan_rdd" -> c { case _: RDDScanExec => true })
  }

  def counts(df: DataFrame): Map[String, Int] =
    counts(df.queryExecution.executedPlan)

  def header: String = "# Columns: query " + columns.mkString(" ")

  def row(name: String, df: DataFrame): String = {
    val cs = counts(df)
    name + " " + columns.map(cs).mkString(" ")
  }
}
