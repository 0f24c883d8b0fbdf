package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, AnalyticsExt, Behavior, Dedup, HeavyHitters, Multimodal, Similarity, SkewJoin, TextAnalysis, TopK}
import graft.pipeline.PipelineQueries

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. These are the
    * VERIFIED forms — what Verify dumps and the DuckDB oracle hash-checks.
    * A few entries deliberately carry verification work beyond the
    * production operator (see [[benchQueries]] and README "Verified vs
    * production forms"). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.all ++ AnalyticsExt.all ++ Behavior.all ++ PipelineQueries.all ++
      TextAnalysis.all ++ Dedup.all ++ Similarity.all ++ Multimodal.all ++ TopK.all ++
      SkewJoin.all ++ graft.streaming.StreamQueries.all ++
      Map("t14_heavy_hitters" -> (HeavyHitters.t14HeavyHitters _))

  /** What Bench times: [[queries]] with verification-shaped entries swapped
    * for their production twins. Today that is only q18 — the verified form
    * runs the sketches PLUS the exact distinct/percentiles they are checked
    * against (three lineitem passes), while the production operator is the
    * sketch-only aggregate whose error bound `AnalyticsExtSpec` asserts. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries + ("q18_approx_stats" -> (AnalyticsExt.q18ApproxStats _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracle ++ AnalyticsExt.oracle ++ Behavior.oracle ++ PipelineQueries.oracle ++
      TextAnalysis.oracle ++ Dedup.oracle ++ Similarity.oracle ++ TopK.oracle ++
      Multimodal.oracle ++ SkewJoin.oracle ++ graft.streaming.StreamQueries.oracle ++
      Map("t14_heavy_hitters" -> HeavyHitters.t14Oracle)

  /** Called by Verify after a query's result parquet lands. Operators whose
    * oracle SQL is built from run-derived state (s3's k-means centroids) key
    * that state by `dir` and only publish it once the producing plan has
    * actually materialized — a failed run must not ship an oracle for a
    * result that does not exist. */
  def markMaterialized(name: String, dir: String): Unit = name match {
    case "s3_ann_ivf" => Similarity.confirmMaterialized(dir)
    case "s4_ann_pq" => Similarity.confirmPqMaterialized(dir)
    case "s6_cluster_assign" => Similarity.confirmS6Materialized(dir)
    case "s11_index_delta" => Similarity.confirmS11Materialized(dir)
    case "s12_index_drift" => Similarity.confirmS12Materialized(dir)
    case "s17_tombstone_plan" => Similarity.confirmS17Materialized(dir)
    case "s22_shard_plan" => Similarity.confirmS22Materialized(dir)
    case "s23_route_fanout" => Similarity.confirmS23Materialized(dir)
    case "s20_nprobe_sweep" => Similarity.confirmS20Materialized(dir)
    case "s24_tuning_frontier" => Similarity.confirmS24Materialized(dir)
    case "s25_cell_rebalance" => Similarity.confirmS25Materialized(dir)
    case "s14_ivf_pq" => Similarity.confirmS14Materialized(dir)
    case "d12_semantic_dedup" => Similarity.confirmD12Materialized(dir)
    case "d15_prototype_prune" => Similarity.confirmD15Materialized(dir)
    case _ => ()
  }
}
