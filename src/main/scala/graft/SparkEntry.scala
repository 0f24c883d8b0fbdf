package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, AnalyticsExt, Dedup, Multimodal, Similarity, TextAnalysis, TopK}
import graft.pipeline.PipelineQueries

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.all ++ AnalyticsExt.all ++ PipelineQueries.all ++ TextAnalysis.all ++
      Dedup.all ++ Similarity.all ++ Multimodal.all ++ TopK.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracle ++ AnalyticsExt.oracle ++ PipelineQueries.oracle ++ TextAnalysis.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ TopK.oracle ++ Multimodal.oracle
}
