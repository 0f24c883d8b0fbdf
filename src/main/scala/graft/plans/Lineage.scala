package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Model-lineage manifest — the dbt-docs analog the reference's `dbt run`
  * stage implies (staging_to_curation delegates to dbt, whose artifact
  * is exactly "which sources feed which model"). Lineage is read off the
  * ANALYZED logical plan, not declared by hand: every parquet scan in a
  * query's tree names its table by file, so the manifest can never
  * drift from the code the way a hand-maintained docs page does.
  *
  * Scope notes (the honest edges a plan-derived manifest has):
  * checkpointed subtrees surface as RDD scans (their upstream lineage
  * is recorded by the OPERATOR's doc, not recoverable from the plan),
  * and catalog-managed tables (the bucketed twins) resolve through the
  * catalog rather than a file scan — both are excluded by construction,
  * so the manifest covers the lazy declarative surface. Test-only
  * component (SURVEY test-only list); `PipelineSpec` pins the lineage
  * of representative queries across every table family and the
  * manifest's shape. */
object Lineage {

  /** The parquet tables a query's analyzed plan scans, by table name. */
  def inputTables(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map { p =>
            val n = p.getName
            if (n.endsWith(".parquet")) n.stripSuffix(".parquet") else n
          }.toSet
        case _ => Set.empty[String]
      }
    }.flatten.toSet

  /** One (query, table) row per scanned table for the named queries —
    * the lineage manifest a docs/catalog job publishes. The manifest
    * itself reads only the analyzed plan, but CONSTRUCTING a query's
    * DataFrame is not free of execution: many operators
    * `localCheckpoint(true)` subtrees (or, for the bucketed twins,
    * write the fact layout) at construction time, so expect those
    * queries' eager stages to run while their plans are being
    * harvested. */
  def manifest(spark: SparkSession, dir: String, names: Seq[String]): DataFrame = {
    val qs = graft.SparkEntry.queries
    val rows = names.flatMap { n =>
      inputTables(qs(n)(spark, dir)).toSeq.sorted.map(t => Row(n, t))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("query", StringType, nullable = false),
        StructField("table", StringType, nullable = false))))
  }
}
