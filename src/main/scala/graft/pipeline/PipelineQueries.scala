package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the pipeline-core driver queries (SURVEY.md §2, p1-p7). */
object PipelineQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_ingest_raw" -> (Ingest.p1IngestRaw _),
    "p2_staging_customer" -> (Staging.p2StagingCustomer _),
    "p3_staging_orders" -> (Staging.p3StagingOrders _),
    "p4_quality_checks" -> (Quality.p4QualityChecks _),
    "p5_scd2_user" -> (Scd2.p5Scd2User _),
    "p6_curated_join" -> (Curated.p6CuratedJoin _),
    "p7_incremental_merge" -> (Merge.p7IncrementalMerge _))

  val oracle: Map[String, String] = Map(
    "p1_ingest_raw" -> Ingest.oracle,
    "p2_staging_customer" -> Staging.oracleCustomer,
    "p3_staging_orders" -> Staging.oracleOrders,
    "p4_quality_checks" -> Quality.oracle,
    "p5_scd2_user" -> Scd2.oracle,
    "p6_curated_join" -> Curated.oracle,
    "p7_incremental_merge" -> Merge.oracle)
}
