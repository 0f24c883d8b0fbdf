package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Curated denormalized dimension — the reference's employee⋈department
  * join model (`EmployeeDepartment_cur`,
  * /root/reference/dags/pipeline_orchestration_dag.py:173-182) re-expressed
  * as customer⋈nation⋈region.
  *
  * Scale: both dims are broadcast (nation/region are KBs at any SF), so the
  * fact side streams through two broadcast-hash joins with zero shuffle.
  */
object Curated {

  /** `p6_curated_join`: denormalized customer dimension. */
  def p6CuratedJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey"),
        col("c_name"),
        col("c_mktsegment"),
        round(col("c_acctbal"), 2).as("acctbal"),
        col("n_name").as("nation"),
        col("r_name").as("region"))

  val oracle: String =
    """SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS acctbal,
      | n_name AS nation, r_name AS region
      |FROM customer
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey""".stripMargin
}
