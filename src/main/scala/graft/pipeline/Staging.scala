package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Staging-zone cleansing: raw → typed, trimmed, deduped, null-defaulted.
  *
  * Re-expresses the reference's Dataflow `raw_to_staging` stage
  * (/root/reference/dags/pipeline_orchestration_dag.py:125-143): per-entity
  * normalization rules applied as one narrow projection plus (for dedup)
  * a single keyed shuffle.
  *
  * Scale: the dedup window shuffles once on the primary key — the same
  * partitioning a downstream keyed join would want; everything else is
  * map-side only and stays in codegen.
  */
object Staging {

  /** Generic keep-first dedup by key with a deterministic order. */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderBy: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** `p2_staging_customer`: trim/upper, null-default acctbal, round to
    * cents, dedup-by-key keep-first. */
  def p2StagingCustomer(spark: SparkSession, dir: String): DataFrame = {
    val cleansed = Tables.load(spark, dir, "customer")
      .select(
        col("c_custkey"),
        trim(col("c_name")).as("name"),
        col("c_nationkey"),
        round(coalesce(col("c_acctbal"), lit(0.0)), 2).as("acctbal"),
        upper(trim(col("c_mktsegment"))).as("mktsegment"))
    dedupKeepFirst(cleansed, Seq("c_custkey"), Seq(col("name"), col("acctbal")))
  }

  /** `p3_staging_orders`: derived year/month, status decode, invalid-row
    * filter. */
  def p3StagingOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 0 && col("o_custkey").isNotNull)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        when(col("o_orderstatus") === "O", "OPEN")
          .when(col("o_orderstatus") === "F", "FILLED")
          .when(col("o_orderstatus") === "P", "PENDING")
          .otherwise("UNKNOWN").as("status"),
        round(col("o_totalprice"), 2).as("totalprice"),
        col("o_orderpriority"))

  val oracleCustomer: String =
    """SELECT c_custkey, name, c_nationkey, acctbal, mktsegment FROM (
      | SELECT c_custkey, trim(c_name) AS name, c_nationkey,
      |  round(coalesce(c_acctbal, 0.0), 2) AS acctbal,
      |  upper(trim(c_mktsegment)) AS mktsegment,
      |  row_number() OVER (PARTITION BY c_custkey
      |    ORDER BY trim(c_name), round(coalesce(c_acctbal, 0.0), 2)) AS rn
      | FROM customer) WHERE rn = 1""".stripMargin

  val oracleOrders: String =
    """SELECT o_orderkey, o_custkey,
      | year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
      | CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FILLED'
      |  WHEN 'P' THEN 'PENDING' ELSE 'UNKNOWN' END AS status,
      | round(o_totalprice, 2) AS totalprice, o_orderpriority
      |FROM orders WHERE o_totalprice > 0 AND o_custkey IS NOT NULL""".stripMargin
}
