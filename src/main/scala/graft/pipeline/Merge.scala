package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Incremental upsert/merge: last-writer-wins by key across batches.
  *
  * The reference pipeline is re-runnable per dagrun (rerun = newer batch of
  * the same entities lands and supersedes): the merge keeps, per key, the
  * record from the latest batch, ordered by a version column. This is the
  * batch analog of a streaming upsert sink.
  *
  * Scale: one shuffle on the merge key + a row_number window — the classic
  * distributed merge. No driver-side diffing; both sides stay distributed.
  */
object Merge {

  /** Upsert `updates` into `current`: per key, highest (orderCol, tie) wins.
    * Both frames must share a schema. */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String],
             orderCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    current.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** `p7_incremental_merge`: orders as a change stream keyed by customer —
    * the surviving record per customer is their latest order (orderdate
    * desc, orderkey desc as the tie-break). Implemented as a true two-batch
    * merge: the pre-1997 state upserted with the 1997+ delta. */
  def p7IncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("totalprice"),
        // o_orderdate is parquet TIMESTAMP_NTZ; session TZ is UTC so the
        // cast to instant is lossless and matches DuckDB's epoch_us.
        unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"))
    val cutoffUs = java.time.Instant.parse("1997-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val base = orders.filter(col("orderdate_us") < cutoffUs)
    val delta = orders.filter(col("orderdate_us") >= cutoffUs)
    upsert(base, delta, Seq("o_custkey"), "orderdate_us", "o_orderkey")
  }

  val oracle: String =
    """SELECT o_custkey, o_orderkey, o_orderstatus, totalprice, orderdate_us
      |FROM (
      | SELECT o_custkey, o_orderkey, o_orderstatus,
      |  round(o_totalprice, 2) AS totalprice,
      |  epoch_us(o_orderdate) AS orderdate_us,
      |  row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY epoch_us(o_orderdate) DESC, o_orderkey DESC) AS rn
      | FROM orders) WHERE rn = 1""".stripMargin
}
