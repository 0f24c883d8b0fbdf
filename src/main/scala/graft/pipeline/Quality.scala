package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality engine: per-table metric report.
  *
  * Generalizes the reference's `BigQueryCheckOperator` stage
  * (/root/reference/dags/pipeline_orchestration_dag.py:149-167), which runs
  * `COUNT(*) > 0` per staging table, into a metric report: row count,
  * PK null count, PK distinct count, PK duplicate count — the checks a DQ
  * gate actually needs before curation.
  *
  * Scale: each table is scanned exactly once (a single agg computes all
  * metrics map-side-partial, the PK distincts via approx-free count
  * distinct on the key only); the stack() unpivot is driver-free and the
  * report is tiny.
  */
object Quality {

  /** One-scan metric row for a table, unpivoted to (table_name, metric, value). */
  def tableMetrics(df: DataFrame, tableName: String, pk: Seq[String]): DataFrame = {
    val pkNull = pk.map(c => col(c).isNull).reduce(_ || _)
    val pkTuple = if (pk.length == 1) col(pk.head) else struct(pk.map(col): _*)
    df.agg(
        count(lit(1)).as("row_count"),
        sum(when(pkNull, 1L).otherwise(0L)).as("pk_nulls"),
        countDistinct(pkTuple).as("pk_distinct"))
      .withColumn("pk_dups", col("row_count") - col("pk_nulls") - col("pk_distinct"))
      .selectExpr(s"'$tableName' AS table_name",
        """stack(4,
          | 'row_count', row_count,
          | 'pk_nulls', pk_nulls,
          | 'pk_distinct', pk_distinct,
          | 'pk_dups', pk_dups) AS (metric, value)""".stripMargin)
  }

  /** `p4_quality_checks`: unioned DQ report over the staging-bound tables. */
  def p4QualityChecks(spark: SparkSession, dir: String): DataFrame = {
    val checks = Seq(
      ("customer", Seq("c_custkey")),
      ("orders", Seq("o_orderkey")),
      ("lineitem", Seq("l_orderkey", "l_linenumber")))
    checks.map { case (name, pk) =>
        tableMetrics(Tables.load(spark, dir, name), name, pk)
      }.reduce(_ unionAll _)
      .orderBy(col("table_name"), col("metric"))
  }

  /** True iff every hard gate passes (non-empty, no PK nulls, no PK dups) —
    * the fail-fast signal the DAG runner consumes. */
  def gatePasses(report: DataFrame): Boolean = {
    val bad = report.filter(
      (col("metric") === "row_count" && col("value") <= 0) ||
      (col("metric") === "pk_nulls" && col("value") > 0) ||
      (col("metric") === "pk_dups" && col("value") > 0))
    bad.isEmpty
  }

  val oracle: String = {
    def one(table: String, pkNullExpr: String, pkDistinctExpr: String) =
      s"""SELECT '$table' AS table_name, m.metric, m.value FROM (
         | SELECT count(*) AS rc,
         |  CAST(sum(CASE WHEN $pkNullExpr THEN 1 ELSE 0 END) AS BIGINT) AS pn,
         |  $pkDistinctExpr AS pd
         | FROM $table) t,
         | LATERAL (VALUES ('row_count', t.rc), ('pk_nulls', t.pn),
         |  ('pk_distinct', t.pd), ('pk_dups', t.rc - t.pn - t.pd)) AS m(metric, value)""".stripMargin
    Seq(
      one("customer", "c_custkey IS NULL", "count(DISTINCT c_custkey)"),
      one("orders", "o_orderkey IS NULL", "count(DISTINCT o_orderkey)"),
      one("lineitem", "l_orderkey IS NULL OR l_linenumber IS NULL",
        "count(DISTINCT (l_orderkey, l_linenumber))"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY table_name, metric")
  }
}
