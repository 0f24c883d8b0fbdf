package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables

/** Raw-zone ingest: schema-on-load + audit columns.
  *
  * Re-expresses the reference's Dataflow `gcs_to_raw` stage
  * (/root/reference/dags/pipeline_orchestration_dag.py:101-119, configured in
  * dags/config/pipeline_config.yaml:62-71): files land with a declared
  * schema, get a source tag and a deterministic per-row content hash for
  * lineage/idempotency, and everything downstream reads the typed table.
  *
  * Scale: audit columns are narrow per-row projections (no shuffle); the
  * md5 runs inside whole-stage codegen. CSV parsing is splittable per file;
  * schema is enforced at read so malformed rows are dropped/quarantined by
  * the reader, not by a post-pass.
  */
object Ingest {

  /** Schema-enforced CSV read. `mode` is PERMISSIVE (null out bad fields),
    * DROPMALFORMED (drop bad rows) or FAILFAST. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, mode: String = "PERMISSIVE"): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", mode)
      .schema(schema)
      .csv(path)

  /** Tag rows with their source and a deterministic md5 content hash over
    * the given columns (pre-rendered to strings by the caller for
    * engine-portable formatting). */
  def withAudit(df: DataFrame, sourceName: String, hashCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.withColumn("_src", lit(sourceName))
      .withColumn("_row_hash", md5(concat_ws("|", hashCols: _*)))

  /** `p1_ingest_raw`: customer through the raw-ingest path. Doubles are
    * rendered via decimal(18,2) so the hash is bit-identical in DuckDB. */
  def p1IngestRaw(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    withAudit(cust, "customer", Seq(
      col("c_custkey").cast("string"),
      col("c_name"),
      col("c_nationkey").cast("string"),
      round(col("c_acctbal"), 2).cast("decimal(18,2)").cast("string"),
      col("c_mktsegment")))
  }

  val oracle: String =
    """SELECT *, 'customer' AS _src,
      | md5(concat_ws('|', cast(c_custkey AS varchar), c_name,
      |  cast(c_nationkey AS varchar),
      |  cast(cast(round(c_acctbal, 2) AS decimal(18,2)) AS varchar),
      |  c_mktsegment)) AS _row_hash
      |FROM customer""".stripMargin
}
