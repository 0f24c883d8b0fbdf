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

  /** Quarantining CSV read — the dead-letter analog of the reference's
    * Dataflow jobs: malformed rows are ROUTED to a rejects frame (with the
    * raw line preserved in `_raw_record`), never silently dropped. Returns
    * (good, rejects). The parse is materialized once (localCheckpoint)
    * because Spark computes `_corrupt_record` during parsing — filtering
    * on it without materializing is unsupported, and this also avoids
    * parsing the file twice. */
  def readCsvWithRejects(spark: SparkSession, path: String, schema: StructType,
                         header: Boolean = true): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_raw_record"),
      "schema must not predeclare _raw_record")
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_raw_record",
        org.apache.spark.sql.types.StringType, nullable = true))
    val parsed = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_raw_record")
      .schema(withCorrupt)
      .csv(path)
      .localCheckpoint(true)
    val good = parsed.filter(col("_raw_record").isNull).drop("_raw_record")
    val rejects = parsed.filter(col("_raw_record").isNotNull)
    (good, rejects)
  }

  /** JSON-lines twin of [[readCsvWithRejects]]: schema-on-load NDJSON
    * ingest with malformed lines quarantined (truncated writes, non-JSON
    * noise, type mismatches) instead of dropped or load-fatal — the same
    * PERMISSIVE + corrupt-column pattern, because an event-bus export has
    * the identical partial-line failure modes a CSV landing zone has.
    * Schema is declared, never inferred: inference costs an extra full
    * pass and silently re-types columns batch to batch. */
  def readJsonWithRejects(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_raw_record"),
      "schema must not predeclare _raw_record")
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_raw_record",
        org.apache.spark.sql.types.StringType, nullable = true))
    val parsed = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_raw_record")
      .schema(withCorrupt)
      .json(path)
      .localCheckpoint(true)
    val good = parsed.filter(col("_raw_record").isNull).drop("_raw_record")
    val rejects = parsed.filter(col("_raw_record").isNotNull)
    (good, rejects)
  }

  /** Cross-engine-deterministic string rendering for audit hashing, keyed
    * by the config render hint: `money` = decimal(18,2), `ts` =
    * second-resolution timestamp, `plain` = bare cast. */
  private def renderCol(name: String, hint: String): org.apache.spark.sql.Column =
    hint match {
      case "money" => round(col(name), 2).cast("decimal(18,2)").cast("string")
      case "ts" => date_format(col(name), "yyyy-MM-dd HH:mm:ss")
      case _ => col(name).cast("string")
    }

  private def renderSql(name: String, hint: String): String = hint match {
    case "money" => s"cast(cast(round($name, 2) AS decimal(18,2)) AS varchar)"
    case "ts" => s"strftime($name, '%Y-%m-%d %H:%M:%S')"
    case _ => s"cast($name AS varchar)"
  }

  /** Parameterized raw ingest: any configured entity through the same
    * audited path (the reference runs Employee and Department through one
    * parameterized job pair — pipeline_orchestration_dag.py:101-119). */
  def ingestRawEntity(spark: SparkSession, dir: String, e: EntityConfig): DataFrame =
    withAudit(Tables.load(spark, dir, e.table), e.name,
      e.hashCols.map { case (c, hint) => renderCol(c, hint) })

  /** DuckDB oracle for [[ingestRawEntity]], generated from the same config. */
  def entityOracle(e: EntityConfig): String = {
    val hashExpr = e.hashCols.map { case (c, hint) => renderSql(c, hint) }
      .mkString(", ")
    s"""SELECT *, '${e.name}' AS _src,
       | md5(concat_ws('|', $hashExpr)) AS _row_hash
       |FROM ${e.table}""".stripMargin
  }

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
