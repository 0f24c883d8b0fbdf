package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SCD Type 2 dimension build from a change log.
  *
  * Re-expresses the reference's dbt curation model `EmployeeDepartment_cur`
  * (/root/reference/dags/pipeline_orchestration_dag.py:173-182, readme:10),
  * whose documented core is an SCD2 curated dimension: each change record
  * opens a version effective from its own timestamp and closes at the next
  * change for the same key; the last version is current.
  *
  * Scale: one shuffle on the dimension key, then a single lead() window —
  * no self-join, no driver loop. At 100 TB the change log partitions by
  * key and each partition's window is a linear scan.
  */
object Scd2 {

  /** Generic SCD2 from a change log: `keys` identify the entity, `orderBy`
    * orders its versions (must be a deterministic total order per key). */
  def fromChangeLog(changes: DataFrame, keys: Seq[String],
                    tsUsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsUsCol), col(tieCol))
    changes
      .withColumn("effective_from_us", col(tsUsCol))
      .withColumn("effective_to_us", lead(col(tsUsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", when(col("effective_to_us").isNull, 1L).otherwise(0L))
  }

  /** `p5_scd2_user`: user dimension versioned by the events change log. */
  def p5Scd2User(spark: SparkSession, dir: String): DataFrame = {
    val changes = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"), unix_micros(col("ts")).as("ts_us"))
    fromChangeLog(changes, Seq("user_id"), "ts_us", "event_id")
      .select(col("user_id"), col("version"), col("event_type"), col("value"),
        col("effective_from_us"), col("effective_to_us"), col("is_current"))
  }

  val oracle: String =
    """SELECT user_id,
      | row_number() OVER w AS version,
      | event_type, round(value, 2) AS value,
      | epoch_us(ts) AS effective_from_us,
      | lead(epoch_us(ts)) OVER w AS effective_to_us,
      | CASE WHEN lead(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin
}
