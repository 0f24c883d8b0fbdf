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

  /** The fact slice of the events stream for [[p13PitJoin]]: purchases
    * are the facts; every other event type is a profile-state change. */
  val PitFactType = "purchase"

  /** `p13_pit_join`: point-in-time (bitemporally correct) consumption of
    * an SCD2 dimension — each fact row joined to the dimension VERSION in
    * effect at the fact's event time, the query every SCD2 build exists to
    * serve (training-data pipelines know it as the feature-store
    * "time-travel join" that prevents label leakage: a fact must never see
    * attributes from its future). Subject: `purchase` events as facts
    * against the SCD2 profile state built from every OTHER event type via
    * [[fromChangeLog]] — the same stream split into state and
    * consumption, so facts and versions genuinely interleave in time.
    *
    * The naive form is an interval join (`from_us <= t AND t < to_us`) —
    * a non-equi predicate that plans as a nested loop over the facts. And
    * because state and facts here are slices of the SAME stream, even the
    * q13 as-of union (tag both sides, union, carry window) would pay for
    * the table twice: the union's two branches each scan `events`. The
    * plan below is the single-scan form — ONE pruned scan, ONE shuffle on
    * the entity key, ONE ordered window pass with CONDITIONAL carry
    * functions:
    *
    *  - `pit_version` = running count of state rows at-or-before the
    *    current row (state versions number 1..n in (ts, event_id) order,
    *    so the count IS the latest version number);
    *  - `pit_state`/`pit_value` = `last(when(state, struct(attrs)),
    *    ignoreNulls)` — the latest state row's attributes carried onto
    *    every row. The carry is a STRUCT keyed on the state row itself
    *    (non-null for every state row even when an attribute inside is
    *    null), so a NULL-valued version is carried faithfully instead of
    *    `ignoreNulls` skipping past it to an older version's value.
    *
    * State rows order before facts at the same instant (from-inclusive
    * `[from, to)` semantics), and a zero-width version (two changes at
    * one timestamp) is correctly superseded because both count toward the
    * running version and `last` carries the later one. Facts before the
    * key's first version — and facts whose key has no state rows at all —
    * keep null version columns (the SCD2 analog of a late-arriving
    * dimension member). O(1) window state per row, no interval explosion,
    * no per-fact probe, half the scan I/O of the union form. */
  def p13PitJoin(spark: SparkSession, dir: String): DataFrame = {
    val isState = col("event_type") =!= PitFactType
    // facts sort AFTER same-instant state changes: state=0, fact=1
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), isState.cast("int").unary_-, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("pit_version",
        when(sum(isState.cast("long")).over(w) > 0, sum(isState.cast("long")).over(w)))
      .withColumn("pit_carry", last(
        when(isState, struct(col("event_type").as("st"), col("value").as("v"))),
        ignoreNulls = true).over(w))
      .withColumn("pit_state", col("pit_carry.st"))
      .withColumn("pit_value", col("pit_carry.v"))
      .filter(col("event_type") === PitFactType)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("value").as("amount"), col("pit_version"), col("pit_state"), col("pit_value"))
      .orderBy(col("event_id"))
  }

  /** The oracle states the NAIVE interval join over the filtered-log SCD2
    * versions — DuckDB's IEJoin handles it; the Spark plan above must
    * agree row-for-row. */
  val p13Oracle: String =
    s"""WITH scd AS (
       | SELECT user_id, row_number() OVER w AS version,
       |  event_type, round(value, 2) AS value,
       |  epoch_us(ts) AS effective_from_us,
       |  lead(epoch_us(ts)) OVER w AS effective_to_us
       | FROM events WHERE event_type <> '$PitFactType'
       | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
       |SELECT f.event_id AS event_id, f.user_id AS user_id,
       | epoch_us(f.ts) AS ts_us, round(f.value, 2) AS amount,
       | s.version AS pit_version, s.event_type AS pit_state,
       | s.value AS pit_value
       |FROM events f LEFT JOIN scd s
       | ON s.user_id = f.user_id
       | AND s.effective_from_us <= epoch_us(f.ts)
       | AND (s.effective_to_us IS NULL OR epoch_us(f.ts) < s.effective_to_us)
       |WHERE f.event_type = '$PitFactType'
       |ORDER BY event_id""".stripMargin
}
