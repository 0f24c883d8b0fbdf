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

  /** Snapshot reconciliation: diff two versions of a keyed table and emit
    * the added / removed / changed rows — the audit an incremental load
    * (p7) or a re-export gets checked against. Each side collapses to
    * (key, fingerprint) in its scan projection; the only shuffle is ONE
    * co-partitioned full-outer join on the key, so the diff costs a single
    * join pass regardless of row width. Unchanged rows are dropped as
    * early as possible (the verdict filter sits directly on the join).
    *
    * The fingerprint is md5 over '|'-joined value columns, which must
    * already be STABLE-rendered: longs/strings only — callers floor
    * doubles to integer cents and cast timestamps to epoch micros first,
    * because engine-native double/timestamp→string renderings differ.
    * concat_ws skips NULL columns (identically in Spark and DuckDB), so a
    * null column is distinguishable from absent text only if the caller
    * coalesces — fine for a fingerprint whose job is change DETECTION. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame = {
    def fp(df: DataFrame, as: String) = df.select(
      col(key),
      md5(concat_ws("|", df.columns.filterNot(_ == key).map(col): _*)).as(as))
    fp(oldSnap, "old_fp").join(fp(newSnap, "new_fp"), Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
  }

  /** `p11_snapshot_diff`: [[snapshotDiff]] over two deterministic
    * snapshots simulated from orders — yesterday's export is missing the
    * keys ≡98 (mod 100) that arrive today ('added'), today's is missing
    * the ≡97 keys ('removed'), and the ≡99 keys changed status ('changed').
    * Value columns are pre-rendered stable: price floored to cents,
    * orderdate to epoch micros. */
  def p11SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100d).cast("long").as("price_c"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"),
        col("o_orderpriority"))
    val oldSnap = base.filter(col("o_orderkey") % 100 =!= 98)
    val newSnap = base.filter(col("o_orderkey") % 100 =!= 97)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 100 === 99, lit("X")).otherwise(col("o_orderstatus")))
      // restore the fingerprint column order mutated by withColumn
      .select(base.columns.map(col): _*)
    snapshotDiff(oldSnap, newSnap, "o_orderkey")
      .select(col("o_orderkey"), col("change_type"), col("old_fp"), col("new_fp"))
      .orderBy(col("o_orderkey"))
  }

  val p11Oracle: String =
    """WITH base AS (
      | SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
      |  epoch_us(o_orderdate) AS date_us, o_orderpriority
      | FROM orders),
      |o AS (
      | SELECT o_orderkey, md5(concat_ws('|', o_custkey, o_orderstatus,
      |   price_c, date_us, o_orderpriority)) AS old_fp
      | FROM base WHERE o_orderkey % 100 <> 98),
      |n AS (
      | SELECT o_orderkey, md5(concat_ws('|', o_custkey,
      |   CASE WHEN o_orderkey % 100 = 99 THEN 'X' ELSE o_orderstatus END,
      |   price_c, date_us, o_orderpriority)) AS new_fp
      | FROM base WHERE o_orderkey % 100 <> 97)
      |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      | CASE WHEN old_fp IS NULL THEN 'added'
      |      WHEN new_fp IS NULL THEN 'removed'
      |      ELSE 'changed' END AS change_type,
      | old_fp, new_fp
      |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
      |WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp
      |ORDER BY o_orderkey""".stripMargin
}
