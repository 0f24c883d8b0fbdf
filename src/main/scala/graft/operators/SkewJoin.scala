package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew splitting isn't available (e.g. a non-shuffle source feeding a
  * shuffle join directly, or a key so hot one task still OOMs).
  *
  * The hot side gets a uniform random-free salt derived from a row
  * fingerprint (deterministic — no rand(), so retries/speculation see the
  * same salt); the other side is replicated across all salt values. The
  * join key becomes (key, salt), spreading one hot key over `salts`
  * tasks.
  */
object SkewJoin {

  /** Deterministic salt in [0, salts) from a fingerprint column (use a
    * unique id or hash of the row). */
  def saltCol(fingerprint: Column, salts: Int): Column =
    pmod(crc32(fingerprint.cast("string")), lit(salts.toLong)).cast("int")

  /** Equi-join `big` (skewed) with `small` on `key`, spreading each hot key
    * over `salts` partitions. `bigFingerprint` must be unique-ish per big
    * row (e.g. its primary key) so rows distribute evenly.
    *
    * `joinType` is restricted to inner/left (left = preserve `big`): the
    * small side is replicated once per salt value, so any join type that
    * emits unmatched SMALL-side rows (right/full) would duplicate each of
    * them `salts` times. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigFingerprint: Column, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "leftouter", "left_outer")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(the replicated small side would emit unmatched rows once per salt)")
    val saltedBig = big.withColumn("_salt", saltCol(bigFingerprint, salts))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Number of salt partitions q31 spreads its hot key over. */
  val Q31Salts = 8

  /** `q31_skew_join`: the salted join exercised as a query — the shape the
    * 100-TB brief assumes for skewed fact joins, pinned against the oracle.
    *
    * Skew is PLANTED from the shipped corpus (testdata is read-only): every
    * customer key with `o_custkey % 10 < 3` collapses into segment key 0,
    * so ONE join key carries ~30% of all orders — the "hot account"
    * profile under which a plain hash join puts 30% of the fact table in
    * one task. The dim side (per-segment customer counts) joins through
    * [[saltedJoin]]: the hot segment spreads over [[Q31Salts]] tasks (salt
    * = crc32 of the order key, deterministic under retries), the dim rows
    * replicate once per salt, and the result — per-priority order counts,
    * hot-segment share, dim-attributed customer sums — is identical to the
    * unsalted join the DuckDB oracle states. All-integer output;
    * `PlanSpec` pins the `_salt` key into the physical join and
    * `AnalyticsExtSpec` pins salted == plain on the corpus. */
  def q31SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    def hotKey(k: Column): Column =
      when(pmod(k, lit(10)) < 3, lit(0L)).otherwise(k.cast("long"))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        hotKey(col("o_custkey")).as("seg_key"))
    val dim = Tables.load(spark, dir, "customer")
      .select(hotKey(col("c_custkey")).as("seg_key"))
      .groupBy(col("seg_key")).agg(count(lit(1)).as("n_seg_customers"))
    // at demo scale AQE would just broadcast the tiny dim and no skew
    // could exist; the hint forces the shuffled-join regime the operator
    // is FOR (dim too big to broadcast), so the salt split is real and
    // plan-pinnable
    saltedJoin(orders, dim.hint("shuffle_hash"), "seg_key", col("o_orderkey"), Q31Salts)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("seg_key") === 0L, 1L).otherwise(0L)).as("n_hot_orders"),
        sum(col("n_seg_customers")).as("sum_seg_customers"))
      .orderBy(col("o_orderpriority"))
  }

  val q31Oracle: String =
    """WITH o AS (
      | SELECT o_orderkey, o_orderpriority,
      |  CASE WHEN o_custkey % 10 < 3 THEN 0 ELSE o_custkey END AS seg_key
      | FROM orders),
      |d AS (
      | SELECT CASE WHEN c_custkey % 10 < 3 THEN 0 ELSE c_custkey END AS seg_key,
      |  count(*) AS n_seg_customers
      | FROM customer GROUP BY 1)
      |SELECT o.o_orderpriority AS o_orderpriority,
      | CAST(count(*) AS BIGINT) AS n_orders,
      | CAST(sum(CASE WHEN o.seg_key = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_orders,
      | CAST(sum(d.n_seg_customers) AS BIGINT) AS sum_seg_customers
      |FROM o JOIN d USING (seg_key)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_skew_join" -> (q31SkewJoin _))
  val oracle: Map[String, String] = Map("q31_skew_join" -> q31Oracle)
}
