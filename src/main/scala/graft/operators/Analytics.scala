package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Headline analytic queries (bench set).
  *
  * All plans are declarative DataFrame ops so Catalyst pushes filters and
  * projections into the parquet scan, picks broadcast joins for the dim
  * side, and keeps everything inside whole-stage codegen. Every computed
  * double is rounded identically to the DuckDB oracle SQL; temporal outputs
  * are strings / epoch longs so parquet-vs-DuckDB type representation can't
  * skew the compare.
  *
  * Scale notes: every query aggregates before it sorts; top-N uses a single
  * window with a deterministic tie-break; dims (region/nation/part-brand)
  * broadcast under the 64 MB threshold at any SF because they are true dims.
  */
object Analytics {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** TPC-H Q1-style pricing summary: one scan, partial aggregation. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style shipping priority: filtered fact-fact joins + top-N. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li = t(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .select(
        col("o_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q5-style local-supplier volume: 6-way join, dims broadcast. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val cust = t(spark, dir, "customer")
    val supp = t(spark, dir, "supplier")
    val nat = t(spark, dir, "nation")
    val reg = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-style selective scalar aggregate (pushdown showcase). */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .filter(col("l_discount") >= 0.04 && col("l_discount") <= 0.06)
      .filter(col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** Hierarchical rollup region → nation over customer balances. */
  def q7Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("sum_acctbal"))
      .orderBy(col("region"), col("nation"))

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Events pivoted by event_type (conditional aggregation, one scan). */
  def q8Pivot(spark: SparkSession, dir: String): DataFrame = {
    val piv = t(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", eventTypes)
      .agg(round(sum(col("value")), 2))
    eventTypes.foldLeft(piv)((d, et) => d.withColumnRenamed(et, s"v_$et"))
      .orderBy(col("day"))
  }

  /** Top-3 parts per brand by retail price (window rank, tie-break key). */
  def q9TopNPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(spark, dir, "part")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn").cast("long").as("rn"),
        col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_brand"), col("rn"))
  }

  /** Exact interpolated percentiles per `grp`, computed the SCALABLE way:
    * rank within a sorted window and interpolate between the two rows
    * straddling `p * (n-1)` — the built-in `percentile()` aggregate keeps
    * a value→count map per group in its buffer (unbounded state that also
    * serializes whole on every partial merge), which dies at data scale; a
    * sort+rank is a shuffle Spark already knows how to spill.
    *
    * `specs` are (valueColumn, p, alias) — any number of columns and
    * percentiles in ONE scan and one groupBy (a rank window per distinct
    * value column). Null values sort first under the rank window and are
    * excluded from the percentile domain by offsetting ranks with the
    * per-group null count — the builtin ignores nulls, and this does too
    * (an all-null group yields null, like the builtin). The interpolation
    * reproduces the builtin's exact IEEE sequence —
    * `(higher - pos) * lowerValue + (pos - lower) * higherValue` with
    * `pos = p * (nonNullCount - 1)`, returning the row value directly
    * when pos is integral — so results are bit-identical to a
    * `percentile()` formulation and the DuckDB `quantile_cont` oracle
    * (asserted bitwise, nulls included, in `PropertySpec`).
    * Output: one row per group with `n` (ALL group rows, the oracle's
    * `count(*)`) and a double column per spec. */
  private[graft] def exactPercentiles(df: DataFrame, grp: String,
                                      specs: Seq[(String, Double, String)]): DataFrame = {
    val valueCols = specs.map(_._1).distinct
    val wAll = Window.partitionBy(col(grp))
    // rank DESCENDING with nulls last: the ascending non-null position k
    // is then desc-rank nEff - k + 1 and null rows sit beyond nEff where
    // no pick target reaches — null handling costs NO extra window. The
    // `count(v)` windows ignore nulls and share one unsorted WindowExec,
    // so the total is one sorted window per distinct value column — the
    // minimum a rank-based percentile can do.
    val ranked = valueCols.foldLeft(
      df.select(col(grp) +: valueCols.map(col): _*)) { (d, v) =>
      d.withColumn(s"_rnd_$v", row_number().over(wAll.orderBy(col(v).desc_nulls_last)))
        .withColumn(s"_ne_$v", count(col(v)).over(wAll))
    }
    val pick = specs.flatMap { case (v, p, alias) =>
      val nEff = col(s"_ne_$v")
      val pos = lit(p) * (nEff - lit(1L))
      Seq(
        // ascending lower index floor(pos) (0-based) = desc rank nEff - floor(pos)
        min(when(col(s"_rnd_$v") === nEff - floor(pos), col(v))).as(s"_lo_$alias"),
        min(when(col(s"_rnd_$v") === nEff - ceil(pos), col(v))).as(s"_hi_$alias"))
    } ++ valueCols.map(v => max(col(s"_ne_$v")).as(s"_ne_$v")) :+ count(lit(1)).as("n")
    val out = specs.map { case (v, p, alias) =>
      val nEff = col(s"_ne_$v")
      val posC = lit(p) * (nEff - lit(1L))
      when(nEff === 0, lit(null).cast("double"))
        .when(floor(posC) === ceil(posC), col(s"_lo_$alias"))
        .otherwise((ceil(posC) - posC) * col(s"_lo_$alias")
          + (posC - floor(posC)) * col(s"_hi_$alias")).as(alias)
    }
    ranked.groupBy(col(grp)).agg(pick.head, pick.tail: _*)
      .select(col(grp) +: col("n") +: out: _*)
  }

  /** Exact interpolated percentiles per group WITHOUT a per-group total
    * sort — the scale form of [[exactPercentiles]] for LOW-CARDINALITY
    * groups (q10 partitions by `l_returnflag`: 3 keys, so the sort+rank
    * window concentrates a third of the fact table in ONE task; at 100×
    * that task is the job). This is a distributed order-statistic
    * selection, the same range-partition/prefix-sum machinery as t12's
    * sequence packing:
    *
    *  1. per-(group, column) stats: min/max/non-null count in ONE
    *     map-side-partial agg (the two-pass broadcast-stats pattern) —
    *     from `ne` each spec's target ranks `floor(pos)+1` / `ceil(pos)+1`
    *     are known exactly;
    *  2. each value maps to one of `buckets` equal-width ranges of
    *     [min, max] — a per-row expression, no sort — and per-(group,
    *     column, bucket) counts (≤ groups × cols × buckets rows) turn
    *     into cumulative bases with a window over that TINY frame;
    *  3. a target rank lands in exactly one bucket (`cum_base < rank <=
    *     cum_base + cnt`); only rows of TARGET buckets (~1/buckets of
    *     each group) are re-scanned, collapsed to DISTINCT values with
    *     counts in a map-side-combinable aggregate, and the rank is
    *     located in the cumulative counts of the sorted distinct values
    *     — the per-bucket window sees one row per distinct value, so max
    *     task ~ |distinct values in bucket|, never |rows in bucket|;
    *  4. the picked rank values interpolate with the builtin's exact IEEE
    *     sequence (same expression as [[exactPercentiles]], values cast
    *     to double once at scan — the same cast the old plan's
    *     decimal×double arithmetic performed implicitly).
    *
    * A constant-valued group (min == max) short-circuits to that value
    * before any bucket work, so the degenerate all-one-bucket sort never
    * runs. Cost: 3 column-pruned scans + small-frame shuffles, vs one
    * full-data sort shuffle whose parallelism is the group count. A
    * heavily duplicated single value no longer concentrates its bucket:
    * duplicates collapse in the distinct-value aggregate (step 3) before
    * any window sees them, closing the round-7 form's one documented
    * residual — the pathological remaining shape is a bucket with many
    * DISTINCT values, which equal-width ranges bound by value density
    * and a recursive refinement pass would subdivide (not needed at any
    * shipped scale). `AnalyticsExtSpec`/`PropertySpec` pin bit-parity
    * with [[exactPercentiles]] and the builtin `percentile()`. */
  private[graft] def exactPercentilesDistributed(
      df: DataFrame, grp: String, specs: Seq[(String, Double, String)],
      buckets: Int = 32): DataFrame = {
    val valueCols = specs.map(_._1).distinct
    // melt to (grp, tag, v): one narrow frame serves every value column
    val melted = df.select(col(grp), explode(array(valueCols.map(v =>
        struct(lit(v).as("tag"), col(v).cast("double").as("v"))): _*)).as("tv"))
      .select(col(grp), col("tv.tag").as("tag"), col("tv.v").as("v"))
    val stats = melted.groupBy(col(grp), col("tag")).agg(
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(col("v")).as("ne"), count(lit(1)).as("nrows"))
      .localCheckpoint(true) // groups×cols rows; consumed by 4 plans below
    // per-spec target ranks (1-based ascending among non-nulls)
    val specLits = array(specs.map { case (v, p, a) =>
      struct(lit(v).as("stag"), lit(p).as("p"), lit(a).as("alias"))
    }: _*)
    val tspec = stats.withColumn("sp", explode(specLits))
      .filter(col("sp.stag") === col("tag") && col("ne") > 0)
      .select(col(grp), col("tag"), col("ne"), col("mn"), col("mx"),
        col("sp.p").as("p"), col("sp.alias").as("alias"))
      .withColumn("pos", col("p") * (col("ne") - lit(1L)))
      .withColumn("rank_lo", (floor(col("pos")) + 1).cast("long"))
      .withColumn("rank_hi", (ceil(col("pos")) + 1).cast("long"))
    val ranks = tspec.filter(col("mn") =!= col("mx")) // constant groups short-circuit
      .select(col(grp), col("tag"),
        explode(array_distinct(array(col("rank_lo"), col("rank_hi")))).as("rank"))
      .distinct()
    // equal-width range bucket — the SAME expression at both consumers
    val bucketed = melted.filter(col("v").isNotNull)
      .join(broadcast(stats.select(col(grp), col("tag"), col("mn"), col("mx"))),
        Seq(grp, "tag"))
      .filter(col("mn") =!= col("mx"))
      .withColumn("bucket", least(lit(buckets - 1),
        floor((col("v") - col("mn")) * buckets / (col("mx") - col("mn"))).cast("int")))
    val cum = bucketed.groupBy(col(grp), col("tag"), col("bucket"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("cum_base", coalesce(
        sum(col("bc")).over(Window.partitionBy(col(grp), col("tag"))
          .orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val bucketRanksPlan = ranks.join(cum, Seq(grp, "tag"))
      .filter(col("rank") > col("cum_base") && col("rank") <= col("cum_base") + col("bc"))
      .select(col(grp), col("tag"), col("bucket"), col("rank"),
        (col("rank") - col("cum_base")).as("local_rank"))
    // ≤ 2·specs·groups rows (tiny by this operator's low-cardinality-grp
    // contract) consumed by two broadcast joins below. Collected and
    // re-planted as a LocalRelation rather than localCheckpoint'd:
    // broadcasting a checkpointed frame builds its hashed relation under
    // UNKNOWN stats, and the resulting ~4 MiB preallocation rode in every
    // downstream task binary via the materialized stage plan (the bench
    // log's "Broadcasting large task binary" wall). A LocalRelation has
    // exact stats, so the broadcast relation — and the task binaries —
    // stay rank-table-sized. Driver footprint is the statistics class
    // (like the k-means centroids), never fact-sized.
    val bucketRanks = {
      import scala.jdk.CollectionConverters._
      val sess = df.sparkSession
      sess.createDataFrame(bucketRanksPlan.collect().toSeq.asJava, bucketRanksPlan.schema)
    }
    // in-bucket selection over DISTINCT values, not rows: duplicates
    // collapse in a map-side-combinable count aggregate BEFORE the only
    // per-bucket window, so a heavily-duplicated value (the documented
    // residual of the round-7 form — 40% of a group equal to one value
    // concentrates 40% of its rows in one bucket's sort task) costs one
    // row in the window regardless of its multiplicity; the rank is
    // located in the cumulative counts of the sorted distinct values
    val wB = Window.partitionBy(col(grp), col("tag"), col("bucket")).orderBy(col("v"))
    val picked = bucketed
      .join(broadcast(bucketRanks.select(col(grp), col("tag"), col("bucket")).distinct()),
        Seq(grp, "tag", "bucket"))
      .groupBy(col(grp), col("tag"), col("bucket"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", coalesce(
        sum(col("c")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(bucketRanks),
        Seq(grp, "tag", "bucket")) // + rank-in-range filter next line
      .filter(col("local_rank") > col("cum") &&
        col("local_rank") <= col("cum") + col("c"))
      .select(col(grp), col("tag"), col("rank"), col("v").as("rv"))
    val lo = picked.select(col(grp), col("tag"), col("rank").as("rank_lo"), col("rv").as("lo"))
    val hi = picked.select(col(grp), col("tag"), col("rank").as("rank_hi"), col("rv").as("hi"))
    val perSpec = tspec
      .join(lo, Seq(grp, "tag", "rank_lo"), "left")
      .join(hi, Seq(grp, "tag", "rank_hi"), "left")
      .withColumn("value",
        when(col("mn") === col("mx"), col("mn"))
          .when(floor(col("pos")) === ceil(col("pos")), col("lo"))
          .otherwise((ceil(col("pos")) - col("pos")) * col("lo")
            + (col("pos") - floor(col("pos"))) * col("hi")))
    val pivots = specs.map { case (_, _, a) =>
      min(when(col("alias") === a, col("value"))).as(a)
    }
    val wide = perSpec.groupBy(col(grp)).agg(pivots.head, pivots.tail: _*)
    // all-null groups dropped by tspec's ne>0 re-enter with null values
    stats.groupBy(col(grp)).agg(max(col("nrows")).as("n"))
      .join(wide, Seq(grp), "left")
      .select(col(grp) +: col("n") +: specs.map { case (_, _, a) => col(a) }: _*)
  }

  /** Exact interpolated percentiles per group (distributed selection — see
    * [[exactPercentilesDistributed]]; the sort-based [[exactPercentiles]]
    * survives as the spec's parity baseline and for high-cardinality
    * groupings like q28's, where per-group sorts already parallelize). */
  def q10Percentiles(spark: SparkSession, dir: String): DataFrame =
    exactPercentilesDistributed(t(spark, dir, "lineitem"), "l_returnflag", Seq(
      ("l_extendedprice", 0.5, "p50_price_raw"),
      ("l_extendedprice", 0.95, "p95_price_raw"),
      ("l_quantity", 0.5, "p50_qty_raw")))
      .select(
        col("l_returnflag"),
        round(col("p50_price_raw"), 4).as("p50_price"),
        round(col("p95_price_raw"), 4).as("p95_price"),
        round(col("p50_qty_raw"), 4).as("p50_qty"),
        col("n"))
      .orderBy(col("l_returnflag"))

  /** Customers with / without orders per nation (semi/anti semantics via
    * one left join against the distinct key set — a single shuffle). */
  def q11AntiSemi(spark: SparkSession, dir: String): DataFrame = {
    val custKeys = t(spark, dir, "orders").select(col("o_custkey")).distinct()
    t(spark, dir, "customer")
      .join(custKeys, col("c_custkey") === col("o_custkey"), "left")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        count(col("o_custkey")).as("with_orders"),
        (count(lit(1)) - count(col("o_custkey"))).as("without_orders"))
      .orderBy(col("n_name"))
  }

  /** THE session definition — 30-min gap. One constant shared by the q12
    * aggregate, the Behavior funnel/retention operators and (as a literal)
    * their oracle SQL; change it here and every consumer moves together. */
  val SessionGapUs: Long = 1800L * 1000000L

  /** events + gap-based session ids (lag + running-sum windows, one
    * shuffle on user_id; deterministic (ts, event_id) tie-break) — the
    * single sessionization construction every session-scoped operator
    * builds on (q12's aggregate, Behavior's funnel). */
  def sessionizedEvents(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("_new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > SessionGapUs, 1L)
          .when(lag(col("ts_us"), 1).over(byUser).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Gap-based sessionization (30 min) of the event stream: per-session
    * aggregates over [[sessionizedEvents]]. */
  def q12Sessionize(spark: SparkSession, dir: String): DataFrame = {
    sessionizedEvents(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** `q35_min_cost_supplier`: the TPC-H Q2 shape (per part, the
    * supplier(s) quoting the minimum cost inside one region) on this
    * schema: an "offer" is the minimum observed `l_extendedprice` in
    * integer cents per (part, supplier); eligible suppliers sit in
    * EUROPE; eligible parts are `p_type = 'PROMO'`. All tied minimum
    * suppliers are returned (no arbitrary pick), as in Q2 itself.
    *
    * Spark-first de-correlation: the textbook form is a correlated
    * scalar subquery per part (`WHERE cost = (SELECT min(...) WHERE
    * part = outer.part)`) — the oracle deliberately states exactly
    * that, so the hash-match proves the rewrite. Here both filters are
    * pushed BELOW the offer aggregation (broadcast joins against the
    * filtered part dim and the region-filtered supplier dim prune the
    * fact scan first), the per-(part,supplier) min is one map-side-
    * partial aggregation, and the per-part floor is a window min over
    * the offer table — offer-sized, not fact-sized. No fact-fact
    * self-join, no second scan. */
  def q35MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euSupp = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val promoParts = t(spark, dir, "part")
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_name"))
    val offers = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"), col("n_name"))
      .agg(min(col("cents")).as("offer_cents"))
    offers
      .withColumn("best_cents",
        min(col("offer_cents")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("offer_cents") === col("best_cents"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("offer_cents"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** `q36_order_count_dist`: the TPC-H Q13 shape — the distribution of
    * customers by how many qualifying orders they placed, INCLUDING the
    * zero-order customers a plain inner join would silently drop
    * (qualifying = not LOW-priority). Two aggregations: per-customer
    * order count off a left outer join, then the count-of-counts.
    *
    * Scale: the outer join and first aggregation both key on the
    * customer key (one shuffle grain, AQE-coalesced); the second
    * aggregation's input is customer-sized and its key space is the
    * tiny count domain — map-side partials collapse it before the
    * exchange. Nothing here is fact² and no driver-side work occurs. */
  def q36OrderCountDist(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"), col("o_orderkey"))
    val perCust = t(spark, dir, "customer").select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** `q38_small_qty_revenue`: the TPC-H Q17 shape — revenue locked up in
    * small-quantity orders of one brand's parts, where "small" is
    * relative to EACH part's own average order quantity (a correlated
    * scalar subquery in the textbook form — the oracle states exactly
    * that, so the hash-match proves the de-correlation). Per part:
    * lineitem count, the e2 average quantity, and how many lineitems /
    * how much revenue fall under 20% of that part's average.
    *
    * Spark-first de-correlation: the brand filter broadcasts into the
    * fact scan first (1/|brands| of lineitem survives), then ONE shuffle
    * on `p_partkey` serves both the per-part count/sum window and the
    * final aggregation — the window's per-part buffering is bounded
    * because lineitems-per-part is a constant of the schema, not of
    * scale. The threshold test is exact integer arithmetic
    * (`5·qty·n < Σqty` ⇔ `qty < 0.2·avg`), so no float rounding can
    * disagree with the oracle's correlated form. No fact-fact join, no
    * second fact scan, nothing collected. */
  def q38SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey"), col("p_name"))
    val w = Window.partitionBy(col("p_partkey"))
    t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .withColumn("n_li", count(lit(1)).over(w))
      .withColumn("sum_qty", sum(col("qty")).over(w))
      .withColumn("is_small",
        (col("qty") * lit(5L) * col("n_li") < col("sum_qty")).cast("long"))
      .groupBy(col("p_partkey"), col("p_name"), col("n_li"), col("sum_qty"))
      .agg(sum(col("is_small")).as("n_small"),
        sum(when(col("is_small") === 1L, col("price_c")).otherwise(0L))
          .as("small_revenue_cents"))
      .withColumn("avg_qty_e2", expr("sum_qty * 100 div n_li"))
      .select(col("p_partkey"), col("p_name"), col("n_li"), col("avg_qty_e2"),
        col("n_small"), col("small_revenue_cents"))
      .orderBy(col("p_partkey"))
  }

  /** `q39_big_orders`: the TPC-H Q18 shape — large-volume orders whose
    * total lineitem quantity exceeds a threshold, joined back to their
    * order and customer rows. The classic "HAVING over a fact aggregate
    * feeds a fact join" pattern.
    *
    * Scale: ONE shuffle aggregates lineitem by `l_orderkey` with map-side
    * partials; the HAVING filter collapses the result to the handful of
    * jumbo orders (threshold 250 ≈ 1.4% of orders at any SF, because
    * per-order lineitem count is a schema constant), so AQE turns the
    * orders join into a broadcast at runtime. The customer lookup is a
    * broadcast dim join. Quantities sum as exact longs — no float can
    * disagree with the oracle's HAVING. */
  def q39BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 250L)
    val cust = t(spark, dir, "customer").select(col("c_custkey"), col("c_name"))
    t(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        floor(col("o_totalprice") * 100).cast("long").as("totalprice_cents"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  /** `q40_dormant_customers`: the TPC-H Q22 shape — customers with an
    * above-average account balance who placed no orders after a cutoff,
    * reported per nation. The textbook form is a scalar AVG subquery plus
    * a correlated NOT EXISTS; the oracle states exactly that, so the
    * hash-match proves this de-correlation.
    *
    * Spark-first: the "recent orderers" set is a distinct projection of
    * one orders scan (shuffle on `o_custkey`), removed from customer via
    * a LEFT ANTI join on the same key; the balance threshold is a 1-row
    * global aggregate broadcast into the filter. The average test is
    * exact integer arithmetic in cents (`bal·n > Σbal` ⇔ `bal > avg`),
    * immune to distributed summation order. Products stay under 2^63 at
    * any SF (cents ≤ 1e6, customers ≤ 1.5e10 at 100 TB → ≤ 1.5e16). */
  def q40DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val pos = cust.filter(col("bal_c") > 0L)
      .agg(sum(col("bal_c")).as("sum_pos"), count(lit(1)).as("n_pos"))
    val recent = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val nat = t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(pos))
      .filter(col("bal_c") * col("n_pos") > col("sum_pos"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("sum_bal_cents"))
      .orderBy(col("n_name"))
  }

  /** `q41_disjunctive_revenue`: the TPC-H Q19 shape — revenue under an
    * OR of three brand/size/quantity conjunction blocks, reported per
    * brand. The interesting part is scan-level pruning under a
    * disjunction: Catalyst cannot derive the quantity envelope from the
    * OR blocks (each bound lives in a different branch), so the plan
    * states the union-of-ranges bound `qty ∈ [1,30]` explicitly as a
    * conjunct — it reaches the lineitem scan as a pushed filter and
    * drops ~40% of the fact before the join, while the OR itself runs
    * post-join inside whole-stage codegen. Part is a broadcast dim; no
    * shuffle until the 3-row per-brand aggregate. Revenue is floored
    * cents with the oracle's exact expression shape. */
  def q41DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val parts = t(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    def block(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) && col("qty").between(qLo, qHi)
    t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
      .filter(col("qty").between(1L, 30L))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .filter(block("Brand#3", 1, 15, 1, 11) ||
        block("Brand#12", 10, 30, 10, 20) ||
        block("Brand#21", 20, 50, 20, 30))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_li"), sum(col("rev_c")).as("revenue_cents"))
      .orderBy(col("p_brand"))
  }

  /** `q44_late_ship_priority`: the TPC-H Q4 shape — orders in a window
    * with at least one lineitem shipped more than 60 days after the
    * order date, counted per priority. The textbook form is a
    * correlated EXISTS whose predicate spans BOTH tables (the lineitem
    * condition references the outer order's date) — the oracle states
    * exactly that, so the hash-match proves this de-correlation.
    *
    * Spark-first: a LEFT SEMI join on `l_orderkey` carrying the
    * cross-table inequality as an extra join condition — the order-date
    * window prunes the orders scan first (pushed filter), the semi join
    * deduplicates matching lineitems for free (no DISTINCT pass), and
    * the 5-row priority aggregate collapses map-side. No fact re-scan,
    * no correlated re-plan. */
  def q44LateShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** `q45_promo_revenue`: the TPC-H Q14 shape — the share of one
    * month's revenue carried by promotional parts (the campaign-impact
    * number marketing reads monthly). Exact integer cents (the q41
    * idiom: `floor(price·(1−disc)·100)` per line, summed as BIGINT) and
    * an e6 share render — no float ratio can disagree with the oracle.
    *
    * Scale: the shipdate window is PUSHED to the parquet scan (one
    * month of the fact read, the rest pruned by min/max stats); part is
    * a broadcast dim join; the result is ONE row from a global
    * aggregate with map-side partials. At 100 TB this reads a month and
    * moves a handful of partials. */
  def q45PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
    val part = t(spark, dir, "part")
      .select(col("p_partkey"), col("p_type").startsWith("PROMO").as("promo"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("promo"), col("rev_c")).otherwise(0L))
          .as("promo_cents"),
        sum(col("rev_c")).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        expr("promo_cents * CAST(1000000 AS DECIMAL(38,0)) div total_cents")
          .as("promo_share_e6"))
  }

  /** `q46_top_supplier`: the TPC-H Q15 shape — the quarter's
    * top-revenue supplier(s), stated in the textbook form (a revenue
    * view + a scalar max subquery) by the oracle; ties all surface
    * (revenue = max revenue), which the exact integer cents make
    * deterministic where Q15's float revenue is famously not.
    *
    * Scale: one quarter-windowed fact scan (filter pushed) aggregates
    * per supplier — ONE shuffle with map-side partials; the max is a
    * 1-row broadcast back onto the supplier-grained aggregate (the q43
    * argmax pattern), and the name lookup is a broadcast dim join. */
  def q46TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")).as("revenue_cents"))
    val mx = rev.agg(max(col("revenue_cents")).as("max_rev"))
    val sup = t(spark, dir, "supplier").select(col("s_suppkey"), col("s_name"))
    rev.join(broadcast(mx), col("revenue_cents") === col("max_rev"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
      .orderBy(col("s_suppkey"))
  }

  /** `q47_volume_shipping`: the TPC-H Q7 shape — bilateral trade volume
    * between two nations by ship year (supplier in one, customer in the
    * other, both directions), the cross-border revenue report. Exact
    * integer cents (the q41 floor idiom); years emit as BIGINT.
    *
    * Scale: the supplier side PRUNES the fact first — supplier filtered
    * to the two nations broadcasts onto lineitem before anything
    * fact-fact, so only the ~2/25 of lines sold by those nations reach
    * the orderkey shuffle. The customer nation attaches the same way on
    * the orders side (nation is a broadcast dim on both). One fact-fact
    * shuffle on orderkey, then a 4-row aggregate with map-side
    * partials. The oracle states the textbook nation-pair disjunction. */
  def q47VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nat = t(spark, dir, "nation")
      .filter(col("n_name").isin("NATION_13", "NATION_19"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
    val ord = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(col("rev_c")).as("revenue_cents"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** `q48_market_share`: the TPC-H Q8 shape — one supplier nation's
    * share of a region's market for one part type, by order year (the
    * national-market-share number). Exact integer cents; the share is
    * an e6 integer division — no float ratio can diverge.
    *
    * Scale: the part-type filter is the big pruner — it broadcasts onto
    * the fact FIRST, so only that type's lines reach the orderkey
    * shuffle; the market region restricts customers through broadcast
    * nation/region dims on the orders side. One fact-fact shuffle, then
    * a 2-row year aggregate with conditional map-side partials (the
    * numerator rides the same pass as the denominator — no second
    * scan). */
  def q48MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val supNat = t(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(supNat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val mktCust = t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")
          .join(broadcast(t(spark, dir, "region")
              .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .join(mktCust, col("o_custkey") === col("c_custkey"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_18", col("rev_c"))
          .otherwise(0L)).as("nation_cents"),
        sum(col("rev_c")).as("total_cents"))
      .select(col("o_year"), col("nation_cents"), col("total_cents"),
        expr("nation_cents * CAST(1000000 AS DECIMAL(38,0)) div total_cents")
          .as("mkt_share_e6"))
      .orderBy(col("o_year"))
  }

  /** `q49_returned_items`: the TPC-H Q10 shape — the quarter's top-20
    * customers by revenue lost to returned lines (the churn-risk call
    * list). Exact integer cents; ties break on c_custkey so the cut is
    * deterministic on both engines.
    *
    * Scale: the order-date window pushes into the orders scan and the
    * returnflag filter into the fact scan BEFORE the orderkey shuffle;
    * customer attaches on the custkey-grained aggregate (not the line
    * grain), nation broadcasts. The top-20 runs as
    * TakeOrderedAndProject — per-partition top-20, one tiny merge, no
    * global sort. */
  def q49ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_c")).as("revenue_cents"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  /** `q50_product_margin`: the TPC-H Q9 shape — per-nation, per-year
    * margin on one product line (parts named like a noun), the
    * product-profitability report. The dataset ships no partsupp, so
    * cost is the retail-price proxy: margin = discounted revenue minus
    * retail value of the shipped quantity, all exact integer cents (the
    * q41 floor idiom at line grain; quantities are integral and cast
    * BIGINT before multiplying).
    *
    * Scale: the part-name filter broadcasts onto the fact FIRST, so
    * only that product line's lines reach the orderkey shuffle;
    * supplier/nation broadcast; orders joins once on orderkey for the
    * year. One fact-fact shuffle, then a |nations|×|years| aggregate
    * with map-side partials. */
  def q50ProductMargin(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
      .filter(col("p_name").contains("rod"))
      .select(col("p_partkey"),
        floor(col("p_retailprice") * 100).cast("long").as("retail_c"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(col("rev_c") - col("retail_c") * col("qty"))
        .as("margin_cents"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** `q51_important_parts`: the TPC-H Q11 shape — the parts carrying an
    * outsized share of total revenue, kept by a GLOBAL-aggregate
    * threshold (revenue strictly above 1.5x the mean part revenue —
    * Q11's `HAVING > sum(..) * fraction`, restated scale-free so the
    * cut stays meaningful as the part count grows with the corpus; at
    * the shipped skew 2x keeps nothing, 1.5x keeps the genuine head).
    * Shares render e6; the threshold compares in exact integers
    * (`rev > (3·total) div (2·n_parts)`).
    *
    * Scale: ONE fact scan collapses to part grain at the first shuffle
    * (map-side partials); the threshold is a 1-row aggregate OF that
    * part-grain table broadcast back onto it (the q46 scalar-argmax
    * pattern) — the fact is never read twice, nothing part-grained is
    * ever resorted globally except the final small output. */
  def q51ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")).as("revenue_cents"))
    val scalar = rev.agg(sum(col("revenue_cents")).as("total_c"),
      count(lit(1)).as("n_parts"))
    rev.join(broadcast(scalar))
      .filter(col("revenue_cents") >
        expr("3 * CAST(total_c AS DECIMAL(38,0)) div (2 * n_parts)"))
      .select(col("l_partkey").as("p_partkey"), col("revenue_cents"),
        expr("revenue_cents * CAST(1000000 AS DECIMAL(38,0)) div total_c")
          .as("share_e6"))
      .orderBy(col("revenue_cents").desc, col("p_partkey"))
  }

  /** `q52_ship_delay_modes`: the TPC-H Q12 shape — order-priority mix
    * per shipping bucket (the dataset ships no l_shipmode, so the
    * bucket is the DERIVED service tier: days from order to ship —
    * FAST < 30 ≤ MED < 75 ≤ SLOW), the "are urgent orders actually
    * shipping faster" report. Line-grain counts split by critical
    * (1-URGENT/2-HIGH) vs other priority — Q12's conditional aggregate
    * verbatim; day arithmetic is integer (midnight timestamps).
    *
    * Scale: the ship-year window pushes into the fact scan; ONE
    * fact-fact shuffle on orderkey, then a 3-row aggregate with
    * conditional map-side partials — both counts ride one pass. */
  def q52ShipDelayModes(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .groupBy(when(col("delay_days") < 30, "FAST")
        .when(col("delay_days") < 75, "MED")
        .otherwise("SLOW").as("ship_tier"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("critical_lines"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("other_lines"))
      .orderBy(col("ship_tier"))
  }

  /** `q53_supplier_diversity`: the TPC-H Q16 shape — how many distinct
    * suppliers actually ship each (brand, type) segment, the
    * single-source-risk report; the part↔supplier relation comes from
    * OBSERVED trade (lineitem pairs — the dataset ships no partsupp).
    * Q16's two exclusions, restated: one brand excluded outright, and
    * below-mean-balance suppliers excluded by NOT IN — the mean test in
    * exact integer cents cross-multiplication (`bal·n < total`), never
    * a float average.
    *
    * Scale: the supplier blacklist is supplier-grain (a 1-row scalar
    * broadcast onto the supplier dim, then a broadcast semi onto the
    * fact); part broadcasts; the fact collapses to DISTINCT (brand,
    * type, suppkey) at the first shuffle (partial distinct map-side),
    * then a |segments|-grain exact distinct count. */
  def q53SupplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val supBal = t(spark, dir, "supplier")
      .select(col("s_suppkey"),
        floor(col("s_acctbal") * 100).cast("long").as("bal_c"))
    val balScalar = supBal.agg(sum(col("bal_c")).as("tot_bal"),
      count(lit(1)).as("n_sup"))
    val keepSup = supBal.join(broadcast(balScalar))
      .filter(col("bal_c") * col("n_sup") >= col("tot_bal"))
      .select(col("s_suppkey"))
    val part = t(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#13")
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(keepSup), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
  }

  /** `q54_dominant_supplier`: the TPC-H Q20 shape — suppliers holding a
    * DOMINANT position (strictly more than half of a part's shipped
    * quantity in the year) on any part of one product line, rolled to
    * the supplier with their dominant-part count — the
    * concentration-risk list procurement reads before renegotiating.
    * Q20's correlated-aggregate threshold, in exact integers
    * (`2·sq > total_q`; integral quantities cast BIGINT at line grain).
    *
    * Scale: the part-name filter broadcasts onto the year-windowed fact
    * scan, which collapses to (part, supplier) grain at the first
    * shuffle; the per-part total is an aggregate OF that small table
    * joined back on partkey (pair-grain, never fact-grain); the
    * verdict filter, supplier rollup and broadcast name/nation lookups
    * all run on supplier-grain rows. */
  def q54DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
      .filter(col("p_name").contains("widget")).select(col("p_partkey"))
    val sq = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty")).as("sq"))
    val tq = sq.groupBy(col("l_partkey")).agg(sum(col("sq")).as("total_q"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    sq.join(tq, Seq("l_partkey"))
      .filter(col("sq") * 2 > col("total_q"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominant_parts"), sum(col("sq")).as("dominant_qty"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_dominant_parts"), col("dominant_qty"))
      .orderBy(col("s_suppkey"))
  }

  /** `q55_rfm_segments`: RFM customer segmentation — the
    * marketing-standard recency/frequency/monetary grid, with FIXED
    * integer thresholds (recency: days since last order < 200 → R1;
    * frequency: ≥ 10 orders → F1; monetary: ≥ 2.5e8 cents → M1 — each
    * sits at the shipped corpus's median so the grid actually fills)
    * instead
    * of global quantiles, so every cell boundary is exact arithmetic
    * and the segment of one customer never depends on another's data —
    * the property that lets the segmentation run incrementally at 100 TB
    * (quantile grids re-segment everyone on every refresh). Anchored at
    * the corpus's fixed end-of-history date, cents exact (the q41
    * idiom on o_totalprice).
    *
    * Scale: ONE orders scan collapses to customer grain at the first
    * shuffle (map-side partials carry max-date/count/sum); bucketing is
    * a per-row CASE on that grain; the 8-cell rollup is a second tiny
    * aggregate. The customer dim never joins — the segments need only
    * behavior, an existence audit would be q11's anti-join. */
  def q55RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val anchor = lit("2001-09-01").cast("timestamp")
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("spend_cents"))
      .withColumn("recency_days",
        datediff(anchor, col("last_order")).cast("long"))
      .withColumn("r", when(col("recency_days") < 200L, "R1").otherwise("R0"))
      .withColumn("f", when(col("n_orders") >= 10L, "F1").otherwise("F0"))
      .withColumn("m", when(col("spend_cents") >= 250000000L, "M1")
        .otherwise("M0"))
    perCust
      .groupBy(concat(col("r"), col("f"), col("m")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("n_orders"),
        sum(col("spend_cents")).as("spend_cents"),
        min(col("recency_days")).as("min_recency_days"),
        max(col("recency_days")).as("max_recency_days"))
      .orderBy(col("segment"))
  }

  /** `q56_sole_late_supplier`: the TPC-H Q21 shape on this schema —
    * suppliers who were the SOLE late shipper on a finished
    * multi-supplier order (the blame list logistics escalates: the
    * order waited, exactly one supplier's lines were late, and it was
    * this one). Lateness is q44's rule (`l_shipdate > o_orderdate + 60
    * days`, restated because this schema carries no commit/receipt
    * dates); `numwait` counts qualifying ORDERS per supplier (the pair
    * grain below makes that exact — the textbook's count(*) over l1
    * lines double-counts multi-line lates, so both forms state COUNT
    *(DISTINCT order) explicitly). The oracle is deliberately the
    * TEXTBOOK Q21 form — EXISTS (another supplier on the order) AND
    * NOT EXISTS (another LATE supplier) correlated on l1 — so the
    * hash-match proves the de-correlation below.
    *
    * Spark-first de-correlation: ONE lineitem shuffle collapses the
    * fact to (orderkey, suppkey, max_shipdate) grain with map-side
    * partials (per-pair lateness only needs the LATEST line vs the one
    * order-level threshold); the F-filtered orders join, the per-order
    * supplier/late-supplier counts, and the pair-grain join-back all
    * ride the SAME orderkey hash partitioning — no fact-fact
    * re-shuffle, no correlated re-scan of lineitem (the textbook form
    * scans it three times). The supplier/nation lookup broadcasts onto
    * supplier-grain rows. At 100 TB: one fact-grain shuffle, then
    * pair/order-grain work only. */
  def q56SoleLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val pair = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("max_ship"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("max_ship") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
          1L).otherwise(0L).as("late"))
      .localCheckpoint(true) // pair grain; per-order agg + join-back read it
    val perOrder = pair.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late_supp"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    pair.filter(col("late") === 1L)
      .join(perOrder, Seq("l_orderkey"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
  }

  /** `q57_reorder_curve`: the repeat-purchase retention curve every
    * commerce analytics stack ships — for each order INDEX k (a
    * customer's 1st, 2nd, ... order by date), how many customers ever
    * reached a k-th order and the exact integer day-gap stats from
    * their previous order (floored mean, min, max). The curve's decay
    * is the reorder-rate read; the gap drift across k is the
    * cadence read (q55 segments customers; this profiles the
    * trajectory the segments summarize; q21's cohorts do the analog on
    * event data — this is the ORDER-sequence form with exact gaps).
    * Day arithmetic on epoch days, ties broken by orderkey so the
    * sequence is engine-exact.
    *
    * Scale: ONE orders scan, ONE custkey shuffle serving both the
    * sequence window and the lag (the per-customer frame is bounded by
    * orders-per-customer — a constant of the schema, not of scale),
    * then a |max-k|-grain aggregate with map-side partials. No joins,
    * no fact-fact work, nothing unbounded. */
  def q57ReorderCurve(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        floor(unix_micros(col("o_orderdate").cast("timestamp")) /
          lit(86400L * 1000000L)).cast("long").as("day"))
      .withColumn("order_idx", row_number().over(w).cast("long"))
      .withColumn("gap_days", col("day") - lag(col("day"), 1).over(w))
      .groupBy(col("order_idx"))
      .agg(count(lit(1)).as("n_customers"),
        coalesce(sum(col("gap_days")), lit(0L)).as("sum_gap_days"),
        coalesce(min(col("gap_days")), lit(-1L)).as("min_gap_days"),
        coalesce(max(col("gap_days")), lit(-1L)).as("max_gap_days"))
      .withColumn("avg_gap_days",
        when(col("order_idx") === 1L, -1L)
          .otherwise(expr("sum_gap_days div n_customers")))
      .orderBy(col("order_idx"))
  }

  val RefFan = 10 // q58: referral fan-out — parent(c) = c div RefFan
  val ReachDepthCap = 3 // q58: ancestor hops reported (the recursion cap)

  /** `q58_hierarchy_reach`: recursive hierarchy reachability — the
    * org-chart/BOM shape (the one classic warehouse recursion with no
    * analog here until now). The customer referral FOREST is the t5-style
    * deterministic convention: customer c was referred by `c div
    * [[RefFan]]` when that key is itself a customer (roots are the
    * customers with no referrer). The query is the depth-capped
    * transitive closure: one row per (customer, ancestor) pair within
    * [[ReachDepthCap]] hops, carrying the hop depth, whether the ancestor
    * is a forest root, and the descendant's lifetime spend in cents (so
    * the closure is the spine a hierarchical rollup would aggregate —
    * "revenue attributable to each referrer's subtree" is one groupBy
    * away).
    *
    * The engine DE-RECURSES: [[ReachDepthCap]] unrolled frontier joins
    * (q33's fixed-K pattern), each one edge-table-sized equi-join keyed
    * on the frontier's ancestor — while the ORACLE states DuckDB's native
    * `WITH RECURSIVE`, so the hash match proves the unrolled form ≡ true
    * recursion at the cap. Cycle safety is structural (parent < child
    * strictly, spec-pinned) AND capped (a cyclic edge set cannot loop the
    * plan: there is no driver-side convergence test to diverge — depth
    * d > cap rows simply don't exist). The parent edge is functional
    * (≤ 1 parent per node), so every frontier is already duplicate-free
    * — no per-round distinct shuffle is needed (the general-DAG form
    * would add one); at 100 TB the edge table is dimension-sized next to
    * the fact side (one row per customer), the closure is ≤ cap × |edges|
    * rows, and the revenue attach is one aggregated-fact equi-join. */
  def q58HierarchyReach(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select(col("c_custkey"))
    // referrer must itself be a customer (the join makes the convention
    // data-driven rather than key-arithmetic trusted) AND strictly
    // precede the referee — custkeys start at 0, so without the strict
    // filter customer 0 would refer itself (a self-loop, the degenerate
    // cycle). With it, 0 is the forest's root.
    val edges = cust
      .select(col("c_custkey").as("child"),
        expr(s"c_custkey div $RefFan").as("parent"))
      .filter(col("parent") < col("child"))
      .join(cust.select(col("c_custkey").as("parent")), Seq("parent"))
      .select(col("child"), col("parent"))
      .localCheckpoint(true) // edge-sized; reused by every frontier + root test
    val rootFlag = cust
      .join(edges.select(col("child").as("c_custkey"), lit(1L).as("_has_parent")),
        Seq("c_custkey"), "left")
      .select(col("c_custkey").as("anc_key"),
        when(col("_has_parent").isNull, 1L).otherwise(0L).as("anc_is_root"))
    val spend = t(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("spend_cents"))
    val e2 = edges.select(col("child").as("e_child"), col("parent").as("e_parent"))
    var frontier = edges.select(col("child").as("custkey"),
      col("parent").as("anc_key"), lit(1L).as("depth"))
    var closure = frontier
    for (d <- 2 to ReachDepthCap) {
      frontier = frontier
        .join(e2, frontier("anc_key") === e2("e_child"))
        .select(col("custkey"), col("e_parent").as("anc_key"),
          lit(d.toLong).as("depth"))
      closure = closure.union(frontier)
    }
    closure
      .join(rootFlag, Seq("anc_key"))
      .join(spend, Seq("custkey"), "left")
      .select(col("custkey"), col("anc_key"), col("depth"), col("anc_is_root"),
        coalesce(col("spend_cents"), lit(0L)).as("desc_spend_cents"))
      .orderBy(col("custkey"), col("depth"))
  }

  /** `q60_subtree_rollup`: the hierarchical rollup q58's closure is the
    * spine of — per referrer, the depth-capped subtree's size, deepest
    * hop, and total descendant lifetime spend (the BOM-cost/org-headcount
    * aggregation shape, here "revenue attributable to each referrer's
    * downline within [[ReachDepthCap]] hops", descendant-only: a node's
    * own spend is its parent's business, not its own row's). One
    * grouped aggregate over the closure — the closure is <= cap x
    * |edges| rows, so the rollup costs one dimension-sized shuffle on
    * top of q58's machinery; the oracle rolls up DuckDB's native
    * recursion, so the hash match extends the unrolled≡recursive proof
    * through the aggregation grain. */
  def q60SubtreeRollup(spark: SparkSession, dir: String): DataFrame =
    q58HierarchyReach(spark, dir)
      .groupBy(col("anc_key"), col("anc_is_root"))
      .agg(count(lit(1)).as("n_desc"),
        max(col("depth")).as("max_depth"),
        sum(col("desc_spend_cents")).as("subtree_spend_cents"))
      .orderBy(col("anc_key"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_hierarchy_reach" -> q58HierarchyReach _,
    "q60_subtree_rollup" -> q60SubtreeRollup _,
    "q56_sole_late_supplier" -> q56SoleLateSupplier _,
    "q57_reorder_curve" -> q57ReorderCurve _,
    "q55_rfm_segments" -> q55RfmSegments _,
    "q50_product_margin" -> q50ProductMargin _,
    "q51_important_parts" -> q51ImportantParts _,
    "q52_ship_delay_modes" -> q52ShipDelayModes _,
    "q53_supplier_diversity" -> q53SupplierDiversity _,
    "q54_dominant_supplier" -> q54DominantSupplier _,
    "q45_promo_revenue" -> q45PromoRevenue _,
    "q46_top_supplier" -> q46TopSupplier _,
    "q47_volume_shipping" -> q47VolumeShipping _,
    "q48_market_share" -> q48MarketShare _,
    "q49_returned_items" -> q49ReturnedItems _,
    "q44_late_ship_priority" -> q44LateShipPriority _,
    "q39_big_orders" -> q39BigOrders _,
    "q40_dormant_customers" -> q40DormantCustomers _,
    "q41_disjunctive_revenue" -> q41DisjunctiveRevenue _,
    "q35_min_cost_supplier" -> q35MinCostSupplier _,
    "q36_order_count_dist" -> q36OrderCountDist _,
    "q38_small_qty_revenue" -> q38SmallQtyRevenue _,
    "q1_pricing_summary" -> q1PricingSummary _,
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q5_local_supplier" -> q5LocalSupplier _,
    "q6_forecast_revenue" -> q6ForecastRevenue _,
    "q7_rollup" -> q7Rollup _,
    "q8_pivot" -> q8Pivot _,
    "q9_topn_per_group" -> q9TopNPerGroup _,
    "q10_percentiles" -> q10Percentiles _,
    "q11_anti_semi" -> q11AntiSemi _,
    "q12_sessionize" -> q12Sessionize _)

  // deliberately the NATIVE recursion — WITH RECURSIVE against the
  // engine's unrolled frontier joins: the hash match proves the
  // de-recursion is exact at the depth cap (q58 reports the closure;
  // q60 rolls it up, extending the proof through the aggregation grain)
  private lazy val q58OracleSql: String =
      s"""WITH RECURSIVE edges AS MATERIALIZED (
        | SELECT c.c_custkey AS child, c.c_custkey // $RefFan AS parent
        | FROM customer c
        |  JOIN customer p ON p.c_custkey = c.c_custkey // $RefFan
        | WHERE c.c_custkey // $RefFan < c.c_custkey),
        |anc AS (
        | SELECT child AS custkey, parent AS anc_key,
        |  CAST(1 AS BIGINT) AS depth
        | FROM edges
        | UNION ALL
        | SELECT a.custkey, e.parent, a.depth + 1
        | FROM anc a JOIN edges e ON e.child = a.anc_key
        | WHERE a.depth < $ReachDepthCap),
        |roots AS (
        | SELECT c.c_custkey AS anc_key,
        |  CAST(CASE WHEN e.child IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |   AS anc_is_root
        | FROM customer c LEFT JOIN edges e ON e.child = c.c_custkey),
        |spend AS (
        | SELECT o_custkey AS custkey,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS spend_cents
        | FROM orders GROUP BY 1)
        |SELECT a.custkey, a.anc_key, a.depth, r.anc_is_root,
        | COALESCE(s.spend_cents, 0) AS desc_spend_cents
        |FROM anc a
        | JOIN roots r ON r.anc_key = a.anc_key
        | LEFT JOIN spend s ON s.custkey = a.custkey
        |ORDER BY a.custkey, a.depth""".stripMargin

  val oracle: Map[String, String] = Map(
    "q58_hierarchy_reach" -> q58OracleSql,
    "q60_subtree_rollup" ->
      s"""SELECT anc_key, anc_is_root, CAST(count(*) AS BIGINT) AS n_desc,
         | CAST(max(depth) AS BIGINT) AS max_depth,
         | CAST(sum(desc_spend_cents) AS BIGINT) AS subtree_spend_cents
         |FROM ($q58OracleSql)
         |GROUP BY 1, 2 ORDER BY anc_key""".stripMargin,
    // deliberately the TEXTBOOK Q21 form — correlated EXISTS / NOT
    // EXISTS on l1: hash-matching it proves the one-shuffle pair-grain
    // de-correlation (numwait = DISTINCT orders in both forms)
    "q56_sole_late_supplier" ->
      """SELECT s.s_suppkey, s.s_name, n.n_name,
        | CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
        |FROM supplier s
        | JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        | JOIN orders o ON o.o_orderkey = l1.l_orderkey
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE o.o_orderstatus = 'F'
        | AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        | AND EXISTS (SELECT 1 FROM lineitem l2
        |   WHERE l2.l_orderkey = l1.l_orderkey
        |    AND l2.l_suppkey <> l1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |   WHERE l3.l_orderkey = l1.l_orderkey
        |    AND l3.l_suppkey <> l1.l_suppkey
        |    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1, 2, 3
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,
    "q57_reorder_curve" ->
      s"""WITH seq AS (
        | SELECT o_custkey,
        |  CAST(row_number() OVER w AS BIGINT) AS order_idx,
        |  epoch_us(o_orderdate) // ${86400L * 1000000L} AS day,
        |  lag(epoch_us(o_orderdate) // ${86400L * 1000000L}) OVER w
        |    AS prev_day
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey))
        |SELECT order_idx,
        | CAST(count(*) AS BIGINT) AS n_customers,
        | CAST(COALESCE(sum(day - prev_day), 0) AS BIGINT) AS sum_gap_days,
        | CAST(COALESCE(min(day - prev_day), -1) AS BIGINT) AS min_gap_days,
        | CAST(COALESCE(max(day - prev_day), -1) AS BIGINT) AS max_gap_days,
        | CAST(CASE WHEN order_idx = 1 THEN -1
        |  ELSE COALESCE(sum(day - prev_day), 0) // count(*) END AS BIGINT)
        |  AS avg_gap_days
        |FROM seq GROUP BY 1 ORDER BY 1""".stripMargin,
    "q55_rfm_segments" ->
      """WITH per AS (
        | SELECT o_custkey, max(o_orderdate) AS last_order,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS spend_cents
        | FROM orders GROUP BY 1),
        |b AS (
        | SELECT o_custkey, n_orders, spend_cents,
        |  CAST(datediff('day', last_order, TIMESTAMP '2001-09-01')
        |    AS BIGINT) AS recency_days,
        |  CASE WHEN datediff('day', last_order, TIMESTAMP '2001-09-01') < 200
        |   THEN 'R1' ELSE 'R0' END ||
        |  CASE WHEN n_orders >= 10 THEN 'F1' ELSE 'F0' END ||
        |  CASE WHEN spend_cents >= 250000000 THEN 'M1' ELSE 'M0' END
        |    AS segment
        | FROM per)
        |SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
        | CAST(sum(n_orders) AS BIGINT) AS n_orders,
        | CAST(sum(spend_cents) AS BIGINT) AS spend_cents,
        | CAST(min(recency_days) AS BIGINT) AS min_recency_days,
        | CAST(max(recency_days) AS BIGINT) AS max_recency_days
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // deliberately the TEXTBOOK Q9 form — flat 5-way join with the
    // name LIKE: hash-matching it proves the prune-before-shuffle plan
    "q50_product_margin" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |     AS BIGINT)
        |   - CAST(floor(p_retailprice * 100) AS BIGINT)
        |     * CAST(l_quantity AS BIGINT)) AS BIGINT) AS margin_cents
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%rod%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // deliberately the TEXTBOOK Q11 form — HAVING against a scalar
    // subquery over the same grouped view: hash-matching it proves the
    // broadcast-scalar threshold plan
    "q51_important_parts" ->
      """WITH rev AS (
        | SELECT l_partkey AS p_partkey,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        | FROM lineitem GROUP BY 1)
        |SELECT p_partkey, revenue_cents,
        | CAST(CAST(revenue_cents AS HUGEINT) * 1000000
        |   // (SELECT sum(revenue_cents) FROM rev) AS BIGINT) AS share_e6
        |FROM rev
        |WHERE revenue_cents > (SELECT 3 * sum(revenue_cents) // (2 * count(*))
        |  FROM rev)
        |ORDER BY revenue_cents DESC, p_partkey""".stripMargin,
    // deliberately the TEXTBOOK Q12 form — CASE-bucketed conditional
    // counts: hash-matching it proves the one-pass conditional aggregate
    "q52_ship_delay_modes" ->
      """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30
        |  THEN 'FAST'
        |  WHEN datediff('day', o_orderdate, l_shipdate) < 75 THEN 'MED'
        |  ELSE 'SLOW' END AS ship_tier,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS critical_lines,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS other_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        | AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // deliberately the TEXTBOOK Q16 form — count(DISTINCT) with a NOT IN
    // sub-select: hash-matching it proves the broadcast-semi exclusion
    "q53_supplier_diversity" ->
      """SELECT p_brand, p_type,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13'
        | AND l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier
        |  WHERE CAST(floor(s_acctbal * 100) AS BIGINT)
        |     * (SELECT count(*) FROM supplier)
        |    < (SELECT sum(CAST(floor(s_acctbal * 100) AS BIGINT))
        |       FROM supplier))
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,
    // deliberately the TEXTBOOK Q20 form — a correlated aggregate
    // threshold inside the qualifying subquery: hash-matching it proves
    // the aggregate-then-join-back de-correlation
    "q54_dominant_supplier" ->
      """WITH sq AS (
        | SELECT l_partkey, l_suppkey,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_name LIKE '%widget%'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        | GROUP BY 1, 2),
        |dom AS (
        | SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_dominant_parts,
        |  CAST(sum(sq) AS BIGINT) AS dominant_qty
        | FROM sq a
        | WHERE 2 * sq > (SELECT sum(sq) FROM sq b
        |   WHERE b.l_partkey = a.l_partkey)
        | GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name, n_dominant_parts, dominant_qty
        |FROM dom JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "q45_promo_revenue" ->
      """WITH l AS (
        | SELECT l_partkey,
        |  CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_c
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate < TIMESTAMP '1995-10-01'),
        |a AS (
        | SELECT
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev_c ELSE 0 END)
        |    AS BIGINT) AS promo_cents,
        |  CAST(sum(rev_c) AS BIGINT) AS total_cents
        | FROM l JOIN part ON l_partkey = p_partkey)
        |SELECT promo_cents, total_cents,
        | CAST(CAST(promo_cents AS HUGEINT) * 1000000 // total_cents AS BIGINT)
        |  AS promo_share_e6
        |FROM a""".stripMargin,
    // deliberately the TEXTBOOK Q15 form — revenue view + scalar max
    // subquery: hash-matching it proves the broadcast-argmax plan
    "q46_top_supplier" ->
      """WITH revenue AS (
        | SELECT l_suppkey,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, revenue_cents
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE revenue_cents = (SELECT max(revenue_cents) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    // deliberately the TEXTBOOK Q7 form — flat join with the
    // nation-pair disjunction: hash-matching it proves the
    // prune-before-shuffle rewrite
    "q47_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
        |  OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
        | AND l_shipdate >= TIMESTAMP '1996-01-01'
        | AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    // deliberately the TEXTBOOK Q8 form — all-nations volume with a
    // CASE share: hash-matching it proves the one-pass conditional
    // aggregate
    "q48_market_share" ->
      """WITH vol AS (
        | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    AS rev_c,
        |  n1.n_name AS supp_nation
        | FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        | WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_year,
        | CAST(sum(CASE WHEN supp_nation = 'NATION_18' THEN rev_c ELSE 0 END)
        |   AS BIGINT) AS nation_cents,
        | CAST(sum(rev_c) AS BIGINT) AS total_cents,
        | CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_18' THEN rev_c
        |     ELSE 0 END) AS HUGEINT) * 1000000 // sum(rev_c) AS BIGINT)
        |   AS mkt_share_e6
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,
    // deliberately the TEXTBOOK Q10 form — line-grain join then a
    // customer-grain aggregate: hash-matching it proves the
    // aggregate-before-customer-attach rewrite
    "q49_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-10-01'
        | AND o_orderdate < TIMESTAMP '1996-01-01'
        | AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // deliberately the TEXTBOOK Q4 form — a correlated EXISTS whose
    // predicate spans both tables: hash-matching it proves the
    // semi-join-with-inequality de-correlation
    "q44_late_ship_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q39_big_orders" ->
      """WITH big AS (
        | SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        | FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        | CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        | total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    // deliberately the TEXTBOOK Q22 form — scalar AVG subquery plus a
    // correlated NOT EXISTS: hash-matching it proves the anti-join +
    // broadcast-threshold de-correlation
    "q40_dormant_customers" ->
      """WITH c AS (
        | SELECT c_custkey, c_nationkey,
        |  CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
        | FROM customer),
        |p AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s,
        |  CAST(count(*) AS BIGINT) AS n FROM c WHERE bal_c > 0)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
        | CAST(sum(bal_c) AS BIGINT) AS sum_bal_cents
        |FROM c JOIN nation ON c_nationkey = n_nationkey, p
        |WHERE c.bal_c * p.n > p.s
        | AND NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |   AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // the OR blocks stated directly over the join — no quantity envelope:
    // hash-matching proves the explicit scan-bound conjunct is redundant
    "q41_disjunctive_revenue" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_li,
        | CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |   AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
        |   AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 50
        |   AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    // deliberately the TEXTBOOK Q2 form — a correlated scalar subquery
    // per part: hash-matching it proves the window-min de-correlation
    "q35_min_cost_supplier" ->
      """WITH eu AS (
        | SELECT s_suppkey, s_name, n_name
        | FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'EUROPE'),
        |off AS (
        | SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
        |  CAST(min(floor(l_extendedprice * 100)) AS BIGINT) AS offer_cents
        | FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN eu ON l_suppkey = s_suppkey
        | GROUP BY 1, 2, 3, 4, 5)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, offer_cents
        |FROM off o
        |WHERE offer_cents = (SELECT min(o2.offer_cents) FROM off o2
        |  WHERE o2.p_partkey = o.p_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q36_order_count_dist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        | SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        | FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        | GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // deliberately the TEXTBOOK Q17 form — per-row correlated scalar
    // subqueries for the part's own count/sum: hash-matching it proves
    // the single-shuffle window de-correlation
    "q38_small_qty_revenue" ->
      """WITH j AS (
        | SELECT p_partkey, p_name, CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
        | FROM lineitem JOIN part ON p_partkey = l_partkey
        | WHERE p_brand = 'Brand#1'),
        |t AS (
        | SELECT j.*,
        |  (SELECT CAST(count(*) AS BIGINT) FROM j i
        |   WHERE i.p_partkey = j.p_partkey) AS n_li,
        |  (SELECT CAST(sum(qty) AS BIGINT) FROM j i
        |   WHERE i.p_partkey = j.p_partkey) AS sum_qty
        | FROM j)
        |SELECT p_partkey, p_name, n_li, sum_qty * 100 // n_li AS avg_qty_e2,
        | CAST(sum(CASE WHEN qty * 5 * n_li < sum_qty THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_small,
        | CAST(sum(CASE WHEN qty * 5 * n_li < sum_qty THEN price_c ELSE 0 END)
        |   AS BIGINT) AS small_revenue_cents
        |FROM t GROUP BY p_partkey, p_name, n_li, sum_qty
        |ORDER BY p_partkey""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o_orderkey,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin,
    "q7_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        | count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""".stripMargin,
    "q8_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS v_click,
        | round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS v_error,
        | round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS v_purchase,
        | round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS v_signup,
        | round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS v_view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q9_topn_per_group" ->
      """SELECT p_brand, rn, p_partkey, p_name, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_name, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        | FROM part) WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "q10_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_anti_semi" ->
      """SELECT n_name, count(*) AS n_customers, count(o_custkey) AS with_orders,
        | count(*) - count(o_custkey) AS without_orders
        |FROM customer
        | LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o ON c_custkey = o_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q12_sessionize" ->
      """WITH e AS (
        | SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |       WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        | FROM e)
        |SELECT user_id, session_id, count(*) AS n_events, min(ts_us) AS start_us,
        | max(ts_us) - min(ts_us) AS duration_us, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)
}
