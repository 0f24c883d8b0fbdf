package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Designed for a multi-executor cluster but tested on local[N]: AQE handles
  * runtime partition coalescing and skew-join splitting, so the static
  * `shuffle.partitions` is a ceiling, not a schedule. All timestamps are UTC
  * to keep parity with the DuckDB oracle.
  */
object GraftSession {
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession =
    tune(SparkSession.builder().master(s"local[$cores]"), shufflePartitions)
      .getOrCreate()

  /** Apply engine defaults to any builder (cluster or local). */
  def tune(b: SparkSession.Builder, shufflePartitions: Int = 32): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // runtime bloom-filter semi-join reduction: a selective filter on one
    // join side prunes the other side's scan before the shuffle
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")
}
