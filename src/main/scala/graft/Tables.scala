package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the engine's star-schema + LLM-data tables (one parquet each).
  *
  * Mirrors the reference's table registry (raw/staging/curation datasets in
  * `/root/reference/dags/config/pipeline_config.yaml:42-46`) as a flat
  * parquet lakehouse: the scan is columnar, filter-pushdown-able, and
  * splittable, so every downstream operator starts from a pruned scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects; read it as long nanos and surface a microsecond timestamp
    // (matching DuckDB, whose TIMESTAMP truncates nanos to micros).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // integer div: ts is ~1e18, float division would lose microseconds
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }
}
