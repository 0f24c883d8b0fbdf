package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side of the lakehouse: layout-aware sinks.
  *
  * The reference lands curated tables as date-partitioned datasets
  * (BigQuery partitioned tables via its dbt model); here that is parquet
  * with hive-style partitioning plus optional bucketing:
  *
  *  - partitionBy(year, month): partition PRUNING makes time-ranged scans
  *    touch only the matching directories — the #1 lever at 100 TB;
  *  - bucketBy(key): co-locates both sides of a recurring keyed join so it
  *    runs shuffle-free (bucketed SortMergeJoin);
  *  - maxRecordsPerFile bounds file sizes so a 1000-executor write neither
  *    produces 1e6 tiny files nor 100 GB monoliths.
  */
object Sinks {

  /** Date-partitioned parquet: `dir/part_year=YYYY/part_month=M/...`. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, dir: String,
                           maxRecordsPerFile: Long = 5000000L): Unit =
    df.withColumn("part_year", year(col(tsCol)))
      .withColumn("part_month", month(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("part_year", "part_month")
      .parquet(dir)

  /** Bucketed managed table: subsequent equi-joins on `bucketCol` between
    * tables bucketed the same way skip the shuffle entirely.
    *
    * The write must survive a PRIOR JVM's leftovers: the in-memory
    * catalog dies with its session but the managed table's warehouse dir
    * does not, and `saveAsTable` refuses to adopt an orphan location
    * (LOCATION_ALREADY_EXISTS — the second `graft.Verify` run of a round
    * would fail p29 on it). Drop any registered table first, then clear
    * the orphan dir. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int = 16): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Ask the catalog where the managed table WOULD land rather than
    // string-building `<warehouse>/<table>` — that layout only holds for
    // the default database (non-default dbs use `<db>.db/<table>`, Hive
    // catalogs their own scheme), and a missed orphan dir resurrects the
    // LOCATION_ALREADY_EXISTS failure this pre-delete exists to prevent.
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read back a partitioned dataset; filters on the partition columns
    * prune directories before any IO (assert via explain: PartitionFilters). */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Schema-evolution read: union the schemas of all files (new columns
    * null-filled for old files) — how the raw zone absorbs upstream schema
    * drift without a migration. */
  def readMergedSchema(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Z-ordered write: range-partition on the Morton key, sort each file
    * by it, land AT MOST `nFiles` files (range sampling can merge splits
    * when distinct zkey values — or the sampler's chosen bounds — are
    * fewer than `nFiles`; the shipped corpus lands exactly `nFiles`, and
    * `SourcesSpec` pins that corpus-level count) — the WRITE path of the p12
    * layout audit. Because files cover disjoint contiguous zkey ranges,
    * file-level parquet min/max stats are tight in BOTH interleaved
    * dimensions, so a predicate on EITHER column skips most files (the
    * lakehouse OPTIMIZE ZORDER behavior, expressed as plain Spark
    * primitives). Caller supplies the zkey column (e.g.
    * `PipelineQueries.zkeyedOrders`). */
  def writeZordered(df: DataFrame, zCol: String, dir: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Small-files compactor: rewrite a dataset into ~`targetBytes` files.
    * A streaming sink or a 1000-task write leaves thousands of small files
    * whose per-file open/footer cost dominates later scans; periodic
    * compaction is standard lakehouse hygiene. Returns the new file count. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    val totalBytes = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val tmp = dir.stripSuffix("/") + "_compacting"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dir))
    nFiles
  }
}
