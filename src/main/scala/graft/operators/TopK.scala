package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col
import graft.Tables

/** Bounded-heap per-group top-k as a typed Aggregator.
  *
  * The window formulation of top-N (`row_number over (partition by g order
  * by v) <= k`, q9) must shuffle and SORT every row of every group. This
  * aggregator keeps only k rows of state per group and Spark runs it with
  * map-side partial aggregation — each task reduces its local rows to k
  * before the shuffle, so the exchange carries `groups x k` rows instead
  * of the whole table. Same result, bounded memory, shuffle shrunk by the
  * group fan-in — the formulation that survives 100 TB.
  */
object TopK {

  final case class PartRow(p_brand: String, p_partkey: Long, p_name: String, p_retailprice: Double)
  final case class RankedPart(p_brand: String, rn: Long, p_partkey: Long, p_name: String, p_retailprice: Double)

  /** Keep the k smallest elements under `lt` (pass the inverted comparison
    * for top-by-descending). Buffer is a sorted Seq bounded at k. */
  class TopKAggregator[T](k: Int, lt: (T, T) => Boolean)(
      implicit bufEnc: Encoder[Seq[T]], outEnc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {

    private def trim(xs: Seq[T]): Seq[T] = xs.sortWith(lt).take(k)
    override def zero: Seq[T] = Seq.empty
    override def reduce(b: Seq[T], a: T): Seq[T] =
      if (b.length == k && lt(b.last, a)) b else trim(b :+ a)
    override def merge(b1: Seq[T], b2: Seq[T]): Seq[T] = trim(b1 ++ b2)
    override def finish(b: Seq[T]): Seq[T] = b
    override def bufferEncoder: Encoder[Seq[T]] = bufEnc
    override def outputEncoder: Encoder[Seq[T]] = outEnc
  }

  /** `q16_topk_agg`: q9's top-3-parts-per-brand computed through the
    * bounded aggregator instead of a window — identical output, map-side
    * partial top-k (same DuckDB oracle as q9). */
  def q16TopkAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_name"), col("p_retailprice"))
      .as[PartRow]
    val byPriceDesc: (PartRow, PartRow) => Boolean = (a, b) =>
      a.p_retailprice > b.p_retailprice ||
        (a.p_retailprice == b.p_retailprice && a.p_partkey < b.p_partkey)
    val agg = new TopKAggregator[PartRow](3, byPriceDesc)
    parts.groupByKey(_.p_brand)
      .agg(agg.toColumn.name("top"))
      .flatMap { case (_, top) =>
        top.zipWithIndex.map { case (p, i) =>
          RankedPart(p.p_brand, i + 1L, p.p_partkey, p.p_name, p.p_retailprice)
        }
      }
      .toDF()
      .orderBy(col("p_brand"), col("rn"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_topk_agg" -> (q16TopkAgg _))

  /** Same oracle as the window formulation — both must produce the same rows. */
  val oracle: Map[String, String] = Map(
    "q16_topk_agg" ->
      """SELECT p_brand, rn, p_partkey, p_name, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_name, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        | FROM part) WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin)
}
