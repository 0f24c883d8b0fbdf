package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Built on Spark's higher-order array functions (`zip_with` + `aggregate`),
  * which are codegen'd Catalyst expressions — no UDF, no serialization, and
  * the accumulation is a sequential double fold so the result is
  * bit-identical to the DuckDB oracle's list_transform+list_sum rendering.
  */
object VectorFunctions {

  /** Model matrices ship as broadcast handles (once per executor via the
    * block manager), never as expression-embedded literals that would
    * re-serialize into every task closure — built here on the driver at
    * plan-construction time, where a session is always active. */
  private def broadcastModel[T: scala.reflect.ClassTag](model: T)
      : org.apache.spark.broadcast.Broadcast[T] =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(model)

  /** Dot product with double accumulation (floats are widened per element
    * before multiply, matching CAST(x AS DOUBLE)*CAST(y AS DOUBLE)). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (declarative higher-order-function form). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Cosine similarity via the native codegen'd [[CosineSimExpr]] —
    * bit-identical to [[cosine]] (same IEEE accumulation order) but one
    * fused loop with zero per-row allocations. Use in pairwise hot paths. */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Sign bucket of 'embedding · plane' hyperplane tests: bit p is set iff
    * the dot with plane p is positive. One fused codegen loop over the
    * whole plane matrix ([[HyperplaneBucketExpr]]) — bit-identical to the
    * declarative per-plane `when(dot > 0, 1L << p)` sum
    * ([[hyperplaneBucketSlow]]), minus its per-plane zip/fold allocations. */
  def hyperplaneBucket(emb: Column, planes: Seq[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      HyperplaneBucketExpr(ColumnBridge.expression(emb), broadcastModel(planes.toArray)))
  }

  /** Declarative HOF form of [[hyperplaneBucket]] — kept as the spec's
    * bit-parity baseline only. */
  def hyperplaneBucketSlow(emb: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(emb, planeCol) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Cosine of `emb` against every row of a literal matrix, fused into one
    * codegen pass with the embedding norm hoisted ([[CosineMatrixExpr]]) —
    * element c is bit-identical to `cosine(emb, lit-array of matrix(c))`. */
  def cosineMatrix(emb: Column, matrix: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      CosineMatrixExpr(ColumnBridge.expression(emb), broadcastModel(matrix)))
  }

  /** PQ codes of an e6-fixed-point vector under `books`, one fused pass
    * ([[PqEncodeExpr]]) — the declarative argmin form overflows Janino's
    * 64 KB method limit at 8×16×8 and knocks the scan out of codegen. */
  def pqEncode(f: Column, books: Array[Array[Array[Long]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(f), broadcastModel(books)))
  }
}
