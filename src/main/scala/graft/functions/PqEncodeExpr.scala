package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Product-quantization encoder: an e6-fixed-point vector (array<long>,
  * numSub*subDim elements) → its `numSub` nearest-centroid codes, one
  * fused pass with the codebook attached as a BROADCAST model handle
  * (a closure-inlined codebook re-ships with every task binary; the
  * handle ships ~100 bytes and resolves once per executor — the MLlib
  * model-distribution pattern, same rationale as `MatrixExprs`).
  *
  * Semantics are exactly the declarative struct-array-min form kept in
  * `Similarity.pqCodeColSlow` (asserted bit-identical in PlanSpec):
  * per subspace j, code = argmin over centroids of the exact integer L2
  * distance on the e6 grid, ties to the smaller code. The declarative
  * form expands to numSub × k × subDim expression nodes (1024 at 8×16×8),
  * which overflows Janino's 64 KB method limit and drops the whole
  * projection out of codegen; this expression keeps the scan compiled
  * and does the arithmetic in three tight loops.
  */
case class PqEncodeExpr(child: Expression,
    booksBc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Long]]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val books: Array[Array[Array[Long]]] = booksBc.value
  @transient private lazy val numSub = books.length
  @transient private lazy val subDim = if (numSub > 0) books(0)(0).length else 0

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> fixed-point input, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  /** Shared by interpreted and generated paths. A vector shorter than
    * numSub*subDim yields NULL — the repo's length-mismatch convention
    * (cosineFast, and the declarative element_at-past-the-end form both
    * fail visibly); an unchecked getLong on UnsafeArrayData would read
    * off-heap garbage silently. */
  def computeCodes(f: ArrayData): ArrayData = {
    if (f.numElements() < numSub * subDim) return null
    val out = new Array[Long](numSub)
    var j = 0
    while (j < numSub) {
      val book = books(j)
      val base = j * subDim
      var bestCode = 0
      var bestDist = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dist = 0L
        var d = 0
        while (d < subDim) {
          val diff = f.getLong(base + d) - cent(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; bestCode = c } // strict: tie keeps min c
        c += 1
      }
      out(j) = bestCode.toLong
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    computeCodes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("self", this, classOf[PqEncodeExpr].getName)
      s"""
         |${ev.value} = $self.computeCodes($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
