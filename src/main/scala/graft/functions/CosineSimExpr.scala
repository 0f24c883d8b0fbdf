package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * One fused loop computes the dot product and both squared norms with
  * sequential double accumulation — the SAME IEEE operation sequence as the
  * declarative `aggregate(zip_with(...))` formulation and the DuckDB oracle
  * (`list_sum(list_transform(list_zip(...)))`), so results are
  * bit-identical; it just skips the per-pair ArrayData allocations the
  * higher-order functions pay (one zip array + one fold per term), which is
  * what makes all-pairs similarity CPU-bound at scale.
  */
case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  // callers pass array<float> columns; no implicit coercions needed
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // getFloat on any other element type silently reads garbage slots —
  // reject at analysis time (AbstractDataType/ExpectsInputTypes are
  // private[sql], so the shared helper checks each side directly)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Seq(left, right).map(e => VectorTypeCheck.requireFloatArray(prettyName, e.dataType))
      .find(_.isFailure)
      .getOrElse(org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)

  // mismatched lengths yield null (see below), independent of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // declarative parity: zip_with null-pads the shorter array, the padded
    // Cast(null)*... poisons the fold, and the division returns null — so
    // mismatched lengths MUST be null here too, not a truncated cosine
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
