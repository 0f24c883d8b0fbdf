package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

private[functions] object VectorTypeCheck {
  /** Both expressions read elements with getFloat — any other element
    * type would silently read garbage 4-byte slots from UnsafeArrayData,
    * so reject it at analysis time. */
  def requireFloatArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float>, got ${other.catalogString}")
  }
}

/** Fused "vector vs. model matrix" expressions for the full-corpus scans
  * (LSH bucketing, IVF cell assignment) where the per-row work used to be N
  * separate `aggregate(zip_with(...))` higher-order folds — each paying a
  * zip-array allocation plus a lambda-dispatch fold per term. At 100 TB the
  * bucketing/assignment projection IS the scan, so its per-row constant
  * factor multiplies directly into cluster-hours; these run the same IEEE
  * operation sequence as the declarative form (and the DuckDB oracle's
  * `list_sum(list_transform(list_zip(...)))`) in one codegen'd loop nest
  * with zero allocations (one primitive array for the cosine case).
  *
  * The model matrix travels as a BROADCAST HANDLE, not an inline literal:
  * an expression-embedded array serializes into every task closure (the
  * "Broadcasting large task binary" wall once the model is real — 65k
  * centroids × 768 dims is ~400 MB of closure), while a `Broadcast` ships
  * a ~100-byte handle per task and materializes the matrix once per
  * executor via the block manager — the MLlib model-distribution pattern.
  * Each generated class caches `bc.value()` in a mutable-state field at
  * instance init, so the per-row loop reads a plain local `double[][]`.
  */

/** All-planes hyperplane sign bucket in one pass: bit p of the result is
  * set iff `emb · planes(p)` > 0. Identical bit semantics to summing
  * per-plane `CASE WHEN dot > 0 THEN 1<<p ELSE 0 END` terms (disjoint bits:
  * `+` ≡ `|`): per-plane dots accumulate sequentially in doubles from 0.0,
  * and a length-mismatched plane contributes no bit — the declarative
  * `zip_with` null-pads, the fold poisons to null, and `WHEN null > 0`
  * takes the ELSE branch. Callers never pass null embeddings (parquet
  * schema is non-null), so UnaryExpression's default null-propagation is
  * academic. */
case class HyperplaneBucketExpr(child: Expression, planesBc: Broadcast[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.requireFloatArray(prettyName, child.dataType)

  @transient private lazy val planes: Array[Array[Double]] = planesBc.value

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      if (plane.length == n) {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += x.getFloat(i).toDouble * plane(i); i += 1 }
        if (dot > 0) acc |= 1L << p
      }
      p += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("planesBc", planesBc,
      "org.apache.spark.broadcast.Broadcast")
    // resolved once per generated-class instance, not per row
    val m = ctx.addMutableState("double[][]", "hpPlanes",
      v => s"$v = (double[][]) $bc.value();")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $p = 0; $p < $m.length; $p++) {
         |  if ($m[$p].length == $n) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += (double) $a.getFloat($i) * $m[$p][$i];
         |    }
         |    if ($dot > 0) $acc |= 1L << $p;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine of `emb` against every row of a broadcast centroid matrix, in one
  * pass: result(c) = dot(emb, matrix(c)) / (l2(emb) * l2(matrix(c))).
  * The embedding norm is computed ONCE per row (the declarative per-centroid
  * form recomputed it k times) and the centroid norms once per executor at
  * instance init — both with the same sequential double fold as
  * `VectorFunctions.l2` and the oracle's `sqrt(list_sum(...))`, so every
  * cosine is bit-identical to the unfused `cosine(emb, lit(centroid))`.
  * Whole result is null if the embedding's length doesn't match the matrix
  * width (never happens with the fixed-Dim tables; declared for totality). */
case class CosineMatrixExpr(child: Expression, matrixBc: Broadcast[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cosine_matrix"
  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Double]] = matrixBc.value

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.requireFloatArray(prettyName, child.dataType)

  /** sqrt(sum of squares) per centroid, same IEEE fold order as l2(). */
  @transient private lazy val norms: Array[Double] = matrix.map { c =>
    var nb = 0.0
    var i = 0
    while (i < c.length) { nb += c(i) * c(i); i += 1 }
    math.sqrt(nb)
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (matrix.exists(_.length != n)) return null
    var na = 0.0
    var i = 0
    while (i < n) { val xi = x.getFloat(i).toDouble; na += xi * xi; i += 1 }
    val sna = math.sqrt(na)
    val out = new Array[Double](matrix.length)
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      var dot = 0.0
      i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * cent(i); i += 1 }
      out(c) = dot / (sna * norms(c))
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("matrixBc", matrixBc,
      "org.apache.spark.broadcast.Broadcast")
    // matrix + norms resolved once per generated-class instance; norms use
    // the SAME sequential fold as the interpreted path (bit parity)
    val m = ctx.addMutableState("double[][]", "cmMatrix",
      v => s"$v = (double[][]) $bc.value();")
    val nrm = ctx.addMutableState("double[]", "cmNorms",
      v =>
        s"""$v = new double[$m.length];
           |for (int c = 0; c < $m.length; c++) {
           |  double nb = 0.0;
           |  for (int i = 0; i < $m[c].length; i++) { nb += $m[c][i] * $m[c][i]; }
           |  $v[c] = java.lang.Math.sqrt(nb);
           |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val na = ctx.freshName("na")
      val sna = ctx.freshName("sna")
      val xi = ctx.freshName("xi")
      val vals = ctx.freshName("vals")
      val dot = ctx.freshName("dot")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |boolean $ok = true;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  if ($m[$c].length != $n) $ok = false;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $na = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    $na += $xi * $xi;
         |  }
         |  double $sna = java.lang.Math.sqrt($na);
         |  double[] $vals = new double[$m.length];
         |  for (int $c = 0; $c < $m.length; $c++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += (double) $a.getFloat($i) * $m[$c][$i];
         |    }
         |    $vals[$c] = $dot / ($sna * $nrm[$c]);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
