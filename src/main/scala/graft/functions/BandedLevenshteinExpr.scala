package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded (banded) Levenshtein distance: exact edit distance when it
  * is at most `tau = max(len_a, len_b) / den` (integer floor), `-1`
  * otherwise — the confirm predicate of `d10_dedup_fuzzy`
  * (`den * dist <= max_len  <=>  dist <= tau`) fused into the distance
  * computation itself.
  *
  * Why not `levenshtein(a, b)`: the built-in fills the full O(n·m) DP
  * matrix per pair. d10 only ever ASKS "is dist <= max_len/den" — for a
  * near-dup threshold of 1/den, the classic Ukkonen band of width
  * `2·tau + 1` around the diagonal answers that in O(n·tau) work: cells
  * farther than tau from the diagonal cost more than tau edits by
  * construction and can never participate in a passing alignment. At a
  * fixed den this turns the per-candidate confirm from quadratic to
  * linear in document length — the difference between a confirm pass
  * that holds at 100 TB document sizes and one that doesn't. Two extra
  * prunes come free: a length gap > tau refutes the pair before any DP,
  * and a band row whose minimum exceeds tau refutes it mid-DP (DP values
  * never decrease down rows).
  *
  * Distance semantics are IDENTICAL to `levenshtein()` on the surviving
  * range (unit = Unicode code point, matching both Spark's
  * `UTF8String.levenshteinDistance` and DuckDB's `levenshtein`);
  * `DedupSimilaritySpec` pins banded == built-in on planted edge cases
  * and on every corpus candidate pair. Null in either side → null, like
  * the built-in.
  */
case class BandedLevenshteinExpr(left: Expression, right: Expression, den: Int)
    extends BinaryExpression {
  require(den >= 1, s"den must be positive, got $den")

  override def dataType: DataType = LongType
  override def prettyName: String = "banded_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two strings, got ${l.catalogString}, ${r.catalogString}")
    }

  /** Shared by interpreted and generated paths. Returns the exact edit
    * distance if <= max(n, m)/den, else -1. */
  def computeDist(a: UTF8String, b: UTF8String): Long = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val n = s.length
    val m = t.length
    val tau = math.max(n, m) / den
    if (math.abs(n - m) > tau) return -1L
    if (n == 0) return m.toLong // m = |n-m| <= tau here
    if (m == 0) return n.toLong
    val INF = Int.MaxValue >> 1
    var p = new Array[Int](m + 1)
    var c = new Array[Int](m + 1)
    java.util.Arrays.fill(p, INF)
    java.util.Arrays.fill(c, INF)
    var j = 0
    val hi0 = math.min(m, tau)
    while (j <= hi0) { p(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - tau)
      val hi = math.min(m, i + tau)
      // cells outside [lo-1, hi+1] are never read for this row or the
      // next: seed the band edges instead of refilling the whole array
      var rowMin = INF
      if (lo == 1) { c(0) = i; rowMin = i } else c(lo - 1) = INF
      val si = s(i - 1)
      var jj = lo
      while (jj <= hi) {
        var v = p(jj - 1) + (if (si == t(jj - 1)) 0 else 1)
        val del = p(jj) + 1
        if (del < v) v = del
        val ins = c(jj - 1) + 1
        if (ins < v) v = ins
        c(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (hi + 1 <= m) c(hi + 1) = INF
      if (rowMin > tau) return -1L // DP values never decrease down rows
      val tmp = p; p = c; c = tmp
      i += 1
    }
    val d = p(m)
    if (d > tau) -1L else d.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    computeDist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("self", this, classOf[BandedLevenshteinExpr].getName)
      s"${ev.value} = $self.computeDist($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
