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

  /** Code points in `u`: the count of non-continuation bytes. Zero-copy —
    * no String materialization, no boxed stream. */
  private def countCodePoints(u: UTF8String): Int = {
    val nb = u.numBytes()
    var off = 0
    var cnt = 0
    while (off < nb) {
      off += UTF8String.numBytesForFirstByte(u.getByte(off))
      cnt += 1
    }
    cnt
  }

  /** Decode the UTF-8 code point starting at byte `off`. A multi-byte
    * sequence truncated at the string's end decodes as U+FFFD instead of
    * reading past `numBytes()` — Spark never validates StringType bytes
    * (a binary column cast to string can carry anything), and
    * `getByte` past the end is an unchecked off-heap read: the result
    * would be nondeterministic adjacent memory, not just a wrong
    * character. Interior malformed bytes still decode bitwise (garbage
    * in, deterministic garbage out), which is all the distance contract
    * needs. */
  private def codePointAt(u: UTF8String, off: Int): Int = {
    val b0 = u.getByte(off)
    val len = UTF8String.numBytesForFirstByte(b0)
    if (off + len > u.numBytes()) return 0xFFFD // truncated tail sequence
    len match {
      case 1 => b0 & 0x7f
      case 2 => ((b0 & 0x1f) << 6) | (u.getByte(off + 1) & 0x3f)
      case 3 => ((b0 & 0x0f) << 12) | ((u.getByte(off + 1) & 0x3f) << 6) |
        (u.getByte(off + 2) & 0x3f)
      case _ => ((b0 & 0x07) << 18) | ((u.getByte(off + 1) & 0x3f) << 12) |
        ((u.getByte(off + 2) & 0x3f) << 6) | (u.getByte(off + 3) & 0x3f)
    }
  }

  /** Shared by interpreted and generated paths. Returns the exact edit
    * distance if <= max(n, m)/den, else -1.
    *
    * Allocation discipline (this is the d10 confirm hot path): the longer
    * side streams its code points straight off the UTF8String bytes (a
    * cursor, no array), only the SHORTER side materializes as an int
    * array, and the two rolling DP rows are band-width (2·tau+3) arrays
    * under a diagonal slot mapping (`slot = j - i + tau + 1`), not
    * length-width — per-pair allocation is O(min_len + tau), so the
    * O(n·tau) time bound is matched by the memory bound instead of being
    * undercut by O(n+m) scratch per row pair. */
  def computeDist(a: UTF8String, b: UTF8String): Long = {
    val na = countCodePoints(a)
    val nb = countCodePoints(b)
    // Levenshtein is symmetric: stream the longer side, materialize the
    // shorter. tau depends only on max(len), unchanged by the swap.
    val (sStr, n, tStr, m) =
      if (na >= nb) (a, na, b, nb) else (b, nb, a, na)
    val tau = n / den
    if (n - m > tau) return -1L
    if (m == 0) return n.toLong // n <= tau from the gap refute
    val t = new Array[Int](m)
    var off = 0
    var k = 0
    while (k < m) {
      t(k) = codePointAt(tStr, off)
      off += UTF8String.numBytesForFirstByte(tStr.getByte(off))
      k += 1
    }
    val INF = Int.MaxValue >> 1
    // diagonal slot mapping: column j of row i lives at slot j-i+tau+1
    // (in [1, 2·tau+1] inside the band); slots 0 and 2·tau+2 are the
    // out-of-band edges. In the previous row's frame the same j sits one
    // slot higher, so reads are p(slot)/p(slot+1)/c(slot-1) — all in
    // bounds by construction.
    val W = 2 * tau + 3
    var p = new Array[Int](W)
    var c = new Array[Int](W)
    java.util.Arrays.fill(p, INF)
    java.util.Arrays.fill(c, INF)
    var j = 0
    val hi0 = math.min(m, tau)
    while (j <= hi0) { p(j + tau + 1) = j; j += 1 } // row 0: slot = j+tau+1
    var sOff = 0
    var i = 1
    while (i <= n) {
      val si = codePointAt(sStr, sOff)
      sOff += UTF8String.numBytesForFirstByte(sStr.getByte(sOff))
      val lo = math.max(1, i - tau)
      val hi = math.min(m, i + tau)
      var rowMin = INF
      // seed this row's left edge: column 0 when in band, else the
      // out-of-band slot 0 (read as c(j-1) when j = lo = i-tau)
      if (lo == 1) { c(tau + 1 - i) = i; rowMin = i } else c(0) = INF
      var jj = lo
      while (jj <= hi) {
        val sc = jj - i + tau + 1
        var v = p(sc) + (if (si == t(jj - 1)) 0 else 1)
        val del = p(sc + 1) + 1
        if (del < v) v = del
        val ins = c(sc - 1) + 1
        if (ins < v) v = ins
        c(sc) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      // right edge: column hi+1 is out of this row's band but is read as
      // p(j) by the next row when its window reaches it
      if (hi + 1 <= m) c(hi + 1 - i + tau + 1) = INF
      if (rowMin > tau) return -1L // DP values never decrease down rows
      val tmp = p; p = c; c = tmp
      i += 1
    }
    val d = p(m - n + tau + 1) // column m in row n's frame
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
