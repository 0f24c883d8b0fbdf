package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `|distinct(a) ∩ distinct(b)|` of two long arrays in one fused pass —
  * bit-identical to `size(array_intersect(a, b))` (asserted in PlanSpec),
  * without materializing the intersection ARRAY that only gets size()'d
  * and thrown away.
  *
  * This is the Jaccard confirm phase's inner loop: it runs once per
  * CANDIDATE PAIR (~10^5 per sf0.1 run, unbounded at corpus scale), and
  * `ArrayIntersect` pays, per evaluation, a generic hash set plus a
  * result-array allocation plus the outer `size()` projection. Here the
  * build side is the SMALLER array in an open-addressing long set
  * (primitive, linear probing, sized once — no boxing, no growth), the
  * larger side probes, and a second set de-duplicates probe hits so a
  * duplicated value counts once, exactly `array_intersect`'s distinct
  * semantics (per-doc shingle arrays are already distinct, but a 60-bit
  * collision could in principle duplicate — semantics must not depend on
  * that).
  *
  * Null handling: the inputs are built by expressions that never emit
  * null elements (`containsNull = false` upstream), but if an element
  * slot IS null (schema says possible after joins), it is skipped —
  * `array_intersect` keeps null∩null, so callers must not feed
  * null-element arrays; the repo's arrays cannot contain them.
  */
case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  /** Minimal open-addressing long set: power-of-2 capacity fixed at
    * construction (load factor <= 0.5, so probes terminate), 0 tracked
    * out-of-band as the empty-slot sentinel. */
  private final class LongSet(forElems: Int) {
    private val cap = {
      var c = 8
      while (c < forElems * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val slots = new Array[Long](cap)
    private var hasZero = false

    private def idx(v: Long): Int = {
      // Stafford mix13 finalizer — avalanche so linear probing stays O(1)
      var h = v * 0xbf58476d1ce4e5b9L
      h ^= h >>> 32
      (h & mask).toInt
    }

    /** true iff v was not present. */
    def add(v: Long): Boolean = {
      if (v == 0L) { val fresh = !hasZero; hasZero = true; fresh }
      else {
        var i = idx(v)
        while (slots(i) != 0L) {
          if (slots(i) == v) return false
          i = (i + 1) & mask
        }
        slots(i) = v
        true
      }
    }

    def contains(v: Long): Boolean = {
      if (v == 0L) hasZero
      else {
        var i = idx(v)
        while (slots(i) != 0L) {
          if (slots(i) == v) return true
          i = (i + 1) & mask
        }
        false
      }
    }
  }

  /** Shared by interpreted and generated paths. */
  def computeCount(a0: ArrayData, b0: ArrayData): Long = {
    // build from the smaller side: set memory ~ min(|a|,|b|)
    val (a, b) = if (a0.numElements() <= b0.numElements()) (a0, b0) else (b0, a0)
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0L
    val build = new LongSet(na)
    var i = 0
    while (i < na) {
      if (!a.isNullAt(i)) build.add(a.getLong(i))
      i += 1
    }
    val seen = new LongSet(na) // intersection is at most the build side
    var c = 0L
    var j = 0
    while (j < nb) {
      if (!b.isNullAt(j)) {
        val v = b.getLong(j)
        if (build.contains(v) && seen.add(v)) c += 1L
      }
      j += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    computeCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("self", this, classOf[IntersectCountExpr].getName)
      s"${ev.value} = $self.computeCount($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
