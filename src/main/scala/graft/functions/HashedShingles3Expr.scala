package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-shingles of a token array, hashed to 60-bit md5 longs,
  * in one fused pass.
  *
  * Semantically identical to the declarative chain
  * `explode(array_distinct(transform(...concat_ws(" ", t_i, t_i+1,
  * t_i+2)...)))` followed by `md5Long60` — the dedupe is on the SHINGLE
  * STRINGS (so a 60-bit collision between two distinct shingles keeps
  * both longs, exactly like hashing after `array_distinct`), the hash is
  * md5 of the same UTF-8 bytes, and the long is the first 15 hex chars
  * (= first 60 bits big-endian) of the digest, exactly what
  * `conv(substring(md5(s), 1, 15), 16, 10)` parses. Fusing skips three
  * intermediate allocations per shingle (the string array element, the
  * 32-char hex rendering, and the substring) on the scan that feeds the
  * whole Jaccard dedup family.
  *
  * Output order is first occurrence, matching `array_distinct`; callers
  * re-sort canonically downstream anyway. Empty/short token arrays yield
  * an empty array, like the `size(toks) < 3` guard in the declarative
  * form.
  */
case class HashedShingles3Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles3"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.catalogString}")
  }

  // MessageDigest is stateful; one per thread, since a broadcast plan can
  // evaluate the same expression instance from many task threads
  @transient private lazy val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val space = UTF8String.fromString(" ")

  /** First 60 bits of the digest, big-endian — the value
    * `conv(substring(hex, 1, 15), 16, 10)` produces. */
  private def long60(d: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** The whole per-row computation; also the target the generated code
    * calls into, so interpreted and codegen paths share one body. */
  def computeHashes(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val md = md5Local.get()
    val seen = new java.util.HashSet[UTF8String](Math.max(4, (n - 2) * 2))
    val out = new Array[Long](n - 2)
    var m = 0
    var i = 0
    while (i < n - 2) {
      val s = UTF8String.concatWs(space,
        a.getUTF8String(i), a.getUTF8String(i + 1), a.getUTF8String(i + 2))
      if (seen.add(s)) {
        md.reset()
        out(m) = long60(md.digest(s.getBytes))
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override def nullSafeEval(a: Any): Any =
    computeHashes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("self", this, classOf[HashedShingles3Expr].getName)
      s"${ev.value} = $self.computeHashes($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
