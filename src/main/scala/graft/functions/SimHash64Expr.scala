package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as 4 x 16-bit chunks, fused into ONE
  * per-row pass — no word explode, no 64-aggregate shuffle.
  *
  * SimHash is a pure per-document function of the word MULTISET (bit b of
  * chunk j is set iff 2 * count(words whose md5 has bit (16j+b)) exceeds
  * the word count), so computing it via `explode(words)` + groupBy with
  * 64 `sum()`s — the declarative form kept as [[graft.operators.Dedup
  * .simhashChunksSlow]] for the parity spec — pays a full shuffle of
  * every word occurrence for what one scan-side loop produces. At corpus
  * scale that shuffle is the entire token stream; this expression makes
  * the d4 signature phase shuffle-free.
  *
  * Bit layout matches the declarative/oracle form exactly: v_j = the
  * j-th 4-hex-char (16-bit, big-endian) chunk of md5(word), i.e. digest
  * bytes 2j, 2j+1; word counts include DUPLICATE occurrences (multiset,
  * unlike the shingle path's distinct). Output = [c0, c1, c2, c3].
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.catalogString}")
  }

  @transient private lazy val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Shared by interpreted and generated paths. Null elements contribute
    * no bits but DO count toward n — exactly the declarative form's
    * algebra (a null word's md5 is null so every bit-sum skips it, while
    * `count(lit(1))` still counts the row). Token arrays here never carry
    * nulls, but the expression must not NPE on a schema that allows them. */
  def computeChunks(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val cnt = new Array[Int](64)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        md.reset()
        val d = md.digest(a.getUTF8String(i).getBytes)
        var j = 0
        while (j < 4) {
          // 16-bit big-endian chunk j = hex chars [4j, 4j+4) = bytes 2j, 2j+1
          val v = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
          var b = 0
          while (b < 16) {
            cnt(16 * j + b) += (v >>> b) & 1
            b += 1
          }
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var c = 0L
      var b = 0
      while (b < 16) {
        if (2 * cnt(16 * j + b) - n > 0) c |= 1L << b
        b += 1
      }
      out(j) = c
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    computeChunks(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("self", this, classOf[SimHash64Expr].getName)
      s"${ev.value} = $self.computeChunks($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
