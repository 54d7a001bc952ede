package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_sha60(text)` → ARRAY<BIGINT>: the 60-bit sha256 hash of
  * every character n-gram of `text`, in one pass over the utf8 bytes.
  *
  * Value-equivalent (as a multiset) to
  * `transform(sequence(1, greatest(length(t)-(n-1), 1)), i -> sha60(substr(t, i, n)))`
  * — each window's hash is the digest of exactly the bytes that
  * `substr` would return, including the short-tail behavior for texts
  * with fewer than n characters. The composed form is quadratic per
  * document: `substr(i, n)` walks code points from the string start for
  * every position, so a 1000-char doc does ~500k walk steps before any
  * hashing. Here code-point offsets are computed once and each window
  * digests a byte slice in place — O(len·n), no per-shingle string.
  *
  * Used by minhash signatures, where only per-permutation minima are
  * consumed: min over the multiset equals min over the distinct set, so
  * the distinct step of the composed form is dropped, not emulated.
  * Consumers that need exact distinct-shingle semantics (n-gram
  * Jaccard ground truth) keep the composed form. */
object ShingleSha60Util {

  def hashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // code-point start offsets (offsets(cnt) = len sentinel)
    val offsets = new Array[Int](len + 1)
    var cnt = 0
    var i = 0
    while (i < len) {
      offsets(cnt) = i
      cnt += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offsets(cnt) = len
    val numShingles = math.max(cnt - (n - 1), 1)
    val out = new Array[Long](numShingles)
    var k = 0
    while (k < numShingles) {
      val from = offsets(k)
      val until = offsets(math.min(k + n, cnt))
      val d = Sha60Util.threadDigest
      d.update(bytes, from, until - from)
      out(k) = Sha60Util.fold60(d.digest())
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class ShingleSha60(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(s"shingle width must be >= 1, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(s"shingle_sha60 expects STRING, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_sha60"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSha60Util.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleSha60Util.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSha60 =
    copy(child = newChild)
}
