package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel: first 60 bits of sha256(utf8 bytes) as a non-negative long.
  *
  * Bit-identical to the composed form
  * `conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")` (and to
  * DuckDB's `cast(concat('0x', substr(sha256(x),1,15)) as bigint)` —
  * the cross-engine contract of SURVEY.md §2j), but digests the bytes
  * directly: the composed form hex-encodes the 32-byte digest to a
  * 64-char string, substrings it, and `conv`-parses the prefix — three
  * string round-trips that dominate when the hash runs once per shingle
  * across millions of (doc, shingle) pairs on the dedup hot paths.
  *
  * Object methods get static forwarders, so generated Java can call
  * `graft.expr.Sha60Util.hash60(...)` directly. */
object Sha60Util {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }

  /** Per-thread reset digest — shared with ShingleSha60Util so both
    * kernels stay on one implementation of the cross-engine contract. */
  private[expr] def threadDigest: MessageDigest = { val d = md.get(); d.reset(); d }

  /** Assemble the first 15 hex chars of a sha256 digest as a 60-bit
    * non-negative long: bytes 0..6 (14 nibbles) + the high nibble of
    * byte 7, read big-endian — exactly what conv(substr(hex,1,15),16,10)
    * parses. The ONE definition both Sha60 and ShingleSha60 use. */
  private[expr] def fold60(h: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >> 4)
  }

  def hash60(s: UTF8String): Long =
    fold60(threadDigest.digest(s.getBytes))
}

/** `sha60(string)` → BIGINT. Codegen + interpreted paths share the
  * Sha60Util kernel (ExprSpec asserts equivalence with the composed
  * column form and between codegen/interpreted). */
case class Sha60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sha60 expects STRING, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sha60"

  override protected def nullSafeEval(input: Any): Any =
    Sha60Util.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Sha60Util.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha60 =
    copy(child = newChild)
}
