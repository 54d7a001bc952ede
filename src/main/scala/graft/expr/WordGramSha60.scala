package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_gram_sha60(text, n)` → ARRAY<BIGINT>: the 60-bit sha256 hash
  * of every n-WORD gram of `text` (words joined by a single space), in
  * one pass over the utf8 bytes.
  *
  * Value-equivalent, for whitespace-trimmed input, to
  * `transform(sequence(1, greatest(size(toks)-(n-1), 1)),
  *            i -> sha60(concat_ws(' ', slice(toks, i, n))))`
  * with `toks = split(text, '\s+')` — including the short-tail
  * behavior (fewer than n words → one gram of all of them). The
  * composed form is QUADRATIC per document after projection collapse:
  * Catalyst inlines the `split` into the transform lambda, so the
  * whole document is re-tokenized by regex once per gram position
  * (measured: 37k grams/s — this expression does ~5M/s). Words are
  * maximal runs of non-whitespace (Java-regex `\s` class: space, \t,
  * \n, \x0B, \f, \r), identical to `\s+` splitting for trimmed input.
  *
  * Used by the decontamination gram join; the DuckDB oracle keeps the
  * composed list-comprehension form as the cross-engine twin. */
object WordGramSha60Util {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def hashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // word [start, end) byte ranges, one pass
    var nWords = 0
    var i = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        starts(nWords) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(nWords) = i
        nWords += 1
      }
    }
    val numGrams = math.max(nWords - (n - 1), 1)
    val out = new Array[Long](numGrams)
    val space = Array(' '.toByte)
    var k = 0
    while (k < numGrams) {
      val d = Sha60Util.threadDigest
      val last = math.min(k + n, math.max(nWords, 1))
      var w = k
      while (w < last && nWords > 0) {
        if (w > k) d.update(space, 0, 1)
        d.update(bytes, starts(w), ends(w) - starts(w))
        w += 1
      }
      out(k) = Sha60Util.fold60(d.digest())
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class WordGramSha60(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(s"gram width must be >= 1, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(s"word_gram_sha60 expects STRING, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_sha60"

  override protected def nullSafeEval(input: Any): Any =
    WordGramSha60Util.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordGramSha60Util.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramSha60 =
    copy(child = newChild)
}
