package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `poly_kgram_hash(text)` → ARRAY<BIGINT>: the winnowing polynomial
  * hash (Σ cp(i+j)·257^(7−j) mod 1e9+7 over 8-codepoint windows) of
  * every position, in ONE pass via a rolling update.
  *
  * Bit-identical to the composed form
  * `transform(sequence(1, greatest(length(t)-7, 1)),
  *   i -> (ascii(substr(t,i,1))·257^7 + … + ascii(substr(t,i+7,1))) % p)`
  * — including the zero-padded single window for texts shorter than 8
  * characters (`ascii('')` is 0 in both engines) — because Horner
  * evaluation of the window equals the weighted sum, and the DuckDB
  * oracle keeps computing that composed form independently. The
  * composed Spark form is quadratic per document: each of the 8
  * `substr(i+j, 1)` taps walks code points from the string START, so a
  * 1000-char doc pays ~4M walk steps before any hashing (measured:
  * 26.9 s at sf0.1 for the whole query; 0.6 s with this expression).
  * Here code points are decoded once and each position is O(1). */
object PolyKgramUtil {

  private final val P = 1000000007L
  private final val B = 257L
  private final val W7 = 13163680L // 257^7 mod P

  def hashes(s: UTF8String): ArrayData = {
    val str = s.toString
    val strLen = str.length
    val nCp = str.codePointCount(0, strLen)
    val cp = new Array[Long](nCp)
    var ci = 0
    var off = 0
    while (off < strLen) {
      val c = str.codePointAt(off)
      cp(ci) = c.toLong
      ci += 1
      off += Character.charCount(c)
    }
    val nPos = math.max(nCp - 7, 1)
    val out = new Array[Long](nPos)
    if (nCp < 8) {
      // one zero-padded window — the composed form's short-text tail
      var h = 0L
      var j = 0
      while (j < 8) {
        val c = if (j < nCp) cp(j) else 0L
        h = (h * B + c) % P
        j += 1
      }
      out(0) = h
    } else {
      var h = 0L
      var j = 0
      while (j < 8) { h = (h * B + cp(j)) % P; j += 1 }
      out(0) = h
      var i = 1
      while (i < nPos) {
        var t = (h - cp(i - 1) * W7 % P) % P
        if (t < 0) t += P
        h = (t * B + cp(i + 7)) % P
        out(i) = h
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** `winnow_select(kh)` → ARRAY<BIGINT>: the distinct window-4 minima
  * of a k-gram hash array — the MOSS winnowing selection — via a
  * monotonic deque: O(n) total, zero per-position allocation.
  *
  * Set-equivalent to the composed
  * `array_distinct(transform(sequence(1, greatest(size(kh)-3, 1)),
  *   i -> array_min(slice(kh, i, 4))))` — same distinct VALUES (the
  * consumers read size and min, both order-free); the composed form
  * allocates a 4-element slice per position and re-scans it, which at
  * 200k docs × ~1000 positions is pure GC pressure. */
object WinnowSelectUtil {

  private final val W = 4

  def select(kh: ArrayData): ArrayData = {
    val n = kh.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    // monotonic deque of indices; head = index of current window min
    val deque = new Array[Int](n + 1)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      val v = kh.getLong(i)
      while (tail > head && kh.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - W) head += 1
      // windows are [i-3, i] once i >= W-1; a short array (n < W)
      // yields its single full-prefix min at i = n-1, matching the
      // composed form's greatest(size-3, 1) = one window
      if (i >= W - 1 || i == n - 1) seen.add(kh.getLong(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

case class WinnowSelect(child: Expression) extends UnaryExpression {

  // containsNull = false REQUIRED: ArrayData.getLong would read a null
  // slot as 0 and fabricate a fingerprint — reject at analysis instead.
  // (PolyKgramHash output qualifies; a SQL caller passing a nullable
  // array gets a type error, not a wrong answer.) Empty input yields
  // an empty selection — a fingerprint of nothing is nothing; the
  // composed array_min(slice(...)) form would yield [null] there, a
  // shape this non-null output type cannot and should not carry.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) =>
      TypeCheckResult.TypeCheckFailure(
        "winnow_select expects ARRAY<BIGINT> with non-null elements")
    case dt => TypeCheckResult.TypeCheckFailure(s"winnow_select expects ARRAY<BIGINT>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelectUtil.select(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WinnowSelectUtil.select($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

case class PolyKgramHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"poly_kgram_hash expects STRING, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_kgram_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyKgramUtil.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PolyKgramUtil.hashes($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyKgramHash =
    copy(child = newChild)
}
