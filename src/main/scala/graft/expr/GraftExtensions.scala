package graft.expr

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration of graft's custom Catalyst expressions.
  *
  * Two paths, same functions:
  *  - `GraftFunctions.register(spark)` — imperative, for an existing
  *    session (used by Verify/Bench/tests);
  *  - `.withExtensions(new GraftExtensions)` / config
  *    `spark.sql.extensions=graft.expr.GraftExtensions` — declarative,
  *    survives session cloning.
  *
  * After either, both the SQL surface (`SELECT next_birthday(d, t)`)
  * and the Column surface (`GraftFunctions.nextBirthday(c1, c2)`) work.
  */
object GraftFunctions {

  /** Width args (shingle/gram n) must be integer literals: the width
    * is a structural parameter of the expression, not a per-row
    * value. */
  private def intArg(e: Expression, fn: String): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      // no silent toInt truncation: a BIGINT width past Int range
      // would wrap to an arbitrary small width and run "successfully"
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: width must be an integer literal in Int range, got $other")
    } else throw new IllegalArgumentException(s"$fn: width must be a literal")

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "next_birthday" -> (es => NextBirthday(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "sha60" -> (es => Sha60(es(0))),
    "sorted_intersect_count" -> (es => SortedIntersectCount(es(0), es(1))),
    "shingle_sha60" -> (es => ShingleSha60(es(0), intArg(es(1), "shingle_sha60"))),
    "word_gram_sha60" -> (es => WordGramSha60(es(0), intArg(es(1), "word_gram_sha60"))),
    "poly_kgram_hash" -> (es => PolyKgramHash(es(0))),
    "winnow_select" -> (es => WinnowSelect(es(0))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  // Column-surface wrappers (resolved through the registry, so they
  // work on any session where register()/extensions ran)
  def nextBirthday(dob: Column, today: Column): Column =
    org.apache.spark.sql.functions.call_function("next_birthday", dob, today)
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
  def sha60(c: Column): Column =
    org.apache.spark.sql.functions.call_function("sha60", c)
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_intersect_count", a, b)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.expr", name),
        builder))
    }
}
