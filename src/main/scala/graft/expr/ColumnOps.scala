package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-independent Column wrappers for graft's catalyst expressions
  * (no function-registry dependency, so library operators can use them
  * on any session). */
object ColumnOps {
  def wrap(e: Expression): Column = JColumns.column(e)
  def exprOf(c: Column): Expression = JColumns.expression(c)

  def dotProduct(a: Column, b: Column): Column =
    wrap(DotProduct(exprOf(a), exprOf(b)))
  def nextBirthday(dob: Column, today: Column): Column =
    wrap(NextBirthday(exprOf(dob), exprOf(today)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    wrap(SortedIntersectCount(exprOf(a), exprOf(b)))
  def sha60(c: Column): Column =
    wrap(Sha60(exprOf(c)))
  def shingleSha60(c: Column, n: Int): Column =
    wrap(ShingleSha60(exprOf(c), n))
  def wordGramSha60(c: Column, n: Int): Column =
    wrap(WordGramSha60(exprOf(c), n))
}
