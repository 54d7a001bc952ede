package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType}

/** Pure integer-date kernel, shared by interpreted eval and codegen. */
object NextBirthdayUtil {
  /** Next anniversary of `dob` at-or-after `today`, both/result in days
    * since epoch. Feb-29 → Mar-1 in non-leap years (SURVEY.md §2g X5:
    * the reference's Python `.replace` raises on this; we define the
    * policy instead of inheriting the crash — main.py:182-203). */
  def compute(dobDays: Int, todayDays: Int): Int = {
    val dob = java.time.LocalDate.ofEpochDay(dobDays.toLong)
    val today = java.time.LocalDate.ofEpochDay(todayDays.toLong)
    def anniv(year: Int): java.time.LocalDate =
      if (dob.getMonthValue == 2 && dob.getDayOfMonth == 29 &&
          !java.time.Year.isLeap(year.toLong))
        java.time.LocalDate.of(year, 3, 1)
      else java.time.LocalDate.of(year, dob.getMonthValue, dob.getDayOfMonth)
    val thisYear = anniv(today.getYear)
    val next = if (!thisYear.isBefore(today)) thisYear else anniv(today.getYear + 1)
    next.toEpochDay.toInt
  }
}

/** Custom Catalyst expression for X5 (`next_birthday(dob, today)`).
  *
  * Why an Expression and not the composed-Column fallback
  * (`Scalars.nextBirthday`): full whole-stage-codegen participation (a
  * single static call vs a 6-node when/make_date tree), and SQL-surface
  * registration so `spark.sql("SELECT next_birthday(...)")` works —
  * see GraftExtensions.
  */
case class NextBirthday(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == DateType && right.dataType == DateType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"next_birthday expects (DATE, DATE), got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DateType
  override def prettyName: String = "next_birthday"

  override protected def nullSafeEval(dob: Any, today: Any): Any =
    NextBirthdayUtil.compute(dob.asInstanceOf[Int], today.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, t) =>
      s"graft.expr.NextBirthdayUtil.compute($d, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NextBirthday =
    copy(left = newLeft, right = newRight)
}
