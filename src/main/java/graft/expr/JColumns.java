package graft.expr;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Java bridge to the Column&lt;-&gt;Expression converters. They are
 * {@code private[sql]} in Scala, but their static forwarders are plain
 * public methods in bytecode, which javac is happy to link against.
 * This is the classic-Spark equivalent of the old {@code new
 * Column(expr)} constructor that Spark 4 removed.
 */
public final class JColumns {
    private JColumns() {}

    public static Column column(Expression e) {
        return org.apache.spark.sql.classic.ExpressionUtils.column(e);
    }

    public static Expression expression(Column c) {
        return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
    }
}
