package graft.expressions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.classic.ExpressionUtils;

/**
 * Column ⟷ catalyst-Expression bridge for custom expressions.
 *
 * ExpressionUtils is {@code private[sql]} at the Scala level but its
 * static forwarders are public bytecode — the supported pattern for
 * third-party Catalyst expressions on the classic (non-Connect) API
 * until SparkSessionExtensions-registered functions are the only entry.
 */
public final class ColumnBridge {
  private ColumnBridge() {}

  public static Column column(Expression e) {
    return ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return ExpressionUtils.expression(c);
  }
}
