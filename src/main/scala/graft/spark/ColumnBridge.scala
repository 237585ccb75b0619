package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters for
  * the rare operator that must plant a raw Catalyst expression the
  * public `functions`/registry surfaces can't express (e.g. an
  * uncorrelated ScalarSubquery carrying a BloomFilterAggregate —
  * [[graft.operators.Dedup.bloomScreenExact]]). Kept to exactly two
  * forwarders; everything else goes through the function registry. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
