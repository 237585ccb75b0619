package graft.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** CREATE AGGREGATE surface (SURVEY §2.11): GP user-defined aggregates
  * declare sfunc/stype/combinefunc/finalfunc (reference:
  * src/backend/commands/aggregatecmds.c:47-58, combine fn catalog
  * src/include/catalog/pg_aggregate.h:35). The Spark-native shape is
  * `Aggregator[IN, BUF, OUT]`: `reduce` ≡ sfunc, `merge` ≡ combinefunc,
  * `finish` ≡ finalfunc, the BUF encoder ≡ stype — and Spark plans it
  * partial/final across the shuffle exactly like GP's 2-stage aggs.
  *
  * Example aggregate: geometric mean via Σ log. */
final case class GeoMeanBuf(sumLog: Double, n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  type Buf = GeoMeanBuf
  private def Buf(s: Double, n: Long): Buf = GeoMeanBuf(s, n)

  override def zero: Buf = Buf(0.0, 0L)
  override def reduce(b: Buf, x: Double): Buf =     // ≡ sfunc
    if (x > 0) Buf(b.sumLog + math.log(x), b.n + 1) else b
  override def merge(a: Buf, b: Buf): Buf =          // ≡ combinefunc
    Buf(a.sumLog + b.sumLog, a.n + b.n)
  override def finish(b: Buf): Double =              // ≡ finalfunc
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form for DataFrame use. */
  def asColumn(c: Column): Column = udaf(GeoMean).apply(c)
}
