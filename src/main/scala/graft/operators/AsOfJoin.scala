package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row
  * with rightTime <= leftTime within the same key. The reference has no
  * dedicated operator (range predicates run on MergeJoin/NestLoop,
  * SURVEY §2.3); this is the Spark-native union-window formulation.
  *
  * Scale design: instead of a range join (quadratic blow-up on hot keys),
  * union both sides and take one window pass per key ordered by time —
  * a single shuffle on the key, linear state. This is the same trick a
  * sorted MergeJoin with mark/restore plays, expressed declaratively.
  */
object AsOfJoin {

  /** left(keys…, leftTime, …) ⟕asof right(keys…, rightTime, valueCols…).
    * Right rows at exactly leftTime are matched (<=). Left rows with no
    * prior right row keep nulls. */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    // null keys never match under join equality; dropping them from the
    // right side keeps null-key left rows from seeing null-key right rows
    // (which would otherwise share a window partition)
    val rightKeyed = right.filter(col(key).isNotNull)
    val tagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select(
        (lCols.map(col) :+ col("__t") :+ col("__is_left")) ++
          valueCols.map(c => lit(null).cast(right.schema(c).dataType)
            .as(s"__r_$c")): _*)
      .unionByName(
        rightKeyed
          .withColumn("__t", col(rightTime))
          .withColumn("__is_left", lit(0))
          .select(
            (lCols.map(c =>
              (if (c == key) col(key) else lit(null).cast(left.schema(c).dataType))
                .as(c)) :+ col("__t") :+ col("__is_left")) ++
              valueCols.map(c => col(c).as(s"__r_$c")): _*))
    // right rows sort before left rows at equal time → '<=' semantics
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_left") === 1)
      .select(lCols.map(col) ++ valueCols.map(c => col(s"asof_$c").as(c)): _*)
  }
}
