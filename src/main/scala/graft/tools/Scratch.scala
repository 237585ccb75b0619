package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway profiling harness for plan experiments (not part of the
  * driver contract; deleted or repurposed freely between sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scratch")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = Tables.T(spark, dir).lineitem

    def time(tag: String)(f: => Unit): Unit = (0 until 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $tag iter$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("double_sums") {
      run(li.filter($"l_shipdate" <= "2001-09-02")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity"), sum($"l_extendedprice"),
          sum($"l_extendedprice" * (lit(1) - $"l_discount")),
          sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")),
          avg($"l_quantity"), avg($"l_extendedprice"), avg($"l_discount"),
          count(lit(1))))
    }
    time("dec28_sums") {
      run(li.filter($"l_shipdate" <= "2001-09-02")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast(DecimalType(28, 6))),
          sum($"l_extendedprice".cast(DecimalType(28, 6))),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast(DecimalType(28, 6))),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).cast(DecimalType(28, 6))),
          sum($"l_quantity".cast(DecimalType(28, 6))),
          sum($"l_extendedprice".cast(DecimalType(28, 6))),
          sum($"l_discount".cast(DecimalType(28, 6))),
          count(lit(1))))
    }
    time("dec18_sums") {
      run(li.filter($"l_shipdate" <= "2001-09-02")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast(DecimalType(18, 6))),
          sum($"l_extendedprice".cast(DecimalType(18, 6))),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast(DecimalType(18, 6))),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).cast(DecimalType(18, 6))),
          sum($"l_quantity".cast(DecimalType(18, 6))),
          sum($"l_extendedprice".cast(DecimalType(18, 6))),
          sum($"l_discount".cast(DecimalType(18, 6))),
          count(lit(1))))
    }
    time("split_sums_exact") {
      def v(c: org.apache.spark.sql.Column) =
        floor(c * 1000000d + lit(0.5)).cast("long")
      def hi(c: org.apache.spark.sql.Column) =
        floor(v(c) / 1000000d).cast("long")
      def lo(c: org.apache.spark.sql.Column) = v(c) - hi(c) * 1000000L
      def dsum2(c: org.apache.spark.sql.Column, scale: Int = 2) =
        round(((sum(hi(c)).cast(DecimalType(38, 0)) * 1000000L +
          sum(lo(c))).cast(DecimalType(38, 6)) / 1000000L), scale)
          .cast("double")
      run(li.filter($"l_shipdate" <= "2001-09-02")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum2($"l_quantity").as("sum_qty"),
          dsum2($"l_extendedprice").as("sum_base_price"),
          dsum2($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          dsum2($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
          dsum2($"l_quantity", 4).as("avg_qty_n"),
          dsum2($"l_extendedprice", 4).as("avg_p_n"),
          dsum2($"l_discount", 4).as("avg_d_n"),
          count(lit(1)).as("count_order")))
    }
    // cross-check: split-sum vs decimal(28,6) sums must agree exactly
    locally {
      def v(c: org.apache.spark.sql.Column) =
        floor(c * 1000000d + lit(0.5)).cast("long")
      def hi(c: org.apache.spark.sql.Column) =
        floor(v(c) / 1000000d).cast("long")
      def lo(c: org.apache.spark.sql.Column) = v(c) - hi(c) * 1000000L
      def dsum2(c: org.apache.spark.sql.Column, scale: Int = 2) =
        round(((sum(hi(c)).cast(DecimalType(38, 0)) * 1000000L +
          sum(lo(c))).cast(DecimalType(38, 6)) / 1000000L), scale)
          .cast("double")
      def dsum1(c: org.apache.spark.sql.Column, scale: Int = 2) =
        round(sum(c.cast(DecimalType(28, 6))), scale).cast("double")
      val charge = $"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")
      val a = li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(dsum2($"l_quantity").as("a"), dsum2(charge).as("b"),
          dsum2(-$"l_extendedprice").as("c"))
        .orderBy("l_returnflag", "l_linestatus").collect()
      val b = li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(dsum1($"l_quantity").as("a"), dsum1(charge).as("b"),
          dsum1(-$"l_extendedprice").as("c"))
        .orderBy("l_returnflag", "l_linestatus").collect()
      println(s"[scratch] split-vs-decimal equal: ${a.sameElements(b)}")
      if (!a.sameElements(b)) { a.take(4).foreach(r => println(s"  A $r")); b.take(4).foreach(r => println(s"  B $r")) }
    }
    time("long_micros_sums") {
      run(li.filter($"l_shipdate" <= "2001-09-02")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum(($"l_quantity" * 1000000L).cast("long")),
          sum(($"l_extendedprice" * 1000000L).cast("long")),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount") * 1000000L).cast("long")),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax") * 1000000L).cast("long")),
          count(lit(1))))
    }
    spark.stop()
  }
}
