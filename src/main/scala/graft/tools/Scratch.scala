package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe (contents rotate per investigation). Currently:
  * (a) q_agg_cmsketch — 2.4-3.6 s for 15 tasks over 37 KB of input:
  *     planning, codegen, or execution?
  * (b) q_ml_logreg_k — per-epoch cost split: aggregate execution vs
  *     the Gauss-Jordan solve chain's analysis/codegen. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val sf = "/root/testdata/sf0.1"

    // ---- (a) cmsketch ------------------------------------------------
    val qs = graft.SparkEntry.allQueries.filter(_.name == "q_agg_cmsketch")
    qs.foreach { q =>
      val df0 = q.query(spark, sf)
      t("cmsketch plan ONLY (executedPlan)") {
        df0.queryExecution.executedPlan
      }
      t("cmsketch exec (plan built)") {
        df0.write.format("noop").mode("overwrite").save()
      }
      (0 until 2).foreach { i =>
        val dfi = q.query(spark, sf)
        t(s"cmsketch full (build+plan+exec) $i") {
          dfi.write.format("noop").mode("overwrite").save()
        }
      }
      // pieces
      val t1 = graft.Tables.T(spark, sf)
      val sk = graft.operators.Sketches.countMin(t1.lineitem, "l_suppkey",
        depth = 4, width = 256)
      t("build sketch only") {
        sk.write.format("noop").mode("overwrite").save()
      }
      val est = graft.operators.Sketches.cmEstimate(sk, t1.supplier,
        "s_suppkey", depth = 4, width = 256)
      t("build+estimate") {
        est.write.format("noop").mode("overwrite").save()
      }
      val exact = t1.lineitem.groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(count(lit(1)).as("exact"))
      t("exact only") {
        exact.write.format("noop").mode("overwrite").save()
      }
    }

    // ---- (b) logreg_k epoch split ------------------------------------
    val li = graft.Tables.load(spark, sf, "lineitem")
    val src = li.select(
      col("l_returnflag"),
      when(col("l_discount") > 0.05, 1.0).otherwise(0.0).as("y"),
      (col("l_quantity").cast("double") / lit(50.0)).as("f1"),
      (col("l_tax").cast("double") * lit(10.0)).as("f2"),
      (col("l_linenumber").cast("double") / lit(7.0)).as("f3"),
      (col("l_extendedprice").cast("double") / lit(100000.0)).as("f4"))
    t("warm scan")(src.write.format("noop").mode("overwrite").save())
    (0 until 2).foreach { i =>
      t(s"logregFitK full run$i") {
        graft.operators.Regression.logregFitK(src, "l_returnflag", "y",
          Seq("f1", "f2", "f3", "f4"))
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.KernelCaches.releaseAll()
    }
    // epoch pieces: agg-only collect vs agg+solve collect, warm
    import graft.queries.Q
    val p = 5
    val rows = src.select(col("l_returnflag").as("grp") +: col("y") +:
      (1 to 4).map(i => col(s"f$i").as(s"x$i")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rows.count()
    val xs = lit(1.0) +: (1 to 4).map(i => col(s"x$i"))
    def q6c(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000d) + lit(0.5)) / lit(1000000d)
    val coef = rows.select(col("grp")).distinct()
      .select(col("grp") +: (0 until p).map(i => lit(0.0).as(s"b_$i")): _*)
    val (batches, valid) = graft.operators.Regression.gjBatches(p)
    val z = (0 until p).map(i => col(s"b_$i") * xs(i)).reduce(_ + _)
    val e = q6c(exp(-z))
    val mu = lit(1.0) / (lit(1.0) + e)
    val w = mu * (lit(1.0) - mu)
    val res = col("y") - mu
    def build() = {
      val pre = rows.join(broadcast(coef), "grp")
        .select(col("grp") +: (0 until p).map(i => col(s"b_$i")) ++:
          xs.zipWithIndex.map { case (x, i) => x.as(s"xx_$i") } :+
          w.as("ww") :+ res.as("rr"): _*)
      val aggs =
        (for { i <- 0 until p; j <- i until p }
          yield Q.dsum(col("ww") * col(s"xx_$i") * col(s"xx_$j"), 6)
            .as(s"m_${i}_$j")) ++
          (0 until p).map(i => Q.dsum(col("rr") * col(s"xx_$i"), 6)
            .as(s"t_$i")) :+ count(lit(1)).as("nl")
      pre.groupBy(col("grp") +: (0 until p).map(i => col(s"b_$i")): _*)
        .agg(aggs.head, aggs.tail: _*)
    }
    (0 until 2).foreach { i =>
      t(s"epoch agg-only collect $i")(build().collect())
    }
    (0 until 2).foreach { i =>
      val m = build()
      val solved = batches.foldLeft(m) { (d, batch) =>
        d.select(col("*") +: batch.map { case (n2, e2) =>
          expr(e2).as(n2) }: _*)
      }
      val out = solved.select(col("grp") +: col("nl") +:
        (0 until p).map(j => expr(
          s"CASE WHEN $valid THEN floor((b_$j + b${p - 1}_$j) * 1000000" +
            s" + 0.5) / 1000000 ELSE b_$j END").as(s"b_$j")): _*)
      t(s"epoch agg+SOLVE collect $i")(out.collect())
    }
    // solve chain alone: analysis+planning cost over a 3-row local input
    val mRows = build().collect()
    val mLocal: org.apache.spark.sql.DataFrame = spark.createDataFrame(
      java.util.Arrays.asList(mRows: _*),
      build().schema)
    (0 until 2).foreach { i =>
      val solved = batches.foldLeft(mLocal) { (d, batch) =>
        d.select(col("*") +: batch.map { case (n2, e2) =>
          expr(e2).as(n2) }: _*)
      }
      val out = solved.select(col("grp") +: col("nl") +:
        (0 until p).map(j => expr(
          s"CASE WHEN $valid THEN floor((b_$j + b${p - 1}_$j) * 1000000" +
            s" + 0.5) / 1000000 ELSE b_$j END").as(s"b_$j")): _*)
      t(s"SOLVE chain over LocalRelation (plan+exec) $i")(out.collect())
    }
    spark.stop()
  }
}
