package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe (contents rotate per investigation). Currently: where does
  * q_ml_logreg_k's wall time go — per-epoch job execution, or driver
  * planning (analysis/optimization of the generated Gauss-Jordan solve
  * chain)? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val src = li.select(
      col("l_returnflag"),
      when(col("l_discount") > 0.05, 1.0).otherwise(0.0).as("y"),
      (col("l_quantity").cast("double") / lit(50.0)).as("f1"),
      (col("l_tax").cast("double") * lit(10.0)).as("f2"),
      (col("l_linenumber").cast("double") / lit(7.0)).as("f3"),
      (col("l_extendedprice").cast("double") / lit(100000.0)).as("f4"))
    t("warm scan")(src.write.format("noop").mode("overwrite").save())
    // full fit, warm run ×2
    (0 until 2).foreach { i =>
      t(s"logregFitK full run$i") {
        graft.operators.Regression.logregFitK(src, "l_returnflag", "y",
          Seq("f1", "f2", "f3", "f4"))
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.KernelCaches.releaseAll()
    }
    // planning-only probe: build ONE epoch's solved plan and time
    // executedPlan materialization (analysis + optimization + physical
    // planning, no jobs)
    import org.apache.spark.sql.{Column, DataFrame}
    import graft.queries.Q
    val p = 5
    val rows = src.select(col("l_returnflag").as("grp") +: col("y") +:
      (1 to 4).map(i => col(s"f$i").as(s"x$i")): _*)
    val xs: Seq[Column] = lit(1.0) +: (1 to 4).map(i => col(s"x$i"))
    def q6c(c: Column): Column =
      floor(c * lit(1000000d) + lit(0.5)) / lit(1000000d)
    val coef = rows.select(col("grp")).distinct()
      .select(col("grp") +: (0 until p).map(i => lit(0.0).as(s"b_$i")): _*)
    val (batches, valid) = graft.operators.Regression.gjBatches(p)
    println(s"[info] gjBatches: ${batches.length} batches, " +
      s"${batches.map(_.size).sum} exprs, total text " +
      s"${batches.flatMap(_.map(_._2.length)).sum} chars")
    val z = (0 until p).map(i => col(s"b_$i") * xs(i)).reduce(_ + _)
    val e = q6c(exp(-z))
    val mu = lit(1.0) / (lit(1.0) + e)
    val w = mu * (lit(1.0) - mu)
    val res = col("y") - mu
    val aggs =
      (for { i <- 0 until p; j <- i until p }
        yield Q.dsum(w * xs(i) * xs(j), 6).as(s"m_${i}_$j")) ++
        (0 until p).map(i => Q.dsum(res * xs(i), 6).as(s"t_$i")) :+
        count(lit(1)).as("nl")
    val m = rows.join(broadcast(coef), "grp")
      .groupBy(col("grp") +: (0 until p).map(i => col(s"b_$i")): _*)
      .agg(aggs.head, aggs.tail: _*)
    val solved = batches.foldLeft(m) { (d, batch) =>
      d.select(col("*") +: batch.map { case (n2, e2) =>
        expr(e2).as(n2) }: _*)
    }
    val out = solved.select(col("grp") +: col("nl") +:
      (0 until p).map(i => expr(
        s"CASE WHEN $valid THEN floor((b_$i + b${p - 1}_$i) * 1000000" +
          s" + 0.5) / 1000000 ELSE b_$i END").as(s"b_$i")): _*)
    t("one-epoch ANALYSIS+OPT (executedPlan)") {
      out.queryExecution.executedPlan
    }
    val out2 = solved.select(col("grp"), col("nl"))
    t("agg-only executedPlan") {
      out2.queryExecution.executedPlan
    }
    t("one-epoch EXECUTION (noop, plan already built)") {
      out.write.format("noop").mode("overwrite").save()
    }
    t("one-epoch EXECUTION #2 (same DF, all caches warm)") {
      out.write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("one-epoch EXECUTION noAQE") {
      out.write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("one-epoch EXECUTION noWSCG") {
      out.write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // variant: μ/w/res computed ONCE in a projection below the aggregate
    // (the oracle's jk-CTE shape) instead of inlined into all 40 split
    // sums — identical IEEE ops, identical values, much smaller tree
    val pre = rows.join(broadcast(coef), "grp")
      .select(col("grp") +: (0 until p).map(i => col(s"b_$i")) ++:
        xs.zipWithIndex.map { case (x, i) => x.as(s"xx_$i") } :+
        w.as("ww") :+ res.as("rr"): _*)
    val xs2: Seq[Column] = (0 until p).map(i => col(s"xx_$i"))
    val aggs2 =
      (for { i <- 0 until p; j <- i until p }
        yield Q.dsum(col("ww") * xs2(i) * xs2(j), 6).as(s"m_${i}_$j")) ++
        (0 until p).map(i => Q.dsum(col("rr") * xs2(i), 6).as(s"t_$i")) :+
        count(lit(1)).as("nl")
    val m2 = pre.groupBy(col("grp") +: (0 until p).map(i =>
      col(s"b_$i")): _*).agg(aggs2.head, aggs2.tail: _*)
    val solved2 = batches.foldLeft(m2) { (d, batch) =>
      d.select(col("*") +: batch.map { case (n2, e2) =>
        expr(e2).as(n2) }: _*)
    }
    val outPre = solved2.select(col("grp") +: col("nl") +:
      (0 until p).map(i => expr(
        s"CASE WHEN $valid THEN floor((b_$i + b${p - 1}_$i) * 1000000" +
          s" + 0.5) / 1000000 ELSE b_$i END").as(s"b_$i")): _*)
    t("pre-projected epoch EXECUTION #1") {
      outPre.write.format("noop").mode("overwrite").save()
    }
    t("pre-projected epoch EXECUTION #2") {
      outPre.write.format("noop").mode("overwrite").save()
    }
    // cross-check: identical values
    val a = out.orderBy("grp").collect().map(_.toString).mkString("|")
    val b = outPre.orderBy("grp").collect().map(_.toString).mkString("|")
    println(s"[check] identical=${a == b}")

    // ---- full 4-epoch variant: pre-projection + driver-ferried coef --
    // (collected 3-row state re-embedded as a LocalRelation per epoch:
    // no checkpoint job, no broadcast-build job)
    def fullFerry(): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(StructField("grp", StringType) +:
        StructField("nl", LongType) +:
        (0 until p).map(i => StructField(s"b_$i", DoubleType)))
      var coefLoc = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq.empty[Row], 1), schema)
      var coefRows = rows.select(col("grp")).distinct().collect()
        .map(r => Row(r.getString(0) +: 0L +:
          Seq.fill(p)(0.0): _*))
      for (_ <- 0 until 4) {
        coefLoc = spark.createDataFrame(
          java.util.Arrays.asList(coefRows: _*), schema)
        val pre2 = rows.join(broadcast(coefLoc.drop("nl")), "grp")
          .select(col("grp") +: (0 until p).map(i => col(s"b_$i")) ++:
            xs.zipWithIndex.map { case (x, i) => x.as(s"xx_$i") } :+
            w.as("ww") :+ res.as("rr"): _*)
        val aggs3 =
          (for { i <- 0 until p; j <- i until p }
            yield Q.dsum(col("ww") * col(s"xx_$i") * col(s"xx_$j"), 6)
              .as(s"m_${i}_$j")) ++
            (0 until p).map(i => Q.dsum(col("rr") * col(s"xx_$i"), 6)
              .as(s"t_$i")) :+ count(lit(1)).as("nl")
        val m3 = pre2.groupBy(col("grp") +: (0 until p).map(i =>
          col(s"b_$i")): _*).agg(aggs3.head, aggs3.tail: _*)
        val solved3 = batches.foldLeft(m3) { (d, batch) =>
          d.select(col("*") +: batch.map { case (n2, e2) =>
            expr(e2).as(n2) }: _*)
        }
        coefRows = solved3.select(col("grp") +: col("nl") +:
          (0 until p).map(i => expr(
            s"CASE WHEN $valid THEN floor((b_$i + b${p - 1}_$i) * " +
              s"1000000 + 0.5) / 1000000 ELSE b_$i END").as(s"b_$i")): _*)
          .collect()
      }
      coefLoc = spark.createDataFrame(
        java.util.Arrays.asList(coefRows: _*), schema)
      coefLoc.select(col("grp") +: col("nl").as("n") +:
        (0 until p).map(i => round(col(s"b_$i"), 4).as(s"b$i")): _*)
    }
    (0 until 2).foreach { i =>
      t(s"ferry 4-epoch full run$i") {
        fullFerry().write.format("noop").mode("overwrite").save()
      }
    }
    val ref = graft.operators.Regression.logregFitK(src, "l_returnflag",
      "y", Seq("f1", "f2", "f3", "f4"))
      .orderBy("grp").collect().map(_.toString).mkString("|")
    val fer = fullFerry().orderBy("grp").collect()
      .map(_.toString).mkString("|")
    println(s"[check] ferry identical=${ref == fer}")
    spark.stop()
  }
}
