package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multilayer-perceptron regression — the MADlib `mlp` module
  * (mlp_regression; reference ships MADlib's neural net for in-DB
  * model fitting). MADlib trains by minibatch IGD (row-order- and
  * segment-layout-dependent); this is the FULL-BATCH gradient-descent
  * restatement of the same 2-2-1 tanh network and MSE objective — the
  * deterministic batch substitution every IGD module here gets
  * (SVM/logreg/ALS precedent).
  *
  * Architecture: 2 inputs → 2 tanh hidden units → 1 linear output.
  * Each GD round is ONE corpus aggregate: the forward pass and all 9
  * gradient terms evaluate per row inside codegen, every per-row
  * gradient/loss term quantizes to integer MICROS before summing
  * (order-free exact longs), and the 9-value weight state lives on the
  * driver between rounds (catalog-scale, the k-means centroid
  * contract) and re-enters as literals.
  *
  * Cross-engine determinism: weights micros-quantize per update, so
  * both engines evaluate tanh on identical arguments; tanh's
  * last-ulp risk is immediately re-quantized (the Cox exp
  * discipline). Returns one row: the 9 trained weights + final-round
  * pre-update MSE + n.
  */
object NeuralNet {

  /** Deterministic asymmetric init — literal-embedded on both engines. */
  val init: Seq[Double] =
    Seq(0.5, -0.25, 0.1, -0.3, 0.4, -0.1, 0.6, 0.5, 0.0)
  val names: Seq[String] =
    Seq("w11", "w12", "b1", "w21", "w22", "b2", "v1", "v2", "c")

  def mlpFit221(
      df: DataFrame, x1Col: Column, x2Col: Column, yCol: Column,
      eta: Double, iterations: Int): DataFrame = {
    val rows = df.select(x1Col.cast("double").as("x1"),
      x2Col.cast("double").as("x2"), yCol.cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    KernelCaches.register(rows)
    def mic(c: Column) = floor(c * lit(1000000d) + lit(0.5)).cast("long")
    def q6(x: Double) = math.floor(x * 1000000d + 0.5) / 1000000d
    var w = init.toArray
    var mse = 0.0
    var n = 0.0
    for (_ <- 0 until iterations) {
      val Array(w11, w12, b1, w21, w22, b2, v1, v2, c) = w
      // tanh via the exp identity — NOT Math.tanh: both engines must
      // follow the identical (e^{2z}−1)/(e^{2z}+1) operation sequence
      // (DuckDB 1.0 has no tanh builtin, and libm tanh would differ in
      // last ulps anyway); the quantize right after re-pins the value
      def tanhE(z: Column) = {
        val e2 = exp(lit(2.0) * z)
        (e2 - lit(1.0)) / (e2 + lit(1.0))
      }
      val a1 = floor(tanhE(lit(w11) * col("x1") + lit(w12) * col("x2")
        + lit(b1)) * lit(1000000d) + lit(0.5)) / lit(1000000d)
      val a2 = floor(tanhE(lit(w21) * col("x1") + lit(w22) * col("x2")
        + lit(b2)) * lit(1000000d) + lit(0.5)) / lit(1000000d)
      val o = lit(v1) * a1 + lit(v2) * a2 + lit(c)
      val r = o - col("y")
      val dh1 = r * lit(v1) * (lit(1.0) - a1 * a1)
      val dh2 = r * lit(v2) * (lit(1.0) - a2 * a2)
      val g = rows.agg(
        count(lit(1)).as("n"),
        sum(mic(dh1 * col("x1"))).as("gw11"),
        sum(mic(dh1 * col("x2"))).as("gw12"),
        sum(mic(dh1)).as("gb1"),
        sum(mic(dh2 * col("x1"))).as("gw21"),
        sum(mic(dh2 * col("x2"))).as("gw22"),
        sum(mic(dh2)).as("gb2"),
        sum(mic(r * a1)).as("gv1"),
        sum(mic(r * a2)).as("gv2"),
        sum(mic(r)).as("gc"),
        sum(mic(r * r)).as("loss")).collect()(0)
      n = g.getLong(0).toDouble
      def grad(i: Int) = g.getLong(i).toDouble / 1000000d
      mse = grad(10) / n
      w = Array(
        q6(w11 - eta * (grad(1) / n)), q6(w12 - eta * (grad(2) / n)),
        q6(b1 - eta * (grad(3) / n)), q6(w21 - eta * (grad(4) / n)),
        q6(w22 - eta * (grad(5) / n)), q6(b2 - eta * (grad(6) / n)),
        q6(v1 - eta * (grad(7) / n)), q6(v2 - eta * (grad(8) / n)),
        q6(c - eta * (grad(9) / n)))
    }
    val spark = df.sparkSession
    import spark.implicits._
    Seq((w(0), w(1), w(2), w(3), w(4), w(5), w(6), w(7), w(8),
      mse, n.toLong))
      .toDF("w11", "w12", "b1", "w21", "w22", "b2", "v1", "v2", "c",
        "mse", "n")
  }

  /** Shared-text machinery for [[mlpFitK]] — every forward/backward
    * expression is ONE string evaluated by Spark `expr` and embedded
    * verbatim in the DuckDB oracle, so both engines follow identical
    * IEEE op order at any topology (the gjBatches recipe applied to
    * a neural net). */
  object KText {
    def q6s(x: Double): Double = math.floor(x * 1000000d + 0.5) / 1000000d
    /** Weight names in canonical order: W (H×k row-major), b, v, cc. */
    def wNames(k: Int, hidden: Int): Seq[String] =
      (for { h <- 0 until hidden; j <- 0 until k }
        yield s"w_${h}_$j") ++
        (0 until hidden).map(h => s"b_$h") ++
        (0 until hidden).map(h => s"v_$h") :+ "cc"
    /** Deterministic asymmetric init, micros-quantized. */
    def wInit(k: Int, hidden: Int): Seq[Double] =
      (for { h <- 0 until hidden; j <- 0 until k }
        yield q6s(((h * 5 + j * 3 + 1) % 13) / 13.0 - 0.5)) ++
        (0 until hidden).map(h => q6s(((h * 3 + 2) % 7) / 7.0 - 0.5)) ++
        (0 until hidden).map(h => q6s(0.6 - 0.2 * h)) :+ 0.0
    /** Quantized tanh activation of hidden unit h (exp identity). */
    def aTxt(k: Int, h: Int): String = {
      val z = ((0 until k).map(j => s"w_${h}_$j * x${j + 1}") :+
        s"b_$h").mkString(" + ")
      val e2 = s"exp(2.0 * ($z))"
      s"(floor(($e2 - 1.0) / ($e2 + 1.0) * 1000000 + 0.5) / 1000000)"
    }
    def oTxt(k: Int, hidden: Int): String =
      s"(${(0 until hidden).map(h => s"v_$h * ${aTxt(k, h)}")
        .mkString(" + ")} + cc)"
    def rTxt(k: Int, hidden: Int): String = s"(${oTxt(k, hidden)} - y)"
    def dhTxt(k: Int, hidden: Int, h: Int): String =
      s"(${rTxt(k, hidden)} * v_$h * " +
        s"(1.0 - ${aTxt(k, h)} * ${aTxt(k, h)}))"
    /** Order-free exact micros sum. */
    def mic(e: String): String =
      s"CAST(sum(CAST(floor(($e) * 1000000 + 0.5) AS BIGINT))" +
        " AS DOUBLE) / 1000000"
    /** (gradientName, micros-sum text) in [[wNames]] order + loss. */
    def grads(k: Int, hidden: Int): Seq[(String, String)] = {
      val r = rTxt(k, hidden)
      ((for { h <- 0 until hidden; j <- 0 until k }
        yield s"g_w_${h}_$j" ->
          mic(s"${dhTxt(k, hidden, h)} * x${j + 1}")) ++
        (0 until hidden).map(h => s"g_b_$h" -> mic(dhTxt(k, hidden, h))) ++
        (0 until hidden).map(h => s"g_v_$h" ->
          mic(s"$r * ${aTxt(k, h)}")) :+
        ("g_cc" -> mic(r))) :+ ("loss" -> mic(s"$r * $r"))
    }
    def upd(wn: String, g: String, eta: String): String =
      s"floor((($wn) - $eta * ($g / n)) * 1000000 + 0.5) / 1000000"
  }

  /** MLP regression at ANY topology — k inputs → `hidden` tanh units
    * → 1 linear output, lifting [[mlpFit221]]'s 2-2-1 ceiling (MADlib
    * `mlp` takes an arbitrary layer spec). Same full-batch GD / MSE
    * restatement; the weight state is a 1-ROW RELATION crossJoined
    * back as a broadcast each round (the svmFitK shape) — no driver
    * collect at all, an upgrade on mlpFit221's driver-held weights.
    * Every per-row gradient term quantizes to integer micros before
    * the order-free sum; weights micros-quantize per update, so both
    * engines iterate on identical state ([[KText]] shares the exact
    * expression text with the oracle).
    *
    * Scale: per round ONE aggregate over a persisted projection;
    * shuffled state is H(k+2)+1 doubles. Lineage cut per round.
    * Returns one row: weights in [[KText.wNames]] order + final
    * pre-update mse + n. */
  def mlpFitK(
      df: DataFrame, yCol: String, xCols: Seq[String], hidden: Int,
      eta: String, iterations: Int): DataFrame = {
    require(hidden >= 1 && iterations >= 1)
    val k = xCols.length
    val rows = df.select(xCols.zipWithIndex.map { case (c, j) =>
      col(c).cast("double").as(s"x${j + 1}") } :+
      col(yCol).cast("double").as("y"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    KernelCaches.register(rows)
    val spark = df.sparkSession
    import spark.implicits._
    val names = KText.wNames(k, hidden)
    // 1-row weight state driver-ferried between rounds (r9): the
    // broadcast build already collected the row to the driver every
    // round inside BroadcastExchange — the explicit ferry is the same
    // bytes without the per-round eager-checkpoint job. Exact binary
    // round-trip; the [[KText]] expression strings are unchanged, so
    // cross-engine state stays bit-identical.
    val outSchema = org.apache.spark.sql.types.StructType(
      names.map(n => org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.DoubleType)) ++
        Seq(org.apache.spark.sql.types.StructField("mse",
          org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType)))
    var outRow: org.apache.spark.sql.Row = org.apache.spark.sql.Row
      .fromSeq(KText.wInit(k, hidden) ++ Seq(0.0, 0L))
    def outDf(): DataFrame = spark.createDataFrame(
      java.util.Collections.singletonList(outRow), outSchema)
    for (_ <- 1 to iterations) {
      val joined = rows.crossJoin(
        broadcast(outDf().select(names.map(col): _*)))
      val aggs = expr("CAST(count(*) AS DOUBLE)").as("n") +:
        KText.grads(k, hidden).map { case (g, t) => expr(t).as(g) }
      val g = joined.groupBy(names.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
      outRow = g.select(names.map(wn =>
        expr(KText.upd(wn, s"g_$wn", eta)).as(wn)) ++
        Seq((col("loss") / col("n")).as("mse"),
          expr("CAST(n AS BIGINT)").as("n")): _*)
        .head()
    }
    outDf()
  }

  /** DuckDB oracle for [[mlpFitK]] — the identical [[KText]] strings
    * unrolled as CTE rounds (the q_ml_mlp shape at any topology).
    * `xExprs`/`yExpr` are SQL over `table` matching the Spark
    * feature construction. */
  def mlpKOracleSql(
      table: String, yExpr: String, xExprs: Seq[String], hidden: Int,
      eta: String, iterations: Int): String = {
    val k = xExprs.length
    val names = KText.wNames(k, hidden)
    val w0 = names.zip(KText.wInit(k, hidden))
      .map { case (nm, v) => s"CAST($v AS DOUBLE) AS $nm" }
      .mkString(",\n    ")
    val rounds = (1 to iterations).map { i =>
      s"""g$i AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |    ${KText.grads(k, hidden).map { case (g, t) =>
        s"$t AS $g" }.mkString(",\n    ")}
         |  FROM rows CROSS JOIN w${i - 1}),
         |w$i AS MATERIALIZED (SELECT
         |    ${names.map(wn =>
        s"${KText.upd(wn, s"g_$wn", eta)} AS $wn").mkString(",\n    ")},
         |    loss / n AS mse, CAST(n AS BIGINT) AS nn
         |  FROM w${i - 1} CROSS JOIN g$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH rows AS MATERIALIZED (SELECT
       |    ${xExprs.zipWithIndex.map { case (e, j) =>
      s"CAST($e AS DOUBLE) AS x${j + 1}" }.mkString(",\n    ")},
       |    CAST($yExpr AS DOUBLE) AS y FROM $table),
       |w0 AS (SELECT $w0),
       |$rounds
       |SELECT ${names.mkString(", ")}, mse, nn AS n
       |FROM w$iterations""".stripMargin
  }
}
