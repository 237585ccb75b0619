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
}
