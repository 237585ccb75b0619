package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Broadcast all-pairs kernels — the "corpus fits in executor memory"
  * brute-force baselines for similarity/dedup scoring (the spec's
  * baseline path; LSH bucketing in [[Similarity]]/[[Dedup]] is the
  * 100 TB path). The corpus is compacted to primitive arrays, broadcast
  * once, and each task scores an interleaved stripe of the triangle —
  * ~100 ns/pair instead of the µs-scale interpreted expression path.
  *
  * Numeric contract: accumulation is in ascending index order with
  * double precision — bit-identical to the declarative expressions
  * (and the DuckDB oracles) they accelerate.
  */
object PairKernels {

  /** Row indices striped over tasks: task s gets rows s, s+S, s+2S, … so
    * the triangular workload (row i scores n−i pairs) balances instead of
    * the first contiguous block owning the widest rows. */
  private def stripes(spark: SparkSession, n: Int) = {
    val slices = math.min(n max 1, 64)
    val interleaved = (0 until slices).flatMap(s => s until n by slices)
    spark.sparkContext.parallelize(interleaved, slices)
  }

  /** All pairs (i<j) with cosine ≥ threshold. */
  def cosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = df
      .select(col(idCol).cast("long"), col(vecCol).cast(ArrayType(FloatType)))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val norms = data.map { case (_, v) =>
      var s = 0.0; var k = 0
      while (k < v.length) { s += v(k).toDouble * v(k).toDouble; k += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((data, norms))
    stripes(spark, data.length).flatMap { i =>
      val (d, nrm) = bc.value
      val (idA, va) = d(i)
      val out = Iterator.range(i + 1, d.length).flatMap { j =>
        val (idB, vb) = d(j)
        var s = 0.0; var k = 0
        while (k < va.length) { s += va(k).toDouble * vb(k).toDouble; k += 1 }
        val cos = s / (nrm(i) * nrm(j))
        if (cos >= threshold) Some((idA, idB, cos)) else None
      }
      out
    }.toDF("id_a", "id_b", "cos")
  }

  /** All pairs (i<j) sharing ≥1 token with exact set-Jaccard ≥ threshold.
    * Token sets are dictionary-encoded to sorted int arrays on the driver
    * (the dictionary is the corpus vocabulary — this path presumes it
    * fits; the inverted-index join in [[Dedup.jaccardPairs]] does not). */
  def jaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sets = df.select(col(idCol).cast("long"),
        TextAnalysis.tokenSet(col(textCol)))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    val vocab = sets.iterator.flatMap(_._2).toSet.toArray.sorted
    val dict = vocab.zipWithIndex.toMap
    val enc: Array[(Long, Array[Int])] = sets.map { case (id, ts) =>
      (id, ts.map(dict).toArray.sorted)
    }
    val bc = spark.sparkContext.broadcast(enc)
    stripes(spark, enc.length).flatMap { i =>
      val d = bc.value
      val (idA, a) = d(i)
      Iterator.range(i + 1, d.length).flatMap { j =>
        val (idB, b) = d(j)
        // sorted-merge intersection count
        var x = 0; var y = 0; var inter = 0
        while (x < a.length && y < b.length) {
          if (a(x) == b(y)) { inter += 1; x += 1; y += 1 }
          else if (a(x) < b(y)) x += 1 else y += 1
        }
        if (inter == 0) None
        else {
          val jac = inter.toDouble / (a.length + b.length - inter)
          if (jac >= threshold) Some((idA, idB, jac)) else None
        }
      }
    }.toDF("id_a", "id_b", "jaccard")
  }

  /** All pairs (i<j) of (id, simhash) with hamming distance ≤ maxDist. */
  def hammingPairs(
      sigs: DataFrame, idCol: String, sigCol: String,
      maxDist: Int): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val data = sigs.select(col(idCol).cast("long"), col(sigCol).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(data)
    stripes(spark, data.length).flatMap { i =>
      val d = bc.value
      val (idA, sa) = d(i)
      Iterator.range(i + 1, d.length).flatMap { j =>
        val (idB, sb) = d(j)
        val h = java.lang.Long.bitCount(sa ^ sb)
        if (h <= maxDist) Some((idA, idB, h)) else None
      }
    }.toDF("id_a", "id_b", "hamming")
  }
}
