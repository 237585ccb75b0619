package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (extension beyond the reference; the
  * reference's sparse-vector contrib gpcontrib/gp_sparse_vector/
  * sparse_vector.h:125-146 declares svec_dot/svec_l2norm — same algebra,
  * re-expressed as codegen'd array expressions over ArrayType(FloatType)).
  *
  * Scale design: brute-force top-k is one broadcast of the (small) query
  * set against a full corpus scan — linear, no shuffle of the corpus.
  * The LSH variant buckets by random-hyperplane signs so candidate
  * generation is an equi-join on bucket id; recall is traded via the
  * number of planes/tables.
  */
object Similarity {

  /** Element sum a·b in double (index order, deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k by cosine for each query vector: broadcast queries,
    * scan corpus once, per-query window top-k (TakeOrdered per key). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        cosine(col(qVec), col(cVec)).as("cos"))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight from a
    * splitmix-style integer mix — reproducible in plain SQL, no RNG state. */
  def planeWeight(p: Int, d: Int): Double = {
    var z = (p.toLong * 1000003L + d.toLong) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /** Sign-bucket id from `planes` random hyperplanes. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val w = array((0 until dim).map(d => lit(planeWeight(p, d))): _*)
      when(dot(vec, w) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)

  /** ANN top-k: bucket corpus and queries by hyperplane signs, join on
    * bucket (the scale path — one shuffle on a small key), rank within
    * candidates. Exactness is traded for the bucket-join prune. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, planes: Int, dim: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucket(col(qVec), planes, dim))
    val cb = corpus.withColumn("bucket", lshBucket(col(cVec), planes, dim))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId))
    qb.join(cb, "bucket")
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Block-nested self-join at small scale; at 100 TB swap the crossJoin
    * for lshBucket candidate generation (same scoring expression). */
  def nearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
