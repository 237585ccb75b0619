package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-sequence packing — the step between a deduped corpus and a
  * fixed-context training set (extension; the reference stops at SQL.
  * Packing follows the GPT-style data pipeline: concatenate documents
  * in a deterministic order into one token stream, cut every `budget`
  * tokens).
  *
  * The core primitive is a distributed prefix sum. A naive
  * `sum(...) over (ORDER BY id)` window moves the whole corpus through
  * ONE partition — the classic scale cliff. Instead: range-partition by
  * id, one in-partition pass accumulates local offsets, the per-
  * partition totals (numPartitions longs — catalog-scale) prefix-sum on
  * the driver and broadcast back as each partition's base. Same shape
  * as SequenceOps.assignIds.
  */
object Packing {

  /** For each document: its global token offset in the concatenated
    * stream and the first/last training sequence (of `budget` tokens)
    * it lands in. Zero-token documents pin to the sequence at their
    * offset. Output: (doc_id, n_tok, tok_start, seq_first, seq_last).
    */
  def packSequences(
      docs: DataFrame, idCol: String, tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = docs.sparkSession
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      tokensCol.cast("long").as("n_tok"))
    val parts = math.max(base.rdd.getNumPartitions, 1)
    val sorted = base
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
    // in-partition running totals: one imperative pass, no shuffle
    val localSchema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("n_tok", LongType, false),
      StructField("pid", IntegerType, false),
      StructField("local_cum", LongType, false)))
    val localRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = 0L
      it.map { r =>
        cum += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), pid, cum)
      }
    }
    val local = spark.createDataFrame(localRdd, localSchema).cache()
    KernelCaches.register(local)
    // per-partition totals → exclusive prefix = each partition's base
    val totals = local.groupBy("pid").agg(max("local_cum").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var running = 0L
    val bases = totals.map { case (pid, tot) =>
      val b = running; running += tot; Row(pid, b)
    }
    val baseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(bases.toSeq, 1),
      StructType(Seq(StructField("pid", IntegerType, false),
        StructField("pbase", LongType, false))))
    val start = col("pbase") + col("local_cum") - col("n_tok")
    local.join(broadcast(baseDf), "pid")
      .select(col("doc_id"), col("n_tok"),
        start.as("tok_start"),
        floor(start / lit(budget.toDouble)).cast("long").as("seq_first"),
        greatest(
          floor((col("pbase") + col("local_cum") - 1) / lit(budget.toDouble)),
          floor(start / lit(budget.toDouble))).cast("long").as("seq_last"))
  }
}
