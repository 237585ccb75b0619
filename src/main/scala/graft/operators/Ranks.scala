package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global ranking primitives.
  *
  * GP evaluates `rank() OVER (ORDER BY x)` by redistributing the whole
  * relation through a merge-gather motion; Spark's unpartitioned window
  * does the same through ONE task — the classic scale cliff. The
  * alternative here is the [[Packing]] prefix-sum shape: range-partition
  * by the order key, one in-partition pass accumulates local counts,
  * and only the per-partition totals (numPartitions longs) visit the
  * driver before broadcasting back as partition bases.
  */
object Ranks {

  /** Exclusive prefix sum over rows ordered by `orderCol`: appends
    * `below` = Σ `cntCol` of all rows with a STRICTLY smaller
    * `orderCol`. Input rows must be unique in `orderCol` (aggregate
    * first — ties share one row); all other columns pass through.
    *
    * From `below` the standard rank family falls out in exact integer
    * space: rank = below + 1, dense-rank via row position, midrank
    * (average tie rank) = (2·below + cnt + 1) / 2.
    */
  def cumBelow(perKey: DataFrame, orderCol: String, cntCol: String)
      : DataFrame = {
    val spark = perKey.sparkSession
    val parts = math.max(perKey.rdd.getNumPartitions, 1)
    val sorted = perKey
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
    val inSchema = sorted.schema
    val cntIdx = inSchema.fieldIndex(cntCol)
    val outSchema = inSchema
      .add(StructField("__pid", IntegerType, false))
      .add(StructField("__cum", LongType, false))
    val localRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = 0L
      it.map { r =>
        cum += r.getLong(cntIdx)
        Row.fromSeq(r.toSeq :+ pid :+ cum)
      }
    }
    val local = spark.createDataFrame(localRdd, outSchema).cache()
    KernelCaches.register(local)
    // per-partition totals → exclusive prefix = each partition's base
    val totals = local.groupBy("__pid").agg(max("__cum").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var running = 0L
    val bases = totals.map { case (pid, tot) =>
      val b = running; running += tot; Row(pid, b)
    }
    val baseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(bases.toSeq, 1),
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__pbase", LongType, false))))
    local.join(broadcast(baseDf), "__pid")
      .withColumn("below", col("__pbase") + col("__cum") - col(cntCol))
      .drop("__pid", "__cum", "__pbase")
  }

  /** Per-GROUP exclusive prefix sum: appends `below` = Σ `cntCol` of
    * rows in the same `grpCol` group with a strictly smaller
    * `orderCol`, and `__gtotal` = the group's grand total. Input rows
    * must be unique in (grpCol, orderCol).
    *
    * This is the few-groups × huge-rows rank-selection kernel
    * (reference orderedsetaggs.c:542 percentile_cont's sorted spool,
    * distributed): range-partitioning by (group, value) keeps
    * parallelism ∝ value spread — a per-group window sort would
    * collapse to |groups| tasks, and a buffered aggregate would hold a
    * group's every value in one executor. Driver traffic is the
    * per-(partition, group) totals — parts × |groups| longs,
    * catalog-scale in the regime this kernel exists for. */
  def cumBelowGrouped(perKey: DataFrame, grpCol: String, orderCol: String,
      cntCol: String): DataFrame = {
    val spark = perKey.sparkSession
    val parts = math.max(perKey.rdd.getNumPartitions, 1)
    val sorted = perKey
      .repartitionByRange(parts, col(grpCol), col(orderCol))
      .sortWithinPartitions(grpCol, orderCol)
    val inSchema = sorted.schema
    val cntIdx = inSchema.fieldIndex(cntCol)
    val grpIdx = inSchema.fieldIndex(grpCol)
    val outSchema = inSchema
      .add(StructField("__pid", IntegerType, false))
      .add(StructField("__cum", LongType, false))
    val localRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = 0L
      var cur: Any = null
      var started = false
      it.map { r =>
        val gv = r.get(grpIdx)
        if (!started || gv != cur) { cum = 0L; cur = gv; started = true }
        cum += r.getLong(cntIdx)
        Row.fromSeq(r.toSeq :+ pid :+ cum)
      }
    }
    val local = spark.createDataFrame(localRdd, outSchema).cache()
    KernelCaches.register(local)
    // per-(partition, group) totals → per-group exclusive prefix over
    // partition order + group grand total, broadcast back
    val totals = local.groupBy(col("__pid"), col(grpCol))
      .agg(max("__cum").as("tot")).collect()
    val baseRows = totals.groupBy(_.get(1)).toSeq.flatMap { case (gv, rs) =>
      val ordered = rs.map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1)
      val n = ordered.map(_._2).sum
      var running = 0L
      ordered.map { case (pid, tot) =>
        val b = running; running += tot; Row(pid, gv, b, n)
      }
    }
    val baseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(baseRows, 1),
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__bg", inSchema(grpIdx).dataType, true),
        StructField("__pbase", LongType, false),
        StructField("__gtotal", LongType, false))))
    local.join(broadcast(baseDf),
      local("__pid") === baseDf("__pid") && local(grpCol) <=> baseDf("__bg"))
      .withColumn("below", col("__pbase") + col("__cum") - col(cntCol))
      .drop("__pid", "__cum", "__pbase", "__bg")
  }
}
