package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DML sinks over immutable Parquet — copy-on-write UPDATE / DELETE /
  * MERGE (reference: nodeModifyTable.c:1771; GP's SplitUpdate — delete+
  * insert when the distribution key changes, nodeSplitUpdate.c:124 — is
  * subsumed by the rewrite: every update rewrites the row wherever its
  * new partition lands).
  *
  * Scale notes: the rewrite is a full-table dataflow (filter/transform →
  * write), which is exactly what copy-on-write lakehouse formats do per
  * touched file; at 100 TB you'd partition the table and rewrite only
  * affected partitions (the dataflow here is identical per partition).
  * The tmp-dir + rename swap keeps readers from observing a half-written
  * table. */
object Dml {

  /** Atomically replace the table at `path` with `next`. */
  private def overwriteInPlace(
      spark: SparkSession, path: String, next: DataFrame): Unit = {
    val tmp = path + ".cow-tmp"
    next.write.mode("overwrite").parquet(tmp)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    if (!fs.rename(new Path(tmp), new Path(path)))
      throw new java.io.IOException(s"rename $tmp -> $path failed")
  }

  /** DELETE FROM path WHERE cond (SQL semantics: rows where cond is
    * null are kept). */
  def deleteWhere(spark: SparkSession, path: String, cond: Column): Unit = {
    val df = spark.read.parquet(path)
    overwriteInPlace(spark, path, df.filter(!coalesce(cond, lit(false))))
  }

  /** UPDATE path SET assignments WHERE cond. */
  def updateWhere(
      spark: SparkSession, path: String,
      assignments: Map[String, Column], cond: Column): Unit = {
    val df = spark.read.parquet(path)
    val updated = df.select(df.columns.map { c =>
      assignments.get(c) match {
        case Some(v) => when(coalesce(cond, lit(false)), v)
          .otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    overwriteInPlace(spark, path, updated)
  }

  /** MERGE INTO path USING source ON key: matched rows take the source's
    * values, unmatched source rows are inserted, other target rows kept.
    * Source must have the target's schema. */
  def mergeInto(
      spark: SparkSession, path: String, source: DataFrame,
      key: String): Unit = {
    val target = spark.read.parquet(path)
    val cols = target.columns
    // presence of the source key marks a matched-or-inserted row; using it
    // (not per-column coalesce) lets a source row legitimately write NULL
    val merged = target.alias("t")
      .join(source.alias("s"), target(key) === source(key), "full_outer")
      .select(cols.map { c =>
        when(col(s"s.$key").isNotNull, col(s"s.$c"))
          .otherwise(col(s"t.$c")).as(c)
      }: _*)
    overwriteInPlace(spark, path, merged)
  }
}
