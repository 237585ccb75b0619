package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** External-table surface (SURVEY §2.1): the reference reads external
  * data through `CREATE EXTERNAL TABLE` + COPY with single-row error
  * handling (`SEGMENT REJECT LIMIT`, reference:
  * src/backend/executor/nodeExternalscan.c:202, commands/copy.c:959,
  * error tables cdb/cdbsreh.c). Spark mapping: `spark.read.csv` in
  * PERMISSIVE mode with a corrupt-record column; the reject limit is a
  * post-scan count gate.
  */
object ExternalTables {

  final case class RejectLimitExceeded(rejected: Long, limit: Long)
    extends RuntimeException(
      s"external scan rejected $rejected rows (limit $limit)")

  /** Read CSV with COPY-style reject handling: malformed rows are counted
    * (and dropped) rather than failing the scan; reaching `rejectLimit`
    * bad rows in any one partition fails the load during the scan, like
    * `SEGMENT REJECT LIMIT` does per segment (cdbsreh.c:367 errors when
    * rejectcount >= rejectlimit) — one streaming pass, no cache of the
    * full scan, no driver-side count job. The failure surfaces when the
    * returned frame is first materialized (GP likewise errors mid-load,
    * not at parse time). `rejectLimit` 0 ⇒ no tolerance (plain COPY). */
  def readCsvWithRejectLimit(
      spark: SparkSession, path: String, schema: StructType,
      rejectLimit: Long, header: Boolean = true): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
    val corruptIdx = withCorrupt.fieldIndex("_corrupt_record")
    raw.mapPartitions { it =>
      var rejected = 0L
      it.flatMap { r =>
        if (!r.isNullAt(corruptIdx)) {
          rejected += 1
          if (rejected >= rejectLimit.max(1L))
            throw RejectLimitExceeded(rejected, rejectLimit)
          Iterator.empty
        } else Iterator.single(r)
      }
    }(org.apache.spark.sql.Encoders.row(withCorrupt))
      .drop("_corrupt_record")
  }

  /** COPY ... LOG ERRORS (error tables, cdb/cdbsreh.c; read back with
    * gp_read_error_log): malformed rows are PERSISTED to an error-log
    * relation instead of silently dropped, then the reject gate applies.
    * Routing one scan to two sinks needs the raw scan cached (released
    * by the pipeline owner via KernelCaches) — the analogue of GP's
    * per-row error-table write during the load. The reject limit here is
    * the global count (the error pass materializes it anyway); the
    * unlogged [[readCsvWithRejectLimit]] keeps the stricter one-pass
    * per-partition gate. */
  def readCsvLogErrors(
      spark: SparkSession, path: String, schema: StructType,
      rejectLimit: Long, errorLogPath: String, relname: String,
      header: Boolean = true): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache()
    graft.operators.KernelCaches.register(raw)
    val corrupt = col("_corrupt_record")
    val errs = raw.filter(corrupt.isNotNull).select(
      current_timestamp().as("cmdtime"),
      lit(relname).as("relname"),
      input_file_name().as("filename"),
      lit("invalid row format").as("errmsg"),
      corrupt.as("rawdata"))
    errs.write.mode("append").parquet(errorLogPath)
    val rejected = errs.count()
    if (rejected >= rejectLimit.max(1L))
      throw RejectLimitExceeded(rejected, rejectLimit)
    raw.filter(corrupt.isNull).drop("_corrupt_record")
  }

  /** gp_read_error_log('relname') over the persisted error relation. */
  def readErrorLog(
      spark: SparkSession, errorLogPath: String,
      relname: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(errorLogPath)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      return spark.emptyDataFrame
    spark.read.parquet(errorLogPath).filter(col("relname") === relname)
  }

  /** Writable external table (reference: fileam.c:705 external_insert):
    * parallel CSV export. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)
}
