package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ForeignScan (reference: src/backend/executor/nodeForeignscan.c:89,
  * postgres_fdw) — a foreign server bound through Spark's JDBC source.
  * The offline harness has no external database, so the "server" is
  * embedded Derby (on the Spark classpath as the Hive-metastore
  * dependency); the binding — DataFrameWriter.jdbc out,
  * DataFrameReader.jdbc back with filter pushdown into the remote — is
  * the same code path a real postgres_fdw-style federation would use.
  *
  * Scale notes: a JDBC scan is single-stream unless partitioned — pass
  * `partitionColumn`/bounds so Spark issues numPartitions range-predicate
  * queries in parallel (≡ GP segments each pulling a slice of the
  * foreign table). Filters on the scan push down into the remote WHERE
  * clause (PushedFilters on the JDBCRelation).
  */
object ForeignTables {

  def derbyUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  /** Delete an embedded-Derby database directory. A dir abandoned by a
    * killed JVM may fail to boot (stale lock / unclean log) and
    * `mode("overwrite")` cannot recover that — fixtures wipe + recreate. */
  def resetDb(dbDir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dbDir))
  }

  /** Publish `df` to the foreign server (CREATE + INSERT over JDBC). */
  def writeForeign(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite")
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .save()

  /** Bind the foreign table as a Spark relation — the ForeignScan.
    * With `partitionCol` + bounds the scan is issued as `numPartitions`
    * parallel range queries. */
  def readForeign(
      spark: SparkSession, url: String, table: String,
      partitionCol: Option[String] = None,
      lower: Long = 0L, upper: Long = 1L,
      numPartitions: Int = 4): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    partitionCol match {
      case Some(pc) => base
        .option("partitionColumn", pc)
        .option("lowerBound", lower)
        .option("upperBound", upper)
        .option("numPartitions", numPartitions)
        .load()
      case None => base.load()
    }
  }
}
