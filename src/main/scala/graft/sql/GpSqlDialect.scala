package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** GPDB DDL dialect shim (SURVEY §3.4 / §7.3): accepts the MPP clauses of
  * `CREATE TABLE` — `DISTRIBUTED BY (cols)` / `DISTRIBUTED RANDOMLY` /
  * `DISTRIBUTED REPLICATED` (reference: src/include/catalog/gp_policy.h:99-124,
  * grammar src/backend/parser/gram.y) and storage options
  * `WITH (appendonly=…, orientation=…, compresstype=…, blocksize=…)`
  * (reference: src/backend/access/common/reloptions.c:1195) — and lowers
  * them onto Spark physics:
  *
  *  - hash distribution → `repartition(cols)` on write (HashPartitioning);
  *  - random            → round-robin `repartition(n)`;
  *  - replicated        → a broadcast hint at read time;
  *  - storage options   → Parquet writer options (AOCS ≈ Parquet; zlib/zstd
  *                        → parquet codec), otherwise recorded as table
  *                        properties (compatibility no-ops).
  */
object GpSqlDialect {

  final case class GpDdl(
      cleanSql: String,
      distributionCols: Seq[String],
      randomlyDistributed: Boolean,
      replicated: Boolean,
      storageOptions: Map[String, String])

  private val Ctas =
    "(?is)^\\s*CREATE\\s+TABLE\\s+(\\w+)\\s+AS\\s+(SELECT.*)$".r
  private val DistBy = "(?is)\\bDISTRIBUTED\\s+BY\\s*\\(([^)]*)\\)".r
  private val DistRandom = "(?is)\\bDISTRIBUTED\\s+RANDOMLY\\b".r
  private val DistRepl = "(?is)\\bDISTRIBUTED\\s+REPLICATED\\b".r
  private val WithOpts = "(?is)\\bWITH\\s*\\(([^)]*)\\)".r

  /** Split a GP CREATE TABLE into ANSI SQL + the MPP physical hints. */
  def parse(sql: String): GpDdl = {
    val cols = DistBy.findFirstMatchIn(sql)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val opts = WithOpts.findFirstMatchIn(sql)
      .map(_.group(1).split(",").flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase -> v.trim.toLowerCase)
          case _ => None
        }
      }.toMap).getOrElse(Map.empty)
    val clean = Seq(DistBy, DistRandom, DistRepl, WithOpts)
      .foldLeft(sql)((s, re) => re.replaceAllIn(s, ""))
      .replaceAll("\\s+", " ").trim
    GpDdl(clean, cols,
      DistRandom.findFirstIn(sql).isDefined,
      DistRepl.findFirstIn(sql).isDefined, opts)
  }

  /** Parquet codec for a GP compresstype (zlib → gzip; quicklz has no
    * parquet analogue → snappy; none → uncompressed). */
  def parquetCodec(ddl: GpDdl): String =
    ddl.storageOptions.getOrElse("compresstype", "zstd") match {
      case "zlib" => "gzip"
      case "none" => "uncompressed"
      case "zstd" => "zstd"
      case _ => "snappy"
    }

  /** GP surfaces with no Spark analogue (SURVEY §7.3 documented gaps):
    * rejected loudly rather than silently misexecuted. */
  private val Unsupported: Seq[(scala.util.matching.Regex, String)] = Seq(
    "(?is)\\bFOR\\s+UPDATE\\b".r ->
      "FOR UPDATE row locks (no lock manager; Spark has no row locks)",
    "(?is)\\bCREATE\\s+(UNIQUE\\s+)?INDEX\\b".r ->
      "CREATE INDEX (use Parquet min/max + filter pushdown instead)",
    "(?is)\\bCREATE\\s+TRIGGER\\b".r -> "CREATE TRIGGER (no trigger engine)",
    "(?is)\\bDECLARE\\s+\\w+\\s+CURSOR\\b".r ->
      "cursors (use Dataset.toLocalIterator)")

  def rejectUnsupported(sql: String): Unit =
    Unsupported.foreach { case (re, why) =>
      if (re.findFirstIn(sql).isDefined)
        throw new UnsupportedOperationException(s"graft does not support $why")
    }

  /** Execute a GP-dialect SQL string end-to-end. `CREATE TABLE t
    * [WITH(...)] [DISTRIBUTED ...] AS SELECT ...` runs the select, writes
    * the table with the lowered physics under `basePath/t`, and registers
    * temp view `t`; anything else passes through `spark.sql` with the GP
    * clauses stripped. */
  def execute(
      spark: SparkSession, gpSql: String, basePath: String): DataFrame = {
    rejectUnsupported(gpSql)
    val ddl = parse(gpSql)
    ddl.cleanSql match {
      case Ctas(name, select) =>
        val written = createTableAs(
          spark, ddl, spark.sql(select), s"$basePath/$name")
        written.createOrReplaceTempView(name)
        written
      case other => spark.sql(other)
    }
  }

  /** CTAS with GP physics: repartition per the distribution policy, write
    * Parquet with the mapped codec. Returns the re-read table. */
  def createTableAs(
      spark: SparkSession, ddl: GpDdl, select: DataFrame,
      path: String): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val distributed =
      if (ddl.distributionCols.nonEmpty)
        select.repartition(parts,
          ddl.distributionCols.map(select.col): _*)
      else if (ddl.randomlyDistributed) select.repartition(parts)
      else select
    distributed.write.mode("overwrite")
      .option("compression", parquetCodec(ddl))
      .parquet(path)
    val back = spark.read.parquet(path)
    if (ddl.replicated) back.hint("broadcast") else back
  }
}
