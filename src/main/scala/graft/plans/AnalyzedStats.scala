package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** ANALYZE → planner bridge (the costsize.c role of the reference:
  * commands/analyze.c fills pg_statistic, optimizer/path/costsize.c
  * consumes it; here `GpSqlDialect.executeAnalyze` fills this catalog
  * and [[InjectAnalyzedStats]] hands it to Catalyst).
  *
  * Keyed by parquet root path rather than table name: the dialect
  * resolves tables as temp views over paths and re-registers them
  * freely (DML rewrites, schema changes), and a path key survives all
  * of that — any scan of an analyzed location picks up the stats, no
  * matter which view name or session registered it. Stats go stale on
  * data change until the next ANALYZE, exactly like pg_statistic.
  *
  * With `spark.sql.cbo.enabled` the injected rowCount + per-column
  * NDV/null/min-max drive filter/join cardinality estimation and
  * cost-based join reorder; without ANALYZE nothing is injected and
  * planning falls back to file-size heuristics, so the rule is a
  * strict refinement. The classic win: a heavily-compressed table
  * whose file size looks broadcastable but whose true row count says
  * otherwise no longer gets a hazardous broadcast.
  */
object AnalyzedStats {

  final case class ColStats(
      ndv: Long, nulls: Long, min: Option[String], max: Option[String])
  final case class TableStats(rowCount: Long, cols: Map[String, ColStats])

  private val byPath = TrieMap.empty[String, TableStats]

  /** Normalize a location for keying: drop the file: scheme and any
    * trailing slash so `/tmp/t`, `file:/tmp/t/` and `file:///tmp/t`
    * all collide. */
  def normalize(path: String): String = {
    val noScheme = path.stripPrefix("file://").stripPrefix("file:")
    val trimmed = noScheme.reverse.dropWhile(_ == '/').reverse
    if (trimmed.isEmpty) "/" else trimmed
  }

  def put(path: String, stats: TableStats): Unit =
    byPath.put(normalize(path), stats)

  def get(path: String): Option[TableStats] = byPath.get(normalize(path))

  /** Drop all recorded stats (test hygiene). */
  def clear(): Unit = byPath.clear()

  /** min/max survive the catalog round-trip only for types whose
    * external string form CatalogColumnStat can parse back; strings
    * and friends keep NDV/null counts only (same as Hive behavior). */
  private def minMaxSafe(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | DateType | _: DecimalType => true
    case _ => false
  }

  private[plans] def toCatalogStats(
      ts: TableStats, schema: StructType, sizeInBytes: BigInt): CatalogStatistics = {
    val colStats = schema.fields.flatMap { f =>
      ts.cols.get(f.name).map { c =>
        val (mn, mx) =
          if (minMaxSafe(f.dataType)) (c.min, c.max) else (None, None)
        f.name -> CatalogColumnStat(
          distinctCount = Some(BigInt(c.ndv)),
          min = mn, max = mx,
          nullCount = Some(BigInt(c.nulls)))
      }
    }.toMap
    CatalogStatistics(
      sizeInBytes = sizeInBytes,
      rowCount = Some(BigInt(ts.rowCount)),
      colStats = colStats)
  }
}

/** Attaches ANALYZE-collected statistics to matching parquet scans.
  * Runs in the operator-optimization batch (i.e. before Catalyst's
  * Join Reorder batch, so CostBasedJoinReorder sees the row counts).
  * A synthetic external CatalogTable is the carrier Spark's
  * LogicalRelation.computeStats reads CatalogStatistics from. */
object InjectAnalyzedStats extends Rule[LogicalPlan] {
  import AnalyzedStats._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case lr: LogicalRelation if lr.catalogTable.isEmpty =>
      lr.relation match {
        case hfs: HadoopFsRelation =>
          val hit = hfs.location.rootPaths.iterator
            .map(p => AnalyzedStats.get(p.toString)).collectFirst {
              case Some(ts) => ts
            }
          hit match {
            case Some(ts) =>
              val table = CatalogTable(
                identifier = TableIdentifier("graft_analyzed_scan"),
                tableType = CatalogTableType.EXTERNAL,
                storage = CatalogStorageFormat.empty,
                schema = lr.schema,
                provider = Some("parquet"),
                stats = Some(toCatalogStats(ts, lr.schema, hfs.sizeInBytes)))
              lr.copy(catalogTable = Some(table))
            case None => lr
          }
        case _ => lr
      }
  }
}
