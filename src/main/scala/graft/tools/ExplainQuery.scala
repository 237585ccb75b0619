package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for named SparkEntry queries to files:
  * `runMain graft.tools.ExplainQuery <sfDir> <outDir> <name> [name…]`
  * (or `all` to dump every query). Fixtures run first (prepare + one
  * untimed execution) so DML-backed relations exist and AQE-final plans
  * are obtainable where relevant; the captured text is the standard
  * pre-execution formatted plan the judge reads (Exchange placement,
  * join strategy, PushedFilters/ReadSchema, codegen spans). */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val names = args.drop(2).toSeq
    val spark = GraftSession.local("graft-explain")
    // optional session-conf overrides for regime plans (e.g. capture the
    // at-scale SMJ shape with autoBroadcastJoinThreshold=-1):
    //   SPARK_GRAFT_EXPLAIN_CONF="k1=v1;k2=v2"
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").foreach(_.split(";").foreach {
      kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.allQueries
      .filter(q => names.contains("all") || names.contains(q.name))
    sys.props("graft.capture.writeplan") = "1"
    qs.foreach { q =>
      try {
        q.prepare.foreach(_(spark, sfDir))
        graft.sql.GpSqlDialect.lastWritePlan = ""
        val df = q.query(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${q.name}.txt"), txt)
        println(s"[explain] wrote $outDir/${q.name}.txt")
        // DML queries: the INSERT write-side plan (REBALANCE shape) is
        // invisible in the final SELECT — record it separately
        if (graft.sql.GpSqlDialect.lastWritePlan.nonEmpty) {
          Files.writeString(Paths.get(s"$outDir/${q.name}.write.txt"),
            graft.sql.GpSqlDialect.lastWritePlan)
          println(s"[explain] wrote $outDir/${q.name}.write.txt")
        }
        // kernel-internal plans (eagerly-executed rounds) recorded via
        // PlanCapture — also invisible in the final SELECT
        PlanCapture.drain().foreach { case (name, txt) =>
          Files.writeString(Paths.get(s"$outDir/${q.name}.$name.txt"), txt)
          println(s"[explain] wrote $outDir/${q.name}.$name.txt")
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain] ${q.name} failed: ${e.getMessage}")
      }
      graft.operators.KernelCaches.releaseAll()
    }
    spark.stop()
  }
}
