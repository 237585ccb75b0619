package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev probe (contents rotate per investigation). Currently: where do
  * the DML statement-interpreter's Spark JOBS come from — per-statement
  * write/commit, scalar evaluation, view refresh, or count passes?
  * Prints every job's call site while a DO-block loop runs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val names = j.stageInfos.map(_.name.takeWhile(_ != '(')).mkString("|")
        jobs.add(f"job ${j.jobId}%4d  stages=${j.stageInfos.size}%2d  $names")
      }
    })
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    graft.Tables.registerAll(spark, "/root/testdata/sf0.1")
    val base = System.getProperty("java.io.tmpdir") + "/graft_scratch_probe"
    def run(sql: String) = graft.sql.GpSqlDialect.execute(spark, sql, base)

    // ---- scalar eval: does a literal SELECT launch a job? ----
    t("warm")(run("SELECT 1").collect())
    jobs.clear()
    t("literal scalar eval")(
      run("SELECT (CASE WHEN ((1) > 4) THEN TRUE ELSE FALSE END) AS __v")
        .collect())
    println(s"[probe] literal-eval jobs: ${jobs.size}")
    jobs.forEach(j => println(s"[job] $j"))
    jobs.clear()
    val probe = run("SELECT (CASE WHEN ((1) > 4) THEN TRUE ELSE FALSE END) AS __v")
    val op = probe.queryExecution.optimizedPlan
    println("[plan] optimized: " + op.getClass.getName + " :: " +
      op.toString.replace("\n", " / "))
    op.children.foreach(c =>
      println("[plan] child: " + c.getClass.getName))
    op match {
      case org.apache.spark.sql.catalyst.plans.logical.Project(exprs, ch) =>
        println("[plan] proj exprs foldable: " + exprs.map(_.foldable) +
          " child=" + ch.getClass.getName)
      case _ => println("[plan] not a Project")
    }
    println("[plan] executed: " +
      probe.queryExecution.executedPlan.getClass.getSimpleName)
    t("plain spark.sql literal")(
      spark.sql("SELECT (CASE WHEN ((1) > 4) THEN TRUE ELSE FALSE END) AS __v")
        .collect())
    println(s"[probe] plain-sql-eval jobs: ${jobs.size}")
    jobs.clear()

    // ---- the loop_label DO block, job-attributed ----
    run("DROP TABLE IF EXISTS lbl_out")
    run("CREATE TABLE lbl_out (i bigint, j bigint) DISTRIBUTED BY (i)")
    jobs.clear()
    t("loop_label DO block") {
      run("""DO $$
            |DECLARE
            |  i bigint := 0;
            |  j bigint := 0;
            |BEGIN
            |  <<outer>>
            |  LOOP
            |    i := i + 1;
            |    EXIT outer WHEN i > 4;
            |    j := 0;
            |    <<inner>>
            |    LOOP
            |      j := j + 1;
            |      EXIT inner WHEN j > 4;
            |      CONTINUE outer WHEN i * j > 5;
            |      INSERT INTO lbl_out VALUES (i, j);
            |    END LOOP inner;
            |  END LOOP outer;
            |END $$""".stripMargin)
    }
    Thread.sleep(500)
    println(s"[probe] DO-block jobs: ${jobs.size}")
    jobs.forEach(j => println(s"[job] $j"))
    jobs.clear()

    // ---- one single-row INSERT, phase-timed ----
    t("single INSERT")(run("INSERT INTO lbl_out VALUES (9, 9)"))
    Thread.sleep(300)
    println(s"[probe] single-INSERT jobs: ${jobs.size}")
    jobs.forEach(j => println(s"[job] $j"))
    jobs.clear()

    // ---- one DELETE, phase-timed ----
    t("single DELETE")(run("DELETE FROM lbl_out WHERE i = 9"))
    Thread.sleep(300)
    println(s"[probe] single-DELETE jobs: ${jobs.size}")
    jobs.forEach(j => println(s"[job] $j"))
    spark.stop()
  }
}
