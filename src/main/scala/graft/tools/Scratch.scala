package graft.tools

import graft.GraftSession

/** Dev probe (contents rotate per investigation). Currently: per-job
  * wall-time attribution for job-count-bound queries — which of the
  * ~28 jobs in a DML loop / ~24 in an ALS round carry the ~120 ms/job
  * floor, and what call sites submit them. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, cs) = jobs.getOrDefault(j.jobId, (0L, "?"))
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $cs")
        }
      })
    val names = if (args.isEmpty) Seq("q_sql_while_data") else args.toSeq
    graft.SparkEntry.allQueries.filter(q => names.contains(q.name)).foreach { q =>
      q.prepare.foreach(_(spark, sf))
      (0 until 2).foreach { it =>
        graft.operators.KernelCaches.releaseAll()
        System.gc()
        val t0 = System.nanoTime()
        q.query(spark, sf).write.format("noop").mode("overwrite").save()
        println(f"[run] ${q.name} iter$it ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
