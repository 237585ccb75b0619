package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev scratch main: print a query's formatted executed plan.
  * `runMain graft.tools.Scratch <sfDir> <name>` */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-scratch")
    args.drop(1).foreach { name =>
      val q = SparkEntry.allQueries.find(_.name == name).get
      q.prepare.foreach(_(spark, sfDir))
      val df = q.query(spark, sfDir)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
