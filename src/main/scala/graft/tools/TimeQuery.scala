package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time (and optionally explain) a single query.
  *   sbt "runMain graft.tools.TimeQuery q_dedup_minhash /root/testdata/sf0.1 [explain]"
  * Runs prepare untimed, one warm-up, then N timed noop-sink runs.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explain = args.contains("explain")
    val spark = GraftSession.builder("graft-timequery")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)
    val q = SparkEntry.allQueries.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    q.prepare.foreach(_(spark, sfDir))
    if (explain) q.query(spark, sfDir).explain("formatted")
    def once(): Double = {
      val t0 = System.nanoTime()
      q.query(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val warm = once()
    val runs = Seq(once(), once())
    println(f"TIMEQUERY $name warm=$warm%.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    spark.stop()
  }
}
