package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time individual SparkEntry queries in isolation (noop sink, warm-up
  * pass included): `runMain graft.tools.TimeQuery <sfDir> <name> [name…]`.
  * Bench.scala stays the driver-facing sweep; this is the dev loop. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.local("graft-timequery")
    val qs = SparkEntry.allQueries.filter(q => names.contains(q.name))
    qs.foreach { q =>
      q.prepare.foreach(_(spark, sfDir))
      (0 until 3).foreach { it =>
        val t0 = System.nanoTime()
        q.query(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] ${q.name} iter$it ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
