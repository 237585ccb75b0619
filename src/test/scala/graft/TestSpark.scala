package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite (single forked test JVM). */
object TestSpark {
  val sf: String = "/root/testdata/sf0.001"
  val sf01: String = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.configure(s)
  }
}
