package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scratch")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    t("warm")(docs.count())
    // stage 1: shingles
    val toked = docs.select(col("doc_id").cast("long").as("id"),
      graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
    val nSh = greatest(size(col("toks")) - 2, lit(0))
    val base = toked.select(col("id"),
      array_distinct(transform(sequence(lit(1), nSh),
        i => concat_ws(" ", slice(col("toks"), i, lit(3))))).as("ts"))
      .filter(size(col("ts")) > 0)
    t("base")(base.write.format("noop").mode("overwrite").save())
    val inv = base.select(col("id"), explode(col("ts")).as("tok"))
    val dfreq = inv.groupBy("tok").agg(count(lit(1)).as("dfq"))
    val dict = dfreq.orderBy("dfq", "tok")
      .select(col("tok"), col("dfq"), monotonically_increasing_id().as("tid")).cache()
    t("dict")(dict.count())
    val tids = inv.join(dict.select("tok", "tid"), "tok")
      .groupBy("id").agg(sort_array(collect_list(col("tid"))).as("tids"))
      .withColumn("n", size(col("tids"))).cache()
    t("tids")(tids.count())
    val prefLen = greatest(lit(1), (col("n") - floor(lit(0.8) * col("n")) + 1).cast("int"))
    val aPref = tids.select(col("id").as("id_a"), explode(slice(col("tids"), lit(1), prefLen)).as("tid"))
    val bAll = tids.select(col("id").as("id_b"), explode(col("tids")).as("tid"))
    val pairs = aPref.join(bAll, "tid").filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    t("pairs")(println("pairs=" + pairs.count()))
    val verified = pairs
      .join(tids.select(col("id").as("id_a"), col("tids").as("t_a"), col("n").as("na")), "id_a")
      .join(tids.select(col("id").as("id_b"), col("tids").as("t_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("t_a"), col("t_b"))).as("inter"), col("na"))
      .withColumn("containment", col("inter").cast("double") / col("na"))
      .filter(col("containment") >= 0.8)
    t("verified")(println("verified=" + verified.count()))
    spark.stop()
  }
}
