package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for plan experiments (not part of the
  * driver contract; deleted or repurposed freely between sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scratch")
    import spark.implicits._

    // One round of the Components loop, built exactly like the
    // operator, to verify the pre-partitioned checkpoints make the
    // pull join and the merge join-back exchange-free.
    val src = (1L to 200000L).toDF("src")
      .withColumn("dst", ($"src" * 31L) % 200000L)
    val edges = src
      .union(src.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .repartition($"src")
      .localCheckpoint(eager = true)
    val labels = edges.select($"src".as("id")).distinct()
      .withColumn("component", $"id")
      .localCheckpoint(eager = true)

    val pulledMin = edges
      .join(labels, edges("src") === labels("id"))
      .groupBy(edges("dst").as("id"))
      .agg(min($"component").as("pcomp"))
    val minned = labels
      .join(pulledMin, Seq("id"), "left")
      .select($"id", least($"component", $"pcomp").as("component"))
    println("=== one-round plan ===")
    minned.explain("formatted")
    spark.stop()
  }
}
