package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic topic modeling — the MADlib `lda` module slot
  * (reference ships MADlib's lda_train for exactly this corpus
  * exploration workload). MADlib trains by collapsed Gibbs sampling,
  * which is sample-order-dependent (non-reproducible across segment
  * layouts); this restates the model as PLSA EM (Hofmann 1999,
  * "Probabilistic Latent Semantic Analysis" — the zero-prior member of
  * the same latent-topic family, and LDA's standard MAP/EM cousin):
  * deterministic batch EM over the doc-word count matrix, the same
  * determinism substitution the SVM/logreg/ALS kernels make over
  * MADlib's IGD.
  *
  * k = 2 topics, which keeps the topic dimension as COLUMNS (no
  * explode): each EM round is ONE equi-join of the count matrix with
  * θ (on doc) and broadcast φ (on word), then two keyed aggregates —
  * per-doc for θ, per-word for φ. The φ normalizer is a 1-row scalar
  * aggregate crossJoined back by broadcast (the θ pattern) — never a
  * partition-less window, which would serialize the whole vocab
  * relation into one task per iteration. Note the broadcast of φ each
  * E-step caps the vocabulary at broadcastable size (~10^7-10^8 words
  * at 2 doubles/word) — the standard regime for topic models; a
  * beyond-broadcast vocabulary would shuffle-join on w instead
  * (same keys, one more exchange).
  *
  * Cross-engine determinism: all EM mass flows as exact integer
  * micros — per-row responsibilities quantize to micros LONGS
  * (floor(c·γ·1e6+0.5)), sums/totals stay integral (order-free), and
  * each probability is ONE int→double cast pair + one division +
  * micros quantize, so θ/φ are bit-identical in both engines round
  * over round. Overflow margins: per-row ≤ c·1e6; corpus micros total
  * < 2^63 up to ~9e12 tokens per topic — past that the totals move to
  * DECIMAL(38,0) like the dsum recombine.
  */
object TopicModel {

  /** Micros quantizer — identical in Spark and DuckDB. */
  private def q6(c: Column): Column =
    floor(c * lit(1000000d) + lit(0.5)) / lit(1000000d)

  /** Deterministic asymmetric φ init: integer raws 10+pert / 15−pert
    * (pert = md5 bucket of the word, 0..4), normalized by a 1-row
    * scalar aggregate crossJoined back by broadcast — integer raw sums
    * make the normalizer exact, so init is order-free, and no
    * partition-less window ever materializes the vocab in one task. */
  def initPhi(vocab: DataFrame): DataFrame = {
    val pert = conv(substring(md5(col("w")), 1, 2), 16, 10)
      .cast("long") % 5
    val raws = vocab.select(col("w"), (lit(10L) + pert).as("r1"),
      (lit(15L) - pert).as("r2"))
    val tot = raws.agg(sum(col("r1")).as("tr1"), sum(col("r2")).as("tr2"))
    raws.crossJoin(broadcast(tot))
      .select(col("w"),
        q6(col("r1").cast("double") / col("tr1").cast("double")).as("p1"),
        q6(col("r2").cast("double") / col("tr2").cast("double")).as("p2"))
  }

  /** `iterations` EM rounds over `dwc` (columns d, w, c). Returns
    * (theta(d, t1, t2), phi(w, p1, p2)), micros-quantized. */
  def plsaEm2(dwc: DataFrame, iterations: Int): (DataFrame, DataFrame) = {
    val rs = dwc.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    KernelCaches.register(rs)
    var phi = initPhi(rs.select(col("w")).distinct()).localCheckpoint(true)
    var theta = rs.select(col("d")).distinct()
      .select(col("d"), lit(0.5).as("t1"), lit(0.5).as("t2"))
      .localCheckpoint(true)
    for (_ <- 0 until iterations) {
      // E-step: responsibilities → integer micros per (d, w) row
      val g1n = col("t1") * col("p1")
      val g2n = col("t2") * col("p2")
      val den = g1n + g2n
      val e = rs.join(theta, "d").join(broadcast(phi), "w")
        .select(col("d"), col("w"),
          floor(col("c") * (g1n / den) * lit(1000000d) + lit(0.5))
            .cast("long").as("m1"),
          floor(col("c") * (g2n / den) * lit(1000000d) + lit(0.5))
            .cast("long").as("m2"),
          (col("c") * lit(1000000d)).cast("long").as("cm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      KernelCaches.register(e)
      // M-step θ: per-doc topic mass over doc token mass
      theta = e.groupBy(col("d"))
        .agg(sum(col("m1")).as("s1"), sum(col("m2")).as("s2"),
          sum(col("cm")).as("sm"))
        .select(col("d"),
          q6(col("s1").cast("double") / col("sm").cast("double")).as("t1"),
          q6(col("s2").cast("double") / col("sm").cast("double")).as("t2"))
        .localCheckpoint(true)
      phi = phiStep(e).localCheckpoint(true)
    }
    (theta, phi)
  }

  /** M-step φ over E-step micros rows (w, m1, m2): per-word topic mass
    * over per-topic corpus mass. The per-topic totals come from ONE
    * scalar aggregate broadcast back over the per-word relation —
    * never a partition-less window, which would gather the whole vocab
    * into a single task per iteration (plan-gated in PlanSpec). Exact:
    * the scalar total over e equals the window's sum over the per-word
    * relation, and all masses are integral longs. */
  private[graft] def phiStep(e: DataFrame): DataFrame = {
    val perWord = e.groupBy(col("w"))
      .agg(sum(col("m1")).as("f1"), sum(col("m2")).as("f2"))
    val tot = e.agg(sum(col("m1")).as("tf1"), sum(col("m2")).as("tf2"))
    perWord.crossJoin(broadcast(tot))
      .select(col("w"),
        q6(col("f1").cast("double") / col("tf1").cast("double")).as("p1"),
        q6(col("f2").cast("double") / col("tf2").cast("double")).as("p2"))
  }
}
