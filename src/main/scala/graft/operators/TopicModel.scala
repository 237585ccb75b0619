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
      // M-step θ: per-doc topic mass over doc token mass. The per-doc
      // integer masses are checkpointed RAW (pre-normalization) so the
      // φ normalizer below can reuse them: Σ_d s_t ≡ Σ_rows m_t — the
      // same exact long — which saves one corpus-scale pass of e per
      // round (r9 optimization; guide §1.2 "remove unnecessary passes").
      val perDoc = e.groupBy(col("d"))
        .agg(sum(col("m1")).as("s1"), sum(col("m2")).as("s2"),
          sum(col("cm")).as("sm"))
        .localCheckpoint(true)
      theta = perDoc.select(col("d"),
        q6(col("s1").cast("double") / col("sm").cast("double")).as("t1"),
        q6(col("s2").cast("double") / col("sm").cast("double")).as("t2"))
      phi = phiStep(e, perDoc).localCheckpoint(true)
    }
    (theta, phi)
  }

  /** M-step φ over E-step micros rows (w, m1, m2): per-word topic mass
    * over per-topic corpus mass. The per-topic totals come from ONE
    * doc-scale aggregate over the θ step's materialized per-doc sums
    * (Σ_d s_t ≡ Σ_rows m_t exactly — integral longs), broadcast back
    * over the per-word relation — never a partition-less window, which
    * would gather the whole vocab into a single task per iteration
    * (plan-gated in PlanSpec), and never a second corpus-scale pass. */
  private[graft] def phiStep(e: DataFrame, perDoc: DataFrame): DataFrame = {
    val perWord = e.groupBy(col("w"))
      .agg(sum(col("m1")).as("f1"), sum(col("m2")).as("f2"))
    val tot = perDoc.agg(sum(col("s1")).as("tf1"), sum(col("s2")).as("tf2"))
    perWord.crossJoin(broadcast(tot))
      .select(col("w"),
        q6(col("f1").cast("double") / col("tf1").cast("double")).as("p1"),
        q6(col("f2").cast("double") / col("tf2").cast("double")).as("p2"))
  }

  /** PLSA EM at ANY topic count — lifts [[plsaEm2]]'s 2-topic column
    * ceiling (MADlib `lda_train` takes an arbitrary num_topics). The
    * topic dimension stays COLUMNS (t_0…t_{T-1} / p_0…p_{T-1}, no
    * explode) so each EM round keeps the plsaEm2 plan shape: ONE
    * equi-join with θ + broadcast φ, per-doc and per-word keyed
    * aggregates, φ normalizer a 1-row scalar aggregate broadcast back
    * (never a partition-less window). All mass flows as exact integer
    * micros; init breaks symmetry per topic via the word's md5 bucket
    * phase-shifted by 2t. Returns (theta(d, t_*), phi(w, p_*)). */
  def plsaEmT(dwc: DataFrame, topics: Int, iterations: Int)
      : (DataFrame, DataFrame) = {
    require(topics >= 2, "plsaEmT needs >= 2 topics")
    val T = topics
    val rs = dwc.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    KernelCaches.register(rs)
    val pert = conv(substring(md5(col("w")), 1, 2), 16, 10)
      .cast("long") % 5
    val raws = rs.select(col("w")).distinct()
      .select(col("w") +: (0 until T).map(t =>
        (lit(10L) + (pert + lit(2L * t)) % 5).as(s"r_$t")): _*)
    val rtot = raws.agg(
      sum(col("r_0")).as("tr_0"),
      (1 until T).map(t => sum(col(s"r_$t")).as(s"tr_$t")): _*)
    var phi = raws.crossJoin(broadcast(rtot))
      .select(col("w") +: (0 until T).map(t =>
        q6(col(s"r_$t").cast("double") / col(s"tr_$t").cast("double"))
          .as(s"p_$t")): _*)
      .localCheckpoint(true)
    var theta = rs.select(col("d")).distinct()
      .select(col("d") +: (0 until T).map(t =>
        lit(1.0 / T).as(s"t_$t")): _*)
      .localCheckpoint(true)
    for (_ <- 0 until iterations) {
      val gn = (0 until T).map(t => col(s"t_$t") * col(s"p_$t"))
      val den = gn.reduce(_ + _)
      val e = rs.join(theta, "d").join(broadcast(phi), "w")
        .select(col("d") +: col("w") +:
          ((0 until T).map(t =>
            floor(col("c") * (gn(t) / den) * lit(1000000d) + lit(0.5))
              .cast("long").as(s"m_$t")) :+
            (col("c") * lit(1000000d)).cast("long").as("cm")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      KernelCaches.register(e)
      // per-doc raw masses checkpointed once; θ is a projection over
      // them and the φ normalizer totals aggregate the SAME doc-scale
      // relation (Σ_d s_t ≡ Σ_rows m_t exactly) — one corpus-scale
      // pass of e saved per round (the plsaEm2 r9 optimization)
      val perDoc = e.groupBy(col("d"))
        .agg(sum(col("m_0")).as("s_0"),
          (1 until T).map(t => sum(col(s"m_$t")).as(s"s_$t")) :+
            sum(col("cm")).as("sm"): _*)
        .localCheckpoint(true)
      theta = perDoc.select(col("d") +: (0 until T).map(t =>
        q6(col(s"s_$t").cast("double") / col("sm").cast("double"))
          .as(s"t_$t")): _*)
      val perWord = e.groupBy(col("w"))
        .agg(sum(col("m_0")).as("f_0"),
          (1 until T).map(t => sum(col(s"m_$t")).as(s"f_$t")): _*)
      val tot = perDoc.agg(sum(col("s_0")).as("tf_0"),
        (1 until T).map(t => sum(col(s"s_$t")).as(s"tf_$t")): _*)
      phi = perWord.crossJoin(broadcast(tot))
        .select(col("w") +: (0 until T).map(t =>
          q6(col(s"f_$t").cast("double") / col(s"tf_$t").cast("double"))
            .as(s"p_$t")): _*)
        .localCheckpoint(true)
    }
    (theta, phi)
  }

  /** DuckDB oracle for [[plsaEmT]] — the q_ml_lda CTE unroll at any
    * topic count. `dwSelect` must yield (d, w, c double); emits
    * `SELECT w, p_0…p_{T-1} FROM ph<iters> ORDER BY w`. */
  def plsaTOracleSql(dwSelect: String, topics: Int, iterations: Int)
      : String = {
    val T = topics
    def q6s(x: String) = s"floor($x * 1000000 + 0.5) / 1000000"
    val den = (0 until T).map(t => s"t_$t * p_$t")
      .reduceLeft((a, b) => s"($a + $b)")
    val rounds = (1 to iterations).map { i =>
      s"""e$i AS MATERIALIZED (SELECT d, w,
         |    ${(0 until T).map(t =>
        s"CAST(floor(c * ((t_$t * p_$t) / $den) * 1000000 + 0.5) " +
          s"AS BIGINT) AS m_$t").mkString(",\n    ")},
         |    CAST(c * 1000000 AS BIGINT) AS cm
         |  FROM dw JOIN th${i - 1} USING (d) JOIN ph${i - 1} USING (w)),
         |th$i AS MATERIALIZED (SELECT d,
         |    ${(0 until T).map(t =>
        s"${q6s(s"CAST(s_$t AS DOUBLE) / CAST(sm AS DOUBLE)")} AS t_$t")
        .mkString(",\n    ")}
         |  FROM (SELECT d, ${(0 until T).map(t =>
        s"sum(m_$t) AS s_$t").mkString(", ")}, sum(cm) AS sm
         |    FROM e$i GROUP BY 1)),
         |pw$i AS (SELECT w, ${(0 until T).map(t =>
        s"sum(m_$t) AS f_$t").mkString(", ")} FROM e$i GROUP BY 1),
         |pt$i AS (SELECT ${(0 until T).map(t =>
        s"sum(m_$t) AS tf_$t").mkString(", ")} FROM e$i),
         |ph$i AS MATERIALIZED (SELECT w,
         |    ${(0 until T).map(t =>
        s"${q6s(s"CAST(f_$t AS DOUBLE) / CAST(tf_$t AS DOUBLE)")} AS p_$t")
        .mkString(",\n    ")}
         |  FROM pw$i CROSS JOIN pt$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH dw AS MATERIALIZED ($dwSelect),
       |praw AS (SELECT DISTINCT w,
       |    CAST(('0x' || substr(md5(w), 1, 2)) AS BIGINT) % 5 AS pr
       |  FROM dw),
       |r0 AS (SELECT w, ${(0 until T).map(t =>
      s"10 + (pr + ${2 * t}) % 5 AS r_$t").mkString(", ")} FROM praw),
       |rt AS (SELECT ${(0 until T).map(t =>
      s"sum(r_$t) AS tr_$t").mkString(", ")} FROM r0),
       |ph0 AS MATERIALIZED (SELECT w,
       |    ${(0 until T).map(t =>
      s"${q6s(s"CAST(r_$t AS DOUBLE) / CAST(tr_$t AS DOUBLE)")} AS p_$t")
      .mkString(",\n    ")}
       |  FROM r0 CROSS JOIN rt),
       |th0 AS MATERIALIZED (SELECT DISTINCT d,
       |    ${(0 until T).map(t =>
      s"CAST(${1.0 / T} AS DOUBLE) AS t_$t").mkString(", ")} FROM dw),
       |$rounds
       |SELECT w, ${(0 until T).map(t => s"p_$t").mkString(", ")}
       |FROM ph$iterations ORDER BY w""".stripMargin
  }
}
