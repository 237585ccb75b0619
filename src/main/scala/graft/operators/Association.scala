package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-database association-rule mining (market-basket analysis) — the
  * MADlib `assoc_rules` module GP ships for exactly this workload
  * (Apriori, Agrawal & Srikant VLDB'94). Reference exposes it through
  * MADlib's SQL UDFs; here the whole mine is one declarative plan.
  *
  * Semantics: over transactions t with item sets S(t), emit every rule
  * A → B (single antecedent/consequent, the MADlib default max_LHS=1,
  * max_RHS=1 shape) with
  *   support(A→B)    = |t: A,B ∈ S(t)| / N
  *   confidence(A→B) = |t: A,B ∈ S(t)| / |t: A ∈ S(t)|
  *   lift(A→B)       = confidence / (|t: B ∈ S(t)| / N)
  * filtered by min support/confidence.
  *
  * Scale design (100 TB): candidate pairs come from a per-transaction
  * self-equi-join on the txn key — never item × item — so pair volume
  * is Σ_t |S(t)|² bounded by `maxBasket` (oversized baskets are capped
  * to their `maxBasket` most frequent... no: dropped entirely, with a
  * logged count — a retail-scale "basket" of 10k items is load noise,
  * and capping silently would skew supports). Item and pair counts are
  * map-side-combinable hash aggregates on item / (item,item) keys; the
  * one global scalar N joins in as a broadcast single-row relation, so
  * the plan has no driver-side collect.
  */
object Association {

  /** Mine single-antecedent rules from `(txnCol, itemCol)` rows.
    * Output: (ante, cons, pair_n, ante_n, cons_n, support, confidence,
    * lift) — counts exact, ratios as IEEE doubles of exact longs.
    *
    * `maxBasket` (opt-in, the [[Dedup.minhashCandidates]] cap contract):
    * transactions with more distinct items are EXCLUDED from mining,
    * with the drop count logged — the standard Apriori guard against
    * pathological baskets that would explode the pair join. None =
    * exact mining, no extra pass. */
  def assocRules(
      df: DataFrame, txnCol: String, itemCol: String,
      minSupport: Double, minConfidence: Double,
      maxBasket: Option[Int] = None): DataFrame = {
    val baskets0 = df.select(col(txnCol).as("txn"), col(itemCol).as("item"))
      .distinct()
    val baskets = maxBasket match {
      case None => baskets0
      case Some(cap) =>
        val sized = baskets0.withColumn("bsz",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("txn")))
        val nDropped = sized.filter(col("bsz") > cap)
          .select(countDistinct(col("txn"))).head.getLong(0)
        if (nDropped > 0)
          org.apache.log4j.Logger.getLogger(getClass).warn(
            s"assocRules: $nDropped baskets over $cap items excluded")
        sized.filter(col("bsz") <= cap).drop("bsz")
    }
    // global N and per-item counts; N broadcast-joins into the rule rows
    val nTxn = baskets.agg(countDistinct(col("txn")).as("n_txn"))
    val itemCnt = baskets.groupBy("item").agg(count(lit(1)).as("item_n"))
    // ordered pairs via the txn equi-join (both directions in one join —
    // a <> b, not a < b — so each rule direction gets its own row)
    val pairs = baskets.select(col("txn"), col("item").as("ante"))
      .join(baskets.select(col("txn"), col("item").as("cons")), Seq("txn"))
      .filter(col("ante") =!= col("cons"))
      .groupBy("ante", "cons").agg(count(lit(1)).as("pair_n"))
    pairs
      .join(itemCnt.select(col("item").as("ante"), col("item_n").as("ante_n")),
        Seq("ante"))
      .join(itemCnt.select(col("item").as("cons"), col("item_n").as("cons_n")),
        Seq("cons"))
      .join(broadcast(nTxn))
      .withColumn("support",
        col("pair_n").cast("double") / col("n_txn").cast("double"))
      .withColumn("confidence",
        col("pair_n").cast("double") / col("ante_n").cast("double"))
      .withColumn("lift", col("confidence") /
        (col("cons_n").cast("double") / col("n_txn").cast("double")))
      .filter(col("support") >= minSupport &&
        col("confidence") >= minConfidence)
      .select("ante", "cons", "pair_n", "ante_n", "cons_n",
        "support", "confidence", "lift")
  }

  /** Two-antecedent rules {a1, a2} → c (MADlib `assoc_rules` with
    * max_LHS = 2 — the level-3 Apriori pass): candidate 2-itemsets
    * come from the per-txn self-join (a1 < a2), are counted, and ONLY
    * the frequent ones (support ≥ `minSupport`) extend to triples —
    * the textbook Apriori anti-monotone prune, which is what keeps the
    * level-3 join volume proportional to FREQUENT pairs rather than
    * all pairs at 100 TB. Per-txn pair volume is Σ|S(t)|² like
    * [[assocRules]] (same `maxBasket` contract applies upstream).
    *
    * Output: (a1, a2, cons, triple_n, pair2_n, cons_n, support,
    * confidence, lift) — counts exact, ratios IEEE doubles of exact
    * longs. */
  def assocRules2(
      df: DataFrame, txnCol: String, itemCol: String,
      minSupport: Double, minConfidence: Double): DataFrame = {
    val baskets = df.select(col(txnCol).as("txn"), col(itemCol).as("item"))
      .distinct()
    val nTxn = baskets.agg(countDistinct(col("txn")).as("n_txn"))
    val itemCnt = baskets.groupBy("item").agg(count(lit(1)).as("item_n"))
    val pairSets = baskets.select(col("txn"), col("item").as("a1"))
      .join(baskets.select(col("txn"), col("item").as("a2")), Seq("txn"))
      .filter(col("a1") < col("a2"))
    val pairCnt = pairSets.groupBy("a1", "a2")
      .agg(count(lit(1)).as("pair2_n"))
    val freqPairs = pairCnt.join(broadcast(nTxn))
      .filter(col("pair2_n").cast("double") / col("n_txn").cast("double")
        >= minSupport)
      .select("a1", "a2", "pair2_n")
    // Apriori prune BEFORE extension: only frequent pairs grow
    val triples = pairSets.join(freqPairs.select("a1", "a2"),
      Seq("a1", "a2"))
      .join(baskets.select(col("txn"), col("item").as("cons")), Seq("txn"))
      .filter(col("cons") =!= col("a1") && col("cons") =!= col("a2"))
      .groupBy("a1", "a2", "cons").agg(count(lit(1)).as("triple_n"))
    triples
      .join(freqPairs, Seq("a1", "a2"))
      .join(itemCnt.select(col("item").as("cons"),
        col("item_n").as("cons_n")), Seq("cons"))
      .join(broadcast(nTxn))
      .withColumn("support",
        col("triple_n").cast("double") / col("n_txn").cast("double"))
      .withColumn("confidence",
        col("triple_n").cast("double") / col("pair2_n").cast("double"))
      .withColumn("lift", col("confidence") /
        (col("cons_n").cast("double") / col("n_txn").cast("double")))
      .filter(col("support") >= minSupport &&
        col("confidence") >= minConfidence)
      .select("a1", "a2", "cons", "triple_n", "pair2_n", "cons_n",
        "support", "confidence", "lift")
  }
}
