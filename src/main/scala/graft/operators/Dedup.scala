package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard (extension beyond the reference).
  *
  * Scale design: every variant is a pure dataflow — per-row signature
  * expressions (codegen'd, computed in one scan), then a shuffle keyed on
  * the signature/band/token. No driver-side state, no O(n²) comparisons:
  * candidate generation is always an equi-join (hash shuffle ≡ GP's
  * redistribute Motion), so the plan scales with data × bands, not data².
  */
object Dedup {

  // ---- exact -------------------------------------------------------

  /** Exact duplicates on a dedup key (e.g. TextAnalysis.fingerprint or
    * bowFingerprint): hash-groupBy. Returns (fp, n, canonical_id, ids)
    * per duplicate group. */
  def exactGroups(df: DataFrame, key: Column, idCol: String): DataFrame =
    df.select(key.as("fp"), col(idCol))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"),
        min(idCol).as("canonical_id"),
        array_sort(collect_list(idCol)).as("ids"))
      .filter(col("n") > 1)

  /** Keep one row per key (lowest id wins) — the dedup sink. */
  def exactDedup(df: DataFrame, key: Column, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ---- MinHash + LSH ----------------------------------------------

  /** k-component MinHash signature over the document's distinct tokens.
    * Hash family i is md5(i || ':' || token); the signature component is
    * the lexicographic min — deterministic and portable (the oracle SQL
    * computes the identical value). One codegen'd expression: no explode,
    * no shuffle until the band join. */
  def minhashSignature(text: Column, k: Int): Column = {
    val toks = TextAnalysis.tokenSet(text)
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(toks, t => md5(concat(i, lit(":"), t).cast("binary")))))
  }

  /** LSH band keys: the signature is cut into `bands` slices of `rowsPerBand`
    * and each slice is hashed; docs sharing any band key are candidates. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|",
        slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).cast("binary")))

  /** MinHash signatures via explode → min-aggregate → re-assemble: the
    * codegen-friendly formulation of [[minhashSignature]] (same values).
    * The nested higher-order expression evaluates interpreted per element;
    * this path keeps md5+min inside whole-stage codegen and scales as a
    * plain shuffle aggregation. */
  def minhashSignatures(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokenSet(col(textCol))).as("tok"))
      .select(col("id"), col("tok"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .groupBy("id", "i")
      .agg(min(md5(concat(col("i"), lit(":"), col("tok")).cast("binary")))
        .as("mh"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("mh")))),
        s => s.getField("mh")).as("sig"))

  /** Candidate near-duplicate pairs via MinHash LSH, with the estimated
    * Jaccard (fraction of matching signature components).
    *
    * Plan shape: scan → explode/agg signatures → explode bands (×bands
    * rows) → shuffle on band key (the only shuffle) → self-join within
    * buckets → distinct pairs. At 100 TB the band-key shuffle partitions
    * evenly (md5 keys), and bucket skew is bounded because identical docs
    * share all bands but still join within one partition.
    */
  def minhashCandidates(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, minEstJaccard: Double = 0.5): DataFrame = {
    val rowsPerBand = k / bands
    // MinHash depends only on the token SET, so docs with identical sets
    // (word-order shuffles — the common near-dup) collapse to one
    // representative before any signature or band work. Identical-set
    // pairs are emitted directly with est = 1.0 (their signatures are
    // equal by construction); distinct sets go through LSH and the
    // resulting set-pairs expand back to doc pairs.
    val withFp = df.select(col(idCol).as("id"),
      TextAnalysis.bowFingerprint(col(textCol)).as("fp"),
      TextAnalysis.tokenSet(col(textCol)).as("ts"))
    val groups = withFp.groupBy("fp")
      .agg(array_sort(collect_list(col("id"))).as("ids"),
        first(col("ts")).as("ts"))
      .cache()
    // signatures per distinct token set
    val sigs = groups.select(col("fp"), explode(col("ts")).as("tok"))
      .select(col("fp"), col("tok"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .groupBy("fp", "i")
      .agg(min(md5(concat(col("i"), lit(":"), col("tok")).cast("binary")))
        .as("mh"))
      .groupBy("fp")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("mh")))),
        s => s.getField("mh")).as("sig"))
      .cache()
    val banded = sigs.select(
      col("fp"), posexplode(lshBandKeys(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val fpPairs = banded.alias("a")
      .join(banded.alias("b"), Seq("band", "band_key"))
      .filter(col("a.fp") < col("b.fp"))
      .select(col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
    // codegen'd fixed-k match count (a higher-order zip_with/filter would
    // evaluate interpreted per pair — the hot loop of the whole operator)
    val matches = (1 to k).map { i =>
      when(element_at(col("sig_a"), i) === element_at(col("sig_b"), i), 1)
        .otherwise(0)
    }.reduce((a, b) => a + b)
    val crossSetPairs = fpPairs
      .join(sigs.select(col("fp").as("fp_a"), col("sig").as("sig_a")), "fp_a")
      .join(sigs.select(col("fp").as("fp_b"), col("sig").as("sig_b")), "fp_b")
      .select(col("fp_a"), col("fp_b"),
        (matches.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .join(groups.select(col("fp").as("fp_a"), col("ids").as("ids_a")), "fp_a")
      .join(groups.select(col("fp").as("fp_b"), col("ids").as("ids_b")), "fp_b")
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("est_jaccard"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("est_jaccard"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("est_jaccard"))
    val withinSetPairs = groups.filter(size(col("ids")) > 1)
      .select(posexplode(col("ids")).as(Seq("pa", "id_a")), col("ids"))
      .select(col("pa"), col("id_a"), posexplode(col("ids")).as(Seq("pb", "id_b")))
      .filter(col("pa") < col("pb"))
      .select(col("id_a"), col("id_b"), lit(1.0).as("est_jaccard"))
    crossSetPairs.unionByName(withinSetPairs)
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  // ---- SimHash -----------------------------------------------------

  /** 32-bit SimHash over distinct tokens: token hash = first 8 md5 hex
    * chars as int; simhash bit j set iff more token hashes have bit j set
    * than not. Pure expression (32-way bit fold). */
  def simhash32(text: Column): Column = {
    val toks = TextAnalysis.tokenSet(text)
    val hashes = transform(toks,
      t => conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long"))
    (0 until 32).map { j =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
  }

  /** SimHash signatures via explode → codegen'd bit votes: same values as
    * [[simhash32]] without the interpreted nested-aggregate path. */
  def simhashSignatures(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokenSet(col(textCol))).as("tok"))
      .select(col("id"),
        conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("h"))
    val votes = (0 until 32).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$j")
    }
    hashed.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 32).map { j =>
          when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce((a, b) => a + b).as("simhash"))
  }

  /** Hamming distance between two simhash values (popcount of xor). */
  def hamming32(a: Column, b: Column): Column =
    (0 until 32).map { j =>
      when(shiftright(a.bitwiseXOR(b), j).bitwiseAND(1) === 1, 1).otherwise(0)
    }.reduce((x, y) => x + y)

  // ---- n-gram Jaccard (inverted-index join) ------------------------

  /** Exact token-set Jaccard over candidate pairs that share ≥1 token.
    * Inverted-index join: explode distinct tokens → self-join on token →
    * count shared per pair → |A∪B| = |A|+|B|−shared. The token join is the
    * scalable candidate generator (pairs with zero overlap never meet). */
  def jaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      minJaccard: Double): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      TextAnalysis.tokenSet(col(textCol)).as("ts"))
    val sizes = toks.select(col("id"), size(col("ts")).as("n"))
    val inv = toks.select(col("id"), explode(col("ts")).as("tok")).cache()
    val shared = inv.alias("x").join(inv.alias("y"),
        col("x.tok") === col("y.tok") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
