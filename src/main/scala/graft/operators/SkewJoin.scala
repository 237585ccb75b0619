package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §2.8: GP redistributes on the join
  * key and a hot key melts one segment; the classic MPP fix is salting).
  * Spark's AQE skew-join splitting (`spark.sql.adaptive.skewJoin`) handles
  * sort-merge cases at runtime; explicit salting remains the tool when the
  * small side can be replicated and the skew is extreme (e.g. one key is
  * 50% of a 100 TB fact table).
  *
  * The big side gets a deterministic salt from a hash of the whole row;
  * the small side is replicated ×salts. Join on (key, salt) ≡ the plain
  * equi-join, with the hot key spread over `salts` reducers.
  */
object SkewJoin {

  def saltedInnerJoin(
      big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) &&
          salted("__salt") === replicated("__salt"))
      .drop(replicated(key))
      .drop(salted("__salt")).drop(replicated("__salt"))
  }
}
