package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs on sf0.001 and produces a sane result.
  * (Value-level correctness is the DuckDB oracle gate — tools/check.py /
  * the driver's CORRECTNESS run; this suite is the fast in-JVM guard.) */
class QueriesSmokeSpec extends AnyFunSuite {
  import TestSpark._

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs and is non-degenerate") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, "no output columns")
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty at sf0.001: anything aggregating
      // whole tables. Pair-finding queries may legitimately be empty.
      if (!Set("q_join_anti", "q_dedup_exact_bow", "q_dedup_minhash",
          "q_dedup_simhash", "q_dedup_jaccard", "q_dedup_embedding")
          .contains(q.name)) {
        assert(n > 0, s"${q.name} returned 0 rows")
      }
    }
  }

  test("entry() smoke-checks on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    val noOracle = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
  }
}
