package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** SURVEY §2.5 window functions (reference: src/backend/executor/
  * nodeWindowAgg.c:1993; function surface utils/adt/windowfuncs.c:82-449).
  * Frames: ROWS / RANGE with bounded and unbounded edges
  * (FRAMEOPTION_* bits, src/include/nodes/parsenodes.h:495-516).
  */
object WindowQueries {

  val defs: Seq[Q] = Seq(

    Q("q_window_rank", Some(
      """SELECT c_nationkey, c_custkey,
        |  row_number() OVER w AS rn,
        |  rank()       OVER w AS rk,
        |  dense_rank() OVER w AS drk
        |FROM customer WHERE c_custkey <= 300
        |WINDOW w AS (PARTITION BY c_nationkey
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, rn""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.T(s, dir).customer
        .filter($"c_custkey" <= 300)
        .select($"c_nationkey", $"c_custkey",
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .orderBy("c_nationkey", "rn")
    },

    // Running totals — ROWS UNBOUNDED PRECEDING..CURRENT ROW; decimal
    // discipline keeps the cumulative sum order-exact on both engines.
    Q("q_window_running", Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
        |FROM orders WHERE o_custkey <= 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.T(s, dir).orders
        .filter($"o_custkey" <= 100)
        .select($"o_custkey", $"o_orderkey",
          sum($"o_totalprice".cast(DecimalType(28, 6))).over(w)
            .cast("double").as("running_spend"),
          count(lit(1)).over(w).as("n_so_far"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_window_lag_lead", Some(
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  lag(l_extendedprice)  OVER w AS prev_price,
        |  lead(l_extendedprice) OVER w AS next_price,
        |  lag(l_extendedprice, 2, 0.0) OVER w AS prev2_price
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        Tables.T(s, dir).lineitem
          .filter($"l_suppkey" <= 5)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice",
            lag($"l_extendedprice", 1).over(w).as("prev_price"),
            lead($"l_extendedprice", 1).over(w).as("next_price"),
            lag($"l_extendedprice", 2, 0.0).over(w).as("prev2_price"))
          .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    },

    Q("q_window_ntile", Some(
      """SELECT c_mktsegment, c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM customer WHERE c_custkey <= 200
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal", $"c_custkey")
      Tables.T(s, dir).customer
        .filter($"c_custkey" <= 200)
        .select($"c_mktsegment", $"c_custkey",
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    },

    Q("q_window_firstlast", Some(
      """SELECT s_nationkey, s_suppkey,
        |  first_value(s_name) OVER w AS first_name,
        |  last_value(s_name)  OVER w AS last_name,
        |  nth_value(s_name, 2) OVER w AS second_name
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"s_nationkey")
        .orderBy($"s_acctbal".desc, $"s_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.T(s, dir).supplier
        .select($"s_nationkey", $"s_suppkey",
          first($"s_name").over(w).as("first_name"),
          last($"s_name").over(w).as("last_name"),
          nth_value($"s_name", 2).over(w).as("second_name"))
        .orderBy("s_nationkey", "s_suppkey")
    },

    // RANGE frame over timestamps via interval (SURVEY §7.4 watch list:
    // Spark numeric rangeBetween over epoch seconds ≡ interval frames).
    Q("q_window_range_time", Some(
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |      RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
        |    AS n_last_90d
        |FROM orders WHERE o_custkey <= 150
        |ORDER BY o_custkey, o_orderkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy(unix_timestamp($"o_orderdate"))
        .rangeBetween(-90L * 86400, Window.currentRow)
      Tables.T(s, dir).orders
        .filter($"o_custkey" <= 150)
        .select($"o_custkey", $"o_orderkey",
          count(lit(1)).over(w).as("n_last_90d"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // RANGE frame with a value offset (FRAMEOPTION value PRECEDING).
    Q("q_window_range", Some(
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        |  count(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
        |          RANGE BETWEEN 2000 PRECEDING AND CURRENT ROW) AS n_near
        |FROM supplier
        |ORDER BY s_nationkey, s_acctbal, s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"s_nationkey")
        .orderBy($"s_acctbal")
        .rangeBetween(-2000, Window.currentRow)
      Tables.T(s, dir).supplier
        .select($"s_nationkey", $"s_suppkey", $"s_acctbal",
          count(lit(1)).over(w).as("n_near"))
        .orderBy("s_nationkey", "s_acctbal", "s_suppkey")
    },

    // FILTER clause on WINDOW aggregates (PG allows `agg(x) FILTER
    // (WHERE c) OVER w`; Spark only on plain aggregates) — lowered to
    // the conditional-aggregation identity: count→sum(indicator),
    // sum→sum(CASE WHEN). Same single window shuffle; NULL (not 0) when
    // no frame row passes the filter, per the sum-over-empty rule.
    Q("q_window_filter", Some(
      """SELECT o_custkey, o_orderkey,
        |  count(*) FILTER (WHERE o_totalprice > 150000) OVER w AS big_so_far,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6)))
        |    FILTER (WHERE o_orderstatus = 'F') OVER w AS DOUBLE) AS f_spend
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.T(s, dir).orders
        .filter($"o_custkey" <= 100)
        .select($"o_custkey", $"o_orderkey",
          sum(when($"o_totalprice" > 150000, 1L).otherwise(0L)).over(w)
            .as("big_so_far"),
          sum(when($"o_orderstatus" === "F",
            $"o_totalprice".cast(DecimalType(28, 6)))).over(w)
            .cast("double").as("f_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // GROUPS frame mode (parsenodes.h FRAMEOPTION_GROUPS; PG 11+,
    // nodeWindowAgg.c update_frameheadpos GROUPS branches). Spark has no
    // GROUPS mode — the distributed formulation collapses each peer
    // group to ONE row (partial agg before the window shuffle), runs a
    // ROWS frame over the collapsed groups (ROWS ≡ GROUPS when every
    // group is one row), and joins the framed value back. The collapsed
    // relation is |distinct keys| — tiny next to the input — so the
    // extra join broadcasts at scale. Oracle uses the spec identity
    // GROUPS ≡ RANGE over dense_rank(), executed natively by DuckDB.
    Q("q_window_groups", Some(
      """WITH d AS (
        |  SELECT s_nationkey, s_suppkey, s_acctbal,
        |    dense_rank() OVER (PARTITION BY s_nationkey
        |      ORDER BY CAST(floor(s_acctbal/1000) AS INTEGER)) AS drk
        |  FROM supplier)
        |SELECT s_nationkey, s_suppkey,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(28,6))) OVER (
        |    PARTITION BY s_nationkey ORDER BY drk
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS grp_sum
        |FROM d ORDER BY s_nationkey, s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val sup = Tables.T(s, dir).supplier
        .withColumn("gkey", floor($"s_acctbal" / 1000).cast("int"))
      val groups = sup.groupBy($"s_nationkey", $"gkey")
        .agg(sum($"s_acctbal".cast(DecimalType(28, 6))).as("g_sum"))
      val wg = Window.partitionBy($"s_nationkey").orderBy($"gkey")
        .rowsBetween(-1, 1)
      val framed = groups.select($"s_nationkey", $"gkey",
        sum($"g_sum").over(wg).cast("double").as("grp_sum"))
      sup.join(broadcast(framed), Seq("s_nationkey", "gkey"))
        .select($"s_nationkey", $"s_suppkey", $"grp_sum")
        .orderBy("s_nationkey", "s_suppkey")
    },

    // Frame EXCLUDE clauses (FRAMEOPTION_EXCLUDE_*; PG 11+). Spark has
    // none — but with a RANGE frame every peer of the current row is
    // inside the frame, so all three modes are frame-sum arithmetic:
    //   EXCLUDE CURRENT ROW = frame − current
    //   EXCLUDE GROUP       = frame − peer-group sum
    //   EXCLUDE TIES        = frame − peer-group sum + current
    // One window shuffle total: the peer-group sum is a second window
    // over (partition, order-value) — same hash partitioning, no extra
    // Exchange. DuckDB executes the real EXCLUDE natively.
    Q("q_window_exclude", Some(
      """SELECT s_nationkey, s_suppkey,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(28,6))) OVER (
        |    PARTITION BY s_nationkey ORDER BY CAST(floor(s_acctbal/500) AS INTEGER)
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
        |    EXCLUDE CURRENT ROW) AS DOUBLE) AS ex_cur,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(28,6))) OVER (
        |    PARTITION BY s_nationkey ORDER BY CAST(floor(s_acctbal/500) AS INTEGER)
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
        |    EXCLUDE GROUP) AS DOUBLE) AS ex_grp,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(28,6))) OVER (
        |    PARTITION BY s_nationkey ORDER BY CAST(floor(s_acctbal/500) AS INTEGER)
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
        |    EXCLUDE TIES) AS DOUBLE) AS ex_ties
        |FROM supplier ORDER BY s_nationkey, s_suppkey""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val dec = $"s_acctbal".cast(DecimalType(28, 6))
      val sup = Tables.T(s, dir).supplier
        .withColumn("k", floor($"s_acctbal" / 500).cast("int"))
      val wFrame = Window.partitionBy($"s_nationkey").orderBy($"k")
        .rangeBetween(-2, 2)
      val wPeers = Window.partitionBy($"s_nationkey", $"k")
      val frameSum = sum(dec).over(wFrame)
      val peerSum = sum(dec).over(wPeers)
      // SQL spec: an aggregate over a frame that the EXCLUDE clause
      // empties returns NULL (sum of no rows), not 0 — gate each mode
      // on the surviving row count.
      val frameCnt = count(lit(1)).over(wFrame)
      val peerCnt = count(lit(1)).over(wPeers)
      sup.select($"s_nationkey", $"s_suppkey",
          when(frameCnt > 1, (frameSum - dec).cast("double")).as("ex_cur"),
          when(frameCnt > peerCnt, (frameSum - peerSum).cast("double"))
            .as("ex_grp"),
          (frameSum - peerSum + dec).cast("double").as("ex_ties"))
        .orderBy("s_nationkey", "s_suppkey")
    }
  )
}
