package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Classic TPC-H query shapes adapted to the harness schema (the
  * reference's canonical workload — src/test/regress/sql/tpch500GB.sql
  * EXPLAINs all 22 at 500 GB; these are the runnable analogues at
  * harness scale; q1_agg and q_join_multiway(Q5) live in the other
  * groups). Broadcast dims, decimal-exact money math. */
object TpchQueries {

  val defs: Seq[Q] = Seq(

    // Q3 — shipping priority: top unshipped revenue.
    Q("q3_shipping", Some(
      s"""SELECT l.l_orderkey,
         |  ${Q.oSum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
         |  o.o_orderdate
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l.l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l.l_orderkey, o.o_orderdate
         |ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
         |LIMIT 10""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val t = Tables.T(s, dir)
      t.customer.filter($"c_mktsegment" === "BUILDING")
        .join(t.orders.filter($"o_orderdate" < "1998-03-15"),
          $"c_custkey" === $"o_custkey")
        .join(t.lineitem.filter($"l_shipdate" > "1998-03-15"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(Q.dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
        .select($"l_orderkey", $"revenue", $"o_orderdate")
        .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
        .limit(10)
    },

    // Q6 — forecasting revenue change: single-scan filtered aggregate.
    Q("q6_forecast", Some(
      s"""SELECT ${Q.oSum("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         |  AND l_shipdate < TIMESTAMP '1999-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).lineitem
        .filter($"l_shipdate" >= "1998-01-01" && $"l_shipdate" < "1999-01-01"
          && $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(Q.dsum($"l_extendedprice" * $"l_discount").as("revenue"))
    },

    // Q10 — returned-item reporting: top customers by lost revenue.
    Q("q10_returns", Some(
      s"""SELECT c.c_custkey, c.c_name,
         |  ${Q.oSum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
         |  n.n_name
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '1998-01-01'
         |  AND o.o_orderdate < TIMESTAMP '1998-07-01'
         |GROUP BY c.c_custkey, c.c_name, n.n_name
         |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.customer
          .join(t.orders.filter($"o_orderdate" >= "1998-01-01" &&
            $"o_orderdate" < "1998-07-01"), $"c_custkey" === $"o_custkey")
          .join(t.lineitem.filter($"l_returnflag" === "R"),
            $"l_orderkey" === $"o_orderkey")
          .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"n_name")
          .agg(Q.dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
          .select($"c_custkey", $"c_name", $"revenue", $"n_name")
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
    },

    // Q14 — promotion effect: conditional-aggregate ratio over a join.
    Q("q14_promo", Some(
      s"""SELECT round(100.0 *
         |  CAST(sum(CASE WHEN p.p_type = 'PROMO'
         |    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
         |    ELSE 0 END) AS DOUBLE) /
         |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
         |    AS DECIMAL(28,6))) AS DOUBLE), 4) AS promo_revenue_pct
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE l.l_shipdate >= TIMESTAMP '1998-06-01'
         |  AND l.l_shipdate < TIMESTAMP '1998-07-01'""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        import org.apache.spark.sql.types.DecimalType
        val t = Tables.T(s, dir)
        val disc = ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast(DecimalType(28, 6))
        t.lineitem
          .filter($"l_shipdate" >= "1998-06-01" && $"l_shipdate" < "1998-07-01")
          .join(broadcast(t.part), $"l_partkey" === $"p_partkey")
          .agg(round(lit(100.0) *
            sum(when($"p_type" === "PROMO", disc).otherwise(lit(0)))
              .cast("double") /
            sum(disc).cast("double"), 4).as("promo_revenue_pct"))
    },

    // Q18 — large-volume customers: HAVING over a join-aggregate.
    Q("q18_large_orders", Some(
      s"""SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
         |  o.o_totalprice, ${Q.oSum("l.l_quantity")} AS sum_qty
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
         |  o.o_totalprice
         |HAVING sum(l.l_quantity) > 270
         |ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
         |LIMIT 100""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val t = Tables.T(s, dir)
      t.customer
        .join(t.orders, $"c_custkey" === $"o_custkey")
        .join(t.lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice")
        .agg(Q.dsum($"l_quantity").as("sum_qty"),
          sum($"l_quantity").as("raw_qty"))
        .filter($"raw_qty" > 270).drop("raw_qty")
        .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
        .limit(100)
    },

    // AssertOp (nodeAssertOp.c:98): runtime constraint check — passes
    // rows through when the constraint holds, errors otherwise.
    Q("q_assert_op", Some(
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity < 0 THEN error('negative quantity')
        |       ELSE l_quantity END AS checked_qty
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).lineitem.filter($"l_orderkey" <= 100)
        .select($"l_orderkey", $"l_linenumber",
          when($"l_quantity" < 0,
            raise_error(lit("negative quantity")).cast("double"))
            .otherwise($"l_quantity").as("checked_qty"))
        .orderBy("l_orderkey", "l_linenumber")
    }
  )
}
