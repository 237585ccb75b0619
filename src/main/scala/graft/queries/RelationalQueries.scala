package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.1 scans/sources, §2.3 joins, §2.6 sort/limit, §2.7 set ops.
  *
  * Each query is declarative DataFrame API — scans stay narrow so Catalyst
  * pushes filters/projection into the Parquet reader (SeqScan analogue,
  * reference: src/backend/executor/nodeSeqscan.c:128), joins let
  * EnsureRequirements/AQE pick broadcast vs shuffle exactly where GPDB's
  * planner inserts Motions (reference: src/backend/cdb/cdbmutate.c:1130).
  */
object RelationalQueries {

  val defs: Seq[Q] = Seq(

    // ---- scans / sources (§2.1) ------------------------------------
    Q("q_scan_project", Some(
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")) {
      (s, dir) =>
        Tables.T(s, dir).region
          .select("r_regionkey", "r_name")
          .orderBy("r_regionkey")
    },

    Q("q_scan_filter", Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-06-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).lineitem
          .filter($"l_shipdate" >= "2001-06-01" && $"l_discount" > 0.05)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber")
    },

    Q("q_scan_values", Some(
      """SELECT id, tag FROM (VALUES (1,'alpha'),(2,'beta'),(3,'gamma'))
        | AS t(id, tag) ORDER BY id""".stripMargin)) {
      (s, _) =>
        import s.implicits._
        Seq((1, "alpha"), (2, "beta"), (3, "gamma"))
          .toDF("id", "tag").orderBy("id")
    },

    Q("q_generate_series", Some(
      """SELECT i, i*i AS sq FROM generate_series(1, 100) t(i) ORDER BY i""")) {
      (s, _) =>
        import s.implicits._
        s.range(1, 101).select($"id".as("i"), ($"id" * $"id").as("sq"))
          .orderBy("i")
    },

    Q("q_limit_offset", Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 10 OFFSET 50""".stripMargin)) {
      (s, dir) =>
        Tables.T(s, dir).orders
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
          .offset(50).limit(10)
    },

    // Limit-over-Sort → TakeOrderedAndProjectExec (bounded heap, no full
    // sort — the GP Top-K path, reference: src/backend/executor/nodeLimit.c).
    Q("q_topk", Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).lineitem
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
          .limit(25)
    },

    // ---- projection / expression eval (§2.2, Result node) ----------
    Q("q_expr_project", Some(
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
        |  CASE WHEN l_quantity > 30 THEN 'bulk'
        |       WHEN l_quantity > 10 THEN 'mid'
        |       ELSE 'small' END AS qty_band
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).lineitem
          .filter($"l_orderkey" <= 200)
          .select(
            $"l_orderkey", $"l_linenumber",
            ($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
            ($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"))
              .as("charged"),
            when($"l_quantity" > 30, "bulk")
              .when($"l_quantity" > 10, "mid")
              .otherwise("small").as("qty_band"))
          .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- joins (§2.3) ----------------------------------------------
    Q("q_join_inner", Some(
      """SELECT o.o_orderpriority, count(*) AS n_lines,
        |  """.stripMargin + Q.oSum("l.l_extendedprice * (1 - l.l_discount)") +
      """ AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus = 'F'
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.lineitem.join(t.orders.filter($"o_orderstatus" === "F"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_lines"),
            Q.dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
          .orderBy("o_orderpriority")
    },

    Q("q_join_left", Some(
      """SELECT o.o_orderstatus, count(*) AS n_orders,
        |  count(c.c_custkey) AS n_rich_cust
        |FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.orders.join(t.customer.filter($"c_acctbal" > 5000),
            $"o_custkey" === $"c_custkey", "left")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            count($"c_custkey").as("n_rich_cust"))
          .orderBy("o_orderstatus")
    },

    Q("q_join_right", Some(
      """SELECT c.c_nationkey, count(o.o_orderkey) AS n_orders,
        |  count(DISTINCT c.c_custkey) AS n_cust
        |FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.orders.join(t.customer, $"o_custkey" === $"c_custkey", "right")
          .groupBy($"c_nationkey")
          .agg(count($"o_orderkey").as("n_orders"),
            countDistinct($"c_custkey").as("n_cust"))
          .orderBy("c_nationkey")
    },

    Q("q_join_full", Some(
      """WITH cu AS (SELECT c_nationkey AS nk, count(*) AS n_cust
        |            FROM customer GROUP BY c_nationkey),
        |     su AS (SELECT s_nationkey AS nk, count(*) AS n_supp
        |            FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(cu.nk, su.nk) AS nk, cu.n_cust, su.n_supp
        |FROM cu FULL OUTER JOIN su ON cu.nk = su.nk
        |ORDER BY nk""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        val cu = t.customer.groupBy($"c_nationkey".as("cnk"))
          .agg(count(lit(1)).as("n_cust"))
        val su = t.supplier.groupBy($"s_nationkey".as("snk"))
          .agg(count(lit(1)).as("n_supp"))
        cu.join(su, $"cnk" === $"snk", "full")
          .select(coalesce($"cnk", $"snk").as("nk"), $"n_cust", $"n_supp")
          .orderBy("nk")
    },

    // LEFT SEMI ≡ EXISTS (reference: JOIN_SEMI, src/include/nodes/nodes.h:739).
    Q("q_join_semi", Some(
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.customer.join(t.orders.filter($"o_totalprice" > 400000),
            $"c_custkey" === $"o_custkey", "left_semi")
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
    },

    // LEFT ANTI ≡ NOT EXISTS (reference: JOIN_ANTI, nodes.h:739).
    Q("q_join_anti", Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.customer.join(t.orders, $"c_custkey" === $"o_custkey", "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
    },

    // NOT IN — PG 3-valued NULL semantics (JOIN_LASJ_NOTIN, nodes.h:755):
    // Catalyst RewritePredicateSubquery produces the null-aware anti join.
    Q("q_join_notin", Some(
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE c_nationkey NOT IN
        |  (SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000)
        |ORDER BY c_custkey""".stripMargin)) {
      (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT c_custkey, c_nationkey FROM customer
            |WHERE c_nationkey NOT IN
            |  (SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000)
            |ORDER BY c_custkey""".stripMargin)
    },

    // Cartesian product (NestLoop analogue, nodeNestloop.c:366).
    Q("q_join_cross", Some(
      """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
        |ORDER BY r.r_name, n.n_name""".stripMargin)) {
      (s, dir) =>
        val t = Tables.T(s, dir)
        t.region.crossJoin(t.nation)
          .select("r_name", "n_name")
          .orderBy("r_name", "n_name")
    },

    // Theta/band predicate on top of an equi key (MergeJoin/NestLoop
    // territory in PG; Spark: hash join + residual condition).
    Q("q_join_theta", Some(
      """SELECT n1.n_name AS a, n2.n_name AS b FROM nation n1
        |JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
        |              AND n1.n_nationkey < n2.n_nationkey
        |ORDER BY a, b""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        val n1 = t.nation.alias("n1")
        val n2 = t.nation.alias("n2")
        n1.join(n2,
            $"n1.n_regionkey" === $"n2.n_regionkey" &&
            $"n1.n_nationkey" < $"n2.n_nationkey")
          .select($"n1.n_name".as("a"), $"n2.n_name".as("b"))
          .orderBy("a", "b")
    },

    // Pure interval join (NO equi key) — naively a BroadcastNestedLoop;
    // operators.RangeJoin bins the range dimension so both sides meet
    // through a plain equi-join shuffle + residual filter. Exact results,
    // plan-asserted no-nested-loop in PlanSpec: shipments falling inside
    // 7-day promo windows derived from the first 100 orders.
    Q("q_range_join", Some(
      """SELECT w.o_orderkey AS window_id, count(*) AS n_ship,
        |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS total
        |FROM (SELECT o_orderkey, o_orderdate,
        |        o_orderdate + INTERVAL 7 DAY AS o_end
        |      FROM orders WHERE o_orderkey <= 100) w
        |JOIN lineitem l
        |  ON l.l_shipdate >= w.o_orderdate AND l.l_shipdate < w.o_end
        |GROUP BY w.o_orderkey ORDER BY window_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val t = Tables.T(s, dir)
      val points = t.lineitem
        .select($"l_extendedprice",
          unix_date($"l_shipdate".cast("date")).cast("long").as("p_day"))
      val windows = t.orders.filter($"o_orderkey" <= 100)
        .select($"o_orderkey",
          unix_date($"o_orderdate".cast("date")).cast("long").as("w_start"))
        .withColumn("w_end", $"w_start" + 7)
      graft.operators.RangeJoin.pointInInterval(
          points, col("p_day"), windows, col("w_start"), col("w_end"),
          binWidth = 7)
        .groupBy($"o_orderkey".as("window_id"))
        .agg(count(lit(1)).as("n_ship"), Q.dsum($"l_extendedprice").as("total"))
        .orderBy("window_id")
    },

    // TPC-H Q5 shape: 6-way join, small dims broadcast, one shuffle for the
    // fact-fact join — the plan GP reaches with Motions we reach with AQE.
    Q("q_join_multiway", Some(
      """SELECT n.n_name, """.stripMargin +
      Q.oSum("l.l_extendedprice * (1 - l.l_discount)") +
      """ AS revenue
        |FROM customer c
        |JOIN orders o   ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |              AND c.c_nationkey = s.s_nationkey
        |JOIN nation n   ON s.s_nationkey = n.n_nationkey
        |JOIN region r   ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.customer
          .join(t.orders, $"c_custkey" === $"o_custkey")
          .join(t.lineitem, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(t.supplier),
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(t.region.filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(Q.dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
    },

    // ---- sort / distinct (§2.6) ------------------------------------
    // Explicit NULLS FIRST pins PG-vs-Spark default null-order drift
    // (SURVEY §7.4 watch list).
    Q("q_sort_multikey", Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  nullif(o_orderpriority, '1-URGENT') AS pri
        |FROM orders
        |ORDER BY pri ASC NULLS FIRST, o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Tables.T(s, dir).orders
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
            nullif($"o_orderpriority", lit("1-URGENT")).as("pri"))
          .orderBy($"pri".asc_nulls_first, $"o_totalprice".desc, $"o_orderkey")
          .limit(100)
    },

    Q("q_distinct", Some(
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)) {
      (s, dir) =>
        Tables.T(s, dir).lineitem
          .select("l_returnflag", "l_linestatus")
          .distinct()
          .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- set operations (§2.7, nodeSetOp.c:195) --------------------
    Q("q_setop_union_all", Some(
      """SELECT * FROM (
        |  SELECT c_custkey AS k, 'cust' AS src FROM customer WHERE c_custkey <= 50
        |  UNION ALL
        |  SELECT s_suppkey AS k, 'supp' AS src FROM supplier WHERE s_suppkey <= 50
        |) t ORDER BY k, src""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.customer.filter($"c_custkey" <= 50)
          .select($"c_custkey".as("k"), lit("cust").as("src"))
          .unionAll(t.supplier.filter($"s_suppkey" <= 50)
            .select($"s_suppkey".as("k"), lit("supp").as("src")))
          .orderBy("k", "src")
    },

    Q("q_setop_union", Some(
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nk""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.customer.select($"c_nationkey".as("nk"))
          .union(t.supplier.select($"s_nationkey"))
          .distinct()
          .orderBy("nk")
    },

    Q("q_setop_intersect", Some(
      """SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 1000
        |INTERSECT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 1000
        |ORDER BY nk""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.customer.filter($"c_acctbal" > 1000).select($"c_nationkey".as("nk"))
          .intersect(t.supplier.filter($"s_acctbal" > 1000)
            .select($"s_nationkey"))
          .orderBy("nk")
    },

    Q("q_setop_intersect_all", Some(
      """SELECT k FROM (
        |  SELECT l_partkey AS k FROM lineitem WHERE l_orderkey <= 500
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_orderkey BETWEEN 250 AND 750
        |) t ORDER BY k""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val li = Tables.T(s, dir).lineitem
        li.filter($"l_orderkey" <= 500).select($"l_partkey".as("k"))
          .intersectAll(li.filter($"l_orderkey".between(250, 750))
            .select($"l_partkey"))
          .orderBy("k")
    },

    Q("q_setop_except", Some(
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nk""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val t = Tables.T(s, dir)
        t.customer.select($"c_nationkey".as("nk"))
          .except(t.supplier.select($"s_nationkey"))
          .orderBy("nk")
    },

    Q("q_setop_except_all", Some(
      """SELECT k FROM (
        |  SELECT l_partkey AS k FROM lineitem WHERE l_orderkey <= 500
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_orderkey BETWEEN 250 AND 750
        |) t ORDER BY k""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val li = Tables.T(s, dir).lineitem
        li.filter($"l_orderkey" <= 500).select($"l_partkey".as("k"))
          .exceptAll(li.filter($"l_orderkey".between(250, 750))
            .select($"l_partkey"))
          .orderBy("k")
    }
  )
}
