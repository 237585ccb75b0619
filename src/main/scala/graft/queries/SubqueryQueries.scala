package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.RecursiveCte

/** SURVEY §2.9 subplans: scalar / IN / EXISTS / correlated subqueries
  * (reference: src/backend/executor/nodeSubplan.c:66, GP unnesting
  * cdb/cdbsubselect.c:421), lateral apply (ORCA CXformInnerApply2InnerJoin),
  * CTEs incl. ShareInputScan-style reuse (nodeShareInputScan.c:148) and
  * recursive CTEs (nodeRecursiveunion.c:76).
  *
  * These go through `spark.sql` deliberately: the subquery surface is a SQL
  * surface, and Catalyst's RewritePredicateSubquery / DecorrelateInnerQuery
  * are the analogue of GP's subselect unnesting.
  */
object SubqueryQueries {

  private def sql(s: org.apache.spark.sql.SparkSession, dir: String, text: String) = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  val defs: Seq[Q] = Seq(

    // Uncorrelated scalar subquery (SubPlan → InitPlan in GP).
    Q("q_subq_scalar", Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.97
        |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
      sql(s, dir,
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.97
          |ORDER BY o_orderkey""".stripMargin)
    },

    Q("q_subq_in", Some(
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 50)
        |ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
      sql(s, dir,
        """SELECT p_partkey, p_name FROM part
          |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 50)
          |ORDER BY p_partkey""".stripMargin)
    },

    // Correlated EXISTS with a non-key predicate → decorrelated semi join.
    Q("q_subq_exists_corr", Some(
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_suppkey = s.s_suppkey
        |                AND l.l_quantity >= 49
        |                AND l.l_shipdate >= TIMESTAMP '2001-01-01')
        |ORDER BY s_suppkey""".stripMargin)) { (s, dir) =>
      sql(s, dir,
        """SELECT s_suppkey, s_name FROM supplier s
          |WHERE EXISTS (SELECT 1 FROM lineitem l
          |              WHERE l.l_suppkey = s.s_suppkey
          |                AND l.l_quantity >= 49
          |                AND l.l_shipdate >= TIMESTAMP '2001-01-01')
          |ORDER BY s_suppkey""".stripMargin)
    },

    // Correlated scalar subquery in the SELECT list.
    Q("q_subq_scalar_corr", Some(
      """SELECT n_nationkey, n_name,
        |  (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey)
        |    AS n_cust
        |FROM nation n ORDER BY n_nationkey""".stripMargin)) { (s, dir) =>
      sql(s, dir,
        """SELECT n_nationkey, n_name,
          |  (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey)
          |    AS n_cust
          |FROM nation n ORDER BY n_nationkey""".stripMargin)
    },

    // `> ALL (subquery)` — PG plans a SubPlan with ALL test; Spark engine
    // expresses the identical semantics via the max() rewrite (the
    // transformation ORCA applies, CXformSubqueryUnnest).
    Q("q_subq_all", Some(
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > ALL (SELECT s_acctbal FROM supplier WHERE s_nationkey = 3)
        |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      sql(s, dir,
        """SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_acctbal > (SELECT max(s_acctbal) FROM supplier
          |                   WHERE s_nationkey = 3)
          |ORDER BY c_custkey""".stripMargin)
    },

    // LATERAL correlated derived table (ORCA Apply → Join).
    Q("q_subq_lateral", Some(
      """SELECT c.c_custkey, t.n_orders, t.max_price
        |FROM customer c,
        |  LATERAL (SELECT count(*) AS n_orders, max(o_totalprice) AS max_price
        |           FROM orders o WHERE o.o_custkey = c.c_custkey) t
        |WHERE c.c_custkey <= 100
        |ORDER BY c.c_custkey""".stripMargin)) { (s, dir) =>
      sql(s, dir,
        """SELECT c.c_custkey, t.n_orders, t.max_price
          |FROM customer c,
          |  LATERAL (SELECT count(*) AS n_orders, max(o_totalprice) AS max_price
          |           FROM orders o WHERE o.o_custkey = c.c_custkey) t
          |WHERE c.c_custkey <= 100
          |ORDER BY c.c_custkey""".stripMargin)
    },

    // Multi-reference CTE — GP ShareInputScan materializes once
    // (planshare.c:181); Catalyst: InlineCTE / ReuseExchange.
    Q("q_cte", Some(
      s"""WITH spend AS (
         |  SELECT o_custkey, count(*) AS n, ${Q.oSum("o_totalprice")} AS total
         |  FROM orders GROUP BY o_custkey)
         |SELECT a.o_custkey, a.n, a.total
         |FROM spend a JOIN (SELECT max(total) AS mx FROM spend) m
         |  ON a.total > m.mx * 0.8
         |ORDER BY a.o_custkey""".stripMargin)) { (s, dir) =>
      sql(s, dir,
        s"""WITH spend AS (
           |  SELECT o_custkey, count(*) AS n, ${Q.oSum("o_totalprice")} AS total
           |  FROM orders GROUP BY o_custkey)
           |SELECT a.o_custkey, a.n, a.total
           |FROM spend a JOIN (SELECT max(total) AS mx FROM spend) m
           |  ON a.total > m.mx * 0.8
           |ORDER BY a.o_custkey""".stripMargin)
    },

    // WITH RECURSIVE — reachability over an edge relation derived from
    // nation (k → k+5 chains). Spark: RecursiveCte fixpoint loop.
    Q("q_cte_recursive", Some(
      """WITH RECURSIVE edges AS (
        |  SELECT n_nationkey AS src, n_nationkey + 5 AS dst
        |  FROM nation WHERE n_nationkey + 5 <= 24),
        |reach(node) AS (
        |  SELECT 0
        |  UNION
        |  SELECT e.dst FROM edges e JOIN reach r ON e.src = r.node)
        |SELECT node FROM reach ORDER BY node""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val nation = Tables.T(s, dir).nation
      val edges = nation
        .filter($"n_nationkey" + 5 <= 24)
        .select($"n_nationkey".as("src"), ($"n_nationkey" + 5).as("dst"))
      val seed = s.range(1).select(lit(0).as("node"))
      RecursiveCte.unionDistinct(seed, delta =>
        edges.join(delta, edges("src") === delta("node"))
          .select(edges("dst").as("node")))
        .orderBy("node")
    },

    // The same reachability, but executed FROM the GP SQL TEXT through
    // GpSqlDialect (gram.y:12165 WITH RECURSIVE) — parser + semi-naive
    // fixpoint, not hand-built DataFrames.
    Q("q_sql_recursive", Some(
      """WITH RECURSIVE edges AS (
        |  SELECT n_nationkey AS src, n_nationkey + 5 AS dst
        |  FROM nation WHERE n_nationkey + 5 <= 24),
        |reach(node) AS (
        |  SELECT 0
        |  UNION
        |  SELECT e.dst FROM edges e JOIN reach r ON e.src = r.node)
        |SELECT CAST(node AS BIGINT) AS node FROM reach ORDER BY node""".stripMargin)) {
      (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT n_nationkey AS src, n_nationkey + 5 AS dst
            |FROM nation WHERE n_nationkey + 5 <= 24""".stripMargin)
          .createOrReplaceTempView("edges")
        graft.sql.GpSqlDialect.execute(s,
          """WITH RECURSIVE reach(node) AS (
            |  SELECT CAST(0 AS BIGINT)
            |  UNION
            |  SELECT e.dst FROM edges e JOIN reach r ON e.src = r.node)
            |SELECT node FROM reach ORDER BY node""".stripMargin,
          System.getProperty("java.io.tmpdir"))
    }
  )
}
