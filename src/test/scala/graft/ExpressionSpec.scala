package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.SimHash32Expr
import graft.operators.Dedup
import graft.sql.GpSqlDialect

/** Custom Catalyst expression + extensions + GP SQL dialect execution. */
class ExpressionSpec extends AnyFunSuite {
  import TestSpark._

  test("native simhash32 ≡ declarative simhashSignatures pipeline") {
    import spark.implicits._
    val docs = Tables.T(spark, sf).documents.limit(50)
    val native = docs
      .select($"doc_id", SimHash32Expr.simhash32($"text").as("simhash"))
      .as[(Long, Long)].collect().toMap
    val declarative = Dedup.simhashSignatures(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(native == declarative)
    assert(native.nonEmpty)
  }

  test("simhash32 is SQL-callable via the function registry") {
    graft.functions.PgFunctions.registerAll(spark)
    val v = spark.sql("SELECT simhash32('alpha beta gamma') AS s")
      .head.getLong(0)
    assert(v == SimHash32Expr.compute("alpha beta gamma"))
  }

  test("optimizer rule removes redundant lower() under simhash32") {
    import spark.implicits._
    val df = Seq("A B").toDF("t")
      .select(SimHash32Expr.simhash32(lower($"t")).as("s"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("lower("), opt)
    assert(df.head.getLong(0) == SimHash32Expr.compute("a b"))
  }

  test("GpSqlDialect parses and strips the MPP clauses") {
    val ddl = GpSqlDialect.parse(
      """CREATE TABLE t (a int) WITH (appendonly=true, compresstype=zlib)
        |DISTRIBUTED BY (a, b)""".stripMargin)
    assert(ddl.distributionCols == Seq("a", "b"))
    assert(ddl.storageOptions("compresstype") == "zlib")
    assert(GpSqlDialect.parquetCodec(ddl) == "gzip")
    assert(ddl.cleanSql == "CREATE TABLE t (a int)")
    assert(GpSqlDialect.parse("CREATE TABLE r (x int) DISTRIBUTED REPLICATED")
      .replicated)
  }

  test("GpSqlDialect rejects unsupported GP surfaces loudly") {
    Seq(
      "SELECT * FROM orders FOR UPDATE",
      "CREATE INDEX idx ON orders(o_orderkey)",
      "CREATE TRIGGER t AFTER INSERT ON orders EXECUTE f()",
      "DECLARE c1 CURSOR FOR SELECT 1"
    ).foreach { sql =>
      intercept[UnsupportedOperationException] {
        GpSqlDialect.execute(spark, sql, "/tmp/never")
      }
    }
  }

  test("GpSqlDialect.execute runs GP-dialect CTAS end-to-end") {
    Tables.registerAll(spark, sf)
    val out = GpSqlDialect.execute(spark,
      """CREATE TABLE nation_asia
        |WITH (appendonly=true, orientation=column)
        |DISTRIBUTED BY (n_regionkey)
        |AS SELECT * FROM nation WHERE n_regionkey = 2""".stripMargin,
      s"${System.getProperty("java.io.tmpdir")}/graft_gpsql")
    val viaView = spark.sql("SELECT count(*) FROM nation_asia").head.getLong(0)
    assert(viaView == out.count())
    assert(viaView ==
      spark.sql("SELECT count(*) FROM nation WHERE n_regionkey = 2")
        .head.getLong(0))
  }
}
