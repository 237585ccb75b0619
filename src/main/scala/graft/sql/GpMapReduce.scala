package graft.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** gpmapreduce YAML job runner (reference:
  * gpcontrib/gpmapreduce/demo/2_wordcount.yml — VERSION / DEFINE
  * (INPUT, MAP, OUTPUT) / EXECUTE (RUN: SOURCE, MAP, REDUCE, TARGET)).
  *
  * Spark-first lowering: an INPUT is a table/query/file DataFrame; a
  * MAP is a SQL statement over the source view (declared RETURNS
  * columns enforced); a builtin REDUCE (IDENTITY/SUM/COUNT/MIN/MAX/
  * AVG — gpmapreduce's predefined reduces) is a hash aggregate on
  * `key` with map-side partials. The whole job stays one declarative
  * plan per RUN, so Catalyst owns the shuffle/combine strategy the
  * reference implements as its own MR executor.
  *
  * Python/perl MAP bodies (the reference embeds interpreters) reject
  * loudly — `LANGUAGE: sql` is the executable tier, matching the
  * engine's plpgsql triage policy. Custom TRANSITION/CONSOLIDATE
  * reduces likewise defer to CREATE AGGREGATE. */
object GpMapReduce {

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString.toUpperCase -> v }.toMap
    case other => throw new IllegalArgumentException(
      s"gpmapreduce: expected a mapping, got $other")
  }

  private def asList(o: Any): Seq[Any] = o match {
    case l: java.util.List[_] => l.asScala.toSeq
    case null => Seq.empty
    case one => Seq(one)
  }

  def run(spark: SparkSession, yamlText: String,
      basePath: String): DataFrame = {
    val doc = asMap(new org.yaml.snakeyaml.Yaml().load[Any](yamlText))
    val defines = asList(doc.getOrElse("DEFINE", null)).map(asMap)
    val inputs = scala.collection.mutable.Map.empty[String, DataFrame]
    val maps = scala.collection.mutable.Map.empty[String, Map[String, Any]]
    val outputs = scala.collection.mutable.Map.empty[String, Map[String, Any]]
    defines.foreach { d =>
      d.get("INPUT").foreach { in =>
        val m = asMap(in)
        val name = m("NAME").toString
        val df = m match {
          case _ if m.contains("TABLE") =>
            spark.table(m("TABLE").toString)
          case _ if m.contains("QUERY") =>
            GpSqlDialect.execute(spark, m("QUERY").toString, basePath)
          case _ if m.contains("FILE") =>
            // seghost:path prefixes are segment placement hints — strip
            val paths = asList(m("FILE"))
              .map(_.toString.replaceFirst("^[\\w.-]+:(?=/)", ""))
            spark.read.option("header", "false").text(paths: _*)
              .toDF("value")
          case _ => throw new IllegalArgumentException(
            s"gpmapreduce INPUT $name: need TABLE, QUERY or FILE")
        }
        inputs(name) = df
        df.createOrReplaceTempView(name)
      }
      d.get("MAP").foreach { mp =>
        val m = asMap(mp)
        maps(m("NAME").toString) = m
      }
      d.get("OUTPUT").foreach { o =>
        val m = asMap(o)
        outputs(m("NAME").toString) = m
      }
      d.get("REDUCE").foreach { r =>
        val m = asMap(r)
        throw new UnsupportedOperationException(
          s"gpmapreduce custom REDUCE ${m.getOrElse("NAME", "?")}: " +
            "TRANSITION-function reduces defer — use CREATE AGGREGATE " +
            "and a builtin REDUCE here")
      }
    }
    val runs = asList(doc.getOrElse("EXECUTE", null)).map(asMap)
      .flatMap(_.get("RUN")).map(asMap)
    require(runs.nonEmpty, "gpmapreduce: EXECUTE has no RUN")
    var last: DataFrame = spark.emptyDataFrame
    runs.foreach { r =>
      val source = r("SOURCE").toString
      var df = inputs.getOrElse(source,
        throw new IllegalArgumentException(
          s"gpmapreduce RUN: unknown SOURCE $source"))
      r.get("MAP").foreach { mn =>
        val m = maps.getOrElse(mn.toString,
          throw new IllegalArgumentException(
            s"gpmapreduce RUN: unknown MAP $mn"))
        val lang = m.getOrElse("LANGUAGE", "sql").toString.toLowerCase
        if (lang != "sql") throw new UnsupportedOperationException(
          s"gpmapreduce MAP $mn: LANGUAGE $lang needs an embedded " +
            "interpreter — rewrite the body as LANGUAGE sql")
        df = spark.sql(m("FUNCTION").toString)
        // RETURNS declares the map's output signature — enforce names
        val declared = asList(m.getOrElse("RETURNS", null))
          .map(_.toString.trim.split("\\s+")(0).toLowerCase)
        if (declared.nonEmpty)
          require(df.columns.map(_.toLowerCase).toSeq == declared,
            s"gpmapreduce MAP $mn: RETURNS ${declared.mkString(",")} != " +
              s"map output ${df.columns.mkString(",")}")
      }
      r.get("REDUCE").foreach { rd =>
        val vCol = df.columns.find(_.equalsIgnoreCase("value"))
          .getOrElse(throw new IllegalArgumentException(
            "gpmapreduce REDUCE: map output needs a `value` column"))
        val keys = df.columns.filterNot(_.equalsIgnoreCase("value"))
          .map(col).toSeq
        df = rd.toString.toUpperCase match {
          case "IDENTITY" => df
          case "SUM" => df.groupBy(keys: _*).agg(sum(vCol).as("value"))
          case "COUNT" =>
            df.groupBy(keys: _*).agg(count(lit(1)).as("value"))
          case "MIN" => df.groupBy(keys: _*).agg(min(vCol).as("value"))
          case "MAX" => df.groupBy(keys: _*).agg(max(vCol).as("value"))
          case "AVG" => df.groupBy(keys: _*).agg(avg(vCol).as("value"))
          case other => throw new UnsupportedOperationException(
            s"gpmapreduce REDUCE $other: not a builtin " +
              "(IDENTITY/SUM/COUNT/MIN/MAX/AVG)")
        }
      }
      r.get("TARGET").foreach { t =>
        val o = outputs.getOrElse(t.toString,
          throw new IllegalArgumentException(
            s"gpmapreduce RUN: unknown OUTPUT $t"))
        o.get("TABLE").foreach { tbl =>
          df.createOrReplaceTempView(tbl.toString)
        }
        o.get("FILE").foreach { f =>
          df.write.mode("overwrite").parquet(
            f.toString.replaceFirst("^[\\w.-]+:(?=/)", ""))
        }
      }
      last = df
    }
    last
  }
}
