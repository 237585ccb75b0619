package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType}

/** PG jsonb operator semantics (reference: src/backend/utils/adt/jsonb.c
  * — containment `@>`, jsonfuncs.c): recursive structural containment.
  * A Scala UDF is the sanctioned fallback here (SURVEY §2.10 engine
  * rule): the semantics are PG-specific and per-row O(|json|) — no
  * vectorization to lose. Jackson rides Spark's own classpath. */
object JsonbFunctions {

  private val mapper = new ObjectMapper()

  /** jsonb `@>`: does `haystack` structurally contain `needle`?
    * Objects: every needle entry contained in the same key; arrays:
    * every needle element contained in some haystack element; scalars:
    * equality. */
  def contains(haystack: String, needle: String): Boolean = {
    try containsNode(mapper.readTree(haystack), mapper.readTree(needle))
    catch { case _: Exception => false }
  }

  private def containsNode(h: JsonNode, n: JsonNode): Boolean = {
    if (h.isObject && n.isObject) {
      val fields = n.fields()
      var ok = true
      while (ok && fields.hasNext) {
        val e = fields.next()
        val hv = h.get(e.getKey)
        ok = hv != null && containsNode(hv, e.getValue)
      }
      ok
    } else if (h.isArray && n.isArray) {
      val it = n.elements()
      var ok = true
      while (ok && it.hasNext) {
        val nv = it.next()
        var found = false
        val hit = h.elements()
        while (!found && hit.hasNext) found = containsNode(hit.next(), nv)
        ok = found
      }
      ok
    } else if (h.isArray && !n.isArray && !n.isObject) {
      // PG quirk: scalar needle matches an array haystack element-wise
      val hit = h.elements()
      var found = false
      while (!found && hit.hasNext) found = containsNode(hit.next(), n)
      found
    } else if (h.isNumber && n.isNumber) {
      h.decimalValue().compareTo(n.decimalValue()) == 0
    } else h == n
  }

  /** PG `#>` / `#>>` path elements → a JsonPath string: integer steps
    * are 0-based array subscripts (`{vals,0}` ≡ `$.vals[0]`, reference:
    * jsonfuncs.c get_path_all), names are object keys. */
  private def jsonPath(path: Seq[String]): String =
    "$" + path.map { p =>
      if (p.forall(_.isDigit)) s"[$p]" else s".$p"
    }.mkString

  /** jsonb `#>> '{a,b,...}'` — extract at path as TEXT (scalars come back
    * unquoted). Codegen'd get_json_object, no UDF. */
  def extractPathText(c: Column, path: String*): Column =
    get_json_object(c, jsonPath(path))

  /** jsonb `#> '{a,b,...}'` — extract at path as JSON. Exact for object/
    * array targets (Spark returns their JSON text); scalar strings come
    * back unquoted like `#>>` — the one divergence of this mapping. */
  def extractPath(c: Column, path: String*): Column =
    get_json_object(c, jsonPath(path))

  /** PG `json_each(json)` — explode a one-level object into (key, value)
    * rows (jsonfuncs.c json_each). Use in a select with further exprs:
    * the returned column is a generator. Values surface as text, like
    * json_each_text; nested values keep their JSON form. */
  def jsonEach(c: Column): Column =
    explode(from_json(c, MapType(StringType, StringType)))

  /** PG `row_to_json(record)` — alias for to_json(struct(...)) spelled
    * for the PG surface (json.c row_to_json). */
  def rowToJson(cols: Column*): Column = to_json(struct(cols: _*))

  /** PG `json_populate_record(base, json)` — parse JSON into a typed
    * record (jsonfuncs.c json_populate_record). DDL-style schema, e.g.
    * "a INT, b STRING"; unknown keys dropped, missing keys null — PG's
    * lax population semantics match from_json's. */
  def jsonPopulateRecord(c: Column, ddl: String): Column =
    from_json(c, StructType.fromDDL(ddl))

  def register(spark: SparkSession): Unit =
    spark.udf.register("jsonb_contains",
      (h: String, n: String) => contains(h, n))

  // ---- SQL/JSON path (PG 12 / GPDB 7 — utils/adt/jsonpath.c grammar,
  // jsonpath_exec.c executeItem): the subset real warehouse queries
  // lean on, compiled ONCE per call site (the path is a literal) and
  // evaluated per row over Jackson like `@>` above (PG-specific
  // per-row semantics — the sanctioned UDF tier):
  //   $            root
  //   .key         member access
  //   [n]          array subscript (0-based)
  //   [*]          array wildcard (lax-mode iteration)
  //   ? (@ op lit) / ? (@.key op lit)
  //                filter the current items; op ∈ == != > >= < <=,
  //                lit a number or "string"
  // Anything outside the grammar raises at COMPILE (call-site) time —
  // never a silent wrong answer. ------------------------------------

  private[graft] sealed trait JpStep extends Serializable
  private[graft] final case class JpMember(key: String) extends JpStep
  private[graft] final case class JpIndex(i: Int) extends JpStep
  private[graft] case object JpWildcard extends JpStep
  private[graft] final case class JpFilter(
      key: Option[String], op: String, num: Option[java.math.BigDecimal],
      str: Option[String]) extends JpStep

  private[graft] def parseJsonPath(path: String): Seq[JpStep] = {
    var rest = path.trim
    require(rest.startsWith("$"), s"jsonpath must start with $$: $path")
    rest = rest.substring(1)
    val steps = scala.collection.mutable.ArrayBuffer.empty[JpStep]
    val Member = "^\\.([A-Za-z_][A-Za-z0-9_]*)(.*)$".r
    val Index = "^\\[(\\d+)\\](.*)$".r
    val Wild = "^\\[\\*\\](.*)$".r
    val Filt = ("^\\s*\\?\\s*\\(\\s*@(?:\\.([A-Za-z_][A-Za-z0-9_]*))?" +
      "\\s*(==|!=|>=|<=|>|<)\\s*" +
      "(?:(-?\\d+(?:\\.\\d+)?)|\"([^\"]*)\")\\s*\\)(.*)$").r
    while (rest.nonEmpty) {
      rest match {
        case Member(k, r) => steps += JpMember(k); rest = r
        case Index(i, r) => steps += JpIndex(i.toInt); rest = r
        case Wild(r) => steps += JpWildcard; rest = r
        case Filt(k, op, num, str, r) =>
          steps += JpFilter(Option(k), op,
            Option(num).map(new java.math.BigDecimal(_)), Option(str))
          rest = r
        case _ => throw new IllegalArgumentException(
          s"unsupported jsonpath at '...$rest' in: $path")
      }
    }
    steps.toSeq
  }

  private def jpEval(json: String, steps: Seq[JpStep]): Seq[JsonNode] = {
    val root = try mapper.readTree(json)
      catch { case _: Exception => return Seq.empty }
    steps.foldLeft(Seq(root)) { (cur, step) =>
      step match {
        case JpMember(k) => cur.flatMap(n => Option(n.get(k)))
        case JpIndex(i) =>
          cur.flatMap(n => if (n.isArray && n.size > i) Some(n.get(i))
            else None)
        case JpWildcard => cur.flatMap { n =>
          if (n.isArray) {
            val b = Seq.newBuilder[JsonNode]
            val it = n.elements()
            while (it.hasNext) b += it.next()
            b.result()
          } else Seq(n) // PG lax mode: a scalar iterates as itself
        }
        case JpFilter(key, op, num, str) => cur.filter { n0 =>
          val n = key.map(k => Option(n0.get(k)).orNull).getOrElse(n0)
          if (n == null) false
          else (num, str) match {
            case (Some(d), _) if n.isNumber =>
              val c = n.decimalValue().compareTo(d)
              op match {
                case "==" => c == 0
                case "!=" => c != 0
                case ">" => c > 0
                case ">=" => c >= 0
                case "<" => c < 0
                case "<=" => c <= 0
              }
            case (_, Some(s)) if n.isTextual =>
              val c = n.textValue().compareTo(s)
              op match {
                case "==" => c == 0
                case "!=" => c != 0
                case ">" => c > 0
                case ">=" => c >= 0
                case "<" => c < 0
                case "<=" => c <= 0
              }
            case _ => false // type mismatch: lax mode drops the item
          }
        }
      }
    }
  }

  /** `jsonb_path_exists(j, path)` ≡ the `@?` operator. */
  def pathExists(c: Column, path: String): Column = {
    val steps = parseJsonPath(path)
    udf((s: String) => if (s == null) false
      else jpEval(s, steps).nonEmpty).apply(c)
  }

  /** `jsonb_path_query_array(j, path)` — all matches as one JSON
    * array (text form). */
  def pathQueryArray(c: Column, path: String): Column = {
    val steps = parseJsonPath(path)
    udf((s: String) => if (s == null) null
      else jpEval(s, steps).map(_.toString).mkString("[", ",", "]"))
      .apply(c)
  }

  /** `jsonb_path_query_first(j, path)` — first match as JSON text,
    * NULL when nothing matches. */
  def pathQueryFirst(c: Column, path: String): Column = {
    val steps = parseJsonPath(path)
    udf((s: String) => if (s == null) null
      else jpEval(s, steps).headOption.map(_.toString).orNull).apply(c)
  }
}
