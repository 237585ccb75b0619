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
}
