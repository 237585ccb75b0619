package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

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

  def register(spark: SparkSession): Unit =
    spark.udf.register("jsonb_contains",
      (h: String, n: String) => contains(h, n))
}
