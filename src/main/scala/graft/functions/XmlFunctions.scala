package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL/XML publishing functions (reference src/backend/utils/adt/xml.c:
  * xmlcomment:427, xmlconcat:468, xmlelement:584, xmlpi:726,
  * escape_xml:2285).
  *
  * The reference's `xml` type is serialized text (varlena) and its
  * publishing functions are string builders over escaped content — so the
  * Spark-first mapping is StringType columns + codegen concat/replace
  * chains; no custom type is needed and everything stays in whole-stage
  * codegen. XPath extraction rides Spark's native UDFXPath family (see
  * the xpath section below). Parsing/validation (xml_in via libxml) is
  * [[graft.expressions.XmlWellFormedExpr]] (r8): well-formedness checks
  * and [[xmlParse]]'s reject-on-malformed contract.
  */
object XmlFunctions {

  /** xml_in rejection semantics (xml.c xml_parse; r8): malformed input
    * RAISES like PG instead of passing through — AssertOp composition
    * over the well-formedness expression, same pattern as enumAssert.
    * NULL stays NULL (xml_in of NULL is NULL, no parse). */
  def xmlParse(c: Column, document: Boolean = false): Column = {
    val ok = call_function(
      if (document) "xml_is_well_formed_document"
      else "xml_is_well_formed_content", c)
    when(c.isNotNull && !ok,
      raise_error(concat(lit("invalid XML "),
        lit(if (document) "document" else "content"), lit(": "),
        substring(c, 1, 80))))
      .otherwise(c)
  }

  /** escape_xml (xml.c:2285-2313): & < > and CR, in this order — & first
    * so entity ampersands aren't double-escaped. */
  def escapeContent(c: Column): Column = {
    val amp = replace(c, lit("&"), lit("&amp;"))
    val lt = replace(amp, lit("<"), lit("&lt;"))
    val gt = replace(lt, lit(">"), lit("&gt;"))
    replace(gt, lit("\r"), lit("&#x0d;"))
  }

  /** Attribute-value escape: content rules plus `"` → &quot; (PG routes
    * attribute text through libxml's attribute writer, which quotes). */
  def escapeAttr(c: Column): Column =
    replace(escapeContent(c), lit("\""), lit("&quot;"))

  /** Raw text → XML content (the implicit text→xml coercion xmlelement
    * applies to non-XML content args). Fragments built by the other
    * constructors are already XML and must NOT go through this. */
  def xmlText(c: Column): Column = escapeContent(c.cast("string"))

  /** xmlelement(name n, xmlattributes(...), content...) (xml.c:584).
    * Null attributes are omitted (per SQL/XML: null attribute value →
    * attribute absent); null content args contribute nothing; a content-
    * less element self-closes (`<n/>`). Content args are XML fragments
    * inserted verbatim (PG passes xml-typed content through and escapes
    * only raw text — wrap text in [[xmlText]]). */
  def xmlElement(
      name: String,
      attrs: Seq[(String, Column)] = Nil,
      content: Seq[Column] = Nil): Column = {
    val attrStr = attrs.map { case (an, av) =>
      when(av.isNull, lit("")).otherwise(
        concat(lit(s""" $an=""""), escapeAttr(av.cast("string")), lit("\"")))
    }.foldLeft(lit("")) { (a, b) => concat(a, b) }
    val inner = content.map(c => coalesce(c.cast("string"), lit("")))
      .foldLeft(lit("")) { (a, b) => concat(a, b) }
    when(length(inner) === 0,
      concat(lit(s"<$name"), attrStr, lit("/>")))
      .otherwise(concat(
        lit(s"<$name"), attrStr, lit(">"), inner, lit(s"</$name>")))
  }

  /** xmlforest(v AS n, ...): one element per non-null value, nulls
    * dropped entirely (SQL/XML forest semantics). */
  def xmlForest(items: (String, Column)*): Column =
    items.map { case (n, v) =>
      when(v.isNull, lit("")).otherwise(
        concat(lit(s"<$n>"), escapeContent(v.cast("string")), lit(s"</$n>")))
    }.reduceLeft((a, b) => concat(a, b))

  /** xmlconcat (xml.c:468): concatenation, null args ignored; all-null
    * yields null like PG. */
  def xmlConcat(cols: Column*): Column = {
    val joined = cols.map(c => coalesce(c, lit("")))
      .reduceLeft((a, b) => concat(a, b))
    when(cols.map(_.isNull).reduceLeft(_ && _), lit(null))
      .otherwise(joined)
  }

  /** xmlcomment (xml.c:427) — PG errors on '--' or trailing '-' in the
    * argument; here rendered unconditionally (validation documented). */
  def xmlComment(c: Column): Column =
    concat(lit("<!--"), c.cast("string"), lit("-->"))

  /** xmlpi(name target [, content]) (xml.c:726) — absent/null content
    * renders the target alone, `<?target?>`, as xml.c does. */
  def xmlPi(target: String, c: Column): Column =
    when(c.isNull, lit(s"<?$target?>"))
      .otherwise(concat(lit(s"<?$target "), c.cast("string"), lit("?>")))

  // ---- XPath extraction (xml.c:4243 xpath, 4340 xpath_exists) ------
  // PG's argument order (path first) is kept; Spark's native codegen'd
  // UDFXPath family takes the document first. PG returns matched nodes
  // as xml[]; Spark's `xpath` returns the nodes' string values — for
  // text()-selecting paths (the warehouse-query shape) the two agree.

  /** xpath(path, xml) → array of matched string values. */
  def xpath(path: String, xml: Column): Column =
    call_function("xpath", xml, lit(path))

  /** First match as text — PG idiom `(xpath(p, x))[1]::text`. */
  def xpathString(path: String, xml: Column): Column =
    call_function("xpath_string", xml, lit(path))

  /** First match cast to bigint — PG `(xpath(p, x))[1]::text::bigint`. */
  def xpathLong(path: String, xml: Column): Column =
    call_function("xpath_long", xml, lit(path))

  /** First match cast to double. */
  def xpathDouble(path: String, xml: Column): Column =
    call_function("xpath_double", xml, lit(path))

  /** xpath_exists(path, xml) (xml.c:4340). */
  def xpathExists(path: String, xml: Column): Column =
    call_function("xpath_boolean", xml, lit(path))

  /** xmlagg: ordered document aggregation = sort-by-key + join. The
    * Spark shape (collect_list of (key, fragment) structs, array_sort,
    * transform-project, join) keeps partial aggregation; the DuckDB
    * oracle is string_agg(x, '' ORDER BY key). */
  def xmlAgg(key: Column, fragment: Column): Column =
    array_join(
      transform(array_sort(collect_list(struct(key.as("k"),
        fragment.as("v")))), x => x.getField("v")),
      "")
}
