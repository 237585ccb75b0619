package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `xml_is_well_formed[_document|_content]` (reference:
  * src/backend/utils/adt/xml.c wellformed_xml / xml_is_well_formed;
  * xml_in's rejection semantics ride the same parse). PG parses with
  * libxml; here the JDK's built-in StAX parser does the same check —
  * still a per-row scalar inside codegen, no UDF registration, no new
  * dependency.
  *
  * `doc = true`  → must be a complete document (one root, optional XML
  *                 declaration) — xml_is_well_formed_document.
  * `doc = false` → content fragment: any sequence of character data and
  *                 balanced elements (xml.c xml_parse with
  *                 XMLOPTION_CONTENT wraps content in a synthetic root;
  *                 identical trick here) — xml_is_well_formed_content,
  *                 and the default xmloption, so also
  *                 xml_is_well_formed.
  * DTDs and external entities are disabled (PG likewise refuses to
  * fetch external entities; also the standard XXE hardening). */
case class XmlWellFormedExpr(child: Expression, doc: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"xml_is_well_formed requires STRING input, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String =
    if (doc) "xml_is_well_formed_document" else "xml_is_well_formed_content"

  protected override def nullSafeEval(input: Any): Any =
    XmlWellFormedExpr.wellFormed(
      input.asInstanceOf[UTF8String].toString, doc)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.XmlWellFormedExpr.wellFormed(
      |  $c.toString(), $doc);
      |""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): XmlWellFormedExpr = copy(child = newChild)
}

object XmlWellFormedExpr {

  // XMLInputFactory instances are cheap to use but not documented
  // thread-safe for concurrent reader creation — one per task thread
  private val factory =
    new ThreadLocal[javax.xml.stream.XMLInputFactory] {
      override def initialValue(): javax.xml.stream.XMLInputFactory = {
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD,
          java.lang.Boolean.FALSE)
        f.setProperty(
          javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
          java.lang.Boolean.FALSE)
        f
      }
    }

  def wellFormed(s: String, doc: Boolean): Boolean = {
    // content mode: wrap in a synthetic root (xml.c xml_parse's
    // XMLOPTION_CONTENT trick). A leading XML declaration is STRIPPED
    // first, like xml_parse's parse_xml_decl — PG accepts
    // '<?xml ...?><x/>' as content (r8 review fix).
    val body =
      if (doc) s
      else {
        val stripped =
          "(?s)^\\s*<\\?xml\\b.*?\\?>".r.replaceFirstIn(s, "")
        "<graft__r>" + stripped + "</graft__r>"
      }
    try {
      val r = factory.get().createXMLStreamReader(
        new java.io.StringReader(body))
      try { while (r.hasNext) r.next(); true }
      finally r.close()
    } catch { case _: Exception => false }
  }
}
