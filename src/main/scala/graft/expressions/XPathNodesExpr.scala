package graft.expressions

import javax.xml.parsers.DocumentBuilderFactory
import javax.xml.transform.{OutputKeys, TransformerFactory}
import javax.xml.transform.dom.DOMSource
import javax.xml.transform.stream.StreamResult
import javax.xml.xpath.{XPathConstants, XPathFactory}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PG-faithful `xpath()` node-set semantics (reference:
  * src/backend/utils/adt/xml.c:4243 xpath — returns xml[], i.e. the
  * SERIALIZED matched nodes, where Spark's native UDFXPath family
  * returns only their text values). `xpath_nodes(path, xml)` evaluates
  * the path as a NODESET and serializes each matched node (elements
  * with tags and attributes, text nodes as their value) — closing the
  * documented divergence for callers that consume the fragments.
  *
  * Compat tier, not a hot-path kernel: per-row DOM parse + XPath
  * evaluation (CodegenFallback) — the same cost profile PG pays
  * (xml.c goes through libxml2 per call). Invalid XML or an invalid
  * path returns NULL, matching the permissive behavior of the
  * engine's other publishing functions. */
case class XPathNodesExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "xpath_nodes requires (STRING path, STRING xml), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // invalid XML/path returns null regardless of input nullability
  override def nullable: Boolean = true
  override def prettyName: String = "xpath_nodes"

  protected override def nullSafeEval(path: Any, xml: Any): Any =
    XPathNodesExpr.evalNodes(
      path.asInstanceOf[UTF8String].toString,
      xml.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XPathNodesExpr =
    copy(left = newLeft, right = newRight)
}

object XPathNodesExpr {

  // DocumentBuilder/XPath/Transformer are not thread-safe; one per task
  // thread (executor cores ≪ pool cost)
  private val builders = ThreadLocal.withInitial { () =>
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder()
  }
  private val xpaths = ThreadLocal.withInitial(() =>
    XPathFactory.newInstance().newXPath())
  private val transformers = ThreadLocal.withInitial { () =>
    val t = TransformerFactory.newInstance().newTransformer()
    t.setOutputProperty(OutputKeys.OMIT_XML_DECLARATION, "yes")
    t
  }

  def evalNodes(path: String, xml: String): GenericArrayData =
    try {
      val doc = builders.get.parse(
        new java.io.ByteArrayInputStream(
          xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val nodes = xpaths.get.compile(path)
        .evaluate(doc, XPathConstants.NODESET)
        .asInstanceOf[org.w3c.dom.NodeList]
      val out = new Array[Any](nodes.getLength)
      var i = 0
      while (i < nodes.getLength) {
        val n = nodes.item(i)
        val s =
          if (n.getNodeType == org.w3c.dom.Node.TEXT_NODE) n.getNodeValue
          else {
            val w = new java.io.StringWriter()
            transformers.get.transform(new DOMSource(n), new StreamResult(w))
            w.toString
          }
        out(i) = UTF8String.fromString(s)
        i += 1
      }
      new GenericArrayData(out)
    } catch { case _: Exception => null }

  /** Column form; resolves through the function registry. */
  def xpathNodes(path: Column, xml: Column): Column =
    org.apache.spark.sql.functions.call_function("xpath_nodes", path, xml)
}
