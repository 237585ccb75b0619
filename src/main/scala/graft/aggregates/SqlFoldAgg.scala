package graft.aggregates

import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.DataType

/** Executable `CREATE AGGREGATE` built from SQL-language support
  * functions (reference: src/backend/commands/aggregatecmds.c:47-58
  * DefineAggregate; catalog src/include/catalog/pg_aggregate.h:35).
  *
  * PG's aggregate model — `state := sfunc(state, input)` per row,
  * `combinefunc(state, state)` across parallel workers,
  * `finalfunc(state)` once per group — IS Spark's
  * [[DeclarativeAggregate]] contract (initialValues / updateExpressions
  * / mergeExpressions / evaluateExpression), so a user aggregate whose
  * support functions are SQL-language expressions lowers to a native
  * declarative aggregate: the bodies are parsed + analyzed ONCE at
  * CREATE time (GpSqlDialect resolves them against a dummy relation
  * whose attributes are the sfunc's parameters), and every call site
  * plans as ordinary codegen'd expressions with Spark's 2-stage
  * partial/final split — exactly GP's 2-phase agg across Motion.
  *
  * Scale: because merge is the user's combinefunc, the partial
  * aggregate runs map-side and only `stype`-width states cross the
  * shuffle — same physics as built-in sum(). No collected lists, no
  * UDF/serialization wall, whole-stage codegen throughout.
  *
  * `step`/`combine`/`finish` are PRE-RESOLVED expression trees that
  * reference the placeholder attributes given alongside them; this node
  * splices its buffer/input attributes over those placeholders by
  * exprId. They are intentionally NOT children: the analyzer must not
  * try to bind their references against the query's input relation.
  *
  * @param inputs  the aggregated input expressions (call-site args —
  *                PG aggregates may take several, e.g. a weighted sum)
  * @param stype   declared transition state type
  * @param init    resolved INITCOND literal (cast to stype)
  * @param stateIn placeholder attr for the sfunc's state parameter
  * @param inputIn placeholder attrs for the sfunc's input parameters
  * @param step    resolved sfunc body over (stateIn, inputIn…)
  * @param mergeA/mergeB/combine resolved combinefunc body + params
  * @param finalIn/finish        resolved finalfunc body + param (None =
  *                              identity, PG's missing-finalfunc default)
  */
case class SqlFoldAgg(
    inputs: Seq[Expression],
    name: String,
    stype: DataType,
    init: Expression,
    stateIn: AttributeReference,
    inputIn: Seq[AttributeReference],
    step: Expression,
    mergeA: AttributeReference,
    mergeB: AttributeReference,
    combine: Expression,
    finalIn: Option[AttributeReference],
    finish: Option[Expression])
  extends DeclarativeAggregate {

  private lazy val acc = AttributeReference(s"${name}_state", stype,
    nullable = true)()

  override def children: Seq[Expression] = inputs
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqlFoldAgg =
    copy(inputs = newChildren)

  override def nullable: Boolean = true
  override def dataType: DataType = finish.map(_.dataType).getOrElse(stype)
  override def prettyName: String = name

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(init)

  private def splice(e: Expression,
      subs: Map[Long, Expression]): Expression =
    e.transform {
      case a: AttributeReference if subs.contains(a.exprId.id) =>
        subs(a.exprId.id)
    }

  override lazy val updateExpressions: Seq[Expression] = Seq(
    splice(step, Map[Long, Expression](stateIn.exprId.id -> acc) ++
      inputIn.zip(inputs).map { case (p, in) =>
        val cast: Expression =
          if (in.dataType == p.dataType) in else Cast(in, p.dataType)
        p.exprId.id -> cast
      }))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    splice(combine, Map(
      mergeA.exprId.id -> acc.left,
      mergeB.exprId.id -> acc.right)))

  override lazy val evaluateExpression: Expression = (finalIn, finish) match {
    case (Some(p), Some(body)) => splice(body, Map(p.exprId.id -> acc))
    case _ => acc
  }
}
