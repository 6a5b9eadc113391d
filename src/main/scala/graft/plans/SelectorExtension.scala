package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, MapType, StringType}
import org.apache.spark.sql.graft.ColumnBridge
import graft.labels.{LabelSet, LabelSelector}

/** Catalyst integration of label selectors (SURVEY §4 item 4):
  *
  *  - `MatchesSelector(labels, 'selector')` — a native predicate over a
  *    `map<string,string>` label column, evaluating the reference
  *    matcher semantics row-wise.
  *  - [[RewriteMatchesSelector]] — an optimizer rule that unfolds the
  *    opaque predicate into plain conjunctions/disjunctions of
  *    `element_at(map, key)` comparisons, which Catalyst can then
  *    simplify, null-propagate, and (for flattened label columns)
  *    push toward the scan.
  *  - [[SelectorExtension]] — `SparkSessionExtensions` wiring:
  *    `.withExtensions(new SelectorExtension)` or the
  *    `spark.sql.extensions` conf.
  */
case class MatchesSelector(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    // Key/value types matter, not just map-ness: a map<int,string>
    // would pass a bare MapType check only to ClassCastException on
    // getUTF8String at runtime (and in the rewrite's ElementAt).
    val mapOk = left.dataType match {
      case MapType(StringType, StringType, _) => true
      case _ => false
    }
    if (!mapOk || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"matches_selector expects (map<string,string>, string literal), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (right.foldable) {
      // Surface selector-grammar errors at analysis time, not first-row
      // eval. A NULL selector is legal TYPING (the expression then
      // evaluates to NULL per BinaryExpression semantics) — it must not
      // be stringified to "null" and parsed as an existence selector.
      right.eval(null) match {
        case null => TypeCheckResult.TypeCheckSuccess
        case v => LabelSelector.parse(v.toString) match {
          case scala.util.Left(err) =>
            TypeCheckResult.TypeCheckFailure(s"invalid label selector: $err")
          case scala.util.Right(_) => TypeCheckResult.TypeCheckSuccess
        }
      }
    } else
      // A per-row selector would be evaluated once via right.eval(null)
      // and either throw on an unbound reference mid-job or silently
      // bind one arbitrary selector — reject at analysis.
      TypeCheckResult.TypeCheckFailure(
        "matches_selector requires a literal selector string")
  }

  @transient private lazy val selector: LabelSelector =
    LabelSelector.mustParse(right.eval(null).toString)

  override protected def nullSafeEval(m: Any, _sel: Any): Any = {
    val map = m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    val keys = map.keyArray()
    val vals = map.valueArray()
    // NULL-valued map entries count as ABSENT labels (and must not
    // NPE); the compiled rewrite's IsNotNull conjunct agrees.
    val labels = (0 until map.numElements()).iterator.flatMap { i =>
      if (vals.isNullAt(i)) None
      else Some(graft.labels.Label(
        keys.getUTF8String(i).toString, vals.getUTF8String(i).toString))
    }.toVector
    selector.matches(LabelSet(labels))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MatchesSelector =
    copy(l, r)
}

/** Unfold Filter(matches_selector(m, sel)) into native map predicates. */
object RewriteMatchesSelector extends Rule[LogicalPlan] {

  private def compile(m: Expression, sel: LabelSelector): Expression = {
    def valueOf(name: String): Expression =
      ElementAt(m, Literal(org.apache.spark.unsafe.types.UTF8String.fromString(name)))
    def one(l: graft.labels.Label, negate: Boolean): Expression = {
      val v = valueOf(l.name)
      if (l.value.isEmpty) { // existence test
        if (negate) IsNull(v) else IsNotNull(v)
      } else {
        val cmp: Expression =
          if (l.prefix) StartsWith(v, Literal(l.value)) else EqualTo(v, Literal(l.value))
        // Positive matches conjoin IsNotNull so a missing/null-valued
        // key yields FALSE (not NULL) — the expression's semantics in
        // every context, not just under a null-dropping Filter — while
        // both conjuncts stay source-pushable.
        if (negate) Or(IsNull(v), Not(cmp)) else And(IsNotNull(v), cmp)
      }
    }
    def groups(s: LabelSet) = s.labels.groupBy(x => (x.name, x.prefix)).values
    val inc = groups(sel.include).map(g =>
      g.map(one(_, negate = false)).reduceLeft[Expression](Or))
    val exc = groups(sel.exclude).map { g =>
      if (g.size == 1 && g.head.value.isEmpty) IsNull(valueOf(g.head.name))
      else g.map(one(_, negate = true)).reduceLeft[Expression](And)
    }
    (inc ++ exc).reduceOption[Expression](And).getOrElse(Literal(true))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // s != null: ConstantFolding can deliver Literal(null, StringType)
    // (e.g. a folded CAST(NULL AS STRING)) in the same optimizer batch;
    // the un-rewritten expression then correctly evaluates to NULL,
    // whereas s.toString here would NPE the whole planning pass.
    case ms @ MatchesSelector(m, Literal(s, StringType)) if s != null =>
      LabelSelector.parse(s.toString) match {
        case scala.util.Right(sel) =>
          val compiled = compile(m, sel)
          // A NULL map evaluates to NULL in the original expression;
          // the compiled predicates would give false. Non-nullable
          // maps (the common case) keep the bare pushable form.
          if (m.nullable)
            If(IsNull(m), Literal(null, BooleanType), compiled)
          else compiled
        case scala.util.Left(_) => ms
      }
  }
}

class SelectorExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("matches_selector"),
      new ExpressionInfo("graft", "matches_selector"),
      (args: Seq[Expression]) => MatchesSelector(args(0), args(1))))
    // The native scalar family (UUID/FNV/CRC64/vector/curve) under its
    // SQL names — one list shared with SqlFunctions.registerAll.
    graft.functions.SqlFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(_ => RewriteMatchesSelector)
  }
}

object SelectorExtension {
  /** Column API + per-session registration for sessions built without
    * the extension conf.
    */
  def matches_selector(labels: Column, selector: String): Column =
    ColumnBridge.column(MatchesSelector(
      ColumnBridge.expression(labels), Literal(selector)))

  /** Per-session SQL-name registration for sessions built without the
    * extension (the expression evaluates correctly without the rewrite;
    * only the optimizer unfolding needs build-time injection).
    */
  def register(spark: SparkSession): Unit =
    ColumnBridge.register(spark, "matches_selector",
      args => MatchesSelector(args(0), args(1)))
}
