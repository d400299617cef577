package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, ArrayContains, ArrayExists, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LambdaFunction, LessThan, LessThanOrEqual, Literal, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Token-range predicate pushdown for the graft connector.
  *
  * The engine's flagship chunk skip — decode only segments whose tokens
  * chunk [minV, maxV] intersects the queried range
  * ([[graft.engine.GraftEncoder.decodeWhereTokenRange]]) — is not reachable
  * through Spark's standard DSv2 filter negotiation: an
  * `array_contains(tokens, v)` or `exists(tokens, x -> lo <= x AND x <= hi)`
  * predicate never becomes a `sources.Filter`, and Spark 4.1's
  * `V2ExpressionBuilder` has no ARRAY_CONTAINS translation either, so
  * `SupportsPushDownV2Filters` cannot carry it. This rule is the justified
  * custom-Catalyst step (brief tier (c)): it runs AFTER
  * `V2ScanRelationPushDown` (via `spark.experimental.extraOptimizations`'
  * "User Provided Optimizers" batch, or `injectPreCBORule` from
  * [[graft.engine.GraftExtensions]]), recognizes token predicates in a
  * Filter directly above a graft scan, and re-plans the scan with the
  * range attached — mirroring how the reference converts arbitrary
  * PhysicalExprs into its stripe-pruning predicate
  * (/root/reference/src/predicate.rs:53-166).
  *
  * Soundness: the Filter node is LEFT IN PLACE (the scan only skips
  * segments the chunk stats prove can't match — the `PushedDown::Inexact`
  * contract, source.rs:279-281). Extraction is conservative: from a
  * conjunction it uses only the conjuncts it understands, and for
  * `exists` bodies only the bounds on the lambda variable — any extra
  * conditions can only shrink the true result set, so the extracted range
  * remains a correct superset test.
  */
object GraftTokenRangePushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: DataSourceV2ScanRelation)
        if r.scan.isInstanceOf[GraftScan] &&
          r.scan.asInstanceOf[GraftScan].tokenRange.isEmpty =>
      val cs = conjuncts(cond)
      val ranges = cs.flatMap(rangeOf)
      if (ranges.isEmpty) f
      else {
        // several token conjuncts intersect (all must hold on the doc).
        // Point values are collected SEPARATELY: only a conjunct that
        // itself demands one exact token (array_contains / exists ==)
        // licenses a bloom membership test — a degenerate range produced
        // by INTERSECTING distinct inequalities (x >= 7 AND x <= 7 via two
        // exists) does NOT imply any row contains 7, and bloom-pruning on
        // it would drop true matches.
        val lo = ranges.map(_._1).max
        val hi = ranges.map(_._2).min
        val points = cs.flatMap(pointsOf).distinct
        f.copy(child = r.copy(
          scan = r.scan.asInstanceOf[GraftScan].withTokenRange(lo, hi, points)))
      }
  }

  /** Token values some conjunct REQUIRES to be present in the array —
    * the sound inputs for a bloom membership prune. */
  private def pointsOf(e: Expression): Seq[Long] = e match {
    case ArrayContains(col, l: Literal) if isTokens(col) => longOf(l).toSeq
    case ArrayExists(col, LambdaFunction(body, Seq(v: NamedLambdaVariable), _), _)
        if isTokens(col) =>
      conjuncts(body).flatMap {
        case EqualTo(x, l: Literal) if sameVar(x, v) => longOf(l)
        case EqualTo(l: Literal, x) if sameVar(x, v) => longOf(l)
        case _ => None
      }
    case _ => Nil
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def isTokens(e: Expression): Boolean = e match {
    case a: Attribute => a.name == "tokens"
    case _ => false
  }

  private def longOf(l: Literal): Option[Long] = l.value match {
    case i: Int => Some(i.toLong)
    case i: Long => Some(i)
    case i: Short => Some(i.toLong)
    case _ => None
  }

  /** A token range implied by one conjunct, if any. */
  private def rangeOf(e: Expression): Option[(Long, Long)] = e match {
    case ArrayContains(col, l: Literal) if isTokens(col) =>
      longOf(l).map(v => (v, v))
    case ArrayExists(col, LambdaFunction(body, Seq(v: NamedLambdaVariable), _), _)
        if isTokens(col) =>
      val bounds = conjuncts(body).flatMap(boundOf(_, v))
      if (bounds.isEmpty) None
      else Some((bounds.map(_._1).max, bounds.map(_._2).min))
    case _ => None
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** Bounds on the lambda variable from one conjunct of an exists body
    * (both operand orders). Unrecognized conjuncts contribute nothing —
    * they can only narrow the matching elements, so ignoring them keeps
    * the extracted range an upper bound. */
  private def boundOf(e: Expression, v: NamedLambdaVariable): Option[(Long, Long)] = e match {
    case GreaterThanOrEqual(x, l: Literal) if sameVar(x, v) => longOf(l).map(n => (n, Long.MaxValue))
    case GreaterThan(x, l: Literal) if sameVar(x, v) => longOf(l).map(n => (n + 1, Long.MaxValue))
    case LessThanOrEqual(x, l: Literal) if sameVar(x, v) => longOf(l).map(n => (Long.MinValue, n))
    case LessThan(x, l: Literal) if sameVar(x, v) => longOf(l).map(n => (Long.MinValue, n - 1))
    case EqualTo(x, l: Literal) if sameVar(x, v) => longOf(l).map(n => (n, n))
    case GreaterThanOrEqual(l: Literal, x) if sameVar(x, v) => longOf(l).map(n => (Long.MinValue, n))
    case GreaterThan(l: Literal, x) if sameVar(x, v) => longOf(l).map(n => (Long.MinValue, n - 1))
    case LessThanOrEqual(l: Literal, x) if sameVar(x, v) => longOf(l).map(n => (n, Long.MaxValue))
    case LessThan(l: Literal, x) if sameVar(x, v) => longOf(l).map(n => (n + 1, Long.MaxValue))
    case EqualTo(l: Literal, x) if sameVar(x, v) => longOf(l).map(n => (n, n))
    case _ => None
  }

  /** Install on a live session (idempotent) — query entries and tests use
    * this; platform-created sessions get the same rule via
    * `spark.sql.extensions=graft.engine.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(GraftTokenRangePushdown))
      spark.experimental.extraOptimizations = cur :+ GraftTokenRangePushdown
  }
}
