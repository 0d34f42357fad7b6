package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer extension: rewrite pure range-predicate inner joins
  * (`point >= start AND point < end`, no equi conjuncts) into the bucketed
  * equi-join shape of [[graft.ops.RangeJoin]] — automatically.
  *
  * Spark plans such joins as BroadcastNestedLoopJoin (O(|points|·|intervals|)
  * compares, one side broadcast whole) or a cartesian product. The rewrite
  * makes the DECLARATIVE form — the join a user would naturally write — run
  * on the hash-join plan the explicit API produces, which is the point of
  * an optimizer rule: semantics stay where the user wrote them, the
  * physical strategy is the engine's job.
  *
  * Opt-in and conservative: fires only when `spark.graft.rangeJoin.bucket`
  * is set (the bucket width in the point column's units), only on INNER
  * joins whose condition is EXACTLY one non-strict lower bound plus one
  * strict upper bound on the same integral point column, with both bounds
  * from the other side. Anything else — extra conjuncts, equi keys,
  * non-integral columns — is left untouched. The rewritten plan is the
  * API's construction node for node (bucket = floor-div via exact integral
  * arithmetic, interval explode bounded by `spark.graft.rangeJoin
  * .maxBuckets` with a raise_error guard, residual filter re-applies the
  * original predicate), so a point pairs with an interval through exactly
  * its own bucket and no duplicate can survive.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BUCKET_CONF = "spark.graft.rangeJoin.bucket"
  val MAXB_CONF = "spark.graft.rangeJoin.maxBuckets"

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Floor bucket id in exact integral arithmetic: (c − pmod(c, w)) div w —
    * the subtraction lands on an exact multiple, so the integral divide is
    * exact at any epoch magnitude (float floor(x/w) could flip a boundary).
    */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val c = asLong(e)
    IntegralDivide(Subtract(c, Pmod(c, Literal(w))), Literal(w))
  }

  private def intAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference if a.dataType == LongType || a.dataType == IntegerType =>
      Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthStr = conf.getConfString(BUCKET_CONF, "")
    if (widthStr.isEmpty) return plan
    val width = widthStr.toLong
    require(width > 0, s"$BUCKET_CONF must be positive, got $width")
    val maxB = conf.getConfString(MAXB_CONF, "8").toInt
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), _) =>
        rewrite(j, l, r, cond, width, maxB).getOrElse(j)
    }
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan, cond: Expression,
      w: Long, maxB: Int): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    // normalize to (point, bound) with bound kind; `x >= y` ≡ `y <= x`
    def ge(e: Expression): Option[(AttributeReference, AttributeReference)] = e match {
      case GreaterThanOrEqual(a, b) => for (x <- intAttr(a); y <- intAttr(b)) yield (x, y)
      case LessThanOrEqual(a, b) => for (x <- intAttr(b); y <- intAttr(a)) yield (x, y)
      case _ => None
    }
    def lt(e: Expression): Option[(AttributeReference, AttributeReference)] = e match {
      case LessThan(a, b) => for (x <- intAttr(a); y <- intAttr(b)) yield (x, y)
      case GreaterThan(a, b) => for (x <- intAttr(b); y <- intAttr(a)) yield (x, y)
      case _ => None
    }
    // (point, start, point, end, endInclusive): strict upper bound `p < e`
    // or the BETWEEN form `p <= e` — the residual filter re-applies the
    // original predicate either way, so only the bucket of the LAST
    // overlapped interval cell differs (e vs e-1)
    val pair = (ge(conjuncts.head), lt(conjuncts(1)), ge(conjuncts(1)), lt(conjuncts.head)) match {
      case (Some(g), Some(s), _, _) => Some((g, s, false))
      case (_, _, Some(g), Some(s)) => Some((g, s, false))
      case _ =>
        (ge(conjuncts.head), ge(conjuncts(1))) match {
          // BETWEEN: one `p >= s`, one `e >= p` — p is the shared attr
          case (Some((pa, sa)), Some((eb, pb))) if pa.exprId == pb.exprId =>
            Some(((pa, sa), (pa, eb), true))
          case (Some((ea, pa)), Some((pb, sb))) if pa.exprId == pb.exprId =>
            Some(((pa, sb), (pa, ea), true))
          case _ => None
        }
    }
    pair.flatMap { case ((p1, start), (p2, end), endInclusive) =>
      if (p1.exprId != p2.exprId) None
      else {
        val p = p1
        // point on one side, BOTH bounds on the other
        val sides =
          if (l.outputSet.contains(p) && r.outputSet.contains(start) &&
            r.outputSet.contains(end)) Some((l, r))
          else if (r.outputSet.contains(p) && l.outputSet.contains(start) &&
            l.outputSet.contains(end)) Some((r, l))
          else None
        sides.map { case (points, intervals) =>
          val pB = Alias(bucketOf(p, w), "__graft_bucket_p")()
          val pointsProj = Project(points.output :+ pB, points)
          val firstB = bucketOf(start, w)
          val lastB =
            if (endInclusive) bucketOf(end, w)
            else bucketOf(Subtract(asLong(end), Literal(1L)), w)
          val nb = Add(Subtract(lastB, firstB), Literal(1L))
          val guardedLast = If(LessThanOrEqual(nb, Literal(maxB.toLong)), lastB,
            Cast(RaiseError(Literal(
              s"graft rangeJoin rewrite: interval spans more than $maxB buckets at width $w")),
              LongType))
          // Sequence is TimeZoneAware — an unset zone leaves it unresolved
          // and the optimizer's plan validation rejects the rewrite
          val gen = Explode(new Sequence(firstB, guardedLast, None,
            Some(conf.sessionLocalTimeZone)))
          val elem = gen.elementSchema.head
          val bAttr = AttributeReference("__graft_bucket_i", elem.dataType, elem.nullable)()
          val ivGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(bAttr), child = intervals)
          val bucketJoin = Join(pointsProj, ivGen, Inner,
            Some(EqualTo(pB.toAttribute, bAttr)), JoinHint.NONE)
          // residual: the ORIGINAL predicate, untouched — bucket equality
          // only pre-filters candidates
          Project(j.output, Filter(cond, bucketJoin))
        }
      }
    }
  }
}

/** Catalyst optimizer extension: rewrite the DECLARATIVE per-key top-k
  * pattern — `row_number().over(partitionBy(keys).orderBy(...)) <= k` with
  * the rank column dropped afterwards — into [[TopKPerKeyPlan]], so the
  * bounded-heap physical operator replaces the full per-key sort without
  * the caller knowing the custom API exists (the same philosophy as
  * [[RangeJoinRewrite]]: semantics in the query, strategy in the engine).
  *
  * Opt-in (`spark.graft.topk.rewrite=true`) and conservative: the Window
  * must compute EXACTLY one expression, a `row_number()` over the standard
  * running frame; the Filter must be exactly `rn <= k` / `rn < k+1` on
  * that attribute; and the Project above must NOT reference the rank —
  * if the rank value itself is consumed, the window stays. Ties: like the
  * window it replaces, the result is deterministic only under a
  * total per-key ordering — the rewrite preserves exactly that contract.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  val CONF = "spark.graft.topk.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(CONF, "false").toBoolean) return plan
    plan.transformUp {
      case p @ Project(projList, Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            _, _, child, _))) =>
        val rn = alias.toAttribute
        val k = cond match {
          case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
            if a.exprId == rn.exprId => Some(v)
          case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
            if a.exprId == rn.exprId => Some(v - 1)
          case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
            if a.exprId == rn.exprId => Some(v)
          case _ => None
        }
        val rankUnused = !projList.exists(_.references.contains(rn))
        k match {
          case Some(kk) if kk > 0 && rankUnused && part.nonEmpty =>
            Project(projList, TopKPerKeyPlan(part, order, kk, child))
          case _ => p
        }
    }
  }
}

/** Session extension entry point: register with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectOptimizerRule(_ => TopKWindowRewrite)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
