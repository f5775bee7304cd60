package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the `row_number() <= k` rank-limit idiom onto
  * the [[TopKPerKey]] operator.
  *
  * The declarative spelling —
  * {{{
  *   df.withColumn("rn", row_number().over(W.partitionBy(p).orderBy(o)))
  *     .where($"rn" <= k).drop("rn")
  * }}}
  * — plans as Exchange + full Sort of every partition + Window + Filter.
  * Spark 3.5's built-in WindowGroupLimit improves it (per-partition rank
  * pruning BEFORE the sort) but still sorts the surviving rows twice
  * (partial + final) and evaluates the window. When the query does not
  * keep the rank column, none of that is needed: [[TopKPerKey]] keeps a
  * bounded k-row heap per key directly over the exchange — O(n log k),
  * no sort, nothing spilled — and this rule applies it to EVERY spelling
  * (Column DSL or SQL QUALIFY-style subqueries), not just call sites that
  * know the `TopK.perKey` helper.
  *
  * Fires only when provably safe:
  *  - the Window computes EXACTLY one expression, a `row_number()` (no
  *    other window outputs would survive the rewrite);
  *  - the filter's rank conjunct is `rn <= k` / `rn < k+1` / `rn == 1`
  *    (with k >= 1) over that attribute;
  *  - the enclosing Project references ONLY the window child's columns
  *    (the rank column is dropped, so removing the Window is invisible);
  *  - remaining filter conjuncts don't reference the rank column — they
  *    re-apply on top of the top-k result (same row set: the rank is
  *    computed over the full partition either way).
  *
  * Row-set equality with the window form holds when the ordering is total
  * (engine queries always append a unique tiebreak; under a non-total
  * order row_number is itself nondeterministic among ties). Proved in
  * `TopKSpec`; the fired plan shape is audited in `PlanAuditSpec`.
  */
object RankLimitRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** k such that `e` ≡ (rn <= k), if `e` is a rank-limit predicate. */
  private def limitOf(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(ps, os, _)), _)), _, _, child, _)))
        if os.nonEmpty && ps.nonEmpty &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankPreds, rest) = conjuncts.partition(limitOf(_, rn).isDefined)
      val ks = rankPreds.flatMap(limitOf(_, rn))
      if (ks.nonEmpty && ks.forall(_ >= 1) &&
          rest.forall(r => !r.references.contains(rn))) {
        val topk = TopKPerKey(ps, os, ks.min, child)
        Project(projectList,
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
      } else p
  }
}
