package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression for the vector-math hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback — every element evaluation is an interpreted lambda call
  * with boxing. For a 64-dim dot product evaluated per candidate pair in
  * similarity search, that interpretation overhead dominates. This
  * expression generates a tight primitive loop via `doGenCode` instead
  * (with an equivalent interpreted `nullSafeEval` for fallback paths).
  * Summation order is left-to-right, identical to the `aggregate` fold it
  * replaces, so results are bit-for-bit unchanged (oracle-stable).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED, de-duplicated `array<long>` columns —
  * the set-similarity hot path (Jaccard over hashed token/shingle sets).
  *
  * `array_intersect`/`array_union` build a hash set per evaluation and
  * box every element; evaluated once per candidate pair after an LSH or
  * blocking join, that allocation dominates the query. A two-pointer merge
  * over pre-sorted primitive arrays is O(n+m) with zero allocation, and
  * `doGenCode` keeps it inside whole-stage codegen. Callers get Jaccard by
  * inclusion-exclusion: `ov / (|a| + |b| - ov)` — no union materialized.
  *
  * Inputs must be sorted ascending with distinct, non-null elements
  * (`sort_array(array_distinct(...))` staging); behavior on unsorted input
  * is unspecified.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_overlap"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u < v) i += 1
      else if (u > v) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  long $u = $a.getLong($i); long $v = $b.getLong($j);
         |  if ($u < $v) $i++;
         |  else if ($u > $v) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column API: dot product of two array<double> columns. */
  def vector_dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: intersection size of two sorted-distinct array<long>. */
  def sorted_overlap(a: Column, b: Column): Column =
    Bridge.column(SortedOverlapCount(Bridge.expression(a), Bridge.expression(b)))

  /** SQL registration: `SELECT vector_dot(a, b)`, `sorted_overlap(a, b)`. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))),
    (FunctionIdentifier("sorted_overlap"),
      new ExpressionInfo(classOf[SortedOverlapCount].getName, "sorted_overlap"),
      (exprs: Seq[Expression]) => SortedOverlapCount(exprs(0), exprs(1))))
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)`
  * (or `spark.sql.extensions=graft.functions.GraftExtensions`) exposes the
  * engine's native functions to SQL users and installs the optimizer
  * rewrites that route declarative spellings onto them
  * ([[graft.plans.NativeHashRewrite]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    (VectorExpressions.functions ++ HashExpressions.functions ++
      TextExpressions.functions).foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.NativeHashRewrite)
    e.injectOptimizerRule(_ => graft.plans.RankLimitRewrite)
    e.injectPlannerStrategy(_ => new graft.plans.GraftStrategies)
  }
}
