package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native longest-common-prefix over two token arrays (r13).
  *
  * The declarative spelling (`SuffixOps.lcp`) counted the j with equal
  * j-prefixes via `aggregate(sequence(1, min(|a|,|b|)), …)` — higher-
  * order functions run INTERPRETED (CodegenFallback, no CSE), and every
  * j allocated two slice arrays and compared them element by element:
  * O(W²) interpreted compares + O(W²) allocations per adjacent suffix
  * pair, which JobAudit r13 measured as the dominant task time of the
  * suffix family (corpus_top_repeated_spans 51 task-sec,
  * text_longest_repeat 37 at sf0.1). The LCP is a single left-to-right
  * element walk; prefix-j equality is monotone in j, so the walk's stop
  * index equals the declarative count for every input.
  */
object SuffixExprUtil {
  def lcpTokens(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n && a.getUTF8String(i) == b.getUTF8String(i)) i += 1
    i
  }
}

/** `token_lcp(array<string>, array<string>) -> int` */
case class TokenLcp(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_lcp"

  override def nullSafeEval(a: Any, b: Any): Any =
    SuffixExprUtil.lcpTokens(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SuffixExprUtil.lcpTokens($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TokenLcp = copy(left = newLeft, right = newRight)
}

object SuffixExpressions {
  def token_lcp(a: Column, b: Column): Column =
    Bridge.column(TokenLcp(Bridge.expression(a), Bridge.expression(b)))
}
