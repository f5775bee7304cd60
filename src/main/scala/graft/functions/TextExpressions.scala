package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native char-class scalars for the per-document text family.
  *
  * Why these exist: `punct_count` and `normalize_text` were spelled with
  * `regexp_extract_all` / `regexp_replace`, and the r6 whole-catalog 8×
  * sweep caught those spellings scaling 10-17× (bound 8) — java.util.regex
  * evaluation inside concurrent Spark tasks degrades ~3× the moment more
  * than one task runs it (measured: the same 8× punct scan takes 0.95 s on
  * 1 core but 2.2-2.8 s WALL on 2/4/8 cores — negative scaling), so every
  * regex-shaped per-doc scalar pays a concurrency tax that grows with the
  * executor's task slots. Both operations are plain character-class scans
  * that need no regex engine at all; these expressions do one pass over
  * the UTF-8 bytes, stay inside whole-stage codegen, and share state with
  * nothing.
  */
object TextExprUtil {

  @inline private def isAsciiSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  @inline private def isAsciiAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  /** Count of code points matching `[^a-zA-Z0-9\s]` — the exact twin of
    * `size(regexp_extract_all(text, "[^a-zA-Z0-9\s]", 0))`: java's `\s`
    * is ASCII-only, so EVERY non-ASCII code point matches the class, and
    * counting per code point equals counting per UTF-8 lead byte
    * (continuation bytes 0x80-0xBF are skipped).
    */
  def punctCount(s: UTF8String): Int = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    var c = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b & 0xc0) != 0x80 && !isAsciiAlnum(b) && !isAsciiSpace(b)) c += 1
      i += 1
    }
    c
  }

  /** One-pass twin of
    * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\s]", ""), "\s+", " "))`:
    * lowercase ASCII letters, keep `[a-z0-9]`, collapse whitespace runs to
    * one space, drop everything else, trim. Non-ASCII code points are
    * dropped exactly as the regex spelling drops them after `lower()`
    * (their Unicode lowercase stays non-ASCII), with the two code points
    * whose lowercase maps INTO ASCII special-cased for exactness:
    * U+212A KELVIN SIGN → 'k' and U+0130 LATIN CAPITAL I WITH DOT → 'i'
    * (String.toLowerCase expands U+0130 to 'i' + U+0307, and the
    * combining dot is then removed by the char class).
    */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    var pendingSpace = false
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      var keep: Int = -1
      if (b >= 'a' && b <= 'z' || b >= '0' && b <= '9') keep = b
      else if (b >= 'A' && b <= 'Z') keep = b + 32
      else if (isAsciiSpace(b)) { pendingSpace = o > 0; keep = -1 }
      else if ((b & 0xff) == 0xe2 && i + 2 < n &&
          (org.apache.spark.unsafe.Platform.getByte(base, off + i + 1) & 0xff) == 0x84 &&
          (org.apache.spark.unsafe.Platform.getByte(base, off + i + 2) & 0xff) == 0xaa) {
        keep = 'k'; i += 2 // U+212A KELVIN SIGN (e2 84 aa)
      } else if ((b & 0xff) == 0xc4 && i + 1 < n &&
          (org.apache.spark.unsafe.Platform.getByte(base, off + i + 1) & 0xff) == 0xb0) {
        keep = 'i'; i += 1 // U+0130 LATIN CAPITAL I WITH DOT (c4 b0)
      }
      if (keep >= 0) {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = keep.toByte; o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

/** `punct_count(string) -> int`: native `[^a-zA-Z0-9\s]` code-point count
  * (see [[TextExprUtil.punctCount]]). Codegen-friendly, regex-free.
  */
case class PunctCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "punct_count"

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.punctCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExprUtil.punctCount($c);")

  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

/** `normalize_text(string) -> string`: native canonicalizer
  * (see [[TextExprUtil.normalize]]). Codegen-friendly, regex-free.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExprUtil.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object TextExpressions {
  def punct_count(c: Column): Column = Bridge.column(PunctCount(Bridge.expression(c)))
  def normalize_text(c: Column): Column = Bridge.column(NormalizeText(Bridge.expression(c)))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("punct_count"),
      new ExpressionInfo(classOf[PunctCount].getName, "punct_count"),
      (exprs: Seq[Expression]) => PunctCount(exprs.head)),
    (FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (exprs: Seq[Expression]) => NormalizeText(exprs.head)))
}
