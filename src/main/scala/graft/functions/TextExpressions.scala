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

  /** One pass over a token array: occurrence count per constant term,
    * plus the array length (nulls included, = `size()`) in the LAST
    * slot. Null elements match nothing — the `filter(x -> x = term)`
    * semantics.
    */
  def termTfs(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      terms: Array[UTF8String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = terms.length
    val out = new Array[Long](k + 1)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          if (terms(j).equals(t)) out(j) += 1
          j += 1
        }
      }
      i += 1
    }
    out(k) = n.toLong
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

/** A tokenizer vocabulary for greedy longest-match segmentation: the
  * symbol set plus the max symbol length (the prefix-probe bound).
  * Shipped to executors as a codegen reference object (the PqEncode
  * broadcast-constant pattern); the hash set rebuilds lazily per
  * executor after deserialization (benign race — idempotent build).
  */
final class GreedyVocab(val symbols: Array[String]) extends Serializable {
  val maxLen: Int = if (symbols.isEmpty) 0 else symbols.iterator.map(_.length).max
  @transient @volatile private var _set: java.util.HashSet[String] = _
  def set: java.util.HashSet[String] = {
    var s = _set
    if (s == null) {
      s = new java.util.HashSet[String](symbols.length * 2)
      symbols.foreach(s.add)
      _set = s
    }
    s
  }
  override def equals(other: Any): Boolean = other match {
    case v: GreedyVocab => java.util.Arrays.equals(
      symbols.asInstanceOf[Array[AnyRef]], v.symbols.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(symbols.asInstanceOf[Array[AnyRef]])
}

object GreedyVocab {
  /** Greedy longest-match-first segmentation (the WordPiece/MaxMatch
    * rule): at each position take the LONGEST vocab symbol matching the
    * remaining prefix; if no symbol matches, the WHOLE word degrades to
    * the single piece `<unk>` (BERT's whole-word-UNK behavior). At a
    * given length at most one symbol can equal the prefix, so the rule
    * is tie-free. Positions count UTF-16 units, which equals the
    * oracle's character counting for the ASCII corpus the vocabulary is
    * trained on (documented assumption; symbols and words are `[a-z0-9]+`).
    */
  def pieces(w: UTF8String, v: GreedyVocab): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = w.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    var stuck = false
    while (pos < n && !stuck) {
      var len = if (v.maxLen < n - pos) v.maxLen else n - pos
      var matched: String = null
      while (len >= 1 && matched == null) {
        val cand = s.substring(pos, pos + len)
        if (v.set.contains(cand)) matched = cand
        len -= 1
      }
      if (matched == null) stuck = true
      else { out += UTF8String.fromString(matched); pos += matched.length }
    }
    if (stuck)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](UTF8String.fromString("<unk>")))
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `greedy_pieces(word) -> array<string>`: greedy longest-match
  * tokenization against a CONSTANT vocabulary (see [[GreedyVocab]]) —
  * one static call inside whole-stage codegen, a per-position hash-set
  * probe bounded by the max symbol length. The iterative declarative
  * spelling would be a per-character chain of joins; segmentation is
  * inherently sequential per word, exactly the per-row-kernel case the
  * §2.8 preference order reserves native expressions for.
  */
case class GreedyPieces(child: Expression, vocab: GreedyVocab)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_pieces"

  override def nullSafeEval(input: Any): Any =
    GreedyVocab.pieces(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("greedyVocab", vocab,
      classOf[GreedyVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GreedyVocab.pieces($c, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): GreedyPieces =
    copy(child = newChild)
}

/** `greedy_piece_stats(word) -> struct(n_pieces, is_unk, pieces)`: the
  * per-word serving form of [[GreedyPieces]] — segmentation runs ONCE in
  * the kernel and all three consumer facts come out together (separate
  * Column-level derivations would re-evaluate the CodegenFallback HOF
  * tree once per fact; references inside a lambda duplicate the kernel
  * expression and interpreted eval has no CSE).
  */
case class GreedyPieceStats(child: Expression, vocab: GreedyVocab)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = GreedyPieceStats.schema
  override def prettyName: String = "greedy_piece_stats"

  override def nullSafeEval(input: Any): Any =
    GreedyPieceStats.stats(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("greedyVocab", vocab,
      classOf[GreedyVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GreedyPieceStats.stats($c, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): GreedyPieceStats =
    copy(child = newChild)
}

object GreedyPieceStats {
  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_pieces",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("is_unk",
        org.apache.spark.sql.types.BooleanType, nullable = false),
      org.apache.spark.sql.types.StructField("pieces", StringType,
        nullable = false)))

  def stats(w: UTF8String, v: GreedyVocab): org.apache.spark.sql.catalyst.InternalRow = {
    val arr = GreedyVocab.pieces(w, v)
    val n = arr.numElements()
    val isUnk = n == 1 && arr.getUTF8String(0).toString == "<unk>"
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(arr.getUTF8String(i).toString)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(Long.box(n.toLong),
      Boolean.box(isUnk), UTF8String.fromString(sb.toString))
  }
}

/** `term_tfs(array<string>) -> array<long>`: one pass over a document's
  * token array counting occurrences of each of a CONSTANT term list,
  * emitting `[tf(terms(0)), …, tf(terms(k-1)), dlen]` (document length —
  * null elements included, matching `size()` — rides as the LAST slot so
  * one kernel carries every fact a BM25-style scorer needs). Semantics
  * twin of `size(filter(toks, x -> x = term))` per term (null elements
  * never match) — spec-proved. Being a codegen expression, multiple
  * references in one projection CSE to a SINGLE evaluation under
  * whole-stage codegen — the property the interpreted filter-HOF
  * spelling lacks (no CSE, one re-tokenize per reference: the
  * greedy_piece_stats lesson, applied to percolation).
  */
case class TermTfs(child: Expression, terms: Array[String])
    extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_tfs"

  private lazy val termsU8: Array[UTF8String] =
    terms.map(UTF8String.fromString)

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.termTfs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], termsU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("termTfsTerms", termsU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExprUtil.termTfs($c, $tRef);")
  }

  // content-based equality so identical kernels canonicalize (CSE) —
  // the PqEncode lesson
  override def equals(other: Any): Boolean = other match {
    case o: TermTfs => child == o.child &&
      java.util.Arrays.equals(terms.asInstanceOf[Array[AnyRef]],
        o.terms.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Int.box(java.util.Arrays.hashCode(terms.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(newChild: Expression): TermTfs =
    copy(child = newChild)
}

object TextExpressions {
  def term_tfs(c: Column, terms: Seq[String]): Column =
    Bridge.column(TermTfs(Bridge.expression(c), terms.toArray))
  def punct_count(c: Column): Column = Bridge.column(PunctCount(Bridge.expression(c)))
  def normalize_text(c: Column): Column = Bridge.column(NormalizeText(Bridge.expression(c)))
  def greedy_pieces(c: Column, vocab: GreedyVocab): Column =
    Bridge.column(GreedyPieces(Bridge.expression(c), vocab))
  def greedy_piece_stats(c: Column, vocab: GreedyVocab): Column =
    Bridge.column(GreedyPieceStats(Bridge.expression(c), vocab))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("punct_count"),
      new ExpressionInfo(classOf[PunctCount].getName, "punct_count"),
      (exprs: Seq[Expression]) => PunctCount(exprs.head)),
    (FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (exprs: Seq[Expression]) => NormalizeText(exprs.head)))
}
