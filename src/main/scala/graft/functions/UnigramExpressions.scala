package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A unigram-LM tokenizer vocabulary: scored pieces for Viterbi
  * segmentation. Weights are INTEGER corpus counts, not log
  * probabilities — the segmentation objective is the lexicographic
  * (fewest pieces, then highest total piece weight), which the integer
  * cost `n_pieces * PieceCost - Σ weight` encodes exactly. This keeps
  * every comparison exact and portable across engines (a float log-prob
  * Viterbi can flip ties on the last ulp), the same trade the
  * integer-exact PageRank makes. Shipped to executors as a codegen
  * reference object (the GreedyVocab pattern); the hash map rebuilds
  * lazily per executor after deserialization (benign race — idempotent).
  */
final class UnigramVocab(val pieces: Array[String], val weights: Array[Long])
    extends Serializable {
  require(pieces.length == weights.length,
    s"pieces/weights length mismatch: ${pieces.length} vs ${weights.length}")
  val maxLen: Int = if (pieces.isEmpty) 0 else pieces.iterator.map(_.length).max
  @transient @volatile private var _map: java.util.HashMap[String, java.lang.Long] = _
  def map: java.util.HashMap[String, java.lang.Long] = {
    var m = _map
    if (m == null) {
      m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), weights(i)); i += 1 }
      _map = m
    }
    m
  }
  override def equals(other: Any): Boolean = other match {
    case v: UnigramVocab =>
      java.util.Arrays.equals(pieces.asInstanceOf[Array[AnyRef]],
        v.pieces.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(weights, v.weights)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(pieces.asInstanceOf[Array[AnyRef]]) * 31 +
      java.util.Arrays.hashCode(weights)
}

object UnigramVocab {
  /** Per-piece cost unit. Any segmentation with fewer pieces beats any
    * with more as long as total piece weight stays below 2^42 — weights
    * are corpus substring counts, bounded by total corpus characters
    * (~1e8 at sf0.1, with 5 orders of magnitude of headroom).
    */
  val PieceCost: Long = 1L << 42

  /** Words longer than this segment to `<unk>` (and the oracle's
    * generated DP chain has exactly this many stages).
    */
  val MaxWordLen = 16

  private val Unk = UTF8String.fromString("<unk>")
  private final val Inf = Long.MaxValue

  /** Viterbi segmentation under the integer objective: minimize
    * `n_pieces * PieceCost - Σ weight(piece)`. Cost ties across
    * different last-piece lengths break toward the LONGER piece (for a
    * fixed span end and length the piece is the substring itself, so no
    * further tie is possible) — mirrored in the oracle's
    * `ORDER BY cost, len(piece) DESC`. Unreachable end (a character no
    * piece covers) or over-length words degrade to the single piece
    * `<unk>`, the whole-word-UNK convention the greedy kernel uses.
    */
  def segment(w: UTF8String, v: UnigramVocab): ArrayData = {
    val s = w.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n > MaxWordLen) return new GenericArrayData(Array[Any](Unk))
    val cost = new Array[Long](n + 1)
    val bpLen = new Array[Int](n + 1)
    java.util.Arrays.fill(cost, Inf)
    cost(0) = 0L
    val m = v.map
    var p = 1
    while (p <= n) {
      val lMax = if (v.maxLen < p) v.maxLen else p
      var l = 1
      while (l <= lMax) {
        val prev = cost(p - l)
        if (prev != Inf) {
          val wt = m.get(s.substring(p - l, p))
          if (wt != null) {
            val c = prev + PieceCost - wt.longValue()
            // strictly-less keeps the FIRST best seen per cost; scanning
            // l ascending + ties toward longer pieces means >=-replace:
            if (c <= cost(p)) { cost(p) = c; bpLen(p) = l }
          }
        }
        l += 1
      }
      p += 1
    }
    if (cost(n) == Inf) return new GenericArrayData(Array[Any](Unk))
    var cnt = 0
    var q = n
    while (q > 0) { cnt += 1; q -= bpLen(q) }
    val out = new Array[Any](cnt)
    q = n
    var i = cnt - 1
    while (q > 0) {
      out(i) = UTF8String.fromString(s.substring(q - bpLen(q), q))
      i -= 1
      q -= bpLen(q)
    }
    new GenericArrayData(out)
  }
}

/** `unigram_pieces(word) -> array<string>`: Viterbi segmentation against
  * a CONSTANT scored vocabulary — one static call inside whole-stage
  * codegen, O(len · maxPieceLen) hash probes per word. Segmentation is
  * inherently sequential per word: exactly the per-row-kernel case the
  * §2.8 preference order reserves native expressions for.
  */
case class UnigramPieces(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_pieces"

  override def nullSafeEval(input: Any): Any =
    UnigramVocab.segment(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab,
      classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramVocab.segment($c, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramPieces =
    copy(child = newChild)
}

object UnigramExpressions {
  def unigram_pieces(word: Column, v: UnigramVocab): Column =
    Bridge.column(UnigramPieces(Bridge.expression(word), v))
}
