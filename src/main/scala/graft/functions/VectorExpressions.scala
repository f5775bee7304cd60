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

/** Product-quantization encoder: array<double> vector → array<long> of
  * `m` codeword ids, one per subspace, against a CONSTANT codebook
  * (collected once at plan time — k×D doubles, KB-sized — and shipped as
  * a codegen reference object, the broadcast-constant pattern).
  *
  * The declarative spelling (nested `transform`/`array_min` over slices)
  * is CodegenFallback: ~1,300 interpreted expression evaluations and 256
  * sliced-array allocations per row made it the slowest expression in the
  * catalog (2.3 s/5k rows, the r7 profile). This expression is one static
  * call inside whole-stage codegen running a primitive loop: zero
  * allocation per candidate, ~1k flops per row.
  *
  * Bit-identity contract with the declarative reference (and the DuckDB
  * oracle): per-subspace distances accumulate each of a·a, a·b, b·b
  * left-to-right over the subspace index order, combine as
  * `aa - 2.0 * ab + bb`, round via the same scala BigDecimal HALF_UP(6)
  * Spark's `round` uses, and break distance ties toward the LOWEST code
  * id (codebook rows are sorted by id; strict `<` keeps the first).
  */
case class PqEncode(child: Expression, book: Array[Array[Double]],
    codeIds: Array[Long], m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(v: Any): Any =
    PqEncode.encode(v.asInstanceOf[ArrayData], book, codeIds, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, "double[][]")
    val idsRef = ctx.addReferenceObj("pqIds", codeIds, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqEncode.encode($v, $bookRef, $idsRef, $m);")
  }

  // Array fields compare by reference under the synthesized case-class
  // equals, so two semantically identical kernels would never be seen as
  // equal and common-subexpression elimination could not dedupe repeated
  // spellings (e.g. the encode built separately inside pqAdcTopK and
  // ivfPqTopK). Content-based equality restores canonicalization.
  override def equals(other: Any): Boolean = other match {
    case p: PqEncode =>
      child == p.child && m == p.m &&
        java.util.Arrays.equals(codeIds, p.codeIds) &&
        java.util.Arrays.deepEquals(
          book.asInstanceOf[Array[AnyRef]], p.book.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(m),
      Int.box(java.util.Arrays.hashCode(codeIds)),
      Int.box(java.util.Arrays.deepHashCode(book.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Shared by interpreted eval and codegen — one compiled code path.
    * The BigDecimal HALF_UP round per (subspace × codeword) candidate is
    * the cross-engine determinism contract (identical to Spark's `round`
    * and the DuckDB oracle's); it is ~half the kernel's cost. A
    * deployment that doesn't need oracle bit-parity can drop the round —
    * argmin ties at exactly-equal 6-dp distances are the only behavior
    * it pins — for a ~2× kernel speedup.
    */
  def encode(x: ArrayData, book: Array[Array[Double]], codeIds: Array[Long],
      m: Int): ArrayData = {
    val dims = book(0).length
    val sub = dims / m
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      var aa = 0.0
      var i = 0
      while (i < sub) { val xv = x.getDouble(base + i); aa += xv * xv; i += 1 }
      var bestD = 0.0
      var bestC = 0L
      var first = true
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        var ab = 0.0
        var bb = 0.0
        i = 0
        while (i < sub) {
          val bv = cv(base + i)
          ab += x.getDouble(base + i) * bv
          bb += bv * bv
          i += 1
        }
        val d = BigDecimal(aa - 2.0 * ab + bb)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (first || d < bestD) { bestD = d; bestC = codeIds(c); first = false }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** PQ asymmetric-distance accumulator: array<long> codes → the summed
  * per-subspace LUT entries (integer micro-units), against a CONSTANT
  * query-to-codeword lookup table (m×k longs, built driver-side from the
  * constant codebook + the query vector — both serving inputs). This is
  * the PQ paper's serving kernel verbatim: per-vector cost is `m` array
  * reads, the full-precision vector is never touched. Codes resolve to
  * LUT rows by binary search over the sorted code-id array (identity for
  * dense ids); an id outside the codebook — impossible for codes produced
  * by [[PqEncode]] over the same book — fails loudly rather than
  * miscounting.
  */
case class PqAdcSum(child: Expression, lut: Array[Long], codeIds: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> codes, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_sum"

  override def nullSafeEval(v: Any): Any =
    PqAdcSum.sum(v.asInstanceOf[ArrayData], lut, codeIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "long[]")
    val idsRef = ctx.addReferenceObj("pqIds", codeIds, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqAdcSum.sum($v, $lutRef, $idsRef);")
  }

  // Content-based equality for the Array fields — see [[PqEncode.equals]].
  override def equals(other: Any): Boolean = other match {
    case p: PqAdcSum =>
      child == p.child && java.util.Arrays.equals(lut, p.lut) &&
        java.util.Arrays.equals(codeIds, p.codeIds)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(lut)),
      Int.box(java.util.Arrays.hashCode(codeIds)))

  override protected def withNewChildInternal(newChild: Expression): PqAdcSum =
    copy(child = newChild)
}

object PqAdcSum {
  /** Shared by interpreted eval and codegen — one compiled code path. */
  def sum(codes: ArrayData, lut: Array[Long], codeIds: Array[Long]): Long = {
    val m = codes.numElements()
    val k = codeIds.length
    var s = 0L
    var j = 0
    while (j < m) {
      val idx = java.util.Arrays.binarySearch(codeIds, codes.getLong(j))
      require(idx >= 0, s"code ${codes.getLong(j)} not in the codebook")
      s += lut(j * k + idx)
      j += 1
    }
    s
  }
}

object VectorExpressions {

  /** Column API: dot product of two array<double> columns. */
  def vector_dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: ADC distance sum over PQ codes against a constant LUT
    * (index `j*k + codeIndex`, integer micro-units).
    */
  def pq_adc_sum(codes: Column, lut: Array[Long], codeIds: Array[Long]): Column =
    Bridge.column(PqAdcSum(Bridge.expression(codes), lut, codeIds))

  /** Column API: PQ-encode an array<double> vector against a constant
    * codebook (rows sorted by code id).
    */
  def pq_codes(v: Column, book: Array[Array[Double]], codeIds: Array[Long],
      m: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(v), book, codeIds, m))

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
