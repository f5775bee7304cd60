package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native per-row kernels for the power-iteration PCA family
  * (`ext/Pca`) — the §8 HOF rule applied a third time: the declarative
  * spelling (aggregate/transform lambdas over 64-wide arrays) is
  * CodegenFallback, costing ~190 interpreted lambda dispatches per row
  * per pass, and — worse — an UN-pinned deflation chain gets inlined by
  * CollapseProject into every element_at, re-evaluating whole parent
  * arrays per element (compounding 64× per layer; the 8× probe measured
  * minutes instead of seconds). These kernels consume the input array
  * ONCE per row, so chained deflation stays O(layers · dims) per row
  * with NO pinned storage — the recompute rule holds again.
  *
  * Bit-identity contract with the declarative spellings (and the DuckDB
  * oracle): every dot accumulates left-to-right over the dimension
  * order; micro-unit rounding is the same BigDecimal HALF_UP Spark's
  * `round` uses; elementwise ops are exact-rounded IEEE.
  */
object PcaKernels {

  def microRound(d: Double): Long =
    BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  def ltrDot(x: ArrayData, w: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < w.length) { s += x.getDouble(i) * w(i); i += 1 }; s
  }

  def ltrDotCentered(x: ArrayData, mu: Array[Double], w: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < w.length) { s += (x.getDouble(i) - mu(i)) * w(i); i += 1 }; s
  }

  /** round(x_j · 1e6) micro-units of a raw array. */
  def micro(x: ArrayData, dims: Int): ArrayData = {
    val out = new Array[Long](dims)
    var i = 0
    while (i < dims) { out(i) = microRound(x.getDouble(i) * 1e6); i += 1 }
    new GenericArrayData(out)
  }

  /** x_j − mu_j elementwise (the centering projection). */
  def center(x: ArrayData, mu: Array[Double]): ArrayData = {
    val out = new Array[Double](mu.length)
    var i = 0
    while (i < mu.length) { out(i) = x.getDouble(i) - mu(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Power-step contribution: y = x·w (ltr), out_j = round((y·x_j)·1e6). */
  def contribMicro(x: ArrayData, w: Array[Double]): ArrayData = {
    val y = ltrDot(x, w)
    val out = new Array[Long](w.length)
    var i = 0
    while (i < w.length) { out(i) = microRound(y * x.getDouble(i) * 1e6); i += 1 }
    new GenericArrayData(out)
  }

  /** Centered power-step contribution (the single-component spelling):
    * y = (x−mu)·w, out_j = round((y·(x_j−mu_j))·1e6).
    */
  def centeredContribMicro(x: ArrayData, mu: Array[Double],
      w: Array[Double]): ArrayData = {
    val y = ltrDotCentered(x, mu, w)
    val out = new Array[Long](w.length)
    var i = 0
    while (i < w.length) {
      out(i) = microRound(y * (x.getDouble(i) - mu(i)) * 1e6); i += 1
    }
    new GenericArrayData(out)
  }

  /** Deflation projection: p = x·w (ltr), out_j = x_j − p·w_j. */
  def deflate(x: ArrayData, w: Array[Double]): ArrayData = {
    val p = ltrDot(x, w)
    val out = new Array[Double](w.length)
    var i = 0
    while (i < w.length) { out(i) = x.getDouble(i) - p * w(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** Base for the unary array<double> PCA kernels: shared type check and
  * the content-based equality that keeps CSE working over constant-array
  * fields (the r7 PqEncode lesson).
  */
abstract class PcaKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }
}

case class VecMicro(child: Expression, dims: Int) extends PcaKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_micro"
  override def nullSafeEval(x: Any): Any =
    PcaKernels.micro(x.asInstanceOf[ArrayData], dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PcaKernels.micro($x, $dims);")
  override protected def withNewChildInternal(newChild: Expression): VecMicro =
    copy(child = newChild)
}

case class VecCenter(child: Expression, mu: Array[Double]) extends PcaKernelExpr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_center"
  override def nullSafeEval(x: Any): Any =
    PcaKernels.center(x.asInstanceOf[ArrayData], mu)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("pcaMu", mu, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PcaKernels.center($x, $muRef);")
  }
  override def equals(other: Any): Boolean = other match {
    case o: VecCenter => child == o.child && java.util.Arrays.equals(mu, o.mu)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(mu)))
  override protected def withNewChildInternal(newChild: Expression): VecCenter =
    copy(child = newChild)
}

case class PcaDot(child: Expression, w: Array[Double]) extends PcaKernelExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pca_dot"
  override def nullSafeEval(x: Any): Any =
    PcaKernels.ltrDot(x.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("pcaW", w, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PcaKernels.ltrDot($x, $wRef);")
  }
  override def equals(other: Any): Boolean = other match {
    case o: PcaDot => child == o.child && java.util.Arrays.equals(w, o.w)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(w)))
  override protected def withNewChildInternal(newChild: Expression): PcaDot =
    copy(child = newChild)
}

case class PcaCenteredDot(child: Expression, mu: Array[Double],
    w: Array[Double]) extends PcaKernelExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pca_centered_dot"
  override def nullSafeEval(x: Any): Any =
    PcaKernels.ltrDotCentered(x.asInstanceOf[ArrayData], mu, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("pcaMu", mu, "double[]")
    val wRef = ctx.addReferenceObj("pcaW", w, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PcaKernels.ltrDotCentered($x, $muRef, $wRef);")
  }
  override def equals(other: Any): Boolean = other match {
    case o: PcaCenteredDot => child == o.child &&
      java.util.Arrays.equals(mu, o.mu) && java.util.Arrays.equals(w, o.w)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(mu)),
      Int.box(java.util.Arrays.hashCode(w)))
  override protected def withNewChildInternal(newChild: Expression): PcaCenteredDot =
    copy(child = newChild)
}

case class PcaContribMicro(child: Expression, w: Array[Double])
    extends PcaKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pca_contrib_micro"
  override def nullSafeEval(x: Any): Any =
    PcaKernels.contribMicro(x.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("pcaW", w, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PcaKernels.contribMicro($x, $wRef);")
  }
  override def equals(other: Any): Boolean = other match {
    case o: PcaContribMicro => child == o.child && java.util.Arrays.equals(w, o.w)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(w)))
  override protected def withNewChildInternal(newChild: Expression): PcaContribMicro =
    copy(child = newChild)
}

case class PcaCenteredContribMicro(child: Expression, mu: Array[Double],
    w: Array[Double]) extends PcaKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pca_centered_contrib_micro"
  override def nullSafeEval(x: Any): Any =
    PcaKernels.centeredContribMicro(x.asInstanceOf[ArrayData], mu, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("pcaMu", mu, "double[]")
    val wRef = ctx.addReferenceObj("pcaW", w, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PcaKernels.centeredContribMicro($x, $muRef, $wRef);")
  }
  override def equals(other: Any): Boolean = other match {
    case o: PcaCenteredContribMicro => child == o.child &&
      java.util.Arrays.equals(mu, o.mu) && java.util.Arrays.equals(w, o.w)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(mu)),
      Int.box(java.util.Arrays.hashCode(w)))
  override protected def withNewChildInternal(
      newChild: Expression): PcaCenteredContribMicro =
    copy(child = newChild)
}

case class PcaDeflate(child: Expression, w: Array[Double])
    extends PcaKernelExpr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_deflate"
  override def nullSafeEval(x: Any): Any =
    PcaKernels.deflate(x.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("pcaW", w, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PcaKernels.deflate($x, $wRef);")
  }
  override def equals(other: Any): Boolean = other match {
    case o: PcaDeflate => child == o.child && java.util.Arrays.equals(w, o.w)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(w)))
  override protected def withNewChildInternal(newChild: Expression): PcaDeflate =
    copy(child = newChild)
}

object PcaExpressions {
  def vec_micro(c: Column, dims: Int): Column =
    Bridge.column(VecMicro(Bridge.expression(c), dims))
  def vec_center(c: Column, mu: Array[Double]): Column =
    Bridge.column(VecCenter(Bridge.expression(c), mu.clone()))
  def pca_dot(c: Column, w: Array[Double]): Column =
    Bridge.column(PcaDot(Bridge.expression(c), w.clone()))
  def pca_centered_dot(c: Column, mu: Array[Double], w: Array[Double]): Column =
    Bridge.column(PcaCenteredDot(Bridge.expression(c), mu.clone(), w.clone()))
  def pca_contrib_micro(c: Column, w: Array[Double]): Column =
    Bridge.column(PcaContribMicro(Bridge.expression(c), w.clone()))
  def pca_centered_contrib_micro(c: Column, mu: Array[Double],
      w: Array[Double]): Column =
    Bridge.column(PcaCenteredContribMicro(Bridge.expression(c), mu.clone(), w.clone()))
  def pca_deflate(c: Column, w: Array[Double]): Column =
    Bridge.column(PcaDeflate(Bridge.expression(c), w.clone()))
}
