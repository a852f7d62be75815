package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Special functions needed by the distribution-fit layer (stats.py:115
  * `fit`, :221 `parametric_quantile`, :770+ standardized indices): the
  * regularized lower incomplete gamma P(a, x) (gamma CDF) and the inverse
  * normal CDF (probit). Native expressions with static-call codegen —
  * numerics from public formulations (Numerical Recipes-style series /
  * continued fraction for P(a,x); Acklam's rational approximation for the
  * probit, |relative error| < 1.15e-9).
  */
object SpecialMath {

  private val EPS = 1e-14
  private val MAXIT = 500

  def logGamma(x: Double): Double = {
    // Lanczos g=7, n=9 coefficients (public domain)
    val g = 7.0
    val c = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val xx = x - 1.0
      var a = c(0)
      val t = xx + g + 0.5
      var i = 1
      while (i < 9) { a += c(i) / (xx + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized lower incomplete gamma P(a, x) = gamma CDF at x for shape a,
    * scale 1. Series for x < a+1, continued fraction otherwise. */
  def gammaP(a: Double, x: Double): Double = {
    if (x <= 0.0 || a <= 0.0) return 0.0
    if (x < a + 1.0) {
      // series representation
      var ap = a
      var sum = 1.0 / a
      var del = sum
      var i = 0
      while (i < MAXIT && math.abs(del) >= math.abs(sum) * EPS) {
        ap += 1.0
        del *= x / ap
        sum += del
        i += 1
      }
      sum * math.exp(-x + a * math.log(x) - logGamma(a))
    } else {
      // continued fraction (modified Lentz)
      var b = x + 1.0 - a
      var c = 1.0 / 1e-300
      var d = 1.0 / b
      var h = d
      var i = 1
      var break_ = false
      while (i <= MAXIT && !break_) {
        val an = -i * (i - a)
        b += 2.0
        d = an * d + b; if (math.abs(d) < 1e-300) d = 1e-300
        c = b + an / c; if (math.abs(c) < 1e-300) c = 1e-300
        d = 1.0 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < EPS) break_ = true
        i += 1
      }
      1.0 - math.exp(-x + a * math.log(x) - logGamma(a)) * h
    }
  }

  /** Digamma psi(x) via recurrence to x >= 8 + asymptotic series (through
    * the B10 term; |err| < 1e-12 for x > 0). */
  def digamma(xIn: Double): Double = {
    var x = xIn
    var result = 0.0
    while (x < 8.0) { result -= 1.0 / x; x += 1.0 }
    val inv = 1.0 / x
    val inv2 = inv * inv
    result + math.log(x) - 0.5 * inv -
      inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0 -
        inv2 * (1.0 / 240.0 - inv2 / 132.0))))
  }

  /** Trigamma psi'(x), same scheme (through the B10 term). */
  def trigamma(xIn: Double): Double = {
    var x = xIn
    var result = 0.0
    while (x < 8.0) { result += 1.0 / (x * x); x += 1.0 }
    val inv = 1.0 / x
    val inv2 = inv * inv
    result + inv * (1.0 + 0.5 * inv +
      inv2 * (1.0 / 6.0 - inv2 * (1.0 / 30.0 - inv2 * (1.0 / 42.0 -
        inv2 * (1.0 / 30.0 - inv2 * 5.0 / 66.0)))))
  }

  /** Gamma maximum-likelihood shape given s = ln(mean) - mean(ln x):
    * Minka (2002) closed-form initialisation + Newton steps on
    * ln(a) - psi(a) = s. Pure scalar math — callable per aggregated row, so
    * a distributed MLE needs only avg(x) and avg(ln x). */
  def gammaMleShape(s: Double): Double = {
    if (!(s > 0.0)) return Double.NaN
    var a = (3.0 - s + math.sqrt((s - 3.0) * (s - 3.0) + 24.0 * s)) / (12.0 * s)
    var i = 0
    while (i < 10) {
      val f = math.log(a) - digamma(a) - s
      val fp = 1.0 / a - trigamma(a)
      val next = a - f / fp
      if (next > 0 && math.abs(next - a) < 1e-12 * a) { a = next; i = 10 }
      else if (next > 0) a = next
      i += 1
    }
    a
  }

  /** Inverse regularized incomplete gamma: x with P(a, x) = p, by Newton on
    * gammaP with the gamma pdf as derivative (gamma ppf at scale 1 — the
    * return-period quantile of `fa`/`frequency_analysis`, stats.py:429). */
  def gammaPInv(a: Double, p: Double): Double = {
    if (p <= 0.0) return 0.0
    if (p >= 1.0) return Double.PositiveInfinity
    // Wilson-Hilferty initial guess
    val g = probit(p)
    var x = a * math.pow(1.0 - 1.0 / (9.0 * a) + g / (3.0 * math.sqrt(a)), 3)
    if (!(x > 0)) x = a * p // fallback for tiny a
    var i = 0
    while (i < 60) {
      val f = gammaP(a, x) - p
      val pdf = math.exp((a - 1.0) * math.log(x) - x - logGamma(a))
      if (pdf <= 0) i = 60
      else {
        var next = x - f / pdf
        if (next <= 0) next = x / 2.0
        if (math.abs(next - x) < 1e-12 * (1.0 + x)) { x = next; i = 60 }
        else { x = next }
      }
      i += 1
    }
    x
  }

  /** Inverse standard normal CDF (Acklam 2003 rational approximation). */
  def probit(p: Double): Double = {
    if (p <= 0.0) return Double.NegativeInfinity
    if (p >= 1.0) return Double.PositiveInfinity
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
    val cc = Array(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((cc(0) * q + cc(1)) * q + cc(2)) * q + cc(3)) * q + cc(4)) * q + cc(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -(((((cc(0) * q + cc(1)) * q + cc(2)) * q + cc(3)) * q + cc(4)) * q + cc(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    }
  }
}

/** gamma_cdf(x, shape): P(shape, x) — scale the input by 1/theta upstream. */
case class GammaCdf(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(x: Any, a: Any): Any =
    SpecialMath.gammaP(a.asInstanceOf[Double], x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, a) => s"graft.functions.SpecialMath.gammaP($a, $x)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GammaCdf =
    copy(left = l, right = r)
}

/** probit(p): inverse standard normal CDF. */
case class Probit(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(p: Any): Any = SpecialMath.probit(p.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.SpecialMath.probit($p)")
  override protected def withNewChildInternal(c: Expression): Probit = copy(child = c)
}

/** gamma_mle_shape(s): MLE gamma shape from s = ln(mean) - mean(ln x). */
case class GammaMleShape(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(s: Any): Any = SpecialMath.gammaMleShape(s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SpecialMath.gammaMleShape($s)")
  override protected def withNewChildInternal(c: Expression): GammaMleShape = copy(child = c)
}

/** log_gamma(x): Lanczos log-Gamma (needed by the GEV/Pearson-III L-moment
  * parameter maps, stats.py:115 `fit` method="PWM"). */
case class LogGamma(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(x: Any): Any = SpecialMath.logGamma(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SpecialMath.logGamma($x)")
  override protected def withNewChildInternal(c: Expression): LogGamma = copy(child = c)
}

/** gamma_ppf(p, shape): inverse regularized incomplete gamma (scale 1). */
case class GammaPInv(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(p: Any, a: Any): Any =
    SpecialMath.gammaPInv(a.asInstanceOf[Double], p.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, a) => s"graft.functions.SpecialMath.gammaPInv($a, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GammaPInv =
    copy(left = l, right = r)
}

object SpecialFunctions {
  /** Gamma CDF with shape/scale: P(shape, x/scale). */
  def gammaCdf(x: Column, shape: Column, scale: Column): Column =
    ColumnBridge.column(GammaCdf(
      ColumnBridge.expression(x / scale), ColumnBridge.expression(shape)))

  def probit(p: Column): Column =
    ColumnBridge.column(Probit(ColumnBridge.expression(p)))

  /** Distributed gamma MLE: feed avg(x) and avg(ln x) aggregates; shape
    * solves ln(a) - psi(a) = ln(mean) - meanLog, scale = mean / shape
    * (stats.py:115 `fit`, method="ML", gamma). */
  def gammaMleShape(mean: Column, meanLog: Column): Column =
    ColumnBridge.column(GammaMleShape(
      ColumnBridge.expression(org.apache.spark.sql.functions.log(mean) - meanLog)))

  /** Gamma quantile (ppf) with shape/scale. */
  def gammaPpf(p: Column, shape: Column, scale: Column): Column =
    ColumnBridge.column(GammaPInv(
      ColumnBridge.expression(p), ColumnBridge.expression(shape))) * scale

  /** ln Γ(x) (Lanczos g=7 n=9). */
  def logGamma(x: Column): Column =
    ColumnBridge.column(LogGamma(ColumnBridge.expression(x)))

  /** Γ(x) = exp(ln Γ(x)). */
  def gammaFn(x: Column): Column =
    org.apache.spark.sql.functions.exp(logGamma(x))
}
