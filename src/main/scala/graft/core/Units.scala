package graft.core

import org.apache.spark.sql.Column

/** Minimal unit registry — the subset of pint the reference actually uses
  * (`xclim/core/units.py:140` `units2pint`, `:334` `convert_units_to`):
  * linear scale factors, offset temperatures, and the `hydro` context
  * equivalence mm/d <-> kg m-2 s-1 (assuming water density 1000 kg/m3).
  *
  * Conversions are resolved on the DRIVER to a (factor, offset) pair and
  * applied as a codegen'd `col * factor + offset` — never a per-row lookup.
  */
object Units {

  /** Dimension vector: (length, mass, time, temperature, dimensionless-ok). */
  final case class Dim(l: Int = 0, m: Int = 0, t: Int = 0, k: Int = 0) {
    def *(o: Dim): Dim = Dim(l + o.l, m + o.m, t + o.t, k + o.k)
    def /(o: Dim): Dim = Dim(l - o.l, m - o.m, t - o.t, k - o.k)
  }

  /** A unit: factor+offset to SI base of its dimension. */
  final case class Unit(dim: Dim, factor: Double, offset: Double = 0.0)

  private val D = 86400.0
  // symbol -> unit (SI base: m, kg, s, K)
  val registry: Map[String, Unit] = Map(
    "m"          -> Unit(Dim(l = 1), 1),
    "cm"         -> Unit(Dim(l = 1), 0.01),
    "mm"         -> Unit(Dim(l = 1), 0.001),
    "km"         -> Unit(Dim(l = 1), 1000),
    "kg"         -> Unit(Dim(m = 1), 1),
    "g"          -> Unit(Dim(m = 1), 0.001),
    "s"          -> Unit(Dim(t = 1), 1),
    "min"        -> Unit(Dim(t = 1), 60),
    "h"          -> Unit(Dim(t = 1), 3600),
    "d"          -> Unit(Dim(t = 1), D),
    "day"        -> Unit(Dim(t = 1), D),
    "week"       -> Unit(Dim(t = 1), 7 * D),
    "K"          -> Unit(Dim(k = 1), 1),
    "degC"       -> Unit(Dim(k = 1), 1, 273.15),
    "degF"       -> Unit(Dim(k = 1), 5.0 / 9.0, 255.372222222222),
    "%"          -> Unit(Dim(), 0.01),
    "1"          -> Unit(Dim(), 1),
    // compound symbols used by the CMIP vocabulary (variables.yml)
    "m/s"        -> Unit(Dim(l = 1, t = -1), 1),
    "km/h"       -> Unit(Dim(l = 1, t = -1), 1000.0 / 3600.0),
    "mm/d"       -> Unit(Dim(l = 1, t = -1), 0.001 / D),
    "mm/h"       -> Unit(Dim(l = 1, t = -1), 0.001 / 3600.0),
    "kg m-2 s-1" -> Unit(Dim(m = 1, l = -2, t = -1), 1),
    "kg m-2"     -> Unit(Dim(m = 1, l = -2), 1),
    "W m-2"      -> Unit(Dim(m = 1, t = -3), 1),
    "Pa"         -> Unit(Dim(m = 1, l = -1, t = -2), 1),
    "hPa"        -> Unit(Dim(m = 1, l = -1, t = -2), 100),
    "m3 s-1"     -> Unit(Dim(l = 3, t = -1), 1),
    "m2"         -> Unit(Dim(l = 2), 1),
    "km2"        -> Unit(Dim(l = 2), 1e6)
  )

  /** The hydro context (units.py `hydro`): precipitation mass flux
    * kg m-2 s-1 is interchangeable with liquid-water-equivalent rate mm/d
    * via water density 1000 kg/m3: 1 kg m-2 s-1 == 86400 mm/d. */
  private def hydroBridge(from: Unit, to: Unit): Option[Double] = {
    val massFlux = Dim(m = 1, l = -2, t = -1)
    val lweRate = Dim(l = 1, t = -1)
    val lweAmount = Dim(l = 1)
    val massAmount = Dim(m = 1, l = -2)
    (from.dim, to.dim) match {
      case (f, t) if f == massFlux && t == lweRate   => Some(0.001)  // (kg m-2 s-1)->(m/s) /1000
      case (f, t) if f == lweRate && t == massFlux   => Some(1000.0)
      case (f, t) if f == massAmount && t == lweAmount => Some(0.001)
      case (f, t) if f == lweAmount && t == massAmount => Some(1000.0)
      case _ => None
    }
  }

  def lookup(symbol: String): Unit =
    registry.getOrElse(symbol.trim,
      throw new IllegalArgumentException(s"unknown unit: $symbol"))

  /** Driver-side conversion: value[from] -> value[to] as (factor, offset):
    * out = in * factor + offset. Offset units (degC/degF) only convert
    * directly (not inside compounds), like pint. */
  def conversion(from: String, to: String): (Double, Double) = {
    val f = lookup(from); val t = lookup(to)
    if (f.dim == t.dim) {
      // in SI: si = in * f.factor + f.offset ; out = (si - t.offset)/t.factor
      (f.factor / t.factor, (f.offset - t.offset) / t.factor)
    } else hydroBridge(f, t) match {
      case Some(density) => ((f.factor * density) / t.factor, 0.0)
      case None => throw new IllegalArgumentException(
        s"incompatible dimensions: $from -> $to")
    }
  }

  /** Column-level conversion (codegen'd scalar arithmetic). */
  def convert(c: Column, from: String, to: String): Column = {
    val (factor, offset) = conversion(from, to)
    if (factor == 1.0 && offset == 0.0) c
    else if (offset == 0.0) c * factor
    else c * factor + offset
  }

  // ---- rate/amount/flux/thickness converter verbs (units.py:744-1200) ----

  /** Per-step duration in SECONDS derived from the time axis — the `dt` of
    * `rate2amount`/`amount2rate` (units.py:744 `_rate_and_amount_converter`
    * with `sampling_rate_from_coord`): step_i = t_(i+1) − t_i (diff label
    * "lower"), the FINAL step reusing the previous duration (the ffill
    * reindex). Pass a microsecond epoch column and the entity window; a
    * single-row series yields null (no inferable step). Pure window
    * projection — one shuffle on the entity key the caller already has. */
  def stepSeconds(timeMicros: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    import org.apache.spark.sql.functions.{coalesce, lag, lead}
    coalesce(lead(timeMicros, 1).over(w) - timeMicros,
      timeMicros - lag(timeMicros, 1).over(w)).cast("double") / 1e6
  }

  /** `rate2amount` (units.py:854): integrate a rate over each sampling
    * step — [X s-1] × step seconds → [X]. The inverse of [[amount2rate]]. */
  def rate2amount(rate: Column, stepS: Column): Column = rate * stepS

  /** `amount2rate` (units.py:941): amount per step → mean rate. */
  def amount2rate(amount: Column, stepS: Column): Column = amount / stepS

  /** `rate2flux` (units.py:1109): thickness rate × density → mass flux,
    * e.g. snowfall rate [m s-1] × 312 kg m-3 → prsn [kg m-2 s-1]. */
  def rate2flux(rate: Column, density: Double): Column = rate * density

  /** `flux2rate` (units.py:1159): mass flux ÷ density → thickness rate. */
  def flux2rate(flux: Column, density: Double): Column = flux / density

  /** `amount2lwethickness` (units.py:995): with water density 1000 kg m-3,
    * 1 kg m-2 of liquid water IS 1 mm of thickness — a magnitude identity;
    * the conversion is a units relabel (kg m-2 → mm). Kept as explicit
    * named verbs so pipelines document the semantic step. */
  def amount2lwethickness(amount: Column): Column = amount

  /** `lwethickness2amount` (units.py:1031): inverse relabel (mm → kg m-2). */
  def lwethickness2amount(thickness: Column): Column = thickness

  /** `declare_units`-style dimensionality check (units.py:1424): validate a
    * column's declared unit has the expected dimensionality. */
  private val baseDims = Map(
    "temperature"   -> Dim(k = 1),
    "precipitation" -> Dim(m = 1, l = -2, t = -1),
    "length"        -> Dim(l = 1),
    "area"          -> Dim(l = 2),
    "volume"        -> Dim(l = 3),
    "mass"          -> Dim(m = 1),
    "time"          -> Dim(t = 1),
    "speed"         -> Dim(l = 1, t = -1),
    "pressure"      -> Dim(m = 1, l = -1, t = -2),
    "discharge"     -> Dim(l = 3, t = -1))

  /** Parse a pint-style dimensionality expression — products and quotients
    * of bracketed base dims, e.g. "[mass]/[area]" or
    * "[precipitation]·[time]" — into a dimension vector. */
  def parseDimensionality(expr: String): Option[Dim] = {
    if (expr == "[]" || expr.trim.isEmpty) return Some(Dim())
    val token = "\\[([a-z]+)\\]".r
    var dim = Dim(); var sign = 1; var pos = 0; var ok = true
    val s = expr.replace("·", "*").replace(" ", "")
    while (pos < s.length && ok) s.charAt(pos) match {
      case '*' => sign = 1; pos += 1
      case '/' => sign = -1; pos += 1
      case '[' =>
        token.findPrefixMatchOf(s.substring(pos)) match {
          case Some(mt) if baseDims.contains(mt.group(1)) =>
            val d = baseDims(mt.group(1))
            dim = if (sign > 0) dim * d else dim / d
            pos += mt.end
          case _ => ok = false
        }
      case _ => ok = false
    }
    if (ok) Some(dim) else None
  }

  def checkDimension(symbol: String, expected: String): Boolean =
    parseDimensionality(expected).exists { d =>
      val u = lookup(symbol)
      u.dim == d || hydroBridge(u, Unit(d, 1)).isDefined
    }

  /** `to_agg_units` (units.py:621): output unit after an aggregation. */
  def aggUnits(inputUnit: String, op: String, sampling: String = "d"): String = op match {
    case "count" | "doymin" | "doymax" => sampling
    case "integral"                    => s"$inputUnit $sampling"
    case _                             => inputUnit
  }
}
