package graft.indices

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fire-weather systems: the Canadian Forest Fire Weather Index (CFFWIS)
  * codes and the McArthur Mark 5 system (KBDI, Griffiths drought factor,
  * FFDI) — the public surface of `cffwis_indices`, `drought_code`,
  * `duff_moisture_code`, `fire_season`, `overwintering_drought_code`,
  * `keetch_byram_drought_index`, `griffiths_drought_factor` and
  * `mcarthur_forest_fire_danger_index`.
  *
  * Reference semantics: `fire/_cffwis.py:246-530` (FFMC eqs 1-10, DMC eqs
  * 11-17, DC eqs 18-22, ISI eqs 25-26, BUI eq 27, FWI eqs 28-30, DSR),
  * `fire/_cffwis.py:570` (WF93 fire season), `fire/_cffwis.py:529`
  * (overwintering DC), `fire/_ffdi.py:44-188` (KBDI per Finkele 2006 s2.1.1,
  * Griffiths drought factor, McArthur FFDI Mark 5).
  *
  * Spark mapping: the three moisture codes are genuine day-on-day recursions,
  * so they run as a single `groupByKey(entity).flatMapGroups` JVM loop (one
  * shuffle keyed on the entity; O(1) state per group — the
  * `plans/Recursive` regime, linear at 100 TB when entity cardinality >>
  * cores). Everything derived from the codes (ISI/BUI/FWI/DSR, FFDI,
  * overwintering) is a pure scalar map and stays in codegen land as Column
  * expressions. The WF93 season mask needs no kernel at all: it is a
  * windowed all-of-last-N test plus a "last flip event wins" carry, i.e.
  * two window functions.
  *
  * Per-step state is rounded HALF_UP to 8 decimals (`round8`) so a
  * recursive-CTE oracle in another engine reproduces the trajectory
  * bit-exactly: 1-ulp libm differences (exp/pow/log) cannot accumulate or
  * flip branch comparisons.
  */
object Fire {

  // GFWED day-length table (`_cffwis.py:190-206`), row = latitude band.
  private val DayLengths: Array[Array[Double]] = Array(
    Array(11.5, 10.5, 9.2, 7.9, 6.8, 6.2, 6.5, 7.4, 8.7, 10, 11.2, 11.8), // [-90,-30)
    Array(10.1, 9.6, 9.1, 8.5, 8.1, 7.8, 7.9, 8.3, 8.9, 9.4, 9.9, 10.2),  // [-30,-15)
    Array.fill(12)(9.0),                                                   // [-15,15)
    Array(7.9, 8.4, 8.9, 9.5, 9.9, 10.2, 10.1, 9.7, 9.1, 8.6, 8.1, 7.8),  // [15,30)
    Array(6.5, 7.5, 9, 12.8, 13.9, 13.9, 12.4, 10.9, 9.4, 8, 7, 6))       // [30,90]

  private val DayLengthFactors: Array[Array[Double]] = Array(
    Array(6.4, 5.0, 2.4, 0.4, -1.6, -1.6, -1.6, -1.6, -1.6, 0.9, 3.8, 5.8), // [-90,-15)
    Array.fill(12)(1.39),                                                    // [-15,15)
    Array(-1.6, -1.6, -1.6, 0.9, 3.8, 5.8, 6.4, 5.0, 2.4, 0.4, -1.6, -1.6)) // [15,90]

  /** Mean day length [h] for DMC (`_cffwis.py:209`). */
  def dayLength(lat: Double, mth: Int): Double = {
    val row =
      if (lat >= -90 && lat < -30) DayLengths(0)
      else if (lat < -15) DayLengths(1)
      else if (lat < 15) DayLengths(2)
      else if (lat < 30) DayLengths(3)
      else DayLengths(4)
    row(mth - 1)
  }

  /** Day-length factor for DC (`_cffwis.py:230`). */
  def dayLengthFactor(lat: Double, mth: Int): Double = {
    val row =
      if (lat >= -90 && lat < -15) DayLengthFactors(0)
      else if (lat < 15) DayLengthFactors(1)
      else DayLengthFactors(2)
    row(mth - 1)
  }

  /** HALF_UP at 8 decimals — the per-step state quantizer (see class doc). */
  private[graft] def round8(x: Double): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Floor-grid at 6 decimals — the post-transcendental quantizer (the
    * GateSpec qk discipline): libm exp/pow differ across builds by an
    * ulp, so every transcendental output lands on the 1e-6 grid before
    * further arithmetic; the remaining ops are single correctly-rounded
    * IEEE steps on identical doubles, bit-identical across engines. */
  private[graft] def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Fine fuel moisture code, one step (`_cffwis.py:246`, eqs 1-10). */
  def ffmcStep(t: Double, p: Double, w: Double, h: Double, ffmc0: Double): Double = {
    var mo = (147.2 * (101.0 - ffmc0)) / (59.5 + ffmc0) // Eq.1
    if (p > 0.5) {
      val rf = p - 0.5 // Eq.2
      mo =
        if (mo > 150.0)
          (mo + 42.5 * rf * math.exp(-100.0 / (251.0 - mo)) * (1.0 - math.exp(-6.93 / rf))) +
            0.0015 * (mo - 150.0) * (mo - 150.0) * math.sqrt(rf) // Eq.3b
        else
          mo + 42.5 * rf * math.exp(-100.0 / (251.0 - mo)) * (1.0 - math.exp(-6.93 / rf)) // Eq.3a
      mo = math.min(mo, 250.0)
    }
    val ed = 0.942 * math.pow(h, 0.679) + 11.0 * math.exp((h - 100.0) / 10.0) +
      0.18 * (21.1 - t) * (1.0 - 1.0 / math.exp(0.115 * h)) // Eq.4
    val m =
      if (mo < ed) {
        val ew = 0.618 * math.pow(h, 0.753) + 10.0 * math.exp((h - 100.0) / 10.0) +
          0.18 * (21.1 - t) * (1.0 - 1.0 / math.exp(0.115 * h)) // Eq.5
        if (mo < ew) {
          val kl = 0.424 * (1.0 - math.pow((100.0 - h) / 100.0, 1.7)) +
            0.0694 * math.sqrt(w) * (1.0 - math.pow((100.0 - h) / 100.0, 8)) // Eq.7a
          val kw = kl * (0.581 * math.exp(0.0365 * t)) // Eq.7b
          ew - (ew - mo) / math.pow(10.0, kw) // Eq.9
        } else mo
      } else if (mo == ed) mo
      else {
        val kl = 0.424 * (1.0 - math.pow(h / 100.0, 1.7)) +
          0.0694 * math.sqrt(w) * (1.0 - math.pow(h / 100.0, 8)) // Eq.6a
        val kw = kl * (0.581 * math.exp(0.0365 * t)) // Eq.6b
        ed + (mo - ed) / math.pow(10.0, kw) // Eq.8
      }
    val ffmc = 59.5 * (250.0 - m) / (147.2 + m) // Eq.10
    math.max(0.0, math.min(101.0, ffmc))
  }

  /** Duff moisture code, one step (`_cffwis.py:321`, eqs 11-17, cffdrs
    * variant of eqs 12/15). */
  def dmcStep(t: Double, p: Double, h: Double, mth: Int, lat: Double, dmc0: Double): Double = {
    val dl = dayLength(lat, mth)
    val rk = if (t < -1.1) 0.0 else 1.894 * (t + 1.1) * (100.0 - h) * dl * 0.0001 // Eqs.16-17
    val pr =
      if (p > 1.5) {
        val rw = 0.92 * p - 1.27 // Eq.11
        val wmi = 20.0 + 280.0 / math.exp(0.023 * dmc0) // Eq.12 (cffdrs)
        val b =
          if (dmc0 <= 33.0) 100.0 / (0.5 + 0.3 * dmc0) // Eq.13a
          else if (dmc0 <= 65.0) 14.0 - 1.3 * math.log(dmc0) // Eq.13b
          else 6.2 * math.log(dmc0) - 17.2 // Eq.13c
        val wmr = wmi + (1000 * rw) / (48.77 + b * rw) // Eq.14
        43.43 * (5.6348 - math.log(wmr - 20.0)) // Eq.15 (cffdrs)
      } else dmc0
    math.max(0.0, math.max(pr, 0.0) + rk)
  }

  /** Drought code, one step (`_cffwis.py:400`, eqs 18-22). */
  def dcStep(t: Double, p: Double, mth: Int, lat: Double, dc0: Double): Double = {
    val fl = dayLengthFactor(lat, mth)
    val tc = math.max(t, -2.8)
    val pe = math.max((0.36 * (tc + 2.8) + fl) / 2.0, 0.0) // Eq.22
    if (p > 2.8) {
      val rw = 0.83 * p - 1.27 // Eq.18
      val smi = 800.0 * math.exp(-dc0 / 400.0) // Eq.19
      val dr = dc0 - 400.0 * math.log(1.0 + 3.937 * rw / smi) // Eqs.20-21
      if (dr > 0.0) dr + pe else pe
    } else dc0 + pe
  }

  /** CFFWIS default start-up values (`_cffwis.py:162`). */
  val FfmcStart = 85.0
  val DmcStart  = 6.0
  val DcStart   = 15.0

  /** The three moisture-code recursions over a daily weather frame.
    *
    * Input columns: `key` LONG, `t` INT (day ordinal, sort key), `temp`
    * (noon temperature, degC), `rain` (24 h rain, mm), `wind` (noon wind,
    * km/h), `hum` (noon RH, %), `mth` INT (1-12), `lat` DOUBLE.
    * Output: (key, t, ffmc, dmc, dc), codes quantized per step (round8).
    *
    * Rows within an entity are treated as consecutive observation days
    * (the reference assumes a dense daily series; gaps carry state over).
    */
  def cffwisCodes(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("key").cast("long"), col("t").cast("int"),
        col("temp").cast("double"), col("rain").cast("double"),
        col("wind").cast("double"), col("hum").cast("double"),
        col("mth").cast("int"), col("lat").cast("double"))
      .as[(Long, Int, Double, Double, Double, Double, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        var ffmc = FfmcStart
        var dmc  = DmcStart
        var dc   = DcStart
        rows.iterator.map { case (_, t, tt, p, w, h, mth, lat) =>
          ffmc = round8(ffmcStep(tt, p, w, h, ffmc))
          dmc  = round8(dmcStep(tt, p, h, mth, lat, dmc))
          dc   = round8(dcStep(tt, p, mth, lat, dc))
          (key, t, ffmc, dmc, dc)
        }
      }
      .toDF("key", "t", "ffmc", "dmc", "dc")
  }

  // ---- derived indices: pure scalar maps, kept as codegen'd Columns ----

  /** `initial_spread_index` (`_cffwis.py:441`, eqs 25-26). */
  def initialSpreadIndex(ws: Column, ffmc: Column): Column = {
    val mo = lit(147.2) * (lit(101.0) - ffmc) / (lit(59.5) + ffmc)
    val ff = lit(19.1152) * exp(mo * -0.1386) * (lit(1.0) + pow(mo, 5.31) / 49300000.0)
    ff * exp(lit(0.05039) * ws)
  }

  /** `build_up_index` (`_cffwis.py:465`, eq 27). */
  def buildUpIndex(dmc: Column, dc: Column): Column = {
    val denom = dmc + lit(0.4) * dc
    val bui = when(dmc === 0.0 && dc === 0.0, lit(0.0))
      .when(dmc <= lit(0.4) * dc, lit(0.8) * dc * dmc / denom) // Eq.27a
      .otherwise(dmc - (lit(1.0) - lit(0.8) * dc / denom) *
        (lit(0.92) + pow(lit(0.0114) * dmc, 1.7))) // Eq.27b
    greatest(bui, lit(0.0))
  }

  /** Fire weather index (`_cffwis.py:492`, eqs 28-30). */
  def fireWeatherIndex(isi: Column, bui: Column): Column = { // `fire_weather_index`
    val fwi = when(bui <= 80.0, lit(0.1) * isi * (lit(0.626) * pow(bui, 0.809) + 2.0)) // Eq.28a
      .otherwise(lit(0.1) * isi * (lit(1000.0) / (lit(25.0) + lit(108.64) / exp(lit(0.023) * bui)))) // Eq.28b
    when(fwi > 1.0, exp(lit(2.72) * pow(lit(0.434) * log(fwi), 0.647))).otherwise(fwi) // Eq.30b
  }

  /** `daily_severity_rating` (`_cffwis.py:516`). */
  def dailySeverityRating(fwi: Column): Column = lit(0.0272) * pow(fwi, 1.77)

  /** Overwintered season-start drought code (`_cffwis.py:529`): carry-over
    * fraction `a`, wetting efficiency `b`, winter precipitation `wpr` [mm]. */
  def overwinteringDroughtCode(dcFall: Column, wpr: Column,
                               a: Double = 0.75, b: Double = 0.75,
                               minDc: Double = DcStart): Column = {
    val qf = lit(800.0) * exp(-dcFall / 400.0)
    val qs = lit(a) * qf + lit(b) * (lit(3.94) * wpr)
    greatest(lit(400.0) * log(lit(800.0) / qs), lit(minDc))
  }

  /** WF93 fire-season mask (`_cffwis.py:570`): start up when the previous
    * `nDays` days (excluding today) were all above `tempStart`; shut down
    * when they were all below `tempEnd`; otherwise carry yesterday's state.
    * Pure window algebra: a flip signal + "last flip wins" carry — no
    * kernel, one shuffle on the entity key.
    *
    * Input: key/t/temp columns. Output: (key, t, fire_season BOOLEAN).
    */
  def fireSeasonWF93(df: DataFrame, tempStart: Double = 12.0, tempEnd: Double = 5.0,
                     nDays: Int = 3): DataFrame = {
    val wOrd = Window.partitionBy("key").orderBy("t")
    val wPrev = wOrd.rowsBetween(-nDays, -1)
    val wCarry = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    // The reference evaluates from index `temp_condition_days + 1` (0-based),
    // so the first nDays + 1 rows of each entity stay out-of-season.
    val evaluated = row_number().over(wOrd) >= nDays + 2
    val startUp = evaluated && min(col("temp")).over(wPrev) > tempStart
    val shutDown = evaluated && max(col("temp")).over(wPrev) < tempEnd
    // shut-down wins over start-up: (prev | start) & !shut
    val signal = when(shutDown, lit(0)).when(startUp, lit(1)).otherwise(lit(null))
    df.withColumn("sig", signal)
      .withColumn("fire_season",
        coalesce(last(col("sig"), ignoreNulls = true).over(wCarry), lit(0)) === 1)
      .drop("sig")
  }

  // ---- McArthur Mark 5 system -----------------------------------------

  /** Keetch-Byram drought index (`_ffdi.py:44`, Finkele 2006 s2.1.1;
    * capped at 203.2 mm). Two-component state (kbdi, remaining runoff).
    *
    * Input columns: key LONG, t INT, rain (mm/day), tmax (degC),
    * pa (mean annual rainfall, mm — constant per key).
    * Output: (key, t, kbdi), state quantized per step (round8).
    */
  def keetchByramDroughtIndex(df: DataFrame, kbdi0: Double = 0.0): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("key").cast("long"), col("t").cast("int"),
        col("rain").cast("double"), col("tmax").cast("double"), col("pa").cast("double"))
      .as[(Long, Int, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        var kbdi = kbdi0
        var rr = 5.0 // remaining runoff
        rows.iterator.map { case (_, t, p, tmax, pa) =>
          val r = if (p <= 0.0) { rr = 5.0; p } else { val x = math.min(p, rr); rr -= x; x }
          val peff = p - r
          val et = 1e-3 * (203.2 - kbdi) *
            (0.968 * math.exp(0.0875 * tmax + 1.5552) - 8.3) /
            (1.0 + 10.88 * math.exp(-0.00173 * pa))
          kbdi = round8(math.min(math.max(kbdi + et - peff, 0.0), 203.2))
          (key, t, kbdi)
        }
      }
      .toDF("key", "t", "kbdi")
  }

  /** Griffiths drought factor (`_ffdi.py:95`, Finkele 2006 eqs 13-14) over
    * a 20-day rainfall window. `lim = 0` applies the continuous xlim
    * (eq 14), `lim = 1` the discrete table (eq 13). Runs inside the same
    * per-entity pass as the 20-day ring buffer — no second shuffle.
    *
    * Input: key LONG, t INT, rain, smd (soil moisture deficit, e.g. KBDI).
    * Output: (key, t, df) with the first 19 days of each entity dropped
    * (the reference NaNs them; we omit the rows).
    *
    * Cross-engine determinism (r17, the GateSpec migration): event
    * rainfall sums accumulate on the EXACT 1e-4 integer grid (a float
    * fold's order would move an ulp between engines), and the two
    * transcendentals — pow(n, 1.3) and the smd exponential — quantize
    * through [[q6]] before entering the df arithmetic, after which
    * every op is a single correctly-rounded IEEE step an external
    * engine replays bit-for-bit.
    */
  def griffithsDroughtFactor(df: DataFrame, lim: Int = 0): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val wl = 20
    df.select(col("key").cast("long"), col("t").cast("int"),
        col("rain").cast("double"), col("smd").cast("double"))
      .as[(Long, Int, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        val p = rows.map(_._3)
        (wl - 1 until rows.length).iterator.map { d =>
          val pw = p.slice(d - wl + 1, d + 1)
          // x from significant rainfall events (runs of >2 mm) in the window
          var conseq = 0; var pmax = 0.0; var psumU = 0L; var x = 1.0; var nDays = 0
          var iw = 0
          while (iw < wl) {
            val event = pw(iw) > 2.0
            val eventEnd = !event && conseq != 0
            val finalEvent = event && iw == wl - 1
            if (event) {
              conseq += 1
              psumU += math.floor(pw(iw) * 1e4 + 0.5).toLong
              if (pw(iw) >= pmax) { nDays = wl - iw; pmax = pw(iw) }
            }
            if (eventEnd || finalEvent) {
              val p13 = q6(math.pow(nDays, 1.3))
              val xx = p13 / (p13 + psumU / 1e4 - 2.0)
              x = math.min(xx, x)
              conseq = 0; psumU = 0L; pmax = 0.0
            }
            iw += 1
          }
          val smd = rows(d)._4
          if (lim == 0) {
            val xlim = if (smd < 20) 1.0 / (1.0 + 0.1135 * smd) else 75.0 / (270.525 - 1.267 * smd)
            x = math.min(x, xlim)
          }
          var dfw = 10.5 * (1.0 - q6(math.exp(-(smd + 30.0) / 40.0))) *
            (41.0 * x * x + x) / (40.0 * x * x + x + 1.0)
          if (lim == 1) {
            val dflim =
              if (smd < 25.0) 6.0
              else if (smd < 42.0) 7.0
              else if (smd < 65.0) 8.0
              else if (smd < 100.0) 9.0
              else 10.0
            dfw = math.min(dfw, dflim)
          }
          (key, rows(d)._2, round8(math.min(dfw, 10.0)))
        }
      }
      .toDF("key", "t", "df")
  }

  /** McArthur forest fire danger index Mark 5 (`_ffdi.py:354`,
    * Noble 1980): pure scalar over drought factor, tmax [degC], RH [%],
    * wind [km/h]. Both transcendental factors land on the 1e-6 floor
    * grid (the [[q6]] discipline — libm pow/exp are build-dependent by
    * an ulp), so the emitted product is ONE IEEE multiply of two
    * grid-aligned doubles — bit-identical across engines, no final
    * round needed. */
  def mcarthurFfdi(droughtFactor: Column, tasmax: Column, hurs: Column, sfcWind: Column): Column = {
    val p = floor(pow(droughtFactor, 0.987) * 1e6 + lit(0.5)) / 1e6
    val e = floor(exp(lit(0.0338) * tasmax - lit(0.0345) * hurs +
      lit(0.0234) * sfcWind + lit(0.243147)) * 1e6 + lit(0.5)) / 1e6
    p * e
  }
}
