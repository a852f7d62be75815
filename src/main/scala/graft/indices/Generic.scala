package graft.indices

import graft.core.{Runs, Time}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic index builders — the engine's equivalent of
  * `xclim/indices/generic.py`: parameterised (DataFrame, config) => DataFrame
  * plans from which the ~150 concrete indices of SURVEY §2.2 are one-line
  * specialisations. Everything is resample-shaped:
  * `groupBy(keys :+ Time.resamplePeriod(time, freq))` + a reduction, so a
  * whole index is a single map-side-combinable hash-agg at 100 TB.
  */
object Generic {

  /** Comparison operator registry (generic.py:255 `get_op`); the
    * resulting mask is `get_daily_events` (generic.py:395). */
  def compare(v: Column, op: String, thr: Column): Column = op match {
    case ">" | "gt"  => v > thr
    case ">=" | "ge" => v >= thr
    case "<" | "lt"  => v < thr
    case "<=" | "le" => v <= thr
    case "==" | "eq" => v === thr
    case "!=" | "ne" => v =!= thr
    case other       => throw new IllegalArgumentException(s"bad op: $other")
  }

  private def grouped(df: DataFrame, keys: Seq[String], time: Column, freq: String) =
    df.groupBy((keys.map(col) :+ Time.resamplePeriod(time, freq).as("period")): _*)

  /** select_resample_op (generic.py:83): period reduction of a value. */
  def resampleOp(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                 aggs: Seq[Column]): DataFrame =
    grouped(df, keys, time, freq).agg(aggs.head, aggs.tail: _*)

  /** threshold_count / count_occurrences (generic.py:329,:961): #rows
    * where op(v, thr) per period. */
  def thresholdCount(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                     v: Column, op: String, thr: Column, as: String = "count"): DataFrame =
    resampleOp(df, keys, time, freq,
      Seq(coalesce(sum(when(compare(v, op, thr), 1L)), lit(0L)).as(as)))

  /** domain_count (generic.py:364): #rows with low < v <= high per period. */
  def domainCount(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                  v: Column, low: Column, high: Column, as: String = "count"): DataFrame =
    resampleOp(df, keys, time, freq,
      Seq(coalesce(sum(when(v > low && v <= high, 1L)), lit(0L)).as(as)))

  /** cumulative_difference / degree-days (generic.py:1515): sum of the
    * clipped signed difference per period; op ">" = cooling, "<" = heating. */
  def cumulativeDifference(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                           v: Column, op: String, thr: Column, as: String = "dd"): DataFrame = {
    val diff = op match {
      case ">" | "gt" => greatest(v - thr, lit(0.0))
      case "<" | "lt" => greatest(thr - v, lit(0.0))
      case other      => throw new IllegalArgumentException(s"bad op: $other")
    }
    resampleOp(df, keys, time, freq, Seq(sum(diff).as(as)))
  }

  /** first/last_occurrence (generic.py:1109,:1157): time of first (last) row
    * satisfying the condition, per period. */
  def firstOccurrence(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                      cond: Column, as: String = "first_occurrence"): DataFrame =
    resampleOp(df, keys, time, freq, Seq(min(when(cond, time)).as(as)))

  def lastOccurrence(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                     cond: Column, as: String = "last_occurrence"): DataFrame =
    resampleOp(df, keys, time, freq, Seq(max(when(cond, time)).as(as)))

  /** doymax/doymin (generic.py:177): day-of-year of the period extreme;
    * deterministic tie-break on earliest time via struct-ordered max_by. */
  def doyOfExtreme(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                   v: Column, maximum: Boolean, as: String = "doy"): DataFrame = {
    // order (value, -epoch) so ties pick the earliest timestamp
    val ord = if (maximum) struct(v, (lit(0L) - unix_timestamp(time)).as("_t"))
              else struct(lit(0.0) - v, (lit(0L) - unix_timestamp(time)).as("_t"))
    resampleOp(df, keys, time, freq,
      Seq(dayofyear(max_by(time, ord)).as(as)))
  }

  /** statistics / thresholded_statistics (generic.py:1255,:1279). */
  def thresholdedStat(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                      v: Column, cond: Column, reducer: String, as: String): DataFrame = {
    val filtered = when(cond, v)
    val red = reducer match {
      case "mean" => avg(filtered); case "max" => max(filtered)
      case "min" => min(filtered); case "sum" => sum(filtered)
      case "std" => stddev_samp(filtered); case "count" => count(filtered)
      case other => throw new IllegalArgumentException(s"bad reducer: $other")
    }
    resampleOp(df, keys, time, freq, Seq(red.as(as)))
  }

  /** select_rolling_resample_op (generic.py:128): right-aligned rolling
    * reduce over `window` rows, then period reduction. E.g. max n-day precip
    * (_simple.py:485) = rollingThenResample(sum over 3 rows, max). */
  def rollingThenResample(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                          v: Column, window: Int, winReducer: String, periodReducer: String,
                          as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(time)
      .rowsBetween(-(window - 1), 0)
    val wn = Window.partitionBy(keys.map(col): _*).orderBy(time)
    val rolled = winReducer match {
      case "sum" => sum(v).over(w); case "mean" => avg(v).over(w)
      case "max" => max(v).over(w); case "min" => min(v).over(w)
      case other => throw new IllegalArgumentException(s"bad reducer: $other")
    }
    // only full windows qualify (min_periods = window in the reference)
    val df2 = df.withColumn("_rolled",
      when(row_number().over(wn) >= window, rolled))
    val red = periodReducer match {
      case "max" => max(col("_rolled")); case "min" => min(col("_rolled"))
      case "mean" => avg(col("_rolled")); case "sum" => sum(col("_rolled"))
      case other => throw new IllegalArgumentException(s"bad reducer: $other")
    }
    resampleOp(df2, keys, time, freq, Seq(red.as(as)))
  }

  /** spell_length_statistics over a spell_mask condition (generic.py:589,
    * :434): statistics of run lengths of
    * rows meeting `cond`, per period (runs break at period bounds —
    * resample-before-rl default). */
  def spellLengthStatistics(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                            cond: Column, reducer: String, window: Int = 1): DataFrame =
    Runs.rleStatistics(df, keys, Some(Time.resamplePeriod(time, freq)), time, cond,
        reducer, window)
      .withColumnRenamed("_period", "period")

  /** interday_diurnal_temperature_range-style lag-difference statistic
    * (generic.py:1360): mean |v - lag(v)| per period. */
  def lagDiffStat(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                  v: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(time)
    val d = abs(v - lag(v, 1).over(w))
    resampleOp(df.withColumn("_d", d), keys, time, freq, Seq(avg(col("_d")).as(as)))
  }

  /** extreme_temperature_range (generic.py:1388): max(vmax) - min(vmin). */
  def extremeRange(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                   vmax: Column, vmin: Column, as: String = "etr"): DataFrame =
    resampleOp(df, keys, time, freq, Seq((max(vmax) - min(vmin)).as(as)))

  /** aggregate_between_dates (generic.py:1417): reduction over a doy window
    * inside each period. */
  def aggregateBetweenDoys(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                           v: Column, doyStart: Int, doyEnd: Int, reducer: String,
                           as: String): DataFrame = {
    val inWindow = Time.Select.doyBounds(time, doyStart, doyEnd)
    thresholdedStat(df, keys, time, freq, v, inWindow, reducer, as)
  }

  /** aggregate_between_dates (generic.py:1417) with PER-ENTITY doy bounds:
    * the bounds table (keys, start_doy, end_doy) — typically season bounds
    * computed from another variable — broadcast-joins onto the daily frame
    * and gates the aggregation. Covers the reference's DataArray-valued
    * `start`/`end` arguments (per-location arrays), which the scalar
    * [[aggregateBetweenDoys]] cannot. */
  def aggregateBetweenDates(df: DataFrame, bounds: DataFrame, joinKeys: Seq[String],
                            groupKeys: Seq[String], time: Column, v: Column,
                            reducer: String, as: String): DataFrame = {
    val joined = df.join(broadcast(bounds), joinKeys)
    val inWin = dayofyear(time) >= col("start_doy") && dayofyear(time) <= col("end_doy")
    val red: Column = reducer match {
      case "sum"   => sum(when(inWin, v))
      case "mean"  => avg(when(inWin, v))
      case "max"   => max(when(inWin, v))
      case "min"   => min(when(inWin, v))
      case "count" => coalesce(sum(when(inWin, 1L)), lit(0L))
      case other   => throw new IllegalArgumentException(s"bad reducer: $other")
    }
    joined.groupBy(groupKeys.map(col): _*).agg(red.as(as))
  }

  /** detrend deg-2 (generic.py:1711 `detrend` with polyfit degree 2):
    * closed-form quadratic least squares y = a + b x + c x² from the
    * normal-equation moment sums, solved with Cramer's rule — one
    * hash-agg, no UDAF, no collect. `x` and `yQuantized` must be
    * integer-valued columns (cast your float y to fixed-point first):
    * integer moments aggregate EXACTLY, so the fit is bit-stable
    * under partial-aggregation order — the property that makes it
    * oracle-hashable and deterministic across cluster sizes.
    *
    * Overflow safety: per-row products stay in LONG (exact for
    * |x| <= 55_000 — i.e. x⁴ < 2⁶³ — which covers 150 years of daily
    * steps), but the SUMS accumulate in decimal(38,0): a 30-year daily
    * series has per-row x⁴ ≈ 1.4e16, so a few thousand rows would
    * silently wrap a LONG sum, while decimal matches the oracle's
    * HUGEINT promotion exactly. */
  def quadraticFit(df: DataFrame, keys: Seq[String], x: Column,
                   yQuantized: Column): DataFrame = {
    val xl = x.cast("long"); val yl = yQuantized.cast("long")
    def dsum(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val moments = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("s0"),
      dsum(xl).as("s1"), dsum(xl * xl).as("s2"),
      dsum(xl * xl * xl).as("s3"), dsum(xl * xl * xl * xl).as("s4"),
      dsum(yl).as("t0"), dsum(xl * yl).as("t1"), dsum(xl * xl * yl).as("t2"))
    // Cramer on the 3x3 normal matrix [[s0,s1,s2],[s1,s2,s3],[s2,s3,s4]]
    def d(a: Column, b: Column, c: Column, e: Column, f: Column, g: Column,
          h: Column, i: Column, j: Column): Column =
      a * (f * j - g * i) - b * (e * j - g * h) + c * (e * i - f * h)
    val (s0, s1, s2, s3, s4) = (col("s0").cast("double"), col("s1").cast("double"),
      col("s2").cast("double"), col("s3").cast("double"), col("s4").cast("double"))
    val (t0, t1, t2) = (col("t0").cast("double"), col("t1").cast("double"),
      col("t2").cast("double"))
    val det = d(s0, s1, s2, s1, s2, s3, s2, s3, s4)
    moments.select((keys.map(col) :+
      (d(t0, s1, s2, t1, s2, s3, t2, s3, s4) / det).as("a") :+
      (d(s0, t0, s2, s1, t1, s3, s2, t2, s4) / det).as("b") :+
      (d(s0, s1, t0, s1, s2, t1, s2, s3, t2) / det).as("c")): _*)
  }

  /** temperature_sum (generic.py:1324): sum of (v − threshold) over days
    * meeting the condition, negated for below-threshold sums so the result
    * is always a positive accumulation. */
  def temperatureSum(df: DataFrame, keys: Seq[String], time: Column, freq: String,
                     v: Column, op: String, thr: Column, as: String): DataFrame = {
    val sign = if (op.startsWith("<")) -1.0 else 1.0
    resampleOp(df, keys, time, freq,
      Seq((coalesce(sum(when(compare(v, op, thr), v - thr)), lit(0.0)) * sign).as(as)))
  }

  /** get_zones (generic.py:1611): fixed-width binning of a value. */
  def zones(v: Column, binWidth: Double, origin: Double = 0.0): Column =
    floor((v - origin) / binWidth).cast("int")

  /** Densify a per-entity daily series over a fixed date range, so that
    * calendar gaps become explicit rows (value null) and break runs.
    * `sequence` + explode; entities frame should be small-ish or derived by
    * distinct over keys. */
  def densifyDaily(df: DataFrame, keys: Seq[String], dateCol: String,
                   start: String, end: String): DataFrame = {
    val days = df.sparkSession.range(1).select(explode(sequence(
      to_date(lit(start)), to_date(lit(end)))).as(dateCol))
    val entities = df.select(keys.map(col): _*).distinct()
    entities.crossJoin(days)
      .join(df, keys :+ dateCol, "left")
  }
}
