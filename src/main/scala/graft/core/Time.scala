package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Anchored-calendar frequency algebra + resample-period assignment.
  *
  * Re-expression of the reference's offset handling
  * (`xclim/core/calendar.py:558` `parse_offset`, `:599` `construct_offset`)
  * as pure Catalyst `Column` expressions: every frequency maps a timestamp to
  * the period-start timestamp it belongs to, so resampling becomes
  * `df.groupBy(keys :+ resamplePeriod($"time", freq))` — a single hash-agg
  * shuffle that Catalyst plans with map-side partial aggregation. No UDFs:
  * everything stays inside whole-stage codegen, and (unlike Spark's
  * `window()`) month-based and anchored-year frequencies are supported.
  *
  * Scale note: period assignment is a stateless scalar expression, so it
  * pushes through any partitioning; the groupBy shuffle is keyed on
  * (entity keys, period) which at 100 TB distributes by entity — no skew
  * beyond the data's own key skew (salt upstream if one entity dominates).
  */
object Time {

  /** Parsed frequency: multiple × unit with optional month anchor.
    * Units: "h" hour, "D" day, "W" week, "MS" month-start, "QS" quarter-start,
    * "YS" year-start. Anchors only valid for QS/YS (e.g. YS-JUL, QS-DEC).
    */
  final case class Freq(n: Int, unit: String, anchor: Int) {
    require(n >= 1, s"freq multiple must be >= 1, got $n")
  }

  private val months = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val monthNum: Map[String, Int] = months.zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap

  private val FreqRe = """^(\d*)(h|H|D|W|MS|QS|YS|M|Q|Y|A|AS)(?:-([A-Z]{3}))?$""".r

  /** Parse a pandas-style offset string ("YS-JUL", "MS", "7D", "h", "W").
    * Mirrors `parse_offset` semantics (calendar.py:558-598); "M"/"Q"/"Y"/"A"
    * end-anchored aliases are normalised to their start-anchored period
    * (the period *identity* is the same; only label placement differs).
    */
  def parse(freq: String): Freq = freq match {
    case FreqRe(mult, unit, anchor) =>
      val n = if (mult == null || mult.isEmpty) 1 else mult.toInt
      val u = unit match {
        case "h" | "H"        => "h"
        case "D"              => "D"
        case "W"              => "W"
        case "MS" | "M"       => "MS"
        case "QS" | "Q"       => "QS"
        case "YS" | "Y" | "A" | "AS" => "YS"
      }
      val anch = Option(anchor) match {
        case Some(a) =>
          require(u == "QS" || u == "YS", s"anchor only valid for QS/YS: $freq")
          monthNum.getOrElse(a, throw new IllegalArgumentException(s"bad anchor month: $a"))
        case None => if (u == "QS" || u == "YS") 1 else 0
      }
      Freq(n, u, anch)
    case _ => throw new IllegalArgumentException(s"cannot parse freq: $freq")
  }

  private val epoch = to_date(lit("1970-01-01"))

  /** Period-start timestamp for `ts` under `freq`. Pure Column expression
    * (codegen'd, null-safe: null ts -> null period).
    *
    * Reference behaviour: xarray `resample(time=freq)` bin assignment for
    * start-anchored offsets (used by every index in SURVEY §2.2).
    */
  /** Approximate period length in seconds (the `compare_offsets` basis,
    * calendar.py:516: lengths for a period starting after 1970-01-01). */
  def approxSeconds(f: Freq): Long = {
    val unitSecs: Map[String, Long] = Map(
      "h" -> 3600L, "D" -> 86400L, "W" -> 7L * 86400L,
      "MS" -> 2678400L /* 31 d */, "QS" -> 7948800L /* 92 d */,
      "YS" -> 31536000L /* 365 d */)
    f.n * unitSecs(f.unit)
  }

  /** `compare_offsets` (calendar.py:516): compare two offset strings by
    * approximate length; same-unit offsets compare only multipliers
    * (QS-DEC == QS-JAN, MS < 2MS). */
  def compareOffsets(freqA: String, op: String, freqB: String): Boolean = {
    val (a, b) = (parse(freqA), parse(freqB))
    val (la, lb) =
      if (a.unit == b.unit) (a.n.toLong, b.n.toLong)
      else (approxSeconds(a), approxSeconds(b))
    op match {
      case ">" | "gt"  => la > lb
      case "<" | "lt"  => la < lb
      case ">=" | "ge" => la >= lb
      case "<=" | "le" => la <= lb
      case "==" | "eq" => la == lb
      case "!=" | "ne" => la != lb
      case other       => throw new IllegalArgumentException(s"bad op: $other")
    }
  }

  /** `is_offset_divisor` (calendar.py:629): a whole number of `divisor`
    * periods fit in one `offset` period AND their boundaries align.
    * Sub-monthly units divide by exact length; month-based units divide
    * when the month counts divide and the anchors align modulo the
    * divisor's width. */
  def isOffsetDivisor(divisor: String, offset: String): Boolean = {
    if (compareOffsets(divisor, ">", offset)) return false
    val (a, b) = (parse(divisor), parse(offset))
    val monthsOf = Map("MS" -> 1, "QS" -> 3, "YS" -> 12)
    (monthsOf.get(a.unit), monthsOf.get(b.unit)) match {
      case (Some(ma), Some(mb)) =>
        val wa = a.n * ma; val wb = b.n * mb
        // every period start of `offset` must land on a `divisor` boundary:
        // anchors congruent modulo the divisor width
        wb % wa == 0 && ((b.anchor - a.anchor) % wa + wa) % wa == 0
      case (Some(_), None) => false // month-based can't divide fixed-length
      case (None, Some(_)) =>
        // fixed-length divisor under a month-based offset: only exact-day
        // units divide every possible month length (h and D do; W doesn't)
        a.unit == "h" && 24 % a.n == 0 || a.unit == "D" && a.n == 1
      case (None, None) =>
        approxSeconds(b) % approxSeconds(a) == 0
    }
  }

  def resamplePeriod(ts: Column, freq: String): Column = {
    val f = parse(freq)
    f match {
      case Freq(1, "h", _)  => date_trunc("HOUR", ts)
      case Freq(n, "h", _)  =>
        // n-hourly: integer epoch arithmetic (no string round-trip, no
        // session-timezone dependence — DST-safe for multi-hour buckets)
        val hrs = floor(unix_timestamp(ts).cast("double") / 3600d)
        timestamp_seconds((floor(hrs / n) * n).cast("long") * 3600L)
      case Freq(1, "D", _)  => date_trunc("DAY", ts)
      case Freq(n, "D", _)  =>
        val days = datediff(ts.cast("date"), epoch)
        date_add(epoch, (floor(days.cast("double") / n) * n).cast("int")).cast("timestamp")
      case Freq(1, "W", _)  => date_trunc("WEEK", ts) // ISO Monday start
      case Freq(n, "W", _)  =>
        // n-weekly, Monday-anchored: 1970-01-05 is a Monday
        val mon0 = to_date(lit("1970-01-05"))
        val wks = floor(datediff(ts.cast("date"), mon0).cast("double") / (7.0 * n))
        date_add(mon0, (wks * 7 * n).cast("int")).cast("timestamp")
      case Freq(1, "MS", _) => date_trunc("MONTH", ts)
      case Freq(n, "MS", _) => monthBucket(ts, n, 1)
      case Freq(1, "QS", a) => monthBucket(ts, 3, a)
      case Freq(n, "QS", a) => monthBucket(ts, 3 * n, a)
      case Freq(1, "YS", 1) => date_trunc("YEAR", ts)
      case Freq(1, "YS", a) => anchoredYear(ts, a)
      case Freq(n, "YS", a) =>
        // n-yearly anchored: bucket anchored-year starts by n from epoch year 1970
        val startY = when(month(ts) >= a, year(ts)).otherwise(year(ts) - 1)
        val y = (floor((startY - 1970).cast("double") / n) * n).cast("int") + 1970
        make_timestamp(y, lit(a), lit(1), lit(0), lit(0), lit(0))
      case other => throw new IllegalArgumentException(s"unsupported freq: $other")
    }
  }

  /** Anchored-year start: YS-<mon>. Rows in months >= anchor belong to the
    * period starting (year, anchor); earlier months to (year-1, anchor). */
  private def anchoredYear(ts: Column, anchorMonth: Int): Column = {
    val y = when(month(ts) >= anchorMonth, year(ts)).otherwise(year(ts) - 1)
    make_timestamp(y, lit(anchorMonth), lit(1), lit(0), lit(0), lit(0))
  }

  /** Bucket by `widthMonths` months anchored so a period starts at month
    * `anchorMonth` (covers MS multiples and QS[-MON]). */
  private def monthBucket(ts: Column, widthMonths: Int, anchorMonth: Int): Column = {
    val msc = year(ts) * 12 + (month(ts) - 1)          // months since year 0
    val rel = msc - (anchorMonth - 1)
    val start = (floor(rel.cast("double") / widthMonths) * widthMonths).cast("int") + (anchorMonth - 1)
    make_timestamp((start / 12).cast("int"), pmod(start, lit(12)) + 1, lit(1), lit(0), lit(0), lit(0))
  }

  /** Exclusive period end (= next period start). With `resamplePeriod` this
    * gives `time_bnds` (calendar.py:793). */
  def periodEnd(periodStart: Column, freq: String): Column = {
    val f = parse(freq)
    f.unit match {
      case "h"  => periodStart + expr(s"INTERVAL ${f.n} HOUR")
      case "D"  => periodStart + expr(s"INTERVAL ${f.n} DAY")
      case "W"  => periodStart + expr(s"INTERVAL ${7 * f.n} DAY")
      case "MS" => add_months(periodStart, f.n).cast("timestamp")
      case "QS" => add_months(periodStart, 3 * f.n).cast("timestamp")
      case "YS" => add_months(periodStart, 12 * f.n).cast("timestamp")
    }
  }

  /** Expected number of base-freq steps inside each period of `freq`
    * (missing.py:64-160 `expected_count`, daily base). */
  def expectedDays(periodStart: Column, freq: String): Column =
    datediff(periodEnd(periodStart, freq).cast("date"), periodStart.cast("date"))

  /** `expected_count` WITH a select_time indexer (missing.py:117-150): the
    * number of calendar days inside [periodStart, periodEnd) matching the
    * indexer predicate. A generated day-sequence + higher-order filter —
    * leap years and wrap-around windows fall out of the calendar itself,
    * exactly as the reference's dummy-time-axis count does. Interpreted
    * array expression, but it runs on per-period AGGREGATE rows (one
    * bounded array per period, never per observation), so the cost is a
    * few hundred elements × periods. */
  def expectedDaysSelected(periodStart: Column, freq: String,
                           pred: Column => Column): Column =
    size(filter(
      sequence(periodStart.cast("date"),
        date_sub(periodEnd(periodStart, freq).cast("date"), 1)),
      d => pred(d)))

  /** Day-of-year column (standard calendar). Non-standard calendars carry
    * companion (year, doy) columns instead — see SURVEY §1.2. */
  def dayOfYear(ts: Column): Column = dayofyear(ts)

  /** `add_season_coord` (calendar.py): the meteorological season label of
    * a timestamp (DJF/MAM/JJA/SON). */
  def seasonCoord(ts: Column): Column = {
    val m = month(ts)
    when(m.isin(12, 1, 2), "DJF").when(m.isin(3, 4, 5), "MAM")
      .when(m.isin(6, 7, 8), "JJA").otherwise("SON")
  }

  /** `split_time_to_season_year` (calendar.py): the season-anchored year —
    * DECEMBER belongs to the FOLLOWING year's DJF (the QS-DEC convention),
    * every other month keeps its calendar year. Grouping by
    * (seasonYear, seasonCoord) reproduces season resampling without date
    * arithmetic downstream. */
  def seasonYear(ts: Column): Column =
    when(month(ts) === 12, year(ts) + 1).otherwise(year(ts))

  /** `doy_to_days_since` / `days_since_to_doy` (calendar.py): day-of-year
    * values re-based onto days since a period anchor and back. Pure
    * datediff arithmetic; the anchor is the period start the caller
    * already has (resamplePeriod output). */
  def doyToDaysSince(doy: Column, yr: Column, anchor: Column): Column =
    datediff(to_date(concat(yr, lit("-01-01"))), anchor.cast("date")) + doy - 1
  def daysSinceToDoy(days: Column, anchor: Column): Column =
    dayofyear(date_add(anchor.cast("date"), days.cast("int")))

  /** `select_time` indexer predicates (calendar.py:1259-1376). */
  /** select_time indexers incl. index_of_date-style doy/date predicates
    * (calendar.py:1259). */
  object Select {
    /** Month-list subset, e.g. months=Seq(12,1,2) for DJF. */
    def months(ts: Column, ms: Seq[Int]): Column = month(ts).isin(ms.map(Integer.valueOf): _*)

    /** Season shorthand. */
    def season(ts: Column, s: String): Column = {
      val m = s.toUpperCase match {
        case "DJF" => Seq(12, 1, 2)
        case "MAM" => Seq(3, 4, 5)
        case "JJA" => Seq(6, 7, 8)
        case "SON" => Seq(9, 10, 11)
        case other => throw new IllegalArgumentException(s"bad season: $other")
      }
      months(ts, m)
    }

    /** Doy-bounds subset with wrap-around (e.g. (300, 60) spans new year). */
    def doyBounds(ts: Column, start: Int, end: Int): Column = {
      val d = dayofyear(ts)
      if (start <= end) d >= start && d <= end else d >= start || d <= end
    }

    /** Calendar date bounds as "MM-DD" strings, wrap-around allowed. */
    def dateBounds(ts: Column, start: String, end: String): Column = {
      val mmdd = date_format(ts, "MM-dd")
      if (start <= end) mmdd >= start && mmdd <= end else mmdd >= start || mmdd <= end
    }
  }
}
