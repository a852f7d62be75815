package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CF time-coordinate decode — `units = "<step> since <epoch>"` plus a
  * `calendar` attribute, the encoding xarray/netCDF write for every time
  * axis (CF conventions §4.4; the reference reaches time through
  * `xr.decode_cf`, `/root/reference/src/xclim/core/calendar.py` consumes
  * the decoded axis). Two decode targets, matching the engine's calendar
  * model:
  *
  *   - standard / gregorian / proleptic_gregorian (or no calendar attr):
  *     value × step → exact microseconds added to the epoch instant →
  *     TIMESTAMP. Integer-stored times stay exact end to end; float
  *     times round to the nearest microsecond with one deterministic
  *     `floor(v·step + 0.5)` (both engines replay it bit-identically).
  *     2^53 guard: |v·step| as a double is exact for int64 inputs until
  *     ~year 2255 at second resolution — far past any CF dataset.
  *
  *   - noleap/365_day, all_leap/366_day, 360_day: Spark date types can't
  *     carry these, so the decode emits the engine's companion-column
  *     form (SURVEY §1.2, [[graft.core.Calendars]]): `year` INT, `doy`
  *     INT (1-based) and `us_of_day` LONG, computed in exact integer
  *     arithmetic from the epoch date interpreted IN that calendar
  *     (fixed year lengths make this closed-form — no table walk).
  *
  *   - julian: every 4th year leap, CENTURIES INCLUDED (1900 is a leap
  *     year here) — again not a Spark date calendar, so it decodes to
  *     the same (`year`, `doy`, `us_of_day`) companion form. Year
  *     lengths vary, but the 4-year cycle (1461 days) is fixed, so the
  *     split stays closed-form exact integer arithmetic: no table walk.
  *
  * Out of scope, rejected loudly: non-zero UTC offsets in the epoch
  * string, and julian dates before year 1 (no canonical CF meaning). */
object CfTime {

  private val stepMicros: Map[String, Long] = Map(
    "microseconds" -> 1L, "microsecond" -> 1L, "us" -> 1L,
    "milliseconds" -> 1000L, "millisecond" -> 1000L, "ms" -> 1000L,
    "seconds" -> 1000000L, "second" -> 1000000L, "sec" -> 1000000L, "s" -> 1000000L,
    "minutes" -> 60000000L, "minute" -> 60000000L, "min" -> 60000000L,
    "hours" -> 3600000000L, "hour" -> 3600000000L, "hr" -> 3600000000L, "h" -> 3600000000L,
    "days" -> 86400000000L, "day" -> 86400000000L, "d" -> 86400000000L)

  private val usPerDay = 86400000000L

  /** (step micros, epoch year, month, day, micros-of-day). The epoch is
    * parsed STRUCTURALLY (y-m-d [h:m:s[.f]] [Z|UTC|+00[:00]]) so it can
    * be interpreted under a non-standard calendar too. */
  final case class Units(step: Long, year: Int, month: Int, day: Int,
                         usOfDay: Long)

  private val UnitsRe =
    ("""^\s*([A-Za-z]+)\s+since\s+(-?\d{1,5})-(\d{1,2})-(\d{1,2})""" +
      """(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,9}))?)?)?""" +
      """\s*(Z|UTC|\+0+(?::0+)?)?\s*$""").r

  def parseUnits(units: String): Units = units match {
    case UnitsRe(u, y, mo, d, h, mi, s, frac, _) =>
      val step = stepMicros.getOrElse(u.toLowerCase,
        throw new IllegalArgumentException(
          s"CF unit '$u' unsupported (us/ms/seconds/minutes/hours/days)"))
      def i(v: String): Int = Option(v).map(_.toInt).getOrElse(0)
      val fracUs = Option(frac).map(f => (f + "0" * 6).take(6).toLong).getOrElse(0L)
      val us = (i(h) * 3600L + i(mi) * 60L + i(s)) * 1000000L + fracUs
      Units(step, y.toInt, mo.toInt, d.toInt, us)
    case other => throw new IllegalArgumentException(
      s"unparseable CF time units '$other' (expected '<step> since <date>'" +
        "; non-zero UTC offsets are unsupported)")
  }

  /** True for the calendars whose instants are plain TIMESTAMPs. */
  def isStandardCalendar(c: String): Boolean = canonCalendar(c) == "standard"

  /** Validate a calendar name (loud on unknown), returning its canonical
    * form — the write-path guard: an exporter interpolating a typo'd
    * calendar into store metadata would otherwise only fail at read
    * time. */
  def validateCalendar(c: String): String = canonCalendar(c)

  private def canonCalendar(c: String): String = c.toLowerCase match {
    case "standard" | "gregorian" | "proleptic_gregorian" | "" => "standard"
    case "noleap" | "365_day"  => "noleap"
    case "all_leap" | "366_day" => "all_leap"
    case "360_day" => "360_day"
    case "julian" => "julian"
    case other => throw new IllegalArgumentException(
      s"CF calendar '$other' unsupported " +
        "(standard/proleptic_gregorian/noleap/all_leap/360_day/julian)")
  }

  /** Absolute day number of a julian-calendar date, counted from julian
    * 0001-01-01 = day 0. Leap years are exactly the multiples of 4
    * (centuries included — the rule that separates julian from
    * Gregorian; cftime's DatetimeJulian implements the same count). */
  private def julianAbsDay(year: Int, month: Int, day: Int): Long = {
    require(year >= 1, s"julian epoch year $year < 1 unsupported")
    val feb = if (year % 4 == 0) 29 else 28
    val lens = Array(31, feb, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    require(month >= 1 && month <= 12 && day >= 1 && day <= lens(month - 1),
      s"invalid julian date $year-$month-$day")
    365L * (year - 1) + (year - 1) / 4 +
      lens.take(month - 1).map(_.toLong).sum + (day - 1)
  }

  private def yearDays(cal: String): Long =
    cal match { case "noleap" => 365L; case "all_leap" => 366L; case _ => 360L }

  /** Day-of-year (1-based) of a y-m-d date under a fixed-length calendar. */
  private def fixedDoy(cal: String, month: Int, day: Int): Long = cal match {
    case "360_day" => (month - 1) * 30L + day
    case _ =>
      val feb = if (cal == "all_leap") 29 else 28
      val lens = Array(31, feb, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
      lens.take(month - 1).sum.toLong + day
  }

  // ---------------- encode (the export half) ----------------

  /** ENCODE a TIMESTAMP column as CF offsets under a standard calendar
    * — the inverse of [[decode]]'s standard branch. Exact-integer
    * discipline: the offset must be a whole number of steps
    * (assert_true, loud) — a fractional encode would round and break
    * the round trip; callers pick finer units instead. NULLs pass. */
  def encodeStandard(time: Column, units: String): Column = {
    val u = parseUnits(units)
    val epochUs = java.time.LocalDateTime
      .of(u.year, u.month, u.day, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L + u.usOfDay
    // NTZ columns cast to TIMESTAMP first (identity under the engine's
    // pinned UTC session zone; unix_micros only accepts TIMESTAMP)
    val diff = unix_micros(time.cast("timestamp")) - lit(epochUs)
    val exact = coalesce(pmod(diff, lit(u.step)) === 0, lit(true))
    when(assert_true(exact, lit(s"CF encode: timestamp not a whole " +
      s"number of '$units' steps — pick finer units")).isNull,
      intDiv(diff, u.step))
  }

  /** Integral division (SQL `div`) — a double-routed `/` would lose
    * exactness past 2^53 µs (~year 2255 territory for the micros sums
    * the encoders produce). */
  private def intDiv(c: Column, n: Long): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(n)))
  }

  /** ENCODE companion columns (year, doy, us_of_day) as CF offsets
    * under a fixed-length or julian calendar — the inverse of
    * [[decode]]'s non-standard branches. Same whole-steps discipline. */
  def encodeNonStandard(year: Column, doy: Column, usOfDay: Column,
                        units: String, calendar: String): Column = {
    val u = parseUnits(units)
    val cal = canonCalendar(calendar)
    require(cal != "standard",
      "encodeNonStandard is for fixed-length/julian calendars — " +
        "use encodeStandard for timestamps")
    val absUs = cal match {
      case "julian" =>
        // days before a julian year, columnar: 365(y−1) + ⌊(y−1)/4⌋
        val ym1 = year.cast("long") - 1L
        val daysBefore = lit(365L) * ym1 +
          (ym1 - pmod(ym1, lit(4L))) / lit(4L)
        (daysBefore.cast("long") + doy.cast("long") - 1L) * lit(usPerDay) +
          usOfDay.cast("long") -
          lit(julianAbsDay(u.year, u.month, u.day) * usPerDay + u.usOfDay)
      case c =>
        val yl = yearDays(c)
        val baseUs = (fixedDoy(c, u.month, u.day) - 1L) * usPerDay + u.usOfDay
        (year.cast("long") - u.year) * lit(yl * usPerDay) +
          (doy.cast("long") - 1L) * lit(usPerDay) +
          usOfDay.cast("long") - lit(baseUs)
    }
    val exact = coalesce(pmod(absUs, lit(u.step)) === 0, lit(true))
    when(assert_true(exact, lit(s"CF encode: instant not a whole " +
      s"number of '$units' steps — pick finer units")).isNull,
      intDiv(absUs, u.step))
  }

  /** Decode `valueCol` (the CF-encoded number) of `df` in place:
    * standard calendars replace it with `time` TIMESTAMP; fixed-length
    * calendars replace it with (`year`, `doy`, `us_of_day`). NULL
    * values (masked fills) stay NULL. A pre-existing `time` column —
    * the usual name of the coordinate's own POSITIONAL index — is
    * renamed `time_idx` so the decoded axis takes the canonical name
    * (mirroring xarray, where decode_cf replaces the coordinate's
    * values). */
  def decode(df0: DataFrame, valueCol: String, units: String,
             calendar: String): DataFrame = {
    val df = if (df0.columns.contains("time") && valueCol != "time")
      df0.withColumnRenamed("time", "time_idx") else df0
    val u = parseUnits(units)
    val v = col(valueCol)
    // one deterministic float→micros rounding; exact for integer inputs
    val relUs = floor(v * lit(u.step.toDouble) + lit(0.5)).cast("long")
    canonCalendar(calendar) match {
      case "standard" =>
        val epochUs = java.time.LocalDateTime
          .of(u.year, u.month, u.day, 0, 0)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L + u.usOfDay
        df.withColumn("time", timestamp_micros(relUs + lit(epochUs)))
          .drop(valueCol)
      case "julian" =>
        // absolute julian day = epoch's day + the offset's whole days;
        // the 4-year cycle (3×365 + 366 = 1461 days, leap LAST) splits
        // exactly: cycle index, then year-in-cycle by capped division
        // (days 1095..1460 all belong to year index 3, the leap year)
        val epochDay = julianAbsDay(u.year, u.month, u.day)
        df.withColumn("__us", relUs + lit(u.usOfDay))
          .withColumn("__day",
            expr(s"(__us - pmod(__us, $usPerDay)) div $usPerDay") + lit(epochDay))
          .withColumn("__day", // NULL values (masked fills) must pass
            when(assert_true(coalesce(col("__day") >= 0, lit(true)),
              lit("julian decode: date before year 1")).isNull, col("__day")))
          .withColumn("__r", pmod(col("__day"), lit(1461L)))
          .withColumn("__yi", least(lit(3L),
            expr("(__r - pmod(__r, 365)) div 365")))
          .withColumn("year", (lit(1L) +
            lit(4L) * expr("(__day - pmod(__day, 1461)) div 1461") +
            col("__yi")).cast("int"))
          .withColumn("doy",
            (col("__r") - lit(365L) * col("__yi") + 1).cast("int"))
          .withColumn("us_of_day", pmod(col("__us"), lit(usPerDay)))
          .drop(valueCol, "__us", "__day", "__r", "__yi")
      case cal =>
        val yl = yearDays(cal)
        // micros since (epochYear, doy 1, 00:00) in the fixed calendar;
        // `div`/pmod keep the split exact on Longs (incl. negatives —
        // pre-epoch dates carry into earlier years correctly)
        val baseUs = (fixedDoy(cal, u.month, u.day) - 1L) * usPerDay + u.usOfDay
        df.withColumn("__us", relUs + lit(baseUs))
          .withColumn("__day", expr(s"(__us - pmod(__us, $usPerDay)) div $usPerDay"))
          .withColumn("year",
            (lit(u.year) + expr(s"(__day - pmod(__day, $yl)) div $yl")).cast("int"))
          .withColumn("doy", (pmod(col("__day"), lit(yl)) + 1).cast("int"))
          .withColumn("us_of_day", pmod(col("__us"), lit(usPerDay)))
          .drop(valueCol, "__us", "__day")
    }
  }
}
