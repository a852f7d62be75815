package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Non-standard CF calendars (`xclim/core/calendar.py:138` `get_calendar`,
  * `:264` `convert_doy`, `:690` `adjust_doy_calendar`): noleap (365_day),
  * all_leap (366_day) and 360_day.
  *
  * Spark's TimestampType is proleptic-Gregorian only, so non-standard
  * calendars are carried as companion `(year INT, doy INT)` columns plus a
  * calendar tag in column metadata (SURVEY §1.2) — Spark date functions are
  * never applied to them. All arithmetic below is pure Column math.
  */
object Calendars {

  val Standard = "standard"; val NoLeap = "noleap"; val AllLeap = "all_leap"; val Day360 = "360_day"

  def daysInYear(calendar: String, year: Column): Column = calendar match {
    case NoLeap  => lit(365)
    case AllLeap => lit(366)
    case Day360  => lit(360)
    case _       => when(isLeap(year), 366).otherwise(365)
  }

  def isLeap(year: Column): Column =
    (year % 4 === 0 && year % 100 =!= 0) || (year % 400 === 0)

  /** Month (1-12) from a doy under the calendar (360_day: 30-day months;
    * noleap/all_leap: fixed month tables via cumulative day offsets). */
  def monthFromDoy(calendar: String, doy: Column, year: Column): Column = calendar match {
    case Day360 => ((doy - 1) / 30).cast("int") + 1
    case _ =>
      val feb = calendar match {
        case NoLeap => lit(28); case AllLeap => lit(29)
        case _ => when(isLeap(year), 29).otherwise(28)
      }
      val cuts = Seq(lit(31), lit(31) + feb, lit(31) + feb + 31, lit(31) + feb + 61,
        lit(31) + feb + 92, lit(31) + feb + 122, lit(31) + feb + 153, lit(31) + feb + 184,
        lit(31) + feb + 214, lit(31) + feb + 245, lit(31) + feb + 275, lit(31) + feb + 306)
      // fold from December backwards so January's cut is the outermost test
      cuts.zipWithIndex.reverse.foldLeft(lit(12)) { case (acc, (cut, i)) =>
        when(doy <= cut, i + 1).otherwise(acc)
      }
  }

  /** convert_doy (calendar.py:264): linearly rescale a doy between two
    * calendars' year lengths (the reference's interpolation path for
    * 365<->366<->360 mapping). */
  def convertDoy(doy: Column, year: Column, from: String, to: String): Column = {
    val nFrom = daysInYear(from, year).cast("double")
    val nTo = daysInYear(to, year).cast("double")
    least(greatest(round((doy.cast("double") - 0.5) / nFrom * nTo + 0.5)
      .cast("int"), lit(1)), nTo.cast("int"))
  }

  /** Anchored-year period key on companion columns (the non-standard twin of
    * Time.resamplePeriod for YS[-MON]): returns the period's start year. */
  def anchoredYearNonStandard(calendar: String, year: Column, doy: Column,
                              anchorMonth: Int): Column = {
    val m = monthFromDoy(calendar, doy, year)
    when(m >= anchorMonth, year).otherwise(year - 1)
  }

  /** Decode parquet-style (year, doy) companions from integers encoded as
    * yyyyddd (a compact lake encoding for non-standard calendars). */
  def decodeYearDoy(encoded: Column): (Column, Column) =
    ((encoded / 1000).cast("int"), pmod(encoded, lit(1000)).cast("int"))
}
