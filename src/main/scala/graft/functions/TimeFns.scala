package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OSL time marshals re-expressed as Catalyst column expressions.
  *
  * Reference semantics: `src/queryinterpreter.cpp:1283-1348` (span
  * conversions + date parts), `src/queryparserosl.h:378-444` (compile-time
  * time literals; months = 31 days, years = 365 days exactly). All stamps are
  * epoch milliseconds (`src/grid.cpp:1217-1220`).
  */
object TimeFns {

  // ---- time literals (compile-time constants in the reference) ----
  val SecondMs: Long = 1000L
  val MinuteMs: Long = 60 * SecondMs
  val HourMs: Long   = 60 * MinuteMs
  val DayMs: Long    = 24 * HourMs
  val WeekMs: Long   = 7 * DayMs
  val MonthMs: Long  = 31 * DayMs  // reference uses 31 days exactly
  val YearMs: Long   = 365 * DayMs // reference uses 365 days exactly

  def seconds(n: Long): Long = n * SecondMs
  def minutes(n: Long): Long = n * MinuteMs
  def hours(n: Long): Long   = n * HourMs
  def days(n: Long): Long    = n * DayMs
  def weeks(n: Long): Long   = n * WeekMs

  // ---- span conversions (truncating integer division, like the reference) ----
  def toSeconds(ms: Column): Column = (ms / SecondMs).cast("long")
  def toMinutes(ms: Column): Column = (ms / MinuteMs).cast("long")
  def toHours(ms: Column): Column   = (ms / HourMs).cast("long")
  def toDays(ms: Column): Column    = (ms / DayMs).cast("long")
  def toWeeks(ms: Column): Column   = (ms / WeekMs).cast("long")

  /** Epoch-millis Long → TimestampType (µs precision; safe: ms*1000 < 2^63). */
  def msToTs(ms: Column): Column = timestamp_millis(ms)

  /** TimestampType → epoch millis. */
  def tsToMs(ts: Column): Column = unix_millis(ts)

  // ---- date parts (UTC; match DuckDB oracle conventions) ----
  def getSecond(ms: Column): Column     = second(msToTs(ms))
  def getMinute(ms: Column): Column     = minute(msToTs(ms))
  def getHour(ms: Column): Column       = hour(msToTs(ms))
  def getMonth(ms: Column): Column      = month(msToTs(ms))
  def getQuarter(ms: Column): Column    = quarter(msToTs(ms))
  def getYear(ms: Column): Column       = year(msToTs(ms))
  /** 1 = Sunday … 7 = Saturday (Spark convention; DuckDB `dayofweek+1`). */
  def getDayOfWeek(ms: Column): Column  = dayofweek(msToTs(ms))
  def getDayOfMonth(ms: Column): Column = dayofmonth(msToTs(ms))
  def getDayOfYear(ms: Column): Column  = dayofyear(msToTs(ms))

  // ---- date truncation, back to epoch millis ----
  private def trunc(unit: String, ms: Column): Column = tsToMs(date_trunc(unit, msToTs(ms)))
  def startOfSecond(ms: Column): Column  = trunc("second", ms)
  def startOfMinute(ms: Column): Column  = trunc("minute", ms)
  def startOfHour(ms: Column): Column    = trunc("hour", ms)
  def startOfDay(ms: Column): Column     = trunc("day", ms)
  def startOfWeek(ms: Column): Column    = trunc("week", ms)
  def startOfMonth(ms: Column): Column   = trunc("month", ms)
  def startOfQuarter(ms: Column): Column = trunc("quarter", ms)
  def startOfYear(ms: Column): Column    = trunc("year", ms)

  /** OSL `bucket(v, size)`: floor to multiple of `size`
    * (`src/queryinterpreter.cpp:482-…`). Works for numeric columns. */
  def bucket(v: Column, size: Column): Column = floor(v / size) * size
  def bucket(v: Column, size: Double): Column = bucket(v, lit(size))

  /** ISO8601 string → epoch millis (`iso8601_to_stamp`). */
  def iso8601ToStamp(s: Column): Column = unix_millis(to_timestamp(s))
}
