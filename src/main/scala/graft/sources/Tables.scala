package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table readers for the engine's lake layout: one directory per
  * scale factor, one parquet file/dir per table.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects. We read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-divide to
  * microseconds — the same ns->us flooring DuckDB applies — so both engines
  * see identical timestamps. The cast is a codegen'd scalar on the scan
  * output; predicate pushdown on other columns is unaffected.
  */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` normalised to a microsecond TIMESTAMP. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    // integer `div`, NOT `/`: long/long in Spark SQL is double division and
    // ns-since-epoch exceeds 2^53, so `/` would corrupt the low microseconds
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
