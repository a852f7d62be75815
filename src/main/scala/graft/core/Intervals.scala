package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded INTERVAL-OVERLAP JOIN — the range join Spark has no native
  * operator for: all pairs (a, b) sharing `keys` with
  * `a.start < b.end AND b.start < a.end` (half-open [start, end)
  * intervals on an integer axis — epoch micros, positions, offsets).
  *
  * A direct theta-join is a per-key nested loop — O(|A|·|B|) within
  * every key group, hopeless when a key holds millions of intervals.
  * Banding makes it an EQUI-join: every interval explodes into the
  * fixed-width bins it touches (≤ len/band + 1 rows), the join key
  * becomes (keys…, bin), and the exact predicate filters the
  * candidates. A pair that overlaps across several bins would emit
  * once per shared bin, so the canonical-bin filter keeps only the bin
  * containing the OVERLAP'S LEFT EDGE max(a.start, b.start) — each
  * pair survives exactly once with NO distinct shuffle (the standard
  * dedup-free banding trick; cf. the interval-join literature and
  * Spark's own range-join hints in Databricks runtime).
  *
  * Scale shape: the only shuffle is the equi-join on (keys…, bin);
  * band width trades explode factor (long intervals) against bin
  * population (short dense intervals) — set it near the median
  * interval length. 100 TB-safe: nothing quadratic, skew bounded by
  * the densest (key, bin) cell, which salting handles like any hot
  * equi-key. */
object Intervals {

  /** `a`/`b` must carry `keys`, `startCol`, `endCol` (LONG, end
    * exclusive, end > start enforced columnar) plus any payload;
    * output columns are the join keys, then a's columns prefixed
    * `a_`, then b's prefixed `b_`, plus `overlap_len`. */
  def overlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
                  startCol: String, endCol: String,
                  band: Long): DataFrame = {
    require(band >= 1, s"band width must be >= 1, got $band")
    // internal working names — a caller column with either name would
    // be silently overwritten (same convention as Robots.schedule /
    // Sampling.weightedSample)
    Seq(a -> "a", b -> "b").foreach { case (df, side) =>
      Seq("_bin", "overlap_len").foreach { c =>
        require(!df.columns.contains(c),
          s"overlapJoin reserves column name '$c' (present on input $side)")
      }
    }
    def floorDiv(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(band))) / lit(band)).cast("long")
    def prep(df: DataFrame, p: String): DataFrame = {
      val payload = df.columns.filterNot(keys.contains)
      val guard = when(assert_true(col(endCol) > col(startCol),
        lit(s"overlapJoin needs $endCol > $startCol")).isNull,
        col(startCol))
      df.withColumn(startCol, guard)
        .select(keys.map(col) ++ payload.map(c => col(c).as(s"$p$c")): _*)
        .withColumn("_bin", explode(sequence(
          floorDiv(col(s"$p$startCol")),
          floorDiv(col(s"$p$endCol") - 1))))
    }
    val pa = prep(a, "a_")
    val pb = prep(b, "b_")
    pa.join(pb, keys :+ "_bin")
      .filter(col(s"a_$startCol") < col(s"b_$endCol") &&
        col(s"b_$startCol") < col(s"a_$endCol"))
      // canonical bin: the one holding the overlap's left edge — every
      // overlapping pair survives exactly once, no distinct needed
      .filter(col("_bin") ===
        floorDiv(greatest(col(s"a_$startCol"), col(s"b_$startCol"))))
      .drop("_bin")
      .withColumn("overlap_len",
        least(col(s"a_$endCol"), col(s"b_$endCol")) -
          greatest(col(s"a_$startCol"), col(s"b_$startCol")))
  }
}
