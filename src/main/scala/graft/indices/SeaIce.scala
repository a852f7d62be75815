package graft.indices

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sea-ice metrics (`xclim/indices/_threshold.py:3058 sea_ice_area`, :3097
  * `sea_ice_extent`): weighted spatial aggregations over a (cell, time)
  * concentration grid.
  *
  *  - area   = sum(siconc * areacello) over cells with siconc >= thresh
  *  - extent = sum(areacello)          over cells with siconc >= thresh
  *
  * One map-side-combinable hash-agg keyed on the period — the canonical
  * "weighted reduction over a huge grid" shape: no window, no join, scales
  * linearly with grid cells at 100 TB.
  */
object SeaIce {

  /** Per-period sea-ice area and extent. `siconc` is a 0-1 fraction,
    * `area` the cell area (any unit); `thresh` defaults to the reference's
    * 15% concentration cutoff. */
  def seaIce(df: DataFrame, periodKeys: Seq[String], siconc: Column, area: Column,
             thresh: Double = 0.15): DataFrame =
    df.groupBy(periodKeys.map(col): _*)
      .agg(
        coalesce(sum(when(siconc >= thresh, siconc * area)), lit(0.0)).as("sea_ice_area"),
        coalesce(sum(when(siconc >= thresh, area)), lit(0.0)).as("sea_ice_extent"))
}
