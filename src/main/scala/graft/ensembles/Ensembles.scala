package graft.ensembles

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ensemble statistics (`xclim/ensembles/`): member concatenation,
  * cross-member reductions, percentiles, and robustness measures.
  *
  * The long data model makes these trivial at scale: members are rows with a
  * `realization` key (`create_ensemble`'s concat dim, _base.py:31-138), so
  * every cross-member statistic is a single groupBy over
  * (location, time) — ragged member time spans (the reference's outer join)
  * come for free.
  */
object Ensembles {

  /** create_ensemble: tag + union member frames (calendar unification is the
    * caller's job via core.Time; ragged spans need no special casing). */
  def createEnsemble(members: Seq[DataFrame]): DataFrame =
    members.zipWithIndex.map { case (df, i) =>
      df.withColumn("realization", lit(i))
    }.reduce(_.unionByName(_))

  /** ensemble_mean_std_max_min (_base.py:141): cross-member stats with a
    * min_members guard (stats null when fewer members present). */
  def meanStdMaxMin(ens: DataFrame, keys: Seq[String], value: Column,
                    minMembers: Int = 1): DataFrame = {
    val base = ens.groupBy(keys.map(col): _*).agg(
      avg(value).as("ens_mean"),
      stddev_samp(value).as("ens_std"),
      max(value).as("ens_max"),
      min(value).as("ens_min"),
      count(value).as("n_members"))
    if (minMembers <= 1) base
    else base.select(keys.map(col) ++ Seq("ens_mean", "ens_std", "ens_max", "ens_min").map(c =>
      when(col("n_members") >= minMembers, col(c)).as(c)) :+ col("n_members"): _*)
  }

  /** ensemble_percentiles (_base.py:214): exact type-7 percentiles across
    * members per (location, time). For weighted ensembles supply a
    * pre-expanded frame (row per weight unit) or use Stats.hfQuantile. */
  def percentiles(ens: DataFrame, keys: Seq[String], value: Column,
                  ps: Seq[Double]): DataFrame = {
    val aggs = ps.map(p => percentile(value, lit(p)).as(s"p${(p * 100).round}"))
    ens.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** robustness_fractions (_robustness.py:74), test="ttest"-style: given a
    * per-member frame with (ref mean/var/n, fut mean/var/n) columns, the
    * fraction of members with significant change and with positive change. */
  def robustnessFractions(perMember: DataFrame, keys: Seq[String],
                          tCrit: Double = 1.96): DataFrame = {
    val tv = (col("m2") - col("m1")) / sqrt(col("v2") / col("n2") + col("v1") / col("n1"))
    perMember.withColumn("_t", tv)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_members"),
        avg(when(col("m2") > col("m1"), 1.0).otherwise(0.0)).as("changed_positive"),
        avg(when(abs(col("_t")) > tCrit, 1.0).otherwise(0.0)).as("changed_significant"))
  }

  /** robustness_categories (_robustness.py:336, IPCC AR6 scheme): combine
    * agreement + significance fractions into the 3 advice categories. */
  def robustnessCategories(fracSig: Column, fracAgree: Column): Column =
    when(fracSig < 0.66, lit("robust signal"))
      .when(fracAgree >= 0.8, lit("robust signal"))
      .otherwise(lit("conflicting signal"))
}
