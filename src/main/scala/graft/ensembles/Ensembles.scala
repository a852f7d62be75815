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

  /** Weighted ensemble_percentiles (_base.py:214 with `weights`): linear
    * interpolation on the cumulative-weight grid cum_i − w_i/2 normalised
    * by total weight (the "weighted type-7" convention — reduces to exact
    * type 7 at equal weights). Window-based, NOT array-based: members sort
    * within each key partition, a running-sum window builds the grid, and
    * the bracketing pair interpolates — one shuffle on `keys`, reused by
    * the final same-keyed groupBy; no per-group arrays, so member count is
    * unbounded (the array form in core.Stats.weightedQuantile is O(n²)
    * interpreted and only fit for small bounded groups). */
  def weightedPercentiles(ens: DataFrame, keys: Seq[String], value: Column,
                          weight: Column, ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kCols = keys.map(col)
    val ord = Window.partitionBy(kCols: _*).orderBy(col("_v").asc, col("_w").asc)
    val all = Window.partitionBy(kCols: _*)
    val base = ens.select(kCols :+ value.as("_v") :+ weight.as("_w"): _*)
      .withColumn("_cum",
        sum(col("_w")).over(ord.rowsBetween(Window.unboundedPreceding, 0)) - col("_w") / 2)
      .withColumn("_grid", col("_cum") / sum(col("_w")).over(all))
      .withColumn("_rn", row_number().over(ord))
      .withColumn("_nv", lead(col("_v"), 1).over(ord))
      .withColumn("_ng", lead(col("_grid"), 1).over(ord))
    val aggs = ps.map { p =>
      coalesce(
        max(when(col("_grid") <= p && (col("_ng").isNull || col("_ng") > p),
          when(col("_ng").isNull, col("_v")).otherwise(
            col("_v") + (lit(p) - col("_grid")) / (col("_ng") - col("_grid"))
              * (col("_nv") - col("_v"))))),
        min(when(col("_rn") === 1, col("_v")))).as(s"p${(p * 100).round}")
    }
    base.groupBy(kCols: _*).agg(aggs.head, aggs.tail: _*)
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

  /** Brown-Forsythe change test (_robustness.py:614, Levene with median
    * centering, k=2 groups): W = (N-2) * [n1(Z1-Z)^2 + n2(Z2-Z)^2] /
    * [SS_within], Z_ij = |x_ij - median_group|. Input: a long frame with a
    * boolean `futCol`; output per (keys): the W statistic and the change
    * verdict at `wCrit` (3.84 = the F(1, inf) 95% point — the exact F
    * p-value needs an incomplete beta; at climate sample sizes the
    * asymptote is the documented approximation).
    * Medians are discrete lower order statistics (engine-portable). */
  def brownForsythe(df: DataFrame, keys: Seq[String], futCol: Column,
                    value: Column, wCrit: Double = 3.84): DataFrame = {
    val grp = df.withColumn("_g", when(futCol, 1).otherwise(0))
    val med = grp.groupBy((keys.map(col) :+ col("_g")): _*)
      .agg(element_at(sort_array(collect_list(value)),
        ceil(count(lit(1)) / 2.0).cast("int")).as("_med"))
    val z = grp.join(med, keys :+ "_g")
      .withColumn("_z", abs(value - col("_med")))
    val per = z.groupBy((keys.map(col) :+ col("_g")): _*)
      .agg(avg(col("_z")).as("_zm"), count(lit(1)).as("_n"),
        sum(col("_z") * col("_z")).as("_zss"))
    per.groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("_nt"),
        (sum(col("_n") * col("_zm")) / sum(col("_n"))).as("_zbar"),
        sum(col("_n") * col("_zm") * col("_zm")).as("_nzm2"),
        sum(col("_zss") - col("_n") * col("_zm") * col("_zm")).as("_ssw"),
        sum(col("_n") * col("_zm")).as("_nzm"))
      .withColumn("bf_w",
        (col("_nt") - 2) * (col("_nzm2") - col("_nzm") * col("_nzm") / col("_nt")) / col("_ssw"))
      .withColumn("changed", col("bf_w") > wCrit)
      .select((keys.map(col) :+ col("bf_w") :+ col("changed")): _*)
  }

  /** IPCC AR6 Atlas "advanced approach" significance (_robustness.py:637,
    * no pre-industrial control): gamma = sqrt(2/20)*1.645*sigma of the
    * LINEARLY DETRENDED annual reference means; change is significant when
    * |mean(fut) - mean(ref)| > gamma. Detrending is closed-form OLS on
    * aggregates — everything stays in two hash-aggs + a projection. */
  def ipccAr6C(annualRef: DataFrame, keys: Seq[String], yearCol: Column,
               refValue: Column, futMinusRefMean: Column): DataFrame = {
    val agg = annualRef.groupBy(keys.map(col): _*).agg(
      avg(yearCol.cast("double")).as("_tm"), avg(refValue).as("_vm"),
      avg(yearCol.cast("double") * refValue).as("_tvm"),
      avg(yearCol.cast("double") * yearCol.cast("double")).as("_t2m"),
      var_pop(refValue).as("_vv"), avg(futMinusRefMean).as("_delta"))
    agg
      .withColumn("_slope",
        (col("_tvm") - col("_tm") * col("_vm")) / (col("_t2m") - col("_tm") * col("_tm")))
      // var of detrended residuals = var(v) - slope^2 * var(t)
      .withColumn("_sigma", sqrt(col("_vv") -
        col("_slope") * col("_slope") * (col("_t2m") - col("_tm") * col("_tm"))))
      .withColumn("gamma", lit(math.sqrt(2.0 / 20.0) * 1.645) * col("_sigma"))
      .withColumn("changed", abs(col("_delta")) > col("gamma"))
      .select((keys.map(col) :+ col("gamma") :+ col("_delta").as("delta") :+ col("changed")): _*)
  }

  /** robustness_coefficient (_robustness.py:430, Knutti & Sedlacek 2013):
    * R = 1 - A1/A2 with A1 = mean over realizations of the squared-area
    * integral between each member's future CDF and the ensemble-mean
    * projection CDF, A2 = the integral between the mean projection CDF and
    * the reference CDF.
    *
    * The squared-area integral between two empirical CDFs is computed as a
    * pure window plan over the pooled sorted sample (cumulative fractions +
    * lead-gap), the KS-statistic pattern with a width term — one shuffle
    * per pairing, samples never collected. */
  def robustnessCoefficient(fut: DataFrame, keys: Seq[String], realizationCol: String,
                            timeCol: String, valueCol: String,
                            ref: DataFrame): DataFrame = {
    // ensemble-mean projection series (per keys, time)
    val meanProj = fut.groupBy((keys.map(col) :+ col(timeCol)): _*)
      .agg(avg(col(valueCol)).as("_v")).select(keys.map(col) :+ col("_v"): _*)
    def sqAreaVsMean(sample: DataFrame, sampleKeys: Seq[String], out: String): DataFrame = {
      // union sample (a) with the broadcast mean projection (b) per keys
      val a = sample.select((sampleKeys.map(col) :+ col("_v") :+
        lit(1L).as("_a") :+ lit(0L).as("_b")): _*)
      val extraKeys = sampleKeys.filterNot(keys.contains)
      val reps = sample.select(sampleKeys.map(col): _*).distinct()
        .select((keys.map(col) :+ struct(extraKeys.map(col): _*).as("_ek")): _*)
      val b = meanProj.join(broadcast(reps), keys)
        .select((keys.map(col) :+ col("_ek.*") :+ col("_v") :+
          lit(0L).as("_a") :+ lit(1L).as("_b")): _*)
      val u = a.unionByName(b)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(sampleKeys.map(col): _*).orderBy(col("_v"), col("_a"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(sampleKeys.map(col): _*)
      u.withColumn("_ca", sum(col("_a")).over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("_cb", sum(col("_b")).over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("_na", sum(col("_a")).over(wAll))
        .withColumn("_nb", sum(col("_b")).over(wAll))
        .withColumn("_dx", lead(col("_v"), 1).over(w) - col("_v"))
        .withColumn("_sq",
          (col("_ca") / col("_na") - col("_cb") / col("_nb")) *
            (col("_ca") / col("_na") - col("_cb") / col("_nb")) * col("_dx"))
        .groupBy(sampleKeys.map(col): _*)
        .agg(coalesce(sum(col("_sq")), lit(0.0)).as(out))
    }
    val a1 = sqAreaVsMean(
        fut.select((keys.map(col) :+ col(realizationCol) :+ col(valueCol).as("_v")): _*),
        keys :+ realizationCol, "_sq1")
      .groupBy(keys.map(col): _*).agg(avg(col("_sq1")).as("_a1"))
    val a2 = sqAreaVsMean(
      ref.select((keys.map(col) :+ col(valueCol).as("_v")): _*), keys, "_a2")
    a1.join(a2, keys)
      .withColumn("robustness", lit(1.0) - col("_a1") / col("_a2"))
      .select((keys.map(col) :+ col("robustness")): _*)
  }

  // ---- ensemble frame filters (ensembles/_filters.py) -------------------

  /** `_concat_hist` (_filters.py:12): splice the historical scenario's
    * timeline in front of every future scenario — the hist rows are
    * replicated per future scenario (a tiny broadcast of the scenario
    * list), future rows pass through, the hist label disappears. */
  def concatHist(df: DataFrame, scenarioCol: String, histLabel: String): DataFrame = {
    val futures = df.filter(col(scenarioCol) =!= histLabel)
    val scens = futures.select(col(scenarioCol)).distinct()
    val replicatedHist = df.filter(col(scenarioCol) === histLabel)
      .drop(scenarioCol).crossJoin(broadcast(scens))
    futures.unionByName(replicatedHist.select(futures.columns.map(col): _*))
  }

  /** `_model_in_all_scens` (_filters.py:68): keep only models with at
    * least one member in every scenario. */
  def modelInAllScens(df: DataFrame, modelCol: String, scenarioCol: String): DataFrame = {
    val nScens = df.select(col(scenarioCol)).distinct().count()
    val complete = df.groupBy(col(modelCol))
      .agg(countDistinct(col(scenarioCol)).as("_n"))
      .filter(col("_n") === nScens).drop("_n")
    df.join(broadcast(complete), Seq(modelCol), "left_semi")
  }

  /** `_single_member` (_filters.py:110): keep one member per
    * (model, scenario) — the first by member label. */
  def singleMember(df: DataFrame, modelCol: String, scenarioCol: String,
                   memberCol: String): DataFrame = {
    val first = df.groupBy(col(modelCol), col(scenarioCol))
      .agg(min(col(memberCol)).as(memberCol))
    df.join(broadcast(first), Seq(modelCol, scenarioCol, memberCol), "left_semi")
  }
}
