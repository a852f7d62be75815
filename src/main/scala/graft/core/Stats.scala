package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Statistical aggregates beyond Spark's built-ins.
  *
  * Centrepiece: exact Hyndman–Fan quantiles with arbitrary plotting
  * positions (alpha, beta) — the reference's `calc_perc`/`_nan_quantile`
  * (`xclim/core/utils.py:279-558`). Spark's `percentile` is H&F type 7
  * (alpha=beta=1) only; `percentile_doy` (calendar.py:396) defaults to
  * type 8 (alpha=beta=1/3), so we need the general form.
  *
  * Implementation: `sort_array(collect_list(x))` + pure Column index
  * arithmetic — no UDF/UDAF, everything codegen-able. Memory is O(group
  * size) per group like any exact quantile; at 100 TB use groups bounded by
  * (entity, doy) cardinality (365 x windows rows each) so the state is tiny,
  * or fall back to `percentile_approx` for unbounded groups.
  */
object Stats {

  /** Round a double like C/DuckDB `round(x, n)` does: multiply, round half
    * away from zero IN DOUBLE, divide. Spark's own `round(c, n)` rounds the
    * exact decimal expansion of the double instead, which disagrees with the
    * multiply-based rounding exactly at representable .5 boundaries (e.g.
    * 493.75130049999996 at scale 6). Use this wherever results must be
    * bit-comparable with a C-rounding engine. */
  def rd(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    round(c * f) / f
  }

  /** Exact H&F quantile of `c` at probability `p` with plotting positions
    * (alpha, beta). alpha=beta=1 reproduces Spark/numpy type 7;
    * alpha=beta=1/3 is type 8 (the reference's percentile_doy default).
    * Aggregate expression (use inside .agg). Nulls are dropped by
    * collect_list, matching nan-skipping `_nan_quantile`.
    */
  def hfQuantile(c: Column, p: Double, alpha: Double = 1.0 / 3.0, beta: Double = 1.0 / 3.0): Column = {
    val arr = sort_array(collect_list(c))
    hfQuantileOfSorted(arr, p, alpha, beta)
  }

  /** Same, over an already-collected sorted array column. */
  def hfQuantileOfSorted(arr: Column, p: Double, alpha: Double, beta: Double): Column = {
    val n = size(arr).cast("double")
    // 1-based fractional index h = (n - alpha - beta + 1) * p + alpha
    val h = (n - alpha - beta + 1) * p + alpha
    val hc = greatest(lit(1.0), least(h, n)) // clip to [1, n]
    val lo = floor(hc).cast("int")
    val hi = least(lo + 1, n.cast("int"))
    val frac = hc - lo.cast("double")
    val vlo = element_at(arr, lo)
    val vhi = element_at(arr, hi)
    when(n === 0, lit(null).cast("double"))
      .otherwise(vlo + frac * (vhi - vlo))
  }

  /** Bounded-memory APPROXIMATE quantile via Spark's `percentile_approx`
    * sketch. Exact H&F plotting-position differences are O(1/n) per
    * group, so at the group sizes that overflow `collect_list` state they
    * sit far below the sketch's own rank error. `accuracy` trades memory
    * (O(accuracy) per group) for rank error (≤ 1/accuracy of the group
    * size). For EXACT quantiles over unbounded groups use
    * [[hfQuantilesScale]] instead. */
  def quantileAtScale(c: Column, p: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(p), lit(accuracy))

  /** EXACT H&F quantiles for groups too large for `collect_list` state —
    * the at-scale twin of [[hfQuantile]], bit-identical output (same
    * selected order statistics, same interpolation arithmetic).
    *
    * Plan: ONE range-partitioned sort of (keys…, value) — no per-group
    * state anywhere, a group may span many partitions — then global
    * within-group ranks from a two-pass count (per-partition group counts
    * are collected, a few rows per partition, and cumulative offsets are
    * broadcast back), and finally only the two order statistics each
    * quantile needs are joined against the per-group targets. Memory per
    * task is O(1); driver state is O(partitions + groups).
    *
    * Intended for the FEW-LARGE-GROUPS regime (group count bounded by
    * |data| / group size — it is the regime where `collect_list` breaks);
    * many-small-groups stays on [[hfQuantile]]. [[hfQuantilesAuto]]
    * routes between the two by measuring the max group size first.
    *
    * Output: one row per group in `df` (groups whose values are all null
    * carry nulls, matching collect_list's nan-skipping), with one column
    * per entry of `ps` (name -> probability). */
  def hfQuantilesScale(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                       valueCol: String, ps: Seq[(String, Double)],
                       alpha: Double = 1.0 / 3.0, beta: Double = 1.0 / 3.0,
                       maxDriverGroups: Long = 5_000_000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Row, DataFrame}
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val data = df.select(keys.map(col) :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    val allGroups = df.select(keys.map(col): _*).distinct()
    val nDf = data.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
    // the plan keeps O(partitions + groups) count rows on the driver —
    // correct only in the few-large-groups regime it was built for; fail
    // loudly before collecting rather than OOM the driver
    val nGroups = nDf.count()
    require(nGroups <= maxDriverGroups,
      s"hfQuantilesScale: $nGroups groups exceeds maxDriverGroups=$maxDriverGroups — " +
        "this rank-selection plan holds O(partitions + groups) rows on the driver " +
        "and targets the few-large-groups regime; route small groups through " +
        "hfQuantile / hfQuantilesAuto instead")
    // per-group target ranks: lo/hi/frac for each requested probability
    val targets = ps.map { case (name, p) =>
      val n = col("_n").cast("double")
      val h = (n - alpha - beta + 1) * p + alpha
      val hc = greatest(lit(1.0), least(h, n))
      val lo = floor(hc).cast("long")
      nDf.select(keys.map(col) :+ lit(name).as("_q") :+ lo.as("_lo") :+
        least(lo + 1, col("_n")).as("_hi") :+ (hc - lo.cast("double")).as("_frac"): _*)
    }.reduce(_ unionByName _)
    // one range sort; shared by the count pass and the rank pass
    val parts = spark.sparkContext.defaultParallelism
    val sorted = data
      .repartitionByRange(parts, keys.map(col) :+ col("_v"): _*)
      .sortWithinPartitions(keys.map(col) :+ col("_v"): _*)
      .localCheckpoint(false)
    val kWidth = keys.length
    // pass 1: rows per (partition, group) — a few rows per partition since
    // range partitioning keeps groups contiguous
    val counts: Array[(Int, Seq[Any], Long)] = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
      it.foreach { r => val k = r.toSeq.take(kWidth); acc(k) = acc.getOrElse(k, 0L) + 1 }
      acc.iterator.map { case (k, n) => (pid, k, n) }
    }.collect()
    val offsets: Map[(Int, Seq[Any]), Long] =
      counts.groupBy(_._2).iterator.flatMap { case (k, rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (pid, _, n) =>
          val off = cum; cum += n; (pid, k) -> off
        }
      }.toMap
    val bcOff = spark.sparkContext.broadcast(offsets)
    // pass 2: global within-group rank = broadcast offset + running local
    val rankedRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.Map.empty[Seq[Any], Long]
      it.map { r =>
        val k = r.toSeq.take(kWidth)
        val rank = local.getOrElse(k, bcOff.value.getOrElse((pid, k), 0L)) + 1
        local(k) = rank
        Row.fromSeq(r.toSeq :+ rank)
      }
    }
    val ranked = spark.createDataFrame(rankedRdd, sorted.schema.add("_rank", LongType))
    val hit = ranked.join(targets,
      keys.map(k => ranked(k) === targets(k)).reduce(_ && _) &&
        (col("_rank") === col("_lo") || col("_rank") === col("_hi")))
      .select(keys.map(targets(_)) ++
        Seq(col("_q"), col("_lo"), col("_hi"), col("_frac"),
          col("_rank"), col("_v")): _*)
    val q = hit.groupBy(keys.map(col) :+ col("_q"): _*)
      .agg(min(when(col("_rank") === col("_lo"), col("_v"))).as("_vlo"),
        min(when(col("_rank") === col("_hi"), col("_v"))).as("_vhi"),
        first(col("_frac")).as("_f"))
      .withColumn("_val", col("_vlo") + col("_f") * (col("_vhi") - col("_vlo")))
    // pivot the quantile names into columns (names are static literals)
    val pivoted = q.groupBy(keys.map(col): _*)
      .agg(max(when(col("_q") === ps.head._1, col("_val"))).as(ps.head._1),
        ps.tail.map { case (name, _) =>
          max(when(col("_q") === name, col("_val"))).as(name)
        }: _*)
    allGroups.join(pivoted, keys, "left") // all-null groups emit null rows
  }

  /** Adaptive routing between the exact small-group quantile plan
    * (`sort_array(collect_list)`) and the at-scale exact plan
    * ([[hfQuantilesScale]]): one cheap count aggregate measures group
    * sizes first — the same measured-threshold philosophy as AQE's
    * broadcast conversion and the connected-components fast path.
    *
    * Routing is PER GROUP, not whole-frame: in a mixed regime (millions
    * of small groups plus a handful of huge ones) only the huge groups'
    * rows take the rank-selection plan — whose driver state is
    * O(partitions + groups-it-sees), i.e. O(partitions + large groups)
    * here — while every bounded group keeps the one-shuffle
    * `collect_list` aggregate. The large-group key set is bounded by
    * |data| / smallGroupMax, so its broadcast is always tiny. Both plans
    * select the same order statistics with the same interpolation
    * arithmetic, so the union is bit-identical to either plan alone. */
  def hfQuantilesAuto(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                      valueCol: String, ps: Seq[(String, Double)],
                      alpha: Double = 1.0 / 3.0, beta: Double = 1.0 / 3.0,
                      smallGroupMax: Long = 1_000_000): org.apache.spark.sql.DataFrame = {
    def smallPlan(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(keys.map(col): _*)
        .agg(hfQuantile(col(valueCol), ps.head._2, alpha, beta).as(ps.head._1),
          ps.tail.map { case (name, p) =>
            hfQuantile(col(valueCol), p, alpha, beta).as(name)
          }: _*)
    val sizes = df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
    // max over an empty/all-null frame aggregates to a NULL cell
    val maxN = Option(sizes.agg(max(col("_n"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (maxN <= smallGroupMax) smallPlan(df)
    else {
      val large = sizes.filter(col("_n") > smallGroupMax).drop("_n")
      val dfLarge = df.join(broadcast(large), keys)
      // left_anti keeps all-null-value groups (absent from `sizes`) on the
      // small side, where collect_list yields the null row they should get
      val dfSmall = df.join(broadcast(large), keys, "left_anti")
      smallPlan(dfSmall).unionByName(
        hfQuantilesScale(dfLarge, keys, valueCol, ps, alpha, beta))
    }
  }

  /** Coefficient of variation (temperature/precip seasonality,
    * _anuclim.py:105): population-std / mean. */
  def cv(c: Column): Column = stddev_pop(c) / avg(c)

  /** Weighted quantile (ensemble_percentiles with member weights,
    * _base.py:214): linear interpolation on the cumulative-weight grid
    * w_cum_i - w_i/2 (the "weighted type-7" convention). Aggregate
    * expression over (value, weight) pairs; weights need not be normalised.
    * BOUNDED GROUPS ONLY: the cumulative grid is O(n²) interpreted
    * higher-order-function work per group — fine for ensemble member
    * counts (tens), a stall at thousands. The scalable window-based form
    * is [[graft.ensembles.Ensembles.weightedPercentiles]].
    */
  def weightedQuantile(value: Column, weight: Column, p: Double): Column = {
    val pairs = sort_array(collect_list(struct(value.as("v"), weight.as("w"))))
    val ws = transform(pairs, x => x.getField("w"))
    val total = aggregate(ws, lit(0.0), (a, b) => a + b)
    // cumulative weights minus half own weight, normalised
    val n = size(pairs)
    val idx = sequence(lit(1), n)
    val cums = transform(idx, i =>
      aggregate(slice(ws, lit(1), i), lit(0.0), (a, b) => a + b)
        - element_at(ws, i) / 2.0)
    val grid = transform(cums, c => c / total)
    // find bracketing grid points and interpolate
    val target = lit(p)
    val below = size(filter(grid, g => g <= target))
    when(n === 0, lit(null).cast("double"))
      .when(below === 0, element_at(pairs, 1).getField("v"))
      .when(below === n, element_at(pairs, n).getField("v"))
      .otherwise {
        val g0 = element_at(grid, below); val g1 = element_at(grid, below + 1)
        val v0 = element_at(pairs, below).getField("v")
        val v1 = element_at(pairs, below + 1).getField("v")
        v0 + (target - g0) / (g1 - g0) * (v1 - v0)
      }
  }

  /** Rank-based quantile membership: fraction of rows where cond holds. */
  def fraction(cond: Column): Column =
    avg(when(cond, 1.0).otherwise(0.0))

  /** Pearson skewness via built-ins (for distribution diagnostics). */
  def skew(c: Column): Column = skewness(c)

  /** Welch t statistic from per-sample moments (robustness tests,
    * ensembles/_robustness.py:553): computed from (mean, var, n) pairs as a
    * scalar formula — use after a groupBy producing those moments. */
  def welchT(m1: Column, v1: Column, n1: Column, m2: Column, v2: Column, n2: Column): Column =
    (m1 - m2) / sqrt(v1 / n1 + v2 / n2)

  /** L-moments (l1, l2, t3) of a sorted sample array — basis for the
    * distribution fits (stats.py:115 `fit`, method="PWM"). Pure Column
    * arithmetic over the sorted array via aggregate(). */
  def lMoments(sortedArr: Column): (Column, Column, Column) = {
    val n = size(sortedArr).cast("double")
    // b0 = mean; b1 = sum((i-1)/(n-1) * x_i)/n ; b2 = sum((i-1)(i-2)/((n-1)(n-2)) x_i)/n
    def wsum(weightExpr: (Column, Column) => Column): Column = {
      // aggregate with index: zip_with over sequence
      val idx = sequence(lit(1), size(sortedArr))
      val weighted = zip_with(sortedArr, idx, (x, i) => weightExpr(x, i.cast("double")))
      aggregate(weighted, lit(0.0), (acc, x) => acc + x)
    }
    val b0 = wsum((x, _) => x) / n
    val b1 = wsum((x, i) => x * (i - 1) / (n - 1)) / n
    val b2 = wsum((x, i) => x * (i - 1) * (i - 2) / ((n - 1) * (n - 2))) / n
    val l1 = b0
    val l2 = lit(2) * b1 - b0
    val l3 = lit(6) * b2 - lit(6) * b1 + b0
    (l1, l2, l3 / l2)
  }
}
