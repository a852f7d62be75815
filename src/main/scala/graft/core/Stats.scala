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

  /** The 100 TB-tier fallback the exact form documents: bounded-memory
    * approximate quantile via Spark's `percentile_approx` sketch. Exact
    * H&F plotting-position differences are O(1/n) per group, so at the
    * group sizes that overflow `collect_list` state they sit far below
    * the sketch's own rank error — use [[hfQuantile]] for small bounded
    * groups (entity × doy), this for member-unbounded ones. `accuracy`
    * trades memory (O(accuracy) per group) for rank error (≤ 1/accuracy
    * of the group size). */
  def quantileAtScale(c: Column, p: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(p), lit(accuracy))

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
