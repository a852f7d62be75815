package graft.analog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial-analog dissimilarity metrics (`xclim/analog.py:21`
  * `spatial_analogs` + metrics :182-:640): compare a target sample's
  * distribution against each candidate group's distribution.
  *
  * The two-sample Kolmogorov–Smirnov statistic (analog.py:434) is expressed
  * as a pure window plan: union the target sample into every candidate
  * group, sort by value, and take max |ecdf_a - ecdf_b| with a RANGE frame
  * so ties are evaluated after all equal values. One shuffle keyed on the
  * candidate group; no sample ever sits in driver memory, so candidate
  * count and sample sizes scale freely.
  */
object Analog {

  /** Per-group two-sample KS statistic of `value` against the target frame
    * (single column named like valueCol). Output: (groupCol, ks). */
  def ksStatistic(candidates: DataFrame, groupCol: String, valueCol: String,
                  target: DataFrame): DataFrame = {
    val groups = candidates.select(col(groupCol)).distinct()
    val a = candidates.select(col(groupCol), col(valueCol).as("_v"),
      lit(1L).as("_a"), lit(0L).as("_b"))
    val b = target.select(col(valueCol).as("_v"))
      .crossJoin(broadcast(groups))
      .select(col(groupCol), col("_v"), lit(0L).as("_a"), lit(1L).as("_b"))
    val u = a.unionByName(b)
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col(groupCol))
    u.withColumn("_ca", sum(col("_a")).over(w))
      .withColumn("_cb", sum(col("_b")).over(w))
      .withColumn("_na", sum(col("_a")).over(wg))
      .withColumn("_nb", sum(col("_b")).over(wg))
      .groupBy(col(groupCol))
      .agg(max(abs(col("_ca").cast("double") / col("_na") -
        col("_cb").cast("double") / col("_nb"))).as("ks"))
  }

  /** Standardised Euclidean distance between group means scaled by target
    * std (analog.py:182 `seuclidean`, 1-D form). */
  def seuclidean(candMean: Column, tgtMean: Column, tgtStd: Column): Column =
    abs(candMean - tgtMean) / tgtStd

  /** Deterministic quantile-preserving subsample: sort by first feature,
    * pick `cap` evenly-strided points. Stable across partitionings (unlike
    * reservoir sampling) and value-determined, so an oracle can reproduce
    * the selection from the sorted value sequence alone. */
  private def thin(zs: Array[Array[Double]], cap: Int): Array[Array[Double]] =
    if (zs.length <= cap) zs
    else {
      val sorted = zs.sortBy(x => (x.headOption.getOrElse(0.0), x.length))
      val stride = sorted.length.toDouble / cap
      Array.tabulate(cap)(i => sorted(math.min((i * stride).toInt, sorted.length - 1)))
    }

  /** Sample-vs-sample dissimilarity metrics that need the full candidate
    * sample in memory: Székely–Rizzo energy distance (analog.py:323
    * `szekely_rizzo`) and the nearest-neighbour class-purity metric
    * (analog.py:217 `nearest_neighbor`). One `mapGroups` pass per candidate
    * group with the (bounded) target sample broadcast in the closure —
    * candidate cells stream through executors, so candidate COUNT scales
    * freely; per-cell sample size is the O(n^2) bound, as in the reference.
    *
    * Input: (groupCol, features ARRAY<DOUBLE>); output per group:
    * (group, energy_distance, nn_metric).
    *
    * `maxPerGroup` bounds the O(n^2) kernel at scale: BOTH the candidate
    * groups and the target are deterministically thinned to `maxPerGroup`
    * points; the target's O(m²) self-term is computed once driver-side.
    * `withGraphStats = false` skips the NN-purity and Friedman-Rafsky MST
    * passes (the expensive part) when only the energy term is needed.
    */
  def sampleMetrics(candidates: DataFrame, groupCol: String, featuresCol: String,
                    target: Array[Array[Double]],
                    maxPerGroup: Int = Int.MaxValue,
                    withGraphStats: Boolean = true): DataFrame = {
    val s = candidates.sparkSession
    import s.implicits._
    def d(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); acc += x * x; i += 1 }
      math.sqrt(acc)
    }
    def meanWithin(zs: Array[Array[Double]]): Double = {
      if (zs.length < 2) 0.0
      else {
        var acc = 0.0
        var i = 0
        while (i < zs.length) {
          var j = i + 1
          while (j < zs.length) { acc += d(zs(i), zs(j)); j += 1 }
          i += 1
        }
        2.0 * acc / (zs.length.toLong * zs.length) // includes both orders
      }
    }
    // the target is bounded by the SAME cap as candidate groups (an
    // uncapped target makes every group pay O(n·m) against an m that
    // grows with the data), and its O(m²) self-term is computed ONCE
    // here, not once per group
    val ys = thin(target, maxPerGroup)
    val dyy = meanWithin(ys)
    candidates
      .select(col(groupCol).cast("string"), col(featuresCol))
      .as[(String, Seq[Double])]
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val xs = thin(it.map(_._2.toArray).toArray, maxPerGroup)
        var dxy = 0.0
        for (x <- xs; y <- ys) dxy += d(x, y)
        dxy /= (xs.length.toLong * ys.length)
        val energy = 2.0 * dxy - meanWithin(xs) - dyy
        // NN purity: for each candidate point, is its nearest pooled
        // neighbour (excluding itself) also a candidate point?
        var same = 0
        if (withGraphStats) for (i <- xs.indices) {
          var best = Double.MaxValue; var bestIsCand = false
          for (j <- xs.indices if j != i) {
            val dd = d(xs(i), xs(j)); if (dd < best) { best = dd; bestIsCand = true }
          }
          for (y <- ys) {
            val dd = d(xs(i), y); if (dd < best) { best = dd; bestIsCand = false }
          }
          if (bestIsCand) same += 1
        }
        val nn = if (!withGraphStats || xs.isEmpty) Double.NaN else same.toDouble / xs.length
        // `friedman_rafsky` (analog.py:389): fraction of pooled-MST edges
        // joining the two samples (Prim O(n^2)); identical distributions
        // -> ~2nm/(n+m)/(n+m-1), disjoint clusters -> ~1/(n+m-1)
        val pooled = xs ++ ys
        val isCand = Array.fill(pooled.length)(false)
        xs.indices.foreach(isCand(_) = true)
        var frFrac = Double.NaN
        if (withGraphStats && pooled.length >= 2) {
          val inTree = Array.fill(pooled.length)(false)
          val dist = Array.fill(pooled.length)(Double.MaxValue)
          val parent = Array.fill(pooled.length)(-1)
          inTree(0) = true
          for (j <- 1 until pooled.length) { dist(j) = d(pooled(0), pooled(j)); parent(j) = 0 }
          var crossing = 0
          for (_ <- 1 until pooled.length) {
            var bi = -1; var bd = Double.MaxValue
            for (j <- pooled.indices if !inTree(j) && dist(j) < bd) { bd = dist(j); bi = j }
            inTree(bi) = true
            if (isCand(bi) != isCand(parent(bi))) crossing += 1
            for (j <- pooled.indices if !inTree(j)) {
              val dd = d(pooled(bi), pooled(j))
              if (dd < dist(j)) { dist(j) = dd; parent(j) = bi }
            }
          }
          frFrac = crossing.toDouble / (pooled.length - 1)
        }
        (g, energy, nn, frFrac)
      }
      .toDF(groupCol, "energy_distance", "nn_metric", "fr_crossing_frac")
  }

  /** The remaining sample-vs-sample metrics (analog.py:255 `zech_aslan`,
    * :499 `kldiv`, :591 `mahalanobis`) — same execution shape as
    * [[sampleMetrics]]: target-side quantities (NN distances, per-dim stds,
    * covariance inverse) are computed ONCE on the driver from the bounded
    * target sample, then each candidate group streams through one
    * `mapGroups` kernel. O(n*m + n^2) per group like the reference.
    */
  def extendedMetrics(candidates: DataFrame, groupCol: String, featuresCol: String,
                      targetRaw: Array[Array[Double]], dmin: Double = 1e-12,
                      maxPerGroup: Int = Int.MaxValue): DataFrame = {
    val s = candidates.sparkSession
    import s.implicits._
    // bound the target like the candidate groups (see sampleMetrics)
    val target = thin(targetRaw, maxPerGroup)
    val dims = target.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); acc += x * x; i += 1 }
      acc
    }
    def std(zs: Array[Array[Double]], k: Int): Double = { // ddof = 1
      val n = zs.length
      val m = zs.map(_(k)).sum / n
      math.sqrt(zs.map(z => (z(k) - m) * (z(k) - m)).sum / (n - 1))
    }
    // target-side precomputation (bounded sample, like the energy target)
    val ny = target.length
    val tgtStd = Array.tabulate(dims)(std(target, _))
    val tgtMean = Array.tabulate(dims)(k => target.map(_(k)).sum / ny)
    val tgtNn = target.indices.map { i =>
      var best = Double.MaxValue
      for (j <- target.indices if j != i) best = math.min(best, d2(target(i), target(j)))
      math.sqrt(best)
    }.toArray
    // covariance (ddof=1) of the target + Gauss-Jordan inverse
    val cov = Array.tabulate(dims, dims) { (a, b) =>
      target.map(z => (z(a) - tgtMean(a)) * (z(b) - tgtMean(b))).sum / (ny - 1)
    }
    val vi = {
      val m = Array.tabulate(dims)(i =>
        Array.tabulate(2 * dims)(j => if (j < dims) cov(i)(j)
          else if (j - dims == i) 1.0 else 0.0))
      for (c <- 0 until dims) {
        val p = (c until dims).maxBy(r => math.abs(m(r)(c)))
        val t = m(c); m(c) = m(p); m(p) = t
        val pv = m(c)(c)
        for (j <- 0 until 2 * dims) m(c)(j) /= pv
        for (r <- 0 until dims if r != c) {
          val f = m(r)(c)
          for (j <- 0 until 2 * dims) m(r)(j) -= f * m(c)(j)
        }
      }
      Array.tabulate(dims, dims)((i, j) => m(i)(j + dims))
    }
    def rWeight(r: Double): Double = -math.log(math.max(r, dmin))
    candidates
      .select(col(groupCol).cast("string"), col(featuresCol))
      .as[(String, Seq[Double])]
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val xsAll = it.map(_._2.toArray).toArray
        val xs =
          if (xsAll.length <= maxPerGroup) xsAll
          else {
            val sorted = xsAll.sortBy(x => (x.headOption.getOrElse(0.0), x.length))
            val stride = sorted.length.toDouble / maxPerGroup
            Array.tabulate(maxPerGroup)(i => sorted(math.min((i * stride).toInt, sorted.length - 1)))
          }
        val nx = xs.length
        val xStd = Array.tabulate(dims)(std(xs, _))
        val v = Array.tabulate(dims)(k => xStd(k) * tgtStd(k))
        def sed(a: Array[Double], b: Array[Double]): Double = {
          var acc = 0.0; var k = 0
          while (k < dims) { val x = a(k) - b(k); acc += x * x / v(k); k += 1 }
          math.sqrt(acc)
        }
        // zech_aslan: phi_xx + phi_yy - phi_xy with the -ln weight
        var pxx = 0.0
        for (i <- 0 until nx; j <- i + 1 until nx) pxx += rWeight(sed(xs(i), xs(j)))
        pxx /= nx.toLong * nx
        var pyy = 0.0
        for (i <- 0 until ny; j <- i + 1 until ny) pyy += rWeight(sed(target(i), target(j)))
        pyy /= ny.toLong * ny
        var pxy = 0.0
        for (x <- xs; y <- target) pxy += rWeight(sed(x, y))
        pxy /= nx.toLong * ny
        val zechAslan = pxx + pyy - pxy
        // kldiv (k=1): P = target, Q = candidate group
        var klSum = 0.0
        for (i <- target.indices) {
          var sBest = Double.MaxValue
          for (x <- xs) sBest = math.min(sBest, d2(target(i), x))
          klSum += math.log(tgtNn(i) / math.sqrt(sBest))
        }
        val kldiv = dims.toDouble / ny * klSum + math.log(nx.toDouble / (ny - 1))
        // mahalanobis between sample means with the target covariance inverse
        val xMean = Array.tabulate(dims)(k => xs.map(_(k)).sum / nx)
        val diff = Array.tabulate(dims)(k => xMean(k) - tgtMean(k))
        var md = 0.0
        for (i <- 0 until dims; j <- 0 until dims) md += diff(i) * vi(i)(j) * diff(j)
        (g, zechAslan, kldiv, math.sqrt(md))
      }
      .toDF(groupCol, "zech_aslan", "kldiv", "mahalanobis")
  }
}
