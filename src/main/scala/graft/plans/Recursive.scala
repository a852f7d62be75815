package graft.plans

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Sequential per-entity recursions — the engine's home for the reference's
  * numba-kernel class of operators (Canadian FWI codes `fire/_cffwis.py:209-530`,
  * Keetch-Byram drought index `_ffdi.py:188`, chill portions `_agro.py:1442`,
  * antecedent precipitation index `_hydrology.py:673`): day n depends on
  * day n-1, so no window/agg formulation exists.
  *
  * Spark mapping (SURVEY §4): hash-partition by entity, sort each group by
  * time, run the recursion as a JVM-jitted loop via
  * `groupByKey(...).flatMapGroups`. ONE shuffle keyed on the entity; state is
  * O(1) per group and series length is bounded by the time span, so this
  * scales linearly as long as entity cardinality >> cores — exactly the
  * regime of a 100 TB grid (millions of cells x thousands of days).
  *
  * Rows inside a group are sorted in-memory here (series lengths are
  * bounded); for unbounded series use repartition+sortWithinPartitions and
  * mapPartitions instead.
  */
object Recursive {

  /** Generic scan: out_t = f(state_{t-1}, in_t), emitting one output per row.
    * Input frame columns: key LONG, t INT (sort key, e.g. days since epoch),
    * v DOUBLE. Output: (key, t, out).
    */
  def scanPerKey(df: DataFrame, init: Double)(f: (Double, Double, Int) => Double): Dataset[(Long, Int, Double)] = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("key").cast("long"), col("t").cast("int"), col("v").cast("double"))
      .as[(Long, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        var state = init
        var prevT = Integer.MIN_VALUE
        rows.iterator.map { case (_, t, v) =>
          val gap = if (prevT == Integer.MIN_VALUE) 1 else t - prevT
          state = f(state, v, gap)
          prevT = t
          (key, t, state)
        }
      }
  }

  /** Generic-state scan: like `scanPerKey` but with arbitrary state S and
    * per-row emitted value — the shape of multi-code recursions (the FWI
    * system carries (ffmc, dmc, dc) + season flags; the Dynamic chill model
    * carries (portions, intermediate)). S stays in the executor closure; the
    * output column is whatever `emit` projects. */
  def scanPerKeyState[S](df: DataFrame, init: S)(
      step: (S, Double, Int) => S)(emit: S => Double): Dataset[(Long, Int, Double)] = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("key").cast("long"), col("t").cast("int"), col("v").cast("double"))
      .as[(Long, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        var state = init
        var prevT = Integer.MIN_VALUE
        rows.iterator.map { case (_, t, v) =>
          val gap = if (prevT == Integer.MIN_VALUE) 1 else t - prevT
          state = step(state, v, gap)
          prevT = t
          (key, t, emit(state))
        }
      }
  }

  /** Two-state demo kernel in the Dynamic-chill shape: an intermediate pool
    * accumulates and, on crossing `cap`, converts one unit into the
    * persistent total (Fishman-style two-compartment dynamics). */
  def thresholdConversion(df: DataFrame, gain: Double, decay: Double,
                          cap: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    scanPerKeyState(df, (0.0, 0.0)) { case ((total, pool), v, gap) =>
      var p = pool * math.pow(decay, gap) + gain * v
      var tot = total
      while (p >= cap) { p -= cap; tot += 1.0 }
      (tot, p)
    }(_._1).toDF("key", "t", "out")
  }

  /** Antecedent-precipitation-style exponential decay accumulator
    * (`_hydrology.py:673`): state = state * k^gap + v, where gap is the
    * number of time steps since the previous observation (missing steps keep
    * decaying). Closed form sum v_j * k^(t-j) — used by the DuckDB oracle. */
  def decayAccumulate(df: DataFrame, k: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    scanPerKey(df, 0.0)((state, v, gap) => state * math.pow(k, gap) + v)
      .toDF("key", "t", "out")
  }

  /** [[decayAccumulate]] in STEPWISE form — the engine-exact variant:
    * the gap decay is `gap` repeated multiplications by the SAME parsed
    * double `k` (never `pow(k, gap)`, whose last ulp is libm-dependent),
    * so every step is one IEEE multiply + one IEEE add and an external
    * engine replays the whole series bit-for-bit with a dense per-step
    * recursion (`state_d = state_{d-1} * k + v_d`, v = 0 on missing
    * days). This is the §81 recursion-migration playbook applied to the
    * API kernel: make each per-step operation individually exact-
    * replayable instead of rounding a float tail. */
  def decayAccumulateStepwise(df: DataFrame, k: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    scanPerKey(df, 0.0) { (state, v, gap) =>
      var acc = state
      var i = 0
      while (i < gap) { acc *= k; i += 1 }
      acc + v
    }.toDF("key", "t", "out")
  }

  /** Keetch-Byram-flavoured bounded recursion demo kernel: drought index in
    * [0, cap] decaying towards cap by `dry` per step, reduced by the step's
    * value (rain): state = min(cap, max(0, state + dry*gap - v)). */
  def boundedDeficit(df: DataFrame, dry: Double, cap: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    scanPerKey(df, 0.0)((state, v, gap) =>
      math.min(cap, math.max(0.0, state + dry * gap - v)))
      .toDF("key", "t", "out")
  }
}
