package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming CUSUM change-point detection (Page 1954) — the live twin of
  * the batch Pettitt test: per key, a two-sided tabular CUSUM against a
  * reference mean learned from the first `warmup` samples, raising an
  * alarm row whenever either cumulative sum crosses `h` (then resetting
  * both sums — the standard restart-after-alarm protocol).
  *
  *   S+ ← max(0, S+ + (x − μ₀ − slack));  S− ← max(0, S− − (x − μ₀ + slack))
  *
  * State per key is FIVE scalars (warm-up count + running sum + the two
  * CUSUMs + last t): O(1) per key however long the stream runs, the shape
  * that holds at any key cardinality. Samples inside a micro-batch sort
  * by t; ACROSS batches arrival must be per-key time-ordered (the
  * upstream watermarked dedup/sort stage guarantees it in this engine's
  * ingest pipelines — same contract as [[StatefulFire]]). The kernel is
  * a pure fold shared with the batch form, so streaming output ==
  * sorted-batch output on any micro-batch split (StreamingSpec pins it).
  */
object StatefulCusum {

  case class Sample(key: Long, t: Int, x: Double)
  case class CusumState(n: Long, sum: Double, mu0: Double,
                        sHi: Double, sLo: Double, lastT: Int)
  case class Alarm(key: Long, t: Int, direction: String, stat: Double)

  val Start: CusumState = CusumState(0L, 0.0, 0.0, 0.0, 0.0, Int.MinValue)

  /** One sample through the CUSUM recurrence: returns the next state and
    * an optional alarm. Pure — both the batch and streaming forms call
    * exactly this. */
  def step(st: CusumState, t: Int, x: Double, warmup: Int, slack: Double,
           h: Double): (CusumState, Option[Alarm]) = {
    // enforce the documented per-key time-order contract instead of
    // assuming it: a sample arriving out of order across micro-batches
    // would otherwise fold silently into the recurrence and corrupt the
    // state with no signal. Dropped, not thrown — one straggler must not
    // kill a streaming query; the dedup/sort stage upstream makes this a
    // never-taken branch in this engine's own pipelines.
    if (t <= st.lastT) return (st, None)
    // per-step HALF_UP quantization at 8 decimals (the KBDI/CFFWIS
    // parity rule): the fold stays deterministic to the bit on any
    // engine replaying the same recurrence
    val r8 = graft.indices.Fire.round8 _
    if (st.n < warmup) {
      val n = st.n + 1; val sum = st.sum + x
      (CusumState(n, sum, if (n == warmup) r8(sum / warmup) else 0.0,
        0.0, 0.0, t), None)
    } else {
      val dev = x - st.mu0
      val sHi = r8(math.max(0.0, st.sHi + (dev - slack)))
      val sLo = r8(math.max(0.0, st.sLo - (dev + slack)))
      if (sHi > h)
        (st.copy(sHi = 0.0, sLo = 0.0, lastT = t),
          Some(Alarm(0L, t, "up", sHi)))
      else if (sLo > h)
        (st.copy(sHi = 0.0, sLo = 0.0, lastT = t),
          Some(Alarm(0L, t, "down", sLo)))
      else (st.copy(sHi = sHi, sLo = sLo, lastT = t), None)
    }
  }

  /** Batch reference: fold [[step]] over each key's t-sorted samples. */
  def detectBatch(ds: Dataset[Sample], warmup: Int, slack: Double,
                  h: Double): Dataset[Alarm] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key).flatMapGroups { (key, it) =>
      var st = Start
      it.toArray.sortBy(_.t).iterator.flatMap { s =>
        val (next, alarm) = step(st, s.t, s.x, warmup, slack, h)
        st = next
        alarm.map(_.copy(key = key))
      }
    }
  }

  /** Streaming form: same fold, state carried across micro-batches. */
  def detect(ds: Dataset[Sample], warmup: Int, slack: Double,
             h: Double): Dataset[Alarm] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, Alarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, it, state) =>
        var st = state.getOption.getOrElse(Start)
        val out = it.toArray.sortBy(_.t).flatMap { s =>
          val (next, alarm) = step(st, s.t, s.x, warmup, slack, h)
          st = next
          alarm.map(_.copy(key = key))
        }
        state.update(st)
        out.iterator
      }
  }
}
