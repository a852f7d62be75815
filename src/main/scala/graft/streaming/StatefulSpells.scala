package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming run-length detection — the Structured-Streaming twin of
  * `core.Runs` (`rle`/`longest_run` over an unbounded stream): per entity,
  * consecutive-step condition runs are tracked ACROSS micro-batches with
  * O(1) state (run start, length, last step) and emitted as closed spells
  * the moment a non-qualifying or non-contiguous observation arrives.
  *
  * Contract: `t` is a discrete step index (day number for daily data —
  * decode timestamps upstream); per-entity arrival is in step order across
  * batches (the standard watermarked-ingest assumption; within a batch any
  * order is fine, the kernel sorts its slice). A spell still open when the
  * stream idles stays in the state store — pair with an event-time timeout
  * to flush on quiescence, like [[StatefulSessions]].
  *
  * State is keyed by entity and sharded by the state store across
  * executors; spell emission is append-mode, so sinks see each closed
  * spell exactly once per trigger.
  */
object StatefulSpells {

  case class Obs(entityId: Long, t: Long, cond: Boolean)
  case class SpellState(start: Long, len: Int, lastT: Long)
  case class ClosedSpell(entityId: Long, startT: Long, length: Int)

  /** Closed spells of at least `minLength` consecutive qualifying steps. */
  def spells(ds: Dataset[Obs], minLength: Int = 1): Dataset[ClosedSpell] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.entityId)
      .flatMapGroupsWithState[SpellState, ClosedSpell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (id, obs, state) =>
        val sorted = obs.toArray.sortBy(_.t)
        val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSpell]
        var st = state.getOption
        sorted.foreach { o =>
          st match {
            case Some(s) if o.cond && o.t == s.lastT + 1 =>
              st = Some(s.copy(len = s.len + 1, lastT = o.t))
            case Some(s) if o.cond => // observation gap: run cannot continue
              if (s.len >= minLength) out += ClosedSpell(id, s.start, s.len)
              st = Some(SpellState(o.t, 1, o.t))
            case Some(s) => // qualifying run ends
              if (s.len >= minLength) out += ClosedSpell(id, s.start, s.len)
              st = None
            case None =>
              if (o.cond) st = Some(SpellState(o.t, 1, o.t))
          }
        }
        st match {
          case Some(s) => state.update(s)
          case None    => if (state.exists) state.remove()
        }
        out.iterator
      }
  }
}
