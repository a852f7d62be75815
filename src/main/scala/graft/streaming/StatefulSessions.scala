package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state path of Structured Streaming (SURVEY §2.7). A session closes
  * when the next event of the same user arrives more than `gapMicros`
  * later; closed sessions are emitted in Append mode.
  *
  * State is O(1) per user (start, last, count) and keyed by the group —
  * exactly the layout the state store shards across executors; pair with an
  * event-time timeout in production to close idle sessions without a
  * successor event.
  */
object StatefulSessions {

  case class Ev(userId: Long, tsMicros: Long)
  case class SessionState(start: Long, last: Long, n: Int)
  case class ClosedSession(userId: Long, startMicros: Long, nEvents: Int, durationMicros: Long)

  def sessionize(ds: Dataset[Ev], gapMicros: Long): Dataset[ClosedSession] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        val sorted = evs.toArray.sortBy(_.tsMicros)
        val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        var st = state.getOption
        sorted.foreach { e =>
          st = st match {
            case Some(s) if e.tsMicros - s.last > gapMicros =>
              out += ClosedSession(uid, s.start, s.n, s.last - s.start)
              Some(SessionState(e.tsMicros, e.tsMicros, 1))
            case Some(s) =>
              Some(s.copy(last = e.tsMicros, n = s.n + 1))
            case None =>
              Some(SessionState(e.tsMicros, e.tsMicros, 1))
          }
        }
        st.foreach(state.update)
        out.iterator
      }
  }
}
