package graft.streaming

import graft.indices.Fire
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming CFFWIS — the Structured-Streaming twin of
  * `indices.Fire.cffwisCodes` (`_cffwis.py` FFMC/DMC/DC recursion): the
  * three moisture codes are carried per location ACROSS micro-batches as
  * O(1) state, so an unbounded daily weather stream yields live
  * fire-weather codes without ever rereading history. ISI/BUI/FWI are
  * pure scalar maps over the emitted codes (`Fire.initialSpreadIndex`
  * etc.) and compose downstream of this operator.
  *
  * Contract mirrors [[StatefulSpells]]: `t` is a discrete day index;
  * per-location arrival is in step order across batches (within a batch
  * any order — the kernel sorts its slice). State uses the same round8
  * quantization as the batch kernel, so a stream fed the same days in any
  * micro-batch split emits EXACTLY the batch kernel's codes.
  *
  * State is keyed by location and sharded by the state store; emission is
  * append-mode, one row per observed day.
  */
object StatefulFire {

  case class WxObs(key: Long, t: Int, temp: Double, rain: Double,
                   wind: Double, hum: Double, mth: Int, lat: Double)
  case class FireState(ffmc: Double, dmc: Double, dc: Double, lastT: Int)
  case class FireCodes(key: Long, t: Int, ffmc: Double, dmc: Double, dc: Double)

  def codes(ds: Dataset[WxObs]): Dataset[FireCodes] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[FireState, FireCodes](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, obs, state) =>
        val sorted = obs.toArray.sortBy(_.t)
        var st = state.getOption.getOrElse(
          FireState(Fire.FfmcStart, Fire.DmcStart, Fire.DcStart, Int.MinValue))
        val out = new Array[FireCodes](sorted.length)
        var i = 0
        while (i < sorted.length) {
          val o = sorted(i)
          val ffmc = Fire.round8(Fire.ffmcStep(o.temp, o.rain, o.wind, o.hum, st.ffmc))
          val dmc  = Fire.round8(Fire.dmcStep(o.temp, o.rain, o.hum, o.mth, o.lat, st.dmc))
          val dc   = Fire.round8(Fire.dcStep(o.temp, o.rain, o.mth, o.lat, st.dc))
          st = FireState(ffmc, dmc, dc, o.t)
          out(i) = FireCodes(key, o.t, ffmc, dmc, dc)
          i += 1
        }
        state.update(st)
        out.iterator
      }
  }
}
