package graft

import graft.core.{Time, Units}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-free unit tests of the pure-Scala core (freq algebra, units). */
class CoreSpec extends AnyFunSuite {

  test("freq parsing") {
    assert(Time.parse("MS") == Time.Freq(1, "MS", 0))
    assert(Time.parse("YS") == Time.Freq(1, "YS", 1))
    assert(Time.parse("YS-JUL") == Time.Freq(1, "YS", 7))
    assert(Time.parse("QS-DEC") == Time.Freq(1, "QS", 12))
    assert(Time.parse("7D") == Time.Freq(7, "D", 0))
    assert(Time.parse("h") == Time.Freq(1, "h", 0))
    assert(Time.parse("3MS") == Time.Freq(3, "MS", 0))
    assertThrows[IllegalArgumentException](Time.parse("XX"))
    assertThrows[IllegalArgumentException](Time.parse("D-JUL"))
  }

  test("unit conversions: linear, offset, hydro context") {
    val (f1, o1) = Units.conversion("degC", "K")
    assert(f1 == 1.0 && o1 == 273.15)
    val (f2, o2) = Units.conversion("K", "degC")
    assert(f2 == 1.0 && o2 == -273.15)
    val (f3, _) = Units.conversion("km/h", "m/s")
    assert(math.abs(f3 - 1000.0 / 3600.0) < 1e-12)
    // hydro: 1 kg m-2 s-1 == 86400 mm/d
    val (f4, _) = Units.conversion("kg m-2 s-1", "mm/d")
    assert(math.abs(f4 - 86400.0) < 1e-9)
    val (f5, _) = Units.conversion("mm/d", "kg m-2 s-1")
    assert(math.abs(f5 - 1.0 / 86400.0) < 1e-15)
    assertThrows[IllegalArgumentException](Units.conversion("K", "mm/d"))
  }

  test("degF round trip") {
    val (f, o) = Units.conversion("degF", "degC")
    assert(math.abs((212.0 * f + o) - 100.0) < 1e-9)
    assert(math.abs((32.0 * f + o) - 0.0) < 1e-9)
  }

  test("agg units rules") {
    assert(Units.aggUnits("K", "count") == "d")
    assert(Units.aggUnits("K", "integral") == "K d")
    assert(Units.aggUnits("K", "mean") == "K")
  }
}
