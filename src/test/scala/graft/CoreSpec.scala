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

  test("offset algebra: compare_offsets and is_offset_divisor") {
    assert(Time.compareOffsets("YS", ">", "MS"))
    assert(Time.compareOffsets("MS", "<", "2MS"))
    assert(Time.compareOffsets("QS-DEC", "==", "QS-JAN")) // same-unit: multiplier only
    assert(Time.compareOffsets("D", "<=", "W"))
    assert(Time.compareOffsets("YS", "!=", "QS"))
    // the reference's doc examples (calendar.py:649-656)
    assert(Time.isOffsetDivisor("QS-JAN", "YS"))
    assert(!Time.isOffsetDivisor("QS-DEC", "YS-JUL"))
    assert(Time.isOffsetDivisor("D", "M"))
    assert(Time.isOffsetDivisor("MS", "QS-JAN"))
    assert(Time.isOffsetDivisor("QS-OCT", "YS-JUL")) // anchors congruent mod 3
    assert(!Time.isOffsetDivisor("YS", "MS"))        // bigger than the offset
    assert(Time.isOffsetDivisor("h", "D"))
    assert(!Time.isOffsetDivisor("W", "MS"))         // weeks never tile months
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

  test("special functions: gamma CDF and probit against known values") {
    import graft.functions.SpecialMath._
    // P(1, x) = 1 - e^-x exactly
    for (x <- Seq(0.1, 1.0, 2.5, 10.0))
      assert(math.abs(gammaP(1.0, x) - (1.0 - math.exp(-x))) < 1e-12)
    // P(1/2, x) = erf(sqrt(x)): erf(sqrt(0.5)) = 0.6826894921370859
    assert(math.abs(gammaP(0.5, 0.5) - 0.6826894921370859) < 1e-10)
    // scipy.special.gammainc(3.0, 2.0) = 0.32332358381693654
    assert(math.abs(gammaP(3.0, 2.0) - 0.32332358381693654) < 1e-10)
    assert(gammaP(2.0, 0.0) == 0.0)
    // probit
    assert(math.abs(probit(0.5)) < 1e-12)
    assert(math.abs(probit(0.975) - 1.959963984540054) < 1e-8)
    assert(math.abs(probit(0.025) + 1.959963984540054) < 1e-8)
    assert(probit(0.0).isNegInfinity && probit(1.0).isPosInfinity)
    // logGamma: ln((5-1)!) = ln 24
    assert(math.abs(logGamma(5.0) - math.log(24.0)) < 1e-12)
  }

  test("inverse gamma CDF (ppf) round-trips and hits known values") {
    import graft.functions.SpecialMath._
    // exponential special case: P(1, x) = 1 - e^-x -> ppf(p) = -ln(1-p)
    for (p <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(gammaPInv(1.0, p) + math.log(1.0 - p)) < 1e-9)
    // median of gamma(shape=2, scale=1): scipy gammaincinv(2, 0.5) = 1.67834699...
    assert(math.abs(gammaPInv(2.0, 0.5) - 1.6783469900166605) < 1e-6)
    // round trip across shapes
    for (a <- Seq(0.5, 1.7, 6.0); p <- Seq(0.05, 0.5, 0.99))
      assert(math.abs(gammaP(a, gammaPInv(a, p)) - p) < 1e-9, s"a=$a p=$p")
  }

  test("digamma / trigamma / gamma MLE shape") {
    import graft.functions.SpecialMath._
    assert(math.abs(digamma(1.0) + 0.5772156649015329) < 1e-12)   // -Euler gamma
    assert(math.abs(digamma(2.0) - (1.0 - 0.5772156649015329)) < 1e-12)
    assert(math.abs(trigamma(1.0) - math.Pi * math.Pi / 6.0) < 1e-10)
    // MLE stationarity: ln(a) - psi(a) = s at the returned shape
    for (s <- Seq(0.01, 0.1, 0.5, 2.0)) {
      val a = gammaMleShape(s)
      assert(math.abs(math.log(a) - digamma(a) - s) < 1e-9, s"s=$s a=$a")
    }
    assert(gammaMleShape(-1.0).isNaN)
  }

  test("agg units rules") {
    assert(Units.aggUnits("K", "count") == "d")
    assert(Units.aggUnits("K", "integral") == "K d")
    assert(Units.aggUnits("K", "mean") == "K")
  }
}
