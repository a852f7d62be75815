package graft.indices

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-wise physical converters — the engine's equivalent of
  * `xclim/indices/converters.py` (2902 LoC of scalar formulas): every one is
  * a pure codegen'd Column expression (no UDFs), so they run at scan speed
  * and cost nothing extra at 100 TB. Temperatures are degC unless noted;
  * pressures hPa; winds km/h unless noted.
  */
object Converters {

  /** Saturation vapour pressure [hPa] over water, August–Roche–Magnus form
    * (method "its90" family; converters.py:492 `saturation_vapor_pressure`). */
  def saturationVaporPressure(tasC: Column): Column =
    lit(6.112) * exp(lit(17.62) * tasC / (lit(243.12) + tasC))

  /** Same over ice (Magnus coefficients for ice; converters.py:452). */
  def saturationVaporPressureIce(tasC: Column): Column =
    lit(6.112) * exp(lit(22.46) * tasC / (lit(272.62) + tasC))

  /** `vapor_pressure`: actual vapour pressure [hPa] from dewpoint (converters.py:607). */
  def vaporPressure(tdpsC: Column): Column = saturationVaporPressure(tdpsC)

  /** Relative humidity [%] from temperature + dewpoint (converters.py:702). */
  def relativeHumidity(tasC: Column, tdpsC: Column): Column =
    lit(100.0) * vaporPressure(tdpsC) / saturationVaporPressure(tasC)

  /** Dewpoint [degC] from vapour pressure [hPa] (inverse Magnus;
    * converters.py:1025 `dewpoint_from_specific_humidity` family). */
  def dewpointFromVaporPressure(eHpa: Column): Column = {
    val lnRatio = log(eHpa / 6.112)
    lit(243.12) * lnRatio / (lit(17.62) - lnRatio)
  }

  /** Humidex (Masterton & Richardson 1979; converters.py:76): tas +
    * 5/9 * (e - 10), e in hPa from dewpoint. */
  def humidex(tasC: Column, tdpsC: Column): Column =
    tasC + lit(5.0 / 9.0) * (vaporPressure(tdpsC) - 10.0)

  /** US NWS heat index [degC] (Rothfusz 1990 regression, applied unguarded;
    * converters.py:176 `heat_index`). Inputs degC, RH %. */
  def heatIndex(tasC: Column, hurs: Column): Column = {
    val tF = tasC * 1.8 + 32.0
    val hiF = lit(-42.379) + lit(2.04901523) * tF + lit(10.14333127) * hurs -
      lit(0.22475541) * tF * hurs - lit(6.83783e-3) * tF * tF -
      lit(5.481717e-2) * hurs * hurs + lit(1.22874e-3) * tF * tF * hurs +
      lit(8.5282e-4) * tF * hurs * hurs - lit(1.99e-6) * tF * tF * hurs * hurs
    (hiF - 32.0) / 1.8
  }

  /** wind_chill_index [degC], Environment Canada / NWS 2001 formulation
    * (converters.py:1663): tas degC, wind km/h at 10 m. */
  def windChill(tasC: Column, sfcWindKmh: Column): Column = {
    val v016 = pow(sfcWindKmh, 0.16)
    lit(13.12) + lit(0.6215) * tasC - lit(11.37) * v016 + lit(0.3965) * tasC * v016
  }

  /** Daily mean from min/max (converters.py:243 `tas_from_tasmin_tasmax`). */
  def tasMidpoint(tasmin: Column, tasmax: Column): Column = (tasmin + tasmax) / 2.0

  /** Wind speed [m/s] + direction [deg] from u/v components
    * (converters.py:273 `uas_vas_to_sfcwind`). */
  def windSpeedFromUV(uas: Column, vas: Column): Column = sqrt(uas * uas + vas * vas)
  def windDirFromUV(uas: Column, vas: Column): Column =
    pmod(lit(180.0) + degrees(atan2(uas, vas)), lit(360.0))

  /** Binary-threshold snowfall approximation (converters.py:1088, method
    * "binary"): all precip is snow below tasC <= 0. */
  def snowfallApproxBinary(pr: Column, tasC: Column): Column =
    when(tasC <= 0.0, pr).otherwise(0.0)

  def rainApproxBinary(pr: Column, tasC: Column): Column =
    when(tasC > 0.0, pr).otherwise(0.0)

  /** Snow depth <-> snow water equivalent via bulk density [kg/m3]
    * (converters.py:1377 `snd_to_snw` / :1420 `snw_to_snd`). */
  def sndToSnw(sndM: Column, density: Column): Column = sndM * density
  def snwToSnd(snwKgM2: Column, density: Column): Column = snwKgM2 / density

  /** `clearness_index`: surface / extraterrestrial shortwave
    * (converters.py:1589). */
  def clearnessIndex(rsds: Column, extra: Column): Column = rsds / extra

  /** `wind_profile`: power-law extrapolation (converters.py:2743). */
  def windProfile(windRef: Column, hRef: Column, h: Column, alpha: Column): Column =
    windRef * pow(h / hRef, alpha)

  /** `water_budget`: precip - evapotranspiration (converters.py:2652). */
  def waterBudget(pr: Column, evspsbl: Column): Column = pr - evspsbl

  /** Solar declination [rad] by day-of-year (helpers.py:119, simple
    * Cooper/spencer form). */
  def solarDeclination(doy: Column): Column =
    lit(0.409) * sin(lit(2.0 * math.Pi / 365.0) * doy - lit(1.39))

  /** distance_from_sun (helpers.py:65, Astronomical Almanac 1985):
    * sun-earth distance [AU] from days since J2000.0 noon. */
  def distanceFromSun(date: Column): Column = {
    val daysSince = datediff(date, to_date(lit("2000-01-01"))).cast("double") - 0.5
    val g = pmod(lit(357.528) + lit(0.9856003) * daysSince, lit(360.0)) * math.Pi / 180.0
    lit(1.00014) - lit(0.01671) * cos(g) - lit(0.00014) * cos(lit(2.0) * g)
  }

  /** time_correction_for_solar_angle (helpers.py:166, Di Napoli 2020):
    * equation-of-time correction [rad, wrapped to (−π, π]] from the day
    * angle (1° of rotation = 4 minutes). */
  def timeCorrectionForSolarAngle(doy: Column, daysInYear: Column): Column = {
    val da = lit(2.0 * math.Pi) * (doy.cast("double") - 1.0) / daysInYear.cast("double")
    val tcDeg = lit(0.004297) + lit(0.107029) * cos(da) - lit(1.837877) * sin(da) -
      lit(0.837378) * cos(lit(2.0) * da) - lit(2.340475) * sin(lit(2.0) * da)
    val tcRad = radians(tcDeg)
    pmod(tcRad + math.Pi, lit(2.0 * math.Pi)) - math.Pi // wrap to (-pi, pi]
  }

  /** Growing-season day-length sum [h] over [doyStart, doyEnd] for a
    * latitude — the Σ dayLength term of the Jones/Gladstones day-length
    * latitude coefficients (helpers.py:688 docstring, Jday 103..284).
    * A fold over the doy sequence: evaluate once per DISTINCT latitude
    * (dim table) and broadcast, not per daily row. */
  def seasonDayLengthSum(latDeg: Column, doyStart: Int = 103, doyEnd: Int = 284): Column =
    aggregate(sequence(lit(doyStart), lit(doyEnd)), lit(0.0),
      (acc, d) => acc + dayLength(latDeg, d.cast("int")))

  /** jones_day_length_latitude_coefficient (helpers.py:688, Hall & Jones
    * 2010): k = 2.8311e-4 · ΣdayLength + 0.30834, optionally floored at 1. */
  def jonesDayLengthCoefficient(latDeg: Column, floorAtOne: Boolean = true): Column = {
    val k = lit(2.8311e-4) * seasonDayLengthSum(latDeg) + lit(0.30834)
    if (floorAtOne) greatest(k, lit(1.0)) else k
  }

  /** gladstones_day_length_latitude_coefficient (helpers.py:618):
    * k_gladstones = 1.1135 · k_jones − 0.1352. */
  def gladstonesDayLengthCoefficient(latDeg: Column, floorAtOne: Boolean = true): Column = {
    val k = lit(1.1135) * jonesDayLengthCoefficient(latDeg, floorAtOne = false) - lit(0.1352)
    if (floorAtOne) greatest(k, lit(1.0)) else k
  }

  /** Astronomical day length [h] for latitude [deg] and day-of-year
    * (helpers.py:450 `day_lengths`): 24/pi * hourAngle, with the sunset hour
    * angle clamped for polar day/night. */
  def dayLength(latDeg: Column, doy: Column): Column = {
    val decl = solarDeclination(doy)
    val latR = radians(latDeg)
    val cosH = -tan(latR) * tan(decl)
    val h = acos(greatest(lit(-1.0), least(lit(1.0), cosH)))
    lit(24.0 / math.Pi) * h
  }

  /** The full saturation-vapour-pressure method family
    * (converters.py:390-490): Magnus-form coefficient table
    * (tetens30/wmo08/buck81/aerk96 incl. "ecmwf" = buck81), plus the
    * series forms sonntag90 / goffgratch46 / its90, each over water or
    * ice, with the `ice_thresh` phase dispatch and the `interp_power`
    * water-fraction mixing. tas in K, output Pa; pure scalar Columns. */
  private val esatMagnus: Map[String, Map[String, (Double, Double, Double)]] = Map(
    "tetens30" -> Map("water" -> (610.78, 17.269388, -35.86), "ice" -> (610.78, 21.8745584, -7.66)),
    "wmo08"    -> Map("water" -> (611.2, 17.62, -30.04),      "ice" -> (611.2, 22.46, -0.54)),
    "buck81"   -> Map("water" -> (611.21, 17.502, -32.19),    "ice" -> (611.15, 22.542, 0.32)),
    "aerk96"   -> Map("water" -> (610.94, 17.625, -30.12),    "ice" -> (611.21, 22.587, 0.7)))

  def esatOverWater(tasK: Column, method: String): Column = method match {
    case "ecmwf" => esatOverWater(tasK, "buck81")
    case "sonntag90" =>
      lit(100.0) * exp(lit(-6096.9385) / tasK + lit(16.635794)
        - lit(2.711193e-2) * tasK + lit(1.673952e-5) * tasK * tasK
        + lit(2.433502) * log(tasK))
    case "goffgratch46" =>
      val tb = 373.16
      lit(101325.0) * pow(lit(10.0),
        lit(-7.90298) * (lit(tb) / tasK - 1.0) + lit(5.02808) * log10(lit(tb) / tasK)
          - lit(1.3817e-7) * (pow(lit(10.0), lit(11.344) * (lit(1.0) - tasK / tb)) - 1.0)
          + lit(8.1328e-3) * (pow(lit(10.0), lit(-3.49149) * (lit(tb) / tasK - 1.0)) - 1.0))
    case "its90" =>
      exp(lit(-2836.5744) / (tasK * tasK) - lit(6028.076559) / tasK + lit(19.54263612)
        - lit(2.737830188e-2) * tasK + lit(1.6261698e-5) * tasK * tasK
        + lit(7.0229056e-10) * tasK * tasK * tasK
        - lit(1.8680009e-13) * tasK * tasK * tasK * tasK + lit(2.7150305) * log(tasK))
    case m =>
      val (a, b, c) = esatMagnus(m)("water")
      lit(a) * exp(lit(b) * (tasK - 273.16) / (tasK + c))
  }

  def esatOverIce(tasK: Column, method: String): Column = method match {
    case "ecmwf" => esatOverIce(tasK, "aerk96")
    case "sonntag90" =>
      lit(100.0) * exp(lit(-6024.5282) / tasK + lit(24.7219)
        + lit(1.0613868e-2) * tasK - lit(1.3198825e-5) * tasK * tasK
        - lit(0.49382577) * log(tasK))
    case "goffgratch46" =>
      val tp = 273.16
      lit(611.73) * pow(lit(10.0),
        lit(-9.09718) * (lit(tp) / tasK - 1.0) - lit(3.56654) * log10(lit(tp) / tasK)
          + lit(0.876793) * (lit(1.0) - tasK / tp))
    case "its90" =>
      exp(lit(-5866.6426) / tasK + lit(22.32870244) + lit(1.39387003e-2) * tasK
        - lit(3.4262402e-5) * tasK * tasK + lit(2.7040955e-8) * tasK * tasK * tasK
        + lit(6.7063522e-1) * log(tasK))
    case m =>
      val (a, b, c) = esatMagnus(m)("ice")
      lit(a) * exp(lit(b) * (tasK - 273.16) / (tasK + c))
  }

  /** Phase-dispatched e_sat (converters.py:340 `saturation_vapor_pressure`):
    * water above `iceThreshK`, ice below; with `interpPower` n, a smooth
    * mix over [iceThreshK - interpRange, iceThreshK] using the
    * water-fraction ((t - ti)/range)^n. */
  def saturationVaporPressureMethod(tasK: Column, method: String,
                                    iceThreshK: Option[Double] = None,
                                    interpPower: Option[Int] = None,
                                    interpRangeK: Double = 23.15): Column = {
    val water = esatOverWater(tasK, method)
    iceThreshK match {
      case None => water
      case Some(ti) =>
        val ice = esatOverIce(tasK, method)
        interpPower match {
          case None => when(tasK >= ti, water).otherwise(ice)
          case Some(n) =>
            val frac = pow(greatest(lit(0.0),
              least((tasK - (ti - interpRangeK)) / interpRangeK, lit(1.0))), n)
            frac * water + (lit(1.0) - frac) * ice
        }
    }
  }

  /** specific_humidity (converters.py:847, WMO 2008): q = w/(1+w) with
    * w = 0.62198 e_sat/(ps − e_sat) · hurs. Inputs: tas degC, hurs 0-1,
    * ps Pa; e_sat from the Magnus form (hPa -> Pa x100). */
  def specificHumidity(tasC: Column, hursFrac: Column, psPa: Column): Column = {
    val eSat = saturationVaporPressure(tasC) * 100.0
    val wSat = lit(0.62198) * eSat / (psPa - eSat)
    val w = wSat * hursFrac
    w / (lit(1.0) + w)
  }

  /** specific_humidity_from_dewpoint (converters.py:952):
    * q = ε e/(ps − e(1−ε)), e = e_sat(tdps). */
  def specificHumidityFromDewpoint(tdpsC: Column, psPa: Column): Column = {
    val e = saturationVaporPressure(tdpsC) * 100.0
    lit(0.62198) * e / (psPa - e * (1.0 - 0.62198))
  }

  /** dewpoint_from_specific_humidity (converters.py:1040): invert the
    * Magnus form: e = q ps/(ε + q(1−ε)), td = 243.12 x/(17.62 − x),
    * x = ln(e/611.2). Output degC. */
  def dewpointFromSpecificHumidity(huss: Column, psPa: Column): Column = {
    val e = huss * psPa / (lit(0.62198) + huss * (1.0 - 0.62198))
    val x = log(e / 611.2)
    lit(243.12) * x / (lit(17.62) - x)
  }

  /** vapor_pressure_deficit (converters.py:642): VPD = e_sat(tas) · (1 −
    * hurs/100), in Pa. e_sat from the Magnus-form family (hPa → Pa ×100),
    * optionally ice-dispatched below `iceThreshK`. */
  def vaporPressureDeficit(tasK: Column, hursPct: Column,
                           method: String = "wmo08",
                           iceThreshK: Option[Double] = None): Column =
    saturationVaporPressureMethod(tasK, method, iceThreshK) *
      (lit(1.0) - hursPct / 100.0)

  /** sfcwind_to_uas_vas (converters.py:337): wind components from speed +
    * meteorological direction ("from", 360 = North). The math-convention
    * angle is (270 − dir) mod 360; uas = V cos θ, vas = V sin θ. */
  def uasFromWindDir(sfcWind: Column, fromDirDeg: Column): Column =
    sfcWind * cos(radians((lit(270.0) - fromDirDeg) % 360.0))

  def vasFromWindDir(sfcWind: Column, fromDirDeg: Column): Column =
    sfcWind * sin(radians((lit(270.0) - fromDirDeg) % 360.0))

  /** clausius_clapeyron_scaled_precipitation (converters.py:1751):
    * pr · factor^Δtas (default 7 %/K). */
  def clausiusClapeyronScaledPrecipitation(prBaseline: Column, deltaTasK: Column,
                                           ccScaleFactor: Double = 1.07): Column =
    prBaseline * pow(lit(ccScaleFactor), deltaTasK)

  /** longwave_upwelling_radiation_from_net_downwelling /
    * shortwave_upwelling_radiation_from_net_downwelling
    * (converters.py:1543,:1566): rlus = rlds − rls, rsus = rsds − rss. */
  def upwellingFromNetDownwelling(down: Column, net: Column): Column = down - net

  /** shortwave_downwelling_radiation_from_clearness_index
    * (converters.py:1627): rsds = ci · extraterrestrial. */
  def shortwaveFromClearness(ci: Column, extra: Column): Column = ci * extra

  /** wind_power_potential (converters.py:2804, Tobin 2018): idealized
    * 4-regime power curve; optional air-density speed scaling
    * (ρ/1.225)^(1/3). */
  def windPowerPotential(windMs: Column, cutIn: Double = 3.5, rated: Double = 13.0,
                         cutOut: Double = 25.0, airDensity: Option[Column] = None): Column = {
    val v = airDensity.map(rho => windMs * pow(rho / 1.225, 1.0 / 3.0)).getOrElse(windMs)
    when(v < cutIn, 0.0)
      .when(v < rated,
        (pow(v, 3.0) - math.pow(cutIn, 3)) / (math.pow(rated, 3) - math.pow(cutIn, 3)))
      .when(v < cutOut, 1.0)
      .otherwise(0.0)
  }

  /** `prsn_to_prsnd` / `prsnd_to_prsn` (mass flux <-> liquid-water-equivalent snowfall rate):
    * converters.py:1461,:1502; fixed snow density [kg m-3]. */
  def prsnToPrsnd(prsn: Column, snowDensity: Double = 100.0): Column =
    prsn / snowDensity
  def prsndToPrsn(prsnd: Column, snowDensity: Double = 100.0): Column =
    prsnd * snowDensity

  /** rain_approximation (converters.py:1255): liquid part of total precip
    * under the binary-phase split at `threshC`. */
  def rainApproximation(pr: Column, tasC: Column, threshC: Double = 0.0): Column =
    when(tasC >= threshC, pr).otherwise(0.0)

  /** snowfall_approximation (converters.py:1097) solid-phase fraction:
    * "binary" step at the threshold, "brown" linear ramp over
    * [thresh, thresh+2], "auer" degree-6 CLASS polynomial over
    * [thresh, thresh+6] (evaluated directly rather than through the
    * reference's interpolation nodes — same curve). */
  def snowfallFraction(tasC: Column, method: String, threshC: Double = 0.0): Column = {
    val d = tasC - threshC
    method match {
      case "binary" => when(d < 0.0, 1.0).otherwise(0.0)
      case "brown"  => greatest(lit(0.0), least(lit(1.0), lit(1.0) - d / 2.0))
      case "auer" =>
        val poly = lit(100.0) + lit(4.6664) * d - lit(15.038) * d * d -
          lit(1.5089) * d * d * d + lit(2.0399) * d * d * d * d -
          lit(0.366) * d * d * d * d * d + lit(0.0202) * d * d * d * d * d * d
        when(d < 0.0, 1.0).when(d >= 6.0, 0.0)
          .otherwise(greatest(lit(0.0), least(lit(100.0), poly)) / 100.0)
      case other => throw new IllegalArgumentException(s"bad method: $other")
    }
  }

  def snowfallApproximation(pr: Column, tasC: Column, method: String = "binary",
                            threshC: Double = 0.0): Column =
    pr * snowfallFraction(tasC, method, threshC)

  /** Dai (2008) hyperbolic-tangent phase fractions — the
    * `dai_annual`/`dai_seasonal` methods of snowfall_approximation
    * (converters.py:1197-1246) and rain_approximation (:1320-1363):
    * f(T) = a·(tanh(b·(T − c)) − d)/100 with coefficients per land/ocean
    * and (seasonal method) per DJF/MAM/JJA/SON. Snow and rain fractions do
    * not sum to 1 — the remainder is sleet. With `clipTempC` Tc the snow
    * fraction is rescaled (f(T) − f(Tc))/(f(−Tc) − f(Tc)) and the rain
    * fraction (f(T) − f(−Tc))/(f(Tc) − f(−Tc)); both are clipped to [0,1].
    * Seasonal selection is a when-chain on the month column, so the whole
    * family stays a codegen'd projection. */
  private type Dai4 = (Double, Double, Double, Double)
  // (a, b, c, d) per season DJF/MAM/JJA/SON; annual = one row
  private val daiSnowAnnual = Map(
    true  -> (-48.2292, 0.7205, 1.1662, 1.0223),
    false -> (-47.1472, 0.4049, 1.9280, 1.0203))
  private val daiSnowSeasonal: Map[Boolean, Seq[Dai4]] = Map(
    true -> Seq((-48.2372, 0.7449, 1.0919, 1.0209), (-48.2493, 0.6634, 1.3388, 1.0270),
      (-46.4000, 0.7013, 0.8362, 1.0217), (-48.3251, 0.7798, 1.1502, 1.0180)),
    false -> Seq((-47.1823, 0.4003, 2.1735, 1.0255), (-47.0035, 0.4090, 1.7372, 1.0226),
      (-47.1472, 0.4049, 1.9280, 1.0203), (-46.8494, 0.4162, 2.0474, 1.0155)))
  private val daiRainAnnual = Map(
    true  -> (-47.8337, -0.6866, 1.4913, 1.0420),
    false -> (-47.3041, -0.4263, 2.5687, 1.0784))
  private val daiRainSeasonal: Map[Boolean, Seq[Dai4]] = Map(
    true -> Seq((-47.5770, -0.6856, 1.3942, 1.0438), (-47.9077, -0.6603, 1.6927, 1.0358),
      (-46.8303, -0.6595, 1.1582, 1.1056), (-48.0315, -0.7663, 1.4640, 1.0412)),
    false -> Seq((-47.0262, -0.4360, 2.8572, 1.0731), (-47.2828, -0.4299, 2.3397, 1.0800),
      (-47.3041, -0.4263, 2.5687, 1.0784), (-47.2107, -0.4280, 2.7118, 1.0911)))

  private def daiSeasonSelect(seasonal: Seq[Dai4], month: Column,
                              pick: Dai4 => Double): Column =
    when(month.isin(12, 1, 2), pick(seasonal(0)))
      .when(month.between(3, 5), pick(seasonal(1)))
      .when(month.between(6, 8), pick(seasonal(2)))
      .otherwise(pick(seasonal(3)))

  private def daiFraction(tasC: Column, annual: Option[Dai4], seasonal: Option[(Seq[Dai4], Column)],
                          clipTempC: Option[Double], snow: Boolean): Column = {
    val (a, b, c, d) = (annual, seasonal) match {
      case (Some((a0, b0, c0, d0)), _) => (lit(a0), lit(b0), lit(c0), lit(d0))
      case (None, Some((tab, month))) =>
        (daiSeasonSelect(tab, month, _._1), daiSeasonSelect(tab, month, _._2),
          daiSeasonSelect(tab, month, _._3), daiSeasonSelect(tab, month, _._4))
      case _ => throw new IllegalArgumentException("dai: need annual or seasonal coefficients")
    }
    def f(t: Column): Column = a * (tanh(b * (t - c)) - d) / 100.0
    val frac = clipTempC match {
      case None => f(tasC)
      case Some(tc) =>
        val (fmin, fmax) = if (snow) (f(lit(tc)), f(lit(-tc))) else (f(lit(-tc)), f(lit(tc)))
        (f(tasC) - fmin) / (fmax - fmin)
    }
    greatest(lit(0.0), least(lit(1.0), frac))
  }

  /** Snow fraction of total precip, Dai methods. `monthCol` is required for
    * `dai_seasonal` (any 1-12 month column; season = meteorological). */
  def snowfallFractionDai(tasC: Column, method: String, land: Boolean = true,
                          monthCol: Column = lit(1), clipTempC: Option[Double] = None): Column =
    method match {
      case "dai_annual"   => daiFraction(tasC, Some(daiSnowAnnual(land)), None, clipTempC, snow = true)
      case "dai_seasonal" => daiFraction(tasC, None, Some((daiSnowSeasonal(land), monthCol)), clipTempC, snow = true)
      case other          => throw new IllegalArgumentException(s"bad dai method: $other")
    }

  /** Rain fraction of total precip, Dai methods (converters.py:1320). */
  def rainFractionDai(tasC: Column, method: String, land: Boolean = true,
                      monthCol: Column = lit(1), clipTempC: Option[Double] = None): Column =
    method match {
      case "dai_annual"   => daiFraction(tasC, Some(daiRainAnnual(land)), None, clipTempC, snow = false)
      case "dai_seasonal" => daiFraction(tasC, None, Some((daiRainSeasonal(land), monthCol)), clipTempC, snow = false)
      case other          => throw new IllegalArgumentException(s"bad dai method: $other")
    }

  /** relative_humidity method "bohren98" (converters.py:810, Bohren &
    * Albrecht 1998 via Lawrence 2005): RH = 100·exp(−L(T − Td)/(R_w·T·Td))
    * with L = 2.501e6 J/kg, R_w = 461.5 J/(kg·K); T, Td in K; clipped to
    * [0, 100] like the reference's `invalid_values="clip"` default. */
  def relativeHumidityBohren98(tasK: Column, tdpsK: Column): Column =
    greatest(lit(0.0), least(lit(100.0),
      lit(100.0) * exp(lit(-2.501e6) * (tasK - tdpsK) / (lit(461.5) * tasK * tdpsK))))

  /** Daily -> hourly temperature upsampling (helpers.py:1059
    * `make_hourly_temperature`, used by the chill models): explode 24 rows
    * per day with a sine ramp from tasmin (sunrise) to tasmax (mid-
    * afternoon) and a linear night decay — the row-generator pattern for
    * frequency upsampling. Input frame needs (tasmin, tasmax) columns; adds
    * `hour` and `tas_hourly`. */
  def hourlyTemperature(df: org.apache.spark.sql.DataFrame,
                        tasmin: String, tasmax: String): org.apache.spark.sql.DataFrame = {
    val h = col("hour").cast("double")
    val tmin = col(tasmin); val tmax = col(tasmax)
    val day = sin(lit(math.Pi) * (h - 6.0) / 12.0) // 0 at 6h, 1 at 12h... sine arc 6h-18h
    df.withColumn("hour", explode(sequence(lit(0), lit(23))))
      .withColumn("tas_hourly",
        when(h.between(6.0, 18.0), tmin + (tmax - tmin) * day)
          .otherwise(tmin + (tmax - tmin) * 0.1 * greatest(lit(0.0),
            lit(1.0) - abs(h - 18.0) / 12.0)))
  }
}
