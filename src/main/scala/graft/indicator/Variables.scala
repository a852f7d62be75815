package graft.indicator

/** Canonical variable vocabulary — the engine's twin of the reference's
  * `data/variables.yml` (CMIP6 names, canonical units, standard names),
  * used by cfchecks and by indicator input resolution.
  */
object Variables {

  final case class Variable(name: String, canonicalUnits: String,
                            standardName: String, dimensionality: String)

  val all: Map[String, Variable] = Seq(
    Variable("tas", "K", "air_temperature", "[temperature]"),
    Variable("tasmin", "K", "air_temperature", "[temperature]"),
    Variable("tasmax", "K", "air_temperature", "[temperature]"),
    Variable("pr", "kg m-2 s-1", "precipitation_flux", "[precipitation]"),
    Variable("prsn", "kg m-2 s-1", "snowfall_flux", "[precipitation]"),
    Variable("snd", "m", "surface_snow_thickness", "[length]"),
    Variable("snw", "kg m-2", "surface_snow_amount", "[]"),
    Variable("sfcWind", "m/s", "wind_speed", "[speed]"),
    Variable("sfcWindmax", "m/s", "wind_speed", "[speed]"),
    Variable("hurs", "%", "relative_humidity", "[]"),
    Variable("huss", "1", "specific_humidity", "[]"),
    Variable("ps", "Pa", "surface_air_pressure", "[pressure]"),
    Variable("rsds", "W m-2", "surface_downwelling_shortwave_flux_in_air", "[]"),
    Variable("rlds", "W m-2", "surface_downwelling_longwave_flux_in_air", "[]"),
    Variable("evspsbl", "kg m-2 s-1", "water_evapotranspiration_flux", "[precipitation]"),
    Variable("discharge", "m3 s-1", "water_volume_transport_in_river_channel", "[]"),
    Variable("siconc", "%", "sea_ice_area_fraction", "[]")
  ).map(v => v.name -> v).toMap

  def apply(name: String): Variable =
    all.getOrElse(name, throw new NoSuchElementException(
      s"unknown variable '$name'; known: ${all.keys.toSeq.sorted.mkString(", ")}"))

  /** cfcheck: does a column's declared standard_name match the vocabulary? */
  def cfcheck(name: String, standardName: String): Boolean =
    all.get(name).forall(_.standardName == standardName)
}
