package graft.indicator

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** YAML-defined "virtual" indicator modules — the Spark twin of
  * `build_indicator_module_from_yaml` (`xclim/core/indicator.py:1761`),
  * which is how the reference materialises its icclim / anuclim / cf
  * catalogues (129 instances) from the data YAML catalogue.
  *
  * Schema (subset of the reference's):
  * {{{
  * module: icclim
  * indicators:
  *   TX90p:
  *     base: threshold_count        # a Registry.computeBases key
  *     title: Days above p90
  *     units: d
  *     parameters: { op: ">", thresh: "303.15" }
  *     input: { var: tas, dimensionality: "[temperature]", units: K }
  *     missing: any
  * }}}
  */
object VirtualModules {

  private val mapper = new ObjectMapper(new YAMLFactory())

  /** Parse a YAML document and register every indicator as
    * `<module>.<name>`. Returns the registered identifiers. */
  def loadYaml(yaml: String): Seq[String] = {
    val root = mapper.readTree(yaml)
    val module = Option(root.get("module")).map(_.asText).getOrElse("virtual")
    val inds = Option(root.get("indicators")).getOrElse(
      throw new IllegalArgumentException("yaml module needs 'indicators'"))
    inds.properties().asScala.toSeq.map { e =>
      val name = e.getKey; val node = e.getValue
      def str(k: String, dflt: String = ""): String =
        Option(node.get(k)).map(_.asText).getOrElse(dflt)
      val params = Option(node.get("parameters")).map(_.properties().asScala.map(p =>
        p.getKey -> p.getValue.asText).toMap).getOrElse(Map.empty[String, String])
      val input = Option(node.get("input"))
      val vr = VarReq(
        input.flatMap(n => Option(n.get("var"))).map(_.asText).getOrElse("value"),
        input.flatMap(n => Option(n.get("dimensionality"))).map(_.asText).getOrElse("[]"),
        input.flatMap(n => Option(n.get("units"))).map(_.asText).getOrElse("1"))
      // multi-variable entries declare their extra canonical-frame columns
      // (value2 / valuemin / valuemax) so validation + unit staging see them
      val extras = Seq("input2" -> "value2", "inputmin" -> "valuemin",
        "inputmax" -> "valuemax").flatMap { case (key, cname) =>
        Option(node.get(key)).map { n =>
          VarReq(cname,
            Option(n.get("dimensionality")).map(_.asText).getOrElse("[]"),
            Option(n.get("units")).map(_.asText).getOrElse("1"))
        }
      }
      val id = s"$module.$name"
      val spec = IndicatorSpec(
        identifier = id,
        title = str("title", name),
        units = str("units", "1"),
        standardName = str("standard_name"),
        cellMethods = str("cell_methods"),
        inputs = vr.copy(name = "value") +: extras, // canonical frame columns
        missing = str("missing", "any"))
      Registry.fromConfig(spec, str("base", "resample_mean"), params)
      id
    }
  }

  def loadYamlFile(path: String): Seq[String] =
    loadYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** Load a catalogue bundled on the classpath (src/main/resources/modules). */
  def loadBundled(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/modules/$name.yml")
    require(in != null, s"no bundled module '$name'")
    try loadYaml(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}
