package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFC 9309 Robots Exclusion Protocol — the crawl-politeness filter in
  * front of every fetch list: parse per-host `robots.txt` bodies into
  * rule groups and keep only the URLs the selected user-agent may fetch.
  *
  * Decision semantics per the RFC: the group(s) whose `User-agent` line
  * matches the crawler exactly (case-insensitive) govern; absent any,
  * the `*` groups do. Among matching rules the LONGEST pattern wins;
  * an allow/disallow tie at equal length resolves to allow; no matching
  * rule means allowed. Patterns are anchored prefixes with `*` and `$`
  * ([[graft.functions.RobotsMatch]]).
  *
  * Scale shape: a rule table is per-HOST sized (a few rules per domain —
  * broadcast scale by nature, like the codebooks and analog targets
  * elsewhere in this engine), so [[filterAllowed]] folds it into a
  * host→rules map LITERAL and decides per row with zero additional
  * shuffle: lookup, filter by match, take the lexicographic max of
  * (plen, allow). The per-host arrays are small, so the higher-order
  * filter/max re-evaluation cost is bounded. URLs never shuffle at all.
  *
  * Lenient parse per RFC §2.2: unknown fields and malformed lines are
  * ignored, field names are case-insensitive, `#` starts a comment,
  * empty Disallow means "allow all" (no rule emitted).
  */
object Robots {

  /** One robots.txt body → (agent, allow, pattern) rules. */
  def parseRules(body: String): Seq[(String, Boolean, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, String)]
    var agents = List.empty[String]
    var inGroup = false // false while still collecting user-agent lines
    body.linesIterator.foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case h  => raw.substring(0, h).trim
      }
      line.split(":", 2) match {
        case Array(k, v) =>
          val key = k.trim.toLowerCase
          val value = v.trim
          key match {
            case "user-agent" =>
              if (inGroup) { agents = Nil; inGroup = false }
              if (value.nonEmpty) agents ::= value.toLowerCase
            case "allow" | "disallow" =>
              inGroup = true
              if (value.nonEmpty && agents.nonEmpty)
                agents.foreach(a => out += ((a, key == "allow", value)))
            case _ => inGroup = agents.nonEmpty // sitemap etc.: ignored
          }
        case _ => // blank/malformed line: ignored
      }
    }
    out.toSeq
  }

  /** (host, body) robots table → (host, allow, pattern, plen) rules for
    * `agent`, applying the RFC group-selection rule per host: the
    * exact-agent groups when any exist, else the `*` groups. */
  def rulesFor(robots: DataFrame, agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    val a = agent.toLowerCase
    val parsed = robots.select(col("host"), col("body")).as[(String, String)]
      .flatMap { case (host, body) =>
        parseRules(Option(body).getOrElse(""))
          .filter(r => r._1 == a || r._1 == "*")
          .map { case (ag, allow, pat) => (host, ag == a, allow, pat) }
      }.toDF("host", "exact", "allow", "pattern")
    parsed
      .withColumn("_any_exact", max(when(col("exact"), 1).otherwise(0))
        .over(Window.partitionBy(col("host"))))
      .filter(col("exact") === (col("_any_exact") === 1))
      .select(col("host"), col("allow"), col("pattern"),
        length(col("pattern")).as("plen"))
  }

  /** Keep the rows of `urls` whose `urlCol` the rules permit. The URL is
    * canonicalized first so rule matching sees the dedup-normal form.
    * `rules` must be (host, allow, pattern, plen) — it is collected into
    * a literal host→rules map (per-host rule tables are broadcast-scale
    * by contract; pre-trim per-host with a join first if yours is not). */
  def filterAllowed(urls: DataFrame, urlCol: Column, rules: DataFrame): DataFrame = {
    val perHost: Map[String, Array[(Int, Boolean, String)]] = rules
      .select(col("host"), col("plen").cast("int"), col("allow"), col("pattern"))
      .collect()
      .map(r => (r.getString(0), (r.getInt(1), r.getBoolean(2), r.getString(3))))
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2) }
    if (perHost.isEmpty) return urls
    val rulesMap = map(perHost.toSeq.flatMap { case (h, rs) =>
      Seq(lit(h), array(rs.map { case (plen, allow, pat) =>
        struct(lit(plen).as("plen"), lit(allow).as("allow"),
          lit(pat).as("pattern"))
      }.toIndexedSeq: _*))
    }: _*)
    val u = graft.functions.UrlNormalize.urlNormalize(urlCol)
    val hostRe = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"
    val path = regexp_replace(u, "^[a-z][a-z0-9+.-]*://[^/]*", "")
    val matched = filter(element_at(rulesMap, regexp_extract(u, hostRe, 1)),
      r => graft.functions.RobotsMatch.robotsMatch(path, r.getField("pattern")))
    // array_max orders structs field-by-field: longest plen first, allow
    // beating disallow on equal length; empty/missing → null → allowed
    urls.filter(coalesce(array_max(matched).getField("allow"), lit(true)))
  }
}
