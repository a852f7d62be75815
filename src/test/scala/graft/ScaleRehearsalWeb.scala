package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 ×10 rehearsal main for the crawl front-end (test scope, run
  * by hand — PLANS §34 discipline): WARC export → streaming re-ingest →
  * html_text → url_normalize → exact dedup at ~60× the sf0.1 document
  * count. 300k fetches (150k pages × 2 URL spellings), ~1.3 KB of markup
  * each (~400 MB of HTML through the tag/entity state machine), sharded
  * into 32 .warc.gz files so every core owns a file — the Common Crawl
  * parallelism unit. Checks the shapes that must hold at 100 TB: WARC
  * decode streams (no whole-file buffers), extraction/normalization are
  * per-row, the only shuffle is the dedup hash-agg.
  *
  *   sbt "Test/runMain graft.ScaleRehearsalWeb"
  */
object ScaleRehearsalWeb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val nPages = 150000
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_rehearsal_warc").getPath
    Option(new java.io.File(dir).listFiles()).foreach(_.foreach(_.delete()))

    // deterministic synthetic pages: ~1.2 KB body, entities + script noise
    val filler = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua ") * 8
    val pages = spark.range(nPages)
      .select(col("id"),
        concat(lit("<html><head><title>page "), col("id"),
          lit("</title><style>p{x:1}</style></head><body><h1>h "), col("id"),
          lit("</h1><!-- c --><p>" + filler + "tail &amp; &#233; doc "),
          col("id"), lit("</p><script>if(1<2){var a=\"&\";}</script>" +
            "</body></html>")).as("html"))
    val v1 = pages.select(concat(lit("HTTP://WWW.D"),
        pmod(col("id"), lit(977)), lit(".EXAMPLE.ORG:80/a/./"),
        col("id"), lit("?utm_source=x&k=1")).as("uri"),
      col("html").cast("binary").as("body"),
      lit("text/html").as("http_content_type"))
    val v2 = pages.select(concat(lit("http://www.d"),
        pmod(col("id"), lit(977)), lit(".example.org/b/../a/"),
        col("id"), lit("?k=1")).as("uri"),
      col("html").cast("binary").as("body"),
      lit("text/html").as("http_content_type"))
    val fetches = v1.unionByName(v2).repartition(32)

    time(s"WARC export (${2 * nPages} records, 32 gz files)") {
      graft.sources.Warc.write(fetches, dir)
    }
    val files = new java.io.File(dir).listFiles()
    println(f"[rehearsal] warc bytes = ${files.map(_.length).sum / 1e6}%.1f MB " +
      s"in ${files.length} files")

    val deduped = time("WARC read -> html_text -> url_normalize -> dedup") {
      graft.sources.Warc.read(spark, dir + "/*.warc.gz")
        .select(
          graft.functions.UrlNormalize.urlNormalize(col("target_uri")).as("u"),
          graft.functions.HtmlText.htmlText(col("payload").cast("string"))
            .as("txt"))
        .groupBy(col("u"), col("txt")).agg(count(lit(1)).as("copies"))
        .agg(count(lit(1)).as("pages"), sum(col("copies")).as("fetches"),
          sum(length(col("txt"))).as("chars"))
        .collect().head
    }
    require(deduped.getAs[Long]("pages") == nPages,
      s"expected $nPages pages, got ${deduped.getAs[Long]("pages")}")
    require(deduped.getAs[Long]("fetches") == 2L * nPages)
    println(s"[rehearsal] pages = ${deduped.getAs[Long]("pages")}, " +
      s"fetches = ${deduped.getAs[Long]("fetches")}, " +
      f"extracted chars = ${deduped.getAs[Long]("chars") / 1e6}%.1f M")

    // robots filter at 150k distinct hosts (r11): the rules frame arrives
    // via one broadcast hash join, never a plan literal — 600k URLs, 4
    // path classes, 3 rules/host. Expected keep rate: /public/ and
    // /private/pub/ pass, /private/ and *.tmp are blocked -> exactly half.
    val nHosts = 150000L
    val robotsBody = "User-agent: *\nDisallow: /private/\n" +
      "Allow: /private/pub/\nDisallow: /*.tmp$"
    val robots = spark.range(nHosts).select(
      concat(lit("d"), col("id"), lit(".example.org")).as("host"),
      lit(robotsBody).as("body"))
    val rules = graft.pipeline.Robots.rulesFor(robots, "graftbot")
    val urls = spark.range(4 * nHosts).select(col("id"),
      concat(lit("http://d"), pmod(col("id"), lit(nHosts)),
        lit(".example.org"),
        when(pmod(col("id"), lit(4)) === 0, lit("/public/x"))
          .when(pmod(col("id"), lit(4)) === 1, lit("/private/x"))
          .when(pmod(col("id"), lit(4)) === 2, lit("/private/pub/x"))
          .otherwise(lit("/files/x.tmp"))).as("u"))
    val kept = time(s"robots filter ($nHosts hosts, ${4 * nHosts} urls)") {
      graft.pipeline.Robots.filterAllowed(urls, col("u"), rules).count()
    }
    require(kept == 2 * nHosts, s"expected ${2 * nHosts} allowed, got $kept")
    println(s"[rehearsal] robots kept = $kept of ${4 * nHosts}")
    spark.stop()
  }
}
