package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 session-2 ×scale rehearsal main (test scope, run by hand —
  * PLANS §34 discipline) for the sketch/layout tier added this session:
  *
  *  - DDSketch over 20M lognormal values in 40 groups: the counter
  *    table must stay ≤ a few hundred rows per group and the whole
  *    sketch+quantile read must be one-aggregation-shaped (seconds, not
  *    minutes — the 100 TB path never sorts raw values).
  *  - Bloom bit table over 10M distinct values in 8 groups at 2^22
  *    bits: build + 8-probe membership join.
  *  - Z-order write of 10M rows into 64 files + the per-partition bbox
  *    pruning check at scale (box touches O(perimeter) partitions).
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR13b"
  */
object ScaleRehearsalR13b {
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

    // DDSketch: 20M values, 40 groups — counter table stays sketch-sized
    val dd = spark.range(20000000L)
      .select((col("id") % 40).cast("string").as("grp"),
        // deterministic heavy-tail spread without RNG: vary magnitude
        // by id so buckets from ~1e0 to ~1e6 all populate
        ((col("id") % 997 + 1)
          * pow(lit(2.0), (col("id") % 11).cast("double"))).as("x"))
    val hist = pipeline.Sketches.ddHistogram(dd, "grp", "x")
    time("DDSketch 20M values, 40 groups: histogram + 3 quantiles") {
      val q = pipeline.Sketches.ddQuantiles(hist, Seq(0.5, 0.9, 0.99))
      require(q.count() == 120L)
    }
    val rows = hist.count()
    println(s"[rehearsal] DD counter rows: $rows (${rows / 40.0} per group)")
    require(rows < 40 * 900, s"sketch must stay bucket-bounded, got $rows")

    // Bloom: 10M distinct values, 8 groups, 2^22 bits, k=4
    val bl = spark.range(10000000L)
      .select((col("id") % 8).cast("string").as("grp"),
        concat(lit("v"), col("id")).as("v"))
    val bits = pipeline.Sketches.bloomBits(bl, "grp", "v", 1L << 22, 4)
      .localCheckpoint(false)
    time("Bloom 10M values, 8 groups, 2^22 bits: build") {
      val n = bits.count()
      println(s"[rehearsal] bloom word rows: $n")
      require(n <= 8L * (1L << 22) / 32, "word table bounded by m/32 per group")
    }
    time("Bloom: 8-probe membership join") {
      val got = pipeline.Sketches.bloomContains(bits,
        Seq("v1", "v999999", "v5000001", "absent-1"), 1L << 22, 4)
      require(got.count() == 32L)
    }

    // Z-order: 10M rows on a 4096 x 4096 grid -> 64 files
    val out = java.nio.file.Files.createTempDirectory("graft_zorder_rehearsal_")
    val zin = spark.range(10000000L)
      .select(pmod(col("id") * 2654435761L, lit(4096L)).as("x"),
        pmod(col("id") * 40503L, lit(4096L)).as("y"))
    time("Z-order write 10M rows -> 64 files") {
      sources.Lake.zOrderWrite(zin, "x", "y", out.toString + "/z", 64)
    }
    val boxTouched = spark.read.parquet(out.toString + "/z")
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"))
      .filter(col("minx") < 512 && col("miny") < 512)
      .count()
    println(s"[rehearsal] 1/8 x 1/8 box touches $boxTouched of 64 z-ordered files")
    require(boxTouched <= 12, s"z-order pruning bound violated: $boxTouched")

    // Triangles: 1M-vertex graph, 3M edges (chain + skip + affine map —
    // plus a deliberate 50k-degree HUB, the case degree-ordered
    // orientation exists for: a u<v orientation would square the hub)
    val n = 1000000L
    val tri = spark.range(n).select(col("id").as("src"),
        pmod(col("id") + 1, lit(n)).as("dst"))
      .unionByName(spark.range(n).select(col("id").as("src"),
        pmod(col("id") + 2, lit(n)).as("dst")))
      .unionByName(spark.range(n).select(col("id").as("src"),
        pmod(col("id") * 7 + 1, lit(n)).as("dst")))
      .unionByName(spark.range(50000L).select((col("id") * 20 + 3).as("src"),
        lit(77L).as("dst"))) // the hub
    time("triangle count: 1M vertices, ~3.05M edges incl. a 50k-degree hub") {
      val r = pipeline.Graph.triangleCount(tri, "src", "dst").head()
      println(s"[rehearsal] vertices=${r.getLong(0)} edges=${r.getLong(1)} " +
        s"triangles=${r.getLong(2)}")
      require(r.getLong(2) >= n, "chain+skip alone close >= n triangles")
    }

    // Interval overlap: 4M x 4M intervals over 100k keys — the banding
    // keeps this an equi-join; a theta-join would nested-loop per key
    val ia = spark.range(4000000L).select(col("id"),
      pmod(col("id"), lit(100000L)).as("k"),
      (pmod(col("id") * 2654435761L, lit(10000000L))).as("s"))
      .withColumn("e", col("s") + 1L + pmod(col("id"), lit(5000L)))
    val ib = spark.range(4000000L).select((col("id") + 10000000L).as("id"),
      pmod(col("id"), lit(100000L)).as("k"),
      (pmod(col("id") * 40503L, lit(10000000L))).as("s"))
      .withColumn("e", col("s") + 1L + pmod(col("id"), lit(300L)))
    time("interval overlap join: 4M x 4M intervals, 100k keys, band 4096") {
      val n = graft.core.Intervals
        .overlapJoin(ia, ib, Seq("k"), "s", "e", 4096L)
        .count()
      println(s"[rehearsal] overlapping pairs: $n")
      require(n > 0)
    }

    spark.stop()
  }
}
