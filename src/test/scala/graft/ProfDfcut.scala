package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness for q_jaccard_postings_dfcut (not committed)
object ProfDfcut {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val df = graft.sources.Tables.table(spark, dir, "documents").withColumn("blk", lit(1))
    val idCol = "doc_id"; val textCol = "text"; val blockCols = Seq("blk")
    val ngram = 3; val dfCut = 20

    val grams = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
      array_distinct(graft.pipeline.TextStats.wordNgrams(col(textCol), ngram)).as("grams"): _*)
    val postings = grams.select(col("id") +: blockCols.map(col) :+
      explode(col("grams")).as("tok"): _*)
    time("grams count")(println(grams.count()))
    time("postings count")(println(postings.count()))
    val rare = postings
      .join(postings.groupBy(col("tok")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= dfCut).select(col("tok")), "tok")
    time("rare count")(println(rare.count()))
    val a = rare.alias("a"); val b = rare.alias("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    val candsRaw = a.join(b, blockCond && col("a.tok") === col("b.tok") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("cands raw count")(println(candsRaw.count()))
    val cands = candsRaw.distinct()
    time("cands distinct count")(println(cands.count()))
    val hashed = grams.select(col("id"),
        sort_array(transform(col("grams"), g => xxhash64(g))).as("h"),
        size(col("grams")).as("sz"))
      .localCheckpoint(false)
    val ha = hashed.select(col("id").as("id_a"), col("h").as("h_a"), col("sz").as("sz_a"))
    val hb = hashed.select(col("id").as("id_b"), col("h").as("h_b"), col("sz").as("sz_b"))
    val common = graft.functions.SortedIntersectCount
      .sortedIntersectCount(col("h_a"), col("h_b"))
    val out = cands.join(ha, "id_a").join(hb, "id_b")
      .withColumn("jaccard", round(common.cast("double") /
        (col("sz_a") + col("sz_b") - common).cast("double"), 6))
      .filter(col("jaccard") >= 0.6)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    time("full query")(println(out.count()))
    time("full query again")(println(out.count()))
    spark.stop()
  }
}
