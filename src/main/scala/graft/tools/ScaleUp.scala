package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Dev utility: replicate a testdata scale-factor directory N× to rehearse
  * the next scale factor (sf0.1 ×10 ≈ sf1) without driver-side data
  * generation. Every integer `*key`/`*_id` column is shifted by
  * `replica · 10^9` — the SAME offset for every table, so foreign keys stay
  * consistent within a replica while entity spaces are disjoint across
  * replicas (entity-keyed analyses scale in group COUNT; time-keyed
  * analyses scale in rows per group — both axes a real 10× would grow).
  * Payload columns (text, embeddings, values, timestamps) are left
  * untouched, which makes the replicated corpus a deliberately HARD dedup
  * workload: every document gains factor−1 exact twins.
  *
  * Usage: graft.tools.ScaleUp <inDir> <outDir> <factor>
  */
object ScaleUp {
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
  private val Offset = 1000000000L

  def main(args: Array[String]): Unit = {
    val (in, out, factor) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$in/$t.parquet")
      val idCols = df.schema.fields.collect {
        case f if (f.name.endsWith("key") || f.name.endsWith("_id")) &&
          (f.dataType == LongType || f.dataType == IntegerType) => f.name
      }.toSeq
      val reps = (0 until factor).map { r =>
        idCols.foldLeft(df) { (d, c) =>
          d.withColumn(c, col(c).cast("long") + lit(r * Offset))
        }
      }
      reps.reduce(_ unionAll _).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t x$factor (${idCols.mkString(", ")})")
    }
    spark.stop()
  }
}
