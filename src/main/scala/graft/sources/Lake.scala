package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lake layout helpers: bucketed/sorted table writes so that repeated
  * entity-keyed operations (the engine's dominant access pattern —
  * resample, runs, joins on location/user) read pre-co-located data and
  * skip their shuffle entirely.
  *
  * At 100 TB this is the difference between re-shuffling the fact table per
  * query and a one-time layout cost: two tables bucketed by the same key
  * into the same bucket count sort-merge join with ZERO Exchange (verified
  * in LakeSpec), and a bucketed+sorted table feeds window/mapGroups plans
  * without re-sorting.
  */
object Lake {

  /** Write as a bucketed, in-bucket-sorted managed table. Drops any stale
    * table AND its warehouse location first: with an in-memory catalog a
    * previous JVM's managed-table directory survives on disk while the
    * table entry does not, and `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Count Exchange (shuffle) nodes in a frame's executed plan — the
    * assertion primitive for layout tests. */
  def countShuffles(df: DataFrame): Int = {
    var n = 0
    df.queryExecution.executedPlan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => n += 1
      case _ =>
    }
    n
  }
}
