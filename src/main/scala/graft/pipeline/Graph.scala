package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl corpora. The headline op is an
  * ENGINE-EXACT PageRank: every quantity is an int64 in `scale` micro-
  * units and every step uses only integer addition and integer (floor)
  * division, so rank vectors are bit-identical regardless of partition
  * count, aggregation order, or engine — the property that lets a DuckDB
  * oracle replay the iteration and hash-match, and that makes reruns
  * reproducible at cluster scale (float PageRank sums drift with the
  * reduction tree).
  *
  * Semantics: unnormalized damped PageRank with fixed iteration count,
  *   r_0(v) = scale
  *   r_{t+1}(v) = scale·(den−num)/den + (num · Σ_{u→v} (r_t(u) div
  *                outdeg(u))) div den
  * Parallel edges contribute once each; dangling mass is dropped (the
  * standard simple variant — documented, both engines agree). Choose
  * `scale` so n·scale·num stays far below 2^63.
  *
  * Scale shape per iteration: one broadcast-or-shuffle join of the rank
  * vector onto edges (ranks are |V|-sized; at web scale co-partition
  * edges and ranks by src so the join is zero-exchange), one hash-agg on
  * dst (map-side partial sums do the heavy lifting), one left join back
  * to the node set. Fixed small iteration count (quality signals use
  * 3–10); for perfect-convergence use cases checkpoint between rounds.
  */
object Graph {

  def pageRankExact(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int = 3, scale: Long = 1000000000L,
                    dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(outdeg, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("r div od").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(cs, 0L)) div $dampDen"))
            .as("r"))
    }
    ranks
  }
}
