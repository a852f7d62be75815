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
  *   r_{t+1}(v) = scale·(den−num)/den + (num · (Σ_{u→v} (r_t(u) div
  *                outdeg(u)) + D_t)) div den
  * Parallel edges contribute once each. `danglingRedistribute = false`
  * (the simple variant) drops dangling mass: D_t = 0. With `true`, each
  * node receives the equal share D_t = (Σ_{outdeg(u)=0} r_t(u)) div n —
  * the standard redistribute variant real crawl graphs need (sinks are
  * common); floor division keeps it engine-exact, the ≤ n−1 remainder
  * micro-units are dropped. Choose `scale` so n·scale·num ≪ 2^63.
  *
  * Scale shape per iteration: one broadcast-or-shuffle join of the rank
  * vector onto edges (ranks are |V|-sized; at web scale co-partition
  * edges and ranks by src so the join is zero-exchange), one hash-agg on
  * dst (map-side partial sums do the heavy lifting), one left join back
  * to the node set; the dangling term adds one 1-row aggregate broadcast.
  * `localCheckpoint` flattens the per-round lineage (edges/nodes/outdeg
  * are checkpointed once and every rank vector truncates its history —
  * without it the plan doubles per iteration), matching the
  * connected-components loop. Fixed small iteration count (quality
  * signals use 3–10).
  */
object Graph {

  def pageRankExact(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int = 3, scale: Long = 1000000000L,
                    dampNum: Long = 85L, dampDen: Long = 100L,
                    danglingRedistribute: Boolean = false): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(false) // read every iteration; don't re-derive
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(false)
    val nCnt = broadcast(nodes.agg(count(lit(1)).as("_n")))
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(outdeg, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("r div od").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      val next = nodes
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
      ranks = (if (!danglingRedistribute) {
        next.select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(cs, 0L)) div $dampDen"))
            .as("r"))
      } else {
        // one 1-row (dangling-mass-share) frame per round, broadcast
        val dang = broadcast(ranks
          .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
          .agg(coalesce(sum(col("r")), lit(0L)).as("_ds"))
          .crossJoin(nCnt)
          .select(expr("_ds div _n").as("_share")))
        next.crossJoin(dang).select(col("id"),
          (lit(base) +
            expr(s"($dampNum * (coalesce(cs, 0L) + _share)) div $dampDen"))
            .as("r"))
      }).localCheckpoint(false)
    }
    ranks
  }

  /** Exact TRIANGLE COUNT over an undirected edge set — the web-graph
    * cohesion/spam signal (link farms are triangle-dense; organic link
    * neighborhoods are sparse). Degree-ordered orientation (Suri &
    * Vassilvitskii, WWW'11 / Chiba-Nishizeki): every edge points from
    * its lower-(degree, id) endpoint to the higher, which makes the
    * orientation acyclic and counts each triangle EXACTLY once as
    * a→b, a→c (wedge at a) closed by b→c. The wedge join's fan-out is
    * bounded by out-degrees, which the orientation caps at O(√E) on
    * any graph — the property that makes the two-join survive hubs at
    * 100 TB (a raw u<v orientation would square the hub degree).
    * Self-loops and duplicate/bidirectional edges collapse first.
    * Returns one row: (n_vertices, n_edges, n_triangles). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // lazily checkpointed: degree table, orientation AND the edge count
    // all branch off this frame — the checkpoint makes the dedup
    // shuffle run once, not once per branch
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    val deg = und.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // orient by (degree, id): a -> b iff (d_a, a) < (d_b, b)
    val withDeg = und
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
    val oriented = withDeg.select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .localCheckpoint(false) // consumed three times below
    val wedges = oriented.select(col("a"), col("b").as("w1"))
      .join(oriented.select(col("a"), col("b").as("w2")), Seq("a"))
      .filter(col("w1") < col("w2"))
    // closure is an EQUI-join: the wedge endpoints are already id-ordered
    // (w1 < w2) and `und` holds every edge in exactly that canonical
    // form — an OR over both orientations would force a nested-loop
    // join (measured 5.5 s vs 1.3 s on the gate query)
    val closed = wedges.join(und,
      col("w1") === col("u") && col("w2") === col("v"), "left_semi")
    // vertex/edge counts ride 1-row broadcasts into the SAME job — a
    // head()/count() here would re-run the whole edge pipeline once
    // per evidence column (measured 5.7 s vs 1.4 s on the gate query)
    closed.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_vertices"))))
      .crossJoin(broadcast(und.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_vertices"), col("n_edges"), col("n_triangles"))
  }
}
