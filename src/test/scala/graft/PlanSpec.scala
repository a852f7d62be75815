package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit over the ENTIRE query surface: every `SparkEntry`
  * query must analyze and plan at sf0.001 (catches broken column refs
  * without a full oracle run), no plan may contain a cartesian product,
  * and nested-loop broadcast joins are allowed only where a tiny frame is
  * intentionally broadcast against the corpus (top-k / analog targets).
  * Scan pruning is asserted on a representative lake query.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Tiny broadcast frames joined without keys BY DESIGN: a handful of
    * query vectors / analog target rows against the scan, and the
    * single-row corpus-total frames the trigram LM and the winnowing
    * relative df-cut broadcast. */
  private val bnljAllowed = Set(
    "q_cosine_to_query", "q_ivf_topk", "q_knn_top3", "q_ks_analog",
    "q_trigram_nll", "q_winnow_overlap", "q_mixture_lang",
    "q_pmi_bigrams", // one-row bigram-total broadcast
    "q_semantic_decontaminate", // eval-set broadcast vs corpus scan
    "q_bm25_topk", // one-row (N, sum_dl) corpus-stats broadcast
    "q_kn_trigram_nll", // one-row bigram-type-total broadcast
    "q_ccnet_buckets", // reuses trigramNll's one-row total broadcast
    "q_js_divergence", // one-row (en,de) corpus-totals broadcast
    "q_cramers_v", // one-row (n,r,c) contingency-total broadcast
    "q_cramers_v_v2", // fresh-name alias of q_cramers_v (same plan)
    "q_dsir_evidence", // one-row (tot_t, tot_r) model-totals broadcast
    "q_linkgraph_pagerank", // one-row corpus-count broadcast (n for % n)
    "q_anchor_text", // one-row corpus-count broadcast (n for % n)
    "q_token_budget", // one-row budget + water-level broadcasts
    "q_cms_tokens", // 5-row probe-list broadcast vs distinct groups
    "q_temperature_mixture", // one-row feasibility-min broadcast (mixture scaffold)
    "q_zarr_vectors_topk", // one-row query-vector broadcast vs vector scan
    "q_dd_quantiles", // ≤6-row quantile-target broadcast vs sketch rows
    "q_dd_merged", // 2-row quantile-target broadcast vs sketch rows
    "q_bloom_membership", // 4-row probe-list broadcast vs distinct groups
    "q_zorder_layout", // one-row min/max-bounds broadcast vs the scan
    "q_stream_dd_sketch", // 2-row quantile-target broadcast vs sketch rows
    "q_triangle_count", // one-row vertex-count broadcast (n for % n)
    "q_zorder3_layout") // one-row min/max-bounds broadcast vs the scan

  test("every query plans; no cartesian products; BNLJ only where intended") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct in plan"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          failures += s"$name: unexpected BroadcastNestedLoopJoin"
      } catch {
        case e: Throwable =>
          failures += s"$name: plan build failed (${e.getClass.getSimpleName})"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("triangle closure stays a hash join (only the 2 evidence broadcasts nest)") {
    import spark.implicits._
    val es = (1 to 200).map(i => (i.toLong, (i % 37 + 1).toLong))
      .toDF("src", "dst")
    val plan = pipeline.Graph.triangleCount(es, "src", "dst")
      .queryExecution.executedPlan.toString
    // the two 1-row evidence crossJoins are BNLJ by design; a THIRD
    // would mean the wedge-closure join regressed to a disjunctive
    // condition no hash join can serve (the 5.5 s form)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 2, s"unexpected nested-loop joins ($bnlj):\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("robots filter plans as a broadcast hash join, not a plan literal") {
    val plan = SparkEntry.queries("q_robots_filter")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rules should reach the URLs via a broadcast join:\n$plan")
    assert(!plan.contains("map(keys:"),
      "host->rules must not be embedded in the plan as a map literal")
  }

  test("filters and projection reach the parquet scan") {
    import org.apache.spark.sql.functions._
    val df = sources.Tables.table(spark, dir, "lineitem")
      .filter(col("l_quantity") < 5)
      .select("l_returnflag", "l_quantity")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5"),
      s"pushdown missing:\n$formatted")
    // pruned read schema: only the two referenced columns reach the scan
    assert(formatted.contains("l_returnflag") && !formatted.contains("l_extendedprice"),
      s"column pruning missing:\n$formatted")
  }
}
