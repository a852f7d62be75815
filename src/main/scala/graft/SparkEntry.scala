package graft

import graft.core.{Runs, Stats, Time}
import graft.indices.Generic
import graft.pipeline.{Dedup, Similarity, TextStats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — maps the engine's operator inventory (SURVEY.md §2)
  * onto the driver's testdata so every operator has a DuckDB-checkable
  * oracle. Time-series operators (resample / runs / rolling / percentile)
  * run over `events` (user_id = entity key, ts = time); relational operators
  * over the TPC-H-ish star schema; LLM-pipeline operators over
  * `documents` / `embeddings`.
  *
  * Numeric outputs are rounded (2-6 digits) in BOTH engines so that
  * double-summation order differences between Spark and DuckDB cannot flip
  * the hash compare.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.sources.Tables.events(s, dir)
    else graft.sources.Tables.table(s, dir, name)

  /** Per-user daily totals — the engine's canonical "daily climate series"
    * shape derived from the raw event stream (one shuffle, reused by all
    * run/threshold queries). */
  private def dailyTotals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).cast("date").as("d"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n_events"))

  private val dailySql =
    """select user_id, cast(date_trunc('day', ts) as date) d,
      | sum(value) total, count(*) n_events from events group by 1, 2""".stripMargin

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------------
  // Query registry: one entry per implemented operator (SURVEY.md §2).
  // ------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational core -------------------------------------------------
    "q_agg_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
    }),

    "q_join_revenue_by_nation" -> ((s, dir) => {
      // star join: fact lineitem -> orders -> customer, broadcast dims
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    "q_topk_orders_per_segment" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    "q_anti_join_customers_no_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    "q_distinct_custs_per_priority" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
    }),

    // ---- resample (core.Time anchored frequencies) -----------------------
    "q_resample_daily_by_type" -> ((s, dir) => {
      Generic.resampleOp(t(s, dir, "events"), Seq("event_type"), col("ts"), "D",
        Seq(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total")))
    }),

    "q_resample_ys_jul_lineitem" -> ((s, dir) => {
      Generic.resampleOp(t(s, dir, "lineitem"), Seq("l_returnflag"), col("l_shipdate"), "YS-JUL",
        Seq(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_lines")))
    }),

    "q_resample_qs_dec_orders" -> ((s, dir) => {
      Generic.resampleOp(t(s, dir, "orders"), Seq.empty, col("o_orderdate"), "QS-DEC",
        Seq(round(sum(col("o_totalprice")), 2).as("sum_price"), count(lit(1)).as("n_orders")))
    }),

    "q_resample_7d_events" -> ((s, dir) => {
      Generic.resampleOp(t(s, dir, "events"), Seq.empty, col("ts"), "7D",
        Seq(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value")))
    }),

    // ---- rolling window --------------------------------------------------
    "q_rolling_mean_7" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .withColumn("rmean", round(avg(col("value")).over(w.rowsBetween(-6, 0)), 6))
        .filter(col("rn") >= 7)
        .select(col("user_id"), col("event_id"), col("rmean"))
    }),

    // ---- threshold / degree-day indices ----------------------------------
    "q_threshold_wet_days" -> ((s, dir) => {
      dailyTotals(s, dir)
        .groupBy(col("user_id"))
        .agg(coalesce(sum(when(col("total") > 100, 1L)), lit(0L)).as("wet_days"))
    }),

    "q_degree_days" -> ((s, dir) => {
      dailyTotals(s, dir)
        .groupBy(col("user_id"))
        .agg(round(sum(greatest(col("total") - 100, lit(0.0))), 6).as("dd"))
    }),

    "q_first_occurrence_over_300" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(when(col("value") > 300, col("ts"))).as("first_ts"))
    }),

    // ---- run-length / spells (core.Runs islands) -------------------------
    "q_longest_run_days" -> ((s, dir) => {
      // longest streak of consecutive calendar days with daily total > 50
      val daily = dailyTotals(s, dir)
        .withColumn("dnum", datediff(col("d"), to_date(lit("1970-01-01"))))
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      daily.filter(col("total") > 50)
        .withColumn("grp", col("dnum") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest_run"))
    }),

    "q_run_events_3d" -> ((s, dir) => {
      // number of runs of >= 3 consecutive qualifying days (windowed_run_events)
      val daily = dailyTotals(s, dir)
        .withColumn("dnum", datediff(col("d"), to_date(lit("1970-01-01"))))
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      daily.filter(col("total") > 50)
        .withColumn("grp", col("dnum") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .filter(col("len") >= 3)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_runs"), sum(col("len")).as("days_in_runs"))
    }),

    "q_suspicious_repeats" -> ((s, dir) => {
      // QA flag: >= 4 consecutive events of the same type per user
      Runs.suspiciousRuns(t(s, dir, "events"), Seq("user_id"), col("ts"),
          col("event_type"), 4)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_suspicious"), max(col("repeat_len")).as("max_repeat"))
    }),

    // ---- statistics ------------------------------------------------------
    "q_percentile_by_type" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.9)), 6).as("p90"),
          round(percentile(col("value"), lit(0.5)), 6).as("p50"))
    }),

    "q_ensemble_daily_stats" -> ((s, dir) => {
      // users as ensemble members: per-day cross-member stats
      dailyTotals(s, dir)
        .groupBy(col("d"))
        .agg(round(avg(col("total")), 6).as("ens_mean"),
          round(stddev_samp(col("total")), 6).as("ens_std"),
          round(min(col("total")), 6).as("ens_min"),
          round(max(col("total")), 6).as("ens_max"),
          count(lit(1)).as("n_members"))
    }),

    // ---- text / dedup / similarity (pipeline.*) --------------------------
    "q_doc_stats" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        round(TextStats.meanTokenLength(col("text")), 6).as("mean_tok_len"),
        TextStats.fingerprint(col("text")).as("fp"))
    }),

    "q_dedup_bag" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(Dedup.bagKey(col("text")).as("bag_key"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_members"))
    }),

    "q_cosine_to_query" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      e.crossJoin(broadcast(q))
        .withColumn("cosine", round(Similarity.cosine(col("embedding"), col("qvec")), 4))
        .filter(col("cosine") > 0.2)
        .select(col("vec_id"), col("cosine"))
    })
  )

  // ------------------------------------------------------------------
  // DuckDB oracles (column names/types must match the Spark results).
  // ------------------------------------------------------------------
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """select l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) sum_qty,
        | round(sum(l_extendedprice),2) sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) sum_disc_price,
        | round(avg(l_quantity),4) avg_qty,
        | round(avg(l_extendedprice),4) avg_price,
        | count(*) count_order
        |from lineitem where l_shipdate <= timestamp '1998-09-02'
        |group by 1,2""".stripMargin,

    "q_join_revenue_by_nation" ->
      """select r_name, n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) revenue, count(*) n_lines
        |from lineitem
        | join orders on l_orderkey = o_orderkey
        | join customer on o_custkey = c_custkey
        | join nation on c_nationkey = n_nationkey
        | join region on n_regionkey = r_regionkey
        |group by 1,2""".stripMargin,

    "q_topk_orders_per_segment" ->
      """select c_mktsegment, rk, o_orderkey, round(o_totalprice,2) o_totalprice
        |from (select c_mktsegment, o_orderkey, o_totalprice,
        |  row_number() over (partition by c_mktsegment
        |    order by o_totalprice desc, o_orderkey) rk
        | from orders join customer on o_custkey = c_custkey) t
        |where rk <= 3""".stripMargin,

    "q_anti_join_customers_no_orders" ->
      """select c_mktsegment, count(*) n_customers from customer
        |where not exists (select 1 from orders where o_custkey = c_custkey)
        |group by 1""".stripMargin,

    "q_distinct_custs_per_priority" ->
      """select o_orderpriority, count(distinct o_custkey) n_custs,
        | count(*) n_orders from orders group by 1""".stripMargin,

    "q_resample_daily_by_type" ->
      """select event_type, cast(date_trunc('day', ts) as timestamp) period,
        | count(*) n, round(sum(value),6) total from events group by 1,2""".stripMargin,

    "q_resample_ys_jul_lineitem" ->
      """select l_returnflag,
        | cast(make_timestamp(case when month(l_shipdate) >= 7 then year(l_shipdate)
        |   else year(l_shipdate)-1 end, 7, 1, 0, 0, 0.0) as timestamp) period,
        | round(sum(l_quantity),2) sum_qty, count(*) n_lines
        |from lineitem group by 1,2""".stripMargin,

    "q_resample_qs_dec_orders" ->
      """with b as (select o_totalprice,
        |  year(o_orderdate)*12 + (month(o_orderdate)-1) - 11 rel from orders)
        |select cast(make_timestamp(((cast(floor(rel/3.0)*3 as int) + 11) // 12),
        |  ((cast(floor(rel/3.0)*3 as int) + 11) % 12) + 1, 1, 0, 0, 0.0) as timestamp) period,
        | round(sum(o_totalprice),2) sum_price, count(*) n_orders
        |from b group by 1""".stripMargin,

    "q_resample_7d_events" ->
      """select cast(date '1970-01-01' + to_days(cast(floor(
        |  date_diff('day', date '1970-01-01', ts)/7.0)*7 as int)) as timestamp) period,
        | count(*) n, round(avg(value),6) avg_value
        |from events group by 1""".stripMargin,

    "q_rolling_mean_7" ->
      """select user_id, event_id, rmean from (
        | select user_id, event_id,
        |  row_number() over (partition by user_id order by ts) rn,
        |  round(avg(value) over (partition by user_id order by ts
        |    rows between 6 preceding and current row),6) rmean
        | from events) t where rn >= 7""".stripMargin,

    "q_threshold_wet_days" ->
      s"""with daily as ($dailySql)
         |select user_id,
         | cast(coalesce(sum(case when total > 100 then 1 end), 0) as bigint) wet_days
         |from daily group by 1""".stripMargin,

    "q_degree_days" ->
      s"""with daily as ($dailySql)
         |select user_id, round(sum(greatest(total - 100, 0)),6) dd
         |from daily group by 1""".stripMargin,

    "q_first_occurrence_over_300" ->
      """select user_id, min(case when value > 300 then ts end) first_ts
        |from events group by 1""".stripMargin,

    "q_longest_run_days" ->
      s"""with daily as ($dailySql),
         |qual as (select user_id, d,
         |  date_diff('day', date '1970-01-01', d)
         |    - row_number() over (partition by user_id order by d) grp
         | from daily where total > 50),
         |runs as (select user_id, grp, count(*) len from qual group by 1,2)
         |select user_id, max(len) longest_run from runs group by 1""".stripMargin,

    "q_run_events_3d" ->
      s"""with daily as ($dailySql),
         |qual as (select user_id, d,
         |  date_diff('day', date '1970-01-01', d)
         |    - row_number() over (partition by user_id order by d) grp
         | from daily where total > 50),
         |runs as (select user_id, grp, count(*) len from qual group by 1,2)
         |select user_id, count(*) n_runs, cast(sum(len) as bigint) days_in_runs
         |from runs where len >= 3 group by 1""".stripMargin,

    "q_suspicious_repeats" ->
      """with lagged as (select user_id, ts, event_type,
        |  (event_type = lag(event_type) over (partition by user_id order by ts)) same
        | from events),
        |flagged as (select user_id, ts,
        |  case when coalesce(same, false) then 1 else 0 end c from lagged),
        |runs as (select user_id, grp, count(*) + 1 repeat_len from (
        |  select user_id, ts, c,
        |   sum(1 - c) over (partition by user_id order by ts
        |     rows between unbounded preceding and current row) grp
        |  from flagged) t where c = 1 group by 1,2)
        |select user_id, count(*) n_suspicious, max(repeat_len) max_repeat
        |from runs where repeat_len >= 4 group by 1""".stripMargin,

    "q_percentile_by_type" ->
      """select event_type, round(quantile_cont(value, 0.9),6) p90,
        | round(quantile_cont(value, 0.5),6) p50 from events group by 1""".stripMargin,

    "q_ensemble_daily_stats" ->
      s"""with daily as ($dailySql)
         |select d, round(avg(total),6) ens_mean, round(stddev_samp(total),6) ens_std,
         | round(min(total),6) ens_min, round(max(total),6) ens_max,
         | count(*) n_members
         |from daily group by 1""".stripMargin,

    "q_doc_stats" ->
      """select doc_id,
        | case when length(trim(text)) = 0 then 0
        |   else len(string_split_regex(trim(text), '\s+')) end n_tokens,
        | round(cast(length(regexp_replace(text, '\s+', '', 'g')) as double)
        |   / len(string_split_regex(trim(text), '\s+')), 6) mean_tok_len,
        | substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16) fp
        |from documents""".stripMargin,

    "q_dedup_bag" ->
      """select md5(array_to_string(list_sort(
        |   string_split_regex(lower(trim(text)), '\s+')), ' ')) bag_key,
        | min(doc_id) keeper_id, count(*) n_members
        |from documents group by 1""".stripMargin,

    "q_cosine_to_query" ->
      """with q as (select embedding qvec from embeddings where vec_id = 0)
        |select vec_id, cosine from (
        | select e.vec_id, round(
        |  list_sum(list_transform(range(1,65),
        |    i -> cast(e.embedding[i] as double) * cast(q.qvec[i] as double)))
        |  / (sqrt(list_sum(list_transform(range(1,65),
        |      i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))
        |   * sqrt(list_sum(list_transform(range(1,65),
        |      i -> cast(q.qvec[i] as double) * cast(q.qvec[i] as double))))), 4) cosine
        | from embeddings e, q) t
        |where cosine > 0.2""".stripMargin
  )
}
