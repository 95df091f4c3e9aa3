package graft.queries

import graft.Tables
import graft.operators.FrameOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational queries (SURVEY.md §2 #1–12): the reference's frame
  * ops exercised on the TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Conventions shared by every graft query (see SURVEY.md §5):
  * identical column aliases on both sides, deterministic ORDER BY,
  * doubles rounded (money sums to 2, everything else to 4), timestamps
  * reduced to dates/epochs — keeps the driver's hash compare free of
  * float-ordering and timestamp-precision noise.
  *
  * Money sums go through DECIMAL ([[moneySum]]): a double sum over
  * millions of unordered terms differs between engines in its last
  * cent (summation order), which surfaced at sf1 on q_sql_q5's ~1.2M
  * rows/group. Per-term double→decimal casts are deterministic in both
  * engines and decimal addition is exact and commutative, so the
  * rounded sum is sf-independent. SQL mirror:
  * `CAST(round(sum(CAST(expr AS DECIMAL(25, 6))), 2) AS DOUBLE)`.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Order-independent cross-engine money sum: Σ decimal(25,6) terms,
    * rounded to cents, back to double for a schema-stable column. */
  private def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(c.cast("decimal(25,6)")), 2).cast("double")

  val queries: Map[String, Q] = Map(
    // #11 df-fold/by-index* → groupBy().agg() (TPC-H Q1 shape).
    "q_group_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // #1 df-select* with filter — predicate + projection push to the scan.
    "q_select_filter" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as("ship_date"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber")),

    // #2 df-add-derived!: computed column.
    "q_derived" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .addDerived("revenue", round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .select("l_orderkey", "l_linenumber", "revenue")
        .orderBy("l_orderkey", "l_linenumber")),

    // #3 df-count-na over several series (NAs synthesized — testdata has none).
    "q_count_na" -> ((s, dir) =>
      Tables.events(s, dir)
        .addDerived("value_na", when(col("value") >= 1.0, col("value")))
        .addDerived("etype_na", when(col("event_type") =!= "error", col("event_type")))
        .countNaAll(Seq("etype_na", "props", "value_na"))
        .orderBy("series")),

    // #4 valid-only row filter.
    "q_valid_only" -> ((s, dir) =>
      Tables.events(s, dir)
        .addDerived("value_na", when(col("value") >= 1.0, col("value")))
        .addDerived("etype_na", when(col("event_type") =!= "error", col("event_type")))
        .validOnly("value_na", "etype_na")
        .select("event_id")
        .orderBy("event_id")),

    // #5 ordered select / top-k (global sort bounded by LIMIT → TakeOrdered).
    "q_sort_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 4).as("total"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(100)),

    // #6 df-lookup via secondary index → broadcast dim joins (Q5 shape).
    "q_lookup_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = broadcast(Tables.customer(s, dir))
      val n = broadcast(Tables.nation(s, dir))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("n_name")
    }),

    // #7 df-equal-range on a sorted series → range predicate (pushed down).
    "q_equal_range" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .equalRange("l_quantity", 10, 20)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")),

    // #9 df-fold → global aggregation, one row.
    "q_fold_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(min("l_extendedprice"), 4).as("min_price"),
        round(max("l_extendedprice"), 4).as("max_price"))),

    // #10 df-map with (prev,current) → per-key lag window.
    "q_map_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .mapWindow("user_id", Seq(col("eps_us"), col("event_id")), "delta",
          lagOf => round(col("value") - lagOf(col("value")), 4))
        .select("user_id", "event_id", "delta")
        .orderBy("user_id", "event_id")),

    // #12 df-describe.
    "q_describe" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .describeNumeric(Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
        .orderBy("series")),

    // SQL-API surface: the same engine driven via spark.sql over temp
    // views (TPC-H Q3 shape) — planner/pushdown identical to the
    // DataFrame path. Deliberately the CANONICAL formulation: the
    // grouping keys contain the join key, so the post-join aggregate
    // is already colocated with the single lineitem exchange — the
    // "push the aggregate below the join" rewrite shuffles the same
    // fact volume on the same key, only with a full-cardinality hash
    // table instead of a post-filter one, and MEASURED ~2× slower at
    // sf1 (a semi-join-filtered push-down sat between the two: the qo
    // subplan gets computed twice). The pushed form's earlier sf10 win
    // was in-suite storage-pressure relief, not a better shape.
    "q_sql_q3" -> ((s, dir) =>
      graft.GraftSql.sql(s, dir,
        """SELECT o_orderkey, cast(o_orderdate as date) AS odate,
          | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue,
          | count(*) AS cnt
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY o_orderkey, o_orderdate
          |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin)),

    // SQL-API surface, TPC-H Q5 shape: 6-table join where region/
    // nation/supplier broadcast and the two fact joins shuffle —
    // exercises Catalyst join ordering through the SQL entry point.
    "q_sql_q5" -> ((s, dir) =>
      graft.GraftSql.sql(s, dir,
        """SELECT n_name, CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),
  )

  val oracle: Map[String, String] = Map(
    "q_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))),2) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))),2) AS DOUBLE) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_sql_q3" ->
      """SELECT o_orderkey, cast(o_orderdate as date) AS odate,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue,
        | count(*) AS cnt
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_sql_q5" ->
      """SELECT n_name, CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_select_filter" ->
      """SELECT l_orderkey, l_linenumber, cast(l_shipdate as date) AS ship_date,
        | l_quantity, l_extendedprice
        |FROM lineitem WHERE l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_derived" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice*(1-l_discount),4) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_count_na" ->
      """SELECT series, na_count FROM (
        | SELECT 'etype_na' AS series,
        |   count(*) - count(CASE WHEN event_type <> 'error' THEN event_type END) AS na_count FROM events
        | UNION ALL
        | SELECT 'props', count(*) - count(props) FROM events
        | UNION ALL
        | SELECT 'value_na', count(*) - count(CASE WHEN value >= 1.0 THEN value END) FROM events
        |) ORDER BY series""".stripMargin,

    "q_valid_only" ->
      """SELECT event_id FROM events
        |WHERE value >= 1.0 AND event_type <> 'error'
        |ORDER BY event_id""".stripMargin,

    "q_sort_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,4) AS total
        |FROM orders ORDER BY total DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_lookup_join" ->
      """SELECT n_name,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))),2) AS DOUBLE) AS revenue,
        | count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_equal_range" ->
      """SELECT l_returnflag, count(*) AS cnt, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))),2) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_quantity BETWEEN 10 AND 20
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_fold_agg" ->
      """SELECT count(*) AS cnt, round(sum(l_quantity),2) AS sum_qty,
        | round(min(l_extendedprice),4) AS min_price,
        | round(max(l_extendedprice),4) AS max_price
        |FROM lineitem""".stripMargin,

    "q_map_window" ->
      """SELECT user_id, event_id,
        | round(value - lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 4) AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_describe" ->
      """SELECT series, cnt, cnt_na, mean, stddev, min, max FROM (
        | SELECT 'l_discount' AS series, count(l_discount) AS cnt, count(*) - count(l_discount) AS cnt_na, round(avg(l_discount),4) AS mean, round(stddev_samp(l_discount),4) AS stddev, cast(min(l_discount) as double) AS min, cast(max(l_discount) as double) AS max FROM lineitem
        | UNION ALL
        | SELECT 'l_extendedprice', count(l_extendedprice), count(*) - count(l_extendedprice), round(avg(l_extendedprice),4), round(stddev_samp(l_extendedprice),4), cast(min(l_extendedprice) as double), cast(max(l_extendedprice) as double) FROM lineitem
        | UNION ALL
        | SELECT 'l_quantity', count(l_quantity), count(*) - count(l_quantity), round(avg(l_quantity),4), round(stddev_samp(l_quantity),4), cast(min(l_quantity) as double), cast(max(l_quantity) as double) FROM lineitem
        | UNION ALL
        | SELECT 'l_tax', count(l_tax), count(*) - count(l_tax), round(avg(l_tax),4), round(stddev_samp(l_tax),4), cast(min(l_tax) as double), cast(max(l_tax) as double) FROM lineitem
        |) ORDER BY series""".stripMargin,
  )
}
