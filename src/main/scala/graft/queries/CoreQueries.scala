package graft.queries

import org.apache.spark.sql.functions._

/** TPC-H-flavored headline queries: the scan→filter→join→agg→sort spine.
  *
  * Scale notes (100 TB design): filters and projections are plain Column
  * expressions so Catalyst pushes them into the parquet scan; dimension
  * tables (region/nation/customer/supplier) are explicitly `broadcast` so
  * the only shuffle left is the fact-side aggregation; aggregations are
  * hash-based with map-side partial aggregation for free.
  */
object CoreQueries extends QueryPack {

  def queries: Seq[QueryDef] = Seq(

    QueryDef("q1_agg", (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some(
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""")),

    QueryDef("q6_filter_agg", (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"),
          count(lit(1)).as("n_rows"))
    }, Some(
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07
           AND l_quantity < 24""")),

    QueryDef("q3_join_topk", (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-06-01")))
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-06-01")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, Some(
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         o_orderpriority,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-06-01'
           AND l_shipdate > TIMESTAMP '1998-06-01'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""")),

    QueryDef("q5_join_region", (s, dir) => {
      val region = Tables.load(s, dir, "region")
      val nation = Tables.load(s, dir, "nation")
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      val li = Tables.load(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }, Some(
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1999-01-01'
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""")),

    // semi/anti joins: customers with vs without open orders. Spark
    // plans left_semi/left_anti natively (no payload materialization on
    // the probe side); the dimension side broadcasts
    QueryDef("q_semi_anti", (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val nation = Tables.load(s, dir, "nation")
      val open = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
      val withOrd = cust.join(open,
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("with_open"))
      val withoutOrd = cust.join(open,
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("without_open"))
      withOrd.join(withoutOrd, Seq("c_nationkey"), "outer")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          coalesce(col("with_open"), lit(0L)).as("with_open"),
          coalesce(col("without_open"), lit(0L)).as("without_open"))
        .orderBy("n_name")
    }, Some(
      """WITH w AS (SELECT c_nationkey, count(*) AS with_open FROM customer
                    WHERE EXISTS (SELECT 1 FROM orders
                                  WHERE o_custkey = c_custkey
                                    AND o_orderstatus = 'O')
                    GROUP BY 1),
          wo AS (SELECT c_nationkey, count(*) AS without_open FROM customer
                 WHERE NOT EXISTS (SELECT 1 FROM orders
                                   WHERE o_custkey = c_custkey
                                     AND o_orderstatus = 'O')
                 GROUP BY 1),
          k AS (SELECT c_nationkey FROM w UNION SELECT c_nationkey FROM wo)
          SELECT n_name,
            coalesce(with_open, 0) AS with_open,
            coalesce(without_open, 0) AS without_open
          FROM k LEFT JOIN w USING (c_nationkey)
                 LEFT JOIN wo USING (c_nationkey)
                 JOIN nation ON c_nationkey = n_nationkey
          ORDER BY n_name""")),

    // hierarchical totals via ROLLUP(region, nation): per-nation rows,
    // per-region subtotals, and a grand total from ONE aggregation pass
    // (Catalyst expands the grouping sets; no self-union of aggregates)
    QueryDef("q_rollup_revenue", (s, dir) => {
      val nation = Tables.load(s, dir, "nation")
      val region = Tables.load(s, dir, "region")
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }, Some(
      """SELECT r_name, n_name,
         round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")),

    // exact distinct counts per group (the cardinality profile a
    // training-data pipeline reports; approx_count_distinct is the
    // sketch-verified scale path — see ScaleSpec)
    QueryDef("q_count_distinct", (s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          countDistinct(date_trunc("DAY", col("o_orderdate")))
            .as("n_days"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }, Some(
      """SELECT o_orderstatus,
         count(DISTINCT o_custkey) AS n_customers,
         count(DISTINCT date_trunc('day', o_orderdate)) AS n_days,
         count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // per-group top-k via window rank: top-2 revenue suppliers per
    // nation — one fact shuffle on s_suppkey, broadcast dims, then a
    // window shuffle on the (small) per-supplier aggregate
    QueryDef("q_rank_supplier", (s, dir) => {
      val supp = Tables.load(s, dir, "supplier")
      val nation = Tables.load(s, dir, "nation")
      val li = Tables.load(s, dir, "lineitem")
      val bySupp = li.join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s_nationkey"))
        .orderBy(col("revenue").desc, col("s_suppkey").asc)
      bySupp.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("s_name"), col("revenue"), col("rnk"))
        .orderBy("n_name", "rnk")
    }, Some(
      """WITH r AS (SELECT s_suppkey, s_name, s_nationkey,
                    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
                    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    GROUP BY 1, 2, 3),
          t AS (SELECT *, row_number() OVER (PARTITION BY s_nationkey
                  ORDER BY revenue DESC, s_suppkey ASC) AS rnk
                FROM r)
          SELECT n_name, s_name, revenue, CAST(rnk AS INT) AS rnk
          FROM t JOIN nation ON s_nationkey = n_nationkey
          WHERE rnk <= 2
          ORDER BY n_name, rnk"""))
  )
}
