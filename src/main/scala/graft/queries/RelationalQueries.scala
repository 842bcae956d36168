package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational surface the reference leaves to Spark built-ins inside
  * pinned transforms (SURVEY.md §2.2): aggregation, joins (broadcast +
  * shuffle), window functions, sessionization, semi/anti joins, set ops,
  * rollup/cube, sort/limit. These double as the benchmark headliners.
  *
  * Scale notes (designed for a 1000-executor / 100 TB cluster, tested on
  * local[32]):
  *   - dimension tables (region/nation/customer/supplier/part) are broadcast
  *     — no shuffle of the fact side for those joins; only genuinely large
  *     joins (orders⋈lineitem) shuffle on their keys;
  *   - aggregates are partial (map-side combine) by construction — declared
  *     `groupBy().agg()` lets Catalyst plan HashAggregate partial/final;
  *   - double sums route through DECIMAL(18,2) so results are
  *     order-independent (needed for the DuckDB oracle AND for deterministic
  *     re-runs under AQE re-partitioning at scale);
  *   - windows partition by high-cardinality keys (o_custkey/user_id), never
  *     a global ORDER BY without PARTITION BY.
  */
object RelationalQueries {

  import QueryDef._

  /** Exact revenue term: decimal math is order-independent, so the sum is
    * deterministic under any partitioning.
    */
  private def revenue =
    col("l_extendedprice").cast("decimal(18,2)") * (lit(1) - col("l_discount").cast("decimal(4,2)"))

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  private def registerViews(spark: SparkSession, sf: String, names: String*): Unit =
    names.foreach(n => table(spark, sf, n).createOrReplaceTempView(n))

  def all: Seq[QueryDef] = Seq(
    // Pricing-summary aggregation (TPC-H Q1 flavor): partial+final hash agg,
    // no join, 6 output rows.
    QueryDef(
      "q1_pricing_summary",
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  sum(l_quantity) AS sum_qty,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
          |  count(*) AS count_order
          |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "lineitem")
          .filter(col("l_shipdate").cast("date") <= to_date(lit("2000-12-01")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"), // integral doubles: exact in fp
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
            sum(revenue).cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order")
          )
    ),
    // Shipping-priority top-K (TPC-H Q3 flavor): broadcast dim join +
    // shuffled fact join + agg + deterministic top-10.
    QueryDef(
      "q3_shipping_priority",
      Some(
        s"""SELECT l_orderkey,
           |  CAST(sum($revenueSql) AS DOUBLE) AS revenue
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
           |  AND CAST(l_shipdate AS DATE) > DATE '1996-03-15'
           |GROUP BY l_orderkey
           |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
      ),
      (spark, sf) => {
        val cust = table(spark, sf, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = table(spark, sf, "orders")
          .filter(col("o_orderdate").cast("date") < to_date(lit("1998-03-15")))
        val li = table(spark, sf, "lineitem")
          .filter(col("l_shipdate").cast("date") > to_date(lit("1996-03-15")))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey")
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      }
    ),
    // Local-supplier volume (TPC-H Q5 flavor): 5-way join, broadcast all
    // dims, shuffle only orders⋈lineitem.
    QueryDef(
      "q5_local_supplier_volume",
      Some(
        s"""SELECT n_name, CAST(sum($revenueSql) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |GROUP BY n_name""".stripMargin
      ),
      (spark, sf) => {
        val nation = table(spark, sf, "nation")
        val region = table(spark, sf, "region").filter(col("r_name") === "ASIA")
        val asiaNations = broadcast(
          nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        )
        table(spark, sf, "lineitem")
          .join(table(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(spark, sf, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(
            broadcast(table(spark, sf, "customer")),
            col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey")
          )
          .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sum(revenue).cast("double").as("revenue"))
      }
    ),
    // Window function: per-customer top-3 orders by value.
    QueryDef(
      "q_window_top_orders",
      Some(
        """SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
          |  SELECT o_custkey, o_orderkey,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) t WHERE rn <= 3""".stripMargin
      ),
      (spark, sf) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        table(spark, sf, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
      }
    ),
    // Sessionization over the event stream table: lag + gap>30min breaks.
    // events.ts is read as Long nanoseconds (nanosAsLong); the oracle uses
    // epoch_ns() for the same integer value.
    QueryDef(
      "q_sessionize",
      Some(
        """WITH d AS (
          |  SELECT user_id,
          |    CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) IS NULL
          |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) > 1800000000000
          |         THEN 1 ELSE 0 END AS brk
          |  FROM events)
          |SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions FROM d GROUP BY user_id""".stripMargin
      ),
      (spark, sf) => {
        registerViews(spark, sf, "events")
        spark.sql(
          """WITH d AS (
            |  SELECT user_id,
            |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000000
            |         THEN 1 ELSE 0 END AS brk
            |  FROM events)
            |SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions FROM d GROUP BY user_id""".stripMargin
        )
      }
    ),
    // Event-type aggregation: exact count + min/max (order-independent).
    QueryDef(
      "q_event_stats",
      Some(
        """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
          |  min(value) AS min_value, max(value) AS max_value
          |FROM events GROUP BY event_type""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "events")
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            countDistinct("user_id").as("n_users"),
            min("value").as("min_value"),
            max("value").as("max_value")
          )
    ),
    // Left-semi join: customers with at least one order.
    QueryDef(
      "q_semi_join",
      Some("SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),
      (spark, sf) =>
        table(spark, sf, "customer")
          .join(table(spark, sf, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey")
    ),
    // Left-anti join: orders with no lineitem rows.
    QueryDef(
      "q_anti_join",
      Some("SELECT o_orderkey FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)"),
      (spark, sf) =>
        table(spark, sf, "orders")
          .join(table(spark, sf, "lineitem"), col("o_orderkey") === col("l_orderkey"), "left_anti")
          .select("o_orderkey")
    ),
    // Set operations: INTERSECT then EXCEPT (distinct set semantics).
    QueryDef(
      "q_set_ops",
      Some(
        """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          |INTERSECT
          |SELECT c_custkey FROM customer WHERE c_acctbal > 1000
          |EXCEPT
          |SELECT c_custkey FROM customer WHERE c_nationkey = 3""".stripMargin
      ),
      (spark, sf) => {
        val c = table(spark, sf, "customer")
        c.filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
          .intersect(c.filter(col("c_acctbal") > 1000).select("c_custkey"))
          .except(c.filter(col("c_nationkey") === 3).select("c_custkey"))
      }
    ),
    // ROLLUP over a broadcast dim join.
    QueryDef(
      "q_rollup",
      Some(
        """SELECT n_name, c_mktsegment, count(*) AS n
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin
      ),
      (spark, sf) => {
        registerViews(spark, sf, "customer", "nation")
        spark.sql(
          """SELECT n_name, c_mktsegment, count(*) AS n
            |FROM customer JOIN nation ON c_nationkey = n_nationkey
            |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin
        )
      }
    ),
    // CUBE over the fact table.
    QueryDef(
      "q_cube",
      Some(
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
          |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
    ),
    // Semi-structured JSON column: extract + aggregate (events.props).
    QueryDef(
      "q_json_extract",
      Some(
        """SELECT event_type,
          |  CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
          |  CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT) AS max_k
          |FROM events GROUP BY event_type""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "events")
          .groupBy("event_type")
          .agg(
            sum(get_json_object(col("props"), "$.k").cast("int")).as("sum_k"),
            max(get_json_object(col("props"), "$.k").cast("int")).as("max_k")
          )
    ),
    // GROUPING SETS via SQL.
    QueryDef(
      "q_grouping_sets",
      Some(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin
      ),
      (spark, sf) => {
        registerViews(spark, sf, "lineitem")
        spark.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin
        )
      }
    ),
    // Time-series rollup: monthly order volume via date_trunc.
    QueryDef(
      "q_monthly_orders",
      Some(
        """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders GROUP BY 1""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total")
          )
    ),
    // Scalar string functions: upper/substr/length/concat through the scan.
    QueryDef(
      "q_string_funcs",
      Some(
        """SELECT c_custkey,
          |  upper(substr(c_name, 1, 8)) AS prefix,
          |  CAST(length(c_name) AS BIGINT) AS name_len,
          |  concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_key
          |FROM customer""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "customer")
          .select(
            col("c_custkey"),
            upper(substring(col("c_name"), 1, 8)).as("prefix"),
            length(col("c_name")).cast("long").as("name_len"),
            concat(col("c_mktsegment"), lit("#"), col("c_nationkey").cast("string")).as("seg_key")
          )
    ),
    // Skew-salted join: result must equal the plain join (salt-invariant).
    QueryDef(
      "q_salted_join",
      Some(
        """SELECT s_nationkey, count(*) AS n, sum(l_quantity) AS sum_qty
          |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          |GROUP BY s_nationkey""".stripMargin
      ),
      (spark, sf) =>
        graft.relational.Scale
          .saltedJoin(
            table(spark, sf, "lineitem"),
            table(spark, sf, "supplier"),
            "l_suppkey",
            "s_suppkey",
            saltFactor = 8
          )
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    ),
    // Salted two-phase aggregation: result must equal the plain GROUP BY
    // (the salt only reshapes the shuffle, never the counts).
    QueryDef(
      "q_salted_count",
      Some("SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1"),
      (spark, sf) =>
        graft.relational.Scale
          .saltedCount(table(spark, sf, "lineitem"), "l_returnflag", saltFactor = 8)
    ),
    // Bucketed co-located join: shuffle paid at write time, join reads
    // bucket-aligned (no Exchange before the join in the plan).
    QueryDef(
      "q_bucketed_join",
      Some(
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |GROUP BY o_orderstatus""".stripMargin
      ),
      (spark, sf) =>
        graft.relational.Scale
          .bucketedJoin(
            spark,
            table(spark, sf, "orders").withColumnRenamed("o_orderkey", "k"),
            table(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "k"),
            "graft_orders_bucketed",
            "graft_lineitem_bucketed",
            "k",
            buckets = 8
          )
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price")
          )
    ),
    // Typed Aggregator (UDAF surface): exact weighted average of event
    // value (cents) weighted by the JSON k field.
    QueryDef(
      "q_typed_udaf",
      Some(
        """SELECT event_type,
          |  CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_wcents,
          |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_w
          |FROM events GROUP BY event_type""".stripMargin
      ),
      (spark, sf) => {
        import spark.implicits._
        val pairs = table(spark, sf, "events")
          .select(
            col("event_type"),
            round(col("value") * 100).cast("long").as("cents"),
            get_json_object(col("props"), "$.k").cast("long").as("w")
          )
          .as[(String, Long, Long)]
        pairs
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(graft.relational.WeightedAvg.toColumn)
          .map { case (eventType, (wcents, w)) => (eventType, wcents, w) }
          .toDF("event_type", "sum_wcents", "sum_w")
      }
    ),
    // Sort + limit with deterministic tie-break.
    QueryDef(
      "q_top_customers",
      Some(
        "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10"
      ),
      (spark, sf) =>
        table(spark, sf, "customer")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
          .limit(10)
          .select("c_custkey", "c_name", "c_acctbal")
    ),
    // As-of join (time-series lookup Spark lacks as a built-in): every
    // event gets the timestamp of the same user's latest purchase at or
    // before it. Spark runs the union+running-window form (one shuffle, no
    // range scan); the oracle is DuckDB's native ASOF LEFT JOIN — two
    // completely different lowering strategies must agree row-for-row.
    QueryDef(
      "q_asof_join",
      Some(
        // microsecond event time on both sides: DuckDB's parquet reader
        // carries TIMESTAMP_NS at microsecond precision, so ns-level values
        // cannot round-trip the oracle — compare at the precision both
        // engines share.
        """SELECT l.event_id, r.pts AS last_purchase_ts
          |FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us FROM events) l
          |ASOF LEFT JOIN (SELECT DISTINCT user_id, epoch_ns(ts) // 1000 AS pts
          |                FROM events WHERE event_type = 'purchase') r
          |ON l.user_id = r.user_id AND l.us >= r.pts""".stripMargin
      ),
      (spark, sf) => {
        val ev = table(spark, sf, "events")
          .selectExpr("event_id", "user_id", "ts div 1000 AS us")
        val purchases = table(spark, sf, "events")
          .filter(col("event_type") === "purchase")
          .selectExpr("user_id", "ts div 1000 AS __pts")
          .distinct()
        graft.relational.AsOf
          .asofJoin(ev, purchases, key = "user_id", leftTs = "us", rightTs = "__pts",
            valCol = "__pts", outCol = "last_purchase_ts")
          .select("event_id", "last_purchase_ts")
      }
    ),
    // TPC-H Q4 shape (EXISTS → left-semi join + date-range scan filter),
    // adapted to the slimmed lineitem schema: "late" = a line shipped more
    // than 400 days after the order date (the synthetic ship lags are wide). Counts only (no fp).
    QueryDef(
      "q4_order_priority",
      Some(
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
          |FROM orders
          |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
          |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 400)
          |GROUP BY o_orderpriority""".stripMargin
      ),
      (spark, sf) => {
        val lines = table(spark, sf, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
        table(spark, sf, "orders")
          .filter(
            col("o_orderdate").cast("date") >= to_date(lit("1996-07-01")) &&
              col("o_orderdate").cast("date") < to_date(lit("1996-10-01"))
          )
          .join(
            lines,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate").cast("date") > date_add(col("o_orderdate").cast("date"), 400),
            "left_semi"
          )
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      }
    ),
    // TPC-H Q10 shape: returned-lineitem revenue rolled up per customer,
    // deterministic top-20 (decimal-routed revenue sum).
    QueryDef(
      "q10_returned_revenue",
      Some(
        s"""SELECT c_custkey, c_name, CAST(sum($revenueSql) AS DOUBLE) AS revenue
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |WHERE l_returnflag = 'R'
           |GROUP BY c_custkey, c_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "lineitem")
          .filter(col("l_returnflag") === "R")
          .join(table(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(spark, sf, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_name")
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
    ),
    // TPC-H Q6 shape: single-table predicate + decimal-exact revenue sum —
    // the pushdown showcase (every filter lands in the parquet scan).
    QueryDef(
      "q6_forecast_revenue",
      Some(
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
          |FROM lineitem
          |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "lineitem")
          .filter(
            col("l_shipdate").cast("date") >= to_date(lit("1996-01-01")) &&
              col("l_shipdate").cast("date") < to_date(lit("1997-01-01")) &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24
          )
          .agg(
            sum(col("l_extendedprice").cast("decimal(18,2)") * col("l_discount").cast("decimal(4,2)"))
              .cast("double")
              .as("revenue")
          )
    ),
    // TPC-H Q18 shape: large-quantity orders via HAVING threshold on the
    // grouped fact, then customer enrichment (integral-double qty sums are
    // fp-exact under any partitioning).
    QueryDef(
      "q18_large_orders",
      Some(
        """SELECT c_name, o_orderkey, sum(l_quantity) AS total_qty
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |GROUP BY c_name, o_orderkey
          |HAVING sum(l_quantity) > 150""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "lineitem")
          .join(table(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(spark, sf, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy("c_name", "o_orderkey")
          .agg(sum("l_quantity").as("total_qty"))
          .filter(col("total_qty") > 150)
    ),
    // TPC-H Q14 shape: promo revenue share — lineitem⋈part (broadcast dim),
    // ratio of two decimal-exact sums, divided once in double. Also the
    // only query family touching the `part` table, closing table coverage.
    QueryDef(
      "q14_promo_revenue",
      Some(
        s"""SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revenueSql
           |                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS DOUBLE) * 100.0
           |  / CAST(sum($revenueSql) AS DOUBLE) AS promo_pct
           |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin
      ),
      (spark, sf) => {
        val promo = sum(
          when(col("p_type") === "PROMO", revenue).otherwise(lit(0).cast("decimal(18,2)"))
        ).cast("double")
        table(spark, sf, "lineitem")
          .join(broadcast(table(spark, sf, "part")), col("l_partkey") === col("p_partkey"))
          .agg((promo * lit(100.0) / sum(revenue).cast("double")).as("promo_pct"))
      }
    ),
    // TPC-H Q12 shape (join + conditional CASE-bucket aggregation),
    // adapted: lines bucketed by order priority per return flag.
    QueryDef(
      "q12_flag_priority",
      Some(
        """SELECT l_returnflag,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
          |GROUP BY l_returnflag""".stripMargin
      ),
      (spark, sf) => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        table(spark, sf, "orders")
          .join(table(spark, sf, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate").cast("date") >= col("o_orderdate").cast("date"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!high, 1L).otherwise(0L)).as("low_line_count")
          )
      }
    ),
    // Partitioned sink + partition-pruned read: orders written partitioned
    // by year, then a year-filtered aggregate back off the partitioned
    // layout — at 100 TB the filter must prune directories, not scan and
    // discard (the spec asserts PartitionFilters in the plan; this entry
    // gates the values).
    QueryDef(
      "o2b_partitioned_sink",
      Some(
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
          |FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1""".stripMargin
      ),
      (spark, sf) => {
        val out = tmpDir("o2b")
        table(spark, sf, "orders")
          .withColumn("o_year", year(col("o_orderdate")))
          .write
          .partitionBy("o_year")
          .mode("overwrite")
          .parquet(s"$out/orders_by_year")
        spark.read
          .parquet(s"$out/orders_by_year")
          .filter(col("o_year") === 1995)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
      }
    ),
    // Weekly retention cohorts: classic event-analytics rollup — users
    // bucketed by first-active week, distinct actives per (cohort, offset).
    QueryDef(
      "q_retention_cohorts",
      Some(
        """WITH w AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 86400000000 // 7 AS wk FROM events),
          |c AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY 1)
          |SELECT c.cw AS cohort_week, w.wk - c.cw AS week_offset,
          |       CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
          |FROM w JOIN c USING (user_id) GROUP BY 1, 2""".stripMargin
      ),
      (spark, sf) => {
        val weeks = table(spark, sf, "events")
          .selectExpr("user_id", "ts div 1000 div 86400000000 div 7 AS wk")
          .distinct()
        val cohorts = weeks.groupBy("user_id").agg(min(col("wk")).as("cw"))
        weeks
          .join(cohorts, "user_id")
          .groupBy(col("cw").as("cohort_week"), (col("wk") - col("cw")).as("week_offset"))
          .agg(count_distinct(col("user_id")).as("n_users"))
      }
    ),
    // Exact interpolated percentiles per group (Spark `percentile` and
    // DuckDB `quantile_cont` both implement the R-7 definition). Exact
    // percentile buffers per-group values — at 100 TB swap to
    // approx_percentile (t-digest, mergeable partials); this entry pins
    // the exact baseline the sketch would be judged against.
    QueryDef(
      "q_percentiles",
      Some(
        """SELECT event_type, quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.9) AS p90
          |FROM events GROUP BY 1""".stripMargin
      ),
      (spark, sf) =>
        table(spark, sf, "events")
          .groupBy("event_type")
          .agg(
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.9)").as("p90")
          )
    ),
    // Range (interval) join: clicks by the same user within ±5 minutes of
    // each error event. Spark runs the binned equi-join (≤2 bin probes per
    // left row, exact BETWEEN trim); the oracle is DuckDB's inequality
    // join — different lowering, identical counts.
    QueryDef(
      "q_range_join",
      Some(
        """WITH er AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us FROM events WHERE event_type = 'error'),
          |cl AS (SELECT user_id, epoch_ns(ts) // 1000 AS cus FROM events WHERE event_type = 'click')
          |SELECT er.event_id, CAST(count(cl.cus) AS BIGINT) AS n_clicks
          |FROM er LEFT JOIN cl ON er.user_id = cl.user_id
          |  AND cl.cus BETWEEN er.us - 300000000 AND er.us + 300000000
          |GROUP BY 1""".stripMargin
      ),
      (spark, sf) => {
        val ev = table(spark, sf, "events")
        val errors = ev
          .filter(col("event_type") === "error")
          .selectExpr("event_id", "user_id", "ts div 1000 AS us")
        val clicks = ev
          .filter(col("event_type") === "click")
          .selectExpr("user_id", "ts div 1000 AS cus")
        val pairs = graft.relational.RangeJoin
          .rangeJoin(errors, clicks, key = "user_id", lts = "us", rts = "cus",
            lower = -300000000L, upper = 300000000L)
        val counts = pairs.groupBy("event_id").agg(count(col("cus")).as("__n"))
        errors
          .join(counts, Seq("event_id"), "left")
          .select(col("event_id"), coalesce(col("__n"), lit(0L)).as("n_clicks"))
      }
    )
  )
}
