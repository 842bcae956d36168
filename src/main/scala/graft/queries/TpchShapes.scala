package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (Q2, Q7, Q8, Q9, Q11, Q13, Q15, Q16,
  * Q17, Q19, Q20, Q21, Q22), adapted to the slimmed synthetic star schema
  * (no partsupp table, no commit/receipt dates — substitutes noted per
  * query). These exist to exercise the Catalyst plan patterns the first
  * batch (Q1/Q3/Q4/Q5/Q6/Q10/Q12/Q14/Q18) does not:
  *
  *   - correlated scalar subqueries (= min / < scaled avg): Q2, Q17 —
  *     Catalyst decorrelates to an aggregate + rewritten join, the shape
  *     that stays shuffle-bounded at 100 TB;
  *   - scalar subquery thresholds over a CTE the query itself built:
  *     Q11, Q15, Q22 — one extra pass over a tiny aggregate, not the fact;
  *   - EXISTS + NOT EXISTS double correlation on the same fact: Q21 —
  *     left-semi ⊕ left-anti joins on the join key, no row explosion;
  *   - NOT IN with a null-safe dimension subquery: Q16;
  *   - IN over a grouped-HAVING fact subquery: Q20;
  *   - disjunctive mixed-table predicates: Q19 — the OR of ANDs must still
  *     reach the scans as a partial pushdown (per-table OR envelope);
  *   - left-outer + two-level aggregation (histogram of counts): Q13;
  *   - multi-way nation/region joins with CASE-share division: Q7, Q8, Q9.
  *
  * All are expressed in Spark SQL over temp views — declarative text is
  * what Catalyst optimizes best, and the oracle is the same query in
  * DuckDB dialect. Oracle-match rules (decimal-routed double sums, BIGINT
  * count casts, INT year casts) follow the QueryDef scaladoc.
  */
object TpchShapes {

  import QueryDef._

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  private def viewsAndSql(names: Seq[String], sql: String)(spark: SparkSession, sf: String): DataFrame = {
    names.foreach(n => table(spark, sf, n).createOrReplaceTempView(n))
    spark.sql(sql)
  }

  def all: Seq[QueryDef] = Seq(
    // Q2 shape: min-cost supplier per part via a correlated scalar min
    // subquery (partsupp's min ps_supplycost becomes min l_extendedprice).
    // Exact double equality is safe: both engines compare the same parquet
    // values, min is order-independent.
    QueryDef(
      "q2_min_price_supplier",
      Some(
        """SELECT DISTINCT p_partkey, s_name, l_extendedprice AS min_price
          |FROM lineitem
          |JOIN part ON p_partkey = l_partkey
          |JOIN supplier ON s_suppkey = l_suppkey
          |WHERE p_size <= 5
          |  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
          |                         FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "part", "supplier"),
        """SELECT DISTINCT p_partkey, s_name, l_extendedprice AS min_price
          |FROM lineitem
          |JOIN part ON p_partkey = l_partkey
          |JOIN supplier ON s_suppkey = l_suppkey
          |WHERE p_size <= 5
          |  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
          |                         FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin
      )
    ),
    // Q7 shape: bilateral shipping volume between two nations, by year.
    QueryDef(
      "q7_volume_shipping",
      Some(
        s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
           |  CAST(sum($revenueSql) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON o_orderkey = l_orderkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN customer ON c_custkey = o_custkey
           |JOIN nation n1 ON n1.n_nationkey = s_nationkey
           |JOIN nation n2 ON n2.n_nationkey = c_nationkey
           |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
           |GROUP BY 1, 2, 3""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "orders", "supplier", "customer", "nation"),
        s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
           |  CAST(sum($revenueSql) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON o_orderkey = l_orderkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN customer ON c_custkey = o_custkey
           |JOIN nation n1 ON n1.n_nationkey = s_nationkey
           |JOIN nation n2 ON n2.n_nationkey = c_nationkey
           |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
           |GROUP BY 1, 2, 3""".stripMargin
      )
    ),
    // Q8 shape: one nation's market share of revenue sold to one region's
    // customers, per order year. Ratio of two decimal-exact sums, divided
    // once in double.
    QueryDef(
      "q8_market_share",
      Some(
        s"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
           |  CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN $revenueSql
           |               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           |    / CAST(sum($revenueSql) AS DOUBLE) AS mkt_share
           |FROM lineitem
           |JOIN orders ON o_orderkey = l_orderkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN customer ON c_custkey = o_custkey
           |JOIN nation n1 ON n1.n_nationkey = s_nationkey
           |JOIN nation n2 ON n2.n_nationkey = c_nationkey
           |JOIN region ON r_regionkey = n2.n_regionkey
           |WHERE r_name = 'ASIA'
           |GROUP BY 1""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "orders", "supplier", "customer", "nation", "region"),
        s"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
           |  CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN $revenueSql
           |               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           |    / CAST(sum($revenueSql) AS DOUBLE) AS mkt_share
           |FROM lineitem
           |JOIN orders ON o_orderkey = l_orderkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN customer ON c_custkey = o_custkey
           |JOIN nation n1 ON n1.n_nationkey = s_nationkey
           |JOIN nation n2 ON n2.n_nationkey = c_nationkey
           |JOIN region ON r_regionkey = n2.n_regionkey
           |WHERE r_name = 'ASIA'
           |GROUP BY 1""".stripMargin
      )
    ),
    // Q9 shape: product-line profit by supplier nation and year. Without
    // ps_supplycost, cost = 10% of p_retailprice per unit; the two terms
    // are summed as exact decimals and combined once in double.
    QueryDef(
      "q9_product_profit",
      Some(
        s"""SELECT n_name AS nation,
           |  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS o_year,
           |  CAST(sum($revenueSql) AS DOUBLE)
           |    - CAST(sum(CAST(l_quantity AS DECIMAL(3,0)) * CAST(p_retailprice AS DECIMAL(6,2))) AS DOUBLE) * 0.10
           |    AS profit
           |FROM lineitem
           |JOIN part ON p_partkey = l_partkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN nation ON n_nationkey = s_nationkey
           |WHERE p_name LIKE '%gear%'
           |GROUP BY 1, 2""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "part", "supplier", "nation"),
        s"""SELECT n_name AS nation,
           |  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS o_year,
           |  CAST(sum($revenueSql) AS DOUBLE)
           |    - CAST(sum(CAST(l_quantity AS DECIMAL(3,0)) * CAST(p_retailprice AS DECIMAL(6,2))) AS DOUBLE) * 0.10
           |    AS profit
           |FROM lineitem
           |JOIN part ON p_partkey = l_partkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN nation ON n_nationkey = s_nationkey
           |WHERE p_name LIKE '%gear%'
           |GROUP BY 1, 2""".stripMargin
      )
    ),
    // Q11 shape: parts whose shipped value from one nation's suppliers
    // exceeds a fraction of that nation's total — global scalar threshold
    // over the query's own CTE (one tiny extra aggregate pass).
    QueryDef(
      "q11_important_parts",
      Some(
        """WITH v AS (
          |  SELECT l_partkey,
          |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(3,0))) AS val
          |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
          |  WHERE s_nationkey = 7
          |  GROUP BY l_partkey)
          |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
          |FROM v
          |WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM v)""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "supplier"),
        """WITH v AS (
          |  SELECT l_partkey,
          |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(3,0))) AS val
          |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
          |  WHERE s_nationkey = 7
          |  GROUP BY l_partkey)
          |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
          |FROM v
          |WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM v)""".stripMargin
      )
    ),
    // Q13 shape: distribution of per-customer order counts (left outer join
    // keeps zero-order customers; the join-condition filter stands in for
    // the o_comment NOT LIKE of real Q13).
    QueryDef(
      "q13_order_count_distribution",
      Some(
        """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
          |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          |  FROM customer LEFT JOIN orders
          |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          |  GROUP BY c_custkey) t
          |GROUP BY c_count""".stripMargin
      ),
      viewsAndSql(
        Seq("customer", "orders"),
        """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
          |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          |  FROM customer LEFT JOIN orders
          |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          |  GROUP BY c_custkey) t
          |GROUP BY c_count""".stripMargin
      )
    ),
    // Q15 shape: supplier(s) with the maximum half-year revenue — scalar
    // max over the query's own revenue CTE; exact-decimal equality keeps
    // the tie set deterministic.
    QueryDef(
      "q15_top_supplier",
      Some(
        s"""WITH r AS (
           |  SELECT l_suppkey, sum($revenueSql) AS total_rev
           |  FROM lineitem
           |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           |    AND CAST(l_shipdate AS DATE) < DATE '1996-07-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
           |FROM supplier JOIN r ON s_suppkey = l_suppkey
           |WHERE total_rev = (SELECT max(total_rev) FROM r)""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "supplier"),
        s"""WITH r AS (
           |  SELECT l_suppkey, sum($revenueSql) AS total_rev
           |  FROM lineitem
           |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           |    AND CAST(l_shipdate AS DATE) < DATE '1996-07-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
           |FROM supplier JOIN r ON s_suppkey = l_suppkey
           |WHERE total_rev = (SELECT max(total_rev) FROM r)""".stripMargin
      )
    ),
    // Q16 shape: distinct supplier count per part attribute bucket, with a
    // NOT IN exclusion subquery (negative-balance suppliers stand in for
    // the complaints filter).
    QueryDef(
      "q16_supplier_count",
      Some(
        """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY 1, 2, 3""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "part", "supplier"),
        """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY 1, 2, 3""".stripMargin
      )
    ),
    // Q17 shape: revenue impact of small-quantity lines — correlated
    // scalar avg subquery per part (avg of integral doubles is an exact
    // sum / count, so the 0.2× threshold is bit-identical across engines).
    QueryDef(
      "q17_small_quantity_revenue",
      Some(
        """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE p_brand = 'Brand#3'
          |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
          |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "part"),
        """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE p_brand = 'Brand#3'
          |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
          |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin
      )
    ),
    // Q19 shape: disjunction of brand/size/quantity conjunctions across
    // both join sides — the partial-pushdown stress test (each scan should
    // still receive its table-local OR envelope).
    QueryDef(
      "q19_disjunctive_revenue",
      Some(
        s"""SELECT CAST(sum($revenueSql) AS DOUBLE) AS revenue
           |FROM lineitem JOIN part ON p_partkey = l_partkey
           |WHERE (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15  AND l_quantity BETWEEN 1 AND 21)
           |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
           |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "part"),
        s"""SELECT CAST(sum($revenueSql) AS DOUBLE) AS revenue
           |FROM lineitem JOIN part ON p_partkey = l_partkey
           |WHERE (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15  AND l_quantity BETWEEN 1 AND 21)
           |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
           |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin
      )
    ),
    // Q20 shape: suppliers who shipped a large volume of matching parts in
    // one year — IN over a grouped-HAVING fact subquery (the partsupp
    // availability check becomes a shipped-quantity threshold).
    QueryDef(
      "q20_volume_shippers",
      Some(
        """SELECT s_suppkey, s_name FROM supplier
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
          |  WHERE p_name LIKE '%bolt%'
          |    AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          |    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
          |  GROUP BY l_suppkey
          |  HAVING sum(l_quantity) > 300)""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "part", "supplier"),
        """SELECT s_suppkey, s_name FROM supplier
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
          |  WHERE p_name LIKE '%bolt%'
          |    AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          |    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
          |  GROUP BY l_suppkey
          |  HAVING sum(l_quantity) > 300)""".stripMargin
      )
    ),
    // Q21 shape: per-supplier count of finished orders where this supplier
    // returned its line ('R'), at least one other supplier is on the order
    // (EXISTS), and no other supplier returned (NOT EXISTS) — the
    // double-correlated semi ⊕ anti join pattern on the same fact.
    QueryDef(
      "q21_sole_returner",
      Some(
        """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
          |FROM supplier
          |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY s_name""".stripMargin
      ),
      viewsAndSql(
        Seq("lineitem", "orders", "supplier"),
        """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
          |FROM supplier
          |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY s_name""".stripMargin
      )
    ),
    // Q22 shape: well-funded customers with no urgent orders (every
    // customer has *some* order in this data, so the anti-join correlates
    // on a predicate subset to stay non-trivial), grouped by a
    // derived country code — NOT EXISTS anti-join plus a global scalar avg
    // threshold (decimal-exact sum / count, compared in double).
    QueryDef(
      "q22_idle_customers",
      Some(
        """SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
          |  CAST(count(*) AS BIGINT) AS numcust,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
          |FROM customer
          |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          |                   FROM customer WHERE c_acctbal > 0.0)
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
          |GROUP BY 1""".stripMargin
      ),
      viewsAndSql(
        Seq("customer", "orders"),
        """SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
          |  CAST(count(*) AS BIGINT) AS numcust,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
          |FROM customer
          |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          |                   FROM customer WHERE c_acctbal > 0.0)
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
          |GROUP BY 1""".stripMargin
      )
    )
  )
}
