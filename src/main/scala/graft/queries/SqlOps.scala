package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Det, Tables => T}

/** The SQL-text surface: queries issued through `spark.sql` over temp
  * views — proving a reference user can run plain ANSI SQL (subqueries,
  * GROUPING SETS) against this engine, not only the DataFrame API. The
  * SQL is written in the dialect intersection, so the SAME text (modulo
  * nothing) runs on DuckDB as the oracle — the strongest possible
  * parity statement for the SQL front door.
  *
  * Scale notes: the scalar subquery compiles to a broadcast of one row;
  * IN/EXISTS compile to semi joins (shuffle ∝ distinct keys); GROUPING
  * SETS is one pass of partial+final hash aggregation per set over a
  * single scan (Spark Expand), never N scans.
  */
object SqlOps {
  type Q = (SparkSession, String) => DataFrame
  import Det.tbl

  /** Deterministic decimal-domain average (identical text both engines;
    * §7.4 — a raw AVG(double) scalar subquery could flip boundary rows). */
  private val detAvgPrice =
    "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE) / COUNT(*)"

  private def subquerySql(cust: String, ords: String) =
    s"""SELECT c_custkey, c_name, c_acctbal
        FROM $cust c
        WHERE c_acctbal > (SELECT $detAvgPrice FROM $ords) / 100
          AND c_custkey IN (SELECT o_custkey FROM $ords WHERE o_orderstatus = 'O')
          AND EXISTS (SELECT 1 FROM $ords o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey"""

  private def gsetsSql(ords: String) =
    s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
          CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
          CAST(GROUPING(o_orderstatus) AS INT) AS g_s
        FROM $ords
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST,
          g_p, g_s"""

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    * SQL-text form of top-k-per-group. Spark decorrelates the lateral
    * into a ranked join (WindowGroupLimit applies); DuckDB executes it
    * natively; same text, same rows. */
  private def lateralSql(reg: String, nat: String, cust: String) =
    s"""SELECT r.r_name, t.n_name, t.n_cust
        FROM $reg r, LATERAL (
          SELECT n.n_name, COUNT(*) AS n_cust
          FROM $nat n JOIN $cust c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_cust DESC, n.n_name ASC
          LIMIT 2) t
        ORDER BY r.r_name, t.n_cust DESC, t.n_name"""

  /** Recursive CTE (Spark 4 + DuckDB both run this text): a generated
    * bucket spine joined back to the fact table — the date-spine /
    * series-completion pattern that otherwise needs a generator API. */
  private def recursiveSql(ords: String) =
    s"""WITH RECURSIVE buckets(b) AS (
          SELECT 0
          UNION ALL
          SELECT b + 1 FROM buckets WHERE b < 9)
        SELECT b, COUNT(o_orderkey) AS n_orders
        FROM buckets LEFT JOIN $ords ON o_orderkey % 10 = b
        GROUP BY b ORDER BY b"""

  /** Window functions as SQL text: ranking, offset, and both ROWS and
    * integer-RANGE frames in one pass. Casts pin the dialect-divergent
    * result types (DuckDB ROW_NUMBER/SUM(BIGINT) return BIGINT/HUGEINT,
    * Spark INT/BIGINT); (o_custkey, o_orderkey) is unique, so every
    * window value is deterministic. */
  private def windowSql(ords: String) =
    s"""SELECT o_custkey, o_orderkey,
          CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS INT) AS rn,
          LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key,
          CAST(SUM(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_key,
          CAST(SUM(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_key
        FROM $ords
        ORDER BY o_custkey, o_orderkey"""

  /** TPC-H Q3 (shipping priority), adapted to the driver's schema
    * (o_orderpriority stands in for the missing o_shippriority; the
    * date cutoff sits inside the generated 1995–2001 span). Revenue is
    * the §7.4 decimal-product sum; the top-10 order is total via the
    * (o_orderdate, l_orderkey) tiebreak. */
  private def tpch3Sql(cust: String, ords: String, li: String) =
    s"""SELECT l_orderkey,
          ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")} AS revenue,
          o_orderdate, o_orderpriority
        FROM $cust c
          JOIN $ords o ON c.c_custkey = o.o_custkey
          JOIN $li l ON l.l_orderkey = o.o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10"""

  /** TPC-H Q5 (local supplier volume): the 6-table snowflake join with
    * the customer-and-supplier same-nation constraint, one year, one
    * region. Same decimal revenue discipline; n_name is unique per
    * group so the DESC order is total. */
  private def tpch5Sql(cust: String, ords: String, li: String,
                       supp: String, nat: String, reg: String) =
    s"""SELECT n_name,
          ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")} AS revenue
        FROM $cust c
          JOIN $ords o ON c.c_custkey = o.o_custkey
          JOIN $li l ON l.l_orderkey = o.o_orderkey
          JOIN $supp s ON l.l_suppkey = s.s_suppkey
            AND c.c_nationkey = s.s_nationkey
          JOIN $nat n ON s.s_nationkey = n.n_nationkey
          JOIN $reg r ON n.n_regionkey = r.r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC"""

  /** TPC-H Q10 (returned-item reporting), adapted to the driver's
    * schema (no c_address/phone/comment columns; one year stands in for
    * the quarter at the small SFs). The outer-join-flavored shape Q3/Q5
    * don't exercise: a fact-side FILTER (returnflag) driving a
    * customer-grain top-k. Revenue is the §7.4 decimal-product sum;
    * c_custkey is unique per group so DESC revenue + custkey is total. */
  private def tpch10Sql(cust: String, ords: String, li: String,
                        nat: String) =
    s"""SELECT c_custkey, c_name,
          ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")} AS revenue,
          c_acctbal, n_name
        FROM $cust c
          JOIN $ords o ON c.c_custkey = o.o_custkey
          JOIN $li l ON l.l_orderkey = o.o_orderkey
          JOIN $nat n ON c.c_nationkey = n.n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20"""

  /** TPC-H Q18 (large-volume customer): the HAVING-IN shape — orders
    * whose lineitem quantity total clears a threshold, rejoined to
    * customer. The HAVING sum rides the exact decimal domain (a raw
    * double sum could flip threshold-boundary orders between engines);
    * threshold 250 sits in the generated distribution's upper tail
    * (~1.5% of orders). o_orderkey is unique per group → total order. */
  private def tpch18Sql(cust: String, ords: String, li: String) =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
          CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE)
            AS sum_qty
        FROM $cust c
          JOIN $ords o ON c.c_custkey = o.o_custkey
          JOIN $li l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM $li
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 100"""

  /** TPC-H Q7 (volume shipping): bidirectional nation-pair revenue by
    * ship year — the OR-of-symmetric-pairs join predicate plus the
    * date-part grouping Q3/Q5/Q10/Q18 don't exercise. EXTRACT(YEAR)
    * carries a CAST because DuckDB returns BIGINT where Spark returns
    * INT; NATION_18/19 both hold suppliers at every SF (probed).
    * Ordinal GROUP BY is the dialect intersection for grouping by an
    * aliased expression. */
  private def tpch7Sql(supp: String, li: String, ords: String,
                       cust: String, nat: String) =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
          ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")} AS revenue
        FROM $supp s
          JOIN $li l ON s.s_suppkey = l.l_suppkey
          JOIN $ords o ON o.o_orderkey = l.l_orderkey
          JOIN $cust c ON c.c_custkey = o.o_custkey
          JOIN $nat n1 ON s.s_nationkey = n1.n_nationkey
          JOIN $nat n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
           OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3"""

  /** TPC-H Q14 (promotion effect): conditional revenue share in one
    * month — the CASE-inside-aggregate shape. Both revenue sums ride
    * the §7.4 decimal-product domain (the CASE sits INSIDE the base
    * cast, so promo and total run the identical chain); the share is
    * one IEEE division ×100, shipped unrounded. */
  private def tpch14Sql(li: String, prt: String) =
    s"""SELECT 100 * ${Det.sqlSumProd(
            "CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0 END",
            "1 - l_discount")}
          / ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")}
          AS promo_revenue_pct
        FROM $li l JOIN $prt p ON p.p_partkey = l.l_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-06-01'
          AND l_shipdate < TIMESTAMP '1996-07-01'"""

  /** TPC-H Q19 (discounted revenue): the disjunction-of-conjunctions
    * predicate over joined tables — the shape that exercises OR
    * pushdown through a join (Catalyst extracts the common p_partkey
    * equi-condition; the brand/size/qty triples filter both sides).
    * Single-row decimal-product aggregate. */
  private def tpch19Sql(li: String, prt: String) =
    s"""SELECT ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")}
          AS revenue
        FROM $li l JOIN $prt p ON p.p_partkey = l.l_partkey
        WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 5 AND 25
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#21' AND p_size BETWEEN 10 AND 40
               AND l_quantity BETWEEN 20 AND 40)"""

  /** TPC-H Q6 (forecasting revenue change): the pure scan-predicate
    * aggregate — every filter (date range, discount band, quantity cap)
    * pushes to the parquet scan; revenue = Σ price·discount in the
    * exact decimal-product domain. Boundary compares run on the SAME
    * parquet doubles and literals in both engines. One row. */
  private def tpch6Sql(li: String) =
    s"""SELECT ${Det.sqlSumProd("l_extendedprice", "l_discount")} AS revenue
        FROM $li
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24"""

  /** TPC-H Q13 (customer distribution): LEFT JOIN + double aggregation
    * — order counts per customer INCLUDING zero-order customers, then
    * the distribution of those counts (the shape that catches an inner
    * join silently dropping the empty group). The o_comment filter of
    * the official query has no column here; counts are BIGINT both
    * engines; c_count is unique per output row ⇒ the DESC order is
    * total. */
  private def tpch13Sql(cust: String, ords: String) =
    s"""SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM $cust c LEFT JOIN $ords o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q1 (pricing summary report): the canonical full-scan
    * aggregate — 4 deterministic sums, 3 deterministic averages, and a
    * count per (returnflag, linestatus). charge's factor
    * (1−disc)·(1+tax) is a per-row IEEE product of ≤2dp doubles (≤4
    * true decimal digits), cast at DECIMAL(14,8) far from its rounding
    * boundary (the [[Det.dsumProd]] contract). The group keys are the
    * ORDER BY — total order. */
  private def tpch1Sql(li: String) =
    s"""SELECT l_returnflag, l_linestatus,
          ${Det.sqlSum("l_quantity")} AS sum_qty,
          ${Det.sqlSum("l_extendedprice")} AS sum_base_price,
          ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")} AS sum_disc_price,
          ${Det.sqlSumProd("l_extendedprice",
            "(1 - l_discount) * (1 + l_tax)")} AS sum_charge,
          ${Det.sqlAvg("l_quantity")} AS avg_qty,
          ${Det.sqlAvg("l_extendedprice")} AS avg_price,
          ${Det.sqlAvg("l_discount")} AS avg_disc,
          COUNT(*) AS count_order
        FROM $li
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""

  /** TPC-H Q4 (order priority checking), adapted to the driver's schema
    * (no l_commitdate/l_receiptdate — "late" is l_shipdate more than 60
    * days after the order date). The equality-correlated EXISTS
    * decorrelates to a semi join; one quarter of orders. Priority is
    * unique per group → total order. */
  private def tpch4Sql(ords: String, li: String) =
    s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM $ords o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM $li l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""

  /** TPC-H Q8 (national market share): the 8-table snowflake with TWO
    * nation legs (customer region gate, supplier nation share) and a
    * CASE-in-aggregate ratio by order year — the widest join pyramid in
    * the suite. Both sums ride the decimal-product domain (numerator's
    * CASE sits inside the base cast, the Q14 precedent); the share is
    * one IEEE division of two deterministic doubles. */
  private def tpch8Sql(prt: String, supp: String, li: String,
                       ords: String, cust: String, nat: String,
                       reg: String) =
    s"""SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
          ${Det.sqlSumProd(
            "CASE WHEN n2.n_name = 'NATION_8' THEN l_extendedprice ELSE 0 END",
            "1 - l_discount")}
          / ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")}
          AS mkt_share
        FROM $prt p
          JOIN $li l ON p.p_partkey = l.l_partkey
          JOIN $supp s ON s.s_suppkey = l.l_suppkey
          JOIN $ords o ON o.o_orderkey = l.l_orderkey
          JOIN $cust c ON c.c_custkey = o.o_custkey
          JOIN $nat n1 ON c.c_nationkey = n1.n_nationkey
          JOIN $reg r ON n1.n_regionkey = r.r_regionkey
          JOIN $nat n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'EUROPE'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND p.p_type = 'MEDIUM'
        GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q12 (shipping priority classes), adapted to the driver's
    * schema (l_linestatus stands in for the missing l_shipmode; "late"
    * is l_shipdate > 30 days past the order date). The twin
    * CASE-count-sum shape over a fact join, one ship year. */
  private def tpch12Sql(ords: String, li: String) =
    s"""SELECT l_linestatus,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM $ords o JOIN $li l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus"""

  /** TPC-H Q15 (top supplier): a named revenue CTE consumed TWICE —
    * once as the join side, once under a scalar MAX subquery — the
    * view-reuse shape. total_revenue is the deterministic decimal sum,
    * so the MAX-equality match is engine-portable (both engines compare
    * the identical set of doubles). */
  private def tpch15Sql(supp: String, li: String) =
    s"""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")}
              AS total_revenue
          FROM $li
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM $supp JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey"""

  /** TPC-H Q17 (small-quantity-order revenue), adapted to the driver's
    * schema (no p_container; brand-only gate, 0.5·avg threshold so the
    * filter is non-empty at every SF — probed). The correlated scalar
    * AVG subquery per part; the threshold rides the deterministic
    * decimal average (a raw AVG(double)'s reduction order could flip
    * boundary rows between engines). One row. */
  private def tpch17Sql(li: String, prt: String) =
    s"""SELECT ${Det.sqlSum("l_extendedprice")} / 7.0 AS avg_yearly
        FROM $li l JOIN $prt p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
            SELECT 0.5 * (${Det.sqlAvg("l_quantity")})
            FROM $li l2 WHERE l2.l_partkey = p.p_partkey)"""

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    * driver's schema ("late" = shipped >60 days after the order date;
    * region gate instead of the official single nation so the row set
    * is non-empty at every SF — probed). The hardest correlation shape
    * in the suite: an equality-correlated EXISTS (another supplier in
    * the order → semi join) AND an equality-correlated NOT EXISTS
    * (no OTHER supplier late → anti join). The official receipt-date
    * correlation would reference TWO outer tables; joining orders
    * inside the subquery keeps the correlation to the single equi-key
    * both engines decorrelate. */
  private def tpch21Sql(supp: String, li: String, ords: String,
                        nat: String) =
    s"""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM $supp s
          JOIN $li l1 ON s.s_suppkey = l1.l_suppkey
          JOIN $ords o ON o.o_orderkey = l1.l_orderkey
          JOIN $nat n ON s.s_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND n.n_regionkey = 3
          AND EXISTS (
            SELECT 1 FROM $li l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM $li l3 JOIN $ords o2 ON o2.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100"""

  /** TPC-H Q22 (global sales opportunity), adapted to the driver's
    * schema (country code = c_nationkey % 10 standing in for the
    * missing phone prefix; "never ordered" has no witnesses in this
    * data — probed — so the anti-join gate is "dormant since 1999").
    * Scalar-average threshold + equality-correlated NOT EXISTS; the
    * threshold rides the deterministic decimal average. */
  private def tpch22Sql(cust: String, ords: String) =
    s"""SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
          ${Det.sqlSum("c_acctbal")} AS totacctbal
        FROM (
          SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
          FROM $cust c
          WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
            AND c_acctbal > (
              SELECT ${Det.sqlAvg("c_acctbal")} FROM $cust
              WHERE c_acctbal > 0 AND c_nationkey % 10 IN (1, 3, 5, 7, 9))
            AND NOT EXISTS (
              SELECT 1 FROM $ords o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01')) t
        GROUP BY cntrycode
        ORDER BY cntrycode"""

  /** TPC-H Q16 (parts/supplier relationship), adapted to the driver's
    * schema: the partsupp relation it needs EXISTS IMPLICITLY as the
    * distinct (l_partkey, l_suppkey) pairs of lineitem (every
    * part-supplier pairing the business transacted), and the official
    * "complaints comment" supplier exclusion becomes the deterministic
    * s_acctbal < 0 gate (no s_comment column). The NOT-IN subquery
    * compiles to a null-aware anti join; supplier_cnt is a
    * COUNT(DISTINCT) over the derived relation. */
  private def tpch16Sql(li: String, prt: String, supp: String) =
    s"""SELECT p_brand, p_type, p_size,
          CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM $li) ps
          JOIN $prt p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps.l_suppkey NOT IN (
            SELECT s_suppkey FROM $supp WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** TPC-H Q2 (best supplier per part), adapted: the partsupp relation
    * derives from lineitem (the Q16 rewrite) and "minimum supply cost"
    * — a column no table carries — becomes MAXIMUM account balance,
    * preserving the query's defining shape: a correlated scalar
    * subquery EQUALITY re-running the region-scoped join per part.
    * acctbal doubles compare raw (identical parquet values both
    * engines); (s_name, p_partkey) is unique per row ⇒ total order. */
  private def tpch2Sql(li: String, prt: String, supp: String,
                       nat: String, reg: String) =
    s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM $li)
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
        FROM $prt p
          JOIN ps ON ps.l_partkey = p.p_partkey
          JOIN $supp s ON s.s_suppkey = ps.l_suppkey
          JOIN $nat n ON s.s_nationkey = n.n_nationkey
          JOIN $reg r ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size = 15 AND p.p_type = 'SMALL' AND r.r_name = 'EUROPE'
          AND s.s_acctbal = (
            SELECT MAX(s2.s_acctbal) FROM ps ps2
              JOIN $supp s2 ON s2.s_suppkey = ps2.l_suppkey
              JOIN $nat n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN $reg r2 ON n2.n_regionkey = r2.r_regionkey
            WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100"""

  /** TPC-H Q9 (product-type profit), adapted: unit supply cost — the
    * partsupp column no table carries — becomes p_retailprice, keeping
    * the defining shape intact (LIKE-filtered part gate, 5-table join,
    * revenue−cost amount, (nation, year) grouping). The amount is a
    * DIFFERENCE of two exact decimal products summed in the exact
    * domain — Spark (18,4)×(14,8)→(33,12) and DuckDB run identical
    * exact decimal arithmetic — rounded once, cast to DOUBLE once. */
  private def tpch9Sql(li: String, prt: String, supp: String,
                       ords: String, nat: String) =
    s"""SELECT n.n_name AS nation,
          CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
          CAST(ROUND(SUM(
            CAST(l_extendedprice AS DECIMAL(18,4))
              * CAST((1 - l_discount) AS DECIMAL(14,8))
            - CAST(p_retailprice AS DECIMAL(18,4))
              * CAST(l_quantity AS DECIMAL(14,8))), 4) AS DOUBLE)
            AS sum_profit
        FROM $prt p
          JOIN $li l ON p.p_partkey = l.l_partkey
          JOIN $supp s ON s.s_suppkey = l.l_suppkey
          JOIN $ords o ON o.o_orderkey = l.l_orderkey
          JOIN $nat n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC"""

  /** TPC-H Q11 (important stock identification), adapted: part "value"
    * — availqty·supplycost over partsupp — becomes discounted revenue
    * through ASIA-nation suppliers, and the official SF-dependent
    * fraction becomes a scale-invariant 2× average, preserving the
    * defining shape: a HAVING/WHERE threshold that is a scalar
    * subquery over the SAME aggregated view consumed twice. The
    * threshold re-sums the 4dp-rounded vals in the exact decimal
    * domain (each is exactly representable at (18,4) — the detAvgPrice
    * pattern), so the cut is one IEEE product of deterministic
    * operands. */
  private def tpch11Sql(li: String, supp: String, nat: String) =
    s"""WITH v AS (
          SELECT l_partkey,
            ${Det.sqlSumProd("l_extendedprice", "1 - l_discount")} AS val
          FROM $li l
            JOIN $supp s ON s.s_suppkey = l.l_suppkey
            JOIN $nat n ON s.s_nationkey = n.n_nationkey
          WHERE n.n_regionkey = 2
          GROUP BY l_partkey)
        SELECT l_partkey AS p_partkey, val AS part_value
        FROM v
        WHERE val > (SELECT 2 * (${Det.sqlAvg("val")}) FROM v)
        ORDER BY part_value DESC, p_partkey"""

  /** TPC-H Q20 (potential part promotion), adapted: "availqty exceeds
    * half the shipped quantity" — partsupp again — becomes a shipped-
    * volume gate per (supplier, part) pair, preserving the defining
    * shape: nested IN subqueries (supplier ← lineitem group ← LIKE
    * part gate) with a per-pair HAVING aggregate, one ship year. The
    * HAVING sum rides the exact decimal domain. */
  private def tpch20Sql(li: String, prt: String, supp: String) =
    s"""SELECT s_name, s_suppkey
        FROM $supp
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM $li
          WHERE l_partkey IN (
              SELECT p_partkey FROM $prt WHERE p_name LIKE '%widget%')
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 50)
        ORDER BY s_suppkey"""

  val queries: Map[String, Q] = Map(
    // TPC-H Q3/Q5 as SQL text — the canonical decision-support join
    // pyramids. Catalyst gets the join order right from the declared
    // plan (AQE broadcasts the dimension sides at graded scale; the
    // snowflake's nation/region legs broadcast at ANY scale).
    "q_sql_tpch3" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(tpch3Sql("customer", "orders", "lineitem"))
    }),
    "q_sql_tpch5" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.nation(s, d).createOrReplaceTempView("nation")
      T.region(s, d).createOrReplaceTempView("region")
      s.sql(tpch5Sql("customer", "orders", "lineitem", "supplier",
        "nation", "region"))
    }),

    // TPC-H Q10/Q18 (r13) — the returns top-k and HAVING-IN join/agg
    // shapes the Q3/Q5 pair doesn't exercise through the SQL door.
    "q_sql_tpch10" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.nation(s, d).createOrReplaceTempView("nation")
      s.sql(tpch10Sql("customer", "orders", "lineitem", "nation"))
    }),
    "q_sql_tpch18" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(tpch18Sql("customer", "orders", "lineitem"))
    }),
    // TPC-H Q7/Q14/Q19 (r13 second wave) — nation-pair-by-year,
    // CASE-in-aggregate share, and OR-of-conjunctions predicates.
    "q_sql_tpch7" -> ((s, d) => {
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.customer(s, d).createOrReplaceTempView("customer")
      T.nation(s, d).createOrReplaceTempView("nation")
      s.sql(tpch7Sql("supplier", "lineitem", "orders", "customer",
        "nation"))
    }),
    "q_sql_tpch14" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      s.sql(tpch14Sql("lineitem", "part"))
    }),
    "q_sql_tpch6" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(tpch6Sql("lineitem"))
    }),
    "q_sql_tpch13" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(tpch13Sql("customer", "orders"))
    }),
    "q_sql_tpch19" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      s.sql(tpch19Sql("lineitem", "part"))
    }),

    // TPC-H Q1/Q4/Q8/Q12/Q15/Q17/Q21/Q22 (r14) — completing the
    // feasible TPC-H SQL-text surface (Q2/Q9/Q11/Q16/Q20 need the
    // partsupp table the driver's testdata does not generate).
    "q_sql_tpch1" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(tpch1Sql("lineitem"))
    }),
    "q_sql_tpch4" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(tpch4Sql("orders", "lineitem"))
    }),
    "q_sql_tpch8" -> ((s, d) => {
      T.part(s, d).createOrReplaceTempView("part")
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.customer(s, d).createOrReplaceTempView("customer")
      T.nation(s, d).createOrReplaceTempView("nation")
      T.region(s, d).createOrReplaceTempView("region")
      s.sql(tpch8Sql("part", "supplier", "lineitem", "orders",
        "customer", "nation", "region"))
    }),
    "q_sql_tpch12" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(tpch12Sql("orders", "lineitem"))
    }),
    "q_sql_tpch15" -> ((s, d) => {
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(tpch15Sql("supplier", "lineitem"))
    }),
    "q_sql_tpch17" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      s.sql(tpch17Sql("lineitem", "part"))
    }),
    "q_sql_tpch21" -> ((s, d) => {
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.nation(s, d).createOrReplaceTempView("nation")
      s.sql(tpch21Sql("supplier", "lineitem", "orders", "nation"))
    }),
    "q_sql_tpch22" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(tpch22Sql("customer", "orders"))
    }),
    "q_sql_tpch16" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      T.supplier(s, d).createOrReplaceTempView("supplier")
      s.sql(tpch16Sql("lineitem", "part", "supplier"))
    }),
    "q_sql_tpch2" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.nation(s, d).createOrReplaceTempView("nation")
      T.region(s, d).createOrReplaceTempView("region")
      s.sql(tpch2Sql("lineitem", "part", "supplier", "nation", "region"))
    }),
    "q_sql_tpch9" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.nation(s, d).createOrReplaceTempView("nation")
      s.sql(tpch9Sql("lineitem", "part", "supplier", "orders", "nation"))
    }),
    "q_sql_tpch11" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.nation(s, d).createOrReplaceTempView("nation")
      s.sql(tpch11Sql("lineitem", "supplier", "nation"))
    }),
    "q_sql_tpch20" -> ((s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      T.supplier(s, d).createOrReplaceTempView("supplier")
      s.sql(tpch20Sql("lineitem", "part", "supplier"))
    }),

    // Scalar subquery + IN subquery + correlated EXISTS, as SQL text.
    "q_sql_subquery" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(subquerySql("customer", "orders"))
    }),

    // Arbitrary GROUPING SETS (beyond rollup/cube), as SQL text.
    "q_sql_gsets" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(gsetsSql("orders"))
    }),

    // Correlated LATERAL with ORDER BY + LIMIT, as SQL text.
    "q_sql_lateral" -> ((s, d) => {
      T.region(s, d).createOrReplaceTempView("region")
      T.nation(s, d).createOrReplaceTempView("nation")
      T.customer(s, d).createOrReplaceTempView("customer")
      s.sql(lateralSql("region", "nation", "customer"))
    }),

    // WITH RECURSIVE series spine, as SQL text.
    "q_sql_recursive" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(recursiveSql("orders"))
    }),

    // Ranking + offset + ROWS/RANGE frames, as SQL text.
    "q_sql_window" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(windowSql("orders"))
    })
  )

  /** The oracle runs the IDENTICAL SQL text over DuckDB's views. */
  val oracle: Map[String, String] = Map(
    "q_sql_tpch3" -> tpch3Sql(tbl("customer"), tbl("orders"), tbl("lineitem")),
    "q_sql_tpch5" -> tpch5Sql(tbl("customer"), tbl("orders"),
      tbl("lineitem"), tbl("supplier"), tbl("nation"), tbl("region")),
    "q_sql_tpch10" -> tpch10Sql(tbl("customer"), tbl("orders"),
      tbl("lineitem"), tbl("nation")),
    "q_sql_tpch18" -> tpch18Sql(tbl("customer"), tbl("orders"),
      tbl("lineitem")),
    "q_sql_tpch7" -> tpch7Sql(tbl("supplier"), tbl("lineitem"),
      tbl("orders"), tbl("customer"), tbl("nation")),
    "q_sql_tpch14" -> tpch14Sql(tbl("lineitem"), tbl("part")),
    "q_sql_tpch19" -> tpch19Sql(tbl("lineitem"), tbl("part")),
    "q_sql_tpch6" -> tpch6Sql(tbl("lineitem")),
    "q_sql_tpch13" -> tpch13Sql(tbl("customer"), tbl("orders")),
    "q_sql_tpch1" -> tpch1Sql(tbl("lineitem")),
    "q_sql_tpch4" -> tpch4Sql(tbl("orders"), tbl("lineitem")),
    "q_sql_tpch8" -> tpch8Sql(tbl("part"), tbl("supplier"),
      tbl("lineitem"), tbl("orders"), tbl("customer"), tbl("nation"),
      tbl("region")),
    "q_sql_tpch12" -> tpch12Sql(tbl("orders"), tbl("lineitem")),
    "q_sql_tpch15" -> tpch15Sql(tbl("supplier"), tbl("lineitem")),
    "q_sql_tpch17" -> tpch17Sql(tbl("lineitem"), tbl("part")),
    "q_sql_tpch21" -> tpch21Sql(tbl("supplier"), tbl("lineitem"),
      tbl("orders"), tbl("nation")),
    "q_sql_tpch22" -> tpch22Sql(tbl("customer"), tbl("orders")),
    "q_sql_tpch16" -> tpch16Sql(tbl("lineitem"), tbl("part"),
      tbl("supplier")),
    "q_sql_tpch2" -> tpch2Sql(tbl("lineitem"), tbl("part"),
      tbl("supplier"), tbl("nation"), tbl("region")),
    "q_sql_tpch9" -> tpch9Sql(tbl("lineitem"), tbl("part"),
      tbl("supplier"), tbl("orders"), tbl("nation")),
    "q_sql_tpch11" -> tpch11Sql(tbl("lineitem"), tbl("supplier"),
      tbl("nation")),
    "q_sql_tpch20" -> tpch20Sql(tbl("lineitem"), tbl("part"),
      tbl("supplier")),
    "q_sql_subquery" -> subquerySql(tbl("customer"), tbl("orders")),
    "q_sql_gsets" -> gsetsSql(tbl("orders")),
    "q_sql_lateral" -> lateralSql(tbl("region"), tbl("nation"), tbl("customer")),
    "q_sql_recursive" -> recursiveSql(tbl("orders")),
    "q_sql_window" -> windowSql(tbl("orders"))
  )
}
