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

  val queries: Map[String, Q] = Map(
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
    })
  )

  /** The oracle runs the IDENTICAL SQL text over DuckDB's views. */
  val oracle: Map[String, String] = Map(
    "q_sql_subquery" -> subquerySql(tbl("customer"), tbl("orders")),
    "q_sql_gsets" -> gsetsSql(tbl("orders"))
  )
}
