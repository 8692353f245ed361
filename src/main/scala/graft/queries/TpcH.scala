package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.Tables._

/** The remaining 16 TPC-H queries (Q2–Q12, Q14–Q16, Q19, Q20), completing
  * the 22-query suite together with Relational's q10/q83–q87 (Q1, Q13,
  * Q17, Q18, Q21, Q22). Adapted to the generator's reduced column set
  * (TESTDATA.md):
  *
  *   - There is NO partsupp table. A derived stand-in [[ps]] is computed
  *     from lineitem: one (l_partkey, l_suppkey) aggregation yielding
  *     `ps_supplycost` (min extended price of the pair — deterministic,
  *     arithmetic-free) and `ps_availqty` (total quantity). Q2/Q11/Q16/Q20
  *     run against it; Q9 derives a per-unit cost the same way.
  *   - Missing columns are substituted by the closest available proxy and
  *     noted per query: l_receiptdate/l_commitdate → l_returnflag = 'R'
  *     (Q4), l_shipmode → l_returnflag (Q12), p_container → p_type (Q19),
  *     o_shippriority dropped (Q3), phone country code → none (Q22 lives
  *     in Relational.q87 off c_name), comment-based complaint filter →
  *     s_acctbal < 0 (Q16).
  *
  * Spark-first shapes throughout: fixed-size dims (region/nation/supplier
  * — they stay tiny at every SF, see Relational's header) are broadcast
  * explicitly; SF-scaled sides are left to AQE; correlated scalar
  * subqueries become per-group windows over the already-filtered sliver
  * (Q2, Q9) or one-row broadcast cross joins (Q11, Q15) — never a second
  * fact scan and never a driver collect.
  */
object TpcH {

  /** Derived partsupp: ONE map-side-combined aggregation of lineitem by
    * (l_partkey, l_suppkey). Unused aggregate columns are pruned by
    * Catalyst per call site, so consumers that need only the pair keys
    * (Q16) pay no extra compute. */
  private def ps(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(
        min(col("l_extendedprice")).as("ps_supplycost"),
        // long-cents reformulation (r19 verdict item 7) measured and
        // REJECTED r20: value-identical on every group (ProbeCentsAB,
        // 0 of ~200k groups differ at sf0.1) but a perf WASH
        // (interleaved min 0.629 s decimal vs 0.650 s cents) — Spark's
        // Decimal add stays on the compact-long path for these
        // magnitudes, so the BigDecimal cost the reformulation targets
        // never materializes. The exact decimal sum stays.
        dsum2(col("l_quantity")).as("ps_availqty"))

  /** Suppliers decorated with nation (and optionally region-filtered) —
    * all fixed-size tables, so the result broadcasts. */
  private def suppNation(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))

  private val PsOracle =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         MIN(l_extendedprice) AS ps_supplycost,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)
      |""".stripMargin

  /** TPC-H Q2 (minimum-cost supplier). The correlated MIN subquery runs
    * as a window over the part-filtered sliver: the part predicate
    * (p_size=15, p_type='PROMO' ~ 1/300 of parts) is joined in BEFORE
    * the per-part min, which is valid because the min is per-part — so
    * the window sorts ~0.3% of the pair table instead of all of it. The
    * Europe-scoped supplier decoration is a broadcast. */
  val q89 = Q(
    "q89_tpch_q2",
    (s, d) => {
      val eurSupp = suppNation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val parts = part(s, d)
        .filter(col("p_size") === 15 && col("p_type") === "PROMO")
        .select(col("p_partkey"), col("p_name"))
      val w = Window.partitionBy(col("ps_partkey"))
      ps(s, d)
        .join(broadcast(eurSupp), col("ps_suppkey") === col("s_suppkey"))
        .join(parts, col("ps_partkey") === col("p_partkey"))
        .withColumn("min_cost", min(col("ps_supplycost")).over(w))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some(PsOracle +
      """, eps AS (
        |  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
        |  FROM ps JOIN supplier ON s_suppkey = ps_suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part JOIN eps ON p_partkey = ps_partkey
        |WHERE p_size = 15 AND p_type = 'PROMO'
        |  AND ps_supplycost = (SELECT MIN(e2.ps_supplycost) FROM eps e2
        |                       WHERE e2.ps_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin))

  /** TPC-H Q3 (shipping-priority, o_shippriority column absent so
    * dropped from the output). Both date filters reach the scans as
    * pushed parquet predicates before the joins; the grouped top-10 is
    * a TakeOrderedAndProject, no global sort. */
  val q90 = Q(
    "q90_tpch_q3",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") > to_timestamp(lit("1998-06-01 00:00:00")))
        .join(orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1998-06-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), dayStr(col("o_orderdate")).as("o_orderdate"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10),
    Some("""SELECT l_orderkey,
           |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
           |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |     JOIN lineitem ON l_orderkey = o_orderkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
           |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
           |GROUP BY l_orderkey, o_orderdate
           |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin))

  /** TPC-H Q4 (order-priority checking; the commit<receipt EXISTS becomes
    * "has a returned line" — the receipt columns don't exist). The EXISTS
    * is a left-semi join probing the quarter's orders (~4% of the table)
    * against returned lineitems; the count never materializes the match. */
  val q91 = Q(
    "q91_tpch_q4",
    (s, d) =>
      orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-07-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-10-01 00:00:00")))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
           |FROM orders
           |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
           |  AND EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** TPC-H Q5 (local-supplier volume). Fact-first: the year filter cuts
    * orders ~7× before the lineitem join; the c_nationkey = s_nationkey
    * locality condition rides the broadcast supplier join so no extra
    * shuffle materializes; nation/region resolve on the broadcast side. */
  val q92 = Q(
    "q92_tpch_q5",
    (s, d) =>
      lineitem(s, d)
        .join(orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation(s, d)
          .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
    Some("""SELECT n_name,
           |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |     JOIN lineitem ON l_orderkey = o_orderkey
           |     JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |     JOIN nation ON s_nationkey = n_nationkey
           |     JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))

  /** TPC-H Q6 (forecasting revenue change): pure scan-side query — every
    * predicate pushes to parquet, the sum is one partial-aggregated pass
    * with no shuffle beyond the final single-row exchange. */
  val q93 = Q(
    "q93_tpch_q6",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
        .agg(dsum4(col("l_extendedprice") * col("l_discount")).as("revenue")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin))

  /** TPC-H Q7 (volume shipping between two nations). Customers and
    * suppliers are pre-filtered to the two nations via broadcast joins
    * BEFORE touching the fact tables (2/25 of each), the date range
    * prunes lineitem at the scan, and the cross-pair predicate runs on
    * broadcast-resolved name columns. */
  val q94 = Q(
    "q94_tpch_q7",
    (s, d) => {
      val n1 = broadcast(nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
      lineitem(s, d)
        .filter(col("l_shipdate").between(
          to_timestamp(lit("1996-01-01 00:00:00")), to_timestamp(lit("1997-12-31 00:00:00"))))
        .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
          .join(n1, col("s_nationkey") === col("n1_key"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select(col("c_custkey"), col("c_nationkey"))
          .join(n2, col("c_nationkey") === col("n2_key")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""SELECT supp_nation, cust_nation, l_year,
           |       CAST(SUM(CAST(volume AS DECIMAL(28,4))) AS DOUBLE) AS revenue
           |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |             EXTRACT(year FROM l_shipdate) AS l_year,
           |             l_extendedprice * (1.0 - l_discount) AS volume
           |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           |           JOIN orders ON o_orderkey = l_orderkey
           |           JOIN customer ON c_custkey = o_custkey
           |           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           |        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
           |                           AND TIMESTAMP '1997-12-31 00:00:00') shipping
           |GROUP BY supp_nation, cust_nation, l_year
           |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  /** TPC-H Q8 (national market share). The selective part filter
    * (p_type='ECONOMY', 1/6) joins into lineitem first; the AMERICA
    * region gate rides the customer-side nation broadcast; the share is
    * a conditional aggregate over one pass — numerator and denominator
    * never scan twice. */
  val q95 = Q(
    "q95_tpch_q8",
    (s, d) => {
      val amerCust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(nation(s, d)
          .join(broadcast(region(s, d).filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      lineitem(s, d)
        .join(part(s, d).filter(col("p_type") === "ECONOMY").select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(orders(s, d)
          .filter(col("o_orderdate").between(
            to_timestamp(lit("1996-01-01 00:00:00")), to_timestamp(lit("1997-12-31 00:00:00"))))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(amerCust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation(s, d).select(col("s_suppkey"), col("n_name").as("nation"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("nation") === "NATION_3", dec4(vol)).otherwise(dec4(lit(0.0))))
          .cast(DoubleType) / sum(dec4(vol)).cast(DoubleType)).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("""SELECT o_year,
           |       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN CAST(volume AS DECIMAL(28,4))
           |                     ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
           |       / CAST(SUM(CAST(volume AS DECIMAL(28,4))) AS DOUBLE) AS mkt_share
           |FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           |             l_extendedprice * (1.0 - l_discount) AS volume,
           |             n2.n_name AS nation
           |      FROM part JOIN lineitem ON p_partkey = l_partkey
           |           JOIN supplier ON s_suppkey = l_suppkey
           |           JOIN orders ON l_orderkey = o_orderkey
           |           JOIN customer ON o_custkey = c_custkey
           |           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           |           JOIN region ON n1.n_regionkey = r_regionkey
           |           JOIN nation n2 ON s_nationkey = n2.n_nationkey
           |      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
           |        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
           |                            AND TIMESTAMP '1997-12-31 00:00:00') all_nations
           |GROUP BY o_year ORDER BY o_year""".stripMargin))

  /** TPC-H Q9 (product-type profit; supply cost derived as 2% of the
    * pair's minimum extended price per unit shipped — there is no
    * partsupp). The correlated per-pair MIN runs as a window over the
    * '%red%'-scoped sliver of lineitem (valid: the min is per
    * (part,supp) pair and the part filter keeps every row of a kept
    * pair), so lineitem is scanned ONCE — no self-join, no second pass.
    *
    * Arithmetic rides an exact integer grid (ten-thousandths): prices
    * and discounts are 2-decimal values, so `round(x·10⁴)` is
    * tie-free and every engine computes the identical BIGINT — a
    * double→DECIMAL cast here would instead expose the engines'
    * differing shortest-repr rounding on arbitrary doubles (Spark
    * rounds java.lang.Double.toString's digits, DuckDB the binary
    * value; they disagree ~1 row in 10⁴). */
  val q96 = Q(
    "q96_tpch_q9",
    (s, d) => {
      val w = Window.partitionBy(col("l_partkey"), col("l_suppkey"))
      val volE4 = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
        .cast("long")
      val costE4 = lit(2L) * round(col("min_ext") * 100).cast("long") *
        col("l_quantity").cast("long")
      lineitem(s, d)
        .join(part(s, d).filter(col("p_name").like("%red%")).select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("min_ext", min(col("l_extendedprice")).over(w))
        .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(suppNation(s, d).select(col("s_suppkey"), col("n_name").as("nation"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(volE4 - costE4) / lit(10000.0)).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""WITH ps AS (
           |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           |         MIN(l_extendedprice) AS min_ext
           |  FROM lineitem GROUP BY 1, 2)
           |SELECT nation, o_year,
           |       SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)
           |           - 2 * CAST(ROUND(min_ext * 100) AS BIGINT)
           |               * CAST(l_quantity AS BIGINT)) / 10000.0 AS sum_profit
           |FROM (SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           |             l_extendedprice, l_discount, l_quantity, min_ext
           |      FROM part JOIN lineitem ON p_partkey = l_partkey
           |           JOIN supplier ON s_suppkey = l_suppkey
           |           JOIN ps ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
           |           JOIN orders ON o_orderkey = l_orderkey
           |           JOIN nation ON s_nationkey = n_nationkey
           |      WHERE p_name LIKE '%red%') profit
           |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin))

  /** TPC-H Q10 (returned-item reporting, minus the absent address/phone/
    * comment columns). Quarter + returnflag filters cut both facts at
    * the scan; the top-20 is TakeOrderedAndProject. */
  val q97 = Q(
    "q97_tpch_q10",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-10-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
    Some("""SELECT c_custkey, c_name,
           |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
           |       c_acctbal, n_name
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |     JOIN lineitem ON l_orderkey = o_orderkey
           |     JOIN nation ON c_nationkey = n_nationkey
           |WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           |  AND l_returnflag = 'R'
           |GROUP BY c_custkey, c_name, c_acctbal, n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  /** TPC-H Q11 (important stock). The scalar threshold (a share of the
    * nation-scoped total — made scale-invariant: 2× the average per-part
    * value, where the spec's 0.0001/SF constant would empty out as SF
    * grows) is a one-row broadcast cross join; the nation scope rides
    * the broadcast supplier decoration. */
  val q98 = Q(
    "q98_tpch_q11",
    (s, d) => {
      // Both the per-part rows and the scalar threshold derive from the
      // SAME per-part aggregate subtree (sum-of-sums == total, row count
      // == distinct part count — decimal sums are exact, so associativity
      // is value-preserving): Spark's ReuseExchange collapses the two
      // branches to one lineitem scan + one aggregation.
      val perPart = ps(s, d)
        .join(broadcast(suppNation(s, d).filter(col("n_name") === "NATION_5")
          .select(col("s_suppkey"))), col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"), dec4(col("ps_supplycost") * col("ps_availqty")).as("value"))
        .groupBy(col("ps_partkey"))
        .agg(sum(col("value")).as("value_dec"))
      val thresh = perPart.agg(
        (sum(col("value_dec")).cast(DoubleType) * 2.0 / count(lit(1))).as("threshold"))
      perPart
        .select(col("ps_partkey"), col("value_dec").cast(DoubleType).as("value"))
        .crossJoin(broadcast(thresh))
        .filter(col("value") > col("threshold"))
        .select(col("ps_partkey"), col("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },
    Some(PsOracle +
      """, scoped AS (
        |  SELECT ps_partkey, CAST(ps_supplycost * ps_availqty AS DECIMAL(28,4)) AS value
        |  FROM ps JOIN supplier ON s_suppkey = ps_suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_5')
        |SELECT ps_partkey, CAST(SUM(value) AS DOUBLE) AS value
        |FROM scoped
        |GROUP BY ps_partkey
        |HAVING CAST(SUM(value) AS DOUBLE) >
        |  (SELECT 2.0 * CAST(SUM(value) AS DOUBLE) / COUNT(DISTINCT ps_partkey) FROM scoped)
        |ORDER BY value DESC, ps_partkey""".stripMargin))

  /** TPC-H Q12 (shipping modes → l_returnflag; the receipt-date window
    * → l_shipdate year). High/low priority counts are one conditional
    * aggregation over the year's sliver. */
  val q99 = Q(
    "q99_tpch_q12",
    (s, d) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
           |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** TPC-H Q14 (promotion effect; p_type = 'PROMO' exactly — the
    * generator's types are single words). One month of lineitem joins
    * part once; numerator and denominator share the pass. */
  val q100 = Q(
    "q100_tpch_q14",
    (s, d) => {
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01 00:00:00")))
        .join(part(s, d).select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", dec4(vol)).otherwise(dec4(lit(0.0))))
            .cast(DoubleType) / sum(dec4(vol)).cast(DoubleType)).as("promo_revenue"))
    },
    Some("""SELECT 100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
           |                     THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))
           |                     ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
           |       / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS promo_revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
           |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin))

  /** TPC-H Q15 (top supplier). The revenue view aggregates one quarter
    * of lineitem by supplier; the MAX scalar is a one-row broadcast
    * cross join back onto the same aggregate (exchange reuse — the
    * grouped result is computed once), and supplier resolves via
    * broadcast. Decimal-exact sums make the MAX equality bit-safe. */
  val q101 = Q(
    "q101_tpch_q15",
    (s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(broadcast(supplier(s, d)), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH revenue AS (
           |  SELECT l_suppkey AS supplier_no,
           |         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_revenue
           |FROM supplier JOIN revenue ON s_suppkey = supplier_no
           |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
           |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q16 (parts/supplier relationship; the comment-based complaint
    * exclusion becomes s_acctbal < 0). The NOT IN is a left-anti join
    * against the (tiny, broadcast) negative-balance suppliers; the
    * distinct supplier count shuffles only the part-filtered sliver of
    * the derived pair table. */
  val q102 = Q(
    "q102_tpch_q16",
    (s, d) =>
      ps(s, d)
        .join(part(s, d).filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")),
          col("ps_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size")),
    Some(PsOracle +
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** TPC-H Q19 (discounted revenue; p_container → p_type, shipmode
    * predicate dropped). The three-way disjunction references both
    * sides, so it evaluates post-join on the partkey equi-join — the
    * equi-key still drives the hash join; only the residual is
    * disjunctive. */
  val q103 = Q(
    "q103_tpch_q19",
    (s, d) =>
      lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_type") === "SMALL" &&
            col("l_quantity").between(1.0, 11.0) && col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM" &&
            col("l_quantity").between(10.0, 20.0) && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#4" && col("p_type") === "LARGE" &&
            col("l_quantity").between(20.0, 30.0) && col("p_size").between(1, 15)))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
           |FROM lineitem JOIN part ON p_partkey = l_partkey
           |WHERE (p_brand = 'Brand#12' AND p_type = 'SMALL'
           |       AND l_quantity BETWEEN 1.0 AND 11.0 AND p_size BETWEEN 1 AND 5)
           |   OR (p_brand = 'Brand#23' AND p_type = 'MEDIUM'
           |       AND l_quantity BETWEEN 10.0 AND 20.0 AND p_size BETWEEN 1 AND 10)
           |   OR (p_brand = 'Brand#4' AND p_type = 'LARGE'
           |       AND l_quantity BETWEEN 20.0 AND 30.0 AND p_size BETWEEN 1 AND 15)""".stripMargin))

  /** TPC-H Q20 (potential part promotion). Without availqty, "excess
    * stock" is re-cast as flow already finalized: suppliers where, for
    * some 'small%' part, the finalized (l_linestatus='F') quantity
    * exceeds half the pair's total. The nested aggregate runs over the
    * name-filtered sliver only; the supplier gate is a semi join into
    * the broadcast nation-scoped supplier set. */
  val q104 = Q(
    "q104_tpch_q20",
    (s, d) => {
      val qualSupp = lineitem(s, d)
        .join(part(s, d).filter(col("p_name").like("small%")).select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(when(col("l_linestatus") === "F", dec2(col("l_quantity")))
            .otherwise(dec2(lit(0.0)))).cast(DoubleType).as("qty_f"),
          dsum2(col("l_quantity")).as("qty_all"))
        .filter(col("qty_f") > lit(0.5) * col("qty_all"))
        .select(col("l_suppkey"))
      supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_4")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qualSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"))
        .orderBy(col("s_name"))
    },
    Some("""WITH avail AS (
           |  SELECT l_partkey, l_suppkey,
           |         CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2))
           |                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
           |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_all
           |  FROM lineitem
           |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
           |  GROUP BY 1, 2)
           |SELECT s_name
           |FROM supplier JOIN nation ON s_nationkey = n_nationkey
           |WHERE n_name = 'NATION_4'
           |  AND s_suppkey IN (SELECT l_suppkey FROM avail WHERE qty_f > 0.5 * qty_all)
           |ORDER BY s_name""".stripMargin))

  val all: Seq[Q] = Seq(
    q89, q90, q91, q92, q93, q94, q95, q96, q97, q98,
    q99, q100, q101, q102, q103, q104)
}
