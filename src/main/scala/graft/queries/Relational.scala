package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, StructField, StructType}
import graft.Tables._

/** One declared query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-compares against (SURVEY.md §2B, BASELINE.md t2 gate).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** SURVEY.md §2B Q1–Q27: the relational surface. Spark-first: plain
  * DataFrame declarations; Catalyst owns pushdown, join selection, AQE.
  * Small fixed-size dims (region, nation, supplier) are broadcast
  * explicitly — they stay tiny at any scale factor; everything else is
  * left to AQE so the plan adapts at 100 TB.
  */
object Relational {

  val q01 = Q(
    "q01_scan",
    (s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"),
          dayStr(col("l_shipdate")).as("l_shipdate"))
        // measures as tiebreakers: (orderkey, linenumber) is only
        // unique at small SFs — the generator duplicates keys at sf0.1
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"), col("l_quantity"))
        .limit(20),
    Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           |       strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate
           |FROM lineitem
           |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity
           |LIMIT 20""".stripMargin))

  val q02 = Q(
    "q02_filter_project",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"))
        .limit(50),
    Some("""SELECT l_orderkey, l_linenumber,
           |       l_extendedprice * (1.0 - l_discount) AS revenue
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND l_discount BETWEEN 0.05 AND 0.07
           |ORDER BY l_orderkey, l_linenumber, revenue LIMIT 50""".stripMargin))

  val q03 = Q(
    "q03_join_inner",
    (s, d) =>
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .limit(50),
    Some("""SELECT o_orderkey, c_name, o_totalprice
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |ORDER BY o_orderkey LIMIT 50""".stripMargin))

  // Fact-first join order: lineitem (the big table) is the probe/stream
  // side of every join, so the planner builds hash tables from the
  // smaller orders/customer sides (or shuffles them in SMJ at cluster
  // scale) instead of ever materializing the fact side — chained
  // dim-first, Spark's size estimate broadcast the 600k-row lineitem
  // projection as a build side, which inverts at scale.
  val q04 = Q(
    "q04_multiway_join",
    (s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name")),
    Some("""SELECT n_name,
           |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
           |       COUNT(*) AS n_items
           |FROM customer
           |JOIN orders   ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation   ON s_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))

  val q05 = Q(
    "q05_left_join",
    (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt
           |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin))

  val q06 = Q(
    "q06_anti_join",
    (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
           |ORDER BY c_custkey""".stripMargin))

  val q07 = Q(
    "q07_semi_join",
    (s, d) =>
      part(s, d)
        .join(lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
        .limit(100),
    Some("""SELECT p_partkey, p_name FROM part p
           |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
           |ORDER BY p_partkey LIMIT 100""".stripMargin))

  // Range join: equi key (user_id) + time-range residual. Spark plans the
  // equi part as the join key so only same-user rows meet the residual —
  // no cartesian blowup at scale.
  /** Range self-join with TIME BUCKETING: a bare equi-join on user_id
    * with the time range as a residual evaluates every event pair of a
    * user (quadratic per hot key). Bucketing ts to the range width and
    * joining on (user_id, bucket) — with the left side exploded into
    * its own and the successor bucket — touches only pairs at most one
    * bucket apart, which is exactly the candidates that can satisfy a
    * 1-bucket-wide range. The range predicate still applies exactly, so
    * results are identical; per-key cost drops from |events|² to
    * Σ per-bucket². */
  val q08 = Q(
    "q08_range_join",
    (s, d) => {
      val bucket = (t: Column) => floor(unix_micros(t) / lit(3600000000L))
      val a = events(s, d)
        .select(col("user_id"), col("event_id").as("id1"), col("ts").as("ts1"))
        .withColumn("bkt", explode(array(bucket(col("ts1")), bucket(col("ts1")) + 1)))
      val b = events(s, d)
        .select(col("user_id").as("user_id2"), col("event_id").as("id2"), col("ts").as("ts2"))
        .withColumn("bkt2", bucket(col("ts2")))
      a.join(b,
          col("user_id") === col("user_id2") &&
            col("bkt") === col("bkt2") &&
            col("id1") < col("id2") &&
            col("ts2") >= col("ts1") &&
            col("ts2") <= col("ts1") + expr("INTERVAL 1 HOUR"))
        .select(col("user_id"), col("id1"), col("id2"))
        .orderBy(col("user_id"), col("id1"), col("id2"))
        .limit(500)
    },
    Some("""WITH ev AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events)
           |SELECT a.user_id, a.event_id AS id1, b.event_id AS id2
           |FROM ev a JOIN ev b
           |  ON a.user_id = b.user_id AND a.event_id < b.event_id
           | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
           |ORDER BY a.user_id, id1, id2 LIMIT 500""".stripMargin))

  val q09 = Q(
    "q09_cross_join",
    (s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name")),
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
           |ORDER BY r_name, n_name""".stripMargin))

  // TPC-H Q1 shape: partial (map-side) agg + final agg, all exact decimal.
  val q10 = Q(
    "q10_agg_tpch_q1",
    (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum2(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg2(col("l_quantity")).as("avg_qty"),
          davg2(col("l_extendedprice")).as("avg_price"),
          davg2(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           |  COUNT(*) AS count_order
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  val q11 = Q(
    "q11_distinct_agg",
    (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  val q12 = Q(
    "q12_distinct",
    (s, d) =>
      customer(s, d).select(col("c_mktsegment")).distinct().orderBy(col("c_mktsegment")),
    Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"))

  // HLL++ differs from DuckDB's sketch — driver records a rows-only check.
  /** Approx distinct with an ORACLE-CHECKED tolerance: the HLL++
    * estimate itself cannot hash-match another engine, so the query
    * emits the exact count plus a Spark-side bound check and the
    * oracle expects the exact count with the bound holding (TRUE). The
    * bound is 3× the sketch's default rsd (0.05 → ±15%): one standard
    * deviation is a coin flip for a HEALTHY sketch on some group/SF
    * combination, three is a genuine-drift detector (q32b's rank bound
    * has the same ~10× safety margin). A drifting sketch
    * implementation still FAILS correctness instead of hiding behind
    * rows-only smoke. */
  val q13 = Q(
    "q13_approx_distinct",
    (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("approx"))
        .select(col("l_returnflag"), col("exact_parts"),
          (col("approx") >= col("exact_parts") * 0.85 &&
            col("approx") <= col("exact_parts") * 1.15).as("approx_ok"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
           |       TRUE AS approx_ok
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // COALESCE sentinels avoid NULL-ordering differences (Spark: NULLS FIRST
  // asc; DuckDB: NULLS LAST) — data itself is NULL-free.
  val q14 = Q(
    "q14_rollup",
    (s, d) =>
      orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), dsum2(col("o_totalprice")).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("cnt"), col("sum_price"))
        .orderBy(col("status"), col("priority")),
    Some("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
           |       COALESCE(o_orderpriority, '(all)') AS priority,
           |       COUNT(*) AS cnt,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
           |ORDER BY status, priority""".stripMargin))

  val q15 = Q(
    "q15_cube",
    (s, d) =>
      lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum2(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("cnt"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus")),
    Some("""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           |       COALESCE(l_linestatus, '(all)') AS linestatus,
           |       COUNT(*) AS cnt,
           |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY returnflag, linestatus""".stripMargin))

  val q16 = Q(
    "q16_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT * FROM (
           |  SELECT o_custkey, o_orderkey, o_totalprice,
           |         ROW_NUMBER() OVER w AS rn,
           |         RANK() OVER w AS rnk,
           |         DENSE_RANK() OVER w AS drnk
           |  FROM orders
           |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
           |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin))

  val q17 = Q(
    "q17_window_running",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), microStr(col("ts")).as("ts"),
          sum(dec2(col("value"))).over(w).cast(DoubleType).as("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id, value, ts::TIMESTAMP AS ts FROM events)
           |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
           |    PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
           |FROM ev ORDER BY user_id, event_id""".stripMargin))

  /** Time-range window frame (RANGE BETWEEN INTERVAL ... PRECEDING):
    * per event, how many of the same user's events fall in the
    * trailing hour — the sliding-window analytic rows-frames can't
    * express (frame membership is by VALUE distance, not row count).
    * Count keeps the check integer-exact. */
  val q17b = Q(
    "q17b_window_range_interval",
    (s, d) => {
      events(s, d).createOrReplaceTempView("events_v")
      s.sql("""SELECT user_id, event_id,
                      COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
                        AS n_trailing_hour
               FROM events_v ORDER BY user_id, event_id""")
    },
    Some("""WITH ev AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events)
           |SELECT user_id, event_id,
           |       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
           |         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           |         AS n_trailing_hour
           |FROM ev ORDER BY user_id, event_id""".stripMargin))

  val q18 = Q(
    "q18_window_lag",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"), microStr(col("ts")).as("ts"),
          col("value"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id, value, ts::TIMESTAMP AS ts FROM events)
           |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, value,
           |       value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
           |FROM ev ORDER BY user_id, event_id""".stripMargin))

  val q19 = Q(
    "q19_topk",
    (s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin))

  val q20 = Q(
    "q20_union_all",
    (s, d) => {
      val c = customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"), col("c_mktsegment"))
        .unionAll(c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"), col("c_mktsegment")))
        .orderBy(col("c_custkey"), col("c_mktsegment"))
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
           |UNION ALL
           |SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'
           |ORDER BY c_custkey, c_mktsegment""".stripMargin))

  val q20b = Q(
    "q20b_union_distinct",
    (s, d) =>
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey")),
    Some("""SELECT c_nationkey AS nationkey FROM customer
           |UNION
           |SELECT s_nationkey AS nationkey FROM supplier
           |ORDER BY nationkey""".stripMargin))

  val q21 = Q(
    "q21_intersect",
    (s, d) =>
      lineitem(s, d).select(col("l_partkey").as("partkey"))
        .intersect(part(s, d).select(col("p_partkey").as("partkey")))
        .orderBy(col("partkey")),
    Some("""SELECT l_partkey AS partkey FROM lineitem
           |INTERSECT
           |SELECT p_partkey AS partkey FROM part
           |ORDER BY partkey""".stripMargin))

  val q21b = Q(
    "q21b_except",
    (s, d) =>
      part(s, d).select(col("p_partkey").as("partkey"))
        .except(lineitem(s, d).select(col("l_partkey").as("partkey")))
        .orderBy(col("partkey")),
    Some("""SELECT p_partkey AS partkey FROM part
           |EXCEPT
           |SELECT l_partkey AS partkey FROM lineitem
           |ORDER BY partkey""".stripMargin))

  val q22 = Q(
    "q22_string_fns",
    (s, d) =>
      part(s, d)
        .filter(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          substring(col("p_name"), 1, 5).as("pfx"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          size(split(col("p_name"), " ")).as("n_tokens"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
        .orderBy(col("p_partkey"))
        .limit(100),
    Some("""SELECT p_partkey, UPPER(p_name) AS up_name, p_name[1:5] AS pfx,
           |       LENGTH(p_name) AS name_len,
           |       CONCAT_WS('-', p_brand, p_type) AS brand_type,
           |       LEN(STRING_SPLIT(p_name, ' ')) AS n_tokens,
           |       REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word
           |FROM part WHERE p_name LIKE '%a%'
           |ORDER BY p_partkey LIMIT 100""".stripMargin))

  val q23 = Q(
    "q23_date_fns",
    (s, d) =>
      events(s, d)
        .select(col("event_id"),
          year(col("ts")).as("y"), month(col("ts")).as("mo"),
          dayofmonth(col("ts")).as("dom"), hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          dayStr(date_trunc("hour", col("ts"))).as("hour_start"),
          dayStr(date_trunc("day", col("ts"))).as("day_start"))
        .orderBy(col("event_id"))
        .limit(200),
    Some("""WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts FROM events)
           |SELECT event_id, YEAR(ts) AS y, MONTH(ts) AS mo, DAY(ts) AS dom,
           |       HOUR(ts) AS h, MINUTE(ts) AS mi,
           |       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           |       strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_start
           |FROM ev ORDER BY event_id LIMIT 200""".stripMargin))

  // sqrt is IEEE-exact in both engines; squares via multiplication (libm
  // pow is not cross-engine reproducible); floor/ceil/abs exact.
  val q24 = Q(
    "q24_math_fns",
    (s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") / 3.0, 4).as("third_price"),
          abs(col("l_quantity") - 25.0).as("qty_dev"),
          sqrt(col("l_extendedprice")).as("price_sqrt"),
          (col("l_discount") * col("l_discount")).as("disc_sq"),
          floor(col("l_extendedprice")).cast("long").as("price_floor"),
          ceil(col("l_extendedprice")).cast("long").as("price_ceil"))
        // (l_orderkey, l_linenumber) stops being unique at sf0.1 (the
        // generator duplicates keys with different measures), so the
        // LIMIT frontier needs the measures as tiebreakers to stay a
        // total order at every scale factor
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_sqrt"),
          col("qty_dev"), col("disc_sq"))
        .limit(100),
    Some("""SELECT l_orderkey, l_linenumber,
           |       ROUND(l_extendedprice / 3.0, 4) AS third_price,
           |       ABS(l_quantity - 25.0) AS qty_dev,
           |       SQRT(l_extendedprice) AS price_sqrt,
           |       l_discount * l_discount AS disc_sq,
           |       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           |       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil
           |FROM lineitem
           |ORDER BY l_orderkey, l_linenumber, price_sqrt, qty_dev, disc_sq
           |LIMIT 100""".stripMargin))

  // Higher-order array functions over the 64-dim embedding column; the
  // norm is a sequential left-fold in both engines (same IEEE op order).
  val q25 = Q(
    "q25_array_fns",
    (s, d) =>
      embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("first_elem"),
          element_at(col("embedding"), -1).cast(DoubleType).as("last_elem"),
          sqrt(aggregate(
            transform(col("embedding"), x => x.cast(DoubleType) * x.cast(DoubleType)),
            lit(0.0), (acc, x) => acc + x)).as("l2_norm"),
          size(filter(col("embedding"), x => x > lit(0.0f))).as("n_positive"))
        .orderBy(col("vec_id"))
        .limit(200),
    Some("""SELECT vec_id, LEN(embedding) AS dim,
           |       CAST(embedding[1] AS DOUBLE) AS first_elem,
           |       CAST(embedding[-1] AS DOUBLE) AS last_elem,
           |       SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x)) AS l2_norm,
           |       LEN(LIST_FILTER(embedding, x -> x > 0.0)) AS n_positive
           |FROM embeddings ORDER BY vec_id LIMIT 200""".stripMargin))

  val q26 = Q(
    "q26_json",
    (s, d) =>
      events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .orderBy(col("event_id"))
        .limit(200),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
           |FROM events ORDER BY event_id LIMIT 200""".stripMargin))

  val q26b = Q(
    "q26b_json_agg",
    (s, d) =>
      events(s, d)
        .select(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("k")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS cnt
           |FROM events GROUP BY k ORDER BY k""".stripMargin))

  // Epoch-aligned 1-hour tumbling window == date_trunc('hour', ts).
  val q27 = Q(
    "q27_tumbling_window",
    (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum2(col("value")).as("sum_value"))
        .select(dayStr(col("window.start")).as("window_start"), col("event_type"),
          col("cnt"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type")),
    Some("""WITH ev AS (SELECT event_type, value, ts::TIMESTAMP AS ts FROM events)
           |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           |       event_type, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM ev GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  /** Hopping (sliding) windows: 1-hour windows every 30 minutes, so
    * each event lands in two windows. Same partial-aggregated shape as
    * the tumbling q27 — `window()` expands rows ×(size/slide) before
    * the map-side combine, no extra shuffle. The oracle reproduces the
    * two phases as phase-shifted date_trunc buckets (pure timestamp
    * arithmetic — no epoch/timezone conversions to drift on). */
  val q27b = Q(
    "q27b_hopping_window",
    (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum2(col("value")).as("sum_value"))
        .select(dayStr(col("window.start")).as("window_start"), col("event_type"),
          col("cnt"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type")),
    Some("""WITH ev AS (SELECT event_type, value, ts::TIMESTAMP AS ts FROM events),
           |w AS (SELECT event_type, value, date_trunc('hour', ts) AS wstart FROM ev
           |      UNION ALL
           |      SELECT event_type, value,
           |             date_trunc('hour', ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE
           |      FROM ev)
           |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           |       COUNT(*) AS cnt,
           |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  /** Batch session_window: per-user activity sessions closed by a
    * 30-minute gap — the built-in dynamic-window twin of q36's manual
    * cumulative-break sessionization (and of the streaming
    * flatMapGroupsWithState path). The oracle derives the same
    * sessions via gaps-and-islands (LAG → break flags → running sum),
    * proving the built-in's semantics against first principles. */
  val q27c = Q(
    "q27c_session_window",
    (s, d) =>
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          microStr(col("session_window.start")).as("session_start"), col("n_events"))
        .orderBy(col("user_id"), col("session_start")),
    Some("""WITH ev AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
           |m AS (SELECT user_id, ts,
           |        CASE WHEN LAG(ts) OVER w IS NULL
           |               OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
           |             THEN 1 ELSE 0 END AS brk
           |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
           |g AS (SELECT user_id, ts,
           |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |      FROM m)
           |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           |       COUNT(*) AS n_events
           |FROM g GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin))

  /** from_json with an explicit schema (the declared JSON surface next
    * to get_json_object). */
  val q26c = Q(
    "q26c_from_json",
    (s, d) =>
      events(s, d)
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k"))
        .filter(col("k") > 50)
        .orderBy(col("event_id"))
        .limit(200),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
           |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
           |ORDER BY event_id LIMIT 200""".stripMargin))

  /** Pivot: returnflag categories to columns. Spark's relational pivot
    * == conditional aggregation in the oracle; fixed value list so the
    * plan is a single pass (no distinct-values pre-query). */
  val q31 = Q(
    "q31_pivot",
    (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum2(col("l_quantity")))
        .na.fill(0.0)
        .orderBy(col("l_linestatus")),
    Some("""SELECT l_linestatus,
           |  COALESCE(CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS A,
           |  COALESCE(CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS N,
           |  COALESCE(CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS R
           |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  /** Interpolated percentiles; both engines do linear interpolation on
    * the sorted values; 2-decimal inputs make the midpoints exact. */
  val q32 = Q(
    "q32_percentile",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
           |       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           |       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Sketch-based percentile (KLL/GK-style): rows-only smoke — the
    * sketch differs across engines, accuracy is asserted against exact
    * percentiles in ScalaTest instead. */
  /** Sketch percentile with an ORACLE-CHECKED rank bound: accuracy
    * 1000 guarantees the estimate's rank is within ±1/1000, so its
    * VALUE must lie between the exact interpolated percentiles one
    * full point either side (monotonicity of value-at-rank). The query
    * emits the exact percentiles plus Spark-side bound checks; the
    * oracle expects the exact values with both bounds holding. */
  val q32b = Q(
    "q32b_approx_percentile",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("e50"),
          expr("percentile(o_totalprice, 0.9)").as("e90"),
          expr("percentile(o_totalprice, 0.49)").as("lo50"),
          expr("percentile(o_totalprice, 0.51)").as("hi50"),
          expr("percentile(o_totalprice, 0.89)").as("lo90"),
          expr("percentile(o_totalprice, 0.91)").as("hi90"),
          expr("percentile_approx(o_totalprice, 0.5, 1000)").as("a50"),
          expr("percentile_approx(o_totalprice, 0.9, 1000)").as("a90"))
        .select(col("o_orderpriority"),
          round(col("e50"), 4).as("p50_exact"),
          round(col("e90"), 4).as("p90_exact"),
          (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("p50_ok"),
          (col("a90") >= col("lo90") && col("a90") <= col("hi90")).as("p90_ok"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
           |       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
           |       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_exact,
           |       TRUE AS p50_ok, TRUE AS p90_ok
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Grouped collection: deterministic via sort + string join (array
    * renderings differ between engines; the joined string doesn't). */
  val q33 = Q(
    "q33_collect",
    (s, d) =>
      nation(s, d)
        .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("n_name")),
    Some("""SELECT n_name,
           |       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           |       COUNT(*) AS n_customers
           |FROM nation JOIN customer ON n_nationkey = c_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Uncorrelated scalar subquery + IN subquery, via the SQL entry point
    * (temp views) — decimal-exact average so both engines agree. */
  val q34 = Q(
    "q34_subquery",
    (s, d) => {
      part(s, d).createOrReplaceTempView("part_v")
      lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT p_partkey, p_name, p_retailprice FROM part_v
               WHERE p_retailprice > (
                 SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                 FROM part_v)
                 AND p_partkey IN (SELECT l_partkey FROM lineitem_v WHERE l_quantity >= 45)
               ORDER BY p_partkey LIMIT 100""")
    },
    Some("""SELECT p_partkey, p_name, p_retailprice FROM part
           |WHERE p_retailprice > (
           |    SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           |    FROM part)
           |  AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
           |ORDER BY p_partkey LIMIT 100""".stripMargin))

  /** Correlated EXISTS subquery (decorrelated by Catalyst into a semi
    * join — asserted in PlanSpec). */
  val q35 = Q(
    "q35_exists",
    (s, d) => {
      customer(s, d).createOrReplaceTempView("customer_v")
      orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT c_custkey, c_name FROM customer_v c
               WHERE EXISTS (
                 SELECT 1 FROM orders_v o
                 WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE EXISTS (
           |  SELECT 1 FROM orders o
           |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
           |ORDER BY c_custkey""".stripMargin))

  /** Remaining analytic window functions: ntile, percent_rank,
    * cume_dist, first/last over an explicit full-partition frame. */
  val q16b = Q(
    "q16b_window_analytics",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          first(col("o_orderkey")).over(full).as("cheapest_order"),
          last(col("o_orderkey")).over(full).as("priciest_order"))
        .orderBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .limit(500)
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
           |       NTILE(4) OVER w AS quartile,
           |       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           |       ROUND(CUME_DIST() OVER w, 6) AS cdist,
           |       FIRST_VALUE(o_orderkey) OVER wf AS cheapest_order,
           |       LAST_VALUE(o_orderkey) OVER wf AS priciest_order
           |FROM orders
           |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
           |       wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |ORDER BY o_orderpriority, o_totalprice, o_orderkey LIMIT 500""".stripMargin))

  /** Batch sessionization (twin of streaming EventStreams.sessionize):
    * gap > 30 min starts a new session; lag + running sum of
    * session-start flags assigns ids — the standard two-window idiom. */
  val q36 = Q(
    "q36_sessionize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("new_s",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            > 30L * 60 * 1000000 || lag(col("ts"), 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          microStr(min(col("ts"))).as("session_start"),
          dsum2(col("value")).as("total_value"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id, value, ts::TIMESTAMP AS ts FROM events),
           |d AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
           |                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
           |                     THEN 1 ELSE 0 END AS new_s
           |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM d)
           |SELECT user_id, session_id, COUNT(*) AS n_events,
           |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
           |FROM s GROUP BY user_id, session_id
           |ORDER BY user_id, session_id""".stripMargin))

  /** As-of join: each purchase matched to the user's latest view at or
    * before the purchase timestamp (attribution's core primitive; Spark
    * has no native ASOF JOIN). Implemented the scalable way: tag both
    * streams, union through ONE shuffle keyed by user, and carry the
    * latest view forward with `last(_, ignoreNulls)` over the
    * (ts, kind, event_id) sort — O(n log n) per user partition, versus
    * the naive inequality join whose intermediate is |purchases| ×
    * |prior views| (quadratic per hot user; that naive definition is
    * exactly what the DuckDB oracle runs, so the algorithms
    * cross-check). Ties: a view at the purchase's own ts matches
    * (kind sorts views first); equal-ts views resolve to max event_id. */
  val q39 = Q(
    "q39_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), lit(0).as("kind"), col("event_id"),
          col("event_id").as("v_event_id"), col("value").as("v_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"), col("event_id"),
          lit(null).cast("long").as("v_event_id"), lit(null).cast("double").as("v_value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionByName(purchases)
        .withColumn("view_event_id", last(col("v_event_id"), ignoreNulls = true).over(w))
        .withColumn("view_value", last(col("v_value"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), microStr(col("ts")).as("ts"),
          col("view_event_id"), col("view_value"))
        .orderBy(col("event_id"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id, event_type, value, ts::TIMESTAMP ts FROM events),
           |p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
           |v AS (SELECT * FROM ev WHERE event_type = 'view'),
           |j AS (SELECT p.event_id, p.user_id, p.ts,
           |        v.event_id AS view_event_id, v.value AS view_value,
           |        ROW_NUMBER() OVER (PARTITION BY p.event_id
           |          ORDER BY v.ts DESC, v.event_id DESC) rn
           |      FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts)
           |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           |       view_event_id, view_value
           |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin))

  /** Event-stream dedup: keep the first event per (user, type, hour) —
    * the telemetry-thinning stage of an event pipeline. One window
    * partitioned by the dedup key (shuffle carries the key + ordering
    * columns; partitions are per-user-hour, so no global sort and no
    * skew beyond a single user's single hour). */
  val q50 = Q(
    "q50_event_dedup",
    (s, d) => {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"), date_trunc("hour", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          microStr(col("ts")).as("ts_s"))
        .orderBy(col("event_id"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP ts FROM events),
           |r AS (SELECT *, ROW_NUMBER() OVER (
           |        PARTITION BY user_id, event_type, date_trunc('hour', ts)
           |        ORDER BY ts, event_id) rn FROM ev)
           |SELECT event_id, user_id, event_type,
           |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
           |FROM r WHERE rn = 1 ORDER BY event_id""".stripMargin))

  /** Salted join as a first-class checked operator: the orders⋈customer
    * join runs through [[graft.operators.SkewOps.saltedJoin]] — the
    * construction that spreads a single hotter-than-an-executor key
    * over `salts` tasks when AQE's partition-splitting can't help —
    * and the oracle is the PLAIN join, proving the salt is semantically
    * invisible. */
  val q51 = Q(
    "q51_salted_join",
    (s, d) =>
      graft.operators.SkewOps.saltedJoin(
          orders(s, d),
          customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
          "o_custkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Mergeable distinct-count sketches (Apache DataSketches HLL, built
    * into Spark 4): one sketch per nation, unioned into a global
    * estimate — the two-level shape a 100 TB pipeline uses to count
    * uniques per shard AND overall in one pass (sketches are tiny,
    * mergeable, and re-aggregatable across days without rescanning).
    * At this cardinality (≤5 distinct segments) the sketch is in its
    * exact (coupon-list) mode, so the estimates equal the exact
    * distinct counts and the query is oracle-checkable; at high
    * cardinality the same plan degrades gracefully to ~1.6% error. */
  val q13b = Q(
    "q13b_hll_sketch",
    (s, d) => {
      val perNation = customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(hll_sketch_agg(col("c_mktsegment")).as("sk"))
      val global = perNation
        .agg(hll_union_agg(col("sk")).as("u"))
        .select(round(hll_sketch_estimate(col("u"))).cast("long").as("global_distinct"))
      perNation
        .select(col("c_nationkey"),
          round(hll_sketch_estimate(col("sk"))).cast("long").as("n_segments"))
        .crossJoin(broadcast(global))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_segments,
           |       (SELECT COUNT(DISTINCT c_mktsegment) FROM customer) AS global_distinct
           |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  /** Explicit GROUPING SETS with grouping() markers — the general form
    * q14/q15's rollup/cube desugar to; one shuffle produces all three
    * groupings via Expand. */
  val q14b = Q(
    "q14b_grouping_sets",
    (s, d) => {
      orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
                      COALESCE(o_orderpriority, '(all)') AS priority,
                      grouping(o_orderstatus) AS g_status,
                      grouping(o_orderpriority) AS g_priority,
                      COUNT(*) AS cnt,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
               FROM orders_v
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
               ORDER BY status, priority""")
    },
    Some("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
           |       COALESCE(o_orderpriority, '(all)') AS priority,
           |       grouping(o_orderstatus) AS g_status,
           |       grouping(o_orderpriority) AS g_priority,
           |       COUNT(*) AS cnt,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY status, priority""".stripMargin))

  /** Correlated LATERAL subquery with LIMIT — per-customer top-2 orders.
    * Catalyst plans the correlated limit as a DomainJoin + window-rank
    * rewrite (no per-row re-execution); the same query a user would
    * write against the reference's Spark SQL surface. */
  val q34b = Q(
    "q34b_lateral",
    (s, d) => {
      customer(s, d).createOrReplaceTempView("customer_v")
      orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
               FROM customer_v c,
               LATERAL (SELECT o_orderkey, o_totalprice FROM orders_v o
                        WHERE o.o_custkey = c.c_custkey
                        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
               WHERE c.c_custkey < 50
               ORDER BY c_custkey, o_orderkey""")
    },
    Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           |FROM customer c,
           |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
           |         WHERE o.o_custkey = c.c_custkey
           |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
           |WHERE c.c_custkey < 50
           |ORDER BY c_custkey, o_orderkey""".stripMargin))

  /** CSV source/sink round-trip: write `orders` as CSV (header, default
    * quoting), read it back with the original schema, aggregate — the
    * result must be value-identical to the same aggregate over the
    * parquet original, proving the text encode/decode (doubles via
    * shortest-round-trip repr, ms timestamps, quoted strings) is
    * lossless. Multi-format ingestion is table stakes for a landing
    * zone; the aggregate's decimal sum keeps the check order-independent. */
  val q52 = Q(
    "q52_csv_roundtrip",
    (s, d) => {
      val src = orders(s, d)
      val out = s"/tmp/graft_rt/csv_${new java.io.File(d).getName}"
      src.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(src.schema).option("header", "true").csv(out)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), dsum2(col("o_totalprice")).as("total"),
          max(col("o_orderdate")).as("last_date"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           |       MAX(o_orderdate) AS last_date
           |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  /** JSON source/sink round-trip (line-delimited), same contract as q52:
    * schema-preserving read-back, aggregate matches the parquet
    * original. */
  val q52b = Q(
    "q52b_json_roundtrip",
    (s, d) => {
      val src = customer(s, d)
      val out = s"/tmp/graft_rt/json_${new java.io.File(d).getName}"
      src.write.mode("overwrite").json(out)
      s.read.schema(src.schema).json(out)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"), dsum2(col("c_acctbal")).as("balance"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance
           |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Fuzzy string matching: edit distance against a probe term — the
    * row-local approximate-match primitive (typo-tolerant joins build
    * on it with a length/prefix blocking stage like q28b's). Integer
    * distances, so the oracle check is exact. */
  val q22b = Q(
    "q22b_fuzzy_match",
    (s, d) =>
      part(s, d)
        .select(col("p_partkey"), col("p_name"),
          levenshtein(col("p_name"), lit("small gear")).as("dist"))
        .filter(col("dist") <= 6)
        .orderBy(col("dist"), col("p_partkey"))
        .limit(100),
    Some("""SELECT p_partkey, p_name, levenshtein(p_name, 'small gear') AS dist
           |FROM part WHERE levenshtein(p_name, 'small gear') <= 6
           |ORDER BY dist, p_partkey LIMIT 100""".stripMargin))

  /** Date-spine zero-fill: generate a calendar month row-for-row
    * (sequence → explode, no source table) and left-join daily order
    * counts so empty days surface as 0 — the gap-filling idiom every
    * time-series rollup needs. The spine is generated, tiny, and
    * broadcast; the counts side aggregates BEFORE the join. */
  val q23b = Q(
    "q23b_date_spine",
    (s, d) => {
      val spine = s.range(1)
        .select(explode(sequence(
          to_date(lit("1995-01-01")), to_date(lit("1995-01-31")),
          expr("INTERVAL 1 DAY"))).as("day"))
      val daily = orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
        .orderBy(col("day"))
    },
    Some("""WITH spine AS (
           |  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-01-31',
           |                                     INTERVAL 1 DAY)) AS DATE) AS day),
           |daily AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) n
           |          FROM orders GROUP BY 1)
           |SELECT spine.day, COALESCE(daily.n, 0) AS n_orders
           |FROM spine LEFT JOIN daily ON spine.day = daily.day
           |ORDER BY spine.day""".stripMargin))

  /** Funnel analysis: users progressing view → click → purchase in
    * strict timestamp order. One conditional-min aggregation per user
    * (map-side combined; the shuffle carries 3 timestamps per user,
    * never event rows), then a one-row global rollup — the standard
    * event-sequence op at any scale. */
  val q36b = Q(
    "q36b_funnel",
    (s, d) => {
      val stage = events(s, d).groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      stage.select(
        count(lit(1)).as("users"),
        count(col("t_view")).as("viewed"),
        count(when(col("t_click") > col("t_view"), lit(1))).as("clicked_after_view"),
        count(when(col("t_purchase") > col("t_click") && col("t_click") > col("t_view"),
          lit(1))).as("purchased_full_funnel"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events),
           |st AS (SELECT user_id,
           |         MIN(CASE WHEN event_type = 'view' THEN ts END) t_view,
           |         MIN(CASE WHEN event_type = 'click' THEN ts END) t_click,
           |         MIN(CASE WHEN event_type = 'purchase' THEN ts END) t_purchase
           |       FROM ev GROUP BY user_id)
           |SELECT COUNT(*) AS users,
           |       COUNT(t_view) AS viewed,
           |       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
           |       COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
           |         AS purchased_full_funnel
           |FROM st""".stripMargin))

  /** Unpivot (melt) — the inverse of q31's pivot: lineitem's four
    * numeric measures become (metric, value) rows. Row-local reshape
    * (Expand node, no shuffle); the narrow long format is what metric
    * stores and plotting pipelines ingest. */
  val q31b = Q(
    "q31b_unpivot",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "mval")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
    Some("""SELECT l_orderkey, l_linenumber, metric, mval FROM (
           |  SELECT l_orderkey, l_linenumber, 'l_quantity' metric, l_quantity mval FROM lineitem
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
           |WHERE l_orderkey < 100
           |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin))

  /** ORC source/sink round-trip — third columnar format beside parquet
    * (same contract as q52/q52b): schema-preserving read-back, aggregate
    * value-identical to the parquet original. */
  val q52c = Q(
    "q52c_orc_roundtrip",
    (s, d) => {
      val src = lineitem(s, d).select(
        col("l_returnflag"), col("l_linestatus"), col("l_quantity"), col("l_shipdate"))
      val out = s"/tmp/graft_rt/orc_${new java.io.File(d).getName}"
      src.write.mode("overwrite").orc(out)
      s.read.schema(src.schema).orc(out)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum2(col("l_quantity")).as("qty"),
          max(col("l_shipdate")).as("last_ship"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
           |       MAX(l_shipdate) AS last_ship
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Hive-style partitioned write + partition-pruned read: documents
    * land partitioned by lang, then a lang-filtered read touches ONLY
    * the matching directory — the layout/pruning contract that turns a
    * 100 TB scan into a single-partition scan (PlanSpec asserts the
    * pruning; this query proves the values survive the round trip,
    * including the partition column's string round-trip). */
  val q54 = Q(
    "q54_partitioned_pruning",
    (s, d) => {
      val out = s"/tmp/graft_rt/part_${new java.io.File(d).getName}"
      documents(s, d).write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""SELECT lang, source, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars
           |FROM documents WHERE lang IN ('en', 'de')
           |GROUP BY lang, source ORDER BY lang, source""".stripMargin))

  /** RELY-constraint join elimination, end-to-end: `orders` and
    * `customer` land as lakehouse tables with a RELY'd PRIMARY KEY on
    * `c_custkey` and a RELY'd FOREIGN KEY `o_custkey → c_custkey`, then
    * the classic BI shape — a star join whose dimension contributes no
    * output columns — aggregates orders alone. ConstraintOptimization
    * deletes the join (PlanSpec pins: zero joins in the optimized
    * plan); the DuckDB oracle RUNS the join on the raw parquet, so a
    * hash-match proves the rewrite is semantically invisible on data
    * that honors the declared keys.
    *
    * Scale shape: the eliminated join is the whole point — at 100 TB
    * this is a dimension full-scan plus a corpus-wide shuffle (or at
    * best a broadcast probe) deleted from every view-generated query
    * that doesn't touch the dimension's columns.
    *
    * The session may be bare (Verify/Bench build no extensions): the
    * catalog is registered at runtime and the rule injected through
    * `spark.experimental.extraOptimizations`, both idempotently. Tables
    * are created once per (warehouse, sf) and rebuilt if the source
    * row count drifts (regenerated fixtures). */
  /** Content fingerprint of a catalog-query's parquet source — the
    * staleness key for the cached lakehouse fixtures q111–q113 build
    * under /tmp/graft_rt. A row COUNT alone would serve stale tables
    * if the driver ever regenerated fixtures with identical counts but
    * different content; xxhash64-sum over every column catches that.
    * Spark-side only (never compared to the oracle), so hash stability
    * across engines is irrelevant. */
  /** Marks memoized per (canonicalized plan, parquet file size+mtime)
    * — the mark is a pure function of the source file bytes and the
    * projection/filter applied, so the (size, mtime) fingerprint
    * re-computes it whenever the fixture file changes (the discipline
    * Tables.schemaCache and the metadata render cache already use).
    * Before the memo every gate SAMPLE paid a full hash-aggregation
    * job over its source just to re-derive a key that cannot have
    * changed mid-run. Plans backed by anything but local files are
    * never cached. */
  private val srcMarkCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def srcMark(df: DataFrame): String = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // EVERY leaf must be a local-file HadoopFsRelation for the memo to
    // be sound (r19 ADVICE): a LocalRelation/InMemoryRelation leaf
    // contributes DATA the plan key below cannot see, so any such plan
    // bails to the full recompute
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val rels = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => Some(fs.location.rootPaths.map(_.toString))
        case _ => None
      }
      case _ => None
    }
    def localFp(p: String): Option[String] =
      try {
        val uri = new java.net.URI(p)
        val path =
          if (uri.getScheme == "file") uri.getPath
          else if (uri.getScheme == null) p
          else return None // non-local storage: never cache
        // regular FILES only (r19 ADVICE): a directory's length/mtime
        // do not track in-place rewrites of contained files -- same
        // discipline as Tables.table. Fingerprint = size + nanosecond
        // mtime + inode (graft.Tables.fileFingerprint), closing the
        // same-size same-millisecond rewrite hole the REST registry
        // closed on its write side in r19.
        graft.Tables.fileFingerprint(new java.io.File(path)).map(p + ":" + _)
      } catch { case _: Exception => None }
    val fileFp: Option[String] =
      if (rels.nonEmpty && rels.forall(_.isDefined)) {
        val fps = rels.flatMap(_.get).map(localFp)
        if (fps.forall(_.isDefined)) Some(fps.flatten.mkString(";")) else None
      } else None
    fileFp match {
      case None => computeSrcMark(df)
      case Some(fp) =>
        // structure key = semanticHash of the canonicalized plan -- it
        // hashes the full tree, where canonicalized.toString truncated
        // via maxToStringFields (r19 ADVICE); leaf DATA is covered by
        // the file fingerprint plus the all-leaves-are-files gate above
        val key =
          df.queryExecution.analyzed.canonicalized.semanticHash().toString +
            ":" + fp
        srcMarkCache.computeIfAbsent(key, _ => computeSrcMark(df))
    }
  }

  private def computeSrcMark(df: DataFrame): String = {
    val r = df.agg(
      count(lit(1)),
      // decimal sum: a long sum of 64-bit hashes overflows (ANSI throws)
      sum(xxhash64(df.columns.map(col): _*).cast(DecimalType(38, 0)))
        .cast("string")).collect()(0)
    s"${r.get(0)}:${r.get(1)}"
  }

  /** Mutual exclusion for the shared `/tmp/graft_rt/rely_wh` fixture
    * warehouse: two same-SF sessions racing a `freshly` check's
    * DROP/CREATE would corrupt the cached fixtures. JVM monitor first
    * (overlapping FileLocks within one JVM throw), then an OS-level
    * FileLock for the cross-process case — the same two-tier pattern
    * the expire floor uses. Single-driver today; this makes the cache
    * safe if the driver ever parallelizes gates. */
  private val relyLockMonitor = new Object
  private def withRelyLock[A](f: => A): A = relyLockMonitor.synchronized {
    val dir = java.nio.file.Paths.get("/tmp/graft_rt")
    java.nio.file.Files.createDirectories(dir)
    val ch = java.nio.channels.FileChannel.open(dir.resolve("rely_wh.lock"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try { val l = ch.lock(); try f finally l.release() } finally ch.close()
  }

  val q111 = Q(
    "q111_rely_join_elimination",
    (s, d) => {
      val cat = "grely"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LakehouseCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", "/tmp/graft_rt/rely_wh")
      if (!s.sessionState.optimizer.extendedOperatorOptimizationRules
            .exists(_.isInstanceOf[graft.catalog.ConstraintOptimization]) &&
          !s.experimental.extraOptimizations
            .exists(_.isInstanceOf[graft.catalog.ConstraintOptimization]))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.catalog.ConstraintOptimization(s)
      val ns = s"rely_${new java.io.File(d).getName.replace('.', '_')}"
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
      val srcCust = customer(s, d).select("c_custkey", "c_name")
      val srcOrd = orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      def freshly(tbl: String, mark: String): Boolean =
        !s.catalog.tableExists(s"$cat.$ns.$tbl") || {
          val stale = !graft.catalog.TableMetadata.load(
            java.nio.file.Paths.get("/tmp/graft_rt/rely_wh", ns, tbl))
            .properties.get("graft.src.mark").contains(mark)
          if (stale) s.sql(s"DROP TABLE $cat.$ns.$tbl")
          stale
        }
      val custMark = srcMark(srcCust)
      val ordMark = srcMark(srcOrd)
      withRelyLock {
        if (freshly("customer", custMark)) {
          s.sql(s"CREATE TABLE $cat.$ns.customer (c_custkey BIGINT NOT NULL, " +
            "c_name STRING, CONSTRAINT cust_pk PRIMARY KEY (c_custkey) NOT ENFORCED RELY) " +
            s"TBLPROPERTIES ('graft.src.mark'='$custMark')")
          srcCust.createOrReplaceTempView("rely_cust_src")
          s.sql(s"INSERT INTO $cat.$ns.customer SELECT * FROM rely_cust_src")
        }
        if (freshly("orders", ordMark)) {
          s.sql(s"CREATE TABLE $cat.$ns.orders (o_orderkey BIGINT, " +
            "o_custkey BIGINT NOT NULL, o_totalprice DOUBLE, o_orderpriority STRING, " +
            s"CONSTRAINT ord_fk FOREIGN KEY (o_custkey) " +
            s"REFERENCES $cat.$ns.customer (c_custkey) NOT ENFORCED RELY) " +
            s"TBLPROPERTIES ('graft.src.mark'='$ordMark')")
          srcOrd.createOrReplaceTempView("rely_ord_src")
          s.sql(s"INSERT INTO $cat.$ns.orders SELECT * FROM rely_ord_src")
        }
      }
      s.sql(
        s"""SELECT o.o_orderpriority, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM $cat.$ns.orders o
           |JOIN $cat.$ns.customer c ON o.o_custkey = c.c_custkey
           |GROUP BY o.o_orderpriority
           |ORDER BY o.o_orderpriority""".stripMargin)
    },
    Some("""SELECT o.o_orderpriority, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           |GROUP BY o.o_orderpriority
           |ORDER BY o.o_orderpriority""".stripMargin))

  /** RELY-constraint DISTINCT removal, oracle-checked end-to-end — the
    * second ConstraintOptimization rewrite (q111 exercises the first):
    * `SELECT DISTINCT` over columns covering a RELY'd PRIMARY KEY is a
    * no-op, and dropping the Aggregate deletes a corpus-wide hash
    * shuffle — the de-duplicating SELECT every export/BI extract runs
    * "just in case" costs literally nothing on a keyed table. PlanSpec
    * pins the aggregate-free plan; DuckDB RUNS the DISTINCT on the raw
    * parquet, so the hash-match proves the removal invisible on data
    * honoring the key. Reuses q111's customer table (PK c_custkey
    * RELY). */
  val q114 = Q(
    "q114_rely_distinct_removal",
    (s, d) => {
      q111.run(s, d).count() // builds (or freshness-checks) the tables
      val ns = s"rely_${new java.io.File(d).getName.replace('.', '_')}"
      s.sql(
        s"""SELECT DISTINCT c_custkey, c_name
           |FROM grely.$ns.customer
           |ORDER BY c_custkey""".stripMargin)
    },
    Some("""SELECT DISTINCT c_custkey, c_name
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** Merge-on-read + deletion-vector read, oracle-checked end-to-end:
    * orders lands as a MoR lakehouse table, two positional MERGEs bump
    * prices (each writes a positional delete entry + replacement
    * rows), consolidation merges the entries AND writes the
    * deletion-vector sidecar — so the aggregate below reads dirty
    * files through the codegen'd position probe with NO join anywhere
    * in the plan (PlanSpec pins it), while DuckDB computes the same
    * numbers arithmetically from the raw parquet. A hash-match proves
    * the whole MoR/DV read path row-exact.
    *
    * Scale shape: this is the CDC-heavy table read at 100 TB — deletes
    * applied as a row-local filter instead of an anti-join per dirty
    * file group.
    *
    * DML is applied exactly once per (warehouse, sf): MERGE price
    * bumps are not idempotent, so the table recreates only when the
    * source row count drifts (regenerated fixtures). */
  val q112 = Q(
    "q112_mor_dv_read",
    (s, d) => {
      val cat = "grely"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LakehouseCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", "/tmp/graft_rt/rely_wh")
      val ns = s"mordv_${new java.io.File(d).getName.replace('.', '_')}"
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
      val src = orders(s, d).select("o_orderkey", "o_totalprice", "o_orderpriority")
      val t = s"$cat.$ns.orders"
      val dir = java.nio.file.Paths.get("/tmp/graft_rt/rely_wh", ns, "orders")
      // freshness by recorded source count — a table READ here would
      // need the MoR merged view, which is exactly what this query is
      // in the middle of building
      val mark = srcMark(src)
      withRelyLock {
      val fresh = !s.catalog.tableExists(t) || {
        val stale = !graft.catalog.TableMetadata.load(dir)
          .properties.get("graft.src.mark").contains(mark)
        if (stale) s.sql(s"DROP TABLE $t")
        stale
      }
      if (fresh) {
        s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_totalprice DOUBLE, " +
          "o_orderpriority STRING) TBLPROPERTIES (" +
          "'graft.merge.mode'='merge-on-read', 'graft.delete.mode'='merge-on-read', " +
          s"'graft.src.mark'='$mark')")
        src.createOrReplaceTempView("mordv_src")
        s.sql(s"INSERT INTO $t SELECT * FROM mordv_src")
        // ONE positional MERGE (its target read sees a clean table, so
        // this runs on bare sessions too) carrying both price bumps
        s.sql(s"""MERGE INTO $t t
                 |USING (SELECT o_orderkey FROM mordv_src
                 |       WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0) u
                 |ON t.o_orderkey = u.o_orderkey
                 |WHEN MATCHED THEN UPDATE SET t.o_totalprice = t.o_totalprice
                 |  + (CASE WHEN t.o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
                 |  + (CASE WHEN t.o_orderkey % 11 = 0 THEN 2 ELSE 0 END)
                 |""".stripMargin)
        // attach the deletion-vector sidecar to the positional entry
        s.sql(s"CALL $cat.system.vectorize_deletes('$ns', 'orders')")
      }
      }
      // merged read through the engine API — the SAME path the
      // MorReads extension rule plans for `spark.table`, but callable
      // on a bare session (Verify/Bench build no extensions); the DV
      // probe applies inside it (PlanSpec pins the join-free plan)
      val meta = graft.catalog.TableMetadata.load(dir)
      val merged = graft.catalog.MergeOnRead.read(s, dir, meta, meta.files)
      merged.createOrReplaceTempView("mordv_merged")
      s.sql(
        s"""SELECT o_orderpriority, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM mordv_merged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(
           |         o_totalprice
           |           + (CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
           |           + (CASE WHEN o_orderkey % 11 = 0 THEN 2 ELSE 0 END)
           |         AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Partition-pruned metadata aggregate over a MANY-CHUNK table:
    * customer lands as 25 single-nation commits (25 manifest chunks,
    * each summarized to one c_nationkey value), then a
    * nation-filtered COUNT/MIN/MAX folds entirely from snapshot
    * metadata — the scan plans as a LocalTableScan with ZERO tasks
    * (PlanSpec pins it), and on a cold driver the manifest-list
    * summaries mean only the matching chunk is even parsed
    * (ManifestMetadataSpec pins the byte counters). The oracle runs
    * the same filter + aggregate over raw parquet. At 100 TB this is
    * the `COUNT(*) WHERE partition = x` dashboard query: metadata
    * lookup, no cluster time at all. */
  val q113 = Q(
    "q113_metadata_agg_pruned",
    (s, d) => {
      val cat = "grely"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LakehouseCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", "/tmp/graft_rt/rely_wh")
      val ns = s"magg_${new java.io.File(d).getName.replace('.', '_')}"
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
      val src = customer(s, d).select("c_custkey", "c_nationkey", "c_acctbal")
      val t = s"$cat.$ns.customer"
      val mark = srcMark(src)
      withRelyLock {
      val fresh = !s.catalog.tableExists(t) || {
        val stale = !graft.catalog.TableMetadata.load(
          java.nio.file.Paths.get("/tmp/graft_rt/rely_wh", ns, "customer"))
          .properties.get("graft.src.mark").contains(mark)
        if (stale) s.sql(s"DROP TABLE $t")
        stale
      }
      if (fresh) {
        s.sql(s"CREATE TABLE $t (c_custkey BIGINT, c_nationkey INT, " +
          "c_acctbal DOUBLE) PARTITIONED BY (c_nationkey) " +
          s"TBLPROPERTIES ('graft.src.mark'='$mark')")
        src.createOrReplaceTempView("magg_src")
        // one commit per nation: single-value files (exact pushdown)
        // AND single-value manifest chunks (cold-driver chunk skipping)
        (0 until 25).foreach { n =>
          s.sql(s"INSERT INTO $t SELECT * FROM magg_src WHERE c_nationkey = $n")
        }
      }
      }
      s.sql(
        s"""SELECT COUNT(*) AS cnt, MIN(c_custkey) AS min_k, MAX(c_custkey) AS max_k
           |FROM $t WHERE c_nationkey = 7""".stripMargin)
    },
    Some("""SELECT COUNT(*) AS cnt, MIN(c_custkey) AS min_k, MAX(c_custkey) AS max_k
           |FROM customer WHERE c_nationkey = 7""".stripMargin))

  /** Iceberg ROUND TRIP, oracle-checked end-to-end in the driver gate:
    * supplier lands as a WRITE-THROUGH-MIRRORED MoR table (every
    * commit, including the MoR DELETE, maintains the spec-conformant
    * Iceberg export as it publishes), then `import_iceberg` ingests the
    * mirror's artifacts — metadata.json, Avro manifests, rewritten v2
    * delete files, NEVER graft's own log — as a second table whose
    * merged read must hash-match DuckDB computing the same delete
    * arithmetically over the raw parquet. One query covers the round's
    * flagship surface: mirror maintenance, export delete rewrite,
    * import sequence rank-remap, and the MoR read of imported delete
    * state. Fixtures cache per (warehouse, sf) under the rely lock,
    * keyed by source content fingerprint. */
  /** Ensure q115's cached fixture pair (MoR-dirty mirrored supplier +
    * its re-import) exists and is fresh; returns (srcDir, impDir).
    * Split out of q115 (r19) so the gates that only need the FIXTURE
    * (q123's python re-read, q128's REST re-read) stop executing
    * q115's final aggregation once per bench sample — warm, this is
    * metadata checks only (the srcMark memo removes the per-sample
    * hash job too). */
  private def ensureIceRtFixture(s: SparkSession, d: String)
      : (java.nio.file.Path, java.nio.file.Path) = {
    val cat = "grely"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LakehouseCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", "/tmp/graft_rt/rely_wh")
    val ns = s"ice_${new java.io.File(d).getName.replace('.', '_')}"
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    val src = supplier(s, d).select("s_suppkey", "s_name", "s_acctbal")
    val mark = srcMark(src)
    val t = s"$cat.$ns.supplier"
    val ti = s"$cat.$ns.supplier_imp"
    val srcDir = java.nio.file.Paths.get("/tmp/graft_rt/rely_wh", ns, "supplier")
    val impDir = java.nio.file.Paths.get("/tmp/graft_rt/rely_wh", ns, "supplier_imp")
    withRelyLock {
        def freshOf(tbl: String, dirOf: java.nio.file.Path): Boolean =
          !s.catalog.tableExists(s"$cat.$ns.$tbl") || {
            val stale = !graft.catalog.TableMetadata.load(dirOf)
              .properties.get("graft.src.mark").contains(mark)
            if (stale) s.sql(s"DROP TABLE $cat.$ns.$tbl")
            stale
          }
        if (freshOf("supplier", srcDir)) {
          // the import must track a rebuilt source even when the source
          // build itself is cached: rebuild both together
          if (s.catalog.tableExists(ti)) s.sql(s"DROP TABLE $ti")
          s.sql(s"CREATE TABLE $t (s_suppkey BIGINT, s_name STRING, " +
            "s_acctbal DOUBLE) TBLPROPERTIES (" +
            "'graft.delete.mode'='merge-on-read', " +
            "'graft.iceberg.mirror'='true', " +
            s"'graft.src.mark'='$mark')")
          src.createOrReplaceTempView("ice_rt115_src")
          s.sql(s"INSERT INTO $t SELECT * FROM ice_rt115_src")
          // MoR delete → the mirror rewrites the v2 delete file as part
          // of THIS commit's publish (write-through, no CALL export)
          s.sql(s"DELETE FROM $t WHERE s_suppkey % 10 = 3")
        }
        if (freshOf("supplier_imp", impDir)) {
          val md = srcDir.resolve("metadata")
          val hint = java.nio.file.Files.readString(
            md.resolve("version-hint.text")).trim.toInt
          s.sql(s"CALL $cat.system.import_iceberg('$ns', 'supplier_imp', " +
            s"'${md.resolve(s"v$hint.metadata.json")}')")
          s.sql(s"ALTER TABLE $ti SET TBLPROPERTIES ('graft.src.mark'='$mark')")
        }
      }
    (srcDir, impDir)
  }

  val q115 = Q(
    "q115_iceberg_roundtrip",
    (s, d) => {
      val (_, impDir) = ensureIceRtFixture(s, d)
      // merged read through the engine API (bare-session path, as q112)
      val meta = graft.catalog.TableMetadata.load(impDir)
      val merged = graft.catalog.MergeOnRead.read(s, impDir, meta, meta.files)
      merged.createOrReplaceTempView("ice_rt115_imp")
      s.sql(
        s"""SELECT s_suppkey % 7 AS grp, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM ice_rt115_imp GROUP BY s_suppkey % 7 ORDER BY grp""".stripMargin)
    },
    Some("""SELECT s_suppkey % 7 AS grp, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM supplier WHERE s_suppkey % 10 <> 3
           |GROUP BY s_suppkey % 7 ORDER BY grp""".stripMargin))

  /** Shared fixture for q116/q117: supplier split across two commits by
    * suppkey parity, with a tag pinned between them — versions are
    * deterministic on a fresh build (v1 create, v2 even rows, v3 tag,
    * v4 odd rows), so time travel and the changelog window are both
    * oracle-reconstructable from the raw parquet by parity predicate. */
  private def timeTravelFixture(s: SparkSession, d: String): String = {
    val src = supplier(s, d).select("s_suppkey", "s_name", "s_acctbal")
    val mark = srcMark(src)
    cachedFixture(s, d, "tt", "supplier_tt", mark,
      t => s"CREATE TABLE $t (s_suppkey BIGINT, s_name STRING, " +
        s"s_acctbal DOUBLE) TBLPROPERTIES ('graft.src.mark'='$mark')") { t => // v1
      val Array(_, ns, tbl) = t.split('.')
      src.createOrReplaceTempView("tt_src")
      s.sql(s"INSERT INTO $t SELECT * FROM tt_src WHERE s_suppkey % 2 = 0") // v2
      s.sql(s"CALL grely.system.tag('$ns', '$tbl', 'base', 2)") // v3
      s.sql(s"INSERT INTO $t SELECT * FROM tt_src WHERE s_suppkey % 2 = 1") // v4
    }
  }

  /** TIME TRAVEL oracle-checked end-to-end in the driver gate: reading
    * the TAGGED snapshot must see exactly the even-suppkey half however
    * far history advanced — DuckDB reconstructs that snapshot
    * arithmetically from the raw parquet. Until now time travel was
    * spec-covered only (TagSpec); this puts `VERSION AS OF '<tag>'`
    * under the hash-match gate at every SF. */
  val q116 = Q(
    "q116_time_travel_tag",
    (s, d) => {
      val t = timeTravelFixture(s, d)
      s.sql(
        s"""SELECT COUNT(*) AS cnt,
           |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           |       MIN(s_suppkey) AS min_k, MAX(s_suppkey) AS max_k
           |FROM $t VERSION AS OF 'base'""".stripMargin)
    },
    Some("""SELECT COUNT(*) AS cnt,
           |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           |       MIN(s_suppkey) AS min_k, MAX(s_suppkey) AS max_k
           |FROM supplier WHERE s_suppkey % 2 = 0""".stripMargin))

  /** CHANGELOG (CDC read) oracle-checked end-to-end: the `.changes`
    * face windowed to the post-tag commit must emit exactly the
    * odd-suppkey inserts with `_change_type='insert'` — the incremental
    * consumer's contract (process only what commit v4 added), which
    * DuckDB reconstructs by parity predicate. Until now `.changes` was
    * spec-covered only (ChangelogSpec). */
  val q117 = Q(
    "q117_changelog_window",
    (s, d) => {
      val t = timeTravelFixture(s, d)
      s.sql(
        s"""SELECT s_suppkey, s_name, _change_type
           |FROM $t.changes WHERE _commit_version = 4
           |ORDER BY s_suppkey""".stripMargin)
    },
    Some("""SELECT s_suppkey, s_name, 'insert' AS _change_type
           |FROM supplier WHERE s_suppkey % 2 = 1
           |ORDER BY s_suppkey""".stripMargin))

  /** One cached lakehouse fixture table under the rely lock: create
    * with `ddl`, run `build` once per (warehouse, sf, source content),
    * return the table name. The repeated pattern behind q115–q120. */
  private def cachedFixture(
      s: SparkSession, d: String, nsPrefix: String, tbl: String,
      mark: String, ddl: String => String)(build: String => Unit): String = {
    val cat = "grely"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LakehouseCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", "/tmp/graft_rt/rely_wh")
    val ns = s"${nsPrefix}_${new java.io.File(d).getName.replace('.', '_')}"
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    val t = s"$cat.$ns.$tbl"
    withRelyLock {
      val fresh = !s.catalog.tableExists(t) || {
        val stale = !graft.catalog.TableMetadata.load(
          java.nio.file.Paths.get("/tmp/graft_rt/rely_wh", ns, tbl))
          .properties.get("graft.src.mark").contains(mark)
        if (stale) s.sql(s"DROP TABLE $t")
        stale
      }
      if (fresh) { s.sql(ddl(t)); build(t) }
    }
    t
  }

  /** BRANCH (write-audit-publish) read, oracle-checked: ingest lands on
    * a branch main readers never see; the audit read via
    * `VERSION AS OF '<branch>'` must serve main's rows PLUS the
    * branch's — DuckDB reconstructs the branch head from the raw
    * parquet (all rows) while main still holds half. Previously
    * BranchSpec-only coverage. */
  val q118 = Q(
    "q118_branch_wap_read",
    (s, d) => {
      val src = supplier(s, d).select("s_suppkey", "s_name", "s_acctbal")
      val mark = srcMark(src)
      val t = cachedFixture(s, d, "br", "supplier_br", mark,
        t => s"CREATE TABLE $t (s_suppkey BIGINT, s_name STRING, " +
          s"s_acctbal DOUBLE) TBLPROPERTIES ('graft.src.mark'='$mark')") { t =>
        src.createOrReplaceTempView("br_src")
        s.sql(s"INSERT INTO $t SELECT * FROM br_src WHERE s_suppkey % 2 = 0")
        val Array(_, ns, tbl) = t.split('.')
        s.sql(s"CALL grely.system.branch('$ns', '$tbl', 'audit')")
        s.sql("SELECT * FROM br_src WHERE s_suppkey % 2 = 1")
          .createOrReplaceTempView("br_delta")
        s.sql(s"CALL grely.system.append_to_branch('$ns', '$tbl', 'audit', 'br_delta')")
      }
      s.sql(
        s"""SELECT COUNT(*) AS cnt,
           |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM $t VERSION AS OF 'audit'""".stripMargin)
    },
    Some("""SELECT COUNT(*) AS cnt,
           |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM supplier""".stripMargin))

  /** SCHEMA EVOLUTION (ADD COLUMN ... DEFAULT) oracle-checked: rows
    * written BEFORE the column existed read the frozen initial default
    * with no file rewrite; rows after carry real values. DuckDB
    * reconstructs the same split by parity. Previously
    * DefaultValueSpec-only coverage. */
  val q119 = Q(
    "q119_schema_evolution_default",
    (s, d) => {
      val src = supplier(s, d).select("s_suppkey", "s_name", "s_acctbal")
      val mark = srcMark(src)
      val t = cachedFixture(s, d, "se", "supplier_se", mark,
        t => s"CREATE TABLE $t (s_suppkey BIGINT, s_name STRING) " +
          s"TBLPROPERTIES ('graft.src.mark'='$mark')") { t =>
        src.createOrReplaceTempView("se_src")
        s.sql(s"INSERT INTO $t SELECT s_suppkey, s_name FROM se_src " +
          "WHERE s_suppkey % 2 = 0")
        s.sql(s"ALTER TABLE $t ADD COLUMN s_acctbal DOUBLE DEFAULT 1.5")
        s.sql(s"INSERT INTO $t SELECT s_suppkey, s_name, s_acctbal FROM se_src " +
          "WHERE s_suppkey % 2 = 1")
      }
      s.sql(
        s"""SELECT s_suppkey % 3 AS grp, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM $t GROUP BY s_suppkey % 3 ORDER BY grp""".stripMargin)
    },
    Some("""SELECT s_suppkey % 3 AS grp, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(
           |         CASE WHEN s_suppkey % 2 = 0 THEN 1.5 ELSE s_acctbal END
           |         AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM supplier GROUP BY s_suppkey % 3 ORDER BY grp""".stripMargin))

  /** Static-partition INSERT OVERWRITE oracle-checked: replacing ONE
    * partition must leave every other byte of the table untouched —
    * DuckDB computes the post-overwrite state arithmetically.
    * Previously InsertOverwriteSpec-only coverage. */
  val q120 = Q(
    "q120_partition_overwrite",
    (s, d) => {
      val src = supplier(s, d).select("s_suppkey", "s_acctbal")
      val mark = srcMark(src)
      val t = cachedFixture(s, d, "ow", "supplier_ow", mark,
        t => s"CREATE TABLE $t (k BIGINT, bal DOUBLE, par STRING) " +
          "PARTITIONED BY (par) " +
          s"TBLPROPERTIES ('graft.src.mark'='$mark')") { t =>
        src.createOrReplaceTempView("ow_src")
        s.sql(s"INSERT INTO $t SELECT s_suppkey, s_acctbal, " +
          "CASE WHEN s_suppkey % 2 = 0 THEN 'even' ELSE 'odd' END FROM ow_src")
        s.sql(s"INSERT OVERWRITE $t PARTITION (par = 'odd') " +
          "SELECT s_suppkey, s_acctbal + 100 FROM ow_src WHERE s_suppkey % 2 = 1")
      }
      s.sql(
        s"""SELECT par, COUNT(*) AS cnt,
           |       CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM $t GROUP BY par ORDER BY par""".stripMargin)
    },
    Some("""SELECT CASE WHEN s_suppkey % 2 = 0 THEN 'even' ELSE 'odd' END AS par,
           |       COUNT(*) AS cnt,
           |       CAST(SUM(CAST(
           |         CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal
           |              ELSE s_acctbal + 100 END
           |         AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM supplier GROUP BY 1 ORDER BY par""".stripMargin))

  /** INCREMENTALLY MAINTAINED MATERIALIZED VIEW oracle-checked: the MV
    * materializes over half the data, the other half appends, and the
    * refresh must FOLD the delta in (the build asserts mode ==
    * "incremental" — a silent full recompute would pass the values but
    * betray the maintenance contract); the folded result hash-matches
    * DuckDB aggregating everything directly. Previously
    * MaterializedViewSpec-only coverage. */
  val q121 = Q(
    "q121_mv_incremental",
    (s, d) => {
      val src = supplier(s, d).select("s_suppkey")
      val mark = srcMark(src)
      val t = cachedFixture(s, d, "mv", "fact", mark,
        t => s"CREATE TABLE $t (cat STRING, amount BIGINT) " +
          s"TBLPROPERTIES ('graft.src.mark'='$mark')") { t =>
        val Array(_, ns, _) = t.split('.')
        src.createOrReplaceTempView("mv_fixture_src")
        s.sql(s"INSERT INTO $t SELECT CAST(s_suppkey % 5 AS STRING), s_suppkey " +
          "FROM mv_fixture_src WHERE s_suppkey % 2 = 0")
        graft.catalog.MaterializedView.create(s, "grely", Seq(ns), "supp_by_cat",
          "fact", Seq("cat"), Seq(
            graft.catalog.MaterializedView.Agg("sum", "amount", "total"),
            graft.catalog.MaterializedView.Agg("count", "*", "n"),
            graft.catalog.MaterializedView.Agg("max", "amount", "hi")))
        s.sql(s"INSERT INTO $t SELECT CAST(s_suppkey % 5 AS STRING), s_suppkey " +
          "FROM mv_fixture_src WHERE s_suppkey % 2 = 1")
        val mode = graft.catalog.MaterializedView.refresh(
          s, "grely", Seq(ns), "supp_by_cat")
        require(mode == "incremental",
          s"append-only delta must fold incrementally, got '$mode'")
      }
      val ns = t.split('.')(1)
      s.sql(
        s"""SELECT cat, CAST(total AS DOUBLE) AS total, n, hi
           |FROM grely.$ns.supp_by_cat ORDER BY cat""".stripMargin)
    },
    Some("""SELECT CAST(s_suppkey % 5 AS VARCHAR) AS cat,
           |       CAST(SUM(s_suppkey) AS DOUBLE) AS total,
           |       COUNT(*) AS n, MAX(s_suppkey) AS hi
           |FROM supplier GROUP BY 1 ORDER BY cat""".stripMargin))

  /** GENERATED columns oracle-checked: the engine computes the derived
    * value at WRITE time — even for a writer that smuggles its own
    * value in — and the stored result must equal DuckDB recomputing
    * the expression from the source columns. Previously
    * GeneratedColumnSpec-only coverage. */
  val q122 = Q(
    "q122_generated_column",
    (s, d) => {
      val src = supplier(s, d).select("s_suppkey", "s_name")
      val mark = srcMark(src)
      val t = cachedFixture(s, d, "gc", "supplier_gc", mark,
        t => s"CREATE TABLE $t (s_suppkey BIGINT, s_name STRING, " +
          "key_bucket BIGINT GENERATED ALWAYS AS (s_suppkey % 13), " +
          "name_u STRING GENERATED ALWAYS AS (upper(s_name))) " +
          s"TBLPROPERTIES ('graft.src.mark'='$mark')") { t =>
        src.createOrReplaceTempView("gc_src")
        // the writer SMUGGLES wrong values for both generated columns —
        // generation must override them
        s.sql(s"INSERT INTO $t SELECT s_suppkey, s_name, -1L, 'smuggled' FROM gc_src")
      }
      s.sql(
        s"""SELECT key_bucket, COUNT(*) AS cnt, MIN(name_u) AS first_name
           |FROM $t GROUP BY key_bucket ORDER BY key_bucket""".stripMargin)
    },
    Some("""SELECT s_suppkey % 13 AS key_bucket, COUNT(*) AS cnt,
           |       MIN(upper(s_name)) AS first_name
           |FROM supplier GROUP BY 1 ORDER BY key_bucket""".stripMargin))

  /** Run `tools/check_iceberg.py` — the INDEPENDENT-LANGUAGE Iceberg v2
    * reader (pure-python Avro decoder + DuckDB, zero graft code) —
    * against a mirrored table, diffing its read against a dump of
    * graft's own scan. Returns (verdict, rowsRead, openedOfTotal).
    * Driver-contract environments always carry python3+duckdb (the
    * oracle itself is DuckDB); a missing interpreter surfaces as a
    * failing verdict, never a silent pass. */
  private def pythonIcebergCheck(
      s: SparkSession, tableRef: String, expected: DataFrame,
      filter: Option[String],
      verifyBounds: Boolean = false): (String, Long, Option[(Int, Int)]) = {
    import scala.sys.process.{Process, ProcessLogger}
    val tool = java.nio.file.Paths.get("tools", "check_iceberg.py").toAbsolutePath
    if (!java.nio.file.Files.isRegularFile(tool)) return ("NO-TOOL", -1L, None)
    val expDir = java.nio.file.Files.createTempDirectory("graft-pygate-")
    try {
      expected.coalesce(1).write.mode("overwrite").parquet(expDir.toString)
      val out = new StringBuilder
      val cmd = Seq("python3", tool.toString, tableRef, expDir.toString) ++
        filter.toSeq.flatMap(f => Seq("--filter", f)) ++
        (if (verifyBounds) Seq("--verify-bounds") else Nil)
      val code = Process(cmd).!(ProcessLogger(
        l => out.synchronized(out.append(l).append('\n')),
        l => out.synchronized(out.append(l).append('\n'))))
      val MatchRe = "MATCH \\((\\d+) rows".r
      val OpenedRe = "OPENED (\\d+) OF (\\d+) DATA FILES".r
      val rows = MatchRe.findFirstMatchIn(out.toString).map(_.group(1).toLong)
      val opened = OpenedRe.findFirstMatchIn(out.toString)
        .map(m => (m.group(1).toInt, m.group(2).toInt))
      if (code == 0 && rows.isDefined) ("MATCH", rows.get, opened)
      else (s"EXIT$code", rows.getOrElse(-1L), opened)
    } finally {
      try graft.catalog.Fs.deleteRecursively(expDir) catch { case _: Exception => () }
    }
  }

  /** The independent python Iceberg reader INSIDE the driver gate:
    * q115's write-through mirror (supplier + MoR delete) is re-read by
    * `tools/check_iceberg.py` from the exported artifacts alone and
    * diffed against graft's own merged scan; the verdict line becomes
    * the query result, so CORRECTNESS_r{N}.json records the python
    * reader's MATCH at every SF the driver gates — previously the
    * independent-language check ran only inside sbt
    * (IcebergPythonReaderSpec). The oracle recomputes the surviving
    * row count arithmetically from the raw parquet. */
  val q123 = Q(
    "q123_py_reader_gate",
    (s, d) => {
      import s.implicits._
      // ensure the mirrored fixture exists (cached) — fixture checks
      // only, not q115's full aggregation per sample (r19)
      val (tableDir, _) = ensureIceRtFixture(s, d)
      val ns = s"ice_${new java.io.File(d).getName.replace('.', '_')}"
      // ANALYZE once per fixture build (stats persist in properties):
      // the write-through mirror then publishes NDV as an Iceberg
      // `statistics` Puffin file, and --verify-bounds below re-checks
      // every blob's claim against the exact distinct counts of the
      // merged rows — external statistics under the driver gate
      withRelyLock {
        if (!graft.catalog.TableMetadata.load(tableDir).properties
            .contains(graft.catalog.TableStats.NumRowsProp))
          s.sql(s"CALL grely.system.analyze('$ns', 'supplier')").collect()
      }
      // expected = graft's own merged scan through the engine API (the
      // table is MoR-dirty; bare-session path, as q115)
      val meta = graft.catalog.TableMetadata.load(tableDir)
      val merged = graft.catalog.MergeOnRead.read(s, tableDir, meta, meta.files)
        .select("s_suppkey", "s_name", "s_acctbal")
      // --verify-bounds: the gate also recomputes every exported file's
      // min/max/null-count claims (a wrong bound exits nonzero → the
      // verdict breaks the oracle match)
      val (verdict, rows, _) =
        pythonIcebergCheck(s, tableDir.toString, merged, None, verifyBounds = true)
      Seq((verdict, rows)).toDF("verdict", "rows_read")
    },
    Some("""SELECT 'MATCH' AS verdict, COUNT(*) AS rows_read
           |FROM supplier WHERE s_suppkey % 10 <> 3""".stripMargin))

  /** External partition PRUNING inside the driver gate: a mirrored
    * days(ev_d) table (three synthetic days derived from suppkey) is
    * read by the python tool under a one-day filter — the tool resolves
    * the literal against the EXPORTED transform spec and reports how
    * many data files it opened. The result row asserts opened < total
    * (the pruning contract) and carries the row count the oracle
    * recomputes arithmetically. A transform-spec export bug that only
    * mis-prunes keeps full reads correct; this is the gate that would
    * catch it at every SF. */
  val q124 = Q(
    "q124_py_pruning_gate",
    (s, d) => {
      import s.implicits._
      val src = supplier(s, d).select("s_suppkey", "s_acctbal")
      val mark = srcMark(src)
      val t = cachedFixture(s, d, "pyp", "supplier_days", mark,
        t => s"CREATE TABLE $t (s_suppkey BIGINT, s_acctbal DOUBLE, ev_d DATE) " +
          "PARTITIONED BY (days(ev_d)) TBLPROPERTIES (" +
          s"'graft.iceberg.mirror'='true', 'graft.src.mark'='$mark')") { t =>
        src.createOrReplaceTempView("pyp_src")
        s.sql(s"INSERT INTO $t SELECT s_suppkey, s_acctbal, " +
          "DATE_ADD(DATE'2024-03-01', CAST(s_suppkey % 3 AS INT)) FROM pyp_src")
      }
      val Array(_, ns, tbl) = t.split('.')
      val tableDir = java.nio.file.Paths.get("/tmp/graft_rt/rely_wh", ns, tbl)
      val (verdict, rows, opened) = pythonIcebergCheck(
        s, tableDir.toString,
        s.table(t).filter(col("ev_d") === lit("2024-03-02").cast("date")),
        Some("ev_d=2024-03-02"))
      val pruned = opened.exists { case (k, n) => k >= 1 && k < n }
      Seq((verdict, pruned, rows)).toDF("verdict", "pruned", "rows_read")
    },
    Some("""SELECT 'MATCH' AS verdict, true AS pruned, COUNT(*) AS rows_read
           |FROM supplier WHERE s_suppkey % 3 = 1""".stripMargin))

  /** Bucket-pruned point lookup under the oracle: a point predicate on
    * the bucket column of an iceberg-hash bucketed table must read ONLY
    * the matching bucket's files (hash-scattered min/max ranges defeat
    * range skipping — bucket pruning is the skipping layer the layout
    * admits; at 100 TB a point lookup reads 1/n of the table,
    * metadata-only). The result row carries the pruned flag computed
    * from the scan's (survivors, total) instrumentation, and the
    * looked-up row itself — DuckDB recomputes both arithmetically. */
  /** The REST catalog under the driver gate: q115's mirrored supplier
    * is DISCOVERED and loaded by the independent python reader through
    * `CALL system.start_rest_catalog` — the loadTable URL replaces the
    * table directory, so the whole REST protocol (discovery, inlined
    * metadata document, error handling) sits under CORRECTNESS at
    * every SF, the q123 pattern one transport further. The endpoint is
    * ephemeral-port and torn down in a finally. */
  val q128 = Q(
    "q128_py_rest_gate",
    (s, d) => {
      import s.implicits._
      // ensure the mirrored fixture exists (cached) — fixture checks
      // only, not q115's full aggregation per sample (r19)
      val (tableDir, _) = ensureIceRtFixture(s, d)
      val cat = "grely"
      val ns = s"ice_${new java.io.File(d).getName.replace('.', '_')}"
      val port = s.sql(s"CALL $cat.system.start_rest_catalog(0)")
        .collect()(0).getLong(0)
      try {
        val meta = graft.catalog.TableMetadata.load(tableDir)
        val merged = graft.catalog.MergeOnRead.read(s, tableDir, meta, meta.files)
          .select("s_suppkey", "s_name", "s_acctbal")
        val (verdict, rows, _) = pythonIcebergCheck(s,
          s"http://127.0.0.1:$port/v1/namespaces/$ns/tables/supplier",
          merged, None)
        Seq((verdict, rows)).toDF("verdict", "rows_read")
      } finally {
        s.sql(s"CALL $cat.system.stop_rest_catalog($port)").collect()
      }
    },
    Some("""SELECT 'MATCH' AS verdict, COUNT(*) AS rows_read
           |FROM supplier WHERE s_suppkey % 10 <> 3""".stripMargin))

  /** REST catalog DISCOVERY under the driver gate, nested namespaces
    * and pagination included: a mirrored table living two namespace
    * levels deep (`rml_<sf>.sub.supplier_ml`) is found by the
    * independent python reader walking `/v1/namespaces?parent=…` with
    * the spec's `%1F` multi-level encoding, following
    * `next-page-token` at pageSize=1 on EVERY listing (so the
    * pagination protocol itself sits under CORRECTNESS, not just under
    * specs), then loaded and row-diffed. q128 gates loadTable given a
    * known URL; this gates the finding of that URL — the half of R17 a
    * real external engine does first. */
  val q129 = Q(
    "q129_py_rest_discovery",
    (s, d) => {
      import s.implicits._
      val cat = "grely"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LakehouseCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", "/tmp/graft_rt/rely_wh")
      val ns = s"rml_${new java.io.File(d).getName.replace('.', '_')}"
      val src = supplier(s, d).select("s_suppkey", "s_name", "s_acctbal")
        .filter(col("s_suppkey") % 7 === 2)
      val mark = srcMark(src)
      val t = s"$cat.$ns.sub.supplier_ml"
      val tableDir =
        java.nio.file.Paths.get("/tmp/graft_rt/rely_wh", ns, "sub", "supplier_ml")
      withRelyLock {
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns.sub")
        val fresh = !s.catalog.tableExists(t) || {
          val stale = !graft.catalog.TableMetadata.load(tableDir)
            .properties.get("graft.src.mark").contains(mark)
          if (stale) s.sql(s"DROP TABLE $t")
          stale
        }
        if (fresh) {
          s.sql(s"CREATE TABLE $t (s_suppkey BIGINT, s_name STRING, " +
            "s_acctbal DOUBLE) TBLPROPERTIES (" +
            "'graft.iceberg.mirror'='true', " +
            s"'graft.src.mark'='$mark')")
          src.createOrReplaceTempView("rest_ml_src")
          s.sql(s"INSERT INTO $t SELECT * FROM rest_ml_src")
        }
      }
      val port = s.sql(s"CALL $cat.system.start_rest_catalog(0)")
        .collect()(0).getLong(0)
      try {
        // dot-QUALIFIED discovery ref: the shared warehouse holds one
        // rml_<sf> namespace per scale factor, and a bare table name
        // would resolve to whichever namespace sorts first — a sf0.1
        // run would diff against the sf0.01 fixture
        val (verdict, rows, _) = pythonIcebergCheck(s,
          s"http://127.0.0.1:$port/v1#$ns.sub.supplier_ml", s.table(t), None)
        Seq((verdict, rows)).toDF("verdict", "rows_read")
      } finally {
        s.sql(s"CALL $cat.system.stop_rest_catalog($port)").collect()
      }
    },
    Some("""SELECT 'MATCH' AS verdict, COUNT(*) AS rows_read
           |FROM supplier WHERE s_suppkey % 7 = 2""".stripMargin))

  val q126 = Q(
    "q126_bucket_point_lookup",
    (s, d) => {
      import s.implicits._
      val src = supplier(s, d).select("s_suppkey", "s_name")
      val mark = srcMark(src)
      val t = cachedFixture(s, d, "bkt", "supplier_bkt", mark,
        t => s"CREATE TABLE $t (s_suppkey BIGINT, s_name STRING) " +
          "PARTITIONED BY (bucket(8, s_suppkey)) TBLPROPERTIES (" +
          s"'graft.bucket.hash'='iceberg', 'graft.src.mark'='$mark')") { t =>
        src.createOrReplaceTempView("bkt_src")
        // two commits -> multiple bucket-addressable files per bucket
        s.sql(s"INSERT INTO $t SELECT * FROM bkt_src WHERE s_suppkey % 2 = 0")
        s.sql(s"INSERT INTO $t SELECT * FROM bkt_src WHERE s_suppkey % 2 = 1")
      }
      val hit = s.table(t).where(col("s_suppkey") === 7L)
        .select(col("s_suppkey"), col("s_name")).collect()
      val (surv, total) = graft.catalog.LakehouseTable.lastScanFileCounts.get()
      val pruned = surv >= 1 && surv < total
      hit.toSeq.map(r => (r.getLong(0), r.getString(1), pruned))
        .toDF("s_suppkey", "s_name", "pruned")
    },
    Some("""SELECT s_suppkey, s_name, true AS pruned
           |FROM supplier WHERE s_suppkey = 7""".stripMargin))

  /** Dataset profile: per-column count / null count / exact distinct /
    * mean / stddev / min / max over `documents` — the sanity-and-drift
    * scan a pipeline runs on every ingest before anything trains on it
    * (a lang column whose distinct count jumps, a n_chars mean that
    * halves, a doc_id that went nullable are all ingest bugs caught
    * here, not three stages later).
    *
    * Scale shape: ONE pass — every per-column aggregate lives in a
    * single stacked aggregation, and the per-column rows unfold from
    * the one aggregated row with `stack` (a generator over 1 row, not
    * a re-scan per column). The multi-column exact distincts plan
    * through Spark's Expand (factor = |profiled columns| + 1) — linear,
    * map-side combined; at 100 TB the same shape swaps
    * `countDistinct` for `approx_count_distinct` sketches (q13's
    * bound pattern) and the Expand disappears. */
  val q69 = Q(
    "q69_profile",
    (s, d) => {
      val a = documents(s, d).agg(
        count(lit(1)).as("n"),
        count(col("doc_id")).as("c_doc"), countDistinct(col("doc_id")).as("d_doc"),
        avg(col("doc_id")).as("m_doc"), stddev(col("doc_id")).as("s_doc"),
        min(col("doc_id")).cast("string").as("mn_doc"),
        max(col("doc_id")).cast("string").as("mx_doc"),
        count(col("lang")).as("c_lang"), countDistinct(col("lang")).as("d_lang"),
        min(col("lang")).as("mn_lang"), max(col("lang")).as("mx_lang"),
        count(col("source")).as("c_src"), countDistinct(col("source")).as("d_src"),
        min(col("source")).as("mn_src"), max(col("source")).as("mx_src"),
        count(col("n_chars")).as("c_nc"), countDistinct(col("n_chars")).as("d_nc"),
        avg(col("n_chars")).as("m_nc"), stddev(col("n_chars")).as("s_nc"),
        min(col("n_chars")).cast("string").as("mn_nc"),
        max(col("n_chars")).cast("string").as("mx_nc"))
      a.select(col("n"), expr(
        """stack(4,
          |  'doc_id', n - c_doc, d_doc, round(m_doc, 4), round(s_doc, 4), mn_doc, mx_doc,
          |  'lang', n - c_lang, d_lang, cast(null as double), cast(null as double), mn_lang, mx_lang,
          |  'n_chars', n - c_nc, d_nc, round(m_nc, 4), round(s_nc, 4), mn_nc, mx_nc,
          |  'source', n - c_src, d_src, cast(null as double), cast(null as double), mn_src, mx_src
          |) as (col, n_null, n_distinct, mean, std, vmin, vmax)""".stripMargin))
        .orderBy(col("col"))
    },
    Some("""SELECT 'doc_id' AS col, COUNT(*) AS n, COUNT(*) - COUNT(doc_id) AS n_null,
           |       COUNT(DISTINCT doc_id) AS n_distinct,
           |       ROUND(AVG(doc_id), 4) AS mean, ROUND(STDDEV(doc_id), 4) AS std,
           |       CAST(MIN(doc_id) AS VARCHAR) AS vmin, CAST(MAX(doc_id) AS VARCHAR) AS vmax
           |FROM documents
           |UNION ALL
           |SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
           |       NULL, NULL, MIN(lang), MAX(lang) FROM documents
           |UNION ALL
           |SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
           |       ROUND(AVG(n_chars), 4), ROUND(STDDEV(n_chars), 4),
           |       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
           |UNION ALL
           |SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
           |       NULL, NULL, MIN(source), MAX(source) FROM documents
           |ORDER BY col""".stripMargin))

  /** Spark-4.1 VARIANT path over the same JSON column q26/q26c read as
    * strings: `parse_json` shreds once into the binary Variant encoding
    * and `variant_get` does typed, null-safe path extraction — at 100 TB
    * this is the column type a semi-structured `props` field should land
    * as (single parse per row, typed pushable accesses, missing paths →
    * NULL instead of a per-row error). The `$.missing` probe pins the
    * absent-path-is-NULL semantics the string-JSON q26c can't express
    * without a schema. */
  val q26d = Q(
    "q26d_variant",
    (s, d) =>
      events(s, d)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
          expr("variant_get(parse_json(props), '$.missing', 'string')").as("missing"))
        .filter(col("k").between(20, 40))
        .orderBy(col("event_id"))
        .limit(200),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           |       CAST(NULL AS VARCHAR) AS missing
           |FROM events
           |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) BETWEEN 20 AND 40
           |ORDER BY event_id LIMIT 200""".stripMargin))

  // --- TPC-H hard shapes (q83–q87): the decorrelation/anti-join-heavy ---
  // --- queries, adapted to the generator's reduced column set.        ---

  /** TPC-H Q13 (customer order-count distribution). Spark-first shape:
    * pre-aggregate orders per custkey BEFORE the outer join (map-side
    * combine shrinks the shuffle to partial counts; the canonical
    * left-join-then-group the oracle runs shuffles every orders row
    * keyed by custkey), then left-join customer and coalesce the gap
    * rows to zero. The second aggregation's domain is |distinct order
    * counts| — trivially small at any scale. */
  val q83 = Q(
    "q83_tpch_q13",
    (s, d) => {
      val perCust = orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      customer(s, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist
           |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
           |      FROM customer LEFT JOIN orders
           |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           |      GROUP BY c_custkey) c_orders
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** TPC-H Q17 (small-quantity-order revenue). The correlated scalar
    * subquery (per-part average quantity) runs as ONE lineitem pass:
    * broadcast the brand-filtered part keys into the scan, then a
    * window over `l_partkey` computes the per-part average on the
    * surviving rows only — no self-join, no second scan, and the
    * window's shuffle carries just the brand's sliver of lineitem.
    * Exact-decimal sum / count keeps the 0.2·avg threshold bit-identical
    * to the oracle's arithmetic. */
  val q84 = Q(
    "q84_tpch_q17",
    (s, d) => {
      val brandParts = part(s, d)
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      lineitem(s, d)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty",
          sum(dec2(col("l_quantity"))).over(w).cast(DoubleType) / count(lit(1)).over(w))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum2(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
           |FROM lineitem l JOIN part ON p_partkey = l_partkey
           |WHERE p_brand = 'Brand#23'
           |  AND l_quantity < 0.2 * (
           |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin))

  /** TPC-H Q18 (large-volume customers). The IN-subquery over a grouped
    * HAVING is folded into the driving aggregation: ONE lineitem
    * aggregation produces both the filter (sum_qty > 300) and the
    * output measure, so lineitem is scanned and shuffled once —
    * the canonical form the oracle runs aggregates lineitem twice.
    * The filtered per-order rows (~0.3% of orders) then join orders
    * and customer; AQE broadcasts the shrunken side. */
  val q85 = Q(
    "q85_tpch_q18",
    (s, d) => {
      val bigOrders = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum2(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      bigOrders
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          dayStr(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH per_order AS (
           |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           |  FROM lineitem GROUP BY l_orderkey
           |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0)
           |SELECT c_name, c_custkey, o_orderkey,
           |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
           |       o_totalprice, sum_qty
           |FROM per_order JOIN orders ON o_orderkey = l_orderkey
           |               JOIN customer ON c_custkey = o_custkey
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin))

  /** TPC-H Q21 shape (suppliers who kept orders waiting), adapted to the
    * generator's columns (`l_returnflag = 'R'` stands in for the
    * receipt-after-commit predicate). The two correlated subqueries
    * (EXISTS another supplier in the order / NOT EXISTS another supplier
    * with a returned line) collapse into ONE per-order aggregation —
    * `n_supp > 1 AND n_r_supp = 1` is exactly "someone else is in the
    * order and every returned line is mine" — so lineitem is aggregated
    * once instead of being self-joined twice. The one-nation supplier
    * sliver is broadcast. */
  val q86 = Q(
    "q86_tpch_q21",
    (s, d) => {
      // two-level distinct: (order, supplier) partial rows first, then the
      // per-order counts — map-side combine collapses each task's repeats,
      // where the twin-countDistinct form Expands every fact row ×2
      val perOrder = lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_r_supp"))
        .filter(col("n_supp") > 1 && col("n_r_supp") === 1)
        .select(col("l_orderkey").as("qual_orderkey"))
      val natSupp = supplier(s, d)
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_7")
        .select(col("s_suppkey"), col("s_name"))
      lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(perOrder, col("l_orderkey") === col("qual_orderkey"))
        .join(orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""SELECT s_name, COUNT(*) AS numwait
           |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
           |     JOIN orders ON o_orderkey = l1.l_orderkey
           |     JOIN nation ON s_nationkey = n_nationkey
           |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_7'
           |  AND EXISTS (SELECT 1 FROM lineitem l2
           |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
           |                  WHERE l3.l_orderkey = l1.l_orderkey
           |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin))

  /** TPC-H Q22 shape (dormant high-balance customers; the customer-name
    * digit prefix stands in for the phone country code; "dormant" =
    * no order above 250k, so the result is non-empty at every SF). The
    * scalar average lands as a one-row broadcast cross join (no driver
    * collect), the dormancy predicate is a left-anti join that needs no
    * distinct on the probe side, and the exact-decimal average keeps
    * the threshold comparison engine-identical. */
  val q87 = Q(
    "q87_tpch_q22",
    (s, d) => {
      val avgBal = customer(s, d)
        .filter(col("c_acctbal") > 0.0)
        .agg(davg2(col("c_acctbal")).as("avg_bal"))
      customer(s, d)
        .join(
          orders(s, d).filter(col("o_totalprice") > 250000.0).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select(substring(col("c_name"), 10, 2).as("cntrycode"), col("c_acctbal"))
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum2(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    },
    Some("""SELECT substring(c_name, 10, 2) AS cntrycode, COUNT(*) AS numcust,
           |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
           |FROM customer
           |WHERE c_acctbal > (
           |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           |    FROM customer WHERE c_acctbal > 0.0)
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
           |GROUP BY cntrycode
           |ORDER BY cntrycode""".stripMargin))

  val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q13b,
    q14, q14b, q15, q16, q16b, q17, q17b, q18, q19, q20, q20b, q21, q21b, q22,
    q22b, q23, q23b, q24, q25, q26, q26b, q26c, q26d, q27, q27b, q27c, q31, q31b, q32, q32b, q33, q34,
    q34b, q35, q36, q36b, q39, q50, q51, q52, q52b, q52c, q54, q69,
    q83, q84, q85, q86, q87, q111, q112, q113, q114, q115, q116, q117,
    q118, q119, q120, q121, q122, q123, q124, q126, q128, q129)
}
