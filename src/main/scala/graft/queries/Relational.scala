package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Relational operator surface over the TPC-H-ish fixtures (SURVEY §2b).
  *
  * Oracle-parity rules (SURVEY §5.2): deterministic ORDER BY on a unique key
  * suffix, every computed column aliased identically on both sides, money
  * aggregates summed as DECIMAL(18,2) (exact in both engines — double sums
  * would accumulate in engine-specific order), averages/ratios as a single
  * IEEE double division (deterministic given exact operands).
  *
  * Scale notes per query are inline; dimension joins broadcast explicitly.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sums must NOT appear in final output: the driver gate
    * stringifies cells after pandas (Decimal('1.40')) vs duckdb .df()
    * (float 1.4) reads, so numerically-equal decimals hash-mismatch.
    * Emit the exact value as a scaled BIGINT instead (x100 = cents for
    * scale-2, x10000 for scale-4) — integral, identical repr on both
    * read paths, and order-preserving for sorts/top-k. */
  private def cents(c: Column): Column = (c * 100).cast("long")
  private def e4(c: Column): Column = (c * 10000).cast("long")

  // ---- q1: grouped aggregation (TPC-H Q1 shape). Partial+final hash agg;
  // one shuffle on the 6-value group key. ----
  private def q1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        cents(sum(dec2(col("l_extendedprice")))).as("sum_base_price_cents"),
        e4(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
          .as("sum_disc_price_e4"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Oracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price_cents,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_disc_price_e4,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- q2: selective filter + global agg (TPC-H Q6 shape). Predicates push
  // to the parquet scan; no shuffle beyond the single-row final agg. ----
  private def q2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        e4(sum(dec4(col("l_extendedprice") * col("l_discount"))))
          .as("revenue_e4"),
        count(lit(1)).as("n_rows"))

  private val q2Oracle =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---- q3: 3-way join + agg + top-k (TPC-H Q3 shape). customer is the
  // small side → broadcast; lineitem⋈orders shuffles on orderkey. Top-k via
  // TakeOrderedAndProject (no global sort materialization). ----
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(e4(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
        .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Oracle =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin

  // ---- q4: star join through broadcast dims (TPC-H Q5 shape): fact
  // lineitem joins supplier→nation→region, all broadcast — a single
  // shuffle-free map-side join chain, then one agg shuffle on n_name. ----
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val dims = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"), col("r_name"))
    t(s, dir, "lineitem")
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        e4(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
          .as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  private val q4Oracle =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---- q5: semi/anti joins (EXISTS / NOT EXISTS). ----
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val without = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("no_orders"))
    val withO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("with_orders"))
    without.unionByName(withO)
      .select("kind", "c_nationkey", "n")
      .orderBy("kind", "c_nationkey")
  }

  private val q5Oracle =
    """SELECT * FROM (
      |  SELECT 'no_orders' AS kind, c_nationkey, COUNT(*) AS n
      |  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_nationkey
      |  UNION ALL
      |  SELECT 'with_orders' AS kind, c_nationkey, COUNT(*) AS n
      |  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_nationkey)
      |ORDER BY kind, c_nationkey""".stripMargin

  // ---- q6: per-group top-k via ranking window (row_number + filter →
  // Spark plans a WindowGroupLimit, pruning before the full sort). ----
  private def q6(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  private val q6Oracle =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---- q7: analytic window functions — running sum frame + lag delta. ----
  private def q7(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        cents(sum(dec2(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("running_total_cents"),
        cents(lag(dec2(col("o_totalprice")), 1).over(w)).as("prev_price_cents"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val q7Oracle =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w * 100 AS BIGINT) AS running_total_cents,
      |  CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w * 100 AS BIGINT) AS prev_price_cents,
      |  LEAD(o_orderkey, 1) OVER w AS next_order
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---- q8: set operations. ----
  private def q8(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val auto = cust.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    val rich = cust.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    auto.intersect(rich).withColumn("op", lit("both"))
      .unionByName(auto.except(rich).withColumn("op", lit("auto_only")))
      .unionByName(rich.except(auto).withColumn("op", lit("rich_only")))
      .select("op", "c_custkey")
      .orderBy("op", "c_custkey")
  }

  private val q8Oracle =
    """SELECT * FROM (
      |  SELECT 'both' AS op, c_custkey FROM
      |    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |     INTERSECT
      |     SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |  UNION ALL
      |  SELECT 'auto_only' AS op, c_custkey FROM
      |    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |     EXCEPT
      |     SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |  UNION ALL
      |  SELECT 'rich_only' AS op, c_custkey FROM
      |    (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |     EXCEPT
      |     SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'))
      |ORDER BY op, c_custkey""".stripMargin

  // ---- q9: ROLLUP (multi-grain in one pass — generalizes the reference's
  // minute/hour/day fan-out, SURVEY §2b). NULL grouping keys are coalesced to
  // a sentinel so null-ordering dialects can't diverge. ----
  private def q9(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        cents(sum(dec2(col("o_totalprice")))).as("total_cents"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("n"), col("total_cents"))
      .orderBy("o_orderpriority", "o_orderstatus")

  private val q9Oracle =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
      |  COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
      |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  // ---- q10: CUBE. ----
  private def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n"), col("qty"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q10Oracle =
    """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
      |  COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- q11: distinct aggregation. ----
  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderpriority")).as("n_prios"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  private val q11Oracle =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(DISTINCT o_orderpriority) AS n_prios, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- q12: global top-k (TakeOrderedAndProject — no full sort shuffle). ----
  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  private val q12Oracle =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---- q13: conditional expressions (CASE WHEN / coalesce / nullif). ----
  private def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("low_line_count"),
        cents(sum(when(col("o_totalprice") > 100000.0, dec2(col("o_totalprice")))
          .otherwise(dec2(lit(0))))).as("big_total_cents"),
        count(nullif(col("o_orderpriority"), lit("3-MEDIUM"))).as("non_medium"),
        coalesce(min(when(col("o_totalprice") > 1e9, col("o_orderkey"))),
          lit(-1L)).as("first_huge"))
      .orderBy("o_orderstatus")

  private val q13Oracle =
    """SELECT o_orderstatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
      |  CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN CAST(o_totalprice AS DECIMAL(18,2))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS big_total_cents,
      |  COUNT(NULLIF(o_orderpriority, '3-MEDIUM')) AS non_medium,
      |  COALESCE(MIN(CASE WHEN o_totalprice > 1e9 THEN o_orderkey END), -1) AS first_huge
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- q14: string functions (concat/substr/lower/upper/trim/regexp/like). ----
  private def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").like("%widget%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("int").as("brand_num"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        concat(col("p_type"), lit("/"), col("p_brand")).as("type_brand"))
      .orderBy("p_partkey")

  private val q14Oracle =
    """SELECT p_partkey, UPPER(p_name) AS name_upper,
      |  SUBSTR(p_name, 1, 5) AS name_pfx,
      |  CAST(LENGTH(p_name) AS INT) AS name_len,
      |  CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INT) AS brand_num,
      |  split_part(p_name, ' ', 1) AS first_word,
      |  p_type || '/' || p_brand AS type_brand
      |FROM part WHERE p_name LIKE '%widget%' ORDER BY p_partkey""".stripMargin

  // ---- q15: date/time functions (date_trunc ← R7-R9, date_format ← R10,
  // extract). ----
  private def q15(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        date_trunc("month", col("o_orderdate")).as("month"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n"),
        cents(sum(dec2(col("o_totalprice")))).as("total_cents"))
      .orderBy("month")

  private val q15Oracle =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
      |  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
      |FROM orders GROUP BY 1, 2, 3 ORDER BY month""".stripMargin

  // ---- q16: JSON extraction over events.props (get_json_object). ----
  private def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  private val q16Oracle =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q17: global scalar aggregates + exact percentile (DuckDB
  // quantile_cont ≡ Spark percentile, both continuous interpolation). ----
  private def q17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(
        count(lit(1)).as("n"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))

  private val q17Oracle =
    """SELECT COUNT(*) AS n, MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
      |  ROUND(AVG(l_quantity), 6) AS avg_qty,
      |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
      |FROM lineitem""".stripMargin

  // ---- q18: as-of join (nearest order at-or-before each event, per
  // customer). Spark has no asof join for static frames; the scalable
  // pattern is union + last(ignoreNulls) over a time-ordered window —
  // one shuffle on the key, no range-join explosion (SURVEY §2b). ----
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id").as("k"), col("ts"),
        col("event_id"), lit(1).as("is_event"))
    // dedup order side: one row per (custkey, orderdate) — max orderkey wins,
    // making the as-of target unique (ASOF JOIN ties are ambiguous).
    val ord = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("ts"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"))
      .select(col("k"), col("ts"), lit(null).cast("long").as("event_id"),
        lit(0).as("is_event"), col("asof_orderkey"))
    val unioned = ev.withColumn("asof_orderkey", lit(null).cast("long"))
      .select("k", "ts", "event_id", "is_event", "asof_orderkey")
      .unionByName(ord)
    // order rows sort before events at the same ts (is_event asc) so an
    // event at exactly the order timestamp matches it (>= semantics).
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("matched", last(col("asof_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("ts"),
        col("matched").as("asof_orderkey"))
      .orderBy("event_id")
  }

  private val q18Oracle =
    """SELECT e.event_id, e.user_id, e.ts, o.asof_orderkey
      |FROM events e ASOF LEFT JOIN
      |  (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS asof_orderkey
      |   FROM orders GROUP BY 1, 2) o
      |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY event_id""".stripMargin

  // ---- q19: ranking family (rank / dense_rank / ntile / percent_rank). ----
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    t(s, dir, "supplier")
      .select(
        col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy("s_nationkey", "rnk", "s_suppkey")
  }

  private val q19Oracle =
    """SELECT s_nationkey, s_suppkey, s_acctbal,
      |  RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
      |ORDER BY s_nationkey, rnk, s_suppkey""".stripMargin

  // ---- q20: correlated scalar subquery shape — customers above their
  // nation's average balance. Spark: aggregate + broadcast join back. ----
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val natAvg = cust.groupBy(col("c_nationkey").as("nk"))
      .agg(avg(col("c_acctbal")).as("nation_avg"))
    cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        round(col("nation_avg"), 6).as("nation_avg"))
      .orderBy("c_custkey")
  }

  private val q20Oracle =
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  ROUND(nation_avg, 6) AS nation_avg
      |FROM (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |    AVG(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
      |  FROM customer)
      |WHERE c_acctbal > nation_avg ORDER BY c_custkey""".stripMargin

  // ---- q21: the SQL entry point — identical text through spark.sql over
  // registered temp views (SURVEY §3.4 path 2). ----
  private val q21Sql =
    """SELECT n_name, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_bal_cents
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  private def q21(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q21Sql)
  }

  def all: Seq[QueryDef] = Seq(
    QueryDef("q1_agg", q1, Some(q1Oracle)),
    QueryDef("q2_selective_filter", q2, Some(q2Oracle)),
    QueryDef("q3_join_topk", q3, Some(q3Oracle)),
    QueryDef("q4_star_broadcast", q4, Some(q4Oracle)),
    QueryDef("q5_semi_anti", q5, Some(q5Oracle)),
    QueryDef("q6_window_topk", q6, Some(q6Oracle)),
    QueryDef("q7_window_running", q7, Some(q7Oracle)),
    QueryDef("q8_setops", q8, Some(q8Oracle)),
    QueryDef("q9_rollup", q9, Some(q9Oracle)),
    QueryDef("q10_cube", q10, Some(q10Oracle)),
    QueryDef("q11_distinct", q11, Some(q11Oracle)),
    QueryDef("q12_topk_global", q12, Some(q12Oracle)),
    QueryDef("q13_conditional", q13, Some(q13Oracle)),
    QueryDef("q14_strings", q14, Some(q14Oracle)),
    QueryDef("q15_datetime", q15, Some(q15Oracle)),
    QueryDef("q16_json", q16, Some(q16Oracle)),
    QueryDef("q17_scalar_stats", q17, Some(q17Oracle)),
    QueryDef("q18_asof_join", q18, Some(q18Oracle)),
    QueryDef("q19_ranking", q19, Some(q19Oracle)),
    QueryDef("q20_correlated_avg", q20, Some(q20Oracle)),
    QueryDef("q21_sql_entry", q21, Some(q21Sql)))
}
