package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.KahanSum

/** Second relational batch: array aggregation, non-equi (range) joins, map
  * / JSON functions, multiset set-ops, approximate distinct, and the typed
  * custom Aggregator — completing the SURVEY §2b inventory. */
object Relational2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---- q22: collect_list + sort_array (deterministic array agg) + array
  // functions. The verified output projects the list through array_join —
  // a raw ARRAY column crashes the gate's pandas row-sort (unhashable
  // numpy.ndarray); the array ops themselves stay in the query body. ----
  private def q22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sort_array(collect_list(col("s_name"))).as("suppliers"))
      .select(col("n_name"),
        array_join(col("suppliers"), ",").as("suppliers"),
        size(col("suppliers")).as("n_supp"),
        element_at(col("suppliers"), 1).as("first_supp"))
      .orderBy("n_name")

  private val q22Oracle =
    """SELECT n_name, array_to_string(list_sort(list(s_name)), ',') AS suppliers,
      |  CAST(len(list(s_name)) AS INT) AS n_supp,
      |  list_sort(list(s_name))[1] AS first_supp
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---- q23: non-equi range join against a small in-memory band dim —
  // broadcast nested-loop, the correct plan when one side is tiny. ----
  private def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("low", 0.0, 20000.0), ("mid", 20000.0, 50000.0),
      ("high", 50000.0, 1e9))
      .toDF("band", "lo", "hi")
    t(s, dir, "lineitem")
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("qty"))
      .orderBy("band")
  }

  private val q23Oracle =
    """SELECT band, COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS qty
      |FROM lineitem
      |JOIN (VALUES ('low', 0.0, 20000.0), ('mid', 20000.0, 50000.0),
      |             ('high', 50000.0, 1e9)) b(band, lo, hi)
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // ---- q24: JSON → typed map, map functions. ----
  private def q24(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("m",
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)))
      .select(col("event_id"),
        map_keys(col("m")).as("ks"),
        element_at(col("m"), "k").as("k_val"))
      .select(col("event_id"), size(col("ks")).as("n_keys"),
        element_at(col("ks"), 1).as("first_key"), col("k_val"))
      .orderBy("event_id")

  private val q24Oracle =
    """SELECT event_id, CAST(1 AS INT) AS n_keys, 'k' AS first_key,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  // ---- q25: multiset set operations (unionAll / intersectAll /
  // exceptAll — bag semantics, unlike q8's distinct variants). ----
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val a = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val b = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val mk = (name: String, df: DataFrame) =>
      df.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit(name))
    mk("union_all", a.unionAll(b))
      .unionByName(mk("intersect_all", a.intersectAll(b)))
      .unionByName(mk("except_all", a.exceptAll(b)))
      .select("op", "o_custkey", "n")
      .orderBy("op", "o_custkey")
  }

  private val q25Oracle =
    """SELECT op, o_custkey, n FROM (
      |  SELECT 'union_all' AS op, o_custkey, COUNT(*) AS n FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    UNION ALL
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |  GROUP BY o_custkey
      |  UNION ALL
      |  SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS n FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    INTERSECT ALL
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |  GROUP BY o_custkey
      |  UNION ALL
      |  SELECT 'except_all' AS op, o_custkey, COUNT(*) AS n FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    EXCEPT ALL
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |  GROUP BY o_custkey)
      |ORDER BY op, o_custkey""".stripMargin

  // ---- q26: typed custom Aggregator (Kahan compensated sum) registered
  // as a udaf. Summing integral doubles → exact, so the DuckDB plain SUM
  // oracle matches bit-for-bit. ----
  private def q26(s: SparkSession, dir: String): DataFrame = {
    val kahan = udaf(KahanSum)
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(kahan(col("l_quantity")).cast("long").as("kahan_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val q26Oracle =
    """SELECT l_returnflag, CAST(SUM(l_quantity) AS BIGINT) AS kahan_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q27: approximate distinct (HLL++). The sketch value itself is not
  // oracle-comparable, so the verified contract is: the exact count plus a
  // Spark-computed boolean asserting the sketch landed within HLL++'s
  // documented 5% envelope; the oracle emits the exact count and literal
  // TRUE. A sketch drifting out of tolerance turns the gate red. ----
  private def q27(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        // rsd=0.01 → the 5% tolerance is a 5-sigma envelope (the default
        // 0.05 rsd lands outside 5% for ~1/3 of groups); ~10 KB/sketch.
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders")) <=
          col("exact_orders") * 0.05).as("approx_within_5pct"))
      .orderBy("l_returnflag")

  private val q27Oracle =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  TRUE AS approx_within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q28: table-generating surface (explode ≡ UNNEST) — one row per
  // word of every part name, aggregated back. ----
  private def q28(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy("word")

  private val q28Oracle =
    """SELECT word, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      |GROUP BY word ORDER BY word""".stripMargin

  // ---- q29: PIVOT (conditional cross-tab aggregation). Explicit value list
  // so the plan is a single pass — no extra distinct-values job; quantities
  // as decimal so both engines sum exactly. ----
  private def q29(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")))
      .select(col("l_linestatus"),
        (col("A") * 100).cast("long").as("a_centi"),
        (col("N") * 100).cast("long").as("n_centi"),
        (col("R") * 100).cast("long").as("r_centi"))
      .orderBy("l_linestatus")

  private val q29Oracle =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS a_centi,
      |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS n_centi,
      |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS r_centi
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ---- q30: correlated LATERAL subquery with per-row LIMIT (top-2
  // suppliers per nation) — the lateral-join surface; Catalyst decorrelates
  // it to a ranked window rather than re-running the inner query per row. ----
  private def q30(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("nation")
    t(s, dir, "supplier").createOrReplaceTempView("supplier")
    s.sql("""
      SELECT n_name, s_name, s_acctbal FROM nation,
      LATERAL (SELECT s_name, s_acctbal FROM supplier
               WHERE s_nationkey = n_nationkey
               ORDER BY s_acctbal DESC, s_name LIMIT 2)
      ORDER BY n_name, s_acctbal DESC, s_name""")
  }

  private val q30Oracle =
    """SELECT n_name, s_name, s_acctbal FROM nation,
      |LATERAL (SELECT s_name, s_acctbal FROM supplier
      |         WHERE s_nationkey = n_nationkey
      |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
      |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin

  // ---- q31: time-RANGE window frame — trailing-hour sum/count per user
  // (the "moving average over a time window" surface; rowsBetween is q7).
  // Frame bounds in exact integer MICROSECONDS on both engines: a float
  // epoch would round differently at frame boundaries. ----
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000, 0)
    t(s, dir, "events").select(
      col("event_id"), col("user_id"), col("ts"),
      (sum(col("value").cast("decimal(18,2)")).over(w) * 100).cast("long")
        .as("hr_sum_cents"),
      count(lit(1)).over(w).cast("int").as("hr_n"))
      .orderBy("event_id")
  }

  private val q31Oracle =
    """SELECT event_id, user_id, ts,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w * 100 AS BIGINT) AS hr_sum_cents,
      |  CAST(COUNT(*) OVER w AS INT) AS hr_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---- q32: explicit GROUPING SETS with grouping_id — the general form
  // of q9's ROLLUP / q10's CUBE (custom grain combinations in one pass). ----
  private def q32(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                              (o_orderstatus), ())
      ORDER BY gid, o_orderstatus, o_orderpriority""")
  }

  private val q32Oracle =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), ())
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  // ---- q33: UNPIVOT (wide → long) via stack(): the inverse of q29's
  // pivot, one generator pass, no shuffle before the final sort. ----
  private def q33(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("""stack(3,
          'extended', CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
          'discount', CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
          'tax',      CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)) AS (measure, amount_cents)"""))
      .filter(col("l_orderkey") < 100)
      .orderBy("l_orderkey", "l_linenumber", "measure")

  private val q33Oracle =
    """SELECT l_orderkey, l_linenumber, measure, amount_cents FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    'extended' AS measure,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS amount_cents
      |  FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'discount',
      |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'tax',
      |    CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) FROM lineitem)
      |WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  // ---- q34: schema-parsed JSON (from_json → struct AND map) — the typed
  // complement of q16's path extraction; json_tuple for the multi-field
  // string form. ----
  private def q34(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        from_json(col("props"), "k INT", Map.empty[String, String])
          .getField("k").as("k_struct"),
        element_at(
          from_json(col("props"), "map<string,int>", Map.empty[String, String]),
          "k").as("k_map"),
        json_tuple(col("props"), "k").as("k_str"))
      .orderBy("event_id")

  private val q34Oracle =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_map,
      |  json_extract_string(props, '$.k') AS k_str
      |FROM events ORDER BY event_id""".stripMargin

  // ---- q35: partition-local sort (sortWithinPartitions) — the write-
  // layout clustering surface. One hash shuffle + local sort instead of a
  // global range sort (plan shape asserted in PlanSpec; partition-level
  // sortedness asserted in ClusteringSpec). Output CONTENT is
  // partitioning-invariant, which is what the gate hash-checks. ----
  private def q35(s: SparkSession, dir: String): DataFrame =
    graft.operators.Clustering.clusterForScan(
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_shipdate")),
      partCols = Seq("l_returnflag"),
      sortCols = Seq("l_returnflag", "l_shipdate", "l_orderkey",
        "l_linenumber"))

  private val q35Oracle =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
      |FROM lineitem WHERE l_orderkey < 500""".stripMargin

  // ---- q36: window-function completion — cume_dist (distribution rank),
  // nth_value / first_value / last_value under explicit ROWS frames with a
  // fully deterministic ORDER BY. cume_dist is an exact-integer ratio
  // (rows ≤ key / rows), a single double division — bit-stable across
  // engines; nth_value's leading NULLs are coalesced to -1 so the output
  // stays integral (NULL→NaN column promotion hashes unreliably). ----
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val wCume = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"))
    val wRun = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTail = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity").cast("long").as("qty"),
        round(cume_dist().over(wCume), 6).as("cume"),
        coalesce(nth_value(col("l_orderkey"), 2).over(wRun), lit(-1L))
          .as("second_seen"),
        first(col("l_orderkey")).over(wRun).as("first_key"),
        last(col("l_orderkey")).over(wTail).as("last_key"))
      .orderBy("l_returnflag", "qty", "l_orderkey", "l_linenumber")
  }

  private val q36Oracle =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |  CAST(l_quantity AS BIGINT) AS qty,
      |  ROUND(cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS cume,
      |  COALESCE(nth_value(l_orderkey, 2) OVER w, -1) AS second_seen,
      |  first_value(l_orderkey) OVER w AS first_key,
      |  last_value(l_orderkey) OVER (PARTITION BY l_returnflag
      |    ORDER BY l_quantity, l_orderkey, l_linenumber
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_key
      |FROM lineitem WHERE l_orderkey < 200
      |WINDOW w AS (PARTITION BY l_returnflag
      |  ORDER BY l_quantity, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_returnflag, qty, l_orderkey, l_linenumber""".stripMargin

  // ---- q37: MERGEABLE distinct-count sketches (Apache DataSketches HLL)
  // — the 100 TB pattern q27's one-shot approx_count_distinct can't do:
  // build small per-month sketches once, then answer the full-range
  // question by UNIONING sketches instead of rescanning raw data. Verified like
  // q27: exact count plus a Spark-computed boolean that the
  // union-of-monthly-sketches estimate lands within 5%; the oracle emits
  // the exact count and literal TRUE. ----
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = monthly.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
      count(lit(1)).as("n_sketches"))
    val exact = t(s, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("exact_customers"))
    exact.crossJoin(merged)
      .select(col("exact_customers"), col("n_sketches"),
        (abs(col("est") - col("exact_customers")) <=
          col("exact_customers") * 0.05).as("union_within_5pct"))
  }

  private val q37Oracle =
    """SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
      |  CAST(COUNT(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT) AS n_sketches,
      |  true AS union_within_5pct
      |FROM orders""".stripMargin

  // ---- q38: correlation/covariance statistics, certified EXACTLY: both
  // engines derive Pearson r from integer-exact moment sums (quantity is
  // integral, discount is cents) with the identical double formula — every
  // intermediate product < 2^53, so the result is bit-stable in a way
  // directly hashing corr()'s accumulation-order-dependent output can
  // never be. Spark's builtin corr() is certified alongside via a
  // tolerance boolean (oracle: literal TRUE). ----
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("long")
    val y = round(col("l_discount") * 100, 0).cast("long")
    def d(c: String): Column = col(c).cast("double")
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        corr(col("l_quantity"), round(col("l_discount") * 100, 0))
          .as("corr_builtin"))
      .select(col("l_returnflag"), col("n"),
        round((d("n") * d("sxy") - d("sx") * d("sy")) /
          (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
            sqrt(d("n") * d("syy") - d("sy") * d("sy"))), 6)
          .as("corr_moments"),
        (abs(col("corr_builtin") -
          (d("n") * d("sxy") - d("sx") * d("sy")) /
          (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
            sqrt(d("n") * d("syy") - d("sy") * d("sy")))) < 1e-6)
          .as("builtin_ok"))
      .orderBy("l_returnflag")
  }

  private val q38Oracle =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy,
      |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy,
      |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
      |    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_moments,
      |  true AS builtin_ok
      |FROM m ORDER BY l_returnflag""".stripMargin

  // ---- q39: approximate percentile (GK sketch) — the streaming/partial-
  // aggregatable complement of q17's exact percentile. Certified like
  // q27/q37: the exact interpolated percentile (already proven
  // bit-equal to DuckDB quantile_cont by q17) plus a Spark-computed
  // envelope boolean on the sketch; the oracle emits the exact value and
  // literal TRUE. Tolerance 2.0 on a 1..50-valued column is ~40× the
  // worst rank error at accuracy 1000 on sf0.1. ----
  private def q39(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
          .as("approx_p50"),
        expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        expr("percentile(l_quantity, 0.95)").as("exact_p95"))
      .select(col("l_returnflag"), col("exact_p50"), col("exact_p95"),
        (abs(col("approx_p50") - col("exact_p50")) <= 2.0)
          .as("approx_within_tol"))
      .orderBy("l_returnflag")

  private val q39Oracle =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS exact_p50,
      |  quantile_cont(l_quantity, 0.95) AS exact_p95,
      |  true AS approx_within_tol
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q40: bloom-pruned join — the runtime-filter operator certified
  // at the gate. The oracle is simply the PLAIN join: bloom false
  // positives only re-admit rows the join drops, so the pruned join must
  // hash-match it exactly; the pruning itself (map-side might_contain
  // before the exchange, no shuffle added) is asserted in BloomPruneSpec.
  // The dim is a selective orders slice (~3% of keys) — the shape where
  // fact-side shuffle reduction pays at 100 TB. ----
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "orders").filter(col("o_orderkey") % 37 === 0)
    graft.operators.BloomPrune.prunedJoin(
        t(s, dir, "lineitem"), dim, "l_orderkey", "o_orderkey",
        expectedItems = 100000)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
          .as("qty_e2"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q40Oracle =
    """SELECT l_orderkey, l_linenumber, o_custkey,
      |  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_e2
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderkey % 37 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- q41: Z-ORDER layout clustering — like q35 the CONTENT is
  // partitioning-invariant (that's what the gate hashes); what the
  // operator adds is the physical property: rows near in z-sequence are
  // near in BOTH ship-date and order-key, so parquet zone maps prune
  // range predicates on either column. Morton correctness and the 2×2
  // tile property are asserted in ClusteringSpec; one-exchange plan
  // shape in PlanSpec. ----
  private def q41(s: SparkSession, dir: String): DataFrame =
    graft.operators.Clustering.clusterZOrder(
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_shipdate")),
      partCols = Seq("l_returnflag"),
      dimA = datediff(col("l_shipdate"), lit("1992-01-01")),
      dimB = col("l_orderkey"), bits = 12)

  private val q41Oracle =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
      |FROM lineitem WHERE l_orderkey < 500""".stripMargin

  // ---- q53: FULL OUTER join — the one join type not yet under the gate
  // (equi/broadcast/semi/anti/range/as-of/cross are q3–q5, q23, q18, m1;
  // streaming left-outer is s13). The reconciliation-report shape: daily
  // order intake vs daily shipments, full-outer on the calendar day so
  // days with only intake, only shipments, or both all survive, with
  // presence flags taken BEFORE the COALESCE fill. Both sides pre-
  // aggregate to day grain first, so the outer join runs at day
  // cardinality — broadcastable, never a row-level outer shuffle. ----
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("ordered_cents"))
    val l = t(s, dir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("n_ship"),
        (sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("shipped_cents"))
    o.join(l, Seq("d"), "full_outer")
      .select(col("d"),
        col("n_orders").isNotNull.cast("long").as("has_orders"),
        col("n_ship").isNotNull.cast("long").as("has_ship"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("ordered_cents"), lit(0L)).as("ordered_cents"),
        coalesce(col("n_ship"), lit(0L)).as("n_ship"),
        coalesce(col("shipped_cents"), lit(0L)).as("shipped_cents"))
      .orderBy("d")
  }

  private val q53Oracle =
    """WITH o AS (
      |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS ordered_cents
      |  FROM orders GROUP BY 1),
      |l AS (
      |  SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, COUNT(*) AS n_ship,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS shipped_cents
      |  FROM lineitem GROUP BY 1)
      |SELECT COALESCE(o.d, l.d) AS d,
      |  (o.d IS NOT NULL)::BIGINT AS has_orders,
      |  (l.d IS NOT NULL)::BIGINT AS has_ship,
      |  COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(ordered_cents, 0) AS ordered_cents,
      |  COALESCE(n_ship, 0) AS n_ship,
      |  COALESCE(shipped_cents, 0) AS shipped_cents
      |FROM o FULL JOIN l ON o.d = l.d
      |ORDER BY d""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q53_full_outer", q53, Some(q53Oracle)),
    QueryDef("q41_zorder_layout", q41, Some(q41Oracle)),
    QueryDef("q40_bloom_pruned_join", q40, Some(q40Oracle)),
    QueryDef("q39_approx_percentile", q39, Some(q39Oracle)),
    QueryDef("q36_window_extras", q36, Some(q36Oracle)),
    QueryDef("q37_sketch_rollup", q37, Some(q37Oracle)),
    QueryDef("q38_corr_moments", q38, Some(q38Oracle)),
    QueryDef("q35_clustered_layout", q35, Some(q35Oracle)),
    QueryDef("q28_explode_words", q28, Some(q28Oracle)),
    QueryDef("q34_from_json", q34, Some(q34Oracle)),
    QueryDef("q33_unpivot", q33, Some(q33Oracle)),
    QueryDef("q32_grouping_sets", q32, Some(q32Oracle)),
    QueryDef("q31_range_frame", q31, Some(q31Oracle)),
    QueryDef("q29_pivot", q29, Some(q29Oracle)),
    QueryDef("q30_lateral_topn", q30, Some(q30Oracle)),
    QueryDef("q22_array_agg", q22, Some(q22Oracle)),
    QueryDef("q23_range_join", q23, Some(q23Oracle)),
    QueryDef("q24_map_functions", q24, Some(q24Oracle)),
    QueryDef("q25_multiset_ops", q25, Some(q25Oracle)),
    QueryDef("q26_typed_agg", q26, Some(q26Oracle)),
    QueryDef("q27_approx_distinct", q27, Some(q27Oracle)))
}
