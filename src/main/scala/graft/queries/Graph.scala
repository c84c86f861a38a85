package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Graph analytics over fixture-derived graphs: integer-exact PageRank.
  * Complements the distributed connected components in
  * [[graft.pipeline.Dedup]] (d11) — together the two cover the graph
  * shapes a curation stack actually runs: CC for dedup group closure,
  * PageRank for source/domain authority weighting (the CommonCrawl
  * practice of mixing by harmonic-centrality/rank tiers).
  */
object Graph {

  /** Integer PageRank: `iters` unrolled power iterations in EXACT BIGINT
    * arithmetic. Ranks start at 10⁶ micro-PR per node; one step is
    *
    *   r'(v) = (1−d)·10⁶ + Σ_{u→v} (r(u)·7) div (8·deg(u))
    *
    * with dyadic damping d = 7/8 ((1−d)·10⁶ = 125000 exactly) and
    * truncating integer division — so every intermediate is a BIGINT,
    * the per-node sum is order-free, and two engines can replay the
    * recurrence bit-for-bit (the float formulation would need a
    * sorted-fold per node per iteration; the integer contract is what
    * makes PageRank GATEABLE). The div truncation leaks ≤ 8·deg−1
    * micro-units of mass per edge per step — a sub-0.01% perturbation
    * that is part of the operator's stated contract, not noise.
    * Dangling nodes (no out-edges) keep receiving but stop forwarding,
    * the standard mass-sink simplification.
    *
    * `edges` is a directed (src, dst) edge list; `nodes` the node
    * universe (nodes without edges still rank: they hold the 125000
    * base). Returns (id, deg_out, then one `pr<i>` column per
    * iteration).
    *
    * 100 TB shape: each iteration is one src-keyed equi-join of the
    * edge list against the (small) rank table plus one dst-keyed
    * integer-sum shuffle — the classic edge-partitioned power-iteration
    * layout; nothing ever materializes per-node adjacency in memory.
    * The rank/degree tables are node-cardinality (≪ edges) and carry no
    * broadcast hint so AQE broadcasts them exactly when they fit. */
  def pageRankInt(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"unrolled power iteration wants 1..8 iterations, got $iters")
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("dg"))
    val n0 = nodes.select(col("id")).distinct()
      .withColumn("pr0", lit(1000000L))
    val ranked = (1 to iters).foldLeft(n0) { case (r, i) =>
      val contrib = e
        .join(r.select(col("id").as("src"), col(s"pr${i - 1}").as("pr")),
          "src")
        .join(deg, "src")
        .select(col("dst"),
          expr("(pr * 7) div (8 * dg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
      r.join(contrib, r("id") === contrib("dst"), "left")
        .withColumn(s"pr$i", lit(125000L) + coalesce(col("m"), lit(0L)))
        .drop("dst", "m")
    }
    ranked
      .join(deg, ranked("id") === deg("src"), "left")
      .withColumn("deg_out", coalesce(col("dg"), lit(0L)))
      .drop("src", "dg")
  }

  /** Co-occurrence edge derivation over the events fixture: users active
    * in the same (hour, event_type) bucket are linked both ways. The
    * self-join is keyed on the bucket, so cost is Σ k_b² over bucket
    * sizes — bounded by the bucket grain, never corpus-quadratic; the
    * DISTINCT collapses repeat co-occurrence. */
  def userCoEdges(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("event_type"))
      .distinct()
    ev.as("a").join(ev.as("b"),
        col("a.h") === col("b.h") &&
          col("a.event_type") === col("b.event_type") &&
          col("a.user_id") =!= col("b.user_id"))
      .select(col("a.user_id").as("src"), col("b.user_id").as("dst"))
      .distinct()
  }
}

/** Gate queries for the graph family. */
object GraphQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ---- q51: integer PageRank over the user co-occurrence graph, two
  // unrolled power iterations, top-20 by final rank. Every number is a
  // BIGINT by construction (dyadic 7/8 damping + truncating div), so
  // the oracle replays the recurrence exactly — including the stated
  // truncation-leak contract. DuckDB SUM(BIGINT)→HUGEINT casts back
  // (the d33 precedent). The gate runs a deterministic user subset
  // (id % 2 — co-occurrence edges grow quadratically in bucket density,
  // so the half-user graph is a quarter the edges; the FULL graph and
  // both scaling axes are measured in BASELINE.md's graph probe). ----
  private def q51(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") % 2 === 0)
    Graph.pageRankInt(Graph.userCoEdges(ev),
        ev.select(col("user_id").as("id")), iters = 2)
      .select(col("id").as("user_id"), col("deg_out"),
        col("pr1"), col("pr2"))
      .orderBy(col("pr2").desc, col("user_id"))
      .limit(20)
  }

  private val q51Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
      |  FROM events WHERE user_id % 2 = 0),
      |nodes AS (SELECT DISTINCT user_id AS id FROM events
      |  WHERE user_id % 2 = 0),
      |e AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id <> b.user_id),
      |deg AS (SELECT src, COUNT(*) AS dg FROM e GROUP BY src),
      |r1 AS (
      |  SELECT n.id, 125000 + COALESCE(s.m, 0) AS pr1
      |  FROM nodes n LEFT JOIN (
      |    SELECT e.dst AS id,
      |      CAST(SUM((1000000 * 7) // (8 * deg.dg)) AS BIGINT) AS m
      |    FROM e JOIN deg USING (src) GROUP BY e.dst) s USING (id)),
      |r2 AS (
      |  SELECT n.id, 125000 + COALESCE(s.m, 0) AS pr2
      |  FROM nodes n LEFT JOIN (
      |    SELECT e.dst AS id,
      |      CAST(SUM((r1.pr1 * 7) // (8 * deg.dg)) AS BIGINT) AS m
      |    FROM e JOIN deg USING (src) JOIN r1 ON r1.id = e.src
      |    GROUP BY e.dst) s USING (id))
      |SELECT n.id AS user_id, COALESCE(deg.dg, 0) AS deg_out,
      |  r1.pr1, r2.pr2
      |FROM nodes n
      |  LEFT JOIN deg ON deg.src = n.id
      |  JOIN r1 ON r1.id = n.id
      |  JOIN r2 ON r2.id = n.id
      |ORDER BY r2.pr2 DESC, n.id LIMIT 20""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q51_pagerank", q51, Some(q51Oracle)))
}
