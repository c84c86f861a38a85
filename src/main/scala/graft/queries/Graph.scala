package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{ObservedProbe, QueryDef, Tables}

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
  def pageRankInt(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame =
    // the unweighted face IS the w ≡ 1 special case (wt = deg exactly,
    // so the recurrence is bit-identical — spec-asserted); one shared
    // implementation keeps the exact-BIGINT contract in one place
    pageRankWeightedInt(
        edges.select(col("src"), col("dst")).withColumn("w", lit(1L)),
        nodes, iters)
      .withColumnRenamed("w_out", "deg_out")

  /** One integer power-iteration step (the [[pageRankInt]] recurrence):
    * src-keyed equi-join of the edges against the rank table, dst-keyed
    * exact BIGINT contribution sum, dyadic 7/8 damping with truncating
    * div. Input ranks in `prevCol`; output appends `outCol`. */
  private def prRound(e: DataFrame, deg: DataFrame, r: DataFrame,
      prevCol: String, outCol: String): DataFrame = {
    val contrib = e
      .join(r.select(col("id").as("src"), col(prevCol).as("pr")), "src")
      .join(deg, "src")
      .select(col("dst"),
        expr("(pr * 7) div (8 * dg)").as("c"))
      .groupBy("dst").agg(sum(col("c")).as("m"))
    r.join(contrib, r("id") === contrib("dst"), "left")
      .withColumn(outCol, lit(125000L) + coalesce(col("m"), lit(0L)))
      .drop("dst", "m")
  }

  /** WEIGHTED integer PageRank — [[pageRankInt]] over a weighted edge
    * list (src, dst, w): each step distributes a node's damped mass in
    * proportion to integer edge weights instead of uniformly,
    *
    *   r'(v) = 125000 + Σ_{u→v} (r(u)·7·w_uv) div (8·W_u),
    *
    * with W_u = Σ w over u's out-edges — the authority measure a
    * weighted co-occurrence/citation/domain-link multigraph actually
    * wants ([[userCoEdgesWeighted]] derives exactly that shape). At
    * w ≡ 1 the recurrence degenerates to [[pageRankInt]]'s
    * (spec-asserted), so the unweighted face is the special case, not
    * a sibling. Same exact-BIGINT gate contract: dyadic damping,
    * truncating div per edge (the leak is ≤ 8·W_u−1 micro-units per
    * edge per step, same stated contract), order-free integer sums —
    * r(u)·7·w stays 5 decades under BIGINT while total mass × max
    * weight < 10¹⁵. Returns (id, w_out, pr1..prN).
    *
    * Non-positive weights are DROPPED up front (a zero-weight edge
    * carries no mass by definition, and a negative weight has no
    * PageRank meaning) — without the filter a node whose weights sum
    * to zero would divide by zero, and non-ANSI Spark turns that into
    * a silently skipped null contribution rather than an error.
    *
    * 100 TB shape: identical to [[pageRankInt]] — one src-keyed
    * equi-join + one dst-keyed BIGINT sum per step, weight riding
    * along as one extra integer column; adjacency never materializes. */
  def pageRankWeightedInt(edges: DataFrame, nodes: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"unrolled power iteration wants 1..8 iterations, got $iters")
    val e = edges.select(col("src"), col("dst"), col("w"))
      .filter(col("w") > 0)
    val wout = e.groupBy("src").agg(sum(col("w")).as("wt"))
    val n0 = nodes.select(col("id")).distinct()
      .withColumn("pr0", lit(1000000L))
    val ranked = (1 to iters).foldLeft(n0) { case (r, i) =>
      val contrib = e
        .join(r.select(col("id").as("src"), col(s"pr${i - 1}").as("pr")),
          "src")
        .join(wout, "src")
        .select(col("dst"), expr("(pr * 7 * w) div (8 * wt)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
      r.join(contrib, r("id") === contrib("dst"), "left")
        .withColumn(s"pr$i", lit(125000L) + coalesce(col("m"), lit(0L)))
        .drop("dst", "m")
    }
    ranked
      .join(wout, ranked("id") === wout("src"), "left")
      .withColumn("w_out", coalesce(col("wt"), lit(0L)))
      .drop("src", "wt")
  }

  /** CONVERGENCE-DRIVEN integer PageRank — [[pageRankInt]]'s production
    * face: instead of a caller-guessed unroll depth, iterate the same
    * exact BIGINT recurrence until the rank vector reaches its integer
    * FIXPOINT (no node's rank changed — truncating arithmetic makes
    * exact equality a meaningful, reachable test, where a float residual
    * would need an epsilon) or `maxIters`, whichever first. Returns one
    * row per node: (id, deg_out, pr, iters_run, converged) with `pr`
    * the LAST computed iteration's rank.
    *
    * Capped-iteration semantics keep the operator GATEABLE: a converged
    * vector is stable under further steps (pr_i = pr_{i-1} implies
    * pr_{i+1} = pr_i), so the early exit NEVER changes the result an
    * exhaustive `maxIters`-step unroll would produce — an oracle replays
    * `maxIters` unrolled steps and matches whether or not convergence
    * happened, while `iters_run`/`converged` certify the detection
    * itself (first step whose output equals its input).
    *
    * Each step localCheckpoints its (node-cardinality) rank table —
    * lineage truncation so round N's plan doesn't replay rounds 1..N−1
    * (on a cluster: `checkpoint` to reliable storage) — and the
    * convergence probe (changed-row count) rides THAT job via
    * `Dataset.observe` ([[graft.ObservedProbe]], round 20): the
    * checkpoint scan sees every row anyway, so the probe costs no
    * scheduled job of its own. Production runs amortize further by
    * probing every few rounds (pass the budget via `maxIters` and
    * re-enter). The node universe is `nodes` ∪ edge endpoints, the
    * [[labelPropagate]] closure contract. */
  def pageRankFixpoint(edges: DataFrame, nodes: DataFrame,
      maxIters: Int): DataFrame = {
    require(maxIters >= 1 && maxIters <= 128,
      s"fixpoint iteration wants 1..128 max iterations, got $maxIters")
    // materialize the edge list ONCE: every iteration re-reads it, and
    // without this a derived edge plan (userCoEdges et al.) would be
    // recomputed per round — the same reason a cluster run persists its
    // edge RDD before power iteration. Freed by the session's
    // persistent-RDD sweep (Verify/Bench contract), like d52's pairs.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val seed = labelSeed(e, nodes).select(col("id"))
      .withColumn("pr", lit(1000000L))
    prLoopResult(e, seed, maxIters)
  }

  /** RE-ENTRY face of the capped-iteration contract — the "pass the
    * budget via maxIters and re-enter" sentence made mechanism: continue
    * power iteration from a PRIOR rank table `ranks` (id, pr) — e.g. a
    * previous run's output persisted at its budget — for up to
    * `maxIters` more steps. Because the recurrence is memoryless in
    * everything but the rank vector, a resumed run is IDENTICAL to one
    * longer run: fixpoint(a+b) ≡ resume(fixpoint-capped-at-a, b)
    * (spec-asserted at every cut). Endpoints missing from `ranks`
    * (edges that arrived since the checkpoint — the warm-start append
    * shape) enter at the 10⁶ base seed; iters_run counts only the
    * resumed steps. */
  def pageRankResume(edges: DataFrame, ranks: DataFrame,
      maxIters: Int): DataFrame = {
    require(maxIters >= 1 && maxIters <= 128,
      s"fixpoint iteration wants 1..128 max iterations, got $maxIters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val seed = labelSeed(e, ranks.select(col("id")))
      .join(ranks.select(col("id"), col("pr").as("prior")), Seq("id"), "left")
      .select(col("id"), coalesce(col("prior"), lit(1000000L)).as("pr"))
    prLoopResult(e, seed, maxIters)
  }

  private def prLoopResult(e: DataFrame, seed: DataFrame,
      maxIters: Int): DataFrame = {
    val deg = e.groupBy("src").agg(count(lit(1)).as("dg"))
      .localCheckpoint(true)
    var r = seed.localCheckpoint(true)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val prev = r
      // convergence probe FUSED into the round's one materialization job
      // (round 20, ObservedProbe): the changed-row count is observed
      // during the checkpoint scan instead of a second scheduled job per
      // round — same decision (count == 0 ⇔ the old limit(1).isEmpty)
      val (next, changed) = ObservedProbe.checkpointWithCount(
        prRound(e, deg, r, "pr", "nxt"),
        count(when(col("nxt") =!= col("pr"), lit(1))))(cp =>
        if (cp.filter(col("nxt") =!= col("pr")).limit(1).isEmpty) 0L else 1L)
      converged = changed == 0L
      iters += 1
      r = next.select(col("id"), col("nxt").as("pr"))
      prev.unpersist(blocking = false)
    }
    r.join(deg, r("id") === deg("src"), "left")
      .select(r("id"), coalesce(col("dg"), lit(0L)).as("deg_out"),
        col("pr"), lit(iters).as("iters_run"), lit(converged).as("converged"))
  }

  /** PERSONALIZED (seeded) integer PageRank — authority relative to a
    * trusted seed set, the curation practice of scoring a crawl's
    * domains by proximity to a hand-vetted whitelist (Gyöngyi et al.'s
    * TrustRank shape): teleport mass lands ONLY on seeds, so
    *
    *   r'(v) = [v ∈ S]·125000 + Σ_{u→v} (r(u)·7) div (8·deg(u)),
    *   r0(v) = [v ∈ S]·10⁶
    *
    * — [[pageRankInt]]'s recurrence with the uniform base replaced by a
    * seed indicator (unnormalized: scores are comparable within a run,
    * which is all a ranking needs, and dividing by |S| would break the
    * exact-BIGINT gate contract). Non-seed nodes score > 0 exactly when
    * they are reachable from a seed — distance-damped trust. Same
    * capped-fixpoint loop, checkpointing, probe, and (iters_run,
    * converged) contract as [[pageRankFixpoint]]; `seeds` is one id
    * column, and the output carries `is_seed`. */
  def pageRankSeeded(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
      maxIters: Int): DataFrame = {
    require(maxIters >= 1 && maxIters <= 128,
      s"fixpoint iteration wants 1..128 max iterations, got $maxIters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("dg"))
      .localCheckpoint(true)
    val sd = seeds.select(col("id")).distinct()
      .withColumn("sb", lit(true))
    val seeded = labelSeed(e, nodes).select(col("id"))
      .join(sd, Seq("id"), "left")
      .select(col("id"), coalesce(col("sb"), lit(false)).as("is_seed"))
    var r = seeded
      .withColumn("pr",
        when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)))
      .localCheckpoint(true)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val prev = r
      val contrib = e
        .join(r.select(col("id").as("src"), col("pr")), "src")
        .join(deg, "src")
        .select(col("dst"), expr("(pr * 7) div (8 * dg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
      // probe fused into the checkpoint job — see prLoopResult
      val (next, changed) = ObservedProbe.checkpointWithCount(
        r.join(contrib, r("id") === contrib("dst"), "left")
          .withColumn("nxt",
            when(col("is_seed"), lit(125000L)).otherwise(lit(0L)) +
              coalesce(col("m"), lit(0L)))
          .drop("dst", "m"),
        count(when(col("nxt") =!= col("pr"), lit(1))))(cp =>
        if (cp.filter(col("nxt") =!= col("pr")).limit(1).isEmpty) 0L else 1L)
      converged = changed == 0L
      iters += 1
      r = next.select(col("id"), col("is_seed"), col("nxt").as("pr"))
      prev.unpersist(blocking = false)
    }
    r.join(deg, r("id") === deg("src"), "left")
      .select(r("id"), col("is_seed"),
        coalesce(col("dg"), lit(0L)).as("deg_out"), col("pr"),
        lit(iters).as("iters_run"), lit(converged).as("converged"))
  }

  /** CONVERGENCE-DRIVEN label propagation — [[labelPropagate]]'s
    * production face, the same capped-iteration contract as
    * [[pageRankFixpoint]]: run synchronous determinized LPA rounds
    * until the labeling is a fixpoint (a converged labeling is stable,
    * so early exit ≡ a full `maxRounds` unroll — the oracle replays the
    * unroll and matches either way; synchronous LPA CAN oscillate on
    * bipartite-ish structure, in which case the loop honestly runs to
    * `maxRounds` and reports converged = false) or `maxRounds`.
    * Returns (id, community, rounds_run, converged) with `community`
    * the last round's label. Per-round cost, checkpointing, and the
    * short-circuit convergence probe are exactly [[pageRankFixpoint]]'s;
    * the seed is [[labelSeed]] (nodes ∪ endpoints). */
  def labelPropagateFixpoint(edges: DataFrame, nodes: DataFrame,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 128,
      s"fixpoint propagation wants 1..128 max rounds, got $maxRounds")
    // edge list materialized once across rounds — see pageRankFixpoint
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    lpaLoopResult(e, labelSeed(e, nodes)
      .select(col("id"), col("lbl0").as("lbl")), maxRounds)
  }

  /** [[pageRankResume]]'s LPA twin: continue synchronous propagation
    * from a prior labeling `labels` (id, community) for up to
    * `maxRounds` more rounds — fixpoint(a+b) ≡ resume(capped-at-a, b)
    * at every cut (spec-asserted), the budgeted-re-entry AND warm-start
    * append face (endpoints missing from `labels` — new edges since the
    * labeling was persisted — seed as their own fresh communities;
    * rounds_run counts only the resumed rounds). */
  def labelPropagateResume(edges: DataFrame, labels: DataFrame,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 128,
      s"fixpoint propagation wants 1..128 max rounds, got $maxRounds")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val seed = labelSeed(e, labels.select(col("id")))
      .join(labels.select(col("id"), col("community").as("prior")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("prior"), col("id")).as("lbl"))
    lpaLoopResult(e, seed, maxRounds)
  }

  private def lpaLoopResult(e: DataFrame, seed: DataFrame,
      maxRounds: Int): DataFrame = {
    var lab = seed.localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val prev = lab
      // probe fused into the checkpoint job — see prLoopResult
      val (next, changed) = ObservedProbe.checkpointWithCount(
        lpaRound(e, lab, "lbl", "nxt"),
        count(when(col("nxt") =!= col("lbl"), lit(1))))(cp =>
        if (cp.filter(col("nxt") =!= col("lbl")).limit(1).isEmpty) 0L else 1L)
      converged = changed == 0L
      rounds += 1
      lab = next.select(col("id"), col("nxt").as("lbl"))
      prev.unpersist(blocking = false)
    }
    lab.select(col("id"), col("lbl").as("community"),
      lit(rounds).as("rounds_run"), lit(converged).as("converged"))
  }

  /** Co-occurrence edge derivation over the events fixture: users active
    * in the same (hour, event_type) bucket are linked both ways. The
    * self-join is keyed on the bucket, so cost is Σ min(k_b, cap)² over
    * bucket sizes — and since round 10 that bound is ENFORCED, not
    * advisory: each bucket contributes at most its `cap` first members
    * in deterministic sha-order (the d43 window pattern — an unbiased
    * deterministic sample, not an id-biased one), so one hot
    * (grain, type) bucket can no longer create a quadratic task (the
    * dense-axis probe in BASELINE.md measured exactly the predicted
    * ×k² edge blow-up before the cap). The fixture buckets peak at 6
    * members (minute grain) / 51 (hour, sf0.1), so the default cap = 64
    * is result-IDENTICAL to the uncapped semantics on every gate query
    * (spec-asserted in GraphSpec) while bounding the worst case; pass a
    * smaller cap to trade recall of intra-bucket edges for a hard
    * per-bucket budget (q60 gate-certifies the biting cap against an
    * oracle replaying the same sha-ordered window). CALLERS ON DENSER
    * DATA TAKE NOTE: any bucket with more than `cap` distinct members
    * contributes only that deterministic sample's edges — pass
    * `cap = Int.MaxValue`-adjacent values at your own quadratic peril.
    * The cap is not silent: the ≤512 route logs a once-per-JVM warning
    * the first time any bucket actually exceeds `cap` distinct members
    * (exact drop tracking inside the aggregation buffer — zero cost on
    * the no-bite path); the >512 window route stays log-free, since a
    * caller opting into that regime chose the cap deliberately.
    *
    * The cap has two routes with IDENTICAL membership, picked by the
    * cap's own memory math:
    *  - cap ≤ 512: a bounded-buffer AGGREGATION
    *    ([[graft.functions.TopKGenAgg]]: first `cap` members by
    *    (sha2(user_id), user_id), exact-duplicate collapse = the
    *    DISTINCT). One compare per row, ≤ cap rows per (task, bucket)
    *    cross the shuffle, and the previous standalone distinct's
    *    full-width exchange folds into the same shuffle — one shuffle,
    *    no sort (the window form taxed the whole graph family
    *    1.2–1.4×, round-10 measurement).
    *  - cap > 512: the `row_number` window. The aggregation's map-side
    *    partial buffers hold groups-per-task × cap boxed (sha, id)
    *    entries — at cap 4096 over a few thousand buckets that is
    *    gigabytes per task and NOT spillable (ObjectHashAggregate's
    *    fallback triggers on group COUNT, not bytes; measured: the
    *    dense 10× probe leg OOM'd an 8 GB driver). The window sort
    *    spills; for huge caps it is the honest tool. */
  def userCoEdges(events: DataFrame, grain: String = "hour",
      cap: Int = 64): DataFrame =
    // the weighted face's groupBy IS the distinct (same single
    // shuffle); deriving one from the other keeps the bucket-join
    // predicate in one place
    userCoEdgesWeighted(events, grain, cap).select(col("src"), col("dst"))

  /** [[userCoEdges]]' WEIGHTED face: the same capped bucket membership
    * and self-join, but instead of collapsing to a 0/1 edge the pair's
    * co-occurrence COUNT survives as an integer weight `w` — how many
    * (grain, event_type) buckets the two users shared. Production
    * co-occurrence/citation/domain-link graphs are multigraphs; the
    * multiplicity is the signal every weighted authority/affinity
    * measure runs on ([[pageRankWeightedInt]]). Same Σ min(k_b, cap)²
    * cost bound, same deterministic sha-ordered cap; the groupBy
    * replaces the unweighted face's distinct — one shuffle either way. */
  def userCoEdgesWeighted(events: DataFrame, grain: String = "hour",
      cap: Int = 64): DataFrame = {
    val ev = cappedBucketMembers(events, grain, cap)
    ev.as("a").join(ev.as("b"),
        col("a.h") === col("b.h") &&
          col("a.event_type") === col("b.event_type") &&
          col("a.user_id") =!= col("b.user_id"))
      .groupBy(col("a.user_id").as("src"), col("b.user_id").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** The capped per-bucket membership shared by [[userCoEdges]] and
    * [[userCoEdgesWeighted]]: distinct (user, grain-bucket, type)
    * rows, each bucket trimmed to its `cap` sha-first members via the
    * route the cap's own memory math picks (see [[userCoEdges]]'
    * scaladoc for the full contract). */
  private def cappedBucketMembers(events: DataFrame, grain: String,
      cap: Int): DataFrame = {
    require(cap >= 2 && cap <= 4096,
      s"cap=$cap outside 2..4096 (the bounded-buffer budget)")
    val ev0 = events
      .select(col("user_id"), date_trunc(grain, col("ts")).as("h"),
        col("event_type"))
    if (cap <= 512) {
      ev0
        .groupBy(col("h"), col("event_type"))
        .agg(graft.functions.TopK.topk_gen(
          sha2(col("user_id").cast("string"), 256), col("user_id"), cap,
          warnOnDrop = true)
          .as("tk"))
        .select(col("h"), col("event_type"), explode(col("tk")).as("m"))
        .select(col("m.id").as("user_id"), col("h"), col("event_type"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"), col("event_type"))
        .orderBy(sha2(col("user_id").cast("string"), 256), col("user_id"))
      ev0.distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= cap)
        .drop("rn")
    }
  }

  /** Exact triangle census by degree orientation — the clustering /
    * community-density measure (and the classic "can your engine do a
    * two-hop join without exploding" benchmark). Input is an undirected
    * edge list given in both directions (the [[userCoEdges]] shape);
    * output is ONE row: (n_nodes, n_edges, n_wedges, n_triangles,
    * global_cc_ppm) with the global clustering coefficient
    * 3·triangles/wedges in exact integer ppm.
    *
    * The orientation is the whole scale story: each undirected edge is
    * directed from its (degree, id)-lexicographically smaller endpoint
    * to the larger, so every out-neighborhood is bounded by O(√|E|)
    * regardless of skew (a hub of degree d keeps only its ≤ √|E|
    * higher-degree neighbors as out-edges). The wedge join
    * E'(a,b) ⋈ E'(b,c) then fans out per-key by out-degree² — bounded,
    * never hub-degree² — and the closing join back to E' on (a,c) is a
    * plain equi-join. Counts are order-free integer sums: exact on any
    * engine, no per-node adjacency ever materializes. */
  def triangleCensus(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") < col("dst")).distinct()
      // four consumers (degrees, the orientation's two join legs, the
      // n_edges count): without this each re-derives the full upstream
      // edge plan — the round-13 userCoEdges re-derivation made that
      // upstream pricier and q55 alone of the census family lacked the
      // materialization q70 got (driver bench flagged 1.29 → 2.62 s;
      // solo A/B probe pinned ~1 s of it to exactly this recompute)
      .localCheckpoint(false)
    val deg = und.select(col("src").as("id"))
      .unionAll(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    val triangles = trianglesOf(und, deg)
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(dg * (dg - 1)) div 2").as("n_wedges"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(nEdges).crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("(3000000 * n_triangles) div n_wedges").as("global_cc_ppm"))
  }

  /** The [[triangleCensus]] orientation, shared with
    * [[localClustering]]: each undirected edge directed from its
    * (degree, id)-lexicographically smaller endpoint to the larger, so
    * every out-neighborhood is bounded by O(√|E|) regardless of skew. */
  private def orientByDegree(und: DataFrame, deg: DataFrame): DataFrame =
    und
      .join(deg.select(col("id").as("src"), col("dg").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("dg").as("dd")), "dst")
      .select(
        when(col("ds") < col("dd") ||
            (col("ds") === col("dd") && col("src") < col("dst")),
          struct(col("src").as("a"), col("dst").as("b")))
          .otherwise(struct(col("dst").as("a"), col("src").as("b")))
          .as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))

  /** The shared oriented triangle enumeration: degree-orient `und`
    * ([[orientByDegree]]), wedge-join on the middle vertex, close on
    * (a, c). The orientation is a topological order, so each triangle
    * emits EXACTLY one (a, b, c) row and every out-neighborhood the
    * wedge join fans out over is O(√|E|) — the bound all three
    * consumers ([[triangleCensus]], [[localClustering]],
    * [[kTruss]]'s support rounds) inherit from this one place. */
  private def trianglesOf(und: DataFrame, deg: DataFrame): DataFrame = {
    val oriented = orientByDegree(und, deg)
    oriented.as("x")
      .join(oriented.select(col("a").as("b"), col("b").as("c")).as("y"),
        "b")
      .select(col("a"), col("b"), col("c"))
      .join(oriented.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-node LOCAL clustering coefficient — [[triangleCensus]]'s
    * per-node complement (Watts–Strogatz): for each node v with degree
    * d and t triangles through it, lcc(v) = 2t / (d·(d−1)), emitted in
    * exact integer ppm as `(2000000·t) div (d·(d−1))` (0 when d < 2 —
    * a leaf closes no wedge). The per-node t is exact: each triangle is
    * enumerated ONCE by the same degree-oriented wedge join the census
    * uses (the orientation is a topological order, so (a,b,c) closes
    * exactly one oriented wedge), then attributed to all three corners.
    * Everything is order-free BIGINT arithmetic — gateable on any
    * engine; 2·10⁶·t stays 5 decades under BIGINT even at t ~ 10¹².
    *
    * Returns (id, deg, tri, lcc_ppm) for every node with ≥ 1 edge.
    *
    * 100 TB shape: identical to the census — out-neighborhoods bounded
    * O(√|E|) by orientation so the wedge join fans out by out-degree²,
    * never hub-degree²; the corner attribution is one explode (3 rows
    * per triangle) into a hash aggregate; per-node adjacency never
    * materializes. */
  def localClustering(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") < col("dst")).distinct()
      // three consumers: degrees, and the oriented list's two join legs
      .localCheckpoint(false)
    val deg = und.select(col("src").as("id"))
      .unionAll(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    val corners = trianglesOf(und, deg)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))
    deg.join(corners, Seq("id"), "left")
      .select(col("id"), col("dg").as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("dg") >= 2,
          expr("(2000000 * coalesce(tri, 0L)) div (dg * (dg - 1))"))
          .otherwise(lit(0L)).as("lcc_ppm"))
  }


  /** k-core decomposition by iterative peeling — the density filter a
    * curation stack runs on its co-occurrence/citation graphs (spam
    * rings and isolated chatter fall out of the core; Seidman 1983):
    * repeatedly delete nodes of degree < k until every survivor has
    * degree ≥ k within the surviving subgraph. Third iteration pattern
    * beside [[labelPropagateFixpoint]] (label votes) and
    * [[pageRankFixpoint]] (rank mass): the survivor set SHRINKS
    * MONOTONICALLY, so (a) a stable round is a fixpoint (early exit ≡
    * full unroll, the same capped-iteration gate contract) and (b) the
    * convergence probe is an EDGE-COUNT comparison — each round's edge
    * set is nested in its predecessor's, so equal cardinality implies
    * equal sets, and an unchanged edge set means unchanged degrees,
    * hence a fixpoint: a cardinality observed DURING the round's
    * checkpoint job ([[graft.ObservedProbe]]), no exchange and no
    * separate probe job, cheaper than even the row-diff probe the
    * non-monotone faces need. Returns the core's nodes with their
    * in-core degree plus (rounds_run, converged); `converged = false`
    * means the budget ran out and the result is a SUPERSET of the true
    * k-core (peeling only removes — never wrongly admits).
    *
    * `edges` is the [[userCoEdges]] shape (both directions present).
    * 100 TB shape: each round is one degree aggregation over the
    * surviving edge list plus two semi-joins filtering edges to
    * survivors — all keyed on node ids, nothing wider than an edge
    * ever shuffles; the surviving edge list is checkpointed per round
    * (it is the loop state, and shrinks). */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 1, s"k-core wants k >= 1, got $k")
    require(maxRounds >= 1 && maxRounds <= 128,
      s"fixpoint peeling wants 1..128 max rounds, got $maxRounds")
    // edge-count probes FUSED into the checkpoint jobs (round 20,
    // ObservedProbe): the cardinality compare is observed during each
    // round's one materialization scan instead of a count() job after it
    val (e0, n0) = ObservedProbe.checkpointWithCount(
      edges.select(col("src"), col("dst")), count(lit(1)))(_.count())
    var e = e0
    var nEdges = n0
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val prev = e
      val deg = e.groupBy("src").agg(count(lit(1)).as("dg"))
      val survivors = deg.filter(col("dg") >= k).select("src")
      val (next, nNext) = ObservedProbe.checkpointWithCount(
        e.join(survivors, Seq("src"), "left_semi")
          .join(survivors.withColumnRenamed("src", "dst"), Seq("dst"),
            "left_semi")
          .select(col("src"), col("dst")),
        count(lit(1)))(_.count())
      rounds += 1
      // monotone peel: nested edge sets, so unchanged edge COUNT ⇔
      // unchanged edge set ⇔ unchanged degrees ⇔ fixpoint
      converged = nNext == nEdges
      nEdges = nNext
      e = next
      prev.unpersist(blocking = false)
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg"))
      .select(col("id"), col("core_deg"),
        lit(rounds).as("rounds_run"), lit(converged).as("converged"))
  }
  /** k-truss decomposition (Cohen 2008) — [[kCore]]'s EDGE analogue and
    * the stricter community filter: repeatedly delete edges supported by
    * fewer than k−2 triangles until every survivor closes ≥ k−2
    * triangles within the surviving subgraph (a k-truss edge's endpoints
    * share ≥ k−2 common neighbors — cohesion no degree filter can fake,
    * which is why spam-ring analysis prefers truss to core). Fourth
    * member of the fixpoint family, and like the peel it SHRINKS
    * MONOTONICALLY: a stable round is a fixpoint and the convergence
    * probe is the same nested-set CARDINALITY compare as [[kCore]]'s
    * (equal edge counts ⇔ equal sets ⇔ unchanged supports).
    * `converged = false` means the budget ran out and the survivors are
    * a SUPERSET of the true k-truss — peeling never wrongly admits.
    *
    * Per round, edge support is counted by the [[triangleCensus]]
    * machinery: degree-orient the surviving edges (out-neighborhoods
    * O(√|E|) under any skew), enumerate each triangle exactly once via
    * the oriented wedge join, then attribute it to its three canonical
    * (least, greatest) edges — one explode into a hash aggregate, no
    * per-node adjacency. Returns the surviving UNDIRECTED canonical
    * edges (src < dst) with their support plus (rounds_run,
    * converged); input is the [[userCoEdges]] shape. When converged,
    * `support` IS each edge's in-truss support (the fixpoint recount
    * over the survivors themselves); when the budget ran out it is the
    * count against the LAST PROCESSED superset — an upper bound on
    * in-truss support, consistent with the superset contract
    * (re-enter with more budget to tighten both).
    *
    * 100 TB shape: each round is the census's wedge join + one
    * support aggregation + one semi-join filter, all keyed on edge/node
    * ids; the surviving (edge, support) list is the loop state — ONE
    * localCheckpoint per round, superseded rounds unpersisted — and
    * only shrinks. */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 3, s"k-truss wants k >= 3, got $k")
    require(maxRounds >= 1 && maxRounds <= 128,
      s"fixpoint peeling wants 1..128 max rounds, got $maxRounds")
    // count probes fused into the checkpoint jobs — see kCore
    val (e0, n0) = ObservedProbe.checkpointWithCount(
      edges.select(col("src"), col("dst"))
        .filter(col("src") < col("dst")).distinct(),
      count(lit(1)))(_.count())
    var e = e0
    var nEdges = n0
    var rounds = 0
    var converged = false
    // `pinned` tracks the one checkpointed DataFrame backing the loop
    // state; each round supersedes (and unpersists) the previous one
    var pinned = e
    var support = e.select(col("src"), col("dst"), lit(0L).as("support"))
    while (!converged && rounds < maxRounds) {
      val prev = pinned
      val (sup, nNext) = ObservedProbe.checkpointWithCount(
        edgeSupport(e).filter(col("support") >= k - 2),
        count(lit(1)))(_.count())
      support = sup
      rounds += 1
      // monotone peel: nested edge sets, so unchanged edge COUNT ⇔
      // unchanged edge set ⇔ unchanged supports ⇔ fixpoint
      converged = nNext == nEdges
      nEdges = nNext
      pinned = support
      e = support.select(col("src"), col("dst"))
      prev.unpersist(blocking = false)
    }
    support.select(col("src"), col("dst"), col("support"),
      lit(rounds).as("rounds_run"), lit(converged).as("converged"))
  }

  /** One k-truss support round: triangles of the canonical (src < dst)
    * edge list `und` via the degree-oriented census join, attributed to
    * each triangle's three canonical edges. Returns every edge with its
    * triangle count (0 for wedge-free edges — the left join keeps them,
    * they peel first). */
  private def edgeSupport(und: DataFrame): DataFrame = {
    val deg = und.select(col("src").as("id"))
      .unionAll(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    val triEdges = trianglesOf(und, deg)
      .select(explode(array(
        struct(least(col("a"), col("b")).as("src"),
          greatest(col("a"), col("b")).as("dst")),
        struct(least(col("b"), col("c")).as("src"),
          greatest(col("b"), col("c")).as("dst")),
        struct(least(col("a"), col("c")).as("src"),
          greatest(col("a"), col("c")).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("t"))
    und.join(triEdges, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("t"), lit(0L)).as("support"))
  }

  /** Multi-source BFS hop levels — the reachability face of the fixpoint
    * family: `level(v)` = the minimum number of edges from any node in
    * `seeds` to `v`, computed by synchronous frontier expansion. The
    * curation shape is "hops from the trusted whitelist" (the discrete
    * complement of [[pageRankSeeded]]'s damped trust mass) and dedup-
    * cluster radius checks. Returns one row per REACHED node —
    * (id, level, rounds_run, converged); unreachable nodes are absent by
    * construction (emitting them would need the node universe, which
    * reachability deliberately doesn't require). Seeds themselves are
    * level 0, present even when isolated.
    *
    * The visited set GROWS MONOTONICALLY (a node's level is fixed the
    * round it is first reached), so — like [[kCore]]'s shrinking edge
    * set — the convergence probe is a CARDINALITY comparison: an
    * unchanged visited count means an empty frontier, and an empty
    * frontier stays empty, so the early exit ≡ a full `maxRounds`
    * unroll (the capped-iteration gate contract; the oracle replays the
    * unroll and matches either way). `converged = false` means the
    * budget ran out: levels ≤ rounds_run are exact, deeper nodes are
    * simply not yet emitted — never wrong, just truncated (the honest
    * budget semantics, same as kCore's superset contract).
    *
    * 100 TB shape: each round is one src-keyed equi-join of the edge
    * list against the CURRENT FRONTIER (shrinks to the BFS ring, ≪
    * nodes — AQE broadcasts it when it fits) plus one anti-join against
    * the visited set — both keyed on node ids, nothing wider than an id
    * pair shuffles; the edge list is checkpointed once, the visited set
    * per round (it is the loop state). */
  def bfsLevels(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 128,
      s"fixpoint expansion wants 1..128 max rounds, got $maxRounds")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    // count probes fused into the checkpoint jobs — see kCore
    val (v0, n0) = ObservedProbe.checkpointWithCount(
      seeds.select(col("id")).distinct().withColumn("level", lit(0)),
      count(lit(1)))(_.count())
    var visited = v0
    var frontier = visited.select(col("id"))
    var nVisited = n0
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val prev = visited
      val next = e
        .join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .withColumn("level", lit(rounds + 1))
      val (vNext, nNext) = ObservedProbe.checkpointWithCount(
        visited.unionAll(next), count(lit(1)))(_.count())
      visited = vNext
      rounds += 1
      // monotone growth: unchanged visited COUNT ⇔ empty frontier ⇔
      // fixpoint (an empty frontier can never repopulate)
      converged = nNext == nVisited
      nVisited = nNext
      frontier = visited.filter(col("level") === rounds).select(col("id"))
      prev.unpersist(blocking = false)
    }
    visited.select(col("id"), col("level"),
      lit(rounds).as("rounds_run"), lit(converged).as("converged"))
  }

  /** Common-neighbor link prediction: for every non-adjacent unordered
    * node pair (u, v) that shares at least one neighbor, emit the three
    * classic link-prediction scores — common-neighbor count `cn`,
    * preferential attachment `deg(u)·deg(v)`, and the integer Jaccard
    * overlap `cn·10⁶ div (deg(u)+deg(v)−cn)` in ppm. Every score is
    * exact BIGINT arithmetic, so the ranking is engine-independent.
    *
    * Input is the [[userCoEdges]] shape (undirected edges given in both
    * directions). The pair enumeration is a wedge join at the shared
    * neighbor w — cost Σ_w deg(w)², the same bound q55's census carries
    * (and the reason both run on the sparse minute-grain graph; a hub
    * cap or the q55 degree-orientation trick bounds it further when a
    * production graph has true hubs). Existing edges are removed with
    * one anti-join; only candidate pairs, never adjacency lists,
    * materialize. */
  def linkPredict(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") < col("dst")).distinct()
    val dir = und.unionAll(
      und.select(col("dst").as("src"), col("src").as("dst")))
    val deg = dir.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("dg"))
    val cn = dir.select(col("src").as("w"), col("dst").as("u"))
      .join(dir.select(col("src").as("w"), col("dst").as("v")), "w")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
    cn.join(und, cn("u") === und("src") && cn("v") === und("dst"),
        "left_anti")
      .join(deg.select(col("id").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("dg").as("dv")), "v")
      .select(col("u").as("user_a"), col("v").as("user_b"), col("cn"),
        (col("du") * col("dv")).as("pref_attach"),
        expr("(cn * 1000000) div (du + dv - cn)").as("jacc_ppm"))
  }

  /** Bounded ancestor closure over a FOREST edge list (child, parent) —
    * the generic transitive-closure operator behind hierarchy rollups
    * (BOM explosion, org charts, category trees). Returns every
    * (desc_key, anc_key) pair including the reflexive one, by `maxDepth`
    * unrolled frontier joins; Spark has no recursive CTE, so the closure
    * is the iterative-join formulation of exactly what the oracle's
    * WITH RECURSIVE computes.
    *
    * `edges` must be functional (at most one parent per child) — that is
    * what makes the frontier union duplicate-free without a distinct, so
    * the whole closure is `maxDepth` broadcast-or-shuffle equi-joins and
    * one unionAll, nothing quadratic. Depth is a hard precondition, not
    * a convergence loop: a 100 TB hierarchy with unknown depth would
    * iterate `frontier.isEmpty`-checked batches instead; the fixture
    * forests (p_partkey div 10) are ≤ 7 deep at any SF. */
  def ancestorClosure(edges: DataFrame, nodes: DataFrame,
      maxDepth: Int): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 12,
      s"unrolled closure wants 1..12 levels, got $maxDepth")
    val e = edges.select(col("child"), col("parent"))
    val self = nodes.select(col("id").as("desc_key"), col("id").as("anc_key"))
    val frontiers = Iterator.iterate(self) { f =>
      f.join(e, f("anc_key") === e("child"))
        .select(col("desc_key"), col("parent").as("anc_key"))
    }.take(maxDepth + 1).toSeq
    frontiers.reduce(_ unionAll _)
  }

  /** Degree assortativity (Newman's r): the Pearson correlation of the
    * endpoint degrees over every directed half-edge. Hubs-link-to-hubs
    * graphs score positive, hub-and-spoke graphs negative (a star is
    * exactly −1) — the one-number summary of whether a co-occurrence
    * graph's structure is social-like or broadcast-like.
    *
    * Because each undirected edge contributes BOTH (dx, dy) and
    * (dy, dx), the two marginals are identical, the denominator's two
    * factors coincide, and the usual sqrt vanishes:
    * r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²) over the m = 2|E| directed
    * pairs. All four moment sums are exact BIGINTs (emitted for exact
    * certification); r itself is ONE double division of exact integers,
    * rounded to 6 decimals — deterministic on any engine.
    *
    * 100 TB shape: degree join fans each edge out twice, the moment
    * aggregation is a full-reduce to one row — no per-node adjacency,
    * nothing quadratic; sums bounded by 2|E|·maxdeg² (checked ~2×10¹²
    * on the sf0.1 minute-grain graph, 6 decades under BIGINT). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") < col("dst")).distinct()
    val deg = und.select(col("src").as("id"))
      .unionAll(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    val dir = und.unionAll(
      und.select(col("dst").as("src"), col("src").as("dst")))
    dir
      .join(deg.select(col("id").as("src"), col("dg").as("dx")), "src")
      .join(deg.select(col("id").as("dst"), col("dg").as("dy")), "dst")
      .agg(
        count(lit(1)).as("m2"),
        sum(col("dx")).as("sx"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(expr("m2 div 2").as("n_edges"),
        col("sx"), col("sxx"), col("sxy"),
        round((col("m2") * col("sxy") - col("sx") * col("sx"))
            .cast("double") /
          (col("m2") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), 6)
          .as("assort"))
  }

  /** Newman modularity of a labelled partition — the community-QUALITY
    * metric every clustering face (LPA communities, components, an
    * external attribute like region) gets evaluated by before anyone
    * trusts it. `edges` is an edge list given in both directions (the
    * [[userCoEdges]] shape), canonicalized internally by src < dst — a
    * single-orientation list would lose its src > dst rows to that
    * filter, the same precondition the rest of the family pins.
    * Exact-BIGINT gate contract (the d45/q57 pattern): with m
    * undirected edges, e_c the intra-community edge count and d_c the
    * community's degree sum, Q = Σ_c [e_c/m − (d_c/2m)²], so
    * Q·4m² = Σ_c [4m·e_c − d_c²] — all integer, no
    * float-summation-order hazard; the one double division is the
    * caller's. Output one row per community present in the graph:
    * (community, e_c, d_c, q_num = its scaled contribution, m), so
    * Σ q_num / (4m²) is the global score. Both q_num terms are bounded
    * by 4m² (e_c ≤ m, d_c ≤ 2m), exact under BIGINT while
    * m < 1.5×10⁹ undirected edges (checked ~2×10⁹ on the sf0.1
    * minute-grain gate graph, 9 decades under); a graph past that
    * bound needs the per-community terms rescaled to doubles — the
    * exact-integer certification contract is what this face exists
    * for, so it documents the regime instead of silently wrapping.
    *
    * `labels` must cover every graph node (id, community) — a node
    * outside the partition would silently drop its degree mass, so the
    * joins are inner and the spec pins coverage. 100 TB shape: two
    * hash aggregations and two node-keyed broadcast-able joins; the
    * single-row m aggregate cross-joins back (the q55 pattern) —
    * nothing collects, nothing quadratic. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") < col("dst")).distinct()
      .localCheckpoint(false) // three consumers: m, degrees, intra
    val lab = labels.select(col("id"), col("community"))
    val mrow = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("src").as("id"))
      .unionAll(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    val dc = deg.join(lab, "id")
      .groupBy("community").agg(sum(col("dg")).as("d_c"))
    val ec = und
      .join(lab.select(col("id").as("src"), col("community").as("ca")),
        "src")
      .join(lab.select(col("id").as("dst"), col("community").as("cb")),
        "dst")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_c"))
    dc.join(ec, Seq("community"), "left")
      .crossJoin(broadcast(mrow))
      .select(col("community"),
        coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c"),
        (lit(4L) * col("m") * coalesce(col("e_c"), lit(0L))
          - col("d_c") * col("d_c")).as("q_num"),
        col("m"))
  }

  /** WEIGHTED Newman modularity — [[modularity]]'s face over the
    * weighted co-occurrence MULTIGRAPH ([[userCoEdgesWeighted]]), the
    * standard community-quality metric when edges carry multiplicity
    * (Newman 2004, "Analysis of weighted networks"): with W the total
    * undirected edge weight, e_c the intra-community weight and d_c the
    * community's weighted-degree sum, Q_w = Σ_c [e_c/W − (d_c/2W)²],
    * scaled here to the exact-BIGINT Q_w·4W² = Σ_c [4W·e_c − d_c²]
    * (same d45/q57 pattern; at w ≡ 1 every number degenerates to
    * [[modularity]]'s, spec-asserted). Output (community, e_c, d_c,
    * q_num, tw); Σ q_num / (4·tw²) is the global score.
    *
    * `edges` is the [[userCoEdgesWeighted]] shape — (src, dst, w) with
    * BOTH directions present, w symmetric, one row per directed pair
    * (the groupBy IS the uniqueness guarantee); canonicalized by
    * src < dst, which keeps exactly one copy of each undirected weight
    * (a duplicate canonical row would double-count, so no distinct —
    * the weighted shape's contract is already grouped). Same exactness
    * regime as [[modularity]]: both q_num terms bounded by 4W², exact
    * while W < 1.5×10⁹ (weights multiply the bound's USE, not its
    * math). Same 100 TB shape too: two hash aggregations, two
    * node-keyed joins, a broadcast single-row total — nothing collects,
    * nothing quadratic. */
  def modularityWeighted(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"), col("w"))
      .filter(col("src") < col("dst"))
      .localCheckpoint(false) // three consumers: W, degrees, intra
    val lab = labels.select(col("id"), col("community"))
    val wrow = und.agg(sum(col("w")).as("tw"))
    val deg = und.select(col("src").as("id"), col("w"))
      .unionAll(und.select(col("dst").as("id"), col("w")))
      .groupBy("id").agg(sum(col("w")).as("dg"))
    val dc = deg.join(lab, "id")
      .groupBy("community").agg(sum(col("dg")).as("d_c"))
    val ec = und
      .join(lab.select(col("id").as("src"), col("community").as("ca")),
        "src")
      .join(lab.select(col("id").as("dst"), col("community").as("cb")),
        "dst")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(sum(col("w")).as("e_c"))
    dc.join(ec, Seq("community"), "left")
      .crossJoin(broadcast(wrow))
      .select(col("community"),
        coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c"),
        (lit(4L) * col("tw") * coalesce(col("e_c"), lit(0L))
          - col("d_c") * col("d_c")).as("q_num"),
        col("tw"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), determinized: every node starts in its own community
    * (label = id), and each round simultaneously adopts the label most
    * frequent among its neighbours — ties broken by the SMALLEST label,
    * isolated nodes keep their current label — so the result is a pure
    * function of the graph, engine-independent, and oracle-replayable
    * (the classic formulation breaks ties randomly and updates
    * asynchronously, neither of which two engines can agree on).
    * `rounds` is unrolled, like [[pageRankInt]]'s power iterations: on a
    * bounded-diameter community structure a few synchronous rounds
    * carry most of the modularity; an unknown-depth production run
    * would iterate with a convergence check instead.
    *
    * `edges` is the [[userCoEdges]] shape (directed pairs, both
    * directions present); `nodes` the node universe. The label seed is
    * `nodes` UNION the edge endpoints, so an edge whose endpoint is
    * missing from `nodes` still votes (and still gets labeled) instead
    * of being silently dropped by the src-keyed join — a caller passing
    * a filtered node set gets the closure of its edges, never quietly
    * wrong communities. Returns (id, lbl1..lblN) — one label column per
    * round.
    *
    * 100 TB shape: each round is one src-keyed equi-join of the edge
    * list against the node-cardinality label table (AQE broadcasts it
    * when it fits), one (dst, label) count aggregation whose input is
    * bounded by |E| 16-byte rows, and one per-node argmax as a plain
    * hash aggregate — `min(struct(-votes, label))` — NOT a per-node
    * sort or window: per-group state is one struct, the q51 layout with
    * the same no-adjacency-list guarantee. A label column is never
    * wider than an id, so every intermediate is integer-narrow. */
  def labelPropagate(edges: DataFrame, nodes: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 6,
      s"unrolled propagation wants 1..6 rounds, got $rounds")
    // materialized once: the seed's endpoint union plus every round's
    // vote join all read the edge list — without this a derived edge
    // plan (userCoEdges) re-runs per consumer (review-measured 7× on
    // q61 when the seed union first landed un-materialized)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val l0 = labelSeed(e, nodes)
    (1 to rounds).foldLeft(l0) { (lab, i) =>
      lpaRound(e, lab, s"lbl${i - 1}", s"lbl$i")
    }
  }

  /** The label seed shared by [[labelPropagate]] and
    * [[labelPropagateFixpoint]]: `nodes` ∪ edge endpoints, each node
    * its own label. The union enforces the node-universe precondition
    * structurally instead of documenting it. */
  private def labelSeed(e: DataFrame, nodes: DataFrame): DataFrame =
    nodes.select(col("id"))
      .unionAll(e.select(col("src").as("id")))
      .unionAll(e.select(col("dst").as("id")))
      .distinct()
      .withColumn("lbl0", col("id"))

  /** One synchronous LPA round: src-keyed equi-join of the edges
    * against the label table, (dst, label) integer vote count, per-node
    * `min(struct(-votes, label))` argmax — the no-adjacency-list layout
    * [[labelPropagate]]'s scaladoc documents. Input labels in
    * `prevCol`; output appends `outCol`. With `weightCol` set, a
    * neighbour's vote carries its integer edge weight (votes = Σw
    * instead of a count) — the same total tie-break order
    * (votes DESC, label ASC) over exact BIGINTs either way. */
  private def lpaRound(e: DataFrame, lab: DataFrame, prevCol: String,
      outCol: String, weightCol: Option[String] = None): DataFrame = {
    val winners = e
      .join(lab.select(col("id").as("src"), col(prevCol).as("nl")), "src")
      .groupBy(col("dst"), col("nl"))
      .agg(weightCol.map(w => sum(col(w))).getOrElse(count(lit(1))).as("v"))
      .groupBy(col("dst"))
      .agg(min(struct((-col("v")).as("nv"), col("nl").as("lb"))).as("best"))
      .select(col("dst"), col("best.lb").as("wl"))
    lab.join(winners, lab("id") === winners("dst"), "left")
      .withColumn(outCol, coalesce(col("wl"), col(prevCol)))
      .drop("dst", "wl")
  }

  /** WEIGHTED label propagation — [[labelPropagate]]'s face over the
    * weighted co-occurrence multigraph ([[userCoEdgesWeighted]]): a
    * neighbour's vote carries the edge's integer multiplicity, so two
    * users sharing many buckets pull each other's community harder
    * than a one-bucket acquaintance (Raghavan's w_xy generalization —
    * the standard form on weighted graphs, completing the weighted
    * family beside [[pageRankWeightedInt]] and
    * [[modularityWeighted]]). Votes are Σw in exact BIGINT and the
    * argmax tie-break is unchanged (votes DESC, label ASC), so the
    * round recurrence stays oracle-replayable; at w ≡ 1 every round
    * column equals [[labelPropagate]]'s (Σ1 = count, spec-asserted).
    * Same seed (`nodes` ∪ edge endpoints), same unrolled-rounds
    * contract, same 100 TB shape — the weight is one extra narrow
    * column riding the existing vote join/aggregate, no new shuffle. */
  def labelPropagateWeighted(edges: DataFrame, nodes: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 6,
      s"unrolled propagation wants 1..6 rounds, got $rounds")
    val e = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(true)
    val l0 = labelSeed(e, nodes)
    (1 to rounds).foldLeft(l0) { (lab, i) =>
      lpaRound(e, lab, s"lbl${i - 1}", s"lbl$i", weightCol = Some("w"))
    }
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

  // ---- q55: exact triangle census of the minute-grain co-occurrence
  // graph (the hour grain is near-complete on this fixture — the minute
  // grain is the realistic sparse regime; the Σ k_b² contract lives in
  // userCoEdges' scaladoc either way). Degree orientation bounds every
  // out-neighborhood by O(√|E|); counts and the ppm clustering
  // coefficient are order-free integer arithmetic, replayed exactly. ----
  private def q55(s: SparkSession, dir: String): DataFrame =
    Graph.triangleCensus(
      Graph.userCoEdges(events(s, dir), grain = "minute"))

  private val q55Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |und AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id < b.user_id),
      |deg AS (
      |  SELECT id, COUNT(*)::BIGINT AS dg FROM (
      |    SELECT src AS id FROM und UNION ALL SELECT dst FROM und)
      |  GROUP BY id),
      |o AS (
      |  SELECT
      |    CASE WHEN x.dg < y.dg OR (x.dg = y.dg AND src < dst)
      |      THEN src ELSE dst END AS a,
      |    CASE WHEN x.dg < y.dg OR (x.dg = y.dg AND src < dst)
      |      THEN dst ELSE src END AS b
      |  FROM und
      |  JOIN deg x ON x.id = und.src
      |  JOIN deg y ON y.id = und.dst),
      |tri AS (
      |  SELECT COUNT(*)::BIGINT AS n_triangles
      |  FROM o e1 JOIN o e2 ON e1.b = e2.a JOIN o e3
      |    ON e3.a = e1.a AND e3.b = e2.b),
      |st AS (
      |  SELECT COUNT(*)::BIGINT AS n_nodes,
      |    (SUM(dg * (dg - 1)) // 2)::BIGINT AS n_wedges
      |  FROM deg),
      |ne AS (SELECT COUNT(*)::BIGINT AS n_edges FROM und)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |  (3000000 * n_triangles) // n_wedges AS global_cc_ppm
      |FROM st, ne, tri""".stripMargin

  // ---- q57: degree assortativity of the minute-grain co-occurrence
  // graph (same derived graph as q55). Moment sums certified exactly as
  // BIGINTs; r is one 6-decimal-rounded double division of exact
  // integers (the d45 pattern). ----
  private def q57(s: SparkSession, dir: String): DataFrame =
    Graph.degreeAssortativity(
      Graph.userCoEdges(events(s, dir), grain = "minute"))

  private val q57Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |und AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id < b.user_id),
      |deg AS (
      |  SELECT id, COUNT(*)::BIGINT AS dg FROM (
      |    SELECT src AS id FROM und UNION ALL SELECT dst FROM und)
      |  GROUP BY id),
      |dir AS (
      |  SELECT src, dst FROM und
      |  UNION ALL SELECT dst AS src, src AS dst FROM und),
      |s AS (
      |  SELECT COUNT(*)::BIGINT AS m2, SUM(x.dg)::BIGINT AS sx,
      |    SUM(x.dg * x.dg)::BIGINT AS sxx,
      |    SUM(x.dg * y.dg)::BIGINT AS sxy
      |  FROM dir JOIN deg x ON x.id = dir.src
      |  JOIN deg y ON y.id = dir.dst)
      |SELECT (m2 // 2)::BIGINT AS n_edges, sx, sxx, sxy,
      |  round((m2 * sxy - sx * sx)::DOUBLE /
      |    (m2 * sxx - sx * sx)::DOUBLE, 6) AS assort
      |FROM s""".stripMargin

  // ---- q68: partition modularity of the minute-grain co-occurrence
  // graph (same derived graph as q55/q57/q58) under the customers'
  // NATION partition — user_id keys into c_custkey, so the star-schema
  // attribute serves as community labels: does geography explain the
  // interaction structure? The Q·4m² = Σ_c [4m·e_c − d_c²]
  // decomposition keeps every per-community contribution an exact
  // BIGINT (the d45/q57 pattern); one row per nation present in the
  // graph. ----
  private def q68(s: SparkSession, dir: String): DataFrame =
    Graph.modularity(
        Graph.userCoEdges(events(s, dir), grain = "minute"),
        Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            col("c_nationkey").cast("long").as("community")))
      .orderBy("community")

  private val q68Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |und AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id < b.user_id),
      |lab AS (
      |  SELECT c_custkey AS id, c_nationkey::BIGINT AS community
      |  FROM customer),
      |mm AS (SELECT COUNT(*)::BIGINT AS m FROM und),
      |deg AS (
      |  SELECT id, COUNT(*)::BIGINT AS dg FROM (
      |    SELECT src AS id FROM und UNION ALL SELECT dst FROM und)
      |  GROUP BY id),
      |dc AS (
      |  SELECT l.community, SUM(d.dg)::BIGINT AS d_c
      |  FROM deg d JOIN lab l ON l.id = d.id GROUP BY 1),
      |ec AS (
      |  SELECT la.community, COUNT(*)::BIGINT AS e_c
      |  FROM und JOIN lab la ON la.id = und.src
      |  JOIN lab lb ON lb.id = und.dst
      |  WHERE la.community = lb.community GROUP BY 1)
      |SELECT dc.community, COALESCE(ec.e_c, 0)::BIGINT AS e_c, dc.d_c,
      |  (4 * mm.m * COALESCE(ec.e_c, 0) - dc.d_c * dc.d_c)::BIGINT
      |    AS q_num,
      |  mm.m
      |FROM dc LEFT JOIN ec USING (community), mm
      |ORDER BY dc.community""".stripMargin

  // ---- q58: common-neighbor link prediction on the minute-grain
  // co-occurrence graph (same derived graph as q55/q57). All three
  // scores are exact BIGINTs; top-20 under the total order
  // (cn DESC, user_a, user_b) so the limit is deterministic. ----
  private def q58(s: SparkSession, dir: String): DataFrame =
    Graph.linkPredict(
        Graph.userCoEdges(events(s, dir), grain = "minute"))
      .orderBy(col("cn").desc, col("user_a"), col("user_b"))
      .limit(20)

  private val q58Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |und AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id < b.user_id),
      |dir AS (
      |  SELECT src, dst FROM und
      |  UNION ALL SELECT dst AS src, src AS dst FROM und),
      |deg AS (SELECT src AS id, COUNT(*)::BIGINT AS dg FROM dir GROUP BY 1),
      |cn AS (
      |  SELECT a.dst AS u, b.dst AS v, COUNT(*)::BIGINT AS cn
      |  FROM dir a JOIN dir b ON a.src = b.src
      |  WHERE a.dst < b.dst
      |  GROUP BY 1, 2),
      |cand AS (
      |  SELECT cn.* FROM cn
      |  WHERE NOT EXISTS (SELECT 1 FROM und
      |    WHERE und.src = cn.u AND und.dst = cn.v))
      |SELECT cand.u AS user_a, cand.v AS user_b, cand.cn,
      |  (x.dg * y.dg)::BIGINT AS pref_attach,
      |  (cand.cn * 1000000) // (x.dg + y.dg - cand.cn) AS jacc_ppm
      |FROM cand JOIN deg x ON x.id = cand.u JOIN deg y ON y.id = cand.v
      |ORDER BY cand.cn DESC, user_a, user_b LIMIT 20""".stripMargin

  // ---- q59: hierarchy rollup by bounded ancestor closure over the
  // p_partkey div-10 forest (roots 0..9; depth 5 at sf0.1, ≤ 7 at any
  // SF — maxDepth 7 covers them all). Subtree size and the INTEGER
  // p_size sum are order-free exact aggregates; the oracle is the same
  // closure as a recursive CTE. Top-20 under (n_desc DESC, anc_key). ----
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
    val closure = Graph.ancestorClosure(
      part.filter(col("p_partkey") >= 10)
        .select(col("p_partkey").as("child"),
          expr("p_partkey div 10").as("parent")),
      part.select(col("p_partkey").as("id")),
      maxDepth = 7)
    closure
      .join(part.select(col("p_partkey").as("desc_key"), col("p_size")),
        "desc_key")
      .groupBy("anc_key")
      .agg(count(lit(1)).as("n_desc"), sum(col("p_size")).as("sum_size"))
      .orderBy(col("n_desc").desc, col("anc_key"))
      .limit(20)
  }

  private val q59Oracle =
    """WITH RECURSIVE e AS (
      |  SELECT p_partkey AS child, p_partkey // 10 AS parent
      |  FROM part WHERE p_partkey >= 10),
      |cl AS (
      |  SELECT p_partkey AS desc_key, p_partkey AS anc_key FROM part
      |  UNION ALL
      |  SELECT cl.desc_key, e.parent FROM cl JOIN e ON e.child = cl.anc_key)
      |SELECT cl.anc_key, COUNT(*)::BIGINT AS n_desc,
      |  CAST(SUM(p.p_size) AS BIGINT) AS sum_size
      |FROM cl JOIN part p ON p.p_partkey = cl.desc_key
      |GROUP BY cl.anc_key
      |ORDER BY n_desc DESC, cl.anc_key LIMIT 20""".stripMargin

  // ---- q60: the ENFORCED hot-bucket cap, biting — minute-grain
  // co-occurrence with cap = 4 (fixture buckets reach 6 at sf0.1 / 3 at
  // sf0.01, so real trimming happens at the bench SF), summarized as the
  // top-20 capped degrees. The oracle replays the cap mechanism itself:
  // the same sha-ordered ROW_NUMBER window over (minute, type) buckets
  // (sha256-hex ordering is identical in both engines — the e5/e8
  // codebook precedent), then the same join/distinct/degree. Equivalence
  // of the DEFAULT cap (64) to uncapped semantics on the fixture is
  // spec-asserted in GraphSpec; this row certifies the trimming path. ----
  private def q60(s: SparkSession, dir: String): DataFrame =
    Graph.userCoEdges(events(s, dir), grain = "minute", cap = 4)
      .groupBy(col("src").as("user_id"))
      .agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("user_id"))
      .limit(20)

  private val q60Oracle =
    """WITH ev0 AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |ev AS (
      |  SELECT user_id, h, event_type FROM (
      |    SELECT user_id, h, event_type,
      |      ROW_NUMBER() OVER (PARTITION BY h, event_type
      |        ORDER BY sha256(CAST(user_id AS VARCHAR)), user_id) AS rn
      |    FROM ev0) WHERE rn <= 4),
      |e AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id <> b.user_id)
      |SELECT src AS user_id, COUNT(*)::BIGINT AS deg
      |FROM e GROUP BY 1 ORDER BY deg DESC, user_id LIMIT 20""".stripMargin

  // ---- q61: label-propagation communities on the minute-grain
  // co-occurrence graph (same derived graph as q55/q57/q58), two
  // synchronous rounds. Votes are exact integer counts and the argmax
  // tie-break is total (votes DESC, label ASC), so both engines replay
  // the round recurrence exactly; both round columns are emitted so the
  // oracle certifies the trajectory, not just the fixpoint. ----
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Graph.labelPropagate(
        Graph.userCoEdges(ev, grain = "minute"),
        ev.select(col("user_id").as("id")), rounds = 2)
      .select(col("id").as("user_id"), col("lbl1"), col("lbl2"))
      .orderBy("user_id")
  }

  private val q61Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |e AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id <> b.user_id),
      |nodes AS (SELECT DISTINCT user_id AS id FROM events),
      |w1 AS (
      |  SELECT dst, nl AS wl FROM (
      |    SELECT e.dst, e.src AS nl, COUNT(*) AS v,
      |      ROW_NUMBER() OVER (PARTITION BY e.dst
      |        ORDER BY COUNT(*) DESC, e.src) AS rn
      |    FROM e GROUP BY e.dst, e.src) WHERE rn = 1),
      |l1 AS (
      |  SELECT n.id, COALESCE(w1.wl, n.id) AS lbl1
      |  FROM nodes n LEFT JOIN w1 ON w1.dst = n.id),
      |w2 AS (
      |  SELECT dst, nl AS wl FROM (
      |    SELECT e.dst, l1.lbl1 AS nl, COUNT(*) AS v,
      |      ROW_NUMBER() OVER (PARTITION BY e.dst
      |        ORDER BY COUNT(*) DESC, l1.lbl1) AS rn
      |    FROM e JOIN l1 ON l1.id = e.src
      |    GROUP BY e.dst, l1.lbl1) WHERE rn = 1),
      |l2 AS (
      |  SELECT l1.id, l1.lbl1, COALESCE(w2.wl, l1.lbl1) AS lbl2
      |  FROM l1 LEFT JOIN w2 ON w2.dst = l1.id)
      |SELECT id AS user_id, lbl1, lbl2 FROM l2 ORDER BY user_id""".stripMargin

  // ---- q62: CONVERGENCE-DRIVEN label propagation on the hour-grain
  // half-user co-occurrence graph (q51's derivation) — the fixpoint
  // face the round-12 verdict asked for, gated via the capped-iteration
  // contract: the oracle unrolls all maxRounds = 6 synchronous rounds,
  // and because a converged labeling is stable under further rounds,
  // the engine's early exit (fires at round 3 on this graph, both SFs —
  // half the budget saved) matches the full unroll bit-for-bit.
  // rounds_run/converged are certified too: the oracle recomputes them
  // as the first round whose output equals its input (c_i = 0). ----
  private val q62Rounds = 6
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") % 2 === 0)
    Graph.labelPropagateFixpoint(Graph.userCoEdges(ev),
        ev.select(col("user_id").as("id")), maxRounds = q62Rounds)
      .select(col("id").as("user_id"), col("community"),
        col("rounds_run"), col("converged"))
      .orderBy("user_id")
  }

  /** The shared LPA trajectory CTEs on the q62 gate graph: ev/e/nodes,
    * l0 = identity seed, then rounds 1..k each with its winner table
    * (w_i), labeling (l_i), and changed-row count (c_i). q62 selects the
    * whole-run view; q64 the resumed-leg view of the SAME trajectory —
    * the resume equivalence is exactly that one chain serves both. */
  private def lpaChainCtes(k: Int): String = {
    // every l_{i-1} is referenced ~3× by round i (w_i, l_i, c_i) —
    // without MATERIALIZED, DuckDB inlines the references and the
    // 6-level chain re-evaluates ~3^6-fold (the q66 lesson, measured
    // here too in round 20: q62/q64 oracle walls 26.7/21.9 s → ~0.1 s
    // with the hint, results bit-identical)
    val rounds = (1 to k).map { i =>
      s"""w$i AS MATERIALIZED (
         |  SELECT dst, nl AS wl FROM (
         |    SELECT e.dst, l${i - 1}.lbl AS nl, COUNT(*) AS v,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |        ORDER BY COUNT(*) DESC, l${i - 1}.lbl) AS rn
         |    FROM e JOIN l${i - 1} ON l${i - 1}.id = e.src
         |    GROUP BY e.dst, l${i - 1}.lbl) WHERE rn = 1),
         |l$i AS MATERIALIZED (
         |  SELECT l${i - 1}.id, COALESCE(w$i.wl, l${i - 1}.lbl) AS lbl
         |  FROM l${i - 1} LEFT JOIN w$i ON w$i.dst = l${i - 1}.id),
         |c$i AS MATERIALIZED (
         |  SELECT COUNT(*) AS c FROM l${i - 1} a JOIN l$i b USING (id)
         |  WHERE a.lbl <> b.lbl)"""
    }.mkString(",\n")
    s"""ev AS MATERIALIZED (
       |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
       |  FROM events WHERE user_id % 2 = 0),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
       |  FROM ev a JOIN ev b USING (h, event_type)
       |  WHERE a.user_id <> b.user_id),
       |nodes AS (SELECT DISTINCT user_id AS id FROM events
       |  WHERE user_id % 2 = 0),
       |l0 AS (SELECT id, id AS lbl FROM nodes),
       |$rounds"""
  }

  private val q62Oracle: String = {
    val k = q62Rounds
    val arms = (1 to k)
      .map(i => s"WHEN (SELECT c FROM c$i) = 0 THEN $i").mkString(" ")
    s"""WITH ${lpaChainCtes(k)}
       |SELECT l$k.id AS user_id, l$k.lbl AS community,
       |  CASE $arms ELSE $k END AS rounds_run,
       |  ((SELECT c FROM c$k) = 0) AS converged
       |FROM l$k ORDER BY user_id""".stripMargin
  }

  // ---- q63: convergence-driven integer PageRank on the same graph,
  // capped at maxIters = 4 — the BUDGETED face of the capped-iteration
  // contract: this graph needs ~20-49 integer iterations to reach its
  // exact fixpoint (BASELINE.md), so the gate certifies the loop runs
  // its full budget, reports converged = false honestly, and still
  // matches the 4-step unrolled oracle exactly (the fixpoint-fires case
  // is spec-certified on a cycle graph in GraphSpec, and measured to
  // convergence in the lpa scale probe). ----
  private val q63Iters = 4
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") % 2 === 0)
    Graph.pageRankFixpoint(Graph.userCoEdges(ev),
        ev.select(col("user_id").as("id")), maxIters = q63Iters)
      .select(col("id").as("user_id"), col("deg_out"), col("pr"),
        col("iters_run"), col("converged"))
      .orderBy("user_id")
  }

  /** [[lpaChainCtes]]'s PageRank twin: deg, r0 = 10⁶ seed, then steps
    * 1..k with changed-row counts; shared by q63 (whole run) and q65
    * (resumed-leg view of the same trajectory). */
  private def prChainCtes(k: Int): String = {
    // r_{i-1} is referenced 3× by round i — MATERIALIZED for the same
    // inlining-blowup reason as lpaChainCtes (3^k re-evaluation)
    val rounds = (1 to k).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.id, 125000 + COALESCE(s.m, 0) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id,
         |      CAST(SUM((r${i - 1}.pr * 7) // (8 * deg.dg)) AS BIGINT) AS m
         |    FROM e JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.id = e.src
         |    GROUP BY e.dst) s USING (id)),
         |c$i AS MATERIALIZED (
         |  SELECT COUNT(*) AS c FROM r${i - 1} a JOIN r$i b USING (id)
         |  WHERE a.pr <> b.pr)"""
    }.mkString(",\n")
    s"""ev AS MATERIALIZED (
       |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
       |  FROM events WHERE user_id % 2 = 0),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
       |  FROM ev a JOIN ev b USING (h, event_type)
       |  WHERE a.user_id <> b.user_id),
       |nodes AS (SELECT DISTINCT user_id AS id FROM events
       |  WHERE user_id % 2 = 0),
       |deg AS (SELECT src, COUNT(*) AS dg FROM e GROUP BY src),
       |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |$rounds"""
  }

  private val q63Oracle: String = {
    val k = q63Iters
    val arms = (1 to k)
      .map(i => s"WHEN (SELECT c FROM c$i) = 0 THEN $i").mkString(" ")
    s"""WITH ${prChainCtes(k)}
       |SELECT n.id AS user_id, COALESCE(deg.dg, 0) AS deg_out, r$k.pr,
       |  CASE $arms ELSE $k END AS iters_run,
       |  ((SELECT c FROM c$k) = 0) AS converged
       |FROM nodes n
       |  LEFT JOIN deg ON deg.src = n.id
       |  JOIN r$k ON r$k.id = n.id
       |ORDER BY user_id""".stripMargin
  }

  // ---- q64: budgeted RE-ENTRY of the LPA fixpoint — leg 1 runs under
  // a 1-round budget, its labeling is handed (as a plain DataFrame, the
  // shape a production run persists) to labelPropagateResume with a
  // 5-round budget. The oracle is the SAME trajectory chain as q62
  // viewed from round 1: community = the round-6 labels, rounds_run =
  // the first RESUMED round whose output equals its input (global
  // c_{j+1} = 0 → j). Green means resume(capped-at-1, 5) is
  // bit-identical to one 6-round run — the re-entry contract, gated. ----
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") % 2 === 0)
    // materialized once for BOTH legs: the operators' internal edge
    // checkpoints then copy cached blocks instead of re-running the
    // co-occurrence self-join per leg (review finding)
    val edges = Graph.userCoEdges(ev).localCheckpoint(true)
    val leg1 = Graph.labelPropagateFixpoint(edges,
        ev.select(col("user_id").as("id")), maxRounds = 1)
      .select(col("id"), col("community"))
    Graph.labelPropagateResume(edges, leg1, maxRounds = q62Rounds - 1)
      .select(col("id").as("user_id"), col("community"),
        col("rounds_run"), col("converged"))
      .orderBy("user_id")
  }

  private val q64Oracle: String = {
    val k = q62Rounds
    val arms = (1 until k)
      .map(j => s"WHEN (SELECT c FROM c${j + 1}) = 0 THEN $j").mkString(" ")
    s"""WITH ${lpaChainCtes(k)}
       |SELECT l$k.id AS user_id, l$k.lbl AS community,
       |  CASE $arms ELSE ${k - 1} END AS rounds_run,
       |  ((SELECT c FROM c$k) = 0) AS converged
       |FROM l$k ORDER BY user_id""".stripMargin
  }

  // ---- q65: budgeted re-entry of the PageRank fixpoint (q64's PR
  // twin): 2 iterations, persist, resume for 2 more ≡ q63's single
  // 4-iteration run — same trajectory chain, resumed-leg view. ----
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") % 2 === 0)
    // one materialization for both legs — same rationale as q64
    val edges = Graph.userCoEdges(ev).localCheckpoint(true)
    val half = q63Iters / 2
    val leg1 = Graph.pageRankFixpoint(edges,
        ev.select(col("user_id").as("id")), maxIters = half)
      .select(col("id"), col("pr"))
    Graph.pageRankResume(edges, leg1, maxIters = q63Iters - half)
      .select(col("id").as("user_id"), col("deg_out"), col("pr"),
        col("iters_run"), col("converged"))
      .orderBy("user_id")
  }

  private val q65Oracle: String = {
    val k = q63Iters
    val half = k / 2
    val arms = (1 to k - half)
      .map(j => s"WHEN (SELECT c FROM c${j + half}) = 0 THEN $j").mkString(" ")
    s"""WITH ${prChainCtes(k)}
       |SELECT n.id AS user_id, COALESCE(deg.dg, 0) AS deg_out, r$k.pr,
       |  CASE $arms ELSE ${k - half} END AS iters_run,
       |  ((SELECT c FROM c$k) = 0) AS converged
       |FROM nodes n
       |  LEFT JOIN deg ON deg.src = n.id
       |  JOIN r$k ON r$k.id = n.id
       |ORDER BY user_id""".stripMargin
  }

  // ---- q66: k-core decomposition of the minute-grain co-occurrence
  // graph (q55's sparse graph), k = 2, peeled to the fixpoint under a
  // 6-round budget. Monotone peeling keeps the capped-iteration gate
  // contract (a stable round is a fixpoint, so the unrolled oracle
  // matches with or without the early exit) and makes rounds_run a
  // CARDINALITY comparison on both engines. At sf0.01 the peel runs 3
  // real rounds down to a 106-node core; at sf0.1 the graph is already
  // its own 2-core (round-1 no-op) — both faces certified by one gate. ----
  private val q66Rounds = 6
  private def q66(s: SparkSession, dir: String): DataFrame =
    Graph.kCore(Graph.userCoEdges(events(s, dir), grain = "minute"),
        k = 2, maxRounds = q66Rounds)
      .select(col("id").as("user_id"), col("core_deg"),
        col("rounds_run"), col("converged"))
      .orderBy("user_id")

  private val q66Oracle: String = {
    val k = q66Rounds
    // every e_i is referenced three times (n_{i+1}, e_{i+1} twice) —
    // without MATERIALIZED, DuckDB inlines the references and the
    // 6-level chain explodes ~3^6-fold (measured: the un-hinted form
    // never finished at sf0.01)
    val rounds = (1 to k).map { i =>
      s"""n$i AS MATERIALIZED (
         |  SELECT src FROM e${i - 1} GROUP BY src HAVING COUNT(*) >= 2),
         |e$i AS MATERIALIZED (
         |  SELECT e${i - 1}.src, e${i - 1}.dst FROM e${i - 1}
         |  JOIN n$i a ON e${i - 1}.src = a.src
         |  JOIN n$i b ON e${i - 1}.dst = b.src),
         |cnt$i AS (SELECT COUNT(*) AS c FROM e$i)"""
    }.mkString(",\n")
    val arms = (1 to k).map(i =>
      s"WHEN (SELECT c FROM cnt$i) = (SELECT c FROM cnt${i - 1}) THEN $i")
      .mkString(" ")
    s"""WITH ev AS (
       |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
       |  FROM events),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
       |  FROM ev a JOIN ev b USING (h, event_type)
       |  WHERE a.user_id <> b.user_id),
       |cnt0 AS (SELECT COUNT(*) AS c FROM e0),
       |$rounds
       |SELECT src AS user_id, COUNT(*) AS core_deg,
       |  CASE $arms ELSE $k END AS rounds_run,
       |  ((SELECT c FROM cnt$k) = (SELECT c FROM cnt${k - 1})) AS converged
       |FROM e$k GROUP BY src ORDER BY user_id""".stripMargin
  }

  // ---- q67: PERSONALIZED PageRank (TrustRank shape) on the q63 graph
  // — teleport mass only on the seed set (user_id % 16 = 0, a sixteenth
  // of the users), so rank measures distance-damped proximity to the
  // trusted seeds. Same capped-fixpoint contract and generated unrolled
  // oracle as q63, with the uniform 125000 base replaced by the seed
  // indicator in every CTE round. ----
  private val q67Iters = 4
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") % 2 === 0)
    val nodes = ev.select(col("user_id").as("id"))
    Graph.pageRankSeeded(Graph.userCoEdges(ev), nodes,
        nodes.filter(col("id") % 16 === 0), maxIters = q67Iters)
      .select(col("id").as("user_id"), col("is_seed"), col("deg_out"),
        col("pr"), col("iters_run"), col("converged"))
      .orderBy("user_id")
  }

  private val q67Oracle: String = {
    val k = q67Iters
    val base = "CASE WHEN n.id % 16 = 0 THEN 125000 ELSE 0 END"
    // MATERIALIZED per round — the prChainCtes inlining-blowup rationale
    val rounds = (1 to k).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.id, $base + COALESCE(s.m, 0) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id,
         |      CAST(SUM((r${i - 1}.pr * 7) // (8 * deg.dg)) AS BIGINT) AS m
         |    FROM e JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.id = e.src
         |    GROUP BY e.dst) s USING (id)),
         |c$i AS MATERIALIZED (
         |  SELECT COUNT(*) AS c FROM r${i - 1} a JOIN r$i b USING (id)
         |  WHERE a.pr <> b.pr)"""
    }.mkString(",\n")
    val arms = (1 to k)
      .map(i => s"WHEN (SELECT c FROM c$i) = 0 THEN $i").mkString(" ")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
       |  FROM events WHERE user_id % 2 = 0),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
       |  FROM ev a JOIN ev b USING (h, event_type)
       |  WHERE a.user_id <> b.user_id),
       |nodes AS (SELECT DISTINCT user_id AS id FROM events
       |  WHERE user_id % 2 = 0),
       |deg AS (SELECT src, COUNT(*) AS dg FROM e GROUP BY src),
       |r0 AS (SELECT id, CASE WHEN id % 16 = 0
       |  THEN CAST(1000000 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pr
       |  FROM nodes),
       |$rounds
       |SELECT n.id AS user_id, (n.id % 16 = 0) AS is_seed,
       |  COALESCE(deg.dg, 0) AS deg_out, r$k.pr,
       |  CASE $arms ELSE $k END AS iters_run,
       |  ((SELECT c FROM c$k) = 0) AS converged
       |FROM nodes n
       |  LEFT JOIN deg ON deg.src = n.id
       |  JOIN r$k ON r$k.id = n.id
       |ORDER BY user_id""".stripMargin
  }

  // ---- q69: multi-source BFS hop levels on the hour-grain half-user
  // co-occurrence graph (q51/q62/q63's derivation), seeded at
  // user_id % 16 = 0 (q67's trusted set — this is its discrete
  // complement: exact hop distance instead of damped rank mass), capped
  // at 6 rounds. Monotone visited growth keeps the capped-iteration
  // contract; the oracle unrolls all 6 frontier expansions (each level
  // MATERIALIZED — the visited chain is multiply referenced, the q66
  // lesson) and recomputes rounds_run as the first round whose frontier
  // came up empty. The dense hour graph reaches everything reachable in
  // ~2 hops, so the gate certifies the fixpoint-fires face; the
  // budget-runs-out face is spec-certified on a path graph. ----
  private val q69Rounds = 6
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") % 2 === 0)
    val nodes = ev.select(col("user_id").as("id"))
    Graph.bfsLevels(Graph.userCoEdges(ev),
        nodes.filter(col("id") % 16 === 0), maxRounds = q69Rounds)
      .select(col("id").as("user_id"), col("level"),
        col("rounds_run"), col("converged"))
      .orderBy("user_id")
  }

  private val q69Oracle: String = {
    val k = q69Rounds
    val rounds = (1 to k).map { i =>
      s"""n$i AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS id, $i AS level
         |  FROM e JOIN n${i - 1} f ON e.src = f.id
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} v WHERE v.id = e.dst)),
         |v$i AS MATERIALIZED (
         |  SELECT id, level FROM v${i - 1}
         |  UNION ALL SELECT id, level FROM n$i),
         |cnt$i AS (SELECT COUNT(*) AS c FROM n$i)"""
    }.mkString(",\n")
    val arms = (1 to k)
      .map(i => s"WHEN (SELECT c FROM cnt$i) = 0 THEN $i").mkString(" ")
    s"""WITH ev AS (
       |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
       |  FROM events WHERE user_id % 2 = 0),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
       |  FROM ev a JOIN ev b USING (h, event_type)
       |  WHERE a.user_id <> b.user_id),
       |v0 AS MATERIALIZED (
       |  SELECT DISTINCT user_id AS id, 0 AS level FROM events
       |  WHERE user_id % 2 = 0 AND user_id % 16 = 0),
       |n0 AS (SELECT id FROM v0),
       |$rounds
       |SELECT id AS user_id, level,
       |  CASE $arms ELSE $k END AS rounds_run,
       |  ((SELECT c FROM cnt$k) = 0) AS converged
       |FROM v$k ORDER BY user_id""".stripMargin
  }

  // ---- q70: per-node local clustering coefficient on the minute-grain
  // co-occurrence graph (q55's sparse graph — its census counted the
  // global 3·tri/wedges; this is the per-node Watts–Strogatz
  // complement). Triangle attribution replays the same degree-oriented
  // wedge join, so per-node counts are exact integers and the ppm
  // coefficient is one truncating BIGINT division — replayed
  // bit-for-bit by the oracle. Full output ordered by user_id. ----
  private def q70(s: SparkSession, dir: String): DataFrame =
    Graph.localClustering(
        Graph.userCoEdges(events(s, dir), grain = "minute"))
      .select(col("id").as("user_id"), col("deg"), col("tri"),
        col("lcc_ppm"))
      .orderBy("user_id")

  private val q70Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |und AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id < b.user_id),
      |deg AS (
      |  SELECT id, COUNT(*)::BIGINT AS dg FROM (
      |    SELECT src AS id FROM und UNION ALL SELECT dst FROM und)
      |  GROUP BY id),
      |o AS MATERIALIZED (
      |  SELECT
      |    CASE WHEN x.dg < y.dg OR (x.dg = y.dg AND src < dst)
      |      THEN src ELSE dst END AS a,
      |    CASE WHEN x.dg < y.dg OR (x.dg = y.dg AND src < dst)
      |      THEN dst ELSE src END AS b
      |  FROM und
      |  JOIN deg x ON x.id = und.src
      |  JOIN deg y ON y.id = und.dst),
      |t AS MATERIALIZED (
      |  SELECT e1.a, e1.b, e2.b AS c
      |  FROM o e1 JOIN o e2 ON e1.b = e2.a
      |  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
      |pn AS (
      |  SELECT id, COUNT(*)::BIGINT AS tri FROM (
      |    SELECT a AS id FROM t
      |    UNION ALL SELECT b FROM t
      |    UNION ALL SELECT c FROM t) GROUP BY id)
      |SELECT deg.id AS user_id, deg.dg AS deg,
      |  COALESCE(pn.tri, 0)::BIGINT AS tri,
      |  (CASE WHEN deg.dg >= 2
      |    THEN (2000000 * COALESCE(pn.tri, 0)) // (deg.dg * (deg.dg - 1))
      |    ELSE 0 END)::BIGINT AS lcc_ppm
      |FROM deg LEFT JOIN pn ON pn.id = deg.id
      |ORDER BY user_id""".stripMargin

  // ---- q71: k-truss decomposition of the minute-grain co-occurrence
  // graph (q55/q70's sparse graph), k = 3 (every surviving edge must
  // close ≥ 1 triangle among survivors — the sparse fixture holds no
  // 4-truss at sf0.01: max support is 1 there, probed), peeled under a
  // 4-round budget: real peeling at both SFs (207 → 24 edges at
  // sf0.01, 23003 → 15421 at sf0.1), converging at round 2. Monotone
  // edge peeling keeps the capped-iteration contract (stable round =
  // fixpoint, early exit ≡ the unrolled oracle either way) with the
  // q66 cardinality probe; each oracle round replays the full census
  // machinery — per-round degree orientation, wedge join, corner-edge
  // attribution — as MATERIALIZED CTEs (each is multiply referenced;
  // the q66 lesson). The deeper multi-round cascade face (k = 4
  // stranding then emptying a shared edge) is spec-certified. ----
  private val q71K = 3
  private val q71Rounds = 4
  private def q71(s: SparkSession, dir: String): DataFrame =
    Graph.kTruss(Graph.userCoEdges(events(s, dir), grain = "minute"),
        k = q71K, maxRounds = q71Rounds)
      .select(col("src").as("user_a"), col("dst").as("user_b"),
        col("support"), col("rounds_run"), col("converged"))
      .orderBy("user_a", "user_b")

  private val q71Oracle: String = {
    val k = q71Rounds
    val rounds = (1 to k).map { i =>
      s"""deg$i AS (
         |  SELECT id, COUNT(*)::BIGINT AS dg FROM (
         |    SELECT src AS id FROM e${i - 1} UNION ALL
         |    SELECT dst FROM e${i - 1}) GROUP BY id),
         |o$i AS MATERIALIZED (
         |  SELECT
         |    CASE WHEN x.dg < y.dg OR (x.dg = y.dg AND src < dst)
         |      THEN src ELSE dst END AS a,
         |    CASE WHEN x.dg < y.dg OR (x.dg = y.dg AND src < dst)
         |      THEN dst ELSE src END AS b
         |  FROM e${i - 1}
         |  JOIN deg$i x ON x.id = e${i - 1}.src
         |  JOIN deg$i y ON y.id = e${i - 1}.dst),
         |t$i AS MATERIALIZED (
         |  SELECT p.a, p.b, q.b AS c
         |  FROM o$i p JOIN o$i q ON p.b = q.a
         |  JOIN o$i r ON r.a = p.a AND r.b = q.b),
         |s$i AS (
         |  SELECT src, dst, COUNT(*)::BIGINT AS t FROM (
         |    SELECT LEAST(a, b) AS src, GREATEST(a, b) AS dst FROM t$i
         |    UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM t$i
         |    UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM t$i)
         |  GROUP BY src, dst),
         |e$i AS MATERIALIZED (
         |  SELECT e${i - 1}.src, e${i - 1}.dst,
         |    COALESCE(s$i.t, 0)::BIGINT AS support
         |  FROM e${i - 1} LEFT JOIN s$i
         |    ON s$i.src = e${i - 1}.src AND s$i.dst = e${i - 1}.dst
         |  WHERE COALESCE(s$i.t, 0) >= ${q71K - 2}),
         |cnt$i AS (SELECT COUNT(*) AS c FROM e$i)"""
    }.mkString(",\n")
    val arms = (1 to k).map(i =>
      s"WHEN (SELECT c FROM cnt$i) = (SELECT c FROM cnt${i - 1}) THEN $i")
      .mkString(" ")
    s"""WITH ev AS (
       |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
       |  FROM events),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
       |  FROM ev a JOIN ev b USING (h, event_type)
       |  WHERE a.user_id < b.user_id),
       |cnt0 AS (SELECT COUNT(*) AS c FROM e0),
       |$rounds
       |SELECT src AS user_a, dst AS user_b, support,
       |  CASE $arms ELSE $k END AS rounds_run,
       |  ((SELECT c FROM cnt$k) = (SELECT c FROM cnt${k - 1})) AS converged
       |FROM e$k ORDER BY user_a, user_b""".stripMargin
  }

  // ---- q72: WEIGHTED integer PageRank over the weighted co-occurrence
  // multigraph (q51's derivation keeping multiplicities: w = number of
  // shared (hour, type) buckets), two unrolled power iterations,
  // top-20 by final rank. Mass splits by weight — (pr·7·w) div (8·W_u)
  // — every intermediate still an exact BIGINT, so the oracle replays
  // the recurrence bit-for-bit (q51's chain with the weight riding
  // along); at w ≡ 1 the operator degenerates to q51's, spec-asserted. ----
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") % 2 === 0)
    Graph.pageRankWeightedInt(Graph.userCoEdgesWeighted(ev),
        ev.select(col("user_id").as("id")), iters = 2)
      .select(col("id").as("user_id"), col("w_out"),
        col("pr1"), col("pr2"))
      .orderBy(col("pr2").desc, col("user_id"))
      .limit(20)
  }

  private val q72Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
      |  FROM events WHERE user_id % 2 = 0),
      |nodes AS (SELECT DISTINCT user_id AS id FROM events
      |  WHERE user_id % 2 = 0),
      |e AS (
      |  SELECT a.user_id AS src, b.user_id AS dst, COUNT(*)::BIGINT AS w
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id <> b.user_id GROUP BY 1, 2),
      |wout AS (SELECT src, SUM(w)::BIGINT AS wt FROM e GROUP BY src),
      |r1 AS (
      |  SELECT n.id, 125000 + COALESCE(s.m, 0) AS pr1
      |  FROM nodes n LEFT JOIN (
      |    SELECT e.dst AS id,
      |      CAST(SUM((1000000 * 7 * e.w) // (8 * wout.wt)) AS BIGINT) AS m
      |    FROM e JOIN wout USING (src) GROUP BY e.dst) s USING (id)),
      |r2 AS (
      |  SELECT n.id, 125000 + COALESCE(s.m, 0) AS pr2
      |  FROM nodes n LEFT JOIN (
      |    SELECT e.dst AS id,
      |      CAST(SUM((r1.pr1 * 7 * e.w) // (8 * wout.wt)) AS BIGINT) AS m
      |    FROM e JOIN wout USING (src) JOIN r1 ON r1.id = e.src
      |    GROUP BY e.dst) s USING (id))
      |SELECT n.id AS user_id, COALESCE(wout.wt, 0) AS w_out,
      |  r1.pr1, r2.pr2
      |FROM nodes n
      |  LEFT JOIN wout ON wout.src = n.id
      |  JOIN r1 ON r1.id = n.id
      |  JOIN r2 ON r2.id = n.id
      |ORDER BY r2.pr2 DESC, n.id LIMIT 20""".stripMargin

  // ---- q73: WEIGHTED modularity of the minute-grain weighted
  // co-occurrence multigraph (q72's derivation at q68's grain) under
  // the same customers' NATION partition as q68 — the weighted twin:
  // does geography explain the interaction structure once edge
  // MULTIPLICITY (shared-bucket counts) carries the mass? Q_w·4W² =
  // Σ_c [4W·e_c − d_c²] keeps every contribution an exact BIGINT; at
  // w ≡ 1 the operator degenerates to q68's (GraphSpec-asserted). ----
  private def q73(s: SparkSession, dir: String): DataFrame =
    Graph.modularityWeighted(
        Graph.userCoEdgesWeighted(events(s, dir), grain = "minute"),
        Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            col("c_nationkey").cast("long").as("community")))
      .orderBy("community")

  private val q73Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |e AS (
      |  SELECT a.user_id AS src, b.user_id AS dst, COUNT(*)::BIGINT AS w
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id < b.user_id GROUP BY 1, 2),
      |lab AS (
      |  SELECT c_custkey AS id, c_nationkey::BIGINT AS community
      |  FROM customer),
      |ww AS (SELECT SUM(w)::BIGINT AS tw FROM e),
      |deg AS (
      |  SELECT id, SUM(w)::BIGINT AS dg FROM (
      |    SELECT src AS id, w FROM e UNION ALL SELECT dst, w FROM e)
      |  GROUP BY id),
      |dc AS (
      |  SELECT l.community, SUM(d.dg)::BIGINT AS d_c
      |  FROM deg d JOIN lab l ON l.id = d.id GROUP BY 1),
      |ec AS (
      |  SELECT la.community, SUM(e.w)::BIGINT AS e_c
      |  FROM e JOIN lab la ON la.id = e.src
      |  JOIN lab lb ON lb.id = e.dst
      |  WHERE la.community = lb.community GROUP BY 1)
      |SELECT dc.community, COALESCE(ec.e_c, 0)::BIGINT AS e_c, dc.d_c,
      |  (4 * ww.tw * COALESCE(ec.e_c, 0) - dc.d_c * dc.d_c)::BIGINT
      |    AS q_num,
      |  ww.tw
      |FROM dc LEFT JOIN ec USING (community), ww
      |ORDER BY dc.community""".stripMargin

  // ---- q74: WEIGHTED label propagation on the minute-grain weighted
  // co-occurrence multigraph — q61's recurrence with votes carrying
  // edge multiplicity (Σw instead of a count), two synchronous rounds,
  // same total tie-break (votes DESC, label ASC) so the oracle replays
  // the weighted trajectory exactly; at w ≡ 1 the operator degenerates
  // to q61's (GraphSpec-asserted). Completes the weighted family:
  // PageRank (q72), modularity (q73), LPA (q74). ----
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Graph.labelPropagateWeighted(
        Graph.userCoEdgesWeighted(ev, grain = "minute"),
        ev.select(col("user_id").as("id")), rounds = 2)
      .select(col("id").as("user_id"), col("lbl1"), col("lbl2"))
      .orderBy("user_id")
  }

  private val q74Oracle =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, date_trunc('minute', ts) AS h, event_type
      |  FROM events),
      |e AS (
      |  SELECT a.user_id AS src, b.user_id AS dst, COUNT(*)::BIGINT AS w
      |  FROM ev a JOIN ev b USING (h, event_type)
      |  WHERE a.user_id <> b.user_id GROUP BY 1, 2),
      |nodes AS (SELECT DISTINCT user_id AS id FROM events),
      |w1 AS (
      |  SELECT dst, nl AS wl FROM (
      |    SELECT e.dst, e.src AS nl, SUM(e.w) AS v,
      |      ROW_NUMBER() OVER (PARTITION BY e.dst
      |        ORDER BY SUM(e.w) DESC, e.src) AS rn
      |    FROM e GROUP BY e.dst, e.src) WHERE rn = 1),
      |l1 AS (
      |  SELECT n.id, COALESCE(w1.wl, n.id) AS lbl1
      |  FROM nodes n LEFT JOIN w1 ON w1.dst = n.id),
      |w2 AS (
      |  SELECT dst, nl AS wl FROM (
      |    SELECT e.dst, l1.lbl1 AS nl, SUM(e.w) AS v,
      |      ROW_NUMBER() OVER (PARTITION BY e.dst
      |        ORDER BY SUM(e.w) DESC, l1.lbl1) AS rn
      |    FROM e JOIN l1 ON l1.id = e.src
      |    GROUP BY e.dst, l1.lbl1) WHERE rn = 1),
      |l2 AS (
      |  SELECT l1.id, l1.lbl1, COALESCE(w2.wl, l1.lbl1) AS lbl2
      |  FROM l1 LEFT JOIN w2 ON w2.dst = l1.id)
      |SELECT id AS user_id, lbl1, lbl2 FROM l2 ORDER BY user_id""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q51_pagerank", q51, Some(q51Oracle)),
    QueryDef("q55_triangle_census", q55, Some(q55Oracle)),
    QueryDef("q57_assortativity", q57, Some(q57Oracle)),
    QueryDef("q68_modularity", q68, Some(q68Oracle)),
    QueryDef("q58_link_predict", q58, Some(q58Oracle)),
    QueryDef("q59_hierarchy_rollup", q59, Some(q59Oracle)),
    QueryDef("q60_capped_coedges", q60, Some(q60Oracle)),
    QueryDef("q61_label_prop", q61, Some(q61Oracle)),
    QueryDef("q62_lpa_fixpoint", q62, Some(q62Oracle)),
    QueryDef("q63_pagerank_fixpoint", q63, Some(q63Oracle)),
    QueryDef("q64_lpa_resume", q64, Some(q64Oracle)),
    QueryDef("q65_pagerank_resume", q65, Some(q65Oracle)),
    QueryDef("q66_kcore", q66, Some(q66Oracle)),
    QueryDef("q67_trustrank", q67, Some(q67Oracle)),
    QueryDef("q69_bfs_levels", q69, Some(q69Oracle)),
    QueryDef("q70_local_clustering", q70, Some(q70Oracle)),
    QueryDef("q71_ktruss", q71, Some(q71Oracle)),
    QueryDef("q72_weighted_pagerank", q72, Some(q72Oracle)),
    QueryDef("q73_weighted_modularity", q73, Some(q73Oracle)),
    QueryDef("q74_weighted_lpa", q74, Some(q74Oracle)))
}
