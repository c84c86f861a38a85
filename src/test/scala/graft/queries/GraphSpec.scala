package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph family: integer-exact PageRank power iteration and the
  * co-occurrence edge derivation feeding it. */
class GraphSpec extends SparkSpec {

  test("pageRankInt: hand-computed ranks on a 3-node chain with a sink") {
    import spark.implicits._
    // 1 -> 2, 1 -> 3, 2 -> 3; node 3 is dangling (mass sink).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val out = Graph.pageRankInt(edges, nodes, iters = 2)
      .orderBy("id")
      .select("id", "deg_out", "pr1", "pr2")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // Iter 1 from r0 = 1_000_000 everywhere:
    //   node1: 125000 (nothing points at it)
    //   node2: 125000 + (1e6*7) div (8*2)          = 125000 + 437500
    //   node3: 125000 + (1e6*7) div (8*2)  [from 1]
    //                 + (1e6*7) div (8*1)  [from 2] = 125000 + 437500 + 875000
    // Iter 2 from (125000, 562500, 1437500):
    //   node1: 125000
    //   node2: 125000 + (125000*7) div 16           = 125000 + 54687
    //   node3: 125000 + (125000*7) div 16 + (562500*7) div 8
    //        = 125000 + 54687 + 492187
    assert(out === Seq(
      (1L, 2L, 125000L, 125000L),
      (2L, 1L, 562500L, 179687L),
      (3L, 0L, 1437500L, 671874L)))
  }

  test("pageRankInt: total mass is conserved up to the stated div leak") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val r = Graph.pageRankInt(edges, nodes, iters = 1)
    val total = r.agg(sum("pr1")).head.getLong(0)
    // Exact damping would give n*125000 + sum(r0)*7/8 = 375000 + 2625000;
    // truncating div leaks < 8*deg micro-units per edge.
    val exact = 375000L + 2625000L
    assert(total <= exact && total > exact - 4 * 16)
  }

  test("pageRankInt: node with no edges at all holds exactly the base") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 99L).toDF("id")
    val out = Graph.pageRankInt(edges, nodes, iters = 2)
      .where(col("id") === 99L).select("deg_out", "pr1", "pr2")
      .as[(Long, Long, Long)].head()
    assert(out === ((0L, 125000L, 125000L)))
  }

  test("pageRankWeightedInt: hand-computed weighted mass split; w ≡ 1 degenerates to pageRankInt") {
    import spark.implicits._
    // 1→2 (w=1), 1→3 (w=3), 2→3 (w=1): W_1 = 4, W_2 = 1.
    // Iter 1 from 10⁶: n1 = 125000;
    //   n2 = 125000 + (1e6·7·1) div 32 = 343750;
    //   n3 = 125000 + (1e6·7·3) div 32 + (1e6·7·1) div 8
    //      = 125000 + 656250 + 875000 = 1656250.
    // Iter 2 from (125000, 343750, ·): n2 = 125000 + 875000 div 32
    //   = 152343; n3 = 125000 + 2625000 div 32 + 2406250 div 8
    //   = 125000 + 82031 + 300781 = 507812.
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 3L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val out = Graph.pageRankWeightedInt(edges, Seq(1L, 2L, 3L).toDF("id"),
        iters = 2)
      .orderBy("id").select("id", "w_out", "pr1", "pr2")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 125000L, 125000L),
      (2L, 1L, 343750L, 152343L),
      (3L, 0L, 1656250L, 507812L)))
    // w ≡ 1: bit-identical to the unweighted recurrence (wt = deg)
    val uEdges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val weighted = Graph.pageRankWeightedInt(
        uEdges.withColumn("w", lit(1L)), Seq(1L, 2L, 3L).toDF("id"),
        iters = 2)
      .orderBy("id").select("id", "pr1", "pr2")
      .as[(Long, Long, Long)].collect().toSeq
    val unweighted = Graph.pageRankInt(uEdges, Seq(1L, 2L, 3L).toDF("id"),
        iters = 2)
      .orderBy("id").select("id", "pr1", "pr2")
      .as[(Long, Long, Long)].collect().toSeq
    assert(weighted === unweighted)
  }

  test("userCoEdgesWeighted: multiplicity counts shared buckets; collapsing weights gives userCoEdges") {
    import spark.implicits._
    // users 1,2 share TWO (hour, type) buckets; 1,3 share one
    // user 2 fires TWICE inside the 10:00 bucket: the weight must count
    // shared BUCKETS, not event pairs — if the per-bucket member
    // dedup ever regressed, w would read 3 for the (1,2) pair
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), "view"),
      (2L, Timestamp.valueOf("2024-01-01 10:55:00"), "view"),
      (2L, Timestamp.valueOf("2024-01-01 10:56:00"), "view"),
      (1L, Timestamp.valueOf("2024-01-01 11:05:00"), "view"),
      (2L, Timestamp.valueOf("2024-01-01 11:15:00"), "view"),
      (3L, Timestamp.valueOf("2024-01-01 11:20:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Graph.userCoEdgesWeighted(ev)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 2L), (2L, 1L, 2L),
      (1L, 3L, 1L), (3L, 1L, 1L),
      (2L, 3L, 1L), (3L, 2L, 1L)))
    // dropping the weight column reproduces the unweighted edge set
    val collapsed = Graph.userCoEdgesWeighted(ev).select("src", "dst")
      .as[(Long, Long)].collect().toSet
    val unweighted = Graph.userCoEdges(ev)
      .as[(Long, Long)].collect().toSet
    assert(collapsed === unweighted)
  }

  test("userCoEdges: symmetric, irreflexive, bucket-scoped") {
    import spark.implicits._
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), "view"),
      (2L, Timestamp.valueOf("2024-01-01 10:55:00"), "view"),
      (2L, Timestamp.valueOf("2024-01-01 10:56:00"), "view"), // dup pair
      (3L, Timestamp.valueOf("2024-01-01 10:05:00"), "click"), // other type
      (4L, Timestamp.valueOf("2024-01-01 11:05:00"), "view")) // other hour
      .toDF("user_id", "ts", "event_type")
    val got = Graph.userCoEdges(ev)
      .as[(Long, Long)].collect().toSet
    // Only 1 and 2 share (hour, type); both directions, once each.
    assert(got === Set((1L, 2L), (2L, 1L)))
  }

  test("userCoEdges: default cap is result-identical to uncapped on the fixture") {
    // The enforced hot-bucket contract's equivalence face: fixture
    // buckets peak well below 64 members at either grain, so cap = 64
    // (the default every gate query runs under) must reproduce the
    // uncapped edge set exactly — the cap only ever bites on a true hot
    // bucket. cap = 4096 (the buffer-budget maximum, far above any
    // fixture bucket) stands in for "uncapped" without a second code
    // path.
    val ev = graft.Tables.load(spark, sf(), "events")
    for (grain <- Seq("minute", "hour")) {
      val capped = Graph.userCoEdges(ev, grain)
      val uncapped = Graph.userCoEdges(ev, grain, cap = 4096)
      assert(capped.exceptAll(uncapped).isEmpty &&
        uncapped.exceptAll(capped).isEmpty,
        s"cap=64 changed the $grain-grain edge set on the fixture")
    }
  }

  test("userCoEdges: a hot bucket is trimmed to the sha-ordered cap members") {
    import spark.implicits._
    // 50 users all in ONE (hour, type) bucket — uncapped this is
    // 50·49 = 2450 directed edges; cap = 8 must keep exactly the 8
    // sha-first members and emit 8·7 = 56 edges over precisely them.
    val ev = (1L to 50L)
      .map(u => (u, Timestamp.valueOf("2024-01-01 10:05:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val edges = Graph.userCoEdges(ev, cap = 8)
      .as[(Long, Long)].collect().toSeq
    val expectedMembers = (1L to 50L)
      .sortBy(u => (java.security.MessageDigest.getInstance("SHA-256")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, u))
      .take(8).toSet
    assert(edges.size === 8 * 7)
    assert(edges.flatMap(e => Seq(e._1, e._2)).toSet === expectedMembers)
    assert(Graph.userCoEdges(ev, cap = 4096).count() === 50L * 49L)
  }

  test("userCoEdges: both cap routes (aggregation ≤512, window >512) give the sha-ordered membership") {
    import spark.implicits._
    // 600 users in ONE bucket: cap=500 routes through the bounded
    // buffer, cap=513 through the spillable window — each must keep
    // exactly its cap's sha-first members
    val ev = (1L to 600L)
      .map(u => (u, Timestamp.valueOf("2024-01-01 10:05:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val shaOrder = (1L to 600L)
      .sortBy(u => (java.security.MessageDigest.getInstance("SHA-256")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, u))
    for (cap <- Seq(500, 513)) {
      val members = Graph.userCoEdges(ev, cap = cap)
        .as[(Long, Long)].collect().flatMap(e => Seq(e._1, e._2)).toSet
      assert(members === shaOrder.take(cap).toSet,
        s"cap=$cap kept the wrong membership")
    }
  }

  test("triangleCensus: hand-built graph — one triangle plus a pendant") {
    import spark.implicits._
    // K3 on {1,2,3} plus pendant edge 3–4: 4 nodes, 4 edges,
    // wedges = Σ d(d−1)/2 = 1+1+3+0 = 5, triangles = 1,
    // cc = 3·1/5 = 0.6 → 600000 ppm
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = Graph.triangleCensus(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((4L, 4L, 5L, 1L, 600000L)))
  }

  test("triangleCensus: triangle-free bipartite graph counts zero") {
    import spark.implicits._
    // complete bipartite K2,2: 4 wedges... actually d=2 for all →
    // wedges = 4·1 = 4, triangles = 0
    val und = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = Graph.triangleCensus(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((4L, 4L, 4L, 0L, 0L)))
  }

  test("degreeAssortativity: a star is exactly −1, moments exact") {
    import spark.implicits._
    // S3: hub 0 with leaves 1..3. Directed pairs (3,1)×3 and (1,3)×3:
    // m2=6, sx=12, sxx=30, sxy=18 → r = (6·18−144)/(6·30−144) = −1.
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) === ((3L, 12L, 30L, 18L, -1.0)))
  }

  test("linkPredict: C4 cycle — both diagonals, exact scores, no adjacent pairs") {
    import spark.implicits._
    // Cycle 1–2–3–4–1: every vertex degree 2; adjacent pairs share no
    // neighbor, the two diagonals share both their neighbors.
    // cn=2, pref=2·2, jacc = 2e6 div (2+2−2) = 1000000.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.linkPredict(edges)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 3L, 2L, 4L, 1000000L),
      (2L, 4L, 2L, 4L, 1000000L)))
  }

  test("linkPredict: existing edges are anti-joined out even when they share neighbors") {
    import spark.implicits._
    // K3 {1,2,3} + pendant 3–4: all K3 pairs share a neighbor but are
    // adjacent → excluded. Only (1,4) and (2,4) survive, via w=3.
    // deg: 1→2, 2→2, 3→3, 4→1; jacc = 1e6 div (2+1−1) = 500000.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.linkPredict(edges)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 4L, 1L, 2L, 500000L),
      (2L, 4L, 1L, 2L, 500000L)))
  }

  test("ancestorClosure: 3-level forest — reflexive + all ancestor pairs, no extras past the depth") {
    import spark.implicits._
    // Forest: 4 → 2 → 1, 3 → 1; isolated root 5.
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L)).toDF("child", "parent")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val got = Graph.ancestorClosure(edges, nodes, maxDepth = 4)
      .as[(Long, Long)].collect().toSeq
    val expect = Set(
      (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L), // reflexive
      (2L, 1L), (3L, 1L), (4L, 2L),                     // depth 1
      (4L, 1L))                                         // depth 2
    // Exact set AND no duplicate pairs (the functional-edges contract
    // is what makes the unrolled union duplicate-free).
    assert(got.size === expect.size && got.toSet === expect)
  }

  test("degreeAssortativity: barbell (two triangles bridged) hand value") {
    import spark.implicits._
    // Triangles {a,b,c}, {d,e,f} bridged by c–d. Degrees: a,b,e,f = 2;
    // c,d = 3. m2=14, sx=34, sxx=86, sxy=82 →
    // r = (14·82 − 34²)/(14·86 − 34²) = −8/48 = −0.166667 (6 dp).
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) === ((7L, 34L, 86L, 82L, -0.166667)))
  }

  test("modularity: barbell hand value (Q = 5/14), zero under the " +
      "trivial partition, empty-community left-join") {
    import spark.implicits._
    // Triangles {1,2,3}, {4,5,6} bridged by 3–4: m = 7, per triangle
    // e_c = 3, d_c = 2+2+3 = 7 → q_num = 4·7·3 − 49 = 35 each;
    // Q = 70/(4·49) = 5/14 ≈ 0.357 (the textbook two-community value).
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val byTriangle = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("id", "community")
    val got = Graph.modularity(edges, byTriangle)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(0L -> ((3L, 7L, 35L, 7L)),
      1L -> ((3L, 7L, 35L, 7L))))
    // the one-community partition scores exactly zero (e_c = m,
    // d_c = 2m → 4m·m − 4m² = 0) — the classic invariant
    val trivial = (1L to 6L).map((_, 9L)).toDF("id", "community")
    val one = Graph.modularity(edges, trivial).collect()
    assert(one.length === 1 &&
      (one.head.getLong(1), one.head.getLong(2), one.head.getLong(3))
        === ((7L, 14L, 0L)))
    // a community whose members share no edge still reports (its mass
    // counts against the score): split 3 off alone → e_c = 0 for {3}?
    // 3 touches 1-3, 2-3, 3-4 but alone in its community → e_c = 0,
    // d_c = 3, q_num = −9
    val lonely = Seq((1L, 0L), (2L, 0L), (3L, 7L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("id", "community")
    val l = Graph.modularity(edges, lonely)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(l(7L) === ((0L, 3L, -9L)))
  }

  test("modularityWeighted: w ≡ 1 degenerates to modularity; weighted " +
      "barbell hand value") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val dirEdges = und ++ und.map(_.swap)
    val byTriangle = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("id", "community")
    // w ≡ 1: every output row equals modularity's (tw = m), the
    // degeneracy contract the VERDICT asked to pin
    val unit = dirEdges.map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "w")
    val wRows = Graph.modularityWeighted(unit, byTriangle)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val uRows = Graph.modularity(dirEdges.toDF("src", "dst"), byTriangle)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(wRows === uRows)
    // weighted hand value: triple the intra-triangle weights (w = 3),
    // keep the bridge at 1. W = 6·3 + 1 = 19; per triangle e_c = 9,
    // d_c = 6+6+(6+1) = 19 → q_num = 4·19·9 − 19² = 323;
    // Q_w = 646/(4·361) = 0.447... — heavier intra mass scores HIGHER
    // than the unweighted 5/14.
    val weighted = dirEdges.map { case (s, d) =>
      (s, d, if (Set(s, d) == Set(3L, 4L)) 1L else 3L)
    }.toDF("src", "dst", "w")
    val got = Graph.modularityWeighted(weighted, byTriangle)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(0L -> ((9L, 19L, 323L, 19L)),
      1L -> ((9L, 19L, 323L, 19L))))
  }

  test("labelPropagateWeighted: w ≡ 1 degenerates to labelPropagate; " +
      "multiplicity flips an unweighted tie") {
    import spark.implicits._
    // degeneracy on the bridged triangles: w ≡ 1 must reproduce every
    // round column of the unweighted operator
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val dirEdges = und ++ und.map(_.swap)
    val nodes = (1L to 7L).toDF("id")
    val unit = dirEdges.map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "w")
    val wRows = Graph.labelPropagateWeighted(unit, nodes, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val uRows = Graph.labelPropagate(dirEdges.toDF("src", "dst"), nodes,
        rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(wRows === uRows)
    // multiplicity decides: node 3 hears 1 (w=1) and 2 (w=5). The
    // unweighted round ties 1-vote-each and the min label 1 wins; the
    // weighted round hands it to 2.
    val star = Seq((1L, 3L, 1L), (3L, 1L, 1L), (2L, 3L, 5L), (3L, 2L, 5L))
      .toDF("src", "dst", "w")
    val w1 = Graph.labelPropagateWeighted(star, Seq(1L, 2L, 3L).toDF("id"),
        rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w1 === Map(1L -> 3L, 2L -> 3L, 3L -> 2L))
    val u1 = Graph.labelPropagate(star.select("src", "dst"),
        Seq(1L, 2L, 3L).toDF("id"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(u1(3L) === 1L, "unweighted tie must fall to the min label")
  }

  test("labelPropagate: hand-computed two rounds on bridged triangles") {
    import spark.implicits._
    // Triangles {1,2,3} and {4,5,6} bridged by 3–4; 7 isolated.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = (1L to 7L).toDF("id")
    val out = Graph.labelPropagate(edges, nodes, rounds = 2)
      .orderBy("id").select("id", "lbl1", "lbl2")
      .as[(Long, Long, Long)].collect().toSeq
    // Round 1 (all neighbour labels vote once → smallest label wins):
    //   1→min(2,3)=2, 2→min(1,3)=1, 3→min(1,2,4)=1,
    //   4→min(3,5,6)=3, 5→min(4,6)=4, 6→min(4,5)=4.
    // Round 2 over lbl1 = (2,1,1,3,4,4):
    //   1: nbrs {1,1} → 1 (majority);  2: {2,1} tie → 1;
    //   3: {2,1,3} tie → 1;            4: {1,4,4} → 4 (majority);
    //   5: {3,4} tie → 3;              6: {3,4} tie → 3.
    assert(out === Seq(
      (1L, 2L, 1L), (2L, 1L, 1L), (3L, 1L, 1L),
      (4L, 3L, 4L), (5L, 4L, 3L), (6L, 4L, 3L),
      (7L, 7L, 7L)))
  }

  test("labelPropagate: a clique converges to its minimum id in one round") {
    import spark.implicits._
    val ids = (10L to 14L)
    val und = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.labelPropagate(edges, ids.toDF("id"), rounds = 2)
    // Round 1: every vote set is distinct singles → tie → the minimum
    // neighbour id, so 10 takes label 11 and everyone else takes 10.
    // Round 2: label 10 is now the majority (or unanimous) vote at
    // every node, so the whole clique lands on 10.
    val l2 = out.select("lbl2").as[Long].collect().toSet
    assert(l2 === Set(10L))
  }

  test("labelPropagate: edge endpoints missing from `nodes` still vote and get labeled") {
    import spark.implicits._
    // the round-12 advice defect: a filtered node set used to silently
    // drop edge votes via the src-keyed inner join — the seed is now
    // nodes ∪ endpoints
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = Graph.labelPropagate(edges, Seq(1L).toDF("id"), rounds = 1)
      .orderBy("id").select("id", "lbl1").as[(Long, Long)].collect().toSeq
    // both endpoints labeled; each adopts its only neighbour's label
    assert(out === Seq((1L, 2L), (2L, 1L)))
  }

  test("labelPropagateFixpoint: bridged triangles converge at round 4 with stable communities") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = (1L to 7L).toDF("id")
    val out = Graph.labelPropagateFixpoint(edges, nodes, maxRounds = 10)
      .orderBy("id").select("id", "community", "rounds_run", "converged")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    // trajectory (hand-computed above for rounds 1-2):
    //   l2 = (1,1,1,4,3,3,7) → l3 = (1,1,1,3,3,3,7) → l4 = l3: fixpoint
    // at round 4, six rounds of the budget saved
    assert(out === Seq(
      (1L, 1L, 4, true), (2L, 1L, 4, true), (3L, 1L, 4, true),
      (4L, 3L, 4, true), (5L, 3L, 4, true), (6L, 3L, 4, true),
      (7L, 7L, 4, true)))
    // capped-iteration contract: early exit ≡ the full unroll — the
    // final label equals the round-6 column of the unrolled operator
    val unrolled = Graph.labelPropagate(edges, nodes, rounds = 6)
      .orderBy("id").select("lbl6").as[Long].collect().toSeq
    assert(out.map(_._2) === unrolled)
  }

  test("labelPropagateFixpoint: a 2-node oscillator honestly reports converged = false") {
    import spark.implicits._
    // synchronous LPA 2-cycles on a single undirected edge: labels swap
    // every round (1,2) → (2,1) → (1,2) → … — no round ever equals its
    // predecessor, so the loop must run its full budget
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = Graph.labelPropagateFixpoint(edges, Seq(1L, 2L).toDF("id"),
        maxRounds = 5)
      .orderBy("id").select("id", "community", "rounds_run", "converged")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    // l5 is the odd-round state: swapped
    assert(out === Seq((1L, 2L, 5, false), (2L, 1L, 5, false)))
  }

  test("pageRankFixpoint: a directed cycle is its own fixpoint — detected at iteration 1") {
    import spark.implicits._
    // deg 1 everywhere: r' = 125000 + (1e6·7) div 8 = 1e6 exactly
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pageRankFixpoint(edges, Seq(1L, 2L, 3L).toDF("id"),
        maxIters = 32)
      .orderBy("id").select("id", "deg_out", "pr", "iters_run", "converged")
      .as[(Long, Long, Long, Int, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 1000000L, 1, true), (2L, 1L, 1000000L, 1, true),
      (3L, 1L, 1000000L, 1, true)))
  }

  test("resume faces: fixpoint(a+b) ≡ resume(capped-at-a, b) at every cut") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = (1L to 7L).toDF("id")
    val full = Graph.labelPropagateFixpoint(edges, nodes, maxRounds = 6)
      .orderBy("id").select("id", "community", "converged")
      .as[(Long, Long, Boolean)].collect().toSeq
    for (cut <- 1 to 3) {
      val leg1 = Graph.labelPropagateFixpoint(edges, nodes, maxRounds = cut)
        .select(col("id"), col("community"))
      val resumed = Graph.labelPropagateResume(edges, leg1,
          maxRounds = 6 - cut)
        .orderBy("id").select("id", "community", "converged")
        .as[(Long, Long, Boolean)].collect().toSeq
      assert(resumed === full, s"cut at round $cut diverged")
    }
    // PageRank twin on the chain graph (fixpoint at iteration 4)
    val pEdges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val pNodes = Seq(1L, 2L, 3L).toDF("id")
    val pFull = Graph.pageRankFixpoint(pEdges, pNodes, maxIters = 8)
      .orderBy("id").select("id", "pr", "converged")
      .as[(Long, Long, Boolean)].collect().toSeq
    for (cut <- 1 to 3) {
      val leg1 = Graph.pageRankFixpoint(pEdges, pNodes, maxIters = cut)
        .select(col("id"), col("pr"))
      val resumed = Graph.pageRankResume(pEdges, leg1, maxIters = 8 - cut)
        .orderBy("id").select("id", "pr", "converged")
        .as[(Long, Long, Boolean)].collect().toSeq
      assert(resumed === pFull, s"cut at iteration $cut diverged")
    }
  }

  test("pageRankSeeded: trust flows only from seeds, hand-computed on a chain") {
    import spark.implicits._
    // 1 → 2 → 3, seed = {1}: r0 = (1e6, 0, 0); deg(1)=deg(2)=1.
    //   iter1: n1 = 125000 (seed base, nothing in);
    //          n2 = 0 + (1e6·7) div 8 = 875000; n3 = 0 + 0 = 0
    //   iter2: n2 = (125000·7) div 8 = 109375;
    //          n3 = (875000·7) div 8 = 765625
    //   iter3: n2 = 109375 (stable from here);
    //          n3 = (109375·7) div 8 = 95703
    //   iter4 reproduces iter3 → fixpoint detected
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val out = Graph.pageRankSeeded(edges, nodes, Seq(1L).toDF("id"),
        maxIters = 16)
      .orderBy("id")
      .select("id", "is_seed", "pr", "iters_run", "converged")
      .as[(Long, Boolean, Long, Int, Boolean)].collect().toSeq
    val rounds = out.head._4
    assert(out === Seq(
      (1L, true, 125000L, rounds, true),
      (2L, false, 109375L, rounds, true),
      (3L, false, 95703L, rounds, true)))
    // an unreachable node scores exactly zero — no uniform teleport
    val out2 = Graph.pageRankSeeded(edges, Seq(1L, 2L, 3L, 9L).toDF("id"),
        Seq(1L).toDF("id"), maxIters = 16)
      .filter(col("id") === 9L).select("pr").as[Long].head()
    assert(out2 === 0L)
  }

  test("kCore: hand-computed peel — pendant chain falls off round by round") {
    import spark.implicits._
    // triangle {1,2,3} with a pendant path 3–4–5: deg(5)=1 peels first,
    // exposing deg(4)=1 next round; the triangle is the 2-core.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.kCore(edges, k = 2, maxRounds = 8)
      .orderBy("id").select("id", "core_deg", "rounds_run", "converged")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    // rounds: peel 5 → peel 4 → stable = fixpoint detected at round 3
    assert(out === Seq((1L, 2L, 3, true), (2L, 2L, 3, true),
      (3L, 2L, 3, true)))
    // k above the densest degree: the whole graph peels to empty
    val empty = Graph.kCore(edges, k = 5, maxRounds = 8)
    assert(empty.count() === 0L)
    // already-a-core graph: round-1 no-op, converged immediately
    val tri = Graph.kCore(
      (und.take(3) ++ und.take(3).map(_.swap)).toDF("src", "dst"),
      k = 2, maxRounds = 8)
      .select("rounds_run", "converged").as[(Int, Boolean)].head()
    assert(tri === ((1, true)))
  }

  test("bfsLevels: single-source path — exact hop levels, fixpoint at the empty frontier") {
    import spark.implicits._
    // path 1–2–3–4–5 (both directions), seed {1}: levels 0..4; the
    // frontier empties at round 5 (round 4 discovered node 5, round 5
    // found nothing new) → rounds_run 5, converged
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.bfsLevels(edges, Seq(1L).toDF("id"), maxRounds = 8)
      .orderBy("id").select("id", "level", "rounds_run", "converged")
      .as[(Long, Int, Int, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 0, 5, true), (2L, 1, 5, true), (3L, 2, 5, true),
      (4L, 3, 5, true), (5L, 4, 5, true)))
  }

  test("bfsLevels: multi-source min-distance; budget cap truncates honestly") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    // seeds at both ends: middle node lands at level 2, ends' neighbors
    // at 1; frontier empties at round 3
    val multi = Graph.bfsLevels(edges, Seq(1L, 5L).toDF("id"),
        maxRounds = 8)
      .orderBy("id").select("id", "level", "rounds_run", "converged")
      .as[(Long, Int, Int, Boolean)].collect().toSeq
    assert(multi === Seq(
      (1L, 0, 3, true), (2L, 1, 3, true), (3L, 2, 3, true),
      (4L, 1, 3, true), (5L, 0, 3, true)))
    // budget runs out at 2 rounds from seed {1}: only levels ≤ 2 emit,
    // converged = false — truncated, never wrong
    val capped = Graph.bfsLevels(edges, Seq(1L).toDF("id"), maxRounds = 2)
      .orderBy("id").select("id", "level", "rounds_run", "converged")
      .as[(Long, Int, Int, Boolean)].collect().toSeq
    assert(capped === Seq(
      (1L, 0, 2, false), (2L, 1, 2, false), (3L, 2, 2, false)))
    // an isolated seed (no edges touch it) still reports at level 0,
    // and unreachable nodes never appear
    val iso = Graph.bfsLevels(edges, Seq(99L).toDF("id"), maxRounds = 4)
      .select("id", "level", "converged")
      .as[(Long, Int, Boolean)].collect().toSeq
    assert(iso === Seq((99L, 0, true)))
  }

  test("localClustering: K3 plus pendant — hand-computed per-node ppm") {
    import spark.implicits._
    // K3 {1,2,3} + pendant 3–4. deg: 1→2, 2→2, 3→3, 4→1; one triangle
    // through 1,2,3. lcc: 1,2 → 2e6·1/(2·1) = 1000000;
    // 3 → 2e6·1/(3·2) = 333333 (truncating div); 4 → deg<2 → 0.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.localClustering(edges)
      .orderBy("id").select("id", "deg", "tri", "lcc_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, 1000000L), (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L), (4L, 1L, 0L, 0L)))
    // consistency with the census: Σ per-node tri = 3 × global count,
    // on the two-triangle barbell
    val bund = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val bedges = (bund ++ bund.map(_.swap)).toDF("src", "dst")
    val perNode = Graph.localClustering(bedges)
      .agg(sum("tri")).head.getLong(0)
    val global = Graph.triangleCensus(bedges)
      .select("n_triangles").head.getLong(0)
    assert(perNode === 3 * global && global === 2L)
  }

  test("kTruss: K4 keeps its truss while a hanging triangle peels; cascade empties a triangle chain") {
    import spark.implicits._
    // K4 on {1,2,3,4} + triangle {4,5,6}: every K4 edge closes 2
    // triangles (survives k = 4), the hanging triangle's edges close 1
    // each → peeled round 1; round 2 confirms stability.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.kTruss(edges, k = 4, maxRounds = 8)
      .orderBy("src", "dst")
      .select("src", "dst", "support", "rounds_run", "converged")
      .as[(Long, Long, Long, Int, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 2L, 2, true), (1L, 3L, 2L, 2, true), (1L, 4L, 2L, 2, true),
      (2L, 3L, 2L, 2, true), (2L, 4L, 2L, 2, true), (3L, 4L, 2L, 2, true)))
    // k = 3: every edge closes ≥ 1 triangle → round-1 no-op, converged
    val k3 = Graph.kTruss(edges, k = 3, maxRounds = 8)
      .select("rounds_run", "converged").as[(Int, Boolean)].head()
    assert(k3 === ((1, true)))
    // cascade: two triangles sharing edge (2,3) — at k = 4 the outer
    // edges peel round 1 (support 1), stranding (2,3) at support 0 →
    // peeled round 2, empty confirmed round 3
    val chain = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val cedges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val c = Graph.kTruss(cedges, k = 4, maxRounds = 8)
    assert(c.count() === 0L)
    // budget honesty: the same cascade capped at 1 round keeps the
    // stranded (2,3) as a superset, converged = false
    val capped = Graph.kTruss(cedges, k = 4, maxRounds = 1)
      .select("src", "dst", "support", "rounds_run", "converged")
      .as[(Long, Long, Long, Int, Boolean)].collect().toSeq
    assert(capped === Seq((2L, 3L, 2L, 1, false)))
  }

  test("labelPropagateResume: warm-start over appended edges seeds new nodes fresh") {
    import spark.implicits._
    // archive labeling: clique {1,2,3} settled on community 1
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "community")
    // appended edges attach new node 9 to the clique via 3
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.labelPropagateResume(edges, labels, maxRounds = 4)
      .orderBy("id").select("id", "community", "converged")
      .as[(Long, Long, Boolean)].collect().toSeq
    // node 9 enters as its own community, then adopts the clique's
    assert(out === Seq((1L, 1L, true), (2L, 1L, true), (3L, 1L, true),
      (9L, 1L, true)))
  }

  test("pageRankFixpoint: chain ranks reach the hand-computed integer fixpoint at iteration 4") {
    import spark.implicits._
    // 1→2, 1→3, 2→3: node 1 is constant from iter 1, node 2 from
    // iter 2 (125000 + (125000·7) div 16 = 179687), node 3 from iter 3
    // (125000 + 54687 + (179687·7) div 8 = 336913); iter 4 reproduces
    // iter 3 → fixpoint detected
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.pageRankFixpoint(edges, Seq(1L, 2L, 3L).toDF("id"),
        maxIters = 16)
      .orderBy("id").select("id", "pr", "iters_run", "converged")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 125000L, 4, true), (2L, 179687L, 4, true),
      (3L, 336913L, 4, true)))
    // early exit ≡ full unroll: pr equals pageRankInt's 8-iteration col
    val unrolled = Graph.pageRankInt(edges, Seq(1L, 2L, 3L).toDF("id"),
        iters = 8)
      .orderBy("id").select("pr8").as[Long].collect().toSeq
    assert(out.map(_._2) === unrolled)
  }
}
