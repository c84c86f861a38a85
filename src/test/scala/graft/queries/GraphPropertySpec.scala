package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized cross-checks for the graph fixpoint family: seeded
  * Erdős–Rényi graphs, compared node-for-node / edge-for-edge against
  * independent driver-side reference implementations (plain Scala
  * queue-BFS, set-intersection truss peel, direct triangle count).
  * The gates certify the operators against DuckDB on the fixture
  * graphs; these certify them against a THIRD implementation on
  * topologies the fixture never produces (isolated islands, bridges,
  * dangling chains) — seeded, so a failure replays exactly. */
class GraphPropertySpec extends SparkSpec {

  /** Deterministic G(n, p): undirected edge set as canonical pairs. */
  private def erdosRenyi(rng: Random, n: Int, p: Double): Set[(Long, Long)] =
    (for {
      a <- 1 to n
      b <- (a + 1) to n
      if rng.nextDouble() < p
    } yield (a.toLong, b.toLong)).toSet

  private def toDf(und: Set[(Long, Long)]) = {
    import spark.implicits._
    (und.toSeq ++ und.toSeq.map(_.swap)).toDF("src", "dst")
  }

  private def adjacency(und: Set[(Long, Long)]): Map[Long, Set[Long]] =
    (und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      .withDefaultValue(Set.empty)

  /** Reference multi-source BFS: plain frontier expansion on the
    * driver's adjacency map. */
  private def refBfs(und: Set[(Long, Long)],
      seeds: Set[Long]): Map[Long, Int] = {
    val adj = adjacency(und)
    var level = Map.empty[Long, Int] ++ seeds.map(_ -> 0)
    var frontier = seeds
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(adj).diff(level.keySet)
      level ++= frontier.map(_ -> d)
    }
    level
  }

  /** Reference k-truss: peel by |N(u) ∩ N(v)| within the surviving
    * edge set until stable; returns survivors with in-truss support. */
  private def refTruss(und: Set[(Long, Long)],
      k: Int): Map[(Long, Long), Long] = {
    var e = und
    var stable = false
    while (!stable) {
      val adj = adjacency(e)
      val sup = e.iterator
        .map { p => p -> adj(p._1).intersect(adj(p._2)).size.toLong }
        .toMap
      val next = sup.filter(_._2 >= k - 2).keySet
      stable = next == e
      e = next
    }
    val adj = adjacency(e)
    e.iterator.map { p =>
      p -> adj(p._1).intersect(adj(p._2)).size.toLong
    }.toMap
  }

  /** Reference per-node triangle count: direct closed-wedge test. */
  private def refTriangles(und: Set[(Long, Long)]): Map[Long, Long] = {
    val adj = adjacency(und)
    adj.map { case (v, nb) =>
      val s = nb.toSeq.sorted
      v -> (for {
        i <- s.indices; j <- (i + 1) until s.size
        if adj(s(i)).contains(s(j))
      } yield 1).size.toLong
    }
  }

  test("bfsLevels matches a driver-side reference BFS on seeded random graphs") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rng = new Random(0xbf5L * seed)
      val n = 8 + rng.nextInt(15)
      val und = erdosRenyi(rng, n, 0.12 + rng.nextDouble() * 0.15)
      val seeds = (1 to n).filter(_ => rng.nextDouble() < 0.15)
        .map(_.toLong).toSet + 1L // always ≥ 1 seed
      val expect = refBfs(und, seeds)
      val got = Graph.bfsLevels(toDf(und), seeds.toSeq.toDF("id"),
          maxRounds = n + 1)
        .select("id", "level", "converged")
        .as[(Long, Int, Boolean)].collect()
      assert(got.forall(_._3), s"seed=$seed did not converge in n+1 rounds")
      assert(got.map(r => r._1 -> r._2).toMap === expect,
        s"seed=$seed levels diverged (n=$n, |E|=${und.size})")
    }
  }

  test("kTruss matches a driver-side reference peel on seeded random graphs") {
    for (seed <- 1 to 4) {
      val rng = new Random(0x7255L * seed)
      val n = 8 + rng.nextInt(11)
      // denser: trusses need triangles
      val und = erdosRenyi(rng, n, 0.3 + rng.nextDouble() * 0.25)
      for (k <- Seq(3, 4)) {
        val expect = refTruss(und, k)
        val got = Graph.kTruss(toDf(und), k = k, maxRounds = 64)
          .select("src", "dst", "support")
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        assert(got === expect,
          s"seed=$seed k=$k truss diverged (n=$n, |E|=${und.size})")
      }
    }
  }

  test("localClustering matches direct per-node triangle counts on seeded random graphs") {
    for (seed <- 1 to 4) {
      val rng = new Random(0x1cc0L * seed)
      val n = 8 + rng.nextInt(13)
      val und = erdosRenyi(rng, n, 0.25 + rng.nextDouble() * 0.25)
      if (und.nonEmpty) {
        val tri = refTriangles(und)
        val deg = adjacency(und).map { case (v, nb) => v -> nb.size.toLong }
        val expect = deg.collect { case (v, d) if d >= 1 =>
          val t = tri.getOrElse(v, 0L)
          v -> ((d, t,
            if (d >= 2) (2000000L * t) / (d * (d - 1)) else 0L))
        }
        val got = Graph.localClustering(toDf(und))
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        assert(got === expect,
          s"seed=$seed lcc diverged (n=$n, |E|=${und.size})")
      }
    }
  }
}
