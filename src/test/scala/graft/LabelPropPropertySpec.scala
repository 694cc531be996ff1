package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.WarehouseOps

/** ScalaCheck law for `WarehouseOps.labelPropSettle` (under q275): on
  * ARBITRARY undirected graphs — multi-edges, self-loops, many small
  * components — the fixpoint must return, per node, the component's
  * min id AND the hop distance from that min node (the settle_round
  * convergence certificate), checked against a driver-side
  * union-find + BFS reference. Complements CCPropertySpec, which pins
  * the pointer-jumping operator's LABELS only — here the ROUND
  * TRAJECTORY itself is the contract, which is why the operator floods
  * one hop per round instead of path-halving. Fixed seeds keep the
  * suite deterministic.
  */
class LabelPropPropertySpec extends SparkSpec {
  import spark.implicits._

  /** (component min id, BFS hop distance from that min node) per node. */
  private def reference(pairs: Seq[(Long, Long)]): Map[Long, (Long, Int)] = {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val comp = scala.collection.mutable.Map[Long, Long]()
    nodes.foreach { n =>
      if (!comp.contains(n)) {
        var seen = Set(n); var frontier = Set(n)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj).diff(seen)
          seen ++= frontier
        }
        val m = seen.min
        seen.foreach(v => comp(v) = m)
      }
    }
    val dist = scala.collection.mutable.Map[Long, Int]()
    comp.values.toSeq.distinct.foreach { m =>
      var d = 0; var seen = Set(m); var frontier = Set(m)
      dist(m) = 0
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(adj).diff(seen)
        frontier.foreach(v => dist(v) = d)
        seen ++= frontier
      }
    }
    nodes.map(v => v -> (comp(v), dist(v))).toMap
  }

  test("labelPropSettle equals union-find min + BFS dist on arbitrary graphs") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 40L) // small domain: multi-edges + loops
      b <- Gen.chooseNum(0L, 40L)
    } yield (a, b)
    for (seed <- Seq(1L, 2L, 3L, 4L, 5L)) {
      val edges = Gen.listOfN(60, edgeGen)(Gen.Parameters.default,
        Seed(seed)).get
      val got = WarehouseOps.labelPropSettle(edges.toDF("u", "v"))
        .as[(Long, Long, Int)].collect()
        .map { case (v, l, s) => v -> (l, s) }.toMap
      assert(got == reference(edges), s"seed $seed")
    }
  }

  test("settle_round is the exact hop distance along an adversarial path") {
    // min at one end, edges given high->low: flooding needs exactly
    // len rounds (one hop per round) and node i settles at round i.
    val edges = (0L until 19L).map(i => (i + 1, i))
    val got = WarehouseOps.labelPropSettle(edges.toDF("u", "v"))
      .as[(Long, Long, Int)].collect()
    assert(got.length == 20 &&
      got.forall { case (v, l, s) => l == 0L && s == v.toInt })
  }

  test("a graph wider than the round cap fails loudly, never silently") {
    // radius 12 > maxRounds 8: the built-in require must throw rather
    // than return a half-converged labeling posing as a fixpoint.
    val edges = (0L until 12L).map(i => (i + 1, i))
    val e = intercept[IllegalArgumentException] {
      WarehouseOps.labelPropSettle(edges.toDF("u", "v"), maxRounds = 8)
        .count()
    }
    assert(e.getMessage.contains("failed to converge"))
  }
}
