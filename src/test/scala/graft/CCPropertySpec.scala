package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.DedupOps

/** ScalaCheck equivalence law for the shared fixpoint operator
  * `DedupOps.connectedComponents` — the foundation under q64 dup
  * clusters, q110 full dedup, and q121 entity resolution. The two
  * handcrafted OpsSpec cases (a chain, a reversed pair) pin the happy
  * path; this spec pins ARBITRARY graphs — dense multi-edges,
  * self-loops, many small components, vertices appearing only on one
  * side — against an in-JVM union-find reference, plus a 200-vertex
  * path as the pointer-jumping convergence law (rounds are
  * O(log diameter); the operator itself `require`s convergence, so a
  * failure to converge in its 24-round budget throws rather than
  * returning a wrong clustering). Fixed seeds keep the suite
  * deterministic across re-runs.
  */
class CCPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Min-label union-find: merges always attach the LARGER root under
    * the smaller, so a component's final root is its minimum vertex —
    * exactly connectedComponents' min-label contract.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
  }

  test("connectedComponents equals union-find on arbitrary graphs") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 40L) // small domain: multi-edges + loops
      b <- Gen.chooseNum(0L, 40L)
    } yield (a, b)
    for (seed <- Seq(1L, 2L, 3L, 4L, 5L)) {
      val edges = Gen.listOfN(60, edgeGen)(Gen.Parameters.default,
        Seed(seed)).get
      val got = DedupOps.connectedComponents(edges.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(edges), s"seed $seed")
    }
  }

  test("a 200-vertex adversarial path converges (pointer jumping)") {
    // min label at one end, edges given high->low: the naive
    // propagate-one-hop loop needs 200 rounds; pointer jumping must
    // close it inside the operator's 24-round budget or the built-in
    // convergence require throws.
    val edges = (0L until 199L).map(i => (i + 1, i))
    val got = DedupOps.connectedComponents(edges.toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }
}
