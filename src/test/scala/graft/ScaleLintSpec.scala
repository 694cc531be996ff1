package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Scale-lint law (VERDICT r7 #3): the q48/q56/q264 hazard class —
  * a window partitioned by a CONSTANT-CARDINALITY key (or none) running
  * directly over a corpus-scale frame — funnels N/k rows through ONE
  * task at 100x, invisibly to plan pins that assert exchanges rather
  * than partition sizes. This spec walks every catalog query's
  * optimized logical plan and flags any Window whose partition key is
  * drawn solely from the bounded-domain column set AND whose subtree
  * contains no reducing operator (Aggregate / Deduplicate / limit)
  * between the window and the scans.
  *
  * The reduction test is a signature match, not a cardinality proof: a
  * window above an Aggregate runs over a frame bounded by the GROUP
  * DOMAIN (histogram buckets, distinct integer gaps, per-day rollups),
  * which is exactly the two-pass/bucketed shape q257 sanctions. A
  * window that earns its pass through a join whose OTHER side is
  * aggregated (the q48/q56 pass-2 broadcast locate-filter, which
  * keeps only ~1/buckets of the corpus) also passes, because the
  * Aggregate sits in the located branch of the subtree — the lint
  * cannot distinguish filter-joins from expanding joins, so entries
  * relying on a non-reducing join for their pass must justify
  * themselves in the allowlist instead.
  */
class ScaleLintSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Columns whose distinct-value count is fixed by the DATA DOMAIN,
    * not by N: a window partitioned only by these keys has O(1)
    * partitions no matter how large the corpus grows.
    */
  private val boundedDomainCols = Set(
    // events
    "event_type", "et", "src", "dst", "ends_with", "resumes_with",
    // orders / lineitem enums
    "o_orderpriority", "pri", "priority", "o_orderstatus", "status",
    "l_returnflag", "l_linestatus", "l_shipmode", "l_shipinstruct",
    // dimensions with fixed row counts
    "r_name", "n_name", "region", "nation",
    // part / customer enums
    "p_brand", "p_mfgr", "p_container", "c_mktsegment", "mktsegment",
    // documents enums (20 sources / handful of langs at every SF)
    "source", "lang", "segment")

  /** Allowlisted (query, window-partition-key) pairs: windows the lint
    * flags but whose single-task group is justified. Keep empty unless
    * a justification is written here AND in the operator's comment.
    */
  private val allow: Map[String, String] = Map.empty

  private def constantKey(w: Window): Boolean = {
    val refs = w.partitionSpec.flatMap(_.references.map(_.name.toLowerCase))
    refs.forall(boundedDomainCols.contains)
  }

  private def reduced(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: Deduplicate | _: GlobalLimit | _: LocalLimit => true
    case _: graft.plans.TopKPerGroupNode => true // k rows per group
    case other => other.children.exists(reduced)
  }

  test("no window partitions a corpus-scale frame by a constant-cardinality key") {
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
    assert(catalog.size >= 266, s"catalog shrank to ${catalog.size} entries")
    val offenders = catalog.flatMap { case (name, fn) =>
      if (allow.contains(name)) Nil
      else {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        plan.collect {
          case w: Window if constantKey(w) && !reduced(w.child) =>
            val key =
              if (w.partitionSpec.isEmpty) "<global>"
              else w.partitionSpec.flatMap(_.references.map(_.name))
                .distinct.mkString(",")
            s"$name[$key]"
        }
      }
    }
    assert(offenders.isEmpty,
      "constant-cardinality window over an unreduced corpus frame " +
        "(one task sorts N/k rows at 100x — re-plan on the q257 " +
        s"two-pass bucket or count-per-value pattern): ${offenders.mkString("; ")}")
  }
}
