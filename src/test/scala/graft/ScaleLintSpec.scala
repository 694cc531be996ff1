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
  * aggregated does NOT pass by subtree inspection (ADVICE r8: an
  * Aggregate on the small dimension side of an EXPANDING join proved
  * nothing about the probe side) — for Join and Union nodes the
  * reduction must hold on EVERY branch, and the known-good
  * filter-joins (the q48/q56 pass-2 broadcast locate, which keeps
  * ~1/buckets of the corpus) go through the allowlist with their
  * justification written down.
  *
  * Maintenance note: `boundedDomainCols` is a NAME-based set — when new
  * testdata columns with domain-bounded cardinality appear (a new enum
  * in a table, a new derived label), add them here or windows keyed on
  * them sail past the lint unexamined.
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

  /** Allowlisted offender signatures ("query[window-key]"): windows the
    * strict join rule flags but whose input frame is PROVABLY not
    * corpus-grain — every entry here is the pass-2 element rank of a
    * two-pass bucket locate, whose window input is the located bucket's
    * slice (~1/buckets of the group, bounded by the bucket width)
    * behind a broadcast filter-join. The lint cannot tell a reducing
    * filter-join from an expanding join (ADVICE r8), so these carry
    * their justification in text instead. Keyed by the full offender
    * signature, NOT the query name, so other windows in the same query
    * stay linted.
    */
  private val allow: Map[String, String] = Map(
    "q48_median_order_value[pri]" ->
      "pass-2 rank over the located 1024-cent bucket (broadcast locate-filter)",
    "q56_grouped_p90[et]" ->
      "pass-2 rank over the located bucket (broadcast locate-filter)",
    "q115_mad_outliers[o_orderpriority]" ->
      "OrderStat.locateRank pass-2 over the located bucket (x2: med + MAD)",
    "q187_weighted_median[n_name]" ->
      "weighted pass-2 over the located balance bucket (broadcast locate-filter)",
    "q271_recursive_median[<global>]" ->
      "level-2 element rank over a <=1024-cent slice (two broadcast locates)")

  private def constantKey(w: Window): Boolean = {
    val refs = w.partitionSpec.flatMap(_.references.map(_.name.toLowerCase))
    refs.forall(boundedDomainCols.contains)
  }

  private def reduced(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: Deduplicate | _: GlobalLimit | _: LocalLimit => true
    case _: graft.plans.TopKPerGroupNode => true // k rows per group
    // Multi-branch nodes: every branch must be reduced — an Aggregate
    // on one side of a join (or one arm of a union) says nothing about
    // the corpus-grain rows flowing through the other (ADVICE r8).
    case j: Join => reduced(j.left) && reduced(j.right)
    case u: Union => u.children.forall(reduced)
    case other => other.children.exists(reduced)
  }

  test("no window partitions a corpus-scale frame by a constant-cardinality key") {
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
    assert(catalog.size == CatalogContract.expectedSize,
      s"catalog is ${catalog.size} entries, expected " +
        s"${CatalogContract.expectedSize} (bump CatalogContract on growth)")
    val offenders = catalog.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      plan.collect {
        case w: Window if constantKey(w) && !reduced(w.child) =>
          val key =
            if (w.partitionSpec.isEmpty) "<global>"
            else w.partitionSpec.flatMap(_.references.map(_.name))
              .distinct.mkString(",")
          s"$name[$key]"
      }
    }.distinct.filterNot(allow.contains)
    assert(offenders.isEmpty,
      "constant-cardinality window over an unreduced corpus frame " +
        "(one task sorts N/k rows at 100x — re-plan on the q257 " +
        s"two-pass bucket or count-per-value pattern): ${offenders.mkString("; ")}")
  }
}
