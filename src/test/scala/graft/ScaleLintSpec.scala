package graft

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
  * ~1/buckets of the corpus) go through the allowlist, each entry now
  * MEASURED by ScaleLintMeasureSpec rather than prose-justified
  * (VERDICT r9 #1).
  *
  * The bounded-domain column set is the union of a hand list of plan
  * aliases and a set DERIVED from the testdata's own distinct counts
  * (VERDICT r9 #6) — see ScaleLint.derivedBoundedCols.
  */
class ScaleLintSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** ONE catalog walk shared by the catalog-wide lints (r15 review:
    * each walk rebuilds every query DataFrame, and for the five
    * streaming gates that runs a full AvailableNow replay just to read
    * a plan — independent walks paid that replay cost once per lint).
    * The QueryExecution caches both the optimized logical plan (the
    * window/cartesian lints) and the physical plan (the exchange
    * ledger), so every lint reads the same planning pass.
    */
  private lazy val catalogQEs
  : Seq[(String, org.apache.spark.sql.execution.QueryExecution)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution
    }

  private def optimizedPlans
  : Seq[(String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    catalogQEs.map { case (name, qe) => name -> qe.optimizedPlan }

  test("no window partitions a corpus-scale frame by a constant-cardinality key") {
    val bounded = ScaleLint.boundedDomainCols(spark)
    assert(optimizedPlans.size == CatalogContract.expectedSize,
      s"catalog is ${optimizedPlans.size} entries, expected " +
        s"${CatalogContract.expectedSize} (bump CatalogContract on growth)")
    val offenders = optimizedPlans.flatMap { case (name, plan) =>
      ScaleLint.flagged(name, plan, bounded).map(_._1)
    }.distinct.filterNot(ScaleLint.allow.contains)
    assert(offenders.isEmpty,
      "constant-cardinality window over an unreduced corpus frame " +
        "(one task sorts N/k rows at 100x — re-plan on the q257 " +
        s"two-pass bucket or count-per-value pattern): ${offenders.mkString("; ")}")
  }

  test("no condition-less join multiplies two unbounded frames") {
    // corpus x corpus cartesian products cannot ship at any scale; a
    // condition-less join is only sane when one side is provably O(1)
    // rows (a global aggregate, a literal frame, a literal limit) —
    // the crossJoin(broadcast(scalarAgg)) pattern the catalog uses for
    // anchors and denominators. Walks every query's optimized plan.
    val offenders = optimizedPlans.flatMap { case (name, plan) =>
        ScaleLint.cartesianFlagged(name, plan).map(_._1)
      }.distinct.filterNot(ScaleLint.cartesianAllow.contains)
    assert(offenders.isEmpty,
      s"unbounded cartesian product in: ${offenders.mkString(", ")}")
  }

  test("allowlisted cartesians keep a bounded small side (measured)") {
    // The window-allowlist discipline (VERDICT r9 #1) applied to the
    // cartesian allowlist: each entry's justification is a COUNT at two
    // SFs, not prose. The smaller side of every flagged join must stay
    // under its declared bound at sf0.001 AND sf0.01 — a side that
    // grows with the corpus blows the bound at the larger SF.
    ScaleLint.cartesianBound.foreach { case (name, bound) =>
      Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.optimizedPlan
        val joins = ScaleLint.cartesianFlagged(name, plan).map(_._2)
        assert(joins.nonEmpty,
          s"$name: allowlisted but nothing flagged at $dir — stale entry")
        joins.foreach { j =>
          val minSide = math.min(
            org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, j.left)
              .count(),
            org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, j.right)
              .count())
          assert(minSide <= bound,
            s"$name at $dir: smaller cartesian side has $minSide rows " +
              s"(bound $bound)")
        }
      }
    }
    // q199 is justification-only (the exact-recall audit is quadratic
    // by construction); every other allowlisted entry must be measured.
    assert(ScaleLint.cartesianAllow.keySet --
      ScaleLint.cartesianBound.keySet == Set("q199_ivf_topk"),
      "every cartesianAllow entry except the q199 audit needs a bound")
  }

  test("no global window runs over a corpus-grain frame") {
    // VERDICT r14 #4: the constant-key lint accepts ANY Aggregate as
    // reduction, so a global (no-partition) window above a CORPUS-KEYED
    // Aggregate — per-part revenue, per-customer rank: dimension-sized
    // but corpus-GROWING — funneled a growing frame through one task
    // unseen. The grain test proves the window input bounded by value
    // domains (or the OrderStat chunk contract); everything else is
    // either allowlisted with a measured bound below or exempt via
    // `allow` (located slices under the share-plus-growth discipline).
    val bounded = ScaleLint.boundedDomainCols(spark)
    val offenders = optimizedPlans.flatMap { case (name, plan) =>
        ScaleLint.globalWindowFlagged(name, plan, bounded).map(_._1)
      }.distinct
      .filterNot(ScaleLint.globalWindowAllow.contains)
      .filterNot(ScaleLint.allow.contains)
    assert(offenders.isEmpty,
      "global window over a corpus-grain frame (one task sorts the " +
        "whole frame at 100x — re-plan on OrderStat's two-level scan " +
        s"or the q257 bucket pattern): ${offenders.mkString("; ")}")
  }

  test("allowlisted global windows keep a bounded input (measured)") {
    // Same discipline as the cartesian allowlist: each entry's
    // justification is a COUNT at two SFs, not prose — a corpus-
    // growing input blows its bound at the larger SF.
    val bounded = ScaleLint.boundedDomainCols(spark)
    ScaleLint.globalWindowBound.foreach { case (sig, bound) =>
      val qname = sig.takeWhile(_ != '[')
      Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
        val plan = SparkEntry.queries(qname)(spark, dir)
          .queryExecution.optimizedPlan
        val ws = ScaleLint.globalWindowFlagged(qname, plan, bounded)
          .filter(_._1 == sig).map(_._2)
        assert(ws.nonEmpty,
          s"$sig: allowlisted but nothing flagged at $dir — stale entry")
        ws.foreach { w =>
          val in = org.apache.spark.sql.graftbridge.Bridge
            .ofRows(spark, w.child).count()
          assert(in <= bound,
            s"$sig at $dir: global-window input has $in rows (bound $bound)")
        }
      }
    }
    assert(ScaleLint.globalWindowAllow.keySet ==
      ScaleLint.globalWindowBound.keySet,
      "every globalWindowAllow entry needs a measured bound")
  }

  test("exchange ledger: no query grows a shuffle or broadcast") {
    // The cheapest structural cost model of the whole catalog: each
    // query's (shuffle, broadcast) exchange counts from the
    // pre-execution physical plan, pinned exactly against
    // src/test/resources/exchange_ledger.tsv (generated by
    // ProbeExchangeLedger under this spec's session config). Every
    // shuffle is a cluster-wide data movement at 100 TB; a refactor
    // that silently adds one — or trades a broadcast for a shuffle —
    // fails here with the per-query delta, and a DELIBERATE re-plan
    // updates the TSV, making the diff the reviewable record of where
    // the shuffles moved.
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/exchange_ledger.tsv"), "UTF-8")
    val pinned = try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(n, s, b) = l.split("\t")
      n -> (s.toInt, b.toInt)
    }.toMap finally src.close()
    val actual = catalogQEs.map { case (name, qe) =>
      name -> ScaleLint.exchangeCounts(qe)
    }.toMap
    assert(pinned.keySet == actual.keySet,
      s"ledger/catalog key drift: only-ledger=${pinned.keySet -- actual.keySet} " +
        s"only-catalog=${actual.keySet -- pinned.keySet} " +
        "(regenerate via ProbeExchangeLedger)")
    val drift = actual.toSeq.sorted.collect {
      case (n, a) if a != pinned(n) =>
        s"$n: shuffles ${pinned(n)._1}->${a._1}, broadcasts ${pinned(n)._2}->${a._2}"
    }
    assert(drift.isEmpty,
      s"exchange counts drifted (deliberate re-plan? regenerate the " +
        s"TSV via ProbeExchangeLedger):\n${drift.mkString("\n")}")
  }

  test("derived bounded-domain set sees the testdata enums") {
    // Guard the derivation itself: the known enums must be discovered
    // from data (not just hand-listed), and corpus-growing key/text
    // columns must never qualify — if the derivation broke toward
    // "everything bounded", the lint would flag half the catalog; if
    // toward "nothing bounded", new enums would escape silently.
    val derived = ScaleLint.derivedBoundedCols(spark)
    val mustHave = Set("event_type", "o_orderpriority", "o_orderstatus",
      "l_returnflag", "l_linestatus", "c_mktsegment", "p_brand",
      "n_name", "r_name", "source", "lang")
    assert((mustHave -- derived).isEmpty,
      s"testdata enums missing from derivation: ${mustHave -- derived}")
    val mustNotHave = Set("o_orderkey", "l_orderkey", "c_custkey",
      "doc_id", "text", "event_id", "user_id", "ts", "o_totalprice")
    assert((mustNotHave & derived).isEmpty,
      s"corpus-growing columns wrongly derived as bounded: " +
        s"${mustNotHave & derived}")
  }
}
