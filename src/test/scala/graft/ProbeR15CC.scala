package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 probe: connectedComponents loop variants. ProbeR15Jobs
  * showed the CC-family heavies spend their walls on dozens of tiny
  * sequential AQE stage-jobs (q121: 73 jobs x ~30 ms + 1.1 s driver
  * gaps), so the lever is rounds-to-converge and operators-per-round,
  * not per-task compute. Variants (all must yield the IDENTICAL
  * (v, c) set — checked before any timing):
  *
  *  A  shipped loop (init v->v, 2 rounds/iter, join+leftjoin+jump per round)
  *  B  seeded init: comp0 = least(d1, min(d2)) from one aggregate —
  *     fuses the first propagation round into the init exchange
  *  C  B + union-formulated round: msgs = (edges join cur) UNION cur,
  *     one groupBy(min) — drops the per-round left-join
  *  D  C + 3 rounds per checkpoint (fewer checkpoint jobs + observes)
  *  E  B + no pointer jump (plain flooding) — is the jump self-join
  *     pulling its weight at these diameters?
  *
  * Run: sbt "Test/runMain graft.ProbeR15CC"
  */
object ProbeR15CC {

  private def ccVariant(pairs: DataFrame, seeded: Boolean,
                        unionRound: Boolean, roundsPerIter: Int,
                        jump: Boolean): DataFrame = {
    val edges = ops.PartitionedCheckpoint.byKeys(
      pairs.toDF("d1", "d2").unionByName(
        pairs.toDF("d2", "d1").select(col("d1"), col("d2"))),
      "d2")
    var comp =
      (if (seeded)
        edges.groupBy(col("d1").as("v"))
          .agg(least(min(col("d2")), col("d1")).as("c"))
          .select(col("v"), col("c"))
      else
        edges.select(col("d1").as("v")).distinct()
          .withColumn("c", col("v")))
        .localCheckpoint(eager = true)
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < 24) {
      val obs = org.apache.spark.sql.Observation(s"ccv_changed_$iters")
      val next = (0 until roundsPerIter)
        .foldLeft(comp.withColumn("c0", col("c"))) {
          case (cur, _) =>
            val prop =
              if (unionRound) {
                val msgs = edges.join(cur, col("d2") === col("v"))
                  .select(col("d1").as("v"), col("c"),
                    lit(null).cast("long").as("c0"))
                  .unionByName(cur.select(col("v"), col("c"), col("c0")))
                msgs.groupBy("v")
                  .agg(min("c").as("c"), max("c0").as("c0"))
              } else {
                val nbrMin = edges.join(cur, col("d2") === col("v"))
                  .groupBy(col("d1")).agg(min("c").as("nc"))
                cur.join(nbrMin, col("v") === col("d1"), "left")
                  .select(col("v"),
                    least(col("c"), coalesce(col("nc"), col("c"))).as("c"),
                    col("c0"))
              }
            if (jump)
              prop.as("p").join(
                  prop.select(col("v").as("jv"), col("c").as("jc")),
                  col("p.c") === col("jv"), "left")
                .select(col("p.v").as("v"),
                  least(col("p.c"), coalesce(col("jc"), col("p.c"))).as("c"),
                  col("p.c0").as("c0"))
            else prop
        }
        .observe(obs, coalesce(
          sum((col("c") =!= col("c0")).cast("long")), lit(0L))
          .as("changed"))
        .localCheckpoint(eager = true)
      changed = obs.get("changed").asInstanceOf[Long]
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoints(comp)
      comp = next.select("v", "c")
      iters += 1
    }
    require(changed == 0, s"variant did not converge in $iters iters")
    println(s"    [cc] iters=$iters (rounds=${roundsPerIter * iters})")
    comp
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // q64's pair graph and q121's verified pair graph, checkpointed so
    // every variant starts from the same materialized edge list.
    val jp = ops.DedupOps.jaccardPairs(
        ops.TestData.table(spark, dir, "documents"))
      .where(col("jaccard") >= 0.5).select("d1", "d2")
      .localCheckpoint(eager = true)
    val c = ops.TestData.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"))
    val variants = ops.ExtendedOps.deletionVariants(c, "c_name",
        Seq("c_custkey", "c_nationkey", "c_mktsegment"))
      .localCheckpoint(eager = true)
    val cand = variants.as("a").hint("shuffle_hash")
      .join(variants.as("b"),
        col("a.vh") === col("b.vh") &&
          col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.c_mktsegment") === col("b.c_mktsegment") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("d1"), col("b.c_custkey").as("d2"))
      .distinct()
    val names = c.select(col("c_custkey"), col("c_name"))
    val q121pairs = cand
      .join(names.select(col("c_custkey").as("d1"), col("c_name").as("n1")), "d1")
      .join(names.select(col("c_custkey").as("d2"), col("c_name").as("n2")), "d2")
      .where(graft.functions.LevWithin.levWithin(col("n1"), col("n2"), 2))
      .select(col("d1"), col("d2"))
      .localCheckpoint(eager = true)

    val graphs = Seq("q64_jp" -> jp, "q121_pairs" -> q121pairs)
    val specs = Seq(
      ("A_shipped", (false, false, 2, true)),
      ("B_seeded", (true, false, 2, true)),
      ("C_seed_union", (true, true, 2, true)),
      ("D_seed_union_r3", (true, true, 3, true)),
      ("E_seed_nojump", (true, false, 2, false)))

    graphs.foreach { case (gname, g) =>
      println(s"== graph $gname: ${g.count()} pairs")
      // identity check vs shipped
      val ref = ccVariant(g, seeded = false, unionRound = false,
        roundsPerIter = 2, jump = true)
        .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      specs.drop(1).foreach { case (vname, (s2, u, r, j)) =>
        val out = ccVariant(g, s2, u, r, j)
          .orderBy("v").collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSeq
        require(out == ref, s"$vname DIVERGES on $gname")
        println(s"  [cc] $vname identical on $gname")
      }
      // alternating A/B timing x3 per variant
      specs.foreach { case (vname, (s2, u, r, j)) =>
        val walls = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val out = ccVariant(g, s2, u, r, j)
          out.count()
          val w = (System.nanoTime() - t0) / 1e9
          // release only this run's surviving checkpoint blocks (the
          // probe's own input checkpoints must stay alive)
          org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoints(out)
          w
        }
        println(f"  [cc] $gname $vname walls=${walls.map(w => f"$w%.2f").mkString(",")} min=${walls.min}%.2f")
      }
    }
    spark.stop()
  }
}
