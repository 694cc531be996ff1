package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 probe #2: refine the connectedComponents winner from
  * ProbeR15CC (seed+union-round C beat shipped A: q64 1.44->0.98,
  * q121 2.50->2.09; dropping the pointer jump is locally fastest but
  * gives up the O(log d) chain guard, so only jump-preserving variants
  * are adoption candidates):
  *
  *  C   seed + union-round + jump both rounds (ProbeR15CC winner)
  *  G   C + LAST-ROUND convergence: observe round 2's delta separately;
  *      if the final round changed nothing the fixpoint is certified —
  *      no confirm iteration
  *  H   G but jump only on round 2 of each iteration (half the jump
  *      cost, keeps O(log d) rounds asymptotically)
  *  I   G + lazy seeded init (no separate init checkpoint job)
  *
  * Run: sbt "Test/runMain graft.ProbeR15CC2"
  */
object ProbeR15CC2 {

  // jumpRounds: which in-iteration rounds (0-based) pointer-jump.
  private def ccVariant(pairs: DataFrame, lastRound: Boolean,
                        jumpRounds: Set[Int], lazyInit: Boolean): DataFrame = {
    val edges = ops.PartitionedCheckpoint.byKeys(
      pairs.toDF("d1", "d2").unionByName(
        pairs.toDF("d2", "d1").select(col("d1"), col("d2"))),
      "d2")
    val init = edges.groupBy(col("d1").as("v"))
      .agg(least(min(col("d2")), col("d1")).as("c"))
      .select(col("v"), col("c"))
    var comp = if (lazyInit) init else init.localCheckpoint(eager = true)
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < 24) {
      val obs = org.apache.spark.sql.Observation(s"ccw_changed_$iters")
      val rounds = 2
      val body = (0 until rounds)
        .foldLeft(comp.withColumn("c0", col("c"))) {
          case (cur, r) =>
            val pre = if (lastRound && r == rounds - 1)
              cur.withColumn("cL", col("c")) else cur
            val carry: Seq[String] = if (pre.columns.contains("cL"))
              Seq("c0", "cL") else Seq("c0")
            val m2 = edges.join(pre, col("d2") === col("v"))
              .select(Seq(col("d1").as("v"), col("c")) ++
                carry.map(n => lit(null).cast("long").as(n)): _*)
              .unionByName(pre.select(
                Seq(col("v"), col("c")) ++ carry.map(col): _*))
            val prop = m2.groupBy("v")
              .agg(min("c").as("c"),
                carry.map(n => max(col(n)).as(n)): _*)
            if (jumpRounds.contains(r)) {
              val keep = prop.columns.filter(c2 => c2 != "v" && c2 != "c")
              prop.as("p").join(
                  prop.select(col("v").as("jv"), col("c").as("jc")),
                  col("p.c") === col("jv"), "left")
                .select(Seq(col("p.v").as("v"),
                  least(col("p.c"), coalesce(col("jc"), col("p.c"))).as("c")) ++
                  keep.map(k => col(s"p.$k").as(k)): _*)
            } else prop
        }
      val watched =
        if (lastRound)
          body.observe(obs,
            coalesce(sum((col("c") =!= col("cL")).cast("long")), lit(0L))
              .as("changed"))
        else
          body.observe(obs,
            coalesce(sum((col("c") =!= col("c0")).cast("long")), lit(0L))
              .as("changed"))
      val next = watched.localCheckpoint(eager = true)
      changed = obs.get("changed").asInstanceOf[Long]
      if (!lazyInit || iters > 0)
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoints(comp)
      comp = next.select("v", "c")
      iters += 1
    }
    require(changed == 0, s"variant did not converge in $iters iters")
    println(s"    [cc2] iters=$iters")
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
    val specs: Seq[(String, (Boolean, Set[Int], Boolean))] = Seq(
      ("C_base", (false, Set(0, 1), false)),
      ("G_lastround", (true, Set(0, 1), false)),
      ("H_jump2nd", (true, Set(1), false)),
      ("I_lazyinit", (true, Set(0, 1), true)))

    graphs.foreach { case (gname, g) =>
      println(s"== graph $gname: ${g.count()} pairs")
      val ref = ops.DedupOps.connectedComponents(g)
        .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      specs.foreach { case (vname, (lr, jr, li)) =>
        val out = ccVariant(g, lr, jr, li)
          .orderBy("v").collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSeq
        require(out == ref, s"$vname DIVERGES on $gname")
        println(s"  [cc2] $vname identical on $gname")
      }
      specs.foreach { case (vname, (lr, jr, li)) =>
        val walls = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val out = ccVariant(g, lr, jr, li)
          out.count()
          val w = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoints(out)
          w
        }
        println(f"  [cc2] $gname $vname walls=${walls.map(w => f"$w%.2f").mkString(",")} min=${walls.min}%.2f")
      }
    }
    spark.stop()
  }
}
