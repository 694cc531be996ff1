package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-shot measurement main (VERDICT r9 #3): q274's rerank is a
  * SHUFFLE_HASH join on the IVF cell id, and AQE's skew-split does not
  * cover shuffled-hash joins the way it covers sort-merge — so a hot
  * cell concentrates ALL of its candidate pairs (queries-probing-cell
  * x cell-size) in the single task that owns its cid. This probe
  * quantifies that posture at sf0.1 for the catalog's default k and
  * for a larger k (the 100 TB path — `graft.kmeans.k` grows with the
  * corpus):
  *   - per-cell corpus occupancy (rows, share, max/ideal ratio),
  *   - per-cell probe fan-in (queries whose 2-nearest-cells include it),
  *   - per-cell candidate pairs and the max cell's share of all pairs.
  * Results land in PLANS.md ("Round-10 q274 hot-cell posture").
  *
  * Run: sbt "Test/runMain graft.ProbeQ274Cells"
  */
object ProbeQ274Cells {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cellStats(k: Int): Unit = {
      val points = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cent = ops.TrainDataOps.kmeansCentroids(points, k)
      val cells = ops.TrainDataOps.kmeansAssign(points, cent)
        .select("vec_id", "cid")
      val occ = cells.groupBy("cid").agg(count(lit(1)).as("rows"))
        .localCheckpoint(eager = true)
      val n = points.count()
      // Probe fan-in: the SHARED 2-nearest-cells rule (ADVICE r10: call
      // TrainDataOps.ivfProbedCells instead of an inline copy, so the
      // posture this probe measures is definitionally the rule q199 and
      // q274 execute).
      val qs = points.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val probed = ops.TrainDataOps.ivfProbedCells(qs, cent).drop("qv")
      val fanIn = probed.groupBy("cid").agg(count(lit(1)).as("queries"))
      val perCell = occ.join(fanIn, Seq("cid"), "left")
        .na.fill(0, Seq("queries"))
        .select(col("cid"), col("rows"), col("queries"),
          (col("rows") * col("queries")).as("pairs"))
        .orderBy(desc("pairs"))
      val rowsByCell = perCell.collect()
      val totPairs = rowsByCell.map(_.getAs[Long]("pairs")).sum
      val maxRows = rowsByCell.map(_.getAs[Long]("rows")).max
      val maxPairs = rowsByCell.map(_.getAs[Long]("pairs")).max
      val ideal = n.toDouble / k
      println(f"k=$k%d n=$n%d cells=${rowsByCell.length}%d " +
        f"max_cell_rows=$maxRows%d (x${maxRows / ideal}%.2f ideal) " +
        f"total_pairs=$totPairs%d max_cell_pairs=$maxPairs%d " +
        f"(share ${100.0 * maxPairs / math.max(totPairs, 1)}%.1f%%)")
      rowsByCell.take(12).foreach(r => println(
        s"  cid=${r.getAs[Int]("cid")} rows=${r.getAs[Long]("rows")} " +
          s"queries=${r.getAs[Long]("queries")} pairs=${r.getAs[Long]("pairs")}"))
    }

    cellStats(8)   // catalog default (kmeansK fallback)
    cellStats(64)  // the 100 TB direction: k grows with the corpus
    spark.stop()
  }
}
