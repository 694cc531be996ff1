package graft.tmp
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q89_chunk_dedup", "q90_bm25_topk", "q94_rare_bigrams", "q97_training_shuffle")) {
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      println(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0).linesIterator
        .map(_.replaceAll("#\\d+L?", "").take(120)).take(30).mkString("\n"))
    }
    spark.stop()
  }
}
