package graft.tmp
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q94_rare_bigrams")(spark, "/root/testdata/sf0.01").count()
      println(f"PROBE r$r q94 rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(graft.SparkEntry.queries("q94_rare_bigrams")(spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
