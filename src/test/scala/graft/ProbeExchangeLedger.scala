package graft

import org.apache.spark.sql.SparkSession

/** Generator for the exchange ledger: walk the catalog at sf0.001 and
  * record each query's (shuffle, broadcast) exchange counts from the
  * pre-execution physical plan. Output is the TSV the ScaleLintSpec
  * ratchet pins (copy to src/test/resources/exchange_ledger.tsv after
  * a DELIBERATE plan change — the diff of that file is the reviewable
  * record of where the shuffles moved).
  *
  * Session config matches SparkSpec exactly (master, shuffle
  * partitions): exchange COUNTS don't depend on partition numbers, but
  * generating under the same config the spec asserts under removes the
  * question.
  *
  * Run: sbt "Test/runMain graft.ProbeExchangeLedger"
  * then: cp /tmp/exchange_ledger.tsv src/test/resources/
  */
object ProbeExchangeLedger {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (s, b) = ScaleLint.exchangeCounts(
        fn(spark, sf).queryExecution)
      println(s"[xl] $name\t$s\t$b")
      s"$name\t$s\t$b"
    }
    val out = java.nio.file.Paths.get("/tmp/exchange_ledger.tsv")
    java.nio.file.Files.write(out,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    val totS = lines.map(_.split("\t")(1).toInt).sum
    val totB = lines.map(_.split("\t")(2).toInt).sum
    println(s"[xl] done n=${lines.size} shuffles=$totS broadcasts=$totB -> $out")
    spark.stop()
  }
}
