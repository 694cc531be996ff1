package graft

import org.apache.spark.sql.SparkSession

/** One-off oracle pre-check harness: run a catalog query at sf0.01 and
  * dump result + oracle SQL for a DuckDB comparison outside sbt.
  */
object OracleCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q279_streaming_late_drop_gate")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    names.foreach { name =>
      SparkEntry.queries(name)(spark, dir)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/oracle_check/$name.parquet")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/oracle_check/$name.sql"),
        SparkEntry.oracleSql(name).getBytes)
      println(s"[dbg] wrote /tmp/oracle_check/$name")
    }
    spark.stop()
  }
}
