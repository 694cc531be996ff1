package graft.tmp

import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val ev = graft.ops.TestData.table(spark, dir, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").as("pts"))
    val c = ev.where(col("event_type") === "click").select(col("ts").as("cts"))
    val j = p.join(c,
      col("cts") <= col("pts") &&
      col("cts") >= col("pts") - expr("INTERVAL 60 SECONDS"))
    println("=== ANALYZED ===")
    println(j.queryExecution.analyzed.treeString)
    println("=== OPTIMIZED ===")
    println(j.queryExecution.optimizedPlan.treeString)
    val cond = j.queryExecution.optimizedPlan.collectFirst {
      case join: org.apache.spark.sql.catalyst.plans.logical.Join => join.condition.get
    }.get
    println("=== COND TREE ===")
    def dump(e: org.apache.spark.sql.catalyst.expressions.Expression, ind: String = ""): Unit = {
      println(s"$ind${e.getClass.getName}  :: $e :: ${e.dataType}")
      e.children.foreach(dump(_, ind + "  "))
    }
    dump(cond)
    spark.stop()
  }
}
