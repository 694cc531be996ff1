package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the 100 TB pattern for repeated large-table
  * joins — pay one shuffle at WRITE time (bucketBy the join key), then
  * every subsequent join on that key runs with ZERO exchanges.
  */
class BucketingSpec extends SparkSpec {

  test("hive-style partitioned write prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.ops.TestData.table(spark, "/root/testdata/sf0.001", "orders")
      .write.partitionBy("o_orderpriority").parquet(s"$dir/orders_part")
    val df = spark.read.parquet(s"$dir/orders_part")
      .where(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"partition filter not pushed:\n$plan")
    // the data filter list must be empty: pruning happened at metadata
    // level, no row-level o_orderpriority filter remains
    assert(!plan.contains("PushedFilters: [IsNotNull(o_orderpriority)"),
      s"filter degraded to row level:\n$plan")
  }

  test("join of tables bucketed on the key needs no shuffle") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val sf = "/root/testdata/sf0.001"
    val orders = graft.ops.TestData.table(spark, sf, "orders")
    val customer = graft.ops.TestData.table(spark, sf, "customer")

    orders.write.format("parquet").bucketBy(8, "o_custkey")
      .option("path", s"$wh/orders_b").mode("overwrite")
      .saveAsTable("orders_b")
    customer.write.format("parquet").bucketBy(8, "c_custkey")
      .option("path", s"$wh/customer_b").mode("overwrite")
      .saveAsTable("customer_b")
    try {
      // force a sort-merge join so broadcast can't hide the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself reads bucketed scans directly: the only exchange
      // allowed is the one for the final groupBy on a different key
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
      assert(exchanges.size == 1, s"join shuffled despite buckets:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
