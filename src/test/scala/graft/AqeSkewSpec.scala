package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with a hot key dominating one side, adaptive
  * execution splits the skewed partition at runtime (skew=true on the
  * sort-merge join) — the no-code-change complement to the manual
  * salting ops (q39/q66).
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // tiny thresholds so local data triggers the skew machinery
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // left: 200k rows, 99% on key 7 (the hot key); right: all keys
      val left = spark.range(0, 200000, 1, 8)
        .select(when(col("id") % 100 =!= 0, 7L).otherwise(col("id") % 50)
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 50).select(col("id").as("k"),
        (col("id") * 10).as("rv"))
      // no aggregation downstream: OptimizeSkewedJoin declines when the
      // split would force an extra shuffle for a later stage
      val joined = left.join(right, "k")
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew handling did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
