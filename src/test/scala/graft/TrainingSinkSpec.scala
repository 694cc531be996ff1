package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{TestData, TrainDataOps}

/** The curation sink: keep-listed docs written partitioned by split and
  * bucketed by doc_id, so downstream readers prune splits at metadata
  * level and join on doc_id with zero exchanges.
  */
class TrainingSinkSpec extends SparkSpec {

  test("training-set write: split partitions + bucketed zero-shuffle join") {
    val wh = Files.createTempDirectory("graft-trainset").toString
    val docs = TestData.table(spark, "/root/testdata/sf0.001", "documents")
    val written = TrainDataOps.writeTrainingSet(
      docs, "trainset_b", s"$wh/trainset", buckets = 8)
    try {
      val expected = graft.SparkEntry
        .queries("q96_curation_pipeline")(spark, "/root/testdata/sf0.001")
        .where(col("final_keep") === 1).count()
      assert(written == expected && written > 0)

      // hive-style split partitions exist on disk
      val dirs = new java.io.File(s"$wh/trainset").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.exists(_.startsWith("split=")), dirs.mkString(","))

      // a doc_id join against a same-bucketed table needs no exchange
      // on either side (force sort-merge so broadcast can't hide it)
      TestData.table(spark, "/root/testdata/sf0.001", "embeddings")
        .withColumn("doc_id", col("vec_id"))
        .write.format("parquet").bucketBy(8, "doc_id")
        .option("path", s"$wh/emb_b").mode("overwrite").saveAsTable("emb_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("trainset_b")
        .join(spark.table("emb_b"), "doc_id")
        .select("doc_id", "label")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join shuffled:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        10 * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS trainset_b")
      spark.sql("DROP TABLE IF EXISTS emb_b")
    }
  }
}
