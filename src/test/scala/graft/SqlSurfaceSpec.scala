package graft

import org.apache.spark.sql.functions._
import graft.ops.{SqlSurface, WarehouseOps}

/** The SQL surface (VERDICT r10 #6): views resolve, derived views stay
  * in lockstep with their DataFrame definitions, and the view layer is
  * physically transparent (pushdown reaches the scan THROUGH a view).
  */
class SqlSurfaceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("registerViews binds every base table and derivation, lazily") {
    SqlSurface.registerViews(spark, dir)
    val expected = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings",
      "exact_canonical", "copurchase_edges", "repeat_copurchase_edges",
      "bank")
    expected.foreach { v =>
      assert(spark.catalog.tableExists(v), s"view $v not registered")
      assert(spark.table(v).schema.nonEmpty, s"view $v has no schema")
    }
  }

  test("SQL over a derived view equals the DataFrame API definition") {
    SqlSurface.registerViews(spark, dir)
    val viaSql = spark.sql("SELECT u, v FROM copurchase_edges")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaApi = WarehouseOps.coPurchasePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaApi,
      "copurchase_edges view diverged from coPurchasePairs")
    assert(viaSql.nonEmpty)
  }

  test("filter pushdown reaches the parquet scan through a view") {
    SqlSurface.registerViews(spark, dir)
    val plan = spark.sql(
      "SELECT doc_id FROM documents WHERE doc_id = 42")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("IsNotNull(doc_id)"),
      s"view layer blocked scan pushdown:\n$plan")
    // Column pruning: only doc_id read, not text.
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"view layer blocked column pruning:\n$plan")
  }

  test("q276 flagship matches the DataFrame-API equivalent") {
    val sql = SparkEntry.queries("q276_sql_surface")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val x = SqlSurface.exactCanonical(spark, dir)
    val api = graft.ops.TestData.table(spark, dir, "documents").as("d")
      .join(x.as("x"), col("d.doc_id") === col("x.doc_id"))
      .groupBy(col("d.lang").as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("d.doc_id") === col("x.canonical_id"), 1)
          .otherwise(0)).as("n_canonical"),
        countDistinct(col("x.canonical_id")).as("n_groups"))
      .orderBy("lang")
      .collect().map(_.toSeq).toSeq
    assert(sql == api, s"SQL surface flagship diverged:\n$sql\nvs\n$api")
    assert(sql.nonEmpty)
  }
}
