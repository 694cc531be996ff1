package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator catalog module; each entry has
  * DuckDB-oracle SQL in `oracleSql` unless the operator is approximate /
  * engine-hash-dependent (driver then records a rows-only check).
  */
object SparkEntry {

  private def catalogs: Seq[Map[String, Q]] = Seq(
    RefQueries.all,
    TextOps.all,
    TextOps.ensemble,
    DedupOps.all,
    SimilarityOps.all,
    AnalyticsOps.all,
    MultimodalOps.all,
    ScaleOps.all,
    RelationalOps.all,
    ExtendedOps.all,
    TrainDataOps.all,
    SketchOps.all,
    SketchOps.bitmaps,
    WarehouseOps.all,
    PipelineObsOps.all,
    ScorecardOps.all,
    CorpusStatsOps.all,
    EventFlowOps.all,
    GovernanceOps.all,
    SqlSurface.all,
    StreamingGate.all
  )

  private lazy val catalog: Map[String, Q] = {
    val merged = catalogs.reduce(_ ++ _)
    require(catalogs.map(_.size).sum == merged.size,
      "duplicate query keys across catalogs would silently shadow entries")
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (name, q) => name -> q.fn }

  /** DuckDB-equivalent SQL for each oracle-checkable query. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (name, Q(_, Some(sql))) => name -> sql }
}
