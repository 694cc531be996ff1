package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.schema.Thresholds

/** CLI options contract of the reference (`BankingBatchOptions`,
  * bp.py:87-96): required --input_path/--output_table/--error_table,
  * optional --stats_table (accepted, unused — vestigial in the reference
  * too, bp.py:94), --min_age/--max_age with the reference defaults.
  *
  * Divergence by design (SURVEY.md §3.1): the reference silently REWRITES
  * gs:// paths to a developer-machine path (bp.py:336-339); we reject
  * them instead.
  */
final case class EtlConfig(
  inputPath: String,
  outputTable: String,
  errorTable: String,
  statsTable: Option[String] = None,
  minAge: Int = Thresholds.MinValidAge,
  maxAge: Int = Thresholds.MaxValidAge)

object EtlConfig {
  def parse(args: Seq[String]): EtlConfig = {
    val kv = args.grouped(2).collect {
      case Seq(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    def req(k: String) = kv.getOrElse(k,
      throw new IllegalArgumentException(s"--$k is required"))
    val cfg = EtlConfig(
      inputPath = req("input_path"),
      outputTable = req("output_table"),
      errorTable = req("error_table"),
      statsTable = kv.get("stats_table"),
      minAge = kv.get("min_age").map(_.toInt)
        .getOrElse(Thresholds.MinValidAge),
      maxAge = kv.get("max_age").map(_.toInt)
        .getOrElse(Thresholds.MaxValidAge))
    require(!cfg.inputPath.startsWith("gs://"),
      "gs:// input paths are not supported (the reference silently " +
        "rewrote them to a local developer path; we reject instead)")
    cfg
  }
}

/** Batch entry point: the reference's `run_pipeline` (bp.py:318-385) as a
  * spark-submit main. Reads the semicolon CSV, runs the 4-stage pipeline,
  * writes processed + flattened error streams.
  */
object RunBankingEtl {
  def main(args: Array[String]): Unit = {
    val cfg = EtlConfig.parse(args.toSeq)
    val builder = SparkSession.builder()
      .appName("graft-banking-etl")
      .config("spark.sql.session.timeZone", "UTC")
    // Under spark-submit the master comes from the launcher; standalone
    // runs (dev, tests) fall back to all local cores.
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]")))
      .getOrCreate()
    run(spark, cfg)
    spark.stop()
  }

  def run(spark: SparkSession, cfg: EtlConfig): EtlResult = {
    val lines = BankingPipeline.readCsvLines(spark, cfg.inputPath)
    val res = BankingPipeline.fromLines(lines,
      minAge = cfg.minAge, maxAge = cfg.maxAge)
    BankingPipeline.writeTable(res.processed, cfg.outputTable)
    BankingPipeline.writeTable(res.errors, cfg.errorTable)
    res
  }
}
