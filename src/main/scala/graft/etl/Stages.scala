package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.{BankSchema, Thresholds}

/** Single-pass error-channel design (SURVEY.md §4.3a).
  *
  * The reference multiplexes each stage into a main output and a tagged
  * `error_records` side output (bp.py:148-156, 207-215, 245-253, 284-291).
  * Rebuilt Spark-first: stages are narrow `DataFrame => DataFrame`
  * transforms over ONE staged frame carrying nullable `_error_type` /
  * `_error_message` columns; every derivation is guarded by "no error yet",
  * mirroring the reference's exception short-circuit. The frame is split
  * into (processed, errors) exactly once at the end, so the whole pipeline
  * stays a single whole-stage-codegen'd stage with zero shuffles.
  */
object Stage {
  val ErrType = "_error_type"
  val ErrMsg = "_error_message"
  val Raw = "_raw"
  /** No error recorded by any stage so far. */
  def ok: Column = col(ErrType).isNull
  /** Compute `value` only for not-yet-errored rows (exception short-circuit). */
  def guarded(value: Column): Column = when(ok, value)
}

/** Stage 1 — `ParseCSVFn` (bp.py:109-156): semicolon CSV with RFC-4180
  * quoting, arity=17 check, positional typed coercion, required-field
  * check, ingestion stamp, parse-error channel.
  *
  * Coercion-failure semantics: Python `int()`/`float()` raise -> error
  * record. Here `try_cast` yields NULL and the NULL (with a non-null raw
  * token) is routed to the error channel with the Python-shaped message.
  */
object Parse {
  /** @param keep passthrough columns (e.g. a host-table key for
    *             deterministic ordering in oracle-checked queries)
    */
  def apply(lines: DataFrame, lineCol: String = "value",
            keep: Seq[String] = Nil): DataFrame = {
    // explode(array(...)) is a deliberate Generate BARRIER around the
    // tokenizer: predicate pushdown (and, for from_csv,
    // OptimizeCsvJsonExprs) would otherwise substitute the non-cheap
    // parse per reference — measured 25-52 parser copies in the
    // optimized plan, 64 KB codegen overflow, ~15x the runtime. The
    // Generate is codegen'd and cheap relative to any duplication.
    // Tokenization itself is the custom codegen'd
    // [[graft.functions.CsvTokenize]]: exact csv.reader semantics
    // (quoted separators, "" escapes, exact token count) with much less
    // per-row overhead than from_csv/univocity.
    val tok = lines.select(
      keep.map(col) ++ Seq(
        col(lineCol).as(Stage.Raw),
        explode(array(graft.functions.CsvTokenize.csvTokenize(col(lineCol))))
          .as("_t")): _*)

    // Guarded 0-based getItem: the when() keeps OOB access unevaluated
    // (short rows), and unlike try_element_at it stays codegen'd.
    def t(i: Int): Column =
      when(size(col("_t")) > i, col("_t").getItem(i))

    // Exact parsed-field count (quoted separators excluded by the
    // tokenizer), matching csv.reader's row length check (bp.py:118).
    val arity = size(col("_t"))

    // Typed projection in CSV position order (bp.py:121-138).
    val typed: Seq[(String, Column)] = BankSchema.inputFields.zipWithIndex.map {
      case (f, i) =>
        val c = f.dataType match {
          case IntegerType => t(i).try_cast(IntegerType)
          case DoubleType  => t(i).try_cast(DoubleType)
          case _           => lower(trim(t(i)))
        }
        f.name -> c
    }
    val typedMap = typed.toMap

    // First numeric coercion failure, Python-exception-shaped (bp.py:121-138).
    val coercionErr = coalesce(
      BankSchema.numericCoercions.map { case (i, name, tpe) =>
        val pyMsg =
          if (tpe == "INT")
            concat(lit("ParseError: invalid literal for int() with base 10: '"),
              t(i), lit("'"))
          else
            concat(lit("ParseError: could not convert string to float: '"),
              t(i), lit("'"))
        when(t(i).isNotNull && typedMap(name).isNull, pyMsg)
      }: _*)

    // Required-field NOT-NULL constraint (bp.py:143-145; age/job/balance).
    val requiredErr = coalesce(
      Seq("age", "job", "balance").map { name =>
        when(typedMap(name).isNull,
          lit(s"ParseError: Required field $name is missing"))
      }: _*)

    val errMsg =
      when(arity =!= Thresholds.NumCsvColumns,
        concat(lit(s"ParseError: Expected ${Thresholds.NumCsvColumns} columns, got "),
          arity.cast(StringType)))
        .otherwise(coalesce(coercionErr, requiredErr))

    tok.select(
      keep.map(col) ++ Seq(col(Stage.Raw)) ++
        typed.map { case (n, c) => c.as(n) } ++
        Seq(
          current_timestamp().as("_ingestion_timestamp"),
          when(errMsg.isNotNull, lit("parsing_error")).as(Stage.ErrType),
          errMsg.as(Stage.ErrMsg)): _*)
  }

  /** Adapter for already-typed rows (e.g. testdata-hosted frames): attach
    * the raw/error channel so the downstream stages apply unchanged.
    */
  def fromTyped(df: DataFrame): DataFrame = {
    val raw = to_json(struct(df.columns.map(col): _*))
    df.select(
      Seq(raw.as(Stage.Raw)) ++ df.columns.map(col) ++ Seq(
        current_timestamp().as("_ingestion_timestamp"),
        lit(null).cast(StringType).as(Stage.ErrType),
        lit(null).cast(StringType).as(Stage.ErrMsg)): _*)
  }
}

/** Stage 2 — `ValidateAndEnrichFn` (bp.py:158-215): inclusive age-range
  * validation plus the five enrichment derivations E1-E5.
  */
object ValidateEnrich {
  def apply(staged: DataFrame,
            minAge: Int = Thresholds.MinValidAge,
            maxAge: Int = Thresholds.MaxValidAge): DataFrame = {
    val ageBad = !col("age").between(minAge, maxAge)
    val valErr = when(Stage.ok && ageBad,
      concat(lit("ValidationError: Age "), col("age").cast(StringType),
        lit(" outside valid range")))
    staged
      .withColumn(Stage.ErrMsg, coalesce(col(Stage.ErrMsg), valErr))
      .withColumn(Stage.ErrType,
        coalesce(col(Stage.ErrType),
          when(valErr.isNotNull, lit("data_validation"))))
      .withColumn("age_group", Stage.guarded(BankExprs.ageGroup(col("age"))))
      .withColumn("wealth_segment",
        Stage.guarded(BankExprs.wealthSegment(col("balance"))))
      .withColumn("contact_day_type",
        Stage.guarded(BankExprs.contactDayType(col("day"))))
      .withColumn("has_loans",
        Stage.guarded(BankExprs.hasLoans(col("housing"), col("loan"))))
      .withColumn("engagement_score",
        Stage.guarded(BankExprs.engagementScore(
          col("previous"), col("campaign"), col("duration"), col("y"))))
  }
}

/** Stage 3 — `CustomerSegmentationFn` (bp.py:217-269): RFM piecewise
  * scores, JSON score blob, average-score segment, processing stamp.
  */
object Segment {
  def apply(staged: DataFrame): DataFrame = {
    val r = BankExprs.recencyScore(col("pdays"))
    val f = BankExprs.frequencyScore(col("previous"))
    val m = BankExprs.monetaryScore(col("balance"))
    staged
      .withColumn("_processing_timestamp", current_timestamp())
      .withColumn("rfm_scores", Stage.guarded(BankExprs.rfmScoresJson(r, f, m)))
      .withColumn("customer_segment",
        Stage.guarded(BankExprs.customerSegment(r, f, m)))
  }
}

/** Stage 4 — `PrepareForBigQueryFn` (bp.py:271-291): final stamp, fresh
  * uuid per record (the reference's `_batch_id` really is per-record,
  * bp.py:280), version tag.
  */
object Prepare {
  def apply(staged: DataFrame): DataFrame =
    staged
      .withColumn("processing_timestamp", current_timestamp())
      .withColumn("_batch_id", Stage.guarded(expr("uuid()")))
      .withColumn("_pipeline_version", lit(Thresholds.PipelineVersion))
}
