package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order-statistic / prefix-scan building blocks.
  *
  * The hazard class these retire (VERDICT r7 #1/#3): a window
  * partitioned by a CONSTANT-CARDINALITY key (o_orderpriority,
  * event_type, source, ...) — or by nothing — run directly over a
  * corpus-scale frame funnels N/k rows through ONE task at 100x. The
  * cure is always the same two-level shape: a MONOTONE integer chunk
  * key splits each group's sort order into bounded chunks, per-chunk
  * partials aggregate map-combinably, a window over the (bounded)
  * chunk frame computes each chunk's offset, and the per-row pass runs
  * inside chunk-sized tasks. Every window here therefore rides either
  * a domain-bounded frame or a chunk-bounded partition — never a
  * corpus-sized group (pinned catalog-wide by ScaleLintSpec).
  *
  * Chunk-key contract: `chunk` must be integer-typed and MONOTONE
  * NON-DECREASING along `order` (equal order prefixes may share a
  * chunk; a later order position must never map to a smaller chunk).
  * Coarsenings of the leading sort key — `c div 1024`, high hash bits
  * `h div 2^44`, an inverted bps score — all qualify. A NULL chunk
  * value is admitted only when NULLs sort FIRST under `order` (Spark's
  * asc default): the offset window orders chunks NULLS FIRST, so e.g.
  * `v div 8` of a nullable ascending `v` stays monotone.
  *
  * NULL group keys are first-class: every scan matches the window
  * functions it replicates, which keep a NULL partition (all rejoins
  * below are null-safe `<=>` equi-joins, and groupBy/partitionBy
  * already treat NULL as a value).
  */
object OrderStat {

  /** Null-safe offset rejoin shared by the two-level scans: windows
    * keep a NULL partition, so the per-chunk offset must come back to
    * NULL-keyed rows too — a plain equi-join would silently drop them
    * (ADVICE r8). `<=>` on every key keeps this an equi-join (hash /
    * sort-merge eligible), not a cartesian.
    */
  private def joinOffsets(t: DataFrame, off: DataFrame,
      keys: Seq[String]): DataFrame = {
    val offR = off.select(
      (keys.map(c => col(c).as("__o_" + c)) :+ col("__off")): _*)
    val cond = keys.map(c => t(c) <=> offR("__o_" + c)).reduce(_ && _)
    t.join(offR, cond).drop(keys.map("__o_" + _): _*)
  }

  /** Distributed row_number(): rank rows within each `grpCols` group
    * by `order` (1-based, gapless — exactly row_number's semantics for
    * any tie-complete `order`) without any task sorting a whole group.
    * Appends LONG column `rankCol`. One shuffle on (grp, chunk) feeds
    * the chunk-count aggregate, the offset join, and the within-chunk
    * row_number — same key, so the exchange is reused.
    */
  def scanRank(df: DataFrame, grpCols: Seq[String], order: Seq[Column],
      chunk: Column, rankCol: String): DataFrame = {
    val t = df.withColumn("__ck", chunk)
    val keys = grpCols :+ "__ck"
    val counts = t.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__cc"))
    val off = counts
      .withColumn("__off", coalesce(
        sum("__cc").over(Window.partitionBy(grpCols.map(col): _*)
          .orderBy("__ck")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keys.map(col) :+ col("__off")): _*)
    joinOffsets(t, off, keys)
      .withColumn(rankCol,
        col("__off") + row_number().over(
          Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .drop("__ck", "__off")
  }

  /** Distributed running sum: cumulative `value` within each `grpCols`
    * group along `order` (ROWS UNBOUNDED PRECEDING..CURRENT ROW
    * semantics). Appends `cumCol`. Same two-level shape as scanRank,
    * with per-chunk sums instead of counts.
    */
  def scanCumSum(df: DataFrame, grpCols: Seq[String], value: Column,
      order: Seq[Column], chunk: Column, cumCol: String): DataFrame = {
    val t = df.withColumn("__ck", chunk)
    val keys = grpCols :+ "__ck"
    val sums = t.groupBy(keys.map(col): _*)
      .agg(sum(value).as("__cs"))
    val off = sums
      .withColumn("__off",
        sum("__cs").over(Window.partitionBy(grpCols.map(col): _*)
          .orderBy("__ck")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select((keys.map(col) :+ col("__off")): _*)
    // sum() skips NULL values but returns NULL over an all-NULL frame,
    // so the running sum is NULL exactly until the group's first
    // non-null value. Coalescing only in the combine step (not in the
    // offset itself) preserves that: NULL offset + NULL chunk prefix
    // stays NULL; anything else folds with 0-identity.
    val within = sum(value).over(
      Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joinOffsets(t, off, keys)
      .withColumn(cumCol,
        when(col("__off").isNull && within.isNull, within)
          .otherwise(coalesce(col("__off"), lit(0L)) +
            coalesce(within, lit(0L))))
      .drop("__ck", "__off")
  }

  /** Grouped two-pass bucket rank-locate (q257's exact-median pattern,
    * grouped): per `grpCols` group, return the `value` of the element
    * at 1-based rank `target(n)` under ascending `value` order —
    * without sorting the group. Pass 1 histograms `bucket` (a monotone
    * integer coarsening of `value`, bounded by the VALUE DOMAIN)
    * map-combinably and locates the bucket holding the target rank via
    * a cumulative over the tiny histogram; pass 2 ranks ONLY the
    * located bucket's rows (1/buckets of the group) behind a broadcast
    * filter-join. Ties in `value` share the output value, so no tie
    * column is needed for a well-defined result. Returns one row per
    * group: grpCols :+ (value AS asCol).
    *
    * Target contract: `target(n)` must land in [1, n] for every group
    * (1-based rank). A target outside that range matches NO bucket and
    * the group is silently ABSENT from the output — callers wanting a
    * clamp must apply `greatest(lit(1), least(n, t))` themselves
    * (ADVICE r8: documented rather than clamped, so an off-by-one in a
    * caller's rank arithmetic surfaces as a missing group in its
    * oracle diff instead of a silently wrong element).
    */
  def locateRank(df: DataFrame, grpCols: Seq[String], value: Column,
      bucket: Column, target: Column => Column, asCol: String)
  : DataFrame = {
    val t = df.select(
      (grpCols.map(col) :+ value.as("__v") :+ bucket.as("__bkt")): _*)
    val hist = t.groupBy((grpCols :+ "__bkt").map(col): _*)
      .agg(count(lit(1)).as("__bc"))
    val wg = Window.partitionBy(grpCols.map(col): _*)
    val located = hist
      .withColumn("__cum", sum("__bc").over(wg.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__bc").over(wg))
      .withColumn("__t", target(col("__n")))
      .where(col("__cum") >= col("__t") &&
        col("__cum") - col("__bc") < col("__t"))
      .select((grpCols.map(c => col(c).as("__g_" + c)) :+
        col("__bkt").as("__lbkt") :+
        (col("__t") - (col("__cum") - col("__bc"))).as("__rib")): _*)
    val cond = (grpCols.map(c => t(c) <=> located("__g_" + c)) :+
      (t("__bkt") <=> located("__lbkt"))).reduce(_ && _)
    t.join(broadcast(located), cond)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(grpCols.map(col): _*).orderBy("__v")))
      .where(col("__rn") === col("__rib"))
      .select((grpCols.map(col) :+ col("__v").as(asCol)): _*)
  }

  /** Distributed EXCLUSIVE running minimum: for each row, the min of
    * `value` over all STRICTLY EARLIER rows in `order` within the
    * group (ROWS UNBOUNDED PRECEDING..1 PRECEDING semantics; NULL for
    * the first row). The skyline/Pareto building block: two-level like
    * scanCumSum — per-chunk minima aggregate map-combinably, the
    * bounded chunk frame yields each chunk's previous-chunks min, and
    * the within-chunk exclusive window folds in. Appends `minCol`.
    *
    * Determinism caveat (here and for scanCumSum, ADVICE r8): a ROWS
    * frame over a non-tie-complete `order` is nondeterministic at the
    * ties — a tied row may or may not precede another tie. Pass a
    * tie-complete `order` (unique suffix column), or accept the window
    * functions' own nondeterminism, which these scans match.
    */
  def scanCumMinExcl(df: DataFrame, grpCols: Seq[String], value: Column,
      order: Seq[Column], chunk: Column, minCol: String): DataFrame = {
    val t = df.withColumn("__ck", chunk)
    val keys = grpCols :+ "__ck"
    val mins = t.groupBy(keys.map(col): _*)
      .agg(min(value).as("__cm"))
    val off = mins
      .withColumn("__off",
        min("__cm").over(Window.partitionBy(grpCols.map(col): _*)
          .orderBy("__ck")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select((keys.map(col) :+ col("__off")): _*)
    joinOffsets(t, off, keys)
      .withColumn(minCol, least(
        col("__off"),
        min(value).over(
          Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, -1))))
      .drop("__ck", "__off")
  }

  /** Count-per-value rank locate for integer measures whose DISTINCT
    * VALUE count is domain-bounded (the q264 gap_s shape): the
    * map-combinable count-per-(grp, value) pre-aggregate shrinks the
    * frame to distinct values, and the cumulative over that aggregate
    * reads the rank-`target(n)` element off the value key directly —
    * no second pass, no row ever sorted. Returns one row per group:
    * grpCols :+ (value AS asCol). Same target contract as locateRank:
    * `target(n)` outside [1, n] silently drops the group.
    */
  def locateRankByValue(df: DataFrame, grpCols: Seq[String],
      value: Column, target: Column => Column, asCol: String)
  : DataFrame = {
    val t = df.select((grpCols.map(col) :+ value.as("__v")): _*)
    val hist = t.groupBy((grpCols :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__bc"))
    val wg = Window.partitionBy(grpCols.map(col): _*)
    hist
      .withColumn("__cum", sum("__bc").over(wg.orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__bc").over(wg))
      .withColumn("__t", target(col("__n")))
      .where(col("__cum") >= col("__t") &&
        col("__cum") - col("__bc") < col("__t"))
      .select((grpCols.map(col) :+ col("__v").as(asCol)): _*)
  }

  /** SQL-standard ntile bucket from a 1-based rank and the group size:
    * the first (n mod k) buckets take (n div k + 1) rows, the rest
    * (n div k) — bucket boundaries identical to Spark's and DuckDB's
    * ntile(k). Pure integer arithmetic; INT result like ntile's.
    */
  def ntileOf(rank: Column, n: Column, k: Int): Column = {
    // Column `/` is IEEE division — floor-division via double is exact
    // here (operands < 2^52; a non-integer rational p/q with q < 2^30
    // sits >= 2^-30 from any integer, far beyond half-ulp)
    def fdiv(a: Column, b: Column) =
      floor(a.cast("double") / b.cast("double")).cast("long")
    val base = fdiv(n, lit(k))
    val rem = n % k
    val headRows = rem * (base + 1)
    when(base === 0, rank.cast("int"))
      .when(rank <= headRows, (fdiv(rank - 1, base + 1) + 1).cast("int"))
      .otherwise((rem + fdiv(rank - headRows - 1, base) + 1).cast("int"))
  }
}
