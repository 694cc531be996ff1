package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Typed-row fixture for the mapGroups test (file scope: local case
  * classes have no TypeTag, so no Encoder).
  */
case class Ev(user_id: Long, event_id: Long, es: Long)

/** Semantics of the round-2 extension operators on hand-built frames. */
class ExtendedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf linear-idf ranking: rarer term outranks common term") {
    // 3 docs; "x" appears in 1 doc, "a" in all 3.
    val docs = Seq((1L, "a x a"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val terms = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct("doc_id").as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * col("n_docs") / col("df")).as("score"))
      .where(col("doc_id") === 1L)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(scored("x") == 3.0)   // tf=1 * 3/1
    assert(scored("a") == 2.0)   // tf=2 * 3/3
  }

  test("running revenue in cents is exact over adversarial doubles") {
    val orders = Seq(
      (1L, 10L, "2024-01-01", 0.1), (1L, 11L, "2024-01-02", 0.2),
      (1L, 12L, "2024-01-03", 0.3)
    ).toDF("o_custkey", "o_orderkey", "d", "o_totalprice")
    val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = orders
      .select(col("o_custkey"), col("o_orderkey"), col("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("run", sum("cents").over(w))
      .orderBy("o_orderkey")
      .select(col("run") / 100.0).as[Double].collect().toSeq
    // 0.1 + 0.2 != 0.3 in doubles; cents arithmetic is exact.
    assert(got == Seq(0.1, 0.3, 0.6))
  }

  test("grouped p90 order statistic picks an actual element") {
    val ev = (1 to 10).map(i => (i.toLong, "t", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    val got = ev.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
      .where(col("rn") === ceil(col("cnt") * 0.9).cast("int"))
      .select("value").as[Double].head()
    assert(got == 9.0) // ceil(10 * 0.9) = 9th of 1..10
  }

  test("typed Dataset mapGroups agrees with the q53 SQL gap aggregation") {
    // The typed twin of q53: per-user max inter-event gap computed
    // imperatively over a case-class Dataset (Encoders + mapGroups).
    val rows = Seq(
      Ev(1L, 1L, 100L), Ev(1L, 2L, 160L), Ev(1L, 3L, 400L),
      Ev(2L, 4L, 50L))
    val ds = rows.toDS()
    val typed = ds.groupByKey(_.user_id).mapGroups { (uid, evs) =>
      val sorted = evs.toSeq.sortBy(e => (e.es, e.event_id))
      val gaps = sorted.sliding(2).collect {
        case Seq(a, b) => b.es - a.es
      }.toSeq
      (uid, sorted.size.toLong, if (gaps.isEmpty) None else Some(gaps.max))
    }.collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // SQL formulation over the same frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("es", "event_id")
    val sql = ds.toDF()
      .withColumn("gap", col("es") - lag("es", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("gap").as("mx"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(typed == sql)
    assert(typed(1L) == ((3L, Some(240L))) && typed(2L) == ((1L, None)))
  }

  test("json props extraction is typed and null-safe") {
    val ev = Seq((1L, "a", """{"k": 5}"""), (2L, "a", """{"nope": 1}"""))
      .toDF("event_id", "event_type", "props")
    val got = ev.select(
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(got == Seq(Some(5), None))
  }
}
