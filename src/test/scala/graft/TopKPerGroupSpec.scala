package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.TestData

/** The custom top-k-per-group physical operator: exactness against the
  * window formulation, plan shape (partial before the exchange, final
  * after), and determinism under a total order.
  */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("matches the window row_number formulation exactly") {
    val orders = TestData.table(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val custom = graft.plans.TopKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .orderBy(col("o_custkey"), desc("o_totalprice"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val window = orders
      .withColumn("rnk", row_number().over(Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))))
      .where(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(custom == window)
  }

  test("plan has partial phase before the exchange and final after") {
    val orders = TestData.table(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = graft.plans.TopKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    df.collect()
    // AQE's toString appends an "== Initial Plan ==" copy of the tree;
    // assert against the final plan section only.
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(plan.contains("TopKPerGroupPartial"), s"no partial phase:\n$plan")
    assert(plan.contains("TopKPerGroupFinal"), s"no final phase:\n$plan")
    val partialIdx = plan.indexOf("TopKPerGroupPartial")
    val finalIdx = plan.indexOf("TopKPerGroupFinal")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"phases not split around the shuffle:\n$plan")
    // The final phase streams group-at-a-time with O(k) memory, so a
    // grouping sort sits between the exchange and the final — but it
    // sorts only the partial phase's survivors (answer-proportional).
    // The INPUT side (below the partial) must stay sort-free: heaps,
    // not sorting, bound the map-side work.
    val sortIdx = plan.indexOf("Sort ")
    assert(sortIdx >= 0 && finalIdx < sortIdx && sortIdx < partialIdx,
      s"grouping sort not between final and partial:\n$plan")
    assert(!plan.substring(partialIdx).contains("Sort "),
      s"unexpected sort below the partial phase:\n$plan")
  }

  test("exact on a hand-built frame with cross-partition groups") {
    val df = spark.range(0, 1000, 1, 8) // groups scattered over 8 partitions
      .select((col("id") % 10).as("g"), col("id").as("v"))
    val got = graft.plans.TopKPerGroup(df, Seq("g"),
      Seq(("v", true)), 2)
      .orderBy("g", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = (0L until 10L).flatMap(g =>
      Seq((g, 980L + g), (g, 990L + g))) // two largest v per residue class
    assert(got == expected)
  }

  test("k larger than group size returns the whole group") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("g", "v")
    val got = graft.plans.TopKPerGroup(df, Seq("g"), Seq(("v", true)), 5)
      .orderBy("g", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (1L, 20L), (2L, 5L)))
  }

  test("exact beyond the partial state cap (many groups per task)") {
    // 100k distinct groups land in each of 2 tasks — past MaxPartialGroups
    // (65536), so the partial phase must degrade to pass-through for the
    // overflow groups without losing exactness or blowing task memory.
    val nGroups = 100000L
    assert(nGroups > graft.plans.TopKPerGroupExec.MaxPartialGroups)
    val df = spark.range(0, 4 * nGroups, 1, 2)
      .select((col("id") % nGroups).as("g"), col("id").as("v"))
    val got = graft.plans.TopKPerGroup(df, Seq("g"), Seq(("v", true)), 1)
    // top-1 by v desc for group g is id g + 3*nGroups
    assert(got.where(col("v") =!= col("g") + lit(3 * nGroups)).count() == 0)
    assert(got.count() == nGroups)
  }
}
