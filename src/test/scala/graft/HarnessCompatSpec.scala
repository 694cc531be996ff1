package graft

import org.apache.spark.sql.types._

/** Harness-compatibility law (VERDICT r6 #2): the driver's oracle gate
  * compares Spark output to DuckDB output via pandas, which cannot
  * sort/hash a cell holding an ndarray — an Array/Map/Struct output
  * column makes every check come back null, so the query can never earn
  * a green CORRECTNESS row (q137's posting_head failure class; q76 hit
  * the same wall and rendered its array with concat_ws). That failure
  * is INVISIBLE to the in-repo verify harness, so it is pinned here as
  * a schema law instead: every catalog query's output must be
  * scalar-only and uniquely named.
  *
  * The law checks the ANALYZED schema — no job runs for the assertion
  * itself (queries with eager localCheckpoints do execute during plan
  * construction, which at sf0.001 is cheap and exactly what Verify does
  * anyway).
  */
class HarnessCompatSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def scalar(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  test("every catalog query emits a scalar-only, uniquely-named schema") {
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
    assert(catalog.size == CatalogContract.expectedSize,
      s"catalog is ${catalog.size} entries, expected " +
        s"${CatalogContract.expectedSize} (bump CatalogContract on growth)")
    val offenders = catalog.flatMap { case (name, fn) =>
      val schema = fn(spark, sf).schema
      val nonScalar = schema.fields.collect {
        case f if !scalar(f.dataType) => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      val dups = schema.fieldNames.groupBy(identity).collect {
        case (col, hits) if hits.length > 1 => s"$name.$col x${hits.length}"
      }
      nonScalar ++ dups
    }
    assert(offenders.isEmpty,
      "driver-harness-incomparable output columns (render arrays with " +
        s"array_join/concat_ws, q76/q137 precedent): ${offenders.mkString("; ")}")
  }

  test("every oracle entry names a catalog query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
  }
}
