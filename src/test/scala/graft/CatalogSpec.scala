package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every catalog query must run and produce a stable, sane result at
  * sf0.001. Value-level correctness is the DuckDB oracle's job (Verify);
  * here we pin structure: runnability, non-degenerate output, unique
  * names, oracle presence.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("query names are unique and all oracles have a query") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.catalog) {
    test(s"${q.name} runs at sf0.001 with nonempty schema") {
      val df = q.run(spark, dir)
      assert(df.columns.nonEmpty)
      // every query in the round-1 catalog is non-empty at sf0.001
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
