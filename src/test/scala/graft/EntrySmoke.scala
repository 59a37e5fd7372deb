package graft
import org.scalatest.funsuite.AnyFunSuite
class EntrySmoke extends AnyFunSuite {
  test("driver entry smoke: rows > 0") {
    val df = SparkEntry.entry(SparkTestSession.spark)
    val n = df.count()
    info(s"entry rows: $n")
    assert(n > 0)
    assert(SparkEntry.queries.size == 324)
    assert(SparkEntry.oracleSql.size == 324)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
