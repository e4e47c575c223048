package graft

/**
 * Guards the driver contract that round 1 broke: every declared query must
 * have a DuckDB oracle (a query without one silently downgrades to a
 * rows-only check), and query names must be unique and well-formed.
 */
class HarnessContractSpec extends GraftSuite {

  test("queries and oracleSql cover exactly the same names") {
    // the OPQ oracles embed a runtime-fitted rotation, so enumerating
    // the oracle map needs a live session (exactly as in Verify, which
    // dumps it after running the queries on one)
    spark
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are well-formed and unique") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
    assert(names.distinct.size == names.size)
  }
}
