package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: keeps the queries/oracleSql maps from
  * drifting as operators are added in later rounds. */
class ContractSpec extends AnyFunSuite {

  /** Operators intentionally without a DuckDB oracle (rows-only check).
    * Empty since round 2: every operator's randomness derives from md5 or
    * deterministic corpus seeds, so even the approximate engines are
    * recomputable in SQL. Additions must be deliberate. */
  val rowsOnly: Set[String] = Set.empty

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every query is oracle-backed or explicitly rows-only") {
    val unaccounted = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet).diff(rowsOnly)
    assert(unaccounted.isEmpty,
      s"queries with neither oracle nor rows-only waiver: $unaccounted")
  }

  test("query names are unique across operator modules (no silent overwrite)") {
    // derived from SparkEntry.modules — the same list the concatenation
    // consumes — so a newly registered module is covered automatically
    assert(SparkEntry.modules.map(_._1.size).sum == SparkEntry.queries.size,
      "duplicate query name collapsed during map concatenation")
  }

  test("oracle names are unique across operator modules (no silent overwrite)") {
    assert(SparkEntry.modules.map(_._2.size).sum == SparkEntry.oracleSql.size,
      "duplicate oracle name collapsed during map concatenation")
  }

  test("oracle SQL has no tab/CR characters (driver JSON escaping hazard)") {
    val bad = SparkEntry.oracleSql.filter { case (_, sql) => sql.exists(c => c == '\t' || c == '\r') }
    assert(bad.isEmpty, s"control chars in: ${bad.keys}")
  }
}
