package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants. Every declared query carries an oracle:
  * a query whose oracle entry is forgotten silently degrades to the
  * driver's weaker rows-only check — this pins the full-strength gate
  * for the whole surface (0 rows-only has held since round 1).
  */
class SparkEntrySpec extends AnyFunSuite {
  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${q -- o}")
    assert((o -- q).isEmpty, s"orphan oracles: ${o -- q}")
  }

  test("query names are unique across family maps") {
    // Map ++ silently overwrites duplicate keys — the sum of family
    // sizes must equal the merged size or a family is shadowing
    // another. Iterates SparkEntry's own family list, so a newly
    // registered family is covered automatically.
    assert(SparkEntry.families.map(_._1.size).sum ==
      SparkEntry.queries.size,
      "a query name is declared in more than one family map")
    assert(SparkEntry.families.map(_._2.size).sum ==
      SparkEntry.oracleSql.size,
      "an oracle name is declared in more than one family map")
  }
}
