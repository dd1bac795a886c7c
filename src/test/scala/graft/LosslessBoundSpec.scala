package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The sweep routes' early-abandon bounds must be LOSSLESS against the
  * final IEEE `jac ≥ τ` filter: `ceil(τ·s/(1+τ))` overshoots by 1 when
  * the exact rational threshold is an integer but the double chain
  * rounds just above it (τ=0.8, s=63: `0.8*63/1.8` evaluates to
  * 28.000000000000004 → ceil 29, dropping a pair whose jaccard is
  * exactly 28/35 = 0.8 and which the join form and the DuckDB oracle
  * both emit). These specs pin the exact definition by brute force.
  */
class LosslessBoundSpec extends AnyFunSuite {

  private def bruteNeed(tau: Double, s: Int): Int = {
    var i = 0
    while (i < s && i.toDouble / (s - i).toDouble < tau) i += 1
    i // i == s ⇒ jac = s/0 = +Inf ≥ τ
  }

  private def bruteMinJac(tau: Double, n: Int): Int = {
    var i = 0
    while (i < n && i.toDouble / n.toDouble < tau) i += 1
    i
  }

  test("losslessNeed is the smallest i with IEEE i/(s-i) >= tau, " +
      "for every s up to 2000 across thresholds") {
    for (tau <- Seq(0.5, 0.6, 0.7, 0.8, 0.85, 0.9, 0.95);
         s <- 1 to 2000) {
      assert(DedupQueries.losslessNeed(tau, s) === bruteNeed(tau, s),
        s"tau=$tau s=$s")
    }
  }

  test("the ADVICE boundary case: tau=0.8, |A|+|B|=63 must need 28, " +
      "not ceil's 29") {
    // exact pair: |A|=35, |B|=28, B ⊆ A → jac = 28/35 = 0.8 ≥ τ
    assert(math.ceil(0.8 * 63 / 1.8).toInt === 29) // the IEEE overshoot
    assert(DedupQueries.losslessNeed(0.8, 63) === 28)
    val a = Array.tabulate(35)(_.toLong)
    val b = Array.tabulate(28)(_.toLong)
    val i = DedupQueries.mergeCountBounded(a, b,
      DedupQueries.losslessNeed(0.8, 63))
    assert(i === 28)
    assert(i.toDouble / (63 - i).toDouble >= 0.8)
  }

  test("minNeedJac is the smallest i with IEEE i/n >= tau, for every " +
      "n up to 2000 across thresholds") {
    for (tau <- Seq(0.5, 0.6, 0.7, 0.8, 0.85, 0.9, 0.95);
         n <- 1 to 2000) {
      assert(DedupQueries.minNeedJac(tau, n) === bruteMinJac(tau, n),
        s"tau=$tau n=$n")
    }
  }

  test("mergeCountBounded with the lossless bound never abandons a " +
      "qualifying pair (randomized)") {
    val rnd = new scala.util.Random(20260814L)
    val tau = 0.8
    for (_ <- 1 to 2000) {
      val na = 1 + rnd.nextInt(60)
      val nb = 1 + rnd.nextInt(60)
      val universe = rnd.shuffle((0L until 120L).toList)
      val shared = rnd.nextInt(math.min(na, nb) + 1)
      val a = (universe.take(shared) ++
        universe.slice(60, 60 + na - shared)).sorted.toArray
      val b = (universe.take(shared) ++
        universe.slice(90, 90 + nb - shared)).sorted.toArray
      val exact = a.intersect(b).length
      val jac = exact.toDouble / (a.length + b.length - exact).toDouble
      val need = DedupQueries.losslessNeed(tau, a.length + b.length)
      val got = DedupQueries.mergeCountBounded(a, b, need)
      if (jac >= tau)
        assert(got === exact, s"qualifying pair abandoned: na=$na nb=$nb")
      else assert(got === -1 || got === exact)
    }
  }
}
