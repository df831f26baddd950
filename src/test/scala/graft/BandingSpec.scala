package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The MinHash LSH band partition is DERIVED from the verified-pair
  * Jaccard threshold via the S-curve FP+FN minimization
  * ([[Dedup.optimalBanding]]), not hand-picked. This sweep pins the
  * selection across thresholds — so a quadrature or argmin change that
  * silently shifts the banding (and with it the candidate set every
  * blocker and oracle reproduces) fails here, not in a downstream hash
  * mismatch.
  */
class BandingSpec extends AnyFunSuite {

  test("derived banding at the live threshold reproduces the gated (8, 2)") {
    // the oracle-gated dd_minhash_lsh pair set was built with (8, 2);
    // the derivation landing exactly there means the switch from
    // constants to derived parameters changed NO observable output.
    assert(Dedup.optimalBanding(Dedup.JaccardThresholdPpm) == ((8, 2)))
    assert((Dedup.BANDS, Dedup.R) == ((8, 2)))
    assert(Dedup.BANDS * Dedup.R == Dedup.K)
  }

  test("threshold sweep follows the S-curve") {
    // low thresholds want many cheap bands (high recall), high
    // thresholds want long rows (high precision): the S-curve midpoint
    // (1/b)^(1/r) tracks the target.
    assert(Dedup.optimalBanding(100000L) == ((16, 1)))
    assert(Dedup.optimalBanding(300000L) == ((8, 2)))
    assert(Dedup.optimalBanding(500000L) == ((4, 4)))
    assert(Dedup.optimalBanding(750000L) == ((2, 8)))
    assert(Dedup.optimalBanding(950000L) == ((1, 16)))
  }

  test("derived S-curve midpoint is monotone in the target threshold") {
    def midpoint(ppm: Long): Double = {
      val (b, r) = Dedup.optimalBanding(ppm)
      math.pow(1.0 / b, 1.0 / r)
    }
    val mids = Seq(50000L, 200000L, 400000L, 600000L, 900000L).map(midpoint)
    assert(mids == mids.sorted, s"midpoints not monotone: $mids")
  }

  test("banding always partitions exactly the K signatures") {
    for (ppm <- Seq(50000L, 250000L, 500000L, 750000L, 990000L)) {
      val (b, r) = Dedup.optimalBanding(ppm)
      assert(b * r == Dedup.K, s"b·r != K at $ppm ppm")
      assert(b >= 1 && r >= 1)
    }
  }
}
