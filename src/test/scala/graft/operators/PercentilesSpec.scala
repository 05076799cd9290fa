package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PercentilesSpec extends SparkSpec {

  import spark.implicits._

  /** Reference order statistic: value at rank ceil(pNum/pDen · N) of the
    * sorted values (1-based).
    */
  private def ref(vs: Seq[Long], pNum: Long, pDen: Long): Long = {
    val sorted = vs.sorted
    val m = Math.floorDiv(pNum * vs.length + pDen - 1, pDen)
    sorted((m - 1).toInt)
  }

  private def thr(vs: Seq[Long], pNum: Long, pDen: Long,
                  shift: Int = 16): Long =
    Percentiles.exactThreshold(vs.toDF("v"), "v", pNum, pDen, shift)

  test("matches the sorted-array order statistic on hand cases") {
    assert(thr(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L), 9, 10) == 9L)
    assert(thr(Seq(5L), 9, 10) == 5L)                  // N=1 → rank 1
    assert(thr(Seq(3L, 1L, 2L), 1, 2) == 2L)           // median of 3
    assert(thr(Seq(10L, 10L, 10L, 1L), 3, 4) == 10L)   // heavy ties
    assert(thr(Seq(7L, 7L, 7L), 1, 1) == 7L)           // p = 1 → max
    assert(thr(Seq(-5L, -1L, -3L), 1, 3) == -5L)       // negatives
  }

  test("matches the reference on randomized inputs incl. bucket boundaries") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(400)
      // cluster values around multiples of 2^16 so bucket-boundary and
      // cross-bucket rank arithmetic is exercised, plus negatives
      val vs = Seq.fill(n)(
        (rnd.nextInt(5).toLong - 1) * 65536L + rnd.nextInt(9) - 4)
      for ((pn, pd) <- Seq((1L, 10L), (1L, 2L), (9L, 10L), (99L, 100L), (1L, 1L)))
        assert(thr(vs, pn, pd) == ref(vs, pn, pd),
          s"trial $trial p=$pn/$pd n=$n")
    }
  }

  test("small bucketShift (many buckets) and large (one bucket) agree") {
    val vs = Seq.tabulate(257)(i => (i * 31 % 997).toLong)
    assert(thr(vs, 9, 10, shift = 2) == ref(vs, 9, 10))
    assert(thr(vs, 9, 10, shift = 62) == ref(vs, 9, 10))
  }

  test("rank-scale fractions whose pNum*N product overflows Long stay exact") {
    // x122 passes (m, n) fractions with pNum ≈ pDen ≈ corpus size; a
    // Long pNum*N product overflows once pNum*N > 2^63. Huge same-ratio
    // fractions reproduce the overflow at test-sized N: with the old
    // Math.floorDiv(pNum * n + ...) arithmetic these produced a garbage
    // rank; the BigInt ceil must give the same answer as the reduced
    // fraction.
    val vs = Seq.tabulate(100)(i => (i * 37 % 1009).toLong)
    val big = Long.MaxValue / 128
    assert(thr(vs, big, big) == ref(vs, 1, 1))              // p = 1 → max
    assert(thr(vs, big / 2, big) == ref(vs, 1, 2))          // median
    assert(thr(vs, big / 10 * 9, big / 10 * 10) == ref(vs, 9, 10))
  }

  test("refuses empty input and invalid fractions") {
    intercept[IllegalArgumentException](
      thr(Seq.empty[Long], 9, 10))
    intercept[IllegalArgumentException](thr(Seq(1L), 0, 10))
    intercept[IllegalArgumentException](thr(Seq(1L), 11, 10))
  }
}
