package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.LongAccumulator

/** Typed Aggregator selecting, per group, the `cap` members with the
  * smallest (hash, id) — the single-pass replacement for the rank-window
  * hot-bucket cap in the dedup pair generators ([[graft.operators.Dedup]]).
  *
  * Why an aggregate and not ROW_NUMBER-over-window:
  *  - the partial (map-side) buffer never holds more than `cap` entries, so
  *    per-bucket shuffle volume is bounded by the cap regardless of bucket
  *    size — the WindowGroupLimit property — but with no partition sort and
  *    no separate window pass before the pair aggregation;
  *  - the group's TOTAL membership is counted in the same pass, so
  *    truncation observability (dropped = total − kept) costs no second
  *    corpus scan, no signature recompute, and no cached intermediate —
  *    at 100 TB the old observability pass meant caching ~1 KB/doc of
  *    signatures or recomputing the signature kernel corpus-wide;
  *  - selecting the globally-smallest `cap` keys is order-independent, so
  *    the result is deterministic and IDENTICAL to
  *    `ORDER BY xxhash64(id), id ROW_NUMBER() <= cap` (callers pass
  *    h = xxhash64(id): a doc-id-independent order makes the drop an
  *    unbiased sample).
  *
  * The buffer is a max-heap over (h, id) in arrays that GROW up to `cap`
  * (a singleton bucket serializes one entry, not a cap-sized block). An
  * optional [[LongAccumulator]] receives each group's dropped count at
  * `finish` — approximate under task retries/speculation (documented: it
  * feeds a WARN-level diagnostic; the exact per-bucket report is
  * `Dedup.lshBucketOverflow`).
  *
  * Output: ids sorted ascending (the order the pair kernels expect),
  * payloads reordered alongside, and the group's dropped count.
  */
object CappedMembersAgg {

  /** Heap buffer: entries live in [0, n); total counts every input row. */
  final case class CapBuf(var n: Int, var total: Long,
                          var hs: Array[Long], var ids: Array[Long],
                          var ps: Array[Long])

  final case class CappedMembers(ids: Array[Long], ps: Array[Long],
                                 dropped: Long)

  final case class In(h: Long, id: Long, p: Long)

  private final class Agg(cap: Int, acc: Option[LongAccumulator])
      extends Aggregator[In, CapBuf, CappedMembers] {

    private def less(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
      h1 < h2 || (h1 == h2 && i1 < i2)

    private def swap(b: CapBuf, i: Int, j: Int): Unit = {
      val h = b.hs(i); b.hs(i) = b.hs(j); b.hs(j) = h
      val d = b.ids(i); b.ids(i) = b.ids(j); b.ids(j) = d
      val p = b.ps(i); b.ps(i) = b.ps(j); b.ps(j) = p
    }

    private def siftUp(b: CapBuf, start: Int): Unit = {
      var i = start
      var done = false
      while (i > 0 && !done) {
        val par = (i - 1) >> 1
        if (less(b.hs(par), b.ids(par), b.hs(i), b.ids(i))) {
          swap(b, i, par); i = par
        } else done = true
      }
    }

    private def siftDown(b: CapBuf): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < b.n && less(b.hs(m), b.ids(m), b.hs(l), b.ids(l))) m = l
        if (r < b.n && less(b.hs(m), b.ids(m), b.hs(r), b.ids(r))) m = r
        if (m == i) done = true
        else { swap(b, i, m); i = m }
      }
    }

    private def grow(b: CapBuf): Unit =
      if (b.n == b.hs.length && b.hs.length < cap) {
        val next = math.min(math.max(4, b.hs.length * 2), cap)
        b.hs = java.util.Arrays.copyOf(b.hs, next)
        b.ids = java.util.Arrays.copyOf(b.ids, next)
        b.ps = java.util.Arrays.copyOf(b.ps, next)
      }

    /** Offer one (h, id, p); keeps the cap smallest by (h, id). */
    private def offer(b: CapBuf, h: Long, id: Long, p: Long): Unit =
      if (b.n < cap) {
        grow(b)
        b.hs(b.n) = h; b.ids(b.n) = id; b.ps(b.n) = p
        b.n += 1
        siftUp(b, b.n - 1)
      } else if (less(h, id, b.hs(0), b.ids(0))) {
        b.hs(0) = h; b.ids(0) = id; b.ps(0) = p
        siftDown(b)
      }

    override def zero: CapBuf =
      CapBuf(0, 0L, Array.emptyLongArray, Array.emptyLongArray, Array.emptyLongArray)

    override def reduce(b: CapBuf, in: In): CapBuf = {
      b.total += 1
      offer(b, in.h, in.id, in.p)
      b
    }

    override def merge(a: CapBuf, b: CapBuf): CapBuf = {
      a.total += b.total
      var i = 0
      while (i < b.n) { offer(a, b.hs(i), b.ids(i), b.ps(i)); i += 1 }
      a
    }

    override def finish(b: CapBuf): CappedMembers = {
      val idx = (0 until b.n).sortBy(i => b.ids(i))
      val ids = idx.map(i => b.ids(i)).toArray
      val ps = idx.map(i => b.ps(i)).toArray
      val dropped = b.total - b.n
      if (dropped > 0) acc.foreach(_.add(dropped))
      CappedMembers(ids, ps, dropped)
    }

    override def bufferEncoder: Encoder[CapBuf] = Encoders.product[CapBuf]
    override def outputEncoder: Encoder[CappedMembers] =
      Encoders.product[CappedMembers]
  }

  /** Column form over (h, id, payload):
    * STRUCT<ids ARRAY<BIGINT>, ps ARRAY<BIGINT>, dropped BIGINT>.
    */
  def cappedMembers(h: Column, id: Column, payload: Column, cap: Int,
                    droppedAcc: Option[LongAccumulator] = None): Column = {
    require(cap > 0, "cappedMembers needs a positive cap")
    // a product-typed Aggregator lifts to a UDAF over the product's FIELDS
    udaf(new Agg(cap, droppedAcc)).apply(h, id, payload)
  }
}
