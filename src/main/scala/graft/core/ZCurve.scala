package graft.core

/** Z-order (Morton) curve codec.
  *
  * Semantics of the reference's Morton interleave/deinterleave
  * (`/root/reference/src/main/kotlin/io/marauder/tank/zCurve.kt:8-31`):
  * interleave two 16-bit tile coordinates into a single Int whose bits
  * alternate x/y (x in even positions, y in odd). At the default hash level 13
  * the result fits in 26 bits, so the Int is always non-negative.
  *
  * Implemented with the classic magic-number bit spread (public-domain
  * "Interleave bits by Binary Magic Numbers" from Sean Anderson's Bit Twiddling
  * Hacks), which is also what the reference uses.
  */
object ZCurve {

  /** Spread the low 16 bits of n so they occupy even bit positions. */
  def spread(n0: Int): Int = {
    var n = n0 & 0x0000ffff
    n = (n | (n << 8)) & 0x00ff00ff
    n = (n | (n << 4)) & 0x0f0f0f0f
    n = (n | (n << 2)) & 0x33333333
    n = (n | (n << 1)) & 0x55555555
    n
  }

  /** Inverse of [[spread]]: collect even bit positions into the low 16 bits. */
  def compact(z0: Int): Int = {
    var z = z0 & 0x55555555
    z = (z | (z >> 1)) & 0x33333333
    z = (z | (z >> 2)) & 0x0f0f0f0f
    z = (z | (z >> 4)) & 0x00ff00ff
    z = (z | (z >> 8)) & 0x0000ffff
    z
  }

  /** Morton code of (x, y); x bits land in even positions. */
  def interleave(x: Int, y: Int): Int = spread(x) | (spread(y) << 1)

  /** Inverse of [[interleave]]. */
  def deinterleave(z: Int): (Int, Int) = (compact(z), compact(z >> 1))

  /** Long-typed interleave of the low 16 bits of each input — the form
    * called from generated code ([[graft.functions.MortonHashExpr]]).
    */
  def interleaveLong(x: Long, y: Long): Long =
    interleave((x & 0xffffL).toInt, (y & 0xffffL).toInt).toLong & 0xffffffffL
}
