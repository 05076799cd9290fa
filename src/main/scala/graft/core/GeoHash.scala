package graft.core

/** Base-32 geohash codec.
  *
  * The reference carries an (unused) geohash implementation
  * (`/root/reference/src/main/kotlin/io/marauder/tank/geohash.kt:9-115`);
  * we provide the same capability — standard public geohash algorithm
  * (Niemeyer encoding): interleaved lon/lat bisection, 5 bits per base-32
  * character.
  */
object GeoHash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val Decode: Map[Char, Int] = Base32.zipWithIndex.toMap

  def encode(lat: Double, lon: Double, precision: Int = 12): String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new StringBuilder
    var bit = 0; var ch = 0; var evenBit = true
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(Base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Decoded cell center (lat, lon). */
  def decode(hash: String): (Double, Double) = {
    val (latLo, latHi, lonLo, lonHi) = bounds(hash)
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  /** (latMin, latMax, lonMin, lonMax) of the geohash cell. Geohashes are
    * conventionally case-insensitive; invalid characters get a descriptive
    * error instead of a bare key-lookup failure.
    */
  def bounds(hash: String): (Double, Double, Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    for (c0 <- hash; i <- 4 to 0 by -1) {
      val c = Character.toLowerCase(c0)
      require(Decode.contains(c), s"invalid geohash character '$c0' in '$hash'")
      val b = (Decode(c) >> i) & 1
      if (evenBit) { val mid = (lonLo + lonHi) / 2; if (b == 1) lonLo = mid else lonHi = mid }
      else { val mid = (latLo + latHi) / 2; if (b == 1) latLo = mid else latHi = mid }
      evenBit = !evenBit
    }
    (latLo, latHi, lonLo, lonHi)
  }
}
