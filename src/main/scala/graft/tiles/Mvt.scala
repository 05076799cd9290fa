package graft.tiles

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled Mapbox Vector Tile (MVT v2.1) codec — protobuf-java is not on
  * Spark's classpath, so the varint/wire format is written directly.
  *
  * Encoder semantics follow the public MVT 2.1 spec and mirror what the
  * reference produces through its vector-tile encoder (call site:
  * `/root/reference/src/main/kotlin/io/marauder/tank/application.kt:461-467`):
  * one layer, extent 4096, feature properties as a keys/values dictionary.
  * The [[decode]] half exists for golden tests (byte layouts differ between
  * encoders; decoded commands/properties are the stable comparison surface).
  *
  * Geometry input is in integer tile-local coordinates (y down). Polygon
  * exterior rings are emitted clockwise and holes counter-clockwise in
  * screen space, as the v2 spec requires.
  */
object Mvt {

  /** One feature ready to encode: geomType 1=POINT 2=LINESTRING 3=POLYGON;
    * `rings` is: points → one seq of coords; linestring → one seq per part;
    * polygon → one seq per ring (exterior first, then holes, per polygon).
    * `exteriors(i)` says whether polygon ring i is an exterior (true) or a
    * hole — required when a MultiPolygon is flattened, where "ring 0 is the
    * only exterior" no longer holds. None = single polygon (ring 0 exterior).
    */
  final case class Feature(
      id: Option[Long],
      geomType: Int,
      rings: Seq[Seq[(Int, Int)]],
      props: Seq[(String, Any)],
      exteriors: Option[Seq[Boolean]] = None)

  // ------------------------------------------------------------- low level

  final class Writer {
    val buf = new ArrayBuffer[Byte]()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { buf += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      buf += (v & 0x7f).toByte
    }
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def uint(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); varint(b.length.toLong); buf ++= b
    }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int, w: Writer): Unit = bytes(field, w.buf.toArray)
    def packed(field: Int, vs: Seq[Long]): Unit = {
      val inner = new Writer
      vs.foreach(inner.varint)
      bytes(field, inner.buf.toArray)
    }
    def double(field: Int, v: Double): Unit = {
      key(field, 1)
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => buf += ((bits >>> (8 * i)) & 0xff).toByte)
    }
  }

  def zigzag(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
  def unzigzag(v: Long): Int = ((v >>> 1) ^ -(v & 1)).toInt

  // ------------------------------------------------------------- encoding

  private def encodeValue(v: Any): Writer = {
    val w = new Writer
    v match {
      case s: String => w.str(1, s)
      case d: Double => w.double(3, d)
      case f: Float => w.double(3, f.toDouble)
      case i: Int => w.uint(4, i.toLong)
      case l: Long => w.uint(4, l)
      case b: Boolean => w.uint(7, if (b) 1L else 0L)
      case other => w.str(1, String.valueOf(other))
    }
    w
  }

  /** Signed surveyor's-formula area over tile coordinates, as MVT 2.1
    * §4.3.3.3 prescribes: in the y-down tile system a POSITIVE sum is a
    * clockwise-on-screen ring — the spec's exterior orientation. (No sign
    * flip: the spec applies the formula to tile coords directly; e.g. the
    * screen-CW square (0,0)→(10,0)→(10,10)→(0,10) sums to +200.)
    */
  private def screenArea(ring: Seq[(Int, Int)]): Long = {
    var a = 0L
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      a += x1.toLong * y2 - x2.toLong * y1
      i += 1
    }
    a
  }

  private def orient(ring: Seq[(Int, Int)], clockwise: Boolean): Seq[(Int, Int)] = {
    val cw = screenArea(ring) > 0
    if (cw == clockwise) ring else ring.reverse
  }

  /** Geometry command stream: MoveTo=1, LineTo=2, ClosePath=7. `exterior`
    * gives each polygon ring's role (default: only ring 0 is an exterior).
    */
  def geometryCommands(geomType: Int, rings: Seq[Seq[(Int, Int)]],
                       exterior: Int => Boolean = _ == 0): Seq[Long] = {
    val out = ArrayBuffer[Long]()
    var cx = 0
    var cy = 0
    def emitMove(pts: Seq[(Int, Int)]): Unit = {
      out += ((pts.length.toLong << 3) | 1)
      pts.foreach { case (x, y) =>
        out += zigzag(x - cx); out += zigzag(y - cy); cx = x; cy = y
      }
    }
    geomType match {
      case 1 => emitMove(rings.flatten)
      case 2 =>
        // a LineTo count must be >= 1 (MVT 2.1 §4.3.2): parts with fewer
        // than two points cannot form a linestring and are skipped
        rings.filter(_.length >= 2).foreach { part =>
          emitMove(part.take(1))
          out += (((part.length - 1).toLong << 3) | 2)
          part.drop(1).foreach { case (x, y) =>
            out += zigzag(x - cx); out += zigzag(y - cy); cx = x; cy = y
          }
        }
      case 3 =>
        rings.zipWithIndex.foreach { case (ring0, i) =>
          // drop the duplicated closing vertex if present; ClosePath implies it
          val open = if (ring0.length > 1 && ring0.head == ring0.last) ring0.dropRight(1) else ring0
          val ring = orient(open, clockwise = exterior(i))
          emitMove(ring.take(1))
          out += (((ring.length - 1).toLong << 3) | 2)
          ring.drop(1).foreach { case (x, y) =>
            out += zigzag(x - cx); out += zigzag(y - cy); cx = x; cy = y
          }
          out += 7L // ClosePath
        }
    }
    out.toSeq
  }

  /** Encode one layer of features into MVT tile bytes. */
  def encode(features: Seq[Feature], layerName: String, extent: Int = 4096): Array[Byte] = {
    val keys = ArrayBuffer[String]()
    val keyIdx = scala.collection.mutable.HashMap[String, Int]()
    val values = ArrayBuffer[Any]()
    val valIdx = scala.collection.mutable.HashMap[Any, Int]()

    val layer = new Writer
    layer.uint(15, 2L) // version
    layer.str(1, layerName)
    features.foreach { f =>
      val fw = new Writer
      f.id.foreach(i => fw.uint(1, i))
      val tags = f.props.flatMap { case (k, v) =>
        val ki = keyIdx.getOrElseUpdate(k, { keys += k; keys.length - 1 })
        val vi = valIdx.getOrElseUpdate(v, { values += v; values.length - 1 })
        Seq(ki.toLong, vi.toLong)
      }
      fw.packed(2, tags)
      fw.uint(3, f.geomType.toLong)
      fw.packed(4, geometryCommands(f.geomType, f.rings,
        i => f.exteriors.map(_(i)).getOrElse(i == 0)))
      layer.msg(2, fw)
    }
    keys.foreach(layer.str(3, _))
    values.foreach(v => layer.msg(4, encodeValue(v)))
    layer.uint(5, extent.toLong)

    val tile = new Writer
    tile.msg(3, layer)
    tile.buf.toArray
  }

  // ------------------------------------------------------------- decoding

  final case class DecodedFeature(
      id: Option[Long], geomType: Int, commands: Seq[Long],
      props: Map[String, Any])
  final case class DecodedLayer(
      name: String, extent: Int, features: Seq[DecodedFeature])

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var res = 0L
      while (true) {
        val x = b(pos); pos += 1
        res |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return res
        shift += 7
      }
      res
    }
    def readKey(): (Int, Int) = { val k = varint(); ((k >> 3).toInt, (k & 7).toInt) }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
    }
    def sub(): Reader = { val n = varint().toInt; val r = new Reader(b, pos, pos + n); pos += n; r }
    def bytesStr(): String = {
      val n = varint().toInt
      val s = new String(b, pos, n, "UTF-8"); pos += n; s
    }
    def fixed64Double(): Double = {
      var bits = 0L
      (0 until 8).foreach(i => bits |= (b(pos + i) & 0xffL) << (8 * i))
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  private def decodeValue(r: Reader): Any = {
    var out: Any = null
    while (r.hasNext) {
      val (f, w) = r.readKey()
      (f, w) match {
        case (1, 2) => out = r.bytesStr()
        case (3, 1) => out = r.fixed64Double()
        case (4, 0) => out = r.varint()
        case (5, 0) => out = r.varint()
        case (6, 0) => out = unzigzag(r.varint()).toLong
        case (7, 0) => out = r.varint() == 1L
        case _ => r.skip(w)
      }
    }
    out
  }

  def decode(bytes: Array[Byte]): Seq[DecodedLayer] = {
    val top = new Reader(bytes, 0, bytes.length)
    val layers = ArrayBuffer[DecodedLayer]()
    while (top.hasNext) {
      val (f, w) = top.readKey()
      if (f == 3 && w == 2) {
        val lr = top.sub()
        var name = ""; var extent = 4096
        val keys = ArrayBuffer[String]()
        val values = ArrayBuffer[Any]()
        val rawFeatures = ArrayBuffer[(Option[Long], Int, Seq[Long], Seq[Long])]()
        while (lr.hasNext) {
          val (lf, lw) = lr.readKey()
          (lf, lw) match {
            case (1, 2) => name = lr.bytesStr()
            case (5, 0) => extent = lr.varint().toInt
            case (3, 2) => keys += lr.bytesStr()
            case (4, 2) => values += decodeValue(lr.sub())
            case (2, 2) =>
              val fr = lr.sub()
              var id: Option[Long] = None; var gt = 0
              var tags = Seq.empty[Long]; var cmds = Seq.empty[Long]
              while (fr.hasNext) {
                val (ff, fw) = fr.readKey()
                (ff, fw) match {
                  case (1, 0) => id = Some(fr.varint())
                  case (3, 0) => gt = fr.varint().toInt
                  case (2, 2) =>
                    val pr = fr.sub()
                    val t = ArrayBuffer[Long]()
                    while (pr.hasNext) t += pr.varint()
                    tags = t.toSeq
                  case (4, 2) =>
                    val gr = fr.sub()
                    val g = ArrayBuffer[Long]()
                    while (gr.hasNext) g += gr.varint()
                    cmds = g.toSeq
                  case _ => fr.skip(fw)
                }
              }
              rawFeatures += ((id, gt, tags, cmds))
            case _ => lr.skip(lw)
          }
        }
        val feats = rawFeatures.map { case (id, gt, tags, cmds) =>
          val props = tags.grouped(2).collect {
            case Seq(k, v) => keys(k.toInt) -> values(v.toInt)
          }.toMap
          DecodedFeature(id, gt, cmds, props)
        }
        layers += DecodedLayer(name, extent, feats.toSeq)
      } else top.skip(w)
    }
    layers.toSeq
  }
}
