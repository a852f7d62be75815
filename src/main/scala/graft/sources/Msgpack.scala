package graft.sources

/** Minimal MessagePack decoder — exactly the subset a numcodecs
  * `MsgPack`-encoded Zarr object chunk can contain (top-level array of
  * str/bin/nil/bool/int/float values plus the trailing dtype string and
  * shape array; see `Zarr.readStrings`). The wire layout is the public
  * MessagePack spec (format byte → payload); maps and ext types never
  * appear in numcodecs output and are rejected loudly, never skipped —
  * a format this decoder does not model must fail, not misread.
  *
  * Reference behavior: `numcodecs.MsgPack.encode` packs
  * `buf.tolist() + [buf.dtype.str, buf.shape]` with `use_bin_type=True`
  * (python str → str formats, bytes → bin formats). The decode side
  * here is structure-validated by the caller: the trailing two elements
  * must be an `|O` dtype string and a shape whose product equals the
  * chunk grid, so a wrong structural guess fails loudly. */
object Msgpack {

  sealed trait MValue
  case object MNull extends MValue
  final case class MBool(b: Boolean) extends MValue
  final case class MLong(v: Long) extends MValue
  final case class MDouble(v: Double) extends MValue
  final case class MStr(s: String) extends MValue
  final case class MBin(b: Array[Byte]) extends MValue
  final case class MArr(items: Vector[MValue]) extends MValue

  /** Decode one complete value; trailing bytes are an error (a numcodecs
    * chunk is exactly one top-level array). */
  def decode(in: Array[Byte], what: String): MValue = {
    val d = new Dec(in, what)
    val v = d.value()
    require(d.eof, s"$what: ${in.length - d.pos} trailing bytes after msgpack value")
    v
  }

  private final class Dec(in: Array[Byte], what: String) {
    var pos = 0
    def eof: Boolean = pos >= in.length

    private def need(n: Int): Unit =
      require(pos + n <= in.length,
        s"$what: truncated msgpack value ($n bytes needed at $pos of ${in.length})")
    private def u8(): Int = { need(1); val b = in(pos) & 0xFF; pos += 1; b }
    private def u16(): Int = (u8() << 8) | u8()
    private def u32(): Long = ((u16().toLong << 16) | u16()) & 0xFFFFFFFFL
    private def i64(): Long = (u32() << 32) | u32()
    private def bytes(n: Int): Array[Byte] = {
      need(n)
      val b = java.util.Arrays.copyOfRange(in, pos, pos + n); pos += n; b
    }
    private def str(n: Int): MStr =
      MStr(new String(bytes(n), java.nio.charset.StandardCharsets.UTF_8))
    private def arr(n: Int): MArr = {
      require(n <= in.length - pos,
        s"$what: msgpack array claims $n items with ${in.length - pos} bytes left")
      MArr(Vector.fill(n)(value()))
    }
    private def len32(v: Long, kind: String): Int = {
      require(v <= Int.MaxValue, s"$what: msgpack $kind length $v overflows")
      v.toInt
    }

    def value(): MValue = {
      val b = u8()
      b match {
        case x if x <= 0x7F            => MLong(x.toLong)          // pos fixint
        case x if x >= 0xE0            => MLong((x - 256).toLong)  // neg fixint
        case x if (x & 0xF0) == 0x90   => arr(x & 0x0F)            // fixarray
        case x if (x & 0xE0) == 0xA0   => str(x & 0x1F)            // fixstr
        case 0xC0                      => MNull
        case 0xC2                      => MBool(false)
        case 0xC3                      => MBool(true)
        case 0xC4                      => MBin(bytes(u8()))        // bin8
        case 0xC5                      => MBin(bytes(u16()))       // bin16
        case 0xC6                      => MBin(bytes(len32(u32(), "bin"))) // bin32
        case 0xCA                      => MDouble(java.lang.Float.intBitsToFloat(u32().toInt).toDouble)
        case 0xCB                      => MDouble(java.lang.Double.longBitsToDouble(i64()))
        case 0xCC                      => MLong(u8().toLong)       // uint8
        case 0xCD                      => MLong(u16().toLong)      // uint16
        case 0xCE                      => MLong(u32())             // uint32
        case 0xCF                      =>                          // uint64
          val v = i64()
          require(v >= 0, s"$what: msgpack uint64 $v overflows signed range")
          MLong(v)
        case 0xD0                      => MLong(u8().toByte.toLong)   // int8
        case 0xD1                      => MLong(u16().toShort.toLong) // int16
        case 0xD2                      => MLong(u32().toInt.toLong)   // int32
        case 0xD3                      => MLong(i64())                // int64
        case 0xD9                      => str(u8())                // str8
        case 0xDA                      => str(u16())               // str16
        case 0xDB                      => str(len32(u32(), "str")) // str32
        case 0xDC                      => arr(u16())               // array16
        case 0xDD                      => arr(len32(u32(), "array")) // array32
        case other                     => throw new IllegalArgumentException(
          f"$what: msgpack format 0x$other%02x unsupported " +
            "(maps/ext never appear in numcodecs object chunks)")
      }
    }
  }

  // ------------- encoder (planted fixtures + round-trip tests only) -------------

  /** Encode for fixtures/tests: the same subset, always using the
    * smallest-width canonical format the python packer emits. */
  def encode(v: MValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    enc(v, out)
    out.toByteArray
  }
  private def enc(v: MValue, out: java.io.ByteArrayOutputStream): Unit = v match {
    case MNull        => out.write(0xC0)
    case MBool(false) => out.write(0xC2)
    case MBool(true)  => out.write(0xC3)
    case MLong(x) =>
      if (x >= 0 && x <= 0x7F) out.write(x.toInt)
      else if (x < 0 && x >= -32) out.write((x + 256).toInt)
      else if (x >= 0 && x <= 0xFF) { out.write(0xCC); out.write(x.toInt) }
      else if (x >= Short.MinValue && x <= Short.MaxValue) {
        out.write(0xD1); out.write((x >> 8).toInt & 0xFF); out.write(x.toInt & 0xFF)
      } else if (x >= Int.MinValue && x <= Int.MaxValue) {
        out.write(0xD2); var i = 3
        while (i >= 0) { out.write((x >> (8 * i)).toInt & 0xFF); i -= 1 }
      } else {
        out.write(0xD3); var i = 7
        while (i >= 0) { out.write((x >> (8 * i)).toInt & 0xFF); i -= 1 }
      }
    case MDouble(x) =>
      out.write(0xCB)
      val bits = java.lang.Double.doubleToLongBits(x)
      var i = 7
      while (i >= 0) { out.write((bits >> (8 * i)).toInt & 0xFF); i -= 1 }
    case MStr(s) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (b.length <= 31) out.write(0xA0 | b.length)
      else if (b.length <= 0xFF) { out.write(0xD9); out.write(b.length) }
      else if (b.length <= 0xFFFF) {
        out.write(0xDA); out.write((b.length >> 8) & 0xFF); out.write(b.length & 0xFF)
      } else { out.write(0xDB); u32be(b.length, out) }
      out.write(b, 0, b.length)
    case MBin(b) =>
      if (b.length <= 0xFF) { out.write(0xC4); out.write(b.length) }
      else if (b.length <= 0xFFFF) {
        out.write(0xC5); out.write((b.length >> 8) & 0xFF); out.write(b.length & 0xFF)
      } else { out.write(0xC6); u32be(b.length, out) }
      out.write(b, 0, b.length)
    case MArr(items) =>
      if (items.length <= 15) out.write(0x90 | items.length)
      else if (items.length <= 0xFFFF) {
        out.write(0xDC); out.write((items.length >> 8) & 0xFF); out.write(items.length & 0xFF)
      } else { out.write(0xDD); u32be(items.length, out) }
      items.foreach(enc(_, out))
  }
  private def u32be(n: Int, out: java.io.ByteArrayOutputStream): Unit = {
    out.write((n >>> 24) & 0xFF); out.write((n >>> 16) & 0xFF)
    out.write((n >>> 8) & 0xFF); out.write(n & 0xFF)
  }
}
