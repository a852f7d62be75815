package graft.sources

/** HDF5 n-bit filter (id 5) — pure-JVM decode (and test-side encode) of
  * the bit-packed chunks libhdf5's H5Znbit writes for reduced-precision
  * atomic datatypes (the classic use: 12-bit sensor words declared as an
  * `H5T_STD_I16LE` copy with `H5Tset_precision(12)` — the filter then
  * stores only the significant bits, 1.33× smaller before any deflate).
  *
  * Format (public knowledge — the HDF5 library's n-bit filter contract;
  * there is no separate standards document, the library source *is* the
  * format definition, re-derived here rather than translated):
  *
  *  - The filter's client data (pipeline-message `cd_values`) carries
  *    `[0]` = number of valid cd values, `[1]` = compression-needed flag
  *    (0 means every (sub)type is full-precision and the chunk is stored
  *    raw), `[2]` = elements per chunk, and from `[3]` a recursive
  *    datatype description whose tag is 1 ATOMIC / 2 ARRAY / 3 COMPOUND /
  *    4 NO-OP. Only ATOMIC is supported here (tag, size-in-bytes, byte
  *    order 0=LE 1=BE, precision bits, offset bits); ARRAY/COMPOUND
  *    reject loudly.
  *  - The compressed chunk is one continuous MSB-first bitstream: each
  *    element contributes exactly its `precision`-bit field — the bits at
  *    positions `[offset, offset+precision)` counted from the integer's
  *    LSB — written most-significant bit first, elements in storage
  *    order, final byte zero-padded. Decompression restores the field at
  *    `offset` and zeroes the padding bits, byte-identical to what an
  *    UNfiltered write of the same reduced-precision datatype stores, so
  *    the normal element decoder downstream needs no special casing.
  *
  * [[NbitSpec]] pins hand-computed bitstreams (offset 0 and mid-byte
  * offsets, LE and BE, 1–8-byte sizes), property round-trips, and the
  * planted single-chunk HDF5 integration fixture [[Hdf5PlantedNbit]]
  * decoded end-to-end through `Hdf5.readVariable` (query `q_hdf5_nbit`).
  */
object Nbit {

  val TagAtomic = 1

  /** Parsed atomic parameters from the filter's cd_values. */
  final case class Params(needed: Boolean, nElmts: Int, size: Int,
                          littleEndian: Boolean, precision: Int, offset: Int)

  private[sources] def parse(cd: Seq[Int]): Params = {
    require(cd.length >= 3,
      s"nbit filter carries ${cd.length} client values (need >= 3)")
    val needed = cd(1) != 0
    val nElmts = cd(2)
    require(nElmts > 0, s"nbit: non-positive element count $nElmts")
    if (!needed)
      // full-precision everywhere: chunk stored raw; dtype tail unused
      return Params(needed = false, nElmts, 0, littleEndian = true, 0, 0)
    require(cd.length >= 8 && cd(3) == TagAtomic,
      s"nbit: unsupported datatype description tag ${cd.lift(3).getOrElse(-1)} " +
        "(atomic only; array/compound bases are rejected loudly)")
    val size = cd(4); val le = cd(5) == 0; val prec = cd(6); val off = cd(7)
    require(size >= 1 && size <= 8, s"nbit: element size $size")
    require(prec >= 1 && off >= 0 && prec + off <= size * 8,
      s"nbit: precision $prec + offset $off exceed ${size * 8} bits")
    Params(needed = true, nElmts, size, le, prec, off)
  }

  /** Reverse the filter: `stored` is the chunk as read (after any later
    * filters are undone), `rawLen` the unfiltered chunk byte size. */
  def decode(stored: Array[Byte], cd: Seq[Int], rawLen: Int): Array[Byte] = {
    val p = parse(cd)
    if (!p.needed) {
      require(stored.length >= rawLen,
        s"nbit pass-through chunk holds ${stored.length} of $rawLen bytes")
      return if (stored.length == rawLen) stored else stored.take(rawLen)
    }
    require(p.nElmts.toLong * p.size == rawLen,
      s"nbit: ${p.nElmts} x ${p.size}-byte elements != raw chunk of $rawLen bytes")
    val needBits = p.nElmts.toLong * p.precision
    require(stored.length.toLong * 8 >= needBits,
      s"nbit stream of ${stored.length} bytes short of $needBits bits")
    val out = new Array[Byte](rawLen)
    var bitPos = 0L
    var i = 0
    while (i < p.nElmts) {
      // read `precision` bits MSB-first
      var v = 0L; var b = 0
      while (b < p.precision) {
        val pos = bitPos + b
        v = (v << 1) | ((stored((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1)
        b += 1
      }
      bitPos += p.precision
      val bits = if (p.offset == 0) v else v << p.offset
      val base = i * p.size
      var k = 0
      if (p.littleEndian)
        while (k < p.size) { out(base + k) = ((bits >>> (8 * k)) & 0xFF).toByte; k += 1 }
      else
        while (k < p.size) {
          out(base + k) = ((bits >>> (8 * (p.size - 1 - k))) & 0xFF).toByte; k += 1
        }
      i += 1
    }
    out
  }

  /** Forward filter (fixtures and round-trip tests only — the library
    * never writes nbit): pack each element's `precision`-bit field
    * MSB-first; padding bits outside the field are dropped. */
  private[graft] def encode(raw: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    val p = parse(cd)
    if (!p.needed) return raw
    require(p.nElmts.toLong * p.size == raw.length,
      s"nbit encode: ${p.nElmts} x ${p.size} != ${raw.length} bytes")
    val totalBits = p.nElmts.toLong * p.precision
    val out = new Array[Byte](((totalBits + 7) / 8).toInt)
    val mask = if (p.precision == 64) -1L else (1L << p.precision) - 1
    var bitPos = 0L
    var i = 0
    while (i < p.nElmts) {
      val base = i * p.size
      var bits = 0L; var k = 0
      if (p.littleEndian)
        while (k < p.size) { bits |= (raw(base + k) & 0xFFL) << (8 * k); k += 1 }
      else
        while (k < p.size) {
          bits |= (raw(base + k) & 0xFFL) << (8 * (p.size - 1 - k)); k += 1
        }
      val v = (bits >>> p.offset) & mask
      var b = p.precision - 1
      while (b >= 0) {
        if (((v >>> b) & 1) != 0)
          out((bitPos >> 3).toInt) = (out((bitPos >> 3).toInt) |
            (1 << (7 - (bitPos & 7).toInt))).toByte
        bitPos += 1
        b -= 1
      }
      i += 1
    }
    out
  }
}
