package graft.sources

/** HDF5 scale-offset filter (id 6) — pure-JVM decode (and test-side
  * encode) of H5Zscaleoffset's packed chunks, the compression netCDF-4
  * applies for `least_significant_digit` packed climate variables and
  * `H5Pset_scaleoffset` datasets. Most common of the "exotic" HDF5
  * filters in the wild; reference users reach such files through
  * `xr.open_dataset` (golden NetCDF granules,
  * reference: src/xclim/testing/helpers.py:86).
  *
  * Format (public knowledge — the HDF5 library's H5Zscaleoffset.c is
  * the format definition; re-derived here, not translated):
  *
  *  - cd_values: `[0]` scale type (0 = float D-scale, 1 = float
  *    E-scale — never implemented by the library, rejected loudly,
  *    2 = integer), `[1]` scale factor (decimal digits for D-scale;
  *    user-fixed minbits for integers, 0 = auto), `[2]` elements per
  *    chunk, `[3]` datatype class (0 integer, 1 float), `[4]` size,
  *    `[5]` sign, `[6]` byte order (0 LE, 1 BE), `[7]` fill-value
  *    defined flag, `[8..]` the fill value's bytes LSB-first, one byte
  *    per cd slot.
  *  - Chunk = 13-byte header + bitstream: bytes 0–3 `minbits` (u32 LE),
  *    byte 4 the writer's `sizeof(unsigned long long)` (always 8),
  *    bytes 5–12 `minval` (u64 LE — the typed minimum, memcpy'd).
  *    `minbits == size·8` stores the raw elements after the header;
  *    `minbits == 0` stores nothing (every code is 0). Otherwise each
  *    element contributes exactly `minbits` bits MSB-first, elements in
  *    storage order, final byte zero-padded — the same bit order as
  *    [[Nbit]] (H5Zscaleoffset's per-byte packing walks the value's
  *    used bytes most-significant-first with a partial leading byte,
  *    which is precisely the MSB-first bit field of the code).
  *  - Integer codes: `code = v − min`, header minval = the typed min
  *    memcpy'd (zero-extended) — decode adds it back mod 2^(8·size).
  *    Float D-scale: header minval = the RAW IEEE BITS of the typed
  *    float minimum (H5Z_scaleoffset_save_min memcpys the value);
  *    codes are `rnd(10^D · (v − min))` with rounding half away from
  *    zero, computed in the element type's own precision (float for
  *    f4, double for f8), and decode is `code / 10^D + min` likewise.
  *    Fill-defined files reserve the all-ones code `2^minbits − 1`;
  *    minbits is sized by `span + 1` to keep it free.
  *
  * [[Hdf5Spec]] pins hand-computed streams and property round-trips;
  * [[Hdf5PlantedScaleoffset]] plants single-chunk HDF5 files decoded
  * end-to-end through `Hdf5.readVariable` (query `q_hdf5_scaleoffset`).
  */
object Scaleoffset {

  /** Parsed parameters from the filter's cd_values. */
  final case class Params(scaleType: Int, scaleFactor: Int, nElmts: Int,
                          isFloat: Boolean, size: Int,
                          littleEndian: Boolean, fillDefined: Boolean,
                          fillBits: Long)

  private[sources] def parse(cd: Seq[Int]): Params = {
    require(cd.length >= 8,
      s"scaleoffset filter carries ${cd.length} client values (need >= 8)")
    val scaleType = cd(0)
    val cls = cd(3)
    require(cls == 0 || cls == 1, s"scaleoffset: unknown datatype class $cls")
    val isFloat = cls == 1
    if (isFloat) require(scaleType == 0,
      s"scaleoffset: float scale type $scaleType unsupported " +
        "(D-scaling only; E-scaling was never implemented by the library)")
    else require(scaleType == 2,
      s"scaleoffset: integer chunk declares scale type $scaleType (want 2)")
    val size = cd(4)
    require(size == 1 || size == 2 || size == 4 || size == 8,
      s"scaleoffset: element size $size")
    if (isFloat) require(size == 4 || size == 8,
      s"scaleoffset: float element size $size")
    val n = cd(2)
    require(n > 0, s"scaleoffset: non-positive element count $n")
    val fillDefined = cd(7) != 0
    var fillBits = 0L
    if (fillDefined) {
      require(cd.length >= 8 + size,
        s"scaleoffset: fill value needs ${8 + size} cd values, have ${cd.length}")
      var i = 0
      while (i < size) { fillBits |= (cd(8 + i) & 0xffL) << (8 * i); i += 1 }
    }
    Params(scaleType, cd(1), n, isFloat, size, cd(6) == 0, fillDefined, fillBits)
  }

  /** C llround: round half AWAY from zero (Java's Math.round rounds
    * half toward +infinity — differs on negative .5 exactly). */
  private[sources] def llround(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  private def readLe(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def writeBits(out: Array[Byte], base: Int, bits: Long,
                        size: Int, littleEndian: Boolean): Unit = {
    var k = 0
    if (littleEndian)
      while (k < size) { out(base + k) = ((bits >>> (8 * k)) & 0xff).toByte; k += 1 }
    else
      while (k < size) {
        out(base + k) = ((bits >>> (8 * (size - 1 - k))) & 0xff).toByte; k += 1
      }
  }

  private def readBits(b: Array[Byte], base: Int, size: Int,
                       littleEndian: Boolean): Long = {
    var bits = 0L
    var k = 0
    if (littleEndian)
      while (k < size) { bits |= (b(base + k) & 0xffL) << (8 * k); k += 1 }
    else
      while (k < size) {
        bits |= (b(base + k) & 0xffL) << (8 * (size - 1 - k)); k += 1
      }
    bits
  }

  /** Reverse the filter: `stored` is the chunk as read (after any later
    * filters are undone), `rawLen` the unfiltered chunk byte size.
    * Output bytes are in the DATASET's declared order (cd[6]), ready
    * for the normal element decoder. */
  def decode(stored: Array[Byte], cd: Seq[Int], rawLen: Int): Array[Byte] = {
    val p = parse(cd)
    require(p.nElmts.toLong * p.size == rawLen,
      s"scaleoffset: ${p.nElmts} x ${p.size}-byte elements != raw $rawLen bytes")
    require(stored.length >= 13,
      s"scaleoffset chunk of ${stored.length} bytes lacks the 13-byte header")
    val minbits = readLe(stored, 0, 4).toInt
    require((stored(4) & 0xff) == 8,
      s"scaleoffset header declares ${stored(4) & 0xff}-byte minval (want 8)")
    val minval = readLe(stored, 5, 8)
    require(minbits >= 0 && minbits <= p.size * 8,
      s"scaleoffset: minbits $minbits for ${p.size}-byte elements")
    if (minbits == p.size * 8) { // full precision: raw elements follow
      require(stored.length >= 13 + rawLen,
        s"scaleoffset full-precision chunk holds ${stored.length - 13} of $rawLen")
      return java.util.Arrays.copyOfRange(stored, 13, 13 + rawLen)
    }
    val needBits = p.nElmts.toLong * minbits
    require((stored.length - 13).toLong * 8 >= needBits,
      s"scaleoffset stream of ${stored.length - 13} bytes short of $needBits bits")
    val out = new Array[Byte](rawLen)
    val mask = if (minbits == 0) 0L else (1L << minbits) - 1
    val dScale = if (p.isFloat) math.pow(10.0, p.scaleFactor.toDouble) else 0.0
    var bitPos = 0L
    var i = 0
    while (i < p.nElmts) {
      var code = 0L
      var b = 0
      while (b < minbits) { // MSB-first field
        val pos = 13L * 8 + bitPos + b
        code = (code << 1) | ((stored((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1)
        b += 1
      }
      bitPos += minbits
      val bits =
        if (p.fillDefined && code == mask) p.fillBits
        else if (!p.isFloat) code + minval // wraps mod 2^64; low bytes written
        else if (p.size == 4) {
          // minval holds the RAW BITS of the float minimum (libhdf5
          // memcpys the typed min); decode is code/10^D + min in the
          // element type's own precision, exactly like modify_3/4
          val minF = java.lang.Float.intBitsToFloat(minval.toInt)
          val v = code.toInt / dScale.toFloat + minF
          java.lang.Float.floatToIntBits(v) & 0xffffffffL
        } else {
          val minD = java.lang.Double.longBitsToDouble(minval)
          java.lang.Double.doubleToLongBits(code.toDouble / dScale + minD)
        }
      writeBits(out, i * p.size, bits, p.size, p.littleEndian)
      i += 1
    }
    out
  }

  /** ceil(log2(num)) as H5Z__scaleoffset_log2 computes it. */
  private def log2Ceil(num: Long): Int = {
    var v = 0
    var lb = 1L
    while (lb < num) { lb <<= 1; v += 1 }
    v
  }

  /** Forward filter (fixtures and round-trip tests only): `raw` holds
    * elements in the dataset's declared order. Mirrors
    * H5Z__scaleoffset_precompress exactly, including the reserved
    * all-ones fill code and the auto-minbits span formulas. */
  private[graft] def encode(raw: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    val p = parse(cd)
    require(p.nElmts.toLong * p.size == raw.length,
      s"scaleoffset encode: ${p.nElmts} x ${p.size} != ${raw.length} bytes")
    val widthMask = if (p.size == 8) -1L else (1L << (p.size * 8)) - 1
    def signed(bits: Long): Long = // sign-extend size-byte field
      (bits << (64 - p.size * 8)) >> (64 - p.size * 8)

    // integer codes per element (for floats: the llround integer codes)
    val codes = new Array[Long](p.nElmts)
    var minbits = 0
    var minval = 0L
    if (!p.isFloat) {
      val vals = Array.tabulate(p.nElmts)(i =>
        signed(readBits(raw, i * p.size, p.size, p.littleEndian)))
      val fill = signed(p.fillBits)
      val nonFill = if (p.fillDefined) vals.filter(_ != fill) else vals
      require(nonFill.nonEmpty, "scaleoffset encode: all elements are fill")
      val mn = nonFill.min
      val mx = nonFill.max
      minbits = if (p.scaleFactor != 0) p.scaleFactor
        else {
          val span = mx - mn + 1
          log2Ceil(if (p.fillDefined) span + 1 else span)
        }
      minval = mn & widthMask // typed-min memcpy: zero-extended, not sign-
      if (minbits == p.size * 8) {   // extended (decode only reads low bytes)
        val out = new Array[Byte](13 + raw.length)
        writeHeader(out, minbits, minval)
        System.arraycopy(raw, 0, out, 13, raw.length)
        return out
      }
      val mask = if (minbits == 0) 0L else (1L << minbits) - 1
      var i = 0
      while (i < p.nElmts) {
        codes(i) = if (p.fillDefined && vals(i) == fill) mask else vals(i) - mn
        i += 1
      }
    } else {
      // codes = rnd(10^D · (v − min)) in the element type's OWN
      // precision (modify_1/2's float vs double paths); minval stores
      // the raw IEEE bits of the typed minimum (save_min memcpy,
      // zero-extended for f4)
      val d = math.pow(10.0, p.scaleFactor.toDouble)
      def value(i: Int): Double = {
        val bits = readBits(raw, i * p.size, p.size, p.littleEndian)
        if (p.size == 4) java.lang.Float.intBitsToFloat(bits.toInt).toDouble
        else java.lang.Double.longBitsToDouble(bits)
      }
      val fill = if (p.size == 4)
        java.lang.Float.intBitsToFloat(p.fillBits.toInt).toDouble
      else java.lang.Double.longBitsToDouble(p.fillBits)
      val vals = Array.tabulate(p.nElmts)(value)
      val nonFill = if (p.fillDefined) vals.filter(_ != fill) else vals
      require(nonFill.nonEmpty, "scaleoffset encode: all elements are fill")
      val mn = nonFill.min
      def codeOf(v: Double): Long =
        if (p.size == 4) llround((d.toFloat * (v.toFloat - mn.toFloat)).toDouble)
        else llround(d * (v - mn))
      val span = codeOf(nonFill.max) + 1
      minbits = log2Ceil(if (p.fillDefined) span + 1 else span)
      minval = if (p.size == 4)
        java.lang.Float.floatToIntBits(mn.toFloat) & 0xffffffffL
      else java.lang.Double.doubleToLongBits(mn)
      require(minbits < p.size * 8,
        "scaleoffset encode: D-scale overflowed to full precision " +
          "(pick fewer digits for the fixture)")
      val mask = if (minbits == 0) 0L else (1L << minbits) - 1
      var i = 0
      while (i < p.nElmts) {
        codes(i) = if (p.fillDefined && vals(i) == fill) mask else codeOf(vals(i))
        i += 1
      }
    }
    val totalBits = p.nElmts.toLong * minbits
    val out = new Array[Byte](13 + ((totalBits + 7) / 8).toInt)
    writeHeader(out, minbits, minval)
    var bitPos = 13L * 8
    var i = 0
    while (i < p.nElmts) {
      var b = minbits - 1
      while (b >= 0) {
        if (((codes(i) >>> b) & 1) != 0)
          out((bitPos >> 3).toInt) =
            (out((bitPos >> 3).toInt) | (1 << (7 - (bitPos & 7).toInt))).toByte
        bitPos += 1
        b -= 1
      }
      i += 1
    }
    out
  }

  private def writeHeader(out: Array[Byte], minbits: Int, minval: Long): Unit = {
    var i = 0
    while (i < 4) { out(i) = ((minbits >>> (8 * i)) & 0xff).toByte; i += 1 }
    out(4) = 8
    i = 0
    while (i < 8) { out(5 + i) = ((minval >>> (8 * i)) & 0xff).toByte; i += 1 }
  }
}
