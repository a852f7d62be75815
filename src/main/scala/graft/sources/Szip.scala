package graft.sources

/** CCSDS 121.0-B adaptive-entropy (extended-Rice) coder — the payload of
  * HDF5's szip filter (id 4). Implemented from the public CCSDS 121.0-B
  * recommendation and the documented szip/libaec parameter conventions;
  * no szip source is copied. HDF5 framing (`H5Zszip`): the filter's
  * client data carries [options_mask, bits_per_pixel, pixels_per_block,
  * pixels_per_scanline], the stream itself is "raw" (no SZ header), and
  * each compressed chunk is prefixed with a little-endian u32 holding the
  * original byte count.
  *
  * Coding model (per the recommendation):
  *  - samples are n-bit unsigned integers (n in [4,32] supported here —
  *    reject-loudly outside), grouped into blocks of J samples
  *    (J even, 4..32) and reference-sample intervals of
  *    `rsi = ceil(pixels_per_scanline / J)` blocks — ceil, because
  *    H5Zszip takes pixels_per_scanline from the chunk's fastest
  *    dimension, which need not divide J (libaec convention; references
  *    then recur every rsi·J samples);
  *  - with NN preprocessing (option bit 32) each interval starts with an
  *    absolute reference sample and the rest are unit-delay prediction
  *    residuals through the standard non-negative mapping
  *    (2Δ / 2|Δ|−1 / θ+|Δ| with θ = min(pred, xmax−pred));
  *  - per block, an ID field of 3/4/5 bits (n ≤ 8 / ≤ 16 / ≤ 32) selects:
  *    0+'0' zero-block run (FS-coded count; 1..4 direct, 5 = rest-of-
  *    segment over 64-block segments, ≥6 stored as count+1), 0+'1'
  *    second extension (pairwise (a+b)(a+b+1)/2+b, FS-coded), i ∈
  *    [1, max−1] sample-splitting with k = i−1 (FS-coded high parts
  *    first, then the k-bit LSB fields), max = uncompressed n-bit
  *    samples. FS(v) = v zero bits then a '1'.
  *
  * The decoder REJECTS a second-extension block that contains a
  * reference sample (the pairing convention varies between
  * implementations; our encoder never emits it) — a loud IOException
  * beats a silent misread, the posture every other tail case in this
  * reader takes. Coverage lives in SzipSpec (hand-pinned bitstreams per
  * block mode, encode/decode round-trips across option masks, framing)
  * and Hdf5Spec's planted szip-filtered file read through
  * [[Hdf5.readVariable]]; `q_hdf5_szip` puts the ingest under the
  * driver's DuckDB gate.
  */
object Szip {
  // public H5_SZIP_* option-mask bits
  val AllowK13 = 1; val Chip = 2; val EC = 4; val LSB = 8
  val MSB = 16; val NN = 32; val Raw = 128

  private final class BitReader(val in: Array[Byte]) {
    private var pos = 0L // bit position
    private val limit = in.length.toLong * 8
    def bits(n: Int): Long = {
      require(pos + n <= limit, s"szip stream exhausted at bit $pos (+$n)")
      var v = 0L; var i = 0
      while (i < n) {
        val p = pos + i
        v = (v << 1) | ((in((p >> 3).toInt) >> (7 - (p & 7).toInt)) & 1)
        i += 1
      }
      pos += n
      v
    }
    /** fundamental-sequence codeword: count zeros until the terminating 1. */
    def fs(): Long = {
      var v = 0L
      while ({
        require(pos < limit, "szip stream exhausted inside FS codeword")
        val bit = (in((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
        pos += 1
        bit == 0
      }) v += 1
      v
    }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var nb = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1).toInt
        nb += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def fs(v: Long): Unit = { var i = 0L; while (i < v) { put(0, 1); i += 1 }; put(1, 1) }
    def bytes(): Array[Byte] = {
      if (nb > 0) { buf.write(cur << (8 - nb)); cur = 0; nb = 0 }
      buf.toByteArray
    }
  }

  private def idLenFor(n: Int): Int = if (n > 16) 5 else if (n > 8) 4 else 3

  private def checkParams(n: Int, j: Int, scanline: Int): Unit = {
    require(n >= 4 && n <= 32, s"szip bits_per_pixel $n unsupported (4..32)")
    require(j >= 4 && j <= 32 && j % 2 == 0,
      s"szip pixels_per_block $j unsupported (even, 4..32)")
    require(scanline >= 1 && scanline <= 128 * j,
      s"szip pixels_per_scanline $scanline out of range (1..${128 * j})")
  }

  /** Reference-sample interval in BLOCKS: H5Zszip sets
    * pixels_per_scanline from the chunk's fastest dimension, which is
    * frequently NOT a multiple of pixels_per_block — libaec's szip
    * compat layer ceil-divides (references then recur every
    * `rsiBlocks*j` samples, not every `scanline`). */
  private def rsiBlocksFor(j: Int, scanline: Int): Int =
    math.max(1, (scanline + j - 1) / j)

  // ---------------- decode ----------------

  /** Decode `total` samples from a raw szip stream. */
  private[sources] def decodeSamples(in: Array[Byte], mask: Int, n: Int,
                                     j: Int, scanline: Int,
                                     total: Int): Array[Long] = {
    checkParams(n, j, scanline)
    val pre = (mask & NN) != 0
    val idLen = idLenFor(n)
    val idMax = (1 << idLen) - 1
    val rsiBlocks = rsiBlocksFor(j, scanline)
    val blocksTotal = (total + j - 1) / j
    val delta = new Array[Long](blocksTotal * j)
    val br = new BitReader(in)
    var b = 0
    while (b < blocksTotal) {
      val inRsi = b % rsiBlocks
      val ref = pre && inRsi == 0
      // segments of 64 blocks, restarting at each reference interval
      val segEnd = math.min(math.min(b - (inRsi % 64) + 64,
        b - inRsi + rsiBlocks), blocksTotal)
      val base = b * j
      val id = br.bits(idLen).toInt
      if (id == 0) {
        if (br.bits(1) == 1) { // second extension
          require(!ref,
            "szip second-extension block carrying a reference sample: " +
              "pairing convention not portable, rejecting rather than misread")
          var i = 0
          while (i < j) {
            val m = br.fs()
            // invert m = g(g+1)/2 + d1 with g = d0 + d1
            var g = ((math.sqrt(8.0 * m + 1.0) - 1.0) / 2.0).toLong
            while ((g + 1) * (g + 2) / 2 <= m) g += 1
            while (g * (g + 1) / 2 > m) g -= 1
            val d1 = m - g * (g + 1) / 2
            delta(base + i) = g - d1
            delta(base + i + 1) = d1
            i += 2
          }
          b += 1
        } else { // zero-block run
          if (ref) delta(base) = br.bits(n)
          val f = br.fs()
          val run =
            if (f + 1 == 5) segEnd - b // rest of segment
            else if (f + 1 > 5) f // 6.. stored as count+1
            else f + 1 // 1..4 direct
          require(run >= 1 && b + run <= segEnd,
            s"szip zero run $run overflows segment at block $b")
          // blocks (and the non-reference samples of this one) stay zero
          b += run.toInt
        }
      } else if (id == idMax) { // uncompressed
        var i = 0
        while (i < j) { delta(base + i) = br.bits(n); i += 1 }
        b += 1
      } else { // sample splitting, k = id - 1
        val k = id - 1
        val start = if (ref) { delta(base) = br.bits(n); 1 } else 0
        var i = start
        while (i < j) { delta(base + i) = br.fs() << k; i += 1 }
        if (k > 0) {
          i = start
          while (i < j) { delta(base + i) |= br.bits(k); i += 1 }
        }
        b += 1
      }
    }
    // postprocess: undo the prediction mapping per reference interval
    val out = new Array[Long](total)
    if (!pre) {
      System.arraycopy(delta, 0, out, 0, total)
    } else {
      val xmax = if (n == 64) -1L else (1L << n) - 1
      val period = rsiBlocks * j
      var s = 0
      while (s < total) {
        val isRef = (s % period) == 0
        if (isRef) out(s) = delta(s)
        else {
          val p = out(s - 1)
          val theta = math.min(p, xmax - p)
          val d = delta(s)
          val dd =
            if (d <= 2 * theta) { if ((d & 1) == 0) d / 2 else -((d + 1) / 2) }
            else if (theta == p) d - theta
            else -(d - theta)
          out(s) = p + dd
          require(out(s) >= 0 && out(s) <= xmax,
            s"szip sample out of $n-bit range after unmapping at $s")
        }
        s += 1
      }
    }
    out
  }

  // ---------------- encode (fixture writer + round-trip tests) ----------------

  private[sources] def encodeSamples(x: Array[Long], mask: Int, n: Int,
                                     j: Int, scanline: Int): Array[Byte] = {
    checkParams(n, j, scanline)
    val pre = (mask & NN) != 0
    val idLen = idLenFor(n)
    val idMax = (1 << idLen) - 1
    val rsiBlocks = rsiBlocksFor(j, scanline)
    val period = rsiBlocks * j
    val xmax = (1L << n) - 1
    val blocksTotal = (x.length + j - 1) / j
    // pad the final partial block by repeating the last sample: its
    // residuals map to zero, and the decoder discards the excess
    val padded = new Array[Long](blocksTotal * j)
    System.arraycopy(x, 0, padded, 0, x.length)
    var t = x.length
    while (t < padded.length) { padded(t) = if (t > 0) padded(t - 1) else 0L; t += 1 }
    // preprocess
    val delta = new Array[Long](padded.length)
    var s = 0
    while (s < padded.length) {
      if (!pre || s % period == 0) delta(s) = padded(s)
      else {
        val p = padded(s - 1)
        val theta = math.min(p, xmax - p)
        val d = padded(s) - p
        delta(s) =
          if (d >= 0 && d <= theta) 2 * d
          else if (d < 0 && -d <= theta) -2 * d - 1
          else theta + math.abs(d)
      }
      s += 1
    }
    val bw = new BitWriter()
    var b = 0
    while (b < blocksTotal) {
      val inRsi = b % rsiBlocks
      val ref = pre && inRsi == 0
      val segEnd = math.min(math.min(b - (inRsi % 64) + 64,
        b - inRsi + rsiBlocks), blocksTotal)
      val base = b * j
      def blockZero(bi: Int): Boolean = {
        val st = bi * j + (if (pre && (bi % rsiBlocks) == 0) 1 else 0)
        var i = st
        while (i < bi * j + j) { if (delta(i) != 0) return false; i += 1 }
        true
      }
      if (blockZero(b)) {
        var run = 1
        while (b + run < segEnd && blockZero(b + run)) run += 1
        if (ref) { bw.put(0, idLen); bw.put(0, 1); bw.put(delta(base), n) }
        else { bw.put(0, idLen); bw.put(0, 1) }
        if (b + run == segEnd && run > 4) bw.fs(4) // rest of segment
        else if (run <= 4) bw.fs(run - 1)
        else bw.fs(run) // 6.. stored as count+1
        b += run
      } else {
        val start = if (ref) 1 else 0
        val m = j - start
        // candidate costs
        var bestK = -1; var bestCost = Long.MaxValue
        var k = 0
        val kCap = math.min(n - 3, 24)
        while (k <= kCap) {
          var c = idLen.toLong + (if (ref) n else 0) + m.toLong * (k + 1)
          var i = start
          while (i < j) { c += (delta(base + i) >>> k); i += 1 }
          if (c < bestCost) { bestCost = c; bestK = k }
          k += 1
        }
        // second extension (never with a reference sample)
        var seCost = Long.MaxValue
        if (!ref) {
          var c = idLen.toLong + 1
          var ok = true
          var i = 0
          while (i < j && ok) {
            val a = delta(base + i); val d1 = delta(base + i + 1)
            if (a + d1 > 46000) ok = false
            else c += (a + d1) * (a + d1 + 1) / 2 + d1 + 1
            i += 2
          }
          if (ok) seCost = c
        }
        val uncompCost = idLen.toLong + (j.toLong * n)
        if (seCost < bestCost && seCost < uncompCost) {
          bw.put(0, idLen); bw.put(1, 1)
          var i = 0
          while (i < j) {
            val a = delta(base + i); val d1 = delta(base + i + 1)
            bw.fs((a + d1) * (a + d1 + 1) / 2 + d1)
            i += 2
          }
        } else if (uncompCost <= bestCost) {
          bw.put(idMax, idLen)
          var i = 0
          while (i < j) { bw.put(delta(base + i), n); i += 1 }
        } else {
          bw.put(bestK + 1, idLen)
          if (ref) bw.put(delta(base), n)
          var i = start
          while (i < j) { bw.fs(delta(base + i) >>> bestK); i += 1 }
          if (bestK > 0) { i = start
            while (i < j) { bw.put(delta(base + i) & ((1L << bestK) - 1), bestK); i += 1 } }
        }
        b += 1
      }
    }
    bw.bytes()
  }

  // ---------------- HDF5 chunk framing ----------------

  private def bytesPerSample(n: Int): Int = if (n <= 8) 1 else if (n <= 16) 2 else 4

  /** Decode one HDF5 szip chunk payload ([u32 LE original byte count] +
    * raw stream) using the pipeline message's client data. */
  def decodeHdf5Chunk(stored: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    require(cd.length >= 4, s"szip filter carries ${cd.length} client values, need 4")
    val (mask, n, j, scanline) = (cd(0), cd(1), cd(2), cd(3))
    require(stored.length >= 4, "szip chunk shorter than its size prefix")
    val rawLen = (stored(0) & 0xff) | ((stored(1) & 0xff) << 8) |
      ((stored(2) & 0xff) << 16) | ((stored(3) & 0xff) << 24)
    val bps = bytesPerSample(n)
    require(rawLen > 0 && rawLen % bps == 0,
      s"szip original size $rawLen not a multiple of the $bps-byte sample")
    val samples = decodeSamples(java.util.Arrays.copyOfRange(stored, 4, stored.length),
      mask, n, j, scanline, rawLen / bps)
    packSamples(samples, n, (mask & MSB) == 0 || (mask & LSB) != 0)
  }

  /** Encode raw chunk bytes into the HDF5 szip payload framing. */
  def encodeHdf5Chunk(raw: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    val (mask, n, j, scanline) = (cd(0), cd(1), cd(2), cd(3))
    val bps = bytesPerSample(n)
    require(raw.length % bps == 0,
      s"raw chunk ${raw.length}B not a multiple of the $bps-byte sample")
    val little = (mask & MSB) == 0 || (mask & LSB) != 0
    val stream = encodeSamples(unpackSamples(raw, n, little), mask, n, j, scanline)
    val out = new Array[Byte](4 + stream.length)
    out(0) = (raw.length & 0xff).toByte
    out(1) = ((raw.length >> 8) & 0xff).toByte
    out(2) = ((raw.length >> 16) & 0xff).toByte
    out(3) = ((raw.length >> 24) & 0xff).toByte
    System.arraycopy(stream, 0, out, 4, stream.length)
    out
  }

  private[sources] def packSamples(xs: Array[Long], n: Int,
                                   little: Boolean): Array[Byte] = {
    val bps = bytesPerSample(n)
    val out = new Array[Byte](xs.length * bps)
    var i = 0
    while (i < xs.length) {
      var k = 0
      while (k < bps) {
        val shift = if (little) 8 * k else 8 * (bps - 1 - k)
        out(i * bps + k) = ((xs(i) >> shift) & 0xff).toByte
        k += 1
      }
      i += 1
    }
    out
  }

  private[sources] def unpackSamples(b: Array[Byte], n: Int,
                                     little: Boolean): Array[Long] = {
    val bps = bytesPerSample(n)
    val out = new Array[Long](b.length / bps)
    var i = 0
    while (i < out.length) {
      var v = 0L; var k = 0
      while (k < bps) {
        val shift = if (little) 8 * k else 8 * (bps - 1 - k)
        v |= (b(i * bps + k) & 0xffL) << shift
        k += 1
      }
      out(i) = v
      i += 1
    }
    out
  }
}
