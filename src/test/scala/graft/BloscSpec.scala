package graft

import graft.sources.Blosc
import org.scalatest.funsuite.AnyFunSuite

import java.nio.{ByteBuffer, ByteOrder}

/** Test-side c-blosc chunk ENCODER following the public chunk format
  * (README_CHUNK_FORMAT.rst): 16-byte header, per-block bstarts, split
  * streams, byte-shuffle filter. Stream bodies are compressed by the
  * independent `lz4-java` / `zstd-jni` / `snappy-java` / `Deflater`
  * implementations, so the decoder is not being tested against a mirror
  * of itself for the codec payloads; the framing itself follows the
  * spec text, and the blosclz codec is additionally pinned against
  * hand-assembled constant byte streams in [[BloscSpec]]. */
object BloscTestEnc {

  private def compressStream(codec: Int, data: Array[Byte], off: Int, len: Int): Array[Byte] =
    codec match {
      case 1 =>
        val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
        val out = new Array[Byte](c.maxCompressedLength(len))
        val n = c.compress(data, off, len, out, 0, out.length)
        java.util.Arrays.copyOf(out, n)
      case 3 =>
        org.xerial.snappy.Snappy.compress(java.util.Arrays.copyOfRange(data, off, off + len))
      case 4 =>
        val d = new java.util.zip.Deflater(6)
        d.setInput(data, off, len); d.finish()
        val bos = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) bos.write(tmp, 0, d.deflate(tmp))
        d.end()
        bos.toByteArray
      case 5 =>
        com.github.luben.zstd.Zstd.compress(
          java.util.Arrays.copyOfRange(data, off, off + len), 3)
      case other => throw new IllegalArgumentException(s"no test encoder for codec $other")
    }

  /** shuffle filter: element-major → plane-major, verbatim tail. */
  def shuffleBytes(typesize: Int, src: Array[Byte], off: Int, bsize: Int): Array[Byte] = {
    val out = new Array[Byte](bsize)
    val quot = bsize / typesize
    for (b <- 0 until typesize; i <- 0 until quot)
      out(b * quot + i) = src(off + i * typesize + b)
    val done = quot * typesize
    if (done < bsize) System.arraycopy(src, off + done, out, done, bsize - done)
    out
  }

  /** bit-shuffle filter, written INDEPENDENTLY of Blosc.bitunshuffle
    * straight from the bitshuffle layout: rows of n8/8 bytes ordered by
    * (byte-plane p, bit b); row byte m packs bit b of plane-p bytes of
    * elements 8m..8m+7, element 8m+i at bit position i; tail verbatim. */
  def bitShuffleBytes(typesize: Int, src: Array[Byte], off: Int, bsize: Int): Array[Byte] = {
    val n = bsize / typesize
    val n8 = n - n % 8
    val rowBytes = n8 / 8
    val out = new Array[Byte](bsize)
    for (p <- 0 until typesize; b <- 0 until 8; m <- 0 until rowBytes) {
      var v = 0
      for (i <- 0 until 8)
        v |= (((src(off + (8 * m + i) * typesize + p) >> b) & 1) << i)
      out((p * 8 + b) * rowBytes + m) = v.toByte
    }
    val done = n8 * typesize
    if (done < bsize) System.arraycopy(src, off + done, out, done, bsize - done)
    out
  }

  /** Assemble a complete blosc chunk. `blocksize` must be a multiple of
    * `typesize` when `split`. `shuffleMode`: 0 none, 1 byte, 2 bit. */
  def chunk(raw: Array[Byte], typesize: Int, blocksize: Int, codec: Int,
            shuffle: Boolean, split: Boolean): Array[Byte] =
    chunkM(raw, typesize, blocksize, codec, if (shuffle) 1 else 0, split)

  def chunkM(raw: Array[Byte], typesize: Int, blocksize: Int, codec: Int,
             shuffleMode: Int, split: Boolean): Array[Byte] = {
    require(!split || blocksize % typesize == 0)
    val shuffle = shuffleMode == 1
    val nbytes = raw.length
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val leftover = nbytes % blocksize
    val bodies = new java.io.ByteArrayOutputStream()
    val bstarts = new Array[Int](nblocks)
    var pos = 16 + 4 * nblocks
    for (j <- 0 until nblocks) {
      bstarts(j) = pos
      val bsize = if (j == nblocks - 1 && leftover != 0) leftover else blocksize
      val isLeftover = bsize != blocksize
      val blockSrc =
        if (shuffle && typesize > 1) shuffleBytes(typesize, raw, j * blocksize, bsize)
        else if (shuffleMode == 2) bitShuffleBytes(typesize, raw, j * blocksize, bsize)
        else java.util.Arrays.copyOfRange(raw, j * blocksize, j * blocksize + bsize)
      val nstreams = if (split && !isLeftover && typesize > 1) typesize else 1
      val neblock = bsize / nstreams
      for (s <- 0 until nstreams) {
        val comp = compressStream(codec, blockSrc, s * neblock, neblock)
        val (cb, payload) =
          if (comp.length >= neblock) // stored, like c-blosc when compression doesn't help
            (neblock, java.util.Arrays.copyOfRange(blockSrc, s * neblock, s * neblock + neblock))
          else (comp.length, comp)
        val hdr = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(cb)
        bodies.write(hdr.array()); bodies.write(payload)
        pos += 4 + cb
      }
    }
    val body = bodies.toByteArray
    val out = ByteBuffer.allocate(16 + 4 * nblocks + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    var flags = codec << 5
    if (shuffle && typesize > 1) flags |= 0x1
    if (shuffleMode == 2) flags |= 0x4
    if (!split) flags |= 0x10
    out.put(2.toByte).put(1.toByte).put(flags.toByte)
      .put((typesize & 0xFF).toByte)
    out.putInt(nbytes).putInt(blocksize).putInt(16 + 4 * nblocks + body.length)
    bstarts.foreach(out.putInt)
    out.put(body)
    out.array()
  }

  /** memcpy'ed chunk — c-blosc flags bit 0x2 (what numcodecs writes at
    * clevel=0 or when compression doesn't pay). */
  def memcpy(raw: Array[Byte], typesize: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + raw.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte).put(0x2.toByte).put(typesize.toByte)
    bb.putInt(raw.length).putInt(raw.length).putInt(16 + raw.length)
    bb.put(raw)
    bb.array()
  }
}

class BloscSpec extends AnyFunSuite {
  import BloscTestEnc._

  private def patterned(n: Int): Array[Byte] = {
    // doubles with slowly-varying values: byte planes compress well after
    // shuffle, exercising both compressed and stored streams
    val bb = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => bb.putDouble(1000.0 + (i % 17) * 0.25))
    bb.array()
  }

  test("memcpy'ed chunk (flags 0x2) decodes raw — filters never apply to memcpy") {
    val raw = patterned(32)
    assert(Blosc.decode(memcpy(raw, 8), raw.length).toSeq == raw.toSeq)
    // a chunk claiming BOTH byte- and bit-shuffle is malformed, not guessed at
    val both = memcpy(raw, 8); both(2) = 0x5.toByte
    intercept[IllegalArgumentException](Blosc.decode(both, raw.length))
  }

  test("delta filter: progressive element XOR, discriminating 3-element vector") {
    // ts=4, raw [1,2,3,4, 5,6,7,8, 9,10,11,12] in ONE block: element 2
    // XORs element 1 -> [4,4,4,12], element 3 XORs element 2 (the
    // PREVIOUS element, not the first) -> [9^5,10^6,11^7,12^8] =
    // [12,12,12,4]; an XOR-with-first-element form would give [8,8,8,8]
    val deltaed = Array[Byte](1, 2, 3, 4, 4, 4, 4, 12, 12, 12, 12, 4)
    val bb = java.nio.ByteBuffer.allocate(16 + 4 + 4 + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte).put((0x08 | 0x10).toByte).put(4.toByte)
    bb.putInt(12).putInt(12).putInt(16 + 4 + 4 + 12)
    bb.putInt(20) // bstart
    bb.putInt(12) // stream stored raw (cbytes == neblock)
    bb.put(deltaed)
    assert(Blosc.decode(bb.array(), 12, allowUnverifiedDelta = true).toSeq ==
      Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
  }

  test("delta filter: later blocks XOR against the decoded first block") {
    // ts=2, blocksize=4, two blocks of [10,20,30,40] and [50,60,70,80]:
    // block 0 -> [10,20, 30^10,40^20]; block 1 XORs position-wise vs the
    // DECODED block 0 -> [50^10, 60^20, 70^30, 80^40]
    val raw = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val deltaed = Array[Byte](10, 20, (30 ^ 10).toByte, (40 ^ 20).toByte,
      (50 ^ 10).toByte, (60 ^ 20).toByte, (70 ^ 30).toByte, (80 ^ 40).toByte)
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 2 * (4 + 4))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte).put((0x08 | 0x10).toByte).put(2.toByte)
    bb.putInt(8).putInt(4).putInt(16 + 8 + 16)
    bb.putInt(24).putInt(32) // bstarts
    bb.putInt(4); bb.put(deltaed, 0, 4)
    bb.putInt(4); bb.put(deltaed, 4, 4)
    assert(Blosc.decode(bb.array(), 8, allowUnverifiedDelta = true).toSeq == raw.toSeq)
    // default posture: the unverified delta layout is REJECTED loudly,
    // never silently decoded (see Blosc's class-doc caveat)
    val e = intercept[UnsupportedOperationException](Blosc.decode(bb.array(), 8))
    assert(e.getMessage.contains("allowUnverifiedDelta"))
  }

  test("delta round-trips with and without shuffle, single and multi block") {
    for (n <- Seq(16, 300, 8200); sh <- Seq(true, false);
         bs <- Seq(0, 256)) {
      val raw = patterned(n)
      val enc = Blosc.encode(raw, 8, blocksizeReq = bs, shuffle = sh, delta = true)
      assert((enc(2) & 0x08) != 0, "delta flag set")
      assert(Blosc.decode(enc, raw.length, allowUnverifiedDelta = true).toSeq == raw.toSeq, s"n=$n sh=$sh bs=$bs")
    }
    val b1 = (0 until 777).map(i => (i * i % 251).toByte).toArray
    assert(Blosc.decode(Blosc.encode(b1, 1, delta = true), b1.length,
      allowUnverifiedDelta = true).toSeq == b1.toSeq)
  }

  test("bit-shuffle: hand-pinned 8x1-byte vectors") {
    // elements [0xFF,0,0xFF,0,...]: every (bit b) row byte packs
    // 10101010 LSB-first = 0x55
    val alt = Array.tabulate[Byte](8)(i => if (i % 2 == 0) 0xFF.toByte else 0)
    assert(bitShuffleBytes(1, alt, 0, 8).toSeq == Seq.fill(8)(0x55.toByte))
    // elements 1<<i: bit b of element i set iff i==b -> row b = 1<<b (identity)
    val pow = Array.tabulate[Byte](8)(i => (1 << i).toByte)
    assert(bitShuffleBytes(1, pow, 0, 8).toSeq == pow.toSeq)
    // decode side inverts both
    for (v <- Seq(alt, pow)) {
      val out = new Array[Byte](8)
      Blosc.bitunshuffle(1, bitShuffleBytes(1, v, 0, 8), out, 0, 8)
      assert(out.toSeq == v.toSeq)
    }
  }

  test("bit-shuffle: multi-byte planes, non-multiple-of-8 tail, partial element") {
    val rnd = new scala.util.Random(11)
    for (ts <- Seq(1, 2, 4, 8); extra <- Seq(0, 3, 7 * ts + 1)) {
      val bsize = 16 * ts + extra // 16 full elements + leftover elements/bytes
      val src = Array.fill[Byte](bsize)(rnd.nextInt().toByte)
      val out = new Array[Byte](bsize)
      Blosc.bitunshuffle(ts, bitShuffleBytes(ts, src, 0, bsize), out, 0, bsize)
      assert(out.toSeq == src.toSeq, s"ts=$ts extra=$extra")
    }
  }

  test("bit-shuffled lz4/zstd chunks decode end-to-end, split and not") {
    val raw = patterned(300) // 2400 bytes, blocks 1024,1024,352
    for (codec <- Seq(1, 5); split <- Seq(true, false)) {
      val c = chunkM(raw, typesize = 8, blocksize = 1024, codec = codec,
        shuffleMode = 2, split = split)
      assert(Blosc.decode(c, raw.length).toSeq == raw.toSeq,
        s"codec $codec split $split")
    }
    // typesize 1 bit-shuffle is NOT an identity — exercise it end-to-end
    val bytes = (0 until 999).map(i => (i * 37 % 256).toByte).toArray
    val c1 = chunkM(bytes, typesize = 1, blocksize = 256, codec = 1,
      shuffleMode = 2, split = false)
    assert(Blosc.decode(c1, bytes.length).toSeq == bytes.toSeq)
  }

  test("lz4 shuffle+split multi-block chunk with leftover decodes bit-exact") {
    val raw = patterned(300) // 2400 bytes; blocksize 1024 -> blocks 1024,1024,352
    val chunkBytes = chunk(raw, typesize = 8, blocksize = 1024, codec = 1,
      shuffle = true, split = true)
    assert(Blosc.decode(chunkBytes, raw.length).toSeq == raw.toSeq)
  }

  test("lz4 no-shuffle dont-split decodes; zlib/zstd/snappy codec streams decode") {
    val raw = patterned(200)
    for (codec <- Seq(1, 3, 4, 5)) {
      val c = chunk(raw, typesize = 8, blocksize = 512, codec = codec,
        shuffle = false, split = false)
      assert(Blosc.decode(c, raw.length).toSeq == raw.toSeq, s"codec $codec")
      val cs = chunk(raw, typesize = 8, blocksize = 512, codec = codec,
        shuffle = true, split = true)
      assert(Blosc.decode(cs, raw.length).toSeq == raw.toSeq, s"codec $codec split")
    }
  }

  test("typesize 4 and odd-length tail survive the shuffle round trip") {
    val raw = (0 until 1003).map(i => (i * 7 % 251).toByte).toArray // 1003 % 4 = 3 tail
    val c = chunk(raw, typesize = 4, blocksize = 512, codec = 1,
      shuffle = true, split = true)
    assert(Blosc.decode(c, raw.length).toSeq == raw.toSeq)
  }

  test("blosclz: hand-assembled literal+match stream decodes to the spec'd bytes") {
    // literal run "ABCDE" then match len 5 dist 5 -> "ABCDEABCDE"
    // ctrl literal = len-1 = 4; match short: len 5 -> ctrl>>5 = 3, dist 5
    // -> encoded 4 (ofs 0, code 4) -> ctrl (3<<5)=96, code byte 4
    val stream = Array[Byte](4, 'A', 'B', 'C', 'D', 'E', 96.toByte, 4)
    val out = new Array[Byte](10)
    val n = Blosc.blosclzDecompress(stream, 0, stream.length, out, 0, 10)
    assert(n == 10 && new String(out) == "ABCDEABCDE")
  }

  test("blosclz: distance-0 RLE escape and long-length extension decode") {
    // "Z" then match ofs=0 code=0 ctrl>>5=5 -> memset of 4+3=7 Z's -> 8 Z's
    val rle = Array[Byte](0, 'Z', (5 << 5).toByte, 0)
    val out = new Array[Byte](8)
    assert(Blosc.blosclzDecompress(rle, 0, rle.length, out, 0, 8) == 8)
    assert(out.forall(_ == 'Z'))
    // long length: ctrl>>5=7 -> len 6 + ext(2) -> +3 = 11; RLE of 'Q'
    val ext = Array[Byte](0, 'Q', (7 << 5).toByte, 2, 0)
    val out2 = new Array[Byte](12)
    assert(Blosc.blosclzDecompress(ext, 0, ext.length, out2, 0, 12) == 12)
    assert(out2.forall(_ == 'Q'))
  }

  test("blosclz: far match (16-bit distance escape) decodes") {
    // 9000 literal bytes in 32-byte runs, then a match of len 6 at
    // distance ofs16 + 8192: ctrl=(4<<5)|31, code=255, ofs16=500 -> the
    // copy source is out[9000 - 500 - 8192 = 308]
    val bos = new java.io.ByteArrayOutputStream()
    val lit = new Array[Byte](9000)
    (0 until 9000).foreach(i => lit(i) = ((i * 131) % 251).toByte)
    var i = 0
    while (i < 9000) {
      val run = math.min(32, 9000 - i)
      bos.write(run - 1)
      bos.write(lit, i, run)
      i += run
    }
    bos.write((4 << 5) | 31) // short len: (4)-1+3 = 6 bytes
    bos.write(255)
    bos.write(500 >> 8); bos.write(500 & 0xFF)
    val stream = bos.toByteArray
    val out = new Array[Byte](9006)
    val n = Blosc.blosclzDecompress(stream, 0, stream.length, out, 0, 9006)
    assert(n == 9006)
    assert(out.take(9000).toSeq == lit.toSeq)
    assert(out.slice(9000, 9006).toSeq == lit.slice(308, 314).toSeq)
  }

  test("main-scope Blosc.encode round-trips through the pinned decoder") {
    for (n <- Seq(7, 64, 300, 8191, 65536 / 8 + 3)) {
      val raw = patterned(n)
      assert(Blosc.decode(Blosc.encode(raw, 8), raw.length).toSeq == raw.toSeq, s"n=$n")
      assert(Blosc.decode(Blosc.encode(raw, 8, shuffle = false), raw.length)
        .toSeq == raw.toSeq, s"n=$n noshuffle")
    }
    // typesize 1: no shuffle, no split
    val bytes = (0 until 999).map(i => (i % 7).toByte).toArray
    assert(Blosc.decode(Blosc.encode(bytes, 1), bytes.length).toSeq == bytes.toSeq)
    // tiny chunk smaller than typesize
    val tiny = Array[Byte](1, 2, 3)
    assert(Blosc.decode(Blosc.encode(tiny, 8), 3).toSeq == tiny.toSeq)
  }

  test("corrupt chunks fail loudly: nbytes mismatch, unknown codec, truncated stream") {
    val raw = patterned(64)
    val ok = chunk(raw, 8, 512, 1, shuffle = true, split = true)
    assert(intercept[IllegalArgumentException](Blosc.decode(ok, raw.length + 8))
      .getMessage.contains("nbytes"))
    val unk = ok.clone(); unk(2) = ((unk(2) & 0x1F) | (7 << 5)).toByte
    assert(intercept[UnsupportedOperationException](Blosc.decode(unk, raw.length))
      .getMessage.contains("codec"))
    val cut = java.util.Arrays.copyOf(ok, ok.length - 10)
    intercept[IllegalArgumentException](Blosc.decode(cut, raw.length))
  }
}
