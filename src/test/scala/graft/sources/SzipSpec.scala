package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** CCSDS 121.0-B extended-Rice coder ([[Szip]]) against hand-built
  * bitstreams, one per block mode — the expected streams are written by a
  * test-local bit writer from the recommendation's coding rules,
  * independent of Szip's own BitWriter — plus seeded encode/decode
  * round-trips across option masks, sample widths, and NON-multiple
  * scanlines (the H5Zszip/libaec ceil-divide convention), and the HDF5
  * chunk framing. */
class SzipSpec extends AnyFunSuite {

  /** Test-local MSB-first bit writer (independent expected-stream source). */
  private final class TB {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def b(v: Long, n: Int): TB = {
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1).toInt); this
    }
    def fs(v: Long): TB = { (0L until v).foreach(_ => bits += 0); bits += 1; this }
    def bytes: Array[Byte] = bits.grouped(8).map { g =>
      g.padTo(8, 0).foldLeft(0)((a, x) => (a << 1) | x).toByte
    }.toArray
  }

  private val EC_LSB = Szip.EC | Szip.LSB
  private val NN_LSB = Szip.NN | Szip.LSB

  // ---- hand-pinned decode per block mode (n=8 => 3-bit block IDs) ----

  test("sample-splitting block (k=1) decodes a hand-built stream") {
    // id=2 -> k=1; FS-coded high parts [3,0,1,2], then 1-bit LSBs
    // [1,0,1,0]  =>  samples (hi<<1)|lsb = [7,0,3,4]
    val in = new TB().b(2, 3).fs(3).fs(0).fs(1).fs(2)
      .b(1, 1).b(0, 1).b(1, 1).b(0, 1).bytes
    assert(Szip.decodeSamples(in, EC_LSB, 8, 4, 4, 4).toSeq ==
      Seq(7L, 0L, 3L, 4L))
  }

  test("k=0 split block is pure FS codewords") {
    val in = new TB().b(1, 3).fs(2).fs(0).fs(5).fs(1).bytes
    assert(Szip.decodeSamples(in, EC_LSB, 8, 4, 4, 4).toSeq ==
      Seq(2L, 0L, 5L, 1L))
  }

  test("uncompressed block (id = max) decodes n-bit raw samples") {
    val in = new TB().b(7, 3).b(250, 8).b(3, 8).b(17, 8).b(200, 8).bytes
    assert(Szip.decodeSamples(in, EC_LSB, 8, 4, 4, 4).toSeq ==
      Seq(250L, 3L, 17L, 200L))
  }

  test("zero-block run: direct count 1..4 then a coded block") {
    // 3 blocks of j=4; scanline 16 => one 4-block reference interval.
    // Stream: [id=0,'0',FS(1)] = run of 2 zero blocks, then an
    // uncompressed block.
    val in = new TB().b(0, 3).b(0, 1).fs(1)
      .b(7, 3).b(9, 8).b(8, 8).b(7, 8).b(6, 8).bytes
    assert(Szip.decodeSamples(in, EC_LSB, 8, 4, 16, 12).toSeq ==
      Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 9L, 8L, 7L, 6L))
  }

  test("zero-block run: FS(4) means rest-of-segment") {
    val in = new TB().b(7, 3).b(1, 8).b(2, 8).b(3, 8).b(4, 8)
      .b(0, 3).b(0, 1).fs(4).bytes // 3 zero blocks to segment end
    assert(Szip.decodeSamples(in, EC_LSB, 8, 4, 16, 16).toSeq ==
      Seq(1L, 2L, 3L, 4L) ++ Seq.fill(12)(0L))
  }

  test("second-extension block decodes FS-coded pair codes") {
    // pairs (d0,d1): m = (d0+d1)(d0+d1+1)/2 + d1
    // (1,0) -> m=1 ; (0,2) -> m=5  => samples [1,0,0,2]
    val in = new TB().b(0, 3).b(1, 1).fs(1).fs(5).bytes
    assert(Szip.decodeSamples(in, EC_LSB, 8, 4, 4, 4).toSeq ==
      Seq(1L, 0L, 0L, 2L))
  }

  test("NN preprocessing: reference sample + mapped residuals") {
    // j=4, scanline=4 => every block starts a reference interval.
    // Block: k-split id=1 (k=0), ref=100 absolute, residuals FS-coded:
    // delta mapping with pred=prev, theta=min(p, 255-p):
    //   x=[100,101,99,101] -> d=[+1,-2,+2] -> mapped [2,3,4]
    val in = new TB().b(1, 3).b(100, 8).fs(2).fs(3).fs(4).bytes
    assert(Szip.decodeSamples(in, NN_LSB, 8, 4, 4, 4).toSeq ==
      Seq(100L, 101L, 99L, 101L))
  }

  test("NN zero-block: reference rides the zero-run block") {
    // [id=0,'0',ref=42,FS(0)] = this block zero => residuals all 0 =>
    // samples stay at the reference value
    val in = new TB().b(0, 3).b(0, 1).b(42, 8).fs(0).bytes
    assert(Szip.decodeSamples(in, NN_LSB, 8, 4, 4, 4).toSeq ==
      Seq(42L, 42L, 42L, 42L))
  }

  test("second extension carrying a reference sample rejects loudly") {
    val in = new TB().b(0, 3).b(1, 1).fs(1).fs(5).bytes
    val ex = intercept[IllegalArgumentException] {
      Szip.decodeSamples(in, NN_LSB, 8, 4, 4, 4)
    }
    assert(ex.getMessage.contains("second-extension"))
  }

  test("truncated stream fails loudly, never a silent misread") {
    val in = new TB().b(7, 3).b(250, 8).bytes // uncompressed id, 1 of 4 samples
    val ex = intercept[IllegalArgumentException] {
      Szip.decodeSamples(in, EC_LSB, 8, 4, 4, 4)
    }
    assert(ex.getMessage.contains("exhausted"))
  }

  test("parameter validation rejects out-of-range n/j/scanline") {
    intercept[IllegalArgumentException](
      Szip.decodeSamples(Array[Byte](0), EC_LSB, 33, 8, 8, 1))
    intercept[IllegalArgumentException](
      Szip.decodeSamples(Array[Byte](0), EC_LSB, 8, 5, 8, 1))
    intercept[IllegalArgumentException](
      Szip.decodeSamples(Array[Byte](0), EC_LSB, 8, 8, 8 * 129, 1))
  }

  // ---- encoder pinning (mode choice forced by construction) ----

  test("encoder emits an uncompressed block for incompressible data") {
    val x = Array(250L, 3L, 17L, 200L)
    val expect = new TB().b(7, 3).b(250, 8).b(3, 8).b(17, 8).b(200, 8).bytes
    assert(Szip.encodeSamples(x, EC_LSB, 8, 4, 4).toSeq == expect.toSeq)
  }

  test("encoder emits zero-block runs for all-zero data") {
    // 16 zero samples = 4 blocks: run of 4 is direct-coded FS(run-1)
    val expect4 = new TB().b(0, 3).b(0, 1).fs(3).bytes
    assert(Szip.encodeSamples(new Array[Long](16), EC_LSB, 8, 4, 16).toSeq ==
      expect4.toSeq)
    // 24 zero samples = 6 blocks = the whole segment (> 4): FS(4) rest-of-segment
    val expect6 = new TB().b(0, 3).b(0, 1).fs(4).bytes
    assert(Szip.encodeSamples(new Array[Long](24), EC_LSB, 8, 4, 24).toSeq ==
      expect6.toSeq)
  }

  // ---- round-trips ----

  private def roundTrip(mask: Int, n: Int, j: Int, scanline: Int,
                        total: Int, seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val xmax = (1L << n) - 1
    // mixture: smooth ramps (NN-friendly), flat runs (zero blocks),
    // and noise (split / uncompressed)
    val x = Array.tabulate(total) { i =>
      (i / 10) % 3 match {
        case 0 => (i * 3) % (xmax + 1)
        case 1 => xmax / 2
        case _ => rnd.nextLong().abs % (xmax + 1)
      }
    }
    val enc = Szip.encodeSamples(x, mask, n, j, scanline)
    val dec = Szip.decodeSamples(enc, mask, n, j, scanline, total)
    assert(dec.toSeq == x.toSeq, s"mask=$mask n=$n j=$j scanline=$scanline")
  }

  test("encode/decode round-trips across widths, masks, block sizes") {
    for {
      n <- Seq(4, 8, 12, 16, 32)
      (j, scanline) <- Seq((4, 4), (8, 64), (16, 128), (32, 32 * 128))
      mask <- Seq(EC_LSB, NN_LSB)
    } roundTrip(mask, n, j, scanline, total = 300, seed = n * 1000 + j)
  }

  test("non-multiple scanline: rsi ceil-divides (libaec convention)") {
    // j=8, scanline=20 -> rsi=3 blocks, references every 24 samples
    roundTrip(NN_LSB, 8, 8, 20, total = 60, seed = 7)
    roundTrip(NN_LSB, 16, 8, 13, total = 100, seed = 8)
    // scanline < j degrades to references every block
    roundTrip(NN_LSB, 8, 8, 5, total = 40, seed = 9)
  }

  test("partial final block pads and trims exactly") {
    roundTrip(NN_LSB, 8, 8, 16, total = 21, seed = 3) // 21 % 8 != 0
    roundTrip(EC_LSB, 12, 4, 8, total = 5, seed = 4)
  }

  // ---- HDF5 chunk framing ----

  test("HDF5 chunk framing round-trips, LSB and MSB sample packing") {
    val rnd = new scala.util.Random(11)
    val raw16 = Array.fill(128 * 2)(rnd.nextInt(256).toByte)
    for (mask <- Seq(NN_LSB, Szip.NN | Szip.MSB)) {
      val cd = Seq(mask, 16, 8, 16)
      val enc = Szip.encodeHdf5Chunk(raw16, cd)
      // u32 LE original-size prefix
      val prefix = (enc(0) & 0xff) | ((enc(1) & 0xff) << 8) |
        ((enc(2) & 0xff) << 16) | ((enc(3) & 0xff) << 24)
      assert(prefix == raw16.length)
      assert(Szip.decodeHdf5Chunk(enc, cd).toSeq == raw16.toSeq)
    }
  }

  test("chunk framing rejects a size prefix off the sample grid") {
    val bogus = Array[Byte](3, 0, 0, 0, 0x70, 0)
    val ex = intercept[IllegalArgumentException] {
      Szip.decodeHdf5Chunk(bogus, Seq(NN_LSB, 16, 8, 16))
    }
    assert(ex.getMessage.contains("not a multiple"))
  }
}
