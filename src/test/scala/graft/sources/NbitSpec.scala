package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** HDF5 n-bit filter ([[Nbit]]) against hand-built bitstreams — the
  * expected streams are written by a test-local MSB-first bit writer
  * from the filter's packing rule (each element contributes its
  * `precision`-bit field at `offset`, MSB first), independent of Nbit's
  * own encoder — plus seeded encode/decode round-trips across sizes,
  * byte orders, precisions and offsets, the pass-through and error
  * paths, and the planted single-chunk HDF5 integration fixture. */
class NbitSpec extends AnyFunSuite {

  /** Test-local MSB-first bit writer (independent expected-stream source). */
  private final class TB {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def b(v: Long, n: Int): TB = {
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1).toInt); this
    }
    def bytes: Array[Byte] = bits.grouped(8).map { g =>
      g.padTo(8, 0).foldLeft(0)((a, x) => (a << 1) | x).toByte
    }.toArray
  }

  private def cd(nElmts: Int, size: Int, le: Boolean, prec: Int,
                 off: Int): Seq[Int] =
    Seq(8, 1, nElmts, Nbit.TagAtomic, size, if (le) 0 else 1, prec, off)

  private def le16(vs: Int*): Array[Byte] =
    vs.flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)).toArray

  // ------------------- hand-pinned bitstreams -------------------

  test("12-bit fields in int16 LE pack MSB-first back to back") {
    // values 0xABC, 0x123, 0x00F -> stream ABC123 00F0 (last byte padded)
    val raw = le16(0xABC, 0x123, 0x00F)
    val expect = new TB().b(0xABC, 12).b(0x123, 12).b(0x00F, 12).bytes
    val params = cd(3, 2, le = true, 12, 0)
    assert(Nbit.encode(raw, params).toSeq == expect.toSeq)
    assert(Nbit.decode(expect, params, 6).toSeq == raw.toSeq)
  }

  test("mid-byte offset: 5-bit field at offset 2 inside one byte") {
    // element bit pattern = field << 2; fields [0x1F, 0x0A, 0x15]
    val fields = Seq(0x1F, 0x0A, 0x15)
    val raw = fields.map(f => (f << 2).toByte).toArray
    val expect = new TB().b(0x1F, 5).b(0x0A, 5).b(0x15, 5).bytes
    val params = cd(3, 1, le = true, 5, 2)
    assert(Nbit.encode(raw, params).toSeq == expect.toSeq)
    // decode restores field<<2 with padding bits zeroed
    assert(Nbit.decode(expect, params, 3).toSeq == raw.toSeq)
  }

  test("18-bit field at offset 4 spanning three bytes of an int32") {
    val fields = Seq(0x2ABCD, 0x00001, 0x3FFFF)
    val raw = fields.flatMap { f =>
      val bits = f.toLong << 4
      (0 until 4).map(k => ((bits >> (8 * k)) & 0xFF).toByte)
    }.toArray
    val expect = new TB().b(0x2ABCD, 18).b(0x00001, 18).b(0x3FFFF, 18).bytes
    val params = cd(3, 4, le = true, 18, 4)
    assert(Nbit.encode(raw, params).toSeq == expect.toSeq)
    assert(Nbit.decode(expect, params, 12).toSeq == raw.toSeq)
  }

  test("big-endian elements carry the same stream as little-endian") {
    // the packed stream depends only on the field VALUES, not the order
    val params = (le: Boolean) => cd(2, 2, le, 12, 0)
    val fieldsLe = le16(0x123, 0x456)
    val fieldsBe = Array(0x01.toByte, 0x23.toByte, 0x04.toByte, 0x56.toByte)
    val sLe = Nbit.encode(fieldsLe, params(true))
    val sBe = Nbit.encode(fieldsBe, params(false))
    assert(sLe.toSeq == sBe.toSeq)
    assert(Nbit.decode(sBe, params(false), 4).toSeq == fieldsBe.toSeq)
  }

  test("full-precision big-endian fields are a bit-identity (64-bit path)") {
    val rnd = new scala.util.Random(7)
    val raw = Array.fill[Byte](8 * 5)(rnd.nextInt().toByte)
    // BE bytes ARE the MSB-first field bits, so the stream equals the raw
    val be = cd(5, 8, le = false, 64, 0)
    assert(Nbit.encode(raw, be).toSeq == raw.toSeq)
    assert(Nbit.decode(raw, be, 40).toSeq == raw.toSeq)
    // LE round-trips through the byte reversal
    val le = cd(5, 8, le = true, 64, 0)
    assert(Nbit.decode(Nbit.encode(raw, le), le, 40).toSeq == raw.toSeq)
  }

  test("compression-not-needed flag passes the chunk through raw") {
    val raw = Array[Byte](1, 2, 3, 4, 5, 6)
    val params = Seq(3, 0, 3) // flag 0: dtype tail absent
    assert(Nbit.decode(raw, params, 6).toSeq == raw.toSeq)
  }

  // ------------------- seeded round-trips -------------------

  test("seeded round-trips across sizes, orders, precisions, offsets") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val size = 1 << rnd.nextInt(4) // 1,2,4,8
      val maxBits = size * 8
      val prec = 1 + rnd.nextInt(maxBits)
      val off = rnd.nextInt(maxBits - prec + 1)
      val le = rnd.nextBoolean()
      val n = 1 + rnd.nextInt(40)
      val params = cd(n, size, le, prec, off)
      // raw elements whose only set bits live inside the field — what an
      // unfiltered write of the same reduced-precision dtype stores
      val mask = if (prec == 64) -1L else (1L << prec) - 1
      val raw = new Array[Byte](n * size)
      for (i <- 0 until n) {
        val bits = (rnd.nextLong() & mask) << off
        for (k <- 0 until size) {
          val shift = if (le) 8 * k else 8 * (size - 1 - k)
          raw(i * size + k) = ((bits >>> shift) & 0xFF).toByte
        }
      }
      val enc = Nbit.encode(raw, params)
      assert(enc.length == (n * prec + 7) / 8)
      assert(Nbit.decode(enc, params, raw.length).toSeq == raw.toSeq,
        s"size=$size prec=$prec off=$off le=$le n=$n")
    }
  }

  // ------------------- error paths -------------------

  test("array/compound datatype descriptions are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Nbit.decode(Array[Byte](0), Seq(8, 1, 1, 2, 2, 0, 12, 0), 2)
    }
    assert(e.getMessage.contains("atomic only"))
  }

  test("precision + offset beyond the element size is rejected") {
    intercept[IllegalArgumentException] {
      Nbit.decode(Array[Byte](0), cd(1, 2, le = true, 14, 4), 2)
    }
  }

  test("short bitstreams are rejected, not zero-filled") {
    val params = cd(4, 2, le = true, 12, 0) // needs 48 bits = 6 bytes
    intercept[IllegalArgumentException] {
      Nbit.decode(Array[Byte](1, 2, 3), params, 8)
    }
  }

  test("element count inconsistent with the raw chunk size is rejected") {
    intercept[IllegalArgumentException] {
      Nbit.decode(new Array[Byte](6), cd(3, 2, le = true, 12, 0), 8)
    }
  }
}
