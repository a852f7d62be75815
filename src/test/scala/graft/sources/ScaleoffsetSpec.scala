package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** HDF5 scale-offset filter ([[Scaleoffset]]) against hand-built
  * streams — expected chunks are assembled by a test-local header/bit
  * writer from the filter's published layout (13-byte header, MSB-first
  * minbits fields), independent of Scaleoffset's own encoder — plus
  * seeded integer round-trips across sizes/orders, the float D-scale
  * grid, llround's away-from-zero semantics, the minbits 0 / full-
  * precision special cases, and error paths. */
class ScaleoffsetSpec extends AnyFunSuite {

  /** Test-local chunk builder: header + MSB-first packed codes. */
  private def chunk(minbits: Int, minval: Long, codes: Seq[Long]): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    codes.foreach(c => (minbits - 1 to 0 by -1).foreach(i =>
      bits += ((c >> i) & 1).toInt))
    val stream = bits.grouped(8).map(g =>
      g.padTo(8, 0).foldLeft(0)((a, x) => (a << 1) | x).toByte).toArray
    val out = new Array[Byte](13 + stream.length)
    (0 until 4).foreach(i => out(i) = ((minbits >>> (8 * i)) & 0xff).toByte)
    out(4) = 8
    (0 until 8).foreach(i => out(5 + i) = ((minval >>> (8 * i)) & 0xff).toByte)
    System.arraycopy(stream, 0, out, 13, stream.length)
    out
  }

  private def cdInt(n: Int, size: Int, signed: Boolean, le: Boolean,
                    userMinbits: Int = 0, fill: Option[Long] = None): Seq[Int] =
    Seq(2, userMinbits, n, 0, size, if (signed) 1 else 0, if (le) 0 else 1,
      if (fill.isDefined) 1 else 0) ++
      (0 until 12).map(i => fill.map(f => ((f >>> (8 * i)) & 0xff).toInt)
        .getOrElse(0))

  private def cdF64(n: Int, digits: Int, fill: Option[Double]): Seq[Int] =
    Seq(0, digits, n, 1, 8, 0, 0, if (fill.isDefined) 1 else 0) ++
      (0 until 12).map { i =>
        fill.map(f => ((java.lang.Double.doubleToLongBits(f) >>> (8 * i))
          & 0xff).toInt).getOrElse(0)
      }

  private def le(size: Int, vs: Long*): Array[Byte] =
    vs.flatMap(v => (0 until size).map(k => ((v >>> (8 * k)) & 0xff).toByte))
      .toArray

  // ------------------- hand-pinned chunks -------------------

  test("int8 auto-minbits: span 8 -> 3 bits, codes are v - min") {
    val raw = le(1, 5, 3, 10, 3)
    val expect = chunk(3, 3, Seq(2, 0, 7, 0))
    val params = cdInt(4, 1, signed = true, le = true)
    assert(Scaleoffset.encode(raw, params).toSeq == expect.toSeq)
    assert(Scaleoffset.decode(expect, params, 4).toSeq == raw.toSeq)
  }

  test("negative minimum: minval is the typed min memcpy'd (zero-extended)") {
    val raw = le(2, -5L & 0xffff, -2L & 0xffff, 7)
    val params = cdInt(3, 2, signed = true, le = true)
    val enc = Scaleoffset.encode(raw, params)
    // span = 7 - (-5) + 1 = 13 -> minbits 4; minval = int16 -5's two
    // bytes memcpy'd into the u64 field, upper bytes zero
    val expect = chunk(4, 0xFFFBL, Seq(0, 3, 12))
    assert(enc.toSeq == expect.toSeq)
    assert(Scaleoffset.decode(enc, params, 6).toSeq == raw.toSeq)
    // sign-extended upper bytes (a non-libhdf5 writer) decode the same:
    // only the low size*8 bits enter the mod-2^(8*size) addition
    val signExt = chunk(4, -5L, Seq(0, 3, 12))
    assert(Scaleoffset.decode(signExt, params, 6).toSeq == raw.toSeq)
  }

  test("fill value maps to the reserved all-ones code both ways") {
    val fill = 99L
    val raw = le(1, 99, 4, 8, 99, 6)
    val params = cdInt(5, 1, signed = true, le = true, fill = Some(fill))
    // non-fill span = 8-4+1 = 5; +1 for the fill code -> minbits 3
    val expect = chunk(3, 4, Seq(7, 0, 4, 7, 2))
    assert(Scaleoffset.encode(raw, params).toSeq == expect.toSeq)
    assert(Scaleoffset.decode(expect, params, 5).toSeq == raw.toSeq)
  }

  test("user-fixed minbits wins over the span formula") {
    val raw = le(2, 10, 12, 11)
    val params = cdInt(3, 2, signed = false, le = true, userMinbits = 7)
    val expect = chunk(7, 10, Seq(0, 2, 1))
    assert(Scaleoffset.encode(raw, params).toSeq == expect.toSeq)
    assert(Scaleoffset.decode(expect, params, 6).toSeq == raw.toSeq)
  }

  test("minbits at full precision stores the raw elements after the header") {
    val raw = le(1, 200, 5, 255)
    val params = cdInt(3, 1, signed = false, le = true, userMinbits = 8)
    val enc = Scaleoffset.encode(raw, params)
    assert(enc.length == 13 + 3 && enc.drop(13).toSeq == raw.toSeq)
    assert(Scaleoffset.decode(enc, params, 3).toSeq == raw.toSeq)
  }

  test("minbits 0 (all equal, no fill): empty stream, minval restores") {
    val raw = le(4, 42, 42, 42)
    val params = cdInt(3, 4, signed = true, le = true)
    val enc = Scaleoffset.encode(raw, params)
    assert(enc.length == 13) // header only
    assert(Scaleoffset.decode(enc, params, 12).toSeq == raw.toSeq)
  }

  test("big-endian elements round-trip (stream is order-independent)") {
    val beBytes = Array[Byte](0, 5, 0, 9, 0, 7) // int16 BE: 5, 9, 7
    val params = cdInt(3, 2, signed = true, le = false)
    val enc = Scaleoffset.encode(beBytes, params)
    assert(enc.toSeq == chunk(3, 5, Seq(0, 4, 2)).toSeq)
    assert(Scaleoffset.decode(enc, params, 6).toSeq == beBytes.toSeq)
  }

  // ------------------- float D-scale -------------------

  test("llround rounds half away from zero (C semantics, not Java's)") {
    assert(Scaleoffset.llround(2.5) == 3L)
    assert(Scaleoffset.llround(-2.5) == -3L)
    assert(Scaleoffset.llround(-2.4) == -2L)
    assert(Scaleoffset.llround(2.4) == 2L)
  }

  test("float64 D-scale: memcpy'd min header, decode = code/10^D + min") {
    val vals = Seq(-3.17, 0.25, 1.5, -0.01, 2.44)
    val raw = java.nio.ByteBuffer.allocate(vals.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(raw.putDouble)
    val params = cdF64(vals.length, 2, None)
    val enc = Scaleoffset.encode(raw.array(), params)
    // max code = rnd(100*(2.44-(-3.17))) = 561; span 562 -> 10 bits;
    // minval field = the RAW BITS of the double minimum -3.17
    val mnBits = java.lang.Double.doubleToLongBits(-3.17)
    assert(enc(0) == 10 && (0 until 8).forall(i =>
      enc(5 + i) == ((mnBits >>> (8 * i)) & 0xff).toByte))
    val dec = java.nio.ByteBuffer
      .wrap(Scaleoffset.decode(enc, params, vals.length * 8))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.zipWithIndex.foreach { case (v, i) =>
      val got = dec.getDouble(i * 8)
      // replay the exact decode arithmetic: code/100.0 + min
      val code = Scaleoffset.llround(100.0 * (v - -3.17))
      assert(got == code.toDouble / 100.0 + -3.17, s"i=$i")
      assert(math.abs(got - v) < 1e-9, s"i=$i lossy beyond half a centi")
    }
  }

  test("float64 fill value decodes through the reserved code") {
    val fill = -999.0
    val vals = Seq(fill, 1.25, -0.75, fill, 3.5)
    val raw = java.nio.ByteBuffer.allocate(vals.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(raw.putDouble)
    val params = cdF64(vals.length, 2, Some(fill))
    val enc = Scaleoffset.encode(raw.array(), params)
    assert(Scaleoffset.decode(enc, params, vals.length * 8).toSeq ==
      raw.array().toSeq)
  }

  // ------------------- seeded round-trips -------------------

  test("seeded integer round-trips across sizes, signs, orders, fills") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val size = 1 << rnd.nextInt(4)
      val signed = rnd.nextBoolean()
      val isLe = rnd.nextBoolean()
      val n = 2 + rnd.nextInt(40)
      val width = math.min(size * 8 - (if (signed) 1 else 0), 20)
      def draw(): Long = {
        val v = rnd.nextLong() & ((1L << width) - 1)
        if (signed && rnd.nextBoolean()) -v else v
      }
      val fill = if (rnd.nextBoolean()) Some(draw()) else None
      val vals = Array.fill(n)(if (fill.isDefined && rnd.nextInt(4) == 0)
        fill.get else draw())
      if (!fill.forall(f => vals.forall(_ == f))) { // not all-fill
        val mask = if (size == 8) -1L else (1L << (size * 8)) - 1
        val raw = new Array[Byte](n * size)
        for (i <- 0 until n; k <- 0 until size) {
          val shift = if (isLe) 8 * k else 8 * (size - 1 - k)
          raw(i * size + k) = (((vals(i) & mask) >>> shift) & 0xff).toByte
        }
        val params = cdInt(n, size, signed, isLe, fill = fill.map(_ & mask))
        val enc = Scaleoffset.encode(raw, params)
        assert(Scaleoffset.decode(enc, params, raw.length).toSeq == raw.toSeq,
          s"size=$size signed=$signed le=$isLe n=$n fill=$fill vals=${vals.toSeq}")
      }
    }
  }

  // ------------------- planted-file integration -------------------

  test("scaleoffset-filtered chunks decode through the planted file") {
    val f = java.io.File.createTempFile("graft_so", ".h5"); f.deleteOnExit()
    Hdf5PlantedScaleoffset.write(f.getPath)
    val metas = Hdf5.readMeta(f.getPath)
    assert(metas.map(_.name).toSet == Set("packed_i16", "packed_f64"))
    assert(metas.forall(_.filters == Seq(Hdf5.FilterScaleoffset)))
    val spark = ScaleoffsetSpec.spark
    val i16 = Hdf5.readVariable(spark, f.getPath, "packed_i16")
      .orderBy("i0").collect()
    assert(i16.map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      (0 until 48).map(t => (t, Hdf5PlantedScaleoffset.valueI16(t).toDouble)))
    val f64 = Hdf5.readVariable(spark, f.getPath, "packed_f64")
      .orderBy("i0").collect()
    assert(f64.map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      (0 until 40).map(t => (t, Hdf5PlantedScaleoffset.decodedF64(t))))
    // decode stays within half a centi of the planted values (lossy)
    (0 until 40).foreach(t => assert(math.abs(
      Hdf5PlantedScaleoffset.decodedF64(t) -
        Hdf5PlantedScaleoffset.valueF64(t)) < 0.005))
  }

  // ------------------- error paths -------------------

  test("float E-scaling is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Scaleoffset.decode(new Array[Byte](13),
        Seq(1, 2, 1, 1, 8, 0, 0, 0) ++ Seq.fill(12)(0), 8)
    }
    assert(e.getMessage.contains("D-scaling only"))
  }

  test("truncated streams and bad headers are rejected, not zero-filled") {
    val params = cdInt(4, 2, signed = true, le = true, userMinbits = 12)
    intercept[IllegalArgumentException] { // 48 bits needed, 2 bytes given
      Scaleoffset.decode(chunk(12, 0, Seq(1, 2, 3, 4)).take(15), params, 8)
    }
    val badHeader = chunk(3, 0, Seq(0, 1, 2, 3))
    badHeader(4) = 4 // writer minval size != 8
    intercept[IllegalArgumentException] {
      Scaleoffset.decode(badHeader, cdInt(4, 2, signed = true, le = true), 8)
    }
  }
}

object ScaleoffsetSpec {
  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
