package graft

import graft.sources.NetCDF
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.io.{DataOutputStream, FileOutputStream}

/** NetCDF classic reader spec: a CDF-1 file is written byte-by-byte from
  * the public format spec (magic, dim/att/var lists, fixed + record data),
  * then parsed and read back through the executor-parallel path. */
class NetCDFSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** dims: time (record), x(3); vars: x double[x] = {10,20,30},
    * temp double[time,x], 2 records = {{1,2,3},{4,5,6}} with a
    * _FillValue attr = -999 planted at [1][2]. */
  private def writeSample(path: String): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    def name(s: String): Unit = {
      out.writeInt(s.length); out.writeBytes(s)
      (0 until (4 - s.length % 4) % 4).foreach(_ => out.writeByte(0))
    }
    out.writeBytes("CDF"); out.writeByte(1) // magic CDF-1
    out.writeInt(2) // numrecs
    out.writeInt(0x0A); out.writeInt(2) // dim_list
    name("time"); out.writeInt(0) // record dim
    name("x"); out.writeInt(3)
    out.writeInt(0); out.writeInt(0) // gatt_list ABSENT
    out.writeInt(0x0B); out.writeInt(2) // var_list
    // var x: double[x], no attrs — begin 164 (= header size)
    name("x"); out.writeInt(1); out.writeInt(1)
    out.writeInt(0); out.writeInt(0) // vatt ABSENT
    out.writeInt(6); out.writeInt(24); out.writeInt(164)
    // var temp: double[time, x], _FillValue = -999.0 — begin 188
    name("temp"); out.writeInt(2); out.writeInt(0); out.writeInt(1)
    out.writeInt(0x0C); out.writeInt(1) // one attribute
    name("_FillValue"); out.writeInt(6); out.writeInt(1); out.writeDouble(-999.0)
    out.writeInt(6); out.writeInt(24); out.writeInt(188)
    // data: x then the two temp records
    Seq(10.0, 20.0, 30.0).foreach(out.writeDouble)
    Seq(1.0, 2.0, 3.0).foreach(out.writeDouble)
    Seq(4.0, 5.0, -999.0).foreach(out.writeDouble)
    out.close()
  }

  test("header parse: dims, record detection, attrs, begins") {
    val f = java.io.File.createTempFile("graft", ".nc"); f.deleteOnExit()
    writeSample(f.getPath)
    val h = NetCDF.readHeader(f.getPath)
    assert(h.version == 1 && h.numRecs == 2)
    assert(h.dims == Seq(NetCDF.NcDim("time", 0), NetCDF.NcDim("x", 3)))
    val temp = h.variable("temp")
    assert(temp.isRecord(h.dims) && temp.begin == 188 && h.recSize == 24)
    assert(temp.attrs.exists(_.name == "_FillValue"))
  }

  test("record variable reads executor-parallel, fill becomes NULL") {
    val f = java.io.File.createTempFile("graft", ".nc"); f.deleteOnExit()
    writeSample(f.getPath)
    val df = NetCDF.readVariable(spark, f.getPath, "temp")
    assert(df.columns.toSeq == Seq("time", "x", "value"))
    val rows = df.orderBy("time", "x").collect()
    assert(rows.length == 6)
    assert(rows.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq ==
      Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(5.0), None))
  }

  /** Same content as [[writeSample]] but CDF-2 (64-bit `begin` offsets):
    * header grows by 4 bytes per variable → x at 172, temp at 196. */
  private def writeSampleV2(path: String): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    def name(s: String): Unit = {
      out.writeInt(s.length); out.writeBytes(s)
      (0 until (4 - s.length % 4) % 4).foreach(_ => out.writeByte(0))
    }
    out.writeBytes("CDF"); out.writeByte(2) // magic CDF-2
    out.writeInt(2)
    out.writeInt(0x0A); out.writeInt(2)
    name("time"); out.writeInt(0)
    name("x"); out.writeInt(3)
    out.writeInt(0); out.writeInt(0)
    out.writeInt(0x0B); out.writeInt(2)
    name("x"); out.writeInt(1); out.writeInt(1)
    out.writeInt(0); out.writeInt(0)
    out.writeInt(6); out.writeInt(24); out.writeLong(172L)
    name("temp"); out.writeInt(2); out.writeInt(0); out.writeInt(1)
    out.writeInt(0x0C); out.writeInt(1)
    name("_FillValue"); out.writeInt(6); out.writeInt(1); out.writeDouble(-999.0)
    out.writeInt(6); out.writeInt(24); out.writeLong(196L)
    Seq(10.0, 20.0, 30.0).foreach(out.writeDouble)
    Seq(1.0, 2.0, 3.0).foreach(out.writeDouble)
    Seq(4.0, 5.0, -999.0).foreach(out.writeDouble)
    out.close()
  }

  test("CDF-2 64-bit offsets parse and read identically") {
    val f = java.io.File.createTempFile("graft", ".nc"); f.deleteOnExit()
    writeSampleV2(f.getPath)
    val h = NetCDF.readHeader(f.getPath)
    assert(h.version == 2 && h.variable("temp").begin == 196L)
    val rows = NetCDF.readVariable(spark, f.getPath, "temp")
      .orderBy("time", "x").collect()
    assert(rows.length == 6 && rows(0).getDouble(2) == 1.0 && rows(5).isNullAt(2))
  }

  /** CDF-5 variant: 64-bit counts everywhere, temp stored as int64
    * (nc_type 10). Header: magic 4 + numrecs 8 + dim_list (12 + 20 + 20)
    * + gatt ABSENT 12 + var_list 12 + var x (12+8+4+12+4+8+8 = 56)
    * + var temp (12+8+8+12+4+8+8 = 60) = 204; x at 204, temp at 228. */
  private def writeSampleV5(path: String): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    def name(s: String): Unit = {
      out.writeLong(s.length.toLong); out.writeBytes(s)
      (0 until (4 - s.length % 4) % 4).foreach(_ => out.writeByte(0))
    }
    out.writeBytes("CDF"); out.writeByte(5)
    out.writeLong(2L) // numrecs
    out.writeInt(0x0A); out.writeLong(2L)
    name("time"); out.writeLong(0L)
    name("x"); out.writeLong(3L)
    out.writeInt(0); out.writeLong(0L) // gatt ABSENT
    out.writeInt(0x0B); out.writeLong(2L)
    name("x"); out.writeLong(1L); out.writeInt(1)
    out.writeInt(0); out.writeLong(0L) // vatt ABSENT
    out.writeInt(6); out.writeLong(24L); out.writeLong(204L)
    name("temp"); out.writeLong(2L); out.writeInt(0); out.writeInt(1)
    out.writeInt(0); out.writeLong(0L) // vatt ABSENT
    out.writeInt(10); out.writeLong(24L); out.writeLong(228L) // int64 values
    Seq(10.0, 20.0, 30.0).foreach(out.writeDouble)
    Seq(100L, 200L, 300L).foreach(out.writeLong)
    Seq(400L, 500L, 600L).foreach(out.writeLong)
    out.close()
  }

  test("CDF-5: 64-bit counts and int64 values") {
    val f = java.io.File.createTempFile("graft", ".nc"); f.deleteOnExit()
    writeSampleV5(f.getPath)
    val h = NetCDF.readHeader(f.getPath)
    assert(h.version == 5 && h.numRecs == 2 && h.variable("temp").begin == 228L)
    assert(h.variable("temp").ncType == 10)
    val rows = NetCDF.readVariable(spark, f.getPath, "temp")
      .orderBy("time", "x").collect()
    assert(rows.map(_.getDouble(2)).toSeq ==
      Seq(100.0, 200.0, 300.0, 400.0, 500.0, 600.0))
  }

  test("parquet-lake conversion joins coordinate values") {
    val f = java.io.File.createTempFile("graft", ".nc"); f.deleteOnExit()
    writeSample(f.getPath)
    val outDir = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val vars = NetCDF.toParquetLake(spark, f.getPath, outDir)
    assert(vars == Seq("temp"))
    val lake = spark.read.parquet(s"$outDir/temp")
    assert(lake.columns.toSet == Set("time", "x", "value", "x_coord"))
    val r = lake.where("time = 0 and x = 2").head
    assert(r.getAs[Double]("x_coord") == 30.0 && r.getAs[Double]("value") == 3.0)
  }

  test("writer: executor-parallel classic round trip, CDF-1/2/5") {
    import spark.implicits._
    val temp = (0 until 4).flatMap(t => (0 until 3).map(x => (t, x, t * 10.0 + x)))
      .toDF("time", "x", "value").repartition(4) // cross-partition seek-writes
    val xs = Seq((0, 10.0), (1, 20.0), (2, 30.0)).toDF("x", "value")
    for (v <- Seq(1, 2, 5)) {
      val f = java.io.File.createTempFile("graft_w", ".nc"); f.deleteOnExit()
      val h = NetCDF.writeClassic(spark, f.getPath, Seq("time" -> 4, "x" -> 3),
        Seq(NetCDF.WriteVar("x", Seq("x"), xs),
          NetCDF.WriteVar("temp", Seq("time", "x"), temp)),
        recordDim = Some("time"), version = v)
      assert(h.version == v && h.numRecs == 4)
      assert(h.dims.contains(NetCDF.NcDim("time", 0)))
      val back = NetCDF.readVariable(spark, f.getPath, "temp")
        .orderBy("time", "x").collect()
      assert(back.map(_.getDouble(2)).toSeq ==
        (0 until 4).flatMap(t => (0 until 3).map(x => t * 10.0 + x)))
      val xsBack = NetCDF.readVariable(spark, f.getPath, "x").orderBy("x").collect()
      assert(xsBack.map(_.getDouble(1)).toSeq == Seq(10.0, 20.0, 30.0))
    }
  }

  test("cfTimeVar: pre-encoded LONG offsets beyond 2^53 reject loudly") {
    import spark.implicits._
    // classic format serializes NC_DOUBLE — an int64 offset past 2^53
    // would silently lose precision (the Zarr leg stays exact), so the
    // write must fail at commit, not corrupt the axis
    val bad = Seq((0, (1L << 53) + 1), (1, 0L)).toDF("i", "off")
    val v = NetCDF.cfTimeVar("time", bad, "i", "off",
      "microseconds since 1970-01-01", "noleap")
    val f = java.io.File.createTempFile("graft_cfg", ".nc"); f.deleteOnExit()
    val e = intercept[Exception] {
      NetCDF.writeClassic(spark, f.getPath, Seq("time" -> 2), Seq(v))
    }
    assert(e.getMessage.contains("2^53") ||
      Option(e.getCause).exists(_.getMessage.contains("2^53")),
      s"wrong failure: ${e.getMessage}")
    // in-range offsets still write + decode
    val ok = Seq((0, 86400000000L), (1, 172800000000L)).toDF("i", "off")
    val v2 = NetCDF.cfTimeVar("time", ok, "i", "off",
      "microseconds since 1970-01-01", "noleap")
    val f2 = java.io.File.createTempFile("graft_cfo", ".nc"); f2.deleteOnExit()
    NetCDF.writeClassic(spark, f2.getPath, Seq("time" -> 2), Seq(v2))
    val back = NetCDF.readVariable(spark, f2.getPath, "time")
      .orderBy("time").collect()
    assert(back.map(_.getDouble(1)).toSeq ==
      Seq(86400000000.0, 172800000000.0))
  }

  test("writer: lake -> NetCDF reverses toParquetLake (values round-trip)") {
    val f = java.io.File.createTempFile("graft", ".nc"); f.deleteOnExit()
    writeSample(f.getPath)
    val lakeDir = java.nio.file.Files.createTempDirectory("graft_lake_rt").toString
    NetCDF.toParquetLake(spark, f.getPath, lakeDir)
    val f2 = java.io.File.createTempFile("graft_rt", ".nc"); f2.deleteOnExit()
    val h2 = NetCDF.fromParquetLake(spark, lakeDir, f2.getPath)
    assert(h2.numRecs == 2 && h2.variable("temp").ncType == 6)
    def vals(p: String) = NetCDF.readVariable(spark, p, "temp")
      .orderBy("time", "x").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    // the source's _FillValue became NULL in the lake; the writer stores
    // NaN (no fill attr on the way back), so compare modulo that encoding
    val (orig, rt) = (vals(f.getPath), vals(f2.getPath))
    assert(rt.length == orig.length)
    orig.zip(rt).foreach {
      case (Some(a), Some(b)) => assert(a == b)
      case (None, b)          => assert(b.forall(_.isNaN))
      case (a, b)             => fail(s"$a != $b")
    }
  }
}
