package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.RandomAccessFile
import java.util.zip.Inflater

/** Minimal HDF5 reader for NetCDF-4 ingestion — the subset of the public
  * HDF5 File Format Specification that CMIP-era NetCDF-4 files actually
  * exercise: superblock v0, old-style (symbol-table) groups, v1 object
  * headers, simple dataspaces, fixed-point/IEEE-float datatypes,
  * contiguous AND chunked (v1 B-tree) data layouts, and the deflate
  * filter (`java.util.zip.Inflater` — no native codecs).
  *
  * Scale design mirrors `NetCDF`: the driver parses only the metadata
  * (superblock → group B-tree → object headers → chunk B-tree, a few KB),
  * producing a chunk table of (address, size, offsets). Executors then
  * seek-read-inflate their chunks in parallel (`spark.range` over the
  * chunk table → mapPartitions), so ingestion parallelism is bounded by
  * chunk count, not by a driver scan.
  *
  * Out of scope (documented): v2 superblocks / "latest" link messages,
  * fractal-heap groups, variable-length and compound datatypes, szip.
  * These do not appear in netcdf-c's default output.
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFF.. addresses parse to -1

  final case class Dataset(name: String, dims: Seq[Long], dtClass: Int,
                           dtSize: Int, littleEndian: Boolean,
                           layoutClass: Int, dataAddress: Long, dataSize: Long,
                           chunkDims: Seq[Long], chunkBtree: Long,
                           gzip: Boolean, attrs: Map[String, Double] = Map.empty)
  final case class Chunk(address: Long, storedSize: Long, offsets: Seq[Long])

  // ---------------- driver-side metadata parse ----------------

  private class Reader(path: String) {
    val raf = new RandomAccessFile(path, "r")
    def close(): Unit = raf.close()
    def seek(p: Long): Unit = raf.seek(p)
    def u8(): Int = raf.readUnsignedByte()
    def u16(): Int = { val a = u8(); val b = u8(); a | (b << 8) } // little-endian
    def u32(): Long = { val a = u16().toLong; val b = u16().toLong; a | (b << 16) }
    def u64(): Long = {
      val a = u32(); val b = u32(); a | (b << 32)
    }
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); raf.readFully(b); b }
    def skip(n: Int): Unit = raf.seek(raf.getFilePointer + n)
    def pos: Long = raf.getFilePointer
  }

  /** Parse all datasets reachable from the root group (flat — netCDF-4
    * classic-model files keep everything in the root group). */
  def readMeta(path: String): Seq[Dataset] = {
    val r = new Reader(path)
    try {
      val sig = r.bytes(8)
      require(sig.map(_ & 0xFF).sameElements(Seq(0x89, 'H', 'D', 'F', 0x0D, 0x0A, 0x1A, 0x0A)),
        s"$path is not an HDF5 file")
      val sbVersion = r.u8()
      require(sbVersion == 0, s"only superblock v0 supported (got $sbVersion)")
      r.skip(1 + 1 + 1 + 1) // freespace ver, root sym ver, reserved, shared msg ver
      val offSize = r.u8(); val lenSize = r.u8()
      require(offSize == 8 && lenSize == 8, s"only 8-byte offsets/lengths (got $offSize/$lenSize)")
      r.skip(1) // reserved
      r.skip(2 + 2 + 4) // group leaf k, internal k, consistency flags
      r.skip(8 * 4) // base, free space, end of file, driver info
      // root group symbol table entry
      r.skip(8) // link name offset
      val rootOH = r.u64()
      r.skip(4 + 4 + 16)

      val out = scala.collection.mutable.ArrayBuffer.empty[Dataset]
      // root object header → symbol table message → btree + heap
      val (btreeAddr, heapAddr) = rootSymbolTable(r, rootOH)
      val heapData = localHeapData(r, heapAddr)
      groupEntries(r, btreeAddr).foreach { case (nameOff, ohAddr) =>
        val name = cString(heapData, nameOff.toInt)
        parseDataset(r, name, ohAddr).foreach(out += _)
      }
      out.toSeq
    } finally r.close()
  }

  private def rootSymbolTable(r: Reader, ohAddr: Long): (Long, Long) = {
    var res: (Long, Long) = (Undef, Undef)
    foreachMessage(r, ohAddr) { (msgType, _, bodyPos) =>
      if (msgType == 0x0011) { r.seek(bodyPos); res = (r.u64(), r.u64()) }
    }
    require(res._1 != Undef, "root group has no symbol table message")
    res
  }

  private def localHeapData(r: Reader, heapAddr: Long): Array[Byte] = {
    r.seek(heapAddr)
    require(new String(r.bytes(4), "ASCII") == "HEAP", "bad local heap signature")
    r.skip(1 + 3) // version + reserved
    val dataSize = r.u64()
    r.skip(8) // free list head
    val dataAddr = r.u64()
    r.seek(dataAddr)
    r.bytes(dataSize.toInt)
  }

  private def cString(heap: Array[Byte], off: Int): String = {
    var end = off
    while (end < heap.length && heap(end) != 0) end += 1
    new String(heap, off, end - off, "UTF-8")
  }

  /** Walk a v1 group B-tree (leaf level only needs SNOD children; internal
    * nodes recurse). Returns (heap name offset, object header address). */
  private def groupEntries(r: Reader, btreeAddr: Long): Seq[(Long, Long)] = {
    r.seek(btreeAddr)
    require(new String(r.bytes(4), "ASCII") == "TREE", "bad group B-tree signature")
    val nodeType = r.u8(); val level = r.u8()
    require(nodeType == 0, s"expected group B-tree (type 0), got $nodeType")
    val used = r.u16()
    r.skip(8 + 8) // siblings
    // keys/children interleaved: key0 child0 key1 child1 ... keyN
    val children = (0 until used).map { _ => r.skip(8); r.u64() } // skip key, read child
    if (level > 0) children.flatMap(groupEntries(r, _))
    else children.flatMap(snodEntries(r, _))
  }

  private def snodEntries(r: Reader, snodAddr: Long): Seq[(Long, Long)] = {
    r.seek(snodAddr)
    require(new String(r.bytes(4), "ASCII") == "SNOD", "bad symbol node signature")
    r.skip(1 + 1) // version + reserved
    val n = r.u16()
    (0 until n).map { _ =>
      val nameOff = r.u64(); val oh = r.u64()
      r.skip(4 + 4 + 16)
      (nameOff, oh)
    }
  }

  /** Iterate v1 object-header messages (handles continuation blocks). */
  private def foreachMessage(r: Reader, ohAddr: Long)(f: (Int, Int, Long) => Unit): Unit = {
    r.seek(ohAddr)
    val version = r.u8()
    require(version == 1, s"only v1 object headers (got $version)")
    r.skip(1)
    val nMsgs = r.u16()
    r.skip(4) // ref count
    val headerSize = r.u32()
    r.skip(4) // padding to 8-byte alignment
    var blocks = List((r.pos, headerSize))
    var seen = 0
    while (blocks.nonEmpty && seen < nMsgs) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      var p = start
      val end = start + size
      while (p + 8 <= end && seen < nMsgs) {
        r.seek(p)
        val t = r.u16(); val sz = r.u16()
        r.skip(1 + 3) // flags + reserved
        val bodyPos = r.pos
        if (t == 0x0010) { // continuation
          r.seek(bodyPos); val addr = r.u64(); val len = r.u64()
          blocks = blocks :+ (addr, len)
        } else f(t, sz, bodyPos)
        seen += 1
        p = bodyPos + sz
      }
    }
  }

  /** Parse one dataset's object header into a [[Dataset]]; None for
    * non-dataset objects (sub-groups, named types). */
  private def parseDataset(r: Reader, name: String, ohAddr: Long): Option[Dataset] = {
    var dims: Seq[Long] = null
    var dtClass = -1; var dtSize = 0; var little = true
    var layoutClass = -1; var dataAddr = Undef; var dataSize = 0L
    var chunkDims: Seq[Long] = Nil; var chunkBtree = Undef
    var gzip = false
    val attrs = scala.collection.mutable.Map.empty[String, Double]
    def pad8(n: Int): Int = (n + 7) & ~7
    foreachMessage(r, ohAddr) { (t, sz, body) =>
      t match {
        case 0x0001 => // dataspace
          r.seek(body)
          val v = r.u8(); val rank = r.u8(); val flags = r.u8()
          r.skip(if (v == 1) 5 else 1)
          dims = (0 until rank).map(_ => r.u64())
        case 0x0003 => // datatype
          r.seek(body)
          val cv = r.u8()
          dtClass = cv & 0x0F
          val bits0 = r.u8(); r.skip(2)
          dtSize = r.u32().toInt
          little = (bits0 & 1) == 0
        case 0x0008 => // data layout v3
          r.seek(body)
          val v = r.u8()
          require(v == 3, s"only layout v3 (got $v)")
          layoutClass = r.u8()
          layoutClass match {
            case 1 => // contiguous
              dataAddr = r.u64(); dataSize = r.u64()
            case 2 => // chunked
              val rank = r.u8()
              chunkBtree = r.u64()
              chunkDims = (0 until rank).map(_ => r.u32())
            case 0 => // compact
              dataSize = r.u16().toLong; dataAddr = r.pos
            case other => throw new IllegalArgumentException(s"layout class $other")
          }
        case 0x000B => // filter pipeline
          r.seek(body)
          val v = r.u8(); val n = r.u8()
          r.skip(if (v == 1) 6 else 0)
          var i = 0
          var ok = true
          while (i < n && ok) {
            val id = r.u16()
            val nameLen = if (v == 1 || id >= 256) r.u16() else 0
            r.skip(2) // flags
            val nVals = r.u16()
            r.skip(nameLen)
            r.skip(4 * nVals + (if (v == 1 && nVals % 2 == 1) 4 else 0))
            if (id == 1) gzip = true
            else if (id != 2) ok = false // shuffle unsupported here; bail
            i += 1
          }
          require(ok, s"unsupported filter in pipeline for $name (only deflate)")
        case 0x000C => // attribute (v1): CF scalars (_FillValue, scale, offset)
          r.seek(body)
          val v = r.u8()
          if (v == 1) {
            r.skip(1)
            val nameSize = r.u16(); val adtSize = r.u16(); val adsSize = r.u16()
            val aName = {
              val b = r.bytes(nameSize)
              r.skip(pad8(nameSize) - nameSize)
              val z = b.indexOf(0.toByte)
              new String(b, 0, if (z < 0) b.length else z, "UTF-8")
            }
            val dtStart = r.pos
            val cv = r.u8(); val aCls = cv & 0x0F
            val aLittle = (r.u8() & 1) == 0; r.skip(2)
            val aSize = r.u32().toInt
            r.seek(dtStart + pad8(adtSize))
            val dsStart = r.pos
            r.skip(1)
            val aRank = r.u8()
            r.skip(1); r.skip(5)
            val aCount = (0 until aRank).map(_ => r.u64()).product max 1L
            r.seek(dsStart + pad8(adsSize))
            // numeric scalar attributes only — strings/arrays are skipped
            if ((aCls == 0 || aCls == 1) && aCount == 1 &&
                (aSize == 1 || aSize == 2 || aSize == 4 || aSize == 8))
              attrs(aName) = decode(r.bytes(aSize), aCls, aSize, aLittle, 1)(0)
          }
        case _ => ()
      }
    }
    if (dims == null || dtClass < 0 || layoutClass < 0) None
    else Some(Dataset(name, dims, dtClass, dtSize, little, layoutClass,
      dataAddr, dataSize, chunkDims, chunkBtree, gzip, attrs.toMap))
  }

  /** Chunk table from a v1 raw-data B-tree (driver-side; a few bytes per
    * chunk). */
  def chunkTable(path: String, ds: Dataset): Seq[Chunk] = {
    val r = new Reader(path)
    try collectChunks(r, ds.chunkBtree, ds.chunkDims.length)
    finally r.close()
  }

  private def collectChunks(r: Reader, addr: Long, rank: Int): Seq[Chunk] = {
    r.seek(addr)
    require(new String(r.bytes(4), "ASCII") == "TREE", "bad chunk B-tree signature")
    val nodeType = r.u8(); val level = r.u8()
    require(nodeType == 1, s"expected chunk B-tree (type 1), got $nodeType")
    val used = r.u16()
    r.skip(8 + 8)
    (0 until used).flatMap { _ =>
      val storedSize = r.u32()
      r.skip(4) // filter mask
      val offs = (0 until rank).map(_ => r.u64())
      val child = r.u64()
      val here = r.pos
      val res =
        if (level > 0) collectChunks(r, child, rank)
        else Seq(Chunk(child, storedSize, offs))
      r.seek(here)
      res
    }
  }

  // ---------------- executor-parallel data read ----------------

  private def decode(bytes: Array[Byte], dtClass: Int, dtSize: Int,
                     little: Boolean, n: Int): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    Array.tabulate(n) { i =>
      (dtClass, dtSize) match {
        case (1, 8) => bb.getDouble(i * 8)
        case (1, 4) => bb.getFloat(i * 4).toDouble
        case (0, 8) => bb.getLong(i * 8).toDouble
        case (0, 4) => bb.getInt(i * 4).toDouble
        case (0, 2) => bb.getShort(i * 2).toDouble
        case (0, 1) => bb.get(i).toDouble
        case other  => throw new IllegalArgumentException(s"datatype $other")
      }
    }
  }

  private def inflate(in: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(in)
    val out = new Array[Byte](outLen)
    var off = 0
    while (off < outLen && !inf.finished()) off += inf.inflate(out, off, outLen - off)
    inf.end()
    out
  }

  /** One dataset as a long-format DataFrame: one INT column per dimension
    * (`i0`, `i1`, …) + `value` DOUBLE. Chunked datasets read
    * chunk-parallel; contiguous datasets split on the leading dim. */
  def readVariable(spark: SparkSession, path: String, name: String): DataFrame = {
    val ds = readMeta(path).find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"no dataset '$name' in $path"))
    import spark.implicits._
    val dims = ds.dims
    val rank = dims.length
    val (dtClass, dtSize, little) = (ds.dtClass, ds.dtSize, ds.littleEndian)

    val raw: org.apache.spark.sql.Dataset[(Array[Long], Double)] = ds.layoutClass match {
      case 1 | 0 => // contiguous / compact: pure offset math, like classic NetCDF
        val addr = ds.dataAddress
        val total = dims.product
        val innerSizes = dims.toArray
        spark.range(0, total).mapPartitions { it =>
          val raf = new RandomAccessFile(path, "r")
          val iter = it.map { flatBoxed =>
            val flat: Long = flatBoxed
            raf.seek(addr + flat * dtSize)
            val b = new Array[Byte](dtSize); raf.readFully(b)
            var rem = flat; val idx = new Array[Long](innerSizes.length)
            var i = innerSizes.length - 1
            while (i >= 0) { idx(i) = rem % innerSizes(i); rem /= innerSizes(i); i -= 1 }
            (idx, decode(b, dtClass, dtSize, little, 1)(0))
          }
          new Iterator[(Array[Long], Double)] {
            def hasNext: Boolean = { val h = iter.hasNext; if (!h) raf.close(); h }
            def next(): (Array[Long], Double) = iter.next()
          }
        }
      case 2 => // chunked: driver parses the chunk table, executors inflate
        val chunks = chunkTable(path, ds)
        val cdims = ds.chunkDims.dropRight(1).toArray // last entry = element size
        val dimArr = dims.toArray
        val gz = ds.gzip
        val chunkElems = cdims.product.toInt
        spark.sparkContext.parallelize(chunks, math.min(chunks.size, 64).max(1))
          .flatMap { c =>
            val raf = new RandomAccessFile(path, "r")
            try {
              raf.seek(c.address)
              val stored = new Array[Byte](c.storedSize.toInt)
              raf.readFully(stored)
              val bytes = if (gz) inflate(stored, chunkElems * dtSize) else stored
              val vals = decode(bytes, dtClass, dtSize, little, chunkElems)
              // chunk-local row-major unravel + global offset; rows past the
              // dataspace edge (partial edge chunks) are dropped
              (0 until chunkElems).iterator.flatMap { flat =>
                var rem = flat.toLong; val idx = new Array[Long](cdims.length)
                var i = cdims.length - 1
                while (i >= 0) { idx(i) = rem % cdims(i); rem /= cdims(i); i -= 1 }
                var inBounds = true
                var j = 0
                while (j < idx.length) {
                  idx(j) += c.offsets(j)
                  if (idx(j) >= dimArr(j)) inBounds = false
                  j += 1
                }
                if (inBounds) Some((idx, vals(flat))) else None
              }.toSeq
            } finally raf.close()
          }.toDS()
      case other => throw new IllegalArgumentException(s"layout class $other")
    }
    val cols = (0 until rank).map(i => col("_1")(i).cast("int").as(s"i$i")) :+ col("_2").as("value")
    val df = raw.toDF().select(cols: _*)
    // CF unpacking (same contract as NetCDF.readVariable): fill -> NULL,
    // then scale/offset as a codegen'd projection on the scan output
    val fill = ds.attrs.get("_FillValue").orElse(ds.attrs.get("missing_value"))
    val scale = ds.attrs.getOrElse("scale_factor", 1.0)
    val offset = ds.attrs.getOrElse("add_offset", 0.0)
    fill match {
      case Some(f) => df.withColumn("value",
        when(col("value") === f, lit(null)).otherwise(col("value") * scale + offset))
      case None if scale != 1.0 || offset != 0.0 =>
        df.withColumn("value", col("value") * scale + offset)
      case None => df
    }
  }

  /** Convert every dataset to a long-format parquet lake (the NetCDF-4
    * twin of `NetCDF.toParquetLake`; dimension identity is by dataset
    * name, as in netCDF-4's dimension-scale convention). */
  def toParquetLake(spark: SparkSession, h5Path: String, outDir: String): Seq[String] = {
    readMeta(h5Path).map { ds =>
      readVariable(spark, h5Path, ds.name)
        .write.mode("overwrite").parquet(s"$outDir/${ds.name}")
      ds.name
    }
  }
}
