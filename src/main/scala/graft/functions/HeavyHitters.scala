package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency sketch as a native aggregate: at most `k`
  * counters survive in the buffer, every input key either bumps its
  * counter, claims a free slot, or decrements ALL counters by one
  * (amortized O(1) — each decrement round repays k prior increments).
  * Partial buffers merge with the mergeable-summaries rule (Agarwal et
  * al., PODS'12): add counters pointwise, and when more than `k`
  * survive, subtract the (k+1)-th largest count from all and drop the
  * non-positives. The merged sketch keeps the sequential guarantee:
  * every key with true frequency > n/(k+1) is present, and each
  * surviving counter is a lower bound within n/(k+1) of the true count
  * — the no-false-negative contract [[graft.pipeline.TextStats.heavyHitters]]
  * builds its sketch-prune / exact-verify plan on.
  *
  * Reference counterpart: xclim has no frequency sketches — this is
  * part of the training-data-pipeline surface (corpus heavy-hitter
  * detection at scales where a full distinct aggregation shuffle is the
  * bottleneck).
  *
  * Output: array<struct<item string, lb bigint>> sorted by (lb desc,
  * item asc) — deterministic for a given input MULTISET order; exact
  * (= group-by counts) whenever the key cardinality never exceeded k
  * in any partial.
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  require(k >= 1, s"sketch capacity must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("lb", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
                      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String]
    val cur = buf.get(key) // boxed: null marks absence (scala.Long would unbox it to 0)
    if (cur != null) buf.put(key, java.lang.Long.valueOf(cur.longValue + 1L))
    // copy() (not clone()): eval's UTF8String aliases a REUSED row buffer,
    // and clone()'s getBytes returns that very array when it is exact-size
    else if (buf.size < k) buf.put(key.copy(), java.lang.Long.valueOf(1L))
    else {
      // decrement-all round: k distinct "other" keys each give one count
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.longValue == 1L) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - 1L))
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[UTF8String, java.lang.Long],
                     other: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    other.forEach { (key, c) =>
      val cur = buf.get(key)
      if (cur != null) buf.put(key, java.lang.Long.valueOf(cur.longValue + c.longValue))
      else buf.put(key, c) // already private copies (deserialized or cloned)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from every counter
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next().longValue; i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(buf.size - k - 1) // (k+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.longValue <= d) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - d))
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue.longValue); i += 1 }
    val sorted = entries.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(s, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c.longValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_sketch"
}

object MisraGries {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Aggregate Column: Misra–Gries sketch of `col` with `k` counters. */
  def mgSketch(col: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(col), k).toAggregateExpression())
}
