package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a PRE-HASHED shingle set (ARRAY<BIGINT>,
  * e.g. `transform(shingles, s -> xxhash64(s))`): `numHashes` minima in ONE
  * JIT-compiled pass, the k-th hash function being xxhash64 of the shingle
  * hash with seed k (Broder 1997 resemblance sketch).
  *
  * The Column-lambda formulation (`numHashes` separate `transform` +
  * `array_min` passes) runs interpreted and re-traverses the shingle array
  * once per hash function; this is the scan-speed replacement (Dedup.scala
  * wires it into the LSH pipeline). Duplicate shingles don't perturb minima,
  * so the input needn't be distinct. Empty/null array -> null.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs ARRAY<BIGINT> (pre-hashed shingles), got $other")
    }
  }
  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val h = XxHash64Function.hash(v, LongType, k.toLong)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def minhashSig(hashedShingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashedShingles), numHashes))
}
