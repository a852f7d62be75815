package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Dev scan for the r9 engine-exactness gate: list every `round(x, s>0)`
  * over a non-decimal float in any declared query's plan, classifying
  * grid-aligned inputs (exact long scaled by a power of ten ≤ 10^s —
  * portable, the value sits mid-cell) vs raw float math (version-risky:
  * Spark's BigDecimal HALF_UP and DuckDB's scaled-double rounding disagree
  * on boundary values, r8's five hash fails). GateSpec enforces the same
  * rule; this main is the triage view.
  */
object RoundScan {
  /** true if e is (long-derived) / 10^k (or * 10^-k) with 10^k <= 10^s,
    * possibly behind casts — the portable mid-cell shape. */
  def gridAligned(e: Expression, s: Int): Boolean = e match {
    case Cast(c, _, _, _) => gridAligned(c, s)
    case Divide(num, Literal(d: Double, DoubleType), _) =>
      val k = math.log10(d)
      integral(num) && k == math.rint(k) && k <= s
    case Multiply(num, Literal(d: Double, DoubleType), _) =>
      val k = -math.log10(d)
      integral(num) && k == math.rint(k) && k <= s
    case _ => false
  }
  def integral(e: Expression): Boolean = e match {
    case Cast(c, _, _, _) => integral(c) || integralType(e.dataType)
    case _ => integralType(e.dataType)
  }
  def integralType(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.analyzed
        val hits = plan.collect { case p =>
          p.expressions.flatMap(_.collect {
            case r @ Round(c, Literal(s: Int, _), _)
                if s > 0 && c.dataType == DoubleType =>
              val cls = if (gridAligned(c, s)) "GRID" else "RAW "
              s"$cls round(...,$s): ${r.simpleString(60).take(120)}"
          })
        }.flatten.distinct
        hits.foreach(h => println(f"$name%-36s $h"))
      } catch { case e: Throwable =>
        println(f"$name%-36s SCAN-ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
