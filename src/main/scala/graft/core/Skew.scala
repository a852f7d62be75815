package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys. AQE rebalances skewed JOINS automatically;
  * for skewed AGGREGATIONS over algebraic functions the standard fix is
  * two-phase salting: aggregate on (key, salt) first — spreading one hot
  * key over `salt` reducers — then combine the partials.
  */
object Skew {

  /** Two-phase salted sum/count aggregate. `aggs` maps output column name
    * to ("sum"|"count"|"max"|"min", input column). The result is identical
    * to a direct groupBy because these functions are algebraic. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                aggs: Map[String, (String, Column)]): DataFrame = {
    def fn(op: String, c: Column): Column = op match {
      case "sum" => sum(c); case "count" => count(c)
      case "max" => max(c); case "min" => min(c)
      case other => throw new IllegalArgumentException(
        s"non-algebraic op '$other' cannot be salted naively")
    }
    def refn(op: String, c: Column): Column = op match {
      case "sum" | "count" => sum(c)
      case "max" => max(c); case "min" => min(c)
    }
    val phase1 = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(aggs.head._2 match { case (op, c) => fn(op, c).as("_" + aggs.head._1) },
        aggs.tail.map { case (name, (op, c)) => fn(op, c).as("_" + name) }.toSeq: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head match { case (name, (op, _)) => refn(op, col("_" + name)).as(name) },
        aggs.tail.map { case (name, (op, _)) => refn(op, col("_" + name)).as(name) }.toSeq: _*)
  }
}
