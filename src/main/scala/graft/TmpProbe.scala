package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpProbe {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[1]").config("spark.ui.enabled","false").getOrCreate()
    import s.implicits._
    s.sparkContext.setLogLevel("ERROR")
    val df = Seq(493.75130049999996).toDF("x")
    df.select((col("x")*1e6).as("m"), round(col("x")*1e6).as("r"),
      (round(col("x")*1e6)/1e6).as("rd"), round(col("x"),6).as("plain")).show(false)
    println("scala: " + (493.75130049999996 * 1e6) + " rint=" + math.rint(493.75130049999996 * 1e6))
    s.stop()
  }
}
