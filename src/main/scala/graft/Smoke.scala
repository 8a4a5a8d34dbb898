package graft
import org.apache.spark.sql.SparkSession

/** Local replica of the driver's smoke check: run [[SparkEntry.entry]]
  * on sf0.001 and require rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows=$n")
    assert(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}
