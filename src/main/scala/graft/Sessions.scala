package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession: UTC, shuffle
  * partitions sized to the local core count (on a cluster this is the
  * knob sized to executors × cores), AQE left on (Spark 4 default —
  * runtime skew-join + partition coalescing), and the Graft Catalyst
  * extensions installed. */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
