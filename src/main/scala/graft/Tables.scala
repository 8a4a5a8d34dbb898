package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (see TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All operators take these
  * DataFrames as inputs; at 100 TB the same loaders would point at a
  * partitioned table root (`PARTITIONED BY (date_month, tile)`) and
  * Catalyst partition pruning keeps scans bounded — nothing in the
  * operator layer assumes single-file inputs.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4 refuses
    * to read natively. Read the raw int64 nanos (legacy conf) and convert
    * to a microsecond timestamp — truncation, matching how DuckDB (and
    * any µs engine) reads the same file.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
