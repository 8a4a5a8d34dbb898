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
  /** events.parquet has shipped ts as either TIMESTAMP(NANOS) (which
    * Spark 4 refuses to read natively — read the raw int64 nanos via
    * the legacy conf and truncate to microseconds, matching how DuckDB
    * reads the same file) or plain TIMESTAMP(MICROS) without timezone
    * (read as NTZ — cast to the session type, identity under the UTC
    * session). Dispatch on the observed schema so both vintages load
    * to the same TIMESTAMP column.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _: TimestampNTZType =>
        // NTZ→TimestampType is value-preserving only when the session
        // renders instants in UTC; under any other zone the cast would
        // silently shift every timestamp. Fail loudly instead.
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events(): NTZ ts requires spark.sql.session.timeZone=UTC " +
            "(Sessions.local sets it); refusing a zone-shifting cast")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case other => throw new IllegalArgumentException(
        s"events.parquet ts has unsupported type $other — expected " +
          "TIMESTAMP(NANOS) (int64 via legacy nanosAsLong), TIMESTAMP_NTZ, " +
          "or TIMESTAMP; a new testdata vintage needs an explicit branch here")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
