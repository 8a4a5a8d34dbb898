package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink layer (SURVEY §2.1 sink rows). The reference's tiled GeoTIFF
  * download (32 MB / 10,000-px tiles, monthly.py:42-146) and
  * 144-record tar shards (dataops/dataset.py:31) both reduce to the
  * same engine concept: bounded-size files under a partitioned
  * layout, with an atomic completion marker (`_SUCCESS`, replacing
  * existence-check idempotence) and a JSON manifest sidecar
  * (monthly.py:415-458 generate_metadata).
  */
object Sinks {

  /** Partitioned parquet with bounded file sizes. `partitionCols`
    * become the directory layout — the 100 TB pruning key
    * (PARTITIONED BY (date_month, tile), SURVEY §7.0). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** CSV sink (SURVEY §2.1: `to_csv`, optimization.py:216-217). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** CSV source with header + schema inference (SURVEY §2.1:
    * `pd.read_csv`, dataops/dataset.py:310). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON manifest: per-partition row counts written next to the
    * data (the generate_metadata sidecar, as a queryable table). */
  def writeManifest(spark: SparkSession, dataPath: String, manifestPath: String,
                    partitionCols: Seq[String]): Unit =
    spark.read.parquet(dataPath)
      .groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").json(manifestPath)
}
