package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.MultimodalOps
import graft.queries.Exact._

/** Multimodal-column surface: binary payloads + typed metadata
  * (BASELINE.json mandate). The features query runs through the real
  * `mapPartitions` decode path — the oracle recomputes the same fake
  * kernel arithmetic from the ASCII text, proving the batched decode
  * plumbing end-to-end.
  */
object MultimodalQueries {

  /** Manifest: per media kind, item count + payload byte totals —
    * the metadata-only query a 100 TB media lake answers without
    * touching payloads (parquet column pruning skips the binary
    * column entirely). */
  def qMediaManifest(spark: SparkSession, dir: String): DataFrame = {
    MultimodalOps.mediaFromDocuments(Tables.documents(spark, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        qmean(length(col("payload")).cast("double")).as("avg_bytes"),
        max(col("meta.width")).as("max_width"))
  }

  val qMediaManifestSql: String =
    s"""SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
       |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  COUNT(*) AS n,
       |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       |  ${qmeanSql("CAST(octet_length(encode(text)) AS DOUBLE)")} AS avg_bytes,
       |  MAX(CAST(length(text) % 64 + 1 AS INT)) AS max_width
       |FROM documents""".stripMargin + "\nGROUP BY 1"

  /** Features via the batched mapPartitions decode kernel
    * (MultimodalOps.decodeFeatures): byte stats + rolling checksum per
    * media item. The oracle recomputes the kernel from the text's
    * character codes (payloads are ASCII here, so byte == code). */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = MultimodalOps
      .mediaFromDocuments(Tables.documents(spark, dir))
      .as[MultimodalOps.MediaRow]
    MultimodalOps.decodeFeatures(media).toDF()
  }

  val qMediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  length(text) AS n_bytes,
      |  CAST(list_sum(codes) AS DOUBLE) / length(text) AS byte_mean,
      |  CAST(list_min(codes) AS INT) AS byte_min,
      |  CAST(list_max(codes) AS INT) AS byte_max,
      |  list_reduce(list_transform(codes, c -> CAST(c AS BIGINT)),
      |              (a, c) -> (a * 31 + c) % 72057594037927931) AS checksum
      |FROM (
      |  SELECT doc_id, text,
      |    list_transform(range(length(text)), i -> ascii(substr(text, i+1, 1))) AS codes
      |  FROM documents)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_manifest" -> (qMediaManifest _),
    "q_media_features" -> (qMediaFeatures _),
  )

  val oracle: Map[String, String] = Map(
    "q_media_manifest" -> qMediaManifestSql,
    "q_media_features" -> qMediaFeaturesSql,
  )
}
