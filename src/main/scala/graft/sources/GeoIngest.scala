package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoJSON ingestion (SURVEY §2.1: `gpd.read_file` /
  * `read_geojson_from_gcs`, monthly.py:168,745-749): a
  * FeatureCollection file → one row per feature with its properties
  * flattened and the geometry rendered as a WKT string column — the
  * engine's geometry interchange format (SURVEY §1.1 geometries row).
  * One reader per geometry layer type, like the reference's one
  * layer per file. Schema-on-read: properties keep inferred types,
  * with downstream required-column checks (SURVEY §1.1 schema
  * system).
  */
object GeoIngest {

  private def features(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("features")).as("f"))

  /** Point layer → properties.* + `wkt` (`POINT (x y)`). */
  def readPoints(spark: SparkSession, path: String): DataFrame =
    features(spark, path).select(
      col("f.properties.*"),
      concat(lit("POINT ("),
        col("f.geometry.coordinates")(0).cast("string"), lit(" "),
        col("f.geometry.coordinates")(1).cast("string"), lit(")")).as("wkt"))

  /** Polygon layer (outer ring) → properties.* + `wkt`
    * (`POLYGON ((x y, ...))`). */
  def readPolygons(spark: SparkSession, path: String): DataFrame =
    features(spark, path).select(
      col("f.properties.*"),
      concat(lit("POLYGON (("),
        array_join(expr(
          "transform(f.geometry.coordinates[0], p -> concat(cast(p[0] AS string), ' ', cast(p[1] AS string)))"),
          ", "),
        lit("))")).as("wkt"))
}
