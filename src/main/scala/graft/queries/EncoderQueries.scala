package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TinyEncoder

/** End-to-end embedding pipeline: events → per-(user, month) padded
  * 17-band monthly series with validity masks → TinyEncoder
  * mapPartitions inference → embedding column + summary stats.
  * Declared WITHOUT an oracle (a transformer is not ANSI-SQL); the
  * driver records the weaker rows-only check, and EncoderSpec carries
  * the semantic assertions (shape, determinism, mask invariance).
  */
object EncoderQueries {

  /** Events → PixelSeries: 12 monthly slots per user; band b of
    * month m = per-band-scaled monthly median (synthetic multi-band
    * lift of the single value column); empty months are masked
    * invalid — the reference's missing-month availability mask
    * (dataops/utils.py:18-93). */
  def qEncoderEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.events(spark, dir)
      .groupBy(col("user_id"), (month(col("ts")) - 1).as("m"))
      .agg(percentile(col("value"), lit(0.5)).as("v"))
    val series = monthly
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("m"), col("v"))).as("mv"))
      .select(col("user_id").as("id"),
        expr(s"""transform(sequence(0, ${TinyEncoder.NumTimesteps - 1}, 1), mm ->
                 get(filter(mv, e -> e.m = mm), 0).v)""").as("slots"))
      .select(col("id"),
        expr(s"""transform(slots, s -> transform(sequence(1, ${TinyEncoder.NumBands}, 1),
                 b -> cast(coalesce(s, 0D) * b / ${TinyEncoder.NumBands}.0 AS float)))""").as("series"),
        expr("transform(slots, s -> s IS NOT NULL)").as("valid"))
      // explicit repartition: AQE coalesces this tiny-by-bytes shuffle
      // to one partition, which would serialize the compute-heavy
      // encode — row count, not byte size, is the cost driver here
      .repartition(32)
      .as[TinyEncoder.PixelSeries]
    TinyEncoder.embed(series)
      .toDF()
      .select(col("id").as("user_id"),
        size(col("embedding")).as("dim"),
        expr("cast(aggregate(embedding, 0D, (a, v) -> a + cast(v AS double) * cast(v AS double)) AS double)").as("sq_norm"),
        col("embedding")(0).as("e0"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_encoder_embed" -> (qEncoderEmbed _),
  )

  /** Intentionally empty: non-SQL-expressible → rows-only check. */
  val oracle: Map[String, String] = Map.empty
}
