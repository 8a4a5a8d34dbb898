package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{TinyDecoder, TinyEncoder}
import graft.pipelines.PretrainingTable
import graft.sources.ObservationsGen

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

  /** The complete MAE pretraining objective end-to-end: the masked
    * examples PretrainingTable produces feed TinyEncoder (unmasked
    * timesteps only) → TinyDecoder (mask-token re-insertion,
    * per-band-group reconstruction) → per-cell masked-slot MSE.
    * Rows-only like q_encoder_embed (a transformer is not ANSI SQL);
    * TinyDecoderSpec pins determinism, masked-position prediction,
    * and finiteness. */
  def qMaeReconstruct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ex = PretrainingTable.build(ObservationsGen.observations(spark))
      .withColumn("id", concat_ws("|", col("tile"), col("cell_x"), col("cell_y")))
      .select(col("id"),
        col("x_eo").as("xEo"),
        col("mask"),
        expr("transform(y_eo, v -> coalesce(v, 0D))").as("yEo"),
        col("start_month").as("startMonth"))
      // same AQE note as qEncoderEmbed: cost is per-row compute
      .repartition(32)
      .as[TinyDecoder.MaskedExample]
    TinyDecoder.reconstruct(ex).toDF()
      .select(col("id"), col("n_masked"), col("masked_mse"),
        col("recon_masked")(0).as("recon0"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_encoder_embed" -> (qEncoderEmbed _),
    "q_mae_reconstruct" -> (qMaeReconstruct _),
  )

  /** Intentionally empty: non-SQL-expressible → rows-only check. */
  val oracle: Map[String, String] = Map.empty
}
