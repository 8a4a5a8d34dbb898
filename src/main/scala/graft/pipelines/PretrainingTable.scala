package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

/** The pretraining-data pipeline (SURVEY §3.2): observations →
  * per-cell 12-step normalized series → seeded MAE masking →
  * MaskedExample-shaped rows (masking.py:30-33 namedtuple). Replaces
  * the reference's EE-export → GCS → serverless tif→npy → tar chain
  * (stages 3–5) with one grouped pass; the training-read stage's
  * seeded shuffle/masking (stage 6) is hash-derived, so any executor
  * produces identical examples.
  *
  * Scale: one shuffle on (tile, cell) to assemble series; the
  * normalization constants broadcast; masking is per-row arithmetic.
  * Output rows are the model's input contract: x (masked series),
  * y (reconstruction targets on masked slots), mask, start month,
  * static latlon-ish features.
  */
object PretrainingTable {

  /** @param obs canonical observations (ObservationsGen shape)
    * @param addBy,divideBy normalization constants (eesrtm.py:164-179)
    */
  def build(obs: DataFrame, addBy: Double = 0.0, divideBy: Double = 400.0): DataFrame = {
    val monthly = obs.filter(col("source") === "S2_HARMONIZED")
      .filter((col("QA60").bitwiseAND(lit(1L << 10)) === 0L))
      .withColumn("month0", month(col("ts")) - 1)
      .groupBy(col("tile"), col("cell_x"), col("cell_y"), col("month0"))
      .agg(percentile(col("B8"), lit(0.5)).as("b8"))
    val series = monthly
      .groupBy(col("tile"), col("cell_x"), col("cell_y"))
      .agg(expr("transform(array_sort(collect_list(struct(month0, b8))), e -> e.b8)").as("arr"),
        count(lit(1)).as("n_months"))
      .filter(col("n_months") === 12)
      // normalize (x + ADD_BY) / DIVIDE_BY
      .withColumn("norm", expr(s"transform(arr, v -> (v + $addBy) / $divideBy)"))
      .withColumn("k", concat_ws("|", col("tile"), col("cell_x"), col("cell_y")))
      // seeded start month (random window start, dataset.py:280-287)
      .withColumn("start_month", PipelineOps.hexDigit("k", 1) % 12)
    // seeded per-position mask (ratio 0.5) + apply (masking.py:134-146)
    series
      .withColumn("mask", expr(
        s"transform(sequence(0, 11), p -> ${PipelineOps.hexDigitSql("k", "p + 2")} < 8)"))
      .withColumn("x_eo", expr(
        "zip_with(norm, mask, (v, m) -> CASE WHEN m THEN 0D ELSE v END)"))
      .withColumn("y_eo", expr(
        "zip_with(norm, mask, (v, m) -> CASE WHEN m THEN v ELSE CAST(NULL AS double) END)"))
      .select(col("tile"), col("cell_x"), col("cell_y"), col("start_month"),
        col("mask"), col("x_eo"), col("y_eo"))
  }
}
