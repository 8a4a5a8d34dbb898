package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.PipelineOps
import graft.queries.Exact
import graft.queries.Exact._

/** ML-adjacent relational surface: exact KNN classification and
  * evaluation metrics as SQL aggregations (SURVEY §2.9 probes +
  * metrics rows; eval/knn.py, eval/treesat_eval.py confusion math).
  */
object MlQueries {

  private val splitSpark = PipelineOps.hashSplitSql("cast(vec_id AS string)", 12)
  private val splitDuck = PipelineOps.hashSplitSql("cast(vec_id AS VARCHAR)", 12)
    .replace("instr(", "strpos(")

  /** Deterministic KNN (k=5) majority-vote classification of the
    * hash-val split against the hash-train split, reported as a
    * confusion matrix. Uses the native cosine_sim expression in the
    * pairwise scan (the hot loop); majority vote ties break on the
    * smaller label. At 100 TB the pairwise scan becomes the
    * LSH-bucketed candidate join (q_ann_sign_lsh) — same downstream
    * vote. */
  def qKnnClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("split", PipelineOps.hashSplit("cast(vec_id AS string)", 12))
    val train = e.filter(col("split") === "train")
      .select(col("vec_id").as("tid"), col("embedding").as("te"), col("label").as("tlabel"))
    val valid = e.filter(col("split") === "val")
      .select(col("vec_id").as("vid"), col("embedding").as("ve"), col("label").as("vlabel"))
    val wTop = Window.partitionBy(col("vid")).orderBy(col("cosine").desc, col("tid"))
    val top5 = valid.crossJoin(train)
      .withColumn("cosine", expr("cosine_sim(ve, te)"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
    val wVote = Window.partitionBy(col("vid"))
      .orderBy(col("votes").desc, col("tlabel"))
    top5.groupBy(col("vid"), col("vlabel"), col("tlabel"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrk", row_number().over(wVote))
      .filter(col("vrk") === 1)
      .groupBy(col("vlabel").as("label"), col("tlabel").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  private def knnPredSql: String = {
    val dot = (a: String, b: String) =>
      s"""list_reduce(list_transform(list_zip($a, $b),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""".stripMargin
    val cos = s"""(${dot("v.ve", "t.te")} / (sqrt(${dot("v.ve", "v.ve")}) * sqrt(${dot("t.te", "t.te")})))"""
    s"""split AS (SELECT vec_id, embedding, label, $splitDuck AS split FROM embeddings),
       |tr AS (SELECT vec_id AS tid, embedding AS te, label AS tlabel FROM split WHERE split = 'train'),
       |va AS (SELECT vec_id AS vid, embedding AS ve, label AS vlabel FROM split WHERE split = 'val'),
       |top5 AS (
       |  SELECT vid, vlabel, tlabel FROM (
       |    SELECT v.vid, v.vlabel, t.tlabel,
       |      ROW_NUMBER() OVER (PARTITION BY v.vid ORDER BY $cos DESC, t.tid) AS rk
       |    FROM va v CROSS JOIN tr t)
       |  WHERE rk <= 5),
       |pred AS (
       |  SELECT vid, vlabel, tlabel AS predicted FROM (
       |    SELECT vid, vlabel, tlabel, COUNT(*) AS votes,
       |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY COUNT(*) DESC, tlabel) AS vrk
       |    FROM top5 GROUP BY vid, vlabel, tlabel)
       |  WHERE vrk = 1)""".stripMargin
  }

  val qKnnClassifySql: String =
    s"""WITH $knnPredSql
       |SELECT vlabel AS label, predicted, COUNT(*) AS n
       |FROM pred GROUP BY 1, 2""".stripMargin

  /** Per-class precision/recall/F1 from the KNN predictions — the
    * confusion-matrix algebra as pure SQL aggregation
    * (eval/treesat_eval.py:221-311 compute_metrics). */
  def qEvalMetrics(spark: SparkSession, dir: String): DataFrame = {
    val conf = qKnnClassify(spark, dir)
    val tp = conf.filter(col("label") === col("predicted"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val actual = conf.groupBy(col("label").as("cls")).agg(sum(col("n")).as("n_actual"))
    val pred = conf.groupBy(col("predicted").as("cls")).agg(sum(col("n")).as("n_pred"))
    actual.join(pred, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .withColumn("precision",
        when(col("n_pred") > 0, col("tp").cast("double") / col("n_pred")).otherwise(0.0))
      .withColumn("recall",
        when(col("n_actual") > 0, col("tp").cast("double") / col("n_actual")).otherwise(0.0))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
        .otherwise(0.0))
  }

  val qEvalMetricsSql: String =
    s"""WITH $knnPredSql,
       |conf AS (SELECT vlabel AS label, predicted, COUNT(*) AS n FROM pred GROUP BY 1, 2),
       |tp AS (SELECT label AS cls, n AS tp FROM conf WHERE label = predicted),
       |act AS (SELECT label AS cls, CAST(SUM(n) AS BIGINT) AS n_actual FROM conf GROUP BY 1),
       |prd AS (SELECT predicted AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM conf GROUP BY 1),
       |base AS (
       |  SELECT COALESCE(act.cls, prd.cls) AS cls,
       |    COALESCE(tp.tp, 0) AS tp,
       |    COALESCE(act.n_actual, 0) AS n_actual,
       |    COALESCE(prd.n_pred, 0) AS n_pred
       |  FROM act FULL OUTER JOIN prd ON act.cls = prd.cls
       |  LEFT JOIN tp ON COALESCE(act.cls, prd.cls) = tp.cls),
       |pr AS (
       |  SELECT cls, tp, n_actual, n_pred,
       |    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END AS precision,
       |    CASE WHEN n_actual > 0 THEN CAST(tp AS DOUBLE) / n_actual ELSE 0.0 END AS recall
       |  FROM base)
       |SELECT cls, tp, n_actual, n_pred, precision, recall,
       |  CASE WHEN precision + recall > 0
       |       THEN 2.0 * precision * recall / (precision + recall) ELSE 0.0 END AS f1
       |FROM pr""".stripMargin

  /** Regression-eval metrics (the algae-blooms / fuel-moisture eval
    * family, eval/algae_blooms_eval.py:36-): a per-group-mean
    * baseline model fit on the hash-train split, scored on the val
    * split with MAE / MSE / R² as pure SQL aggregation. Means of
    * computed doubles go through the floor-quantized exact forms. */
  def qRegressionMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("split", PipelineOps.hashSplit("cast(event_id AS string)", 12))
    val model = ev.filter(col("split") === "train")
      .groupBy(col("event_type")).agg(dmean(col("value")).as("pred"))
    val scored = ev.filter(col("split") === "val")
      .join(model, "event_type")
      .withColumn("err", col("value") - col("pred"))
    val gmean = scored.groupBy(col("event_type"))
      .agg(dmean(col("value")).as("ybar"))
    scored.join(gmean, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        qmean(abs(col("err"))).as("mae"),
        qmean(col("err") * col("err")).as("mse"),
        (lit(1.0) -
          sum(floor(col("err") * col("err") * 1e6).cast("long")).cast("double") /
          sum(floor((col("value") - col("ybar")) * (col("value") - col("ybar")) * 1e6)
            .cast("long")).cast("double")).as("r2"))
  }

  val qRegressionMetricsSql: String = {
    val split = PipelineOps.hashSplitSql("cast(event_id AS VARCHAR)", 12)
      .replace("instr(", "strpos(")
    s"""WITH sp AS (SELECT event_id, event_type, value, $split AS split FROM events),
       |model AS (SELECT event_type, ${Exact.dmeanSql("value")} AS pred
       |          FROM sp WHERE split = 'train' GROUP BY 1),
       |scored AS (
       |  SELECT v.event_type, v.value, v.value - m.pred AS err
       |  FROM sp v JOIN model m ON v.event_type = m.event_type
       |  WHERE v.split = 'val'),
       |gmean AS (SELECT event_type, ${Exact.dmeanSql("value")} AS ybar
       |          FROM scored GROUP BY 1)
       |SELECT s.event_type, COUNT(*) AS n,
       |  ${Exact.qmeanSql("abs(s.err)")} AS mae,
       |  ${Exact.qmeanSql("s.err * s.err")} AS mse,
       |  1.0 - CAST(SUM(CAST(FLOOR(s.err * s.err * 1000000.0) AS BIGINT)) AS DOUBLE)
       |      / CAST(SUM(CAST(FLOOR((s.value - g.ybar) * (s.value - g.ybar) * 1000000.0) AS BIGINT)) AS DOUBLE) AS r2
       |FROM scored s JOIN gmean g ON s.event_type = g.event_type
       |GROUP BY s.event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_classify" -> (qKnnClassify _),
    "q_eval_metrics" -> (qEvalMetrics _),
    "q_regression_metrics" -> (qRegressionMetrics _),
  )

  val oracle: Map[String, String] = Map(
    "q_knn_classify" -> qKnnClassifySql,
    "q_eval_metrics" -> qEvalMetricsSql,
    "q_regression_metrics" -> qRegressionMetricsSql,
  )
}
