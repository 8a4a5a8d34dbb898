package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front door: registers every testdata table as a temp view so
  * the whole engine surface — built-ins, the 17-index expression
  * strings (designed to be `selectExpr`/SQL-pasteable), and the
  * injected functions like `cosine_sim` — is reachable from plain
  * `spark.sql` (the reference's `image.expression(str, bindings)`
  * string-formula surface, common_ci.py:93-100, generalized). */
object GraftSql {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}
