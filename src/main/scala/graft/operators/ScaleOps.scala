package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path join utilities (SURVEY §7.0 "minimize shuffles";
  * BASELINE north-star: every operator designed for 100 TB).
  */
object ScaleOps {

  /** Persist both sides as bucketed tables on the join key, so the
    * subsequent join is co-located: neither side shuffles — the plan
    * shows SortMergeJoin with NO Exchange above either scan. This is
    * the 100 TB layout for repeated fact-to-fact joins (the
    * reference's (time, x, y) multi-sensor merges, SURVEY §2.3): pay
    * the partitioned write once, join shuffle-free forever after. */
  def bucketize(spark: SparkSession, df: DataFrame, table: String,
                key: String, buckets: Int): Unit = {
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
      .saveAsTable(table)
  }

  /** Salted join for skewed keys (SURVEY §2 "salting for skew"): the
    * build side replicates `salt` times, the probe side picks a
    * deterministic salt from a keyed hash — hot keys spread over
    * `salt` reducers instead of one straggler. Result is identical to
    * the plain inner join (verified by spec); use when AQE's runtime
    * skew split is not available (e.g. storage-partitioned joins). */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
    val saltedRight = right
      .withColumn("_s", explode(expr(s"sequence(0, ${salt - 1})")))
      .withColumn("_salt", col("_s").cast("long")).drop("_s")
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
