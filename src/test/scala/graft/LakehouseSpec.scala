package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Table-maintenance semantics a long-running lake depends on:
  * dynamic partition overwrite (replace only the partitions the batch
  * touches) and small-file compaction (rewrite at a target file count
  * with row identity). */
class LakehouseSpec extends SparkSpec {

  test("dynamic partition overwrite replaces only the touched partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dynpart").toString + "/t"
    Seq(("click", 1L), ("click", 2L), ("view", 3L), ("purchase", 4L))
      .toDF("event_type", "event_id")
      .write.partitionBy("event_type").parquet(dir)
    // a 'static' overwrite of the click slice would TRUNCATE the table;
    // dynamic mode replaces only partitions present in the new data
    Seq(("click", 99L)).toDF("event_type", "event_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(dir)
    val rows = spark.read.parquet(dir)
      .select("event_type", "event_id").as[(String, Long)].collect().toSet
    assert(rows == Set(("click", 99L), ("view", 3L), ("purchase", 4L)),
      s"untouched partitions lost or stale rows kept: $rows")
  }

  test("compaction reduces file count, preserves rows exactly, and is re-runnable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(24).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).orderBy("id").collect().toSeq
    val (before, after) = Sinks.compact(spark, dir, targetFiles = 3)
    assert(before >= 20, s"fixture did not fragment: $before files")
    assert(after <= 3, s"compaction left $after files")
    val afterRows = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(afterRows == beforeRows, "compaction changed table contents")
    // idempotent: compacting a compacted table is a no-op-shaped rewrite
    val (b2, a2) = Sinks.compact(spark, dir, targetFiles = 3)
    assert(b2 == after && a2 <= 3)
    assert(spark.read.parquet(dir).count() == 1000)
  }
}
