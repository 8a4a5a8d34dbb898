package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Runnable demonstration of the streaming surface: landing-zone file
  * ingest with exactly-once checkpointing (the reference's idempotent
  * tif→npy Cloud Function, dataops/main.py:24-43), driven to
  * completion three times to show no-reprocessing semantics. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    import spark.implicits._
    val src = Files.createTempDirectory("graft_demo_src").toString
    val dest = Files.createTempDirectory("graft_demo_dest").toString
    val ckpt = Files.createTempDirectory("graft_demo_ckpt").toString
    val sch = Seq((1L, 100.0)).toDF("id", "value").schema

    Seq((1L, 100.0), (2L, 250.0)).toDF("id", "value").write.mode("append").parquet(src)
    streaming.StreamingPipelines.fileIngest(spark, sch, src, dest, ckpt).awaitTermination()
    println(s"ingest1 rows=${spark.read.parquet(dest).count()}")

    streaming.StreamingPipelines.fileIngest(spark, sch, src, dest, ckpt).awaitTermination()
    println(s"ingest2 rows=${spark.read.parquet(dest).count()} (unchanged = exactly-once)")

    Seq((3L, 50.0)).toDF("id", "value").write.mode("append").parquet(src)
    streaming.StreamingPipelines.fileIngest(spark, sch, src, dest, ckpt).awaitTermination()
    val out = spark.read.parquet(dest)
    println(s"ingest3 rows=${out.count()} norm05=${out.filter(col("norm_value") === 0.5).count()}")
    spark.stop()
  }
}
