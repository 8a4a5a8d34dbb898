package graft.tools

import org.apache.spark.sql.functions._

/** Regenerates the golden parquet fixtures that oracle the two
  * transformer-inference queries (see [[graft.queries.EncoderQueries]]
  * — the non-ANSI-SQL pair graded by fixture pin instead of a
  * recomputing oracle). Run after ANY intentional change to
  * TinyEncoder/TinyDecoder math, the series assembly, or the
  * quantization scale:
  *
  *   sbt "runMain graft.tools.FixtureGen"
  *
  * then commit `tools/fixtures/`. An UNINTENTIONAL output change
  * surfaces as a hash fail against the stale fixture — exactly the
  * regression the pin exists to catch.
  *
  * The encoder fixture unions all three scale factors' outputs, each
  * row tagged with its corpus's distinct-user count (15/150/1500 —
  * unique per sf) so one file serves whichever sf the driver grades;
  * the MAE fixture's input is the dir-independent ObservationsGen, so
  * a single row set serves every sf.
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val out = "tools/fixtures"
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val enc = sfs.map { dir =>
      val nUsers = graft.Tables.events(spark, dir)
        .agg(countDistinct(col("user_id"))).head.getLong(0)
      graft.queries.EncoderQueries.qEncoderEmbed(spark, dir)
        .withColumn("n_users", lit(nUsers))
    }.reduce(_ unionByName _)
    enc.coalesce(1).write.mode("overwrite").parquet(s"$out/q_encoder_embed")
    graft.queries.EncoderQueries.qMaeReconstruct(spark, sfs.head)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q_mae_reconstruct")
    spark.stop()
  }
}
