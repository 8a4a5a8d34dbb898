package graft

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Harness constraints this file is shaped around:
  *
  *  - The driver captures only the LAST ~2,000 chars of stdout, and
  *    sbt's `[success] Total time...` line eats ~70 of them. A full
  *    per-query map for ~100 queries is >2 KB even at integer-ms
  *    precision, so the printed line carries the TOTAL plus the
  *    slowest queries only, size-capped at 1,500 chars, and the
  *    complete full-precision map is written to `BENCH_DETAIL.json`
  *    in the working directory. The JSON line is the LAST thing
  *    printed before exit so the tail capture always contains it.
  *  - Single-shot timings on a shared box are position-noisy: with
  *    zero code change between rounds, individual queries have been
  *    observed to swing 4x in either direction, and min-of-2 *within
  *    one pass* does not suppress it (the two runs share the noisy
  *    window). So the bench makes TWO full passes over all queries
  *    and reports the per-query minimum across passes — a slow
  *    window during pass 1 is recovered by pass 2 landing elsewhere.
  *
  * A warmup query runs first (untimed) so the first measured query
  * doesn't absorb JVM/codegen/session startup; queries run in sorted
  * name order within each pass so numbers are comparable across
  * rounds. A query that throws is reported as -1 (never as a
  * normal-looking timing) and listed in an "errors" map so
  * regressions can't hide in the output.
  */
object Bench {
  private val MaxLineChars = 1500

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    require(SparkEntry.queries.contains("q1_agg"), "warmup query q1_agg is not declared")
    // warmup: a representative agg touches parquet read + shuffle + codegen paths
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    def pass(qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)]):
        Map[String, (Double, Option[String])] = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      name -> (((System.nanoTime() - t0) / 1e9, err))
    }.toMap
    // pass 2 runs in REVERSE order: external noise on a shared box
    // arrives in contiguous TIME windows, which under a repeated
    // ordering hit the same alphabetical neighbourhood twice — the
    // per-query min then can't suppress it (observed: a steal-time
    // window inflating the same queries 10-30x in both passes).
    // Opposite orderings make the two passes' noise windows cover
    // disjoint query sets, so min-of-passes recovers the true timing.
    val p1 = pass(ordered)
    val p2 = pass(ordered.reverse)
    // per-query min ACROSS the two passes; a run that errored never
    // contributes a timing, and a query only counts as errored if it
    // failed in BOTH passes (a transient blip must not mask success)
    val results: Seq[(String, Double, Option[String])] = ordered.map { case (name, _) =>
      val (t1, e1) = p1(name); val (t2, e2) = p2(name)
      (e1, e2) match {
        case (Some(x), Some(_)) => (name, -1.0, Some(x))
        case (Some(_), None)    => (name, t2, None)
        case (None, Some(_))    => (name, t1, None)
        case (None, None)       => (name, math.min(t1, t2), None)
      }
    }
    val total = results.collect { case (_, v, None) => v }.sum

    def sec3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def msInt(v: Double): Long = math.round(v * 1000)

    // full-precision detail file: every query, both raw pass timings
    val detail = results.map { case (k, v, err) =>
      val raw1 = sec3(p1(k)._1); val raw2 = sec3(p2(k)._1)
      s""""$k":{"sec":${if (err.isDefined) "-1" else sec3(v)},"p1":$raw1,"p2":$raw2${err.map(e => s""","err":"$e"""").getOrElse("")}}"""
    }.mkString("{", ",", "}")
    val detailJson =
      s"""{"metric":"total","value":${sec3(total)},"unit":"sec","nq":${results.size},"queries":$detail,"sf":"$sfDir"}"""
    val detailPath = java.nio.file.Paths.get("BENCH_DETAIL.json")
    try java.nio.file.Files.write(detailPath, (detailJson + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // detail file is best-effort; the stdout line is the contract

    // printed line: errors first (must never be hidden), then queries
    // slowest-first, keys with the uniform "q_" prefix stripped and
    // values in integer ms, truncated so the line stays parseable
    // inside the driver's 2,000-char tail capture
    def key(n: String): String = if (n.startsWith("q_")) n.drop(2) else n
    val errEntries = results.collect { case (k, _, Some(_)) => s""""${key(k)}":-1""" }
    val okEntries = results.collect { case (k, v, None) => (k, v) }
      .sortBy { case (_, v) => -v }
      .map { case (k, v) => s""""${key(k)}":${msInt(v)}""" }
    val errs = results.collect { case (k, _, Some(e)) => s""""${key(k)}":"$e"""" }
      .mkString("{", ",", "}")
    def assemble(entries: Seq[String]): String = {
      val qs = entries.mkString("{", ",", "}")
      s"""{"metric":"total","value":${sec3(total)},"unit":"sec","nq":${results.size},"qunit":"ms","queries":$qs,"errors":$errs,"detail":"BENCH_DETAIL.json","sf":"$sfDir"}"""
    }
    val all = errEntries ++ okEntries
    // largest prefix of (errors ++ slowest-first timings) that fits
    var n = all.size
    while (n > 0 && assemble(all.take(n)).length > MaxLineChars) n -= 1
    val line = assemble(all.take(n))

    spark.stop()
    // LAST stdout line before exit — nothing may print after this
    println(line)
  }
}
