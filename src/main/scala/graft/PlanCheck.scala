package graft

/** Dumps formatted physical plans for representative queries so plan
  * quality is reviewable: filter/projection pushdown reaching the
  * parquet scan (PushedFilters / ReadSchema), dimension broadcasts,
  * and whole-stage codegen spans. Run:
  *   sbt "runMain graft.PlanCheck [sfDir]"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val interesting = Seq(
      "q1_agg",              // filter + partial agg pushdown
      "q_filter_predicates", // compound predicate pushdown
      "q_join_star",         // broadcast dims vs shuffled fact join
      "q_asof_nearest",      // range-bounded join + window
      "q_cosine_topk_native",// native expression inside codegen
      "q_minhash_lsh",       // shingle explode + band join
      "q_tpch_q3",           // multi-join + TakeOrderedAndProject
      "q_pq_search",         // broadcast codebook/LUT, no cartesian
      "q_funnel",            // staged user-keyed joins
      "q_decontaminate",     // broadcast benchmark shingle set
    )
    for (name <- interesting) {
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
