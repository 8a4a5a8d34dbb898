package graft.tools

import graft.{Sessions, SparkEntry}

/** Scratch timing/explain driver — not part of the library surface. */
object DebugPq {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_pq_search")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    for (i <- 1 to 3) {
      // construction INSIDE the timer: iterative operators (CC) run
      // their driver loop while the query is being built
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(s"run$i rows=$n took=${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
