package graft.tools

import graft.Sessions
import graft.operators.BpeTrain

/** Scratch profiler for the 32k BPE arm: times the distributed
  * artifact stage and the driver merge loop separately (3 iterations,
  * run3 warm — the DebugPq convention). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val (words, wcnt) = BpeTrain.artifact(spark, dir, BpeTrain.M32, gram = 5)
      val t1 = System.nanoTime()
      val merges = BpeTrain.mergeLoop(words, wcnt, BpeTrain.V32, BpeTrain.T32)
      val t2 = System.nanoTime()
      println(f"run$i artifact=${(t1 - t0) / 1e9}%.3fs loop=${(t2 - t1) / 1e9}%.3fs merges=${merges.size} words=${words.length}")
    }
    spark.stop()
  }
}
