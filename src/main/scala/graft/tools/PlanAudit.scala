package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round plan auditor: dumps `.explain("formatted")` for
  * every declared query to `<outDir>/<name>_<suffix>.txt` and prints a
  * one-line plan-shape summary per query (Exchange count, join
  * strategies, scans whose PushedFilters is empty, codegen span
  * count) so plan regressions and shuffle-heavy queries are grep-able.
  *
  * Construction runs each query's driver loop (iterative operators
  * build inside the call), so a full sweep at sf0.1 costs roughly one
  * bench pass; narrow with SPARK_GRAFT_PLAN_ONLY=q_a,q_b for iteration.
  *
  *   sbt "runMain graft.tools.PlanAudit [sfDir] [outDir] [suffix]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r19"
    val suffix = if (args.length > 2) args(2) else "before"
    val only = sys.env.get("SPARK_GRAFT_PLAN_ONLY").map(_.split(",").toSet)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val line = try {
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          val buildSec = (System.nanoTime() - t0) / 1e9
          val plan = df.queryExecution.explainString(mode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          // formatted mode prints each operator exactly once as a
          // "(n) Name" detail header — count those, not the tree lines
          def count(tok: String): Int = s"\\(\\d+\\) $tok".r.findAllIn(plan).length
          val bcast = count("BroadcastExchange")
          val shuf = count("Exchange\\b")
          val smj = count("SortMergeJoin")
          val bhj = count("BroadcastHashJoin")
          val shj = count("ShuffledHashJoin")
          val cart = count("CartesianProduct")
          val bnlj = count("BroadcastNestedLoopJoin")
          val scans = count("Scan parquet") + count("BatchScan")
          val emptyPush = "PushedFilters: \\[\\]".r.findAllIn(plan).length
          val wsc = "WholeStageCodegen".r.findAllIn(plan).length
          f"$name%-28s build=${buildSec}%6.2fs shufEx=$shuf bcast=$bcast SMJ=$smj BHJ=$bhj SHJ=$shj cart=$cart bnlj=$bnlj scans=$scans noPush=$emptyPush wsc=$wsc"
        } catch {
          case e: Throwable => f"$name%-28s ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
        }
        println(line)
        line
      }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, s"_summary_$suffix.txt"),
      rows.mkString("", "\n", "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
