package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {

  test("bucketed tables join without an exchange on either side") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val a = ev.select(col("user_id"), col("value"))
    val b = ev.select(col("user_id"), col("event_type"))
    ScaleOps.bucketize(spark, a, "bk_a", "user_id", 8)
    ScaleOps.bucketize(spark, b, "bk_b", "user_id", 8)
    val joined = spark.table("bk_a").join(spark.table("bk_b"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    val expected = ev.groupBy("user_id").count()
      .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
    assert(joined.count() == expected)
  }

  test("partition-offset deterministic shuffle matches a global-window reference") {
    // the semantics pin: the engine path (range partition + local sort +
    // partition-offset rank) must equal one global ROW_NUMBER over the
    // same (md5 key, id) total order — the form the declared queries'
    // DuckDB oracle states
    val dir = "/root/testdata/sf0.001"
    val bounded = Tables.events(spark, dir)
      .filter(col("event_id") < 300).select("event_id")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(concat(lit("seed42|"), col("event_id"))), col("event_id"))
    val reference = bounded
      .withColumn("shuffle_rank", row_number().over(w).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val engine = ScaleOps.deterministicShuffle(bounded, "event_id", "seed42",
        numPartitions = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(engine == reference,
      s"engine path diverges from window reference: ${(engine diff reference).take(5)}")
  }

  test("deterministic shuffle is partition-count-invariant and a full permutation corpus-wide") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001").select("event_id")
    val n = ev.count()
    val a = ScaleOps.deterministicShuffle(ev, "event_id", "seed42", numPartitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = ScaleOps.deterministicShuffle(ev, "event_id", "seed42", numPartitions = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b, "rank depends on partition count")
    assert(a.map(_._2).sorted == (1L to n), "ranks are not a permutation of 1..N")
  }

  test("deterministic shuffle plans no partition-less window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    val ev = Tables.events(spark, "/root/testdata/sf0.001").select("event_id")
    val df = ScaleOps.deterministicShuffle(ev, "event_id", "seed42")
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty)
  }

  test("salted join returns exactly the plain join's rows under skew") {
    import spark.implicits._
    // heavily skewed: 90% of left rows share one key
    val left = (1 to 1000).map(i => (if (i <= 900) 7L else i.toLong, i)).toDF("k", "lv")
    val right = Seq((7L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = ScaleOps.saltedInnerJoin(left, right, "k", salt = 8,
        probeSalt = org.apache.spark.sql.functions.col("lv"))
      .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }
}
