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

  test("salted join returns exactly the plain join's rows under skew") {
    import spark.implicits._
    // heavily skewed: 90% of left rows share one key
    val left = (1 to 1000).map(i => (if (i <= 900) 7L else i.toLong, i)).toDF("k", "lv")
    val right = Seq((7L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = ScaleOps.saltedInnerJoin(left, right, "k", salt = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }
}
