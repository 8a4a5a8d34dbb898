package graft

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("sketch tier tracks exact answers within advertised error") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val cal = Sketches.calibrate(ev, "event_type", "value", "user_id").collect()
    assert(cal.nonEmpty)
    cal.foreach { r =>
      val exactD = r.getAs[Long]("exact_distinct").toDouble
      val approxD = r.getAs[Long]("approx_distinct").toDouble
      assert(math.abs(approxD - exactD) / exactD <= 0.15,
        s"${r.get(0)}: distinct approx $approxD vs $exactD")
      val exactP = r.getAs[Double]("exact_p50")
      val approxP = r.getAs[Double]("approx_p50")
      // percentile_approx returns a real data value near the true median
      assert(math.abs(approxP - exactP) / math.max(exactP, 1.0) <= 0.05,
        s"${r.get(0)}: p50 approx $approxP vs $exactP")
    }
  }
}
