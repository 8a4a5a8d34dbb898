package graft

import org.apache.spark.sql.Row

/** Semantics of the gap-fill family (q_locf / q_interpolate / q_acf)
  * beyond the oracle hash: the fill rules hold row-by-row against an
  * independent driver-side recomputation of each user's series. */
class GapFillSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def series(rows: Array[Row]): Map[Long, Seq[(String, Option[Double], Boolean)]] =
    rows.groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
      u -> rs.sortBy(_.getAs[String]("day")).toSeq.map(r =>
        (r.getAs[String]("day"),
         Option(r.get(r.fieldIndex(if (r.schema.fieldNames.contains("filled")) "filled" else "interp")))
           .map(_.asInstanceOf[Double]),
         r.getAs[Boolean]("was_observed")))
    }

  test("locf: every filled cell equals the most recent observed value; leading gaps stay null") {
    val rows = SparkEntry.queries("q_locf")(spark, dir).collect()
    assert(rows.nonEmpty)
    for ((u, s) <- series(rows)) {
      var lastObs: Option[Double] = None
      for ((day, filled, observed) <- s) {
        if (observed) {
          assert(filled.isDefined, s"user $u day $day observed but filled is null")
          lastObs = filled
        } else {
          assert(filled == lastObs,
            s"user $u day $day: filled=$filled but last observation was $lastObs")
        }
      }
    }
    // the fixture actually exercises both cases
    assert(rows.exists(r => !r.getAs[Boolean]("was_observed") && !r.isNullAt(r.fieldIndex("filled"))),
      "no carried-forward cell in the fixture")
    assert(rows.exists(r => !r.getAs[Boolean]("was_observed") && r.isNullAt(r.fieldIndex("filled"))),
      "no leading gap in the fixture")
  }

  test("interpolate: interior gaps lie on the straight line between their neighbors") {
    val rows = SparkEntry.queries("q_interpolate")(spark, dir).collect()
    assert(rows.nonEmpty)
    var interiorChecked = 0
    for ((u, s) <- series(rows)) {
      val obs = s.zipWithIndex.collect { case ((d, Some(v), true), i) => (i, d, v) }
      for (((i1, d1, v1), (i2, d2, v2)) <- obs.zip(obs.drop(1)); j <- (i1 + 1) until i2) {
        val (dj, vj, was) = s(j)
        assert(!was)
        val x  = java.time.LocalDate.parse(dj).toEpochDay.toDouble
        val x1 = java.time.LocalDate.parse(d1).toEpochDay.toDouble
        val x2 = java.time.LocalDate.parse(d2).toEpochDay.toDouble
        val expected = v1 + (v2 - v1) * ((x - x1) / (x2 - x1))
        assert(math.abs(vj.get - expected) < 1e-9,
          s"user $u day $dj: interp=${vj.get} expected=$expected (between $d1=$v1 and $d2=$v2)")
        interiorChecked += 1
      }
      // tail extension: everything after the last observation carries it
      obs.lastOption.foreach { case (iLast, _, vLast) =>
        for (j <- (iLast + 1) until s.size)
          assert(s(j)._2.contains(vLast), s"user $u tail cell ${s(j)._1} != $vLast")
      }
    }
    assert(interiorChecked > 0, "fixture has no interior gap — interpolation untested")
  }

  test("acf: lag-k pair counts match the series lengths; acf bounded by ~1") {
    val daily = SparkEntry.queries("q_acf")(spark, dir).collect()
    assert(daily.nonEmpty, "no user cleared the variance floor")
    for (r <- daily) {
      val acf = r.getAs[Double]("acf")
      // quantization can push a hair past 1; gross violations mean a
      // denominator mismatch
      assert(math.abs(acf) <= 1.001, s"acf out of range: $r")
    }
  }
}
