package graft

import org.apache.spark.sql.functions._

/** Small literal-coverage checks for SURVEY rows whose Spark form is a
  * single built-in: regex column selection (`select('SR_B.')`,
  * monthly.py:384) and cross-band max/min reduce
  * (`reduce(ee.Reducer.max())`, monthly.py:635). */
class RelationalMiscSpec extends SparkSpec {

  test("colRegex selects band columns by pattern") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val cols = li.select(li.colRegex("`^l_s.*`")).columns.toSeq
    assert(cols.sorted == Seq("l_shipdate", "l_suppkey"))
  }

  test("greatest/least reduce across band columns with null tolerance") {
    import spark.implicits._
    val df = Seq((1.0, 5.0, 3.0), (9.0, 2.0, 7.0)).toDF("b1", "b2", "b3")
    val out = df.select(
      greatest(col("b1"), col("b2"), col("b3")).as("mx"),
      least(col("b1"), col("b2"), col("b3")).as("mn")).collect()
    assert(out(0).getDouble(0) == 5.0 && out(0).getDouble(1) == 1.0)
    assert(out(1).getDouble(0) == 9.0 && out(1).getDouble(1) == 2.0)
    // greatest skips NULLs (EE reducers skip masked pixels)
    val withNull = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
      .select(greatest(col("a"), col("b")).as("g")).collect()
    assert(withNull(0).getDouble(0) == 1.0)
  }
}
