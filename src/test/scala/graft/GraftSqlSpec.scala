package graft

class GraftSqlSpec extends SparkSpec {

  test("SQL facade reaches tables, injected functions, and index expression strings") {
    GraftSql.register(spark, "/root/testdata/sf0.001")
    // plain SQL over the registered views
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()(0).getLong(0)
    assert(n > 5000)
    // injected native function usable from SQL
    val c = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, a.embedding) AS self
        |FROM embeddings a LIMIT 5""".stripMargin).collect()
    assert(c.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12)) // sqrt(x)*sqrt(x) is 1 ulp off x
    // the vegetation-index formula strings paste straight into SQL
    val ndvi = graft.functions.VegIndices
      .formulas("1.0", "1.0", "l_discount * 100 + 1", "1.0",
        "l_quantity + 1", "1.0", "1.0").toMap.apply("ndvi")
    val r = spark.sql(s"SELECT max($ndvi) AS m FROM lineitem").collect()(0).getDouble(0)
    assert(r <= 1.0 && r >= -1.0)
  }
}
