package graft

import org.apache.spark.sql.functions._

/** Properties of the wave-3 analytics queries beyond the oracle hash:
  * CV models reconcile with direct refits, density clusters conserve
  * points, hashed features reconcile with token counts. */
class AnalyticsQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kfold OLS: each fold model equals a direct refit on its complement") {
    val out = SparkEntry.queries("q_kfold_ols")(spark, dir).collect()
      .map(r => r.getAs[Int]("fold") ->
        (r.getAs[Long]("n_train"), r.getAs[Long]("n_test"),
          r.getAs[Double]("slope"), r.getAs[Double]("mse"))).toMap
    assert(out.size == 5)
    val ev = Tables.events(spark, dir).select(
      pmod(graft.operators.PipelineOps
        .hexDigit("concat('cv|', cast(event_id AS string))", 1), lit(5)).as("fold"),
      datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
        .cast("double").as("x"),
      col("value").as("y"))
    val n = ev.count()
    for ((fold, (nTrain, nTest, slope, mse)) <- out) {
      assert(nTrain + nTest == n, s"fold $fold sizes don't partition")
      assert(mse > 0.0)
      // complement refit via Spark's built-in regression aggregate
      val direct = ev.where(col("fold") =!= fold)
        .agg(regr_slope(col("y"), col("x"))).head().getDouble(0)
      assert(math.abs(slope - direct) < 1e-6,
        s"fold $fold slope $slope vs direct $direct")
    }
  }

  test("density clustering conserves points and separates a noise row") {
    val rows = SparkEntry.queries("q_density_cluster")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_rep"), r.getAs[Long]("n_cells"),
        r.getAs[Long]("n_points")))
    val total = Tables.embeddings(spark, dir).count()
    assert(rows.map(_._3).sum == total, "cluster + noise points must partition the corpus")
    assert(rows.count(_._1 == -1L) == 1, "exactly one noise row")
    val clusters = rows.filter(_._1 != -1L)
    assert(clusters.nonEmpty, "no dense region found — knobs off for the fixture")
    // every cluster rep is one of its own member cells' encoded ids
    assert(clusters.forall(_._2 >= 1))
  }

  test("density clustering separates two synthetic blobs via the same cell-CC path") {
    import spark.implicits._
    // two tight blobs far apart on the grid + sparse scatter between
    val blob1 = (1 to 30).map(i => (0.01 + (i % 3) * 0.001, 0.01))
    val blob2 = (1 to 30).map(i => (0.91 + (i % 3) * 0.001, 0.91))
    val scatter = (1 to 5).map(i => (0.4 + i * 0.07, 0.5))
    val pts = (blob1 ++ blob2 ++ scatter).toDF("x", "y")
      .select(floor(col("x") / lit(0.05)).cast("long").as("cx"),
        floor(col("y") / lit(0.05)).cast("long").as("cy"))
    val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
    val dense = cells.where(col("n") >= 8)
      .withColumn("cid", (col("cx") + 1000L) * 2000L + (col("cy") + 1000L))
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
      (1, -1), (1, 0), (1, 1)).toDF("dx", "dy")
    val edges = dense.crossJoin(broadcast(offs))
      .select((col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"),
        col("cid").as("src"))
      .join(dense.select(col("cx"), col("cy"), col("cid").as("dst")), Seq("cx", "cy"))
    val lbls = graft.operators.GraphOps.connectedComponents(edges, "src", "dst")
      .select("lbl").distinct().count()
    assert(lbls == 2, s"expected the two blobs as two components, got $lbls")
  }

  test("markov transitions: rows normalize to 1, counts reconcile with sequences") {
    val out = SparkEntry.queries("q_markov_transitions")(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"), r.getAs[Long]("n_from"), r.getAs[Double]("p")))
    assert(out.nonEmpty)
    for ((from, rows) <- out.groupBy(_._1)) {
      assert(rows.map(_._3).sum == rows.head._4, s"$from: n_from inconsistent")
      val psum = rows.map(_._5).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"$from: row sums to $psum")
    }
    // every user contributes (events - 1) transitions
    val ev = Tables.events(spark, dir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(out.map(_._3).sum == expected)
  }

  test("retention: offset-0 diagonal counts every user exactly once") {
    val out = SparkEntry.queries("q_retention")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("weeks_since"),
        r.getAs[Long]("n_users")))
    assert(out.forall(_._2 >= 0))
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(out.filter(_._2 == 0L).map(_._3).sum == users,
      "every user appears in their own cohort's week 0")
    // retention can only shrink relative to the cohort size
    for ((cohort, rows) <- out.groupBy(_._1)) {
      val base = rows.find(_._2 == 0L).map(_._3).getOrElse(0L)
      assert(rows.forall(_._3 <= base), s"cohort $cohort retains more than it started with")
    }
  }

  test("equi-depth buckets differ by at most one row and are value-ordered") {
    val out = SparkEntry.queries("q_equidepth")(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n"),
        r.getAs[Double]("min_v"), r.getAs[Double]("max_v")))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 8L).toSeq)
    assert(out.map(_._2).sum == Tables.events(spark, dir).count())
    assert(out.map(_._2).max - out.map(_._2).min <= 1, "equi-depth violated")
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._4, s"bucket ${b._1} overlaps ${a._1}")
    }
  }

  test("feature hashing reconciles with token counts, sign parity holds") {
    val out = graft.queries.TextQueries.qFeatureHash(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket"),
        r.getAs[Long]("cnt"), r.getAs[Long]("fval")))
    assert(out.forall(t => t._2 >= 0 && t._2 < 16))
    assert(out.forall(t => math.abs(t._4) <= t._3), "|signed sum| cannot exceed count")
    assert(out.forall(t => ((t._4 - t._3) % 2 + 2) % 2 == 0),
      "fval and cnt must share parity (each token contributes ±1)")
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expected = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    for ((d, cnt) <- perDoc) assert(cnt == expected(d), s"doc $d token count drifted")
  }
}
