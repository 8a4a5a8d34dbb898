package graft

import org.apache.spark.sql.functions._
import graft.queries.{RetrievalQueries, StatQueries}

class StatRetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("corr stats agree with Spark's built-in corr/covar_pop") {
    val ours = StatQueries.qCorrStats(spark, dir)
      .select("event_type", "corr_xy", "cov_xy").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ref = Tables.events(spark, dir)
      .select(col("event_type"), hour(col("ts")).cast("double").as("x"), col("value").as("y"))
      .groupBy("event_type")
      .agg(corr(col("x"), col("y")).as("c"), covar_pop(col("x"), col("y")).as("cv"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet == ref.keySet)
    for ((k, (c, cv)) <- ours) {
      assert(math.abs(c - ref(k)._1) < 1e-9, s"$k corr: $c vs ${ref(k)._1}")
      assert(math.abs(cv - ref(k)._2) < 1e-9, s"$k covar: $cv vs ${ref(k)._2}")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("anomaly z-scores all exceed the threshold and use per-user stats") {
    val rows = StatQueries.qAnomalyZscore(spark, dir).collect()
    assert(rows.forall(r => math.abs(r.getAs[Double]("z")) > 2.5))
    // z recomputes from the reported mean/sd
    rows.foreach { r =>
      val z = (r.getAs[Double]("value") - r.getAs[Double]("mean")) / r.getAs[Double]("sd")
      assert(z == r.getAs[Double]("z"))
    }
  }

  test("morton interleave: hand-computed example and block totals") {
    // x=3 (bits 0,1 -> z bits 0,2 = 5), y=5 (bits 0,2 -> z bits 1,5 = 34)
    val z = spark.range(1)
      .select((
        (0 until 8).map { i =>
          (shiftleft(shiftright(lit(3L), i).bitwiseAND(lit(1L)), 2 * i)
            + shiftleft(shiftright(lit(5L), i).bitwiseAND(lit(1L)), 2 * i + 1))
        }.reduce(_ + _)).as("z")).head().getLong(0)
    assert(z == 39L)
    val blocks = StatQueries.qZorder(spark, dir).collect()
    assert(blocks.forall(r => r.getAs[Long]("block") >= 0 && r.getAs[Long]("block") < 64))
    val total = blocks.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, dir).count())
  }

  test("morton interleave is a bijection over the full 8-bit x 8-bit domain") {
    // every (x, y) in [0,255]^2 maps to a distinct key in [0, 65535] —
    // the property that makes the key a lossless cluster/sort column
    val keys = spark.range(65536)
      .select((col("id") % 256).as("xb"), (col("id") / 256).cast("long").as("yb"))
      .select((
        (0 until 8).map { i =>
          (shiftleft(shiftright(col("xb"), i).bitwiseAND(lit(1L)), 2 * i)
            + shiftleft(shiftright(col("yb"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        }.reduce(_ + _)).as("z"))
    assert(keys.distinct().count() == 65536L)
    val mm = keys.agg(min(col("z")), max(col("z"))).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 65535L)
  }

  test("hilbert transform is a bijection whose consecutive cells are grid-adjacent") {
    // bijection over the full 8-bit x 8-bit domain (the q_zorder morton
    // test's dual) plus THE Hilbert property: successive d values are
    // always one grid step apart — no quadrant jumps, which is exactly
    // why it beats Morton for range locality
    // the transform consumes x/y (rotation state) — carry the ORIGINAL
    // coordinates along as passengers for the adjacency check
    val dom = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .withColumn("ox", col("x")).withColumn("oy", col("y"))
    val keyed = StatQueries.hilbertKey(dom, Seq("ox", "oy"))
    assert(keyed.select("d").distinct().count() == 65536L)
    val mm = keyed.agg(min(col("d")), max(col("d"))).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 65535L)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
    val jumps = keyed
      .withColumn("px", lag(col("ox"), 1).over(w))
      .withColumn("py", lag(col("oy"), 1).over(w))
      .where(col("px").isNotNull &&
        abs(col("ox") - col("px")) + abs(col("oy") - col("py")) =!= 1)
      .count()
    assert(jumps == 0L, s"$jumps consecutive-d pairs are not grid neighbours")
    // and the declared query's blocks tile the corpus
    val blocks = StatQueries.qHilbert(spark, dir).collect()
    assert(blocks.map(_.getAs[Long]("n")).sum == Tables.events(spark, dir).count())
    assert(blocks.forall(r => r.getAs[Long]("block") >= 0 && r.getAs[Long]("block") < 64))
  }

  test("tfidf returns exactly one deterministic top term per tokenized doc") {
    val out = RetrievalQueries.qTfidf(spark, dir)
    val nDocs = Tables.documents(spark, dir)
      .where(size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")) > 0).count()
    assert(out.count() == nDocs)
    assert(out.groupBy("doc_id").count().where(col("count") > 1).count() == 0)
    assert(out.where(col("score") <= 0).count() == 0)
  }

  test("bm25 yields 20 rows in strictly descending (score, doc_id) order") {
    val rows = RetrievalQueries.qBm25(spark, dir).collect()
      .map(r => (r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    assert(rows.length == 20)
    rows.sliding(2).foreach { case Array((s1, d1), (s2, d2)) =>
      assert(s1 > s2 || (s1 == s2 && d1 < d2), s"order violated: ($s1,$d1) then ($s2,$d2)")
    }
    assert(rows.forall(_._1 > 0.0))
  }

  test("unigram typicality is a probability-mean: bounded and count-consistent") {
    val rows = RetrievalQueries.qUnigramTypicality(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("typicality")
      assert(t > 0.0 && t < 1.0, s"typicality out of range: $t")
    }
    // token counts agree with an independent tokenization
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = Tables.documents(spark, dir)
      .select(size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(total == expected)
  }

  test("incremental dedup: no survivor's hash exists in the corpus half") {
    val docs = Tables.documents(spark, dir).withColumn("h", md5(col("text")))
    val corpusHashes = docs.where(pmod(col("doc_id"), lit(2L)) === 0)
      .select("h").distinct().collect().map(_.getString(0)).toSet
    val out = RetrievalQueries.qDedupIncremental(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !corpusHashes.contains(r.getAs[String]("content_hash"))))
    // survivors are unique per hash and come from the odd (batch) half
    assert(out.map(_.getAs[String]("content_hash")).distinct.length == out.length)
    assert(out.forall(_.getAs[Long]("doc_id") % 2 == 1))
  }

  test("grouped OLS agrees with Spark's built-in regr_slope/intercept/r2") {
    val ours = StatQueries.qOlsByGroup(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"), r.getAs[Double]("r2"))).toMap
    val ref = Tables.events(spark, dir)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01"))).cast("double").as("x"),
        col("value").as("y"))
      .groupBy("event_type")
      .agg(regr_slope(col("y"), col("x")).as("s"),
        regr_intercept(col("y"), col("x")).as("i"),
        regr_r2(col("y"), col("x")).as("r"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(ours.keySet == ref.keySet)
    for ((k, (s, i, r2)) <- ours) {
      assert(math.abs(s - ref(k)._1) < 1e-6, s"$k slope: $s vs ${ref(k)._1}")
      assert(math.abs(i - ref(k)._2) < 1e-3, s"$k intercept: $i vs ${ref(k)._2}")
      assert(math.abs(r2 - ref(k)._3) < 1e-6, s"$k r2: $r2 vs ${ref(k)._3}")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("AUC matches a naive global-window rank computation and is bounded") {
    import org.apache.spark.sql.expressions.Window
    val ours = StatQueries.qAuc(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("auc")).toMap
    // naive reference: partition-less rank window (fine on the tiny spec
    // fixture; the engine path must never do this — that's the point)
    val ranked = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("value"), col("event_id"))).cast("long"))
    val nAll = ranked.count()
    val ref = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("np"), sum("rk").as("rs"))
      .collect().map { r =>
        val (np, rs) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
        r.getString(0) -> (rs - np * (np + 1.0) / 2.0) / (np * (nAll - np))
      }.toMap
    assert(ours.keySet == ref.keySet)
    for ((k, a) <- ours) {
      assert(a == ref(k), s"$k auc: $a vs ${ref(k)}")
      assert(a > 0.0 && a < 1.0)
    }
  }

  test("bigram LM: negative log-probs, bigram counts reconcile with token arrays") {
    val out = graft.queries.TextQueries.qBigramLm(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("avg_logp") < 0.0))
    val total = out.map(_.getAs[Long]("n_bigrams")).sum
    val expected = Tables.documents(spark, dir)
      .select(size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("n"))
      .where(col("n") >= 2)
      .agg(sum(col("n") - 1)).head().getLong(0)
    assert(total == expected, s"bigram total $total vs $expected")
  }

  test("retrieval eval: ndcg/p@10 bounded and consistent with the rrf recall gate") {
    val out = RetrievalQueries.qRetrievalEval(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("n_rel_ret"), r.getAs[Double]("p_at_10"),
          r.getAs[Double]("rr"), r.getAs[Double]("ndcg"))).toMap
    assert(out.size == 5)
    for ((q, (n, p, rr, ndcg)) <- out) {
      assert(p == n / 10.0, s"$q p@10 inconsistent")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"$q ndcg out of range: $ndcg")
      assert(rr >= 0.0 && rr <= 1.0, s"$q rr out of range: $rr")
      assert((n == 0) == (rr == 0.0), s"$q rr/n_rel_ret disagree")
    }
    val recall = RetrievalQueries.qRrfRecall(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("n_common")).toMap
    // same (fused ∩ cosine-top-10) membership on both paths
    for ((q, n) <- recall) assert(out(q)._1 == n, s"$q n_rel_ret vs n_common")
  }

  test("MMR re-rank matches an independent JVM greedy recomputation") {
    val out = RetrievalQueries.qMmrRerank(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("pick_order"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("mmrq")))
    assert(out.length == 20) // 5 qids x 4 picks
    // rebuild candidates + pairwise sims straight from the vectors
    val vecs = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      // same sequential fold as VectorOps.cosine
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for (qid <- 0L until 5L) {
      val qe = vecs(qid)
      val cand = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, math.floor(cos(qe, v) * 1e9).toLong) }
        .sortBy(t => (-t._2, t._1)).take(8)
      var sel = List.empty[Long]
      val expected = (1 to 4).map { t =>
        val scored = cand.filterNot(c => sel.contains(c._1)).map { case (id, relq) =>
          val pen = if (sel.isEmpty) 0L
            else sel.map(s => math.floor(cos(vecs(id), vecs(s)) * 1e9).toLong).max
          (id, 7L * relq - 3L * pen)
        }
        val (id, mmrq) = scored.minBy(t2 => (-t2._2, t2._1))
        sel = sel :+ id
        (qid, t, id, mmrq)
      }
      val got = out.filter(_._1 == qid).sortBy(_._2).toSeq
      assert(got == expected, s"qid $qid: $got vs $expected")
    }
  }

  test("AUC is 1.0 / 0.5-ish on a constructed separable/random fixture") {
    import spark.implicits._
    // separable: every positive outranks every negative → tie-free AUC 1
    val df = (1 to 50).map(i => (i.toLong, if (i > 25) "pos" else "neg",
      if (i > 25) 100.0 + i else i.toDouble)).toDF("event_id", "event_type", "value")
    val ranked = graft.operators.ScaleOps.globalRank(
      df, Seq(col("value"), col("event_id")), "rk")
    val rs = ranked.where(col("event_type") === "pos")
      .agg(sum("rk")).head().getLong(0).toDouble
    val auc = (rs - 25.0 * 26.0 / 2.0) / (25.0 * 25.0)
    assert(auc == 1.0)
  }
}
