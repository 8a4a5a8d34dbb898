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

  test("HLL sketch merge is partition-invariant (associative register max)") {
    // the mergeability property the 100 TB tier rests on: HLL++
    // registers merge by element-wise max — commutative and
    // associative — so the estimate cannot depend on how the corpus
    // was partitioned or which executor merged first
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, "/root/testdata/sf0.01").select("user_id")
    val estimates = Seq(1, 3, 7, 16).map { n =>
      ev.repartition(n)
        .agg(Sketches.approxDistinct(col("user_id")).as("d"))
        .collect().head.getLong(0)
    }
    assert(estimates.distinct.size == 1,
      s"HLL estimate depends on partitioning: $estimates")
    val exact = ev.distinct().count().toDouble
    assert(math.abs(estimates.head - exact) / exact <= 0.15,
      s"HLL ${estimates.head} vs exact $exact")
  }

  test("quantile sketch keeps its rank-error guarantee under any partitioning") {
    // GK/KLL-style summaries are NOT bit-identical across merge orders
    // (unlike HLL); the contract that survives a distributed merge is
    // the rank-error bound — pin THAT across partition counts, at
    // every declared quantile
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, "/root/testdata/sf0.01").select("value")
    val qs = Seq(0.10, 0.25, 0.50, 0.75, 0.90, 0.99)
    val brackets = ev.agg(
      percentile(col("value"), lit(qs.map(q => math.max(q - 0.01, 0.0)).toArray)).as("lo"),
      percentile(col("value"), lit(qs.map(q => math.min(q + 0.01, 1.0)).toArray)).as("hi"))
      .collect().head
    val lo = brackets.getSeq[Double](0); val hi = brackets.getSeq[Double](1)
    for (n <- Seq(1, 4, 13)) {
      val pa = ev.repartition(n)
        .agg(percentile_approx(col("value"), lit(qs.toArray), lit(10000)).as("pa"))
        .collect().head.getSeq[Double](0)
      qs.indices.foreach { i =>
        assert(pa(i) >= lo(i) && pa(i) <= hi(i),
          s"n=$n q=${qs(i)}: ${pa(i)} outside [${lo(i)}, ${hi(i)}]")
      }
    }
  }

  test("Misra-Gries guarantees hold under every partitioning and merge order") {
    import spark.implicits._
    val k = 8
    // zipf-ish stream: item i appears ~N/i times — items 1..3 are
    // heavy at k=8, the tail forces constant shrinking
    val stream = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"item_$i"))
    val n = stream.length
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 2, 8, 32)) {
      val mg = spark.createDataset(stream).repartition(parts)
        .select(new graft.operators.Sketches.MisraGries(k).toColumn).head()
      assert(mg.size <= k, s"parts=$parts: ${mg.size} counters > k")
      for ((item, cnt) <- exact if cnt > n.toLong / (k + 1)) {
        assert(mg.contains(item), s"parts=$parts: heavy $item ($cnt) evicted")
        val est = mg(item)
        assert(est <= cnt, s"parts=$parts: $item overcounted $est > $cnt")
        assert(cnt - est <= n.toLong / (k + 1),
          s"parts=$parts: $item undercount ${cnt - est} > n/(k+1)")
      }
    }
    // adversarial all-distinct stream: nothing is heavy, the summary
    // must stay bounded and never throw
    val distinct = (1 to 5000).map(i => s"u_$i")
    val mg2 = spark.createDataset(distinct).repartition(16)
      .select(new graft.operators.Sketches.MisraGries(k).toColumn).head()
    assert(mg2.size <= k)
  }

  test("count-min is linear: identical matrix under every partitioning, never undercounts") {
    import spark.implicits._
    val (d, w) = (4, 64)
    val stream = (1 to 30).flatMap(i => Seq.fill(1000 / i)(s"item_$i"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val matrices = Seq(1, 2, 8, 32).map { parts =>
      spark.createDataset(stream).repartition(parts)
        .select(new Sketches.CountMin(d, w).toColumn).head()
    }
    // linearity: merge order CANNOT change the content, bit for bit
    for (m <- matrices.tail)
      assert(java.util.Arrays.equals(m, matrices.head),
        "CMS content depends on partitioning — linearity broken")
    val sk = matrices.head
    // every row's total equals the stream length (each add hits each row once)
    for (i <- 0 until d)
      assert(sk.slice(i * w, (i + 1) * w).sum == stream.length.toLong)
    // deterministic guarantee: estimates never undercount; and an
    // absent item's estimate is pure collision mass, bounded by e*N/w
    for ((item, cnt) <- exact)
      assert(Sketches.cmEstimate(sk, d, w, item) >= cnt, s"$item undercounted")
    val absent = Sketches.cmEstimate(sk, d, w, "never_seen")
    assert(absent <= math.ceil(math.E * stream.length / w).toLong,
      s"absent-item estimate $absent exceeds the eps bound")
  }
}
