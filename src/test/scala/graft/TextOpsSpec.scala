package graft

import graft.operators.TextOps

/** The df cap on the Jaccard shingle index must actually bound hot
  * shingles: on a corpus where every document shares one ubiquitous
  * 3-gram, the uncapped inverted-index join fans out to all O(n²)
  * pairs, while the capped join only pairs documents sharing RARE
  * shingles. (The parquet fixture corpus never exceeds df 25, so
  * this constructed fixture is where the cap's behavior is provable.) */
class TextOpsSpec extends SparkSpec {

  private def hotCorpus = {
    import spark.implicits._
    // 20 docs sharing the boilerplate header 3-gram; only docs 0 and 1
    // also share real content
    val header = "terms of service"
    (0 until 20).map { i =>
      val body = if (i < 2) "alpha beta gamma delta" else s"unique$i body$i text$i tail$i"
      (i.toLong, s"$header $body")
    }.toDF("doc_id", "text")
  }

  test("uncapped join pairs every document through the hot shingle") {
    val pairs = TextOps.jaccardPairs(hotCorpus, "doc_id", "text",
      maxDf = 1000, minJaccard = 0.0)
    assert(pairs.count() == 20L * 19 / 2, "hot shingle should produce all pairs")
  }

  test("df cap removes the hot shingle: only true content overlaps remain") {
    val pairs = TextOps.jaccardPairs(hotCorpus, "doc_id", "text",
      maxDf = 10, minJaccard = 0.0)
    val got = pairs.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)), s"expected only the real near-dup pair, got $got")
  }

  test("cap is semantics-neutral when nothing exceeds it") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val capped = TextOps.jaccardPairs(docs, "doc_id", "text").collect().map(_.toString).sorted
    val loose = TextOps.jaccardPairs(docs, "doc_id", "text", maxDf = 1000000)
      .collect().map(_.toString).sorted
    assert(capped.toSeq == loose.toSeq)
  }

  test("bpe apply: symbol counts contract monotonically and round 2 recounts") {
    val out = graft.queries.TextQueries.qBpeApply(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val (m1, c1) = (out.head.getAs[String]("m1"), out.head.getAs[Long]("c1"))
    val (m2, c2) = (out.head.getAs[String]("m2"), out.head.getAs[Long]("c2"))
    assert(m1.length == 2 && m2.length == 2)
    assert(m1 != m2, "round 2 re-picked the collapsed pair")
    assert(c1 >= c2, "round 1 winner must be the global max")
    out.foreach { r =>
      val (s0, s1, s2) = (r.getAs[Long]("sym0"), r.getAs[Long]("sym1"), r.getAs[Long]("sym2"))
      assert(s0 >= s1 && s1 >= s2, s"doc ${r.get(0)}: $s0 -> $s1 -> $s2 not monotone")
    }
    // the corpus as a whole must actually compress in both rounds
    assert(out.map(_.getAs[Long]("sym0")).sum > out.map(_.getAs[Long]("sym1")).sum)
    assert(out.map(_.getAs[Long]("sym1")).sum > out.map(_.getAs[Long]("sym2")).sum)
  }
}
