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
}
