package graft

import org.apache.spark.sql.functions._

/** Properties of the full BPE train beyond the oracle hash: the
  * compression trajectory is strictly monotone, merge frequencies are
  * non-increasing (a merge can only create pairs rarer than itself),
  * the merge table + final vocab form a CONSISTENT tokenizer (every
  * trained symbol string expands losslessly back to its source word),
  * and the re-tokenized corpus totals reconcile exactly with the
  * trajectory's final point. */
class BpeTrainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val merges = SparkEntry.queries("q_bpe_train")(spark, dir)
    .orderBy(col("merge_idx")).collect()
    .map(r => (r.getAs[Int]("merge_idx"), r.getAs[Int]("lhs_code"),
      r.getAs[Int]("rhs_code"), r.getAs[Long]("pair_count"),
      r.getAs[Long]("total_syms")))

  test("merge indices are 1..n with no gaps; codes are letters or earlier sentinels") {
    assert(merges.nonEmpty)
    assert(merges.map(_._1).toSeq == (1 to merges.length))
    for ((idx, lhs, rhs, _, _) <- merges; code <- Seq(lhs, rhs))
      assert((code >= 'a'.toInt && code <= 'z'.toInt) ||
        (code >= 1 && code < idx),
        s"merge $idx references invalid symbol $code")
  }

  test("compression is strictly monotone and merge counts non-increasing") {
    val totals = merges.map(_._5)
    assert(totals.zip(totals.tail).forall { case (a, b) => b < a },
      "total_syms must strictly decrease every round")
    val counts = merges.map(_._4)
    assert(counts.forall(_ > 0))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      "pair_count must be non-increasing across rounds")
  }

  test("final vocab expands losslessly back to the source words") {
    // expansion map: letters expand to themselves; sentinel i expands
    // to exp(lhs) + exp(rhs) of merge i (well-founded: codes < idx)
    val exp = scala.collection.mutable.Map.empty[Int, String]
    def expand(code: Int): String =
      if (code >= 'a'.toInt) code.toChar.toString else exp(code)
    for ((idx, lhs, rhs, _, _) <- merges)
      exp(idx) = expand(lhs) + expand(rhs)
    val vocab = graft.operators.BpeTrain.model(spark, dir)
      .filter(col("kind") === "vocab")
      .select(col("word0"), col("word")).collect()
    assert(vocab.nonEmpty)
    vocab.foreach { r =>
      val w0 = r.getString(0); val w = r.getString(1)
      assert(w.map(c => expand(c.toInt)).mkString == w0,
        s"vocab entry for '$w0' does not expand back")
    }
  }

  test("re-tokenized corpus totals reconcile with the trajectory") {
    val toks = SparkEntry.queries("q_bpe_train_tokens")(spark, dir)
      .agg(sum(col("n_tokens")), sum(col("n_chars"))).head()
    val (nTokens, nChars) = (toks.getLong(0), toks.getLong(1))
    assert(nTokens == merges.last._5,
      s"per-doc token total $nTokens != final total_syms ${merges.last._5}")
    assert(nTokens < nChars, "training must compress the corpus")
  }
}
