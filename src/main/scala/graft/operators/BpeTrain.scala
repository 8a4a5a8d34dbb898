package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterated BPE tokenizer training to a target vocabulary — the full
  * Sennrich et al. 2016 loop that q_bpe_merges (one graded round) and
  * q_bpe_apply (two chained rounds) are the unit steps of, run to
  * [[V]] merges over the corpus. Reference anchor: the
  * tokenize/normalize text surface the reference's curation pipeline
  * implies (model_presto text ops; see TextQueries scaladoc).
  *
  * Algorithm (exactly the classical one, expressed Spark-first):
  *  1. ONE corpus-sized shuffle up front: the word-frequency table
  *     `(word, cnt)` — BPE trains on distinct words weighted by count,
  *     never on the raw token stream (this is what makes the loop
  *     cheap: at 100 TB the distinct-word table is millions of rows,
  *     not trillions).
  *  2. Per round, ONE keyed aggregate over the vocab table fused to
  *     produce both ranking and bookkeeping: explode adjacent symbol
  *     pairs with positions, count occurrences weighted by word count
  *     (overlap-counted, the q_bpe_merges convention), and alongside
  *     it the non-overlapping symbol removal `replace` would buy
  *     (counted once per word via a first-position gate). The argmax
  *     (count DESC, pair ASC — both engines compare ASCII/control
  *     bytes identically) is a 1-row collect: the scalar pattern, the
  *     merge table IS the driver-side artifact being trained.
  *  3. Apply the merge as a per-row `replace` collapsing the pair to
  *     the round's sentinel symbol `chr(round)` (sentinels 1..V stay
  *     below 'a'=97, so they never collide with the [a-z] alphabet),
  *     and lazily localCheckpoint so round N+1's aggregate
  *     materializes a lineage-free vocab table (the GraphOps rounds
  *     discipline — a plain chain of withColumns would grow the plan
  *     per round until analysis blows up).
  *  4. Stop at [[V]] merges or when no adjacent pair remains.
  *
  * The trained model lands in [[IndexStore]] (build-once-read-many,
  * content-fingerprint keyed) as ONE table holding both row kinds:
  * `kind='merge'` rows — the merge table with the per-round corpus
  * compression trajectory — and `kind='vocab'` rows — the final
  * word → symbol-string map, i.e. the re-tokenizer. Consumers
  * project/filter; the training subtree never appears in their plans.
  */
object BpeTrain {

  /** Target merge count — sized to the fixture corpus (31 distinct
    * words, 107 possible merges at sf0.01) so training neither
    * exhausts nor degenerates; real tokenizers run the same loop to
    * 32k–100k. */
  val V = 64

  /** The trained model table: kind, merge_idx, lhs_code, rhs_code,
    * pair_count, total_syms, word0, word. */
  def model(spark: SparkSession, dir: String): DataFrame =
    IndexStore.materialize(spark, "bpe_model",
      IndexStore.dataKey(dir, s"v=$V"))(train(spark, dir))

  private def train(spark: SparkSession, dir: String): DataFrame = {
    // 1. the one corpus-sized shuffle: word frequencies
    var vocab = Tables.documents(spark, dir)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word0"))
      .groupBy("word0").agg(count(lit(1)).as("cnt"))
      .withColumn("word", col("word0"))
      .localCheckpoint()

    val stats = vocab
      .agg(sum(col("cnt") * length(col("word"))), count(lit(1))).head()
    var totalSyms = stats.getLong(0)

    // Size the vocab table to its ROW count, not the session default:
    // the V-round loop pays per-task scheduling 64×, and a checkpointed
    // RDD's partitioning is pinned (AQE only coalesces post-shuffle).
    // A web-scale vocab (millions of distinct words) keeps many
    // partitions; the fixture's 31 rows collapse to one.
    val parts = math.max(1L, stats.getLong(1) / 65536L).toInt
    if (parts < vocab.rdd.getNumPartitions)
      vocab = vocab.repartition(parts).localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Int, Long, Long)]
    var it = 1
    var exhausted = false
    while (it <= V && !exhausted) {
      // 2. fused ranking + removal aggregate: one shuffle on the pair
      val top = vocab.filter(length(col("word")) >= 2)
        .select(col("cnt"), col("word"), explode(expr(
          "transform(sequence(1, length(word) - 1), " +
            "i -> struct(substring(word, i, 2) AS pair, i AS pos))"))
          .as("p"))
        .select(col("cnt"), col("word"),
          col("p.pair").as("pair"), col("p.pos").as("pos"))
        .groupBy("pair")
        .agg(
          sum(col("cnt")).as("pc"),
          // symbols `replace` removes, counted once per word at the
          // pair's first position (left-to-right non-overlapping)
          sum(when(expr("pos = locate(pair, word)"),
            col("cnt") *
              (length(col("word")) -
                length(expr("replace(word, pair, 'x')"))))
            .otherwise(lit(0L))).as("removed"))
        .orderBy(col("pc").desc, col("pair").asc)
        .limit(1).collect()

      if (top.isEmpty) exhausted = true
      else {
        val m = top(0).getString(0)
        val mc = top(0).getLong(1)
        totalSyms -= top(0).getLong(2)
        merges += ((it, m.charAt(0).toInt, m.charAt(1).toInt, mc, totalSyms))
        // 3. apply the merge; sentinel = chr(it)
        vocab = vocab
          .withColumn("word",
            replace(col("word"), lit(m), lit(it.toChar.toString)))
          .localCheckpoint(false) // lazy: next round's aggregate runs it
        it += 1
      }
    }

    import spark.implicits._
    val mergeDf = merges.toSeq
      .toDF("merge_idx", "lhs_code", "rhs_code", "pair_count", "total_syms")
      .withColumn("kind", lit("merge"))
    val vocabDf = vocab.select(col("word0"), col("word"))
      .withColumn("kind", lit("vocab"))
    mergeDf.unionByName(vocabDf, allowMissingColumns = true)
  }
}
