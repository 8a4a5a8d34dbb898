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
  * Symbols are INTEGER CODES: initial symbols are the codepoints of
  * the [a-z] alphabet (97..122); merge round N mints code 255+N, so
  * the trainable vocabulary is unbounded in V (a real 32k–100k-merge
  * run fits; the previous chr(round) sentinel scheme capped V at ~96).
  * The carrier is a fixed-width string — each symbol serializes as
  * `g` + 5 decimal digits — NOT array<int>: with a one-char sentinel
  * that never appears inside a token, `replace`/`locate`/`substring`
  * over the carrier are EXACTLY the left-to-right non-overlapping
  * merge-scan BPE needs, misaligned matches are impossible (a pair
  * pattern starts with `g` and `g` only occurs at token boundaries),
  * and the whole loop stays inside codegen'd string primitives on
  * both engines — an array<int> + fold representation would drop the
  * hot per-round aggregate off whole-stage codegen (HOF lambdas are
  * interpreted) and force the DuckDB oracle through list_reduce.
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
  *     (count DESC, pair ASC — fixed-width decimal encoding makes the
  *     string order the numeric (lhs, rhs) order on both engines) is
  *     a 1-row collect: the scalar pattern, the merge table IS the
  *     driver-side artifact being trained.
  *  3. Apply the merge as a per-row `replace` collapsing the 12-char
  *     pair to the round's 6-char code token, and lazily
  *     localCheckpoint so round N+1's aggregate materializes a
  *     lineage-free vocab table (the GraphOps rounds discipline — a
  *     plain chain of withColumns would grow the plan per round until
  *     analysis blows up).
  *  4. Stop at [[V]] merges or when no adjacent pair remains.
  *
  * The trained model lands in [[IndexStore]] (build-once-read-many,
  * content-fingerprint keyed) as ONE table holding both row kinds:
  * `kind='merge'` rows — the merge table with the per-round corpus
  * compression trajectory — and `kind='vocab'` rows — the final
  * word → coded-symbol-string map, i.e. the re-tokenizer. Consumers
  * project/filter; the training subtree never appears in their plans.
  */
object BpeTrain {

  /** Target merge count. The fixture corpus exhausts its merge space
    * before 256 (every distinct word collapses to one symbol — the
    * loop and the DuckDB oracle stop at the same round, graded), so
    * this exercises the exhaustion path; real tokenizers run the same
    * loop to 32k–100k, which the integer-code representation admits. */
  val V = 256

  /** Serialized width of one symbol token (`g` + 5 decimal digits). */
  val TokW = 6

  /** Serialize a symbol code as its fixed-width carrier token. */
  def tok(code: Int): String = f"g$code%05d"

  /** The trained model table: kind, merge_idx, lhs_code, rhs_code,
    * pair_count, total_syms, word0, word. */
  def model(spark: SparkSession, dir: String): DataFrame =
    IndexStore.materialize(spark, "bpe_model",
      IndexStore.dataKey(dir, s"v=$V"))(train(spark, dir))

  /** Realistic-vocabulary arm: BATCH-PARALLEL BPE to [[Vscale]]
    * merges — the scalable form of the train loop. Sequential BPE at
    * a real tokenizer's V (32k–100k) cannot run V cluster rounds; the
    * parallel-BPE batching rule collapses them ~15×: per round, rank
    * all adjacent pairs (count DESC, pair ASC) and select every
    * candidate that shares NO symbol with any strictly higher-ranked
    * candidate. Selected pairs are pairwise symbol-disjoint, so their
    * occurrences cannot overlap and applying them simultaneously is
    * order-independent — each round is ONE pass over the vocabulary
    * regardless of batch size. Selection is prefix-stable (whether a
    * candidate is picked depends only on higher-ranked candidates),
    * so the final round may overshoot [[Vscale]] and the merge table
    * trims exactly.
    *
    * Work split for 100 TB: the corpus-sized stages are distributed —
    * the pretoken-frequency shuffle and the deterministic
    * top-[[Mscale]] selection (TakeOrderedAndProject, no full sort) —
    * and the merge loop runs on the collected [[Mscale]]-row
    * frequency table, the industry practice for tokenizer training
    * (SentencePiece/HF train on a frequency-cut word table, not the
    * token stream; the artifact is knob-bounded like the IVF
    * centroids and PQ codebooks this repo already collects).
    * Pretokens are word TRIGRAMS (`w1.w2.w3`): the synthetic corpus
    * has a 31-word vocabulary, so single words exhaust the merge
    * space near V=256 — trigram units carry the adjacency structure a
    * real corpus's word inventory would, making V=4096 reachable
    * while keeping every stage corpus-derived. The DuckDB oracle
    * re-trains the whole thing as a recursive CTE over the same
    * top-[[Mscale]] table (one recursion round per BATCH, ~240
    * rounds), so ranking, the disjointness rule, tie-breaks, code
    * minting, and the replace semantics are all cross-engine-graded
    * at realistic vocabulary scale. */
  val Vscale = 4096
  val Mscale = 4096
  val Tscale = 1024 // per-round candidate window (rank cap)

  /** Realistic-tokenizer-V knobs for [[train32k]]: V=32k is the
    * SentencePiece/HF default order of magnitude. M and the gram
    * width rise with V because merge CAPACITY is structural: the
    * synthetic corpus has a 31-word vocabulary, so the distinct-merge
    * space is the pretoken prefix tree — trigram units top out near
    * ~6k distinct merges, 5-gram units at M=32k carry 40k+. */
  val V32 = 32768
  val M32 = 32768
  val T32 = 4096

  def trainScale(spark: SparkSession, dir: String): DataFrame =
    trainScaleAt(spark, dir, Vscale, Mscale, Tscale, gram = 3)

  /** The V=32k measured arm — the identical batched code path as
    * [[trainScale]] at realistic vocabulary scale. ORACLE-COST
    * CEILING (why this arm is bench-measured + rows-checked while
    * V=4096 stays the cross-engine-graded pin): the DuckDB
    * recursive-CTE re-train that grades V=4096 materializes
    * rounds×M state rows and pays an O(T²) NOT-EXISTS disjointness
    * filter plus an M×batch list_reduce replace sweep per round —
    * at V=32k/M=32k that is two orders of magnitude more state and
    * work (hours in DuckDB for a gate that must run per round). The
    * code under measurement is byte-identical to the graded path;
    * only the knobs differ. Committed in-repo witness: BpeTrainSpec
    * ("incremental 32k-arm loop is identical to a naive reference
    * trainer") pins [[mergeLoop]] row-for-row against an
    * independently-written naive rebuild-and-full-sort trainer at
    * this arm's gram width. */
  def train32k(spark: SparkSession, dir: String): DataFrame =
    trainScaleAt(spark, dir, V32, M32, T32, gram = 5)

  private[graft] def trainScaleAt(spark: SparkSession, dir: String,
      v: Int, m: Int, t: Int, gram: Int): DataFrame = {
    import spark.implicits._
    val (words, wcnt) = artifact(spark, dir, m, gram)
    mergeLoop(words, wcnt, v, t)
      .toDF("merge_idx", "lhs_code", "rhs_code", "pair_count", "round_idx")
  }

  /** The bounded training artifact: deterministic top-`m` n-gram
    * pretoken units (cnt DESC, unit ASC — total order, unit unique)
    * as (symbol-code arrays, counts). The one corpus-sized shuffle. */
  private[graft] def artifact(spark: SparkSession, dir: String,
      m: Int, gram: Int): (Array[Array[Int]], Array[Long]) = {
    // distributed: n-gram-pretoken frequencies (the corpus shuffle)
    val catParts = (0 until gram)
      .map(k => if (k == 0) "element_at(ws, i)" else s"element_at(ws, i + $k)")
      .mkString(", '.', ")
    val units = Tables.documents(spark, dir)
      .select(expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .select(explode(expr(
        s"CASE WHEN size(ws) >= $gram THEN " +
          s"transform(sequence(1, size(ws) - ${gram - 1}), " +
          s"i -> concat($catParts)) ELSE array() END")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("cnt"))
    val top = units.orderBy(col("cnt").desc, col("u").asc)
      .limit(m).collect()
    val words = new Array[Array[Int]](top.length)
    val wcnt = new Array[Long](top.length)
    var wi = 0
    while (wi < top.length) {
      words(wi) = top(wi).getString(0).map(_.toInt).toArray
      wcnt(wi) = top(wi).getLong(1)
      wi += 1
    }
    (words, wcnt)
  }

  /** Rows are (merge_idx, lhs_code, rhs_code, pair_count, round_idx).
    * Mutates `words` in place (callers own the artifact; the spec
    * clones before comparing against its independent naive loop).
    * ---- local exact batched loop over the artifact ---------------- */
  private[graft] def mergeLoop(words: Array[Array[Int]], wcnt: Array[Long],
      v: Int, t: Int): Vector[(Int, Int, Int, Long, Int)] = {
    // Engineered like the classical BPE trainers (HF tokenizers /
    // SentencePiece): a primitive open-addressing pair-count map
    // updated INCREMENTALLY (only rewritten words touch it), an
    // inverted pair->word index so a round visits only words that can
    // change, and partial top-T sorting instead of a full sort — at
    // V=32k/M=32k the naive rebuild-and-sort-per-round loop measured
    // 34 s; this one runs the identical algorithm in ~2 s. Candidate
    // ranking, the disjointness rule, tie-breaks, code minting, and
    // the per-word left-to-right rewrite are EXACTLY the semantics
    // the V=4096 DuckDB recursive-CTE oracle grades — only the data
    // structures changed (q_bpe_train_scale pins this).
    val out = Vector.newBuilder[(Int, Int, Int, Long, Int)]

    // primitive long->long map; key 0 = empty (real keys are
    // >= 97<<20). Decrements may leave a 0 count — scans skip those;
    // slots are never reclaimed (the pair universe is bounded by
    // initial pairs + minted codes).
    var mcap = 1 << 17
    var mks = new Array[Long](mcap)
    var mvs = new Array[Long](mcap)
    var mn = 0
    // live-slot list (r19 opt): the per-round candidate gather used to
    // scan ALL mcap slots — O(rounds × mcap), measured 2.0 of the
    // 4.4 s loop at V=32k (1,610 rounds × 131k slots) — while only
    // ~37k pairs are live on average. Track slots whose count went
    // 0 → positive in an append-only int list guarded by a per-slot
    // membership flag (no duplicates); gather iterates the list and
    // compacts dead entries in place, clearing their flag so a later
    // revival re-appends. Gather ORDER is immaterial: psort imposes
    // the total (count DESC, key ASC) order on the selected prefix.
    var mliv = new Array[Boolean](mcap)
    var liveBuf = new Array[Int](1 << 17)
    var liveN = 0
    def livePush(s: Int): Unit = {
      if (!mliv(s)) {
        mliv(s) = true
        if (liveN == liveBuf.length)
          liveBuf = java.util.Arrays.copyOf(liveBuf, liveN * 2)
        liveBuf(liveN) = s; liveN += 1
      }
    }
    def mslot(k: Long): Int = {
      var h = k * -7046029254386353131L
      h ^= h >>> 33
      var i = (h & (mcap - 1)).toInt
      while (mks(i) != 0L && mks(i) != k) i = (i + 1) & (mcap - 1)
      i
    }
    def mgrow(): Unit = {
      val oks = mks; val ovs = mvs; val oliv = mliv
      mcap <<= 1
      mks = new Array[Long](mcap)
      mvs = new Array[Long](mcap)
      mliv = new Array[Boolean](mcap)
      var i = 0
      while (i < oks.length) {
        if (oks(i) != 0L) {
          val s = mslot(oks(i)); mks(s) = oks(i); mvs(s) = ovs(i)
          mliv(s) = oliv(i)
        }
        i += 1
      }
      // slots moved: rebuild the live list from the membership flags
      liveN = 0
      var j = 0
      while (j < mcap) {
        if (mliv(j)) {
          if (liveN == liveBuf.length)
            liveBuf = java.util.Arrays.copyOf(liveBuf, liveN * 2)
          liveBuf(liveN) = j; liveN += 1
        }
        j += 1
      }
    }
    // inverted index: pair -> word indices that contained it when the
    // word was last (re)written. Entries go stale (never pruned); a
    // visit is cheap (the rewrite is the identity for a stale entry)
    // and every word currently containing a pair IS listed under it.
    final class IntBuf {
      var a = new Array[Int](8); var n = 0
      def +=(x: Int): Unit = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
        a(n) = x; n += 1
      }
    }
    val occ = new java.util.HashMap[Long, IntBuf]()
    def addPairs(w: Array[Int], c: Long, widx: Int): Unit = {
      var j = 0
      while (j < w.length - 1) {
        val k = w(j).toLong << 20 | w(j + 1)
        if ((mn + 1) * 4 > mcap * 3) mgrow()
        val s = mslot(k)
        if (mks(s) == 0L) { mks(s) = k; mn += 1 }
        val was = mvs(s)
        mvs(s) = was + c
        if (was <= 0L && mvs(s) > 0L) livePush(s)
        occ.computeIfAbsent(k, _ => new IntBuf) += widx
        j += 1
      }
    }
    def subPairs(w: Array[Int], c: Long): Unit = {
      var j = 0
      while (j < w.length - 1) {
        mvs(mslot(w(j).toLong << 20 | w(j + 1))) -= c
        j += 1
      }
    }
    var wi2 = 0
    while (wi2 < words.length) {
      addPairs(words(wi2), wcnt(wi2), wi2)
      wi2 += 1
    }

    // reusable candidate buffers + per-round visit stamps
    var ccnt = new Array[Long](mcap)
    var ckey = new Array[Long](mcap)
    var cpk = new Array[Long](mcap)
    val stamp = new Array[Int](words.length)

    var nm = 0
    var round = 0
    var go = true
    var tGather = 0L; var tSort = 0L; var tRewrite = 0L; var ciSum = 0L; var visitSum = 0L
    while (nm < v && go) {
      val tg0 = System.nanoTime()
      // gather live pairs (count > 0)
      if (ccnt.length < mcap) {
        ccnt = new Array[Long](mcap); ckey = new Array[Long](mcap)
      }
      // gather live pairs from the live-slot list (not a full-table
      // scan), compacting dead entries and clearing their flag
      var ci = 0
      var li0 = 0
      var lw = 0
      var maxCnt = 0L
      while (li0 < liveN) {
        val s = liveBuf(li0)
        if (mvs(s) > 0) {
          ccnt(ci) = mvs(s); ckey(ci) = mks(s); ci += 1
          if (mvs(s) > maxCnt) maxCnt = mvs(s)
          liveBuf(lw) = s; lw += 1
        } else mliv(s) = false
        li0 += 1
      }
      liveN = lw
      tGather += System.nanoTime() - tg0; ciSum += ci
      if (ci == 0) go = false
      else {
        val ts0 = System.nanoTime()
        // rank (count DESC, (lhs, rhs) ASC — the fixed-width carrier
        // string order), cap to the candidate window: a partial
        // quicksort fully orders positions [0, kTop) and prunes the
        // rest — the same prefix a full sort + take(t) produced
        // (keys are unique, so the order is total).
        // Fast path (r19 opt): keys are < 2^40 by construction, so
        // when every count fits 23 bits the (count, key) pair packs
        // into ONE long — (cnt << 40) | (2^40-1-key) — whose natural
        // DESCENDING order IS (count DESC, key ASC); the partial
        // quicksort then runs on a single primitive array (half the
        // swap/compare traffic). Counts can exceed the packable range
        // on a real corpus, so the two-array form stays as the exact
        // fallback (identical order either way — keys are unique).
        val kTop = math.min(t, ci)
        val Mask40 = (1L << 40) - 1
        if (maxCnt < (1L << 23)) {
          if (cpk.length < ccnt.length) cpk = new Array[Long](ccnt.length)
          var i = 0
          while (i < ci) { cpk(i) = (ccnt(i) << 40) | (Mask40 - ckey(i)); i += 1 }
          def psortP(lo0: Int, hi0: Int): Unit = {
            var lo = lo0
            var hi = hi0
            while (lo < hi && lo < kTop) {
              val mid = (lo + hi) >>> 1
              def sw(a: Int, b: Int): Unit = { val tv = cpk(a); cpk(a) = cpk(b); cpk(b) = tv }
              if (cpk(mid) > cpk(lo)) sw(mid, lo)
              if (cpk(hi) > cpk(lo)) sw(hi, lo)
              if (cpk(hi) > cpk(mid)) sw(hi, mid)
              sw(mid, hi)
              val pv = cpk(hi)
              var p = lo
              var q = lo
              while (q < hi) {
                if (cpk(q) > pv) { val tv = cpk(p); cpk(p) = cpk(q); cpk(q) = tv; p += 1 }
                q += 1
              }
              sw(p, hi)
              val lHi = p - 1
              val rLo = p + 1
              val leftLen = lHi - lo + 1
              val rightLive = rLo < kTop
              val rightLen = if (rightLive) hi - rLo + 1 else 0
              if (leftLen <= rightLen) {
                if (leftLen > 0) psortP(lo, lHi)
                if (rightLive) lo = rLo else hi = lo - 1
              } else {
                if (rightLive) psortP(rLo, hi)
                hi = lHi
              }
            }
          }
          psortP(0, ci - 1)
          var r = 0
          while (r < kTop) {
            ccnt(r) = cpk(r) >>> 40
            ckey(r) = Mask40 - (cpk(r) & Mask40)
            r += 1
          }
        } else {
          def better(i: Int, j: Int): Boolean =
            ccnt(i) > ccnt(j) || (ccnt(i) == ccnt(j) && ckey(i) < ckey(j))
          def swap(i: Int, j: Int): Unit = {
            val tc = ccnt(i); ccnt(i) = ccnt(j); ccnt(j) = tc
            val tk = ckey(i); ckey(i) = ckey(j); ckey(j) = tk
          }
          def psort(lo0: Int, hi0: Int): Unit = {
            var lo = lo0
            var hi = hi0
            while (lo < hi && lo < kTop) {
              // median-of-three pivot to dodge sorted-input quadratics
              val mid = (lo + hi) >>> 1
              if (better(mid, lo)) swap(mid, lo)
              if (better(hi, lo)) swap(hi, lo)
              if (better(hi, mid)) swap(hi, mid)
              swap(mid, hi) // pivot to hi
              var p = lo
              var q = lo
              while (q < hi) {
                if (better(q, hi)) { swap(p, q); p += 1 }
                q += 1
              }
              swap(p, hi)
              // recurse into the SMALLER live side and loop on the larger:
              // stack depth stays O(log n) even if equal-count runs give
              // the pivot a pathological partition sequence
              val lLo = lo; val lHi = p - 1
              val rLo = p + 1
              val leftLen = lHi - lLo + 1
              val rightLive = rLo < kTop // positions >= kTop need no order
              val rightLen = if (rightLive) hi - rLo + 1 else 0
              if (leftLen <= rightLen) {
                if (leftLen > 0) psort(lLo, lHi)
                if (rightLive) lo = rLo else hi = lo - 1
              } else {
                if (rightLive) psort(rLo, hi)
                hi = lHi
              }
            }
          }
          psort(0, ci - 1)
        }
        tSort += System.nanoTime() - ts0
        val tr0 = System.nanoTime()
        // conservative parallel rule: selected iff no strictly
        // higher-ranked CANDIDATE shares a symbol
        val used = new java.util.HashSet[Int]()
        val sel = Vector.newBuilder[(Int, Int, Long)]
        var r = 0
        while (r < kTop) {
          val key = ckey(r)
          val lhs = (key >> 20).toInt; val rhs = (key & 0xfffff).toInt
          val blocked = used.contains(lhs) || used.contains(rhs)
          used.add(lhs); used.add(rhs)
          if (!blocked) sel += ((lhs, rhs, ccnt(r)))
          r += 1
        }
        val selected = sel.result()
        if (selected.isEmpty) go = false
        else {
          round += 1
          val code = new java.util.HashMap[Long, Integer]()
          selected.foreach { case (lhs, rhs, c) =>
            nm += 1
            code.put(lhs.toLong << 20 | rhs, 255 + nm)
            if (nm <= v) out += ((nm, lhs, rhs, c, round))
          }
          // visit ONLY words listed under a selected pair (the
          // inverted index); rewrite is the same left-to-right
          // single pass; an unchanged word (stale index entry)
          // costs one scan and no map updates
          selected.foreach { case (lhs, rhs, _) =>
            val lst = occ.get(lhs.toLong << 20 | rhs)
            if (lst != null) {
              var li = 0
              while (li < lst.n) {
                val k = lst.a(li)
                if (stamp(k) != round) {
                  stamp(k) = round
                  val w = words(k)
                  val nw = Array.newBuilder[Int]
                  var j = 0
                  while (j < w.length) {
                    val m = if (j + 1 < w.length)
                      code.get(w(j).toLong << 20 | w(j + 1)) else null
                    if (m != null) { nw += m; j += 2 }
                    else { nw += w(j); j += 1 }
                  }
                  val w2 = nw.result()
                  if (w2.length != w.length) {
                    subPairs(w, wcnt(k))
                    words(k) = w2
                    addPairs(w2, wcnt(k), k)
                  }
                }
                li += 1
              }
            }
          }
          tRewrite += System.nanoTime() - tr0
        }
      }
    }
    if (sys.env.contains("SPARK_GRAFT_BPE_PROFILE"))
      println(f"[bpe] rounds=$round gather=${tGather / 1e9}%.3f sort=${tSort / 1e9}%.3f rewrite=${tRewrite / 1e9}%.3f ciSum=$ciSum mcap=$mcap mn=$mn")
    out.result()
  }

  private def train(spark: SparkSession, dir: String): DataFrame = {
    // 1. the one corpus-sized shuffle: word frequencies, then the
    // fixed-width code encoding (per-word transform, done once)
    var vocab = Tables.documents(spark, dir)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word0"))
      .groupBy("word0").agg(count(lit(1)).as("cnt"))
      .withColumn("word", expr(
        "concat_ws('', transform(sequence(1, length(word0)), " +
          "i -> concat('g', lpad(cast(ascii(substring(word0, i, 1)) " +
          "as string), 5, '0'))))"))
      .localCheckpoint()

    val stats = vocab
      .agg(sum(col("cnt") * length(col("word0"))), count(lit(1))).head()
    var totalSyms = stats.getLong(0)

    // Size the vocab table to its ROW count, not the session default:
    // the V-round loop pays per-task scheduling V×, and a checkpointed
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
      val top = vocab.filter(length(col("word")) >= 2 * TokW)
        .select(col("cnt"), col("word"), explode(expr(
          s"transform(sequence(1, length(word) DIV $TokW - 1), " +
            s"i -> struct(substring(word, (i-1)*$TokW+1, ${2 * TokW}) AS pair, " +
            "i AS pos))"))
          .as("p"))
        .select(col("cnt"), col("word"),
          col("p.pair").as("pair"), col("p.pos").as("pos"))
        .groupBy("pair")
        .agg(
          sum(col("cnt")).as("pc"),
          // symbols `replace` removes, counted once per word at the
          // pair's first position (left-to-right non-overlapping);
          // each 12→6-char collapse removes exactly one symbol, so
          // occurrences = char shrinkage / (2*TokW - 1) under an
          // 'x' probe replacement
          sum(when(expr(s"(pos-1)*$TokW+1 = locate(pair, word)"),
            col("cnt") *
              expr(s"(length(word) - length(replace(word, pair, 'x'))) " +
                s"DIV ${2 * TokW - 1}"))
            .otherwise(lit(0L))).as("removed"))
        .orderBy(col("pc").desc, col("pair").asc)
        .limit(1).collect()

      if (top.isEmpty) exhausted = true
      else {
        val m = top(0).getString(0)
        val mc = top(0).getLong(1)
        totalSyms -= top(0).getLong(2)
        val lhs = m.substring(1, TokW).toInt
        val rhs = m.substring(TokW + 1, 2 * TokW).toInt
        merges += ((it, lhs, rhs, mc, totalSyms))
        // 3. apply the merge; new code = 255 + round
        vocab = vocab
          .withColumn("word",
            replace(col("word"), lit(m), lit(tok(255 + it))))
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
