package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Retrieval / curation surface over the documents table: TF-IDF
  * term weighting, BM25-style ranking, and incremental
  * batch-vs-corpus deduplication — the lexical-retrieval companions
  * to the vector-ANN family in VectorQueries.
  *
  * Cross-engine determinism note: the classical idf is
  * `ln((N+1)/(df+1))`. `ln` is a libm call whose last-ulp rounding
  * differs between the JVM and DuckDB's C runtime, which would break
  * the driver's bit-exact hash compare (same reason q_terrain is
  * rows-only, SURVEY §7.3). Both queries therefore use the RATIONAL
  * idf — the argument of the log, `(N+1)/(df+1)` resp. the
  * Robertson `(N-df+0.5)/(df+0.5)` — which is a pure IEEE divide.
  * log is monotone, so per-term orderings are identical; only the
  * scale of cross-term mixing changes, and the substitution is
  * applied identically in engine and oracle.
  */
object RetrievalQueries {

  /** Lowercase alpha word terms — the tf-idf vocabulary. */
  private def terms(textCol: String) =
    expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")

  /** Top TF-IDF term per document. Shape at scale: the (doc, term)
    * tf aggregation shuffles on the composite key; df comes from a
    * count window PARTITIONED by term over the same tf rows (one
    * shuffle, no recompute of the tf subtree); N is a 1-row aggregate
    * joined in by broadcast; the final per-doc argmax is a window
    * PARTITIONED by doc_id (never global). Ties break on term asc so
    * the winner is unique and deterministic. */
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("doc_id"), explode(terms("text")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df as a window over the SAME tf rows (one shuffle on term) —
    // a separate groupBy+join would recompute the tf aggregate twice
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n_docs").cast("double") + lit(1.0)) / (col("df").cast("double") + lit(1.0))))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("term").as("top_term"), col("tf"), col("df"), col("score"))
  }

  val qTfidfSql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      |        FROM documents)
      |  GROUP BY doc_id, term),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |withdf AS (
      |  SELECT doc_id, term, tf,
      |    COUNT(*) OVER (PARTITION BY term) AS df
      |  FROM tf),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |    CAST(tf AS DOUBLE) *
      |      ((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) AS score
      |  FROM withdf CROSS JOIN n),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, term ASC) AS rk
      |  FROM scored)
      |SELECT doc_id, term AS top_term, tf, df, score
      |FROM ranked WHERE rk = 1""".stripMargin

  /** BM25-style top-20 documents for the fixed query
    * {spark, query, vector}, k1=1.2, b=0.75, rational Robertson idf
    * (see object doc). Per-term partial scores are summed in a FIXED
    * order (spark + query + vector via conditional aggregation), so
    * the result is bit-identical under any partitioning — summing a
    * `collect_list` of terms would not be. The global top-20 is
    * orderBy+limit → TakeOrderedAndProject (per-partition heaps, no
    * global sort); avgdl is an exact decimal mean broadcast to every
    * row. One (doc,term) shuffle + one doc shuffle. */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    // k1 = 1.2, b = 0.75; k1+1 is written as the literal 2.2 (not
    // computed 1.2 + 1.0, whose rounding could differ from the SQL
    // parser's reading of "2.2")
    val (k1, b) = (1.2, 0.75)
    val docs = Tables.documents(spark, dir)
    // ONE explode + ONE per-doc aggregation carries everything: the
    // document length and each query term's tf as conditional counts —
    // no second tokenization pass, no (doc,term) join
    val perDoc = docs
      .select(col("doc_id"), explode(terms("text")).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        count(when(col("term") === "spark", 1)).as("tf1"),
        count(when(col("term") === "query", 1)).as("tf2"),
        count(when(col("term") === "vector", 1)).as("tf3"))
    // corpus stats + per-term dfs: one 1-row aggregate over the per-doc
    // table, broadcast back to every row
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(when(col("tf1") > 0, 1)).as("df1"),
      count(when(col("tf2") > 0, 1)).as("df2"),
      count(when(col("tf3") > 0, 1)).as("df3"))
    def idfR(dfc: Column, n: Column): Column =
      (n.cast("double") - dfc.cast("double") + lit(0.5)) / (dfc.cast("double") + lit(0.5))
    def tscore(tf: Column, dfc: Column): Column = {
      val norm = tf.cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))
      when(tf > 0, idfR(dfc, col("n_docs")) * (tf.cast("double") * lit(2.2)) / norm)
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score",
        tscore(col("tf1"), col("df1")) + tscore(col("tf2"), col("df2"))
          + tscore(col("tf3"), col("df3")))
      .where(col("score") > 0.0)
      .select("doc_id", "score")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
  }

  val qBm25Sql: String = {
    def tscore(tf: String, df: String): String =
      s"""CASE WHEN $tf > 0 THEN
         |      ((CAST(n_docs AS DOUBLE) - CAST($df AS DOUBLE) + 0.5)
         |        / (CAST($df AS DOUBLE) + 0.5))
         |      * (CAST($tf AS DOUBLE) * 2.2)
         |      / (CAST($tf AS DOUBLE)
         |         + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
         |    ELSE 0.0 END""".stripMargin
    s"""WITH per_doc AS (
       |  SELECT doc_id, COUNT(*) AS dl,
       |    COUNT(CASE WHEN term = 'spark'  THEN 1 END) AS tf1,
       |    COUNT(CASE WHEN term = 'query'  THEN 1 END) AS tf2,
       |    COUNT(CASE WHEN term = 'vector' THEN 1 END) AS tf3
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
       |        FROM documents)
       |  GROUP BY doc_id),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
       |    COUNT(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
       |    COUNT(CASE WHEN tf2 > 0 THEN 1 END) AS df2,
       |    COUNT(CASE WHEN tf3 > 0 THEN 1 END) AS df3
       |  FROM per_doc)
       |SELECT doc_id, score FROM (
       |  SELECT doc_id,
       |    ${tscore("tf1", "df1")}
       |    + ${tscore("tf2", "df2")}
       |    + ${tscore("tf3", "df3")} AS score
       |  FROM per_doc CROSS JOIN stats)
       |WHERE score > 0.0
       |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin
  }

  /** BM25 with query terms arriving AS DATA (a parameter table) —
    * the production retrieval shape: queries are rows, not literals
    * baked into the plan, so the same compiled pipeline serves any
    * query set. Contrast [[qBm25]], whose 3 fixed terms become
    * conditional-count columns.
    *
    * Shape at scale: ONE tokenization into (doc, term) tf — shuffled
    * on the composite key; dl per doc is a second aggregation of the
    * tf rows keyed on doc; the 4-row parameter table broadcasts into
    * an equi-join that prunes the tf table to query terms only; df
    * per term is a count window over those pruned rows (partitioned
    * by term, never global); corpus stats are a broadcast 1-row
    * aggregate; top-20 is orderBy+limit → TakeOrderedAndProject.
    *
    * With terms as data the per-doc score is a SUM over a variable
    * number of (doc, term) rows, and double addition is
    * order-dependent — so each per-term partial is floor-quantized
    * at 1e-9 to a long first (the Exact.qsum rule for computed
    * doubles; qBm25's literal form instead fixes the addition order
    * textually). score_q is the quantized score ×1e9 as BIGINT —
    * scale-free of partitioning on both engines. */
  def qBm25Params(spark: SparkSession, dir: String): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val docs = Tables.documents(spark, dir)
    val params = spark.createDataFrame(
      Seq(Tuple1("spark"), Tuple1("query"), Tuple1("vector"), Tuple1("data")))
      .toDF("term")
    val tf = docs
      .select(col("doc_id"), explode(terms("text")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val perDoc = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val hits = tf
      .join(broadcast(params), Seq("term"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .join(perDoc, Seq("doc_id"))
      .crossJoin(broadcast(stats))
    val idfR = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val norm = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))
    hits
      .withColumn("qs",
        floor(idfR * (col("tf").cast("double") * lit(2.2)) / norm * lit(1000000000.0))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("qs")).as("score_q"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(20)
  }

  val qBm25ParamsSql: String =
    """WITH params(term) AS (VALUES ('spark'), ('query'), ('vector'), ('data')),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      |        FROM documents)
      |  GROUP BY doc_id, term),
      |per_doc AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
      |stats AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      |  FROM per_doc),
      |hits AS (
      |  SELECT t.doc_id, t.term, t.tf,
      |    COUNT(*) OVER (PARTITION BY t.term) AS df
      |  FROM tf t JOIN params p ON t.term = p.term),
      |scored AS (
      |  SELECT h.doc_id,
      |    CAST(FLOOR(
      |      ((CAST(s.n_docs AS DOUBLE) - CAST(h.df AS DOUBLE) + 0.5)
      |        / (CAST(h.df AS DOUBLE) + 0.5))
      |      * (CAST(h.tf AS DOUBLE) * 2.2)
      |      / (CAST(h.tf AS DOUBLE)
      |         + 1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE) / s.avgdl))
      |      * 1000000000.0) AS BIGINT) AS qs
      |  FROM hits h JOIN per_doc d ON h.doc_id = d.doc_id CROSS JOIN stats s)
      |SELECT doc_id, CAST(SUM(qs) AS BIGINT) AS score_q FROM scored GROUP BY doc_id
      |ORDER BY score_q DESC, doc_id ASC LIMIT 20""".stripMargin

  /** Incremental (batch-vs-corpus) exact dedup — the CCNet-style
    * daily-crawl shape: new documents (odd doc_id here) survive only
    * if their content hash is absent from the existing corpus (even
    * doc_id) AND they are the first occurrence within the batch.
    * Both steps key on the content hash: a left-anti join plus a
    * min-per-hash aggregate, each one shuffle on the same key (AQE
    * reuses the exchange). At 100 TB the corpus side is a
    * hash-partitioned index of hashes only — no text moves. */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("content_hash", md5(col("text")))
    val corpus = docs.where(pmod(col("doc_id"), lit(2L)) === 0).select(col("content_hash"))
    val batch = docs.where(pmod(col("doc_id"), lit(2L)) === 1)
    batch
      .join(corpus, Seq("content_hash"), "left_anti")
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_batch_dups"))
      .select("doc_id", "content_hash", "n_batch_dups")
  }

  val qDedupIncrementalSql: String =
    """WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
      |corpus AS (SELECT content_hash FROM h WHERE ((doc_id % 2) + 2) % 2 = 0),
      |batch AS (SELECT * FROM h WHERE ((doc_id % 2) + 2) % 2 = 1)
      |SELECT MIN(doc_id) AS doc_id, content_hash, COUNT(*) AS n_batch_dups
      |FROM batch
      |WHERE content_hash NOT IN (SELECT content_hash FROM corpus)
      |GROUP BY content_hash""".stripMargin

  /** Corpus-statistics quality signal (the Gopher/C4-style filter
    * family): a document's mean unigram probability under the
    * corpus's own token distribution. Machine-generated or
    * boilerplate text skews toward very common tokens (high
    * typicality); OCR noise and garbage skew rare (low) — both tails
    * get cut by a curation gate. Shape at scale: token counts are one
    * aggregation keyed on the token; the per-token probability join
    * shuffles on the same key; the per-doc mean is a second keyed
    * aggregation. The 1-row total broadcasts. Probabilities are
    * floor-quantized at 1e-9 before the mean (computed doubles
    * aggregated across engines — same rule as Exact.qmean, finer
    * grain because unigram probabilities are small). */
  def qUnigramTypicality(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(terms("text")).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("total_tokens"))
    toks.join(vocab, "token")
      .crossJoin(broadcast(total))
      .withColumn("p", col("cnt").cast("double") / col("total_tokens").cast("double"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(floor(col("p") * lit(1000000000.0)).cast("long")).cast("double")
          / lit(1000000000.0) / count(lit(1))).as("typicality"))
  }

  val qUnigramTypicalitySql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
      |  FROM documents),
      |vocab AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
      |total AS (SELECT COUNT(*) AS total_tokens FROM toks)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(CAST(FLOOR((CAST(cnt AS DOUBLE) / CAST(total_tokens AS DOUBLE))
      |        * 1000000000.0) AS BIGINT)) AS DOUBLE)
      |    / 1000000000.0 / COUNT(*) AS typicality
      |FROM toks JOIN vocab USING (token) CROSS JOIN total
      |GROUP BY doc_id""".stripMargin

  /** Token-distribution Shannon entropy per document — the curation
    * gate that catches repetitive/templated text (low entropy: few
    * distinct tokens dominate) without needing a reference corpus
    * the way [[qUnigramTypicality]] does. Reported in nats alongside
    * token/type counts so a gate can combine them (reference quality
    * signals: monthly.py:666-690 token stats).
    *
    * Shape at scale: term frequencies are one aggregation keyed on
    * (doc, term); doc lengths reduce the same rows keyed on doc; the
    * join and the final sum shuffle on doc again (AQE reuses the
    * exchange). Nothing global, no window.
    *
    * Cross-engine determinism: `ln` is libm (JVM vs DuckDB C runtime
    * may differ in the last ulp — the q_terrain problem), and the
    * per-doc sum has variable width, so each `-p·ln p` partial is
    * floor-quantized at 1e-9 to a long BEFORE summing (the
    * Exact.qsum rule; same accepted quantization-boundary residual
    * risk as q_terrain's 1e-6, documented there). */
  def qDocEntropy(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(terms("text")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val perDoc = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("n_tokens"))
    val p = col("tf").cast("double") / col("n_tokens").cast("double")
    tf.join(perDoc, Seq("doc_id"))
      .withColumn("hq", floor(-(p * log(p)) * lit(1000000000.0)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        (sum(col("hq")).cast("double") / lit(1000000000.0)).as("entropy"))
  }

  val qDocEntropySql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      |        FROM documents)
      |  GROUP BY doc_id, term),
      |per_doc AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tf GROUP BY doc_id)
      |SELECT t.doc_id, MAX(p.n_tokens) AS n_tokens, COUNT(*) AS n_terms,
      |  CAST(SUM(CAST(FLOOR(
      |      -((CAST(t.tf AS DOUBLE) / CAST(p.n_tokens AS DOUBLE))
      |        * ln(CAST(t.tf AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)))
      |      * 1000000000.0) AS BIGINT)) AS DOUBLE) / 1000000000.0 AS entropy
      |FROM tf t JOIN per_doc p USING (doc_id)
      |GROUP BY t.doc_id""".stripMargin

  /** Hybrid retrieval fusion — reciprocal-rank fusion (RRF,
    * Cormack/Clarke/Buettcher SIGIR'09) of the lexical and vector
    * arms, the first join a production RAG pipeline makes:
    * `score(d) = Σ_arms 1/(60 + rank_arm(d))`, missing membership
    * contributing 0. Arms are the two already-graded rankers: the
    * BM25 parameter-table top-20 ([[qBm25Params]], one shared
    * lexical query) and brute-force cosine top-20 per query vector
    * (the [[VectorQueries.qCosineTopk]] plan, qid < 5, self
    * excluded).
    *
    * Shape at scale: each arm bounds itself FIRST (top-20 via
    * TakeOrderedAndProject resp. per-qid window), so fusion sees
    * ≤ 20 + 20 rows per query — the full-outer join on
    * (qid, doc_id) is keyed (never cartesian: the lexical list
    * replicates to the 5 qids by broadcast), and the re-rank
    * window is per-qid. Determinism: ranks are integers with
    * doc_id tie-breaks; 1/(60+rank) is one IEEE division of small
    * ints; the two-term sum has a textually fixed order; fused
    * ties break on doc_id. The lexical rank is assigned AFTER the
    * limit(20) (partition-less window over 20 rows — the
    * q_vocab_topk exemption pattern). */
  def qRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wv = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val vec = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", graft.functions.VectorOps.cosine("qe", "embedding"))
      .withColumn("vrank", row_number().over(wv))
      .filter(col("vrank") <= 20)
      .select(col("qid"), col("vec_id").as("doc_id"), col("vrank"))
    val lex = qBm25Params(spark, dir)
      .withColumn("lrank",
        row_number().over(Window.orderBy(col("score_q").desc, col("doc_id"))))
      .select("doc_id", "lrank")
    val lexPerQ = q.select("qid").crossJoin(broadcast(lex))
    vec.join(lexPerQ, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("vrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("fused_rank") <= 10)
      .select("qid", "fused_rank", "doc_id", "rrf")
  }

  val qRrfFusionSql: String = {
    val bm25NoLimit = qBm25ParamsSql // already ends in the top-20 limit
    s"""WITH bm25 AS ($bm25NoLimit),
       |lex AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS lrank
       |  FROM bm25),
       |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 5),
       |lexq AS (SELECT q.qid, l.doc_id, l.lrank FROM qids q CROSS JOIN lex l),
       |vec AS (
       |  SELECT qid, doc_id, vrank FROM (
       |    SELECT q.vec_id AS qid, e.vec_id AS doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${VectorQueries.cosineSql("q.embedding", "e.embedding")} DESC,
       |        e.vec_id) AS vrank
       |    FROM embeddings q CROSS JOIN embeddings e
       |    WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
       |  WHERE vrank <= 20),
       |fused AS (
       |  SELECT qid, doc_id,
       |    COALESCE(1e0 / (60 + v.vrank), 0e0)
       |      + COALESCE(1e0 / (60 + l.lrank), 0e0) AS rrf
       |  FROM vec v FULL JOIN lexq l USING (qid, doc_id))
       |SELECT qid, fused_rank, doc_id, rrf FROM (
       |  SELECT qid, doc_id, rrf,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY rrf DESC, doc_id) AS fused_rank
       |  FROM fused)
       |WHERE fused_rank <= 10""".stripMargin
  }

  /** RRF recall gate — mirrors q_ann_recall for the fusion arm: how
    * much of the brute-force cosine top-10 survives into the fused
    * top-10 per query. Both inputs are deterministic and
    * oracle-reproducible, so the recall itself is hash-graded (the
    * quality loop a production hybrid-retrieval stack runs after
    * every ranker change). The semi-join keys on (qid, doc_id);
    * recall is one IEEE divide. A qid here always retains ≥ 1
    * cosine hit (the vector arm feeds the fusion), so no group
    * vanishes. */
  def qRrfRecall(spark: SparkSession, dir: String): DataFrame = {
    val fused = qRrfFusion(spark, dir).select("qid", "doc_id")
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val cos10 = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", graft.functions.VectorOps.cosine("qe", "embedding"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("vec_id").as("doc_id"))
    fused.join(cos10, Seq("qid", "doc_id"), "left_semi")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_common"))
      .select(col("qid"), col("n_common"),
        (col("n_common") / lit(10.0)).as("recall_at_10"))
  }

  val qRrfRecallSql: String =
    s"""WITH fused AS ($qRrfFusionSql),
       |cos10 AS (
       |  SELECT qid, doc_id FROM (
       |    SELECT q.vec_id AS qid, e.vec_id AS doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${VectorQueries.cosineSql("q.embedding", "e.embedding")} DESC,
       |        e.vec_id) AS rank
       |    FROM embeddings q CROSS JOIN embeddings e
       |    WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
       |  WHERE rank <= 10)
       |SELECT f.qid, COUNT(*) AS n_common,
       |  COUNT(*) / 1e1 AS recall_at_10
       |FROM fused f
       |JOIN cos10 c ON f.qid = c.qid AND f.doc_id = c.doc_id
       |GROUP BY 1""".stripMargin

  /** Ranking-quality eval — NDCG@10, reciprocal rank, and
    * precision@10 of the fused ranking ([[qRrfFusion]]) against a
    * graded relevance oracle: the brute-force cosine top-10 with
    * rel = 11 − cosine_rank (rank 1 → grade 10). This is the metric
    * loop a retrieval stack runs after every ranker change —
    * q_ann_recall generalized from set overlap to position-weighted
    * gain. Every query has exactly 10 relevant docs, so the ideal
    * DCG is the same Σ(11−i)/log₂(i+1) on both engines.
    *
    * Determinism: rel and ranks are small ints; each DCG term
    * rel/log₂(rank+1) is floor-quantized at 1e-9 to a long before
    * summing (log₂ is libm — the qDocEntropy rule), and NDCG is one
    * long-vs-long division. Shape: both feeders bound themselves
    * before the keyed (qid, doc_id) join; per-qid aggregation ends
    * the plan — nothing global anywhere. */
  def qRetrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val fused = qRrfFusion(spark, dir).select("qid", "fused_rank", "doc_id")
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val rel = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", graft.functions.VectorOps.cosine("qe", "embedding"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= 10)
      .select(col("qid"), col("vec_id").as("doc_id"),
        (lit(11) - col("crank")).cast("long").as("rel"))
    val idcg = (1 to 10).map(i =>
        floor(lit((11 - i).toDouble) / log2(lit(i.toDouble + 1.0)) * lit(1e9)).cast("long"))
      .reduce(_ + _)
    fused.join(rel, Seq("qid", "doc_id"), "left")
      .withColumn("g", coalesce(col("rel"), lit(0L)))
      .withColumn("dcg_term",
        floor(col("g").cast("double") /
            log2(col("fused_rank").cast("double") + lit(1.0)) * lit(1e9))
          .cast("long"))
      .groupBy(col("qid"))
      .agg(
        count(when(col("g") > 0, 1)).as("n_rel_ret"),
        min(when(col("g") > 0, col("fused_rank"))).as("first_rel_rank"),
        sum(col("dcg_term")).as("dcg_q"))
      .withColumn("p_at_10", col("n_rel_ret").cast("double") / lit(10.0))
      .withColumn("rr",
        coalesce(lit(1.0) / col("first_rel_rank").cast("double"), lit(0.0)))
      .withColumn("ndcg", col("dcg_q").cast("double") / idcg.cast("double"))
      .select("qid", "n_rel_ret", "p_at_10", "rr", "ndcg")
  }

  val qRetrievalEvalSql: String =
    s"""WITH fused AS ($qRrfFusionSql),
       |rel AS (
       |  SELECT qid, doc_id, CAST(11 - crank AS BIGINT) AS rel FROM (
       |    SELECT q.vec_id AS qid, e.vec_id AS doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${VectorQueries.cosineSql("q.embedding", "e.embedding")} DESC,
       |        e.vec_id) AS crank
       |    FROM embeddings q CROSS JOIN embeddings e
       |    WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
       |  WHERE crank <= 10),
       |idcg AS (
       |  SELECT CAST(SUM(CAST(FLOOR(CAST(11 - i AS DOUBLE)
       |      / log2(CAST(i AS DOUBLE) + 1e0) * 1e9) AS BIGINT)) AS BIGINT) AS idcg_q
       |  FROM (SELECT unnest(range(1, 11)) AS i)),
       |scored AS (
       |  SELECT f.qid, f.fused_rank, COALESCE(r.rel, 0) AS g
       |  FROM fused f LEFT JOIN rel r ON f.qid = r.qid AND f.doc_id = r.doc_id),
       |agg AS (
       |  SELECT qid,
       |    COUNT(CASE WHEN g > 0 THEN 1 END) AS n_rel_ret,
       |    MIN(CASE WHEN g > 0 THEN fused_rank END) AS first_rel_rank,
       |    CAST(SUM(CAST(FLOOR(CAST(g AS DOUBLE)
       |      / log2(CAST(fused_rank AS DOUBLE) + 1e0) * 1e9) AS BIGINT)) AS BIGINT)
       |      AS dcg_q
       |  FROM scored GROUP BY qid)
       |SELECT qid, n_rel_ret,
       |  CAST(n_rel_ret AS DOUBLE) / 1e1 AS p_at_10,
       |  COALESCE(1e0 / CAST(first_rel_rank AS DOUBLE), 0e0) AS rr,
       |  CAST(dcg_q AS DOUBLE) / CAST(i.idcg_q AS DOUBLE) AS ndcg
       |FROM agg CROSS JOIN idcg i""".stripMargin

  /** Maximal-marginal-relevance re-rank (Carbonell–Goldstein '98) —
    * the diversification step after retrieval: greedily pick k=4 of
    * the cosine top-8 per query, each pick maximizing
    * `λ·rel − (1−λ)·max-sim-to-already-picked` (λ=0.7), so the
    * result trades relevance against redundancy — the answer to
    * "my top-k are 5 near-duplicates" that pairs with the semdedup
    * family.
    *
    * Determinism: relevance and pairwise similarity floor-quantize
    * at 1e-9 to LONGs first, and λ is applied as the INTEGER form
    * `7·relq − 3·simq` (λ scaled by 10) — every comparison in the
    * greedy argmax is integer, ties break on doc_id; no float ever
    * decides a pick. Shape at scale: candidates bound themselves
    * FIRST (per-qid top-8 window), so the pairwise-similarity join
    * is 8×8 per query — keyed on qid, never a corpus cartesian.
    *
    * The greedy selection itself runs DRIVER-SIDE on the collected
    * (k·|Q|)-row integer artifact — the BpeTrain/PQ-anchor bounded-
    * artifact rule: expressed as 3 rounds of DataFrame join + argmax
    * window it planned 105 shuffle exchanges / 39 SortMergeJoins for
    * a ≤ 40-row relation (the `selected` union chain re-embeds every
    * earlier round's subtree — plans/r19/q_mmr_rerank_before.txt),
    * pure scheduling overhead at ANY scale since the relation is
    * knob-bounded (k=4, |Q|=5) regardless of corpus size. The
    * arithmetic is already all-integer (quantized longs), so the
    * driver loop is bit-identical to the DataFrame form it replaced
    * (oracle-graded, and both corpus-sized stages are unchanged). */
  def qMmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    // 40 rows, but the subtree above it is a corpus-wide cosine top-8
    // — and the greedy rounds below read it ~8 times. Materialize once
    // (same recompute trap as the triangle census edge build).
    val cand = graft.operators.GraphOps.materializeOnce(
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cosine", graft.functions.VectorOps.cosine("qe", "embedding"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 8)
        .select(col("qid"), col("vec_id").as("doc_id"),
          floor(col("cosine") * lit(1e9)).cast("long").as("relq"),
          col("embedding").as("de")), "mmr_cand")
    val pair = cand.select(col("qid"), col("doc_id").as("d1"), col("de").as("e1"))
      .join(cand.select(col("qid"), col("doc_id").as("d2"), col("de").as("e2")), Seq("qid"))
      .filter(col("d1") =!= col("d2"))
      .select(col("qid"), col("d1"), col("d2"),
        floor(graft.functions.VectorOps.cosine("e1", "e2") * lit(1e9))
          .cast("long").as("simq"))
    // bounded artifacts to the driver: ≤ 8 candidates × |Q|=5 rows and
    // their ≤ 8·7·|Q| pairwise sims, all integer-quantized already
    val candRows = cand.select("qid", "doc_id", "relq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val simq = pair.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val picks = Vector.newBuilder[(Long, Int, Long, Long)]
    candRows.map(_._1).distinct.foreach { qid =>
      val cs = candRows.filter(_._1 == qid)
      // pick 1: max relq, doc_id tie-break; mmrq = 7·relq
      val first = cs.minBy { case (_, d, rel) => (-rel, d) }
      picks += ((qid, 1, first._2, first._3 * 7L))
      var selected = Set(first._2)
      for (t <- 2 to 4) {
        // pen = max simq to any selected doc (every remaining candidate
        // has a pair row with every selected one — same-qid cand×cand)
        val scored = cs.filter(c => !selected.contains(c._2)).flatMap {
          case (_, d, rel) =>
            val pens = selected.toSeq.flatMap(s => simq.get((qid, d, s)))
            if (pens.isEmpty) None else Some((d, rel * 7L - pens.max * 3L))
        }
        if (scored.nonEmpty) {
          val (d, mmrq) = scored.minBy { case (d, m) => (-m, d) }
          picks += ((qid, t, d, mmrq))
          selected += d
        }
      }
    }
    import spark.implicits._
    picks.result().toDF("qid", "pick_order", "doc_id", "mmrq")
  }

  val qMmrRerankSql: String = {
    def round(t: Int): String =
      s"""p$t AS (
         |  SELECT qid, doc_id, mmrq, $t AS pick_order FROM (
         |    SELECT c.qid, c.doc_id, c.relq * 7 - p.penq * 3 AS mmrq,
         |      ROW_NUMBER() OVER (PARTITION BY c.qid
         |        ORDER BY (c.relq * 7 - p.penq * 3) DESC, c.doc_id) AS rk
         |    FROM cand c
         |    JOIN (SELECT pr.qid, pr.d1, MAX(pr.simq) AS penq
         |          FROM pair pr JOIN sel${t - 1} s
         |            ON pr.qid = s.qid AND pr.d2 = s.doc_id
         |          GROUP BY pr.qid, pr.d1) p
         |      ON p.qid = c.qid AND p.d1 = c.doc_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s2
         |                      WHERE s2.qid = c.qid AND s2.doc_id = c.doc_id))
         |  WHERE rk = 1),
         |sel$t AS (SELECT qid, doc_id FROM sel${t - 1}
         |          UNION ALL SELECT qid, doc_id FROM p$t)""".stripMargin
    s"""WITH qv AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
       |cand AS (
       |  SELECT qid, doc_id, relq FROM (
       |    SELECT q.qid, e.vec_id AS doc_id,
       |      CAST(FLOOR((${VectorQueries.cosineSql("q.qe", "e.embedding")}) * 1e9)
       |        AS BIGINT) AS relq,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid
       |        ORDER BY ${VectorQueries.cosineSql("q.qe", "e.embedding")} DESC,
       |        e.vec_id) AS rk
       |    FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> q.qid)
       |  WHERE rk <= 8),
       |pair AS (
       |  SELECT c1.qid, c1.doc_id AS d1, c2.doc_id AS d2,
       |    CAST(FLOOR((${VectorQueries.cosineSql("e1.embedding", "e2.embedding")}) * 1e9)
       |      AS BIGINT) AS simq
       |  FROM cand c1
       |  JOIN cand c2 ON c1.qid = c2.qid AND c1.doc_id <> c2.doc_id
       |  JOIN embeddings e1 ON e1.vec_id = c1.doc_id
       |  JOIN embeddings e2 ON e2.vec_id = c2.doc_id),
       |p1 AS (
       |  SELECT qid, doc_id, relq * 7 AS mmrq, 1 AS pick_order FROM (
       |    SELECT qid, doc_id, relq,
       |      ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY relq DESC, doc_id) AS rk
       |    FROM cand)
       |  WHERE rk = 1),
       |sel1 AS (SELECT qid, doc_id FROM p1),
       |${round(2)},
       |${round(3)},
       |${round(4)}
       |SELECT qid, pick_order, doc_id, mmrq FROM (
       |  SELECT * FROM p1 UNION ALL SELECT * FROM p2
       |  UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retrieval_eval" -> (qRetrievalEval _),
    "q_mmr_rerank" -> (qMmrRerank _),
    "q_tfidf" -> (qTfidf _),
    "q_bm25" -> (qBm25 _),
    "q_bm25_params" -> (qBm25Params _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_unigram_typicality" -> (qUnigramTypicality _),
    "q_doc_entropy" -> (qDocEntropy _),
    "q_rrf_fusion" -> (qRrfFusion _),
    "q_rrf_recall" -> (qRrfRecall _),
  )

  val oracle: Map[String, String] = Map(
    "q_tfidf" -> qTfidfSql,
    "q_bm25" -> qBm25Sql,
    "q_bm25_params" -> qBm25ParamsSql,
    "q_dedup_incremental" -> qDedupIncrementalSql,
    "q_unigram_typicality" -> qUnigramTypicalitySql,
    "q_doc_entropy" -> qDocEntropySql,
    "q_rrf_fusion" -> qRrfFusionSql,
    "q_rrf_recall" -> qRrfRecallSql,
    "q_retrieval_eval" -> qRetrievalEvalSql,
    "q_mmr_rerank" -> qMmrRerankSql,
  )
}
