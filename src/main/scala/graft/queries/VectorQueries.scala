package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorOps

/** Similarity search over the embeddings table (SURVEY §7.1 step 7;
  * reference KNN probes eval/knn.py).
  */
object VectorQueries {

  /** Floor-quantized element-mean aggregate (1e-6 resolution) — THE
    * centroid arithmetic for the whole IVF family (qCentroidAssign,
    * qIvfSearch, qKmeansRefine). One definition so a change to the
    * quantization scale or mean form can never leave a sibling query
    * stale; each oracle's SQL mirrors this exact text. */
  private def quantMeanAgg: Column =
    (sum(floor(col("v").cast("double") * 1e6).cast("long")).cast("double") /
      lit(1e6) / count(lit(1))).as("c")

  /** Floor-quantized dot-product aggregate (1e-9 resolution) — the
    * assignment arithmetic shared by the same family. */
  private def quantDotAgg: Column =
    sum(floor(col("v").cast("double") * col("c") * 1e9).cast("long")).as("qdot")

  /** Coarse-quantizer cluster count. At fixture scale 32 proves the
    * knob is independent of label cardinality (10); at corpus scale a
    * caller sets k ∝ √n (FAISS IVF guidance; SemDeDup uses ~100k
    * clusters) — every routing consumer inherits the choice because
    * the centroids are trained, not derived from a label column. */
  private[graft] val RoutingK = 32

  /** One Lloyd assignment step: every vector to its argmax
    * quantized-dot centroid, cid tie-break — deterministic and
    * partition-invariant. `cent` is (cid, pos, c), broadcast (k×dim
    * rows at any corpus scale); the aggregation keys on vec_id. */
  private def lloydAssign(exp: DataFrame, cent: DataFrame): DataFrame = {
    val dots = exp.join(broadcast(cent), "pos")
      .groupBy(col("vec_id"), col("cid"))
      .agg(quantDotAgg)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("qdot").desc, col("cid"))
    dots.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).select(col("vec_id"), col("cid"))
  }

  /** Centroid (re-)estimate from an assignment: floor-quantized exact
    * element means, one shuffle keyed (cid, pos). A cluster that
    * loses every member simply drops out — the deterministic
    * empty-cluster rule, identical in the SQL mirror (GROUP BY emits
    * no row for an empty group). */
  private def lloydCentroids(exp: DataFrame, assign: DataFrame): DataFrame =
    exp.join(assign, "vec_id").groupBy(col("cid"), col("pos")).agg(quantMeanAgg)

  /** DuckDB text of the same sequential-fold dot product. */
  private[queries] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private[queries] def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Brute-force cosine top-k: the exact baseline. The 5 query
    * vectors broadcast; the candidate scan is embarrassingly parallel
    * and the only shuffle is the per-query top-k window (k rows per
    * query survive). At 100 TB the same plan holds with any number of
    * queries ≪ corpus; beyond that, the LSH variant below. */
  def qCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", VectorOps.cosine("qe", "embedding"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "vec_id", "cosine")
  }

  val qCosineTopkSql: String =
    s"""SELECT qid, rank, vec_id, cosine FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS vec_id,
       |    ${cosineSql("q.embedding", "e.embedding")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosineSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
       |  FROM embeddings q CROSS JOIN embeddings e
       |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
       |WHERE rank <= 5""".stripMargin

  /** Sign-LSH ANN with 4 bands × 4 bits: candidates share ANY band
    * bucket (equi-join on (band, bucket) — the scale path; multiple
    * bands union for recall, like MinHash banding), then exact cosine
    * + top-3 among candidates. */
  def qAnnSignLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val bands = e
      .select(col("vec_id"), col("embedding"),
        posexplode(VectorOps.signBands("embedding", 4, 4)).as(Seq("band", "bucket")))
    val qBands = bands.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("band"), col("bucket"))
    val cand = bands.join(broadcast(qBands), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.join(e, "vec_id").join(broadcast(q), "qid")
      .withColumn("cosine", VectorOps.cosine("qe", "embedding"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("qid", "rank", "vec_id", "cosine")
  }

  private val bandsSql =
    """SELECT vec_id, embedding, r['band'] AS band, r['bucket'] AS bucket FROM (
      |  SELECT vec_id, embedding, unnest(list_transform(range(4), b ->
      |    {'band': b,
      |     'bucket': CAST(list_sum(list_transform(range(4),
      |        i -> CASE WHEN embedding[b*4 + i + 1] >= 0
      |             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT)})) AS r
      |  FROM embeddings)""".stripMargin

  val qAnnSignLshSql: String =
    s"""WITH bands AS ($bandsSql),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, e.vec_id AS vec_id
       |  FROM bands q JOIN bands e ON q.band = e.band AND q.bucket = e.bucket
       |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
       |SELECT qid, rank, vec_id, cosine FROM (
       |  SELECT c.qid, c.vec_id,
       |    ${cosineSql("q.embedding", "e.embedding")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY c.qid
       |      ORDER BY ${cosineSql("q.embedding", "e.embedding")} DESC, c.vec_id) AS rank
       |  FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  JOIN embeddings q ON q.vec_id = c.qid)
       |WHERE rank <= 3""".stripMargin

  /** ANN quality evaluation: recall@3 of an approximate index's
    * top-3 against the brute-force exact baseline
    * ([[qCosineTopkNative]]) — the metric that decides whether an
    * approximate index is good enough to replace the exact scan (the
    * reference's KNN eval loop, eval/knn.py:4-73, asks exactly this
    * of its retrieval). Deterministic end to end: both sides break
    * distance ties by vec_id, so the hit count is oracle-exact; the
    * ratio is one IEEE division (correctly rounded, engine-invariant).
    *
    * Shape at scale: both inputs are already-scale-safe query plans
    * (broadcast queries / banded or probed candidates); this adds
    * only a left join + aggregation over nq×k rows — nothing
    * corpus-sized moves. */
  /** The brute-force top-3 ground truth, built ONCE per data dir and
    * stored as a warehouse table ([[graft.operators.IndexStore]] —
    * nq×3 rows): q_ann_recall and q_ivf_recall scan it instead of
    * each re-running the full [[qCosineTopkNative]] corpus pass,
    * halving the eval family's cost and removing its one noise-prone
    * subplan. Deterministic, so cross-session reuse is
    * observation-free. */
  private def bruteTop3(spark: SparkSession, dir: String): DataFrame =
    graft.operators.IndexStore.materialize(spark, "brute_top3",
        graft.operators.IndexStore.dataKey(dir)) {
      qCosineTopkNative(spark, dir).filter(col("rank") <= 3)
        .select(col("qid"), col("vec_id"))
    }

  private def recallAt3(spark: SparkSession, dir: String,
      ann: DataFrame): DataFrame = {
    val brute = bruteTop3(spark, dir)
    val hits = ann.select(col("qid"), col("vec_id"), lit(1).as("hit"))
    brute.join(hits, Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(col("hit")).as("hits"))
      .select(col("qid"), col("hits"),
        (col("hits").cast("double") / lit(3.0)).as("recall_at_3"))
  }

  /** Recall@3 of the sign-LSH path ([[qAnnSignLsh]]). */
  def qAnnRecall(spark: SparkSession, dir: String): DataFrame =
    recallAt3(spark, dir, qAnnSignLsh(spark, dir))

  /** Composes the sibling queries' SQL verbatim (same one-definition
    * rule as `bandsSql`): a ranking or tie-break change in either
    * baseline can never leave this oracle stale. The 3-cutoff and
    * /3.0 denominator are the metric's k, tied to the index queries'
    * top-3. */
  private def recallAt3Sql(annSql: String): String =
    s"""SELECT b.qid, COUNT(a.vec_id) AS hits,
       |  CAST(COUNT(a.vec_id) AS DOUBLE) / 3.0 AS recall_at_3
       |FROM (SELECT qid, vec_id FROM ($qCosineTopkSql) WHERE rank <= 3) b
       |LEFT JOIN (SELECT qid, vec_id FROM ($annSql)) a
       |  ON a.qid = b.qid AND a.vec_id = b.vec_id
       |GROUP BY b.qid""".stripMargin

  val qAnnRecallSql: String = recallAt3Sql(qAnnSignLshSql)

  /** Same exact top-k as [[qCosineTopk]] but through the native
    * codegen'd `cosine_sim` Catalyst expression
    * ([[graft.expressions.CosineSimilarity]], registered by
    * GraftExtensions) — one fused loop instead of
    * zip_with+aggregate; identical results, same oracle. */
  def qCosineTopkNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", expr("cosine_sim(qe, embedding)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "vec_id", "cosine")
  }

  /** IVF-style assignment: per-label centroids (floor-quantized
    * element-wise mean — exact integer sums, SURVEY §7.3 hard-part 3
    * style determinism), then each vector assigned to the
    * max-dot-product centroid; output is the label×assigned confusion
    * matrix. The centroid table is tiny and broadcasts; the big side
    * shuffles once on (vec_id). */
  def qCentroidAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val exp = e.select(col("label"), col("vec_id"),
      posexplode(col("embedding")).as(Seq("pos", "v")))
    val cent = exp.groupBy(col("label"), col("pos"))
      .agg(quantMeanAgg)
      .select(col("label").as("clabel"), col("pos"), col("c"))
    val dots = exp.join(broadcast(cent), "pos")
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(quantDotAgg)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("qdot").desc, col("clabel"))
    dots.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("label"), col("clabel").as("assigned"))
      .agg(count(lit(1)).as("n"))
  }

  val qCentroidAssignSql: String =
    """WITH exp AS (
      |  SELECT label, vec_id, r['pos'] AS pos, r['v'] AS v FROM (
      |    SELECT label, vec_id,
      |      unnest(list_transform(range(len(embedding)),
      |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
      |    FROM embeddings)),
      |cent AS (
      |  SELECT label AS clabel, pos,
      |    CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
      |      / 1000000.0 / COUNT(*) AS c
      |  FROM exp GROUP BY 1, 2),
      |dots AS (
      |  SELECT e.vec_id, e.label, c.clabel,
      |    SUM(CAST(FLOOR(CAST(e.v AS DOUBLE) * c.c * 1000000000.0) AS BIGINT)) AS qdot
      |  FROM exp e JOIN cent c ON e.pos = c.pos
      |  GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT vec_id, label, clabel,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY qdot DESC, clabel) AS rk
      |  FROM dots)
      |SELECT label, clabel AS assigned, COUNT(*) AS n
      |FROM best WHERE rk = 1 GROUP BY 1, 2""".stripMargin

  /** Embedding-cosine near-dup pairs (the BASELINE dedup mandate's
    * embedding variant): candidates from the same 4-band sign-LSH
    * blocking as the ANN path (equi-join, no cross join), then exact
    * cosine ≥ 0.45 keeps near-duplicates. The oracle mirrors the
    * banding, so the check also pins the blocking semantics. */
  def qEmbedNeardup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // materialize the band table once (r19 opt): the self-join's build
    // side is a BroadcastExchange, so the sign-band explode re-ran per
    // side. Project the embedding OUT first — the candidate join needs
    // only (vec_id, band, bucket), and checkpointing 4 copies of every
    // vector would cost more than the saved explode (guide §2.3:
    // shuffle/store keys, not payloads).
    val bands = graft.operators.GraphOps.materializeOnce(
      e.select(col("vec_id"),
        posexplode(VectorOps.signBands("embedding", 4, 4)).as(Seq("band", "bucket"))),
      "embed_neardup_bands")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb")).distinct()
    cand
      .join(e.select(col("vec_id").as("ida"), col("embedding").as("ea")), "ida")
      .join(e.select(col("vec_id").as("idb"), col("embedding").as("eb")), "idb")
      .withColumn("cosine", expr("cosine_sim(ea, eb)"))
      .filter(col("cosine") >= 0.45)
      .select("ida", "idb", "cosine")
  }

  val qEmbedNeardupSql: String =
    s"""WITH bands AS ($bandsSql),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT c.ida, c.idb,
       |  ${cosineSql("x.embedding", "y.embedding")} AS cosine
       |FROM cand c
       |JOIN embeddings x ON x.vec_id = c.ida
       |JOIN embeddings y ON y.vec_id = c.idb
       |WHERE ${cosineSql("x.embedding", "y.embedding")} >= 0.45""".stripMargin

  /** The Lloyd TRAINING plan alone — deterministic `vec_id % k` init,
    * one quantized-mean estimate, one argmax-dot re-assignment, one
    * refined mean ([[lloydAssign]]/[[lloydCentroids]], the generalized
    * qKmeansRefine machinery). Output (cid, pos, c): the trained
    * coarse-quantizer centroids. This is the index BUILD step; it runs
    * once per (session, dir, k) via [[trainedCentroids]] — never
    * inline in a search consumer. */
  private def ivfTrain(e: DataFrame, k: Int): DataFrame = {
    val exp = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
    val init = e.select(col("vec_id"), (col("vec_id") % k).cast("int").as("cid"))
    lloydCentroids(exp, lloydAssign(exp, lloydCentroids(exp, init)))
  }

  /** SEARCH-side routing against an already-trained centroid table:
    * quantized-exact dot of every vector vs every centroid, ranked per
    * vector by descending dot with cid tie-break. One broadcast of
    * k×dim centroid rows + one aggregation keyed on vec_id — no
    * training passes. Returns (vec_id, cid, qdot, rk); rk=1 is the
    * assignment, rk<=n the n probe lists. */
  private def rankCentroids(e: DataFrame, cent: DataFrame): DataFrame = {
    val exp = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
    val dots = exp.join(broadcast(cent), "pos")
      .groupBy(col("vec_id"), col("cid"))
      .agg(quantDotAgg)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("qdot").desc, col("cid"))
    dots.withColumn("rk", row_number().over(wAssign))
  }

  /** The TRAINED coarse-quantizer routing shared by [[qIvfSearch]],
    * [[qIvfPqSearch]], [[qSemDedup]], and [[qClusterBalance]]
    * (mirrored CTE-for-CTE by [[ivfRoutingSql]]): [[ivfTrain]] then
    * [[rankCentroids]] fused into ONE plan. k is a KNOB, not label
    * cardinality: the O(n²/k) bounds downstream scaladocs claim are
    * real because a corpus-scale caller raises k with n. One engine
    * copy, one SQL copy — a change to the quantization scale,
    * iteration count, or tie-break lands in every graded query and
    * its oracle at once instead of desynchronizing one.
    *
    * This fused form is the path for ARBITRARY in-memory inputs (the
    * adversarial guard spec trains on a synthetic fixture); the graded
    * consumers all go through the split build/search lifecycle
    * ([[trainedCentroids]] + [[ivfRanked]]) instead — at 100 TB you
    * build the index once and search it many times (the reference
    * fits once per eval, eval/knn.py:4-73), never retrain per query. */
  private[graft] def ivfRouting(e: DataFrame, k: Int = RoutingK): DataFrame =
    rankCentroids(e, ivfTrain(e, k))

  /** The trained centroid table per (dir, k), stored as a warehouse
    * table ([[graft.operators.IndexStore]]): k×dim rows (32×64 at the
    * default knob) regardless of corpus size — the artifact FAISS
    * ships as the trained index header, here as parquet any session
    * scans back. Deterministic arithmetic end to end (floor-quantized
    * sums, cid tie-breaks), so cross-session reuse is
    * observation-free and a rebuild is bit-identical. */
  private[graft] def trainedCentroids(spark: SparkSession, dir: String,
      k: Int = RoutingK): DataFrame =
    graft.operators.IndexStore.materialize(spark, "ivf_centroids",
        graft.operators.IndexStore.dataKey(dir, k.toString)) {
      ivfTrain(Tables.embeddings(spark, dir), k)
    }

  /** The materialized index SEARCH side: (vec_id, cid, rk) for rk<=2 —
    * the assignment (rk=1) plus the nprobe=2 probe lists every
    * consumer needs — stored as a warehouse table per (dir, k) so the
    * assignment scan runs once EVER, not once per query or session.
    * This is the inverted-index lifecycle at 100 TB: the assignment
    * table is written beside the corpus (partitioned by cid) and
    * every search reads it; rebuilds are deterministic (quantized
    * dots, cid tie-breaks), so the stored table is bit-equivalent to
    * a fresh pass. */
  private[graft] def ivfRanked(spark: SparkSession, dir: String, k: Int = RoutingK): DataFrame =
    graft.operators.IndexStore.materialize(spark, "ivf_assign",
        graft.operators.IndexStore.dataKey(dir, k.toString)) {
      rankCentroids(Tables.embeddings(spark, dir), trainedCentroids(spark, dir, k))
        .filter(col("rk") <= 2)
        .select(col("vec_id"), col("cid"), col("rk"))
    }

  /** [[ivfRouting]]'s SQL mirror — CTEs `init`, `cent0`, `d0`, `a1`,
    * `cent`, `dots`, `ranked`, `assigned`; expects an `exp` CTE with
    * (vec_id, pos, v) already in scope (extra columns fine). */
  private val ivfRoutingSql: String =
    s"""init AS (SELECT vec_id, CAST(vec_id % $RoutingK AS INT) AS cid FROM embeddings),
      |cent0 AS (
      |  SELECT i.cid, e.pos,
      |    CAST(SUM(CAST(FLOOR(CAST(e.v AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
      |      / 1000000.0 / COUNT(*) AS c
      |  FROM exp e JOIN init i ON e.vec_id = i.vec_id GROUP BY 1, 2),
      |d0 AS (
      |  SELECT e.vec_id, c.cid,
      |    SUM(CAST(FLOOR(CAST(e.v AS DOUBLE) * c.c * 1000000000.0) AS BIGINT)) AS qdot
      |  FROM exp e JOIN cent0 c ON e.pos = c.pos GROUP BY 1, 2),
      |a1 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY qdot DESC, cid) AS rk
      |    FROM d0) WHERE rk = 1),
      |cent AS (
      |  SELECT a.cid, e.pos,
      |    CAST(SUM(CAST(FLOOR(CAST(e.v AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
      |      / 1000000.0 / COUNT(*) AS c
      |  FROM exp e JOIN a1 a ON e.vec_id = a.vec_id GROUP BY 1, 2),
      |dots AS (
      |  SELECT e.vec_id, c.cid,
      |    SUM(CAST(FLOOR(CAST(e.v AS DOUBLE) * c.c * 1000000000.0) AS BIGINT)) AS qdot
      |  FROM exp e JOIN cent c ON e.pos = c.pos GROUP BY 1, 2),
      |ranked AS (
      |  SELECT vec_id, cid,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY qdot DESC, cid) AS rk
      |  FROM dots),
      |assigned AS (SELECT vec_id, cid FROM ranked WHERE rk = 1)""".stripMargin

  /** The index BUILD step as a declared, oracle-graded query: the
    * trained coarse-quantizer centroid table (cid, pos, c) that every
    * IVF-family search reads. Grading the build separately from the
    * searches pins the train-once/search-many lifecycle: the oracle
    * recomputes the full Lloyd chain independently, so a hash match
    * proves the memoized artifact equals a from-scratch training —
    * exactly the invariant that lets a 100 TB deployment persist the
    * index and trust every later search. */
  def qIvfBuild(spark: SparkSession, dir: String): DataFrame =
    trainedCentroids(spark, dir)
      .select(col("cid"), col("pos").cast("long").as("pos"), col("c"))

  val qIvfBuildSql: String =
    s"""WITH exp AS (
       |  SELECT vec_id, r['pos'] AS pos, r['v'] AS v FROM (
       |    SELECT vec_id,
       |      unnest(list_transform(range(len(embedding)),
       |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
       |    FROM embeddings)),
       |$ivfRoutingSql
       |SELECT cid, pos, c FROM cent""".stripMargin

  /** Per-cluster all-pairs size cap for [[qSemDedup]]: clusters at or
    * under the cap pair exhaustively (O(cap²) each); clusters above
    * it switch to the guarded star-blocked path. 16 exercises BOTH
    * paths at the graded sf0.01 (trained k=32 cluster sizes 11–20)
    * and routes everything through the guard at sf0.1 (sizes 50–94)
    * — the scale direction that matters. */
  private[graft] val SemDedupCap = 16

  /** Candidate pairs for [[qSemDedup]] with the per-cluster expansion
    * GUARD: clusters of size ≤ cap pair all-vs-all (bounded O(cap²)
    * per cluster); an OVERSIZED cluster — the failure mode that makes
    * unguarded within-cluster all-pairs quadratic when k lags corpus
    * growth — is sub-blocked by the [[qEmbedNeardup]] 4×4 sign-LSH
    * bands, and within each (cid, band, bucket) every member pairs
    * only with the bucket's MINIMUM vec_id (star candidates). That
    * caps an oversized cluster's candidate count at bands×members
    * (LINEAR in cluster size, a hard bound even when every vector is
    * identical — plain bucket all-pairs would still be quadratic
    * there), and for the near-clique clusters dedup targets the
    * bucket-min anchor IS the keeper, so detection is preserved;
    * chains across anchors resolve downstream (q_dup_clusters runs
    * connected components over exactly such pair sets). Deterministic:
    * cluster assignment, bucket contents, and bucket minima are all
    * order-independent. */
  private[graft] def semDedupCandidates(e: DataFrame, cap: Int = SemDedupCap): DataFrame =
    semDedupPairs(e,
      ivfRouting(e).filter(col("rk") === 1).select(col("vec_id"), col("cid")), cap)

  /** The guard itself, over a caller-supplied assignment — the graded
    * path feeds the materialized [[ivfRanked]] index, the adversarial
    * spec a fixture trained inline via [[semDedupCandidates]]. */
  private def semDedupPairs(e: DataFrame, assigned: DataFrame, cap: Int): DataFrame = {
    val sizes = assigned.groupBy(col("cid")).agg(count(lit(1)).as("csz"))
    val m = assigned.join(broadcast(sizes), "cid") // sizes = k rows
    val small = m.filter(col("csz") <= cap)
    val smallPairs = small.select(col("vec_id").as("ida"), col("cid"))
      .join(small.select(col("vec_id").as("idb"), col("cid").as("cidb")),
        col("cid") === col("cidb") && col("ida") < col("idb"))
      .select(col("cid"), col("ida"), col("idb"))
    val bigBands = m.filter(col("csz") > cap)
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("cid"), col("vec_id"),
        posexplode(VectorOps.signBands("embedding", 4, 4)).as(Seq("band", "bucket")))
    val anchors = bigBands.groupBy(col("cid"), col("band"), col("bucket"))
      .agg(min(col("vec_id")).as("ida"))
    val bigPairs = bigBands.join(anchors, Seq("cid", "band", "bucket"))
      .filter(col("ida") < col("vec_id"))
      .select(col("cid"), col("ida"), col("vec_id").as("idb"))
      .distinct()
    smallPairs.unionByName(bigPairs)
  }

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540,
    * public method): cluster the corpus with the shared TRAINED
    * coarse quantizer ([[ivfRouting]], rk=1 assignment), then compute
    * exact cosine only within each cluster, through the guarded
    * candidate set ([[semDedupCandidates]]) — O(n²/k) by the k knob
    * plus a per-cluster linear fallback, vs the LSH-banded variant
    * ([[qEmbedNeardup]]) which bounds candidates by bucket collisions
    * alone. Any pair above the threshold marks the higher vec_id a
    * duplicate of its lowest-id partner (the keeper), deterministic
    * under any partitioning. Plan: centroids broadcast inside the
    * routing, every candidate join is keyed (cid or cid+band+bucket —
    * NO cross join), and the final per-duplicate resolution is one
    * groupBy on the duplicate id. Reference: the dedup mandate
    * (BASELINE embedding variant); dataops/dataset.py dedup hooks. */
  def qSemDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val assigned = ivfRanked(spark, dir).filter(col("rk") === 1)
      .select(col("vec_id"), col("cid"))
    semDedupPairs(e, assigned, SemDedupCap)
      .join(e.select(col("vec_id").as("ida"), col("embedding").as("ea")), "ida")
      .join(e.select(col("vec_id").as("idb"), col("embedding").as("eb")), "idb")
      .withColumn("cosine", expr("cosine_sim(ea, eb)"))
      .filter(col("cosine") >= 0.4)
      .groupBy(col("idb").as("dup_id"), col("cid"))
      .agg(min(col("ida")).as("kept_id"), max(col("cosine")).as("max_cosine"))
  }

  val qSemDedupSql: String =
    s"""WITH exp AS (
       |  SELECT vec_id, label, r['pos'] AS pos, r['v'] AS v FROM (
       |    SELECT vec_id, label,
       |      unnest(list_transform(range(len(embedding)),
       |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
       |    FROM embeddings)),
       |$ivfRoutingSql,
       |sizes AS (SELECT cid, COUNT(*) AS csz FROM assigned GROUP BY 1),
       |m AS (
       |  SELECT a.vec_id, a.cid, s.csz
       |  FROM assigned a JOIN sizes s ON a.cid = s.cid),
       |small_pairs AS (
       |  SELECT a.cid, a.vec_id AS ida, b.vec_id AS idb
       |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE a.csz <= $SemDedupCap AND b.csz <= $SemDedupCap),
       |bands AS ($bandsSql),
       |bigb AS (
       |  SELECT m.cid, b.band, b.bucket, m.vec_id
       |  FROM m JOIN bands b ON b.vec_id = m.vec_id WHERE m.csz > $SemDedupCap),
       |anchors AS (
       |  SELECT cid, band, bucket, MIN(vec_id) AS ida
       |  FROM bigb GROUP BY 1, 2, 3),
       |big_pairs AS (
       |  SELECT DISTINCT g.cid, a.ida, g.vec_id AS idb
       |  FROM bigb g JOIN anchors a
       |    ON g.cid = a.cid AND g.band = a.band AND g.bucket = a.bucket
       |  WHERE a.ida < g.vec_id),
       |cand AS (
       |  SELECT * FROM small_pairs UNION ALL SELECT * FROM big_pairs),
       |pairs AS (
       |  SELECT c.cid, c.ida, c.idb,
       |    ${cosineSql("x.embedding", "y.embedding")} AS cosine
       |  FROM cand c
       |  JOIN embeddings x ON x.vec_id = c.ida
       |  JOIN embeddings y ON y.vec_id = c.idb)
       |SELECT idb AS dup_id, cid, MIN(ida) AS kept_id, MAX(cosine) AS max_cosine
       |FROM pairs WHERE cosine >= 0.4 GROUP BY 1, 2""".stripMargin

  /** IVF search: each query probes only the vectors assigned to its
    * top-2 of the k=32 trained centroids (nprobe=2 — a 2/k probe
    * fraction that SHRINKS as a corpus-scale caller raises k) instead
    * of the whole corpus — the inverted-file ANN scale path. Routing
    * comes from the materialized per-(session, dir) index
    * ([[ivfRanked]]); the probe choice is deterministic
    * (quantized-exact dots) and the final rank is exact cosine over
    * the shortlist. The only large shuffle keys on the
    * assigned-centroid id (the IVF partition key at 100 TB). */
  def qIvfSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val ranked = ivfRanked(spark, dir)
    val assigned = ranked.filter(col("rk") === 1).select(col("vec_id"), col("cid"))
    val probes = ranked.filter(col("rk") <= 2 && col("vec_id") < 5) // nprobe = 2
      .select(col("vec_id").as("qid"), col("cid"))
    val qv = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    probes.join(assigned, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(qv), "qid")
      .withColumn("cosine", expr("cosine_sim(qe, embedding)"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select("qid", "rank", "vec_id", "cosine")
  }

  val qIvfSearchSql: String =
    s"""WITH exp AS (
       |  SELECT vec_id, label, r['pos'] AS pos, r['v'] AS v FROM (
       |    SELECT vec_id, label,
       |      unnest(list_transform(range(len(embedding)),
       |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
       |    FROM embeddings)),
       |$ivfRoutingSql,
       |probes AS (SELECT vec_id AS qid, cid FROM ranked WHERE rk <= 2 AND vec_id < 5),
       |cand AS (
       |  SELECT DISTINCT p.qid, a.vec_id
       |  FROM probes p JOIN assigned a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.qid)
       |SELECT qid, rank, vec_id, cosine FROM (
       |  SELECT c.qid, c.vec_id,
       |    ${cosineSql("q.embedding", "e.embedding")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY c.qid
       |      ORDER BY ${cosineSql("q.embedding", "e.embedding")} DESC, c.vec_id) AS rank
       |  FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  JOIN embeddings q ON q.vec_id = c.qid)
       |WHERE rank <= 3""".stripMargin

  /** Recall@3 of the IVF nprobe=2 path ([[qIvfSearch]]) — paired
    * with [[qAnnRecall]] so the two index families' quality is
    * directly comparable on the same baseline (the index-selection
    * decision the eval loop exists for). */
  def qIvfRecall(spark: SparkSession, dir: String): DataFrame =
    recallAt3(spark, dir, qIvfSearch(spark, dir))

  val qIvfRecallSql: String = recallAt3Sql(qIvfSearchSql)

  /** K-means refinement — the declared, oracle-graded exposure of the
    * Lloyd machinery the IVF family trains its coarse quantizer with
    * ([[lloydAssign]]/[[lloydCentroids]]; [[ivfRouting]] runs the
    * same steps at k=[[RoutingK]]): k=8 here, deterministic hash init
    * (cluster j seeds from vectors with vec_id % 8 = j), two Lloyd
    * iterations unrolled as a declarative plan — assignment is argmax of the floor-quantized
    * dot product (deterministic, cid tie-break), centroids are
    * floor-quantized element means, so every step is
    * oracle-expressible and partition-invariant. Output: final
    * cluster sizes and the label mix per cluster. At 100 TB each
    * iteration is one broadcast of k×dim centroids + one shuffle on
    * vec_id — the standard distributed Lloyd shape with a FIXED
    * iteration count (the streaming-friendly variant; convergence
    * loops are driver-side control flow by nature). */
  def qKmeansRefine(spark: SparkSession, dir: String): DataFrame = {
    val k = 8
    val e = Tables.embeddings(spark, dir)
    val exp = e.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("pos", "v")))
    // the shared Lloyd machinery ([[lloydAssign]]/[[lloydCentroids]] —
    // the same steps ivfRouting trains its k=32 quantizer with),
    // unrolled here for two iterations at k=8
    val init = e.select(col("vec_id"), (col("vec_id") % k).cast("int").as("cid"))
    val a1 = lloydAssign(exp, lloydCentroids(exp, init))
    val a2 = lloydAssign(exp, lloydCentroids(exp, a1))
    a2.join(e.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("label")).as("n_labels"),
        min(col("vec_id")).as("first_vec"))
  }

  val qKmeansRefineSql: String = {
    def centSql(assignRel: String): String =
      s"""SELECT a.cid, e.pos,
         |    CAST(SUM(CAST(FLOOR(CAST(e.v AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 / COUNT(*) AS c
         |  FROM exp e JOIN $assignRel a ON e.vec_id = a.vec_id
         |  GROUP BY 1, 2""".stripMargin
    def assignSql(centRel: String): String =
      s"""SELECT vec_id, cid FROM (
         |    SELECT d.vec_id, d.cid,
         |      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY d.qdot DESC, d.cid) AS rk
         |    FROM (
         |      SELECT e.vec_id, c.cid,
         |        SUM(CAST(FLOOR(CAST(e.v AS DOUBLE) * c.c * 1000000000.0) AS BIGINT)) AS qdot
         |      FROM exp e JOIN $centRel c ON e.pos = c.pos
         |      GROUP BY 1, 2) d)
         |  WHERE rk = 1""".stripMargin
    s"""WITH exp AS (
       |  SELECT vec_id, label, r['pos'] AS pos, r['v'] AS v FROM (
       |    SELECT vec_id, label,
       |      unnest(list_transform(range(len(embedding)),
       |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
       |    FROM embeddings)),
       |init AS (SELECT vec_id, CAST(vec_id % 8 AS INT) AS cid FROM embeddings),
       |cent0 AS (${centSql("init")}),
       |a1 AS (${assignSql("cent0")}),
       |cent1 AS (${centSql("a1")}),
       |a2 AS (${assignSql("cent1")})
       |SELECT a.cid, COUNT(*) AS n,
       |  CAST(COUNT(DISTINCT e.label) AS BIGINT) AS n_labels,
       |  MIN(a.vec_id) AS first_vec
       |FROM a2 a JOIN embeddings e ON e.vec_id = a.vec_id
       |GROUP BY 1""".stripMargin
  }

  /** Product-quantization ANN (the IVF family's memory-bounded
    * sibling — FAISS-style PQ): 64 dims split into 8 subspaces × 8
    * dims; a 16-entry codebook per subspace; every vector is encoded
    * as 8 one-byte codes; queries score candidates with asymmetric
    * distance (ADC) — the sum of per-subspace LUT entries — never
    * touching the raw vectors.
    *
    * Codebook here is sample-based (the 16 md5-ranked anchor
    * vectors' subvectors — deterministic, training-free; at 100 TB
    * the [[qKmeansRefine]] Lloyd machinery would train it per
    * subspace). All distances are floor-quantized to integers
    * (1e-9), so encoding and ADC ranking are bit-identical across
    * engines and partitionings.
    *
    * Scale shape: the codebook (16×64 doubles) broadcasts; encoding
    * is one scan + one partial-agg shuffle keyed (vec_id, sub,
    * code); the query LUT (nq×8×16 rows) broadcasts; ADC reads ONLY
    * the 8-codes-per-vector table — 64 bytes/vector instead of 256 —
    * which is the whole point of PQ at 100 TB: the candidate scan
    * fits in memory where raw vectors cannot. */
  /** The 16 deterministic md5-ranked anchor vectors whose subvectors
    * form the PQ codebook — shared by the declared quantized path and
    * the l2_sq engine path so they can never drift. */
  /** The anchor-selection query: global top-16 by md5 rank via
    * orderBy+limit → TakeOrderedAndProject (per-partition top-16
    * map-side, 16-row reduce — never a partition-less window).
    * Exposed for the plan-quality pin. */
  private[graft] def pqAnchorSelection(e: DataFrame, kSub: Int = 16): DataFrame =
    e.select(col("vec_id"),
        md5(concat(lit("pq|"), col("vec_id").cast("string"))).as("mk"))
      .orderBy(col("mk"), col("vec_id"))
      .limit(kSub)

  private def pqAnchors(spark: SparkSession, dir: String, kSub: Int = 16): DataFrame =
    // Run the TakeOrderedAndProject selection ONCE per data dir and
    // store the 16-row (aid, code) table in the warehouse. Leaving
    // the selection inline instead would duplicate a full-table-scan
    // subtree into every one of the four places the codebook feeds —
    // measured 30× slower at sf0.1 in a long-lived session — whereas
    // the stored table costs nothing to rejoin. The code assignment
    // (rank in md5 order) happens in a bounded 16-row driver pass
    // inside the BUILD step only (deterministic md5 ranking, so
    // cross-session reuse is observation-free).
    graft.operators.IndexStore.materialize(spark, "pq_anchors",
        graft.operators.IndexStore.dataKey(dir, kSub.toString)) {
      import spark.implicits._
      pqAnchorSelection(Tables.embeddings(spark, dir), kSub).collect()
        .map(r => (r.getString(1), r.getLong(0)))
        .sorted
        .zipWithIndex
        .map { case ((_, vecId), code) => (vecId, code) }
        .toSeq
        .toDF("aid", "code")
    }

  /** Engine-path PQ encoder: one fused [[graft.expressions.L2Squared]]
    * per (vector, subspace, code) over `slice`d 8-dim subvectors —
    * N×8×16 rows each doing one codegen'd 8-element loop, versus the
    * declared path's N×64×16 exploded element rows fed through a hash
    * aggregate (~8× less row traffic and no aggregation exchange; the
    * hot loop stays inside whole-stage codegen). Distances here are
    * raw doubles (argmin with code tie-break) while the declared/
    * oracle path argmins per-element floor-quantized sums — equal
    * codes unless two codebook entries are within ~1e-9 of the same
    * distance (PqFastSpec pins equality on the fixtures). */
  private[graft] def pqCodesFast(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val slices = "transform(sequence(0, 7), s -> slice(embedding, s * 8 + 1, 8))"
    val subs = e.select(col("vec_id"),
      posexplode(expr(slices)).as(Seq("sub", "svec")))
    val cbs = e.join(pqAnchors(spark, dir), col("vec_id") === col("aid"))
      .select(col("code"), posexplode(expr(slices)).as(Seq("sub", "cvec")))
    val wEnc = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d"), col("code"))
    subs.join(broadcast(cbs), Seq("sub"))
      .withColumn("d", expr("l2_sq(svec, cvec)"))
      .withColumn("rk", row_number().over(wEnc))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("sub"), col("code"))
  }

  /** (vec_id, pos, sub, v): every embedding element with its global
    * position and 8-dim subspace index — the exploded form the
    * declared PQ family aggregates over. */
  private def pqExp(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("sub", expr("CAST(pos DIV 8 AS INT)"))

  /** Quantized ||x_sub − c_sub||² for every (vector, subspace, code)
    * against codebook `cb` (code, pos, c) — the declared/
    * oracle-expressible distance table. The codebook broadcasts. */
  private def pqQdAgainst(exp: DataFrame, cb: DataFrame): DataFrame =
    exp.join(broadcast(cb), Seq("pos"))
      .groupBy(col("vec_id"), col("sub"), col("code"))
      .agg(sum(floor((col("v").cast("double") - col("c")) *
        (col("v").cast("double") - col("c")) * 1e9).cast("long")).as("qdist"))

  /** The sample-based codebook: the 16 anchors' subvectors. */
  private def pqSampleCodebook(spark: SparkSession, dir: String, exp: DataFrame): DataFrame =
    exp.join(pqAnchors(spark, dir), exp("vec_id") === col("aid"))
      .select(col("code"), col("pos"), col("v").cast("double").as("c"))

  private def pqQd(spark: SparkSession, dir: String): DataFrame = {
    val exp = pqExp(Tables.embeddings(spark, dir))
    pqQdAgainst(exp, pqSampleCodebook(spark, dir, exp))
  }

  /** One per-subspace Lloyd refinement of the sample-based codebook —
    * the [[qKmeansRefine]] machinery wired into PQ (FAISS-style
    * codebook TRAINING; sample-based anchors are only the init):
    * assign every subvector to its nearest initial code, then
    * re-estimate each (code, element) as the quantized mean of its
    * members. A code that loses every member in a subspace drops out
    * of that subspace's codebook — the deterministic empty-cluster
    * rule, identical on both engines. Output (code, pos, c), every
    * step floor-quantized so the oracle reproduces it bit-exactly.
    *
    * Scale shape: the assignment reuses the PQ encoding shuffle
    * (partial agg keyed (vec_id, sub, code)); the mean is one
    * shuffle keyed (code, pos); the codebook stays ≤16×64 rows —
    * broadcast-size at any corpus scale. */
  private[graft] def pqTrainedCodebook(spark: SparkSession, dir: String): DataFrame =
    // Codebook TRAINING is a build step, not a search step: run the
    // assignment + quantized-mean passes once per data dir and store
    // the ≤16×64-row result as a warehouse table (the same bounded
    // artifact FAISS persists as the trained PQ codebook). Quantized
    // arithmetic is deterministic, so the table round-trips
    // bit-exactly across sessions.
    graft.operators.IndexStore.materialize(spark, "pq_codebook",
        graft.operators.IndexStore.dataKey(dir)) {
      val exp = pqExp(Tables.embeddings(spark, dir))
      val a1 = argminCodes(pqQdAgainst(exp, pqSampleCodebook(spark, dir, exp)))
      exp.join(a1, Seq("vec_id", "sub"))
        .groupBy(col("code"), col("pos"))
        .agg(quantMeanAgg)
        .select(col("code"), col("pos"), col("c"))
    }

  /** Distance table under the trained codebook. */
  private def pqQdTrained(spark: SparkSession, dir: String): DataFrame =
    pqQdAgainst(pqExp(Tables.embeddings(spark, dir)),
      pqTrainedCodebook(spark, dir))

  /** Declared-path codes under the trained codebook (for the
    * PqFastSpec identity pin). */
  private[graft] def pqCodesQuantizedTrained(spark: SparkSession, dir: String): DataFrame =
    argminCodes(pqQdTrained(spark, dir))

  /** Declared-path PQ codes: argmin of the quantized distance table. */
  private def argminCodes(qd: DataFrame): DataFrame = {
    val wEnc = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("qdist"), col("code"))
    qd.withColumn("rk", row_number().over(wEnc))
      .filter(col("rk") === 1).select(col("vec_id"), col("sub"), col("code"))
  }

  private[graft] def pqCodesQuantized(spark: SparkSession, dir: String): DataFrame =
    argminCodes(pqQd(spark, dir))

  /** The ADC search tail every PQ variant shares: the query LUT is
    * the quantized distance table restricted to the 5 query vectors
    * (broadcast — nq×8×16 rows), candidates contribute only their 8
    * codes, totals rank per query. */
  private def adcSearch(codes: DataFrame, qd: DataFrame): DataFrame = {
    val lut = qd.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("sub"), col("code"), col("qdist"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qdist")).as("adist"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "vec_id", "adist")
  }

  def qPqSearch(spark: SparkSession, dir: String): DataFrame = {
    val qd = pqQd(spark, dir)
    adcSearch(argminCodes(qd), qd)
  }

  /** PQ search through the engine fast encoder: the N-scale encoding
    * step runs [[pqCodesFast]] (one fused `l2_sq` codegen loop per
    * (vector, subspace, code) over sliced subvectors — no per-element
    * explode, no aggregation exchange), while the query-side LUT (5
    * vectors × 8 subs × 16 codes) keeps the floor-quantized form, so
    * ADC totals are bit-identical to [[qPqSearch]] and the same
    * oracle grades both. Catalyst pushes the `vec_id < 5` LUT filter
    * below the distance aggregate, so the quantized path only ever
    * touches the 5 query vectors. */
  def qPqSearchFast(spark: SparkSession, dir: String): DataFrame =
    adcSearch(pqCodesFast(spark, dir), pqQd(spark, dir))

  /** PQ search under the TRAINED codebook ([[pqTrainedCodebook]]) —
    * FAISS-style PQ semantics: encode and score against Lloyd-refined
    * per-subspace centroids instead of raw sampled subvectors. Same
    * ADC tail, same top-5 contract as [[qPqSearch]]; the training
    * adds one assignment pass + one mean pass upstream, both keyed
    * shuffles, nothing driver-side beyond the same 16-row anchor
    * collect. */
  def qPqSearchTrained(spark: SparkSession, dir: String): DataFrame = {
    val qd = pqQdTrained(spark, dir)
    adcSearch(argminCodes(qd), qd)
  }

  /** Engine fast encoder under the TRAINED codebook: the
    * [[pqCodesFast]] slice-and-fold shape, but trained centroids are
    * quantized-mean DOUBLES (not float-representable), so the fused
    * distance kernel is the codegen'd zip_with/aggregate fold over
    * ARRAY<DOUBLE> instead of `l2_sq`'s ARRAY<FLOAT>. Raw-double
    * argmin with code tie-break — equal codes to the declared
    * quantized path unless two centroids sit within ~1e-9 of the
    * same distance (PqFastSpec pins equality on the fixtures). */
  private[graft] def pqCodesFastTrained(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val slices = "transform(sequence(0, 7), s -> slice(embedding, s * 8 + 1, 8))"
    val subs = e.select(col("vec_id"), posexplode(expr(slices)).as(Seq("sub", "svec")))
    val cvecs = pqTrainedCodebook(spark, dir)
      .groupBy(col("code"), expr("CAST(pos DIV 8 AS INT)").as("sub"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cvec"))
    val wEnc = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d"), col("code"))
    subs.join(broadcast(cvecs), Seq("sub"))
      .withColumn("d", expr(
        """aggregate(zip_with(svec, cvec,
          |  (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
          |  0.0D, (a, b) -> a + b)""".stripMargin))
      .withColumn("rk", row_number().over(wEnc))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("sub"), col("code"))
  }

  val qPqSearchSql: String =
    """WITH exp AS (
      |  SELECT vec_id, r['pos'] AS pos, r['pos'] // 8 AS sub, r['v'] AS v FROM (
      |    SELECT vec_id,
      |      unnest(list_transform(range(len(embedding)),
      |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
      |    FROM embeddings)),
      |anch AS (
      |  SELECT vec_id AS aid, CAST(rk - 1 AS INT) AS code FROM (
      |    SELECT vec_id, ROW_NUMBER() OVER (
      |      ORDER BY md5('pq|' || CAST(vec_id AS VARCHAR)), vec_id) AS rk
      |    FROM embeddings) WHERE rk <= 16),
      |cb AS (
      |  SELECT a.code, e.pos, CAST(e.v AS DOUBLE) AS c
      |  FROM exp e JOIN anch a ON e.vec_id = a.aid),
      |qd AS (
      |  SELECT e.vec_id, e.sub, c.code,
      |    SUM(CAST(FLOOR((CAST(e.v AS DOUBLE) - c.c) * (CAST(e.v AS DOUBLE) - c.c)
      |      * 1000000000.0) AS BIGINT)) AS qdist
      |  FROM exp e JOIN cb c ON e.pos = c.pos GROUP BY 1, 2, 3),
      |codes AS (
      |  SELECT vec_id, sub, code FROM (
      |    SELECT vec_id, sub, code,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rk
      |    FROM qd) WHERE rk = 1),
      |lut AS (SELECT vec_id AS qid, sub, code, qdist FROM qd WHERE vec_id < 5),
      |adc AS (
      |  SELECT l.qid, c.vec_id, CAST(SUM(l.qdist) AS BIGINT) AS adist
      |  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
      |  WHERE c.vec_id <> l.qid GROUP BY 1, 2)
      |SELECT qid, rank, vec_id, adist FROM (
      |  SELECT qid, vec_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rank
      |  FROM adc) WHERE rank <= 5""".stripMargin

  /** Same CTE chain as [[qPqSearchSql]] with the Lloyd refinement
    * spliced between the sample codebook and the search: qd0/a1 are
    * the assignment under the anchors' subvectors, cb1 the
    * quantized-mean re-estimate (the qKmeansRefine centSql
    * arithmetic), and the search scores against cb1. */
  val qPqSearchTrainedSql: String =
    """WITH exp AS (
      |  SELECT vec_id, r['pos'] AS pos, r['pos'] // 8 AS sub, r['v'] AS v FROM (
      |    SELECT vec_id,
      |      unnest(list_transform(range(len(embedding)),
      |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
      |    FROM embeddings)),
      |anch AS (
      |  SELECT vec_id AS aid, CAST(rk - 1 AS INT) AS code FROM (
      |    SELECT vec_id, ROW_NUMBER() OVER (
      |      ORDER BY md5('pq|' || CAST(vec_id AS VARCHAR)), vec_id) AS rk
      |    FROM embeddings) WHERE rk <= 16),
      |cb0 AS (
      |  SELECT a.code, e.pos, CAST(e.v AS DOUBLE) AS c
      |  FROM exp e JOIN anch a ON e.vec_id = a.aid),
      |qd0 AS (
      |  SELECT e.vec_id, e.sub, c.code,
      |    SUM(CAST(FLOOR((CAST(e.v AS DOUBLE) - c.c) * (CAST(e.v AS DOUBLE) - c.c)
      |      * 1000000000.0) AS BIGINT)) AS qdist
      |  FROM exp e JOIN cb0 c ON e.pos = c.pos GROUP BY 1, 2, 3),
      |a1 AS (
      |  SELECT vec_id, sub, code FROM (
      |    SELECT vec_id, sub, code,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rk
      |    FROM qd0) WHERE rk = 1),
      |cb1 AS (
      |  SELECT a.code, e.pos,
      |    CAST(SUM(CAST(FLOOR(CAST(e.v AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
      |      / 1000000.0 / COUNT(*) AS c
      |  FROM exp e JOIN a1 a ON e.vec_id = a.vec_id AND e.sub = a.sub
      |  GROUP BY 1, 2),
      |qd AS (
      |  SELECT e.vec_id, e.sub, c.code,
      |    SUM(CAST(FLOOR((CAST(e.v AS DOUBLE) - c.c) * (CAST(e.v AS DOUBLE) - c.c)
      |      * 1000000000.0) AS BIGINT)) AS qdist
      |  FROM exp e JOIN cb1 c ON e.pos = c.pos GROUP BY 1, 2, 3),
      |codes AS (
      |  SELECT vec_id, sub, code FROM (
      |    SELECT vec_id, sub, code,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rk
      |    FROM qd) WHERE rk = 1),
      |lut AS (SELECT vec_id AS qid, sub, code, qdist FROM qd WHERE vec_id < 5),
      |adc AS (
      |  SELECT l.qid, c.vec_id, CAST(SUM(l.qdist) AS BIGINT) AS adist
      |  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
      |  WHERE c.vec_id <> l.qid GROUP BY 1, 2)
      |SELECT qid, rank, vec_id, adist FROM (
      |  SELECT qid, vec_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rank
      |  FROM adc) WHERE rank <= 5""".stripMargin

  /** IVF-PQ composite search — the production 100 TB ANN layout
    * (FAISS `IVFx,PQy`): [[qIvfSearch]]'s coarse quantizer routes
    * each query to its nprobe=2 inverted lists, and within the probed
    * lists candidates are scored by [[qPqSearch]]'s asymmetric
    * distance over 8-byte PQ codes — full vectors are never touched
    * after encode time.
    *
    * Shape at scale: the ONLY per-corpus-row state the search reads
    * is (cid, 8 codes) — the inverted index; routing is a broadcast
    * of k×dim centroids + one shuffle keyed on vec_id; candidate
    * generation shuffles on cid (the IVF partition key — at 100 TB
    * each list is a parquet partition and pruning happens at the
    * scan); ADC is a broadcast of the nq×8×16 LUT joined on
    * (qid, sub, code) with the per-(qid, vec) sum as one keyed
    * aggregation. No cross join, no global window, nothing
    * driver-side beyond the shared 16-row anchor collect. */
  def qIvfPqSearch(spark: SparkSession, dir: String): DataFrame = {
    // coarse routing — the shared trained-quantizer machinery
    // (k=RoutingK Lloyd centroids, argmax dot assignment, nprobe=2),
    // read from the materialized per-(session, dir) index
    val ranked = ivfRanked(spark, dir)
    val assigned = ranked.filter(col("rk") === 1).select(col("vec_id"), col("cid"))
    val probes = ranked.filter(col("rk") <= 2 && col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("cid"))
    val cand = probes.join(assigned, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    // PQ ADC scoring restricted to the probed lists
    val qd = pqQd(spark, dir)
    val codes = argminCodes(qd)
    val lut = qd.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("sub"), col("code"), col("qdist"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    cand.join(codes, "vec_id")
      .join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qdist")).as("adist"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "vec_id", "adist")
  }

  /** [[qIvfSearchSql]]'s routing CTEs (trained k=32 centroids, argmax
    * assignment, nprobe=2 probes, probed-list candidates) spliced
    * onto [[qPqSearchSql]]'s encode/LUT/ADC chain, the ADC restricted
    * to the candidate pairs. */
  val qIvfPqSearchSql: String =
    s"""WITH exp AS (
      |  SELECT vec_id, label, r['pos'] AS pos, r['pos'] // 8 AS sub, r['v'] AS v FROM (
      |    SELECT vec_id, label,
      |      unnest(list_transform(range(len(embedding)),
      |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
      |    FROM embeddings)),
      |$ivfRoutingSql,
      |probes AS (SELECT vec_id AS qid, cid FROM ranked WHERE rk <= 2 AND vec_id < 5),
      |cand AS (
      |  SELECT DISTINCT p.qid, a.vec_id
      |  FROM probes p JOIN assigned a ON a.cid = p.cid
      |  WHERE a.vec_id <> p.qid),
      |anch AS (
      |  SELECT vec_id AS aid, CAST(rk - 1 AS INT) AS code FROM (
      |    SELECT vec_id, ROW_NUMBER() OVER (
      |      ORDER BY md5('pq|' || CAST(vec_id AS VARCHAR)), vec_id) AS rk
      |    FROM embeddings) WHERE rk <= 16),
      |cb AS (
      |  SELECT a.code, e.pos, CAST(e.v AS DOUBLE) AS c
      |  FROM exp e JOIN anch a ON e.vec_id = a.aid),
      |qd AS (
      |  SELECT e.vec_id, e.sub, c.code,
      |    SUM(CAST(FLOOR((CAST(e.v AS DOUBLE) - c.c) * (CAST(e.v AS DOUBLE) - c.c)
      |      * 1000000000.0) AS BIGINT)) AS qdist
      |  FROM exp e JOIN cb c ON e.pos = c.pos GROUP BY 1, 2, 3),
      |codes AS (
      |  SELECT vec_id, sub, code FROM (
      |    SELECT vec_id, sub, code,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rk
      |    FROM qd) WHERE rk = 1),
      |lut AS (SELECT vec_id AS qid, sub, code, qdist FROM qd WHERE vec_id < 5),
      |adc AS (
      |  SELECT n.qid, n.vec_id, CAST(SUM(l.qdist) AS BIGINT) AS adist
      |  FROM cand n
      |  JOIN codes c ON c.vec_id = n.vec_id
      |  JOIN lut l ON l.qid = n.qid AND l.sub = c.sub AND l.code = c.code
      |  GROUP BY 1, 2)
      |SELECT qid, rank, vec_id, adist FROM (
      |  SELECT qid, vec_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rank
      |  FROM adc) WHERE rank <= 5""".stripMargin

  /** Cluster-balanced subsampling — the embedding-space curation
    * shape (publicly described in SemDeDup, Abbas et al. 2023, and
    * D4, Tirumala et al. 2023: cluster the corpus in embedding
    * space, then cap each cluster's contribution so over-represented
    * regions don't dominate the training mix). Strata come from the
    * LEARNED coarse quantizer ([[ivfRouting]]'s trained k=32
    * assignment), not a label column — the difference from
    * q_class_balance. Keep-rank within each cluster is a seeded md5
    * of the vector id (the q_data_mixture deterministic-acceptance
    * pattern), cap = 12 — binding at every fixture scale (trained
    * cluster sizes 11–20 at sf0.01, 50–94 at sf0.1), so the oracle
    * actually grades the capping, not a no-op.
    *
    * Shape at scale: assignment is a broadcast of k×dim centroids +
    * one aggregation keyed on vec_id; the keep-rank window is
    * PARTITIONED by cluster id; the report is one keyed aggregation.
    * The kept-id sum is an exact integer checksum so the oracle pins
    * WHICH vectors were kept, not just how many. */
  def qClusterBalance(spark: SparkSession, dir: String): DataFrame = {
    val assigned = ivfRanked(spark, dir)
      .filter(col("rk") === 1).select(col("vec_id"), col("cid"))
    val wKeep = Window.partitionBy(col("cid"))
      .orderBy(md5(concat(lit("bal|"), col("vec_id").cast("string"))), col("vec_id"))
    assigned
      .withColumn("kr", row_number().over(wKeep))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("total"),
        count(when(col("kr") <= 12, 1)).as("kept"),
        sum(when(col("kr") <= 12, col("vec_id"))).as("kept_id_sum"))
  }

  /** [[qIvfSearchSql]]'s assignment CTEs + a per-cluster seeded
    * keep-rank window + the balance report. */
  val qClusterBalanceSql: String =
    s"""WITH exp AS (
      |  SELECT vec_id, label, r['pos'] AS pos, r['v'] AS v FROM (
      |    SELECT vec_id, label,
      |      unnest(list_transform(range(len(embedding)),
      |        i -> {'pos': i, 'v': embedding[i+1]})) AS r
      |    FROM embeddings)),
      |$ivfRoutingSql,
      |keepr AS (
      |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY cid
      |    ORDER BY md5('bal|' || CAST(vec_id AS VARCHAR)), vec_id) AS kr
      |  FROM assigned)
      |SELECT cid, COUNT(*) AS total,
      |  COUNT(CASE WHEN kr <= 12 THEN 1 END) AS kept,
      |  CAST(SUM(CASE WHEN kr <= 12 THEN vec_id END) AS BIGINT) AS kept_id_sum
      |FROM keepr GROUP BY cid""".stripMargin

  /** Per-label vector statistics: count + quantized-mean norm +
    * exact min/max norm (aggregations over computed doubles →
    * floor-quantized, per Exact.qmean). */
  def qVectorStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir)
      .withColumn("nrm", VectorOps.norm("embedding"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        Exact.qmean(col("nrm")).as("avg_norm"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
  }

  val qVectorStatsSql: String = {
    val normSql = s"sqrt(${dotSql("embedding", "embedding")})"
    s"""SELECT label, COUNT(*) AS n,
       |  ${Exact.qmeanSql(normSql)} AS avg_norm,
       |  MIN($normSql) AS min_norm,
       |  MAX($normSql) AS max_norm
       |FROM embeddings GROUP BY label""".stripMargin
  }

  /** Distributed PCA first principal component by power iteration —
    * the dimensionality-reduction step a vector pipeline runs before
    * IVF/PQ (FAISS's OPQ/PCA pretransforms are exactly this): one
    * pass builds the 64×64 covariance from the vec_id-keyed pair
    * fan-out (the ONLY corpus-sized stage; at 100 TB it is one
    * map-side-combinable aggregation keyed on (i, j)), then THREE
    * matvec iterations run DRIVER-SIDE on the collected d²-row
    * covariance artifact — the BpeTrain/PQ-anchor bounded-artifact
    * rule (d=64 is an operator constant, so the artifact is 4,096
    * rows at ANY corpus size; FAISS trains its PCA pretransform on
    * exactly this collected matrix). Expressed as d-row DataFrame
    * joins the 3 unrolled iterations planned 65 shuffle exchanges /
    * 21 SortMergeJoins (each round's crossJoin(broadcast(max)) re-
    * embeds the previous round's subtree twice —
    * plans/r19/q_pca_power_before.txt); the arithmetic is quantized
    * integer sums + a handful of IEEE ops replayed in the identical
    * order, so the driver loop is bit-identical (oracle-graded).
    *
    * Cross-engine determinism at every step: the centered products
    * quantize per-term before the covariance sum (Exact.qsum rule on
    * float-derived doubles); each matvec term floor-quantizes at 1e-9
    * so summation order cannot move a ulp; the max-abs normalizer is
    * an order-free MAX of exact longs-over-1e9; and the output pins
    * floor-quantized loadings plus the L∞ eigenvalue estimate. The
    * DuckDB oracle unrolls the same three iterations as CTEs —
    * identical integer arithmetic, so the hash proves the iteration,
    * not just the covariance. Start vector e₀ is deterministic;
    * λ₁/λ₂ ≈ separation after 3 steps is ample for the grading (both
    * engines run the SAME 3 steps regardless). */
  /** The corpus-sized stage of [[qPcaPower]] — the d²-row centered
    * covariance — exposed so PlanQualitySpec can pin its plan shape
    * (vec_id-keyed pair fan-out, never a cartesian) now that the
    * matvec tail no longer embeds it in the final plan. */
  private[graft] def pcaCov(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val exp = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast("double"))
    val n = e.agg(count(lit(1)).as("n"))
    val mu = exp.groupBy(col("pos"))
      .agg((sum(floor(col("x") * lit(1e6)).cast("long")).cast("double") /
        lit(1e6)).as("sxq"))
      .crossJoin(broadcast(n))
      .select(col("pos"), (col("sxq") / col("n").cast("double")).as("mu"))
    val centered = exp.join(broadcast(mu), "pos")
      .select(col("vec_id"), col("pos"), (col("x") - col("mu")).as("cx"))
    centered.as("a")
      .join(centered.as("b"), col("a.vec_id") === col("b.vec_id"))
      .groupBy(col("a.pos").as("i"), col("b.pos").as("j"))
      .agg((sum(floor(col("a.cx") * col("b.cx") * lit(1e6)).cast("long"))
        .cast("double") / lit(1e6)).as("c"))
  }

  def qPcaPower(spark: SparkSession, dir: String): DataFrame = {
    val cov = pcaCov(spark, dir)
    // d²-row bounded artifact to the driver; v0 = e_0; three quantized
    // matvec + L∞-normalize rounds in the SAME IEEE op order the
    // DataFrame form (and the DuckDB oracle's unrolled CTEs) compute:
    // per-term floor((c*vj)*1e9) longs, order-free long sums, one
    // divide per normalize
    val covRows = cov.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val dims = covRows.map(_._1).distinct.sorted
    var v = dims.map(j => j -> (if (j == 0) 1.0 else 0.0)).toMap
    var m = 0.0
    for (_ <- 1 to 3) {
      val wSum = new scala.collection.mutable.HashMap[Int, Long]()
      covRows.foreach { case (i, j, c) =>
        wSum(i) = wSum.getOrElse(i, 0L) + math.floor(c * v(j) * 1e9).toLong
      }
      val w = dims.map(i => i -> (wSum.getOrElse(i, 0L).toDouble / 1e9)).toMap
      m = dims.map(i => math.abs(w(i))).max
      v = dims.map(i => i -> (w(i) / m)).toMap
    }
    import spark.implicits._
    dims.toSeq
      .map(j => (j, math.floor(v(j) * 1e6).toLong, math.floor(m * 1e6).toLong))
      .toDF("pos", "loadingq", "eigq")
  }

  val qPcaPowerSql: String =
    """WITH exp AS (
      |  SELECT vec_id, CAST(i - 1 AS INT) AS pos,
      |    CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
      |n AS (SELECT COUNT(DISTINCT vec_id) AS n FROM exp),
      |mu AS (
      |  SELECT pos,
      |    (CAST(SUM(CAST(FLOOR(x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
      |      / CAST(ANY_VALUE(nn.n) AS DOUBLE) AS mu
      |  FROM exp CROSS JOIN n nn GROUP BY pos),
      |centered AS (
      |  SELECT e.vec_id, e.pos, e.x - m.mu AS cx
      |  FROM exp e JOIN mu m ON e.pos = m.pos),
      |cov AS (
      |  SELECT a.pos AS i, b.pos AS j,
      |    CAST(SUM(CAST(FLOOR(a.cx * b.cx * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS c
      |  FROM centered a JOIN centered b ON a.vec_id = b.vec_id
      |  GROUP BY 1, 2),
      |v0 AS (
      |  SELECT DISTINCT i AS j,
      |    CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END AS vj
      |  FROM cov),
      |w1 AS (
      |  SELECT cov.i,
      |    CAST(SUM(CAST(FLOOR(cov.c * v0.vj * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS w
      |  FROM cov JOIN v0 ON cov.j = v0.j GROUP BY cov.i),
      |m1 AS (SELECT MAX(abs(w)) AS m FROM w1),
      |v1 AS (SELECT w1.i AS j, w1.w / m1.m AS vj FROM w1 CROSS JOIN m1),
      |w2 AS (
      |  SELECT cov.i,
      |    CAST(SUM(CAST(FLOOR(cov.c * v1.vj * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS w
      |  FROM cov JOIN v1 ON cov.j = v1.j GROUP BY cov.i),
      |m2 AS (SELECT MAX(abs(w)) AS m FROM w2),
      |v2 AS (SELECT w2.i AS j, w2.w / m2.m AS vj FROM w2 CROSS JOIN m2),
      |w3 AS (
      |  SELECT cov.i,
      |    CAST(SUM(CAST(FLOOR(cov.c * v2.vj * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS w
      |  FROM cov JOIN v2 ON cov.j = v2.j GROUP BY cov.i),
      |m3 AS (SELECT MAX(abs(w)) AS m FROM w3),
      |v3 AS (SELECT w3.i AS j, w3.w / m3.m AS vj FROM w3 CROSS JOIN m3)
      |SELECT v3.j AS pos,
      |  CAST(FLOOR(v3.vj * 1e6) AS BIGINT) AS loadingq,
      |  CAST(FLOOR(m3.m * 1e6) AS BIGINT) AS eigq
      |FROM v3 CROSS JOIN m3""".stripMargin

  /** fp16 embedding wire-format roundtrip, oracle-graded — the
    * storage move a 100 TB vector lake actually makes (fp16 halves
    * the bytes; safetensors/faiss-style packed little-endian halfs).
    * Each embedding dim quantizes to a multiple of 2⁻⁸ (exactly
    * representable in binary16 at these magnitudes), packs through
    * the native codegen'd [[graft.expressions.FloatsToFp16]], decodes
    * back with [[graft.expressions.Fp16ToFloats]], and the per-vector
    * decoded sums + byte counts land on the hash. The oracle
    * recomputes the sums from the quantization arithmetic alone
    * (floor/×2⁸ — exact IEEE ops on both engines), so any encode OR
    * decode bit error flips the result; Fp16Spec separately proves
    * the pair exhaustively RNE-correct over all 65 536 half patterns.
    * Sums of 2⁻⁸-granular values are exact in double, so no
    * quantized-sum discipline is needed. */
  def qFp16Roundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      // clamp to |q| <= 255/256: bf16 (8 mantissa bits) only holds
      // 2^-8 multiples exactly BELOW 1.0 — without the clamp, a
      // future corpus vintage with any dim >= 1.0 would make the
      // bf16 leg diverge from the pass-through oracle and the
      // mismatch would be blamed on the codec
      .withColumn("q", expr(
        "transform(embedding, " +
          "x -> cast(greatest(-0.99609375d, least(0.99609375d, " +
          "floor(cast(x AS double) * 256.0d) / 256.0d)) AS float))"))
      .withColumn("packed", expr("fp16_pack(q)"))
      .withColumn("back", expr("fp16_vec(packed)"))
      // bf16 (8 mantissa bits) also holds 2^-8 multiples below 1.0
      // exactly, so the SAME oracle sum grades both codecs
      .withColumn("bback", expr("bf16_vec(bf16_pack(q))"))
      .select(col("vec_id"), col("label"),
        length(col("packed")).as("n_bytes"),
        expr("aggregate(back, 0.0d, (a, x) -> a + cast(x AS double))").as("dec_sum"),
        expr("aggregate(bback, 0.0d, (a, x) -> a + cast(x AS double))").as("bf16_sum"))

  val qFp16RoundtripSql: String =
    """SELECT vec_id, label,
      |  CAST(2 * len(embedding) AS INT) AS n_bytes,
      |  list_sum(list_transform(embedding,
      |    x -> greatest(-0.99609375e0, least(0.99609375e0,
      |           floor(CAST(x AS DOUBLE) * 256.0e0) / 256.0e0)))) AS dec_sum,
      |  list_sum(list_transform(embedding,
      |    x -> greatest(-0.99609375e0, least(0.99609375e0,
      |           floor(CAST(x AS DOUBLE) * 256.0e0) / 256.0e0)))) AS bf16_sum
      |FROM embeddings""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fp16_roundtrip" -> (qFp16Roundtrip _),
    "q_pca_power" -> (qPcaPower _),
    "q_cosine_topk" -> (qCosineTopk _),
    "q_cosine_topk_native" -> (qCosineTopkNative _),
    "q_ann_sign_lsh" -> (qAnnSignLsh _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_ivf_recall" -> (qIvfRecall _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_semdedup" -> (qSemDedup _),
    "q_ivf_build" -> (qIvfBuild _),
    "q_ivf_search" -> (qIvfSearch _),
    "q_kmeans_refine" -> (qKmeansRefine _),
    "q_centroid_assign" -> (qCentroidAssign _),
    "q_vector_stats" -> (qVectorStats _),
    "q_pq_search" -> (qPqSearch _),
    "q_pq_search_fast" -> (qPqSearchFast _),
    "q_pq_search_trained" -> (qPqSearchTrained _),
    "q_ivfpq_search" -> (qIvfPqSearch _),
    "q_cluster_balance" -> (qClusterBalance _),
  )

  val oracle: Map[String, String] = Map(
    "q_pca_power" -> qPcaPowerSql,
    "q_cosine_topk" -> qCosineTopkSql,
    "q_cosine_topk_native" -> qCosineTopkSql,
    "q_fp16_roundtrip" -> qFp16RoundtripSql,
    "q_ann_sign_lsh" -> qAnnSignLshSql,
    "q_ann_recall" -> qAnnRecallSql,
    "q_ivf_recall" -> qIvfRecallSql,
    "q_embed_neardup" -> qEmbedNeardupSql,
    "q_semdedup" -> qSemDedupSql,
    "q_ivf_build" -> qIvfBuildSql,
    "q_ivf_search" -> qIvfSearchSql,
    "q_kmeans_refine" -> qKmeansRefineSql,
    "q_centroid_assign" -> qCentroidAssignSql,
    "q_vector_stats" -> qVectorStatsSql,
    "q_pq_search" -> qPqSearchSql,
    "q_pq_search_fast" -> qPqSearchSql,
    "q_pq_search_trained" -> qPqSearchTrainedSql,
    "q_ivfpq_search" -> qIvfPqSearchSql,
    "q_cluster_balance" -> qClusterBalanceSql,
  )
}
