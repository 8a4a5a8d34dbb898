package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `ArrayType(FloatType)` embedding columns
  * (BASELINE.json similarity-search mandate; generalizes the
  * reference's KNN eval, eval/knn.py:4-73).
  *
  * All folds are left-to-right in array order (`aggregate` with an
  * explicit zero), so results are bit-identical on any engine that
  * folds sequentially — which is what the DuckDB `list_reduce` oracle
  * does. Elements are widened float→double (exact) before any
  * arithmetic. Everything is a Catalyst higher-order function —
  * codegen-friendly, no UDFs.
  */
object VectorOps {

  /** Sequential-fold dot product of two array columns (by SQL name). */
  def dot(a: String, b: String): Column =
    expr(s"""aggregate(zip_with($a, $b, (x, y) -> cast(x AS double) * cast(y AS double)),
             0D, (acc, v) -> acc + v)""")

  /** Euclidean norm. sqrt is correctly rounded per IEEE — exact. */
  def norm(a: String): Column = sqrt(dot(a, a))

  /** Cosine similarity: one division of exact-fold terms. */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-LSH band buckets (axis-aligned random-hyperplane family):
    * `nBands` buckets, each from `bits` consecutive components — bit i
    * of band b set iff component b*bits+i ≥ 0. A pair is a candidate
    * when ANY band bucket matches (union over bands raises recall,
    * exactly like MinHash banding). Candidates come from an equi-join
    * on (band, bucket), never a cross join; at 100 TB the bucket
    * doubles as a partitioning key so candidate joins co-locate. */
  def signBands(a: String, nBands: Int, bits: Int): Column =
    expr(s"""transform(sequence(0, ${nBands - 1}),
             b -> aggregate(transform(sequence(0, ${bits - 1}),
                    i -> CASE WHEN $a[b * $bits + i] >= cast(0 AS float)
                         THEN shiftleft(1L, i) ELSE 0L END),
                  0L, (x, y) -> x + y))""")
}
