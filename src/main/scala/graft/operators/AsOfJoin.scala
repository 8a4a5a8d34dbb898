package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Nearest-in-time ("as-of") join.
  *
  * Reproduces the reference's DynamicWorld monthly-composite fallback
  * (presto-tolbi/presto/dataops/pipelines/dynamicworld.py:108-137): for
  * each anchor row (e.g. a pixel-month midpoint), attach the source row
  * whose timestamp is nearest the anchor, bounded by a tolerance
  * (reference: 15 days = 1,296,000,000 ms), keeping anchors with no
  * match (left join semantics — the caller coalesces a default, the
  * reference's "missing class 9").
  *
  * Spark-first design: Spark has no built-in as-of join, so this is a
  * *rewrite*, not a custom physical operator — an equi-join on the key
  * columns with the tolerance as a range predicate, followed by one
  * window to keep the nearest candidate. Catalyst plans the equi-join
  * as a shuffled hash/sort-merge on `keys` (the only shuffle), and the
  * tolerance predicate prunes candidates before the window. At 100 TB,
  * with both sides partitioned by (key, time-bucket), the range
  * predicate additionally enables partition pruning; candidate fan-out
  * per anchor is bounded by the tolerance, so the window state stays
  * small. Ties on distance break deterministically via `tieBreak`
  * (SURVEY §7.3 hard-part 2).
  */
object AsOfJoin {

  /** @param anchors   left side; one output row per anchor row
    * @param source    right side; its key columns are dropped from the
    *                  output, and any other source column sharing a
    *                  name with an anchor column is renamed
    *                  `<name>_src` (the output carries no duplicate
    *                  names)
    * @param keys      equi-join key column names present on both sides
    * @param anchorTs  timestamp column on `anchors`
    * @param sourceTs  timestamp column on `source`
    * @param toleranceMs max |sourceTs − anchorTs| in milliseconds
    * @param tieBreak  source column ordering distance ties deterministically
    */
  def nearest(anchors: DataFrame, source: DataFrame, keys: Seq[String],
              anchorTs: String, sourceTs: String, toleranceMs: Long,
              tieBreak: String): DataFrame = {
    // Explicit aliases on both sides: when anchors and source derive
    // from the same base plan (the common monthly-spine case),
    // `anchors(k) === source(k)` is a trivially-true self-comparison
    // that only works via Spark's legacy dataset-id disambiguation
    // (and warns). Alias-qualified refs are unambiguous by
    // construction, on every Spark version.
    val a = anchors.alias("_asof_a")
    val s = source.alias("_asof_s")
    val dist = abs(unix_millis(col(s"_asof_s.$sourceTs")) -
      unix_millis(col(s"_asof_a.$anchorTs")))
    val cond = keys.map(k => col(s"_asof_a.$k") === col(s"_asof_s.$k")).reduce(_ && _) &&
      dist <= toleranceMs
    // reuse the alias-qualified dist (and qualify every post-join
    // reference): unqualified names would be AMBIGUOUS_REFERENCE
    // whenever anchors and source share a column name (e.g.
    // anchorTs == sourceTs == "ts")
    val joined = a.join(s, cond, "left").withColumn("dist", dist)
    val anchorKeyCols: Seq[Column] =
      keys.map(k => col(s"_asof_a.$k")) :+ col(s"_asof_a.$anchorTs")
    val w = Window.partitionBy(anchorKeyCols: _*)
      .orderBy(col("dist").asc_nulls_last, col(s"_asof_s.$tieBreak").asc_nulls_last)
    // Explicit output projection: every anchor column under its own
    // name; source columns minus the join keys, and any source column
    // whose name an anchor column shares (e.g. anchorTs == sourceTs ==
    // "ts") renamed to `<name>_src` — the output never carries two
    // identically-named columns, so a caller's select can't hit
    // AMBIGUOUS_REFERENCE at use time.
    val anchorNames = anchors.columns.toSeq
    val outCols: Seq[Column] =
      anchorNames.map(n => col(s"_asof_a.$n").as(n)) ++
      source.columns.toSeq.filterNot(keys.contains).map { n =>
        col(s"_asof_s.$n").as(if (anchorNames.contains(n)) s"${n}_src" else n)
      } :+ col("dist")
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(outCols: _*)
  }
}
