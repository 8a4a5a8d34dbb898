package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives for dedup-cluster resolution.
  *
  * Near-dup detection (MinHash/SimHash/Jaccard) emits PAIRS, but the
  * step a training-data pipeline actually needs is the transitive
  * closure of those pairs — duplicate CLUSTERS, so exactly one
  * canonical document per cluster survives (the reference's dedup
  * unit-of-work; cf. the keeper rule in q_dedup_keep). This is
  * connected components over the pair graph.
  */
object GraphOps {

  /** Connected components by iterative min-label propagation
    * (Pregel-style): every node starts labelled with itself; each
    * round every node takes the min of its own label and its
    * neighbours' labels; at the fixpoint each component carries its
    * minimum node id.
    *
    * Scale design: each round is ONE shuffle keyed on the node id
    * (join labels to edges + groupBy dst) — the textbook iterative CC
    * that HashToMin / large-star-small-star refine. Rounds are
    * bounded by the component diameter, which for near-dup graphs is
    * tiny (duplicate clusters are near-cliques, so label information
    * crosses a cluster in O(log diameter) rounds).
    *
    * Labels only ever DECREASE under min propagation, so the
    * label-sum is strictly monotone until the fixpoint: comparing
    * sums is a complete convergence test and costs one aggregate per
    * round. Lineage is bounded per round: in the default LOCAL mode
    * each round's labels persist to executor storage and that
    * convergence aggregate doubles as the materializing action — ONE
    * job per round, no separate checkpoint pass; with `checkpointDir`
    * set, every round instead writes a RELIABLE checkpoint (survives
    * executor loss — the cluster-scale mode; costs the extra
    * checkpoint pass per round). Both modes reach the identical
    * fixpoint (spec-pinned). Deterministic: min is order-independent
    * — no vertex-program race affects the fixpoint.
    *
    * @param edges undirected edge list; each row one edge
    * @param checkpointDir reliable-checkpoint directory; None = local
    * @return (id, lbl) — every node that appears in an edge, labelled
    *         with its component's minimum node id
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30, checkpointDir: Option[String] = None): DataFrame = {
    val reliable = checkpointDir.isDefined
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val sym = truncate(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
        .distinct())
    var labels = truncate(
      sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")))
    // decimal sum so huge id spaces can't overflow the comparison
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head.getDecimal(0)
      if (v == null) java.math.BigDecimal.ZERO else v
    }
    var prevSum = labelSum(labels)
    var converged = labels.isEmpty
    var it = 0
    var prevCached: Option[DataFrame] = None
    while (!converged && it < maxIter) {
      val viaNeighbours = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("nid")).agg(min(col("lbl")).as("nlbl"))
      val joined = labels
        .join(viaNeighbours, labels("id") === viaNeighbours("nid"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // local mode: lazy persist — the labelSum aggregate below is the
      // one job that both materializes this round's labels and decides
      // convergence. Reliable mode: eager checkpoint first.
      val next =
        if (reliable) truncate(joined)
        else joined.persist(StorageLevel.MEMORY_AND_DISK)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      // the previous round's cache fed this round's join; safe to drop now
      prevCached.foreach(_.unpersist(false))
      prevCached = if (reliable) None else Some(next)
      prevSum = nextSum
      labels = next
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
