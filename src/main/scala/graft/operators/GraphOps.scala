package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * crosses a cluster in O(log diameter) rounds). The loop checks
    * convergence with a count per round and truncates lineage with
    * localCheckpoint so the plan doesn't grow with the iteration
    * count (at cluster scale this would be a reliable checkpoint or
    * a table round-trip). Deterministic: min is order-independent —
    * no vertex-program race affects the fixpoint.
    *
    * @param edges undirected edge list; each row one edge
    * @return (id, lbl) — every node that appears in an edge, labelled
    *         with its component's minimum node id
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    // labels only ever DECREASE under min propagation, so the label-sum
    // is strictly monotone until the fixpoint: comparing sums is a
    // complete convergence test and costs one aggregate per round
    // instead of a join + count. Decimal sum so huge id spaces can't
    // overflow the comparison.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head.getDecimal(0)
      if (v == null) java.math.BigDecimal.ZERO else v
    }
    var prevSum = labelSum(labels)
    var converged = labels.isEmpty
    var it = 0
    while (!converged && it < maxIter) {
      val viaNeighbours = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("nid")).agg(min(col("lbl")).as("nlbl"))
      val next = labels
        .join(viaNeighbours, labels("id") === viaNeighbours("nid"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
