package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Connected components: correctness of the min-label fixpoint on
  * shapes that stress the iteration (long paths need multiple
  * propagation rounds; the convergence check must not stop early). */
class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  /** rdd-* checkpoint directories below `dir` — after a successful
    * reliable-mode call only the returned fixpoint's should remain
    * (retired rounds' files are deleted as they age out). */
  private def rddCheckpointDirs(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap(walk) :+ f
    walk(new java.io.File(dir)).filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
  }

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    GraphOps.connectedComponents(df, "src", "dst")
      .as[(Long, Long)].collect().toMap
  }

  test("a path graph propagates the min label across the full diameter") {
    // 1-2-3-4-5-6-7: label 1 needs 6 rounds to reach node 7
    val cc = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)))
    assert(cc == (1L to 7L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep distinct representatives") {
    val cc = components(Seq((5L, 9L), (9L, 7L), (20L, 30L), (40L, 41L), (41L, 40L)))
    assert(cc(5L) == 5L && cc(9L) == 5L && cc(7L) == 5L)
    assert(cc(20L) == 20L && cc(30L) == 20L)
    assert(cc(40L) == 40L && cc(41L) == 40L)
  }

  test("edge direction does not matter (symmetrized internally)") {
    val a = components(Seq((3L, 1L), (2L, 3L)))
    val b = components(Seq((1L, 3L), (3L, 2L)))
    assert(a == b && a.values.toSet == Set(1L))
  }

  test("empty edge set yields an empty labelling") {
    assert(components(Seq.empty).isEmpty)
  }

  test("reliable-checkpoint mode reaches the identical fixpoint") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (20L, 30L), (40L, 41L)).toDF("src", "dst")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_cc_ck").toString
    val local = GraphOps.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val rel = GraphOps.connectedComponents(edges, "src", "dst",
        checkpointDir = Some(ckDir))
      .as[(Long, Long)].collect().toMap
    assert(rel == local)
    // the reliable mode actually wrote checkpoint data
    val wrote = new java.io.File(ckDir).listFiles()
    assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint was written")
    // and retired rounds' files were deleted: only the fixpoint remains
    // (the 7-node path runs multiple rounds, so without the cleanup
    // several rdd-* dirs would survive here)
    assert(rddCheckpointDirs(ckDir).size == 1,
      "retired rounds' checkpoint files were not deleted")
  }

  test("large-star/small-star CC matches label propagation on path, clique, and random graphs") {
    def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.as[(Long, Long)].collect().toMap
    // long path (diameter stress: star CC must finish in O(log n) rounds)
    val path = (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("src", "dst")
    assert(labelsOf(GraphOps.connectedComponentsStar(path, "src", "dst"))
      == labelsOf(GraphOps.connectedComponents(path, "src", "dst", maxIter = 60)))
    // clique + disjoint pair
    val clique = (for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)) :+ ((100L, 101L))
    val cliqueDf = clique.toDF("src", "dst")
    assert(labelsOf(GraphOps.connectedComponentsStar(cliqueDf, "src", "dst"))
      == labelsOf(GraphOps.connectedComponents(cliqueDf, "src", "dst")))
    // deterministic pseudo-random graph, several components
    val rng = new scala.util.Random(7)
    val rand = (1 to 120).map(_ => (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    assert(labelsOf(GraphOps.connectedComponentsStar(rand, "src", "dst"))
      == labelsOf(GraphOps.connectedComponents(rand, "src", "dst")))
  }

  test("star CC on an empty edge set yields an empty labelling") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.connectedComponentsStar(empty, "src", "dst").count() == 0)
  }

  test("star CC reliable-checkpoint mode reaches the identical fixpoint on path, clique, and random graphs") {
    def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.as[(Long, Long)].collect().toMap
    val path = (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("src", "dst")
    val clique = ((for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)) :+ ((100L, 101L)))
      .toDF("src", "dst")
    val rng = new scala.util.Random(11)
    val rand = (1 to 120).map(_ => (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    for ((g, shape) <- Seq((path, "path"), (clique, "clique"), (rand, "random"))) {
      val ckDir = java.nio.file.Files.createTempDirectory("graft_star_ck").toString
      val local = labelsOf(GraphOps.connectedComponentsStar(g, "src", "dst"))
      val rel = labelsOf(GraphOps.connectedComponentsStar(g, "src", "dst",
        checkpointDir = Some(ckDir)))
      assert(rel == local, s"mode divergence on $shape graph")
      val wrote = new java.io.File(ckDir).listFiles()
      assert(wrote != null && wrote.nonEmpty, s"no reliable checkpoint written ($shape)")
      assert(rddCheckpointDirs(ckDir).size == 1,
        s"retired rounds' checkpoint files were not deleted ($shape)")
    }
  }

  test("both CC variants label self-loop-only nodes with themselves") {
    // node 9 appears ONLY in a self-loop; node 1-2 is a normal pair with
    // an extra self-loop on 2 — the output contract must match exactly
    val g = Seq((1L, 2L), (2L, 2L), (9L, 9L)).toDF("src", "dst")
    val prop = GraphOps.connectedComponents(g, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val star = GraphOps.connectedComponentsStar(g, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(prop == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
    assert(star == prop, "star CC diverges from label propagation on self-loop input")
  }

  test("q_dup_clusters representatives are cluster minima and sizes are consistent") {
    val df = SparkEntry.queries("q_dup_clusters")(spark, "/root/testdata/sf0.001")
    val rows = df.select("doc_id", "cluster_rep", "cluster_size")
      .as[(Long, Long, Long)].collect()
    if (rows.nonEmpty) {
      val byCluster = rows.groupBy(_._2)
      for ((rep, members) <- byCluster) {
        assert(members.map(_._1).min == rep, s"rep $rep is not the min doc_id")
        assert(members.forall(_._3 == members.size), s"cluster $rep size column inconsistent")
        assert(members.size >= 2, s"cluster $rep has a single member — pairs guarantee >= 2")
      }
    }
  }
}
