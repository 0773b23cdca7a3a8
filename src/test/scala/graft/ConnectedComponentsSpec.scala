package graft

import org.scalacheck.Gen

import graft.graph.ConnectedComponents
import graft.text.Dedup

/** The two-phase (large-star/small-star) CC plan must produce the exact
  * labels of the min-label-propagation plan on ANY graph — same
  * contract, two algorithms, one truth (the q38/q179 shared-oracle
  * discipline, here as a property over random graphs where the oracle
  * can't reach).
  */
class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Seq[(Long, Long, Boolean)] =
    ConnectedComponents.twoPhase(edges.toDF("doc_id_1", "doc_id_2"))
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)

  private def viaPropagation(edges: Seq[(Long, Long)]): Seq[(Long, Long, Boolean)] =
    Dedup.duplicateClusters(edges.toDF("doc_id_1", "doc_id_2"))
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)

  test("twoPhase == min-label propagation on random graphs") {
    val gen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.chooseNum(0L, n.toLong), Gen.chooseNum(0L, n.toLong)))
    } yield edges.filter { case (a, b) => a != b }
    for (edges <- samples(gen, n = 10) if edges.nonEmpty)
      assert(run(edges) == viaPropagation(edges), s"edges=$edges")
  }

  test("a long chain resolves to one min-rooted component (the log-round case)") {
    // diameter 40 — propagation's worst shape, the two-phase plan's
    // reason to exist; every node must label to the chain head
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 41)
    assert(got.forall(_._2 == 0L))
    assert(got.count(_._3) == 1 && got.find(_._3).get._1 == 0L)
  }

  test("disjoint components, duplicate and reversed edges, self-loops ignored") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 3L), (7L, 7L), (10L, 11L))
    val got = run(edges)
    // the self-loop node 7 never appears (no real edge → singleton,
    // absent-means-singleton like duplicateClusters)
    assert(got.map(_._1) == Seq(3L, 5L, 10L, 11L))
    assert(got == Seq((3L, 3L, true), (5L, 3L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }
}
