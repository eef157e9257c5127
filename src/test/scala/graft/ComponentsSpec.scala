package graft

import org.scalatest.funsuite.AnyFunSuite

/** q51 resource hygiene: the iterative label propagation localCheckpoints
  * a labels generation per round (plus the edges), and every generation
  * except the final one must be RELEASED before the query returns —
  * Dataset.unpersist is a no-op on checkpointed Datasets (it only reaches
  * CacheManager entries), so this pins that the underlying RDDs are
  * actually freed, not just believed freed.
  */
class ComponentsSpec extends AnyFunSuite {

  test("q51 releases every intermediate checkpoint generation") {
    val spark = TestSpark.spark
    def persisted: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = persisted
    val df = SparkEntry.queries("q51_neardup_components")(
      spark, "/root/testdata/sf0.001")
    val rows = df.count()
    assert(rows == 500) // one row per document
    val leaked = persisted -- before
    // only the FINAL labels generation may remain (the returned DataFrame
    // is backed by it); edges and all intermediate rounds must be gone
    assert(leaked.size <= 1,
      s"q51 left ${leaked.size} persistent RDDs behind: $leaked")
  }
}
