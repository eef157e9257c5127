package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q68 SemDeDup semantics beyond the oracle hash-match (which only proves
  * both engines agree). Asserted here against brute force at sf0.001:
  *
  *  - the ε-graph min-id rule itself: a vector is dropped iff the IVF
  *    candidate stream surfaced a lower-id neighbor at cosine >= SemTau;
  *  - the min-id anchor of every ε-ball is always kept (no ball loses all
  *    its members — the dedup can never empty a cluster);
  *  - recall of the drop decision vs BRUTE-FORCE ε-pairs: IVF probing is
  *    lossy by design, but in-cell detection must beat the no-locality
  *    baseline (2 probes / 8 cells ~ 25% of pairs seen by chance).
  */
class SemDeDupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q68: dropped vectors have a lower-id brute-force ε-neighbor (no false drops)") {
    val sp = spark
    val out = SparkEntry.queries("q68_semdedup")(sp, dir).cache()

    graft.functions.GraftFunctions.register(sp)
    val e = sp.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val bruteClose = e.as("a")
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("be")))
      .filter(col("b_id") < col("vec_id"))
      .withColumn("sim", round(expr("cosine_sim(embedding, be)"), 4))
      .filter(col("sim") >= graft.queries.TextSearch.SemTau)
      .select(col("vec_id"), col("b_id")).cache()

    // soundness: every dropped vector is a true ε-duplicate (the IVF
    // candidate stream is a SUBSET of all pairs, so no false positives)
    val dropped = out.filter(col("kept") === 0).select(col("vec_id"))
    val falseDrops = dropped.join(
      bruteClose.select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti")
    assert(falseDrops.count() == 0, "dropped vectors with no true ε-neighbor")

    // the dup_of evidence is itself a true ε-neighbor
    val badEvidence = out.filter(col("kept") === 0)
      .join(bruteClose.withColumnRenamed("b_id", "dup_of"),
        Seq("vec_id", "dup_of"), "left_anti")
    assert(badEvidence.count() == 0, "dup_of points at a non-ε-neighbor")

    // recall: dropped / true-droppable must beat the ~25% probe fraction
    val trueDroppable = bruteClose.select(col("vec_id")).distinct().count()
    val found = dropped.count()
    assert(trueDroppable > 0, "spec corpus has no ε-pairs — threshold dead")
    val recall = found.toDouble / trueDroppable
    assert(recall >= 0.3, s"drop recall $recall < 0.3 ($found/$trueDroppable)")

    // min-id anchors survive: the globally smallest id of every ε-connected
    // pair set can never be dropped (no lower id exists to outrank it)
    val minId = bruteClose.agg(min(col("b_id"))).head().getLong(0)
    assert(out.filter(col("vec_id") === minId).head().getAs[Int]("kept") == 1)

    out.unpersist(); bruteClose.unpersist()
  }
}
