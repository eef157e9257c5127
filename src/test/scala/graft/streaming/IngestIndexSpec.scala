package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The storage engine under randomized use: for arbitrary keyed-batch
  * sequences (hot keys, repeated keys, empty batches), the
  * manifest read-back must equal the naive in-memory fold, every
  * surviving version dir must be reachable from the final manifest (or
  * be the replay-safety pair), and compaction must preserve contents.
  * The q104/q86/q114 fixtures pin specific rigs; this pins the
  * machinery itself.
  */
class IngestIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("random batch sequences: read-back == naive fold; GC leaves only reachable versions; compact preserves") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val state = java.nio.file.Files
        .createTempDirectory(s"graft-idx-prop$trial").toString + "/state"
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      val keySpace = 1 + rnd.nextInt(40)
      val nBatches = 3 + rnd.nextInt(6)
      val expected = scala.collection.mutable.Map.empty[Long, Long]
      (0 until nBatches).foreach { k =>
        // batches skew hot: repeated keys inside a batch pre-aggregate
        // (the delta is keyed), empty batches exercise the
        // manifest-only path
        val rows = Seq.fill(rnd.nextInt(30))(
          rnd.nextInt(keySpace).toLong -> (1 + rnd.nextInt(5)).toLong)
        val delta = rows.groupBy(_._1).view
          .mapValues(_.map(_._2).sum).toSeq
        delta.foreach { case (u, c) =>
          expected(u) = expected.getOrElse(u, 0L) + c
        }
        val m = IngestIndex.readManifest(fs, state, k.toLong)
        val touched = IngestIndex.mergeCommit(sp, state, m, "state",
          k + 1L,
          delta.toDF("user_id", "cnt"),
          (cur, d) => cur.unionByName(d).groupBy("user_id")
            .agg(sum(col("cnt")).as("cnt")))
        IngestIndex.writeManifest(fs, state, k + 1L,
          Map("state" -> (m.getOrElse("state", Map.empty[Int, Long]) ++
            touched.map(_ -> (k + 1L)).toMap)))
        IngestIndex.gc(fs, state, k.toLong, k + 1L)

        // invariant after EVERY commit: read-back equals the fold so far
        val got =
          if (expected.isEmpty) Map.empty[Long, Long]
          else IngestIndex.currentTable(sp, state, "state")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected.toMap,
          s"trial $trial batch $k: read-back diverged from the fold")
        // invariant: every surviving version dir is referenced by the
        // live manifest OR the previous one (kept for the crash-replay
        // of the just-committed batch), or is the pair {k, k+1} itself
        val live = (IngestIndex.readManifest(fs, state, k + 1L).values ++
          IngestIndex.readManifest(fs, state, k.toLong).values)
          .flatMap(_.values).toSet ++ Set(k.toLong, k + 1L)
        val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
          .map(_.getPath.getName).filter(_.matches("v-?\\d+"))
          .map(_.drop(1).toLong).toSet
        val orphans = dirs.diff(live)
        assert(orphans.isEmpty,
          s"trial $trial batch $k: unreachable versions survive GC: $orphans")
      }
      if (expected.nonEmpty) {
        IngestIndex.compact(sp, state, nBatches.toLong)
        val got = IngestIndex.currentTable(sp, state, "state")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected.toMap,
          s"trial $trial: compact changed the contents")
      }
    }
  }
}
