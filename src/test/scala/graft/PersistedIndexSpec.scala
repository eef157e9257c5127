package graft

import graft.queries.{Pq, TextSearch}
import org.scalatest.funsuite.AnyFunSuite

/** The persisted vector-index lifecycle (r13): with
  * `spark.graft.ann.indexDir` set, the IVF assignment + centroids and
  * the PQ codebooks are written as parquet on first build and a later
  * session LOAD-OR-BUILDs — the index outlives the JVM, which is what
  * the session memo alone (r12) could not give. Laws pinned here:
  *
  *  1. first touch BUILDS and persists (files exist, build counters move)
  *  2. after the in-memory memo is wiped (the JVM-death simulation — the
  *     shared test context cannot be restarted mid-suite), the same call
  *     LOADS: load counters move, build counters do NOT, and every
  *     downstream result is IDENTICAL to the built run
  *  3. a corpus-row mismatch in the meta marker invalidates the persisted
  *     copy: the engine rebuilds instead of serving a stale index
  */
class PersistedIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("persisted IVF index + codebooks: build once, load after restart, identical results, stale guard") {
    val sp = spark
    val root = java.nio.file.Files
      .createTempDirectory("graft-annidx").toString
    sp.conf.set("spark.graft.ann.indexDir", root)
    try {
      TextSearch.clearIndexCache()
      Pq.clearBookCache()
      val b0 = (TextSearch.ivfBuilds.get, TextSearch.ivfLoads.get,
        Pq.bookBuilds.get, Pq.bookLoads.get)

      val knnBuilt = TextSearch.knnGraph(sp, dir).collect()
        .map(_.toSeq).toSeq.sortBy(_.toString)
      val resBuilt = Pq.ivfPqResidualSearch(sp, dir).collect().toSeq
      assert(TextSearch.ivfBuilds.get == b0._1 + 1,
        "first touch must run the quantizer once")
      assert(Pq.bookBuilds.get == b0._3 + 1,
        "first touch must train the residual books once")

      // the persisted artifacts exist, meta (commit marker) last
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      for (p <- Seq("ivf", "cents", "meta", "books_res/data",
          "books_res/meta"))
        assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/$digest/$p")),
          s"persisted artifact missing: $p")

      // "restart": wipe the in-memory memo; the next touch must LOAD
      TextSearch.clearIndexCache()
      Pq.clearBookCache()
      val b1 = (TextSearch.ivfBuilds.get, TextSearch.ivfLoads.get,
        Pq.bookBuilds.get, Pq.bookLoads.get)
      val knnLoaded = TextSearch.knnGraph(sp, dir).collect()
        .map(_.toSeq).toSeq.sortBy(_.toString)
      val resLoaded = Pq.ivfPqResidualSearch(sp, dir).collect().toSeq
      assert(TextSearch.ivfLoads.get == b1._2 + 1
        && TextSearch.ivfBuilds.get == b1._1,
        "post-restart touch must load, not rebuild")
      assert(Pq.bookLoads.get == b1._4 + 1 && Pq.bookBuilds.get == b1._3,
        "post-restart touch must load books, not retrain")
      assert(knnLoaded == knnBuilt,
        "loaded index changed the kNN graph")
      assert(resLoaded == resBuilt,
        "loaded books changed the residual IVF-PQ result")

      // stale guard: a meta row count that disagrees with the live
      // corpus must force a rebuild (same results — content is
      // deterministic), never serve the stale copy
      val meta = new org.apache.hadoop.fs.Path(s"$root/$digest/meta")
      val out = fs.create(meta, true)
      try out.write("999999\n".getBytes("UTF-8")) finally out.close()
      TextSearch.clearIndexCache()
      val b2 = (TextSearch.ivfBuilds.get, TextSearch.ivfLoads.get)
      val knnRebuilt = TextSearch.knnGraph(sp, dir).collect()
        .map(_.toSeq).toSeq.sortBy(_.toString)
      assert(TextSearch.ivfBuilds.get == b2._1 + 1
        && TextSearch.ivfLoads.get == b2._2,
        "stale meta must trigger a rebuild, not a load")
      assert(knnRebuilt == knnBuilt)
    } finally {
      sp.conf.unset("spark.graft.ann.indexDir")
      TextSearch.clearIndexCache()
      Pq.clearBookCache()
    }
  }

  test("a regenerated corpus at the SAME row count invalidates the persisted index (content fingerprint)") {
    val sp = spark
    val root = java.nio.file.Files
      .createTempDirectory("graft-annidx-regen").toString
    val work = java.nio.file.Files
      .createTempDirectory("graft-annidx-corpus").toString
    sp.conf.set("spark.graft.ann.indexDir", root)
    try {
      sp.read.parquet(s"$dir/embeddings.parquet")
        .write.parquet(s"$work/embeddings.parquet")
      TextSearch.clearIndexCache()
      val b0 = (TextSearch.ivfBuilds.get, TextSearch.ivfLoads.get)
      TextSearch.ivfIndexed(sp, work)
      assert(TextSearch.ivfBuilds.get == b0._1 + 1)

      // "regeneration": identical rows rewritten — row count unchanged,
      // file lengths/mtimes not. The r13 count-only guard loaded the
      // stale copy here; the fingerprint must force a rebuild.
      val fs = new org.apache.hadoop.fs.Path(work)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      val rows = sp.read.parquet(s"$work/embeddings.parquet")
      rows.write.parquet(s"$work/regen")
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$work/embeddings.parquet"), true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$work/regen"),
        new org.apache.hadoop.fs.Path(s"$work/embeddings.parquet"))

      TextSearch.clearIndexCache()
      val b1 = (TextSearch.ivfBuilds.get, TextSearch.ivfLoads.get)
      TextSearch.ivfIndexed(sp, work)
      assert(TextSearch.ivfBuilds.get == b1._1 + 1
        && TextSearch.ivfLoads.get == b1._2,
        "regenerated corpus (same row count) must rebuild, not load stale")
    } finally {
      sp.conf.unset("spark.graft.ann.indexDir")
      TextSearch.clearIndexCache()
      Pq.clearBookCache()
    }
  }
}
