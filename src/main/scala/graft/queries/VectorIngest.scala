package graft.queries

import graft.{Q, QueryDef}
import graft.Q._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IngestIndex

/** Q114: VECTOR INDEX UPSERT — the ingestion path of a vector store,
  * completing the ANN family's lifecycle story: q48/q62/etc PROBE a
  * built index, r13's persistence makes the index outlive the JVM, and
  * this operator GROWS it incrementally the way production stores do
  * (FAISS `add`, Milvus/pgvector inserts): the coarse codebook is
  * trained ONCE on the initial corpus and FROZEN; later batches are
  * assigned against the frozen centroids (a per-row literal-broadcast
  * projection — no retraining, no rebuild) and MERGEd into the
  * persistent bucketed index (the q104 `IngestIndex` machinery: touched
  * buckets rewritten, manifest repointed, old versions GC'd).
  *
  * Why freezing is the production semantics: retraining per insert
  * would move every stored vector's cell (a full re-index); stores
  * instead freeze the quantizer and re-train offline when drift
  * warrants. Because assignment is PER ROW, the incrementally-built
  * index is EXACTLY the index a one-shot assignment of the full corpus
  * against the same centroids would produce — the q114 contract, which
  * the DuckDB oracle checks end to end by training on the first half
  * (vec_id < floor(n/2)) and assigning everything.
  *
  * Scale shape: phase A is the q48 build on half the corpus; the upsert
  * is one scan of the NEW batch (centroids broadcast), one keyed merge
  * touching only the batch's index buckets, zero contact with stored
  * vectors. At 100 TB the upsert cost is O(batch), not O(index) — the
  * same argument as q104, here for vectors.
  */
object VectorIngest {

  /** The two-phase frozen-centroid build into `state` (v1 = initial
    * corpus, v2 = upserted second half). Returns the fs handle for
    * follow-on commits. */
  private[graft] def buildTwoPhase(s: SparkSession, d: String,
      state: String): org.apache.hadoop.fs.FileSystem = {
    graft.functions.GraftFunctions.register(s)
    val e = TextSearch.embNonNull(s, d)
    val n = e.count()
    val half = n / 2
    val a = e.filter(col("vec_id") < half)
    val b = e.filter(col("vec_id") >= half)
    // cell count from the INITIAL corpus's actual size (|A|, not half):
    // the oracle's seeds CTE counts enva, and on a corpus with NULL
    // embeddings below the split the two would otherwise disagree
    val cells = TextSearch.ivfCells(a.count())
    // the frozen coarse codebook: trained on the initial corpus only
    val cents = graft.BroadcastBounds.bounded("ivf-centroids")(
      TextSearch.trainCents(s, a, cells))
    def assigned(batch: DataFrame): DataFrame =
      TextSearch.nearestCells(batch, cents)
        .filter(col("rn") <= TextSearch.IvfProbes)
        .select(col("vec_id"), col("cid"), col("embedding"), col("rn"))

    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(state), true)
    // phase A: initial build -> v1; phase B: upsert the new batch -> v2
    // (disjoint keys, so the merge combine is a plain union)
    val t0 = IngestIndex.mergeCommit(s, state, Map.empty, "vec", 1L,
      assigned(a), (cur, delta) => cur.unionByName(delta))
    IngestIndex.writeManifest(fs, state, 1L, Map("vec" -> t0))
    val m1 = IngestIndex.readManifest(fs, state, 1L)
    val t1 = IngestIndex.mergeCommit(s, state, m1, "vec", 2L,
      assigned(b), (cur, delta) => cur.unionByName(delta))
    IngestIndex.writeManifest(fs, state, 2L, Map("vec" -> t1))
    IngestIndex.gc(fs, state, 1L, 2L)
    fs
  }

  /** Two-phase build + the q48-shaped probe over the merged index. */
  private[graft] def upsertProbe(s: SparkSession, d: String): DataFrame = {
    val state = Layout.stagePath(s, "vecidx", d)
    buildTwoPhase(s, d, state)
    probeOf(s, IngestIndex.currentTable(s, state, "vec"))
  }

  /** q114c's tombstone predicate — the deleted ids (GDPR erasure /
    * superseded crawl). Excludes vec 0, the probe query. */
  private[graft] def deletedCond: Column =
    pmod(col("vec_id"), lit(7)) === 3

  /** Apply a tombstone batch to the index at `state` (manifest `top`):
    * an anti-join merge through the SAME touched-bucket machinery as
    * the upsert — only the buckets holding tombstoned ids are read and
    * rewritten, O(tombstones), zero contact with the rest of the
    * index; a fully-emptied bucket's manifest entry is dropped. */
  private[graft] def deleteCommit(s: SparkSession, state: String,
      fs: org.apache.hadoop.fs.FileSystem, top: Long,
      tombstones: DataFrame): Unit = {
    val m = IngestIndex.readManifest(fs, state, top)
    val t = IngestIndex.mergeCommit(s, state, m, "vec", top + 1,
      tombstones.select(col("vec_id")),
      (cur, d) => cur.join(d, Seq("vec_id"), "left_anti"))
    IngestIndex.writeManifest(fs, state, top + 1, Map("vec" -> t))
    IngestIndex.gc(fs, state, top, top + 1)
  }

  /** Q114c: build, DELETE the tombstone set, probe the survivors. */
  private[graft] def deleteProbe(s: SparkSession, d: String): DataFrame = {
    val state = Layout.stagePath(s, "vecdel", d)
    val fs = buildTwoPhase(s, d, state)
    deleteCommit(s, state, fs, 2L,
      TextSearch.embNonNull(s, d).filter(deletedCond))
    probeOf(s, IngestIndex.currentTable(s, state, "vec"))
  }

  /** Apply a tombstone batch as a DELETION VECTOR (r17, q114d): commit
    * ONLY the tombstoned vec_ids into the `vec__dv` side table — write
    * IO O(tombstones), ZERO index buckets rewritten (q114c's eager path
    * rewrites every bucket a tombstone hashes into; at the production
    * 128 MB bucket target that is 128 MB of IO to hide one vector).
    * Every read verb applies the vector automatically, so the probe
    * serves the post-delete index immediately;
    * [[IngestIndex.materializeDeletes]] is the deferred OPTIMIZE. */
  private[graft] def dvDeleteCommit(s: SparkSession, state: String,
      fs: org.apache.hadoop.fs.FileSystem, top: Long,
      tombstones: DataFrame): Unit = {
    val m = IngestIndex.readManifest(fs, state, top)
    val nm = IngestIndex.deleteWithDv(s, state, m, "vec", top + 1,
      tombstones.select(col("vec_id")))
    IngestIndex.writeManifest(fs, state, top + 1, nm, op = "delete-dv")
    IngestIndex.gc(fs, state, top, top + 1)
  }

  /** Q114d: build, DV-DELETE the tombstone set, probe the survivors —
    * the vector store's soft-delete verb (carried r15 task #7). */
  private[graft] def dvDeleteProbe(s: SparkSession, d: String): DataFrame = {
    val state = Layout.stagePath(s, "vecdvdel", d)
    val fs = buildTwoPhase(s, d, state)
    dvDeleteCommit(s, state, fs, 2L,
      TextSearch.embNonNull(s, d).filter(deletedCond))
    probeOf(s, IngestIndex.currentTable(s, state, "vec"))
  }

  /** The q48 probe shape over an arbitrary (vec_id, cid, embedding, rn)
    * index frame: query = vec 0's IvfProbes nearest cells, candidates =
    * home-cell members, exact rounded cosine, top 5. */
  private[graft] def probeOf(s: SparkSession, index: DataFrame)
      : DataFrame = {
    val cellsDf = index.filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("embedding"))
    val qprobe = index.filter(col("vec_id") === 0)
      .select(col("cid").as("qcid"), col("embedding").as("qe"))
    cellsDf.join(
        graft.BroadcastBounds.bounded("single-query-probe")(qprobe),
        col("cid") === col("qcid"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), r4(expr("cosine_sim(embedding, qe)")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** The one oracle every index-lifecycle topology shares: train on
    * the FIRST HALF, assign EVERYTHING one-shot, keep `survivors` —
    * hash equality proves each incremental build (batch two-phase
    * q114, streaming q114b) and the delete path (q114c, survivors =
    * the non-tombstoned ids) lost, moved and invented nothing. */
  private def frozenCentroidOracle(survivors: String): String =
    FrozenCentroidOracleAll.replace("__SURVIVORS__", survivors)

  private val FrozenCentroidOracleAll: String =
    s"""WITH env AS (SELECT * FROM embeddings
             |  WHERE embedding IS NOT NULL),
             |half AS (SELECT CAST(FLOOR(COUNT(*) / 2) AS BIGINT) AS h
             |  FROM env),
             |enva AS (SELECT e.* FROM env e, half WHERE e.vec_id < h),
             |${TextSearch.duckTrainSampleCtes("enva")},
             |seeds AS (SELECT vec_id AS cid, embedding AS ce FROM enva
             |  WHERE vec_id < (SELECT GREATEST(${TextSearch.IvfCellsMin},
             |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))
             |    FROM enva)),
             |a0 AS (SELECT vec_id, cid, embedding FROM (
             |    SELECT e.vec_id, s.cid, e.embedding,
             |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             |        ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |          CAST(s.ce AS DOUBLE[])), 4) DESC, s.cid) AS rn
             |    FROM tsamp e CROSS JOIN seeds s) x WHERE rn = 1),
             |pieces AS (SELECT cid,
             |    unnest(generate_series(1, len(embedding))) AS pos,
             |    unnest(CAST(embedding AS DOUBLE[])) AS v
             |  FROM a0),
             |means AS (SELECT cid, pos, ROUND(AVG(v), 6) AS cv
             |  FROM pieces GROUP BY cid, pos),
             |refined AS (SELECT cid, CAST(list(cv ORDER BY pos) AS FLOAT[]) AS ce
             |  FROM means GROUP BY cid),
             |assigned AS (
             |  SELECT e.vec_id, r.cid, e.embedding,
             |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             |      ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |        CAST(r.ce AS DOUBLE[])), 4) DESC, r.cid) AS rn
             |  FROM env e CROSS JOIN refined r),
             |cells AS (SELECT vec_id, cid, embedding FROM assigned
             |  WHERE rn = 1 AND (__SURVIVORS__)),
             |qcell AS (SELECT cid AS qcid, embedding AS qe FROM assigned
             |  WHERE vec_id = 0 AND rn <= ${TextSearch.IvfProbes})
             |SELECT v.vec_id,
             |  CAST(ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
             |    CAST(q.qe AS DOUBLE[])), 4) AS DOUBLE) AS sim
             |FROM cells v JOIN qcell q ON v.cid = q.qcid
             |WHERE v.vec_id <> 0
             |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin

  private val FrozenCentroidOracle: String =
    frozenCentroidOracle("TRUE")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q114_vector_index_upsert",
      (s, d) => upsertProbe(s, d),
      Some(FrozenCentroidOracle)),

    // the streaming twin: same frozen-centroid contract as an actual
    // AvailableNow stream with checkpointed progress and the q104
    // bucketed/manifest/GC state machinery — per-row assignment against
    // frozen centroids commutes with slicing, so it shares q114's oracle
    QueryDef("q114b_streaming_vector_ingest",
      (s, d) => {
        val base = Layout.stagePath(s, "vecstream", d)
        graft.streaming.VectorStream.stageReplay(s, d, s"$base/replay")
        graft.streaming.VectorStream.ingested(s, s"$base/replay",
          s"$base/state")
      },
      Some(FrozenCentroidOracle)),

    // q114c DELETE: the remaining lifecycle verb of a production vector
    // store (GDPR erasure, re-crawl supersedes). A tombstone batch
    // flows through the SAME touched-bucket merge as the upsert — an
    // anti-join on vec_id over only the buckets holding tombstoned
    // ids, O(tombstones) IO, stored survivors untouched. Oracle = the
    // one-shot frozen-centroid assignment of the SURVIVING set: hash
    // equality proves the delete removed exactly the tombstoned rows
    // and moved nothing else (upsert-then-delete == never-inserted,
    // also pinned as a VectorIngestSpec law).
    QueryDef("q114c_vector_index_delete",
      (s, d) => deleteProbe(s, d),
      Some(frozenCentroidOracle("vec_id % 7 <> 3"))),

    // q114d DELETION-VECTOR DELETE (r17): the soft-delete verb q129
    // gave the state store, now on the VECTOR index — the tombstone
    // batch commits as a `vec__dv` side table (O(tombstones) IO, zero
    // index buckets rewritten — VectorIngestSpec pins the IO claim),
    // and the q48-shaped probe reads through the vector automatically
    // (currentTable's r16 DV composition). Oracle = q114c's verbatim:
    // the delete MECHANISM must be unobservable in the results — dv ==
    // eager, which is the whole contract of the format feature.
    QueryDef("q114d_vector_index_dv_delete",
      (s, d) => dvDeleteProbe(s, d),
      Some(frozenCentroidOracle("vec_id % 7 <> 3"))))
}
