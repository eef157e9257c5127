package graft.queries

import graft.{Q, QueryDef}
import graft.Q._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Language identification, the RANGE-interval window frame, and the IVF
  * scale path for similarity search — the remaining declared operators of
  * the LLM-pipeline surface.
  */
object TextSearch {

  /** Q48 coarse-quantizer cell-count floor. Deterministic stand-in for
    * k-means training: the first [[ivfCells]] vectors act as centroids.
    * Cell count SCALES WITH THE CORPUS as max(8, floor(sqrt(n))) — the
    * FAISS convention (n/cell ~ sqrt(n), so both the centroid scan and
    * the in-cell re-rank stay ~sqrt(n) per query and the candidate join
    * is O(n^1.5), never O(n²)); with a fixed cell count the 10x corpus
    * measured a quadratic blowup (BENCH_NOTES_r9). Both engines compute
    * the same count from the same table — sqrt of an exact integer is
    * correctly rounded in both, so floor agrees everywhere — and the
    * centroid table stays broadcast-able far beyond any real sizing
    * (10^5 cells x 64 floats is ~25 MB).
    */
  val IvfCellsMin = 8

  /** Corpus-adaptive cell count: max(IvfCellsMin, floor(sqrt(n))). */
  def ivfCells(n: Long): Int =
    math.max(IvfCellsMin, math.sqrt(n.toDouble).toInt)

  /** Q48 probe width (FAISS nprobe): the query searches its `IvfProbes`
    * nearest cells instead of only its own — the standard IVF recall knob
    * for vectors that land near a cell boundary. Corpus vectors stay
    * assigned to exactly one cell, so probing N of the sqrt(n) cells
    * scans ~N*sqrt(n) vectors and produces no duplicate candidates.
    * Doubled 2 → 4 when the cell count went sqrt(n)-adaptive: candidates
    * stay O(probes · n^1.5), and on THIS synthetic space — random
    * vectors, no cluster structure for the quantizer to exploit — top-1
    * recall tracks the scanned fraction (KnnGraphSpec's measured law), so
    * the probe constant is what keeps the small-SF recall bar meaningful.
    * Real embedding corpora are clusterable; there the same probes buy
    * far more recall than the scanned fraction suggests.
    */
  val IvfProbes = 4

  /** Q62 neighbors kept per vector in the k-NN graph. */
  val KnnK = 3

  /** The grouped cell-members build side of q62/q68 carries NO explicit
    * broadcast hint (r11). History: r8 hinted it unconditionally (driver
    * OOM at scale — the hint overrides autoBroadcastJoinThreshold); r9
    * size-gated the hint; r11 MEASURED the gate on a hot-cluster 10x rig
    * and removed the hint entirely, because with salted cell groups
    * (see [[MaxCellGroupMembers]]) the un-hinted plan won or tied every
    * tested regime: 2.06 s vs 2.07 s at sf0.1, 35 s vs 98 s at the 10x
    * hot-cluster rig (the (cid, salt) exchange redistributes a
    * layout-clustered probe stream that the broadcast join's
    * stream-side-partition-preserving shape cannot; BENCH_NOTES_r11).
    * Size-based planning + AQE now own the choice: a genuinely tiny
    * members table is runtime-broadcast from its MEASURED post-shuffle
    * size, a corpus-sized one degrades to the keyed shuffle — the same
    * graceful envelope the r10 verdict endorsed for userNationDim. */

  /** Q68 SemDeDup cosine bar. Deliberately NOT q37's 0.95 near-identical
    * bar: the synthetic embedding space tops out at cosine ~0.48/0.51/0.60
    * (sf0.001/0.01/0.1 max pairwise), so 0.95 never fires and the drop
    * path would ship untested. 0.40 sits inside the observed upper tail
    * at every SF — the ε here is a tunable radius (SemDeDup prunes at
    * moderate ε in practice), and the operator's contract is the ε-graph
    * min-id rule, not a specific radius. */
  val SemTau = 0.40

  /** Marker function-word lists per language (the classic cheap lang-ID
    * heuristic: count hits, argmax with a deterministic tie-break). */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "我", "不"))

  /** Q48/Q62 shared IVF assignment: every vector joined to its nearest
    * coarse-quantizer cell (seed centroids = first IvfCells vectors, then
    * one deterministic Lloyd refinement step), ranked by ROUNDED cosine so
    * the argmax is stable against cross-engine double-accumulation ULP
    * drift. Returns (vec_id, cid, embedding, rn): rn = 1 is the vector's
    * home cell; rn <= k is its k nearest cells (the probe expansion). The
    * centroid tables broadcast; the corpus is scanned, never self-joined.
    */
  /** The embeddings table with NULL vectors dropped — the one shape the
    * quantizer cannot index (a NULL embedding has no cell, no cosine, and
    * NULLs the seed-sampling dim probes; synthetic data never ships one,
    * real corpora do — r11 advice). Dropping at the scan keeps the filter
    * pushed into the parquet read for every IVF consumer. */
  private[graft] def embNonNull(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    t(s, d, "embeddings").filter(col("embedding").isNotNull)

  private[graft] def ivfAssigned(s: org.apache.spark.sql.SparkSession,
      d: String, cells: Int): DataFrame =
    ivfAssignedWithCents(s, d, cells)._1

  /** [[ivfAssigned]] plus the refined centroid table (cid, ce FLOAT[])
    * it assigned against — the residual-encoding consumer (q109b) needs
    * the centroid VALUES, not just the memberships. */
  /** Rank every vector of `e` by rounded cosine against a (broadcast)
    * centroid table: rn = 1 is the home cell, rn <= k the probe
    * expansion. The assignment is PER ROW, which is what makes
    * incremental ingestion (q114) exact: assigning a new batch against
    * frozen centroids gives the same rows a one-shot assignment would. */
  private[graft] def nearestCells(e: DataFrame,
      cents: DataFrame): DataFrame = e.crossJoin(cents)
    .withColumn("sim_c", round(expr("cosine_sim(embedding, ce)"), 4))
    .withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
        .orderBy(col("sim_c").desc, col("cid"))))

  /** Training-sample budget per centroid. With cells ~ sqrt(n), the
    * Lloyd refinement runs over ~TrainPerCell x cells vectors instead
    * of all n: the classic FAISS-style sampled-quantizer training that
    * cuts the one-time build's assignment from O(n^1.5) to O(n) —
    * the n x cells cross product was the build's dominant cost at
    * 10^9 vectors (r13 verdict, scale note 3). */
  val IvfTrainPerCell = 64

  /** The per-10000 training-sample threshold for an n-vector corpus:
    * ~TrainPerCell vectors per centroid, whole corpus when n is small.
    * IEEE sqrt/divide/ceil are correctly-rounded, so the DuckDB twin
    * (LEAST/CEIL/SQRT over COUNT(*)) computes the identical value. */
  private[graft] def trainThr(n: Long): Long =
    math.min(10000L, math.ceil(IvfTrainPerCell * 10000.0
      / math.sqrt(n.toDouble)).toLong)

  /** The deterministic salted-md5 training-sample gate (the q55 salted
    * draw under its own salt, keyed by vec_id): reproducible, engine-
    * mirrorable, independent of the sampling family's other draws. */
  private[graft] def trainGate: Column =
    conv(substring(md5(concat(lit("ivft|"), col("vec_id"))), 1, 8),
      16, 10).cast(org.apache.spark.sql.types.LongType) % 10000

  /** DuckDB twin of [[trainGate]] over column expression `sel`. */
  private[graft] def duckTrainGate(sel: String): String =
    "CAST(list_sum(list_transform(generate_series(1, 8), i -> " +
      s"(strpos('0123456789abcdef', substr(md5('ivft|' || " +
      s"CAST($sel AS VARCHAR)), i, 1)) - 1) " +
      "* CAST(16 ** (8 - i) AS BIGINT))) AS BIGINT) % 10000"

  /** DuckDB CTE pair computing the training sample of corpus CTE `src`:
    * `tthr` (the threshold from |src|) and `tsamp` (the gated rows). */
  private[graft] def duckTrainSampleCtes(src: String): String =
    s"""tthr AS (SELECT LEAST(10000, CAST(CEIL($IvfTrainPerCell * 10000.0
       |    / SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS thr
       |  FROM $src),
       |tsamp AS (SELECT e.* FROM $src e, tthr
       |  WHERE ${duckTrainGate("e.vec_id")} < thr)""".stripMargin

  /** The coarse-quantizer training on an arbitrary corpus frame: seeds =
    * `e`'s vectors with vec_id < cells; ONE Lloyd refinement step over a
    * deterministic salted-gate SAMPLE (~[[IvfTrainPerCell]] vectors per
    * cell — the whole corpus when n <= (TrainPerCell)^2, so small-corpus
    * results are unchanged); 1e-6-rounded float centroids (cid, ce).
    * Sampling the TRAINING pass only — every corpus vector is still
    * assigned exactly once against the refined centroids downstream. */
  private[graft] def trainCents(s: org.apache.spark.sql.SparkSession,
      e: DataFrame, cells: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val thr = trainThr(e.count())
    val sample = if (thr >= 10000L) e else e.filter(trainGate < thr)
    val seeds = graft.BroadcastBounds.bounded("ivf-centroids")(
      e.filter(col("vec_id") < cells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
    val seedCells = nearestCells(sample, seeds).filter(col("rn") === 1)
      .select(col("cid"), col("embedding"))
    seedCells
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cid", "pos").agg(round(avg(col("v")), 6).as("cv"))
      .groupBy("cid").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
          x => x.getField("cv").cast(FloatType)).as("ce"))
  }

  private[graft] def ivfAssignedWithCents(s: org.apache.spark.sql.SparkSession,
      d: String, cells: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val e = embNonNull(s, d)
    val cents = trainCents(s, e, cells)
    val refined = graft.BroadcastBounds.bounded("ivf-centroids")(cents)
    (nearestCells(e, refined), cents)
  }

  /** The materialized IVF index plus the corpus row count its consumers
    * size their plans with (`corpusRows` drives the sqrt(n) cell count)
    * and the refined centroid table `cents` (cid, ce FLOAT[]) — the
    * quantizer's model, needed by residual encoding (q109b). */
  final case class IvfIndex(df: DataFrame, corpusRows: Long,
      cents: DataFrame)

  /** The materialized IVF index: [[ivfAssigned]] kept to each vector's
    * IvfProbes nearest cells and checkpointed. Both consumers (the rn = 1
    * home-cell side and the rn <= IvfProbes probe side) scan this one
    * materialization instead of re-running the quantizer pipeline per
    * branch — Catalyst cannot share the subtree itself (the branches'
    * rank filters push different WindowGroupLimits below the exchanges,
    * so ReuseExchange never fires), and a real IVF index is built once
    * and stored anyway. Materialized size is IvfProbes x corpus of
    * (id, cid, embedding, rn) rows — the same order as the index a
    * vector store persists. The sizing job (a parquet-footer count) runs
    * once per index build, free relative to the quantizer.
    *
    * MEMOIZED per (SparkContext incarnation, shuffle partitioning, dir) —
    * the EventStream.dimCache pattern, extended with the partition count
    * so PartitionInvarianceSpec's prime-partition reruns rebuild the
    * index rather than silently exempting the quantizer from the law.
    * This is a vector store's actual lifecycle: the index is built once
    * and probed by every query (six consumers here: q48/q62/q68/q97/
    * q103/q109 each paid a full quantizer run before this). Entries from
    * stopped contexts are evicted on access; fixture-dir entries are
    * bounded by their test corpus. Index CONTENT is deterministic
    * (rounded argmax + decimal-free rounding), so caching cannot change
    * any result — KnnGraphSpec/SemDeDupSpec regime tests flip only
    * DOWNSTREAM confs (salting, broadcast), which don't key the build. */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfIndex]()

  /** Spec observability for the persisted-index lifecycle: how many
    * quantizer BUILDS vs disk LOADS this JVM ran. */
  private[graft] val ivfBuilds = new java.util.concurrent.atomic.AtomicLong
  private[graft] val ivfLoads = new java.util.concurrent.atomic.AtomicLong
  /** Test hook: forget the in-memory memo (simulates JVM death for the
    * load-or-build path without stopping the shared context). */
  private[graft] def clearIndexCache(): Unit = indexCache.clear()

  /** Root for PERSISTED indexes, or "" = session-memo only. When set,
    * the built IVF assignment + centroids are written as parquet under
    * `<root>/<md5(corpusDir)>/` (meta last — the commit marker), and a
    * later session LOAD-OR-BUILDs: a valid persisted index whose stored
    * corpus row count matches the live corpus is read back instead of
    * re-running the quantizer — the vector-store lifecycle where the
    * index outlives the JVM. Content is deterministic, so load vs build
    * cannot change any result (PersistedIndexSpec pins identity). */
  private def persistRoot(s: org.apache.spark.sql.SparkSession): String =
    s.conf.get("spark.graft.ann.indexDir", "")

  private def persistPath(root: String, d: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$root/$digest"
  }

  /** Content fingerprint of the corpus backing `d`'s embeddings: md5
    * over each data file's (name, length, mtime). Stale-serving guard
    * for persisted indexes/codebooks — a REGENERATED corpus at the same
    * scale factor keeps the row count but changes lengths/mtimes, so a
    * count-only check would silently serve a stale index (r13 advisor
    * finding). Metadata-only: no data read, O(files) namenode calls. */
  private[graft] def corpusFingerprint(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stats =
      if (!fs.exists(p)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else if (fs.getFileStatus(p).isFile) Array(fs.getFileStatus(p))
      else fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
    val desc = stats.map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private[graft] def ivfIndexed(s: org.apache.spark.sql.SparkSession,
      d: String): IvfIndex = {
    // register session functions HERE, not only inside the build path —
    // a LOADED index skips ivfAssignedWithCents, but every consumer
    // still scores with cosine_sim (caught by the fresh-JVM load rig)
    graft.functions.GraftFunctions.register(s)
    val appId = s.sparkContext.applicationId
    val parts = s.conf.get("spark.sql.shuffle.partitions", "?")
    indexCache.keySet.removeIf(k => !k.startsWith(s"$appId:"))
    indexCache.computeIfAbsent(s"$appId:$parts:$d", _ => {
      val e = embNonNull(s, d)
      val n = e.count()
      val root = persistRoot(s)
      val loaded = if (root.isEmpty) None else loadPersisted(s, root, d, n)
      loaded.getOrElse {
        ivfBuilds.incrementAndGet()
        val (asg, cents) = ivfAssignedWithCents(s, d, ivfCells(n))
        val df =
          org.apache.spark.sql.execution.GraftCheckpoint.localCheckpointFlatStats(
            asg.filter(col("rn") <= IvfProbes)
              .select(col("vec_id"), col("cid"), col("embedding"), col("rn")))
        // the centroid table is sqrt(n) rows — materialized beside the
        // memberships so residual consumers don't re-run the quantizer
        val cdf = org.apache.spark.sql.execution.GraftCheckpoint
          .localCheckpointFlatStats(cents)
        val idx = IvfIndex(df, n, cdf)
        if (root.nonEmpty) savePersisted(s, root, d, idx)
        idx
      }
    })
  }

  /** Load the persisted index if its commit marker exists and BOTH its
    * stored corpus row count and content fingerprint match the LIVE
    * corpus (a regenerated corpus — even at the same row count —
    * invalidates the index rather than silently serving stale cells). */
  private def loadPersisted(s: org.apache.spark.sql.SparkSession,
      root: String, d: String, n: Long): Option[IvfIndex] = {
    val base = persistPath(root, d)
    val meta = new org.apache.hadoop.fs.Path(s"$base/meta")
    val fs = meta.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) return None
    val in = fs.open(meta)
    val stored = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.trim finally in.close()
    if (stored != s"$n ${corpusFingerprint(s, d)}") return None
    ivfLoads.incrementAndGet()
    Some(IvfIndex(s.read.parquet(s"$base/ivf"), n,
      s.read.parquet(s"$base/cents")))
  }

  private def savePersisted(s: org.apache.spark.sql.SparkSession,
      root: String, d: String, idx: IvfIndex): Unit = {
    val base = persistPath(root, d)
    idx.df.write.mode("overwrite").parquet(s"$base/ivf")
    idx.cents.write.mode("overwrite").parquet(s"$base/cents")
    val meta = new org.apache.hadoop.fs.Path(s"$base/meta")
    val fs = meta.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(meta, true)
    try out.write(
      s"${idx.corpusRows} ${corpusFingerprint(s, d)}\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Members per grouped cell row cap (r11). Without it a hot cell — a
    * near-dup cluster holding half the corpus — becomes ONE wide grouped
    * row and ONE shuffle key: in the over-cap shuffle regime every probe
    * of that cell hashes to the same partition, a single task computes
    * all |cell|^2 pairs, and AQE's skew splitting cannot help (it splits
    * partitions of many rows, not one mega-row). BENCH_NOTES_r11 measured
    * 366 s vs 74 s at the 10x rig with a 20k-member hot cluster. Cells
    * over the cap get ceil(size/cap) SALT keys: each member hashes into
    * one salt, each probe fans out across its cell's salts (the per-cell
    * salt table is sqrt(n) rows, broadcast) — pair volume is unchanged,
    * but it spreads over size/cap shuffle keys/tasks, and grouped-row
    * width lands near the cap IN EXPECTATION (hash assignment is
    * binomial around size/n_salts, so individual groups run a few
    * percent over — treat the cap as a sizing target, not a hard
    * bound). Standard IVF imbalance handling.
    * Session-overridable via `spark.graft.ivf.maxCellGroupMembers`
    * (smaller = more parallelism on hot cells, more probe fan-out).
    * Default 1024: at the 10x hot-cluster rig (20k-member cell), 1024
    * (20 salts) measured 35 s steady vs 130 s at 4096 (5 salts) in the
    * shuffle regime — hot-cell parallelism dominates the extra fan-out
    * (BENCH_NOTES_r11); uniform sqrt(n)-sized cells only exceed 1024
    * beyond ~10^6 vectors, where the extra keys are pure win. */
  val MaxCellGroupMembers = 1024

  private def maxCellGroup(s: org.apache.spark.sql.SparkSession): Int =
    s.conf.get("spark.graft.ivf.maxCellGroupMembers",
      MaxCellGroupMembers.toString).toInt

  /** Grouped members keyed (cid, salt) + the per-cell salt counts the
    * probe side fans out with. `saltCounts` is None when NO cell exceeds
    * the group cap — the common uniform-corpus case — where both sides
    * carry a constant salt key and the probe fan-out join/explode is
    * skipped entirely (it measurably taxed the sf0.1 bench ~0.4 s/query
    * for zero benefit). */
  final case class SaltedCells(members: DataFrame,
      saltCounts: Option[DataFrame])

  /** Each cell's members grouped into ~[[MaxCellGroupMembers]]-wide rows
    * (the r8 blocked-candidate shape: the flat SMJ materialized
    * ~probes*(n/cells) join-output rows each carrying TWO 64-float
    * embeddings — the 10x corpus spent ~10 min/run copying those wide
    * rows; grouped, the join is salted-cell-keyed and the explode + sim +
    * narrow projection fuse into one codegen stage, so wide embeddings
    * never cross a stage boundary). UN-HINTED by design (see the class
    * note above): size-based planning + AQE pick broadcast vs shuffle
    * from the measured grouped size; KnnGraphSpec pins that the forced
    * shuffle regime returns identical rows through a real keyed
    * exchange.
    */
  private def cellMembersGrouped(s: org.apache.spark.sql.SparkSession,
      idx: IvfIndex): SaltedCells = {
    val m0 = idx.df.filter(col("rn") === 1)
    val saltCountsPlan = m0.groupBy("cid")
      .agg(ceil(count(lit(1)).cast(DoubleType) / maxCellGroup(s))
        .cast(IntegerType).as("n_salts"))
    // decides whether any cell needs salting at all (headOption: empty
    // corpus -> no salting), keeping the uniform-corpus plan free of the
    // fan-out join below. A plain aggregate, NOT a checkpoint: in the
    // common non-hot case nothing downstream reuses saltCounts, and an
    // eager localCheckpoint here would leak its blocks until GC once per
    // query construction.
    val anyHot = saltCountsPlan.agg(max(col("n_salts")).as("m"))
      .collect().headOption.exists(r => !r.isNullAt(0) && r.getInt(0) > 1)
    if (!anyHot) {
      val members = m0.groupBy("cid")
        .agg(collect_list(struct(col("vec_id"), col("embedding")))
          .as("members"))
        .withColumn("salt", lit(0))
      SaltedCells(members, None)
    } else {
      // hot path: materialize the sqrt(n)-row table once so BOTH fan-out
      // joins reuse it instead of re-running the corpus-sized aggregate
      val saltCounts =
        org.apache.spark.sql.execution.GraftCheckpoint
          .localCheckpointFlatStats(saltCountsPlan)
      val members = m0
        .join(graft.BroadcastBounds.bounded("ivf-cell-salts")(saltCounts),
          "cid")
        .withColumn("salt",
          pmod(xxhash64(col("vec_id")), col("n_salts").cast(LongType))
            .cast(IntegerType))
        .groupBy("cid", "salt")
        .agg(collect_list(struct(col("vec_id"), col("embedding")))
          .as("members"))
      SaltedCells(members, Some(saltCounts))
    }
  }

  /** The probe stream fanned out across each probed cell's salt keys
    * (fan-out 1 for every cell under [[MaxCellGroupMembers]] — and a
    * constant-key no-op when no cell is hot; a member meets a probe
    * exactly once since it carries exactly one salt). */
  private def saltedProbes(probes: DataFrame, cells: SaltedCells): DataFrame =
    cells.saltCounts match {
      case None => probes.withColumn("salt", lit(0))
      case Some(sc) => probes
        .join(graft.BroadcastBounds.bounded("ivf-cell-salts")(sc), "cid")
        .withColumn("salt", explode(sequence(lit(0), col("n_salts") - 1)))
        .drop("n_salts")
    }

  /** Oracle twin of [[ivfAssigned]] (CTE chain ending in `assigned` and
    * the home-cell view `cells`), shared by the q48 and q62 oracles. */
  private[graft] val IVF_CELLS_SQL: String =
    s"""env AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
      |${duckTrainSampleCtes("env")},
      |seeds AS (SELECT vec_id AS cid, embedding AS ce
      |    FROM env WHERE vec_id < (SELECT GREATEST($IvfCellsMin,
      |      CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))
      |      FROM env)),
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
      |cells AS (SELECT vec_id, cid, embedding FROM assigned WHERE rn = 1)""".stripMargin

  /** Oracle twin of [[knnGraph]] as a reusable CTE chain ending in `g` =
    * (qid, rk, nn_id, sim); shared by the q62 and q97 oracles so the
    * triplet check rides the exact edge list the graph check pins. */
  private[queries] val KNN_GRAPH_CTES: String =
    s"""$IVF_CELLS_SQL,
       |probes AS (SELECT vec_id AS qid, cid AS qcid, embedding AS qe
       |           FROM assigned WHERE rn <= $IvfProbes),
       |cand AS (SELECT p.qid, c.vec_id AS nn_id,
       |    CAST(ROUND(list_cosine_similarity(CAST(p.qe AS DOUBLE[]),
       |      CAST(c.embedding AS DOUBLE[])), 4) AS DOUBLE) AS sim
       |  FROM probes p JOIN cells c
       |    ON c.cid = p.qcid AND c.vec_id <> p.qid),
       |r AS (SELECT qid, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nn_id) AS rk
       |  FROM cand),
       |g AS (SELECT qid, CAST(rk AS INT) AS rk, nn_id, sim
       |  FROM r WHERE rk <= $KnnK)""".stripMargin

  /** q62's kNN graph body (unordered): per vector, its top-KnnK IVF
    * neighbors as (qid, rk, nn_id, sim). Factored out so graph consumers
    * (q85 PageRank) share the exact edge list the oracle checks. */
  def knnGraph(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val index = ivfIndexed(s, d)
    // blocked candidate stream via [[cellMembersGrouped]] (r8 grouped
    // shape, r11 salted + UN-hinted: size-based planning + AQE own
    // broadcast-vs-shuffle, hot cells split across (cid, salt) keys).
    // Arithmetic is unchanged (same r4(cosine_sim) per pair), so the
    // edge list and its oracle are untouched by the regime.
    val cellMembers = cellMembersGrouped(s, index)
    val probes = saltedProbes(index.df
      .select(col("vec_id").as("qid"), col("cid"), col("embedding").as("qe")),
      cellMembers)
    val cand = probes.join(cellMembers.members, Seq("cid", "salt"))
      .select(col("qid"), col("qe"), explode(col("members")).as("m"))
      .select(col("qid"), col("m.vec_id").as("nn_id"),
        r4(expr("cosine_sim(qe, m.embedding)")).as("sim"))
      .filter(col("nn_id") =!= col("qid"))
    cand
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("sim").desc, col("nn_id"))))
      .filter(col("rk") <= KnnK)
      .select(col("qid"), col("rk"), col("nn_id"), col("sim"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Q47 language ID: marker-word scoring, argmax, accuracy vs the label --
    QueryDef("q47_lang_id",
      (s, d) => {
        val toks = t(s, d, "documents").withColumn("toks", split(col("text"), " "))
        val scored = markers.foldLeft(toks) { case (df, (lang, words)) =>
          val lits = array(words.map(lit): _*)
          df.withColumn(s"hits_$lang",
            size(filter(col("toks"), x => array_contains(lits, x))).cast(IntegerType))
        }
        // true argmax, ties -> alphabetically first: lang wins when its
        // hits are strictly above every earlier language AND at least every
        // later one (and nonzero)
        val langs = markers.map(_._1)
        val pred = langs.foldRight(lit("und"): Column) { (lang, els) =>
          val beatsEarlier = langs.filter(_ < lang)
            .map(o => col(s"hits_$lang") > col(s"hits_$o"))
          val coversLater = langs.filter(_ > lang)
            .map(o => col(s"hits_$lang") >= col(s"hits_$o"))
          when((beatsEarlier ++ coversLater)
            .foldLeft(col(s"hits_$lang") > 0)(_ && _), lit(lang)).otherwise(els)
        }
        scored
          .withColumn("pred_lang", pred)
          .groupBy("lang", "pred_lang")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "pred_lang")
      },
      Some {
        val hits = markers.map { case (lang, words) =>
          val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_filter(string_split(text, ' '), x -> list_contains($lst, x))) AS hits_$lang"
        }.mkString(",\n  ")
        val langs = markers.map(_._1)
        val pred = langs.map { lang =>
          val cond = (s"hits_$lang > 0" +:
            (langs.filter(_ < lang).map(o => s"hits_$lang > hits_$o") ++
              langs.filter(_ > lang).map(o => s"hits_$lang >= hits_$o"))).mkString(" AND ")
          s"WHEN $cond THEN '$lang'"
        }.mkString("CASE ", " ", " ELSE 'und' END")
        s"""WITH h AS (SELECT lang, $hits FROM documents),
           |p AS (SELECT lang, $pred AS pred_lang FROM h)
           |SELECT lang, pred_lang, COUNT(*) AS n_docs FROM p
           |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
      }),

    // Q18b RANGE-interval frame (the declared engine-side variant; DuckDB
    // agrees on frame semantics -> oracle-checked) ------------------------
    QueryDef("q18b_range_interval_frame",
      (s, d) =>
        events(s, d)
          .withColumn("ts", col("ts").cast(TimestampType))
          .selectExpr("event_id", "user_id", "ts",
            """CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER (
              |  PARTITION BY user_id ORDER BY ts
              |  RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW),
              |  4) AS DOUBLE) AS hr_sum""".stripMargin)
          .orderBy("event_id"),
      Some(s"""WITH e AS ($EVENTS_SQL)
              |SELECT event_id, user_id, ts,
              | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER (
              |   PARTITION BY user_id ORDER BY ts
              |   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),
              |   4) AS DOUBLE) AS hr_sum
              |FROM e ORDER BY event_id""".stripMargin)),

    // Q49 winnowing fingerprints (rolling hash) ----------------------------
    // Token values v = ascii(first char)*31 + length; rolling hash over
    // 4-token k-grams H_i = ((v_i*31+v_{i+1})*31+v_{i+2})*31+v_{i+3};
    // winnowing keeps the MIN hash in each 4-gram window of hashes; the
    // distinct selected hashes are the document's fingerprints. All pure
    // arithmetic -> bit-identical across engines, zero shuffle per doc.
    QueryDef("q49_winnowing",
      (s, d) => {
        val toks = t(s, d, "documents").withColumn("toks", split(col("text"), " "))
        // `vals` MUST be a materialized column: referencing the transform
        // expression inside element_at would inline (and recompute) the
        // whole array per access — O(n^2) per document.
        // NB: Spark sequence(0, -1) DESCENDS while DuckDB generate_series
        // is empty — guard short docs explicitly on the Spark side.
        val hashes = when(size(col("toks")) < 4, expr("CAST(array() AS ARRAY<BIGINT>)"))
          .otherwise(transform(
            sequence(lit(0), size(col("toks")) - 4),
            i => ((element_at(col("vals"), i + 1) * 31L
              + element_at(col("vals"), i + 2)) * 31L
              + element_at(col("vals"), i + 3)) * 31L
              + element_at(col("vals"), i + 4)))
        val selected = when(size(col("hs")) < 4, expr("CAST(array() AS ARRAY<BIGINT>)"))
          .otherwise(transform(
            sequence(lit(0), size(col("hs")) - 4),
            i => array_min(slice(col("hs"), i + 1, lit(4)))))
        toks
          .withColumn("vals", transform(col("toks"), tok => ascii(tok) * 31 + length(tok)))
          .withColumn("hs", hashes)
          .select(col("doc_id"),
            size(array_distinct(selected)).cast(IntegerType).as("n_fingerprints"),
            size(col("hs")).cast(IntegerType).as("n_kgrams"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |v AS (SELECT doc_id, list_transform(toks, t -> ascii(t) * 31 + length(t)) AS vals,
             |        len(toks) AS nt FROM tk),
             |h AS (SELECT doc_id,
             |        list_transform(generate_series(0, greatest(nt - 4, -1)), i ->
             |          ((vals[i+1] * 31 + vals[i+2]) * 31 + vals[i+3]) * 31 + vals[i+4]) AS hs
             |      FROM v),
             |w AS (SELECT doc_id, hs,
             |        list_transform(generate_series(0, greatest(len(hs) - 4, -1)), i ->
             |          list_min(hs[i+1:i+4])) AS sel
             |      FROM h)
             |SELECT doc_id,
             |  CAST(len(list_distinct(sel)) AS INT) AS n_fingerprints,
             |  CAST(len(hs) AS INT) AS n_kgrams
             |FROM w ORDER BY doc_id""".stripMargin)),

    // Q48 IVF similarity search (scale path beside q41's LSH buckets) ------
    // Coarse quantizer trained with one deterministic Lloyd step (r5): the
    // first sqrt(n)-scaled ivfCells vectors seed the cells, every vector is assigned to
    // its nearest seed, each cell's refined centroid is the element-wise
    // mean of its members (rounded to 6 decimals — absorbs partial-agg
    // sum-order ULP drift — and narrowed to float like a stored centroid),
    // then the final assignment runs against the refined centroids. The
    // centroid table stays broadcast-able (see the IvfCellsMin scaladoc); the
    // query searches its IvfProbes nearest refined cells -> IvfProbes /
    // IvfCells of the corpus scanned.
    QueryDef("q48_ann_ivf",
      (s, d) => {
        val index = ivfIndexed(s, d).df
        val cells = index.filter(col("rn") === 1)
          .select(col("vec_id"), col("cid"), col("embedding"))
        // nprobe: the query side expands to its IvfProbes nearest cells;
        // the (tiny) probe list broadcasts, the corpus is scanned once
        val qprobe = index.filter(col("vec_id") === 0)
          .select(col("cid").as("qcid"), col("embedding").as("qe"))
        cells.join(
            graft.BroadcastBounds.bounded("single-query-probe")(qprobe),
            col("cid") === col("qcid"))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), r4(expr("cosine_sim(embedding, qe)")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""WITH $IVF_CELLS_SQL,
             |qcell AS (SELECT cid AS qcid, embedding AS qe FROM assigned
             |          WHERE vec_id = 0 AND rn <= $IvfProbes)
             |SELECT v.vec_id,
             |  CAST(ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
             |    CAST(q.qe AS DOUBLE[])), 4) AS DOUBLE) AS sim
             |FROM cells v JOIN qcell q ON v.cid = q.qcid
             |WHERE v.vec_id <> 0
             |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin)),

    // Q62 k-NN graph over IVF cells (r7) -----------------------------------
    // The batch counterpart of q48's single-query search, and the input of
    // semantic-dedup / kNN-clustering pipelines (SemDeDup-style): EVERY
    // vector finds its KnnK nearest neighbors, searched only inside its
    // IvfProbes nearest cells. Per-query candidate count is IvfProbes *
    // n/IvfCells (~2*sqrt(n) at production sqrt(n)-cell sizing), so the
    // candidate join is O(n^1.5) not O(n^2), keyed on cell id — at sqrt(n)
    // cells no key is hot. Top-k is a window partitioned BY QUERY VECTOR
    // (bounded partitions), never a global sort; ties broken by neighbor id
    // on ROUND(sim, 4) so the graph is engine-stable.
    QueryDef("q62_knn_graph",
      (s, d) => knnGraph(s, d).orderBy("qid", "rk"),
      Some(s"""WITH $KNN_GRAPH_CTES
             |SELECT qid, rk, nn_id, sim FROM g ORDER BY qid, rk""".stripMargin)),

    // Q97 contrastive triplet mining (r8) ----------------------------------
    // Hard-negative mining for contrastive embedding training (the
    // DPR/SimCSE data-prep step): per anchor, positive = its nearest
    // retrieved neighbor (rank 1), hard negative = the FARTHEST of its
    // top-K retrieved candidates — semantically close enough to be
    // informative, far enough down the ranking to be a negative; margin =
    // pos_sim − neg_sim is the per-triplet difficulty the loss weights.
    // Rides q62's oracle-checked O(n^1.5) cell-bounded candidate stream
    // unchanged; the triplet selection itself is ONE partial-agg groupBy
    // on the anchor id (min_by/max_by over rk — no second window, no
    // extra shuffle beyond q62's). At 100 TB the kNN graph is the
    // expensive artifact; triplets are a near-free derivation from it.
    QueryDef("q97_contrastive_triplets",
      (s, d) => {
        val g = knnGraph(s, d)
        g.groupBy("qid")
          .agg(min_by(col("nn_id"), col("rk")).as("pos_id"),
            min_by(col("sim"), col("rk")).as("pos_sim"),
            max_by(col("nn_id"), col("rk")).as("neg_id"),
            max_by(col("sim"), col("rk")).as("neg_sim"),
            count(lit(1)).as("k"))
          .filter(col("k") >= 2)
          .select(col("qid"), col("pos_id"), col("pos_sim"),
            col("neg_id"), col("neg_sim"),
            f4(col("pos_sim") - col("neg_sim")).as("margin"))
          .orderBy("qid")
      },
      Some(s"""WITH $KNN_GRAPH_CTES
             |SELECT qid, MIN_BY(nn_id, rk) AS pos_id,
             |  MIN_BY(sim, rk) AS pos_sim,
             |  MAX_BY(nn_id, rk) AS neg_id,
             |  MAX_BY(sim, rk) AS neg_sim,
             |  ${F4("MIN_BY(sim, rk) - MAX_BY(sim, rk)")} AS margin
             |FROM g GROUP BY qid HAVING COUNT(*) >= 2
             |ORDER BY qid""".stripMargin)),

    // Q68 semantic dedup over IVF cells (r7) -------------------------------
    // SemDeDup: a vector is a semantic duplicate when some LOWER-ID vector
    // within its probed cells sits at cosine >= SemTau (0.95, q37's
    // near-dup bar); the kept set is the ε-graph min-id rule — every
    // ε-ball keeps its smallest id, deterministically, with no iteration
    // (q51/q59 do the transitive version for the candidate-pair graph;
    // SemDeDup's published form is exactly this one-hop in-cluster drop).
    // Candidate generation is q62's shape: home cells joined against each
    // vector's IvfProbes probe list — O(n^1.5) at sqrt(n) cells, never
    // all-pairs, keyed on cell id. A vector's home cell is unique, so
    // each (neighbor, query) pair surfaces at most once — counts need no
    // distinct. Output pins the full decision: per-vector cell, the count
    // of ε-neighbors that outrank it, its canonical (min-id) neighbor,
    // and the kept flag the downstream pipeline filters on.
    QueryDef("q68_semdedup",
      (s, d) => {
        val idx = ivfIndexed(s, d)
        val cells = idx.df.filter(col("rn") === 1)
          .select(col("vec_id"), col("cid"), col("embedding"))
        // blocked candidate stream, q62's r8 grouped shape (11x at the
        // 10x corpus) under the r11 salted un-hinted regime: explode +
        // sim + narrow projection fuse in one stage (wide rows never
        // cross a boundary), hot cells split across (cid, salt) keys,
        // and size-based planning + AQE pick broadcast vs shuffle from
        // the measured grouped size
        val cellMembers = cellMembersGrouped(s, idx)
        val probes = saltedProbes(idx.df
          .select(col("vec_id").as("qid"), col("cid"), col("embedding").as("qe")),
          cellMembers)
        val close = probes.join(cellMembers.members, Seq("cid", "salt"))
          .select(col("qid"), col("qe"), explode(col("members")).as("m"))
          .filter(col("m.vec_id") < col("qid"))
          .select(col("qid"), col("m.vec_id").as("nn_id"),
            r4(expr("cosine_sim(qe, m.embedding)")).as("sim"))
          .filter(col("sim") >= SemTau)
          .groupBy("qid")
          .agg(count(lit(1)).cast(IntegerType).as("n_close"),
            min(col("nn_id")).as("dup_of"))
        cells.join(close, col("vec_id") === col("qid"), "left")
          .select(col("vec_id"), col("cid"),
            coalesce(col("n_close"), lit(0)).as("n_close"),
            coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
            when(col("n_close").isNull, lit(1)).otherwise(lit(0))
              .cast(IntegerType).as("kept"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $IVF_CELLS_SQL,
             |probes AS (SELECT vec_id AS qid, cid AS qcid, embedding AS qe
             |           FROM assigned WHERE rn <= $IvfProbes),
             |close AS (SELECT qid,
             |    CAST(COUNT(*) AS INT) AS n_close,
             |    MIN(vec_id) AS dup_of
             |  FROM (SELECT p.qid, c.vec_id,
             |      CAST(ROUND(list_cosine_similarity(CAST(p.qe AS DOUBLE[]),
             |        CAST(c.embedding AS DOUBLE[])), 4) AS DOUBLE) AS sim
             |    FROM probes p JOIN cells c
             |      ON c.cid = p.qcid AND c.vec_id < p.qid) x
             |  WHERE sim >= $SemTau
             |  GROUP BY qid)
             |SELECT v.vec_id, v.cid,
             |  COALESCE(cl.n_close, 0) AS n_close,
             |  COALESCE(cl.dup_of, -1) AS dup_of,
             |  CAST(CASE WHEN cl.n_close IS NULL THEN 1 ELSE 0 END AS INT) AS kept
             |FROM cells v LEFT JOIN close cl ON v.vec_id = cl.qid
             |ORDER BY v.vec_id""".stripMargin)),

    // Q103 semantic decontamination (r12) ----------------------------------
    // The EMBEDDING-space twin of q101's lexical overlap check (and the
    // third member of the decontamination family with q56): for every
    // TRAIN vector (vec_id % 19 != 0), the maximum cosine against any
    // BENCHMARK vector (vec_id % 19 == 0) searched within the train
    // vector's IvfProbes nearest cells — paraphrased eval leakage that
    // shares no 8-gram surfaces lexically but sits at SemTau-radius
    // semantically (the SemDeDup observation applied to decontamination).
    // Output is the q101-shaped top-50 report, flagged at q68's SemTau.
    //
    // Scale shape: rides the ONE materialized IVF index (same Scan
    // ExistingRDD leaves as q62/q68); the candidate join is the salted
    // cell-members shape with the BENCH side grouped (holdout-sized
    // members — a hot bench cell still salts across bounded group keys);
    // per-train argmax is a window over probe-bounded candidates; the
    // global top-50 is TakeOrderedAndProject. Candidates are
    // probes x bench/cells per train vector — O(n^0.5 x holdout/corpus)
    // each, never all-pairs.
    QueryDef("q103_semantic_decontamination",
      (s, d) => {
        val idx = ivfIndexed(s, d)
        val probes = idx.df.filter(col("rn") <= IvfProbes
            && col("vec_id") % 19 =!= 0)
          .select(col("vec_id").as("qid"), col("cid"),
            col("embedding").as("qe"))
        val benchIdx = IvfIndex(
          idx.df.filter(col("vec_id") % 19 === 0), idx.corpusRows,
          idx.cents)
        val cells = cellMembersGrouped(s, benchIdx)
        val cand = saltedProbes(probes, cells)
          .join(cells.members, Seq("cid", "salt"))
          .select(col("qid"), col("qe"), explode(col("members")).as("m"))
          .select(col("qid"), col("m.vec_id").as("bench_id"),
            r4(expr("cosine_sim(qe, m.embedding)")).as("sim"))
        cand.withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("qid")
              .orderBy(col("sim").desc, col("bench_id"))))
          .filter(col("rk") === 1)
          .select(col("qid").as("vec_id"), col("bench_id"),
            col("sim").as("max_sim"), (col("sim") >= SemTau).as("flagged"))
          .orderBy(col("max_sim").desc, col("vec_id"))
          .limit(50)
      },
      Some(s"""WITH $IVF_CELLS_SQL,
             |probes AS (SELECT vec_id AS qid, cid, embedding AS qe
             |  FROM assigned WHERE rn <= $IvfProbes AND vec_id % 19 <> 0),
             |bench AS (SELECT vec_id AS bench_id, cid, embedding
             |  FROM cells WHERE vec_id % 19 = 0),
             |cand AS (SELECT p.qid, b.bench_id,
             |    CAST(ROUND(list_cosine_similarity(CAST(p.qe AS DOUBLE[]),
             |      CAST(b.embedding AS DOUBLE[])), 4) AS DOUBLE) AS sim
             |  FROM probes p JOIN bench b ON b.cid = p.cid),
             |best AS (SELECT qid, bench_id, sim,
             |    ROW_NUMBER() OVER (PARTITION BY qid
             |      ORDER BY sim DESC, bench_id) AS rk FROM cand)
             |SELECT qid AS vec_id, bench_id, sim AS max_sim,
             |  sim >= $SemTau AS flagged
             |FROM best WHERE rk = 1
             |ORDER BY max_sim DESC, vec_id LIMIT 50""".stripMargin)),

    // Q54 int8 embedding quantization (r5) ---------------------------------
    // The 4x storage/bandwidth compressor of a 100TB embedding store:
    // per-dimension [lo, hi] ranges trained on the corpus (one
    // posexplode + groupBy — partial-aggregatable, dim-sized output),
    // broadcast back, each vector quantized to 8-bit levels and
    // reconstructed; output = per-vector reconstruction quality (cosine
    // vs the original + max absolute error). Quantization uses
    // floor(x + 0.5), not ROUND: floor is exact on doubles in both
    // engines, while ROUND's half-way behavior is the one knife edge a
    // mid-cell value can actually hit.
    QueryDef("q54_embedding_quantization",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
        val stats = e
          .select(posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("pos")
          .agg(min(col("v").cast(DoubleType)).as("lo"),
            max(col("v").cast(DoubleType)).as("hi"))
        val params = graft.BroadcastBounds.bounded("dim-range-params")(
          stats.groupBy().agg(
          transform(array_sort(collect_list(struct(col("pos"), col("lo")))),
            x => x.getField("lo")).as("los"),
          transform(array_sort(collect_list(struct(col("pos"), col("hi")))),
            x => x.getField("hi")).as("his")))
        val recon = transform(sequence(lit(0), size(col("embedding")) - 1), i => {
          val v = element_at(col("embedding"), i + 1).cast(DoubleType)
          val lo = element_at(col("los"), i + 1)
          val hi = element_at(col("his"), i + 1)
          when(hi === lo, lo).otherwise(
            lo + floor(least(greatest((v - lo) / (hi - lo), lit(0.0)), lit(1.0))
              * 255 + 0.5) / 255 * (hi - lo))
        })
        e.crossJoin(params)
          .withColumn("recon", recon)
          .select(col("vec_id"),
            r4(expr("cosine_sim(embedding, CAST(recon AS ARRAY<FLOAT>))"))
              .as("cos_recon"),
            r4(array_max(zip_with(col("embedding"), col("recon"),
              (v, r) => abs(v.cast(DoubleType) - r)))).as("max_abs_err"))
          .orderBy("vec_id")
      },
      Some("""WITH pieces AS (SELECT
             |    unnest(CAST(embedding AS DOUBLE[])) AS v,
             |    unnest(generate_series(1, len(embedding))) AS pos
             |  FROM embeddings),
             |st AS (SELECT pos, MIN(v) AS lo, MAX(v) AS hi
             |       FROM pieces GROUP BY pos),
             |params AS (SELECT list(lo ORDER BY pos) AS los,
             |                  list(hi ORDER BY pos) AS his FROM st),
             |r AS (SELECT vec_id, embedding,
             |    list_transform(generate_series(1, len(embedding)), i ->
             |      CASE WHEN his[i] = los[i] THEN los[i]
             |      ELSE los[i] + floor(LEAST(GREATEST(
             |          (CAST(embedding[i] AS DOUBLE) - los[i])
             |            / (his[i] - los[i]), 0.0), 1.0) * 255 + 0.5)
             |        / 255 * (his[i] - los[i]) END) AS recon
             |  FROM embeddings CROSS JOIN params)
             |SELECT vec_id,
             |  CAST(ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             |    CAST(CAST(recon AS FLOAT[]) AS DOUBLE[])), 4) AS DOUBLE)
             |    AS cos_recon,
             |  CAST(ROUND(list_max(list_transform(
             |      generate_series(1, len(embedding)), i ->
             |        abs(CAST(embedding[i] AS DOUBLE) - recon[i]))), 4)
             |    AS DOUBLE) AS max_abs_err
             |FROM r ORDER BY vec_id""".stripMargin)),

    // Q99: corpus heavy hitters via a bounded Misra-Gries sketch + exact
    // rescue pass (functions/HeavyHitters.scala for the scale story). Pass
    // 1 never shuffles the vocabulary: one sketch buffer per partition
    // reaches the driver (<= 4096 counters each). Pass 2 counts ONLY the
    // candidate tokens — the corpus-sized groupBy is gated by a broadcast
    // semi-join, so its key space is <= capacity instead of the 10^8-key
    // unicode tail. Output is EXACT and execution-order-deterministic even
    // though the sketch isn't: every true heavy hitter clears the MG
    // guarantee into the candidate set, and the exact counts discard the
    // rest (HeavyHittersSpec pins the guarantee past the compression
    // paths; the oracle is the naive full-vocab groupBy).
    QueryDef("q99_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val toks = t(s, d, "documents")
          .select(split(col("text"), " ").as("toks"))
        val sketch = new graft.functions.HeavyHitterSketch(
          graft.functions.HeavyHitterSketch.DefaultCapacity)
        val candidates: Array[String] =
          toks.as[Array[String]].select(sketch.toColumn).head()
        val nTotal = toks.agg(sum(size(col("toks")))).head().getLong(0)
        val thr = math.max(nTotal / 1000L, 5L)
        // EXACTNESS coupling (r8 advice): Misra-Gries guarantees every
        // token with true count > nTotal/(capacity+1) survives the sketch,
        // so the rescue pass is exact only while thr clears that bound.
        // Holds for all n at capacity 4096 / thr >= n/1000; fail loudly if
        // either constant is ever changed independently.
        require(thr > nTotal / (
            graft.functions.HeavyHitterSketch.DefaultCapacity + 1L),
          s"q99 threshold $thr does not clear the MG guarantee " +
            s"${nTotal / (graft.functions.HeavyHitterSketch.DefaultCapacity + 1L)} " +
            "— raise the threshold or the sketch capacity")
        val candDf = graft.BroadcastBounds.bounded("mg-candidates")(
          candidates.toSeq.toDF("token"))
        toks.select(explode(col("toks")).as("token"))
          .join(candDf, Seq("token"), "left_semi")
          .groupBy("token")
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= thr)
          .orderBy(col("cnt").desc, col("token"))
      },
      Some("""WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token
             |              FROM documents),
             |tot AS (SELECT COUNT(*) AS n FROM toks)
             |SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
             |HAVING COUNT(*) >= GREATEST((SELECT n FROM tot) // 1000, 5)
             |ORDER BY cnt DESC, token""".stripMargin)))
}
