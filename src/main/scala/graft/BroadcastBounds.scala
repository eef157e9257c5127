package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Registry of every EXPLICIT broadcast hint in the query surface.
  *
  * An explicit `broadcast(...)` hint OVERRIDES
  * `spark.sql.autoBroadcastJoinThreshold`: size-based planning and AQE
  * never get a vote, so a hinted build side that grows with the corpus is
  * a hard failure at scale (the 8 GB broadcast-table limit, then driver
  * OOM) — not the graceful shuffle degradation an un-hinted plan gets for
  * free. The r8 q62/q68 cell-members hint was exactly that bug class.
  *
  * This registry makes the class structurally impossible to reintroduce:
  * [[bounded]] is the ONLY sanctioned way to hint a broadcast inside
  * `graft.queries` (BroadcastBoundsSpec walks the source tree and fails on
  * any raw `broadcast(` call), and every hint must cite a registered bound
  * explaining why the build side cannot grow with the corpus — or, for the
  * `gated` entry, why the hint is only applied under a measured size
  * cap and which shuffle plan takes over beyond it.
  * [[bounded]] stamps the build side with a `graft_bcast_<name>` subquery
  * alias, so BroadcastBoundsSpec can also walk every ANALYZED plan and
  * prove each ResolvedHint in the query surface traces back to a
  * registered bound.
  */
object BroadcastBounds {

  /** How the build side's size responds to corpus growth. */
  sealed trait Growth
  /** Constant-sized: one-row aggregates, enumerated dimensions, d- or
    * d²-bounded tables, single-query probe lists, capped candidate sets. */
  case object Fixed extends Growth
  /** Grows strictly slower than the corpus: sqrt(n) cells/shards,
    * stratum-cardinality tables. Still must be WAY below broadcast limits
    * at any realistic scale — each rationale quantifies. */
  case object Sublinear extends Growth
  /** Bounded by an EXTERNAL artifact (a benchmark suite, a CDC batch), not
    * by the corpus being scanned. */
  case object External extends Growth
  /** Corpus-proportional shape whose hint is applied ONLY under a size
    * gate; over the gate the same plan ships without the hint and degrades
    * to a keyed shuffle. The rationale names the gate and the fallback. */
  case object Gated extends Growth

  final case class Bound(growth: Growth, rationale: String)

  /** Alias prefix stamped on every bounded build side (plan-walkable). */
  val Tag = "graft_bcast_"

  val registry: Map[String, Bound] = Map(
    "scalar-agg" -> Bound(Fixed,
      "a global aggregate with no grouping keys: exactly one row at any " +
        "corpus size (totals, maxima, medians, counts)"),
    "dim-pairs" -> Bound(Fixed,
      "the d(d+1)/2 coordinate-index pairs of the embedding dimension " +
        "(d=64 -> 2080 rows of two ints); a property of the schema, not " +
        "the corpus"),
    "dim-means" -> Bound(Fixed,
      "one row per embedding coordinate (d rows); schema-bounded"),
    "dim-range-params" -> Bound(Fixed,
      "one row carrying two d-length arrays (per-coordinate lo/hi); " +
        "schema-bounded"),
    "enumerated-dim" -> Bound(Fixed,
      "TPC-H region/nation: enumerated dimensions (5 / 25 rows) that do " +
        "not scale with fact-table volume"),
    "single-query-probe" -> Bound(Fixed,
      "one query vector, or its <= nProbe probe expansions: per-query " +
        "constant rows"),
    "pq-model" -> Bound(Fixed,
      "the PQ codec model as ONE row (SubSpaces x <= CodebookK centroid " +
        "coords + the query LUT): a property of the trained codec, " +
        "constant at any corpus size (16x256x32 floats ~ 0.5 MB at the " +
        "FAISS-standard production shape)"),
    "mg-candidates" -> Bound(Fixed,
      "Misra-Gries candidate tokens: <= sketch capacity (4096) rows by " +
        "construction, whatever the vocabulary size"),
    "point-get-keys" -> Bound(Fixed,
      "a point-lookup's probe key set: per-query constant rows (the GET " +
        "semantics — the caller names the keys), never corpus-derived"),
    "rerank-candidates" -> Bound(Fixed,
      "the fused retrieval candidate set: <= 10 rows by the q119 LIMIT, " +
        "a per-query constant — reranking joins candidates back to their " +
        "documents/embeddings, never the corpus to itself"),
    "cdc-batch" -> Bound(External,
      "an SCD2 merge batch is bounded by the ingest batch window, not by " +
        "the dimension it merges into; a batch too large to broadcast " +
        "should be split upstream, not shuffled here"),
    "bench-shingles" -> Bound(External,
      "decontamination benchmark suites are fixed external artifacts " +
        "(10^2..10^5 docs, pre-aggregated to one row per shingle); they do " +
        "not grow with the training corpus being scanned (the % 19 stamp " +
        "is test-rig synthesis only)"),
    "strata-table" -> Bound(Sublinear,
      "one row per (source, lang) stratum: bounded by label-combination " +
        "cardinality (10^2..10^4 in real corpora), not document count"),
    "sqrt-shard-offsets" -> Bound(Sublinear,
      "one row per sqrt(n) packing shard: ~10^4 rows at 10^8 docs, two " +
        "longs each"),
    "ivf-centroids" -> Bound(Sublinear,
      "sqrt(n) IVF cells x d floats: ~10^5 cells x 64 floats = ~25 MB at " +
        "10^10 vectors; the FAISS coarse-quantizer sizing (TextSearch." +
        "IvfCellsMin scaladoc)"),
    "ivf-cell-salts" -> Bound(Sublinear,
      "one (cid, n_salts) row per IVF cell — sqrt(n) rows of two ints; " +
        "the fan-out table that spreads a hot cell's probes across its " +
        "ceil(size/MaxCellGroupMembers) salt keys"),
    "store-topology" -> Bound(Sublinear,
      "the bucketed store's split-bucket id lists (one INT per live " +
        "gen>0 bucket): store_bytes / splitBytes rows — ~10^6 ids (4 MB) " +
        "for a 100 TB store at the 128 MB default, and the splitBytes " +
        "knob scales the target bucket size up long before the id list " +
        "approaches broadcast limits; grows with the STORE, never the " +
        "batch being assigned"),
    "user-dim-gated" -> Bound(Gated,
      "the q81 enrichment dim (customer x nation projection) is customer-" +
        "proportional, so EventStream.userNationDim materializes it once " +
        "per stream (localCheckpoint — no per-micro-batch parquet " +
        "re-scan), MEASURES its row count, and hints only while it is <= " +
        "spark.graft.stream.dimBroadcastMaxRows (default 2^21 ~ 60 MB); " +
        "beyond the cap the stream-static join degrades to a keyed " +
        "shuffle on user_id (EventStreamSpec pins both plan regimes)"),
    "merge-dv-slice" -> Bound(External,
      "a table's LIVE deletion vector: O(accumulated tombstone keys) " +
        "rows, bounded by the erasure-request volume since the last " +
        "materializeDeletes (the OPTIMIZE cadence), never by the table — " +
        "a vector large enough to strain a broadcast is past due for " +
        "materialization, which is the format's own contract"),
    "cdc-dv" -> Bound(External,
      "a snapshot's deletion vector applied to a changesBetween step " +
        "slice: the same O(accumulated tombstone keys) bound as " +
        "merge-dv-slice — erasure-request volume since the last " +
        "materializeDeletes, never the table"),
    "dup-set-gated" -> Bound(Gated,
      "the df>=3 duplicated-line set is corpus-dependent (tiny for real " +
        "boilerplate rates, unbounded adversarially), so q94 MEASURES its " +
        "cardinality off the checkpointed aggregate and hints only while " +
        "it is <= spark.graft.dedup.dupBroadcastMaxRows (default 2^21); " +
        "beyond the cap the mark join shuffles on the 16-byte lh key " +
        "(CurationSpec pins the metric and both plan regimes)"))

  /** The only sanctioned broadcast hint inside `graft.queries`: requires a
    * registered bound and stamps the build side with a plan-walkable
    * alias. Fails fast (at plan construction, not execution) on an
    * unregistered name.
    */
  def bounded(name: String)(df: DataFrame): DataFrame = {
    require(registry.contains(name),
      s"unregistered broadcast bound '$name' — add a Bound with a " +
        "rationale to BroadcastBounds.registry (see the scaladoc: hinted " +
        "broadcasts bypass size-based planning, so every one must prove " +
        "its build side cannot grow with the corpus)")
    broadcast(df.alias(Tag + name))
  }
}
