package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans of representative queries
  * with the scale-relevant properties called out. Dev tool — run after plan
  * shape changes: `sbt "runMain graft.tools.DumpPlans"`. */
object DumpPlans {

  private val annotated: Seq[(String, String)] = Seq(
    "q01_scan_filter_project" ->
      """Scan properties that must hold at 100TB: `PushedFilters` carries the
        |shipdate/discount/quantity predicates into the parquet reader and
        |`ReadSchema` lists only the 6 referenced columns of the 16-column
        |table — IO scales with the query, not the table.""".stripMargin,
    "q02_agg_pricing_summary" ->
      """Partial (`partial_sum`/`partial_count`) then final HashAggregate
        |around a single hash exchange: map-side combine means the shuffle
        |carries one row per (flag, status) per task, not 600k rows.""".stripMargin,
    "q04_broadcast_join" ->
      """Dimension sides build BroadcastExchanges; the fact table is never
        |shuffled for the joins. At cluster scale the same plan ships ~KB
        |dims to every executor instead of exchanging the TB fact table.""".stripMargin,
    "q09_range_join" ->
      """Per-user interval join: the user_id equality gives Catalyst a hash
        |key, so the plan is a keyed join (broadcast at this SF, shuffle at
        |scale) with the time interval as a RESIDUAL condition — never a
        |BroadcastNestedLoopJoin. Pairs form per user; the pair count
        |partial-aggregates on user before its exchange. The keyless
        |variant of this query is exactly what q73's bin rewrite
        |exists for.""".stripMargin,
    "q10_asof_join" ->
      """As-of join with NO join at all: one windowed running-max over a
        |single scan (partition by user, order by (ts, kind, id), max of
        |view-timestamps up to the current row) picks each purchase's
        |latest preceding view. The oracle's correlated-subquery
        |formulation is O(views x purchases) per user in a naive engine;
        |this plan is one sort exchange on user_id and a linear window
        |pass — per-user state in the window frame is ONE timestamp, so
        |no user's history is ever held in memory.""".stripMargin,
    "q35_minhash_lsh" ->
      """The signature build is a single Project over the scan (no exchange
        |until the band self-join): the minhash_sig codegen expression
        |computes all 12 minima in one pass, one MD5 per distinct token.
        |At this SF the band self-join broadcasts; at scale it becomes a
        |key exchange. The remaining shuffles are the pair distinct
        |(doubles as the skew rebalance) and the final sort.""".stripMargin,
    "q36_simhash" ->
      """r4 capped plan: signature build is one Project (32 bit-passes over
        |the per-row token hashes, zero shuffle); bucket sizing is a partial
        |HashAggregate whose oversized keys re-join the band rows (broadcast
        |at this SF, shuffle when adversarial); pair output is bounded by
        |the star-edge cap before the distinct. Both simhashes are CARRIED
        |through the pair stream (one long each, LlmOps q36 notes) so the
        |hamming filter needs no re-attach join at all. No bucket ever
        |funnels through one task — the window-based sizing this replaced
        |did exactly that.""".stripMargin,
    "q41_ann_lsh" ->
      """Multi-probe ANN: the corpus is hashed once into 2^16 buckets (one
        |Project); the query row expands to 2^3 probe buckets (explode on
        |the broadcast side only) and one BroadcastHashJoin picks the probed
        |corpus vectors for exact re-rank. At 100TB the corpus hash is
        |embarrassingly parallel and the probe join stays broadcast — the
        |re-rank set is ~n/65536 x 8 probes, not n/256.""".stripMargin,
    "q24_math_funcs" ->
      """Pure per-row math over one scan: every function lands in a single
        |Project inside WholeStageCodegen (no UDF boundary), ReadSchema
        |prunes to the 4 referenced columns, and the only exchange is the
        |output sort's range partition. The 100 TB shape is
        |scan-bandwidth-bound; its bench weight is the row-count of the
        |materialized output, not compute.""".stripMargin,
    "q44_percentiles" ->
      """Exact percentiles as a distributed aggregate — the pass the
        |reference rejected as too expensive single-node.""".stripMargin,
    "q59_dedup_resolution" ->
      """Dedup resolution on top of the q51 labels: score join on doc_id,
        |two partial-aggregatable groupBys on comp, one (comp, score) join
        |back. Every exchange is keyed on component ids; no window, no
        |all-pairs anything. (The label fixpoint itself is iterative and
        |does not appear in a single static plan — its per-round shape is
        |frontier-probe joins into pre-partitioned lookups, traced in
        |BENCH_NOTES_r7.)""".stripMargin,
    "q60_shuffle_shard" ->
      """Deterministic trainer hand-off: the only exchange is the hash
        |partition on shard, and the position counter is a PARTITIONED
        |window (per shard), so the global permutation never funnels
        |through one task. QueryPlanSpec asserts the executed plan has no
        |unpartitioned WindowExec.""".stripMargin,
    "q62_knn_graph" ->
      """Both sides of the candidate join scan the SAME materialized IVF
        |index (the `Scan ExistingRDD` leaves — one flat-stats checkpoint,
        |built once; the quantizer pipeline appears nowhere in this plan
        |because it ran at index build). Top-k per query vector is
        |WindowGroupLimit Partial BEFORE the qid exchange: each map task
        |keeps at most k rows per query, so the rank shuffle carries
        |O(k x queries), not the O(n x nprobe x cell) candidate stream.
        |The candidate join itself is keyed on (cell id, salt) — at
        |sqrt(n) cells no key is hot, hot CELLS (near-dup clusters) split
        |across salt keys, and the un-hinted members side broadcasts only
        |when AQE measures it small.""".stripMargin,
    "q63_bm25" ->
      """Corpus statistics (N + avgdl, per-term df) are two partial-agg
        |HashAggregates reduced to ONE ROW each and broadcast back —
        |BroadcastNestedLoopJoin over a single-row build side is a free
        |scalar attach, not a join. Scoring is then a pure per-doc Project
        |over one scan, and the top-20 is TakeOrderedAndProject (per-task
        |heaps + driver merge), never a global sort. Total shuffled bytes
        |at 100 TB: two one-row aggregates.""".stripMargin,
    "q66_bpe_pairs" ->
      """Tokenizer-training shape: the corpus collapses to the VOCABULARY
        |in the first partial-agg groupBy (the only corpus-sized exchange);
        |the adjacent-pair explode and the second groupBy run over
        |vocab-sized data weighted by word count. The pair expansion that
        |would be 10^9 rows corpus-wide is 31 rows here.""".stripMargin,
    "q67_pii_scrub" ->
      """Pure per-row scrub: one parquet scan and one Project holding the
        |regexp_count/regexp_replace expressions inside WholeStageCodegen;
        |the only exchange is the output sort's range partition. The 100 TB
        |shape is scan-bandwidth-bound — redaction adds zero shuffle.""".stripMargin,
    "q69_inverted_index" ->
      """No window anywhere: block assignment is per-row arithmetic
        |(doc_id div 128), so the index build is two partial-agg
        |HashAggregates — (doc,term) tf with map-side combine, then
        |(term,block) posting assembly. A stopword posting that spans the
        |whole corpus spans many blocks, never one task — this is the
        |document-partitioned sharding of a distributed search index.""".stripMargin,
    "q70_span_coverage" ->
      """Span positions pre-aggregate per (doc, span) and materialize ONCE
        |(flat-stats checkpoint — both `Scan ExistingRDD` leaves): the
        |span-frequency groupBy and the coverage join each scan the
        |materialized rows instead of re-deriving the corpus-sized shingle
        |explode, which would otherwise run twice (column pruning makes the
        |branches structurally different, so ReuseExchange cannot fire).
        |The one big exchange carries distinct spans per doc, not raw
        |positions; partial aggregation bounds every hot span's
        |contribution to one row per (doc, span).""".stripMargin,
    "q68_semdedup" ->
      """Same leaves as q62: both sides of the ε-candidate join scan the
        |ONE materialized IVF index (flat-stats checkpoint built at index
        |time). The join is keyed on cell id (sqrt(n) cells — no hot key),
        |n_close partial-aggregates on qid before its exchange, and the
        |kept flag attaches with a left join on vec_id. Nothing in the
        |plan is all-pairs.""".stripMargin,
    "q73_range_join_binned" ->
      """The no-equi-key range join after the bin rewrite: a plain
        |SortMergeJoin/ShuffledHashJoin keyed on the hour bin (plus the
        |range residual in the join condition) where Catalyst's native
        |plan for this predicate is BroadcastNestedLoopJoin — O(clicks x
        |purchases) at 100 TB vs O(pairs-per-bin) here. The interval
        |side's Generate (bin explode) has fan-out <= 2 for 1h spans on
        |1h bins. RangeJoinSpec asserts the BNLJ-vs-none plan contrast
        |and exact pair-set equality.""".stripMargin,
    "q72_dsir_selection" ->
      """DSIR selection shape: the feature table (two partial-agg groupBys
        |plus one-row broadcast totals) joins the per-position bigram
        |stream once; per-doc scores partial-aggregate before their
        |exchange; the top-100 is TakeOrderedAndProject (per-task heaps +
        |driver merge), never a global sort. The corpus is scanned for the
        |stream and the counts — at 100 TB both are scan-parallel, and the
        |only non-broadcast exchanges are keyed on bigram/doc_id.""".stripMargin,
    "q71_bpe_encode" ->
      """Encoding is ONE Project over the scan: the trained merge table
        |rides inside the bpe_encode expression's codegen references (the
        |expression equivalent of a broadcast model), so subword expansion
        |happens at scan speed with no shuffle before the output sort.
        |Training ran as a separate vocab-sized aggregate job at plan
        |build — it does not appear in this (encoding) plan.""".stripMargin,
    "q76_embedding_covariance" ->
      """Gram-matrix shape: the vector scan cross-joins a BROADCAST
        |d(d+1)/2-row index-pair table (BroadcastNestedLoopJoin with a
        |2080-row build side — the degenerate "loop over constants" case,
        |not a data-data cartesian) and the partial HashAggregate combines
        |map-side to <= 2080 rows per task before the one exchange. The
        |corpus is scanned once, vectors never shuffle, and exchange volume
        |is O(d^2 * tasks) regardless of corpus size. The two broadcast
        |mean-joins at the top are 64-row lookups.""".stripMargin,
    "q78_histogram" ->
      """Bucket assignment is per-row arithmetic fused into the scan
        |Project; the partial+final HashAggregate reduces the corpus to
        |O(buckets) rows; the single-partition window (share-of-total) runs
        |AFTER aggregation over ~12 rows — the WindowExec warning the plan
        |prints is about a 12-row exchange, not the corpus.""".stripMargin,
    "q87_lateral_topk" ->
      """Lateral decorrelation showcase: the correlated ORDER BY+LIMIT
        |subquery becomes WindowGroupLimit(Partial) BELOW the exchange
        |(each map task keeps at most 2 rows per customer before any
        |shuffle), a Final group-limit + ranked window above it, then a
        |broadcast join back to the outer side. Executing the subquery
        |per outer row — the naive lateral plan — would be O(customers x
        |orders); this plan is one bounded shuffle.""".stripMargin,
    "q79_domain_cap" ->
      """One rangepartition-free exchange on source, per-source window,
        |rank filter pushed right above it: work parallelizes across
        |sources and no corpus-global ordering exists anywhere. A
        |mega-source would funnel its own partition through one task; the
        |documented escape is a per-partition top-K aggregator (q16's
        |TakeOrdered shape) — at K=20 the window form wins on simplicity
        |until one domain IS the corpus.""".stripMargin,
    "q93_recursive_hierarchy" ->
      """Native WITH RECURSIVE (Spark 4 UnionLoop): each recursion level is
        |one keyed join of the next generation against the PREVIOUS
        |FRONTIER only — intermediate row volume is frontier-sized, never
        |the transitive closure, and depth is log_8(n) (6 levels at 1e9
        |parts). The rollup above the loop is an ordinary partial+final
        |aggregate on depth. For million-round graph closures q51's
        |checkpointed delta iteration remains the scale path; this is the
        |SQL-surface recursion operator.""".stripMargin,
    "q101_fuzzy_decontamination" ->
      """Graded decontamination: shingles materialize once; the train x
        |bench join is keyed on the shingle with the bench-df cap bounding
        |fan-out per train shingle; pair intersections partial-aggregate
        |on (t_doc, b_doc) BEFORE their exchange; per-doc sizes attach by
        |keyed joins; the per-train argmax window partitions by t_doc
        |(bounded by that doc's candidate count) and the global top-50 is
        |TakeOrderedAndProject — per-task heaps + driver merge, never a
        |global sort. At 100 TB the only corpus-sized exchanges are the
        |shingle distinct and the bounded candidate join.""".stripMargin,
    "q102_ingest_dedup" ->
      """Ingest classification with NO pair stream: the stored corpus
        |enters only as two partial-agg HashAggregates — one row per
        |fingerprint, one row per band bucket (a hot near-dup bucket is
        |ONE index row) — and the arriving batch probes both with keyed
        |joins whose probe side is batch-sized. The 5-gram shingle +
        |signature build is a per-row Project over the scan (zero
        |shuffle); anchors resolve by partial-aggregatable min; the
        |est_sim re-attach touches <= 1 stored signature per batch
        |doc.""".stripMargin,
    "q103_semantic_decontamination" ->
      """Embedding-space decontamination on q62's leaves: both sides scan
        |the ONE materialized IVF index (Scan ExistingRDD), the candidate
        |join is keyed on (cell id, salt) with only the BENCH side grouped
        |into members (holdout-sized — a hot bench cell still salts), the
        |per-train argmax is WindowGroupLimit-bounded before its exchange,
        |and the global top-50 is TakeOrderedAndProject. Candidates are
        |probe-bounded (O(probes x bench/cells) per train vector), never
        |all-pairs.""".stripMargin,
    "q105_similarity_join" ->
      """Exact set-similarity join: the q30 survivor collapse (one
        |content-keyed partial+final aggregate) runs first so byte-identical
        |copies never enter the pair space; the hashed shingle sets then
        |materialize ONCE (Scan ExistingRDD leaves — every consumer reads
        |the checkpoint, the tokenize+md5 projection appears nowhere
        |downstream). The candidate join keys on PREFIX shingles only
        |(rarity-ordered, so raw-df-hot shingles stay out of prefixes);
        |verification carries the two shingle arrays to each surviving
        |candidate pair and intersects in-row — no third corpus
        |shuffle.""".stripMargin,
    "q106_bloom_decontamination" ->
      """q56's over-broadcast scale path: the bench side collapses into a
        |~KB bloom SKETCH via one aggregate, and might_contain(xxhash64)
        |runs as the FIRST conjunct of the pushed Filter directly over the
        |train shingle stream — the corpus dies at the scan, before any
        |exchange. The exact confirm join is un-hinted and keyed: its
        |probe side is survivor-sized (~fpp x corpus + true hits), its
        |build side holdout-sized, so neither side's shuffle grows with
        |the training corpus.""".stripMargin,
    "q107_zorder_layout" ->
      """Layout invariance read-back: the scan carries BOTH the exact
        |double-typed box and the widened integral guard in PushedFilters
        |(the guard is what parquet row-group stats can compare), so at
        |the z-clustered layout most row groups never decompress —
        |ZOrderSpec measures the skip against a hash layout of the same
        |rows. The rewrite itself (not in this read plan) is one range
        |exchange on the Morton code + in-partition sort: linear,
        |sampling-balanced, no hot key.""".stripMargin,
    "q108_pq_ann" ->
      """Compressed-domain ANN: codebooks and the ADC lookup table ride as
        |PLAN LITERALS, so encode + scoring is ONE Project inside
        |whole-stage codegen over the vector scan — no join, no shuffle,
        |no UDF — and the top-32 candidates come out of
        |TakeOrderedAndProject (per-task heaps + driver merge). Only those
        |32 rows carry float embeddings into the broadcast re-rank join.
        |Training (not in this search plan) is two corpus passes whose
        |aggregate output is bounded by 8x16x8 codebook cells.""".stripMargin,
    "q109_ivf_pq_ann" ->
      """IVF-PQ: the ADC scoring Project runs over the PROBE-FILTERED
        |slice of the materialized IVF assignment (Scan ExistingRDD with
        |the cid-in-probed-cells filter — in production this is partition
        |pruning over a cell-partitioned code table), joined once to the
        |vector payloads. Per-query scored rows are O(probes x n / cells)
        |instead of q108's O(n); codebooks + LUT are still plan literals,
        |candidates still TakeOrderedAndProject, and only 32 rows reach
        |the broadcast re-rank.""".stripMargin,
    "q109b_ivf_pq_residual" ->
      """Residual IVF-PQ (full FAISS IndexIVFPQ): the residual subtraction
        |is a zip_with over the broadcast-joined centroid, the code
        |assignment an argmin over residual-codebook PLAN LITERALS, and
        |the per-probed-cell distance tables a codegen'd CASE over <=
        |IvfProbes cells — the whole encode+score is still ONE projection
        |over the probe-filtered index slice, no extra shuffle vs q109.
        |The per-cell LUT CASE is the expression form of FAISS's
        |per-inverted-list distance tables.""".stripMargin,
    "q114_vector_index_upsert" ->
      """The probe over the INCREMENTALLY-built index: candidates come
        |from the bucketed-manifest read-back (a union of parquet scans
        |pruned by bkt partition dirs — at scale, file pruning before the
        |listing). The build is absent from this plan by design: phase B's
        |upsert touched only its own key buckets against FROZEN broadcast
        |centroids, so growing the index never rescans stored vectors —
        |VectorIngestSpec pins incremental == one-shot row for row.""".stripMargin,
    "q114c_vector_index_delete" ->
      """The probe after a tombstone DELETE: same manifest read-back
        |shape as q114 — the delete itself was an anti-join merge over
        |ONLY the buckets holding tombstoned vec_ids (O(tombstones) IO,
        |survivors untouched, emptied buckets dropped from the
        |manifest), so nothing of it appears in the probe plan. The
        |oracle one-shot-assigns the SURVIVING set; VectorIngestSpec
        |pins upsert-then-delete == never-inserted.""".stripMargin,
    "q118_optimize_layout" ->
      """The box aggregate after the ONE-PASS OPTIMIZE (bin-pack 150
        |fragments + z-cluster on (event_id, value) + stats manifest in
        |one read/range-shuffle/write): the scan lists ONLY
        |manifest-intersecting files (file pruning before listing — the
        |generalized arbitrary-column manifest), then parquet footers
        |skip row groups via the widened integral guard, then the exact
        |double box filters rows — three nested sieves, hash-equal to
        |the oracle's aggregate over the original table.""".stripMargin,
    "q119_hybrid_rrf" ->
      """Hybrid retrieval fusion: each arm ends in TakeOrderedAndProject
        |(per-task heaps + driver merge — no corpus-wide sort or window;
        |the rank window runs over the 20 survivors), the BM25 arm's
        |corpus stats are two broadcast one-row aggregates, the dense arm
        |is one codegen'd cosine Project over the vector scan, and the
        |RRF fusion is a full-outer join of two 20-row frames. Nothing
        |after the arms touches the corpus.""".stripMargin,
    "q122_cross_encoder_rerank" ->
      """The rerank stage: the 10 fused candidates ride as a BROADCAST
        |build side into the documents scan (BroadcastHashJoin — the
        |corpus streams past a 10-row hash table; at 100 TB this is why
        |reranking affords an expensive model: cost is O(candidates)),
        |embeddings attach the same way, and the interaction features +
        |weighted mix are one codegen'd Project over the 10 surviving
        |rows. The candidate stage above is q119's plan verbatim.""".stripMargin,
    "q121_time_travel" ->
      """VERSION AS OF reads: each snapshot is a union of parquet scans,
        |one per source version the manifest maps live buckets to, each
        |pruned by its bkt partition filter at the file listing — an old
        |version costs the same pruned scan as the current one; the
        |manifest (not the plan) is what changed between the two AS-OF
        |frames unioned here. GC retention (gc retain=N) is what keeps
        |the older manifest's referenced dirs alive.""".stripMargin,
    "q123_incremental_view" ->
      """CDF-consuming view maintenance: one scan of the change feed (the
        |only fact-sized input — O(changed keys) per refresh at crawl
        |scale, never the raw events), a per-user partial+final aggregate
        |of the signed postimage-preimage deltas, a broadcast join to the
        |measured-gated user->nation dim, and a 25-row final rollup. The
        |raw events table appears nowhere in this plan — that is the
        |operator's claim.""".stripMargin,
    "q126_point_lookup" ->
      """The key-value GET: the probe keys ride as a BROADCAST semi-join
        |build side over a union of parquet scans covering ONLY the
        |buckets those keys hash to (the `bkt IN (...)` partition filter
        |prunes every other bucket directory at the file listing) — the
        |scan's input is bounded by the probe, not the store. The keys'
        |bucket assignment is the same bucketCol expression every write
        |uses, so probe and layout cannot disagree.""".stripMargin,
    "q124_metadata_count" ->
      """Metadata-only counting: the final frame is a LocalTableScan BY
        |DESIGN — each box's count was assembled from (a) the 16-row
        |manifest (fully-contained files contribute their stored counts,
        |zero data IO) and (b) an exact-filtered scan of ONLY the
        |edge-straddling files; the full-table box runs no data scan at
        |all. LakeLayoutSpec pins the IO claims; the oracle pins the
        |counts.""".stripMargin,
    "q127_merge_into" ->
      """The read-back after the two store commits (stage target, MERGE
        |source): a union of bkt-pruned parquet scans through the
        |manifest. The MERGE itself ran inside mergeCommit as ONE
        |full-outer equi-join on user_id (left side = only the touched
        |buckets' current rows) + a codegen'd clause projection — delete
        |gate as a filter, update/insert arms as one CASE per payload
        |column. O(batch + touched buckets) per MERGE at any table
        |size; MergeIntoSpec pins clause precedence.""".stripMargin,
    "q127b_merge_full_sync" ->
      """The read-back after a FULL-SYNC merge (WHEN NOT MATCHED BY
        |SOURCE): unlike q127's touched-bucket commit, this clause family
        |must see every target row (a key is acted on precisely because
        |the batch does NOT carry it), so the merge's left side was ALL
        |live buckets — the full-target-scan cost Delta documents for
        |this clause. Still one full-outer join + one codegen'd clause
        |projection; the manifest/replay contract is unchanged.""".stripMargin,
    "q82b_scd2_merge_into" ->
      """SCD2 as ONE MergeInto commit (the union-trick source: close rows
        |match and flip is_current, open/new rows insert under fresh
        |merge keys) — the same full-outer-join + clause-projection frame
        |as q127, proving the operator generalizes to the
        |two-rows-per-change SCD topology. The read-back is the usual
        |bkt-pruned manifest union; the oracle is q82's declarative
        |UNION-ALL shape verbatim.""".stripMargin,
    "q130_cdc_deletes" ->
      """The final state after a delete-bearing CDC run: the usual
        |bkt-pruned manifest union — what is ABSENT matters: removed
        |users' rows are simply not in any live bucket (the merge's
        |combine filtered them before the write; the delete predicate
        |rode the SAME materialized join the upsert already ran, zero
        |extra state reads). The feed carried their `delete` images for
        |downstream consumers; CdfSpec pins the telescoping fold.""".stripMargin,
    "q130b_cdc_delete_view" ->
      """The delete-aware view consumer: one scan of the change feed,
        |signed per-nation deltas (delete rows subtract the removed
        |image and decrement n_users), a broadcast dim join, and the
        |bucketed-view read-back. The raw events and the upstream state
        |table appear nowhere — the CDC contract — and the delta algebra
        |telescopes, so trigger slicing cannot matter.""".stripMargin,
    "q129_deletion_vectors" ->
      """The DV-applied read: the base table's bkt-pruned manifest union
        |anti-joins the deletion-vector side table — the DV is tombstone
        |keys only, so AQE broadcasts the build side and the read costs
        |one pass over the data plus a per-row hash probe. The deletes
        |themselves wrote O(tombstone bytes) each (the version dirs hold
        |ONLY the __dv table — IngestIndexSpec pins that no base bucket
        |rewrote), which is the cost point q114c's eager rewrite cannot
        |reach; materializeDeletes amortizes them into one touched-bucket
        |rewrite later.""".stripMargin,
    "q131_merge_ordered_clauses" ->
      """The read-back after an ORDERED-clause-list MERGE (r16): the
        |same one-full-outer-join frame as q127, but the clause
        |projection is a chained first-match-wins CASE per family —
        |N conditional UPDATE/DELETE arms for matched rows, two
        |conditional INSERT arms for unmatched — plus the default-on
        |cardinality window on the source (a count over the join key's
        |own hash partitioning: no extra exchange on a pre-aggregated
        |source, and a duplicate-key match raises a named error in the
        |same pass). Clause ORDER is data-visible here; the oracle's
        |CASE chain mirrors it arm for arm.""".stripMargin,
    "q129b_dv_point_get" ->
      """DV composed with the point GET (r16): the probe keys' covering
        |buckets prune BOTH scans — the base table's manifest union AND
        |the deletion-vector side table's (tombstones share the base
        |key's bucket formula) — then the broadcast semi-join keeps the
        |probe rows and the broadcast anti-join drops the tombstoned
        |ones. O(probe keys) IO at any store size, vector or not; the
        |read verbs can no longer serve deleted rows (CdfSpec pins
        |pointGet == filter(readWithDv)).""".stripMargin,
    "q132_erasure_stream_dv" ->
      """The post-materialize read after the erasure stream: a plain
        |bkt-pruned manifest union — the interesting plans already ran:
        |each request batch committed ONLY tombstone keys into the
        |state__dv side table (version dirs v2..v4 hold nothing else —
        |ErasureStreamSpec pins it), reads mid-history applied the
        |vector as a broadcast anti-join, and ONE materializeDeletes
        |rewrote just the tombstoned buckets. O(requests) per trigger
        |where the eager path pays O(bucket bytes) per request.""".stripMargin,
    "q133_cdc_catchup_view" ->
      """The catch-up consumer's final view read-back. The bootstrap ran
        |ONE pruned snapshot scan (tableAt at v0) reduced through the
        |broadcast dim; the tail consumed only feed rows with batch_id
        |>= v0 through the same signed-delta merge as q125/q130b.
        |Bootstrap + tail telescopes to the full replay (CdfSpec pins
        |equality for every legal v0), so a consumer arriving after
        |months of feed pays one table scan, not the feed's history.""".stripMargin,
    "q134_restore_version" ->
      """The read-back after a RESTORE (r16): the manifest union again —
        |note the version dirs it references PREDATE the restore commit
        |(v4 holds only a manifest; the rollback copied zero data, which
        |is the point: on the bucketed layout a table-wide rollback is a
        |one-file metadata write at any store size). The damaged v3
        |stays readable inside retention — RESTORE is a new commit, not
        |history rewriting.""".stripMargin,
    "q135_merge_sql_entry" ->
      """The read-back after the SQL `MERGE INTO` statement (r17): the
        |plan is IDENTICAL to q127's — the SQL layer is Spark's own
        |parser producing MergeIntoTable, a resolution rule routing it
        |to the SAME MergeInto combine over the SAME store commit
        |(mergeCommitDv), nothing data-sized added. That identity is the
        |design claim: the statement every lakehouse user types costs
        |exactly what the DataFrame verb costs — one full-outer equi-
        |join over the touched buckets plus a codegen'd clause
        |projection.""".stripMargin,
    "q132b_interleaved_upsert_erasure" ->
      """The read-back after SIX alternating verbs on one store (merge,
        |merge, DV-delete, merge, DV-delete, merge): a plain bkt-pruned
        |manifest union — no anti-join, because the final merge's
        |mergeCommitDv invalidated every tombstone whose bucket it
        |rewrote (the rows are physically gone or legitimately
        |re-inserted). Mid-history the interesting shapes ran: each
        |DV-delete wrote O(requests) tombstone keys and ZERO base
        |buckets; each following merge read its slice THROUGH the
        |vector (one broadcast anti-join of the tiny DV) and dropped
        |the now-stale tombstones under the same version. The oracle's
        |per-user cutoff algebra proves no resurrection and no
        |suppression survived the interleaving.""".stripMargin,
    "q124b_metadata_count_live_store" ->
      """Three box counts over the LIVE streaming store answered from
        |per-bucket stats maintained commit-by-commit: the full-range
        |box sums manifest stats rows — ZERO data buckets scanned, the
        |Delta numRecords fast path with no OPTIMIZE pass; the range
        |boxes scan only straddling buckets with the exact residual
        |filter plus a widened raw-typed guard (so parquet row-group
        |stats still prune inside the scanned buckets). Stats IO per
        |commit is O(touched buckets) — IngestIndexSpec pins a one-user
        |commit writing ONE stats row.""".stripMargin,
    "q107b_hilbert_layout" ->
      """Same three-sieve read as q107 (manifest file pruning, then
        |parquet row-group stats, then the exact filter) over the
        |HILBERT-clustered copy: one functions.aggregate fold computes
        |the index (pure Column arithmetic, O(levels) expression size),
        |one range shuffle + in-partition sort writes it. Consecutive
        |Hilbert cells are grid-adjacent — no Morton quadrant cliffs —
        |so every file's (user_id, value) envelope is one connected
        |blob; ZOrderSpec measures the skip side by side with
        |Morton.""".stripMargin,
    "q114d_vector_index_dv_delete" ->
      """The q48-shaped probe after a DELETION-VECTOR delete on the
        |vector index: the index read anti-joins the tiny vec__dv side
        |table (AQE broadcasts it) before the cell join — the delete
        |wrote O(tombstones) and rewrote ZERO index buckets
        |(VectorIngestSpec pins the version dir holds only the side
        |table), where q114c's eager path rewrites every bucket a
        |tombstone hashes into. dv == eager row for row; materialize
        |amortizes later.""".stripMargin,
    "q137_sql_time_travel_read" ->
      """`SELECT ... FROM <store> VERSION AS OF 1` through spark.sql:
        |the injected read rule substitutes the ALREADY-ANALYZED tableAt
        |snapshot (the same bkt-pruned manifest union every store read
        |plans), so the SQL layer adds zero plan nodes — Catalyst pushes
        |the projection/ORDER straight into it. Reading an old version
        |costs the same pruned scan as reading the current one; the
        |manifest IS the snapshot.""".stripMargin,
    "q137b_sql_timestamp_travel" ->
      """`TIMESTAMP AS OF <epoch-millis>` (r18): the rule folds the
        |literal, resolves it to a VERSION through the manifest mtimes
        |(versionAt — newest commit at or before the instant, metadata
        |only), and the plan is then EXACTLY q137's snapshot read: zero
        |added nodes, the timestamp arithmetic never touches the
        |executed plan. Version travel and timestamp travel to the same
        |snapshot are the same scan.""".stripMargin,
    "q124c_metadata_aggregate" ->
      """MIN/MAX/SUM/COUNT from per-bucket stats (r18): the result rows
        |are driver-composed from a LocalTableScan-sized stats read —
        |the full-range box aggregates PURE METADATA (zero data buckets;
        |IngestIndexSpec pins it), straddling boxes add one residual-
        |filtered scan of only their buckets, unioned as a single
        |contribution row. Decimal sums ride the stats in Spark's exact
        |SUM type, so the two-stage composition is bit-exact against
        |the oracle's one-shot aggregate.""".stripMargin,
    "q118b_optimize_hilbert" ->
      """q118's one-pass OPTIMIZE with the Hilbert index as the
        |clustering curve (r18): the same single read + range shuffle +
        |ZFiles write, the curve value computed by ONE
        |functions.aggregate fold (O(levels) expression, no UDF). The
        |read-back is the same manifest-pruned three-sieve scan; only
        |the skip PROFILE differs (ZOrderSpec: on a quadrant-straddling
        |box Hilbert keeps strictly fewer files — no Morton locality
        |cliff).""".stripMargin,
    "q138_sql_create_insert" ->
      """The SQL read-back after CREATE TABLE ... USING graft + two
        |INSERT INTO commits (r18): a plain bkt-pruned manifest union —
        |the DDL wrote only a meta file (no data version), each INSERT
        |committed one touched-bucket merge whose PRIMARY-KEY guards
        |rode the commit's own key window and slice join (no extra
        |exchanges: the raise_error projections are free riders on the
        |shuffle the union/merge already pays). The whole lifecycle —
        |create, load, read — ran through spark.sql.""".stripMargin,
    "q139_sql_delete" ->
      """The read-back after two SQL `DELETE FROM ... WHERE` statements
        |(r18): the bkt-pruned manifest union anti-joined against the
        |state__dv side table (AQE broadcasts the tiny vector). Each
        |DELETE ran one predicate-pushed snapshot scan and committed
        |ONLY the matched keys as tombstones — zero base buckets
        |rewritten (the q114d cost point; the two vectors union
        |distinct). OPTIMIZE materializes later; until then every read
        |pays one broadcast hash probe, never a rewrite.""".stripMargin,
    "q140_sql_update" ->
      """The read-back after DELETE + UPDATE on one store (r18): a plain
        |bkt-pruned union again — the UPDATE's copy-on-write merge
        |(mergeCommitDv) rewrote ONLY the buckets holding matched rows,
        |read its current slice THROUGH the live deletion vector (one
        |broadcast anti-join, so hidden rows neither matched nor
        |resurrected), and invalidated the tombstones its rewrite made
        |stale. The WHERE found its rows with one predicate-pushed
        |scan — Delta's two-pass UPDATE shape on the bucketed
        |layout.""".stripMargin,
    "q141_catalog_sql_lifecycle" ->
      """The read-back over a THREE-PART catalog name (r18): the
        |injected rule replaced the DataSourceV2Relation with the
        |engine's analyzed snapshot read re-aliased to the relation's
        |original exprIds — the one extra Project collapses, leaving
        |exactly the flat-name plan (bkt-pruned union + broadcast DV
        |anti-join). CREATE wrote a meta file; the INSERTs committed
        |through the DSv2 V1-write fallback with the same guarded
        |commit body as the statement path; DELETE/UPDATE rewrote at
        |parse time. The catalog layer never touches the data
        |plan.""".stripMargin,
    "q142_table_changes" ->
      """Store-native CDC (r18): the per-step change rows are built from
        |pre/post reads RESTRICTED to each commit's own bucket footprint
        |(the manifests name the diff — no snapshot-wide scan), a
        |row-level EXCEPT cancels unchanged rows in rewritten buckets,
        |and one full-outer key join classifies the survivors into
        |insert/update_pre/update_post/delete. The v3 step reads ZERO
        |data files of its own — a deletion-vector commit — yet its
        |hidden rows surface as deletes through the tombstone keys'
        |covering buckets. The TVF layer is Spark's own table-function
        |resolution; the plan below IS the DataFrame verb's.""".stripMargin,
    "q144_cdc_source_stream" ->
      """The two CDC-source consumers' view read-back (r19) — the plan
        |below is two bkt-pruned view-store unions tagged and
        |concatenated. The interesting plans ran inside the stream:
        |each micro-batch of the `graft-cdc` source IS
        |changesBetween's footprint-restricted diff (q142's pinned
        |shape — per-step scans carry the bkt partition filter; the
        |ChangesSpec IO law asserts <= 1 file per one-bucket step on
        |executed metrics), wrapped lazily via queryExecution.toRdd +
        |internalCreateDataFrame(isStreaming=true) — Delta's own V1
        |Source architecture, nothing collected or staged. The
        |snapshot-bootstrap batch is ONE pruned tableAt scan; the
        |consumer folds signed per-nation deltas through a broadcast
        |dim join into O(nations)-sized view commits.""".stripMargin,
    "q146_cdc_replication" ->
      """Replica read-back after one-statement store-to-store CDC
        |replication (r19): the plan is a plain bkt-pruned union of
        |the REPLICA's manifest — structurally identical to reading
        |the source, which is the point (replication is unobservable;
        |the oracle proves contents). Inside the stream each trigger
        |was: one footprint-restricted changesBetween batch (q142's
        |pinned shape) -> per-key chain netting (one key window) ->
        |one touched-bucket commit; version chain mirrors the
        |source's.""".stripMargin,
    "q145_sql_ctas" ->
      """CTAS read-back (r19): both variants' stores read as the same
        |bkt-pruned manifest union — the CTAS seed commit reused
        |insertAligned verbatim (PK guards riding the commit's own key
        |window + slice join), so CREATE+seed vs CREATE+INSERT are
        |plan-identical by construction; only the v1 op tag differs
        |(create-as-select), emitted here as a literal column the
        |oracle hardcodes. The IF-NOT-EXISTS re-run contributed
        |NOTHING to this plan — the statement no-ops before its query
        |analyzes.""".stripMargin,
    "q143_alter_add_column" ->
      """The read-back after ALTER TABLE ADD COLUMNS + one widening
        |UPDATE + a 3-column INSERT (r18): the bkt-pruned manifest
        |union with allowMissingColumns — buckets written BEFORE the
        |ALTER surface the added column as NULL (their 2-column files
        |never rewrote; the ALTER was one meta-file write), buckets the
        |UPDATE/INSERT touched carry it. The widening is declared-
        |schema metadata composed at read and write planning; no data
        |moved for the DDL itself.""".stripMargin,
    "q147_alter_retype" ->
      """Read-back after ALTER COLUMN TYPE safe widening (r20): the
        |bkt-pruned manifest union where EVERY live bucket carries the
        |widened column — the retype was ONE copy-on-write commit
        |(op=retype) re-casting every live bucket, preceded by a
        |materialize commit folding the rig's live deletion vector in
        |(the OPTIMIZE shape). No mixed-type union can appear in this
        |plan by construction; old versions' files are untouched, so
        |VERSION AS OF reads each snapshot's own type (spec-pinned).
        |The post-widening INSERT's >int-range values sit in the same
        |files — a silently-skipped rewrite could not produce this
        |plan's single BIGINT read schema.""".stripMargin,
    "q148_sql_transaction" ->
      """Read-back after a 4-statement BEGIN...COMMIT transaction
        |(r20): the same bkt-pruned manifest union as any store read —
        |the transaction left ONE extra version (op=txn), not four.
        |Inside the commit: statements applied to a VIRTUAL running
        |state as a LINEAR plan (filters and conditional projections,
        |never self-joins — a join-based rewrite would double the
        |base-scan multiplicity per statement), the netted delta
        |materialized once (flat-stats localCheckpoint, the
        |graft-upsert sink's discipline), then one key-window replace
        |over the union of the statements' touched buckets with
        |net-deleted keys dropped copy-on-write via drop-tagged rows
        |(shuffle-joinable — no driver key list, no broadcast).""".stripMargin,
    "q149_alter_drop_rename" ->
      """Read-back after RENAME COLUMN then DROP COLUMN (r20): the same
        |bkt-pruned manifest union, whose read schema carries ONLY the
        |post-rewrite column set — each verb was ONE copy-on-write
        |commit (op=rename-column / drop-column via the shared
        |copyOnWriteRewrite skeleton, the rig's live deletion vector
        |materialized first) that physically rewrote every live bucket,
        |so no old-name or dropped-column bytes exist in any file this
        |plan reads (no column mapping, nothing to remap at read time).
        |Old versions' files are untouched — VERSION AS OF reads each
        |snapshot's own shape (spec-pinned), and the CDF seam is exact:
        |the rename step is a full-table update, the drop step emits
        |zero change rows.""".stripMargin,
    "q128_schema_evolution" ->
      """The read-back after the 4-batch evolving fold: versions union
        |with allowMissingColumns, so buckets last written pre-evolution
        |surface max_value as NULL (exact: those keys have no
        |post-evolution observation) while evolved buckets carry it.
        |Only the evolving batches' touched buckets were rewritten under
        |the new schema — evolution costs nothing beyond the merge the
        |batch was paying anyway. Type CHANGES (vs additions) fail
        |loudly at read time with the column and both types named.""".stripMargin,
    "q115_kll_quantile_rollup" ->
      """Mergeable quantile cube: per-slice KLL sketches + exact audit
        |percentiles in one partial+final aggregate over the fact scan;
        |the global row derives from kll_merge_agg over the SLICE SKETCH
        |rows (3 rows in, one out) — at 100 TB the rollup is a merge of
        |K kilobyte sketches, never a rescan. The exact percentile audit
        |column is the only sort-based cost and exists for the oracle.""".stripMargin,
    "q116_topk_sketch_rollup" ->
      """Mergeable top-k cube: per-source frequent-items states (bounded
        |maxItemsTracked entries each) from one token scan; the global
        |top-3 derives from approx_top_k_combine over the stored states.
        |The estimate explode + rank window runs over <= 64 rows per
        |slice — driver-scale — while the only corpus-sized work is the
        |one partial+final accumulate aggregate.""".stripMargin,
    "q117_containment_join" ->
      """Directed containment: the inner side explodes only each doc's
        |PREFIX (rarest p = n - ceil(tau n) + 1 shingles under the global
        |(df, hash) order — one partial-agg df shuffle + a bounded
        |per-doc window), the outer side is the full postings stream, and
        |the equi-join on the shingle is the only corpus-sized exchange.
        |Verification carries both hashed arrays to the surviving
        |candidates and intersects in-row (codegen'd array_intersect) —
        |no third shuffle. Measured FLAT at the 10x hot-cluster rig: the
        |q30 composition collapses byte-identical copies before any pair
        |forms.""".stripMargin,
    "q110_compaction" ->
      """The read-back audit of a shuffle-free compaction (the rewrite
        |itself is scan -> narrow coalesce -> write; LakeLayoutSpec pins
        |its plan has no exchange): an ordinary partial+final aggregate
        |over the compacted copy. The point at 100 TB is what is ABSENT —
        |compaction never exchanges, sorts or re-encodes rows, so its
        |cost is IO-bound at write bandwidth and embarrassingly parallel
        |across partitions.""".stripMargin,
    "q113_quota_sample" ->
      """Exact-quota carve: the hash order key is per-row arithmetic, the
        |per-stratum rank runs as WindowGroupLimit Partial BEFORE the
        |lang exchange — each map task forwards at most quota rows per
        |stratum, so the shuffle carries O(quota x strata x tasks), never
        |the corpus, and a mega-stratum's sort never materializes. One
        |exchange total plus the output sort.""".stripMargin,
    "q112_span_dedup" ->
      """Substring-dedup removal: the positioned gram stream is ONE
        |materialized explode (Scan ExistingRDD on both consumers); span
        |ownership is a partial+final aggregate on the span content
        |(q94's one content shuffle); the mark join keys on span — a
        |boilerplate span is one stats row, and the fat probe partition
        |it creates is many-rows-one-key, exactly what AQE's skew split
        |handles; removal positions explode 8x from MARKED grams only;
        |the anti-join and rebuild key on (doc_id, pos) / doc_id. No
        |window, no all-pairs, nothing quadratic.""".stripMargin,
    "q94_line_dedup" ->
      """C4-style boilerplate removal with ONE content shuffle: line
        |frequency is a partial+final HashAggregate on the 16-byte md5 key
        |(map-side combine — the shuffle carries one row per distinct line
        |per task), the df>=3 duplicate set is filtered FIRST and only
        |then broadcast, so the corpus side is never reshuffled for the
        |join (BroadcastHashJoin LeftOuter, corpus side streams). Document
        |reconstruction is a partial collect_list per doc_id — the only
        |other exchange. Boilerplate sets are tiny by nature; if one ever
        |outgrew the broadcast threshold the identical plan degrades to a
        |shuffle join on the same narrow key by dropping the hint.""".stripMargin,
    "q95_variant_shred" ->
      """Semi-structured ingestion at scan speed: parse_json shreds each
        |ragged document into the binary VARIANT encoding and the typed
        |variant_get path extractions are codegen'd expressions inside ONE
        |Project (whole-stage codegen's subexpression elimination evaluates
        |parse_json once per row even though the plan text prints it per
        |extraction). No UDF, no regex, no fixed struct schema; the only
        |exchanges are the 5-row partial+final aggregate pair and the
        |final sort. ReadSchema proves column pruning reaches the scan
        |(4 of 9 order columns).""".stripMargin,
    "q96_image_phash_neardup" ->
      """Multimodal near-dup at the q36 shape: pHash is ONE mapInPandas-free
        |Project per image (decode + DCT inside the phash64 expression —
        |binary payloads never shuffle), banding splits the 64-bit hash
        |into 4 pigeonhole bands (any pair within hamming 3 shares an
        |exact band — the recall proof is in MultimodalSpec), and the
        |candidate self-join is keyed on (band, value) so only same-band
        |images ever meet. The hamming re-check runs on the pair stream's
        |two longs, not the images. At 100 TB the decode scan dominates
        |and parallelizes per-file; the join never sees a binary
        |column.""".stripMargin,
    "q97_contrastive_triplets" ->
      """Rides q62's materialized-index candidate stream unchanged (same
        |Scan ExistingRDD leaves, same cell-keyed join, same partial
        |WindowGroupLimit below the qid exchange); the triplet selection
        |itself is ONE extra partial-agg groupBy on the anchor id
        |(min_by/max_by over rk) — no second window, no self-join back.
        |The kNN graph is the expensive artifact; triplets are a
        |near-free derivation.""".stripMargin,
    "q100_hll_sketch_rollup" ->
      """Mergeable-sketch pre-aggregation: per-source HLL sketches build in
        |one partial+final HashAggregate pair over the single corpus scan
        |(the sketch IS the partial state — ~2.5 KB per slice at lgK=12),
        |and the global rollup UNIONS the stored sketches
        |(hll_union_agg over source-count rows) instead of rescanning.
        |The exact_distinct audit column rides the same scan. At 100 TB
        |every later rollup over stored slices is sketch-sized work; the
        |corpus is scanned once per ingest.""".stripMargin,
    "q99_heavy_hitters" ->
      """The exact rescue pass after the Misra-Gries sketch (pass 1 is one
        |buffer per partition to the driver — <= 4096 counters each, no
        |vocabulary shuffle; it runs before this plan and supplies the
        |candidate table). The gate is a BroadcastHashJoin LEFT SEMI: the
        |exploded token stream is filtered against the <= capacity
        |candidate set WITHOUT shuffling, so the groupBy count that
        |follows partial-aggregates over a key space bounded by the
        |candidate list instead of the 10^8-key unicode tail. The output
        |is exact and execution-order-invariant — the only
        |order-dependent object (the sketch contents) never reaches the
        |output because every true heavy hitter is guaranteed into the
        |candidate set and the exact counts discard the rest.""".stripMargin)

  /** Frames that are not directly a `SparkEntry.queries` entry — the
    * per-iteration jobs of the iterative queries (whose returned summary
    * frame hides the shape that actually dominates runtime), the batch twin
    * of the q98 stream-stream join (the streaming rig's plan only exists
    * inside a running micro-batch), and the OVER-CAP regimes of the gated
    * q62/q68 broadcasts. Frames are rendered EAGERLY (the `render` arg)
    * because the gated entries flip on session conf that must be restored
    * before the next frame plans. */
  private def customFrames(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, render: org.apache.spark.sql.DataFrame => String)
      : Seq[(String, String, String)] = {
    import graft.queries.{TextSearch, VectorStats}
    import org.apache.spark.sql.functions.{col, count, lit}
    import org.apache.spark.sql.execution.GraftCheckpoint.localCheckpointFlatStats
    val e = VectorStats.vecs(spark, sfDir)
    val cents = e.filter(col("vec_id") < VectorStats.KmeansK)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    val nodes = e.select(col("vec_id").as("id"))
    val edges = TextSearch.knnGraph(spark, sfDir)
      .select(col("qid").as("src"), col("nn_id").as("dst"))
    val nN = nodes.count().toDouble
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ec = localCheckpointFlatStats(edges.join(outdeg, "src"))
    val srcs = ec.select("src").distinct()
    val ranks = localCheckpointFlatStats(nodes.withColumn("r", lit(1.0 / nN)))
    def forcedShuffle(build: => org.apache.spark.sql.DataFrame): String = {
      val prevCap = spark.conf.getOption("spark.graft.ivf.maxCellGroupMembers")
      val prevThr = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.graft.ivf.maxCellGroupMembers", "8")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try render(build)
      finally {
        prevCap.fold(spark.conf.unset("spark.graft.ivf.maxCellGroupMembers"))(
          spark.conf.set("spark.graft.ivf.maxCellGroupMembers", _))
        prevThr.fold(
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      }
    }
    Seq(
      ("q80_kmeans (per-iteration update job)",
        """The job each Lloyd iteration runs (the returned summary frame is
          |a k-row checkpoint scan and hides this): centroids are baked in
          |as plan LITERALS so assignment is a pure Project inside
          |WholeStageCodegen over the persisted vector scan — no join
          |anywhere — and the only exchange carries the (cluster, coord)
          |partial aggregate, <= k*64 rows per map task regardless of
          |corpus size. k*64 scalars come back to the driver per iteration;
          |the corpus never does. QueryPlanSpec asserts no-join +
          |agg-below-every-shuffle on this exact frame.""".stripMargin,
        render(VectorStats.lloydUpdate(e, cents))),
      ("q85_pagerank (per-iteration step)",
        """One PageRank iteration as a single plan (the final ranks frame is
          |a checkpoint scan): the src-keyed rank join feeds per-edge
          |fixed-point contributions into a dst-keyed partial-agg groupBy,
          |and the dangling mass reduces to ONE ROW (grouping-free
          |aggregate) broadcast back in the same plan — the only
          |nested-loop join, a scalar attach. Both iteration inputs are
          |flat-stats checkpoints, so plan depth and stats stay constant
          |across the 8 rounds. QueryPlanSpec asserts no-cartesian,
          |one-row-build-side-only BNLJ, and agg-below-the-contribution-
          |exchange on this exact frame.""".stripMargin,
        render(VectorStats.pagerankStep(nodes, ec, srcs, ranks, nN,
          VectorStats.PrDamping))),
      ("q98_stream_stream_join (batch twin of the streaming interval join)",
        """The streaming rig's plan only exists inside a live micro-batch;
          |this is its batch twin (StreamingTwinSpec proves pair-set
          |equality). The per-user interval join is a plain equi-join on
          |user_id with the time interval as a residual condition — NOT a
          |BroadcastNestedLoopJoin — so both sides hash-partition on the
          |join key and pairs form per-user. In the streaming form the
          |same equi-key keeps the state store hash-partitioned, and the
          |two-sided watermark bounds retained state to watermark x rate
          |per side regardless of stream age.""".stripMargin,
        render(graft.streaming.EventStream.batchAttributedPairs(
          spark, sfDir))),
      ("q62_knn_graph (forced multi-salt shuffle regime)",
        """q62 with `spark.graft.ivf.maxCellGroupMembers=8` and size-based
          |broadcast off — the plan a 100 TB corpus gets when the grouped
          |members outgrow the runtime broadcast threshold: a keyed
          |SHUFFLE join on (cid, salt). The members side carries NO
          |explicit hint at any scale (r11: the r9 gate was measured and
          |removed — BENCH_NOTES_r11); hot cells split across
          |ceil(size/cap) salt keys, so the exchange redistributes a
          |skewed probe layout and no single task owns a mega-cell's
          |pair volume. KnnGraphSpec pins row equality between
          |regimes.""".stripMargin,
        forcedShuffle(graft.queries.TextSearch.knnGraph(spark, sfDir))),
      ("q68_semdedup (forced multi-salt shuffle regime)",
        """q68 under the same forced conf: the ε-candidate join becomes a
          |(cid, salt)-keyed shuffle of bounded grouped members while the
          |n_close partial aggregate and min-id attach are unchanged.
          |Rows are regime-independent (KnnGraphSpec).""".stripMargin,
        forcedShuffle(graft.SparkEntry.queries("q68_semdedup")(spark, sfDir))))
  }

  /** The streaming rigs' PER-MICRO-BATCH plans — the shape each trigger
    * repeats, which exists only inside a live IncrementalExecution and is
    * captured by [[graft.streaming.StreamPlans]] when the rigs run. Each
    * rig is run to completion here (via its SparkEntry def, so staging and
    * session conf are the production path), then the recorded plan is
    * rendered. */
  private def streamingFrames(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, render: String => String): Seq[(String, String, String)] = {
    import graft.streaming.StreamPlans
    Seq("q33_streaming_tumbling", "q50_streaming_sessions",
      "q53_streaming_neardup", "q86_streaming_upsert",
      "q81_streaming_enrich", "q104_streaming_ingest_dedup",
      "q111_streaming_heavy_hitters", "q120_change_data_feed")
      .foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).collect())
    // captured at AvailableNow's FINAL trigger — the watermark-flush batch,
    // whose source slice is empty (a data trigger carries its file slice in
    // the same leaf); every stateful/exchange node above the leaf is the
    // repeated shape
    def plan(key: String): String =
      StreamPlans.get(key).map(p => render(p.treeString))
        .getOrElse(sys.error(s"no captured stream plan for $key"))
    val flushNote = "\n\n(Captured at AvailableNow's final watermark-flush " +
      "trigger, so the source leaf prints empty; a data trigger carries " +
      "its file slice in the same leaf — the stateful/exchange shape " +
      "above it is what every trigger repeats.)"
    Seq(
      ("q33_streaming_tumbling (per-micro-batch plan)",
        """What every trigger repeats: the file-source slice of THIS batch
          |(never the whole replay), the partial+final HashAggregate pair
          |around one hash exchange on (window, event_type) — identical to
          |batch q27's shape — and the StateStoreRestore/Save pair that
          |carries open windows between triggers. EventTimeWatermark
          |bounds that state to ~2 windows per key regardless of stream
          |age; emitted rows are the watermark-closed windows only.""".stripMargin
          + flushNote,
        plan("q33_streaming_hourly")),
      ("q50_streaming_sessions (per-micro-batch plan)",
        """Custom-state sessionization: the batch slice exchanges ONCE on
          |user_id into FlatMapGroupsWithStateExec (state store hash-
          |partitioned on the same key — arriving rows meet their user's
          |open sessions without any extra shuffle), with the object
          |serialization fenced into Append/DeserializeToObject around the
          |state operator. State per user is the open-session list,
          |expired by EventTimeTimeout at the watermark.""".stripMargin
          + flushNote,
        plan("q50_streaming_sessions")),
      ("q53_streaming_neardup (per-micro-batch plan)",
        """Streaming near-dup ingest: the minhash signature + banding are
          |STATELESS Projects on the batch slice (same codegen'd
          |expressions as batch q35 — streaming changes nothing about the
          |hot loop), then one exchange on (band, bucket value) into
          |FlatMapGroupsWithStateExec whose per-bucket state is a single
          |anchor row with event-time expiry. At 100 TB/day the exchange
          |carries 3 narrow band rows per doc; the state store holds one
          |row per live bucket, bounded by the horizon.""".stripMargin
          + flushNote,
        plan("q53_streaming_neardup")),
      ("q86_streaming_upsert (per-micro-batch MERGE frame)",
        """The batch job foreachBatch runs per trigger (the streaming plan
          |proper is just scan -> sink; this is the work): the micro-batch
          |collapses to a per-user partial+final aggregate FIRST, and only
          |that batch-bounded aggregate joins FULL OUTER on user_id
          |against the current state table — so the join's left side is
          |batch-sized, the right side is the keyed state parquet, and
          |both sides hash-partition on the merge key exactly like a
          |lakehouse MERGE INTO. Merge arithmetic is associative and
          |exact (counts, max ts, DECIMAL sums): final state equals the
          |one-shot batch aggregate regardless of micro-batch slicing
          |(EventStreamSpec).""".stripMargin,
        plan("q86_streaming_upsert_merge")),
      ("q81_streaming_enrich (per-micro-batch plan)",
        """Stream-static enrichment: the batch slice left-joins the
          |MEASURED-gated user->nation dim (materialized once per stream
          |via flat-stats localCheckpoint — no dim parquet scan appears in
          |this plan, only its RDD scan) then feeds the same watermarked
          |window aggregate as q33. Under the row cap the dim side is a
          |BroadcastHashJoin, so the stream never exchanges before its
          |windowed agg; over the cap it degrades to an un-hinted keyed
          |shuffle join. Both regimes row-equal (EventStreamSpec).""".stripMargin
          + flushNote,
        plan("q81_streaming_enrich")),
      ("q111_streaming_heavy_hitters (per-micro-batch sketch frame)",
        """The streamed sketch build inside foreachBatch: ONE bounded
          |Misra-Gries buffer per partition partial-aggregates into a
          |single <= capacity map row (ObjectHashAggregate over the typed
          |Aggregator) — the batch slice's vocabulary never shuffles; the
          |PODS merge into the versioned persistent sketch is a
          |driver-side fold over two bounded maps. The exact rescue after
          |stream completion is q99's batch tail, so the streamed output
          |hash-equals batch q99 under any slicing
          |(HitterStreamSpec).""".stripMargin,
        plan("q111_streaming_sketch")),
      ("q120_change_data_feed (per-micro-batch CDF-emit frame)",
        """The change-feed write each trigger repeats: the feed rows are a
          |pure PROJECTION of the one materialized (touched-state ⋈
          |batch-delta) full-outer join the merge already built (Scan
          |ExistingRDD — the flat-stats checkpoint; the state table is
          |never re-read for the feed), split into post/insert and
          |preimage branches by a union, written overwrite at a
          |batchId-deterministic path. CDF IO is O(changed keys) per
          |trigger; exactly-once by the same replay recipe as the table
          |(CdfSpec).""".stripMargin,
        plan("q120_cdf_emit")),
      ("q104_streaming_ingest_dedup (per-micro-batch probe frame)",
        """Continuous ingest-dedup's foreachBatch probe (the streaming plan
          |proper is scan -> sink; this is the per-trigger work): the
          |batch's one-Project signature pass probes the current index
          |version — fingerprint anchors, band buckets, stored signatures
          |— via three keyed joins whose LEFT side is batch-sized and
          |whose right side is the versioned index parquet, then the
          |batch merges in as a union + min-per-key partial aggregate.
          |Index size tracks the DISTINCT corpus, not stream age
          |(IngestStreamSpec pins slicing-independence).""".stripMargin,
        plan("q104_streaming_ingest_probe")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative queries\n\n")
    sb.append(s"Generated by `graft.tools.DumpPlans` against `$sfDir`.\n")
    sb.append("AQE is enabled; plans below are the initial physical plans\n")
    sb.append("(AQE refines exchanges at runtime — see QueryPlanSpec and\n")
    sb.append("SkewJoinSpec for executed-plan assertions).\n")
    // strip identity hashcodes, plan ids, run UUIDs, temp paths and epoch
    // timestamps so regeneration is diff-stable when the plan shape has
    // not changed (streaming plans carry per-run state-store paths)
    def renderStr(s: String): String =
      s.replaceAll("@[0-9a-f]{6,}", "@...")
        .replaceAll("plan_id=\\d+", "plan_id=N")
        .replaceAll(
          "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
          "UUID")
        .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$N")
        // long binary literals (q106's inlined bloom sketch): collapse —
        // they are data-dependent (diff churn) and would otherwise be
        // corrupted by the epoch-ms rule below
        .replaceAll("0x[0-9A-F]{64,}", "0x<BINARY_LITERAL>")
        .replaceAll("/(tmp|private)/[-_/A-Za-z0-9.]*", "/tmp/...")
        // standalone 13-digit runs only: a digit or '.' on either side
        // means the run is inside a longer numeric literal (a double's
        // fraction digits), which must render verbatim
        .replaceAll("(?<![\\d.])\\d{13}(?![\\d.])", "EPOCH_MS")
    def render(df: org.apache.spark.sql.DataFrame): String =
      renderStr(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    annotated.foreach { case (name, note) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n$note\n\n```\n${render(df)}```\n")
    }
    val custom = customFrames(spark, sfDir, render)
    custom.foreach { case (name, note, plan) =>
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    val streaming = streamingFrames(spark, sfDir, renderStr)
    streaming.foreach { case (name, note, plan) =>
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan\n```\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md " +
      s"(${annotated.size + custom.size + streaming.size} queries)")
    spark.stop()
  }
}
