package graft

import org.scalatest.funsuite.AnyFunSuite

/** The determinism-at-scale contract, tested directly: a query's OUTPUT
  * must be identical under any shuffle partitioning — `shuffle.partitions`
  * is the knob that actually changes between local[32] and a
  * 1000-executor cluster, and any row that moves tasks moves its
  * floating-point association order with it. README promises this
  * ("results hash identically across engines and partitionings"); this
  * spec reruns one query per shuffle-shape class — aggregation, windowed
  * top-k, LSH band join, the whole salted-gate sampling family, and every
  * round-8 addition — with the partition count flipped 4 → 13 (a prime,
  * so every hash redistribution changes) and compares full collected
  * outputs row for row.
  */
class PartitionInvarianceSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private val names = Seq(
    "q02_agg_pricing_summary",   // partial+final agg
    "q16_topk_per_group",        // window rank
    "q35_minhash_lsh",           // band self-join
    "q55_stratified_sample",     // salted-gate sampling family
    "q60_shuffle_shard",
    "q74_mixture_draw",
    "q88_train_val_test",
    "q93_recursive_hierarchy",   // round-8 additions
    "q94_line_dedup",
    "q95_variant_shred",
    "q96_image_phash_neardup",
    "q97_contrastive_triplets",
    // q99's sketch contents are execution-order-DEPENDENT by design; the
    // exact rescue pass is what makes the OUTPUT invariant — the strongest
    // instance of this contract in the suite
    "q99_heavy_hitters",
    "q101_fuzzy_decontamination", // r12: pair-agg + argmax window + top-50
    "q102_ingest_dedup",          // r12: pre-aggregated index probes
    "q105_similarity_join",       // r12: df-ordered prefix join + verify
    "q106_bloom_decontamination", // r12: bitmap-OR sketch + confirm join
    "q108_pq_ann",                // r12: decimal-exact codebook training
    "q109_ivf_pq_ann",            // r12: probe filter over the same chain
    "q109b_ivf_pq_residual",      // r13: residual chain + per-cell LUTs
    "q112_span_dedup",            // r12: span-keyed mark + doc rebuild
    "q117_containment_join",      // r13: one-sided prefix + postings join
    "q113_quota_sample",          // r12: hash-rank carve (sampling family)
    "q119_hybrid_rrf",            // r14: two top-k arms + rank fusion
    "q122_cross_encoder_rerank",  // r14: broadcast-candidate rerank
    "q123_incremental_view",      // r14: signed CDF delta fold + dim join
    "q124_metadata_count")        // r14: manifest sums + perimeter scans

  test("outputs are identical under a different shuffle partitioning") {
    val spark = TestSpark.spark
    def runAll(): Map[String, Seq[String]] = names.map { n =>
      n -> SparkEntry.queries(n)(spark, dir).collect().toSeq.map(_.toString)
    }.toMap
    val base = runAll()
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try {
      val alt = runAll()
      names.foreach { n =>
        assert(base(n) == alt(n),
          s"$n output changed when shuffle.partitions flipped $before -> 13")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
