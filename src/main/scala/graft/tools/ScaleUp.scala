package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only adversarial-scale rig: replicates an sf dir `factor`x and
  * injects a hot exact-duplicate cluster, producing the corpus the bounded
  * near-dup plans claim to survive (LshScaleSpec pins the plan shapes on
  * small adversarial data; this validates wall-clock + memory empirically
  * at 10x sf0.1 — see BENCH_NOTES_r5.md). Replicas keep their text/values
  * so every document gains `factor` exact copies ON TOP of the corpus's
  * organic near-dups, and `hotSize` identical documents land in one LSH
  * bucket per band — the star-edge cap's worst case.
  *
  * Writes documents/embeddings/events only (the near-dup + streaming
  * surface); events keep raw nanosecond longs so Q.events reads the scaled
  * dir exactly like the original.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf10x"
    val factor = if (args.length > 2) args(2).toInt else 10
    val hotSize = if (args.length > 3) args(3).toInt else 20000
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(factor).select(col("id").as("rep"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    val hotText = ("graft hot cluster token " * 12).trim // 48 tokens, identical
    val hot = spark.range(hotSize).select(
      (lit(maxDoc * factor) + col("id")).as("doc_id"),
      lit(hotText).as("text"), lit("en").as("lang"),
      lit("hot").as("source"), lit(hotText.length.toLong).as("n_chars"))
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * maxDoc).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .unionByName(hot)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head.getLong(0) + 1
    // replica 0 keeps vec_id 0 (the ANN query vector); a hot embedding
    // cluster rides in under one label so q37's oversized path engages too
    val hotEmb = emb.filter(col("vec_id") === 1).select(col("embedding")).cache()
    val hotE = spark.range(hotSize).crossJoin(hotEmb).select(
      (lit(maxVec * factor) + col("id")).as("vec_id"),
      col("embedding"), lit(9999).as("label"))
    emb.crossJoin(reps)
      .select((col("vec_id") + col("rep") * maxVec).as("vec_id"),
        col("embedding"), col("label"))
      .unionByName(hotE)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    val maxUser = ev.agg(max("user_id")).head.getLong(0) + 1
    val maxEvent = ev.agg(max("event_id")).head.getLong(0) + 1
    ev.crossJoin(reps)
      .select((col("event_id") + col("rep") * maxEvent).as("event_id"),
        col("ts"), (col("user_id") + col("rep") * maxUser).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    println(s"[scaleup] wrote $dst at ${factor}x + $hotSize-doc hot cluster")
    spark.stop()
  }
}
