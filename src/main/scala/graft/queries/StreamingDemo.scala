package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Q33 (SURVEY §2B): Structured Streaming capability demo — file-replay of
  * the events table through a watermarked tumbling-window aggregation,
  * validated in-flight against batch Spark (the no-streaming-in-DuckDB
  * query; rows-only driver check; the hard assertions live in
  * EventStreamSpec). Emits the closed windows joined with their batch twins
  * plus a match flag.
  */
object StreamingDemo {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q33_streaming_tumbling",
      (s, d) => {
        val root = java.nio.file.Files.createTempDirectory("graft-q33").toString
        val replay = s"$root/replay"
        graft.streaming.EventStream.stageReplay(s, d, replay, nFiles = 4)
        val sinkTable = s"q33_sink_${System.nanoTime()}"
        val streamed =
          graft.streaming.EventStream.runToCompletion(s, replay, sinkTable)
        // the replay copy is only needed while the stream runs
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
        }
        rm(new java.io.File(root))
        val batch = graft.streaming.EventStream.batchHourlyCounts(s, d)
        // LEFT join from the streamed side + cnt AND sum comparison: a
        // missing batch twin or a value mismatch shows as matches_batch =
        // false instead of silently vanishing from an inner join
        streamed.as("s").join(batch.as("b"),
            col("s.hour_start") === col("b.hour_start")
              && col("s.event_type") === col("b.event_type"), "left")
          .select(col("s.hour_start").as("hour_start"),
            col("s.event_type").as("event_type"),
            col("s.cnt").as("cnt"),
            (col("b.cnt").isNotNull && col("s.cnt") === col("b.cnt")
              && abs(col("s.sum_value") - col("b.sum_value")) < lit(1e-6))
              .as("matches_batch"))
          .orderBy("hour_start", "event_type")
      },
      None))
}
