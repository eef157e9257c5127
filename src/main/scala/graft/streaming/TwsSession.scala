package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** The `transformWithState` surface (Spark 4's arbitrary-state API, the
  * successor to `flatMapGroupsWithState`): the SAME interval-merge
  * sessionization as [[EventStream.sessionized]], re-expressed as a
  * [[StatefulProcessor]] — which is exactly what makes it a good test
  * subject: the two APIs must emit the identical session set, and
  * EventStreamSpec asserts TWS == FMGWS == the batch gaps-and-islands twin.
  *
  * What the new API changes (and this demo exercises):
  *  - state is a NAMED, typed handle (`getValueState`) instead of one
  *    opaque per-key blob — a processor can hold several independently
  *    TTL-able states;
  *  - timers are first-class (`registerTimer`/`handleExpiredTimer`)
  *    instead of one implicit timeout per key — silent users get their
  *    sessions closed by a timer firing at watermark passage, with input
  *    processing and expiry as separate callbacks;
  *  - it REQUIRES the RocksDB state store provider (the scale path for
  *    state beyond executor heap: state lives off-heap/on-disk with
  *    changelog checkpointing, which is what makes 10^8-key session state
  *    operable at 100 TB ingest).
  *
  * Timers that outlive their sessions (a new batch may register a fresh
  * timer without deleting the previous one) fire on already-closed state
  * and emit nothing — harmless, and cheaper than tracking the outstanding
  * timer for deletion per batch.
  */
object TwsSession {

  /** Processor: per-user open-session list in one ValueState, closed
    * sessions emitted once the event-time watermark passes last + gap
    * (on input or on timer — whichever observes it first). */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, java.time.Instant),
        EventStream.ClosedSession] {

    @transient private var sessions: ValueState[List[EventStream.OpenSession]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sessions = getHandle.getValueState[List[EventStream.OpenSession]](
        "sessions",
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[List[EventStream.OpenSession]](),
        TTLConfig.NONE)
    }

    /** Close everything the watermark has passed; keep + re-arm the rest. */
    private def closeAndRearm(user: Long, ss: List[EventStream.OpenSession],
        horizonUs: Long): Iterator[EventStream.ClosedSession] = {
      val (closed, open) = ss.partition(_.last + gapUs <= horizonUs)
      if (open.isEmpty) sessions.clear()
      else {
        sessions.update(open)
        // timer API is millis; round UP so it never fires early
        getHandle.registerTimer((open.map(_.last).min + gapUs) / 1000L + 1L)
      }
      closed.sortBy(_.start).iterator.map(s =>
        EventStream.ClosedSession(user, java.time.Instant.ofEpochSecond(
          s.start / 1000000L, (s.start % 1000000L) * 1000L), s.n))
    }

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, java.time.Instant)],
        timers: TimerValues): Iterator[EventStream.ClosedSession] = {
      var ss = if (sessions.exists()) sessions.get() else Nil
      rows.foreach { case (_, ts) =>
        val t = ts.getEpochSecond * 1000000L + ts.getNano / 1000L
        // identical merge rule to EventStream.sessionized: the event
        // extends every session it touches and bridges them into one
        val (touch, rest) = ss.partition(s =>
          t > s.start - gapUs && t < s.last + gapUs)
        val merged = touch.foldLeft(EventStream.OpenSession(t, t, 1L)) {
          (acc, s) => EventStream.OpenSession(math.min(acc.start, s.start),
            math.max(acc.last, s.last), acc.n + s.n)
        }
        ss = merged :: rest
      }
      closeAndRearm(user, ss, timers.getCurrentWatermarkInMs() * 1000L)
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[EventStream.ClosedSession] = {
      if (!sessions.exists()) return Iterator.empty
      closeAndRearm(user, sessions.get(), timers.getCurrentWatermarkInMs() * 1000L)
    }
  }

  /** Runs the TWS sessionizer to completion over the staged replay.
    * Caller must have the RocksDB state store provider set (TWS rejects
    * the default HDFS-backed provider); see EventStreamSpec. */
  def sessionized(spark: SparkSession, replayDir: String, sinkTable: String,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replayDir)
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.time.Instant)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append(),
        org.apache.spark.sql.Encoders.product[EventStream.ClosedSession])
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkTable)
  }
}
