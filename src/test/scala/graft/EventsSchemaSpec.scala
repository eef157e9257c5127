package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Events-ingestion contract: the data generator has shipped `events.ts` as
  * parquet TIMESTAMP(NANOS) (reads as LongType under the nanosAsLong legacy
  * conf) and as TIMESTAMP_MICROS/NTZ — and switched between them BETWEEN
  * rounds, which turned a working engine red (r10). `Q.events` must read
  * both generations to identical NTZ micro-precision rows, so the next
  * regeneration is a no-op instead of a red round.
  *
  * Spark cannot write TIMESTAMP(NANOS) parquet itself; under the legacy conf
  * a nanos column is indistinguishable from a plain INT64 column at the
  * DataFrame level, so the nanos-generation fixture is synthesized as raw
  * longs (ns since epoch) — exactly what the reader sees for real
  * nanos-generation files.
  */
class EventsSchemaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val rows = Seq(
    (1L, "2024-03-01T08:15:30.123456", 10L, "click", 1.5, "{}"),
    (2L, "2024-03-01T08:15:31.000001", 11L, "view", 2.0, "{}"),
    (3L, "2024-03-02T23:59:59.999999", 10L, "click", 0.25, "{}"))

  private def writeFixture(dir: String, tsAsNanosLong: Boolean): Unit = {
    val sp = spark
    import sp.implicits._
    val df = rows.toDF("event_id", "iso", "user_id", "event_type", "value", "props")
    val withTs =
      if (tsAsNanosLong)
        df.selectExpr("event_id",
          "unix_micros(to_timestamp(iso)) * 1000 AS ts",
          "user_id", "event_type", "value", "props")
      else
        df.selectExpr("event_id",
          "CAST(to_timestamp(iso) AS TIMESTAMP_NTZ) AS ts",
          "user_id", "event_type", "value", "props")
    withTs.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("Q.events reads nanos-long and micros generations to identical rows") {
    val nanosDir = java.nio.file.Files.createTempDirectory("graft-ev-nanos").toString
    val microsDir = java.nio.file.Files.createTempDirectory("graft-ev-micros").toString
    writeFixture(nanosDir, tsAsNanosLong = true)
    writeFixture(microsDir, tsAsNanosLong = false)

    val fromNanos = Q.events(spark, nanosDir)
    val fromMicros = Q.events(spark, microsDir)

    // both land on the same normalized schema ...
    assert(fromNanos.schema("ts").dataType == TimestampNTZType)
    assert(fromMicros.schema("ts").dataType == TimestampNTZType)
    assert(fromNanos.schema == fromMicros.schema)

    // ... and the same micro-precision values
    def dump(df: org.apache.spark.sql.DataFrame): Seq[Row] =
      df.selectExpr("event_id", "CAST(ts AS STRING) AS ts", "user_id",
        "event_type", "value", "props")
        .orderBy("event_id").collect().toSeq
    val a = dump(fromNanos)
    val b = dump(fromMicros)
    assert(a == b, s"nanos-generation read $a != micros-generation read $b")

    // micro-precision survived (not truncated to seconds/millis)
    assert(a.map(_.getString(1)) == Seq(
      "2024-03-01 08:15:30.123456",
      "2024-03-01 08:15:31.000001",
      "2024-03-02 23:59:59.999999"))
  }

  test("a micros-as-long generation fails loudly, not as 1970-era rows") {
    // the third INT64 layout a generator could ship: plain unannotated
    // micros. Under the nanos assumption those values would silently decode
    // to 1970-era timestamps; Q.events' plausible-nanos-epoch guard must
    // turn that into a named row-level error instead.
    val dir = java.nio.file.Files.createTempDirectory("graft-ev-badlong").toString
    val sp = spark
    import sp.implicits._
    rows.toDF("event_id", "iso", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "unix_micros(to_timestamp(iso)) AS ts",
        "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val err = intercept[Exception] {
      Q.events(spark, dir).select("ts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("not a plausible nanosecond epoch")),
      s"expected the named ingestion guard, got: $err")
  }

  test("Q.events reads the live testdata generation (whatever it currently is)") {
    val df = Q.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.limit(5).collect().nonEmpty)
  }
}
