package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the curation family beyond engine parity (the
  * DuckDB hash-match proves Spark == DuckDB, not that the operators do
  * their jobs). sf0.001 corpus throughout.
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  import SpecHelpers.hintedBounds
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit =
    SpecHelpers.withConf(spark, pairs: _*)(body)

  /** Both regimes of q94's MEASURED dup-set gate
    * (`spark.graft.dedup.dupBroadcastMaxRows`): the default run measures
    * the duplicated-line cardinality, records it in `lastDupSetStats`, and
    * hints the broadcast; with the cap forced to 0 the same query reports
    * broadcast=false, ships no `dup-set-gated` hint, and — with size-based
    * planning disabled so the tiny spec-scale set cannot be silently
    * re-broadcast by AQE — the mark join executes as a keyed shuffle on
    * lh. Rows identical in both regimes. This is the test the registry
    * rationale (`BroadcastBounds.registry("dup-set-gated")`) cites.
    */
  test("q94: over-cap regime drops the dup-set hint, shuffles, same rows") {
    val hinted = SparkEntry.queries("q94_line_dedup")(spark, dir)
    assert(hintedBounds(hinted).contains("dup-set-gated"),
      "default regime should hint the measured dup set under the cap")
    val (rowsU, bytesU, bcastU) = graft.queries.Curation.lastDupSetStats.get()
    assert(bcastU, "default regime should record broadcast=true")
    assert(rowsU > 0 && bytesU > 0, "the measured dup set must be non-empty")
    val hintedRows = hinted.collect().toSeq

    withConf(
      "spark.graft.dedup.dupBroadcastMaxRows" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val shuffled = SparkEntry.queries("q94_line_dedup")(spark, dir)
      assert(!hintedBounds(shuffled).contains("dup-set-gated"),
        "over-cap regime must not hint the dup set")
      val (rowsO, _, bcastO) = graft.queries.Curation.lastDupSetStats.get()
      assert(!bcastO, "over-cap regime should record broadcast=false")
      assert(rowsO == rowsU, "the measured cardinality is regime-independent")

      val nodes = PlanWalk.collectAll(PlanWalk.executedPlanOf(shuffled))
      val shuffleJoins = nodes.count {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
        case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
        case _ => false
      }
      assert(shuffleJoins >= 1,
        "over-cap plan should contain a keyed shuffle join, found: " +
          nodes.map(_.nodeName).distinct.sorted.mkString(", "))

      assert(shuffled.collect().toSeq == hintedRows,
        "q94 rows differ between broadcast and shuffle regimes")
    }
  }

  test("q67: every stamped doc is detected, counts match the stamp arithmetic") {
    val out = SparkEntry.queries("q67_pii_scrub")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // the stamping injects exactly one span per matching class; the text
      // itself contains none (clean word-salad corpus), so counts are exact
      assert(r.getAs[Int]("n_emails") == (if (id % 3 == 0) 1 else 0), s"doc $id emails")
      assert(r.getAs[Int]("n_phones") == (if (id % 5 == 0) 1 else 0), s"doc $id phones")
      assert(r.getAs[Int]("n_ips") == (if (id % 7 == 0) 1 else 0), s"doc $id ips")
    }
  }

  test("q70: coverage bounded; exact-duplicate docs reach coverage 1.0") {
    val out = SparkEntry.queries("q70_span_coverage")(spark, dir)
    val rows = out.collect()
    assert(rows.forall { r =>
      val c = r.getAs[Double]("dup_coverage"); c >= 0.0 && c <= 1.0
    })
    // docs sharing their full text (q30's exact-dup pairs) must be fully
    // covered: every span of one occurs verbatim in the other
    val sp = spark
    val dupDocs = sp.read.parquet(s"$dir/documents.parquet")
      .groupBy("text").agg(collect_list("doc_id").as("ids"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(explode(col("ids")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    if (dupDocs.nonEmpty) {
      val covered = rows.filter(r => dupDocs(r.getAs[Long]("doc_id")))
        // only docs long enough to have spans appear in the q70 output
        .map(r => r.getAs[Double]("dup_coverage"))
      assert(covered.forall(_ == 1.0),
        s"exact-dup docs not fully span-covered: ${covered.mkString(",")}")
    }
  }

  test("q112: planted spans — owner keeps, copies lose exactly the span, shorts untouched") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q112").toString
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val span = (1 to 8).map(i => s"d$i").mkString(" ") // one exact 8-gram
    val owner = s"$span o1 o2 o3"                      // doc 1 owns it
    val copy = s"c1 c2 c3 $span"                       // doc 2 loses it
    val full = owner                                   // doc 3 = exact dup of 1
    val short = "s1 s2 s3"                             // < 8 tokens: no spans
    Seq(1L -> owner, 2L -> copy, 3L -> full, 4L -> short)
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val rows = SparkEntry.queries("q112_span_dedup")(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the minimum owner keeps its text verbatim
    assert(rows(1L) == ((11L, 0L, md5(owner))), s"owner rewritten: ${rows(1L)}")
    // the copy loses EXACTLY the 8 span tokens, context survives
    assert(rows(2L) == ((11L, 8L, md5("c1 c2 c3"))), s"copy: ${rows(2L)}")
    // an exact duplicate of the owner is fully covered -> empty rewrite
    assert(rows(3L) == ((11L, 11L, md5(""))), s"exact dup: ${rows(3L)}")
    // sub-span docs carry no 8-grams and are untouched
    assert(rows(4L) == ((3L, 0L, md5(short))), s"short doc: ${rows(4L)}")
  }

  test("q112 live corpus: untouched docs keep their exact text, removals bounded") {
    val rows = SparkEntry.queries("q112_span_dedup")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size, "every doc must appear in the rewrite")
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var removedAny = 0
    rows.foreach { r =>
      val (id, nTok, nRem, h) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(nRem >= 0 && nRem <= nTok, s"doc $id: removal out of bounds")
      if (nRem == 0)
        assert(h == md5(docs(id)), s"untouched doc $id text changed")
      else removedAny += 1
    }
    assert(removedAny > 0, "live corpus has planted dups; none were rewritten")
  }

  test("q72: DSIR selects the entire target slice and enriches beyond base rate") {
    val sp = spark
    val sel = SparkEntry.queries("q72_dsir_selection")(sp, dir)
      .select("doc_id")
      .join(sp.read.parquet(s"$dir/documents.parquet"), "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    val targetDocs = sp.read.parquet(s"$dir/documents.parquet")
      .filter(col("source") === graft.queries.Curation.DsirTarget)
      // docs with >= 2 tokens: single-token docs carry no bigram evidence
      .filter(size(split(col("text"), " ")) >= 2)
      .count()
    // every rankable target doc outranks the bulk: full target recall
    assert(sel.getOrElse(graft.queries.Curation.DsirTarget, 0L) == targetDocs,
      s"target slice not fully selected: $sel vs $targetDocs")
    // and the target is enriched far beyond its 5% base rate in the top-k
    val total = sel.values.sum.toDouble
    assert(sel(graft.queries.Curation.DsirTarget) / total > 0.15,
      s"no enrichment: $sel")
  }

  test("q91: scores are calibrated probabilities and the filter is non-degenerate") {
    val rows = SparkEntry.queries("q91_quality_classifier")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == docs, "one score per document")
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      // algebraic sigmoid range is (0, 1) strictly
      assert(q > 0.0 && q < 1.0, s"score out of range: $q")
      assert(r.getAs[Boolean]("kept") == (q >= 0.55), "kept flag != threshold")
    }
    val kept = rows.count(_.getAs[Boolean]("kept"))
    // a filter that keeps everything or nothing is vacuous
    assert(kept > 0 && kept < rows.length, s"degenerate filter: $kept/${rows.length}")
  }

  test("q91: the score is monotone in the stopword feature (weight sign)") {
    // two synthetic docs differing ONLY in stopword density: the
    // positive stop-ratio weight must rank the stopword-denser doc higher
    import spark.implicits._
    val docs = Seq(
      (1L, "the a of to in is on and alpha beta", "en", "srcX", 38L),
      (2L, "alpha beta gamma delta epsi zeta eta theta iota kappa", "en", "srcX", 52L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-q91").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      val out = SparkEntry.queries("q91_quality_classifier")(spark, tmp)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
      assert(out(1L) > out(2L),
        s"stopword-dense doc should score higher: $out")
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(new java.io.File(tmp))
    }
  }
}
