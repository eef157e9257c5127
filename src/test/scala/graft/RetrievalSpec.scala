package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts of the retrieval queries beyond engine-vs-engine
  * hash equality: the BM25 ranking must actually privilege the high-idf
  * term, and the chunker must tile documents exactly (offsets, overlap,
  * text reassembly) — properties the DuckDB oracle cannot express because
  * it would just mirror the same arithmetic.
  */
class RetrievalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q63: every top-20 doc contains the rare high-idf term") {
    val sp = spark
    // sf0.001 has 25 docs containing 'dup' (idf ~ln(19.6) vs ~ln(1.27) for
    // the common terms) — one occurrence of the rare term dominates any
    // combination of common-term matches, so the whole top-20 must be
    // dup-docs; a scorer that dropped the idf weighting would fail this.
    val top = SparkEntry.queries("q63_bm25")(sp, dir).collect()
    assert(top.length == 20, s"expected a full top-20, got ${top.length}")
    val topIds = top.map(_.getAs[Long]("doc_id")).toSet
    val dupIds = sp.read.parquet(s"$dir/documents.parquet")
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(topIds.subsetOf(dupIds),
      s"non-dup docs ranked in top-20: ${topIds.diff(dupIds).toSeq.sorted}")
    top.foreach(r => assert(r.getAs[Double]("score") > 2.0,
      s"dup-doc score ${r.getAs[Double]("score")} suspiciously low"))
  }

  test("q64: chunks tile each document exactly with the declared stride") {
    val sp = spark
    val chunks = SparkEntry.queries("q64_rag_chunking")(sp, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = sp.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == docs.keySet, "chunking dropped or invented docs")
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val cs = chunks(id).sortBy(_.getAs[Int]("chunk_idx"))
      // chunk indices are 0..n with no gaps, and the start of the last
      // chunk falls inside the doc (no phantom empty trailing chunk)
      assert(cs.map(_.getAs[Int]("chunk_idx")).toSeq == cs.indices.toSeq)
      assert((cs.length - 1) * queries.Retrieval.ChunkStride < toks.length)
      cs.foreach { c =>
        val start = c.getAs[Int]("chunk_idx") * queries.Retrieval.ChunkStride
        val expected = toks.slice(start, start + queries.Retrieval.ChunkLen)
        assert(c.getAs[Int]("chunk_toks") == expected.length)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(expected.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(c.getAs[String]("chunk_md5") == md,
          s"doc $id chunk ${c.getAs[Int]("chunk_idx")} text mismatch")
      }
      // full coverage: last chunk reaches the end of the doc
      val lastStart = (cs.length - 1) * queries.Retrieval.ChunkStride
      assert(lastStart + cs.last.getAs[Int]("chunk_toks") == toks.length,
        s"doc $id tail not covered")
    }
  }

  test("q92: top terms are ranked, in-document, and tf-idf-correct") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q92_tfidf_topterms")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val n = docs.size.toDouble
    // driver-twin df over the same tokenization
    val tokSets = docs.view.mapValues(_.split(" ").toSeq).toMap
    val df = tokSets.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == docs.size, "every doc gets top terms")
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to sorted.length),
        s"doc $id ranks not 1..k")
      assert(sorted.length == math.min(3, tokSets(id).distinct.length))
      // scores non-increasing in rank and every term occurs in the doc
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores increase along ranks")
      sorted.foreach { r =>
        val term = r.getAs[String]("term")
        assert(tokSets(id).contains(term), s"doc $id term $term not in doc")
        // exact tf-idf recomputation (same rounding chain)
        val tf = tokSets(id).count(_ == term).toDouble
        val want = BigDecimal(tf * math.log(n / df(term)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("tfidf") - want) < 1e-9,
          s"doc $id term $term: got ${r.getAs[Double]("tfidf")} want $want")
      }
    }
  }

  test("q122: reranking permutes exactly the q119 candidate set and " +
    "rank bookkeeping is consistent") {
    val fused = queries.Retrieval.defs.find(_.name == "q119_hybrid_rrf").get
      .run(spark, dir).collect()
    val rr = queries.Retrieval.defs
      .find(_.name == "q122_cross_encoder_rerank").get
      .run(spark, dir).collect()
    // same doc set, no additions or losses
    assert(rr.map(_.getAs[Long]("doc_id")).toSet ===
      fused.map(_.getAs[Long]("doc_id")).toSet)
    // ce_rank is a 1..k permutation, rows emitted in ce_rank order,
    // ce_score non-increasing along it, deltas cancel (a permutation
    // conserves total rank)
    val ranks = rr.map(_.getAs[Int]("ce_rank")).toSeq
    assert(ranks == (1 to rr.length))
    val scores = rr.map(_.getAs[Double]("ce_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rr.map(_.getAs[Int]("rank_delta")).sum === 0)
    assert(rr.forall(r => r.getAs[Int]("fused_rank") - r.getAs[Int]("ce_rank")
      === r.getAs[Int]("rank_delta")))
  }
}
