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
}
