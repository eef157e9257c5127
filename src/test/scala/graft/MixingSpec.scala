package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the corpus-mixing operators that the oracle compare cannot
  * see: q55's hash gate must produce NESTED samples (raising a stratum's
  * rate keeps every previously kept doc — the property curriculum
  * schedules depend on), and q57's packing bins must be contiguous and
  * exactly account for the token stream.
  */
class MixingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def keptIds(rate: Double): Set[Long] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(graft.queries.LlmOps.sampleGate < (rate * 10000).toLong)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("q55 gate: samples nest as the rate rises, and hit the rate closely") {
    val r25 = keptIds(0.25)
    val r50 = keptIds(0.50)
    val all = keptIds(1.00)
    assert(r25.subsetOf(r50) && r50.subsetOf(all))
    assert(all.size == 500)
    // salted md5 is uniform: 25% +- a few points at n=500
    assert(math.abs(r25.size / 500.0 - 0.25) < 0.06, s"r25=${r25.size}")
    assert(math.abs(r50.size / 500.0 - 0.50) < 0.06, s"r50=${r50.size}")
  }

  test("q113 quotas are exact per stratum and rank-nested across quota sizes") {
    def sample(q: Int): Map[String, Seq[Long]] =
      graft.queries.LlmOps.quotaSample(spark, sfDir, q).collect()
        .groupBy(_.getString(0))
        .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
        .toMap
    val strata = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s30 = sample(30)
    // exact quota: min(30, stratum size) rows per language, every language
    assert(s30.keySet == strata.keySet)
    s30.foreach { case (lang, ids) =>
      assert(ids.length == math.min(30L, strata(lang)).toInt,
        s"$lang: ${ids.length} selected of ${strata(lang)}")
      assert(ids.distinct.length == ids.length)
    }
    // rank nesting: the 15-quota carve is a strict PREFIX of the 30-quota
    // carve per stratum (same salt, same order — the curriculum property).
    // Sizes asserted FIRST: without them any prefix — including one from a
    // quota argument that was ignored — would pass the nesting check
    val s15 = sample(15)
    assert(s15.keySet == strata.keySet)
    s15.foreach { case (lang, ids) =>
      assert(ids.length == math.min(15L, strata(lang)).toInt,
        s"$lang: quota-15 selected ${ids.length} of ${strata(lang)}")
      assert(ids == s30(lang).take(ids.length),
        s"$lang: quota-15 not a prefix of quota-30")
    }
  }

  test("q57 bins are contiguous from 0 and account for every token") {
    val rows = SparkEntry.queries("q57_sequence_packing")(spark, sfDir)
      .collect()
    val bins = rows.map(_.getLong(0))
    assert(bins.head == 0L && bins.toSeq == (0L until bins.length).toSeq)
    val totalTokens = rows.map(_.getLong(2)).sum
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(sum(size(split(col("text"), " ")).cast(LongType)))
      .head().getLong(0)
    assert(totalTokens == expected)
    // boundary law: bin k's first doc starts at stream offset = the token
    // prefix of all earlier bins, and that offset must land IN bin k —
    // catches any off-by-one in the (cum - n) / seqLen assignment
    var prefix = 0L
    rows.foreach { r =>
      assert(prefix / 2048 == r.getLong(0),
        s"bin ${r.getLong(0)} starts at offset $prefix")
      prefix += r.getLong(2)
    }
    val lastDocs = rows.map(_.getLong(4))
    assert(lastDocs.toSeq == lastDocs.toSeq.sorted) // id ranges don't interleave
  }
}
