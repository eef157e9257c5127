package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory half of the q99 frequent-token pass.
  *
  * The scale problem it solves: "which tokens exceed 0.1% of the corpus"
  * naively needs a full-vocabulary groupBy — at 100 TB of web text that is
  * a 10^8-10^9-key shuffle (the same unbounded tail the q71 BPE trainer
  * bounds with its vocab cap) for an answer of ~30 rows. The sketch pass
  * instead keeps at most `capacity` counters per partial buffer, merges
  * associatively (one buffer per partition reaches the driver, exactly
  * like [[WeightedPercentile]]), and yields a CANDIDATE set with the
  * classic MG guarantee: every item whose true frequency exceeds
  * n/(capacity+1) survives in the merged sketch (Misra & Gries 1982;
  * merge rule and error proof from Agarwal et al., "Mergeable Summaries",
  * PODS 2012). A second, exact pass then counts ONLY the <= capacity
  * candidates (a broadcast semi-join, shuffle bounded by the candidate
  * set) and applies the real threshold.
  *
  * Determinism contract: the sketch CONTENTS depend on partition/merge
  * order (undercounts differ), but q99's OUTPUT does not — any token at or
  * above the threshold t > n/(capacity+1) is guaranteed into the candidate
  * set under every execution order, and the exact pass discards the
  * order-dependent extras. Capacity must therefore be sized so the query
  * threshold clears the guarantee: q99 uses t = n/1000 with capacity 4096
  * (bound n/4097), a 4x margin.
  *
  * Counter update is the textbook MG step: hit -> increment; miss with
  * room -> insert at 1; miss when full -> decrement ALL counters and drop
  * zeros (amortized O(1) per input: each full-table decrement removes
  * `capacity` total count, so there are at most n/capacity of them).
  * Merge sums counterparts, then restores the bound by subtracting the
  * (capacity+1)-th largest count from every counter and dropping
  * non-positives — the PODS-2012 merge that keeps total undercount within
  * n/(capacity+1) across any merge tree.
  */
class HeavyHitterSketch(capacity: Int)
    extends Aggregator[Array[String], mutable.HashMap[String, Long], Array[String]] {
  require(capacity >= 1, s"capacity must be >= 1: $capacity")

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(buf: mutable.HashMap[String, Long], toks: Array[String])
      : mutable.HashMap[String, Long] = {
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1L)
        case None if buf.size < capacity => buf.update(t, 1L)
        case None =>
          // decrement-all: cancel one occurrence of `capacity` distinct
          // items (including, implicitly, the arriving one)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (k, c) =>
            if (c <= 1L) dead += k else buf.update(k, c - 1L)
          }
          dead.foreach(buf.remove)
      }
      i += 1
    }
    buf
  }

  def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, keep strict positives:
      // at most `capacity` survivors, error grows by that count (bounded
      // by the merged streams' n/(capacity+1) budgets)
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else a.update(k, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  /** Candidate tokens, sorted for a stable driver-side literal list. */
  def finish(buf: mutable.HashMap[String, Long]): Array[String] = {
    val out = buf.keys.toArray
    java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]])
    out
  }

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

object HeavyHitterSketch {
  /** 4096 counters (~100 KB of short tokens per partial buffer): clears
    * q99's n/1000 threshold with 4x margin and stays broadcast-trivial. */
  val DefaultCapacity = 4096

  /** The PODS-2012 merge on plain maps — q111's streaming state fold
    * (driver-side over <= 2*capacity entries per micro-batch). Same rule
    * as [[HeavyHitterSketch.merge]], so the batch-by-batch fold is just
    * another merge tree and the survival guarantee transfers verbatim. */
  def mergeCounts(a: Map[String, Long], b: Map[String, Long],
      capacity: Int): Map[String, Long] = {
    val sk = new HeavyHitterSketch(capacity)
    sk.merge(mutable.HashMap.from(a), mutable.HashMap.from(b)).toMap
  }
}

/** [[HeavyHitterSketch]]'s map-valued sibling: same bounded buffer, same
  * reduce/merge, but `finish` keeps the COUNTS — what a streaming
  * consumer must persist between micro-batches (the candidate list alone
  * cannot be merged; the counts can, by mergeable-summaries). */
class HeavyHitterCounts(capacity: Int)
    extends Aggregator[Array[String], mutable.HashMap[String, Long], Map[String, Long]] {
  private val inner = new HeavyHitterSketch(capacity)
  def zero: mutable.HashMap[String, Long] = inner.zero
  def reduce(buf: mutable.HashMap[String, Long], toks: Array[String])
      : mutable.HashMap[String, Long] = inner.reduce(buf, toks)
  def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = inner.merge(a, b)
  def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] = buf.toMap
  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
