package graft.plans

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule: a naive equi-key-less band join (Catalyst's
  * BroadcastNestedLoopJoin case) must, with the bin-width conf set, compile
  * to a hash-joinable plan and produce the IDENTICAL pair set; joins the
  * rule cannot prove eligible must be left untouched.
  */
class BinnedRangeJoinRuleSpec extends AnyFunSuite {

  private def withRuleSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      try f(s)
      finally s.conf.unset(BinnedRangeJoinRule.ConfKey)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("band join rewrites to a hash join with the identical pair set") {
    withRuleSession { s =>
      val events = graft.Q.events(s, "/root/testdata/sf0.001")
        .withColumn("sec", expr("unix_seconds(CAST(ts AS TIMESTAMP))"))
      val points = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("sec").as("pt"))
      val intervals = events.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("sec").as("lo"),
          (col("sec") + 3600L).as("hi"))

      def joined = points.join(intervals,
        col("pt") > col("lo") && col("pt") <= col("hi"))

      s.conf.unset(BinnedRangeJoinRule.ConfKey)
      val naive = joined
      assert(physical(naive).contains("BroadcastNestedLoopJoin"),
        "rig broken: the naive band join should be a BNLJ")
      val expected = naive.select("p_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      s.conf.set(BinnedRangeJoinRule.ConfKey, "3600")
      val binned = joined
      val plan = physical(binned)
      assert(!plan.contains("BroadcastNestedLoopJoin")
        && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
      assert(plan.contains("Generate"), s"no interval explode in:\n$plan")
      val got = binned.select("p_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expected, "binned rewrite changed the pair set")
      assert(expected.nonEmpty, "rig degenerate: no matching pairs")

      // output schema unchanged (bin columns projected away)
      assert(binned.columns.toSeq == naive.columns.toSeq)
    }
  }

  test("joins with a cross-side equality conjunct are untouched") {
    withRuleSession { s =>
      s.conf.set(BinnedRangeJoinRule.ConfKey, "3600")
      val events = graft.Q.events(s, "/root/testdata/sf0.001")
        .withColumn("sec", expr("unix_seconds(CAST(ts AS TIMESTAMP))"))
      val points = events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("sec").as("pt"))
      val intervals = events.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("sec").as("lo"),
          (col("sec") + 3600L).as("hi"))
      val j = points.join(intervals,
        col("pu") === col("cu") && col("pt") > col("lo")
          && col("pt") <= col("hi"))
      val plan = physical(j)
      assert(!plan.contains("__graft_pt_bin"),
        s"rule fired despite an equi key:\n$plan")
    }
  }

  test("non-inner band joins are untouched") {
    withRuleSession { s =>
      s.conf.set(BinnedRangeJoinRule.ConfKey, "3600")
      val events = graft.Q.events(s, "/root/testdata/sf0.001")
        .withColumn("sec", expr("unix_seconds(CAST(ts AS TIMESTAMP))"))
      val points = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("sec").as("pt"))
      val intervals = events.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("sec").as("lo"),
          (col("sec") + 3600L).as("hi"))
      val j = points.join(intervals,
        col("pt") > col("lo") && col("pt") <= col("hi"), "left")
      assert(!physical(j).contains("__graft_pt_bin"))
    }
  }

  test("rewritten plan equals the manual RangeJoin.binned pair set") {
    withRuleSession { s =>
      s.conf.set(BinnedRangeJoinRule.ConfKey, "3600")
      val events = graft.Q.events(s, "/root/testdata/sf0.001")
        .withColumn("sec", expr("unix_seconds(CAST(ts AS TIMESTAMP))"))
      val points = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("sec").as("pt"))
      val intervals = events.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("sec").as("lo"),
          (col("sec") + 3600L).as("hi"))
      val viaRule = points.join(intervals,
          col("pt") > col("lo") && col("pt") <= col("hi"))
        .select("p_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val viaOperator = graft.operators.RangeJoin.binned(
          points, intervals, col("pt"), col("lo"), col("hi"), 3600L)
        .select("p_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(viaRule == viaOperator)
    }
  }
}
