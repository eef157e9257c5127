package graft

import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, SubqueryAlias}
import org.scalatest.funsuite.AnyFunSuite

/** The r8 bug class — a corpus-sized build side behind an explicit
  * `broadcast()` hint, which OVERRIDES autoBroadcastJoinThreshold and so
  * turns "graceful shuffle degradation" into a driver OOM at scale — made
  * structurally impossible:
  *
  *  1. a source walk rejects any raw `broadcast(` call inside
  *     `graft.queries` (and `graft.streaming`): the only sanctioned hint
  *     is `BroadcastBounds.bounded(name)`, which requires a registered
  *     bound citing why the build side cannot grow with the corpus;
  *  2. the used-name set and the registry are asserted equal (no stale
  *     entries, no unregistered names — `bounded` itself also fails fast
  *     at plan-construction time);
  *  3. every ANALYZED plan of the batch query surface is walked: each
  *     broadcast ResolvedHint must carry the `graft_bcast_<name>` alias
  *     stamp of a registered bound. A hint introduced any other way —
  *     raw `broadcast()`, `.hint("broadcast")`, SQL hint — fails here
  *     even if it dodges the source walk.
  *
  * The gated entry's runtime behavior (hint dropped beyond the cap, plan
  * flips to a keyed shuffle, rows unchanged) is pinned in CurationSpec
  * (dup-set-gated, q94); KnnGraphSpec pins that the q62/q68 members side
  * is never hinted at all (r11: salted + un-hinted, size-based planning
  * owns the choice).
  */
class BroadcastBoundsSpec extends AnyFunSuite {

  private val srcDirs = Seq(
    new java.io.File("src/main/scala/graft/queries"),
    new java.io.File("src/main/scala/graft/streaming"))

  private def sources: Seq[(java.io.File, String)] = for {
    dir <- srcDirs
    f <- dir.listFiles().toSeq.sortBy(_.getName) if f.getName.endsWith(".scala")
  } yield f -> new String(
    java.nio.file.Files.readAllBytes(f.toPath),
    java.nio.charset.StandardCharsets.UTF_8)

  test("no raw broadcast() hint anywhere in the query/streaming surface") {
    val offenders = for {
      (f, text) <- sources
      (line, i) <- text.linesIterator.zipWithIndex
      code = line.trim
      if !code.startsWith("*") && !code.startsWith("//") &&
        !code.startsWith("/*")
      if code.contains("broadcast(")
    } yield s"${f.getName}:${i + 1}: $code"
    assert(offenders.isEmpty,
      "raw broadcast() hints found — route them through " +
        s"BroadcastBounds.bounded with a registered bound:\n${offenders.mkString("\n")}")
  }

  test("used bound names and the registry agree exactly") {
    val usedRe = """bounded\("([a-z0-9-]+)"\)""".r
    val used = sources.flatMap { case (_, text) =>
      usedRe.findAllMatchIn(text).map(_.group(1))
    }.toSet
    val registered = BroadcastBounds.registry.keySet
    assert(used == registered,
      s"unregistered names used: ${used -- registered}; " +
        s"stale registry entries never used: ${registered -- used}")
  }

  test("every broadcast hint in every batch query plan cites a registered bound") {
    val s = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    // streaming defs run replay rigs to completion on construction — their
    // (batch-side) joins carry no explicit hints and are excluded here, as
    // is the zarr pipeline (an e2e side-effecting job, no joins at all)
    val skip = graft.queries.StreamingDemo.defs.map(_.name).toSet + "q43_zarr_pyramid"
    val names = SparkEntry.queries.keys.filterNot(skip).toSeq.sorted
    val unregistered = Seq.newBuilder[String]
    names.foreach { name =>
      val df = SparkEntry.queries(name)(s, dir)
      df.queryExecution.analyzed.collectWithSubqueries {
        case h: ResolvedHint =>
          h.child match {
            case sa: SubqueryAlias
              if sa.alias.startsWith(BroadcastBounds.Tag) &&
                BroadcastBounds.registry.contains(
                  sa.alias.stripPrefix(BroadcastBounds.Tag)) => ()
            case other =>
              unregistered += s"$name: hint over ${other.nodeName} " +
                s"(${other.verboseString(1).take(120)})"
          }
      }
    }
    val bad = unregistered.result()
    assert(bad.isEmpty,
      s"broadcast hints without a registered bound:\n${bad.mkString("\n")}")
  }
}
