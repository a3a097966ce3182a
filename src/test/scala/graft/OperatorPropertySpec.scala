package graft

import graft.operators.{GraphOps, SketchOps, TemporalOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Brute-force cross-checks on seeded random inputs: each operator is
  * compared against an independent in-memory reference implementation
  * written the dumb-but-obviously-correct way. This is the third
  * correctness leg next to the DuckDB oracles (engine-vs-engine) and
  * the hand-traced unit specs (known answers) — random shapes catch
  * the boundary cases neither enumerates.
  */
class OperatorPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("intervalUnion matches a brute-force sweep on random interval sets") {
    val rnd = new Random(42)
    val rows = (1 to 400).map { i =>
      val key = rnd.nextInt(8).toLong
      val s = rnd.nextInt(1000).toLong
      val len = rnd.nextInt(60).toLong // zero-length allowed
      (key, i.toLong, s, s + len)
    }
    val got = TemporalOps.intervalUnion(
        rows.toDF("k", "eid", "s", "e"), Seq("k"), "s", "e", "eid")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      // reference: walk the number line
      val points = ivs.flatMap(iv => Seq((iv._3, 1), (iv._4, -1)))
        .sortBy(p => (p._1, -p._2))
      var active = 0; var covered = 0L; var merged = 0L; var prev = 0L
      points.foreach { case (t, d) =>
        if (active > 0) covered += t - prev
        if (d == 1 && active == 0) merged += 1
        active += d; prev = t
      }
      assert(got(k) == ((ivs.size.toLong, merged, covered)),
        s"key $k: got ${got(k)}, want (${ivs.size}, $merged, $covered)")
    }
  }

  test("ddSketch quantile estimates respect the relative-error bound on skewed data") {
    val rnd = new Random(7)
    // log-uniform values spanning 5 orders of magnitude + heavy ties
    val vals = (1 to 3000).map { _ =>
      if (rnd.nextBoolean()) math.pow(10, rnd.nextDouble() * 5).toLong.max(1L)
      else 37L
    }
    val df = vals.map(("k", _)).toDF("key", "v")
    val sk = SketchOps.ddSketch(df, "key", "v")
    val qs = Seq(("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2),
      ("p75", 3, 4), ("p90", 9, 10), ("p99", 99, 100), ("p100", 1, 1))
    val est = SketchOps.ddQuantiles(sk, qs)
      .as[(String, String, Int, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    val sorted = vals.sorted
    qs.foreach { case (name, num, den) =>
      val rank = (num.toLong * sorted.size + den - 1) / den
      val truth = sorted(rank.toInt - 1).toDouble
      assert(math.abs(est(name) - truth) <= truth * 0.0625 + 1e-9,
        s"$name: est ${est(name)} vs true $truth")
    }
  }

  test("frequentSequences matches brute-force trigram support on random streams") {
    val rnd = new Random(11)
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(20).toLong, i.toLong, i.toLong, s"e${rnd.nextInt(4)}")
    }
    val got = TemporalOps.frequentSequences(
        rows.toDF("u", "t", "eid", "et"), "u", "t", "eid", "et",
        length = 3, topK = 1000)
      .select($"seq", $"support", $"occurrences")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val ref = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      rs.sortBy(_._2).map(_._4).sliding(3).filter(_.size == 3)
        .map(w => (u, w.mkString(">"))).toSeq
    }
    val refCounts = ref.groupBy(_._2).map { case (seq, hits) =>
      seq -> ((hits.map(_._1).distinct.size.toLong, hits.size.toLong)) }
    assert(got == refCounts)
  }

  test("adamicAdar matches brute force on a random graph") {
    val rnd = new Random(3)
    val edges = (1 to 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = GraphOps.adamicAdar(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // reference: adjacency sets
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      a <- nodes; b <- nodes if a < b && !adj(a).contains(b)
      common = adj(a).intersect(adj(b)) if common.nonEmpty
    } yield {
      val score = common.toSeq.map(n => 1.0 / math.log(adj(n).size)).sum
      (a, b) -> ((common.size.toLong, math.rint(score * 1e6) / 1e6))
    }).toMap
    assert(got.keySet == want.keySet,
      s"pair sets differ: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
    got.foreach { case (k, (c, s)) =>
      assert(c == want(k)._1, s"$k common count")
      assert(math.abs(s - want(k)._2) <= 1e-6, s"$k score $s vs ${want(k)._2}")
    }
  }

  test("jaccardLinkPred matches brute force on a random graph") {
    val rnd = new Random(11)
    val edges = (1 to 160).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val got = GraphOps.jaccardLinkPred(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // reference: adjacency sets the dumb way
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      a <- nodes; b <- nodes if a < b
      if !adj(a).contains(b)
      common = adj(a).intersect(adj(b)).size if common >= 1
    } yield {
      val union = (adj(a) ++ adj(b)).size
      (a, b) -> ((common.toLong, union.toLong,
        math.rint(common.toDouble / union * 1e6) / 1e6))
    }).toMap
    assert(got == want)
  }

  test("refreshTopK equals recompute across random append sequences") {
    import graft.operators.ViewMaintenance
    val rnd = new Random(23)
    def batch(n: Int, idBase: Long) = (0 until n).map(i =>
      (rnd.nextInt(5).toLong, idBase + i, rnd.nextInt(40).toLong))
    val batches = Seq(batch(30, 0L), batch(25, 1000L), batch(40, 2000L))
    val dfs = batches.map(_.toDF("g", "id", "v"))
    var view = ViewMaintenance.refreshTopK(
      dfs.head.limit(0), dfs.head, Seq("g"), "v", "id", k = 4)
    dfs.tail.foreach { b =>
      view = ViewMaintenance.refreshTopK(view, b, Seq("g"), "v", "id", k = 4)
    }
    val all = dfs.reduce(_ unionByName _)
    val direct = ViewMaintenance.refreshTopK(
        all.limit(0), all, Seq("g"), "v", "id", k = 4)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(view.as[(Long, Long, Long, Int)].collect().toSet == direct)
  }

  test("winnowedFingerprints matches a brute-force winnow on random texts") {
    import graft.llm.DedupOps
    val k = 6; val w = 4
    // the reference re-derives the exact md5-prefix hash the operator
    // uses, winnows the dumb way, and must agree fingerprint-for-
    // fingerprint; includes degenerate shapes (short/empty docs)
    def refHash(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    def refNorm(s: String): String =
      s.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
        .replaceAll("\\s+", " ").trim
    def refWinnow(raw: String): Set[Long] = {
      val t = refNorm(raw)
      val grams =
        if (t.length >= k) (0 to t.length - k).map(i => refHash(t.substring(i, i + k)))
        else Seq.empty
      if (grams.isEmpty) Set.empty
      else if (grams.size < w) Set(grams.min)
      else grams.sliding(w).map(_.min).toSet
    }
    val rnd = new Random(7)
    val vocab = Seq("spark", "merge", "table", "rows", "Key!", "x9")
    val docs = (1L to 60L).map { i =>
      val len = rnd.nextInt(40) // 0-length included
      (i, (1 to len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = DedupOps.winnowedFingerprints(
        docs.toDF("doc_id", "text"), "text", "doc_id", k, w)
      .as[(Long, Seq[Long])].collect()
      .map(r => r._1 -> r._2.toSet).toMap
    docs.foreach { case (id, raw) =>
      assert(got(id) == refWinnow(raw), s"doc $id")
    }
    // native expression == composed-Column reference, ELEMENT ORDER
    // INCLUDED (both are first-occurrence-ordered distinct minima)
    val composed = DedupOps.winnowedFingerprintsComposed(
        docs.toDF("doc_id", "text"), "text", "doc_id", k, w)
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2).toMap
    val native = DedupOps.winnowedFingerprints(
        docs.toDF("doc_id", "text"), "text", "doc_id", k, w)
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2).toMap
    assert(native == composed)
    // the winnowing guarantee on a planted pair: two docs sharing a
    // run of length >= w + k - 1 chars must share a fingerprint
    val shared = "qqqwwweeerrr" // 12 >= 4 + 6 - 1
    val pair = Seq((100L, s"abc $shared xyz"), (101L, s"zzz $shared mmm"))
    val fps = DedupOps.winnowedFingerprints(
        pair.toDF("doc_id", "text"), "text", "doc_id", k, w)
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
    assert(fps(100L).intersect(fps(101L)).nonEmpty)
  }

  test("winnowedOverlap matches brute-force pair statistics under the df cap") {
    import graft.llm.DedupOps
    val rnd = new Random(99)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "merge", "spark")
    val docs = (1L to 40L).map { i =>
      (i, (1 to 12 + rnd.nextInt(10))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // reference: fingerprint sets from the already-parity-checked
    // operator, then dumb set arithmetic with the df cap
    val fps = DedupOps.winnowedFingerprints(
        docs.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
    val dfCount = fps.values.toSeq.flatten.groupBy(identity).map {
      case (f, xs) => f -> xs.size
    }
    def want(maxDf: Int, minShared: Long) = {
      val rare = dfCount.filter(_._2 <= maxDf).keySet
      (for {
        a <- fps.keys.toSeq.sorted; b <- fps.keys.toSeq.sorted if a < b
        shared = fps(a).intersect(fps(b)).intersect(rare).size
        if shared >= minShared
      } yield (a, b) -> ((shared.toLong, math.rint(
        shared.toDouble / math.min(fps(a).size, fps(b).size) * 1e6) / 1e6)))
        .toMap
    }
    def got(maxDf: Int, minShared: Long) =
      DedupOps.winnowedOverlap(docs.toDF("doc_id", "text"), "text",
          "doc_id", maxDf = maxDf, minShared = minShared)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // uncapped: the tiny-vocab corpus shares plenty of fingerprints
    val wUncapped = want(1000, 3L)
    assert(wUncapped.nonEmpty && got(1000, 3L) == wUncapped)
    // a binding cap must agree too (here it prunes the hot boilerplate
    // fingerprints and most pairs with them)
    assert(got(8, 1L) == want(8, 1L))
  }
}
