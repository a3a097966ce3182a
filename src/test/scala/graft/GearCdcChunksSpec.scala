package graft

import graft.functions.GearCdcChunks
import graft.llm.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native gear-table rolling-hash CDC chunker: bit parity with the
  * composed stock-expression form on real documents, tiling and
  * edit-locality invariants, code-point handling for supplementary-
  * plane input, and null/empty edges. The gear table itself is pinned
  * against its derivation (md5("gear-j") prefix) so neither side can
  * drift from the documented constants.
  */
class GearCdcChunksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def collectChunks(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"chunk_idx", $"start_char", $"n_chars", $"chunk_md5")
      .as[(Long, Int, Int, Int, String)].collect().toSeq.sorted

  test("gear table derivation: G[j] = first 4 md5 bytes of gear-j, unsigned") {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 256).foreach { j =>
      md.reset()
      val d = md.digest(s"gear-$j".getBytes("UTF-8"))
      val expect = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      assert(GearCdcChunks.gearTable(j) == expect, s"gear[$j] drifted")
      assert(GearCdcChunks.gearTable(j) >= 0L &&
        GearCdcChunks.gearTable(j) < (1L << 32))
    }
  }

  test("bit parity with the composed stock-expression form on real documents") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where($"doc_id" < 60).select($"doc_id", $"text")
    val fused = collectChunks(
      TextOps.chunkContentDefinedGear(docs, "text", "doc_id", divisor = 64))
    val composed = collectChunks(
      TextOps.gearCdcChunksComposed(docs, "text", "doc_id", divisor = 64))
    assert(fused.nonEmpty && fused.exists(_._2 > 0),
      "no document produced more than one chunk — parity test vacuous")
    assert(fused == composed)
  }

  test("parity holds on supplementary-plane input (code points, not UTF-16 units)") {
    // 𝕊 (U+1D54A) is two UTF-16 units; a chunker counting units would
    // mis-place every later boundary and substring
    val base = "The quick brown fox jumps over the lazy dog. " * 8
    val docs = Seq(
      (1L, "𝕊𝕡𝕒𝕣𝕜 " + base),
      (2L, base + " π≈3.14159 — ünïcödé and 🚀🚀🚀 tails " + base),
      (3L, "𝄞" * 100)).toDF("doc_id", "text")
    val fused = collectChunks(
      TextOps.chunkContentDefinedGear(docs, "text", "doc_id", divisor = 16))
    val composed = collectChunks(
      TextOps.gearCdcChunksComposed(docs, "text", "doc_id", divisor = 16))
    assert(fused == composed)
    assert(fused.count(_._1 == 2L) > 1, "doc 2 should split at divisor 16")
  }

  test("chunks tile the document exactly and reassemble to it") {
    val text = ("All work and no play makes Jack a dull boy. " * 20) +
      "ünïcödé 𝕊 end."
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = collectChunks(
      TextOps.chunkContentDefinedGear(df, "text", "doc_id", divisor = 24))
    val cps = text.codePointCount(0, text.length)
    // contiguous 1-based starts covering [1, cps]
    assert(rows.head._3 == 1)
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 == a._3 + a._4, s"gap between $a and $b")
      case _ =>
    }
    assert(rows.map(_._4).sum == cps)
    // each chunk_md5 is the md5 of the substring it claims
    val cpOffsets = {
      val o = new Array[Int](cps + 1); var ci = 0; var i = 0
      while (ci < text.length) { o(i) = ci; ci += Character.charCount(text.codePointAt(ci)); i += 1 }
      o(cps) = text.length; o
    }
    rows.foreach { case (_, _, s, l, h) =>
      val sub = text.substring(cpOffsets(s - 1), cpOffsets(s - 1 + l))
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(h == hex, s"chunk at $s+$l hashes wrong")
    }
  }

  test("edit locality: an early insertion leaves all later chunks identical") {
    val body = ("Lorem ipsum dolor sit amet, consectetur adipiscing elit, " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna. ") * 12
    val edited = body.take(10) + "INSERTED-BYTES-" + body.drop(10)
    val df = Seq((1L, body), (2L, edited)).toDF("doc_id", "text")
    val rows = collectChunks(
      TextOps.chunkContentDefinedGear(df, "text", "doc_id", divisor = 48))
    val orig = rows.filter(_._1 == 1L).map(_._5)
    val ed = rows.filter(_._1 == 2L).map(_._5)
    assert(orig.size >= 4, s"need several chunks for locality, got ${orig.size}")
    // boundaries depend on ≤32 trailing code points: once past the edit
    // + one window, the chunk sequences re-synchronize — the shared
    // suffix must cover all but the first couple of chunks
    val common = orig.reverse.zip(ed.reverse).takeWhile { case (a, b) => a == b }.size
    assert(common >= orig.size - 3,
      s"edit broke locality: only $common of ${orig.size} tail chunks shared")
    assert(orig != ed, "edit changed nothing — vacuous")
  }

  test("short, empty and null inputs") {
    val df = Seq((1L, "short"), (2L, ""), (3L, null: String), (4L, "x" * 31))
      .toDF("doc_id", "text")
    val rows = collectChunks(
      TextOps.chunkContentDefinedGear(df, "text", "doc_id", divisor = 4))
    // < window ⇒ a single chunk; empty/null ⇒ no rows (l > 0 filter / null)
    assert(rows.map(_._1).toSet == Set(1L, 4L))
    assert(rows.count(_._1 == 1L) == 1 && rows.count(_._1 == 4L) == 1)
    val composed = collectChunks(
      TextOps.gearCdcChunksComposed(df, "text", "doc_id", divisor = 4))
    assert(rows == composed)
  }

  test("expected chunk length tracks the divisor") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where($"doc_id" < 200).select($"doc_id", $"text")
    val lens = TextOps.chunkContentDefinedGear(docs, "text", "doc_id", divisor = 64)
      .agg(avg($"n_chars")).as[Double].head()
    // geometric-ish with mean ≈ divisor; wide tolerance, just not degenerate
    assert(lens > 16 && lens < 512, s"mean chunk length $lens far from divisor 64")
  }
}
