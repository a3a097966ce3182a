package graft

import graft.llm.{CurationOps, DedupOps, MultimodalOps, SimOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the LLM-pipeline operators not covered by the DuckDB
  * oracle queries (SimHash, multimodal stubs) plus golden-value checks
  * (language ID on real multilingual sentences, dedup recall on
  * constructed near-dups).
  */
class LlmOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("withTextStats matches the individual column functions") {
    import graft.llm.TextOps
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def keyed(rows: Array[(Long, Int, Double, Double, Double)]) =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val staged = keyed(TextOps.withTextStats(docs, "text")
      .select($"doc_id", $"n_tokens", $"punct_ratio", $"stop_ratio", $"quality")
      .as[(Long, Int, Double, Double, Double)].collect())
    val inline = keyed(docs.select($"doc_id", TextOps.tokenCount($"text"),
      round(TextOps.punctRatio($"text"), 6), round(TextOps.stopwordRatio($"text"), 6),
      TextOps.qualityScore($"text"))
      .as[(Long, Int, Double, Double, Double)].collect())
    assert(staged == inline)
  }

  test("withLangId matches langId value-for-value on the documents table") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val staged = graft.llm.TextOps.withLangId(docs, "text", "lp")
      .select($"doc_id", $"lp").as[(Long, String)].collect().toMap
    val inline = docs.select($"doc_id", graft.llm.TextOps.langId($"text").as("lp"))
      .as[(Long, String)].collect().toMap
    assert(staged == inline, "staged language ID diverged from the column form")
  }

  // ---- language ID on real sentences (the documents table's lang labels
  //      are synthetic word-salad; these are actual language samples)
  test("langId identifies real multilingual sentences") {
    val samples = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("der Hund ist nicht mit der Katze auf das Sofa", "de"),
      ("le chat est dans la maison et les chiens pour une promenade", "fr"),
      ("el perro es un animal y los gatos en la casa por la noche", "es"),
      ("这是一个中文句子用于测试语言识别", "zh"))
    val out = samples.toDF("text", "expected")
      .withColumn("got", TextOps.langId($"text"))
      .select($"expected", $"got").as[(String, String)].collect()
    out.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("langId returns 'und' for non-language text") {
    val got = Seq("zzz qqq xxx 12345").toDF("text")
      .select(TextOps.langId($"text")).as[String].collect().head
    assert(got == "und")
  }

  // ---- simhash
  test("simhash is deterministic, 32-bit, and insensitive to token order") {
    val df = Seq(
      "the quick brown fox", "fox brown quick the", "completely different words here")
      .toDF("text").withColumn("h", DedupOps.simhash($"text"))
    val hs = df.select($"h").as[Long].collect()
    assert(hs(0) == hs(1))       // same token set → same fingerprint
    assert(hs(0) != hs(2))
    assert(hs.forall(h => h >= 0 && h < (1L << 32)))
  }

  test("simhash hamming distance is small for near-dups, larger for unrelated") {
    val base = "spark streaming merge window aggregate join filter scan batch vector " +
      "column table row key value hash sort group order query"
    val near = base + " extra"
    val far = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val df = Seq(base, near, far).toDF("text")
      .withColumn("h", DedupOps.simhash($"text"))
    val hs = df.select($"h").as[Long].collect()
    val dNear = java.lang.Long.bitCount(hs(0) ^ hs(1))
    val dFar = java.lang.Long.bitCount(hs(0) ^ hs(2))
    assert(dNear < dFar, s"near=$dNear far=$dFar")
    assert(dNear <= 6)
    // the Column-side hamming agrees with the JVM-side computation
    val viaCol = Seq((hs(0), hs(1))).toDF("a", "b")
      .select(DedupOps.hammingDistance($"a", $"b")).as[Int].collect().head
    assert(viaCol == dNear)
  }

  // ---- minhash recall on constructed near-dups
  test("minhashNearDups finds every constructed near-dup pair") {
    val docs = (0 until 20).map { i =>
      (i.toLong, s"document number $i with shared vocabulary alpha beta gamma " +
        s"delta epsilon zeta eta theta unique token u$i padding words here")
    }
    val withDups = docs ++ docs.take(10).map { case (id, t) => (id + 1000, t + " tail") }
    val pairs = DedupOps.minhashNearDups(
      withDups.toDF("doc_id", "text"), "text", "doc_id",
      shingleK = 6, numHashes = 12, bands = 4, threshold = 0.7)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, i + 1000L)), s"missed pair $i")
    }
  }

  test("exactDedup keeps the lowest id per duplicate group") {
    val df = Seq((5L, "aaa"), (1L, "aaa"), (3L, "bbb")).toDF("doc_id", "text")
    val out = DedupOps.exactDedup(df, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("duplicatedSpans merges overlapping, adjacent, and split spans") {
    val docs = Seq(
      (1L, "one two three four five six"),          // dup windows at 1,2
      (2L, "zzz one two three four qqq"),           // dup windows at 2,3
      (3L, "totally different words here indeed"),  // clean
      // 'gap gap gap' repeats within doc 4 only — distinct-docs
      // frequency must NOT mark it; two separated dup spans remain
      (4L, "one two three gap gap gap gap two three four"),
      (5L, "a b c d e f"),                          // dup windows at 1,4 (touching)
      (6L, "a b c x x x d e f")                     // dup windows at 1,7 (split)
    ).toDF("doc_id", "text")
    val out = DedupOps.duplicatedSpans(docs, "text", "doc_id",
      window = 3, minDocs = 2)
      .select($"doc_id", $"n_words", $"dup_words", $"n_spans")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 4L, 1L)))   // [1..4] merged from overlap
    assert(out(2L) == ((6L, 4L, 1L)))   // [2..5]
    assert(out(3L) == ((5L, 0L, 0L)))
    assert(out(4L) == ((10L, 6L, 2L)))  // [1..3] + [8..10]
    assert(out(5L) == ((6L, 6L, 1L)))   // [1..3]+[4..6] adjacent → one span
    assert(out(6L) == ((9L, 6L, 2L)))   // [1..3] + [7..9]
    // dup_frac is the covered-word share, rounded to 6 places
    val frac = DedupOps.duplicatedSpans(docs, "text", "doc_id", 3, 2)
      .where($"doc_id" === 1L).select($"dup_frac").as[Double].head()
    assert(frac == math.rint(4.0 / 6.0 * 1e6) / 1e6 ||
      math.abs(frac - 0.666667) < 1e-9)
  }

  test("duplicatedSpans matches a driver-side brute force on random corpora") {
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx")
    for (trial <- 1 to 3) {
      val w = 2 + rnd.nextInt(3) // window 2..4
      val docs: Map[Long, Vector[String]] = (1L to 25L).map(id =>
        id -> Vector.fill(rnd.nextInt(14))(alphabet(rnd.nextInt(alphabet.size)))).toMap
      // brute force: windows, cross-doc distinct frequency, covered set,
      // island count
      val wins = docs.map { case (id, ws) =>
        id -> (if (ws.size >= w)
          (1 to ws.size - w + 1).map(p => p -> ws.slice(p - 1, p - 1 + w))
        else Seq.empty) }
      val freq = wins.toSeq
        .flatMap { case (id, ps) => ps.map(p => p._2 -> id) }
        .groupBy(_._1).map { case (win, xs) => win -> xs.map(_._2).distinct.size }
      val want = docs.map { case (id, ws) =>
        val covered = wins(id).filter(p => freq(p._2) >= 2)
          .flatMap(p => p._1 until p._1 + w).toSet
        val spans = covered.toSeq.sorted
          .foldLeft((0, Int.MinValue)) { case ((cnt, prev), c) =>
            (if (c == prev + 1) cnt else cnt + 1, c) }._1
        id -> ((ws.size.toLong, covered.size.toLong, spans.toLong))
      }
      val df = docs.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = DedupOps.duplicatedSpans(df, "text", "doc_id", window = w, minDocs = 2)
        .select($"doc_id", $"n_words", $"dup_words", $"n_spans")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == want, s"trial $trial (window $w) diverged from brute force")
    }
  }

  test("removeDuplicatedSpans cuts exactly the covered words, keeps the rest") {
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "zzz one two three four qqq"),
      (3L, "totally different words here indeed")).toDF("doc_id", "text")
    val out = DedupOps.removeDuplicatedSpans(docs, "text", "doc_id",
      window = 3, minDocs = 2)
      .select($"doc_id", $"text", $"n_words", $"dup_words")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: covered [1..4] → "five six"; doc 2: covered [2..5] → "zzz qqq"
    assert(out(1L) == (("five six", 6L, 4L)))
    assert(out(2L) == (("zzz qqq", 6L, 4L)))
    assert(out(3L) == (("totally different words here indeed", 5L, 0L)))
    // counts agree with duplicatedSpans' coverage accounting
    val spans = DedupOps.duplicatedSpans(docs, "text", "doc_id", 3, 2)
      .select($"doc_id", $"dup_words").as[(Long, Long)].collect().toMap
    assert(out.view.mapValues(_._3).toMap == spans)
  }

  test("duplicatedSpans: docs shorter than the window yield zero rows counted") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = DedupOps.duplicatedSpans(docs, "text", "doc_id",
      window = 3, minDocs = 2)
      .select($"doc_id", $"n_words", $"dup_words", $"n_spans")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(1L -> ((2L, 0L, 0L)), 2L -> ((2L, 0L, 0L))))
  }

  test("withBigramSurprisal: hand-computed conditional bits on a tiny corpus") {
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val out = TextOps.withBigramSurprisal(docs, "text", "doc_id")
      .select($"doc_id", $"n_bigrams", $"bigram_surprisal")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // C(a,b)=2 C(b,a)=1 C(a,c)=1; heads: a=3, b=1
    // doc1: (-log2(2/3) + -log2(1/1) + -log2(1/3))/3 = 0.723308
    // doc2: -log2(2/3) = 0.584963
    assert(out(1L) == ((3L, Some(0.723308))))
    assert(out(2L) == ((1L, Some(0.584963))))
    assert(out(3L) == ((0L, None)))
  }

  test("tfidfKeywords: hand-computed weights and tie-break on a tiny corpus") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c c c")).toDF("doc_id", "text")
    val out = TextOps.tfidfKeywords(docs, "text", "doc_id", k = 2)
      .select($"doc_id", $"token", $"score", $"rank")
      .as[(Long, String, Double, Int)].collect().toSet
    // N=3; df: a=1, b=2, c=2 → idf a=log2(3)=1.584963, b=c=log2(1.5)=0.584963
    assert(out == Set(
      (1L, "a", 3.169925, 1), (1L, "b", 0.584963, 2),
      (2L, "b", 0.584963, 1), (2L, "c", 0.584963, 2), // exact tie → token order
      (3L, "c", 1.754888, 1)))
  }

  test("chunkWords: stride, overlap, short final chunk, empty docs") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "a b"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextOps.chunkWords(docs, "text", "doc_id",
      chunkWords = 4, overlapWords = 1)
      .select($"doc_id", $"chunk_idx", $"start_word", $"n_chunk_words")
      .as[(Long, Int, Int, Int)].collect().toSet
    // stride 3: starts 1,4,7,10 — consecutive chunks share one word;
    // the final chunk is the single trailing word
    assert(out == Set(
      (1L, 0, 1, 4), (1L, 1, 4, 4), (1L, 2, 7, 4), (1L, 3, 10, 1),
      (2L, 0, 1, 2)))
    // chunk hashes are the md5 of the space-joined slice
    val h = TextOps.chunkWords(docs, "text", "doc_id", 4, 1)
      .where($"doc_id" === 1L && $"chunk_idx" === 1).select($"chunk_md5")
      .as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("w4 w5 w6 w7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h == want)
  }

  test("incrementalExactDedup drops corpus dups, dedups within batch") {
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"),             // exact dup of corpus doc 1 → dropped
      (11L, "gamma"), (12L, "gamma"), // within-batch dup → 11 survives
      (13L, "delta")              // fresh → survives
    ).toDF("doc_id", "text")
    val out = DedupOps.incrementalExactDedup(batch, corpus, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
  }

  test("incrementalExactDedup: empty corpus reduces to within-batch dedup") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((7L, "x"), (3L, "x"), (4L, "y")).toDF("doc_id", "text")
    val out = DedupOps.incrementalExactDedup(batch, corpus, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(3L, 4L))
  }

  test("incrementalExactDedup: shuffled fallback path matches broadcast path") {
    val corpus = (0 until 50).map(i => (i.toLong, s"corpus text $i")).toDF("doc_id", "text")
    val batch = (0 until 50).map(i => (i + 100L,
      if (i % 2 == 0) s"corpus text $i" else s"new text $i")).toDF("doc_id", "text")
    val bc = DedupOps.incrementalExactDedup(batch, corpus, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    val sh = DedupOps.incrementalExactDedup(batch, corpus, "text", "doc_id",
      broadcastCeiling = 0L)
      .select($"doc_id").as[Long].collect().toSet
    assert(bc == sh && bc == (1 until 50 by 2).map(_ + 100L).toSet)
  }

  test("incrementalNearDups pairs new near-dups with their corpus source only") {
    val corpus = (0 until 20).map { i =>
      (i.toLong, s"document number $i with shared vocabulary alpha beta gamma " +
        s"delta epsilon zeta eta theta unique token u$i padding words here")
    }.toDF("doc_id", "text")
    val batch = ((0 until 10).map { i =>
      (i + 1000L, s"document number $i with shared vocabulary alpha beta gamma " +
        s"delta epsilon zeta eta theta unique token u$i padding words here tail")
    } ++ Seq((2000L, "entirely different content about sailing ships and maritime navigation"))
    ).toDF("doc_id", "text")
    val pairs = DedupOps.incrementalNearDups(batch, corpus, "text", "doc_id",
      shingleK = 6, numHashes = 12, bands = 4, threshold = 0.7)
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    (0 until 10).foreach { i =>
      assert(pairs.contains((i + 1000L, i.toLong)), s"missed incremental pair $i")
    }
    assert(!pairs.exists(_._1 == 2000L), "unrelated new doc paired with corpus")
  }

  test("incrementalNearDups with a prebuilt band index matches inline derivation") {
    val corpus = (0 until 20).map { i =>
      (i.toLong, s"document number $i with shared vocabulary alpha beta gamma " +
        s"delta epsilon zeta eta theta unique token u$i padding words here")
    }.toDF("doc_id", "text")
    val batch = (0 until 5).map { i =>
      (i + 1000L, s"document number $i with shared vocabulary alpha beta gamma " +
        s"delta epsilon zeta eta theta unique token u$i padding words here tail")
    }.toDF("doc_id", "text")
    val index = DedupOps.nearDupBandIndex(corpus, "text", "doc_id",
      shingleK = 6, numHashes = 12, bands = 4)
    val viaIndex = DedupOps.incrementalNearDups(batch, corpus, "text", "doc_id",
      shingleK = 6, numHashes = 12, bands = 4, threshold = 0.7,
      corpusBands = Some(index))
      .select($"new_id", $"corpus_id", round($"jaccard", 9)).collect().toSet
    val inline = DedupOps.incrementalNearDups(batch, corpus, "text", "doc_id",
      shingleK = 6, numHashes = 12, bands = 4, threshold = 0.7)
      .select($"new_id", $"corpus_id", round($"jaccard", 9)).collect().toSet
    assert(viaIndex == inline)
  }

  // ---- multimodal stubs: schema + determinism
  private def payloads = Seq(
    (1L, Array.fill[Byte](1024)(7)), (2L, Array.fill[Byte](2048)(9)))
    .toDF("id", "payload")

  test("mediaMeta carries kind/bytes/content address without touching payload") {
    val out = MultimodalOps.withMedia(payloads, "payload", "image")
    val t = out.schema("media_meta").dataType.asInstanceOf[StructType]
    assert(t.fieldNames.toSeq == Seq("kind", "n_bytes", "content_md5"))
    val r = out.where($"id" === 1).select($"media_meta.n_bytes").as[Long].collect().head
    assert(r == 1024L)
  }

  test("decodeImageStub is deterministic and bounded") {
    val out = payloads.select(MultimodalOps.decodeImageStub($"payload").as("d"))
      .select($"d.width", $"d.height", $"d.channels").as[(Int, Int, Int)].collect()
    assert(out.toSeq == payloads.select(MultimodalOps.decodeImageStub($"payload").as("d"))
      .select($"d.width", $"d.height", $"d.channels").as[(Int, Int, Int)].collect().toSeq)
    out.foreach { case (w, h, c) =>
      assert(w >= 64 && w < 1984 && h >= 64 && h < 1144 && c == 3)
    }
  }

  test("extractFeaturesStub yields fixed-dim floats in [-1,1]") {
    val feats = payloads.select(MultimodalOps.extractFeaturesStub($"payload", 8).as("f"))
      .as[Array[Float]].collect()
    assert(feats.forall(_.length == 8))
    assert(feats.flatten.forall(v => v >= -1.0f && v <= 1.0f))
    assert(feats(0).toSeq != feats(1).toSeq) // different payloads → different features
  }

  test("decodeImagesBatched: bounded batches, bit-parity with the column stub") {
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{DecodedImage, MediaRow}
    val rows = (0L until 150L).map(i =>
      MediaRow(i, Array.fill((i % 7 + 1).toInt)(i.toByte)))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow]).repartition(2)
    // record observed batch sizes through a wrapping decoder (an
    // accumulator — a closure-captured collection would mutate only the
    // executor-side copy)
    val seen = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val batched = MultimodalOps.decodeImagesBatched(ds, batchSize = 16,
      decoder = ps => { seen.add(ps.size); MultimodalOps.stubBatchDecoder(ps) })
      .collect().map(d => d.id -> ((d.width, d.height, d.channels))).toMap
    import scala.jdk.CollectionConverters._
    val sizes = seen.value.asScala.toSeq
    assert(sizes.forall(_ <= 16), s"oversized batch: $sizes")
    assert(sizes.map(_.toLong).sum == 150L)
    // parity with the column-expression stub
    val viaColumn = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow])
      .select($"id", MultimodalOps.decodeImageStub($"payload").as("d"))
      .select($"id", $"d.width", $"d.height", $"d.channels")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(batched == viaColumn, "batched decoder diverged from column stub")
  }

  test("sampleFrames slices n evenly spaced byte ranges") {
    val out = payloads.where($"id" === 2)
      .select(MultimodalOps.sampleFrames($"payload", 4, frameBytes = 256).as("fr"))
      .select(explode($"fr").as("f"))
      .select($"f.frame_no".cast("long"), $"f.offset".cast("long"),
        length($"f.bytes").as("len"))
      .as[(Long, Long, Int)].collect()
    assert(out.length == 4)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.forall(_._3 == 256))
    assert(out.map(_._2).distinct.length == 4) // distinct offsets
  }

  test("imageDims parses hand-written PNG/GIF/BMP header bytes (not our encoders)") {
    // byte arrays written from the format specs directly, so this pins
    // the PARSER against the real layouts independently of encode*Header
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // sig
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 1, 0x2C, // width 300 BE
      0, 0, 0, 0xC8, // height 200 BE
      8, 6, 0, 0, 0)
    val gif = b('G', 'I', 'F', '8', '9', 'a',
      0x2C, 0x01, // width 300 LE
      0xC8, 0x00, // height 200 LE
      0xF7, 0, 0)
    val bmp = b('B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 0x36, 0, 0, 0,
      40, 0, 0, 0,
      0x2C, 0x01, 0, 0, // width 300 LE32
      0xC8, 0x00, 0, 0) // height 200 LE32
    val junk = b(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val parsed = Seq(("png", png), ("gif", gif), ("bmp", bmp), ("??", junk))
      .toDF("label", "payload")
      .select($"label", MultimodalOps.imageDims($"payload").as("d"))
      .select($"label", $"d.format", $"d.width", $"d.height")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(parsed("png") == (("png", Some(300), Some(200))))
    assert(parsed("gif") == (("gif", Some(300), Some(200))))
    assert(parsed("bmp") == (("bmp", Some(300), Some(200))))
    assert(parsed("??") == (("unknown", None, None)))
  }

  test("withJpegMeta walks hand-written marker segments (not our encoder)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // SOI, APP0 (len 16), COM (len 7: "hello"), SOF0 h=200 w=300
    val jpeg = b(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xFF, 0xFE, 0x00, 0x07, 'h', 'e', 'l', 'l', 'o',
      0xFF, 0xC0, 0x00, 0x11, 8, 0x00, 0xC8, 0x01, 0x2C, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    // progressive SOF2 directly after SOI, no other segments
    val sof2 = b(0xFF, 0xD8,
      0xFF, 0xC2, 0x00, 0x11, 8, 0x00, 0x64, 0x00, 0x96, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    // corrupt: a segment length pointing at a non-FF byte freezes safely
    val corrupt = b(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x04, 1, 2, 9, 9, 9, 9)
    val junk = b(1, 2, 3, 4, 5, 6, 7, 8)
    val parsed = graft.llm.MultimodalOps.withJpegMeta(
      Seq(("jpeg", jpeg), ("sof2", sof2), ("corrupt", corrupt), ("junk", junk))
        .toDF("label", "payload"), "payload")
      .select($"label", $"format", $"width", $"height")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(parsed("jpeg") == (("jpeg", Some(300), Some(200))))
    assert(parsed("sof2") == (("jpeg", Some(150), Some(100))))
    assert(parsed("corrupt") == (("unknown", None, None)))
    assert(parsed("junk") == (("unknown", None, None)))
    // encoder round trip at boundary dims, with and without a comment
    val rt = graft.llm.MultimodalOps.withJpegMeta(
      Seq((1, 65535, 1, "c"), (16, 16, 0, ""), (300, 200, 1, "a longer comment"))
        .toDF("w", "h", "n", "c")
        .select($"w", $"h", graft.llm.MultimodalOps.encodeJpegHeader(
          $"w".cast("int"), $"h".cast("int"), $"c").as("payload")),
      "payload")
      .select($"w", $"h", $"format", $"width", $"height")
      .as[(Int, Int, String, Int, Int)].collect()
    rt.foreach { case (w, h, f, pw, ph) =>
      assert(f == "jpeg" && pw == w && ph == h, s"round trip broke at ${(w, h)}") }
  }

  test("tiffMeta parses hand-written II and MM files (not our encoder)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // little-endian, IFD directly at 8, 2 entries: width 300, height 200
    val ii = b('I', 'I', 42, 0, 8, 0, 0, 0,
      2, 0,
      0x00, 0x01, 4, 0, 1, 0, 0, 0, 0x2C, 0x01, 0, 0, // tag 256 LE, LONG, 300
      0x01, 0x01, 4, 0, 1, 0, 0, 0, 0xC8, 0x00, 0, 0, // tag 257, 200
      0, 0, 0, 0)
    // big-endian, IFD offset 12 (4 pad bytes), width-only IFD → unknown
    val mmNoHeight = b('M', 'M', 0, 42, 0, 0, 0, 12, 9, 9, 9, 9,
      0, 1,
      0x01, 0x00, 0, 4, 0, 0, 0, 1, 0, 0, 0x01, 0x2C,
      0, 0, 0, 0)
    // big-endian complete, entries after a leading tag-254 entry
    val mm = b('M', 'M', 0, 42, 0, 0, 0, 8,
      0, 3,
      0x00, 0xFE, 0, 4, 0, 0, 0, 1, 0, 0, 0, 0,
      0x01, 0x00, 0, 4, 0, 0, 0, 1, 0, 0, 0x01, 0x2C,
      0x01, 0x01, 0, 4, 0, 0, 0, 1, 0, 0, 0x00, 0xC8,
      0, 0, 0, 0)
    val wrongMagic = b('I', 'I', 43, 0, 8, 0, 0, 0)
    val parsed = Seq(("ii", ii), ("mmNoH", mmNoHeight), ("mm", mm),
        ("bad", wrongMagic))
      .toDF("label", "payload")
      .select($"label", graft.llm.MultimodalOps.tiffMeta($"payload").as("t"))
      .select($"label", $"t.format", $"t.byte_order", $"t.width", $"t.height")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getInt(4)))).toMap
    assert(parsed("ii") == (("tiff", "II", Some(300), Some(200))))
    assert(parsed("mm") == (("tiff", "MM", Some(300), Some(200))))
    assert(parsed("mmNoH")._1 == "unknown", "width without height is not enough")
    assert(parsed("bad")._1 == "unknown", "magic 43 must be rejected")
  }

  test("native TiffMeta == composed form on encoder, truncated, and random payloads") {
    import graft.llm.MultimodalOps
    val rnd = new scala.util.Random(42)
    // encoder-built valid TIFFs across both endiannesses, pads, extras
    val valid = (1 to 40).map { i =>
      (s"v$i",
        (i % 4096 + 64, i * 5 % 2160 + 64, i % 2 == 0, i % 16, i % 3 == 0))
    }
    val validDf = valid.toDF("label", "p")
      .select($"label", MultimodalOps.encodeTiffHeader(
        $"p._1", $"p._2", $"p._3", $"p._4", $"p._5").as("payload"))
    // random garbage + truncations of a valid header + II/MM prefixes
    // with corrupt bodies: the null/out-of-bounds/wrap paths
    val fuzz = (1 to 60).map { i =>
      val bytes = i % 3 match {
        case 0 => Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte)
        case 1 =>
          val b = Array[Byte]('I', 'I', 42, 0) ++
            Array.fill(rnd.nextInt(30))(rnd.nextInt(256).toByte)
          b.take(4 + rnd.nextInt(b.length - 3))
        case _ => Array[Byte]('M', 'M', 0, 42) ++
          Array.fill(rnd.nextInt(12))(rnd.nextInt(256).toByte)
      }
      (s"f$i", bytes)
    }
    val fuzzDf = fuzz.toDF("label", "payload")
    Seq(validDf, fuzzDf).foreach { df =>
      val both = df.select($"label",
          MultimodalOps.tiffMeta($"payload").as("n"),
          MultimodalOps.tiffMetaComposed($"payload").as("c"))
        .collect()
      both.foreach { r =>
        assert(r.get(1) == r.get(2),
          s"${r.getString(0)}: native ${r.get(1)} != composed ${r.get(2)}")
      }
    }
  }

  test("webpMeta parses hand-written variants; masks scale bits; rejects bad sync") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val riff = Seq[Int]('R', 'I', 'F', 'F', 22, 0, 0, 0, 'W', 'E', 'B', 'P')
    // VP8 lossy, w=300 with BOTH scale bits set (0x812C), h=200: the
    // parser must mask to the low 14 bits
    val lossy = b(riff ++ Seq[Int]('V', 'P', '8', ' ', 10, 0, 0, 0,
      0x00, 0x00, 0x00, 0x9D, 0x01, 0x2A, 0x2C, 0x81, 0xC8, 0x00): _*)
    // VP8L lossless, w=17 h=22 → (16 | 21<<14) = 344080 = 0x00054010 LE
    val lossless = b(riff ++ Seq[Int]('V', 'P', '8', 'L', 5, 0, 0, 0,
      0x2F, 0x10, 0x40, 0x05, 0x00): _*)
    // VP8X extended, canvas 300x200 → u24 fields 299 / 199
    val extended = b(riff ++ Seq[Int]('V', 'P', '8', 'X', 10, 0, 0, 0,
      0x00, 0, 0, 0, 0x2B, 0x01, 0x00, 0xC7, 0x00, 0x00): _*)
    // lossy with a corrupted sync code → webp but undecodable dims
    val badSync = b(riff ++ Seq[Int]('V', 'P', '8', ' ', 10, 0, 0, 0,
      0x00, 0x00, 0x00, 0x9D, 0x01, 0x2B, 0x2C, 0x01, 0xC8, 0x00): _*)
    val junk = b(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    val parsed = Seq(("lossy", lossy), ("lossless", lossless),
        ("extended", extended), ("badSync", badSync), ("junk", junk))
      .toDF("label", "payload")
      .select($"label", graft.llm.MultimodalOps.webpMeta($"payload").as("m"))
      .select($"label", $"m.format", $"m.variant", $"m.width", $"m.height")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getInt(4)))).toMap
    assert(parsed("lossy") == (("webp", Some("lossy"), Some(300), Some(200))))
    assert(parsed("lossless") == (("webp", Some("lossless"), Some(17), Some(22))))
    assert(parsed("extended") == (("webp", Some("extended"), Some(300), Some(200))))
    assert(parsed("badSync") == (("webp", None, None, None)))
    assert(parsed("junk")._1 == "unknown")
  }

  test("mp3Meta parses hand-written frame headers; rejects free/forbidden indices") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // 128 kbps (idx 9), 44100 Hz (idx 0), no padding:
    // byte3 = 1001 00 0 0 = 0x90; frame = 144*128000/44100 = 417
    val f128 = b(0xFF, 0xFB, 0x90, 0x00)
    // 320 kbps (idx 14), 32000 Hz (idx 2), padding:
    // byte3 = 1110 10 1 0 = 0xEA; frame = 144*320000/32000 + 1 = 1441
    val f320 = b(0xFF, 0xFB, 0xEA, 0x00)
    val free = b(0xFF, 0xFB, 0x00, 0x00)      // bitrate idx 0 = "free"
    val forbidden = b(0xFF, 0xFB, 0xF0, 0x00) // bitrate idx 15
    val reservedSr = b(0xFF, 0xFB, 0x9C, 0x00) // samplerate idx 3
    val mpeg2 = b(0xFF, 0xF3, 0x90, 0x00)     // version bits != MPEG-1
    val parsed = Seq(("f128", f128), ("f320", f320), ("free", free),
        ("forbidden", forbidden), ("rsr", reservedSr), ("mpeg2", mpeg2))
      .toDF("label", "payload")
      .select($"label", graft.llm.MultimodalOps.mp3Meta($"payload").as("m"))
      .select($"label", $"m.format", $"m.bitrate_kbps", $"m.frame_bytes")
      .collect().map(r => r.getString(0) ->
        (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(parsed("f128") == (("mp3", Some(128), Some(417))))
    assert(parsed("f320") == (("mp3", Some(320), Some(1441))))
    assert(parsed("free")._1 == "unknown")
    assert(parsed("forbidden")._1 == "unknown")
    assert(parsed("rsr")._1 == "unknown")
    assert(parsed("mpeg2")._1 == "unknown")
  }

  test("gzipMeta: hand-written member parses; trailer anchors at the end") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // magic, deflate, no flags, mtime 0x5F000001 LE, xfl, os=unix(3),
    // 5 body bytes, crc 0x11223344 LE, isize 1000 LE
    val gz = b(0x1F, 0x8B, 8, 0, 0x01, 0x00, 0x00, 0x5F, 0, 3,
      1, 2, 3, 4, 5,
      0x44, 0x33, 0x22, 0x11, 0xE8, 0x03, 0, 0)
    val junk = b(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18)
    val tooShort = b(0x1F, 0x8B, 8, 0, 0, 0, 0, 0, 0, 3)
    val parsed = Seq(("gz", gz), ("junk", junk), ("short", tooShort))
      .toDF("label", "payload")
      .select($"label", graft.llm.MultimodalOps.gzipMeta($"payload").as("g"))
      .select($"label", $"g.format", $"g.mtime", $"g.crc32", $"g.isize", $"g.os")
      .collect().map(r => r.getString(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(parsed("gz") == (("gzip", 0x5F000001L, 0x11223344L, 1000L)))
    assert(parsed("junk")._1 == "unknown")
    assert(parsed("short")._1 == "unknown", "member without a trailer rejected")
  }

  test("encode*Header bytes round-trip through imageDims at boundary dims") {
    val dims = Seq((1, 1), (65535, 65535), (1920, 1080), (256, 255))
    val df = dims.toDF("w", "h")
    def rt(enc: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): Seq[(Int, Int)] =
      df.select(MultimodalOps.imageDims(enc($"w", $"h")).as("d"))
        .select($"d.width", $"d.height").as[(Int, Int)].collect().toSeq
    assert(rt(MultimodalOps.encodePngHeader) == dims)
    assert(rt(MultimodalOps.encodeGifHeader) == dims)
    assert(rt(MultimodalOps.encodeBmpHeader) == dims)
  }

  test("videoMeta: mp4 round trip, truncated payload and junk go to nulls") {
    val df = Seq((600, 123456, 640, 360), (90000, 1, 1, 1), (1000, 7200000, 3840, 2160))
      .toDF("ts", "dur", "w", "h")
    val rt = df.select(MultimodalOps.videoMeta(
        MultimodalOps.encodeMp4Header($"ts", $"dur", $"w", $"h")).as("v"))
      .select($"v.format", $"v.brand", $"v.timescale", $"v.duration_ticks",
        $"v.width", $"v.height")
      .as[(String, String, Int, Long, Int, Int)].collect().toSeq
    assert(rt == Seq(("mp4", "isom", 600, 123456L, 640, 360),
      ("mp4", "isom", 90000, 1L, 1, 1), ("mp4", "isom", 1000, 7200000L, 3840, 2160)))
    // ftyp magic present but no moov boxes within the scan bound → nulls
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val noBoxes = b(0, 0, 0, 0x10, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm', 0, 0, 2, 0)
    val junk = b(1, 2, 3, 4, 5, 6, 7, 8)
    val bad = Seq(("nb", noBoxes), ("junk", junk)).toDF("label", "payload")
      .select($"label", MultimodalOps.videoMeta($"payload").as("v"))
      .select($"label", $"v.format", $"v.width").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.isNullAt(2)))).toMap
    assert(bad("nb") == (("unknown", true)))
    assert(bad("junk") == (("unknown", true)))
  }

  test("curriculumOrder: stages are difficulty-monotone, balanced, ties never straddle") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = CurationOps.curriculumOrder(docs, "doc_id", "n_chars", numStages = 4)
      .select($"doc_id", $"n_chars", $"stage").as[(Long, Long, Int)].collect()
    assert(out.length == docs.count())
    // monotone: every row of stage s has difficulty <= every row of s+1
    val byStage = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byStage.keySet == Set(0, 1, 2, 3))
    (0 to 2).foreach { s =>
      assert(byStage(s).max <= byStage(s + 1).min ||
        // a shared boundary value must be entirely in ONE stage — so a
        // max==min overlap can only mean distinct values, never a tie
        byStage(s).max < byStage(s + 1).min,
        s"stage $s difficulty overlaps stage ${s + 1}")
    }
    // a difficulty value maps to exactly one stage
    val valueStages = out.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
    assert(valueStages.values.forall(_.size == 1), "a tie straddled a stage cut")
    // roughly balanced: each stage within 2x of the ideal quarter
    val sizes = out.groupBy(_._3).view.mapValues(_.size).toMap
    val ideal = out.length / 4.0
    sizes.foreach { case (s, n) =>
      assert(n > ideal / 2 && n < ideal * 2, s"stage $s badly unbalanced: $n vs $ideal")
    }
    // deterministic
    val again = CurationOps.curriculumOrder(docs, "doc_id", "n_chars", 4)
      .select($"doc_id", $"stage", $"order_key").as[(Long, Int, String)].collect().toSet
    val first = CurationOps.curriculumOrder(docs, "doc_id", "n_chars", 4)
      .select($"doc_id", $"stage", $"order_key").as[(Long, Int, String)].collect().toSet
    assert(again == first)
  }

  test("chunkContentDefined: insertion-stable boundaries, coverage, short/empty docs") {
    import graft.llm.TextOps
    // deterministic pseudo-text, long enough for ~30 chunks at divisor 64
    val rnd = new scala.util.Random(7)
    val text = (1 to 400).map(_ => "abcdefghij"(rnd.nextInt(10))).grouped(5)
      .map(_.mkString).mkString(" ")
    val docs = Seq((1L, text), (2L, "short"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.chunkContentDefined(docs, "text", "doc_id")
      .select($"doc_id", $"chunk_idx", $"start_char", $"n_chars", $"chunk_md5")
      .as[(Long, Int, Int, Int, String)].collect()
    // coverage: doc 1's chunks tile the text exactly, in order
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.head._3 == 1)
    assert(d1.map(_._4).sum == text.length)
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._4, "chunks must tile contiguously")
    case _ => }
    // a doc shorter than the window is one whole-document chunk
    assert(out.filter(_._1 == 2L).toSeq.map(t => (t._3, t._4)) == Seq((1, 5)))
    // an empty doc produces no chunks
    assert(!out.exists(_._1 == 3L))
    // THE CDC property: prepend an edit — every chunk after the first
    // post-edit boundary keeps its identity (fixed windows all shift)
    val edited = Seq((9L, "EDIT. " + text)).toDF("doc_id", "text")
    val editedMd5 = TextOps.chunkContentDefined(edited, "text", "doc_id")
      .select($"chunk_md5").as[String].collect().toSet
    val origMd5 = d1.map(_._5).toSet
    val shared = (origMd5 intersect editedMd5).size
    info(s"chunks shared across the edit: $shared/${origMd5.size}")
    assert(shared >= origMd5.size - 3,
      s"CDC boundaries did not re-sync after the edit: $shared/${origMd5.size}")
  }

  test("videoMeta: a byte-straddling mvhd pattern is not a box (alignment guard)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // valid ftyp, then payload bytes whose HEX contains "6d766864"
    // ('mvhd') starting at an EVEN 1-based char position — the pattern
    // spans two unrelated bytes (0x06,0xd7,0x66,0x86,0x40) and must read
    // as "no box" (nulls), not decode garbage timescale/dimensions
    val straddle = b(0, 0, 0, 0x10, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm',
      0, 0, 2, 0,
      0x06, 0xD7, 0x66, 0x86, 0x40, // hex ...06d7668640... (misaligned mvhd)
      0x07, 0x46, 0xB6, 0x86, 0x40) // hex ...0746b6868640... (misaligned tkhd)
    val out = Seq(Tuple1(straddle)).toDF("payload")
      .select(graft.llm.MultimodalOps.videoMeta($"payload").as("v"))
      .select($"v.format", $"v.timescale").collect().head
    assert(out.getString(0) == "unknown" && out.isNullAt(1))
  }

  test("simhashNearDups blocks find perturbed copies, skip unrelated docs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where($"doc_id" < 40)
    val perturbed = docs.select($"doc_id", $"text")
      .unionByName(docs.select(($"doc_id" + 1000000).as("doc_id"),
        concat($"text", lit(" tiny suffix")).as("text")))
    val rows = graft.llm.DedupOps.simhashNearDups(perturbed, "text", "doc_id")
      .select($"id1", $"id2", $"hamming").as[(Long, Long, Int)].collect()
    val pairs = rows.map(r => (r._1, r._2)).toSet
    val copies = pairs.filter { case (a, b) => b == a + 1000000 }
    // short docs legitimately drift >3 bits from two extra tokens; the
    // floor pins blocking recall, not simhash sensitivity (measured 28/40)
    assert(copies.size >= 25, s"multi-index missed perturbed copies: ${copies.size}/40")
    // contract: every reported pair is ordered and within the distance cap
    rows.foreach { case (a, b, h) => assert(a < b && h >= 0 && h <= 3) }
  }

  test("embeddingNearDups agrees with brute-force filtering on found pairs") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .where($"vec_id" < 120)
    val found = graft.llm.SimOps.embeddingNearDups(emb, threshold = 0.3)
      .select($"id1", $"id2", $"sim").collect()
    assert(found.nonEmpty)
    // every reported pair really has cosine >= threshold with id1 < id2
    found.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("semanticNearDups pairs are ordered, thresholded, and cell-local") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .where($"vec_id" < 120)
    val found = SimOps.semanticNearDups(emb, threshold = 0.3, numCells = 8)
      .select($"id1", $"id2", $"sim").collect()
    assert(found.nonEmpty)
    found.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("semanticDedup collapses exact vector copies to the lowest id") {
    // copies of the first 30 vectors under high ids: an identical vector
    // computes identical cell sims, so each copy lands in its original's
    // cell, pairs at cosine 1.0, and must lose to the lower original id
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .where($"vec_id" < 150)
    val copies = emb.where($"vec_id" < 30)
      .select(($"vec_id" + 5000).as("vec_id"), $"embedding", $"label")
    val withCopies = emb.unionByName(copies)
    val survivors = SimOps.semanticDedup(withCopies, threshold = 0.99, numCells = 8)
      .select($"vec_id").as[Long].collect().toSet
    (5000L until 5030L).foreach(id =>
      assert(!survivors.contains(id), s"planted copy $id survived"))
    // nothing outside a near-dup cluster may be dropped: originals with
    // no >= 0.99 neighbor all survive
    val pairs = SimOps.semanticNearDups(withCopies, threshold = 0.99, numCells = 8)
      .select($"id1", $"id2").as[(Long, Long)].collect()
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val all = withCopies.select($"vec_id").as[Long].collect().toSet
    assert((all -- paired -- survivors).isEmpty, "unpaired rows must survive")
  }

  test("rpTopK: exhaustive shortlist equals brute force; 32-dim sketch keeps recall") {
    import graft.llm.SimOps
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where($"vec_id" % 37 === 0)
    val k = 10
    val exact = SimOps.bruteForceTopK(emb, queries, k)
      .select($"query_id", $"nbr_id", $"sim", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    // candidates >= corpus size: the shortlist cut is a no-op, so the
    // re-ranked result must equal brute force EXACTLY (same sims, ranks)
    val n = emb.count().toInt
    val exhaustive = SimOps.rpTopK(emb, queries, k, dims = 8, candidates = n)
      .select($"query_id", $"nbr_id", $"sim", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(exhaustive == exact,
      "rpTopK with an exhaustive shortlist must reproduce bruteForceTopK")
    // a real 64-candidate shortlist in the 32-dim sketch: recall floor
    // (measured 0.657 when introduced — these near-random synthetic
    // embeddings have tiny neighbor margins, the hardest case for any
    // sketch; cf. lshTopK's 0.650 at the same 32 bits of sign info)
    val approx = SimOps.rpTopK(emb, queries, k, dims = 32, candidates = 64)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(r => (r._1, r._2))
    val recall = (exactPairs intersect approx).size.toDouble / exactPairs.size
    info(f"rp recall@$k at 32 dims / 64 candidates: $recall%.3f")
    assert(recall >= 0.6, f"RP recall degraded: $recall%.3f < 0.6")
    intercept[IllegalArgumentException](SimOps.rpTopK(emb, queries, 5, dims = 0))
    intercept[IllegalArgumentException](
      SimOps.rpTopK(emb, queries, k = 5, candidates = 3))
  }

  test("lshTopK recall@10 vs brute force is >= 0.6 at 4 planes (sf0.01)") {
    // pins the quality of the (planes, tables) knobs: changing either
    // must be measured against this recall floor, not eyeballed.
    // Measured 0.650 at 4 planes x 8 tables when introduced; a single
    // table scores 0.079 — OR-amplification is what makes e2 usable.
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where($"vec_id" % 37 === 0)
    val k = 10
    val exact = SimOps.bruteForceTopK(emb, queries, k)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val approx = SimOps.lshTopK(emb, queries, k, numPlanes = 4)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@$k at 4 planes: $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.6, f"ANN recall degraded: $recall%.3f < 0.6")
  }

  test("ivfTopK recall@10 vs brute force at 16 cells / 4 probes (sf0.01)") {
    // pins the quality of the (numCells, nProbe) knobs the same way the
    // LSH floor pins (planes, tables): change them against this number.
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where($"vec_id" % 37 === 0)
    val k = 10
    val exact = SimOps.bruteForceTopK(emb, queries, k)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    def recallAt(nProbe: Int): Double = {
      val approx = SimOps.ivfTopK(emb, queries, k, numCells = 16, nProbe = nProbe)
        .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val r4 = recallAt(4)
    val r8 = recallAt(8)
    info(f"recall@$k: nProbe=4 $r4%.3f, nProbe=8 $r8%.3f (${exact.size} exact pairs)")
    // measured 0.521 / 0.757 when introduced
    assert(r4 >= 0.45, f"IVF recall degraded: $r4%.3f < 0.45")
    assert(r8 >= r4, f"more probes must not lose recall: $r8%.3f < $r4%.3f")
    assert(r8 >= 0.65, f"IVF recall at 8 probes degraded: $r8%.3f < 0.65")
  }

  test("pqTopK recall@10 vs brute force at 8x16 codebook, 40 candidates (sf0.01)") {
    // pins the (numSubspaces, numCentroids, candidates) quality knobs
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where($"vec_id" % 37 === 0)
    val k = 10
    val exact = SimOps.bruteForceTopK(emb, queries, k)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    def recallAt(cand: Int): Double = {
      val approx = SimOps.pqTopK(emb, queries, k, numSubspaces = 8,
        numCentroids = 16, candidates = cand)
        .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val r40 = recallAt(40)
    val r80 = recallAt(80)
    info(f"recall@$k: candidates=40 $r40%.3f, candidates=80 $r80%.3f (${exact.size} exact pairs)")
    // measured 0.443 / 0.650 when introduced (deterministic lowest-id
    // codebook — a trained codebook would lift both)
    assert(r40 >= 0.4, f"PQ recall degraded: $r40%.3f < 0.4")
    assert(r80 >= r40, f"more candidates must not lose recall: $r80%.3f < $r40%.3f")
    assert(r80 >= 0.6, f"PQ recall at 80 candidates degraded: $r80%.3f < 0.6")
  }

  test("ivfPqTopK: all-cells probe equals pqTopK; pruned recall holds (sf0.01)") {
    // identity: probing every cell makes the IVF layer a no-op — every
    // corpus row is PQ-scored for every query, which IS pqTopK at the
    // same codebook and candidate budget. Pins the composition.
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where($"vec_id" % 37 === 0)
    val k = 10
    val full = SimOps.ivfPqTopK(emb, queries, k, numCells = 16, nProbe = 16,
      numSubspaces = 8, numCentroids = 16, candidates = 40)
      .select($"query_id", $"nbr_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    val pq = SimOps.pqTopK(emb, queries, k, numSubspaces = 8,
      numCentroids = 16, candidates = 40)
      .select($"query_id", $"nbr_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(full == pq,
      s"all-cells IVF-PQ must equal plain PQ: ${(full diff pq).take(5)} / ${(pq diff full).take(5)}")

    // pruned serving: recall vs brute force. The two approximations
    // compound (cell pruning ∩ PQ candidate ranking), so the floor sits
    // under both e3's 0.52 and e4's 0.44 — measured 0.39 at 4/16 probes
    // + 40 candidates when introduced
    val exact = SimOps.bruteForceTopK(emb, queries, k)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val approx = SimOps.ivfPqTopK(emb, queries, k, numCells = 16, nProbe = 4,
      numSubspaces = 8, numCentroids = 16, candidates = 40)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"ivfpq recall@$k at 4/16 probes, 40 candidates: $recall%.3f")
    assert(recall >= 0.3, f"IVF-PQ recall degraded: $recall%.3f < 0.3")
    intercept[IllegalArgumentException](
      SimOps.ivfPqTopK(emb, queries, k, nProbe = 17))
    intercept[IllegalArgumentException](
      SimOps.ivfPqTopK(emb, queries, k, candidates = 3))
  }

  test("mmrRerank: near-dup candidate displaced by diverse one; lambda=1 is sim order") {
    // candidate a (id 1) leads; b (id 2) is a near-duplicate of a
    // (cos ≈ 0.9998) with almost its relevance; c (id 3) is diverse
    // (cos(c,a) ≈ 0.72) at lower relevance
    val cand = Seq(
      (7L, 1L, Array(0.95, 0.312, 0.0), 0.95),
      (7L, 2L, Array(0.95, 0.310, 0.02), 0.94),
      (7L, 3L, Array(0.90, -0.436, 0.0), 0.90))
      .toDF("query_id", "nbr_id", "nbr_vec", "sim")
    def ids(lambda: Double) =
      SimOps.mmrRerank(cand, k = 2, lambda = lambda)
        .orderBy($"rank").select($"nbr_id").as[Long].collect().toSeq
    // λ=1: pure relevance → the duplicate clump wins both slots
    assert(ids(1.0) == Seq(1L, 2L), s"lambda=1 must be plain sim order: ${ids(1.0)}")
    // λ=0.5: b's redundancy against the already-selected a sinks it;
    // the diverse c takes slot 2
    assert(ids(0.5) == Seq(1L, 3L), s"diversity not enforced: ${ids(0.5)}")
    // rank/mmr well-formed; k beyond the pool truncates cleanly
    val out = SimOps.mmrRerank(cand, k = 10, lambda = 0.5)
      .orderBy($"rank").as[(Long, Long, Double, Double, Int)].collect()
    assert(out.length == 3 && out.map(_._5).toSeq == Seq(1, 2, 3))
    assert(out.head._4 == 0.5 * 0.95, "first pick's mmr is λ·sim (no redundancy yet)")
    intercept[IllegalArgumentException](SimOps.mmrRerank(cand, 0, 0.5))
    intercept[IllegalArgumentException](SimOps.mmrRerank(cand, 2, 1.5))
  }

  test("sqTopK recall@10 vs brute force at 256 levels, 40 candidates (sf0.01)") {
    // SQ8 keeps per-dimension resolution, so its approximate ranking is
    // far closer to exact than PQ's 16-centroid codebook at the same
    // candidate budget — the floor pins that advantage
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where($"vec_id" % 37 === 0)
    val k = 10
    val exact = SimOps.bruteForceTopK(emb, queries, k)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val approx = SimOps.sqTopK(emb, queries, k, candidates = 40)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@$k at 256 levels / 40 candidates: $recall%.3f")
    assert(recall >= 0.9, f"SQ recall degraded: $recall%.3f < 0.9")
  }

  test("sqTopK is exact when the candidate pool covers the corpus") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where($"vec_id" % 100 === 0)
    val n = emb.count().toInt
    val exact = SimOps.bruteForceTopK(emb, queries, 5)
      .select($"query_id", $"nbr_id", round($"sim", 9), $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val sq = SimOps.sqTopK(emb, queries, 5, candidates = n)
      .select($"query_id", $"nbr_id", round($"sim", 9), $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(sq == exact)
  }

  test("withUnigramSurprisal: hand-computed bits on a tiny corpus") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.withUnigramSurprisal(docs, "text", "doc_id")
      .select($"doc_id", $"n_tokens", $"surprisal_bits")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // counts: a=2, b=2, c=1, total=5
    // doc 1: all tokens have p=0.4 → -log2(0.4) = 1.321928
    // doc 2: mean of -log2(0.4), -log2(0.2) = 1.821928
    assert(out(1L) == ((3L, Some(1.321928))))
    assert(out(2L) == ((2L, Some(1.821928))))
    assert(out(3L) == ((0L, None)))
  }

  test("interleaveShards: totality, dense positions, stride proportions, determinism") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val weights = Map("src0" -> 0.75, "src1" -> 0.25)
    def run() = CurationOps.interleaveShards(docs, "source", weights,
      numShards = 2, keyCol = "doc_id", salt = "t")
      .select($"doc_id", $"source", $"shard", $"shard_pos")
      .as[(Long, String, Int, Int)].collect().toSeq
    val out = run()
    // only weighted sources survive, each exactly once
    val expectedIds = docs.where($"source".isin("src0", "src1"))
      .select($"doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == expectedIds && out.size == expectedIds.size)
    // dense 1..n positions per shard
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted == (1 to rows.size).toList)
    }
    // stride scheduling: every prefix of every shard holds sources in
    // ~weight proportion (|#src0 - 0.75·n| bounded), until src0 runs out
    out.groupBy(_._3).foreach { case (shard, rows) =>
      val bySrc = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val ordered = rows.sortBy(_._4).map(_._2)
      val full = math.min(bySrc("src0") / 0.75, bySrc("src1") / 0.25).toInt
      for (n <- 4 to full by 4) {
        val a = ordered.take(n).count(_ == "src0")
        assert(math.abs(a - 0.75 * n) <= 2,
          s"shard $shard prefix $n: src0 count $a vs expected ${0.75 * n}")
      }
    }
    // deterministic across runs
    assert(run() == out)
  }

  test("weightedSample: higher tiers overrepresented, deterministic, exact n") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .withColumn("tier", (col("doc_id") % 3).cast("int")) // tiers 0/1/2 equally sized
    def run() = CurationOps.weightedSample(docs, n = 120, tierCol = "tier",
      maxTier = 2, keyCol = "doc_id", salt = "t")
      .select($"doc_id", $"tier").as[(Long, Int)].collect().toSeq
    val out = run()
    assert(out.size == 120 && out.map(_._1).distinct.size == 120)
    val byTier = out.groupBy(_._2).view.mapValues(_.size).toMap
    // weights 1:2:4 over equal-size tiers — inclusion must increase
    // with tier (loose bound; the draw is deterministic, not flaky)
    assert(byTier(2) > byTier(1) && byTier(1) > byTier(0),
      s"tier inclusion not weight-ordered: $byTier")
    assert(run() == out)
  }

  test("rankMetrics: hand-computed recall/MRR/NDCG incl. zero-hit and short-truth") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def l2(x: Double) = math.log(x) / math.log(2)
    val truth = Seq( // q1 truth: 10,20,30; q2: 7,8,9; q3 short truth: 5 only
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 7L, 1), (2L, 8L, 2), (2L, 9L, 3),
      (3L, 5L, 1)).toDF("query_id", "nbr_id", "rank")
    val cand = Seq( // q1 finds 20@1, 99@2, 10@3; q2 finds none; q3 finds 5@2
      (1L, 20L, 1), (1L, 99L, 2), (1L, 10L, 3),
      (2L, 55L, 1), (2L, 56L, 2),
      (3L, 66L, 1), (3L, 5L, 2)).toDF("query_id", "nbr_id", "rank")
    val got = SimOps.rankMetrics(truth, cand, k = 3)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // q1: 2/3 recall; first hit at rank 1 → MRR 1; DCG = 1/log2(2)+1/log2(4),
    // IDCG = 1/log2(2)+1/log2(3)+1/log2(4)
    val q1Ndcg = r6((1 / l2(2) + 1 / l2(4)) / (1 / l2(2) + 1 / l2(3) + 1 / l2(4)))
    assert(got(1L) == ((1L, 3L, 2L, r6(2.0 / 3), 1.0, q1Ndcg)))
    assert(got(2L) == ((2L, 3L, 0L, 0.0, 0.0, 0.0)))
    // q3: 1/1 recall, hit at rank 2 → MRR 0.5, NDCG = (1/log2(3)) / (1/log2(2))
    assert(got(3L) == ((3L, 1L, 1L, 1.0, 0.5, r6((1 / l2(3)) / (1 / l2(2))))))
  }

  test("bpePairStats: known corpus yields the textbook first merge") {
    // 5x "hug", 2x "pug", 1x "bug": pair "u g" total 8 dominates;
    // "g </w>" also 8 — tie broken by pair string ("g </w>" < "u g")
    val corpus = ("hug " * 5) + ("pug " * 2) + "bug"
    val got = graft.llm.TextOps.bpePairStats(
        Seq((1L, corpus.trim)).toDF("id", "text"), "text", k = 10)
      .select($"pair", $"total", $"n_words", $"rank")
      .as[(String, Long, Long, Int)].collect()
    val byPair = got.map(r => r._1 -> r).toMap
    assert(byPair("u g") == (("u g", 8L, 3L, 2)))
    assert(byPair("g </w>") == (("g </w>", 8L, 3L, 1)))
    assert(byPair("h u") == (("h u", 5L, 1L, 3)))
    assert(byPair("p u")._2 == 2L && byPair("b u")._2 == 1L)
    // single-char words only contribute their end-of-word pair
    val single = graft.llm.TextOps.bpePairStats(
      Seq((1L, "a a b")).toDF("id", "text"), "text", k = 10)
      .select($"pair", $"total").as[(String, Long)].collect().toMap
    assert(single == Map("a </w>" -> 2L, "b </w>" -> 1L))
  }

  test("lshParams: inflection points match hand math; ties favor recall") {
    // numHashes=12, tau=0.7: b=3,r=4 -> (1/3)^(1/4) ~ 0.760 beats
    // b=4,r=3 -> 0.630 (|0.060| < |0.070|)
    val (b, r, t) = DedupOps.lshParams(0.7, 12)
    assert(b == 3 && r == 4 && math.abs(t - math.pow(1.0 / 3, 0.25)) < 1e-12)
    // low threshold wants many bands; high threshold wants long rows
    assert(DedupOps.lshParams(0.1, 12)._1 == 12)
    assert(DedupOps.lshParams(0.95, 12)._1 == 1 || DedupOps.lshParams(0.95, 12)._2 >= 6)
    // 16 hashes at 0.5: 8x2's inflection 0.354 (dist .146) beats 4x4's
    // 0.707 (dist .207)
    assert(DedupOps.lshParams(0.5, 16) == ((8, 2, math.sqrt(1.0 / 8))))
  }

  test("containmentDups: fragment flags with high containment despite low Jaccard") {
    val source = (1 to 60).map(i => s"tok$i").mkString(" ")
    val fragment = (1 to 15).map(i => s"tok$i").mkString(" ")
    val unrelated = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, source), (2L, fragment), (3L, unrelated))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentDups(df, "text", "doc_id",
        n = 4, threshold = 0.8, maxShingleDocs = 50)
      .as[(Long, Long, Long, Double)].collect()
    // fragment (12 shingles) fully inside source (57): containment 1.0;
    // its Jaccard is 12/57 ≈ 0.21 — below any useful near-dup threshold
    assert(got.toSeq == Seq((2L, 1L, 12L, 1.0)))
    // hot-shingle cap: shingles shared by > maxShingleDocs docs cannot
    // generate candidates — 4 clones of one text with cap 3 yield none
    val clones = (1L to 4L).map(i => (i, source)).toDF("doc_id", "text")
    assert(DedupOps.containmentDups(clones, "text", "doc_id",
      n = 4, threshold = 0.8, maxShingleDocs = 3).isEmpty)
    // but at cap >= 4 every clone pair scores containment 1.0
    assert(DedupOps.containmentDups(clones, "text", "doc_id",
      n = 4, threshold = 0.8, maxShingleDocs = 4).count() == 6)
  }

  test("pmiCollocations: fixed pair outranks common-word pair at equal frequency") {
    // "new york" always co-occurs (PMI high); "the cat"/"the dog" halve
    // the association of "the" with either tail despite equal pair counts
    val doc = ("new york " * 6) + ("the cat " * 3) + ("the dog " * 3)
    val got = graft.llm.TextOps.pmiCollocations(
        Seq((1L, doc.trim)).toDF("id", "text"), "text", minCount = 3, k = 10)
      .select($"bigram", $"cxy", $"pmi", $"rank")
      .as[(String, Long, Double, Int)].collect()
    val byName = got.map(r => r._1 -> r).toMap
    assert(byName("new york")._4 < byName("the cat")._4,
      "exclusive pair must outrank the shared-head pair")
    assert(byName("the cat")._3 == byName("the dog")._3,
      "symmetric pairs must score identically")
    // rare pairs below minCount never appear ("york the" occurs 5x at
    // the seam, "cat the"/"dog the" fewer) — check support floor held
    assert(got.forall(_._2 >= 3))
  }

  test("stripHtml: blocks drop whole, entities decode after tag strip") {
    val html = "<html><head><title>T</title><script>if(1<2){a();}</script></head>" +
      "<body><nav><a href=\"/\">home</a></nav><p>A &amp; B</p>" +
      "<p>C&nbsp;&lt;tag&gt;</p><footer>f &copy; x</footer></body></html>"
    val got = graft.llm.TextOps.withHtmlStats(
      Seq((1L, html)).toDF("id", "html"), "html")
      .select($"clean_text", $"n_links", $"n_tags")
      .as[(String, Int, Int)].head()
    // head (title+script, incl. the embedded '<'), nav, footer all gone;
    // &lt;tag&gt; decodes AFTER tag stripping so it survives as text
    assert(got._1 == "A & B C <tag>")
    assert(got._2 == 1)
    // unknown entity passes through; empty input stays empty
    val passThrough = graft.llm.TextOps.withHtmlStats(
      Seq((1L, "<p>x &bogus; y</p>"), (2L, "")).toDF("id", "html"), "html")
      .select($"id", $"clean_text").as[(Long, String)].collect().toMap
    assert(passThrough(1L) == "x &bogus; y" && passThrough(2L) == "")
  }

  test("withPerplexityBuckets: per-lang terciles, head = lowest surprisal") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = graft.llm.TextOps.withPerplexityBuckets(docs, "text", "doc_id", "lang")
      .select($"doc_id", $"lang", $"surprisal_bits", $"ppl_rank", $"ppl_bucket")
      .as[(Long, String, Double, Int, String)].collect()
    assert(got.length == docs.count())
    val byLang = got.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val n = rows.length
      // tercile sizes: head <= middle + 1 shapes; exact integer cut
      val heads = rows.filter(_._5 == "head")
      val mids = rows.filter(_._5 == "middle")
      val tails = rows.filter(_._5 == "tail")
      assert(heads.length == n / 3, s"$lang head size")
      assert(heads.length + mids.length == 2 * n / 3, s"$lang head+middle size")
      assert(tails.length == n - 2 * n / 3, s"$lang tail size")
      // bucket order follows surprisal order: max(head) <= min(middle) etc.
      if (heads.nonEmpty && mids.nonEmpty)
        assert(heads.map(_._3).max <= mids.map(_._3).min + 1e-12)
      if (mids.nonEmpty && tails.nonEmpty)
        assert(mids.map(_._3).max <= tails.map(_._3).min + 1e-12)
      // ranks are a permutation of 1..n
      assert(rows.map(_._4).sorted.toSeq == (1 to n))
    }
  }

  test("noisyCounts: deterministic release, salt changes the draw, noise is real") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(salt: String) = CurationOps.noisyCounts(docs, "source", 0.5, salt)
      .select($"group", $"n", $"released").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq
    val a = run("rel1")
    assert(a == run("rel1"), "same salt must reproduce the release")
    val b = run("rel2")
    assert(a.map(_._1) == b.map(_._1) && a != b, "new salt must redraw noise")
    // every group actually carries noise, and Laplace(2) noise at 20
    // groups stays within a loose 40-unit envelope (p ~ 2e-9 per draw)
    a.foreach { case (g, n, rel) =>
      val noise = rel - n
      assert(noise != 0.0, s"$g released the exact count")
      assert(math.abs(noise) < 40, s"$g noise $noise implausibly large") }
  }

  test("unimaxBudget: hand-computed waterfill, budget conservation, epoch cap") {
    // domains: a=100, b=200, c=1000 tokens; maxEpochs=2 → caps 200/400/2000
    // budget 1000: a full (200*3=600<=1000), b full (400*2=800<=800),
    // c partial → (1000-600)/1 = 400 tokens, 0.4 epochs
    val rows = (1 to 100).map(i => ("a", 1)) ++ (1 to 100).map(i => ("b", 2)) ++
      (1 to 100).map(i => ("c", 10))
    val df = rows.toDF("domain", "toks")
    val got = CurationOps.unimaxBudget(df, "domain", "toks",
        totalBudget = 1000L, maxEpochs = 2L)
      .select($"domain", $"n_tokens", $"cap", $"takes_full", $"allocated", $"epochs")
      .as[(String, Long, Long, Boolean, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 100L, 200L, true, 200.0, 2.0)))
    assert(got("b") == (("b", 200L, 400L, true, 400.0, 2.0)))
    assert(got("c") == (("c", 1000L, 2000L, false, 400.0, 0.4)))
    // conservation: allocations sum to the budget when demand exceeds it
    assert(got.values.map(_._5).sum == 1000.0)
    // budget above total capacity: everyone runs at the epoch cap
    val rich = CurationOps.unimaxBudget(df, "domain", "toks",
        totalBudget = 100000L, maxEpochs = 2L)
      .select($"domain", $"takes_full", $"epochs")
      .as[(String, Boolean, Double)].collect()
    assert(rich.forall(r => r._2 && r._3 == 2.0))
    // no domain ever exceeds maxEpochs for any budget
    val mid = CurationOps.unimaxBudget(df, "domain", "toks",
        totalBudget = 2500L, maxEpochs = 2L)
      .select($"epochs").as[Double].collect()
    assert(mid.forall(_ <= 2.0))
  }

  test("dsirSample: deterministic, exact n, target-planted docs outrank the pool") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    // plant raw-pool docs that ARE target-domain text (copies of src0
    // docs under fresh ids): DSIR must pull them in — their hashed
    // unigram profile is exactly the target distribution
    val target = docs.where($"source" === "src0")
    val planted = target.limit(20)
      .withColumn("doc_id", $"doc_id" + 5000000L)
      .withColumn("source", lit("srcP"))
    val pool = docs.where($"source" =!= "src0").unionByName(planted)
    def run(salt: String) = CurationOps.dsirSample(pool, target, n = 60,
      buckets = 64, salt = salt)
      .select($"doc_id", $"rank").as[(Long, Int)].collect().toSeq
    val out = run("dsir")
    assert(out.size == 60 && out.map(_._1).distinct.size == 60)
    assert(run("dsir") == out, "dsirSample must be deterministic")
    assert(run("other") != out, "salt must yield an independent draw")
    // the importance-weight signal itself: a doc whose tokens ARE a
    // target sample has per-token expectation ≈ KL(target‖raw) > 0,
    // while genuine raw docs sit at ≈ −KL(raw‖target) < 0 — so the
    // planted clones' mean weight-per-token must separate from the
    // rest of the pool. (Selection-share would be a weaker assert: on
    // this near-shared-vocabulary synthetic corpus the weights span
    // ~±2 bits, so the Gumbel — std ≈1.28 — keeps per-doc inclusion
    // stochastic exactly as the paper's resampling intends.)
    val all = CurationOps.dsirSample(pool, target, n = 10000,
      buckets = 64, salt = "dsir")
      .select($"doc_id", $"n_tokens", $"weight")
      .as[(Long, Long, Double)].collect()
    val (planted2, rest) = all.partition(_._1 >= 5000000L)
    def perTok(xs: Array[(Long, Long, Double)]) =
      xs.map(x => x._3 / x._2).sum / xs.size
    val (pMean, rMean) = (perTok(planted2), perTok(rest))
    info(f"per-token weight: planted clones $pMean%.4f vs raw pool $rMean%.4f")
    assert(planted2.length == 20)
    assert(pMean > rMean,
      f"target-clones not up-weighted: $pMean%.4f <= $rMean%.4f")
    // (no sign assertion on pMean: the clones are part of the raw-pool
    // model themselves, and 64-bucket hashing + Laplace smoothing shift
    // the absolute level — the SEPARATION is the estimator's signal)
  }

  test("exportShards: one ordered JSONL file per shard, manifest matches the files") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"lang")
    val sharded = CurationOps.shuffleShards(docs, numShards = 4,
      keyCol = "doc_id", salt = "x")
    val out = java.nio.file.Files.createTempDirectory("exp-test").toString + "/sh"
    val manifest = CurationOps.exportShards(sharded, out, keyCol = "doc_id")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/_manifest.json")))
    val expected = sharded.select($"shard", $"shard_pos", $"doc_id")
      .as[(Int, Int, Long)].collect().groupBy(_._1)
    assert(manifest.keySet == expected.keySet)
    expected.foreach { case (shard, rows) =>
      val dir = new org.apache.hadoop.fs.Path(s"$out/shard=$shard")
      val files = fs.listStatus(dir).toSeq.filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      assert(files.size == 1, s"shard $shard: expected one data file, got ${files.size}")
      // line order in the file must equal shard_pos order
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(files.head.getPath), "UTF-8"))
      val ids = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map(l => "\"doc_id\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong)
        .toList
      in.close()
      val want = rows.sortBy(_._2).map(_._3).toList
      assert(ids == want, s"shard $shard: file order diverges from shard_pos")
      assert(manifest(shard)._1 == rows.size.toLong)
      // manifest digest = two-level: md5 per 8192-position block of the
      // comma-joined keys, then md5 over the block digests in order
      def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val blockDigests = rows.sortBy(_._2)
        .grouped(graft.llm.CurationOps.DigestBlock).toSeq
        .map(blk => md5hex(blk.map(_._3).mkString("\u0001")))
      assert(manifest(shard)._2 == md5hex(blockDigests.mkString("\u0001")))
    }
  }

  test("pqTopK is exact when the candidate pool covers the corpus") {
    // with candidates >= corpus size the rerank sees every vector, so
    // PQ must reproduce brute force exactly regardless of code quality
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where($"vec_id" % 100 === 0)
    val n = emb.count().toInt
    val exact = SimOps.bruteForceTopK(emb, queries, 5)
      .select($"query_id", $"nbr_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val pq = SimOps.pqTopK(emb, queries, 5, candidates = n)
      .select($"query_id", $"nbr_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(pq == exact)
  }

  test("ivfTopK finds the same-direction neighbors within a probed cell") {
    // 3 direction-orthogonal clusters (cosine across ≈ 0, within ≈ 1);
    // ids interleaved so the first 3 (the deterministic centroids) span
    // one vector of each cluster. Probing 1 cell must surface exactly
    // the query's cluster-mates.
    def vec(dir: Int, i: Int): Array[Double] = {
      val a = Array.fill(8)(0.0)
      a(dir) = 1.0
      a((dir + 1) % 8) = 0.01 * (i + 1)
      a
    }
    val df = Seq(
      (0L, vec(0, 0)), (1L, vec(3, 0)), (2L, vec(6, 0)),
      (10L, vec(0, 1)), (11L, vec(3, 1)), (12L, vec(6, 1)),
      (20L, vec(0, 2)), (21L, vec(3, 2)), (22L, vec(6, 2)))
      .toDF("vec_id", "embedding")
    val out = SimOps.ivfTopK(df, df.where($"vec_id" === 10), k = 2,
      numCells = 3, nProbe = 1)
      .select($"nbr_id").as[Long].collect().toSet
    // same-direction members of query 10's cluster: 0 and 20
    assert(out == Set(0L, 20L), s"got $out")
  }

  test("clusterPairs labels transitive components with the min reachable id") {
    // two components: a chain 2-5-9-7 (pairs alone would keep 2 copies)
    // and a pair 20-21; every member must label with the component min
    val pairs = Seq((2L, 5L), (5L, 9L), (20L, 21L), (7L, 9L)).toDF("id1", "id2")
    val out = DedupOps.clusterPairs(pairs)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 2L), (5L, 2L), (9L, 2L), (7L, 2L),
      (20L, 20L), (21L, 20L)))
  }

  test("clusterPairs matches a driver-side union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      // reference: union-find attaching the larger root under the
      // smaller, so every tree's root is its component minimum
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x
        else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => (v, find(v.toInt).toLong)).toSet
      val got = DedupOps.clusterPairs(edges.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"trial $trial: $got vs $expected")
    }
  }

  test("clusterPairs throws rather than return unconverged clusters") {
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("id1", "id2")
    intercept[IllegalStateException](
      DedupOps.clusterPairs(chain, maxIters = 1).collect())
  }

  test("nearDupSurvivors keeps cluster canonicals plus unpaired docs") {
    val docs = Seq((1L, "solo"), (2L, "b"), (5L, "b'"), (9L, "b''"), (42L, "x"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 9L)).toDF("id1", "id2")
    val out = DedupOps.nearDupSurvivors(docs, pairs, "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    // 5 and 9 collapse into 2's cluster; 1 and 42 never paired
    assert(out == Set(1L, 2L, 42L))
  }

  test("withRepetitionStats: goldens for repeated lines, words, bigrams") {
    val docs = Seq(
      (1L, "nav bar\nreal content here\nnav bar\nnav bar"), // 4 lines, 2 distinct
      (2L, "buy now buy now buy now"),                      // stuffed bigrams
      (3L, "all distinct words here"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.withRepetitionStats(docs, "text")
      .select($"doc_id", $"dup_line_ratio", $"dup_word_ratio", $"top_bigram_frac")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._1 == 0.5, s"2 dup lines of 4: $out")
    // "buy now buy now buy now": 6 tokens 2 distinct; bigram "buy now"
    // occurs 3 of 5 times
    assert(out(2L) == ((0.0, round6(1 - 2.0 / 6), round6(3.0 / 5))), s"$out")
    assert(out(3L) == ((0.0, 0.0, round6(1.0 / 3))), s"$out")
    assert(out(4L) == ((0.0, 0.0, 0.0)), s"empty doc must be all zeros: $out")
  }

  test("dupWordRatio column matches withRepetitionStats bit-exactly on real docs and edges") {
    // the single-stat fast path must never drift from the full form
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where($"doc_id" < 150).select($"doc_id", $"text")
    val edges = Seq(
      (9001L, "buy now buy now buy now"),
      (9002L, ""), (9003L, null: String),
      (9004L, "!!! ??? ..."), // normalizes to empty
      (9005L, "one"), (9006L, "a a a a a a"))
      .toDF("doc_id", "text")
    val docs = real.unionByName(edges)
    val rows = TextOps.withRepetitionStats(docs, "text")
      .select($"doc_id", $"dup_word_ratio",
        TextOps.dupWordRatio($"text").as("fast"))
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val full = if (r.isNullAt(1)) null else r.getDouble(1)
      val fast = if (r.isNullAt(2)) null else r.getDouble(2)
      assert(full == fast, s"doc ${r.getLong(0)}: full=$full fast=$fast")
    }
  }

  test("scrubPii masks emails, IPs, and phones; counts agree") {
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.org or 10.0.42.7, call +1 (415) 555-0199 now"),
      (2L, "no pii at all here"))
      .toDF("doc_id", "text")
    val scrubbed = docs.select($"doc_id", TextOps.scrubPii($"text").as("s"))
      .as[(Long, String)].collect().toMap
    assert(scrubbed(1L) == "mail <EMAIL> or <IP>, call <PHONE> now", scrubbed)
    assert(scrubbed(2L) == "no pii at all here")
    val counts = TextOps.withPiiCounts(docs, "text")
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(counts(1L) == ((1L, 1L, 1L)) && counts(2L) == ((0L, 0L, 0L)), counts)
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hashSplit partitions every row exactly once; samples nest by fraction") {
    import graft.llm.CurationOps
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    val splits = CurationOps.hashSplit(docs, 4, "doc_id", "v9")
      .groupBy($"split").count().as[(Int, Long)].collect().toMap
    assert(splits.keySet.subsetOf(Set(0, 1, 2, 3)) && splits.values.sum == n)
    // Bernoulli membership is monotone in the fraction: the 10% sample
    // is exactly a subset of the 30% sample under the same salt
    val s10 = CurationOps.hashSample(docs, 0.10, "doc_id", "s9")
      .select($"doc_id").as[Long].collect().toSet
    val s30 = CurationOps.hashSample(docs, 0.30, "doc_id", "s9")
      .select($"doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s30) && s10.nonEmpty && s30.size > s10.size)
    // and a different salt draws a genuinely different sample
    val other = CurationOps.hashSample(docs, 0.10, "doc_id", "s8")
      .select($"doc_id").as[Long].collect().toSet
    assert(other != s10)
  }

  test("stratifiedSample caps every stratum; smaller budgets nest in larger") {
    import graft.llm.CurationOps
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val k20 = CurationOps.stratifiedSample(docs, "lang", 20, "doc_id", "s7")
    val perLang = k20.groupBy($"lang").count().as[(String, Long)].collect()
    assert(perLang.forall(_._2 <= 20), s"stratum over budget: ${perLang.toSeq}")
    val ids5 = CurationOps.stratifiedSample(docs, "lang", 5, "doc_id", "s7")
      .select($"doc_id").as[Long].collect().toSet
    val ids20 = k20.select($"doc_id").as[Long].collect().toSet
    assert(ids5.subsetOf(ids20), "shrinking the budget must pick a subset")
  }

  test("shuffleShards is a deterministic permutation with dense per-shard positions") {
    import graft.llm.CurationOps
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    val out = CurationOps.shuffleShards(docs, 8, "doc_id", "e1")
      .select($"doc_id", $"shard", $"shard_pos")
      .as[(Long, Int, Int)].collect()
    // totality: every row assigned exactly once, shards in range
    assert(out.length == n && out.map(_._1).distinct.length == n)
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // per-shard positions are dense 1..count — the export order is a
    // well-defined permutation when shards are concatenated
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $shard positions not dense")
    }
    // deterministic: a second run reproduces the identical assignment
    val again = CurationOps.shuffleShards(docs, 8, "doc_id", "e1")
      .select($"doc_id", $"shard", $"shard_pos")
      .as[(Long, Int, Int)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a different salt (epoch) yields a different permutation
    val ep2 = CurationOps.shuffleShards(docs, 8, "doc_id", "e2")
      .select($"doc_id", $"shard", $"shard_pos")
      .as[(Long, Int, Int)].collect()
    assert(ep2.sortBy(_._1).toSeq != out.sortBy(_._1).toSeq)
  }

  test("ngramContamination: planted copy scores 1.0, short docs score 0.0") {
    import graft.llm.CurationOps
    val train = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val test = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // leaked
      (2L, "one two three four five six seven eight nine ten"),         // clean
      (3L, "too short"))                                                // < n words
      .toDF("doc_id", "text")
    val out = CurationOps.ngramContamination(train, test, "text", "doc_id", n = 5)
      .select($"id", $"n_overlap", $"overlap_ratio")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._2 == 1.0, s"leaked doc must score 1.0: $out")
    assert(out(2L) == ((0L, 0.0)), s"clean doc must score 0: $out")
    assert(out(3L) == ((0L, 0.0)), s"short doc must score 0: $out")
  }

  test("ivfTopK is NaN-safe: zero-norm vectors rank last, never first") {
    // a zero-norm vector makes cosine 0/0 = NaN; unguarded, NaN sorts
    // highest and would both hijack the argmax cell assignment and rank
    // first in every top-k. It must instead land deterministically
    // (sim -1, first cell) and only surface after all real neighbors.
    def vec(dir: Int): Array[Double] = {
      val a = Array.fill(4)(0.0); a(dir) = 1.0; a
    }
    val df = Seq(
      (0L, vec(0)), (1L, vec(1)),
      (10L, vec(0)), (11L, vec(1)),
      (99L, Array.fill(4)(0.0))) // degenerate row
      .toDF("vec_id", "embedding")
    val out = SimOps.ivfTopK(df, df.where($"vec_id" === 10), k = 4,
      numCells = 2, nProbe = 2)
      .orderBy($"rank")
      .select($"nbr_id", $"sim").as[(Long, Double)].collect()
    assert(out.forall(!_._2.isNaN), s"NaN sim leaked: ${out.toSeq}")
    assert(out.head._1 == 0L, s"true neighbor not ranked first: ${out.toSeq}")
    assert(out.last._1 == 99L && out.last._2 == -1.0,
      s"zero-norm vector must rank last at sim -1: ${out.toSeq}")
  }

  // ---- cosine + LSH sanity beyond the oracle
  test("lshTopK finds the exact nearest neighbor when buckets align") {
    // vectors clustered so near-identical pairs share every hyperplane sign
    val base = (0 until 16).map(_.toFloat / 16).toArray
    val near = base.map(v => v + 0.001f)
    val anti = base.map(v => -v)
    val df = Seq((0L, base), (1L, near), (2L, anti)).toDF("vec_id", "embedding")
    val out = SimOps.lshTopK(df, df.where($"vec_id" === 0), k = 1, numPlanes = 2)
      .select($"nbr_id").as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }

  // ---- quality-weighted survivors
  test("qualitySurvivors keeps the best-quality member per cluster, ties to lowest id") {
    // cluster {1,2,3}: q = 5,9,9 -> keep 2 (best q, tie vs 3 by id);
    // 4 unpaired -> survives
    val docs = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val kept = DedupOps.qualitySurvivors(docs, pairs, "doc_id", $"q")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  // ---- k-anonymity gate
  test("kAnonymize keeps rows by DISTINCT subject count, not row count") {
    // QI cell "a": 4 rows but only 2 distinct users -> suppressed at k=3.
    // QI cell "b": 3 rows, 3 distinct users -> kept.
    val rows = Seq(
      (1L, 100L, "a"), (2L, 100L, "a"), (3L, 100L, "a"), (4L, 200L, "a"),
      (5L, 300L, "b"), (6L, 301L, "b"), (7L, 302L, "b"))
      .toDF("row_id", "user", "qi")
    val kept = CurationOps.kAnonymize(rows, Seq("qi"), k = 3L, "user")
      .select($"row_id").as[Long].collect().toSet
    assert(kept == Set(5L, 6L, 7L))
  }

  test("kAnonymize: k=1 is the identity; schema and duplicates preserved") {
    val rows = Seq((1L, 10L, "a"), (1L, 10L, "a"), (2L, 11L, "b"))
      .toDF("row_id", "user", "qi")
    val out = CurationOps.kAnonymize(rows, Seq("qi"), k = 1L, "user")
    assert(out.columns.toSeq == Seq("row_id", "user", "qi"))
    assert(out.count() == 3)
  }

  test("kAnonymize gates on the full multi-column QI tuple") {
    // same band, different type => different cells; only ("x", 1) has 2 users
    val rows = Seq(
      (1L, 10L, "x", 1), (2L, 11L, "x", 1),
      (3L, 12L, "x", 2), (4L, 13L, "y", 1))
      .toDF("row_id", "user", "t", "band")
    val kept = CurationOps.kAnonymize(rows, Seq("t", "band"), k = 2L, "user")
      .select($"row_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      CurationOps.kAnonymize(rows, Seq.empty, k = 2L, "user")
    }
  }

  test("bm25Scores: tf raises, length normalizes, absent terms contribute zero") {
    import graft.llm.TextOps
    val docs = Seq(
      (1L, "spark merge rows"),          // tf(merge)=1, dl=3
      (2L, "merge merge spark"),         // tf(merge)=2, same dl -> higher
      (3L, "spark merge rows spark spark spark"), // tf=1, dl=6 -> lower than doc 1
      (4L, "nothing relevant here"))     // tf=0 -> score 0
      .toDF("doc_id", "text")
    val s = TextOps.bm25Scores(docs, "text", "doc_id", Seq("merge"))
      .select($"id", $"score").as[(Long, Double)].collect().toMap
    assert(s(2) > s(1), "higher term frequency must raise the score")
    assert(s(1) > s(3), "longer document with equal tf must score lower")
    assert(s(4) == 0.0, "documents without any query term score zero")
    intercept[IllegalArgumentException] {
      TextOps.bm25Scores(docs, "text", "doc_id", Seq.empty)
    }
  }

  test("crossSetMaxSim: per-probe argmax, exact-tie goes to the lowest corpus id") {
    import graft.llm.SimOps
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)),  // sim 1.0 with probe 1 (tie with 11)
      (11L, Seq(2.0f, 0.0f)),  // same direction -> same cosine: tie
      (12L, Seq(0.0f, 1.0f)))  // orthogonal
      .toDF("vec_id", "embedding")
    val probes = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.1f, 1.0f)))   // nearest is 12
      .toDF("vec_id", "embedding")
    val out = SimOps.crossSetMaxSim(corpus, probes)
      .select($"test_id", $"train_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 10L, 2L -> 12L))
  }

  test("distributionMatch: scarcest bucket kept whole, others thinned, rest dropped") {
    import graft.llm.CurationOps
    val df = (1 to 300).map { i =>
      val b = if (i <= 200) "big" else if (i <= 280) "small" else "other"
      (i.toLong, b)
    }.toDF("doc_id", "bucket")
    val out = CurationOps.distributionMatch(df, "bucket",
      Map("big" -> 0.5, "small" -> 0.5, "missing" -> 0.5), "doc_id", salt = "t")
      .select($"doc_id", $"bucket").as[(Long, String)].collect()
    val byB = out.groupBy(_._2).view.mapValues(_.length).toMap
    // M = min(200/0.5, 80/0.5) = 160 → p_small = 1.0, p_big = 0.4
    assert(byB.getOrElse("other", 0) == 0, s"non-target bucket leaked: $byB")
    assert(byB("small") == 80, s"scarcest bucket must keep every row: $byB")
    assert(byB("big") < 120 && byB("big") > 40, s"big not thinned near 0.4: $byB")
    // deterministic: rerun picks exactly the same rows
    val again = CurationOps.distributionMatch(df, "bucket",
      Map("big" -> 0.5, "small" -> 0.5, "missing" -> 0.5), "doc_id", salt = "t")
      .select($"doc_id", $"bucket").as[(Long, String)].collect()
    assert(out.toSet == again.toSet)
  }

  test("distributionMatch: a high-cardinality bucket column fails loud, never an unbounded collect") {
    import graft.llm.CurationOps
    // driver state is one count per bucket BY CONTRACT — a caller who
    // passes doc_id must get a typed error, not a silent OOM-shaped
    // collect. Cap lowered for the test via the documented knob.
    val df = (1 to 500).map(i => (i.toLong, s"b$i")).toDF("doc_id", "bucket")
    sys.props("graft.distributionMatchMaxBuckets") = "100"
    try {
      val e = intercept[IllegalArgumentException] {
        CurationOps.distributionMatch(df, "bucket",
          Map("b1" -> 0.5, "b2" -> 0.5), "doc_id", salt = "t").count()
      }
      assert(e.getMessage.contains("distinct"), e.getMessage)
      // at-or-under the cap still works
      val small = (1 to 100).map(i => (i.toLong, s"g${i % 100}")).toDF("doc_id", "bucket")
      CurationOps.distributionMatch(small, "bucket",
        Map("g1" -> 0.5, "g2" -> 0.5), "doc_id", salt = "t").count()
    } finally { sys.props.remove("graft.distributionMatchMaxBuckets"); () }
  }

  test("phraseSearch: adjacency chain counts overlapping matches, order matters") {
    import graft.llm.TextOps
    val docs = Seq(
      (1L, "a b a b a"),   // "a b" at 0 and 2; "b a" at 1 and 3
      (2L, "a a a"),       // overlapping "a a" at 0 and 1
      (3L, "b b"),         // no "a b"
      (4L, "A  b")         // case-fold + multi-space: "a b" at 0
    ).toDF("doc_id", "text")
    def run(p: String*) = TextOps.phraseSearch(docs, "text", "doc_id", p)
      .select($"doc_id", $"n_matches", $"first_pos")
      .as[(Long, Long, Int)].collect().toSet
    assert(run("a", "b") == Set((1L, 2L, 0), (4L, 1L, 0)))
    assert(run("b", "a") == Set((1L, 2L, 1)))
    assert(run("a", "a") == Set((2L, 2L, 0)))
    assert(run("a", "b", "a") == Set((1L, 2L, 0)))
    assert(run("z", "b").isEmpty)
  }

  test("proximitySearch: bucket binning finds exactly the within-window pairs") {
    import graft.llm.TextOps
    val docs = Seq(
      (1L, "x a y y y y b"),  // gap 5 == window -> match
      (2L, "a y y y y y b"),  // gap 6 > window -> no match
      (3L, "b a b"),          // both orders within window, 2 ordered pairs
      (4L, "a a b")           // two a-occurrences x one b
    ).toDF("doc_id", "text")
    val got = TextOps.proximitySearch(docs, "text", "doc_id", "a", "b", window = 5)
      .select($"doc_id", $"n_pairs", $"min_gap")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 1L, 5), (3L, 2L, 1), (4L, 2L, 1)), got.toString)
  }

  test("meanPool: exact element-wise means per group, partial-aggregated plan") {
    import graft.llm.SimOps
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 4.0f)), ("b", Seq(10.0f, 0.0f)))
      .toDF("k", "embedding")
    val out = SimOps.meanPool(df, Seq("k"), "embedding")
    val rows = out.select($"k", $"mean_vec", $"n_vecs")
      .as[(String, Seq[Double], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("a") == ((Seq(2.0, 3.0), 2L)))
    assert(rows("b") == ((Seq(10.0, 0.0), 1L)))
    // two HashAggregates = map-side partial + final: the exchange moves
    // per-group sums, not vectors
    val plan = out.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("kMeans: two separated direction blobs split perfectly at k=2") {
    import graft.llm.SimOps
    // blob A points near (1, 0, 0), blob B near (0, 1, 0); seeds are the
    // two lowest ids — one from each blob by construction
    val rows = (0 until 20).map { i =>
      val (base, jitter) = if (i % 2 == 0) ((1.0f, 0.0f), 0.01f * (i % 5))
      else ((0.0f, 1.0f), 0.01f * (i % 7))
      (i.toLong, Seq(base._1 + jitter, base._2 + jitter * 0.5f, 0.1f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val asg = SimOps.kMeans(df, k = 2, iters = 3)
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    val clustersA = (0 until 20 by 2).map(i => asg(i.toLong)).toSet
    val clustersB = (1 until 20 by 2).map(i => asg(i.toLong)).toSet
    assert(clustersA.size == 1 && clustersB.size == 1 && clustersA != clustersB)
  }

  test("kMeans: k=1 assigns everything to cluster 0 with sim vs the mean") {
    import graft.llm.SimOps
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = SimOps.kMeans(df, k = 1, iters = 2)
      .select($"cluster").distinct().as[Int].collect().toSeq
    assert(out == Seq(0))
  }

  test("kMeans: iters=0 equals assignment against the raw lowest-id seeds") {
    import graft.llm.SimOps
    val df = Seq(
      (5L, Seq(1.0f, 0.0f)), (6L, Seq(0.0f, 1.0f)),
      (7L, Seq(0.9f, 0.1f)), (8L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    // seeds = vectors 5 and 6; 7 is nearer 5's direction, 8 nearer 6's
    val asg = SimOps.kMeans(df, k = 2, iters = 0)
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    assert(asg == Map(5L -> 0, 6L -> 1, 7L -> 0, 8L -> 1))
  }

  test("kMeans: an emptied cell keeps its centroid instead of crashing") {
    import graft.llm.SimOps
    // seeds = ids 1,2,3; every point sits on direction (1,0) except seed
    // 3's own vector, which its duplicate at id 4 outranks... after one
    // update all mass concentrates and at least one cell empties — the
    // run must stay total and keep emitting k distinct centroids
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.001f)), (3L, Seq(1.0f, -0.001f)),
      (4L, Seq(1.0f, 0.0005f)), (5L, Seq(1.0f, -0.0005f)), (6L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = SimOps.kMeans(df, k = 3, iters = 4)
      .select($"id", $"cluster").as[(Long, Int)].collect()
    assert(out.length == 6)
    assert(out.forall { case (_, c) => c >= 0 && c <= 2 })
  }

  test("kMeans: deterministic across invocations on real embeddings") {
    import graft.llm.SimOps
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run() = SimOps.kMeans(emb, k = 4, iters = 2)
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    assert(run() == run())
  }

  // ---- trained coarse quantizers: kMeansCentroids wired into the ANN
  //      serving operators lifts recall over the lowest-id seed floor
  //      while the serving plan (centroid literals, map-only corpus)
  //      stays identical

  test("ivfTopK with kMeans-trained centroids beats the seed floor at 4/16 probes") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where($"vec_id" % 37 === 0)
    val k = 10
    val exact = SimOps.bruteForceTopK(emb, queries, k)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    def recallOf(cents: Option[Seq[Seq[Double]]]): Double = {
      val approx = SimOps.ivfTopK(emb, queries, k, numCells = 16, nProbe = 4,
        centroids = cents)
        .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val seeded = recallOf(None)
    val trained = recallOf(Some(SimOps.kMeansCentroids(emb, k = 16, iters = 5)))
    info(f"IVF recall@$k at 4/16 probes: seeds $seeded%.3f -> trained $trained%.3f")
    // measured 0.521 -> 0.557 when introduced. The synthetic test
    // embeddings are near-uniform on the sphere — the hardest case for
    // any coarse quantizer (there is little cluster structure to learn),
    // so the trained lift is modest here by construction; real corpora
    // with semantic clusters are where training pays. The pinned claims:
    // training must never LOSE recall, and must hold the measured floor.
    assert(trained > seeded,
      f"trained centroids must beat the seed floor: $trained%.3f <= $seeded%.3f")
    assert(trained >= 0.5,
      f"trained IVF recall degraded: $trained%.3f < 0.5")
  }

  test("pqTopK with kMeans-trained codebook vectors beats the seed floor") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where($"vec_id" % 37 === 0)
    val k = 10
    val exact = SimOps.bruteForceTopK(emb, queries, k)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    def recallOf(book: Option[Seq[Seq[Double]]]): Double = {
      val approx = SimOps.pqTopK(emb, queries, k, numSubspaces = 8,
        numCentroids = 16, candidates = 40, codebookVectors = book)
        .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val seeded = recallOf(None)
    val trained = recallOf(Some(SimOps.kMeansCentroids(emb, k = 16, iters = 5)))
    info(f"PQ recall@$k at 40 candidates: seeds $seeded%.3f -> trained $trained%.3f")
    assert(trained > seeded,
      f"trained codebook must beat the seed floor: $trained%.3f <= $seeded%.3f")

    // per-subspace L2 training — the metric PQ actually encodes with —
    // must beat BOTH untrained forms
    val books = SimOps.pqTrainCodebooks(emb, numSubspaces = 8,
      numCentroids = 16, iters = 3)
    val approxL2 = SimOps.pqTopK(emb, queries, k, numSubspaces = 8,
      numCentroids = 16, candidates = 40, codebooks = Some(books))
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val l2Trained = (exact intersect approxL2).size.toDouble / exact.size
    info(f"PQ recall@$k with per-subspace L2 books: $l2Trained%.3f")
    // measured: seeds 0.443, sliced-cosine 0.514, L2-trained 0.629
    assert(l2Trained > seeded,
      f"L2-trained books must beat the seed floor: $l2Trained%.3f <= $seeded%.3f")
    assert(l2Trained >= 0.55,
      f"L2-trained PQ recall degraded: $l2Trained%.3f < 0.55")
    // iters=0 returns the serving default exactly — same results
    val books0 = SimOps.pqTrainCodebooks(emb, numSubspaces = 8,
      numCentroids = 16, iters = 0)
    val approx0 = SimOps.pqTopK(emb, queries, k, numSubspaces = 8,
      numCentroids = 16, candidates = 40, codebooks = Some(books0))
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    val approxDefault = SimOps.pqTopK(emb, queries, k, numSubspaces = 8,
      numCentroids = 16, candidates = 40)
      .select($"query_id", $"nbr_id").as[(Long, Long)].collect().toSet
    assert(approx0 == approxDefault,
      "iters=0 per-subspace books must equal the lowest-id serving default")
  }

  test("semanticNearDups with trained centroids finds at least the seeded pairs' recall") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val threshold = 0.3
    // ground truth: every pair above threshold by exact cosine
    val c = emb.select($"vec_id".cast("long").as("id"),
      $"embedding".cast("array<double>").as("v"))
    val truth = c.as("a").join(c.as("b"), $"a.id" < $"b.id")
      .withColumn("sim", SimOps.cosine($"a.v", $"b.v"))
      .where($"sim" >= threshold)
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    def found(cents: Option[Seq[Seq[Double]]]): Set[(Long, Long)] =
      SimOps.semanticNearDups(emb, threshold, numCells = 16, centroids = cents)
        .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val seeded = found(None)
    val trained = found(Some(SimOps.kMeansCentroids(emb, k = 16, iters = 5)))
    // candidates are verified by exact cosine, so precision is 1 either
    // way; the quantizer decides recall (pairs co-located in a cell)
    assert(seeded.subsetOf(truth) && trained.subsetOf(truth))
    val rSeed = seeded.size.toDouble / truth.size
    val rTrained = trained.size.toDouble / truth.size
    info(f"semantic pair recall at $threshold: seeds $rSeed%.3f -> trained $rTrained%.3f " +
      s"(${truth.size} true pairs)")
    assert(rTrained >= rSeed,
      f"trained centroids lost pair recall: $rTrained%.3f < $rSeed%.3f")
  }

  test("IVF index: build + incremental append + probe equals from-scratch ivfTopK") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val root = java.nio.file.Files.createTempDirectory("ivf-idx").toString + "/idx"
    val queries = emb.where($"vec_id" % 37 === 0)
    val cents = emb.orderBy($"vec_id").limit(16)
      .select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toVector).toSeq
    SimOps.buildIvfIndex(emb.where($"vec_id" % 3 =!= 2), root,
      centroids = Some(cents))
    SimOps.appendToIvfIndex(emb.where($"vec_id" % 3 === 2), root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"nbr_id", $"rank").as[(Long, Long, Int)]
        .collect().toSet
    val probed = rows(SimOps.probeIvfIndex(spark, root, queries, k = 5, nProbe = 4))
    val direct = rows(SimOps.ivfTopK(emb, queries, k = 5, nProbe = 4,
      centroids = Some(cents)))
    assert(probed == direct,
      "persisted index probe diverged from the from-scratch plan")
    // appending again with NEW ids only adds — existing results stable
    // (clone NON-query vectors: a clone of a query vector would rightly
    // become that query's sim-1.0 top hit)
    SimOps.appendToIvfIndex(
      emb.where($"vec_id" >= 1 && $"vec_id" < 5)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"),
      root)
    val after = rows(SimOps.probeIvfIndex(spark, root, queries, k = 5, nProbe = 4))
    // the clones carry IDENTICAL vectors at higher ids: sim ties break
    // to the lower id, so every rank-1 answer is unchanged (clones can
    // only enter at worse ranks)
    assert(after.filter(_._3 == 1) == probed.filter(_._3 == 1),
      "appending id-shifted clones disturbed rank-1 results")
  }

  test("curationProvenance kept set equals the composed pipeline's output") {
    // the operator's contract: verdicts are not a parallel
    // implementation of the pipeline, they ARE the pipeline's decisions
    // — the kept set must equal exactDedup → quality gate → hashSample
    // composed with the same parameters, doc for doc
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val kept = CurationOps.curationProvenance(docs, "text", "doc_id",
        minTokens = 30, sampleFraction = 0.6, salt = "pipe")
      .where($"verdict" === "kept")
      .select($"doc_id").as[Long].collect().toSet
    val pipeline = CurationOps.hashSample(
        DedupOps.exactDedup(docs, "text", "doc_id")
          .where(TextOps.tokenCount(col("text")) >= 30),
        0.6, "doc_id", salt = "pipe")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == pipeline,
      s"provenance kept set diverged from the pipeline: " +
        s"only-provenance=${(kept -- pipeline).take(5)}, " +
        s"only-pipeline=${(pipeline -- kept).take(5)}")
    // and every doc is accounted for exactly once
    assert(CurationOps.curationProvenance(docs, "text", "doc_id",
      30, 0.6, "pipe").count() == docs.count())
  }

  test("withSentenceStats: segmentation, token counts, edge docs") {
    val docs = Seq(
      (1L, "One two three. Four five! Six?"), // 3 sentences, 3/2/1 tokens
      (2L, ""),                               // no sentences at all
      (3L, "no terminal punctuation here"),   // one unterminated sentence
      (4L, "...!!!"),                         // separators only
      (5L, "a.b.c"),                          // no spaces around terminals
      (6L, "  Padded .  spaced ! "))          // trims around separators
      .toDF("doc_id", "text")
    val out = TextOps.withSentenceStats(docs, "text")
      .select($"doc_id", $"n_sentences", $"n_sentence_tokens",
        $"max_sentence_tokens", $"avg_sentence_tokens")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 3L, 6L, 3L, 2.0),
      (2L, 0L, 0L, 0L, 0.0),
      (3L, 1L, 4L, 4L, 4.0),
      (4L, 0L, 0L, 0L, 0.0),
      (5L, 3L, 3L, 1L, 1.0),
      (6L, 2L, 2L, 1L, 1.0)))
  }

  test("index probe I/O is bounded by the probed-cell fraction (measured file selection)") {
    // the plan-level proof (PlanAuditSpec e11) pins PartitionFilters;
    // this pins the CONSEQUENCE with the scan operator's own selection
    // metrics (numFiles/filesSize — the files the reader actually
    // chose after pruning): over 16 equal-size cells, a 1-of-16 probe
    // must select ~1/16 of the file bytes a 16-of-16 probe selects —
    // the property that makes a persisted index serve cheaply at
    // 100 TB (probe cost scales with cells probed, not corpus size)
    val root = java.nio.file.Files.createTempDirectory("ivf-io").toString + "/idx"
    val dims = 64
    // cluster c lives on dim block [4c, 4c+4); equal 1000-vector cells
    // by construction, jitter keeps parquet from collapsing the files
    val corpus = spark.range(16000L).select($"id".as("vec_id"),
      array((0 until dims).map { d =>
        val block = (($"id" % 16) * 4 <= d) && (($"id" % 16) * 4 + 4 > d)
        when(block, lit(1.0))
          .otherwise((($"id" * 31 + d) % 7).cast("double") * 0.001)
      }: _*).as("embedding"))
    val cents = (0 until 16).map(c =>
      (0 until dims).map(d => if (d >= 4 * c && d < 4 * c + 4) 1.0 else 0.0))
    SimOps.buildIvfIndex(corpus, root, centroids = Some(cents))
    val queries = Seq((99999L, cents(3).toSeq)).toDF("vec_id", "embedding")

    val (narrow, m1) = ScanMetrics.selectedByQueries(spark) {
      SimOps.probeIvfIndex(spark, root, queries, k = 5, nProbe = 1).collect()
    }
    val (_, m16) = ScanMetrics.selectedByQueries(spark) {
      SimOps.probeIvfIndex(spark, root, queries, k = 5, nProbe = 16).collect()
    }
    // the 1-cell probe still answers correctly: the query is centroid 3,
    // so its neighbors are exactly cluster-3 members
    assert(narrow.length == 5 &&
      narrow.forall(_.getLong(1) % 16 == 3),
      s"1-probe answers left the query's cell: ${narrow.mkString(",")}")
    info(f"probe selection: 1/16 cells ${m1.fileBytes / 1024}%d KiB " +
      f"(${m1.numFiles} files), 16/16 ${m16.fileBytes / 1024}%d KiB " +
      f"(${m16.numFiles} files, ratio ${m1.fileBytes.toDouble / m16.fileBytes}%.3f)")
    assert(m1.fileBytes > 0, "scan metrics captured nothing — the proof is vacuous")
    // expected ratio ~1/16 with equal cells; 0.25 is a 4x margin
    assert(m1.fileBytes < m16.fileBytes / 4,
      f"1-of-16 probe selected ${m1.fileBytes.toDouble / m16.fileBytes}%.2fx " +
        "of the full scan — partition pruning is not bounding probe I/O")
  }

  test("rebuildIvfIndex crash recovery: sealed staging rolls forward, unsealed rolls back") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("ivf-crash")
      .toString + "/idx"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def v(x: Double, y: Double) = Seq(x, y)
    val base = Seq((0L, v(1, 0.01)), (1L, v(1, -0.01)),
      (10L, v(0.01, 1)), (11L, v(-0.01, 1))).toDF("vec_id", "embedding")
    val centsA = Seq(v(1, 0), v(0, 1))
    val centsB = Seq(v(0, 1), v(1, 0)) // rebuild swaps the cell order
    SimOps.buildIvfIndex(base, root, centroids = Some(centsA))

    // -- forward case: seal a complete staged rebuild, then "crash" in
    // the WORST mid-swap state — cells evacuated, _centroids still the
    // old generation (the silent-mix risk an interleaved swap has)
    SimOps.buildIvfIndex(SimOps.readIvfIndex(spark, root),
      s"$root/_rebuild", 2, "nbr_id", "nbr_vec", Some(centsB))
    fs.create(new Path(s"$root/_rebuild/_COMPLETE")).close()
    fs.mkdirs(new Path(s"$root/_old"))
    assert(fs.rename(new Path(s"$root/cells"), new Path(s"$root/_old/cells")))
    // next writer op must recover FORWARD before touching the index
    SimOps.appendToIvfIndex(Seq((100L, v(0.02, 1))).toDF("vec_id", "embedding"), root)
    assert(!fs.exists(new Path(s"$root/_old")), "old generation not vacuumed")
    assert(!fs.exists(new Path(s"$root/_rebuild")), "staging not vacuumed")
    assert(SimOps.readIvfIndex(spark, root).count() == 5)
    // the NEW generation is live: under centsB, cell 0 is the (0,1)
    // centroid — so the append above landed with the y-cluster
    val cv0 = spark.read.parquet(s"$root/_centroids").orderBy(col("cell"))
      .select(col("cv")).first().getSeq[Double](0)
    assert(cv0 == Seq(0.0, 1.0), s"centroids are not the rebuilt generation: $cv0")
    val hits = SimOps.probeIvfIndex(spark, root,
        Seq((9999L, v(0, 1))).toDF("vec_id", "embedding"), k = 3, nProbe = 1)
      .select($"nbr_id").as[Long].collect().toSet
    assert(hits == Set(10L, 11L, 100L),
      s"1-cell probe against the recovered index missed the y-cluster: $hits")

    // -- rollback case: _old present but staging UNSEALED (crash before
    // any rename — the marker writes first) → staging discarded, index
    // untouched
    fs.mkdirs(new Path(s"$root/_old"))
    fs.mkdirs(new Path(s"$root/_rebuild/cells"))
    SimOps.appendToIvfIndex(Seq((101L, v(1, 0.02))).toDF("vec_id", "embedding"), root)
    assert(!fs.exists(new Path(s"$root/_old")) &&
      !fs.exists(new Path(s"$root/_rebuild")), "unsealed swap not cleaned")
    assert(SimOps.readIvfIndex(spark, root).count() == 6)
  }

  test("rebuildIvfIndex: trained centroids recover recall after a distribution-shifted append") {
    val root = java.nio.file.Files.createTempDirectory("ivf-rebuild")
      .toString + "/idx"
    def v(x: Double, y: Double, z: Double, w: Double) = Seq(x, y, z, w)
    // base corpus: tight clusters around the two build-time centroids
    val base = (0 until 20).map(i => (i.toLong, v(1, 0.001 * i, 0, 0))) ++
      (20 until 40).map(i => (i.toLong, v(0.001 * (i - 20), 1, 0, 0)))
    // the shift: a NEW cluster around (1,1,0,0)/√2 — exactly between
    // the frozen cells, alternating ±δ on dim 1 so its members split
    // half/half across them (the silent-recall-decay shape)
    val shifted = (0 until 20).map { j =>
      val m = 0.001 * (j / 2 + 1)
      val d = if (j % 2 == 0) m else -m
      (100L + j, v(1, 1 + d, 0, 0))
    }
    val baseDf = base.toDF("vec_id", "embedding")
    val shiftDf = shifted.toDF("vec_id", "embedding")
    SimOps.buildIvfIndex(baseDf, root,
      centroids = Some(Seq(v(1, 0, 0, 0), v(0, 1, 0, 0))))
    SimOps.appendToIvfIndex(shiftDf, root)
    val all = baseDf.unionByName(shiftDf)
    val queries = Seq((9999L, v(1, 1, 0, 0))).toDF("vec_id", "embedding")
    val k = 8
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select($"nbr_id").as[Long].collect().toSet
    val truth = hits(SimOps.bruteForceTopK(all, queries, k))
    val before = hits(SimOps.probeIvfIndex(spark, root, queries, k, nProbe = 1))
    val recallBefore = (truth & before).size.toDouble / k
    // the probe reads ONE frozen cell; the shifted cluster's best
    // matches live in BOTH — recall must have decayed or the test is
    // vacuous (construction gives exactly half)
    assert(recallBefore <= 0.5, s"shifted cluster did not split: $recallBefore")
    // 'trained' centroids representative of the CURRENT contents (the
    // spec pins the rebuild mechanics; kMeansCentroids over
    // readIvfIndex is the production trainer)
    val trained = Seq(v(1, 0, 0, 0), v(0, 1, 0, 0),
      v(0.7071067811865476, 0.7071067811865476, 0, 0), v(0, 0, 0, 1))
    SimOps.rebuildIvfIndex(spark, root, trained)
    // contents preserved exactly; old generation + staging vacuumed
    assert(SimOps.readIvfIndex(spark, root).count() == all.count())
    assert(!new java.io.File(s"$root/_rebuild").exists())
    assert(!new java.io.File(s"$root/_old").exists())
    val after = hits(SimOps.probeIvfIndex(spark, root, queries, k, nProbe = 1))
    assert((truth & after).size == k,
      s"recall did not recover: before=$recallBefore " +
        s"after=${(truth & after).size.toDouble / k}")
  }

  // ---- large-k kMeans: blocked assignment stays codegen-compiled and
  //      byte-identical to the flat argmax semantics

  test("kMeans blocked assignment (k>256) matches a driver-side exact argmax") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val k = 300 // two blocks: 256 + 44
    val asg = SimOps.kMeans(emb, k, iters = 0)
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    // driver-side recompute with the same left-to-right fold the fused
    // CosineSimilarity expression uses — bit-identical, so argmax ties
    // (highest sim, lowest cell) resolve the same way
    val vecs = emb.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val cents = vecs.take(k).map(_._2)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.size) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val s = dot / (math.sqrt(na) * math.sqrt(nb))
      if (s.isNaN) -1.0 else s
    }
    val expected = vecs.map { case (id, v) =>
      var best = -2.0; var bestCell = 0; var cell = 0
      while (cell < k) {
        val s = cos(v, cents(cell))
        if (s > best) { best = s; bestCell = cell }
        cell += 1
      }
      id -> bestCell
    }.toMap
    assert(asg == expected)
  }

  test("kMeans at k=1024 keeps whole-stage codegen within JIT method limits") {
    import org.apache.spark.sql.execution.debug
    // the embeddings table has 500 rows; union id-shifted jittered
    // copies to give k=1024 distinct seeds a 4000-row corpus
    val base = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id".cast("long").as("vec_id"),
        $"embedding".cast("array<double>").as("embedding"))
    val corpus = (0 until 8).map { s =>
      base.select(($"vec_id" + s * 500).as("vec_id"),
        transform($"embedding", x => x + lit(s * 0.01)).as("embedding"))
    }.reduce(_ union _)
    val out = SimOps.kMeans(corpus, k = 1024, iters = 0)
    // assignment must stay map-only at large k: no join, no exchange
    val formatted = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!formatted.contains("Join"), s"large-k assignment joins:\n$formatted")
    assert(!formatted.contains("Exchange"), s"large-k assignment shuffles:\n$formatted")
    // and every generated method must stay inside the JVM's 8000-byte
    // JIT threshold (Spark falls back to interpreted past
    // hugeMethodLimit=65535; JIT refuses past 8000 — the NearestCentroid
    // form must not even approach either cliff; the staged-array form
    // at this k throws janino InternalCompilerException outright)
    val stats = debug.codegenStringSeq(out.queryExecution.executedPlan)
    assert(stats.nonEmpty, "no whole-stage codegen subtree found")
    stats.foreach { case (subtree, _, bc) =>
      info(s"maxMethodCodeSize=${bc.maxMethodCodeSize} " +
        s"maxConstPoolSize=${bc.maxConstPoolSize}")
      assert(bc.maxMethodCodeSize > 0,
        s"codegen did not compile for subtree:\n$subtree")
      assert(bc.maxMethodCodeSize < 8000,
        s"generated method ${bc.maxMethodCodeSize} bytes breaches the JIT limit:\n$subtree")
    }
    // the result itself is sane: 4000 rows, clusters within [0, 1024)
    val rows = out.select($"cluster").as[Int].collect()
    assert(rows.length == 4000)
    assert(rows.forall(cl => cl >= 0 && cl < 1024))
  }

  test("CentroidSims parity with the staged sims array; 300-cell IVF stays codegen'd") {
    import graft.llm.SimOps
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.orderBy($"vec_id").limit(8)
      .select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toVector).toSeq
    // bit-exact parity: same left-to-right fold, same NaN coalescing
    val staged = emb.select($"vec_id",
      array(cents.map(ct => nanvl(SimOps.cosine($"embedding", typedLit(ct)),
        lit(-1d))): _*).as("s"))
      .as[(Long, Seq[Double])].collect().toMap
    val native = emb.select($"vec_id",
      graft.functions.CentroidSims($"embedding", cents).as("s"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(native == staged, "CentroidSims diverged from the staged array form")

    // past the 256-cell regime both the probe ranking and the corpus
    // assignment run the native expressions — the IVF serve must stay
    // inside whole-stage codegen and return a full result
    val cents300 = emb.orderBy($"vec_id").limit(300)
      .select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toVector).toSeq
    val queries = emb.where($"vec_id" % 100 === 0)
    val out = SimOps.ivfTopK(emb, queries, k = 3, nProbe = 8,
      centroids = Some(cents300))
    val rows = out.collect()
    assert(rows.length == queries.count() * 3)
    import org.apache.spark.sql.execution.debug
    debug.codegenStringSeq(out.queryExecution.executedPlan).foreach {
      case (subtree, _, bc) =>
        assert(bc.maxMethodCodeSize > 0 && bc.maxMethodCodeSize < 8000,
          s"300-cell IVF codegen out of bounds (${bc.maxMethodCodeSize}):\n$subtree")
    }
  }

  test("kMeans high-dim update (posexplode path) still splits separated blobs") {
    // dim 160 > UpdateWideDims=128 routes the centroid update through
    // the skinny (cluster, idx) aggregation; semantics must not change
    val dim = 160
    val rows = (0 until 24).map { i =>
      val v = Array.fill(dim)(0.0f)
      if (i % 2 == 0) v(0) = 1.0f + 0.01f * (i % 5) else v(1) = 1.0f + 0.01f * (i % 7)
      v(2) = 0.05f
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val asg = SimOps.kMeans(df, k = 2, iters = 3)
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    val a = (0 until 24 by 2).map(i => asg(i.toLong)).toSet
    val b = (1 until 24 by 2).map(i => asg(i.toLong)).toSet
    assert(a.size == 1 && b.size == 1 && a != b)
    // and the trainer is deterministic across invocations on this path
    assert(SimOps.kMeansCentroids(df, 2, 2) == SimOps.kMeansCentroids(df, 2, 2))
  }

  test("withGopherRules: each rule trips on its hand-built violator") {
    val good = (("the quick brown fox jumps with energy and grace that " * 6) +
      "counts well beyond fifty words so the word count gate passes " +
      "and more filler words of ordinary length keep every ratio sane " +
      "plus extra pad tokens to clear the fifty word floor easily now ").trim
    val rows = Seq(
      (1L, good), // passes all
      (2L, "too short to pass"), // f_words
      (3L, ("ab " * 60).trim), // f_word_len (mean 2 < 3); also fails stop
      (4L, good + " " + ("# " * 30).trim), // f_symbol (30 symbols > 10%)
      (5L, good.split(" ").grouped(8).map("- " + _.mkString(" "))
        .mkString("\n")), // f_bullet (100% bullet lines)
      (6L, good.split(" ").grouped(8).map(_.mkString(" ") + " ...")
        .mkString("\n")), // f_ellipsis (100% ellipsis-ended)
      (7L, good + " " + ("1234 " * 25).trim), // f_alpha (numeric word flood)
      (8L, ("quick brown fox jumps high over lazy dogs daily " * 8).trim)) // f_stop
    val got = TextOps.withGopherRules(rows.toDF("doc_id", "text"), "text")
      .select($"doc_id", $"f_words", $"f_word_len", $"f_symbol", $"f_bullet",
        $"f_ellipsis", $"f_alpha", $"f_stop", $"passes")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, true, true, true, true, true, true, true, true)))
    assert(!got(2L)._2 && !got(2L)._9, "short doc must fail the word-count gate")
    assert(!got(3L)._3, "mean word length 2 must fail the [3,10] band")
    assert(!got(4L)._4, "symbol flood must fail the 10% symbol gate")
    assert(!got(5L)._5, "all-bullet doc must fail the 90% bullet gate")
    assert(!got(6L)._6, "all-ellipsis doc must fail the 30% ellipsis gate")
    assert(!got(7L)._7, "numeric-word flood must fail the 80% alpha gate")
    assert(!got(8L)._8, "stopword-free doc must fail the 2-stopword gate")
    // only the targeted gates fail on 5/6/7 (word counts stay >= 50)
    assert(got(5L)._2 && got(6L)._2 && got(7L)._2)
  }

  test("withTrigramBackoff: every backoff level hand-traced on a toy split") {
    import graft.llm.TextOps
    // train "a b c a b c": trigrams abc:2 bca:1 cab:1; prefixes ab:2
    // bc:1 ca:1; last-bigrams bc:2 ca:1 ab:1; continuations b:2 c:1
    // a:1; unigrams a:2 b:2 c:2, N=6
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val test = Seq(
      (1L, "a b c x b"), // abc seen (S=2/2); bcx OOV-word floor; cxb unigram path
      (2L, "b a b"),     // bab unseen, bigram ab seen → 0.4·cb(ab)/cf(a)=0.4
      (3L, "x"))         // too short: zero trigrams, NULL surprisal
      .toDF("doc_id", "text")
    val got = TextOps.withTrigramBackoff(train, test, "text", "doc_id")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def lg2(x: Double) = math.log(x) / math.log(2)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val exp1 = r6((0.0 + -lg2(0.064 / 6) + -lg2(0.16 * 2 / 6)) / 3)
    assert(got(1L) == ((3L, 2L, Some(exp1))))
    assert(got(2L) == ((1L, 1L, Some(r6(-lg2(0.4))))))
    assert(got(3L) == ((0L, 0L, None)))
  }
}
