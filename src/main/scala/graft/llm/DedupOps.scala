package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash +
  * LSH banded near-dup, n-gram Jaccard, and SimHash.
  *
  * == 100 TB design ==
  *
  * Candidate generation is always *bucketed* — `groupBy(band)` /
  * self-join on a band key — never an all-pairs crossJoin. The only
  * pairwise work is inside a bucket, whose expected size is O(dups), not
  * O(corpus). Signatures are md5-based (engine-portable, verified against
  * a DuckDB oracle computing the identical arithmetic) and computed in a
  * single map-only projection per document.
  */
object DedupOps {

  /** Exact dedup, hash-grouped: one survivor per distinct text (the
    * lowest id). The shuffle key is the md5 of the normalized text — 16
    * bytes instead of the document body — so the exchange moves hashes,
    * not the corpus.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val others = df.columns.filterNot(_ == textCol).toSeq
    // r17: 16-byte md5 binary group key (internal only) — half the key
    // bytes of the hex-string form through the exchange (guide §2.3)
    df.groupBy(unhex(md5(to_binary(col(textCol), lit("utf-8")))).as("__h"))
      .agg(min_by(struct(col(textCol) +: others.map(col): _*), col(idCol)).as("__r"))
      .select(col(s"__r.$textCol") +: others.map(f => col(s"__r.$f")): _*)
  }

  /** History-aware exact dedup: the rows of `newBatch` whose text does
    * NOT already exist in `corpus`, deduplicated within the batch (lowest
    * `idCol` survives per distinct text). This is the incremental form of
    * [[exactDedup]] — dedup a fresh crawl against an existing corpus
    * without recomputing the corpus-wide grouping.
    *
    * == 100 TB design ==
    *
    * The corpus is scanned exactly once, map-only, and is NEVER shuffled
    * or broadcast:
    *
    *  1. one pruned pass over the corpus text hashes folds into a bloom
    *     sketch (native `BloomFilterAggregate`, partial-merged ~MB
    *     buffers; `expectedCorpusDocs`/`fpp` size it);
    *  2. the batch probes the sketch map-side (`might_contain` over a
    *     literal sketch): rows the bloom rules out are *certainly* new
    *     and skip the join entirely — the surviving candidates are
    *     O(true dups + fpp × batch);
    *  3. candidate hashes join back against the corpus hash column to
    *     kill false positives — broadcast when the candidate set is
    *     small (corpus side stays map-only), falling back to a shuffled
    *     semi-join of 16-byte hashes (never text) above
    *     `broadcastCeiling` candidates;
    *  4. the batch anti-joins the (tiny) true-match hash set and
    *     dedups within itself as [[exactDedup]] does.
    *
    * A corpus too large for one well-sized sketch (e.g. 10 B+ docs)
    * should dedup against a *partitioned* bloom index instead — see
    * `WarehouseTable`'s per-partition blooms; an undersized sketch here
    * only raises the false-positive rate (more verify work), never
    * changes the result.
    *
    * `expectedCorpusDocs` sizes the sketch; leave it None to derive it
    * from a `corpus.count()` (a near-metadata-only job on parquet) —
    * an oversized sketch costs real money, since its bytes ride the
    * probe's task binaries.
    */
  def incrementalExactDedup(newBatch: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      expectedCorpusDocs: Option[Long] = None, fpp: Double = 0.01,
      broadcastCeiling: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.util.sketch.BloomFilter

    // r17: 16-byte md5 binary keys (internal only; guide §2.3) — the
    // bloom input is xxhash64(__h), which accepts binary unchanged
    val h = unhex(md5(to_binary(col(textCol), lit("utf-8"))))
    val corpusH = corpus.select(h.as("__h"))
    val newH = newBatch.withColumn("__h", h)
    val originalCols = newBatch.columns.toSeq

    def dedupWithin(df: DataFrame): DataFrame = df
      .groupBy(col("__h"))
      .agg(min_by(struct(originalCols.map(col): _*), col(idCol)).as("__r"))
      .select(originalCols.map(f => col(s"__r.$f")): _*)

    val expected = math.max(1L, expectedCorpusDocs.getOrElse(corpus.count()))
    val aggCol = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(col("__h"))),
      Bridge.expression(lit(expected)),
      Bridge.expression(lit(BloomFilter.optimalNumOfBits(expected, fpp))))
      .toAggregateExpression())
    val bloomBytes = corpusH.agg(aggCol.as("b")).head().getAs[Array[Byte]](0)
    // null sketch = empty corpus: nothing to dedup against
    if (bloomBytes == null) return dedupWithin(newH)

    val mightContain = Bridge.column(new BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      Bridge.expression(xxhash64(col("__h")))))
    val cand = newH.where(mightContain).select(col("__h")).distinct()
      .transform(graft.util.GraftCache.barrier("DedupOps.dedupWithin"))
    // exact verify: bloom positives vs the real corpus hash column.
    // Candidate count is known post-checkpoint without an extra scan.
    val matched =
      if (cand.count() <= broadcastCeiling)
        corpusH.join(broadcast(cand), Seq("__h"), "left_semi").distinct()
      else corpusH.join(cand, Seq("__h"), "left_semi").distinct()
    dedupWithin(newH.join(matched, Seq("__h"), "left_anti"))
  }

  private val emptyStrArray = array().cast("array<string>")

  /** Character k-gram shingle set (distinct), the MinHash input. */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      array_distinct(transform(
        sequence(lit(1), length(c) - (k - 1)),
        i => c.substr(i, lit(k)))))
      .otherwise(emptyStrArray)

  /** Winnowing fingerprint set (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local fingerprinting scheme): hash every character
    * `k`-gram of the normalized text, slide a `window` of consecutive
    * gram hashes, keep each window's MINIMUM, and distinct the
    * selections. The winnowing guarantee: any match of length
    * `>= window + k - 1` between two documents shares at least one
    * fingerprint — unlike uniform sampling, coverage has no gaps, and
    * unlike full shingle sets the density is ~2/(window+1). Documents
    * with fewer than `window` grams keep their single minimum; empty
    * normalized text yields an empty set. Returns `(id, fingerprints:
    * array<long>)`. Pure codegen'd column arithmetic, map-only.
    */
  def winnowedFingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int = 6, window: Int = 4): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.WinnowFingerprints(
        TextOps.normalizeText(col(textCol)), k, window).as("fingerprints"))

  /** The composed-Column reference implementation of
    * [[winnowedFingerprints]] — bit-identical output (parity spec), kept
    * as the derivation the DuckDB oracle mirrors. Two lessons are
    * encoded here: (1) higher-order functions are CodegenFallback, and
    * in interpreted evaluation a projection column referenced inside a
    * lambda is RE-EVALUATED per element — naive `.select` staging meant
    * re-normalizing the text (three regexes) once per gram and once per
    * window, O(len²·regex) per document (measured: a 200-doc corpus
    * never finished); (2) the fix is LET-BINDING via single-element
    * transform — `transform(array(e), x => body)` evaluates `e` exactly
    * once per row and binds it to a lambda VARIABLE, free to
    * re-reference. Even let-bound, the HOF chain allocates per gram and
    * per window, which is why the native expression is the hot path.
    */
  def winnowedFingerprintsComposed(df: DataFrame, textCol: String,
      idCol: String, k: Int = 6, window: Int = 4): DataFrame = {
    require(k >= 2 && window >= 2, s"need k >= 2 and window >= 2: $k/$window")
    def hash(c: Column) =
      conv(substring(md5(to_binary(c, lit("utf-8"))), 1, 8), 16, 10)
        .cast("long")
    val emptyLongs = array().cast("array<long>")
    val fps = element_at(transform(
      array(TextOps.normalizeText(col(textCol))), nt =>
        element_at(transform(
          array(when(length(nt) >= k,
            transform(sequence(lit(1), length(nt) - (k - 1)),
              i => hash(nt.substr(i, lit(k)))))
            .otherwise(emptyLongs)), gh =>
            when(size(gh) >= window,
              array_distinct(transform(
                sequence(lit(1), size(gh) - (window - 1)),
                i => array_min(slice(gh, i, lit(window))))))
              .when(size(gh) > 0, array(array_min(gh)))
              .otherwise(emptyLongs)), 1)), 1)
    df.select(col(idCol).as("id"), fps.as("fingerprints"))
  }

  /** Cross-document overlap from winnowed fingerprints: pairs sharing
    * `>= minShared` fingerprints, with a containment score
    * `n_shared / min(|fp₁|, |fp₂|)` — the MOSS-style plagiarism /
    * fragment-reuse report, and a third candidate-generation scheme
    * next to MinHash banding and SimHash blocks (winnowing is
    * position-dense, so it localizes matches the sketch schemes only
    * score). Returns `(id1, id2, n_shared, containment)`, id1 < id2.
    *
    * == 100 TB design ==
    *
    * Fingerprints are 8-byte longs: after the map-only
    * [[winnowedFingerprints]] scan the text is GONE — the exploded
    * `(id, fingerprint)` relation is checkpointed once and serves the
    * per-doc counts, the document-frequency cap, and the inverted-
    * index pair join. `maxDf` drops fingerprints shared by more than
    * that many documents before pairing (a boilerplate fingerprint in
    * 10⁶ docs would emit 10¹² pairs and carries no match signal —
    * the same hub bound as [[graft.operators.GraphOps.adamicAdar]]),
    * so the pair join fans out at most `maxDf²` per fingerprint. The
    * containment denominators count ALL fingerprints (capped ones
    * included), keeping scores conservative and cap-insensitive.
    */
  def winnowedOverlap(df: DataFrame, textCol: String, idCol: String,
      k: Int = 6, window: Int = 4, maxDf: Int = 20,
      minShared: Long = 5L): DataFrame = {
    val ex = winnowedFingerprints(df, textCol, idCol, k, window)
      .select(col("id"), explode(col("fingerprints")).as("f"))
      .transform(graft.util.GraftCache.barrier("DedupOps.winnowedOverlap"))
    val cnt = ex.groupBy(col("id")).agg(count(lit(1)).as("__n"))
    val rare = ex.groupBy(col("f")).agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select(col("f"))
    val exr = ex.join(rare, Seq("f"), "left_semi")
    val pairs = exr.as("a").join(exr.as("b"),
        col("a.f") === col("b.f") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    pairs
      .join(cnt.select(col("id").as("id1"), col("__n").as("__n1")), "id1")
      .join(cnt.select(col("id").as("id2"), col("__n").as("__n2")), "id2")
      .select(col("id1"), col("id2"), col("n_shared"),
        round(col("n_shared") / least(col("__n1"), col("__n2")), 6)
          .as("containment"))
  }

  /** Word n-gram shingle set (distinct).
    *
    * The token split is LET-BOUND through a one-element transform so it
    * evaluates once per row: HOF lambdas are interpreted, and inlining
    * `split()` into the sliding lambda re-runs it per output shingle —
    * O(tokens²) per document (measured: the sf0.1 contamination probe
    * dropped 12.2 s → ~1 s with the binding). The lambda variable is a
    * row-local value; referencing it per element is O(1).
    */
  def wordShingles(c: Column, n: Int): Column =
    flatten(transform(array(graft.functions.WsTokens(c)), toks =>
      when(size(toks) >= n,
        array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(emptyStrArray)))

  /** Per-shingle hash pair `{h1, h2}` (first/second 8 hex chars of ONE
    * md5 as uint32s) — the base of Kirsch-Mitzenmacher double hashing.
    * Materialize this as its own column before deriving the signature:
    * the md5 then runs once per shingle instead of once per (shingle,
    * hash function) — a `numHashes`× cut of the dominant map-side cost.
    * (CollapseProject leaves the two projections separate: it never
    * inlines a non-trivial expression into multiple references.)
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => {
      val d = md5(to_binary(s, lit("utf-8")))
      struct(
        conv(substring(d, 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(d, 9, 8), 16, 10).cast("long").as("h2"))
    })

  /** MinHash signature from pre-hashed shingles: hash function j is
    * `g_j = (h1 + j*h2) mod 2^32` (Kirsch-Mitzenmacher: two base hashes
    * give a family with the same minwise guarantees as independent
    * hashes), signature row j is `min(g_j)` over the shingle set.
    * Computed as ONE fold over the shingle set carrying all `numHashes`
    * running minima (instead of `numHashes` separate array traversals —
    * same values, a fraction of the expression tree and per-row work).
    * Value-portable: DuckDB computes the same minima per j.
    */
  def signatureFromHashes(hashed: Column, numHashes: Int): Column =
    aggregate(hashed,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc,
        sequence(lit(0L), lit((numHashes - 1).toLong)),
        (a, j) => least(a,
          pmod(h.getField("h1") + j * h.getField("h2"), lit(4294967296L)))))

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    signatureFromHashes(shingleHashes(shingles), numHashes)

  /** LSH band keys: signature sliced into `bands` rows-per-band groups,
    * each band hashed to one key. Two docs share a band key iff their
    * signature slice matches exactly.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      lshBandKey(signature, lit(b), rowsPerBand)): _*)

  /** One band key from a signature and a (possibly column) band index:
    * `b ':' md5(sig[b*rpb+1 .. +rpb] joined '|')`. Referencing the
    * signature exactly once matters — higher-order expressions are
    * interpreted, and an optimizer-inlined signature re-runs per
    * reference.
    */
  def lshBandKey(signature: Column, b: Column, rowsPerBand: Int): Column =
    concat(b.cast("string"), lit(":"), md5(to_binary(
      concat_ws("|", transform(
        slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
        _.cast("string"))), lit("utf-8"))))

  /** Jaccard similarity of two (distinct-element) shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Banded LSH candidate-pair pipeline shared by [[minhashNearDups]]
    * and [[ngramNearDups]], over a raw `(id, t)` document frame and a
    * text→shingle-set expression.
    *
    * == 100 TB shuffle & compute discipline ==
    * The band self-join exchanges ONLY `(band, id)` — a 16-byte band key
    * plus the id — never the shingle arrays (≈ document size):
    * signatures are consumed map-side to derive band keys and dropped
    * before the exchange, so band-exchange volume is O(bands × ids), not
    * O(bands × corpus bytes). Candidate pairs de-duplicate as bare
    * `(id1, id2)`, and the exact-Jaccard verify re-derives shingles ONLY
    * for candidate documents: a semi-join on the (small, broadcast)
    * candidate-id sets sits below the shingle projection, so verify-side
    * shingling is O(candidates), not a second O(corpus) pass. Total:
    * one full shingling pass, no corpus-sized shuffle anywhere.
    * `PlanAuditSpec` guards the band exchange's payload.
    */
  /** `(band, id)` keys for a `(id, t)` document frame — the map-only
    * front half of every banded pipeline. Every stage materializes as
    * its own projection (normalized text → shingles → signature), and
    * the band index explodes BEFORE band-key derivation. This shape is
    * load-bearing twice over: higher-order functions are interpreted
    * (no whole-stage codegen), and a column-function composed inline
    * nests the producer inside every consumer reference — normalization
    * composed into the shingle lambda re-runs its regexes once PER
    * SHINGLE (O(doc²) regex work), and a signature inlined into the
    * band array re-runs once per band. Attribute references between
    * projections pin each to one pass.
    */
  private def bandKeys(docs: DataFrame, normF: Column => Column,
      shingleF: Column => Column, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    docs.select(col("id"), normF(col("t")).as("nt"))
      .select(col("id"), shingleF(col("nt")).as("sh"))
      // fused native signature (one md5/shingle, zero intermediate
      // allocation); values bit-identical to the composed
      // shingleHashes→signatureFromHashes form (parity-spec'd)
      .select(col("id"),
        graft.functions.MinHashSignature(col("sh"), numHashes).as("sig"))
      .withColumn("b", explode(sequence(lit(0), lit(bands - 1))))
      .select(lshBandKey(col("sig"), col("b"), rowsPerBand).as("band"), col("id"))
  }

  /** Shingle sets for ONLY the candidate ids: the semi-join on the
    * (small, broadcastable) id set sits below the shingle projection, so
    * verify-side shingling is O(candidates), not a second corpus pass.
    */
  private def shinglesFor(docs: DataFrame, ids: DataFrame,
      normF: Column => Column, shingleF: Column => Column,
      as: String, shAs: String): DataFrame = docs
    .join(ids, Seq("id"), "left_semi")
    .select(col("id"), normF(col("t")).as("nt"))
    .select(col("id").as(as), shingleF(col("nt")).as(shAs))

  private def bandedNearDups(docs: DataFrame, normF: Column => Column,
      shingleF: Column => Column,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    val banded = bandKeys(docs, normF, shingleF, numHashes, bands)
    // DISK_ONLY persist: the pair relation is referenced three times
    // below (the verify join + both candidate-id semi-joins); without
    // materializing it, each reference would re-run the whole band
    // pipeline. The cache substitution also keeps the deep signature
    // expression tree out of the consumers' plans. DISK_ONLY because
    // the pair count is corpus-dependent (dup-heavy corpora make it
    // large) — it must not compete for executor storage memory, and
    // unlike localCheckpoint the lineage survives executor loss.
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
      .transform(graft.util.GraftCache.barrier("DedupOps.bandedNearDups"))
    def candShingles(idsOf: Column, as: String, shAs: String) =
      shinglesFor(docs, pairs.select(idsOf.as("id")).distinct(),
        normF, shingleF, as, shAs)
    pairs
      .join(candShingles(col("id1"), "id1", "sh1"), "id1")
      .join(candShingles(col("id2"), "id2", "sh2"), "id2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Sketch-calibration audit: every LSH candidate pair with BOTH the
    * signature-estimated Jaccard (fraction of agreeing minhash
    * components — the estimator a system thresholds on when exact
    * verification is too expensive) and the exact shingle Jaccard, so
    * the estimator's error is measurable on the corpus itself. At
    * 100 TB this is the query that decides whether the verify join can
    * be dropped: same shuffle discipline as [[minhashNearDups]] —
    * band exchanges carry `(band, id)` scalars, candidate ids dedup as
    * bare pairs, and shingles + signatures re-derive for candidate
    * documents only (one pass computes both).
    */
  def minhashEstimatePairs(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 6, numHashes: Int = 12, bands: Int = 4): DataFrame = {
    val normF: Column => Column = TextOps.normalizeText
    val shingleF: Column => Column = nt => charShingles(nt, shingleK)
    val docs = df.select(col(idCol).as("id"), col(textCol).as("t"))
    val banded = bandKeys(docs, normF, shingleF, numHashes, bands)
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
      .transform(graft.util.GraftCache.barrier("DedupOps.minhashEstimatePairs"))
    def cand(idsOf: Column, as: String, shAs: String, sigAs: String) =
      docs.join(pairs.select(idsOf.as("id")).distinct(), Seq("id"), "left_semi")
        .select(col("id"), normF(col("t")).as("nt"))
        .select(col("id"), shingleF(col("nt")).as("sh"))
        .select(col("id").as(as), col("sh").as(shAs),
          graft.functions.MinHashSignature(col("sh"), numHashes).as(sigAs))
    pairs
      .join(cand(col("id1"), "id1", "sh1", "sig1"), "id1")
      .join(cand(col("id2"), "id2", "sh2", "sig2"), "id2")
      .select(col("id1"), col("id2"),
        (size(filter(zip_with(col("sig1"), col("sig2"),
          (x, y) => x === y), b => b)) / lit(numHashes.toDouble))
          .as("est_jaccard"),
        jaccard(col("sh1"), col("sh2")).as("jaccard"))
  }

  /** Near-dups of a new batch AGAINST an existing corpus: verified pairs
    * `(new_id, corpus_id, jaccard)` with `jaccard >= threshold` — the
    * incremental form of [[minhashNearDups]] for dedup-on-ingest: only
    * the new batch is banded against the corpus's band keys, instead of
    * re-running the corpus × corpus self-join every crawl.
    *
    * Id spaces of the two sides must be disjoint (pairs are (new,
    * corpus), not ordered by id).
    *
    * == 100 TB design ==
    *
    * Same shuffle discipline as [[bandedNearDups]]: both sides' band
    * exchanges carry `(band, id)` scalars only; candidate pairs
    * de-duplicate as bare ids; shingles re-derive per side for candidate
    * documents only (semi-join below the shingle projection). The corpus
    * band derivation is a deterministic map-only pass — in a standing
    * pipeline it would be *persisted once* as a `(band, id)` index table
    * and merely scanned per batch; the operator accepts that shape via
    * `corpusBands` (pass a pre-banded frame to skip re-derivation).
    */
  def incrementalNearDups(
      newBatch: DataFrame, corpus: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 6, numHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5,
      corpusBands: Option[DataFrame] = None): DataFrame = {
    val normF: Column => Column = TextOps.normalizeText
    val shingleF: Column => Column = nt => charShingles(nt, shingleK)
    def shaped(df: DataFrame) =
      df.select(col(idCol).as("id"), col(textCol).as("t"))
    val newDocs = shaped(newBatch)
    val corpusDocs = shaped(corpus)
    val newBands = bandKeys(newDocs, normF, shingleF, numHashes, bands)
    val corpusBanded = corpusBands.getOrElse(
      bandKeys(corpusDocs, normF, shingleF, numHashes, bands))
    val pairs = newBands.as("n").join(corpusBanded.as("c"),
        col("n.band") === col("c.band"))
      .select(col("n.id").as("new_id"), col("c.id").as("corpus_id"))
      .distinct()
      .transform(graft.util.GraftCache.barrier("DedupOps.shaped"))
    pairs
      .join(shinglesFor(newDocs, pairs.select(col("new_id").as("id")).distinct(),
        normF, shingleF, "new_id", "sh1"), "new_id")
      .join(shinglesFor(corpusDocs, pairs.select(col("corpus_id").as("id")).distinct(),
        normF, shingleF, "corpus_id", "sh2"), "corpus_id")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .where(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /** The persistable `(band, id)` index of [[incrementalNearDups]] for a
    * corpus — build once, write as a table, scan per crawl batch.
    */
  def nearDupBandIndex(corpus: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 6, numHashes: Int = 12, bands: Int = 4): DataFrame =
    bandKeys(corpus.select(col(idCol).as("id"), col(textCol).as("t")),
      TextOps.normalizeText, nt => charShingles(nt, shingleK), numHashes, bands)

  /** MinHash/LSH near-dup pipeline: shingle → signature → bands →
    * band-key self-join candidate pairs → exact-Jaccard verify. Returns
    * verified pairs `(id1, id2, jaccard)` with `jaccard >= threshold`,
    * id1 < id2, deduplicated across bands. No crossJoin anywhere; see
    * [[bandedNearDups]] for the shuffle/compute story.
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 6, numHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    bandedNearDups(
      df.select(col(idCol).as("id"), col(textCol).as("t")),
      TextOps.normalizeText, nt => charShingles(nt, shingleK),
      numHashes, bands, threshold)

  /** N-gram Jaccard near-dup: same bucketed pipeline over word n-grams
    * (the shingle granularity used for document-level crawl dedup).
    */
  def ngramNearDups(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, numHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    bandedNearDups(
      df.select(col(idCol).as("id"), col(textCol).as("t")),
      TextOps.normalizeText, nt => wordShingles(nt, n),
      numHashes, bands, threshold)

  /** Directional CONTAINMENT dedup (Broder's other resemblance measure,
    * the one Jaccard misses): `C(A,B) = |S(A)∩S(B)| / |S(A)|` flags a
    * document whose shingles are (mostly) a subset of another's — the
    * fragment/quote/mirror-page case where a small A inside a big B has
    * high containment but LOW Jaccard, so MinHash-banded near-dup
    * passes ([[minhashNearDups]]) structurally under-recall it.
    * Returns `(contained_id, container_id, n_shared, containment)` with
    * the smaller shingle set as the contained side (ties → lower id).
    *
    * == Candidate generation & 100 TB design ==
    *
    * Pairs come from SHARED SHINGLES, not minhash bands: a pair at
    * containment ≥ τ shares ≥ ⌈τ·|S(A)|⌉ ≥ 1 shingles, so recall is
    * complete — except pairs whose every shared shingle exceeds
    * `maxShingleDocs` documents (boilerplate-only overlap, exactly what
    * containment dedup should not fire on; the cap is the hot-key
    * guard that bounds the per-shingle pair fan-out at
    * `maxShingleDocs²`). Exchanges carry `(shingle, id)` scalars; the
    * verify step re-joins candidate ids against the per-doc shingle
    * ARRAYS (disk-persisted once), so document text never crosses
    * an exchange.
    */
  def containmentDups(df: DataFrame, textCol: String, idCol: String,
      n: Int = 4, threshold: Double = 0.8,
      maxShingleDocs: Int = 50): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"bad threshold: $threshold")
    require(maxShingleDocs >= 2, s"maxShingleDocs must be >= 2: $maxShingleDocs")
    val docs = df.select(col(idCol).as("id"),
        wordShingles(TextOps.normalizeText(col(textCol)), n).as("sh"))
      .where(size(col("sh")) > 0)
      .transform(graft.util.GraftCache.barrier("DedupOps.containmentDups.1"))
    val exploded = docs.select(col("id"), explode(col("sh")).as("g"))
    val rare = exploded.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxShingleDocs).select(col("g"))
    val capped = exploded.join(rare, "g")
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      .transform(graft.util.GraftCache.barrier("DedupOps.containmentDups.2"))
    val verified = pairs
      .join(docs.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(docs.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("n_shared", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("n1", size(col("sh1"))).withColumn("n2", size(col("sh2")))
      .withColumn("containment",
        col("n_shared").cast("double") / least(col("n1"), col("n2")))
      .where(col("containment") >= threshold)
    verified.select(
      when(col("n1") <= col("n2"), col("id1")).otherwise(col("id2")).as("contained_id"),
      when(col("n1") <= col("n2"), col("id2")).otherwise(col("id1")).as("container_id"),
      col("n_shared"), round(col("containment"), 6).as("containment"))
  }

  /** SOFT dedup: per-document training weights instead of drops —
    * `w(doc) = 1/|cluster|`, so each duplicate cluster contributes one
    * effective document to the training mix (Σw = effective corpus
    * size) while every surface form stays available. The down-weighting
    * alternative to [[nearDupSurvivors]] when duplicates carry signal
    * (popular pages ARE more important, just not |copies|× more).
    * Singletons weigh 1. Returns
    * `(doc_id, cluster_id, cluster_size, weight)`.
    *
    * Scale: labels come from [[clusterPairs]] (O(duplicates) rows);
    * the corpus joins them by id, sizes aggregate (cluster, count)
    * scalars — document text never moves.
    */
  def softDedupWeights(docs: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val labels = clusterPairs(pairs)
    val withLabel = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val sizes = withLabel.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    withLabel.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 6).as("weight"))
  }

  /** Pick LSH banding parameters for a target Jaccard threshold: among
    * the divisor pairs `bands × rowsPerBand = numHashes`, choose the
    * banding whose S-curve inflection `(1/b)^(1/r)` lands closest to
    * the target (ties → more bands, i.e. higher recall). This is the
    * knob every minhash deployment hand-tunes; returns
    * `(bands, rowsPerBand, inflection)`. Driver-side closed form —
    * feed the result straight into [[minhashNearDups]].
    */
  def lshParams(threshold: Double, numHashes: Int): (Int, Int, Double) = {
    require(threshold > 0.0 && threshold < 1.0, s"bad threshold: $threshold")
    require(numHashes >= 1, s"numHashes must be positive: $numHashes")
    val candidates = (1 to numHashes).filter(numHashes % _ == 0).map { b =>
      val r = numHashes / b
      (b, r, math.pow(1.0 / b, 1.0 / r))
    }
    // distance first, then PREFER more bands: at equal distance the
    // banding with more bands has the gentler low-similarity tail cut,
    // i.e. better recall at the threshold
    candidates.minBy { case (b, _, t) => (math.abs(t - threshold), -b) }
  }

  // shift-by-column via exact powers of two (values < 2^32, b <= 31)
  private def pow2(b: Column): Column = pow(lit(2.0), b).cast("long")
  private def bitAt(h: Column, b: Column): Column =
    pmod((h / pow2(b)).cast("long"), lit(2L))

  /** Per-token uint32 hashes (md5 prefix) of the distinct tokens of
    * already-normalized text — the SimHash input.
    */
  def tokenHashes(normalized: Column): Column =
    transform(array_distinct(split(normalized, " ")),
      t => conv(substring(md5(to_binary(t, lit("utf-8"))), 1, 8), 16, 10).cast("long"))

  /** Signed per-bit vote counts (+1 set / -1 clear per token hash),
    * folded in ONE pass over the token hashes carrying all 32 counters
    * (the staged-projection discipline of [[bandedNearDups]]: HOFs are
    * interpreted, so a per-bit aggregate over an inlined hash array
    * would re-run the md5 transform 32x).
    */
  def simhashCounts(hashes: Column): Column =
    aggregate(hashes, array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc, sequence(lit(0L), lit(31L)),
        (a, b) => a + bitAt(h, b) * 2L - 1L))

  /** Fingerprint from materialized vote counts: bit b is 1 iff count
    * b is positive. Reference `counts` as an attribute — it is read 32
    * times.
    */
  def simhashFromCounts(counts: Column): Column =
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) =>
      acc + when(element_at(counts, b + 1) > 0, lit(1L)).otherwise(lit(0L)) * pow2(b))

  /** 32-bit SimHash over word tokens: each token hashes (md5 → first 8
    * hex chars → uint32); bit b of the fingerprint is 1 iff more token
    * hashes have bit b set than not. Near-dups = small Hamming distance
    * (`bit_count(a ^ b)`). Convenience composition — pipelines should
    * stage [[tokenHashes]]/[[simhashCounts]]/[[simhashFromCounts]] as
    * separate projections (see [[simhashNearDups]]).
    */
  def simhash(c: Column): Column =
    simhashFromCounts(simhashCounts(tokenHashes(TextOps.normalizeText(c))))

  /** Hamming distance between two SimHash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs via multi-index blocking: the 32-bit
    * fingerprint splits into 4 disjoint 8-bit blocks, and any pair
    * within Hamming distance 3 must agree exactly on at least one block
    * (pigeonhole) — so candidates are pairs sharing a
    * `(block-index, block-bits)` key, verified with the exact
    * `bit_count(xor)`. No all-pairs comparison anywhere; the block
    * exchange carries `(key, id, fp)` — 8-byte fingerprints, never
    * documents.
    */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      s"4-block multi-index guarantees recall only for maxDist <= 3, got $maxDist")
    val fps = df
      .select(col(idCol).as("id"), TextOps.normalizeText(col(textCol)).as("nt"))
      .select(col("id"), tokenHashes(col("nt")).as("th"))
      .select(col("id"), simhashCounts(col("th")).as("cnt"))
      .select(col("id"), simhashFromCounts(col("cnt")).as("fp"))
    val blocked = fps
      .withColumn("b", explode(sequence(lit(0), lit(3))))
      .select(concat(col("b").cast("string"), lit(":"),
        pmod((col("fp") / pow2(col("b") * 8)).cast("long"), lit(256L)).cast("string"))
        .as("k"),
        col("id"), col("fp"))
    blocked.as("a").join(blocked.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        hammingDistance(col("a.fp"), col("b.fp")).cast("int").as("hamming"))
      .where(col("hamming") <= maxDist)
      .dropDuplicates("id1", "id2")
  }

  /** Paragraph-level boilerplate removal (the CCNet/C4 sub-document
    * dedup step): a paragraph occurring in MORE THAN `maxDocFrequency`
    * distinct documents is boilerplate (nav bars, footers, cookie
    * banners) and every occurrence of it is removed from every document;
    * the surviving paragraphs are re-joined in their original order.
    * `textCol` is replaced with the cleaned text; `n_paras` (original
    * paragraph count) and `n_dropped` (occurrences removed) are
    * appended. Documents whose every paragraph is boilerplate keep an
    * empty string.
    *
    * == 100 TB design ==
    *
    * Paragraph text never crosses an exchange. The exploded relation
    * projects to `(id, pos, md5)` scalars before any shuffle and is
    * disk-persisted (it feeds both the frequency count and the
    * dropped-position join — without materializing, the corpus would
    * split-and-explode twice; DISK_ONLY because the relation is
    * corpus-scaled). Document frequency aggregates 16-byte
    * hashes with map-side combine; the dropped set is O(boilerplate),
    * and the per-document dropped-position lists — one row per
    * *affected* document — join back to the corpus by id (AQE broadcasts
    * that side when it fits, keeping the corpus scan map-only). The
    * rebuild is a positional higher-order filter over the re-split text,
    * so cleaned text is produced where the document already lives.
    */
  def dedupParagraphs(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n", maxDocFrequency: Int = 1): DataFrame = {
    require(maxDocFrequency >= 1,
      s"maxDocFrequency must be >= 1, got $maxDocFrequency")
    val qsep = java.util.regex.Pattern.quote(sep)
    val paras = split(col(textCol), qsep)
    // (id, pos, hash) — one row per paragraph occurrence, text dropped
    // map-side; checkpointed because it is consumed twice below
    val posed = df
      .select(col(idCol).as("__id"), posexplode(paras).as(Seq("__pos", "__p")))
      .select(col("__id"), col("__pos"),
        unhex(md5(to_binary(col("__p"), lit("utf-8")))).as("__h"))
      .transform(graft.util.GraftCache.barrier("DedupOps.dedupParagraphs"))
    // document frequency = distinct docs containing the paragraph
    val dropped = posed.select(col("__id"), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .where(col("__c") > maxDocFrequency)
      .select(col("__h"))
    val dropPos = posed.join(dropped, Seq("__h"), "left_semi")
      .groupBy(col("__id")).agg(collect_set(col("__pos")).as("__dp"))
    val emptyPos = array().cast("array<int>")
    df.join(dropPos, df(idCol) === dropPos("__id"), "left")
      .withColumn("__dp", coalesce(col("__dp"), emptyPos))
      .withColumn("n_paras", size(paras))
      .withColumn("n_dropped", size(col("__dp")))
      .withColumn(textCol, array_join(
        filter(paras, (p, i) => !array_contains(col("__dp"), i)), sep))
      .drop("__id", "__dp")
  }

  /** Exact duplicated-span detection (the word-level form of the
    * suffix-array exact-substring dedup in "Deduplicating Training Data
    * Makes Language Models Better", Lee et al. 2021): every sliding
    * `window`-word run whose md5 occurs in at least `minDocs` distinct
    * documents marks its word positions as duplicated, and overlapping /
    * adjacent duplicated positions merge into maximal spans. Returns one
    * row per input document:
    * `(idCol, n_words, dup_words, dup_frac, n_spans)`.
    *
    * A span here is a maximal island of covered word positions — two
    * windows at `p` and `p+window` (touching, not overlapping) belong to
    * the same span, mirroring the character-run semantics of the
    * suffix-array formulation.
    *
    * == 100 TB design ==
    *
    * A true distributed suffix array is unnecessary for fixed-length
    * windows: the rolling-window hash relation `(id, pos, 16-byte md5)`
    * carries everything the span merge needs and is projected map-side —
    * document text never crosses an exchange. Frequency counting
    * aggregates distinct `(hash, id)` pairs with map-side combine; the
    * duplicated-hash set is O(duplicated windows) and joins back
    * semi-style (AQE broadcasts it when small). Interval merging is a
    * higher-order `aggregate` fold over each document's sorted dup
    * positions — covered positions are never exploded, so per-doc state
    * through the exchange is one int per duplicated window, not one per
    * covered word.
    */
  def duplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      window: Int = 8, minDocs: Int = 2): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val w = window
    val words = filter(graft.functions.WsTokens(col(textCol), lowercase = true), t => t =!= "")
    // stage words once (split is interpreted; see the scaladoc pattern
    // on minhashNearDups), then derive (id, pos, hash) and drop text
    val staged = df.select(col(idCol).as("__id"), words.as("__ws"))
      .select(col("__id"), col("__ws"), size(col("__ws")).as("__nw"))
    val winHashes = when(col("__nw") >= w,
      transform(sequence(lit(1), col("__nw") - w + 1),
        p => unhex(md5(to_binary(array_join(slice(col("__ws"), p, lit(w)), " "),
          lit("utf-8"))))))
      .otherwise(array().cast("array<binary>"))
    // one row per window occurrence: (id, 1-based pos, hash) — consumed
    // twice below (frequency count + per-doc dup positions). r17: the
    // hash is the 16-byte md5 BINARY (the width the scaladoc always
    // claimed), not the 32-char hex string — halves the barrier and
    // both hash exchanges (guide §2.3)
    val posed = staged
      .select(col("__id"), posexplode(winHashes).as(Seq("__pz", "__h")))
      .select(col("__id"), (col("__pz") + 1).as("__pos"), col("__h"))
      .transform(graft.util.GraftCache.barrier("DedupOps.duplicatedSpans"))
    val dupHashes = posed.select(col("__id"), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minDocs)
      .select(col("__h"))
    // sorted dup-window positions per affected doc, folded into
    // (covered word count, island count): a window at p covers
    // [p, p+w-1]; a new island starts when p clears the previous
    // coverage by more than one position
    val folded = aggregate(sort_array(col("__ps")),
      struct(lit(0).as("cov"), lit(0).as("sp"), lit(-w - 1).as("end")),
      (acc, p) => struct(
        when(p > acc("end"), acc("cov") + w)
          .otherwise(acc("cov") + greatest(p + w - 1 - acc("end"), lit(0)))
          .as("cov"),
        when(p > acc("end") + 1, acc("sp") + 1).otherwise(acc("sp")).as("sp"),
        greatest(acc("end"), p + w - 1).as("end")))
    val perDoc = posed.join(dupHashes, Seq("__h"), "left_semi")
      .groupBy(col("__id")).agg(collect_list(col("__pos")).as("__ps"))
      .select(col("__id"), folded.as("__m"))
    staged.select(col("__id"), col("__nw"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        col("__nw").cast("long").as("n_words"),
        coalesce(col("__m.cov"), lit(0)).cast("long").as("dup_words"),
        round(coalesce(col("__m.cov"), lit(0)).cast("double") /
          greatest(col("__nw"), lit(1)), 6).as("dup_frac"),
        coalesce(col("__m.sp"), lit(0)).cast("long").as("n_spans"))
  }

  /** The destructive half of [[duplicatedSpans]]: REMOVE every
    * duplicated span from every document (the remediation step of the
    * suffix-array dedup — Lee et al. cut the repeated substring from
    * all but one occurrence; this removes all occurrences, the stricter
    * form that also kills boilerplate). `textCol` is replaced with the
    * cleaned, space-rejoined text; `n_words` and `dup_words` are
    * appended. Normalization (lowercase, whitespace-split) is applied
    * before comparison, so the rebuilt text is normalized.
    *
    * == 100 TB design ==
    *
    * Identical exchange discipline to [[duplicatedSpans]] — `(id, pos,
    * 16-byte hash)` only; the rebuild joins each affected document's
    * dup-window START LIST (one int per duplicated window) back by id
    * and drops covered words with a higher-order filter where the
    * document already lives. The membership test is O(words × starts)
    * per doc — fine for boilerplate-level duplication; a pathological
    * all-duplicate doc degrades gracefully (its text empties).
    */
  def removeDuplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      window: Int = 8, minDocs: Int = 2): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val w = window
    val words = filter(graft.functions.WsTokens(col(textCol), lowercase = true), t => t =!= "")
    val others = df.columns.filterNot(_ == textCol).toSeq
    val staged = df.select(
      (col(idCol).as("__id") +: words.as("__ws") +: others.map(col)): _*)
    // r17: 16-byte md5 binary window hashes (internal keys; guide §2.3)
    val winHashes = when(size(col("__ws")) >= w,
      transform(sequence(lit(1), size(col("__ws")) - w + 1),
        p => unhex(md5(to_binary(array_join(slice(col("__ws"), p, lit(w)), " "),
          lit("utf-8"))))))
      .otherwise(array().cast("array<binary>"))
    val posed = staged
      .select(col("__id"), posexplode(winHashes).as(Seq("__pz", "__h")))
      .select(col("__id"), (col("__pz") + 1).as("__pos"), col("__h"))
      .transform(graft.util.GraftCache.barrier("DedupOps.removeDuplicatedSpans"))
    val dupHashes = posed.select(col("__id"), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minDocs)
      .select(col("__h"))
    val starts = posed.join(dupHashes, Seq("__h"), "left_semi")
      .groupBy(col("__id")).agg(sort_array(collect_list(col("__pos"))).as("__st"))
    val emptyStarts = array().cast("array<int>")
    val covered = (i: Column) =>
      exists(col("__st"), s => s <= i && i < s + w)
    staged.join(starts, Seq("__id"), "left")
      .withColumn("__st", coalesce(col("__st"), emptyStarts))
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn("dup_words",
        size(filter(transform(col("__ws"), (_, i0) => covered(i0 + 1)),
          c => c)).cast("long"))
      .withColumn(textCol, array_join(
        filter(col("__ws"), (_, i0) => !covered(i0 + 1)), " "))
      .select((col(textCol) +: others.map(col)) ++
        Seq(col("n_words"), col("dup_words")): _*)
  }

  /** Connected components over an undirected near-dup pair set (the
    * `id1 < id2` rows of [[minhashNearDups]] and friends): every
    * document appearing in a pair is labeled with the MINIMUM doc id
    * reachable through the pair graph — the canonical representative of
    * its duplicate cluster. Returns `(doc_id, cluster_id)`.
    *
    * Pairs alone cannot drive deletion: with A~B and B~C, picking a
    * survivor per *pair* keeps two of the three copies. The transitive
    * cluster is what a dedup pipeline actually deletes with
    * ([[nearDupSurvivors]]).
    *
    * == 100 TB design ==
    *
    * Iterative min-label propagation: labels start as each node's own
    * id, and each round takes the min over the 1-hop neighborhood,
    * converging in O(component diameter) rounds. Near-dup graphs are
    * overwhelmingly star/clique-shaped (a crawl's copies all pair with
    * each other or with a hub), so the diameter — and the round count —
    * stays small; `maxIters` guards the pathological chain case
    * (throwing beats silently-unconverged clusters). Every round
    * shuffles only `(id, label)` longs plus the symmetrized edge list —
    * never document payloads — and each round's result is
    * `localCheckpoint`ed so the plan does not deepen with the iteration
    * count (the edge list is checkpointed once and re-joined each
    * round). Convergence is a driver-side scalar per round (the count
    * of labels that changed).
    */
  def clusterPairs(pairs: DataFrame, id1: String = "id1",
      id2: String = "id2", maxIters: Int = 25): DataFrame = {
    val e = pairs.select(col(id1).cast("long").as("src"),
      col(id2).cast("long").as("dst"))
    val edges = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labelsCkpt = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var labels = labelsCkpt
    var changed = 1L
    var iters = 0
    while (changed > 0) {
      if (iters >= maxIters)
        throw new IllegalStateException(
          s"clusterPairs did not converge in $maxIters rounds — " +
            "component diameter exceeds the guard; raise maxIters")
      // every pair-graph node has >= 1 neighbor, so the inner join
      // covers the full label set
      val nbrMin = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbrLabel"))
      val next = labels.withColumnRenamed("label", "prev")
        .join(nbrMin, "id")
        .select(col("id"), col("prev"), least(col("prev"), col("nbrLabel")).as("label"))
        .localCheckpoint(true)
      changed = next.where(col("label") < col("prev")).count()
      // `changed` was the previous generation's last reader — free its
      // MEMORY_AND_DISK blocks through the RDD handle (Dataset.unpersist
      // on a checkpointed Dataset is a silent no-op; GraftCache doc).
      // Without this every round leaked one generation until
      // ContextCleaner GC.
      graft.util.GraftCache.releaseCheckpointOf(labelsCkpt)
      labelsCkpt = next
      labels = next.select(col("id"), col("label"))
      iters += 1
    }
    // the returned projection reads only the final round's checkpoint —
    // the (symmetrized-edge-list-sized) edges checkpoint is dead
    graft.util.GraftCache.releaseCheckpointOf(edges)
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Near-dup deduplication end to end: keep every document that is its
    * cluster's canonical (minimum-id) member, plus every document that
    * never appeared in a pair. The drop set is the non-canonical cluster
    * members — O(duplicates), tiny next to the corpus — so the corpus
    * itself is scanned once, map-only, through a `left_anti` join (AQE
    * broadcasts the drop side when it fits).
    */
  def nearDupSurvivors(docs: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val drops = clusterPairs(pairs)
      .where(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id").as("__drop_id"))
    docs.join(drops, docs(idCol) === col("__drop_id"), "left_anti")
  }

  /** [[nearDupSurvivors]] with a QUALITY policy (the FineWeb-style
    * refinement): each duplicate cluster keeps its highest-`qualityCol`
    * member (ties → lowest id) instead of the lowest id, so the best
    * representative of every duplicate group — not an arbitrary one —
    * reaches the training set. Unpaired docs always survive.
    *
    * Scale shape: clusters/pairs are a tiny fraction of the corpus; the
    * winner per cluster is one `max_by` over (quality, −id) tuples —
    * scalar exchanges only — and the corpus is touched exactly once, by
    * the final left-anti scan against the drop list.
    */
  def qualitySurvivors(docs: DataFrame, pairs: DataFrame,
      idCol: String, qualityCol: Column): DataFrame = {
    val clusters = clusterPairs(pairs)
    val scored = docs.select(col(idCol).as("__sid"),
      qualityCol.cast("double").as("__q"))
    val best = clusters.join(scored, col("doc_id") === col("__sid"))
      .groupBy(col("cluster_id"))
      .agg(max_by(col("doc_id"),
        struct(col("__q"), (-col("doc_id")).as("__nid"))).as("__keep_id"))
    val drops = clusters.join(best, "cluster_id")
      .where(col("doc_id") =!= col("__keep_id"))
      .select(col("doc_id").as("__drop_id"))
    docs.join(drops, docs(idCol) === col("__drop_id"), "left_anti")
  }
}
