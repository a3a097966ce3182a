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
    df.groupBy(md5(to_binary(col(textCol), lit("utf-8"))).as("__h"))
      .agg(min_by(struct(col(textCol) +: others.map(col): _*), col(idCol)).as("__r"))
      .select(col(s"__r.$textCol") +: others.map(f => col(s"__r.$f")): _*)
  }

  private val emptyStrArray = array().cast("array<string>")

  /** Character k-gram shingle set (distinct), the MinHash input. */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      array_distinct(transform(
        sequence(lit(1), length(c) - (k - 1)),
        i => c.substr(i, lit(k)))))
      .otherwise(emptyStrArray)

  /** Word n-gram shingle set (distinct). */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = split(trim(c), "\\s+")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(emptyStrArray)
  }

  /** MinHash signature: for seed j, `min(md5(j || '_' || shingle))` —
    * md5 plays the universal hash family, min over hex strings is a
    * uniform min-hash. Engine-portable by construction.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(j =>
      array_min(transform(shingles, s => md5(to_binary(concat(lit(s"$j"), lit("_"), s), lit("utf-8")))))): _*)

  /** LSH band keys: signature sliced into `bands` rows-per-band groups,
    * each band hashed to one key. Two docs share a band key iff their
    * signature slice matches exactly.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      concat(lit(s"$b:"), md5(to_binary(
        concat_ws("|", slice(signature, b * rowsPerBand + 1, rowsPerBand)), lit("utf-8"))))): _*)

  /** Jaccard similarity of two (distinct-element) shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Banded LSH candidate-pair pipeline shared by [[minhashNearDups]]
    * and [[ngramNearDups]], taking a prepared `(id, sh)` frame.
    *
    * == 100 TB shuffle discipline ==
    * The band self-join exchanges ONLY `(band, id)` — a 16-byte band key
    * plus the id — never the shingle arrays (≈ document size):
    * signatures are consumed map-side to derive band keys and dropped
    * before the exchange, so band-exchange volume is O(bands × ids), not
    * O(bands × corpus bytes). Candidate pairs de-duplicate as bare
    * `(id1, id2)`, then the shingle sets are joined back BY ID for the
    * exact-Jaccard verify — with pairs ≪ corpus, AQE broadcasts the pair
    * side and the corpus is never shuffled at all. `PlanAuditSpec`
    * guards the band exchange's payload.
    */
  private def bandedNearDups(sh: DataFrame, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    val rowsPerBand = numHashes / bands
    val banded = sh
      .withColumn("band",
        explode(lshBands(minhashSignature(col("sh"), numHashes), bands, rowsPerBand)))
      .select(col("band"), col("id"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val left = sh.select(col("id").as("id1"), col("sh").as("sh1"))
    val right = sh.select(col("id").as("id2"), col("sh").as("sh2"))
    pairs.join(left, "id1").join(right, "id2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** MinHash/LSH near-dup pipeline: shingle → signature → bands →
    * band-key self-join candidate pairs → exact-Jaccard verify. Returns
    * verified pairs `(id1, id2, jaccard)` with `jaccard >= threshold`,
    * id1 < id2, deduplicated across bands. No crossJoin anywhere; see
    * [[bandedNearDups]] for the shuffle story.
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 6, numHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    bandedNearDups(
      df.select(col(idCol).as("id"),
        charShingles(TextOps.normalizeText(col(textCol)), shingleK).as("sh")),
      numHashes, bands, threshold)

  /** N-gram Jaccard near-dup: same bucketed pipeline over word n-grams
    * (the shingle granularity used for document-level crawl dedup).
    */
  def ngramNearDups(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, numHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    bandedNearDups(
      df.select(col(idCol).as("id"),
        wordShingles(TextOps.normalizeText(col(textCol)), n).as("sh")),
      numHashes, bands, threshold)

  /** 32-bit SimHash over word tokens: each token hashes (md5 → first 8
    * hex chars → uint32); bit b of the fingerprint is 1 iff more token
    * hashes have bit b set than not. Near-dups = small Hamming distance
    * (`bit_count(a ^ b)`), bucketable by fingerprint prefix.
    */
  def simhash(c: Column): Column = {
    val toks = array_distinct(split(TextOps.normalizeText(c), " "))
    val hashes = transform(toks, t =>
      conv(substring(md5(to_binary(t, lit("utf-8"))), 1, 8), 16, 10).cast("long"))
    // shift-by-column via exact powers of two (h < 2^32, b <= 31)
    def pow2(b: Column): Column = pow(lit(2.0), b).cast("long")
    def bitAt(h: Column, b: Column): Column = pmod((h / pow2(b)).cast("long"), lit(2L))
    val bits = transform(sequence(lit(0), lit(31)), b =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + bitAt(h, b) * 2L - 1L) > 0, lit(1L))
        .otherwise(lit(0L)))
    aggregate(sequence(lit(0), lit(31)), lit(0L),
      (acc, b) => acc + element_at(bits, b + 1) * pow2(b))
  }

  /** Hamming distance between two SimHash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
