package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * (hash-based) sampling and splits, stratified per-group budgets, and
  * train/test contamination detection by n-gram overlap.
  *
  * == Why hash-based, not `df.sample` ==
  *
  * `sample()` draws from a seeded RNG over the *physical* row order, so
  * the chosen set changes with partitioning, file layout, and engine
  * version. Keyed hashing makes selection a pure function of the row's
  * key: reproducible across runs, engines (the DuckDB oracle computes
  * the identical md5 arithmetic), cluster sizes, and data layout —
  * and membership is stable under corpus growth (a doc's fate never
  * changes because other docs arrived). That is the property training
  * pipelines need for frozen eval splits and resumable curation.
  *
  * == 100 TB design ==
  *
  * [[hashSample]] / [[hashSplit]] are MAP-ONLY: one md5 per row, no
  * shuffle, fully pushed into the scan stage. [[stratifiedSample]]
  * ranks within strata, which must shuffle `(stratum, key)` — but the
  * rank-filter is a `row_number() <= k` pattern that Spark's
  * WindowGroupLimit rewrite turns into a map-side per-partition top-k
  * before the exchange, so the shuffle carries O(strata × k) rows, not
  * the corpus. [[ngramContamination]] exchanges only (16-byte ngram
  * hash, id) pairs — never document text.
  */
object CurationOps {

  /** Deterministic uniform draw in [0,1): the first 8 md5 hex chars of
    * `key:salt` as a uint32, scaled by 2^-32. Changing the salt yields
    * an independent draw (fresh sample/split without touching the key).
    */
  def hashUnit(key: Column, salt: String): Column =
    conv(substring(md5(to_binary(
      concat(key.cast("string"), lit(":" + salt)), lit("utf-8"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Keep each row iff its key's uniform draw falls below `fraction` —
    * a reproducible Bernoulli sample, exact in expectation.
    */
  def hashSample(df: DataFrame, fraction: Double, keyCol: String,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    df.where(hashUnit(col(keyCol), salt) < fraction)
  }

  /** Deterministic n-way split id in [0, n): `floor(u * n)`. Rows with
    * the same key always land in the same split — the standard
    * train/val/test assignment for frozen eval sets.
    */
  def hashBucket(key: Column, n: Int, salt: String = ""): Column =
    floor(hashUnit(key, salt) * n).cast("int")

  /** Attach a `split` column partitioning the frame into `n` equal
    * hash-buckets (see [[hashBucket]]).
    */
  def hashSplit(df: DataFrame, n: Int, keyCol: String,
      salt: String = ""): DataFrame =
    df.withColumn("split", hashBucket(col(keyCol), n, salt))

  /** Deterministic per-stratum budget: the `perStratum` rows of each
    * stratum with the lowest hash draw (ties broken by key). The
    * canonical "cap every language/source at N documents" curation step;
    * because selection is hash-ranked, shrinking the budget yields a
    * subset of the larger budget's picks.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, perStratum: Int,
      keyCol: String, salt: String = ""): DataFrame = {
    require(perStratum > 0, s"perStratum must be positive: $perStratum")
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__u"), col(keyCol))
    df.withColumn("__u", hashUnit(col(keyCol), salt))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= perStratum)
      .drop("__u", "__rk")
  }

  /** Train→test contamination by word n-gram overlap: for every test
    * document, the fraction of its distinct word `n`-grams that occur
    * anywhere in the train corpus. Returns
    * `(id, n_ngrams, n_overlap, overlap_ratio)` — one row per test doc,
    * ratio 0.0 when the doc is too short to form an n-gram. Rank by
    * `overlap_ratio` (≈1.0 = the eval doc leaked into training).
    *
    * Shuffle discipline: both sides reduce to 16-byte md5 ngram hashes
    * before any exchange (the train side additionally distinct-ed), so
    * the join moves O(distinct ngrams) hashes, never text. The final
    * per-doc counts aggregate scalar (id, counts) rows.
    */
  def ngramContamination(train: DataFrame, test: DataFrame,
      textCol: String, idCol: String, n: Int = 8): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol).as("id"), TextOps.normalizeText(col(textCol)).as("nt"))
      .select(col("id"), DedupOps.wordShingles(col("nt"), n).as("ng"))
    val trainH = grams(train)
      .select(explode(col("ng")).as("g"))
      .select(md5(to_binary(col("g"), lit("utf-8"))).as("h"))
      .distinct()
    val testG = grams(test)
    val totals = testG.select(col("id"), size(col("ng")).as("n_ngrams"))
    val hits = testG
      .select(col("id"), explode(col("ng")).as("g"))
      .select(col("id"), md5(to_binary(col("g"), lit("utf-8"))).as("h"))
      .join(trainH, Seq("h"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_overlap"))
    totals.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_ngrams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(when(col("n_ngrams") === 0, lit(0.0))
          .otherwise(coalesce(col("n_overlap"), lit(0L)).cast("double") /
            col("n_ngrams").cast("double")), 6).as("overlap_ratio"))
  }
}
