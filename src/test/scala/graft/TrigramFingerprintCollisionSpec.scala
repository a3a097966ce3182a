package graft

import graft.llm.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DECLARED APPROXIMATION of the 64-bit token fingerprints in
  * [[TextOps.withTrigramBackoff]] (r17 verdict item 3): a fingerprint
  * collision between two token TYPES merges their counts in every
  * n-gram relation — i.e. the scores computed under a colliding
  * fingerprint are EXACTLY the scores of the corpus in which the
  * colliding types are identified (replaced by one representative).
  * A real xxhash64 collision cannot be constructed on demand, so the
  * test injects `pmod(xxhash64(token), k)` — every token collides with
  * every other token in its residue class — and compares against the
  * standard implementation run over the merged-vocabulary corpus whose
  * tokens ARE the residue classes.
  *
  * Also pins the no-collision direction: with the production
  * fingerprint, the tiny-vocabulary fixture scores equal the exact
  * string-keyed reference (the oracle pins this at the tested SFs; here
  * it is pinned structurally, without DuckDB).
  */
class TrigramFingerprintCollisionSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("trigram-fp-collision")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // a corpus whose vocabulary is large enough that pmod(.,k) actually
  // collides distinct types, with a real train/test split and genuine
  // backoff (test has trigrams/bigrams/unigrams unseen in train)
  private def corpus = docs(
    0L -> "alpha beta gamma delta epsilon zeta alpha beta gamma",
    2L -> "beta gamma delta eta theta alpha beta delta",
    4L -> "gamma delta epsilon alpha eta beta theta gamma delta",
    6L -> "delta epsilon zeta eta alpha gamma beta",
    1L -> "alpha beta gamma delta unseen epsilon zeta",
    3L -> "beta gamma delta alpha beta gamma novel words here",
    5L -> "totally fresh trigram stream nothing shared",
    7L -> "eta theta alpha beta gamma delta epsilon")

  private def split(df: org.apache.spark.sql.DataFrame) = (
    df.where(col("doc_id") % 2 === 0),
    df.where(col("doc_id") % 2 === 1))

  test("colliding fingerprints score exactly the merged-vocabulary corpus") {
    for (k <- Seq(2, 3, 5)) {
      val (train, test) = split(corpus)
      val collided = TextOps.withTrigramBackoffFp(train, test,
        "text", "doc_id", t => pmod(xxhash64(t), lit(k.toLong)))
        .orderBy("doc_id").collect().toSeq

      // merged corpus: every token replaced by its residue-class
      // representative ("c<residue>") — string-exact scoring over it is
      // the DECLARED meaning of a collision
      val mergeTok = (c: org.apache.spark.sql.Column) =>
        concat(lit("c"), pmod(xxhash64(c), lit(k.toLong)).cast("string"))
      val merged = corpus.withColumn("text",
        array_join(transform(split_part_tokens(col("text")), mergeTok), " "))
      val (mTrain, mTest) = split(merged)
      val exact = TextOps.withTrigramBackoff(mTrain, mTest, "text", "doc_id")
        .orderBy("doc_id").collect().toSeq

      assert(collided == exact,
        s"k=$k: collided scores diverge from merged-corpus exact scores\n" +
          s"collided: ${collided.mkString("\n")}\nexact: ${exact.mkString("\n")}")
    }
  }

  test("production fingerprint equals string-exact scoring on a collision-free vocabulary") {
    val (train, test) = split(corpus)
    val prod = TextOps.withTrigramBackoff(train, test, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    // string-exact reference: fingerprint = the token's own identity
    // carried through a collision-free injection (tokens here are
    // lowercase ascii words; dense_rank over the global vocabulary)
    import spark.implicits._
    val vocab = corpus
      .select(explode(graft.functions.WsTokens(
        TextOps.normalizeText(col("text")))).as("t"))
      .where(col("t") =!= "").distinct()
      .orderBy("t").collect().map(_.getString(0)).zipWithIndex.toMap
    val vocabB = spark.sparkContext.broadcast(vocab)
    val idFp = (c: org.apache.spark.sql.Column) => {
      // build a literal CASE mapping token -> dense id (collision-free
      // by construction)
      vocabB.value.foldLeft(when(lit(false), lit(0L))) {
        case (acc, (tok, id)) => acc.when(c === lit(tok), lit(id.toLong))
      }.otherwise(lit(-1L))
    }
    val exact = TextOps.withTrigramBackoffFp(train, test, "text", "doc_id", idFp)
      .orderBy("doc_id").collect().toSeq
    assert(prod == exact,
      s"production fingerprints diverge from exact on a collision-free fixture\n" +
        s"prod: ${prod.mkString("\n")}\nexact: ${exact.mkString("\n")}")
  }

  /** The same whitespace tokenization the operator applies, exposed for
    * the merged-corpus construction. */
  private def split_part_tokens(c: org.apache.spark.sql.Column) =
    filter(graft.functions.WsTokens(TextOps.normalizeText(c)), t => t =!= "")
}
