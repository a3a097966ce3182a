package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.llm.{CurationOps, TextOps, UrlOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus curation operators: URL canonicalization + registered
  * domain + per-domain caps, and hashed-feature classifier scoring.
  * URLs are synthesized deterministically from `documents` (the corpus
  * has no URL column) with the messiness the normalizer must handle —
  * uppercase scheme/host, default port, www, tracking params, fragments,
  * subdomains under two- and three-label public suffixes — built by the
  * IDENTICAL expression in both engines, so the oracle checks the
  * normalization itself, not the synthesis.
  */
object WebQueries extends QueryPack {

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery("t8_url_canonical",
      (s, dir) => {
        val tld = element_at(
          array(lit("co.uk"), lit("com"), lit("org"), lit("io")),
          (col("doc_id") % 4 + 1).cast("int"))
        val q = when(col("doc_id") % 3 === 0, lit("?utm_source=feed&q=1&gclid=xyz"))
          .when(col("doc_id") % 3 === 1, lit("?ref=home"))
          .otherwise(lit(""))
        val url = concat(lit("HTTPS://WWW.Src"), (col("doc_id") % 23).cast("string"),
          lit(".Example."), tld, lit(":443/Path/"), col("doc_id").cast("string"),
          q, lit("#frag"))
        val normed = Tables.load(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .withColumn("norm_url", UrlOps.normalizeUrl(col("url")))
          .withColumn("domain", UrlOps.urlDomain(col("url")))
        // per-domain cap: keep the 5 hash-ranked docs of each registered
        // domain (subdomains collapse onto it), flag the rest
        val w = Window.partitionBy(col("domain"))
          .orderBy(CurationOps.hashUnit(col("doc_id"), "cap"), col("doc_id"))
        normed.withColumn("kept", row_number().over(w) <= 5)
          .select(col("doc_id"), col("norm_url"), col("domain"), col("kept"))
      },
      oracle = Some(
        raw"""WITH u AS (
           |  SELECT doc_id,
           |         'HTTPS://WWW.Src' || (doc_id % 23) || '.Example.' ||
           |         (CASE doc_id % 4 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com'
           |                          WHEN 2 THEN 'org' ELSE 'io' END) ||
           |         ':443/Path/' || doc_id ||
           |         (CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&q=1&gclid=xyz'
           |                          WHEN 1 THEN '?ref=home' ELSE '' END) ||
           |         '#frag' AS url
           |  FROM documents),
           |parts AS (
           |  SELECT doc_id, url,
           |         lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
           |         lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
           |         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
           |  FROM u),
           |hosts AS (
           |  SELECT doc_id, url, scheme,
           |         regexp_replace(
           |           CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
           |                WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
           |                ELSE hostport END, '^www\.', '') AS host,
           |         regexp_extract(rest, '^([^?]*)', 1) AS path,
           |         regexp_replace(regexp_replace(
           |           '&' || regexp_extract(rest, '\?(.*)$$', 1),
           |           '&(utm_[^=&]*|gclid|fbclid|msclkid|ref)=[^&]*', '', 'g'),
           |           '^&', '') AS cleanq
           |  FROM parts),
           |n AS (
           |  SELECT doc_id,
           |         scheme || '://' || host ||
           |         (CASE WHEN path = '' THEN '/' ELSE path END) ||
           |         (CASE WHEN cleanq = '' THEN '' ELSE '?' || cleanq END) AS norm_url,
           |         CASE WHEN regexp_extract(host,
           |                '([^.]+\.(?:co|com|net|org|gov|ac|edu)\.[a-z][a-z])$$', 1) <> ''
           |              THEN regexp_extract(host,
           |                '([^.]+\.(?:co|com|net|org|gov|ac|edu)\.[a-z][a-z])$$', 1)
           |              WHEN regexp_extract(host, '([^.]+\.[^.]+)$$', 1) <> ''
           |              THEN regexp_extract(host, '([^.]+\.[^.]+)$$', 1)
           |              ELSE host END AS domain
           |  FROM hosts)
           |SELECT doc_id, norm_url, domain,
           |       row_number() OVER (
           |         PARTITION BY domain
           |         ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':cap'), 1, 8))::BIGINT
           |                    / 4294967296.0, doc_id) <= 5 AS kept
           |FROM n""".stripMargin)),

    GraftQuery("t10_corpus_stats",
      // per-source corpus profile: doc counts, exact length moments and
      // exact interpolated percentiles, language diversity — the
      // one-scan summary a curation run reports per shard. Exact
      // percentile is a single-pass sort-based aggregate per group;
      // at 100 TB the same query swaps percentile() for
      // percentile_approx() (one t-digest per group, no per-group sort)
      // with no other change.
      (s, dir) => Tables.load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))").as("pcts"),
          countDistinct(col("lang")).as("n_langs"))
        .select(col("source"), col("n_docs"), col("avg_chars"),
          round(element_at(col("pcts"), 1), 6).as("p50_chars"),
          round(element_at(col("pcts"), 2), 6).as("p90_chars"),
          round(element_at(col("pcts"), 3), 6).as("p99_chars"),
          col("n_langs")),
      oracle = Some(
        """SELECT source, count(*) AS n_docs,
          |       round(avg(n_chars), 6) AS avg_chars,
          |       round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
          |       round(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
          |       round(quantile_cont(n_chars, 0.99), 6) AS p99_chars,
          |       count(DISTINCT lang) AS n_langs
          |FROM documents GROUP BY source""".stripMargin)),

    GraftQuery("a30_cms_heavy_hitters",
      // count-min heavy hitters over the corpus token stream: the top-20
      // exact-count tokens with their sketch estimates side by side —
      // every estimate must dominate its exact count (collisions only
      // add), and the md5-salted bucket arithmetic is integer-exact so
      // the oracle replays the whole sketch byte-for-byte
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(explode(filter(
            graft.functions.WsTokens(TextOps.normalizeText(col("text"))),
            t => length(t) > 0)).as("token"))
        val sketch = graft.operators.SketchOps.countMin(toks, "token",
          depth = 4, width = 64)
        val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
        val est = graft.operators.SketchOps.cmsEstimate(
          exact.select(col("token")), sketch, "token", depth = 4, width = 64)
        val top = exact.join(est, "token")
          .orderBy(col("exact_cnt").desc, col("token")).limit(20)
        top.withColumn("rank", row_number().over(
            Window.orderBy(col("exact_cnt").desc, col("token"))))
          .select(col("token"), col("exact_cnt"), col("est_cnt"), col("rank"))
      },
      oracle = Some(
        raw"""WITH toks AS (
           |  SELECT unnest(list_filter(string_split(
           |    trim(regexp_replace(regexp_replace(lower(text),
           |      '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
           |    t -> t <> '')) AS token
           |  FROM documents),
           |sk AS (
           |  SELECT r.r,
           |         ('0x' || substr(md5('cms' || r.r || ':' || token), 1, 8))::BIGINT
           |           % 64 AS bucket,
           |         count(*) AS cnt
           |  FROM toks CROSS JOIN generate_series(0, 3) AS r(r)
           |  GROUP BY 1, 2),
           |exact AS (SELECT token, count(*) AS exact_cnt FROM toks GROUP BY token),
           |est AS (
           |  SELECT e.token, min(sk.cnt) AS est_cnt
           |  FROM exact e CROSS JOIN generate_series(0, 3) AS r(r)
           |  JOIN sk ON sk.r = r.r
           |         AND sk.bucket = ('0x' || substr(md5('cms' || r.r || ':' || e.token),
           |                          1, 8))::BIGINT % 64
           |  GROUP BY e.token),
           |top AS (
           |  SELECT e.token, e.exact_cnt, s.est_cnt
           |  FROM exact e JOIN est s USING (token)
           |  ORDER BY e.exact_cnt DESC, e.token LIMIT 20)
           |SELECT token, exact_cnt, est_cnt,
           |       row_number() OVER (ORDER BY exact_cnt DESC, token) AS rank
           |FROM top""".stripMargin)),

    GraftQuery("a33_ddsketch_quantiles",
      // mergeable exponential-histogram quantiles over event values:
      // two per-user-shard sketches roll up via ddMerge, and the oracle
      // sketches the whole stream directly — so the oracle equality IS
      // the merge-identity proof. Bucket arithmetic is integer-exact
      // (power-of-two divisors), so both engines derive identical cells
      (s, dir) => {
        import graft.operators.SketchOps
        val ev = Tables.load(s, dir, "events").select(
          col("event_type"), col("user_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val sk = SketchOps.ddMerge(
          SketchOps.ddSketch(ev.where(col("user_id") % 2 === 0), "event_type", "cents"),
          SketchOps.ddSketch(ev.where(col("user_id") % 2 =!= 0), "event_type", "cents"))
        SketchOps.ddQuantiles(sk,
            Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
          .select(col("key").as("event_type"), col("q"), col("bucket"),
            col("est").as("est_cents"))
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT event_type AS key, CAST(round(value * 100, 0) AS BIGINT) AS cents
          |  FROM events),
          |vp AS (SELECT key, cents FROM v WHERE cents > 0),
          |e AS (
          |  SELECT key, cents, length(bin(cents)) - 1 AS ee,
          |         power(2, length(bin(cents)) - 1) AS p
          |  FROM vp),
          |b AS (
          |  SELECT key, (ee * 8 + CAST(floor((cents - p) * 8 / p) AS INT)) AS bucket
          |  FROM e),
          |sk AS (SELECT key, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
          |c AS (
          |  SELECT key, bucket,
          |         sum(cnt) OVER (PARTITION BY key ORDER BY bucket) AS cum,
          |         sum(cnt) OVER (PARTITION BY key) AS total
          |  FROM sk),
          |sel AS (
          |  SELECT key, qname,
          |         min(CASE WHEN cum >= (total * num + den - 1) // den
          |             THEN bucket END) AS bucket
          |  FROM c CROSS JOIN (VALUES ('p50', 1, 2), ('p90', 9, 10),
          |                            ('p99', 99, 100)) q(qname, num, den)
          |  GROUP BY 1, 2)
          |SELECT key AS event_type, qname AS q, bucket,
          |       power(2, bucket // 8) * (2 * (bucket % 8) + 17) / 16.0 AS est_cents
          |FROM sel""".stripMargin),
      headline = true),

    GraftQuery("t9_hashed_classifier",
      (s, dir) => TextOps.withHashedLinearScore(
        Tables.load(s, dir, "documents"), "text", numBuckets = 64)
        .select(col("doc_id"), col("score"), col("label")),
      // identical md5-bucket + dyadic-weight arithmetic: every weight is
      // an exact multiple of 1/256, so the mean matches bit-for-bit with
      // no rounding tolerance
      oracle = Some(
        raw"""WITH toks AS (
           |  SELECT doc_id,
           |         list_filter(string_split(
           |           trim(regexp_replace(regexp_replace(lower(text),
           |             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
           |           t -> t <> '') AS toks
           |  FROM documents),
           |w AS (
           |  SELECT doc_id, toks,
           |         list_transform(toks, t ->
           |           ((('0x' || substr(md5(t), 1, 8))::BIGINT % 64)
           |             * 2654435761 % 256) / 256.0 - 0.5) AS ws
           |  FROM toks)
           |SELECT doc_id,
           |       CASE WHEN len(toks) = 0 THEN 0.0
           |            ELSE list_sum(ws) / len(toks) END AS score,
           |       (CASE WHEN len(toks) = 0 THEN 0.0
           |             ELSE list_sum(ws) / len(toks) END) > 0 AS label
           |FROM w""".stripMargin))
  )
}
