package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path.
  *
  * == 100 TB design ==
  *
  * Brute force is O(queries × corpus) — correct but only viable when the
  * query set is small and broadcastable (it is broadcast here, so the
  * corpus is scanned exactly once, map-only, no shuffle of the corpus).
  * The LSH variant buckets both sides by the sign pattern of dot products
  * with deterministic pseudo-random hyperplanes: candidates = same
  * bucket, so the join shuffles on a short bucket key and each vector
  * meets only its bucket's vectors. Recall is tuned by the number of
  * planes (fewer planes → bigger buckets → higher recall, more work).
  *
  * All arithmetic is an explicit left-fold over `zip_with` products —
  * engine-portable and verified against a DuckDB oracle computing the
  * identical expression.
  */
object SimOps extends org.apache.spark.internal.Logging {

  /** Auto-sized hyperplane count for an N-vector corpus:
    * `max(4, ceil(log2(N / targetOccupancy)))`, so expected LSH bucket
    * occupancy stays ≈ `targetOccupancy` and candidate pairs grow
    * ~linearly in N instead of as (N / 2^planes)². The floor of 4 is
    * the oracle fixtures' pinned value (engaged for N ≤ 16·occupancy).
    */
  def autoPlanes(n: Long, targetOccupancy: Int = 32): Int = {
    val safe = math.max(1L, n)
    math.max(4,
      math.ceil(math.log(safe.toDouble / targetOccupancy) / math.log(2.0)).toInt)
  }

  /** Auto-sized SemDeDup cell count: `max(16, ceil(sqrt(N/2)))` — √N
    * cells balance centroid assignment O(N·cells) against within-cell
    * pairs O(N²/cells) at O(N^1.5) each. The floor of 16 is the oracle
    * fixtures' pinned value (engaged for N ≤ 512).
    */
  def autoCells(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(math.max(1L, n) / 2.0)).toInt)

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    * greedily pick `k` results balancing relevance against redundancy —
    * `next = argmax λ·sim(q,c) − (1−λ)·max_{s∈selected} sim(c,s)`,
    * ties to the lowest id. The standard diversity pass after any
    * retrieval stage: near-duplicate hits (which every dense retriever
    * returns in clumps) cost their redundancy against what is already
    * selected, so the final k covers the query's neighborhood instead
    * of one clump. λ=1 degenerates to plain sim order (spec-pinned).
    *
    * Input is a CANDIDATE relation `(queryCol, idCol, vecCol, simCol)`
    * — the top-N of [[bruteForceTopK]] / [[ivfTopK]] / etc. with the
    * candidate vectors re-joined by id. Output adds `mmr` (the score at
    * selection time) and `rank`.
    *
    * == 100 TB design ==
    *
    * The greedy loop is inherently sequential per query with pairwise
    * candidate sims, so it runs as `mapGroups` over the query key —
    * per-group imperative Scala on ≤ N candidates (N is the retrieval
    * budget, 10–100 by contract; O(k·N) cosines per query on arrays
    * already in memory). Queries distribute across the cluster; the
    * only exchange is the groupBy of (query, candidate) rows the
    * retrieval stage already produced. This is the documented
    * mapGroups exception: a data-dependent argmax loop no relational
    * form expresses without k self-joins.
    */
  def mmrRerank(candidates: DataFrame, k: Int, lambda: Double,
      queryCol: String = "query_id", idCol: String = "nbr_id",
      vecCol: String = "nbr_vec", simCol: String = "sim"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda out of [0,1]: $lambda")
    val spark0 = candidates.sparkSession
    import spark0.implicits._
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) -1.0 else dot / d
    }
    candidates
      .select(col(queryCol).cast("long").as("q"), col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"), col(simCol).cast("double").as("s"))
      .as[(Long, Long, Array[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val cand = it.map(t => (t._2, t._3, t._4)).toArray.sortBy(_._1)
        val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Int)]
        val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        val used = scala.collection.mutable.BitSet.empty
        var rank = 1
        while (rank <= math.min(k, cand.length)) {
          var bestIdx = -1; var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < cand.length) {
            if (!used(i)) {
              val (_, v, s) = cand(i)
              var red = 0.0
              chosen.foreach { case (_, sv) => val c = cos(v, sv); if (c > red) red = c }
              // redundancy floor 0: an anti-correlated candidate should
              // not be REWARDED beyond its relevance
              val score = lambda * s - (1.0 - lambda) * red
              if (score > bestScore) { bestScore = score; bestIdx = i }
            }
            i += 1
          }
          val (id, v, s) = cand(bestIdx)
          used += bestIdx
          chosen += ((id, v))
          selected += ((id, s, bestScore, rank))
          rank += 1
        }
        selected.iterator.map { case (id, s, m, r) => (q, id, s, m, r) }
      }
      .toDF(queryCol, idCol, simCol, "mmr", "rank")
  }

  /** Centroid count up to which cell assignment stays on the staged
    * sims-array form (one fused cosine per cell — the expression shape
    * the e3/e8/d9 SQL oracles re-derive). Past it, whole-stage codegen
    * would inline every cosine into one generated class and janino
    * refuses around a thousand cells, so assignment switches to the
    * [[graft.functions.NearestCentroid]] native expression: constant
    * generated-code size at any k (spec-pinned at k=1024 with codegen
    * byte-code stats).
    */
  /** Cell-count threshold between the staged-array assignment form and
    * the native [[graft.functions.CentroidSims]]/[[graft.functions.NearestCentroid]]
    * expressions. 24 keeps every fixed-16-cell oracle query on the
    * staged-array path the oracles pin, while √N-sized cell counts
    * (e19's serving index: 45 cells at sf0.1, 141 at 10×) go native —
    * at 45 cells the inlined literal-array cosines already blow
    * janino's 64 KB method limit inside the candidate sort's generated
    * class, silently dropping the whole stage to interpreted rows
    * (caught live: `Failed to compile ... sort_addToSorter_0 ... grows
    * beyond 64 KB` on the e19 headline). Values are bit-identical on
    * both paths (parity-spec'd).
    */
  private val AssignBlock = 24

  /** Per-dimension update-aggregation width for [[kMeansCentroids]]:
    * up to this dimensionality the centroid update runs as one wide
    * aggregate (dim sum columns, k result rows); past it, the update
    * posexplodes to (cluster, idx, x) and aggregates k × dim skinny
    * rows — identical exchange volume, bounded expression count.
    */
  private val UpdateWideDims = 128

  /** The deterministic seed quantizer shared by [[ivfTopK]], [[pqTopK]],
    * [[semanticNearDups]] and [[kMeans]]: the `n` lowest-id vectors
    * (TakeOrdered — no full sort; tiny driver collect of n × dim
    * doubles). Engine-portable, so a SQL oracle derives the identical
    * centroid set.
    */
  private def lowestIdVectors(df: DataFrame, n: Int, idName: String,
      vecName: String): IndexedSeq[Seq[Double]] =
    df.orderBy(col(idName)).limit(n).select(col(vecName))
      .collect().map(_.getSeq[Double](0).toVector).toIndexedSeq

  /** Nearest-centroid assignment, map-only: centroids ride in the plan
    * as literals, each row computes its argmax cell (highest cosine,
    * lowest cell on ties, NaN→-1 so zero-norm rows land in cell 0
    * deterministically) in staged projections — no join, no exchange,
    * vectors never leave the scan.
    *
    * For ≤[[AssignBlock]] centroids this is the single staged-array
    * expression the e3/e8/d9 oracles pin (one fused cosine per cell,
    * first-occurrence argmax). Past that it switches to the
    * [[graft.functions.NearestCentroid]] native expression — the
    * centroid matrix becomes a reference object and the generated code
    * is one static call, because whole-stage codegen compiles the whole
    * stage into one class and a thousand inlined cosines throw janino
    * `InternalCompilerException` no matter how the expression tree is
    * sharded. Values are bit-identical either way (parity-spec'd: same
    * left-to-right accumulation, same tie and NaN rules).
    */
  private def withNearestCell(df: DataFrame, cents: Seq[Seq[Double]],
      vecName: String, clusterName: String,
      simName: Option[String]): DataFrame = {
    if (cents.size <= AssignBlock) {
      // r18 (guide §1.2 step 2): the row norm is the same value in all
      // k per-cell cosines and every centroid norm is a CONSTANT — so
      // the row norm stages once per row and centroid norms fold to
      // literals (same index-order accumulation as the fused loop →
      // bit-identical sims; cosineStaged doc). Assignment drops from
      // 3 FMAs to 1 FMA per (element × cell).
      val staged = df.withColumn("__vn", vecNorm(col(vecName)))
        .withColumn("__cellSims",
          array(cents.map(ct =>
            nanvl(cosineStaged(col(vecName), col("__vn"), typedLit(ct),
              lit(math.sqrt(ct.foldLeft(0.0)((acc, y) => acc + y * y)))),
              lit(-1d))): _*))
      val withC = staged.withColumn(clusterName,
        (array_position(col("__cellSims"), array_max(col("__cellSims"))) - 1)
          .cast("int"))
      simName.fold(withC)(s =>
          withC.withColumn(s, col("__cellSims").getItem(col(clusterName))))
        .drop("__cellSims").drop("__vn")
    } else {
      val withB = df.withColumn("__best",
          graft.functions.NearestCentroid(col(vecName), cents))
        .withColumn(clusterName, col("__best.cell"))
      simName.fold(withB)(s => withB.withColumn(s, col("__best.sim")))
        .drop("__best")
    }
  }

  /** Cosine similarity of two double-array columns. Implemented as the
    * fused native Catalyst expression
    * [[graft.functions.CosineSimilarity]] (one codegen'd loop, no
    * intermediate arrays); semantics are the explicit sequential fold of
    * [[cosineComposed]], so values are deterministic and oracle-portable.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** The built-ins-only composition (reference semantics; three
    * higher-order passes + a zipped array per row — kept for parity
    * testing against the fused expression).
    */
  def cosineComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** `sqrt(dot(v, v))` — one side's norm half of the fused cosine,
    * staged ONCE per row by the pair-scan call sites (see
    * [[cosineStaged]]). Accumulates in the fused loop's index order, so
    * it equals the fused loop's `sqrt(nx)` bit-for-bit.
    */
  def vecNorm(v: Column): Column =
    sqrt(graft.functions.DotProduct(v, v))

  /** Norm-hoisted cosine for the quadratic pair scans (r18, guide §1.2
    * step 2): `dot(a, b) / (an * bn)` where `an`/`bn` are [[vecNorm]]
    * columns staged once per row on each side of the pair join — the
    * per-PAIR loop then runs 1 FMA per element instead of
    * [[cosine]]'s 3 (dot + both norms).
    *
    * BIT-IDENTICAL to `cosine(a, b)`, not approximately equal: the
    * three accumulations are the same sequential folds evaluated at
    * different times, and `sqrt`/`*`/`/` are the same scalar double
    * ops ([[graft.functions.DotProduct]] doc) — so sims, orderings,
    * and round(…, 6) outputs are unchanged (oracle-gated at every call
    * site). Null surface coincides: the per-pair dot is null exactly
    * where the fused cosine is (null input, length mismatch, null
    * element) and a null poisons the divide; zero norms give the same
    * 0/0 = NaN. Parity spec: `DotProductSpec`.
    */
  def cosineStaged(a: Column, an: Column, b: Column, bn: Column): Column =
    graft.functions.StagedCosine(a, b, an, bn)

  /** Exact brute-force top-k: for each query vector, the k most cosine-
    * similar corpus vectors (excluding itself). The query side is
    * broadcast; the corpus is scanned once with no shuffle. Ties broken
    * by ascending corpus id.
    */
  /** Cross-set max-similarity probe: for every probe row, the single
    * most cosine-similar corpus row (ties → lowest corpus id) — the
    * eval-set contamination check: probe = frozen test split, corpus =
    * candidate training data, and any probe whose max similarity
    * clears a threshold is semantically leaked into training.
    *
    * Scale shape: the probe side is the small one (an eval set) and is
    * broadcast; the corpus is scanned map-only, and the per-probe
    * argmax runs as TWO hash aggregations — `max(sim)` per probe, then
    * a broadcast re-filter of the scored stream to max-hitting rows and
    * `min(train_id)` for the deterministic tie-break. Both aggregate
    * buffers are primitives, so both passes are `HashAggregate` with
    * map-side partial reduction: each executor shrinks its corpus slice
    * to one row per probe before the only (tiny: probes × partitions
    * rows) exchanges, and nothing corpus-sized ever shuffles OR SORTS.
    *
    * Why not one `max_by(struct, struct)`: a struct-typed aggregation
    * buffer is not hash-aggregable, and Spark silently falls back to
    * `SortAggregate` — whose partial pass SORTS the entire joined
    * stream per task, rows still carrying both embedding arrays. The
    * r16 sweep caught that as an 8 GB-heap OOM at the 100× tier
    * (200k corpus × 20k probes ≈ 3.6G one-KB rows into a sort). The
    * second cosine pass costs one extra map-only scan; the recomputed
    * sim is bit-identical (same fused left-to-right fold), and Spark
    * normalizes NaN in join keys, so a NaN max still re-matches.
    *
    * Probes with NO scoreable corpus row (every cosine null — length
    * mismatch or null elements on all pairs) are ABSENT from the
    * output: no max similarity exists. (NaN from zero-norm vectors is
    * not null; such probes still report their NaN-max row.)
    *
    * DETERMINISM CONTRACT: the two-pass argmax evaluates the scored
    * stream TWICE (`scored` is a def) and re-matches max rows by the
    * recomputed double, which must be bit-identical across the passes.
    * That holds for any deterministic input plan (the fused cosine is
    * a fixed left-to-right fold). An input whose plan contains
    * non-deterministic expressions (`sample()`, `rand()`, a shuffling
    * `limit`) would re-draw between the passes and probes would
    * silently vanish — so such inputs are detected and FROZEN behind a
    * DISK_ONLY barrier before scoring (freezing the small projected
    * inputs, not the corpus×probes scored stream, keeps the defensive
    * cost at one extra materialization of the vectors). Residual
    * caveat, inherent to persist-based freezing: a lost executor
    * recomputes dropped blocks, re-drawing randomness — on an
    * unreliable cluster pre-materialize non-deterministic inputs to
    * storage instead.
    */
  def crossSetMaxSim(corpus: DataFrame, probes: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def freeze(df: DataFrame, site: String): DataFrame = {
      val nondet = df.queryExecution.analyzed.exists(pl =>
        pl.expressions.exists(e => e.exists(!_.deterministic)))
      if (nondet) df.transform(graft.util.GraftCache.barrier(site)) else df
    }
    // norms staged inside the (possibly frozen) per-side projections
    // (r18): the O(corpus × probes) scored stream — which this
    // operator evaluates TWICE — pays dot-only per pair; the recomputed
    // sim stays bit-identical across the passes (cosineStaged doc), so
    // the max re-match contract is untouched
    val c = freeze(corpus.select(col(idCol).as("train_id"),
      col(vecCol).cast("array<double>").as("t_vec"))
      .withColumn("_tn", vecNorm(col("t_vec"))),
      "SimOps.crossSetMaxSim.corpus")
    val p = freeze(probes.select(col(idCol).as("test_id"),
      col(vecCol).cast("array<double>").as("p_vec"))
      .withColumn("_pn", vecNorm(col("p_vec"))),
      "SimOps.crossSetMaxSim.probes")
    // vectors DROP in the same select that consumes them — everything
    // past this projection moves (test_id, train_id, sim) scalars
    def scored = c.join(broadcast(p))
      .select(col("test_id"), col("train_id"),
        cosineStaged(col("p_vec"), col("_pn"),
          col("t_vec"), col("_tn")).as("sim"))
    val best = scored.groupBy(col("test_id")).agg(max(col("sim")).as("sim"))
    scored.join(broadcast(best), Seq("test_id", "sim"))
      .groupBy(col("test_id"), col("sim"))
      .agg(min(col("train_id")).as("train_id"))
      .select(col("test_id"), col("train_id"), col("sim"))
  }

  /** Retrieval-quality metrics — the measurement half of the ANN
    * family: given a TRUTH ranking (e.g. [[bruteForceTopK]]) and a
    * CANDIDATE ranking (any approximate index), per-query recall@k,
    * MRR, and binary-relevance NDCG@k. At 100 TB this relation is what
    * decides quantizer settings: run it on a query sample after every
    * index build and regression-gate the recall.
    *
    * Numeric determinism: both DCG and ideal DCG evaluate as FIXED
    * k-term left-associative sums over per-rank hit indicators
    * (aggregated with `max`, so the group-by order cannot reorder
    * float additions) — any engine derives bit-identical doubles.
    *
    * Scale: one (query, nbr) hash join against the relevant set, one
    * partial-aggregated group-by of indicator scalars; rankings carry
    * (id, id, rank) only.
    */
  def rankMetrics(truth: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 32, s"k out of [1,32]: $k")
    val rel = truth.where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"))
    val nRel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val hits = cand.where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("rank"))
      .join(rel, Seq("query_id", "nbr_id"))
    val perQ = hits.groupBy(col("query_id"))
      .agg(count(lit(1)).as("hits"),
        (min(col("rank")).as("minrank") +:
          (1 to k).map(r =>
            max(when(col("rank") === r, 1).otherwise(0)).as(s"__h$r"))): _*)
    val joined = nRel.join(perQ, Seq("query_id"), "left")
    val dcg = (1 to k).map(r =>
        coalesce(col(s"__h$r"), lit(0)).cast("double") / log2(lit(r + 1.0)))
      .reduceLeft(_ + _)
    val idcg = (1 to k).map(r =>
        when(col("n_rel") >= r, lit(1.0) / log2(lit(r + 1.0))).otherwise(lit(0.0)))
      .reduceLeft(_ + _)
    joined
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall_k",
        round(col("hits").cast("double") / col("n_rel"), 6))
      .withColumn("mrr",
        round(coalesce(lit(1.0) / col("minrank"), lit(0.0)), 6))
      .withColumn("ndcg",
        round(when(col("n_rel") > 0, dcg / idcg).otherwise(lit(0.0)), 6))
      .select(col("query_id"), col("n_rel"), col("hits"),
        col("recall_k"), col("mrr"), col("ndcg"))
  }

  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms staged per corpus row / per broadcast query row (r18): the
    // O(corpus × queries) scan below then pays dot-only per pair —
    // bit-identical sims (cosineStaged doc)
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
      .withColumn("_cn", vecNorm(col("nbr_vec")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
      .withColumn("_qn", vecNorm(col("q_vec")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("sim",
        cosineStaged(col("q_vec"), col("_qn"), col("nbr_vec"), col("_cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** Radius (range) similarity search: ALL corpus neighbors with cosine
    * `sim >= minSim` per query — the threshold sibling of
    * [[bruteForceTopK]] for "everything this close" retrieval (near-dup
    * audits, recall-complete candidate pulls) where top-k's fixed k
    * either truncates dense neighborhoods or pads sparse ones. Returns
    * `(query_id, nbr_id, sim)`, no rank — result size is data-driven.
    *
    * == 100 TB design ==
    *
    * Identical plan shape to [[bruteForceTopK]] minus the window: the
    * query side broadcasts, the corpus is scanned ONCE map-only with
    * the fused cosine + threshold filter inside the scan stage — no
    * shuffle at all (top-k needs the per-query window exchange; a
    * radius cut is a pure filter, so the whole operator is stage one).
    * The corpus side never materializes more than (query × survivor)
    * scalar rows.
    */
  def radiusSearch(
      corpus: DataFrame, queries: DataFrame, minSim: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // same staged-norm pair scan as bruteForceTopK (r18)
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
      .withColumn("_cn", vecNorm(col("nbr_vec")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
      .withColumn("_qn", vecNorm(col("q_vec")))
    c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("sim",
        cosineStaged(col("q_vec"), col("_qn"), col("nbr_vec"), col("_cn")))
      .where(col("sim") >= minSim)
      .select(col("query_id"), col("nbr_id"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived uniform in [-1, 1] — portable, seedless, reproducible on
    * any engine.
    */
  def planeComponent(plane: Int, dim: Column): Column =
    conv(substring(md5(to_binary(concat(lit(s"p${plane}_d"), dim.cast("string")),
      lit("utf-8"))), 1, 6), 16, 10).cast("double") / 8388607.5 - 1.0

  /** LSH bucket key for one hash table: sign bits of the vector's dot
    * products with `numPlanes` hyperplanes (globally indexed
    * `table*numPlanes + p`, so every table draws fresh planes), prefixed
    * with the table id so buckets never collide across tables.
    */
  def lshBucket(vec: Column, numPlanes: Int, table: Int = 0): Column =
    concat((lit(s"$table:") +: (0 until numPlanes).map { p =>
      val dotP = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            d => planeComponent(table * numPlanes + p, d)),
          (x, h) => x * h),
        lit(0.0), (acc, v) => acc + v)
      when(dotP >= 0, lit("1")).otherwise(lit("0"))
    }): _*)

  /** Embedding-cosine near-duplicate pairs: `(id1, id2, sim)` with
    * `sim >= threshold`, id1 < id2, candidates drawn from the same
    * OR-amplified multi-table hyperplane buckets as [[lshTopK]].
    *
    * Scale: the bucket self-join exchanges `(bucket, id)` only; the
    * candidate pairs checkpoint as bare id pairs, then vectors re-join
    * BY ID (semi-filtered to candidate ids, pair side broadcast) for the
    * exact-cosine verify — embedding arrays never cross an exchange.
    *
    * PARAMETER SCALING: `numPlanes` fixes the bucket count at
    * `2^numPlanes` per table, so per-bucket candidate pairs grow as
    * `(N / 2^numPlanes)²` — a FIXED plane count makes the op quadratic
    * in the corpus. The default (`numPlanes = -1`) therefore
    * auto-sizes from one cheap `count()` of the input:
    * `planes = max(4, ceil(log2(N / targetOccupancy)))`, i.e. expected
    * bucket occupancy stays ≈ `targetOccupancy` and candidate pairs
    * grow ~linearly (N·B/2 per table) instead of as N². Each added
    * plane halves occupancy and quarters the per-bucket pair count, at
    * the recall cost the extra tables (`numTables`) buy back. The
    * r16 sweep's 100× tier is the motivating witness: 200k vectors at
    * the old fixed 4 planes meant 16 buckets/table ⇒ ~10^10 candidate
    * pairs ⇒ JVM OOM; auto-sized (13 planes) the pair set is ~10^7.
    * Pass an explicit `numPlanes` to pin the quantizer (the DuckDB
    * oracle does, at the sf0.01 fixture's auto value, so the gate
    * compares identical LSH structures). NOTE the default makes this
    * otherwise-lazy builder EAGER: the sizing `count()` runs a Spark
    * job at construction, and a derived input executes its upstream
    * once for sizing plus once at execution — cache the input, or pass
    * an explicit `numPlanes` (e.g. from catalog row-count statistics),
    * when that double execution matters.
    *
    * SKEW VALVE: real embedding corpora cluster, so one bucket can
    * still swallow a large corpus fraction no matter how the EXPECTED
    * occupancy is sized. Buckets holding more than `maxBucketIds` ids
    * are dropped from candidate generation (a bucket that dense carries
    * no discriminating signal — its planes failed to split a cluster;
    * the pair loss is confined to pairs co-occurring ONLY in
    * mega-buckets, which the other `numTables − 1` tables re-find
    * unless they mega-bucket too). The occupancy count rides the same
    * by-bucket exchange the self-join needs, so the valve adds no extra
    * shuffle of the data; it never engages on the oracle fixtures
    * (occupancy ≈ 31).
    */
  def embeddingNearDups(df: DataFrame, threshold: Double, numPlanes: Int = -1,
      numTables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      targetOccupancy: Int = 32, maxBucketIds: Int = 1 << 16): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val planes =
      if (numPlanes > 0) numPlanes
      else {
        val n = vecs.count()
        val p = autoPlanes(n, targetOccupancy)
        logInfo(s"embeddingNearDups: auto-sized $p planes for $n vectors " +
          s"(target occupancy $targetOccupancy)")
        p
      }
    val bucketed = vecs
      .withColumn("bucket", explode(
        graft.functions.HyperplaneBuckets(col("v"), planes, numTables)))
      .select(col("bucket"), col("id"))
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))))
      .where(col("bn") <= maxBucketIds)
      .select(col("bucket"), col("id"))
    val pairs = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
      .transform(graft.util.GraftCache.barrier("SimOps.embeddingNearDups")) // referenced three times below; see DedupOps
    def side(idn: String, vn: String) = vecs
      .join(pairs.select(col(idn).as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id").as(idn), col("v").as(vn),
        vecNorm(col("v")).as(s"_n$idn")) // staged per id (r18)
    pairs.join(side("id1", "v1"), "id1").join(side("id2", "v2"), "id2")
      .withColumn("sim", cosineStaged(col("v1"), col("_nid1"),
        col("v2"), col("_nid2")))
      .where(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
  }

  /** LSH-bucketed approximate top-k with OR-amplification: `numTables`
    * independent hash tables of `numPlanes` sign bits each; candidates =
    * union of same-bucket pairs over all tables. One table of b planes
    * finds a neighbor at angle θ with probability (1-θ/π)^b — far too
    * low for useful recall — while L tables lift it to
    * 1-(1-(1-θ/π)^b)^L (0.65 recall@10 at b=4, L=8 on the sf0.01 test
    * embeddings, pinned by `LlmOpsSpec`). Output shape matches
    * [[bruteForceTopK]] (rank within found candidates).
    *
    * Scale: bucketing is map-only (L×b plane dot products per vector);
    * the join shuffles short bucket keys; the duplicate-pair collapse
    * shuffles only `(query_id, nbr_id, sim)` scalars — vectors are never
    * carried through an exchange.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int = 4,
      numTables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // fused native bucket keys (plane components memoized per executor);
    // bit-identical to the composed per-table lshBucket (parity-spec'd)
    def buckets(v: Column): Column =
      graft.functions.HyperplaneBuckets(v, numPlanes, numTables)
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    // bucket keys derive map-side and the vectors DROP before the
    // exchange — the bucket join moves (bucket, id) only, so shuffle
    // volume is O(tables × ids), not O(tables × embedding bytes)
    val cB = c.withColumn("bucket", explode(buckets(col("nbr_vec"))))
      .select(col("bucket"), col("nbr_id"))
    val qB = q.withColumn("bucket", explode(buckets(col("q_vec"))))
      .select(col("bucket"), col("query_id"))
    // distinct candidate pairs (a pair found by several tables appears
    // once), checkpointed — referenced twice below (see DedupOps)
    val cand = cB.join(qB, Seq("bucket"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"))
      .distinct()
      .transform(graft.util.GraftCache.barrier("SimOps.buckets"))
    // score each candidate once: corpus vectors re-join by id
    // (semi-filtered to candidates), query vectors broadcast (the query
    // set is small by this operator's contract, as in bruteForceTopK)
    val candCorpus = c
      .join(cand.select(col("nbr_id")).distinct(), Seq("nbr_id"), "left_semi")
      .withColumn("_cn", vecNorm(col("nbr_vec"))) // staged per id (r18)
    val scored = cand
      .join(candCorpus, "nbr_id")
      .join(broadcast(q.withColumn("_qn", vecNorm(col("q_vec")))), "query_id")
      .withColumn("sim",
        cosineStaged(col("q_vec"), col("_qn"), col("nbr_vec"), col("_cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path next to [[lshTopK]]'s hyperplane one: the corpus is assigned to
    * `numCells` centroid cells once, and each query scores only the
    * vectors of its `nProbe` nearest cells.
    *
    * Default centroids are the `numCells` lowest-id corpus vectors — a
    * deterministic, engine-portable stand-in for an offline k-means
    * train, which keeps the SQL oracle able to derive the identical
    * quantizer. Pass `centroids` (e.g. from [[kMeansCentroids]]) to
    * serve against a trained quantizer instead — the serving plan is
    * identical either way (centroid literals in a map-only projection;
    * the recall lift of trained centroids over the seed floor is
    * spec-pinned in `LlmOpsSpec`).
    *
    * == 100 TB design ==
    *
    * Cell assignment is MAP-ONLY: centroids live in the plan as literals
    * (numCells × dim doubles), each corpus row computes its cell in one
    * staged projection — the corpus is never shuffled and never carries
    * its vectors through an exchange. The probe join broadcasts the
    * (small) query set's probe cells + vectors against the assigned
    * corpus — again map-only — and only scalar `(query_id, nbr_id, sim)`
    * rows reach the final top-k exchange. Work per query drops from
    * O(corpus) (brute force) to O(corpus × nProbe / numCells) expected.
    * Recall is tuned by `nProbe`/`numCells` and pinned by a spec against
    * [[bruteForceTopK]].
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, numCells: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    // coarse quantizer: caller-trained centroids (kMeansCentroids) or
    // the deterministic lowest-id default (TakeOrdered — no full sort;
    // tiny driver collect of numCells × dim doubles)
    val cents: Seq[Seq[Double]] = centroids
      .map(_.map(_.toVector).toVector)
      .getOrElse(lowestIdVectors(c, numCells, "nbr_id", "nbr_vec"))
    require(nProbe <= cents.size,
      s"nProbe ($nProbe) must be <= number of cells (${cents.size})")
    // all-cells similarity vector, STAGED so the argmax below references
    // a materialized attribute instead of inlining the native cosines
    // twice (see DedupOps on projection staging). Zero-norm vectors (or
    // centroids) make cosine 0/0 = NaN, and NaN sorts HIGHEST in
    // Spark — it would win the argmax and the final rank — so coalesce
    // NaN to -1: degenerate vectors land deterministically in the first
    // cell and rank last instead of first. (Assignment shards past 256
    // cells — see withNearestCell.)
    def withCellSims(df: DataFrame, v: String): DataFrame =
      df.withColumn("cellSims",
        // staged array() for the common ≤256-cell case (oracle-pinned
        // plan); the CentroidSims native expression past that — same
        // values, constant generated-code size (see NearestCentroid)
        if (cents.size <= AssignBlock)
          array(cents.map(ct => nanvl(cosine(col(v), typedLit(ct)), lit(-1d))): _*)
        else graft.functions.CentroidSims(col(v), cents))
    // first-occurrence argmax = highest sim, smallest cell on ties —
    // mirrored in the oracle as ORDER BY sim DESC, cell ASC
    // MATERIALIZED index build (same CollapseProject hazard as the PQ
    // twins): without the barrier the staged cell-assignment chain
    // inlines through the probe join and re-evaluates per streamed row
    // PER STAGE REPLAY — measured 8× on the 10× tier. DISK_ONLY: the
    // assignment is corpus-scaled (it carries the vectors).
    val assigned = withNearestCell(c, cents, "nbr_vec", "cell", None)
      .select(col("nbr_id"), col("nbr_vec"), col("cell"),
        vecNorm(col("nbr_vec")).as("_cn")) // staged into the index (r18)
      .transform(graft.util.GraftCache.barrier("SimOps.withCellSims"))
    // queries probe their nProbe nearest cells (query set is small by
    // this operator's contract — the window here ranks cells per query)
    val wCells = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cellSim").desc, col("cell"))
    // rank cells on scalars only — the window exchange must not carry
    // the query vectors — then hang q_vec back on via a broadcast join
    // (q stays map-only)
    val probeCells = withCellSims(q, "q_vec")
      .select(col("query_id"),
        posexplode(col("cellSims")).as(Seq("cell", "cellSim")))
      .withColumn("cellRank", row_number().over(wCells))
      .where(col("cellRank") <= nProbe)
      .select(col("cell"), col("query_id"))
    val qProbes = q.join(broadcast(probeCells), "query_id")
      .select(col("cell"), col("query_id"), col("q_vec"),
        vecNorm(col("q_vec")).as("_qn"))
    // a corpus vector lives in exactly one cell and a query probes
    // distinct cells, so each (query, nbr) pair scores at most once —
    // no dedup pass needed (unlike the OR-amplified LSH tables)
    val scored = assigned.join(broadcast(qProbes), "cell")
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        // same NaN coalescing as the cell stage: a zero-norm neighbor
        // must rank last (sim -1), not first (NaN sorts highest desc)
        nanvl(cosineStaged(col("q_vec"), col("_qn"),
          col("nbr_vec"), col("_cn")), lit(-1d)).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** SemDeDup-style semantic near-duplicate pairs: every embedding is
    * assigned to its nearest centroid cell (the same deterministic
    * lowest-id coarse quantizer as [[ivfTopK]] — at real scale an
    * offline k-means ships its centroids and nothing else changes), and
    * candidate pairs are drawn WITHIN a cell only; each candidate is
    * verified by exact cosine against `threshold`. Returns
    * `(id1, id2, sim)` with `id1 < id2`.
    *
    * == 100 TB design ==
    *
    * Cell assignment is map-only (centroid literals in the plan); the
    * self-join exchanges `(cell, id)` scalars only, and the verify
    * re-joins vectors BY ID (semi-filtered to candidate ids) — embedding
    * arrays never cross an exchange, exactly like [[embeddingNearDups]].
    * Per-cell pair cost is O(Σ cell²): `numCells` must scale with the
    * corpus, and both cost terms say HOW — within-cell pairs are
    * O(N²/cells) while centroid assignment is O(N·cells), so √N cells
    * balances them at O(N^1.5) each (the standard SemDeDup trade;
    * candidates are semantically pre-localized, unlike the sign-bucket
    * candidates of [[embeddingNearDups]], so a lower plane budget
    * reaches the same recall). The default (`numCells = -1`) applies
    * that rule from one cheap `count()`:
    * `cells = max(16, ceil(sqrt(N/2)))` — 16 at the 500-vector oracle
    * fixture (so the pinned DuckDB SQL compares the identical
    * quantizer), 317 at the 200k-vector 100× tier, where the old fixed
    * 16 cells meant 12.5k-vector cells and ~1.2G candidate pairs.
    * NOTE the default makes this otherwise-lazy builder EAGER: the
    * sizing `count()` runs a Spark job at construction, and a derived
    * input executes its upstream once for sizing plus once at
    * execution — cache the input, or pass an explicit `numCells` /
    * pre-trained `centroids`, when that double execution matters.
    *
    * SKEW VALVE — pair loss here is UNRECOVERABLE: cells denser than
    * `maxCellIds` are dropped from pair generation, and because a
    * vector lives in exactly ONE cell (no OR-amplified sibling tables,
    * unlike [[embeddingNearDups]], where the other `numTables − 1`
    * tables re-find pairs lost to one mega-bucket), every within-cell
    * pair of a dropped cell is lost outright — on a skewed corpus that
    * is silent recall loss. The valve therefore censuses its own
    * engagement eagerly (cell-count scalars only) and `logWarning`s
    * the dropped cell/vector counts; if it engages, raise
    * `maxCellIds`, supply more `centroids`, or pre-split the dense
    * region. It never engages on the oracle fixtures.
    */
  def semanticNearDups(df: DataFrame, threshold: Double, numCells: Int = -1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[Seq[Seq[Double]]] = None,
      maxCellIds: Int = 1 << 16): DataFrame = {
    val c = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val cells =
      if (numCells > 0) numCells
      else centroids.map(_.size).getOrElse {
        val n = c.count()
        val k = autoCells(n)
        logInfo(s"semanticNearDups: auto-sized $k cells for $n vectors")
        k
      }
    // caller-trained centroids (kMeansCentroids) or the deterministic
    // lowest-id default the SQL oracle can re-derive
    val cents: Seq[Seq[Double]] = centroids
      .map(_.map(_.toVector).toVector)
      .getOrElse(lowestIdVectors(c, cells, "id", "v"))
    // staged all-cells similarity + first-occurrence argmax, identical
    // to ivfTopK (NaN → -1 so zero-norm rows land deterministically in
    // cell 0 instead of winning every argmax)
    // (id, cell) scalars behind a DISK_ONLY barrier: read by the valve
    // census, then twice by the self-join — without it each reader
    // re-runs the full N×cells centroid-similarity assignment
    val assigned = withNearestCell(c, cents, "v", "cell", None)
      .select(col("id"), col("cell")) // vectors DROP before the exchange
      .transform(graft.util.GraftCache.barrier("SimOps.semanticNearDups.cells"))
    // valve-engagement census (r16 ADVICE): dropped pairs are
    // unrecoverable (doc above), so engagement must be observable —
    // one eager aggregation over the barriered (cell, count) scalars
    val overCap = assigned.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
      .where(col("cn") > maxCellIds)
      .agg(count(lit(1)).as("cells"), sum(col("cn")).as("ids"))
      .collect()(0)
    if (overCap.getLong(0) > 0)
      logWarning(s"semanticNearDups skew valve ENGAGED: dropping ALL " +
        s"within-cell pairs of ${overCap.getLong(0)} cell(s) holding " +
        s"${overCap.getLong(1)} vectors (occupancy > maxCellIds=" +
        s"$maxCellIds) — this pair loss is unrecoverable; raise " +
        s"maxCellIds or supply finer centroids")
    // a vector lives in exactly one cell, so each pair forms once — no
    // dedup pass (unlike OR-amplified LSH tables); the occupancy valve
    // rides the by-cell exchange the self-join needs anyway
    val capped = assigned
      .withColumn("cn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))))
      .where(col("cn") <= maxCellIds)
      .select(col("id"), col("cell"))
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .transform(graft.util.GraftCache.barrier("SimOps.semanticNearDups")) // referenced three times below; see DedupOps
    def side(idn: String, vn: String) = c
      .join(pairs.select(col(idn).as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id").as(idn), col("v").as(vn),
        vecNorm(col("v")).as(s"_n$idn")) // staged per id (r18)
    pairs.join(side("id1", "v1"), "id1").join(side("id2", "v2"), "id2")
      .withColumn("sim", nanvl(cosineStaged(col("v1"), col("_nid1"),
        col("v2"), col("_nid2")), lit(-1d)))
      .where(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
  }

  /** Semantic dedup survivors: rows of `df` that remain after collapsing
    * every [[semanticNearDups]] cluster (transitive closure via
    * [[DedupOps.clusterPairs]]) to its lowest-id member.
    */
  def semanticDedup(df: DataFrame, threshold: Double, numCells: Int = -1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[Seq[Seq[Double]]] = None): DataFrame =
    DedupOps.nearDupSurvivors(df,
      semanticNearDups(df, threshold, numCells, idCol, vecCol, centroids), idCol)

  /** Product-quantization ANN: the corpus is compressed to one small
    * code per subspace (here `numSubspaces` codes of
    * log2(`numCentroids`) bits — 64 doubles become 8 nibbles), queries
    * rank the whole corpus by the cosine of the query against each
    * row's RECONSTRUCTED vector (codes → codebook lookup), and the top
    * `candidates` per query are re-ranked by exact cosine against the
    * true vectors.
    *
    * == why this is the 100 TB shape ==
    * The full-corpus pass touches only `(id, codes)` — at 64-dim float
    * that is a 64× smaller scan than the raw vectors, which is the
    * entire point of PQ — and the reconstruction is a literal-array
    * lookup, not I/O. Queries broadcast; the candidate ranking windows
    * over `(query_id, nbr_id, approx)` scalars only (WindowGroupLimit
    * bounds the rank shuffle to `candidates` per query per map
    * partition — plan-verified); exact vectors are read back for
    * `queries × candidates` rows via a broadcast semi join on id. The
    * corpus is never shuffled.
    *
    * Like every brute scan, total COMPUTE is `O(queries × corpus)` —
    * linear in the corpus for a fixed serving query set. Under the
    * bench convention where the probe set also scales with the corpus
    * (`vec_id % 50 == 0`), that term is quadratic in the scale factor,
    * so e4's second-decade exponent is by construction, not a plan
    * defect (same convention as e1's, whose 100× answer is e19); the
    * PQ path's 100× answer is [[ivfPqTopK]] (e12), which prunes the
    * scanned set to `nProbe` cells per query before the codes pass.
    *
    * Codebook: deterministic "training" — per subspace, the subvectors
    * of the `numCentroids` lowest-id corpus vectors (the same
    * convention as [[ivfTopK]]'s coarse quantizer, so the oracle can
    * derive the identical codebook in SQL). Encoding is argmin
    * squared-L2 per subspace, first-minimum (= lowest code) on ties;
    * distance sums fold left-to-right in index order on both engines.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numSubspaces: Int = 8, numCentroids: Int = 16, candidates: Int = 40,
      idCol: String = "vec_id", vecCol: String = "embedding",
      codebookVectors: Option[Seq[Seq[Double]]] = None,
      codebooks: Option[Seq[Seq[Seq[Double]]]] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    // codebook precedence: per-subspace trained books ([[pqTrainCodebooks]])
    // > full-dim source vectors sliced per subspace (e.g. kMeansCentroids)
    // > the deterministic lowest-id default the oracle derives
    val books: Seq[Seq[Seq[Double]]] = codebooks match {
      case Some(bs) =>
        require(bs.size == numSubspaces,
          s"got ${bs.size} codebooks for $numSubspaces subspaces")
        bs.map(_.map(_.toVector).toVector).toVector
      case None =>
        val cents: Seq[Seq[Double]] = codebookVectors
          .map(_.map(_.toVector).toVector)
          .getOrElse(lowestIdVectors(c, numCentroids, "nbr_id", "nbr_vec"))
        val dim = cents.head.size
        require(dim % numSubspaces == 0,
          s"dim $dim not divisible into $numSubspaces subspaces")
        val subDim = dim / numSubspaces
        (0 until numSubspaces).map(j =>
          cents.map(_.slice(j * subDim, (j + 1) * subDim)))
    }
    val subDim = books.head.head.size

    // encode with the fused native expression (argmin squared-L2 per
    // subspace, first-min on ties, per-dim terms folded in ascending
    // index order): the composed per-centroid expression chain blows
    // past janino's 64 KB method limit at this codebook size, silently
    // knocking the whole scan out of whole-stage codegen — see
    // graft.functions.PqEncode (parity spec'd against the composed form)
    val encoded = c.withColumn("_codes",
      graft.functions.PqEncode(col("nbr_vec"), books))
    // reconstruction is a pure function of the codes — STAGED per corpus
    // row (numSubspaces literal lookups), never per (row, query) pair:
    // inlining it after the query join would rebuild the 64-element
    // array queries× times per row. A select alone does NOT stage it —
    // CollapseProject inlines the encode/reconstruct chain through the
    // query join and it re-evaluates per pair (caught live in the IVF-PQ
    // twin: 150 µs/pair interpreted) — so the code relation, which IS
    // the PQ index, persists DISK_ONLY (corpus-scaled, one sequential
    // write, read by the scan below).
    val recon = flatten(array((0 until numSubspaces)
      .map(j => element_at(typedLit(books(j)),
        element_at(col("_codes"), j + 1) + 1)): _*))
    val codes = encoded.select(col("nbr_id"), recon.as("_recon"))
      .select(col("nbr_id"), col("_recon"),
        vecNorm(col("_recon")).as("_rn")) // staged into the index (r18)
      .transform(graft.util.GraftCache.barrier("SimOps.pqTopK"))

    // asymmetric scan: rank every corpus row per query by approximate
    // cosine against the reconstruction; NaN (zero-norm) coalesces to
    // -1 so degenerate rows rank last deterministically. Norms staged
    // per side (r18) — the O(corpus × queries) pass pays dot-only.
    val approx = codes
      .join(broadcast(q.withColumn("_qn", vecNorm(col("q_vec")))),
        col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosineStaged(col("q_vec"), col("_qn"),
          col("_recon"), col("_rn")), lit(-1d)).as("approx"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("nbr_id"))
    val cand = approx
      .withColumn("_crank", row_number().over(wc))
      .where(col("_crank") <= candidates)
      .select(col("query_id"), col("nbr_id"))

    // exact rerank of the small candidate set: true vectors re-join by
    // id with the pair set broadcast — the corpus side stays map-only
    val exact = c.join(broadcast(cand), Seq("nbr_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosine(col("q_vec"), col("nbr_vec")), lit(-1d)).as("sim"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    exact
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** IVF-PQ approximate top-k (the IVFADC serving shape of Jégou,
    * Douze & Schmid, "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): the coarse IVF quantizer prunes the corpus
    * to each query's `nProbe` nearest cells, PQ codes stand in for the
    * raw vectors INSIDE the probed cells (asymmetric scoring: query
    * against the code reconstruction), and the top `candidates` per
    * query re-rank by exact cosine. Composes [[ivfTopK]]'s pruning with
    * [[pqTopK]]'s compressed scan — the canonical billion-scale layout.
    *
    * == 100 TB design ==
    *
    * Both quantizers ride in the plan as literals, so cell assignment
    * AND encoding are one map-only staged projection over the corpus —
    * the corpus is never shuffled and its vectors never cross an
    * exchange. The probe join broadcasts the query probes against the
    * `(cell, id, recon)` rows; relative to [[ivfTopK]] the probed-cell
    * scan touches reconstructions instead of raw vectors (PQ's
    * compression win: at 8×16 codes the per-row payload a 100 TB scan
    * materializes is ~8 bytes, not 8 × dim), and relative to [[pqTopK]]
    * the approximate pass scores O(corpus × nProbe / numCells) rows
    * instead of O(corpus). Exact vectors return only for
    * `queries × candidates` rows via broadcast semi joins on id.
    *
    * Both quantizers default to the deterministic lowest-id convention
    * (oracle-derivable); pass `centroids` / `codebooks` (from
    * [[kMeansCentroids]] / [[pqTrainCodebooks]]) for trained serving —
    * the plan shape is identical either way.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int = 16, nProbe: Int = 4,
      numSubspaces: Int = 8, numCentroids: Int = 16, candidates: Int = 40,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[Seq[Seq[Double]]] = None,
      codebooks: Option[Seq[Seq[Seq[Double]]]] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val cents: Seq[Seq[Double]] = centroids
      .map(_.map(_.toVector).toVector)
      .getOrElse(lowestIdVectors(c, numCells, "nbr_id", "nbr_vec"))
    require(nProbe <= cents.size,
      s"nProbe ($nProbe) must be <= number of cells (${cents.size})")
    require(candidates >= k,
      s"candidates ($candidates) must be >= k ($k)")
    // PQ codebook: trained books or the lowest-id default sliced per
    // subspace — the same precedence contract as pqTopK
    val books: Seq[Seq[Seq[Double]]] = codebooks match {
      case Some(bs) =>
        require(bs.size == numSubspaces,
          s"got ${bs.size} codebooks for $numSubspaces subspaces")
        bs.map(_.map(_.toVector).toVector).toVector
      case None =>
        val pc = lowestIdVectors(c, numCentroids, "nbr_id", "nbr_vec")
        val dim = pc.head.size
        require(dim % numSubspaces == 0,
          s"dim $dim not divisible into $numSubspaces subspaces")
        val subDim = dim / numSubspaces
        (0 until numSubspaces).map(j =>
          pc.map(_.slice(j * subDim, (j + 1) * subDim)))
    }

    // one map-only pass over the corpus: coarse cell + PQ codes +
    // staged reconstruction (per corpus row, never per (row, query))
    val recon = flatten(array((0 until numSubspaces)
      .map(j => element_at(typedLit(books(j)),
        element_at(col("_codes"), j + 1) + 1)): _*))
    // MATERIALIZED: this is the IVF-PQ index build (one coarse assign +
    // PQ encode + reconstruction per corpus row). Without the barrier,
    // CollapseProject inlines the encode/reconstruct chain through the
    // probe join and the whole thing re-evaluates PER (row, probe) PAIR
    // — measured 150 µs/pair interpreted, 10× SLOWER than the brute PQ
    // scan it exists to beat. DISK_ONLY: the index is corpus-scaled.
    val assigned = withNearestCell(c, cents, "nbr_vec", "cell", None)
      .withColumn("_codes", graft.functions.PqEncode(col("nbr_vec"), books))
      .select(col("nbr_id"), col("cell"), recon.as("_recon"))
      .select(col("nbr_id"), col("cell"), col("_recon"),
        vecNorm(col("_recon")).as("_rn")) // staged into the index (r18)
      .transform(graft.util.GraftCache.barrier("SimOps.ivfPqTopK"))

    // queries rank cells on scalars (same staged form ivfTopK audits),
    // then hang their vectors back on via a broadcast join
    def withCellSims(df: DataFrame, v: String): DataFrame =
      df.withColumn("cellSims",
        if (cents.size <= AssignBlock)
          array(cents.map(ct => nanvl(cosine(col(v), typedLit(ct)), lit(-1d))): _*)
        else graft.functions.CentroidSims(col(v), cents))
    val wCells = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cellSim").desc, col("cell"))
    val probeCells = withCellSims(q, "q_vec")
      .select(col("query_id"),
        posexplode(col("cellSims")).as(Seq("cell", "cellSim")))
      .withColumn("cellRank", row_number().over(wCells))
      .where(col("cellRank") <= nProbe)
      .select(col("cell"), col("query_id"))
    val qProbes = q.join(broadcast(probeCells), "query_id")
      .select(col("cell"), col("query_id"), col("q_vec"),
        vecNorm(col("q_vec")).as("_qn"))

    // asymmetric scan of the probed cells only: approx cosine against
    // the reconstruction; NaN (zero-norm) pins to -1 = ranks last
    val approx = assigned.join(broadcast(qProbes), "cell")
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosineStaged(col("q_vec"), col("_qn"),
          col("_recon"), col("_rn")), lit(-1d)).as("approx"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("nbr_id"))
    val cand = approx
      .withColumn("_crank", row_number().over(wc))
      .where(col("_crank") <= candidates)
      .select(col("query_id"), col("nbr_id"))

    // exact rerank of the candidate pool — corpus side stays map-only
    val exact = c.join(broadcast(cand), Seq("nbr_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosine(col("q_vec"), col("nbr_vec")), lit(-1d)).as("sim"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    exact
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** Scalar-quantization (SQ8) ANN: every dimension is affinely mapped
    * to an integer code in `[0, levels-1]` using the corpus's exact
    * per-dimension `[min, max]` range, queries rank the whole corpus by
    * cosine against the DEQUANTIZED codes, and the top `candidates` per
    * query are re-ranked by exact cosine — the simplest
    * compress-scan-rerank pipeline, complementing [[pqTopK]] (SQ8 keeps
    * per-dimension resolution; PQ trades it for deeper compression).
    *
    * == 100 TB design ==
    *
    * The quantizer is two exact scalars per dimension (min/max — one
    * explode+aggregate job, O(dim) collect, no float-sum order
    * sensitivity), carried as plan literals. The full-corpus pass
    * touches `(id, codes)` — int8-sized codes, 8× smaller than the
    * double vectors — and dequantization is arithmetic on literals, not
    * I/O. Queries broadcast; candidate ranking windows over scalars;
    * exact vectors return for `queries × candidates` rows via broadcast
    * joins. The corpus is never shuffled (same plan shape [[pqTopK]]
    * audits).
    *
    * Encode (`floor` of the affine map, clamped) and decode
    * (`mn + code·(mx-mn)/(levels-1)`) use only exact-per-value double
    * arithmetic, so a DuckDB oracle re-derives codes and reconstruction
    * bit-for-bit.
    */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      candidates: Int = 40, levels: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(levels >= 2, s"levels must be >= 2, got $levels")
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val stats = c.select(posexplode(col("nbr_vec")).as(Seq("p", "x")))
      .groupBy(col("p")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("p")).collect()
    val mns = typedLit(stats.map(_.getDouble(1)).toSeq)
    val mxs = typedLit(stats.map(_.getDouble(2)).toSeq)
    val top = lit((levels - 1).toDouble)

    // encode, then reconstruct FROM THE CODES (the persisted form a
    // real index would store), both staged per corpus row
    val codesCol = transform(col("nbr_vec"), (x, i0) => {
      val mn = element_at(mns, i0 + 1)
      val mx = element_at(mxs, i0 + 1)
      when(mx === mn, lit(0))
        .otherwise(least(greatest(floor((x - mn) / (mx - mn) * top), lit(0.0)), top))
        .cast("int")
    })
    val encoded = c.select(col("nbr_id"), codesCol.as("_codes"))
    val recon = transform(col("_codes"), (code, i0) => {
      val mn = element_at(mns, i0 + 1)
      val mx = element_at(mxs, i0 + 1)
      mn + code * (mx - mn) / top
    })
    // persisted barrier: same CollapseProject hazard as the PQ twins —
    // without it the encode+dequantize chain inlines through the query
    // join and re-evaluates per (row, query) pair
    val codes = encoded.select(col("nbr_id"), recon.as("_recon"))
      .select(col("nbr_id"), col("_recon"),
        vecNorm(col("_recon")).as("_rn")) // staged into the index (r18)
      .transform(graft.util.GraftCache.barrier("SimOps.sqTopK"))

    val approx = codes
      .join(broadcast(q.withColumn("_qn", vecNorm(col("q_vec")))),
        col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosineStaged(col("q_vec"), col("_qn"),
          col("_recon"), col("_rn")), lit(-1d)).as("approx"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("nbr_id"))
    val cand = approx
      .withColumn("_crank", row_number().over(wc))
      .where(col("_crank") <= candidates)
      .select(col("query_id"), col("nbr_id"))

    val exact = c.join(broadcast(cand), Seq("nbr_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosine(col("q_vec"), col("nbr_vec")), lit(-1d)).as("sim"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    exact
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** Random-projection (Johnson–Lindenstrauss) top-k: both sides project
    * to `dims` coordinates — dot products with the same deterministic
    * md5-derived planes as [[lshTopK]], WITHOUT the sign quantization —
    * the shortlist ranks candidates by reduced-space cosine, and the
    * exact full-dimension cosine re-ranks the survivors. With
    * `candidates >= corpus size` the result equals [[bruteForceTopK]]
    * exactly (the shortlist cut is the only approximation; spec-pinned).
    * Sketch noise on cosine shrinks as `1/sqrt(dims)`: on the synthetic
    * test embeddings (near-random, tiny neighbor margins — the hardest
    * case for any sketch) 32 dims / 64 candidates holds recall@10 at
    * 0.657, on par with [[lshTopK]]'s 0.650 at the same 32 stored bits
    * of sign information, while real embedding corpora with cluster
    * structure sit far above both.
    *
    * Scale: the projection is map-only and the full vectors DROP before
    * any exchange — the shortlist join moves `dims` doubles per row
    * (32 vs. the embedding's hundreds), and the exact re-rank re-joins
    * corpus vectors BY ID semi-filtered to shortlist survivors, queries
    * broadcast (small by this operator's contract, as in
    * [[bruteForceTopK]]).
    */
  def rpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dims: Int = 32, candidates: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    // fused native JL projection (r18): the composed form below ran
    // `dims` interpreted aggregate/zip_with passes per row and
    // re-derived the md5 plane components per (row × plane × dim) —
    // ~200M md5 calls / 25 s over the 10× corpus. RpProject memoizes
    // the components per executor (same cache as HyperplaneBuckets)
    // and is bit-identical, null semantics included (RpProject doc,
    // parity spec RpProjectSpec). The composed reference form:
    //   array((0 until dims).map(p => aggregate(zip_with(v,
    //     transform(sequence(0, size(v)-1), d => planeComponent(p, d)),
    //     _*_), 0.0, _+_)))
    def project(v: Column): Column = graft.functions.RpProject(v, dims)
    val cP = c.select(col("nbr_id"), project(col("nbr_vec")).as("rp"))
      .select(col("nbr_id"), col("rp"), vecNorm(col("rp")).as("_cn"))
    val qP = q.select(col("query_id"), project(col("q_vec")).as("q_rp"))
      .select(col("query_id"), col("q_rp"), vecNorm(col("q_rp")).as("_qn"))
    val approx = cP.join(broadcast(qP), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosineStaged(col("q_rp"), col("_qn"),
          col("rp"), col("_cn")), lit(-1d)).as("approx"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("nbr_id"))
    val cand = approx
      .withColumn("_crank", row_number().over(wc))
      .where(col("_crank") <= candidates)
      .select(col("query_id"), col("nbr_id"))
    // shortlist is queries × candidates id pairs — tiny by contract, so
    // BOTH rerank joins broadcast it and the corpus never shuffles
    // (sqTopK discipline; plan-audited)
    val candCorpus = c
      .join(broadcast(cand.select(col("nbr_id")).distinct()), Seq("nbr_id"), "left_semi")
    val exact = candCorpus.join(broadcast(cand), Seq("nbr_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosine(col("q_vec"), col("nbr_vec")), lit(-1d)).as("sim"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    exact
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** Element-wise mean of an embedding column per group — embedding
    * pooling (a document vector from its chunk vectors, a class
    * centroid from its members). One hash aggregation whose partial
    * state is `dim` running sums + a count per group: map-side combine
    * reduces every partition to one row per group before the exchange,
    * so shuffle volume is groups × dim doubles regardless of corpus
    * size — the same update-step discipline as [[kMeans]], exposed as
    * an operator. Dimension comes from the first row (vectors must be
    * uniform — standard for an embedding column).
    */
  def meanPool(df: DataFrame, keyCols: Seq[String], vecCol: String,
      outCol: String = "mean_vec"): DataFrame = {
    val c = df.withColumn("__v", col(vecCol).cast("array<double>"))
    val dim = c.select(size(col("__v"))).where(col("__v").isNotNull)
      .limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"meanPool needs at least one non-null vector in '$vecCol'"))
      .getInt(0)
    val sums = (0 until dim).map(i => sum(col("__v").getItem(i)).as(s"__s$i"))
    c.groupBy(keyCols.map(col): _*)
      .agg(count(col("__v")).as("__n"), sums: _*)
      .select(keyCols.map(col) :+
        array((0 until dim).map(i => col(s"__s$i") / col("__n")): _*).as(outCol) :+
        col("__n").as("n_vecs"): _*)
  }

  /** Lloyd's k-means over an embedding column — the semantic-clustering
    * primitive behind cluster-balanced sampling, coreset selection, and
    * topic-stratified corpus splits. Deterministic end to end: seeds are
    * the `k` lowest-id vectors, assignment is cosine argmax with ties to
    * the lowest cell, and each iteration recomputes centroids as the
    * arithmetic mean of the assigned vectors. Returns one row per input
    * vector: `(id, cluster, sim)` — the final assignment and its cosine
    * similarity to the final centroid.
    *
    * == 100 TB design ==
    *
    * The textbook distributed plan, with both halves bounded:
    *
    *  - '''Assignment is map-only.''' Centroids ride in the plan as
    *    literals (k × dim doubles), so every corpus row computes its
    *    argmax cell in one projection — the corpus is never shuffled
    *    and its vectors never enter an exchange.
    *  - '''The update is a partial aggregation.''' Each executor
    *    reduces its slice to k rows of (count, per-dimension sums)
    *    map-side; the exchange carries k × dim doubles per partition,
    *    independent of corpus size. The driver folds those into the
    *    next centroid set (k × dim doubles held on the driver — the
    *    only driver-side state).
    *
    * Work per iteration is one corpus scan; total = (iters + 1) scans.
    * An empty cell keeps its previous centroid (no respawn), so cell
    * ids are stable across iterations. Zero-norm vectors have NaN
    * cosine everywhere; `nanvl(-1)` pins them to the first cell
    * deterministically instead of letting NaN win every argmax.
    *
    * Sizing: past [[AssignBlock]] cells the assignment switches to the
    * [[graft.functions.NearestCentroid]] native expression (centroid
    * matrix as a reference object, one static call — identical values,
    * constant generated-code size, spec-pinned at k=1024 with codegen
    * byte-code stats), and past [[UpdateWideDims]] dimensions the
    * update posexplodes to (cluster, idx, x) skinny aggregation rows
    * instead of dim wide sum columns. Both keep the exchange at
    * k × dim doubles per partition.
    */
  def kMeans(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val cents = kMeansCentroids(corpus, k, iters, idCol, vecCol)
    withNearestCell(c, cents, "v", "cluster", Some("sim"))
      .select(col("id"), col("cluster"), col("sim"))
  }

  /** The trainer half of [[kMeans]]: runs `iters` Lloyd iterations from
    * the deterministic lowest-id seeds and returns the final centroid
    * set — the k × dim doubles an offline train ships to the serving
    * operators ([[ivfTopK]], [[pqTopK]], [[semanticNearDups]] all take
    * them as their optional `centroids` argument). Same distributed
    * shape as [[kMeans]]'s scaladoc: map-only assignment, partial-agg
    * update, k × dim exchange per iteration.
    */
  def kMeansCentroids(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): IndexedSeq[Seq[Double]] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    var centroids = lowestIdVectors(c, k, "id", "v")
    require(centroids.nonEmpty, "kMeans on an empty corpus")
    val dim = centroids.head.size

    for (_ <- 1 to iters) {
      val assigned = withNearestCell(c, centroids, "v", "cluster", None)
      // per-cell (count, per-dimension sums), partial-aggregated map-side
      // either way; collect is k × dim doubles — the only driver state
      val sums: Map[Int, (Long, IndexedSeq[Double])] =
        if (dim <= UpdateWideDims) {
          assigned.groupBy(col("cluster"))
            .agg(count(lit(1)).as("n"),
              (0 until dim).map(i => sum(col("v").getItem(i)).as(s"s$i")): _*)
            .collect()
            .map(r => r.getInt(0) ->
              ((r.getLong(1), (0 until dim).map(i => r.getDouble(2 + i)))))
            .toMap
        } else {
          // skinny form: one (cluster, idx) row per centroid component —
          // k × dim rows through the exchange (same volume as the wide
          // form's k rows × dim columns), constant-size expressions
          val rows = assigned
            .select(col("cluster"), posexplode(col("v")).as(Seq("i", "x")))
            .groupBy(col("cluster"), col("i"))
            .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
            .collect()
          rows.groupBy(_.getInt(0)).map { case (cell, rs) =>
            val byIdx = rs.map(r => r.getInt(1) -> r).toMap
            cell -> ((byIdx(0).getLong(2),
              (0 until dim).map(i => byIdx(i).getDouble(3))))
          }
        }
      centroids = centroids.zipWithIndex.map { case (old, cell) =>
        sums.get(cell) match {
          case Some((n, s)) => s.map(_ / n.toDouble).toVector
          case None => old // an emptied cell keeps its centroid
        }
      }
    }
    centroids
  }

  /** Persist an IVF index: the corpus assigned to its centroid cells,
    * written as parquet PARTITIONED BY cell, plus a `_centroids`
    * sidecar table — so serving ([[probeIvfIndex]]) reads only the
    * probed cells' partitions (a `PartitionFilters`-pruned scan, the
    * plan audit's evidence) instead of re-assigning the corpus per
    * query batch.
    *
    * == 100 TB design ==
    *
    * This is the missing serving half of [[ivfTopK]]: assignment cost
    * is paid ONCE at build (map-only, centroid literals), and every
    * probe after that is a scan of nProbe/numCells of the data, pruned
    * at the PARTITION level so the untouched cells' files are never
    * opened. [[appendToIvfIndex]] assigns only the new batch against
    * the SAME persisted centroids (map-only, append to its cell
    * partitions) — the incremental maintenance a streaming corpus
    * needs; probing build+append equals a from-scratch rebuild exactly
    * (spec-pinned) because per-row assignment is stateless.
    */
  def buildIvfIndex(corpus: DataFrame, root: String, numCells: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[Seq[Seq[Double]]] = None): Unit = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    val cents: Seq[Seq[Double]] = centroids
      .map(_.map(_.toVector).toVector)
      .getOrElse(lowestIdVectors(c, numCells, "nbr_id", "nbr_vec"))
    import spark.implicits._
    cents.zipWithIndex.map { case (cv, cell) => (cell, cv) }
      .toDF("cell", "cv")
      .write.mode("overwrite").parquet(s"$root/_centroids")
    withNearestCell(c, cents, "nbr_vec", "cell", None)
      .select(col("nbr_id"), col("nbr_vec"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$root/cells")
  }

  private def indexCentroids(spark: org.apache.spark.sql.SparkSession,
      root: String): IndexedSeq[Seq[Double]] =
    spark.read.parquet(s"$root/_centroids").orderBy(col("cell"))
      .select(col("cv")).collect()
      .map(_.getSeq[Double](0).toVector).toIndexedSeq

  /** Assign a new batch against the index's persisted centroids and
    * append it to its cell partitions — map-only, touches only the
    * cells the batch lands in. Cell ids stay stable, so existing
    * entries are never rewritten.
    */
  def appendToIvfIndex(batch: DataFrame, root: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    recoverIvfRebuild(batch.sparkSession, root) // crashed-swap cleanup
    val cents = indexCentroids(batch.sparkSession, root)
    val c = batch.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    withNearestCell(c, cents, "nbr_vec", "cell", None)
      .select(col("nbr_id"), col("nbr_vec"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$root/cells")
  }

  /** Re-partition a persisted IVF index under NEW centroids — the
    * maintenance [[appendToIvfIndex]] alone cannot provide: appends
    * assign against the build-time centroids forever, so after a
    * distribution-shifted corpus grows the frozen centroids stop
    * tracking the data and recall decays silently. Pass centroids
    * trained on the CURRENT contents (e.g. [[kMeansCentroids]] over
    * `readIvfIndex`) to recover it (spec-pinned on a shifted corpus).
    *
    * The rebuild is staged-then-swapped: the re-assigned cells and
    * centroid sidecar are fully written under `_rebuild` (so the read
    * of the old index completes before anything moves) and sealed with
    * a `_COMPLETE` marker; the swap then EVACUATES both live dirs to
    * `_old` before installing either staged dir — old and new never
    * coexist in live positions, so a crash anywhere leaves either a
    * consistent generation or a loudly-missing directory, NEVER the
    * silent mix (new cells ranked by old centroids) an interleaved
    * swap risks. A crashed swap is rolled forward (marker present) or
    * discarded (marker absent) by the next writer op — concurrent
    * WRITERS must be quiesced (single-writer contract, like the build
    * itself); a probe racing the swap instant fails loudly on the
    * missing path and retries against the recovered index.
    */
  def rebuildIvfIndex(spark: org.apache.spark.sql.SparkSession,
      root: String, centroids: Seq[Seq[Double]]): Unit = {
    require(centroids.nonEmpty, "rebuild needs at least one centroid")
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverIvfRebuild(spark, root) // finish/abort any crashed swap first
    val staging = s"$root/_rebuild"
    fs.delete(new Path(staging), true) // clear a crashed prior BUILD
    buildIvfIndex(
      spark.read.parquet(s"$root/cells").select(col("nbr_id"), col("nbr_vec")),
      staging, centroids.size, "nbr_id", "nbr_vec", Some(centroids))
    fs.create(new Path(s"$staging/_COMPLETE")).close() // staging sealed
    val old = new Path(s"$root/_old")
    fs.delete(old, true)
    fs.mkdirs(old)
    // evacuate BOTH, then install BOTH (doc above)
    Seq("cells", "_centroids").foreach(d =>
      fs.rename(new Path(s"$root/$d"), new Path(s"$root/_old/$d")))
    Seq("cells", "_centroids").foreach(d =>
      fs.rename(new Path(s"$staging/$d"), new Path(s"$root/$d")))
    fs.delete(new Path(staging), true)
    fs.delete(old, true) // vacuum the superseded generation
  }

  /** Writer-side crash recovery for [[rebuildIvfIndex]]'s swap. `_old`
    * absent ⇒ no swap ever started: any `_rebuild` leftover is a dead
    * partial build, deleted. `_old` present with a `_COMPLETE`-sealed
    * staging ⇒ roll the swap FORWARD (a live dir not yet evacuated —
    * `_old/<d>` missing — is old-generation and moves out; a missing
    * live dir gets the staged one installed). `_old` present without
    * the marker can only mean a crash before any rename (the marker
    * writes first), so the staging is discarded and any evacuated dir
    * restored, belt-and-braces.
    */
  private def recoverIvfRebuild(spark: org.apache.spark.sql.SparkSession,
      root: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$root/_old")
    val staging = s"$root/_rebuild"
    if (!fs.exists(old)) {
      fs.delete(new Path(staging), true)
      return
    }
    val complete = fs.exists(new Path(s"$staging/_COMPLETE"))
    Seq("cells", "_centroids").foreach { d =>
      val live = new Path(s"$root/$d")
      val oldD = new Path(s"$root/_old/$d")
      val stagedD = new Path(s"$staging/$d")
      if (complete) {
        if (!fs.exists(oldD) && fs.exists(live)) fs.rename(live, oldD)
        if (!fs.exists(live) && fs.exists(stagedD)) fs.rename(stagedD, live)
      } else {
        if (!fs.exists(live) && fs.exists(oldD)) fs.rename(oldD, live)
      }
    }
    fs.delete(new Path(staging), true)
    fs.delete(old, true)
  }

  /** The index's current contents in [[buildIvfIndex]]'s column shape
    * (`nbr_id`, `nbr_vec`) — the training input for a rebuild.
    */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    spark.read.parquet(s"$root/cells").select(col("nbr_id"), col("nbr_vec"))

  /** Serve top-k queries from a persisted IVF index: rank the index's
    * cells per query (small query set by contract, as [[ivfTopK]]),
    * then scan ONLY the union of probed cells — a static
    * `cell IN (...)` filter the reader prunes at the partition level —
    * and score/rank exactly like [[ivfTopK]]. Output and semantics are
    * identical to `ivfTopK(corpus, queries, …)` with the same
    * centroids (oracle-gated via e11).
    */
  def probeIvfIndex(spark: org.apache.spark.sql.SparkSession, root: String,
      queries: DataFrame, k: Int, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = indexCentroids(spark, root)
    require(nProbe <= cents.size,
      s"nProbe ($nProbe) must be <= number of cells (${cents.size})")
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    // same two-regime sims expression as ivfTopK: staged array ≤256
    // cells, CentroidSims native expression past that
    val cellSims =
      if (cents.size <= AssignBlock)
        array(cents.map(ct =>
          nanvl(cosine(col("q_vec"), typedLit(ct)), lit(-1d))): _*)
      else graft.functions.CentroidSims(col("q_vec"), cents)
    val wCells = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cellSim").desc, col("cell"))
    val probeCells = q.withColumn("cellSims", cellSims)
      .select(col("query_id"),
        posexplode(col("cellSims")).as(Seq("cell", "cellSim")))
      .withColumn("cellRank", row_number().over(wCells))
      .where(col("cellRank") <= nProbe)
      .select(col("cell"), col("query_id"))
    // the probed-cell union is <= queries × nProbe ints — a bounded
    // driver collect that becomes the scan's static partition filter
    val probedCells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val assigned = spark.read.parquet(s"$root/cells")
      .where(col("cell").isin(probedCells: _*))
      .withColumn("_cn", vecNorm(col("nbr_vec"))) // staged at scan (r18)
    val qProbes = q.join(broadcast(probeCells), "query_id")
      .select(col("cell"), col("query_id"), col("q_vec"),
        vecNorm(col("q_vec")).as("_qn"))
    val scored = assigned.join(broadcast(qProbes), "cell")
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        nanvl(cosineStaged(col("q_vec"), col("_qn"),
          col("nbr_vec"), col("_cn")), lit(-1d)).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** Per-subspace PQ codebook trainer: Lloyd iterations under the
    * squared-L2 metric [[pqTopK]] ENCODES with (training under cosine —
    * what slicing [[kMeansCentroids]] output amounts to — optimizes the
    * wrong objective for a product quantizer). Seeds are the lowest-id
    * vectors' subvectors (= the serving default, so iters=0 returns it
    * exactly); every iteration is ONE corpus job: assignment is the
    * [[graft.functions.PqEncode]] expression itself (the same argmin
    * the encoder runs, map-only, codebooks as plan literals), and the
    * update posexplodes to (subspace, code, dim, x) rows — the exchange
    * carries numSubspaces × numCentroids × subDim sums per partition,
    * independent of corpus size. Emptied codes keep their centroid.
    * Returns `books(j)(code)(i)` for [[pqTopK]]'s `codebooks` argument;
    * recall lift over both untrained forms is spec-pinned.
    */
  def pqTrainCodebooks(corpus: DataFrame, numSubspaces: Int = 8,
      numCentroids: Int = 16, iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val cents = lowestIdVectors(c, numCentroids, "id", "v")
    require(cents.nonEmpty, "pqTrainCodebooks on an empty corpus")
    val dim = cents.head.size
    require(dim % numSubspaces == 0,
      s"dim $dim not divisible into $numSubspaces subspaces")
    val subDim = dim / numSubspaces
    var books: IndexedSeq[IndexedSeq[Seq[Double]]] = (0 until numSubspaces)
      .map(j => cents.map(_.slice(j * subDim, (j + 1) * subDim)))

    for (_ <- 1 to iters) {
      val rows = c
        .withColumn("__codes",
          graft.functions.PqEncode(col("v"), books.map(_.toSeq)))
        .select(posexplode(col("__codes")).as(Seq("j", "code")), col("v"))
        .withColumn("__sub", transform(sequence(lit(0), lit(subDim - 1)),
          i => element_at(col("v"), col("j") * subDim + i + 1)))
        .select(col("j"), col("code"), posexplode(col("__sub")).as(Seq("i", "x")))
        .groupBy(col("j"), col("code"), col("i"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
        .collect()
      val byCell = rows.groupBy(r => (r.getInt(0), r.getInt(1))).map {
        case (key, rs) =>
          val byIdx = rs.map(r => r.getInt(2) -> r).toMap
          key -> ((byIdx(0).getLong(3),
            (0 until subDim).map(i => byIdx(i).getDouble(4))))
      }
      books = books.zipWithIndex.map { case (book, j) =>
        book.zipWithIndex.map { case (old, code) =>
          byCell.get((j, code)) match {
            case Some((n, s)) => s.map(_ / n.toDouble).toVector
            case None => old
          }
        }
      }
    }
    books
  }
}
