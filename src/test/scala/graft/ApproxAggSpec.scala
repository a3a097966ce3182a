package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound pins for the approximate aggregates that replace their
  * exact forms at warehouse scale: `approx_count_distinct` (HLL++ —
  * fixed-size sketch with map-side merge, vs an exact distinct's
  * corpus-sized exchange) and `percentile_approx` (t-digest/QuantileSummaries
  * under a relative-accuracy knob, the swap t10's scaladoc documents for
  * the 100 TB profile path). Both are deterministic for a given input —
  * the bounds here are regressions guards, not flaky tolerances.
  */
class ApproxAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact on real cardinalities") {
    val li = Tables.load(spark, sf, "lineitem")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val exact = li.select(cols.map(c => countDistinct(col(c)).as(c)): _*)
      .head()
    val approx = li.select(cols.map(c => approx_count_distinct(col(c)).as(c)): _*)
      .head()
    cols.zipWithIndex.foreach { case (c, i) =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      val err = math.abs(a - e) / e
      info(f"$c: exact ${e.toLong}, approx ${a.toLong}, err ${err * 100}%.2f%%")
      assert(err < 0.05, f"$c HLL error $err%.4f >= 5%%")
    }
  }

  test("approx_count_distinct is deterministic and merge-consistent across layouts") {
    val li = Tables.load(spark, sf, "lineitem").select($"l_orderkey")
    val a = li.select(approx_count_distinct($"l_orderkey")).as[Long].head()
    val b = li.repartition(13).select(approx_count_distinct($"l_orderkey"))
      .as[Long].head()
    // HLL register merge is order/layout-insensitive: same sketch state
    assert(a == b, s"HLL estimate changed with layout: $a vs $b")
  }

  test("count_min_sketch: estimates over-count only, within eps*N of exact") {
    // CMS guarantees est >= true and est <= true + eps*N w.p. 1-confidence;
    // the heavy-hitter frequency pass a 100 TB token/url profile uses when
    // an exact groupBy would be a full shuffle of the key set
    val ev = Tables.events(spark, sf).select($"event_type")
    val n = ev.count()
    val eps = 0.001
    val sketchBytes = ev.select(
      count_min_sketch($"event_type", lit(eps), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val exact = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS under-counted $k: $est < $c")
      assert(est <= c + (eps * n).ceil.toLong,
        s"CMS estimate for $k off by more than eps*N: $est vs $c (N=$n)")
    }
  }

  test("SketchOps.countMin: domination, shard-merge identity, bounded size") {
    // the relational (oracle-replayable, mergeable) CMS next to the
    // builtin binary one above: per-cell counters as (row, bucket, cnt)
    import graft.operators.SketchOps
    val toks = Tables.load(spark, sf, "documents")
      .select($"doc_id", explode(split(
        graft.llm.TextOps.normalizeText($"text"), " ")).as("token"))
      .where(length($"token") > 0)
    val sketch = SketchOps.countMin(toks, "token", depth = 4, width = 64)
    assert(sketch.count() <= 4 * 64, "sketch exceeded depth x width cells")
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("c"))
    val est = SketchOps.cmsEstimate(exact.select($"token"), sketch, "token",
      depth = 4, width = 64)
    val joined = exact.join(est, "token")
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (t, c, e) =>
      assert(e >= c, s"CMS under-counted '$t': $e < $c") }
    // mergeability: sketch(half A) + sketch(half B) must equal
    // sketch(whole) cell-for-cell — the shard roll-up contract
    val a = SketchOps.countMin(toks.where($"doc_id" % 2 === 0), "token", 4, 64)
    val b = SketchOps.countMin(toks.where($"doc_id" % 2 =!= 0), "token", 4, 64)
    val merged = SketchOps.cmsMerge(a, b)
      .as[(Int, Long, Long)].collect().toSet
    val whole = sketch.as[(Int, Long, Long)].collect().toSet
    assert(merged == whole, "shard-merged sketch diverges from whole-corpus sketch")
  }

  test("SketchOps.ddSketch: relative-error bound, merge identity, bounded size") {
    import graft.operators.SketchOps
    val ev = Tables.events(spark, sf).select($"event_type", $"user_id",
      round($"value" * 100, 0).cast("long").as("cents"))
    val sk = SketchOps.ddSketch(ev, "event_type", "cents")
    // size: buckets per key <= subs * bits(max cents)
    val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(
      ev.agg(max($"cents")).as[Long].head())
    val perKey = sk.groupBy($"key").agg(count(lit(1)).as("n")).as[(String, Long)]
      .collect()
    perKey.foreach { case (k, n) =>
      assert(n <= 8L * maxBits, s"key $k has $n cells > ${8L * maxBits}") }
    // every quantile estimate within the 1/(2*subs) = 6.25% relative bound
    // of the true quantile (both positive; exact quantile via percentile)
    val qs = SketchOps.ddQuantiles(sk,
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .as[(String, String, Int, Double)].collect()
    // truth = the discrete order statistic at the sketch's own rank
    // ceil(q*n): that value provably lands in the selected bucket, so
    // the midpoint is within 1/(2*subs) relative error of it
    val sorted = ev.where($"cents" > 0).groupBy($"event_type")
      .agg(sort_array(collect_list($"cents")).as("v"))
      .as[(String, Seq[Long])].collect().toMap
    val rational = Map("p50" -> ((1, 2)), "p90" -> ((9, 10)), "p99" -> ((99, 100)))
    assert(qs.nonEmpty)
    qs.foreach { case (k, q, _, est) =>
      val (num, den) = rational(q)
      val arr = sorted(k)
      val truth = arr((num * arr.size + den - 1) / den - 1).toDouble
      assert(math.abs(est - truth) <= truth * 0.0625 + 1e-9,
        s"$k/$q estimate $est off true $truth beyond 6.25%") }
    // shard-merge identity, cell for cell
    val a = SketchOps.ddSketch(ev.where($"user_id" % 2 === 0), "event_type", "cents")
    val b = SketchOps.ddSketch(ev.where($"user_id" % 2 =!= 0), "event_type", "cents")
    val merged = SketchOps.ddMerge(a, b).as[(String, Int, Long)].collect().toSet
    val whole = sk.as[(String, Int, Long)].collect().toSet
    assert(merged == whole, "shard-merged dd sketch diverges from whole-stream sketch")
    // non-positive values are excluded by contract
    val withZero = Seq(("k", 0L), ("k", -5L), ("k", 3L)).toDF("event_type", "cents")
    assert(SketchOps.ddSketch(withZero, "event_type", "cents")
      .agg(sum($"cnt")).as[Long].head() == 1L)
  }

  test("percentile_approx brackets the exact percentile at accuracy 10000") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(expr("percentile(value, 0.5)")).as[Double].head()
    val approx = ev.select(expr("percentile_approx(value, 0.5, 10000)"))
      .as[Double].head()
    val spread = ev.select(max($"value") - min($"value")).as[Double].head()
    info(f"median: exact $exact%.6f approx $approx%.6f (range $spread%.2f)")
    assert(math.abs(approx - exact) <= spread * 0.01,
      s"approx median $approx too far from exact $exact")
  }
}
