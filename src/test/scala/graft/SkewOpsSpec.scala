package graft

import graft.operators.SkewOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** saltedJoin must be a pure plan rewrite: same rows as the unsalted
  * join under any salt count, deterministic under re-evaluation, with
  * the salt visible in the join keys (so the exchange actually spreads
  * a hot key).
  */
class SkewOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def fixture = {
    // 10k rows, 90% on one hot key
    val skewed = spark.range(10000).select(
      $"id".as("row_id"),
      when($"id" % 10 < 9, lit(7L)).otherwise($"id" % 100).as("k"),
      ($"id" * 2).as("payload"))
    val dim = spark.range(100).select($"id".as("k"), concat(lit("d"), $"id").as("label"))
    (skewed, dim)
  }

  test("saltedJoin equals the unsalted join for several salt counts") {
    val (skewed, dim) = fixture
    val plain = skewed.join(dim, Seq("k"))
      .select($"row_id", $"k", $"payload", $"label")
      .as[(Long, Long, Long, String)].collect().toSet
    for (salts <- Seq(1, 3, 8)) {
      val salted = SkewOps.saltedJoin(skewed, dim, Seq("k"), "row_id", salts)
        .select($"row_id", $"k", $"payload", $"label")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(salted == plain, s"salted($salts) diverged from the plain join")
    }
  }

  test("salt participates in the join keys and spreads the hot key") {
    val (skewed, dim) = fixture
    val out = SkewOps.saltedJoin(skewed, dim, Seq("k"), "row_id", 8)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt column absent from the executed plan:\n$plan")
    // the hot key's rows must actually land in several salt groups
    val saltSpread = skewed
      .withColumn("_salt", pmod(xxhash64($"row_id"), lit(8L)).cast("int"))
      .where($"k" === 7).select($"_salt").distinct().count()
    assert(saltSpread == 8, s"hot key covered only $saltSpread of 8 salts")
  }

  test("saltedJoin is deterministic across evaluations (retry safety)") {
    val (skewed, dim) = fixture
    val a = SkewOps.saltedJoin(skewed, dim, Seq("k"), "row_id", 8)
      .select($"row_id").as[Long].collect().sorted
    val b = SkewOps.saltedJoin(skewed, dim, Seq("k"), "row_id", 8)
      .select($"row_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("AQE skew join splits the hot partition before salting is ever needed") {
    // the documented FIRST resort for skew (SkewOps Scaladoc): with
    // aggressive-enough thresholds AQE re-plans the sort-merge join over
    // a skewed exchange into a skew=true join that splits the hot
    // partition into subpartitions — no code change, no salt columns.
    // This pins that the engine-level path actually engages, so
    // saltedJoin stays the third resort it claims to be.
    val pairs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~99% of 200k rows on one key → one shuffle partition ≫ the rest
      val skewed = spark.range(200000).select(
        when($"id" % 100 < 99, lit(7L)).otherwise($"id" % 1000).as("k"),
        concat(lit("payload-"), $"id").as("payload"))
      val dim = spark.range(1000).select(
        $"id".as("k"), concat(lit("d"), $"id").as("label"))
      val j = skewed.join(dim, Seq("k"))
      // collect() (not count()) so THIS frame's adaptive plan finalizes
      assert(j.collect().length == 200000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
