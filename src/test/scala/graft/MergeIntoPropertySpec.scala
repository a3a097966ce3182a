package graft

import graft.sources.{MergeIntoClause, MergeIntoDelete, MergeIntoInsert, MergeIntoUpdate, WarehouseTable}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.util.Random

/** Model-based check of [[WarehouseTable.mergeInto]]: random target
  * tables, random sources, random ordered clause sets (conditional
  * UPDATE/DELETE/INSERT, NOT MATCHED BY SOURCE sweeps), each executed
  * both by the engine (day-pruned copy-on-write, semi-join discovery,
  * fixpoint day moves) and by a direct in-memory evaluation of the
  * ANSI first-match-wins semantics. Seeded RNG → reproducible.
  */
class MergeIntoPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  import MergeIntoPropertySpec.{TRow, SRow}

  private val destSchema = StructType(Seq(
    StructField("k1", LongType),
    StructField("v", LongType)))

  /** One clause in both representations: engine Columns + model fn. */
  private sealed trait MC {
    def engine: MergeIntoClause
  }
  // matched clauses: cond(t, s), update assigns over (t, s)
  private case class MUpd(condM: (TRow, SRow) => Boolean, cond: Option[Column],
      assignM: (TRow, SRow) => TRow, assigns: Map[String, Column]) extends MC {
    def engine = MergeIntoUpdate(cond, assigns)
  }
  private case class MDel(condM: (TRow, SRow) => Boolean,
      cond: Option[Column]) extends MC {
    def engine = MergeIntoDelete(cond)
  }
  // insert clauses: cond(s), assigns over s
  private case class MIns(condM: SRow => Boolean, cond: Option[Column],
      assignM: SRow => TRow, assigns: Map[String, Column]) extends MC {
    def engine = MergeIntoInsert(cond, assigns)
  }
  // by-source clauses: cond(t), update over t
  private case class BUpd(condM: TRow => Boolean, cond: Option[Column],
      assignM: TRow => TRow, assigns: Map[String, Column]) extends MC {
    def engine = MergeIntoUpdate(cond, assigns)
  }
  private case class BDel(condM: TRow => Boolean,
      cond: Option[Column]) extends MC {
    def engine = MergeIntoDelete(cond)
  }

  private def tc(f: String) = col(s"__t.`$f`")

  /** Random matched clause (engine + model agree by construction). */
  private def randMatched(rnd: Random): MC = rnd.nextInt(4) match {
    case 0 => MUpd((_, _) => true, None,
      (t, s) => t.copy(v = s.v + t.v),
      Map("v" -> (col("sv") + tc("v"))))
    case 1 =>
      val m = rnd.nextInt(3) + 2
      MUpd((_, s) => s.v % m == 0, Some(col("sv") % m === 0),
        (t, s) => t.copy(v = s.v * 10, day = s.day),
        Map("v" -> (col("sv") * 10), "_pday" -> col("sday")))
    case 2 =>
      val m = rnd.nextInt(3) + 2
      MDel((t, _) => t.v % m == 0, Some(tc("v") % m === 0))
    case _ => MDel((_, _) => true, None)
  }

  private def randInsert(rnd: Random): MC = rnd.nextInt(3) match {
    case 0 => MIns(_ => true, None,
      s => TRow(s.k, s.v, s.day),
      Map("k1" -> col("sk"), "v" -> col("sv"), "_pday" -> col("sday")))
    case 1 =>
      val m = rnd.nextInt(3) + 2
      MIns(s => s.k % m == 0, Some(col("sk") % m === 0),
        s => TRow(s.k, s.v + 1000, s.day),
        Map("k1" -> col("sk"), "v" -> (col("sv") + 1000), "_pday" -> col("sday")))
    case _ => MIns(_ => false, Some(lit(false)),
      s => TRow(s.k, s.v, s.day),
      Map("k1" -> col("sk"), "v" -> col("sv"), "_pday" -> col("sday")))
  }

  private def randBySource(rnd: Random): MC = rnd.nextInt(3) match {
    case 0 => BUpd(_ => true, None,
      t => t.copy(v = -t.v), Map("v" -> (-tc("v"))))
    case 1 =>
      val m = rnd.nextInt(3) + 2
      BDel(t => t.k % m == 0, Some(tc("k1") % m === 0))
    case _ => BDel(_ => true, None)
  }

  /** ANSI first-match-wins model. */
  private def model(target: Seq[TRow], source: Seq[SRow],
      matched: Seq[MC], notMatched: Seq[MC], bySource: Seq[MC]): Seq[TRow] = {
    val srcByKey = source.groupBy(_.k)
    val out = Seq.newBuilder[TRow]
    target.foreach { t =>
      srcByKey.get(t.k) match {
        case Some(ss) =>
          // source keys are unique in the generator → single match
          val s = ss.head
          matched.collectFirst {
            case MUpd(cm, _, am, _) if cm(t, s) => Some(am(t, s))
            case MDel(cm, _) if cm(t, s) => None
          } match {
            case Some(Some(updated)) => out += updated
            case Some(None) => () // deleted
            case None => out += t // no clause applied
          }
        case None =>
          bySource.collectFirst {
            case BUpd(cm, _, am, _) if cm(t) => Some(am(t))
            case BDel(cm, _) if cm(t) => None
          } match {
            case Some(Some(updated)) => out += updated
            case Some(None) => ()
            case None => out += t
          }
      }
    }
    val tKeys = target.map(_.k).toSet
    source.filterNot(s => tKeys.contains(s.k)).foreach { s =>
      notMatched.collectFirst {
        case MIns(cm, _, am, _) if cm(s) => am(s)
      }.foreach(out += _)
    }
    out.result()
  }

  test("mergeInto matches the ANSI model on 12 randomized clause sets") {
    val rnd = new Random(20260815L)
    (1 to 12).foreach { trial =>
      val root = Files.createTempDirectory("mi-prop").toString + "/tbl"
      val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
      val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
      val target = (0L until 40L).filter(_ => rnd.nextBoolean()).map(k =>
        TRow(k, rnd.nextInt(100).toLong, days(rnd.nextInt(3))))
      val source = (0L until 60L).filter(_ => rnd.nextBoolean()).map(k =>
        SRow(k, rnd.nextInt(100).toLong, days(rnd.nextInt(3))))
      if (target.nonEmpty) t.append(
        target.toDF("k1", "v", "day").select($"k1", $"v",
          to_timestamp($"day", "yyyy-MM-dd").as("partitionTime")))

      val matched = Seq.fill(rnd.nextInt(3))(randMatched(rnd))
      val notMatchedC = Seq.fill(rnd.nextInt(3))(randInsert(rnd))
      val bySource = Seq.fill(rnd.nextInt(2))(randBySource(rnd))
      if ((matched ++ notMatchedC ++ bySource).isEmpty) () // degenerate: skip
      else {
        val srcDf = source.toDF("sk", "sv", "sday")
        t.mergeInto(srcDf, tc("k1") === col("sk"),
          matched.map(_.engine), notMatchedC.map(_.engine),
          bySource.map(_.engine))
        val got = t.read().select($"k1", $"v", $"_pday".cast("string"))
          .as[(Long, Long, String)].collect().toSeq
          .map { case (k, v, d) => TRow(k, v, d) }
          .sortBy(r => (r.k, r.v, r.day))
        val want = model(target, source, matched, notMatchedC, bySource)
          .sortBy(r => (r.k, r.v, r.day))
        assert(got == want,
          s"trial $trial: got=$got\nwant=$want\nmatched=$matched\n" +
            s"notMatched=$notMatchedC\nbySource=$bySource\n" +
            s"target=$target\nsource=$source")
      }
    }
  }

  test("mergeInto prunes: merge touching one day leaves other days' files untouched") {
    val root = Files.createTempDirectory("mi-prune").toString + "/tbl"
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    (1 to 3).foreach { d =>
      t.append((0L until 50L).map(k => (k + d * 1000L, k)).toDF("k1", "v")
        .withColumn("partitionTime",
          to_timestamp(lit(f"2024-01-0$d%d"), "yyyy-MM-dd")))
    }
    // inputFiles is leaf-level (ignores the filter) — compare by path
    val filesBefore = t.read().inputFiles
      .filterNot(_.contains("_pday=2024-01-02")).sorted.toSeq
    // source hits only day-2 keys, inserts into day 2
    val src = (2000L until 2010L).map(k => (k, k * 2)).toDF("sk", "sv")
      .withColumn("sday", lit("2024-01-02"))
    val touched = t.mergeInto(src, tc("k1") === col("sk"),
      Seq(MergeIntoUpdate(None, Map("v" -> col("sv")))),
      Seq(MergeIntoInsert(None, Map(
        "k1" -> col("sk"), "v" -> col("sv"), "_pday" -> col("sday")))),
      Seq.empty)
    assert(touched == Seq("2024-01-02"), s"pruning failed: $touched")
    val filesAfter = t.read().inputFiles
      .filterNot(_.contains("_pday=2024-01-02")).sorted.toSeq
    assert(filesAfter == filesBefore, "untouched days' files were rewritten")
  }
}

/** Row models live at top level so Spark can derive their encoders. */
object MergeIntoPropertySpec {
  final case class TRow(k: Long, v: Long, day: String)
  final case class SRow(k: Long, v: Long, day: String)
}
