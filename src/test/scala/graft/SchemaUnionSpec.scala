package graft

import graft.schema.{EvolutionPolicy, SchemaEvolutionException, SchemaUnion}
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Rule tests ported from the reference's schema-evolution matrix
  * (`SchemaManagerTest.java:353-707`) plus ScalaCheck properties over
  * generated schemas (sampled directly — the scalatest/scalacheck bridge
  * artifact is not in the offline cache).
  */
class SchemaUnionSpec extends AnyFunSuite {

  /** Deterministic property driver: n samples from fixed seeds. */
  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(t => f(t._1, t._2))

  private val req = (n: String, t: DataType) => StructField(n, t, nullable = false)
  private val opt = (n: String, t: DataType) => StructField(n, t, nullable = true)

  // ---- ported unionization cases (SchemaManagerTest unionize suite)

  test("field on one side only becomes NULLABLE") {
    val a = StructType(Seq(req("f1", LongType)))
    val b = StructType(Seq(req("f2", StringType)))
    val u = SchemaUnion.unionize(a, b)
    assert(u.fieldNames.toSeq == Seq("f1", "f2"))
    assert(u.forall(_.nullable))
  }

  test("REQUIRED in both stays REQUIRED") {
    val a = StructType(Seq(req("f1", LongType)))
    val u = SchemaUnion.unionize(a, a)
    assert(!u("f1").nullable)
  }

  test("REQUIRED relaxed by NULLABLE second side") {
    val a = StructType(Seq(req("f1", LongType)))
    val b = StructType(Seq(opt("f1", LongType)))
    assert(SchemaUnion.unionize(a, b)("f1").nullable)
    // but NULLABLE first + REQUIRED second keeps first's mode (reference
    // takes second's mode only on REQUIRED→NULLABLE relaxation)
    assert(SchemaUnion.unionize(b, a)("f1").nullable)
  }

  test("type conflict rejected") {
    val a = StructType(Seq(req("f1", LongType)))
    val b = StructType(Seq(req("f1", StringType)))
    intercept[SchemaEvolutionException](SchemaUnion.unionize(a, b))
  }

  test("integral widths are one BigQuery INTEGER type") {
    val a = StructType(Seq(req("f1", IntegerType)))
    val b = StructType(Seq(opt("f1", LongType)))
    val u = SchemaUnion.unionize(a, b)
    assert(u("f1").dataType == IntegerType) // first side's physical type kept
    assert(u("f1").nullable)
  }

  test("REPEATED fields keep their mode and are never relaxed") {
    val a = StructType(Seq(StructField("arr", ArrayType(LongType), nullable = false)))
    val b = StructType(Seq(req("other", StringType)))
    val u = SchemaUnion.unionize(a, b)
    assert(!u("arr").nullable)    // repeated: untouched
    assert(u("other").nullable)   // absent from first: relaxed
  }

  test("RECORD fields union recursively, extras appended NULLABLE") {
    val a = StructType(Seq(req("rec", StructType(Seq(req("x", LongType))))))
    val b = StructType(Seq(req("rec", StructType(Seq(
      opt("x", LongType), req("y", StringType))))))
    val u = SchemaUnion.unionize(a, b)
    val rec = u("rec").dataType.asInstanceOf[StructType]
    assert(rec.fieldNames.toSeq == Seq("x", "y"))
    assert(rec("x").nullable)   // relaxed by second side
    assert(rec("y").nullable)   // new on second side → NULLABLE
  }

  test("field order: first schema's order, then second's extras") {
    val a = StructType(Seq(req("b", LongType), req("a", LongType)))
    val b = StructType(Seq(req("c", LongType), req("a", LongType)))
    assert(SchemaUnion.unionize(a, b).fieldNames.toSeq == Seq("b", "a", "c"))
  }

  // ---- validation gates (SchemaManager.java:471-506)

  test("new NULLABLE field requires allowNewFields") {
    val a = StructType(Seq(req("f1", LongType)))
    val b = StructType(Seq(req("f1", LongType), opt("f2", StringType)))
    SchemaUnion.validate(a, b, EvolutionPolicy())
    intercept[SchemaEvolutionException](
      SchemaUnion.validate(a, b, EvolutionPolicy(allowNewFields = false)))
  }

  test("new REQUIRED field additionally requires relaxation gate") {
    val a = StructType(Seq(req("f1", LongType)))
    val b = StructType(Seq(req("f1", LongType), req("f2", StringType)))
    SchemaUnion.validate(a, b, EvolutionPolicy())
    intercept[SchemaEvolutionException](SchemaUnion.validate(a, b,
      EvolutionPolicy(allowNewFields = true, allowFieldRelaxation = false)))
  }

  test("relaxation requires allowFieldRelaxation") {
    val a = StructType(Seq(req("f1", LongType)))
    val b = StructType(Seq(opt("f1", LongType)))
    SchemaUnion.validate(a, b, EvolutionPolicy())
    intercept[SchemaEvolutionException](SchemaUnion.validate(a, b,
      EvolutionPolicy(allowFieldRelaxation = false)))
  }

  test("evolve applies pairwise in sequence (order-sensitive)") {
    val s1 = StructType(Seq(req("f1", LongType)))
    val s2 = StructType(Seq(req("f1", LongType), opt("f2", StringType)))
    val out = SchemaUnion.evolve(Seq(s1, s2))
    assert(out.fieldNames.toSeq == Seq("f1", "f2"))
    // with relaxation disabled, a sequence that implies relaxation fails
    intercept[SchemaEvolutionException](SchemaUnion.evolve(
      Seq(s1, StructType(Seq(opt("f1", LongType)))),
      EvolutionPolicy(allowFieldRelaxation = false)))
  }

  test("relaxWhereNecessary forces new non-REPEATED fields NULLABLE") {
    val existing = StructType(Seq(req("f1", LongType)))
    val proposed = StructType(Seq(req("f1", LongType), req("f2", StringType),
      StructField("arr", ArrayType(LongType), nullable = false)))
    val out = SchemaUnion.relaxWhereNecessary(existing, proposed)
    assert(!out("f1").nullable)
    assert(out("f2").nullable)
    assert(!out("arr").nullable)
  }

  test("unionDescription: latest non-null doc wins") {
    assert(SchemaUnion.unionDescription(
      Seq(Some("a"), None, Some("b"), None)) == Some("b"))
    assert(SchemaUnion.unionDescription(Seq(None, None)).isEmpty)
  }

  // ---- ScalaCheck properties

  private val atomGen: Gen[DataType] =
    Gen.oneOf(LongType, StringType, DoubleType, BooleanType, TimestampType)

  private def fieldGen(names: Seq[String]): Gen[StructField] = for {
    n <- Gen.oneOf(names)
    t <- atomGen
    nullable <- Arbitrary.arbitrary[Boolean]
  } yield StructField(n, t, nullable)

  // Schemas over a small name pool with a FIXED name→type assignment so
  // unions never hit the (separately tested) type-conflict path.
  private val pool = Seq("a", "b", "c", "d", "e")
  private val typeOf: Map[String, DataType] =
    pool.zip(Seq(LongType, StringType, DoubleType, BooleanType, TimestampType)).toMap
  private val schemaGen: Gen[StructType] = for {
    names <- Gen.someOf(pool)
    if names.nonEmpty
    nulls <- Gen.listOfN(names.size, Arbitrary.arbitrary[Boolean])
  } yield StructType(names.zip(nulls).map { case (n, nl) =>
    StructField(n, typeOf(n), nl)
  }.toSeq)

  test("property: unionize(s, s) preserves names, types, modes") {
    forAll(schemaGen) { s =>
      val u = SchemaUnion.unionize(s, s)
      assert(u.fieldNames.toSeq == s.fieldNames.toSeq)
      assert(u.fields.zip(s.fields).forall { case (a, b) =>
        a.dataType == b.dataType && a.nullable == b.nullable })
    }
  }

  test("property: union is idempotent (unionize(u, s2) == u)") {
    forAll(schemaGen, schemaGen) { (s1, s2) =>
      val u = SchemaUnion.unionize(s1, s2)
      assert(SchemaUnion.unionize(u, s2) == u)
    }
  }

  test("property: union contains every field of both sides") {
    forAll(schemaGen, schemaGen) { (s1, s2) =>
      val u = SchemaUnion.unionize(s1, s2).fieldNames.toSet
      assert((s1.fieldNames.toSet ++ s2.fieldNames.toSet) == u)
    }
  }

  test("property: name sets commute (order may differ)") {
    forAll(schemaGen, schemaGen) { (s1, s2) =>
      assert(SchemaUnion.unionize(s1, s2).fieldNames.toSet ==
        SchemaUnion.unionize(s2, s1).fieldNames.toSet)
    }
  }

  test("property: a field REQUIRED in both stays REQUIRED; nullable anywhere wins") {
    forAll(schemaGen, schemaGen) { (s1, s2) =>
      val u = SchemaUnion.unionize(s1, s2)
      u.fields.foreach { f =>
        val in1 = s1.fieldNames.contains(f.name)
        val in2 = s2.fieldNames.contains(f.name)
        if (in1 && in2)
          assert(f.nullable == (s1(f.name).nullable || s2(f.name).nullable))
        else assert(f.nullable)
      }
    }
  }
}
