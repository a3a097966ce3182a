package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Raised when a schema change violates the evolution rules — the Spark
  * analog of the reference's `BigQueryConnectException` in
  * `SchemaManager.validateSchemaChange` (`SchemaManager.java:471-506`).
  */
final class SchemaEvolutionException(msg: String) extends RuntimeException(msg)

/** Evolution gates, mirroring `allowNewBigQueryFields` and
  * `allowBigQueryRequiredFieldRelaxation` (`BigQuerySinkConfig`).
  */
final case class EvolutionPolicy(
    allowNewFields: Boolean = true,
    allowFieldRelaxation: Boolean = true)

/** U1-U3 — schema unionization / relaxation / validation with the
  * reference's exact rules (`SchemaManager.java:379-522`), over Spark
  * `StructType`s.
  *
  * Mode mapping: BigQuery REQUIRED ↔ `nullable = false`, NULLABLE ↔
  * `nullable = true`, REPEATED ↔ `ArrayType` (arrays are "implicitly
  * nullable" and never get their mode rewritten —
  * `SchemaManager.java:442-447`). Type equality follows the reference's
  * BigQuery-type granularity (`BigQuerySchemaConverter.java:65-84`): all
  * integral widths are one INTEGER type, FLOAT32/64 one FLOAT type.
  *
  * Ordering: the reference builds `LinkedHashMap`s — the union keeps the
  * first schema's field order, with the second schema's extra fields
  * appended in their own order. Replicated exactly.
  */
object SchemaUnion {

  /** Reference `unionizeSchemas` (`SchemaManager.java:434-455`): single
    * pairwise union, no validation.
    */
  def unionize(first: StructType, second: StructType): StructType = {
    val secondByName = second.fields.map(f => f.name -> f).toMap
    val fromFirst = first.fields.map { ff =>
      secondByName.get(ff.name) match {
        case None => nullableUnlessRepeated(ff)
        case Some(sf) => unionizeFields(ff, sf)
      }
    }
    val firstNames = first.fieldNames.toSet
    val extras = second.fields.filterNot(f => firstNames.contains(f.name))
      .map(nullableUnlessRepeated)
    StructType(fromFirst ++ extras)
  }

  /** Repeated (array) fields keep their mode; everything else becomes
    * NULLABLE when present on only one side (`SchemaManager.java:444-451,
    * 460-469`).
    */
  private def nullableUnlessRepeated(f: StructField): StructField =
    if (isRepeated(f)) f else f.copy(nullable = true)

  private def isRepeated(f: StructField): Boolean =
    f.dataType.isInstanceOf[ArrayType]

  /** Reference `unionizeFields` (`SchemaManager.java:391-426`): name and
    * type must match; REQUIRED→NULLABLE relaxation taken from the second
    * side; RECORD types merged recursively.
    */
  private def unionizeFields(ff: StructField, sf: StructField): StructField = {
    require(ff.name == sf.name,
      s"Cannot perform union operation on two fields having different names. " +
        s"Field names are '${ff.name}' and '${sf.name}'.")
    if (!typesMatch(ff.dataType, sf.dataType))
      throw new SchemaEvolutionException(
        s"Cannot perform union operation on two fields having different datatypes. " +
          s"Field name is '${ff.name}' and datatypes are '${ff.dataType.simpleString}' " +
          s"and '${sf.dataType.simpleString}'.")
    val relaxed = if (isRelaxation(ff, sf)) ff.copy(nullable = true) else ff
    relaxed.dataType match {
      case _: StructType =>
        val merged = unionizeRecord(
          relaxed.dataType.asInstanceOf[StructType],
          sf.dataType.asInstanceOf[StructType])
        relaxed.copy(dataType = merged)
      case ArrayType(fe: StructType, n) if sf.dataType.isInstanceOf[ArrayType] =>
        sf.dataType.asInstanceOf[ArrayType].elementType match {
          case se: StructType =>
            relaxed.copy(dataType = ArrayType(unionizeRecord(fe, se), n))
          case _ => relaxed
        }
      case _ => relaxed
    }
  }

  /** Recursive RECORD merge (`SchemaManager.java:410-421`): first side's
    * subfields unionized in order (absent on the second side → NULLABLE),
    * second side's extras appended as NULLABLE.
    */
  private def unionizeRecord(fe: StructType, se: StructType): StructType = {
    val seByName = se.fields.map(f => f.name -> f).toMap
    val fromFirst = fe.fields.map { ff =>
      seByName.get(ff.name) match {
        case None => nullableUnlessRepeated(ff)
        case Some(sf) => unionizeFields(ff, sf)
      }
    }
    val feNames = fe.fieldNames.toSet
    val extras = se.fields.filterNot(f => feNames.contains(f.name))
      .map(nullableUnlessRepeated)
    StructType(fromFirst ++ extras)
  }

  /** BigQuery-granularity type equality (all ints one type, all floats
    * one type); records compare as records (contents merge recursively),
    * arrays by element class.
    */
  private def typesMatch(a: DataType, b: DataType): Boolean = (a, b) match {
    case (_: StructType, _: StructType) => true
    case (ArrayType(ae, _), ArrayType(be, _)) => typesMatch(ae, be)
    case (x, y) => bqClass(x) == bqClass(y)
  }

  private def bqClass(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "INTEGER"
    case FloatType | DoubleType => "FLOAT"
    case _: DecimalType => "FLOAT" // Kafka Decimal lands as FLOAT (KafkaLogicalConverters.java:66-81)
    case BinaryType => "BYTES"
    case other => other.typeName
  }

  /** REQUIRED → NULLABLE transition (`SchemaManager.java:500-503`). */
  private def isRelaxation(current: StructField, proposed: StructField): Boolean =
    !current.nullable && proposed.nullable

  /** U3 — validation gates (`SchemaManager.java:471-506`): new fields
    * need `allowNewFields` (REQUIRED new fields additionally need
    * relaxation), REQUIRED→NULLABLE needs `allowFieldRelaxation`.
    * Top-level only, exactly like the reference.
    */
  def validate(existing: StructType, proposed: StructType,
      policy: EvolutionPolicy): Unit = {
    val existingByName = existing.fields.map(f => f.name -> f).toMap
    proposed.fields.foreach { pf =>
      existingByName.get(pf.name) match {
        case None =>
          val ok = policy.allowNewFields &&
            (pf.nullable || isRepeated(pf) || !pf.nullable && policy.allowFieldRelaxation)
          if (!ok) throw new SchemaEvolutionException(
            s"New Field found with the name ${pf.name}. Ensure that allowNewFields is true " +
              s"and allowFieldRelaxation is true if ${pf.name} is REQUIRED in order to update the schema")
        case Some(ef) =>
          if (isRelaxation(ef, pf) && !policy.allowFieldRelaxation)
            throw new SchemaEvolutionException(
              s"${pf.name} has mode REQUIRED. Set allowFieldRelaxation to true " +
                s"to change the mode to NULLABLE")
      }
    }
  }

  /** U2 — `relaxFieldsWhereNecessary` (`SchemaManager.java:508-522`):
    * fields new relative to `existing` (and not REPEATED) forced NULLABLE.
    */
  def relaxWhereNecessary(existing: StructType, proposed: StructType): StructType = {
    val existingNames = existing.fieldNames.toSet
    StructType(proposed.fields.map { f =>
      if (!existingNames.contains(f.name) && !isRepeated(f)) f.copy(nullable = true)
      else f
    })
  }

  /** Reference `getUnionizedSchema` (`SchemaManager.java:379-388`):
    * pairwise-in-sequence union with validation after every step —
    * order-sensitive by design (SURVEY.md §7.4 risk 3).
    */
  def evolve(schemas: Seq[StructType], policy: EvolutionPolicy = EvolutionPolicy()): StructType = {
    require(schemas.nonEmpty, "evolve requires at least one schema")
    schemas.reduceLeft { (current, next) =>
      val proposed = unionize(current, next)
      validate(current, proposed, policy)
      proposed
    }
  }

  /** Row-level companion: evolve the schemas of all frames, validate, and
    * union rows by name with missing columns as NULL — what the
    * reference achieves by first evolving the table DDL and then
    * streaming rows into it.
    */
  def unionRows(dfs: Seq[DataFrame], policy: EvolutionPolicy = EvolutionPolicy()): DataFrame = {
    evolve(dfs.map(_.schema), policy) // throws if the sequence is invalid
    dfs.reduceLeft((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** U4 — table-description union (`SchemaManager.java:529-540`): latest
    * non-null doc wins.
    */
  def unionDescription(docs: Seq[Option[String]]): Option[String] =
    docs.foldLeft(Option.empty[String])((acc, d) => d.orElse(acc))
}
