package graft.convert

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** §2.10 — the pluggable extension surface, mirroring the reference's
  * strategy interfaces and their reflective config-driven loading
  * (`kcbq-api/.../SchemaRetriever.java:31-52`,
  * `convert/SchemaConverter.java`, `convert/RecordConverter.java`,
  * `BigQuerySinkConfig.java:914-982`).
  */

/** Key-vs-value schema lookup discriminator — the analog of
  * `kcbq-api/.../api/KafkaSchemaRecordType.java` (an enum rendering as
  * "key"/"value", used by retriever implementations and cache keys).
  */
sealed abstract class KafkaSchemaRecordType(val render: String) {
  override def toString: String = render
}
object KafkaSchemaRecordType {
  case object Value extends KafkaSchemaRecordType("value")
  case object Key extends KafkaSchemaRecordType("key")
}

/** Pluggable schema lookup per batch — the analog of `SchemaRetriever`
  * (`kcbq-api/.../api/SchemaRetriever.java:31-52`): a `configure`
  * hook receiving the connector properties, and SEPARATE key- and
  * value-schema lookups (the reference distinguishes them because key
  * and value may come from different registry subjects). Spark's unit
  * of retrieval is the batch, whose kafka wire shape carries `key` and
  * `value` struct columns. Default: identity from the batch itself
  * (`retrieve/IdentitySchemaRetriever.java:31-46`).
  */
trait SchemaRetriever {
  /** `SinkConnector.start(Map)` properties hook; default no-op. */
  def configure(properties: Map[String, String]): Unit = ()

  /** Most current schema of `which` side for the batch. */
  def retrieveSchema(batch: DataFrame,
      which: KafkaSchemaRecordType): StructType

  def retrieveKeySchema(batch: DataFrame): StructType =
    retrieveSchema(batch, KafkaSchemaRecordType.Key)
  def retrieveValueSchema(batch: DataFrame): StructType =
    retrieveSchema(batch, KafkaSchemaRecordType.Value)

  /** Flat whole-batch schema (the engine's single-schema entry, used
    * where the batch is already a flattened destination shape).
    */
  def retrieveSchema(batch: DataFrame): StructType = batch.schema
}

/** Default retriever: schemas come from the batch itself — the `key`/
  * `value` struct column when the batch is in the kafka wire shape,
  * the whole row schema otherwise.
  */
object IdentitySchemaRetriever extends SchemaRetriever {
  override def retrieveSchema(batch: DataFrame,
      which: KafkaSchemaRecordType): StructType =
    batch.schema.fields.find(_.name == which.render).map(_.dataType) match {
      case Some(s: StructType) => s
      case _ => batch.schema
    }
}

/** Pluggable schema transform — `SchemaConverter<S>`. */
trait SchemaTransform {
  def convert(schema: StructType): StructType
}

/** Pluggable record (batch) transform — `RecordConverter<R>`; Spark's
  * unit of conversion is the batch projection, not the row.
  */
trait RecordTransform {
  def convert(batch: DataFrame): DataFrame
}

/** Default transforms: the engine's own conversion layer. */
final class DefaultSchemaTransform(opts: ConvertOptions = ConvertOptions())
    extends SchemaTransform {
  override def convert(schema: StructType): StructType =
    RecordConverter.convertedSchema(schema, opts)
}

final class DefaultRecordTransform(opts: ConvertOptions = ConvertOptions())
    extends RecordTransform {
  override def convert(batch: DataFrame): DataFrame =
    RecordConverter.convert(batch, opts)
}

/** Reflective loading by class name — the analog of the reference's
  * `getClass(...).newInstance()` config instantiation
  * (`BigQuerySinkConfig.java:936-982`). Classes must have a no-arg
  * constructor or be Scala objects.
  */
object ExtensionLoader {
  def load[T](className: String): T = {
    val cls = Class.forName(className)
    val instance =
      try cls.getField("MODULE$").get(null) // Scala object
      catch { case _: NoSuchFieldException =>
        cls.getDeclaredConstructor().newInstance() }
    instance.asInstanceOf[T]
  }
}
