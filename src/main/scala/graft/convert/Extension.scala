package graft.convert

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** §2.10 — the pluggable extension surface, mirroring the reference's
  * strategy interfaces and their reflective config-driven loading
  * (`kcbq-api/.../SchemaRetriever.java:31-52`,
  * `convert/SchemaConverter.java`, `convert/RecordConverter.java`,
  * `BigQuerySinkConfig.java:914-982`).
  */

/** Pluggable schema lookup per batch — the analog of `SchemaRetriever`
  * (default: identity from the batch itself,
  * `retrieve/IdentitySchemaRetriever.java:31-46`).
  */
trait SchemaRetriever {
  def retrieveSchema(batch: DataFrame): StructType
}

/** Default retriever: the schema each batch carries. */
object IdentitySchemaRetriever extends SchemaRetriever {
  override def retrieveSchema(batch: DataFrame): StructType = batch.schema
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
