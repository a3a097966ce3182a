package graft.convert

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** P4 — field/table-name sanitization, mirroring the reference's
  * `kcbq-connector/.../utils/FieldNameSanitizer.java:29-54`: every
  * character outside `[a-zA-Z0-9_]` becomes `_`, and a leading
  * non-letter/underscore gets a `_` prefix. Applied recursively to nested
  * struct/array/map schemas.
  *
  * Unlike the reference's row-at-a-time `replaceInvalidKeys` (a HashMap
  * rewrite per record), this is a pure schema transform: the data itself
  * never moves, we only `cast` each top-level column to its renamed
  * struct type — zero per-row cost at any scale.
  */
object FieldSanitizer {

  def sanitizeName(name: String): String = {
    val s = name.replaceAll("[^a-zA-Z0-9_]", "_")
    if (s.matches("^[^a-zA-Z_].*")) "_" + s else s
  }

  /** Recursively sanitize every field name in a schema. Throws if two
    * sibling names collide after sanitization (the reference hits a
    * duplicate-key error on the warehouse side for e.g. `a.b` vs `a/b`).
    */
  def sanitizeSchema(schema: StructType): StructType = {
    val renamed = schema.fields.map { f =>
      f.copy(name = sanitizeName(f.name), dataType = sanitizeType(f.dataType))
    }
    val dups = renamed.groupBy(_.name).collect { case (n, fs) if fs.length > 1 => n }
    require(dups.isEmpty,
      s"field names collide after sanitization: ${dups.mkString(", ")}")
    StructType(renamed)
  }

  private def sanitizeType(dt: DataType): DataType = dt match {
    case s: StructType => sanitizeSchema(s)
    case ArrayType(et, n) => ArrayType(sanitizeType(et), n)
    case MapType(kt, vt, n) => MapType(sanitizeType(kt), sanitizeType(vt), n)
    case other => other
  }

  /** Rename all (possibly nested) fields of `df` to their sanitized
    * names. Struct-to-struct `cast` renames by position without touching
    * data, so pushdown/codegen are unaffected.
    */
  def sanitize(df: DataFrame): DataFrame = {
    val out = sanitizeSchema(df.schema)
    df.select(df.schema.fields.zip(out.fields).map { case (in, o) =>
      val c = col(s"`${in.name}`")
      (if (o.dataType == in.dataType) c else c.cast(o.dataType)).as(o.name)
    }.toSeq: _*)
  }
}
