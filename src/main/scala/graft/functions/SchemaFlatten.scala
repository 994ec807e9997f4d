package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema flattening and dot-path field access.
  *
  * Re-expresses the reference's recursive JSON flattener
  * (reference: lib/discovery/FieldIdentifier.js:9-57) over Spark
  * `StructType` schemas: every leaf becomes a dot path; array elements
  * are addressed by index (`arr.0`); binary leaves are skipped
  * (reference: lib/discovery/FieldIdentifier.js:19-21,45-47); only
  * numeric leaves are tracked (reference:
  * lib/discovery/FieldIdentifier.js:32-34).
  */
object SchemaFlatten {

  final case class Leaf(path: String, dataType: DataType)

  /** All leaf paths of a schema. Arrays are descended only when the
    * element count is known per-row (runtime concern), so statically we
    * emit the array itself as a leaf of its element type tagged with a
    * wildcard-free path; index paths are resolved at extraction time.
    */
  def leaves(schema: StructType): Seq[Leaf] = {
    def walk(prefix: String, dt: DataType): Seq[Leaf] = dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap { f =>
          val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
          walk(p, f.dataType)
        }
      case BinaryType => Nil // Buffers skipped, FieldIdentifier.js:19-21
      case other      => Seq(Leaf(prefix, other))
    }
    walk("", schema)
  }

  /** Numeric leaves only (the reference tracks `typeof === "number"`,
    * i.e. IEEE doubles; Spark numeric types all qualify).
    */
  def numericLeaves(schema: StructType): Seq[Leaf] =
    leaves(schema).filter(_.dataType.isInstanceOf[NumericType])

  /** Dot-path extraction over a struct column, with the reference's
    * `[i]` -> `.i` rewrite and null on missing segments
    * (reference: lib/helper/getByPath.js:3-16). Numeric array indices in
    * the path address array elements.
    */
  def byPath(root: Column, rawPath: String): Column = {
    val path = rawPath.replace("[", ".").replace("]", "")
    path.split('.').filter(_.nonEmpty).foldLeft(root) { (c, seg) =>
      if (seg.forall(_.isDigit)) element_at(c, seg.toInt + 1) // 0-based -> 1-based
      else c.getField(seg)
    }
  }

  /** Dot path -> JSONPath string: `arr.0` becomes `$.arr[0]`. */
  def jsonPathOf(rawPath: String): String = {
    val segs = rawPath.replace("[", ".").replace("]", "").split('.').filter(_.nonEmpty)
    segs.map { seg =>
      if (seg.forall(_.isDigit)) s"[$seg]" else s".$seg"
    }.mkString("$", "", "")
  }

  /** Dot-path extraction over a raw JSON string column using
    * `get_json_object` (stays inside codegen; no UDF). `arr.0` becomes
    * the JSONPath `$.arr[0]`.
    */
  def jsonByPath(json: Column, rawPath: String): Column =
    get_json_object(json, jsonPathOf(rawPath))
}
