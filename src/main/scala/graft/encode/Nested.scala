package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Struct-column support for the codec: structs are FLATTENED to dotted
  * leaf columns at encode time and reassembled by a Catalyst projection
  * at decode time — the reference's dotted-path column addressing
  * (python-blosc2 ctable.py:13050-13071, schema.py:413). Each leaf gets
  * its own chunks, zone map, and codec plan, so a query touching
  * `meta.lang` reads one leaf column's bytes (v2 layout), exactly like
  * a top-level column.
  *
  * A NULLABLE struct additionally carries a boolean companion leaf
  * (`<path>.__null`) so struct-level nullness survives the roundtrip
  * (a null struct is not the same value as a struct of nulls).
  */
object Nested {

  private val NULL_MARK = "__null"

  def hasNested(schema: StructType): Boolean =
    schema.fields.exists(_.dataType.isInstanceOf[StructType])

  /** Leaf fields of `schema` in depth-first order, with dotted names. */
  def flatSchema(schema: StructType): StructType =
    StructType(schema.fields.flatMap(f => flatFields("", f, parentNullable = false)))

  private def flatFields(prefix: String, f: StructField, parentNullable: Boolean): Seq[StructField] =
    f.dataType match {
      case st: StructType =>
        val path = prefix + f.name
        val self =
          if (f.nullable) Seq(StructField(s"$path.$NULL_MARK", BooleanType, nullable = parentNullable))
          else Nil
        self ++ st.fields.flatMap(c => flatFields(s"$path.", c, parentNullable || f.nullable))
      case _ =>
        Seq(StructField(prefix + f.name, f.dataType, f.nullable || parentNullable))
    }

  /** Projection: nested df → flat df (leaf values; null-struct leaves
    * become NULL leaves, plus the __null companion).
    */
  def flatten(df: DataFrame): DataFrame =
    df.select(df.schema.fields.flatMap(f => flatCols("", col(quote(f.name)), f)): _*)

  private def quote(n: String): String = s"`${n.replace("`", "``")}`"

  private def flatCols(prefix: String, path: Column, f: StructField): Seq[Column] =
    f.dataType match {
      case st: StructType =>
        val p = prefix + f.name
        val self = if (f.nullable) Seq(path.isNull.as(s"$p.$NULL_MARK")) else Nil
        self ++ st.fields.flatMap(c => flatCols(s"$p.", path.getField(c.name), c))
      case _ => Seq(path.as(prefix + f.name))
    }

  /** Projection: flat df (decoded) → the original nested schema.
    * `extraCols` (e.g. the lineage shard column) pass through.
    */
  def reassemble(flatDf: DataFrame, schema: StructType, extraCols: Seq[String] = Nil): DataFrame =
    flatDf.select(
      schema.fields.map(f => rebuild("", f).as(f.name)) ++ extraCols.map(n => col(quote(n))): _*)

  private def rebuild(prefix: String, f: StructField): Column = f.dataType match {
    case st: StructType =>
      val p = prefix + f.name
      val s = struct(st.fields.map(c => rebuild(s"$p.", c).as(c.name)): _*)
      if (f.nullable)
        when(col(quote(s"$p.$NULL_MARK")), lit(null).cast(st)).otherwise(s)
      else s
    case _ => col(quote(prefix + f.name))
  }
}
