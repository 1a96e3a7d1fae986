package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema helpers mirroring Pangool's tuple schema surface:
  * `Fields.parse("a:int, b:string")` (reference: io/Fields.java,
  * io/Schema.java), `Aliases` (tuplemr/Aliases.java) and `Mutator`
  * (io/Mutator.java) — expressed over StructType/DataFrame, where Catalyst
  * makes the projections free.
  */
object GSchema {

  private val typeNames: Map[String, DataType] = Map(
    "int" -> IntegerType, "integer" -> IntegerType,
    "long" -> LongType, "bigint" -> LongType,
    "float" -> FloatType, "double" -> DoubleType,
    "boolean" -> BooleanType, "bool" -> BooleanType,
    "string" -> StringType, "utf8" -> StringType,
    "bytes" -> BinaryType, "binary" -> BinaryType,
    // Pangool ENUM fields serialize as their name; OBJECT as opaque bytes
    "enum" -> StringType, "object" -> BinaryType,
    "date" -> DateType, "timestamp" -> TimestampType)

  /** Parse "name:type, name:type" (Pangool Fields.parse). A trailing `?`
    * marks the field nullable (Pangool nullable fields, Schema.java).
    */
  def parse(spec: String): StructType =
    StructType(spec.split(",").map(_.trim).filter(_.nonEmpty).map { f =>
      val Array(name, t) = f.split(":").map(_.trim)
      val nullable = t.endsWith("?")
      val tn = if (nullable) t.dropRight(1) else t
      StructField(name, typeNames.getOrElse(tn.toLowerCase,
        throw new IllegalArgumentException(s"unknown type '$tn' in '$f'")), nullable)
    })

  /** Aliases: rename columns via a map (Pangool Aliases). */
  def withAliases(df: DataFrame, aliases: Map[String, String]): DataFrame =
    aliases.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** Mutator.subSetOf: keep a subset of fields. */
  def subset(df: DataFrame, fields: String*): DataFrame = df.select(fields.map(col): _*)

  /** Mutator.superSetOf: add computed fields. */
  def superset(df: DataFrame, added: (String, Column)*): DataFrame =
    added.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
}
