package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Output-type hygiene guard (the round-8 lesson): a DecimalType column in
  * a registered query's OUTPUT renders engine-dependently when a value has
  * trailing-zero cents ("123.40" vs "123.4"), so the driver's stringified
  * hash diverges even when every value is bit-identical. Exact decimal
  * arithmetic is correct INSIDE a plan ([[graft.operators.ExactMoney]]);
  * the final projection must come back to a shortest-repr-stable type
  * (double/long/string). This spec turns that rule into a build failure —
  * the schema check is plan-only, no query executes.
  */
class OutputTypeGuardSpec extends GraftSuite {

  private def decimalPaths(name: String, dt: DataType): Seq[String] = dt match {
    case _: DecimalType => Seq(name)
    case s: StructType  => s.fields.toSeq.flatMap(f => decimalPaths(s"$name.${f.name}", f.dataType))
    case a: ArrayType   => decimalPaths(s"$name[]", a.elementType)
    case m: MapType =>
      decimalPaths(s"$name.key", m.keyType) ++ decimalPaths(s"$name.value", m.valueType)
    case _ => Nil
  }

  test("no registered query emits a DecimalType column") {
    val offenders = for {
      (name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)
      field <- q(spark, sf).schema.fields.toSeq
      path <- decimalPaths(field.name, field.dataType)
    } yield s"$name.$path"
    assert(offenders.isEmpty,
      "decimal output columns (exact decimal inside, double out — cast the " +
        s"final projection, see ExactMoney): ${offenders.mkString(", ")}")
  }
}
