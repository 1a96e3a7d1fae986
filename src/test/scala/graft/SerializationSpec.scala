package graft

import org.apache.spark.sql.Encoders

/** Custom-object serialization parity: Pangool let tuple fields carry
  * ProtoStuff/Thrift objects (reference: serialization package). The Spark
  * analog is a Kryo-encoded Dataset column — opaque to Catalyst but fully
  * shuffle/round-trip safe.
  */
// deliberately NOT a case class / Product — the "custom object" case
// (top-level so Kryo doesn't drag a suite $outer reference along)
class Payload(val id: Int, val tags: Map[String, Long]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case p: Payload => p.id == id && p.tags == tags
    case _ => false
  }
  override def hashCode(): Int = id
}

class SerializationSpec extends GraftSuite {

  test("kryo-encoded custom objects survive shuffle and round-trip") {
    implicit val enc = Encoders.kryo[Payload]
    val in = (1 to 100).map(i => new Payload(i, Map("k" -> i.toLong, "j" -> (i * 2).toLong)))
    val ds = spark.createDataset(in)
    // force a shuffle so serialization actually crosses an exchange
    val back = ds.repartition(4).collect().sortBy(_.id)
    assert(back.length == 100)
    assert(back.zip(in).forall { case (a, b) => a == b })
    // grouped processing over opaque objects (Pangool reducer with object fields)
    val maxPerBucket = ds.groupByKey(_.id % 3)(Encoders.scalaInt)
      .mapValues(p => p.tags("k"))(Encoders.scalaLong)
      .reduceGroups((a: Long, b: Long) => math.max(a, b))
      .collect().toMap
    assert(maxPerBucket == Map(0 -> 99L, 1 -> 100L, 2 -> 98L))
  }
}
