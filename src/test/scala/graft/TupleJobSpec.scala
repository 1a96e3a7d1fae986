package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{RollupHandler, TupleJob}

class TupleJobSpec extends GraftSuite {

  test("grouped reduce with secondary sort reproduces the window-based first-event query") {
    import spark.implicits._
    val events = io.Tables.events(spark, sf)
    val outSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("first_value", DoubleType)))
    val viaTupleJob = TupleJob.groupBy(events, "user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
      .reduce(outSchema) { (key, rows) =>
        val first = rows.next()
        while (rows.hasNext) rows.next() // consume (contract) — streaming scan
        Iterator(Row(key.get(0), key.get(1), first.getAs[Double]("value")))
      }
      .as[(Long, String, Double)].collect().toSet
    val viaWindow = operators.Relational.secondarySort(spark, sf)
      .select(col("user_id"), col("event_type"), col("first_value"))
      .as[(Long, String, Double)].collect()
      .map { case (u, e, v) => (u, e, math.rint(v * 1e6) / 1e6) }.toSet
    val tj = viaTupleJob.map { case (u, e, v) => (u, e, math.rint(v * 1e6) / 1e6) }
    assert(tj == viaWindow)
  }

  test("custom comparator ports as a derived sort key (case-insensitive secondary sort)") {
    // A Pangool job with OrderBy.setCustomComparator(compareToIgnoreCase)
    // ports to orderBy(lower(col)): same group stream order, no comparator
    // class. Tie-break on the raw value keeps the order total.
    val df = spark.createDataFrame(Seq(
      (1, "banana"), (1, "Apple"), (1, "cherry"), (1, "APRICOT"),
      (2, "b"), (2, "A")
    )).toDF("k", "name")
    val outSchema = StructType(Seq(
      StructField("k", IntegerType), StructField("names", StringType)))
    val out = TupleJob.groupBy(df, "k")
      .orderBy(lower(col("name")), col("name"))
      .reduce(outSchema) { (key, rows) =>
        Iterator(Row(key.getInt(0), rows.map(_.getAs[String]("name")).mkString(",")))
      }
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "Apple,APRICOT,banana,cherry", 2 -> "A,b"))
  }

  test("rollup handler fires open/close per depth like TupleRollupReducer") {
    val df = spark.createDataFrame(Seq(
      ("r1", "n1", 1), ("r1", "n1", 2), ("r1", "n2", 3), ("r2", "n3", 4)
    )).toDF("r", "n", "v")
    val outSchema = StructType(Seq(
      StructField("depth", IntegerType), StructField("evt", StringType),
      StructField("key", StringType)))
    val out = TupleJob.groupBy(df.coalesce(1), "r", "n")
      .orderBy(col("v"))
      .rollup(outSchema, 0)(new RollupHandler {
        override def onOpenGroup(d: Int, first: Row) =
          Iterator(Row(d, "open", s"${first.getAs[String]("r")}/${first.getAs[String]("n")}"))
        override def onCloseGroup(d: Int, last: Row) =
          Iterator(Row(d, "close", s"${last.getAs[String]("r")}/${last.getAs[String]("n")}"))
      })
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    // r1 opens once at depth 0, n-groups open at depth 1 twice; r2 once each
    assert(out.count(e => e._1 == 0 && e._2 == "open") == 2)
    assert(out.count(e => e._1 == 1 && e._2 == "open") == 3)
    assert(out.count(e => e._1 == 1 && e._2 == "close") == 3)
    assert(out.count(e => e._1 == 0 && e._2 == "close") == 2)
  }

  test("coGroup joins heterogeneous schemas on a common key") {
    import spark.implicits._
    val orders = io.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val lines = io.Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val outSchema = StructType(Seq(
      StructField("orderkey", StringType), StructField("n_orders", IntegerType),
      StructField("n_lines", IntegerType)))
    val out = TupleJob.coGroup(orders, lines, Seq("o_orderkey"), outSchema) { (k, l, r) =>
      Iterator(Row(k.getString(0), l.size, r.size))
    }
    val bad = out.where(col("n_orders") =!= 1).count()
    assert(bad == 0) // every orderkey has exactly one order
    assert(out.count() > 0)
  }

  test("coGroupMulti streams 3 heterogeneous schemas in schemaOrder on one shuffle") {
    val cust = io.Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long").as("k"), col("c_name"))
    val orders = io.Tables.orders(spark, sf)
      .select(col("o_custkey").cast("long").as("k"), col("o_orderkey"), col("o_totalprice"))
    val events = io.Tables.events(spark, sf)
      .select(col("user_id").cast("long").as("k"), col("event_id"), col("ts"))
    val outSchema = StructType(Seq(
      StructField("k", LongType), StructField("stream_ok", BooleanType),
      StructField("n0", IntegerType), StructField("n1", IntegerType),
      StructField("n2", IntegerType)))
    // schemaOrder 2,0,1: events first, then customers, then orders; orders
    // additionally sorted by totalprice desc, events by event_id asc
    val out = TupleJob.coGroupMulti(
      Seq(TupleJob.CoInput(cust),
        TupleJob.CoInput(orders, Seq(("o_totalprice", false))),
        TupleJob.CoInput(events, Seq(("event_id", true)))),
      Seq("k"), outSchema, schemaOrder = Seq(2, 0, 1)) { (key, tuples) =>
      val seen = tuples.map { case (i, r) =>
        val v = i match {
          case 0 => r.getAs[String]("c_name").length.toLong // schema-specific access
          case 1 => -math.round(r.getAs[Double]("o_totalprice") * 100)
          case 2 => r.getAs[Long]("event_id")
        }
        (i, v)
      }.toVector
      val rankOf = Map(2 -> 0, 0 -> 1, 1 -> 2)
      val ranks = seen.map(t => rankOf(t._1))
      val streamOk = ranks.zip(ranks.drop(1)).forall { case (a, b) => a <= b } &&
        Seq(1, 2).forall { i =>
          val vs = seen.filter(_._1 == i).map(_._2)
          vs.zip(vs.drop(1)).forall { case (a, b) => a <= b }
        }
      Iterator(Row(key.getLong(0),
        streamOk, seen.count(_._1 == 0), seen.count(_._1 == 1), seen.count(_._1 == 2)))
    }
    // ONE shuffle total: tagged union → single repartition → sort → reduce
    val planStr = out.queryExecution.executedPlan.toString
    val exchanges = planStr.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected a single shuffle, got $exchanges\n$planStr")
    val rows = out.collect()
    assert(rows.forall(_.getBoolean(1)), "stream order violated in some group")
    assert(rows.exists(r => r.getInt(2) > 0 && r.getInt(3) > 0 && r.getInt(4) > 0))
  }

  test("coGroupSorted delivers per-side sorted iterators (specificOrderBy)") {
    val orders = io.Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice")
    val events = io.Tables.events(spark, sf)
      .select(col("user_id").as("o_custkey"), col("event_id"), col("ts"))
    val outSchema = StructType(Seq(
      StructField("key", StringType), StructField("orders_sorted", BooleanType),
      StructField("events_sorted", BooleanType)))
    def isSorted(xs: Seq[Long]): Boolean =
      xs.zip(xs.drop(1)).forall { case (a, b) => a <= b }
    val out = TupleJob.coGroupSorted(orders, events, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")),
      Seq(col("ts"), col("event_id")), outSchema) { (k, l, r) =>
      val lp = l.map(row => -math.round(row.getAs[Double]("o_totalprice") * 100)).toSeq
      val rp = r.map(_.getAs[java.sql.Timestamp]("ts").getTime).toSeq
      Iterator(Row(k.getString(0), isSorted(lp), isSorted(rp)))
    }
    assert(out.where(!col("orders_sorted") || !col("events_sorted")).count() == 0)
    assert(out.count() > 0)
  }
}
