package graft

import org.apache.spark.sql.functions._

import graft.operators.Fuzzy

class FuzzySpec extends GraftSuite {

  test("in-bucket levenshtein DP == Spark's builtin on real name pairs") {
    import spark.implicits._
    // The verify step runs a JVM DP while the oracle runs DuckDB's builtin;
    // Spark's builtin is the bridge — pin the DP against it on every
    // same-brand pair of the sf0.001 part table (the exact pair set the
    // operator verifies), plus the classic textbook cases.
    val rows = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("k"), col("p_name").as("n"), col("p_brand").as("b"))
      .as[(Long, String, String)].collect()
    val samePairs = rows.groupBy(_._3).values.toSeq.flatMap { grp =>
      for { x <- grp.toSeq; y <- grp.toSeq } yield (x._2, y._2)
    }
    val builtin = samePairs.toDF("a", "b")
      .select(col("a"), col("b"), levenshtein(col("a"), col("b")).as("d"))
      .as[(String, String, Int)].collect()
    builtin.foreach { case (a, bn, d) =>
      assert(Fuzzy.levenshtein(a, bn) == d, s"'$a' vs '$bn'")
    }
    assert(builtin.nonEmpty)
    assert(Fuzzy.levenshtein("kitten", "sitting") == 3)
    assert(Fuzzy.levenshtein("", "abc") == 3)
    assert(Fuzzy.levenshtein("flaw", "lawn") == 2)
  }

  test("segment partition is even, contiguous and total") {
    for (len <- 0 to 20; k <- 1 to 4) {
      val bounds = (0 until k).map(i => Fuzzy.segBounds(len, k, i))
      assert(bounds.head._1 == 0 && bounds.last._2 == len)
      bounds.sliding(2).foreach {
        case Seq((_, e), (s, _)) => assert(e == s)
        case _                   =>
      }
      // even split: segment lengths differ by at most 1
      val lens = bounds.map { case (s, e) => e - s }
      assert(lens.max - lens.min <= 1)
    }
  }

  test("entityResolve reaches degenerate names: empty and near-empty strings resolve") {
    import spark.implicits._
    // "" (id 1) is within 2 edits of "ab" (id 2) and "a" (id 3); "zzzz"
    // (id 4) matches nothing. The l=0 probe window is what finds the
    // empty-name entity (review finding).
    val dir = java.nio.file.Files.createTempDirectory("fuzzy-empty").toString
    Seq((1L, "", "B#1"), (2L, "ab", "B#1"), (3L, "a", "B#1"), (4L, "zzzz", "B#1"))
      .toDF("p_partkey", "p_name", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Fuzzy.entityResolve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 1L, -1), (2L, 1L, 2), (3L, 1L, 1), (4L, 4L, -1)))
  }

  test("entityResolve == brute-force brand-blocked min-id match") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = parts.map { case (k, n, b) =>
      val smaller = parts.filter { case (k2, n2, b2) =>
        b2 == b && k2 < k && Fuzzy.levenshtein(n, n2) <= 2
      }
      if (smaller.isEmpty) (k, k, -1)
      else {
        val (ck, cn, _) = smaller.minBy(_._1)
        (k, ck, Fuzzy.levenshtein(n, cn))
      }
    }.toSet
    val got = Fuzzy.entityResolve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    // the fixture is non-trivial in both directions
    assert(expected.exists(_._3 >= 0) && expected.exists(_._3 == -1))
    assert(expected.exists(t => t._3 > 0), "want at least one non-exact match")
  }

  test("resolveOn == brute force on a non-part fixture (user handles blocked by country)") {
    import spark.implicits._
    // A planted frame with none of the part table's column names — the
    // generalized surface must not care. Int ids and a non-name block
    // column exercise the casts.
    val users = Seq(
      (10, "alice", "US"), (11, "alicia", "US"), (12, "alice", "US"),
      (13, "bob", "US"), (14, "alice", "CA"), (15, "alyce", "CA"),
      (16, "carol", "CA"), (17, "caroll", "CA"), (18, "", "CA"))
    val got = Fuzzy.resolveOn(users.toDF("uid", "handle", "country"),
      "uid", "handle", "country").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = users.map { case (k, n, b) =>
      val smaller = users.filter { case (k2, n2, b2) =>
        b2 == b && k2 < k && Fuzzy.levenshtein(n, n2) <= 2
      }
      if (smaller.isEmpty) (k.toLong, k.toLong, -1)
      else {
        val (ck, cn, _) = smaller.minBy(_._1)
        (k.toLong, ck.toLong, Fuzzy.levenshtein(n, cn))
      }
    }.toSet
    assert(got == expected)
    assert(expected.exists(t => t._3 > 0) && expected.exists(_._3 == -1))
  }

  test("candidate broadcast is GATED on the measured entity count (both plan shapes)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    def broadcastHints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: LJoin if j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined) => j
      }.size
    import spark.implicits._
    val df = Seq((1L, "alpha", "X"), (2L, "alphb", "X"), (3L, "beta", "Y"))
      .toDF("id0", "nm0", "b0")
    // Below the gate (default threshold): the record-level join carries the
    // broadcast hint — the entity-sized candidate table ships to every task.
    val open = Fuzzy.resolveOn(df, "id0", "nm0", "b0")
    assert(broadcastHints(open) == 1, open.queryExecution.optimizedPlan.toString)
    // Gate forced closed (threshold 0 — the high-entity-diversity corpus
    // where "entity-sized" is record-sized): NO hint anywhere; the join is
    // free to plan as a shuffle join and cannot OOM the driver.
    val closed = Fuzzy.resolveOn(df, "id0", "nm0", "b0", broadcastMaxEntities = 0L)
    assert(broadcastHints(closed) == 0, closed.queryExecution.optimizedPlan.toString)
    // Same verdicts on both sides of the gate.
    def norm(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getInt(2))
    assert(open.collect().map(norm).toSet == closed.collect().map(norm).toSet)
  }
}
