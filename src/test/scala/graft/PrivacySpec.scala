package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

class PrivacySpec extends GraftSuite {

  test("kAnonymize: every released group covers >= k records; rows partition exactly") {
    val k = 5
    val out = Privacy.kAnonymize(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    val in = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    // exactly-once release of every record
    assert(out.map(_._1).sorted.sameElements(in))
    // the k-anonymity property itself: released (non-suppressed) QI
    // combinations cover >= k records each
    out.filter(_._6 < 2).groupBy(t => (t._2, t._3, t._4, t._5)).foreach {
      case (g, rows) => assert(rows.length >= k, s"group $g has ${rows.length} < $k")
    }
    // suppressed rows mask every QI
    out.filter(_._6 == 2).foreach { t =>
      assert(t._2 == -1 && t._3 == "*" && t._4 == -1L && t._5 == -1L)
    }
    // k=1 degenerates to full release at the finest band
    val all0 = Privacy.kAnonymize(spark, sf, k = 1).collect()
    assert(all0.forall(_.getInt(5) == 0))
  }

  test("kAnonymize ladder on a planted corpus: all three levels, exact bounds, negative bands") {
    import spark.implicits._
    val rows =
      (1L to 6L).map(i => (i, 0, "AUTOMOBILE", 1100.0 + i)) ++ // level 0
      Seq(7L -> 2100.0, 8L -> 3100.0, 9L -> 4100.0, 10L -> 2600.0,
        11L -> 3600.0).map { case (i, b) => (i, 0, "AUTOMOBILE", b) } ++ // level 1
      Seq((12L, 0, "AUTOMOBILE", 9100.0), (13L, 0, "AUTOMOBILE", 9900.0)) ++ // level 2
      (14L to 18L).map(i => (i, 0, "AUTOMOBILE", -400.0 - i)) // level 0, negative band
    val dir = java.nio.file.Files.createTempDirectory("kanon").toString
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .select(col("c_custkey"), col("c_custkey").cast("string").as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = Privacy.kAnonymize(spark, dir, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSet
    val expected =
      (1L to 6L).map(i => (i, 0, "AUTOMOBILE", 100000L, 200000L, 0)).toSet ++
      (7L to 11L).map(i => (i, 0, "AUTOMOBILE", 0L, 500000L, 1)).toSet ++
      Set((12L, -1, "*", -1L, -1L, 2), (13L, -1, "*", -1L, -1L, 2)) ++
      (14L to 18L).map(i => (i, 0, "AUTOMOBILE", -100000L, 0L, 0)).toSet
    assert(got == expected)
  }

  test("lDiversity: per-group counts equal a plain-Scala reference over the release") {
    val released = Privacy.kAnonymize(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getInt(5))))
    val sens = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey")).agg(min(col("o_orderpriority")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = released
      .map { case (ck, g) => (g, sens.getOrElse(ck, "NONE")) }
      .groupBy(_._1)
      .map { case (g, rows) =>
        g -> (rows.length.toLong, rows.map(_._2).distinct.length.toLong)
      }
    val got = Privacy.lDiversity(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)), (r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (g, (n, d, ok)) =>
      assert((n, d) == expected(g), s"group $g")
      assert(ok == (d >= 3), s"verdict for $g")
    }
  }

  test("tCloseness equals a plain-Scala exact-integer EMD over the release") {
    val released = Privacy.kAnonymize(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getInt(5))))
    val sens = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey")).agg(min(col("o_orderpriority")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rs = released.map { case (ck, g) => (g, sens.getOrElse(ck, "NONE")) }
    val domain = rs.map(_._2).distinct.sorted // lexical — the operator's order
    val m = domain.length
    val n = rs.length.toLong
    val gcnt = rs.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val expected = rs.groupBy(_._1).map { case (g, rows) =>
      val ng = rows.length.toLong
      val cnt = rows.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
      var cum = 0L; var num = 0L
      domain.foreach { s =>
        cum += cnt.getOrElse(s, 0L) * n - gcnt(s) * ng
        num += math.abs(cum)
      }
      g -> (ng, num, ng * n * (m - 1))
    }
    val got = Privacy.tCloseness(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)), (r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (g, (ng, num, den, close)) =>
      assert((ng, num, den) == expected(g), s"group $g")
      assert(close == (num * 5 <= den), s"verdict for $g")
      assert(num >= 0 && num <= den, s"EMD must sit in [0,1] for $g")
    }
  }

  test("tClosenessOn flags a planted skewed group that l-diversity waves through") {
    import spark.implicits._
    // group A is urgent-heavy but DIVERSE (3 distinct values — l-diversity
    // at l = 3 waves it through); larger group B sits closer to the global
    // mix. Unequal sizes matter: with equal-size groups the two deviations
    // mirror each other (mass balance) and the EMDs degenerate to equal.
    val release = Seq.fill(4)(("A", "u")) ++ Seq(("A", "h"), ("A", "l")) ++
      Seq.fill(4)(("B", "u")) ++ Seq.fill(4)(("B", "h")) ++ Seq.fill(4)(("B", "l"))
    val df = release.toDF("qi", "sens")
    // global: u=8 h=5 l=5, N=18, m=3, domain sorted (h,l,u)
    // A (ng=6, h1 l1 u4): diffs h:1·18−5·6=−12, l:−12, u:4·18−8·6=24
    //   → cums −12,−24,0 → emd_num=36, emd_den=6·18·2=216 → EMD = 1/6
    // B (ng=12, h4 l4 u4): diffs h:12, l:12, u:−24 → cums 12,24,0
    //   → emd_num=36, emd_den=12·18·2=432 → EMD = 1/12
    // At t = 1/8: A fails (36·8=288 > 216), B passes (288 ≤ 432) — the
    // distribution-skew attack l-diversity cannot see, caught exactly.
    val got = Privacy.tClosenessOn(df, Seq("qi"), "sens", 1, 8).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    assert(got("A") == (6L, 36L, 216L, false), got("A").toString)
    assert(got("B") == (12L, 36L, 432L, true), got("B").toString)
    // A IS l-diverse — the attack t-closeness exists for
    val ldiv = Privacy.lDiversityOn(df, Seq("qi"), "sens", l = 3).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(ldiv == Map("A" -> true, "B" -> true))
  }

  test("lDiversityOn flags a planted homogeneous group (k-anonymous but not diverse)") {
    import spark.implicits._
    // two groups, both k-anonymous at k=3; group A's sensitive values are
    // all equal — the homogeneity attack k-anonymity cannot see
    val release = Seq(
      ("A", "urgent"), ("A", "urgent"), ("A", "urgent"),
      ("B", "urgent"), ("B", "high"), ("B", "low"))
      .toDF("qi", "sens")
    val got = Privacy.lDiversityOn(release, Seq("qi"), "sens", l = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got == Map("A" -> (3L, 1L, false), "B" -> (3L, 3L, true)))
  }
}
