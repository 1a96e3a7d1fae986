package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions exposes the codegen kernels to pure SQL") {
    // extensions bind at session build time — clear the default session so
    // getOrCreate builds a fresh one (over the same SparkContext), then
    // restore for the other suites
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .head.getDouble(0)
      assert(dot == 32.0)
      val jac = spark.sql(
        "SELECT graft_sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
        .head.getDouble(0)
      assert(math.abs(jac - 0.5) < 1e-12)
      val sig = spark.sql("SELECT graft_minhash_sig(array(7L, 11L)) AS s")
        .head.getSeq[Long](0)
      assert(sig.length == graft.functions.TextHash.K)
      val sh = spark.sql("SELECT graft_simhash(array(1L)) AS h").head.getLong(0)
      assert(sh == 1L) // single hash: bits follow the hash itself
      // scalar-config kernels: literal args resolved at binding time
      val h60 = spark.sql("SELECT graft_hash60_array(array('a'), 0L) AS h")
        .head.getSeq[Long](0)
      // md5('a') = 0cc175b9c0f1b6a8... → first 15 hex chars as a long
      assert(h60 == Seq(java.lang.Long.parseLong("0cc175b9c0f1b6a", 16)))
      val sh3 = spark.sql(
        "SELECT graft_shingle_hash3(array('x', 'y', 'z', 'x', 'y', 'z'), 0L) AS s")
        .head.getSeq[Long](0)
      assert(sh3.length == 3, "4 shingle positions, 'x y z' repeated → 3 distinct")
      val rh = spark.sql("SELECT graft_rolling_hash('ab', 7L, 2147483647L) AS r")
        .head.getLong(0)
      assert(rh == ((7L * 31 + 'a') * 31 + 'b') % 2147483647L)
      val pg = spark.sql("SELECT graft_packed_grams4('abcd') AS g").head.getSeq[Long](0)
      assert(pg == Seq((('a'.toLong * 256 + 'b') * 256 + 'c') * 256 + 'd'))
      intercept[Exception] { // non-literal config must be rejected
        spark.sql("SELECT graft_rolling_hash('a', CAST(rand()*2 AS BIGINT), 7L)").collect()
      }
      // the aggregate kernel: exact int128 sum usable from pure SQL,
      // incl. a sum that overflows a single long
      val big = Long.MaxValue / 2 + 17
      val s = spark.sql(
        s"SELECT k, graft_sum_cents_exact(v) AS s FROM VALUES " +
          s"(1, ${big}L), (1, ${big}L), (1, -3L), (2, CAST(NULL AS BIGINT)) " +
          "AS t(k, v) GROUP BY k ORDER BY k").collect()
      assert(BigDecimal(s(0).getDecimal(1)) == BigDecimal(big) * 2 - 3)
      assert(s(1).isNullAt(1))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }
}
