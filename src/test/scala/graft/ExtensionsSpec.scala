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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }
}
