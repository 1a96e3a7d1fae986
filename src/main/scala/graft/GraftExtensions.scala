package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, MinHashSig, SimHash64, SortedJaccard}

/** SparkSessionExtensions hook exposing the graft codegen kernels as SQL
  * functions — `spark.sql("SELECT graft_dot(a, b) ...")` — so pure-SQL users
  * (and spark.sql.extensions config) get them without the Scala API.
  *
  * Register via:
  *   SparkSession.builder().withExtensions(new GraftExtensions) — or
  *   --conf spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(arr1, arr2) - dot product of two double arrays"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(hashes) - K-permutation MinHash signature"),
      (children: Seq[Expression]) => MinHashSig(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(hashes) - 60-bit SimHash of a hash array"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_sorted_jaccard"),
      info("graft_sorted_jaccard", "graft_sorted_jaccard(a, b) - jaccard of sorted distinct long arrays"),
      (children: Seq[Expression]) => SortedJaccard(children(0), children(1))))
  }
}
