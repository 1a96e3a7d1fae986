package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the two sf10-critical oracle-authoring rules
  * learned in round 12 (held only by one-time rewrites until now):
  *
  *  - every CTE must be `AS MATERIALIZED` — DuckDB inlines plain CTEs, and
  *    an unrolled-iteration chain where level k references two level-(k−1)
  *    CTEs re-evaluates EXPONENTIALLY (the BFS oracle spilled ~78 GB at
  *    sf10 before the fix; the minhash `hs` CTE was recomputed 16× by the
  *    band branches);
  *  - no `WITH RECURSIVE` pairwise closure — |component|² rows is
  *    CPU-hours at sf10; connected components use the unrolled
  *    label-propagation + pointer-jumping pattern (Oracles.ccLabelCtes).
  *
  * Runs over the EXACT SQL the driver hands DuckDB (SparkEntry.oracleSql
  * values, including anything assembled dynamically), not the source text.
  * Named `WINDOW w AS (...)` clauses are stripped first — they share the
  * `name AS (` shape but are not CTEs (MATERIALIZED there is a parse
  * error).
  */
class OracleHygieneSpec extends AnyFunSuite {

  private val windowClause = """(?i)\bWINDOW\s+\w+\s+AS\s*\(""".r
  private val cte =
    """(?is)(?:\bWITH\b|,)\s*(\w+)\s*(?:\([\w\s,]*\))?\s+AS\s+(MATERIALIZED\s*)?\(""".r

  test("the guard itself catches a planted plain CTE and spares WINDOW clauses") {
    val planted =
      "WITH x AS (SELECT 1), y AS MATERIALIZED (SELECT 2) SELECT * FROM x"
    val hits = cte.findAllMatchIn(planted).toSeq
    assert(hits.map(_.group(1)) == Seq("x", "y"))
    assert(hits.count(_.group(2) == null) == 1, "plain CTE x must be flagged")
    val windowed =
      "SELECT n, max(v) OVER w FROM t WINDOW w AS (PARTITION BY n ORDER BY v)"
    assert(cte.findAllMatchIn(windowClause.replaceAllIn(windowed, "WINDOWREF "))
      .isEmpty, "a named WINDOW clause is not a CTE")
  }

  test("every oracle CTE is MATERIALIZED and none is WITH RECURSIVE") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      cleaned = windowClause.replaceAllIn(sql, "WINDOWREF ")
      m <- cte.findAllMatchIn(cleaned)
      if m.group(2) == null
    } yield s"$name: plain CTE '${m.group(1)}'"
    assert(offenders.isEmpty,
      s"DuckDB inlines plain CTEs (exponential re-evaluation in unrolled " +
        s"chains at sf10) — write AS MATERIALIZED: ${offenders.mkString(", ")}")
    val recursive = SparkEntry.oracleSql.collect {
      case (name, sql) if """(?i)WITH\s+RECURSIVE""".r.findFirstIn(sql).isDefined => name
    }
    assert(recursive.isEmpty,
      s"recursive pairwise closures are |component|² at sf10 — use the " +
        s"Oracles.ccLabelCtes label-propagation pattern: $recursive")
  }
}
