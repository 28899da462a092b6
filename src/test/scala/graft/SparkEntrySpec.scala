package graft

/** Driver-contract invariants: what the harness assumes about SparkEntry. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; names are unique") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    assert(o.keySet.subsetOf(q.keySet),
      s"orphan oracles: ${o.keySet -- q.keySet}")
    assert(q.nonEmpty && o.nonEmpty)
    // ORDER BY discipline: every oracle ends with a deterministic sort
    o.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle lacks ORDER BY")
    }
  }

  test("oracle SQL references only harness table names") {
    val tables = Graft.tableNames.toSet
    val fromRe = """(?i)\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        // allow CTE names and inline subqueries: only flag unknown BARE names
        // that look like tables (heuristic: not defined as a CTE in the sql —
        // with or without a recursive-CTE column list `name(a, b) AS (`, or
        // DuckDB's `AS MATERIALIZED (` used where un-materialized inlining
        // would be exponential, x239)
        val isCte =
          s"""(?i)\\b$t\\s*(\\([^)]*\\))?\\s+as\\s*(materialized\\s*)?\\(""".r
            .findFirstIn(sql).isDefined
        assert(tables.contains(t) || isCte || t == "unnest" || t == "range" ||
            t == "generate_series",
          s"$name references unknown relation '$t'")
      }
    }
  }
}
