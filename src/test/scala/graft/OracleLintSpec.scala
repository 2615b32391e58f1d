package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every registered DuckDB oracle — the SQL-side
  * twin of PlanLint's Spark-plan rules. Encodes scale traps that only
  * bite at sf0.1+ where the sf0.01 gate looks green. */
class OracleLintSpec extends AnyFunSuite {

  test("no scalar subquery inside a JOIN condition (blocks DuckDB's " +
    "hash-join planning -> nested-loop at corpus scale)") {
    // r12 lesson: q187's `JOIN gl ON gl.grn = greatest(1, (p.pct_bp *
    // (SELECT n FROM nn)) // 10000)` planned as a 600k x 600k nested
    // loop — unfinishable at sf0.1, invisible at sf0.01. Computed join
    // keys belong in a projection CTE.
    val allow = Map(
      // q139 probes a 4-row generate_series frame against the rank
      // CTE: a 4-probe nested loop is the PLAN, not a trap
      "q139_rfm" -> 3)
    val pat = """(?i)\bON\b[^\n]*\(\s*SELECT""".r
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val hits = sql.split('\n').count(l => pat.findFirstIn(l).isDefined)
        val allowed = allow.getOrElse(name, 0)
        if (hits > allowed)
          Some(s"$name: $hits JOIN-clause scalar subqueries " +
            s"(allowlisted: $allowed)")
        else None
    }
    assert(bad.isEmpty, "scalar subqueries inside JOIN conditions:\n" +
      bad.mkString("\n") +
      "\nHoist the computed key into a projection CTE (the q187 fix)" +
      " or allowlist with a bounded-probe-side justification.")
    // the allowlist itself must stay accurate (drop entries when the
    // oracle changes, or the lint silently rots)
    allow.foreach { case (name, n) =>
      val sql = SparkEntry.oracleSql.getOrElse(name,
        fail(s"allowlisted oracle $name no longer registered"))
      assert(sql.split('\n').count(l =>
        pat.findFirstIn(l).isDefined) == n,
        s"$name allowlist count stale")
    }
  }

  test("DuckDB sum(BIGINT) is HUGEINT: every sum() in an oracle's " +
    "FINAL select sits inside a CAST") {
    // the r1 lesson, structurally: a bare summed column in the output
    // row types as HUGEINT and hash-mismatches the Spark BIGINT.
    // Paren-aware scan (CAST can wrap across lines): count sum( calls
    // with no enclosing cast( frame in the final SELECT.
    def uncastSums(sqlTail: String): Int = {
      val s = sqlTail.toLowerCase
      val stack = scala.collection.mutable.Stack.empty[Boolean]
      var i = 0
      var bad = 0
      def wordAt(w: String): Boolean =
        s.startsWith(w, i) &&
          (i == 0 || !s.charAt(i - 1).isLetterOrDigit &&
            s.charAt(i - 1) != '_') && {
          val rest = s.substring(i + w.length)
          rest.dropWhile(_.isWhitespace).startsWith("(")
        }
      while (i < s.length) {
        if (wordAt("cast")) {
          val j = s.indexOf('(', i)
          stack.push(true); i = j + 1
        } else if (wordAt("sum")) {
          if (!stack.exists(identity)) bad += 1
          i += 3
        } else {
          val c = s.charAt(i)
          if (c == '(') stack.push(false)
          else if (c == ')') { if (stack.nonEmpty) stack.pop() }
          i += 1
        }
      }
      bad
    }
    // DOUBLE sums don't widen (sum(DOUBLE) is DOUBLE) — allowlist the
    // oracles whose final-row sums are over float columns
    val floatSums = Map(
      "q01_key_join_sum" -> 1) // sum(l_quantity), a parquet DOUBLE
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val lastSelect = sql.lastIndexOf("SELECT")
        val tail = sql.substring(math.max(0, lastSelect))
        // the output row is SELECT..FROM; HAVING/WHERE sums never
        // reach the emitted schema
        val fromIdx = tail.toLowerCase.indexOf("\nfrom")
        val selectList = if (fromIdx > 0) tail.substring(0, fromIdx)
          else tail
        val n = uncastSums(selectList) - floatSums.getOrElse(name, 0)
        if (n > 0) Some(s"$name: $n uncast sum() in the final SELECT")
        else None
    }
    assert(offenders.isEmpty,
      "uncast HUGEINT sums in final SELECTs:\n" + offenders.mkString("\n"))
    floatSums.keys.foreach(k => assert(
      SparkEntry.oracleSql.contains(k), s"stale float-sum allowlist: $k"))
  }

  test("suffix-array oracles keep their working set bounded: every " +
    "doc-slice CTE carries a modulus slice, and the probe oracle " +
    "restricts to batch endpoints") {
    // The SA oracles brute-sort ALL suffixes of their doc slice
    // (O(n log n) comparisons of token lists) — tractable at sf0.1
    // ONLY because the slice is a fixed fraction of the corpus. A
    // widened slice (dropping `doc_id % k`) would pass sf0.01 and
    // melt at sf0.1 — the q187/q199-class trap this lint exists for.
    val saOracles = SparkEntry.oracleSql.keys
      .filter(n => n.startsWith("q268") || n.startsWith("q269") ||
        n.startsWith("q271") || n.startsWith("q272") ||
        n.startsWith("q273") || n.startsWith("q274")).toSeq.sorted
    assert(saOracles.size == 6, s"SA family drifted: $saOracles")
    saOracles.foreach { name =>
      val sql = SparkEntry.oracleSql(name)
      // every CTE that scans `documents` must slice by doc_id modulus
      val docScans = sql.split('\n').filter(_.contains("FROM documents"))
      assert(docScans.nonEmpty, s"$name: no documents scan found")
      // the slice predicate may sit on the scan line or the next
      // (WHERE on its own line); check the scan's local window
      val lines = sql.split('\n')
      lines.zipWithIndex.filter(_._1.contains("FROM documents"))
        .foreach { case (_, i) =>
          val window = lines.slice(i, math.min(lines.length, i + 2))
            .mkString(" ")
          assert(window.matches(""".*doc_id\s*%\s*\d+.*""") ||
            // q272's final join re-reads documents for `lang` only,
            // keyed by the already-sliced survivor docs — bounded by
            // the join, not a suffix-sort input
            window.contains("JOIN documents"),
            s"$name: unsliced documents scan near line $i")
        }
      // the suffix-sort itself must stay adjacency-shaped: one
      // rn = rn + 1 self-join, never a cross/inequality pair blowup
      assert(sql.contains("ON y.rn = x.rn + 1"),
        s"$name: adjacency join shape changed")
    }
    // the probe oracle must restrict its output to batch endpoints —
    // without it the query silently reports corpus-corpus pairs and
    // the restricted-parity contract (SuffixDedupSpec) means nothing
    val probe = SparkEntry.oracleSql("q273_sa_probe")
    assert(probe.contains("doc_a % 4 = 2 OR doc_b % 4 = 2"),
      "q273 oracle lost its batch-endpoint restriction")
    // and its affected-docs derivation joins grams per doc slice, with
    // the IN-subquery in a WHERE (semi join), not a JOIN condition
    assert(probe.contains("IN (SELECT gram FROM bg)"))
  }
}
