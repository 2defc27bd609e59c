package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Structural lint over every oracle SQL string in [[SparkEntry.oracleSql]]:
 * rejects the one oracle shape that has actually wedged the sf1 gate — an
 * UNROLLED ROUND PYRAMID of plain (unhinted) CTEs over a 10×-able relation.
 *
 * DuckDB inlines a plain CTE into EVERY consumer. For flat reuse that is
 * harmless (a cheap aggregate evaluated twice), and the sf1 gate passes
 * dozens of such oracles within budget. The failure class is
 * MULTIPLICATIVE inlining: an unrolled fixed-point replay whose round i
 * references round i-1 twice makes round 0's subtree evaluate 2^rounds
 * times — the q_graph_louvain sf1 incident, where an inlined 12M-row edge
 * CTE exploded one oracle's plan past the box's disk until `AS
 * MATERIALIZED` hints made it replay in seconds (see tools/README.md).
 *
 * The lint computes, per CTE, its POST-INLINING EVALUATION COUNT: a
 * MATERIALIZED CTE evaluates once; a plain CTE evaluates once per
 * reference, weighted by the evaluation count of whichever CTE body (or
 * the main query, weight 1) contains the reference. Any plain CTE that
 * transitively scans a scale table and would evaluate >= 512 times is a
 * violation. 512 is calibrated: the current catalog's worst passing
 * shape is 320 (q_graph_cascade's shared label-prop prefix — measured
 * fine at sf1), while an unhinted doubling pyramid crosses 512 by round
 * 9 of what is typically a 15-25 round unroll.
 */
class OracleLintSpec extends AnyFunSuite {

  /** Tables that grow with scale factor (region/nation are fixed-size). */
  private val ScaleTables = Set("customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  private val MaxEvalCount = 512

  private case class Cte(name: String, materialized: Boolean,
      bodyStart: Int, bodyEnd: Int, body: String)

  /** CTE headers: `name [(cols)] AS [MATERIALIZED] (` — the literal paren
    * right after AS/MATERIALIZED excludes CAST(x AS type(...)) and
    * `UNNEST(...) AS alias(cols)` forms. */
  private val CteHeader =
    """(?is)\b(\w+)\s*(\([\w\s,]*\))?\s+AS\s+(MATERIALIZED\s+)?\(""".r

  /** Consumption sites of `name`: `FROM name`, `JOIN name`, or a
    * non-first member of a comma-style FROM list (`FROM x, name`). The
    * comma arm deliberately over-matches (a projection list `SELECT a,
    * name` also hits) — over-counting only makes the lint STRICTER,
    * while the previous FROM/JOIN-only form let a comma-joined CTE
    * evade the pyramid check entirely. A bare alias mention still does
    * not count. */
  private def refSites(sql: String, name: String): Seq[Int] =
    s"""(?is)(?:\\b(?:FROM|JOIN)\\s+|,\\s*)${
      java.util.regex.Pattern.quote(name)}\\b"""
      .r.findAllMatchIn(sql).map(_.start).toSeq

  /** Body spans via paren balancing that SKIPS single-quoted SQL string
    * literals ('' is the escape) — a paren inside a literal (e.g. a
    * regexp pattern) must not shift the computed span. */
  private def parseCtes(sql: String): Seq[Cte] =
    CteHeader.findAllMatchIn(sql).map { m =>
      val open = sql.indexOf('(', m.end - 1)
      var depth = 0
      var i = open
      var end = sql.length
      var done = false
      while (i < sql.length && !done) {
        sql(i) match {
          case '\'' =>
            i += 1
            while (i < sql.length && sql(i) != '\'') i += 1
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) { end = i + 1; done = true }
          case _ =>
        }
        i += 1
      }
      Cte(m.group(1), m.group(3) != null, open, end,
        sql.substring(open, end))
    }.toSeq

  private def violations(sql: String): Seq[(String, Long)] = {
    val ctes = parseCtes(sql)
    // transitive scale-table reach, in definition order (a CTE can only
    // consume earlier CTEs)
    val touches = scala.collection.mutable.Map[String, Boolean]()
    val fromRef = """(?is)\b(?:FROM|JOIN)\s+(\w+)""".r
    ctes.foreach { c =>
      val direct = fromRef.findAllMatchIn(c.body)
        .exists(m => ScaleTables(m.group(1).toLowerCase))
      val viaCte = fromRef.findAllMatchIn(c.body)
        .exists(m => touches.getOrElse(m.group(1).toLowerCase, false))
      touches(c.name.toLowerCase) = direct || viaCte
    }
    // post-inlining evaluation counts, to fixpoint (a pyramid of depth d
    // needs d passes; counts are monotone and capped)
    val evalc = scala.collection.mutable.Map[String, Long]()
    def ownerWeight(pos: Int): Long =
      ctes.find(c => c.bodyStart <= pos && pos < c.bodyEnd) match {
        case Some(c) if c.materialized => 1L
        case Some(c) => evalc.getOrElse(c.name.toLowerCase, 1L)
        case None => 1L // main query
      }
    (0 to ctes.size).foreach { _ =>
      ctes.foreach { c =>
        val refs = refSites(sql, c.name)
          .filterNot(p => c.bodyStart <= p && p < c.bodyEnd)
        evalc(c.name.toLowerCase) =
          if (c.materialized) 1L
          else math.min(1000000000L, refs.map(ownerWeight).sum)
      }
    }
    ctes.collect {
      case c if !c.materialized && touches(c.name.toLowerCase) &&
          evalc(c.name.toLowerCase) >= MaxEvalCount =>
        (c.name, evalc(c.name.toLowerCase))
    }
  }

  test("no oracle contains an unhinted CTE pyramid over a scale table") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (q, sql) => violations(sql).map { case (cte, n) =>
        s"$q: CTE `$cte` would evaluate $n times after inlining — add " +
          "AS MATERIALIZED (see tools/README.md heavy-oracle protocol)"
      }
    }
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }

  test("the lint itself catches a synthetic unhinted pyramid") {
    // 10 doubling rounds over a scale table: r10 forces r0 to evaluate
    // 2^10 = 1024 >= 512 times if nothing is materialized
    val rounds = (1 to 10).map { i =>
      s"r$i AS (SELECT a FROM r${i - 1} x JOIN r${i - 1} y USING (a))"
    }.mkString(", ")
    val sql = s"WITH r0 AS (SELECT a FROM events), $rounds " +
      "SELECT * FROM r10"
    val v = violations(sql)
    assert(v.exists(_._1 == "r0"), s"expected r0 flagged, got $v")
    // same pyramid with materialized rounds is clean
    val matRounds = (1 to 10).map { i =>
      s"r$i AS MATERIALIZED (SELECT a FROM r${i - 1} x " +
        s"JOIN r${i - 1} y USING (a))"
    }.mkString(", ")
    val sqlM = s"WITH r0 AS (SELECT a FROM events), $matRounds " +
      "SELECT * FROM r10"
    assert(violations(sqlM).isEmpty)
    // fixed-size tables never flag
    val sqlN = sql.replace("FROM events", "FROM nation")
    assert(violations(sqlN).isEmpty)
  }
}
