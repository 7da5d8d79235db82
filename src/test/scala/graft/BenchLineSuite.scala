package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The bench JSON line is what the per-round grading parses — a
  * malformed or lossy `queries` value silently voids the whole round's
  * bench, so the r12 idx encoder is pinned by round-trip against a real
  * JSON parser (the same Jackson/json4s Spark ships) and against the
  * documented decode contract: values in ascending full-name order,
  * names from the round's own correctness/oracle key set. */
class BenchLineSuite extends AnyFunSuite {

  /** Decode per the documented "qenc":"idx" rule: the i-th value belongs
    * to the i-th name in ascending ASCII order of the full names. */
  private def decode(json: String, names: Seq[String]): Map[String, Long] =
    JsonMethods.parse(json) match {
      case JArray(vals) =>
        assert(vals.size == names.size, "qn mismatch: array vs name count")
        names.sorted.zip(vals.map {
          case JInt(v) => v.toLong
          case other => fail(s"non-integer value: $other")
        }).toMap
      case other => fail(s"not an array: $other")
    }

  test("idx encoding round-trips the r8 query-name shapes losslessly") {
    // the shapes that stressed the old pfx encoder: a bare name that is
    // also a prefix, multi-underscore names, singleton prefixes — under
    // idx they only matter through sort order, pinned here explicitly
    val results = Seq(
      "q_scan" -> 0.11, "q_scan_prune" -> 0.12,
      "q_union" -> 0.31, "q_union_all" -> 0.2,
      "q_except" -> 0.3, "q_except_all" -> 0.44,
      "q_distinct" -> 0.2,
      "q_llm_embdup_lsh" -> 0.9, "q_llm_embdup" -> 0.5, "q_llm_cc" -> 3.01,
      "q_agg_wmedian_cont" -> 1.0,
      "q_gen_range" -> 0.1, "q_case" -> 0.06)
    val decoded = decode(Bench.encodeQueries(results), results.map(_._1))
    val expected = results.map { case (k, v) => k -> math.round(v * 10) }.toMap
    assert(decoded === expected)
  }

  test("law: encode + name-zip decode is the identity on arbitrary query-name sets") {
    val seg = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val name = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, seg).map(ss => "q_" + ss.mkString("_")))
    val entries = Gen.resize(40, Gen.nonEmptyListOf(
      Gen.zip(name, Gen.chooseNum(0.0, 60.0))))
      .map(_.distinctBy(_._1)) // duplicate names can't occur in a Map-backed suite
    val prop = Prop.forAll(entries) { (rs: List[(String, Double)]) =>
      decode(Bench.encodeQueries(rs), rs.map(_._1)) ==
        rs.map { case (k, v) => k -> math.round(v * 10) }.toMap
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"bench line round-trip: ${res.status}")
  }

  test("the registry sort the encoder uses matches the oracle artifact's key sort") {
    // The decode contract zips against sorted(CORRECTNESS keys) — which
    // the driver writes from SparkEntry.oracleSql. Pin that the two key
    // sets are identical and that Scala's String ordering on them equals
    // the ASCII code-unit order Python's sorted() applies (true for
    // [a-z0-9_] names; a future non-ASCII name would break silently).
    val qNames = SparkEntry.queries.keys.toSeq
    val oNames = SparkEntry.oracleSql.keys.toSeq
    assert(qNames.toSet == oNames.toSet,
      "queries and oracleSql key sets diverge — the idx zip would skew")
    qNames.foreach(n => assert(n.matches("[a-z0-9_]+"), s"non-ASCII name: $n"))
    val scalaSorted = qNames.sorted
    val codeUnitSorted = qNames.sortWith { (a, b) =>
      a.compareTo(b) < 0 // explicit code-unit compare
    }
    assert(scalaSorted == codeUnitSorted)
  }

  test("budget pin: the FULL registered query set encodes within the driver's tail budget") {
    // The driver reads the bench metric from the tail of sbt's stdout;
    // past ~1920 chars the line risks truncation and the round's bench
    // voids. Encode every registered query at a pessimistic 3-digit
    // decisecond value (99.9 s — no real query is slower) and assert
    // the whole line fits with wide margin. When this fails: re-budget
    // BEFORE adding more queries.
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 99.9)
    val qs = Bench.encodeQueries(results)
    val line = s"""{"metric":"total","value":9999.9,"unit":"sec","method":"m2ci","qunit":"ds","qenc":"idx","qn":${results.size},"yard":0.11,"queries":$qs,"sf":"sf0.1"}"""
    assert(line.length <= 1900,
      s"bench line would be ${line.length} chars at 3-digit values — re-budget")
  }
}
