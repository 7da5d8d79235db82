package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The bench JSON line is what the per-round grading parses — a
  * malformed or lossy `queries` object silently voids the whole round's
  * bench, so the r9 nested-prefix encoder is pinned by round-trip
  * against a real JSON parser (the same Jackson/json4s Spark ships). */
class BenchLineSuite extends AnyFunSuite {

  /** Decode per the documented "qenc":"pfx" rule: name = prefix, or
    * prefix + "_" + innerKey (empty inner key = the bare prefix). */
  private def decode(json: String): Map[String, Long] =
    JsonMethods.parse(json) match {
      case JObject(fields) => fields.flatMap {
        case (p, JObject(inner)) => inner.map {
          case (r, JInt(v)) => (if (r.isEmpty) s"q_$p" else s"q_${p}_$r") -> v.toLong
          case other => fail(s"non-integer leaf: $other")
        }
        case (p, JInt(v)) => Seq(s"q_$p" -> v.toLong)
        case other => fail(s"unexpected field shape: $other")
      }.toMap
      case other => fail(s"not an object: $other")
    }

  test("nested-prefix encoding round-trips the r8 query-name shapes losslessly") {
    // the collision cases that motivated the empty-key rule: a bare name
    // that is also a prefix ("union" vs "union_all", "except"/"distinct"
    // vs nothing), multi-underscore names, singleton prefixes
    val results = Seq(
      "q_scan" -> 0.11, "q_scan_prune" -> 0.12,
      "q_union" -> 0.31, "q_union_all" -> 0.2,
      "q_except" -> 0.3, "q_except_all" -> 0.44,
      "q_distinct" -> 0.2,
      "q_llm_embdup_lsh" -> 0.9, "q_llm_embdup" -> 0.5, "q_llm_cc" -> 3.01,
      "q_agg_wmedian_cont" -> 1.0,
      "q_gen_range" -> 0.1, "q_case" -> 0.06)
    val decoded = decode(Bench.encodeQueries(results))
    val expected = results.map { case (k, v) => k -> math.round(v * 10) }.toMap
    assert(decoded === expected)
  }

  test("law: encode/decode is the identity on arbitrary query-name sets") {
    val seg = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val name = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, seg).map(ss => "q_" + ss.mkString("_")))
    val entries = Gen.resize(40, Gen.nonEmptyListOf(
      Gen.zip(name, Gen.chooseNum(0.0, 60.0))))
      .map(_.distinctBy(_._1)) // duplicate names can't occur in a Map-backed suite
    val prop = Prop.forAll(entries) { (rs: List[(String, Double)]) =>
      decode(Bench.encodeQueries(rs)) ==
        rs.map { case (k, v) => k -> math.round(v * 10) }.toMap
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"bench line round-trip: ${res.status}")
  }
}
