package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Param-accessor contract (r20 audit): a PRESENT param of the wrong
  * JSON type is a loud error, never a silent absence — the old
  * accessors made `"approx": "yes"` run exact, `"by": ["lang", 3]`
  * group by lang alone, `{"fetchsize": 1000}` vanish from options, and
  * `"cap": 3000000000` wrap to a negative Int. Numeric/boolean STRINGS
  * coerce ("5", "0.3", "true") like the reference's pydantic lax mode —
  * the dedup gate configs already rely on `"threshold": "0.3"`.
  * Absent and explicit-null both mean "not set". */
class JobConfigParamsSpec extends AnyFunSuite {

  private def comp(paramsJson: String): JobConfig.ComponentSpec =
    JobConfig.parse(
      s"""{ "name": "t", "components": [
         |  { "name": "c", "comp_type": "read_csv"$paramsJson } ] }""".stripMargin)
      .components.head

  test("str: string passes; absent/null are None; wrong type is loud") {
    assert(comp(""", "k": "v"""").str("k") === Some("v"))
    assert(comp("").str("k") === None)
    assert(comp(""", "k": null""").str("k") === None)
    val e = intercept[IllegalArgumentException] { comp(""", "k": 5""").str("k") }
    assert(e.getMessage.contains("'k'") && e.getMessage.contains("string"))
  }

  test("bool: native and string forms; wrong type is loud, not the default") {
    assert(comp(""", "k": true""").bool("k", default = false))
    assert(comp(""", "k": "TRUE"""").bool("k", default = false))
    assert(!comp(""", "k": "false"""").bool("k", default = true))
    assert(comp("").bool("k", default = true))
    assert(comp(""", "k": null""").bool("k", default = true))
    intercept[IllegalArgumentException] { comp(""", "k": 1""").bool("k", false) }
    intercept[IllegalArgumentException] { comp(""", "k": "yes"""").bool("k", false) }
  }

  test("intOpt: in-range passes, numeric strings coerce, out-of-range is loud not wrapped") {
    assert(comp(""", "k": 42""").intOpt("k") === Some(42))
    assert(comp(""", "k": "42"""").intOpt("k") === Some(42))
    assert(comp("").intOpt("k") === None)
    // 3000000000 silently .toInt-wrapped to -1294967296 before the fix
    val e = intercept[IllegalArgumentException] {
      comp(""", "k": 3000000000""").intOpt("k")
    }
    assert(e.getMessage.contains("32-bit"))
    intercept[IllegalArgumentException] { comp(""", "k": 1.5""").intOpt("k") }
    intercept[IllegalArgumentException] { comp(""", "k": "x"""").intOpt("k") }
  }

  test("longOpt: full range; strings coerce; non-integers are loud") {
    assert(comp(""", "k": 3000000000""").longOpt("k") === Some(3000000000L))
    assert(comp(""", "k": "3000000000"""").longOpt("k") === Some(3000000000L))
    intercept[IllegalArgumentException] { comp(""", "k": true""").longOpt("k") }
  }

  test("doubleOpt: numbers and numeric strings; garbage is loud") {
    assert(comp(""", "k": 0.3""").doubleOpt("k") === Some(0.3))
    assert(comp(""", "k": "0.3"""").doubleOpt("k") === Some(0.3))
    assert(comp(""", "k": 3""").doubleOpt("k") === Some(3.0))
    intercept[IllegalArgumentException] { comp(""", "k": "three"""").doubleOpt("k") }
    intercept[IllegalArgumentException] { comp(""", "k": [1]""").doubleOpt("k") }
  }

  test("strSeqParam: non-string elements and scalar-instead-of-list are loud, not dropped") {
    assert(comp(""", "by": ["a", "b"]""").strSeqParam("by") === Seq("a", "b"))
    assert(comp("").strSeqParam("by") === Nil)
    assert(comp(""", "by": null""").strSeqParam("by") === Nil)
    // ["lang", 3] used to group by lang ALONE — the 3 vanished
    intercept[IllegalArgumentException] {
      comp(""", "by": ["lang", 3]""").strSeqParam("by")
    }
    // "lang" (scalar) used to group by NOTHING
    intercept[IllegalArgumentException] {
      comp(""", "by": "lang"""").strSeqParam("by")
    }
  }

  test("strMapParam: non-string values are loud, not silently dropped") {
    assert(comp(""", "options": {"a": "1"}""").strMapParam("options") === Map("a" -> "1"))
    assert(comp("").strMapParam("options") === Map.empty)
    // {"fetchsize": 1000} used to return an EMPTY map — the option vanished
    val e = intercept[IllegalArgumentException] {
      comp(""", "options": {"fetchsize": 1000}""").strMapParam("options")
    }
    assert(e.getMessage.contains("fetchsize"))
  }
}
