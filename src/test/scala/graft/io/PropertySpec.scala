package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the pure kernels (no SparkSession needed).
  * Raw scalacheck runner (no scalatestplus bridge in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("escapeKey/unescapeKey round-trips arbitrary strings") {
    check("escape-roundtrip")(Prop.forAll { (s: String) =>
      Flatten.unescapeKey(Flatten.escapeKey(s)) == s
    })
  }

  private val segName: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', '[', ']', '\\', '_')))
      .map(_.mkString)

  test("parsePath inverts path building for arbitrary segment names") {
    check("parsePath-roundtrip")(Prop.forAll(Gen.nonEmptyListOf(segName)) { segs =>
      val path = segs.map(Flatten.escapeKey).mkString(".")
      val parsed = Flatten.parsePath(path)
      parsed.map(_.name) == segs && parsed.forall(_.idx.isEmpty)
    })
  }

  test("parsePath handles [i] indices appended to arbitrary names") {
    check("parsePath-index")(Prop.forAll(segName, Gen.chooseNum(0, 999)) { (name, i) =>
      Flatten.parsePath(s"${Flatten.escapeKey(name)}[$i]") ==
        List(Flatten.Seg(name, Some(i)))
    })
  }

  test("Excel column refs: colIndex inverts colRef") {
    check("colref-roundtrip")(Prop.forAll(Gen.chooseNum(0, 20000)) { i =>
      ExcelIO.colIndex(ExcelIO.colRef(i) + "1") == i
    })
  }

  test("JSON string escaper emits parseable JSON for arbitrary strings") {
    check("jsonstr")(Prop.forAll { (s: String) =>
      val q = graft.util.JsonStr.quote(s)
      // no raw control chars survive, quotes balanced
      q.startsWith("\"") && q.endsWith("\"") &&
        !q.drop(1).dropRight(1).exists(c => c < ' ')
    })
  }
}
