package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.annotate.Minimap

class MinimapSpec extends AnyFunSuite {

  test("syn_uninv: 'Diabetes, Type 2' -> 'Type 2 Diabetes'") {
    assert(Minimap.synUninv("Diabetes, Type 2") === "Type 2 Diabetes")
  }

  test("syn_uninv: no-op without ', ', at end, or before prep/conj") {
    assert(Minimap.synUninv("Diabetes Type 2") === "Diabetes Type 2")
    assert(Minimap.synUninv("Diabetes, ") === "Diabetes, ")
    assert(Minimap.synUninv("Aspirin, for headache") === "Aspirin, for headache")
  }

  test("pipeline: parentheticals, hyphens, possessives, spacing") {
    assert(Minimap.pipeline("Alzheimer's disease (AD) is chronic") ===
      "Alzheimer disease is chronic")
    assert(Minimap.pipeline("low-molecular-weight heparin") ===
      "low molecular weight heparin")
    assert(Minimap.pipeline("[D]Something  spaced") === "Something spaced")
  }

  test("pipeline umls_mode adds uninversion and NOS stripping") {
    assert(Minimap.pipeline("Diabetes, Type 2", umlsMode = true) === "Type 2 Diabetes")
    assert(Minimap.pipeline("Anemia NOS", umlsMode = true) === "Anemia")
  }

  test("abbreviation substitution before matching") {
    val c = Minimap.minimap("Patients on LMWH therapy.",
      abbrevs = Map("LMWH" -> "low-molecular-weight heparin"))
    assert(c.map(_.cui) === Seq("C0023652"))
  }

  test("greedy longest-match beats submatches") {
    val c = Minimap.minimap("Adults with type 2 diabetes.")
    assert(c.map(_.cui) === Seq("C0011860")) // not the bare-diabetes CUI
  }

  test("lemmatized plural matches") {
    val c = Minimap.minimap("Two heart attacks occurred.")
    assert(c.map(_.cui) === Seq("C0027051"))
    assert(c.head.source_text === "heart attacks")
  }

  test("ambiguous term: only first CUI survives non-overlap selection") {
    assert(Minimap.minimap("A common cold.").map(_.cui) === Seq("C0009443"))
  }

  test("ignore list suppresses generic terms") {
    assert(Minimap.minimap("A large study and trial.") === Seq.empty)
  }

  test("get_unique_terms dedupes by cui across snippets, first wins") {
    val terms = Minimap.uniqueTerms(Seq(
      "diabetes in adults", "type 2 diabetes", "diabetes mellitus again"))
    assert(terms.map(_._1) === Seq("C0011849", "C0011860"))
  }
}
