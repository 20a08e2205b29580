package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.Pico
import graft.query.Pico.{PicoQuery, PicoTerm}

class PicoSpec extends AnyFunSuite {

  test("subtree: cui plus one level of descendants by default") {
    // children of C10: C21 and C37
    assert(Pico.subtree("C10") === Set("C10", "C21", "C37"))
  }

  test("subtree: levels=2 recurses into children") {
    val l2 = Pico.subtree("C10", levels = 2)
    assert(l2.contains("C10") && l2.contains("C21") && l2.contains("C37"))
    // children of C21 (C43, C70) and of C37 (C75, C18) join at level 2
    assert(l2 === Set("C10", "C21", "C37", "C43", "C70", "C75", "C18"))
  }

  test("subtree: unknown cui expands to itself only") {
    assert(Pico.subtree(Pico.CovidCui) === Set(Pico.CovidCui))
  }

  test("expandTerm honors expand_terms=false") {
    val t = PicoTerm("population", "C10")
    assert(Pico.expandTerm(t, expand = false) === Seq("C10"))
    assert(Pico.expandTerm(t, expand = true).toSet === Set("C10", "C21", "C37"))
  }

  test("covid gate: preprint arm only with TS-COV19 population term") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val plain = Pico.search(spark, dir,
      PicoQuery(Seq(PicoTerm("population", "C10"))))
    val covid = Pico.search(spark, dir,
      PicoQuery(Seq(PicoTerm("population", Pico.CovidCui))))
    val plainArms = plain.select("article_type").distinct().collect().map(_.getString(0)).toSet
    val covidArms = covid.select("article_type").distinct().collect().map(_.getString(0)).toSet
    assert(!plainArms.contains("preprint"))
    assert(covidArms.contains("preprint"))
  }
}
