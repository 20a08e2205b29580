package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.io.Ris

class RisSpec extends AnyFunSuite {

  test("pubmed dialect: blank-line delimited, continuations, repeats") {
    val recs = Ris.loads(
      "PMID- 1\nTI  - Title one\n      continued\nAU  - A\nAU  - B\n\nPMID- 2\nTI  - Two\n")
    assert(recs.length === 2)
    assert(recs(0) === Seq("PMID" -> Seq("1"),
      "TI" -> Seq("Title one", "continued"), "AU" -> Seq("A", "B")))
    assert(recs(1) === Seq("PMID" -> Seq("2"), "TI" -> Seq("Two")))
  }

  test("ovid endnote dialect sniffed from <n. > header") {
    val recs = Ris.loads("<1. >\nVN  - Ovid\n<2. >\nTI  - Second\n")
    assert(recs === Seq(Seq("VN" -> Seq("Ovid")), Seq("TI" -> Seq("Second"))))
  }

  test("ovid ris dialect sniffed from n. header") {
    val recs = Ris.loads("1.\nTI  - One\n2.\nTI  - Two\n")
    assert(recs.map(_.head._2.head) === Seq("One", "Two"))
  }

  test("wiley provider lines are ignored") {
    val recs = Ris.loads(
      "Record #1 of 2\nProvider: John Wiley & Sons, Ltd.\nTI  - W\n\n")
    assert(recs === Seq(Seq("TI" -> Seq("W"))))
  }

  test("BOM on a line is defused") {
    val recs = Ris.loads("﻿TI  - BomTitle\n")
    assert(recs === Seq(Seq("TI" -> Seq("BomTitle"))))
  }

  test("4-char tags parse with the reference's column-6 value quirk") {
    // '{k}  - {v}' written by dumps puts 4-char tags' '-' at col 6
    assert(Ris.loads("ABCD  - v") === Seq(Seq("ABCD" -> Seq("- v"))))
    // MEDLINE's own 'PMID- 123' layout parses cleanly
    assert(Ris.loads("PMID- 123") === Seq(Seq("PMID" -> Seq("123"))))
  }

  test("property: dumps/loads round-trip for 2-char-tag records") {
    val tag = Gen.listOfN(2, Gen.alphaUpperChar).map(_.mkString)
    val value = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val record = Gen.nonEmptyListOf(Gen.zip(tag, Gen.nonEmptyListOf(value)))
      .map(kvs => kvs.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (k, vs) => (k, vs.flatMap(_._2)) })
    val recsGen = Gen.nonEmptyListOf(record).map(_.take(4))
    val prop = Prop.forAll(recsGen) { recs =>
      Ris.loads(Ris.dumps(recs.map(r => r: Ris.Record))) ==
        recs.map(r => r: Ris.Record)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }
}
