package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

class RegistrySpec extends AnyFunSuite {

  test("query names are unique (byName must not silently drop entries)") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.mkString(","))
  }

  test("every query has an oracle (full-strength correctness gate)") {
    val weak = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(weak.isEmpty, s"rows-only entries: ${weak.mkString(",")}")
  }

  test("bench set is non-empty and a subset of the registry") {
    assert(Registry.benchSet.nonEmpty)
    assert(Registry.benchSet.forall(q => Registry.byName.contains(q.name)))
  }

  test("every query carries a family tag (manifest completeness)") {
    val untagged = Registry.all.map(_.name)
      .filterNot(Registry.familyOf.contains)
    assert(untagged.isEmpty,
      s"queries outside byFamily: ${untagged.mkString(",")} — " +
        "Registry.all and Registry.byFamily must list the same files")
  }

  test("numbered names are unique across the registry (q<N> collision)") {
    // a duplicated qNN prefix means two entries claim the same id in
    // SURVEY/CORRECTNESS artifacts even though full names differ
    val ids = Registry.all.map(_.name.split("_")(0))
    val dups = ids.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query ids: ${dups.mkString(",")}")
  }
}
