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
}
