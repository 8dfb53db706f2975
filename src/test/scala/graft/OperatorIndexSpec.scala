package graft

import org.scalatest.funsuite.AnyFunSuite

/** OPERATORS.md is generated from the registry; this spec makes the
  * committed file a build invariant: regenerate with
  * `sbt 'runMain graft.OperatorIndex'` whenever the registry changes. */
class OperatorIndexSpec extends AnyFunSuite {

  test("committed OPERATORS.md matches the registry-rendered index exactly") {
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("OPERATORS.md"))
    val rendered = OperatorIndex.render
    assert(committed == rendered,
      "OPERATORS.md is stale — run `sbt 'runMain graft.OperatorIndex'` and commit")
  }

  test("every registry query appears in the index with nonempty semantics") {
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("OPERATORS.md"))
    val missing = SparkEntry.registryAll.map(_.name)
      .filterNot(n => committed.contains(s"`$n`"))
    assert(missing.isEmpty, s"queries missing from OPERATORS.md: $missing")
    val undocumented = SparkEntry.registryAll
      .filter(q => q.doc.isEmpty && !OperatorIndex.docOverride.contains(q.name))
      .map(_.name)
    assert(undocumented.isEmpty,
      s"queries with no one-line semantics (add a GQuery doc or a docOverride): $undocumented")
  }

  test("docOverride carries no stale entries") {
    val byName = SparkEntry.registryAll.map(q => q.name -> q).toMap
    val stale = OperatorIndex.docOverride.keys.filter { k =>
      byName.get(k) match {
        case None => true // query gone
        case Some(q) => q.doc.nonEmpty // query now documents itself
      }
    }
    assert(stale.isEmpty, s"stale docOverride entries: ${stale.toSeq.sorted}")
  }
}
