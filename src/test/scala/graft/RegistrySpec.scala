package graft

import graft.engine.Q

/** Contract-level invariants over the whole query registry. */
class RegistrySpec extends SparkSpecBase {

  test("query names are unique") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size === names.distinct.size)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries execute at sf0.001 and are deterministic across reruns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sfDir).collect().map(_.toString).toSeq
      val b = fn(spark, sfDir).collect().map(_.toString).toSeq
      assert(a === b, s"$name not deterministic")
      assert(a.nonEmpty, s"$name returned zero rows at sf0.001 — vacuous query")
    }
  }
}
