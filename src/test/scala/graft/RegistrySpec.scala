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

  test("all queries execute at sf0.001, are deterministic, and dump hashable schemas") {
    // One loop for all three registry-wide invariants: building a Q is
    // NOT free for the iterative operators (BPE/GD/k-means/CC/PQ run
    // real localCheckpoint rounds inside the builder), so a separate
    // "schema-only" sweep would silently pay a third full-registry
    // execution. The hashable-schema rule exists because the driver's
    // correctness checker sorts each dump with pandas — array/map/struct
    // cells arrive as numpy arrays / dicts and raise `unhashable type`,
    // which is how text_quality_classifier's raw array<double> weights
    // column became round 4's only red row. Nested results must
    // serialize (to_json, as agg_collect_list does) or explode to
    // scalars before registering.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val first = fn(spark, sfDir)
      val bad = first.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(bad.isEmpty, s"$name outputs non-hashable columns ${bad.mkString(", ")}")
      val a = first.collect().map(_.toString).toSeq
      val b = fn(spark, sfDir).collect().map(_.toString).toSeq
      assert(a === b, s"$name not deterministic")
      assert(a.nonEmpty, s"$name returned zero rows at sf0.001 — vacuous query")
    }
  }
}
