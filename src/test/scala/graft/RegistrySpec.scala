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

  test("every registered query dumps a hashable schema: no array/map/struct columns") {
    // The driver's correctness checker reads each dump with pandas and
    // sorts rows to hash them; array/map/struct cells arrive as numpy
    // arrays / dicts and raise `unhashable type` — which is how
    // text_quality_classifier's raw array<double> weights column became
    // round 4's only red row. Nested results must serialize (to_json,
    // as agg_collect_list does) or explode to scalars before registering.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(bad.isEmpty, s"$name outputs non-hashable columns ${bad.mkString(", ")}")
    }
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
