package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Census-based hot-key salting for bucket-keyed equi-joins.
  *
  * The bucket-binning rewrite ([[LogOps.joinIntervalOverlap]],
  * [[LogOps.proximitySearch]]) turns keyless range predicates into
  * equi-joins on a time/position bucket — uniform by construction in the
  * steady state, but a pathological hour (an incident storm, a stopword
  * position run) concentrates one bucket key, and that key's whole
  * pairing then runs in one task. The guard: CENSUS the left side's
  * per-key counts (a cheap partial-aggregated scan), broadcast the keys
  * over the threshold, split the left side's hot-key rows over `salts`
  * sub-keys by row hash, and replicate only the RIGHT side's hot-key
  * rows across those sub-keys ([[Relational.joinSaltedSkew]]'s rewrite,
  * applied adaptively instead of unconditionally). Cold keys keep salt 0
  * on both sides — no replication, no extra shuffle volume — so below
  * the threshold the join is byte-identical in cost to the unguarded
  * form. Each qualifying pair still meets exactly once (a left row has
  * ONE salt; the right row covers every salt of a hot key), so this is a
  * physical rewrite with identical results — SkewSpec pins both halves.
  *
  * This is the static-storm complement of AQE's skew-split: AQE repairs
  * skew it can see in sort-merge shuffle stats at runtime, while the
  * census guard also covers broadcast/replicated shapes and makes the
  * bound explicit and testable.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `keys` with hot-key salting.
    *
    * @param saltBy deterministic per-row expression on the LEFT side used
    *               to spread a hot key's rows (e.g. a row id hash)
    * @param hotThreshold per-key left-row count above which a key salts
    * @param salts fan-out for hot keys
    */
  def censusSaltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       saltBy: Column, hotThreshold: Long = 1000L,
                       salts: Int = 8): DataFrame = {
    val keyCols = keys.map(col)
    // the census is post-aggregation metadata: one row per key OVER the
    // threshold (zero rows in the steady state), broadcast to both sides.
    // BOTH sides are censused: a key can be hot because either side
    // concentrates (a storm of incidents from few users makes the RIGHT
    // side huge while the left stays cold); the per-task pairing bound is
    // |left_k|·|right_k|, so either side over the threshold trips the
    // salt — pairing then spreads as |left_k|·|right_k| / salts.
    def hotKeys(side: DataFrame) =
      side.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > hotThreshold)
        .select(keyCols: _*)
    val hot = hotKeys(left).unionByName(hotKeys(right)).distinct()
      .select(keyCols :+ lit(1).as("__hot"): _*)
    val l = left.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull, pmod(saltBy, lit(salts)).cast("int")).otherwise(0))
      .drop("__hot")
    val r = right.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        explode(sequence(lit(0),
          when(col("__hot").isNotNull, lit(salts - 1)).otherwise(lit(0)))))
      .drop("__hot")
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
