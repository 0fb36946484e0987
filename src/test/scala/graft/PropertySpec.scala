package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5.3): the algebraic contracts a
  * correct engine cannot violate on ANY input, complementing the
  * fixture-pinned oracle checks. Kernel properties run pure-JVM at full
  * case counts; DataFrame properties run a handful of Spark round trips.
  */
class PropertySpec extends SparkSpecBase {
  import graft.functions.VectorOps

  private def check(prop: Prop, cases: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(2, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10f, 10f)).map(_.toArray))
        .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("cosine: self-similarity 1, symmetry, bounded") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val (aa, bb) = (new GenericArrayData(a), new GenericArrayData(b))
      val n = math.min(a.length, b.length)
      val cosSelf = VectorOps.cosine(aa, aa)
      val ab = VectorOps.cosine(aa, bb)
      val ba = VectorOps.cosine(bb, aa)
      math.abs(cosSelf - 1.0) < 1e-9 &&
        (ab.isNaN && ba.isNaN || math.abs(ab - ba) < 1e-12) &&
        (ab.isNaN || math.abs(ab) <= 1.0 + 1e-12) &&
        n > 0
    })
  }

  test("dot/norm consistency: dot(v,v) == l2norm(v)^2") {
    check(Prop.forAll(vecGen) { v =>
      val a = new GenericArrayData(v)
      math.abs(VectorOps.dot(a, a) - math.pow(VectorOps.l2Norm(a), 2)) < 1e-6
    })
  }

  test("srp bucket: deterministic, in range, sign-invariant to scaling") {
    check(Prop.forAll(vecGen, Gen.chooseNum(1, 16), Gen.long) { (v, bits, seed) =>
      val a = new GenericArrayData(v)
      val scaled = new GenericArrayData(v.map(_ * 3.0f))
      val b1 = VectorOps.srpBits(a, bits, seed)
      b1 == VectorOps.srpBits(a, bits, seed) &&
        b1 >= 0 && b1 < (1L << bits) &&
        // positive scaling never flips any projection sign
        b1 == VectorOps.srpBits(scaled, bits, seed)
    })
  }

  private val eventsGen: Gen[List[(Long, Long, Int)]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n,
      for {
        id <- Gen.chooseNum(0L, 1000L)
        user <- Gen.chooseNum(0L, 3L)
        minute <- Gen.chooseNum(0, 600)
      } yield (id, user, minute)))

  test("sessionization: session stats invariant under input permutation") {
    import spark.implicits._
    check(Prop.forAll(eventsGen) { evs =>
      def run(rows: Seq[(Long, Long, Int)]): Set[String] = {
        val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
        rows.toDF("event_id", "user_id", "minute")
          .select(col("event_id"),
            expr("timestamp_micros(1704067200000000 + cast(minute as bigint) * 60000000)").as("ts"),
            col("user_id"), lit("view").as("event_type"), lit(1.0).as("value"),
            lit("{}").as("props"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        graft.engine.LogOps.winSessionize.build(spark, dir)
          .collect().map(_.toString).toSet
      }
      run(evs) == run(scala.util.Random.shuffle(evs))
    }, cases = 8)
  }

  private def writeDocs(docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
    docs.map { case (id, t, lang) => (id, t, lang, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val curationDocsGen: Gen[List[(Long, String, String)]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf("a", "b b", "c c c", "d word soup", "e"),
        Gen.oneOf("en", "de", "fr"))))
      .map(_.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) })

  test("train/test split partitions any corpus: exhaustive and disjoint") {
    check(Prop.forAll(curationDocsGen) { docs =>
      val dir = writeDocs(docs)
      val got = graft.engine.CurationOps.trainTestSplit.build(spark, dir).collect()
      got.map(_.getLong(1)).sum == docs.length &&
        got.map(_.getString(0)).toSet.subsetOf(Set("train", "valid", "test"))
    }, cases = 6)
  }

  test("canonical dedup: canonical ids are the per-text minimum, total") {
    check(Prop.forAll(curationDocsGen) { docs =>
      val dir = writeDocs(docs)
      val got = graft.engine.CurationOps.dedupCanonical.build(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      val minByText = docs.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
      got.length == docs.length &&
        got.forall { case (id, canon, isDup) =>
          minByText.contains(canon) && (isDup == (id != canon)) && canon <= id
        }
    }, cases = 6)
  }

  test("sequence packing: every doc packed once; ids dense per stratum") {
    check(Prop.forAll(curationDocsGen) { docs =>
      val dir = writeDocs(docs)
      val packs = graft.engine.CurationOps.packSequences.build(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      packs.map(_._3).sum == docs.length &&
        packs.groupBy(_._1).forall { case (_, ps) =>
          val ids = ps.map(_._2).sorted.toSeq
          ids == (0L until ids.length)
        }
    }, cases = 6)
  }

  test("exact dedup: idempotent and keeper-count preserving") {
    import spark.implicits._
    val docsGen = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 500L), Gen.oneOf("a", "b", "c", "d e", "f g"))))
    check(Prop.forAll(docsGen) { docs =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      // doc_id must be unique for idempotence to be meaningful
      docs.zipWithIndex.map { case ((_, t), i) => (i.toLong, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val first = graft.engine.LlmOps.dedupExact.build(spark, dir).collect()
      // keepers cover every distinct text exactly once
      first.length == docs.map(_._2).distinct.length &&
        first.map(_.getLong(2)).sum == docs.length // n_copies sums to input size
    }, cases = 8)
  }

  test("incremental dedup: stage counts partition the batch; exact drops match brute force") {
    import spark.implicits._
    // Random corpora over a small text pool so exact cross-side duplicates
    // actually occur; doc_ids unique so the %5 batch split is stable.
    val docsGen = Gen.chooseNum(8, 40).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a b c d", "a b c e", "x y z w", "p q", "lone words here", "m n o p q r")))
    check(Prop.forAll(docsGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-inc").toString
      docs.map { case (id, t) => (id, t, "en", s"src${id % 2}", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.engine.LlmOps.incrementalDedup.build(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val batch = docs.filter(_._1 % 5 == 0)
      val existTexts = docs.filter(_._1 % 5 != 0).map(_._2).toSet
      // stage counts partition the batch per source…
      got.forall { case (_, nB, nE, nN, nS) => nB == nE + nN + nS } &&
        got.map(_._2).sum == batch.length &&
        // …and exact drops equal the brute-force cross-side membership test
        got.map(_._3).sum == batch.count(d => existTexts.contains(d._2))
    }, cases = 6)
  }

  test("dup-span fraction: verbatim duplicate pushes both docs to 1.0; bounded") {
    import spark.implicits._
    val textGen = Gen.chooseNum(5, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta")).map(_.mkString(" ")))
    check(Prop.forAll(Gen.listOfN(4, textGen)) { texts =>
      // docs 0 and 1 share the same text → every 5-gram duplicated → 1.0
      val docs = (texts.head :: texts).zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = graft.engine.LlmOps.dupSpanFraction.build(spark, dir)
        .select("doc_id", "dup_frac").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.getOrElse(0L, -1.0) == 1.0 && rows.getOrElse(1L, -1.0) == 1.0 &&
        rows.values.forall(f => f >= 0.0 && f <= 1.0)
    }, cases = 8)
  }

  test("peak concurrency: bounded by sessions/day, invariant under permutation") {
    import spark.implicits._
    check(Prop.forAll(eventsGen) { evs =>
      def run(rows: Seq[(Long, Long, Int)]): Seq[(Long, Long)] = {
        val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
        rows.toDF("event_id", "user_id", "minute")
          .select(col("event_id"),
            expr("timestamp_micros(1704067200000000 + cast(minute as bigint) * 60000000)").as("ts"),
            col("user_id"), lit("view").as("event_type"), lit(1.0).as("value"),
            lit("{}").as("props"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        graft.engine.LogOps.peakConcurrency.build(spark, dir)
          .select("n_sessions", "peak_concurrent").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      }
      val a = run(evs)
      a == run(scala.util.Random.shuffle(evs)) &&
        a.forall { case (n, peak) => peak >= 1 && peak <= n }
    }, cases = 6)
  }

  test("event runs: engine islands match a sequential fold on any stream") {
    import spark.implicits._
    val runsGen: Gen[Seq[(Long, Long, String, Int)]] = for {
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(0L, 2L)
        t <- Gen.oneOf("a", "b")
        m <- Gen.chooseNum(0, 10)
      } yield (u, t, m))
    } yield rows.zipWithIndex.map { case ((u, t, m), i) => (i.toLong + 1, u, t, m) }
    check(Prop.forAll(runsGen) { rows =>
      // reference: per user, order by (minute, event_id), fold consecutive
      // same-type runs, keep length >= 3 — the definition, executed naively
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (u, evs) =>
        val ordered = evs.sortBy(r => (r._4, r._1))
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
        var curType: String = null
        var len = 0L
        ordered.foreach { case (_, _, t, _) =>
          if (t == curType) len += 1
          else {
            if (curType != null) runs += ((u, curType, len))
            curType = t; len = 1
          }
        }
        if (curType != null) runs += ((u, curType, len))
        runs.filter(_._3 >= 3)
      }.sorted
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-runs").toString
      rows.toDF("event_id", "user_id", "event_type", "minute")
        .select(col("event_id"),
          expr("timestamp_micros(1704067200000000 + cast(minute as bigint) * 60000000)").as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.engine.LogOps.eventRuns.build(spark, dir)
        .select("user_id", "event_type", "run_len").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
      got == expected
    }, cases = 8)
  }

  test("pairCounts: group-and-expand equals the naive postings self-join on random postings") {
    import spark.implicits._
    // The single riskiest semantic rewrite in the pair-scan family: the
    // sorted-ids slice-after-i expansion must generate EXACTLY the pairs
    // the (a.key = b.key AND a.doc < b.doc) self-join generates — once
    // each, with identical co-occurrence counts — on arbitrary postings.
    val rnd = new scala.util.Random(7)
    val postings = (for (_ <- 1 to 600)
      yield (rnd.nextInt(60).toLong, s"k${rnd.nextInt(25)}")).distinct
    val got = graft.engine.LlmOps.pairCounts(postings.toDF("doc_id", "key"), "key")
      .as[(Long, Long, Long)].collect().toSet
    val exp = scala.collection.mutable.Map[(Long, Long), Long]()
    postings.groupBy(_._2).values.foreach { g =>
      val ids = g.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.size)
        exp((ids(i), ids(j))) = exp.getOrElse((ids(i), ids(j)), 0L) + 1
    }
    assert(got === exp.map { case ((a, b), c) => (a, b, c) }.toSet)
  }

  test("cdc chunks: identical docs chunk identically and dup at 1.0") {
    import spark.implicits._
    // pools chosen so duplicate texts occur; any doc whose text appears
    // twice in the corpus must have EVERY chunk duplicated (dup_frac 1.0)
    // and the same chunk profile as its twin — content-defined boundaries
    // depend only on content.
    val docsGen = Gen.chooseNum(4, 24).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a b c d e f g h", "x y z w v u", "p q r s", "one two three four five",
        "m n o p q r s t u")))
    check(Prop.forAll(docsGen) { texts =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-cdc").toString
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = graft.engine.TextOps.cdcChunks.build(spark, dir)
        .select("doc_id", "n_chunks", "avg_chunk_tok", "dup_frac")
        .as[(Long, Long, Double, Double)].collect()
      val byId = rows.map(r => r._1 -> r).toMap
      val dupTexts = texts.zipWithIndex.groupBy(_._1).filter(_._2.size >= 2)
      dupTexts.forall { case (_, occ) =>
        val profs = occ.map { case (_, i) => byId(i.toLong) }
        profs.forall(_._4 == 1.0) &&
          profs.map(p => (p._2, p._3)).distinct.size == 1
      }
    }, cases = 6)
  }

  test("proximity search equals the brute-force position scan on any doc") {
    import spark.implicits._
    val tokGen = Gen.oneOf("spark", "vector", "x", "y")
    val docsGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(1, 20).flatMap(m => Gen.listOfN(m, tokGen))))
    check(Prop.forAll(docsGen) { docToks =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-prox").toString
      docToks.zipWithIndex.map { case (ts, i) =>
        val t = ts.mkString(" "); (i.toLong, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.engine.LogOps.proximitySearch.build(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      val expected = docToks.zipWithIndex.flatMap { case (ts, i) =>
        val pa = ts.zipWithIndex.collect { case ("spark", p) => p + 1 }
        val pb = ts.zipWithIndex.collect { case ("vector", p) => p + 1 }
        val dists = for (a <- pa; b <- pb; d = math.abs(a - b) if d <= 4) yield d.toLong
        if (dists.isEmpty) None
        else Some((i.toLong, dists.size.toLong, dists.min))
      }.toSet
      got == expected
    }, cases = 6)
  }

  test("outage windows equal the brute-force interval merge on any incident set") {
    import spark.implicits._
    // minutes 0..600 stay inside one day, so the day partition is a no-op
    // and the merge semantics alone are under test
    val evGen = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, for {
      minute <- Gen.chooseNum(0, 600)
      value <- Gen.oneOf(50.0, 200.0)
      typ <- Gen.oneOf("error", "view")
    } yield (minute, value, typ)))
    check(Prop.forAll(evGen) { evs =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-outage").toString
      evs.zipWithIndex.map { case ((m, v, t), i) =>
        (i.toLong, new java.sql.Timestamp(1704067200000L + m * 60000L), i.toLong, t, v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.engine.LogOps.outageWindows.build(spark, dir)
        .select("outage_id", "n_incidents", "start_us", "end_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      // brute force: sort incident windows, merge when start <= running max end
      val base = 1704067200000000L
      val incidents = evs.zipWithIndex
        .collect { case ((m, v, "error"), i) if v > 150 =>
          (base + m * 60000000L - 120000000L, base + m * 60000000L + 120000000L, i.toLong) }
        .sortBy(w => (w._1, w._3))
      val merged = incidents.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, (s0, e0, _)) => acc match {
          case (s1, e1, n) :: rest if s0 <= e1 => (s1, math.max(e0, e1), n + 1) :: rest
          case _ => (s0, e0, 1L) :: acc
        }
      }.reverse
      val expected = merged.zipWithIndex
        .map { case ((s0, e0, n), i) => (i + 1L, n, s0, e0) }.toSet
      got == expected
    }, cases = 8)
  }

  test("type affinity basket cap binds on a saturated basket") {
    import spark.implicits._
    val cap = graft.engine.LogOps.maxAffinityItems
    // One hot basket with 3× the cap's distinct items, plus a normal
    // 2-item basket. Uncapped, the hot basket alone makes C(96,2)=4560
    // co-occurrence rows; capped it contributes exactly C(cap,2).
    val hot = (0 until cap * 3).map(i => (1L, 0L, f"item_$i%03d"))
    val small = Seq((2L, 0L, "item_000"), (2L, 0L, "item_001"))
    val st = (hot ++ small).toDF("user_id", "session_id", "event_type")
    val capped = graft.engine.LogOps.affinityBaskets(st, cap)
      .as[(Long, Long, String)].collect()
    // keeps the lexicographically-first cap items of the hot basket
    assert(capped.count(_._1 == 1L) === cap)
    assert(capped.filter(_._1 == 1L).map(_._3).sorted.toSeq ===
      (0 until cap).map(i => f"item_$i%03d"))
    assert(capped.count(_._1 == 2L) === 2)
    val lift = graft.engine.LogOps.affinityFromBaskets(
      graft.engine.LogOps.affinityBaskets(st, cap))
    val nCo = lift.agg(sum("n_co")).as[Long].head()
    assert(nCo === cap.toLong * (cap - 1) / 2 + 1,
      s"pair volume $nCo not bounded by the cap")
  }
}
