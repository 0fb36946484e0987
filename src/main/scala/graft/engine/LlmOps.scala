package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** LLM-training-data pipeline operators (SURVEY.md §2.9): deduplication,
  * similarity search, embedding math, TF-IDF — over the `documents` and
  * `embeddings` corpora.
  *
  * Scale notes (100 TB): exact dedup groups on a 128-bit digest, never the
  * full text, so the shuffle carries 16 bytes per doc. Near-dup uses the
  * inverted-index (token-postings) join — the standard scale-out form —
  * rather than an O(n²) cross join, with a document-frequency cap so a
  * corpus-wide stopword can't regrow the cross product inside a hot
  * postings key; MinHash banding caps candidate pairs independently of
  * corpus size. The exact embedding near-dup distributes its inherent
  * pair scan over a block-grid equi-join (no corpus broadcast, bounded
  * per-task memory). k-NN broadcasts the (small) query side so the corpus
  * never shuffles, and the LSH variant prunes candidates by bucket
  * equality before any distance math.
  */
object LlmOps {

  /** Document-frequency cap for inverted-index joins: removes posting keys
    * (tokens, shingles) with df > least(frac·n_docs, absCap). The two
    * components bound two different blow-ups. The FRACTIONAL cap drops
    * corpus-wide stopwords — one token shared by every doc otherwise turns
    * the postings self-join into ~n² candidate rows on a single hot key.
    * The ABSOLUTE cap bounds per-key join work to absCap² pairs no matter
    * how the corpus grows: on a corpus whose vocabulary does NOT grow with
    * size (closed vocab — Heaps' law violated, every key's df fraction
    * constant), a purely relative cap admits keys whose absolute postings
    * lists scale linearly with n, and Σdf² goes quadratic anyway — the
    * same reason [[minhashPairs]] caps its band buckets at an absolute 50.
    * Keys over the cap carry no near-dup signal either way (membership
    * shared by thousands of docs identifies nobody). `postings` must be
    * distinct (doc_id, key) rows; the doc count joins in as a broadcast
    * single-row aggregate and the keep-list applies as a semi-join (one
    * row per vocabulary term).
    */
  private[graft] def dfCapped(postings: DataFrame, key: String, frac: Double,
                              absCap: Long = 2000L): DataFrame = {
    val nDocs = postings.agg(countDistinct("doc_id").as("n_docs"))
    val keep = postings.groupBy(key).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= least(lit(frac) * col("n_docs"), lit(absCap)))
      .select(key)
    postings.join(keep, Seq(key), "left_semi")
  }

  /** Pair-intersection counts for an inverted-index join, computed by
    * group-and-expand instead of a postings self-join: group the (already
    * df-capped) postings by key into a SORTED doc-id list, then expand the
    * C(df, 2) co-occurrence pairs map-side with two chained generators.
    * The self-join formulation shuffles the postings twice (once per join
    * side, string-keyed) and then shuffles all Σdf² joined rows into the
    * pair aggregation; this form shuffles the postings ONCE (the groupBy)
    * and the pair rows go straight into a partially-aggregated count —
    * measured 31 s → 9 s at sf0.1 for `llm_shingle_jaccard`, whose
    * closed-vocabulary fixture (931 shingles over 5 000 docs) makes
    * Σdf² ≈ 73 M the whole query. Identical semantics to the self-join
    * (the oracle SQL keeps that spelling): sorted ids + slice-after-i
    * emit each unordered pair exactly once with id_a < id_b. Per-key work
    * and per-task memory stay bounded by [[dfCapped]]'s absCap — the ids
    * array tops out at absCap elements, and pairs stream out of the
    * generators (never materialized as one cap²-element array). At 100 TB
    * the win doubles: the grouped relation is one row per vocabulary term,
    * so the expansion input is the vocabulary, not the corpus.
    */
  private[graft] def pairCounts(postings: DataFrame, key: String): DataFrame = {
    // The explicit-count round-robin repartition between the groupBy and
    // the generators is load-bearing: AQE coalesces post-shuffle partitions
    // by MAP-side output size, and the grouped relation is tiny (one row
    // per vocabulary term), so without it the whole Σdf² pair expansion
    // AND its partial aggregation collapse into ONE coalesced task —
    // measured 22 s single-threaded vs ~2 s across 32 slots at sf0.1.
    // An explicit numPartitions is exempt from AQE coalescing; round-robin
    // balances rows regardless of key hash, and per-row work is bounded by
    // the df-cap (≤ absCap² pairs), so no single row can skew a partition.
    val n = postings.sparkSession.sessionState.conf.numShufflePartitions
    postings
      .groupBy(key).agg(sort_array(collect_list("doc_id")).as("ids"))
      .repartition(n)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - lit(1))).as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"))
  }

  /** D1: exact dedup, deterministic formulation (min doc_id is the keeper —
    * `dropDuplicates` picks an arbitrary row and would break the oracle).
    */
  val dedupExact = Q(
    "llm_dedup_exact",
    """SELECT text, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy("text")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy("keeper_id")
  }

  /** D1 at scale: group on the md5 digest instead of the full text — the
    * shuffle key is 32 hex chars regardless of document size. At 100 TB the
    * text column never moves; only (digest, doc_id) pairs shuffle.
    */
  val dedupHash = Q(
    "llm_dedup_hash",
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keeper_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy("keeper_id")
  }

  /** D2 (oracle-able form): token-set Jaccard ≥ 0.8 between documents of
    * one source, via the inverted-index join — explode distinct tokens,
    * join postings on token, count co-occurrences. This is the formulation
    * that scales: candidate pairs are generated only for docs sharing a
    * token, and the df-cap below (drop tokens in > 80% of in-scope docs,
    * or > 2000 docs absolute — see [[dfCapped]]) bounds the postings join
    * at web scale — one stopword shared by every doc would otherwise make
    * the self-join n²-row regardless of the inverted-index structure. Capped tokens leave BOTH the intersection
    * and the set sizes, so the score is Jaccard over the discriminating
    * (non-ubiquitous) token space — the similarity a stopword-filtered
    * dedup pipeline actually wants; the oracle applies the identical cap.
    * MinHash (llm_minhash_pairs) is the sub-linear approximation of this
    * quantity.
    */
  val jaccardPairs = Q(
    "llm_jaccard_pairs",
    """WITH tok0 AS (
      |  SELECT doc_id, tok FROM (
      |    SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
      |    FROM documents WHERE source = 'src0') t
      |  WHERE tok <> ''),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok0),
      |dfc AS (SELECT tok, COUNT(*) AS df FROM tok0 GROUP BY 1),
      |tok AS (
      |  SELECT t.doc_id, t.tok FROM tok0 t JOIN dfc USING (tok) CROSS JOIN nd
      |  WHERE dfc.df <= least(0.8 * nd.n_docs, 2000)),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4) AS jaccard
      |FROM inter
      |JOIN sz sa ON inter.id_a = sa.doc_id
      |JOIN sz sb ON inter.id_b = sb.doc_id
      |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val tok0 = Tables.documents(s, dir)
      .filter(col("source") === "src0")
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
      .filter(col("tok") =!= "")
    // df-cap: tokens present in > 80% of in-scope docs carry no near-dup
    // signal and blow the postings join up to ~n² rows; drop them (tok0 is
    // already distinct per doc, so the helper's count == document
    // frequency).
    // localCheckpoint: `tok` feeds three consumers (the size relation and
    // both stages of the pair expansion via dfCapped's own two passes);
    // materializing it once stops the tokenize+explode+cap pipeline from
    // re-running per consumer. Single-JVM stand-in for persist/checkpoint.
    val tok = dfCapped(tok0, "tok", 0.8).localCheckpoint()
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairCounts(tok, "tok")
    val jac = col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c"))
    inter
      .join(sz.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("id_b") === col("sb.doc_id"))
      .filter(jac >= 0.8)
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** D2 (n-gram form): word-bigram shingle Jaccard ≥ 0.5 — near-identical
    * docs keep most shingles in common while random co-occurrence stays
    * near zero, so shingling separates true near-dups far better than the
    * unigram token sets above. Same inverted-index join, same df-cap
    * protection as [[jaccardPairs]] (here 10% of docs, 2000 absolute —
    * shingles are far sparser than unigrams, so a boilerplate bigram
    * shared by a tenth of the corpus is already pure noise; at the
    * fixtures no shingle reaches either bound, so results are the
    * uncapped ones while the guard stays load-bearing for saturated or
    * closed-vocabulary corpora). The shingle is `concat_ws` over a 2-slice so Spark and
    * DuckDB build byte-identical keys (both slice 1-based and truncate at
    * the array end); docs with fewer than two tokens emit NO shingles on
    * either side (a when-guard here, `range(1, len)` being empty at
    * len ≤ 1 there — an unguarded Spark `sequence(1, len-1)` would count
    * DOWN at len = 0 and a `greatest(1, …)` floor would emit a degenerate
    * unigram shingle DuckDB never builds).
    */
  /** Bigram-shingle SELECT shared by [[shinglePairCtes]] (whole-corpus)
    * and [[incrementalDedup]]'s batch/existing sides — ONE SQL source of
    * truth for the shingling, per the shinglePairCtes lockstep rule.
    * `fromClause` is spliced verbatim after FROM and may carry a WHERE
    * (incrementalDedup passes "bstat WHERE is_exact = 0") — callers own
    * the clause's validity; this helper must never append its own WHERE
    * or alias after it. */
  private def shingleSelectSql(fromClause: String): String =
    s"""SELECT doc_id, unnest(list_distinct(list_transform(
       |        range(1, len(string_split(lower(text), ' '))),
       |        i -> array_to_string(string_split(lower(text), ' ')[i:i+1], ' ')))) AS sh
       |    FROM $fromClause""".stripMargin

  /** Spark twin of [[shingleSelectSql]]: distinct bigram shingles per doc.
    * The token array is a materialized alias — an inlined split() tree
    * inside the lambda re-tokenizes per position, O(len²) per doc. */
  private[graft] def bigramShingles(df: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    df.select(col("doc_id"), toks.as("ts"))
      .select(col("doc_id"), explode(array_distinct(transform(
        when(size(col("ts")) >= lit(2), sequence(lit(1), size(col("ts")) - 1))
          .otherwise(array().cast("array<int>")),
        i => concat_ws(" ", slice(col("ts"), i, lit(2)))))).as("sh"))
  }

  /** Shingle df-cap parameters, shared across every consumer (Spark
    * [[dfCapped]] calls and the oracle CTEs) so the cap can be tuned in
    * exactly one place. */
  private[graft] val shingleDfFrac = 0.1
  private[graft] val shingleDfAbs = 2000L

  /** Shared oracle-SQL CTE chain for the shingle-Jaccard pipeline
    * (shingling → df-cap → sizes → pair intersection counts). ONE source
    * of truth interpolated into BOTH [[shingleJaccard]] and
    * [[nearDupFilter]]: the filter's Spark side delegates to
    * `shingleJaccard.build`, so its oracle must stay in lockstep with the
    * pair scan's — any pipeline tweak edits this block and both oracles
    * move together (a hand-copied second block desyncs silently and
    * breaks hash parity only for llm_neardup_filter). */
  private val shinglePairCtes =
    s"""sh0 AS (
      |  SELECT doc_id, sh FROM (
      |    ${shingleSelectSql("documents")}) t),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM sh0),
      |dfc AS (SELECT sh, COUNT(*) AS df FROM sh0 GROUP BY 1),
      |sh AS (
      |  SELECT t.doc_id, t.sh FROM sh0 t JOIN dfc USING (sh) CROSS JOIN nd
      |  WHERE dfc.df <= least($shingleDfFrac * nd.n_docs, $shingleDfAbs)),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  private val shingleJaccardThreshold = 0.5

  /** PPJoin/AllPairs prefix filtering (Bayardo et al. WWW'07, Xiao et al.
    * WWW'08 — public literature): under a GLOBAL total order over keys, two
    * sets with |A∩B| ≥ α must share an element inside the first
    * |x| − α + 1 elements of each sorted set. For Jaccard ≥ τ the overlap
    * bound is α(x) = ⌈τ·|x|⌉ (since |A∩B| ≥ τ·|A∪B| ≥ τ·max(|A|,|B|)), so
    * posting only each doc's (|x| − ⌈τ·|x|⌉ + 1)-prefix generates a
    * candidate SUPERSET of every qualifying pair at a fraction of the
    * postings volume. The order is (df ASC, key ASC) — rarest-first, the
    * AllPairs heuristic: hot keys fall out of prefixes, so the Σdf² of the
    * prefix postings shrinks superlinearly vs the full expansion
    * (PropertySpec proves the superset contract; the ε in the ceil guards
    * the fp product from landing one ulp ABOVE an exact integer — under-
    * rounding only lengthens the prefix, which stays correct).
    * Input must be distinct (doc_id, `key`) rows; output is the prefix
    * postings, same shape.
    */
  private[graft] def prefixPostings(postings: DataFrame, key: String,
                                    tau: Double): DataFrame = {
    val dfc = postings.groupBy(key).agg(count(lit(1)).as("df"))
    val prefLen = (size(col("a"))
      - ceil(lit(tau) * size(col("a")) - lit(1e-9)) + lit(1)).cast("int")
    postings.join(dfc, Seq(key))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col(key)))).as("a"))
      .select(col("doc_id"), explode(slice(col("a"), lit(1), prefLen)).as("p"))
      .select(col("doc_id"), col(s"p.$key").as(key))
  }

  /** Whole-corpus shingle-Jaccard pair set (id_a, id_b, jaccard ≥ θ) — the
    * pipeline behind [[shingleJaccard]], factored out so the STANDING pair
    * store ([[graft.sources.Stores.shinglePairs]]) builds exactly the rows
    * the raw-scan query computes: in production the pair set for a corpus
    * snapshot is computed once and consumed many times (filter decision,
    * transitive clusters, audits), so the downstream consumers probe the
    * store instead of re-running this postings expansion per query.
    *
    * The pair scan is ADAPTIVE (see [[shinglePairsFrom]]): dense bitset
    * popcount for closed vocabularies, prefix-filtered inverted index +
    * exact verify for open ones — both compute the identical exact pair
    * set, and the oracle SQL deliberately keeps the naive self-join
    * spelling so hash parity proves whichever path ran is lossless.
    */
  private[graft] def shinglePairsOf(s: SparkSession, dir: String): DataFrame =
    shinglePairsOfDocs(Tables.documents(s, dir))

  /** [[shinglePairsOf]] over an explicit documents relation (doc_id, text
    * …) — the entry the pair-store REFRESH spec drives with corpus splits.
    */
  private[graft] def shinglePairsOfDocs(docs: DataFrame): DataFrame =
    shinglePairsFrom(bigramShingles(docs))

  /** The NEW pair rows an APPEND batch of documents adds to a standing
    * pair set built over `exist`: batch×existing cross pairs (an
    * inverted-index join whose big side is touched once and never
    * self-joins — the [[incrementalDedup]] discipline) plus batch-internal
    * pairs. Shingle df-caps are evaluated on the UNION census, so when the
    * cap keep-set is stable across the append (no shingle crosses a cap
    * boundary — always true when caps are non-binding, the fixtures'
    * regime), standing ∪ delta is row-identical to a full rebuild over
    * exist ∪ batch; a cap-boundary crossing would change EXISTING pairs
    * too, which no append-only refresh can express — that is the
    * scheduled-rebuild case, same contract as [[graft.sources.Sinks
    * .refreshPqIndex]]'s frozen codebook.
    */
  private[graft] def shinglePairsDelta(exist: DataFrame, batch: DataFrame): DataFrame = {
    val shx0 = bigramShingles(exist).localCheckpoint()
    val shb0 = bigramShingles(batch).localCheckpoint()
    val all = shx0.unionByName(shb0)
    val nDocs = all.agg(countDistinct("doc_id").as("n_docs"))
    val keep = all.groupBy("sh").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= least(lit(shingleDfFrac) * col("n_docs"), lit(shingleDfAbs)))
      .select("sh")
    val shx = shx0.join(keep, Seq("sh"), "left_semi").localCheckpoint()
    val shb = shb0.join(keep, Seq("sh"), "left_semi").localCheckpoint()
    val szx = shx.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val szb = shb.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shb.select(col("doc_id").as("bid"), col("sh"))
      .join(shx.select(col("doc_id").as("xid"), col("sh")), Seq("sh"))
      // a batch doc can ALSO appear in `exist` when a folded-base replay
      // re-derives the existing set (the streaming doc-fold path,
      // graft.streaming.Streaming.foldDocSegments) — a doc must never
      // pair with its own folded copy
      .filter(col("bid") =!= col("xid"))
      .groupBy("bid", "xid").agg(count(lit(1)).as("c"))
    val jac = col("c").cast("double") / (col("bn") + col("xn") - col("c"))
    val cross = inter
      .join(szb.select(col("doc_id").as("bid"), col("n").as("bn")), Seq("bid"))
      .join(szx.select(col("doc_id").as("xid"), col("n").as("xn")), Seq("xid"))
      .filter(jac >= shingleJaccardThreshold)
      .select(least(col("bid"), col("xid")).as("id_a"),
        greatest(col("bid"), col("xid")).as("id_b"),
        round(jac, 4).as("jaccard"))
    cross.unionByName(prefixVerifiedPairs(shb, shingleJaccardThreshold))
  }

  /** Shard count for the standing doc-side shingle index
    * ([[shinglePairsDeltaSharded]]): postings are partitioned by
    * `pmod(hash(sh), shingleShards)` (and a by-doc copy by
    * `pmod(hash(doc_id), shingleShards)`), so a batch's delta join prunes
    * to the shards its own shingles (and overlap doc_ids) touch. At 100 TB
    * raise it so each shard stays a few GB — the constant tunes pruning
    * grain only, never answers. The count is BAKED into every persisted
    * component's partition values, so each component records it in a
    * `shards` meta file and the reader refuses mismatched components
    * ([[graft.streaming.Streaming]] `readDocShingleIndex`) — raising the
    * constant against a live sink rebuilds (seed marker delete + fold)
    * instead of silently half-pruning.
    */
  private[graft] val shingleShards = 16

  /** [[shinglePairsDelta]] served from a STANDING doc-side shingle index
    * instead of re-shingling the whole existing corpus per batch — the
    * continuous-ingest hot path ([[graft.streaming.Streaming
    * .startShinglePairsSink]]). Inputs are the store components the doc
    * fold maintains next to the raw docs:
    *
    *  - `existPostings` (doc_id, sh, shard): distinct-per-doc-copy shingle
    *    postings, partitioned by `shard = pmod(hash(sh), shingleShards)`
    *  - `existByDoc` (doc_id, sh, dshard): the same rows partitioned by
    *    `dshard = pmod(hash(doc_id), shingleShards)` — the sizes/overlap
    *    lookup face
    *  - `existCensus` (sh, df, shard): the per-shingle posting counts,
    *    summed over components, partitioned by the same `shard` key so
    *    the df probes below prune too
    *
    * Row-identical to `shinglePairsDelta(exist, batch)` where `exist` is
    * the postings' source docs anti-joined on the batch ids (spec-pinned):
    * the census is EXIST − overlap + batch by exact integer arithmetic,
    * the keep cap uses the same `least(frac·n, abs)` spelling on the same
    * distinct doc count, and every join/count/jaccard expression is the
    * delta's own. Per-batch cost: batch shingling + shard-pruned census
    * df probes for exactly the shingles that matter (the batch's own,
    * then the matched docs') + posting scans PRUNED to the batch's
    * touched shingle shards (and the matched docs' dshards for sizes) +
    * one slim distinct-id column pass for n_docs — never a corpus text
    * re-shingle, never an unpruned posting scan, never a vocabulary-wide
    * keep materialization. At 100 TB the postings would carry
    * dictionary-coded shingle ids from the census instead of strings;
    * the string spelling here keeps exactness trivially auditable.
    *
    * `nShards` is the shard count the COMPONENTS were written with (their
    * `shards` meta file) — every pruning expression here must use it, not
    * the current constant, or a raised constant silently half-prunes.
    */
  private[graft] def shinglePairsDeltaSharded(existPostings: DataFrame,
                                              existByDoc: DataFrame,
                                              existCensus: DataFrame,
                                              batch: DataFrame,
                                              nShards: Int = shingleShards): DataFrame = {
    val intEnc = org.apache.spark.sql.Encoders.scalaInt
    val shb0 = bigramShingles(batch).localCheckpoint()
    // ALL batch doc ids, not just shingled ones: a re-ingested doc whose
    // NEW text has no shingles must still evict its standing copy from
    // the census, the join, and n_docs — the unsharded caller anti-joins
    // existing docs on every batch id, and the equivalence spec pins a
    // shingleless re-ingest explicitly.
    val batchIds = batch.select("doc_id").distinct().localCheckpoint()
    // overlap: batch doc_ids with standing copies (a replay landing after
    // its segment was folded, or a re-ingested doc) — their standing
    // postings leave the census and the join, exactly like the ingest
    // path's anti-join of the existing DOCS on the batch ids. Pruned to
    // the batch ids' dshards.
    val dshards = batchIds
      .select(pmod(hash(col("doc_id")), lit(nShards)).as("d"))
      .distinct().as(intEnc).collect().toSeq
    val overlapCensus = existByDoc
      .filter(col("dshard").isin(dshards: _*))
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
      .groupBy("sh").agg(count(lit(1)).as("dfo"))
      .localCheckpoint()
    val batchCensus = shb0.groupBy("sh").agg(count(lit(1)).as("dfb"))
      .localCheckpoint()
    // n_docs: distinct ids over (exist ∖ batch) ∪ shingled-batch — the one
    // remaining whole-corpus touch, a single slim id column (the unsharded
    // delta re-reads and re-shingles every corpus BYTE instead). The
    // anti-join is LOAD-BEARING: a shingleless re-ingest whose standing
    // copy IS shingled leaves `exist` and nothing re-adds it (the union
    // side carries only docs holding ≥1 shingle, matching the unsharded
    // census domain).
    val nDocs = existByDoc.select("doc_id")
      .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
      .unionByName(shb0.select("doc_id"))
      .agg(countDistinct("doc_id")).head().getLong(0)
    val cap = least(lit(shingleDfFrac) * lit(nDocs), lit(shingleDfAbs))
    // Union-census df for exactly the shingles in `shs`: dfe (standing
    // minus overlapped copies) + dfb (batch copies), probed against the
    // shard-partitioned census — batch-bounded work plus a PRUNED census
    // read, replacing the r12-initial vocabulary-wide full_outer +
    // checkpoint whose cost tracked the corpus (measured 7.1 s at ×10 →
    // 24.7 s at ×30 per batch; see SCALE.md §6j-r12).
    // The census is SLICED first by a map-side broadcast semi-join on the
    // probe set — it never shuffles and is never itself broadcast (the
    // r12-initial probe joined shs against the filtered census directly,
    // which planned a census-wide exchange/broadcast per probe and DOUBLED
    // the ×10 batch cost); everything after the slice is probe-bounded.
    def dfOver(shs: DataFrame, pshards: Seq[Int]): DataFrame = {
      val slice = existCensus.filter(col("shard").isin(pshards: _*))
        .join(broadcast(shs), Seq("sh"), "left_semi")
        .select("sh", "df")
      shs.join(slice, Seq("sh"), "left_outer")
        .join(overlapCensus, Seq("sh"), "left_outer")
        .join(batchCensus, Seq("sh"), "left_outer")
        .select(col("sh"), (coalesce(col("df"), lit(0L))
          - coalesce(col("dfo"), lit(0L))
          + coalesce(col("dfb"), lit(0L))).as("dfu"))
    }
    // touched shingle shards of ALL batch shingles — ONE collect prunes
    // both the census probe and the existing-side posting scan (a
    // superset of the kept shingles' shards; only rows whose sh the batch
    // actually holds survive either join)
    val bshards = shb0
      .select(pmod(hash(col("sh")), lit(nShards)).as("p"))
      .distinct().as(intEnc).collect().toSeq
    val keepB = dfOver(shb0.select("sh").distinct().localCheckpoint(), bshards)
      .filter(col("dfu") > 0 && col("dfu") <= cap)
      .select("sh")
    val shb = shb0.join(keepB, Seq("sh"), "left_semi").localCheckpoint()
    val existPruned = existPostings
      .filter(col("shard").isin(bshards: _*))
      .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("xid"), col("sh"))
    val inter = shb.select(col("doc_id").as("bid"), col("sh"))
      .join(existPruned, Seq("sh"))
      .groupBy("bid", "xid").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // sizes of the MATCHED existing docs only: dshard-pruned by-doc
    // lookup, then the same union-census keep decision applied to THEIR
    // shingles (a doc's jaccard size is its kept-shingle count over the
    // WHOLE vocabulary, not just the batch's) — matched docs are
    // batch-bounded, so the size pass is too
    val matched = inter.select(col("xid").as("doc_id")).distinct().localCheckpoint()
    val mshards = matched
      .select(pmod(hash(col("doc_id")), lit(nShards)).as("d"))
      .distinct().as(intEnc).collect().toSeq
    val mshingles = existByDoc
      .filter(col("dshard").isin(mshards: _*))
      .join(broadcast(matched), Seq("doc_id"), "left_semi")
      .select("doc_id", "sh").localCheckpoint()
    val mshs = mshingles.select("sh").distinct().localCheckpoint()
    val mpshards = mshs
      .select(pmod(hash(col("sh")), lit(nShards)).as("p"))
      .distinct().as(intEnc).collect().toSeq
    val keepM = dfOver(mshs, mpshards)
      .filter(col("dfu") > 0 && col("dfu") <= cap)
      .select("sh")
    val szx = mshingles.join(keepM, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val szb = shb.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val jac = col("c").cast("double") / (col("bn") + col("xn") - col("c"))
    val cross = inter
      .join(szb.select(col("doc_id").as("bid"), col("n").as("bn")), Seq("bid"))
      .join(szx.select(col("doc_id").as("xid"), col("n").as("xn")), Seq("xid"))
      .filter(jac >= shingleJaccardThreshold)
      .select(least(col("bid"), col("xid")).as("id_a"),
        greatest(col("bid"), col("xid")).as("id_b"),
        round(jac, 4).as("jaccard"))
    cross.unionByName(prefixVerifiedPairs(shb, shingleJaccardThreshold))
  }

  /** [[shinglePairsOf]] over an arbitrary (doc_id, sh) shingle relation —
    * the shared core of the whole-corpus build and spec-level replays.
    *
    * ADAPTIVE by measured vocabulary size (one metadata-sized count on the
    * already-checkpointed capped postings): an OPEN vocabulary (Heaps'-law
    * text — most shingles rare) goes through the prefix-filtered inverted
    * index, where candidate volume tracks the rare-key df² mass; a CLOSED
    * vocabulary (≤ [[denseVocabMax]] distinct capped shingles — log
    * templates, enum-ish fields, saturated word soups) is the inverted
    * index's worst case (every key is hot, nearly all pairs co-occur:
    * measured 10.3 M co-occurring of 12.5 M possible on the 5 000-doc /
    * 931-shingle fixture), so it takes [[densePairs]] — exact bitset
    * popcount over a block grid, no candidate materialization at all.
    * Both paths compute the identical exact pair set.
    */
  private[graft] def shinglePairsFrom(sh0raw: DataFrame): DataFrame = {
    // localCheckpoint before fan-out, as in [[jaccardPairs]]: the
    // shingling pipeline is consumed by the vocabulary census and the
    // pair scan and must not re-run per consumer.
    val sh0 = sh0raw.localCheckpoint()
    val nDocs = sh0.agg(countDistinct("doc_id").as("n_docs"))
    // SURVIVING vocabulary census (dfCapped's keep-list, kept as a DF
    // WITH its dfs — they also drive the path decision below):
    // vocabulary-sized, checkpointed because three consumers read it
    // (the dense probe, the volume estimate, the keep semi-join)
    val census = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= least(lit(shingleDfFrac) * col("n_docs"), lit(shingleDfAbs)))
      .select("sh", "df")
      .localCheckpoint()
    // limit(denseVocabMax+1) bounds the driver collect: we only need to
    // know WHETHER the vocabulary exceeds the dense bound, never to hold
    // an open vocabulary on the driver
    val vocabProbe = census.select("sh").limit(denseVocabMax.toInt + 1)
      .orderBy("sh").as(org.apache.spark.sql.Encoders.STRING).collect()
    if (vocabProbe.length <= denseVocabMax)
      densePairs(sh0, vocabProbe, shingleJaccardThreshold)
    else {
      // open vocabulary: materialize the capped postings once (they fan
      // out to the doc-set relation and the pair expansion)
      val sh = sh0.join(census.select("sh"), Seq("sh"), "left_semi").localCheckpoint()
      // Route by the census-derived co-occurrence volume — ONE
      // vocabulary-sized aggregate, no corpus pass: P = Σ C(df, 2) is the
      // pair volume ANY inverted-index method must touch, and N = Σ df is
      // the capped posting-row count. When P ≫ N (hot keys — a sharded
      // closed vocabulary, enum-ish fields), the prefix+verify path is
      // catastrophic: its exact verify joins each of the ~P candidates to
      // TWO full per-doc shingle arrays, shuffling P × KB-sized rows (the
      // first ×100 soak attempt filled 240 GB of local disk exactly this
      // way — SCALE.md §6i). The expansion path touches the same P pairs
      // as bare 16-byte id rows into a partially-aggregated count, so it
      // is the safe Ω(P) spelling. When P ≈ N (true Heaps-law open
      // vocabulary — most dfs tiny), candidates are corpus-linear and the
      // prefix filter + array verify is the measured-cheaper shape. The
      // 16× threshold is the avg-df grain where the array-carry starts to
      // dominate the 16-byte pair rows; both paths are exact, so the
      // constant tunes cost only, never answers.
      val Array(p, n) = census
        .agg(sum(expr("df * (df - 1) / 2")), sum("df"))
        .head().toSeq.map(v => String.valueOf(v).toDouble).toArray
      if (p > 16.0 * n) expandedPairs(sh, shingleJaccardThreshold)
      else prefixVerifiedPairs(sh, shingleJaccardThreshold)
    }
  }

  /** Hot-key exact Jaccard pair scan WITHOUT candidate arrays: the classic
    * inverted-index expansion — [[pairCounts]] over the FULL df-capped
    * postings yields exact per-pair intersection counts (a pair sharing
    * zero shingles has jaccard 0 < τ and is correctly absent), joined to
    * per-doc set sizes for the jaccard. Every moved row is a fixed-width
    * id/count tuple, so shuffle volume is 16·P bytes where P = Σ C(df, 2)
    * — the minimum any exact inverted-index method pays — instead of the
    * verify path's P × serialized-doc-set bytes. Identical output contract
    * to [[densePairs]] / [[prefixVerifiedPairs]] (LlmOpsSpec pins all
    * three equal).
    */
  private[graft] def expandedPairs(postings: DataFrame, tau: Double): DataFrame = {
    val sz = postings.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val jac = col("c").cast("double") / (col("na") + col("nb") - col("c"))
    pairCounts(postings, "sh")
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(jac >= tau)
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
  }

  /** Open-vocabulary pair scan: prefix-filtered candidate generation +
    * exact array-intersect verify. `postings` must be distinct, df-capped
    * (doc_id, sh) rows, already materialized (it fans out to three
    * consumers).
    */
  private[graft] def prefixVerifiedPairs(postings: DataFrame, tau: Double): DataFrame = {
    // full per-doc shingle sets (sorted arrays) for the exact verify;
    // checkpointed because both join sides of the verify consume it
    val docSets = postings.groupBy("doc_id")
      .agg(sort_array(collect_list("sh")).as("shs"), count(lit(1)).as("n"))
      .localCheckpoint()
    val cand = pairCounts(prefixPostings(postings, "sh", tau), "sh")
      .select("id_a", "id_b")
    verifyJaccardPairs(cand, docSets, tau)
  }

  /** Vocabulary-size bound for [[densePairs]]: 4096 bits = 64 longs =
    * 512 bytes per doc mask — small enough that a block's masks sit in a
    * task comfortably, large enough to catch every closed-vocab corpus the
    * inverted index degenerates on.
    */
  private[graft] val denseVocabMax = 4096L

  /** Closed-vocabulary exact Jaccard pair scan: each doc's capped shingle
    * set becomes a fixed-width BITMASK over the (≤ [[denseVocabMax]])-term
    * vocabulary, and a block-grid self-join evaluates every unordered doc
    * pair exactly once with a popcount(AND) kernel — ~`words` long-ops per
    * pair, all inside whole-stage codegen, versus a hash intersection over
    * string arrays. No candidate pair set is ever materialized or
    * shuffled: only the ≥ τ survivors leave the join stage (256 rows where
    * the inverted-index formulation aggregated 10.3 M candidate rows).
    *
    * Scale: the grid shuffles each mask `blocks` times (n·B rows of
    * ~0.5 KB — for 10⁶ docs × 32 blocks ≈ 16 GB spread over the cluster),
    * and per-cell work is (n/B)² kernels, embarrassingly parallel across
    * the B(B+1)/2 cells. On a closed vocabulary ANY exact method is
    * Ω(co-occurring pairs) ≈ Ω(n²) — this path makes the per-pair constant
    * ~25 long-ops instead of a shuffled+aggregated candidate row. The
    * explicit hash-repartition on `cell` pins the join's parallelism: the
    * grid's shuffle is byte-light, so AQE would otherwise coalesce the
    * whole O(n²) kernel stage into a couple of tasks.
    */
  private[graft] def densePairs(postings: DataFrame, vocabSorted: Array[String],
                                tau: Double, blocks: Int = 32): DataFrame = {
    val spark = postings.sparkSession
    if (vocabSorted.isEmpty)
      // no shingle survived the cap → no pair can share one
      return postings.select(col("doc_id").as("id_a"), col("doc_id").as("id_b"),
        lit(0.0).as("jaccard")).filter(lit(false))
    val words = (vocabSorted.length + 63) / 64
    val n = spark.sessionState.conf.numShufflePartitions
    // dense term ids from the driver-side (≤ denseVocabMax) sorted
    // vocabulary; the inner join below applies the df-cap (capped-out
    // shingles simply miss) and assigns ids in the same pass
    import spark.implicits._
    val vocab = broadcast(
      vocabSorted.zipWithIndex.toSeq.toDF("sh", "vid"))
    // the mask builds as `words` bit_or aggregation columns — a fully
    // codegen'd hash aggregate (no collect_list array, no interpreted
    // set-bit lambda), one long per 64 vocabulary terms
    val wordAggs = (0 until words).map(w =>
      expr(s"bit_or(IF(vid div 64 = $w, shiftleft(1L, vid % 64), 0L))").as(s"m$w"))
    val masks = postings.join(vocab, Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), wordAggs: _*)
      .select(col("doc_id"), col("n"),
        array((0 until words).map(w => col(s"m$w")): _*).as("mask"),
        pmod(col("doc_id"), lit(blocks)).cast("int").as("blk"))
      .localCheckpoint() // two consumers: both grid sides
    // cell (i, j), i ≤ j: a doc in block p sits on the LEFT of cells
    // (p, j ≥ p) and on the RIGHT of cells (i ≤ p, p), so an unordered
    // cross-block pair meets in exactly one cell with one orientation;
    // same-block pairs meet in (p, p) both ways and the doc_id< filter
    // keeps one.
    val lhs = masks.withColumn("cell",
      explode(expr(s"transform(sequence(blk, ${blocks - 1}), j -> blk * $blocks + j)")))
    val rhs = masks.withColumn("cell",
      explode(expr(s"transform(sequence(0, blk), i -> i * $blocks + blk)")))
    // the popcount kernel UNROLLED over the word count (known at plan
    // time): higher-order functions (zip_with/aggregate) evaluate their
    // lambdas interpreted, outside whole-stage codegen — measured ~2 s of
    // the whole query on 12.5 M pairs — while this flat sum of
    // bit_count(x & y) terms compiles into the generated join loop
    val c = expr((0 until words)
      .map(w => s"bit_count(a.mask[$w] & b.mask[$w])")
      .mkString("CAST(", " + ", " AS BIGINT)"))
    val jac = col("c").cast("double") / (col("a.n") + col("b.n") - col("c"))
    val cond = col("a.cell") === col("b.cell") &&
      (col("a.blk") =!= col("b.blk") || col("a.doc_id") < col("b.doc_id"))
    // explicit hash-repartition + shuffled hash join: the repartition is
    // pinned at `n` partitions because the grid's shuffle is byte-light
    // and AQE would otherwise coalesce the whole O(n²) kernel stage into
    // a couple of tasks; shuffle_hash (not SMJ) because cells don't need
    // sorting. (A broadcast grid side was tried and measured 10× SLOWER
    // than this shape on 12.5 M pairs — the BHJ probe path loses the
    // tight codegen'd SHJ loop — so the join is shuffled even when the
    // replicated side would fit a broadcast.)
    // MaterializeOnce on the popcount sum (r12, guide §4.4): the jac ≥ τ
    // filter otherwise pushes INTO the join as a residual condition with
    // `c` inlined twice (numerator + denominator — the before-plan's join
    // condition carries the 15-term bit_count sum twice) and the output
    // projection re-derives it a third time; the barrier pins the kernel
    // to ONE evaluation per candidate pair, the query's hot loop.
    lhs.repartition(n, col("cell")).as("a")
      .join(rhs.repartition(n, col("cell")).hint("shuffle_hash").as("b"), cond)
      .withColumn("c", graft.functions.MaterializeOnce(c))
      .filter(jac >= tau)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"),
        round(jac, 4).as("jaccard"))
  }

  /** Exact verify of candidate (id_a, id_b) pairs against full per-doc
    * sorted shingle arrays (`docSets`: doc_id, shs, n): true intersection
    * via `array_intersect`, Jaccard ≥ τ filter, ROUND(…, 4) — the same
    * output contract as the unfiltered expansion.
    */
  private[graft] def verifyJaccardPairs(cand: DataFrame, docSets: DataFrame,
                                        tau: Double): DataFrame = {
    val c = size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("long")
    val jac = col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c"))
    cand
      .join(docSets.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(docSets.as("sb"), col("id_b") === col("sb.doc_id"))
      // MaterializeOnce (r12, guide §4.4): without the barrier the jac ≥ τ
      // filter pushes into the second join as a residual with the
      // array_intersect inlined twice, re-intersecting both shingle arrays
      // per candidate — the verify path's whole cost is this kernel.
      .withColumn("c", graft.functions.MaterializeOnce(c))
      .filter(jac >= tau)
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
  }

  val shingleJaccard = Q(
    "llm_shingle_jaccard",
    s"""WITH $shinglePairCtes
      |SELECT id_a, id_b,
      |  ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4) AS jaccard
      |FROM inter
      |JOIN sz sa ON inter.id_a = sa.doc_id
      |JOIN sz sb ON inter.id_b = sb.doc_id
      |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $shingleJaccardThreshold
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    // kept raw-scan deliberately: this query IS the pair store's build
    // proof (the store-served consumers below share its CTE chain)
    shinglePairsOf(s, dir).orderBy("id_a", "id_b")
  }

  /** D2 applied: the near-dup pair set turned into the filter decision a
    * curation pipeline actually executes — drop every doc that has a
    * lower-id near-duplicate (the same deterministic keeper rule as
    * [[semDedup]], direct pairs rather than transitive closure so the rule
    * stays one SQL statement; [[nearDupClusters]] is the transitive
    * variant), reported as per-source survival stats.
    *
    * Served from the STANDING pair store
    * ([[graft.sources.Stores.shinglePairs]]): the postings expansion ran
    * ONCE at store-build time; this query reads the metadata-sized pair
    * rows, derives the drop set, and joins it onto one cheap documents
    * pass (doc_id + source only — no tokenize, no explode) for the
    * survival stats. The oracle still recomputes the pairs from raw text —
    * the standing-store contract is exactly that the two agree.
    */
  val nearDupFilter = Q(
    "llm_neardup_filter",
    s"""WITH $shinglePairCtes,
      |drops AS (
      |  SELECT DISTINCT id_b AS doc_id FROM inter
      |  JOIN sz sa ON inter.id_a = sa.doc_id
      |  JOIN sz sb ON inter.id_b = sb.doc_id
      |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $shingleJaccardThreshold)
      |SELECT d.source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  ROUND(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
      |    / COUNT(*), 4) AS drop_rate
      |FROM documents d LEFT JOIN drops dr ON d.doc_id = dr.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
    val drops = graft.sources.Stores.readCached(s, graft.sources.Stores.shinglePairs(s, dir))
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("dropped", lit(1))
    Tables.documents(s, dir)
      .join(drops, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("dropped"), lit(0))).cast("bigint").as("n_dropped"))
      .withColumn("drop_rate",
        round(col("n_dropped") * lit(1.0) / col("n_docs"), 4))
      .orderBy("source")
  }

  /** D3: brute-force cosine top-k — the exact baseline ANN answers are
    * measured against. The 100-row query side is broadcast (plan shows
    * BroadcastNestedLoopJoin over the corpus scan), so the 2000-vector —
    * or 2-billion-vector — corpus side never shuffles; per-row distance
    * math runs in the codegen'd [[graft.functions.CosineSimilarity]]
    * kernel. Ordering is on the ROUNDED similarity + vec_id so Spark and
    * DuckDB break near-ties identically.
    */
  val knnCosine = Q(
    "llm_knn_cosine",
    """SELECT q_id, vec_id, cos_sim + 0 AS cos_sim, rn FROM (
      |  SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
      |    ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      |      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
      |       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos_sim,
      |    CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |      ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      |        / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
      |         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) DESC,
      |      b.vec_id) AS INTEGER) AS rn
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < 100 AND b.vec_id <> a.vec_id) t
      |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cos = round(vectors.cosineSim(col("q_emb"), col("embedding")), 4)
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
    // `+ 0` on the dumped cos_sim: a rank-k similarity that rounds to zero
    // from below would print -0 in DuckDB and 0 here (sign-of-zero, see
    // func_array.first_val); comparisons are unaffected (-0.0 == 0.0) so
    // the ranking itself is identical either way.
    broadcast(q)
      .join(e, col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", cos)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id"), (col("cos_sim") + lit(0.0)).as("cos_sim"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** D3/D9 (contrastive-training data prep): hard-negative mining — for
    * each anchor, the top-5 most-similar vectors carrying a DIFFERENT
    * label. These near-miss negatives are what contrastive/embedding
    * training actually wants in a batch (easy negatives teach nothing;
    * InfoNCE gradients concentrate on the hardest ones), and mining them is
    * a corpus-scale join problem, not a model problem. Same plan discipline
    * as [[knnCosine]]: the 100-row anchor side broadcasts over the corpus
    * scan, the label inequality rides the join condition, the codegen'd
    * cosine kernel scores pairs, and per-anchor top-5 is a window over the
    * anchor key. At 100 TB the anchor set is the batch being mined for (KBs
    * — always broadcast-sized) and the corpus side never shuffles; an ANN
    * index ([[annIvfPq]]) slots in as the candidate generator when even one
    * scan per batch is too much.
    */
  val hardNegatives = Q(
    "llm_hard_negatives",
    """SELECT q_id, vec_id, neg_label, cos_sim + 0 AS cos_sim, rn FROM (
      |  SELECT a.vec_id AS q_id, b.vec_id AS vec_id, b.label AS neg_label,
      |    ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      |      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
      |       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos_sim,
      |    CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |      ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      |        / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
      |         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) DESC,
      |      b.vec_id) AS INTEGER) AS rn
      |  FROM embeddings a JOIN embeddings b
      |    ON a.vec_id < 100 AND b.label <> a.label) t
      |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val cos = round(vectors.cosineSim(col("q_emb"), col("embedding")), 4)
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
    broadcast(q)
      .join(e, col("label") =!= col("q_label"))
      .withColumn("cos_sim", cos)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"), col("label").as("neg_label"),
        (col("cos_sim") + lit(0.0)).as("cos_sim"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** D3 scale path (no oracle — bucket ids are engine-local): LSH-bucketed
    * ANN. Vectors are hashed to a signed-random-projection bucket; the
    * candidate join requires bucket equality, cutting the pair count by
    * ~2^bits before any cosine is computed. Recall vs the brute-force
    * baseline is asserted in LlmOpsSpec.
    */
  val annLsh = Q.noOracle("llm_ann_lsh") { (s, dir) =>
    // Table/bit sizing: collision prob per bit is 1 − θ/π (Charikar), so
    // for the weakly-correlated synthetic vectors (neighbor cosine ≈ 0.35,
    // θ ≈ 69°) a 4-bit band keeps p ≈ 0.62⁴ ≈ 0.15 per table and three
    // OR'd tables reach useful recall while scanning ~⅕ of the corpus. On
    // real embedding corpora neighbors sit at cosine ≥ 0.8 (θ ≤ 37°,
    // p_bit ≈ 0.8) and the same layout gives ≥ 0.9 recall.
    val tables = Seq(0L, 1L, 2L)
    val bits = 4
    val e = Tables.embeddings(s, dir)
    // NOT checkpointed (r12, measured): the bucketed frame fans out to the
    // query slice + one probe join per table, but it CARRIES THE VECTORS —
    // materializing it trades cheap columnar re-scans for a row-format
    // corpus copy (local[4] A/B: 0.46 → 0.99 s with a checkpoint), and at
    // 100 TB a corpus-sized uncompressed replica is strictly worse than
    // re-reading parquet. Contrast the minhash SIGNATURE table, which IS
    // checkpointed because it is a reduction, not the corpus.
    val withBuckets = e.select(
      col("vec_id") +: col("embedding") +:
      tables.map(t => vectors.srpBucket(col("embedding"), bits, t * 0x51ed2701L).as(s"b$t")): _*)
    val q = withBuckets.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id") +: col("embedding").as("q_emb") +:
        tables.map(t => col(s"b$t").as(s"qb$t")): _*)
    // Candidate iff the pair collides in ANY table (multi-table OR-probe).
    val candidates = tables.map { t =>
      broadcast(q).join(withBuckets, col(s"qb$t") === col(s"b$t"))
        .select(col("q_id"), col("q_emb"), col("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
      .filter(col("vec_id") =!= col("q_id"))
      .dropDuplicates("q_id", "vec_id")
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
    candidates
      .withColumn("cos_sim", round(vectors.cosineSim(col("q_emb"), col("embedding")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("q_id", "vec_id", "cos_sim", "rn")
      .orderBy("q_id", "rn")
  }

  /** Spec-level recall oracle for [[nearDupCosine]] — NOT registered: the
    * exact all-pairs cosine ≥ 0.4 scan, via the block-grid self-join.
    * Vectors land in B id-hash blocks; every unordered block pair (i ≤ j)
    * is a grid cell, each vector replicates into the B cells it
    * participates in, and the pair scan is an equi-join on the (i, j) cell
    * key — a shuffled hash/sort-merge join, never a corpus×corpus
    * broadcast nested-loop, with ≤ 2n/B vectors per task. The grid
    * distributes the n²/2 perfectly, but the PAIR COUNT itself is
    * inherent to exact semantics: at 100× the corpus this computation is
    * uncompletable no matter how it is planned, which is why the
    * registered query is the banded form and this exact form exists only
    * as the fixture-scale ground truth that LlmOpsSpec measures the
    * banded recall (and the SemDeDup drop subset) against.
    */
  def exactCosinePairs(s: SparkSession, dir: String): DataFrame = {
    val numBlocks = 8
    val e = Tables.embeddings(s, dir)
    // a-side: a vector in block p serves cells (p, j) for j ≥ p;
    // b-side: a vector in block q serves cells (i, q) for i ≤ q. A pair
    // with blocks (p, q), p ≤ q, therefore meets in exactly one cell, with
    // the a-side in the lower block — each unordered pair is generated
    // once, no dropDuplicates needed. Cross-block ids aren't ordered by
    // block, so the output re-orients with least/greatest.
    val aSide = e
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        pmod(col("vec_id"), lit(numBlocks)).as("blk_a"))
      .withColumn("cj", explode(sequence(col("blk_a"), lit(numBlocks - 1))))
      .withColumnRenamed("blk_a", "ci")
    val bSide = e
      .select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        pmod(col("vec_id"), lit(numBlocks)).as("blk_b"))
      .withColumn("ci", explode(sequence(lit(0), col("blk_b"))))
      .withColumnRenamed("blk_b", "cj")
    val cos = vectors.cosineSim(col("emb_a"), col("emb_b"))
    aSide
      .join(bSide, Seq("ci", "cj"))
      .filter(col("id_a") =!= col("id_b") &&
        (col("ci") =!= col("cj") || col("id_a") < col("id_b")))
      // MaterializeOnce (r12, guide §4.4): one cosine evaluation per pair —
      // this exact scan IS n²/2 kernels, so doubling them doubled the job
      .withColumn("cs", graft.functions.MaterializeOnce(cos))
      .filter(col("cs") >= 0.4)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(col("cs"), 4).as("cos_sim"))
      .orderBy("id_a", "id_b")
  }

  /** Number of band tables / sign bits per band for [[nearDupCosine]].
    * Bands hash on the SIGN of fixed embedding dimensions (table t owns
    * dims t·b .. t·b+b−1), so both engines derive identical band ids from
    * the data alone — deterministic, hash-green, no engine-local seeds. */
  private val ndBandTables = 6
  private val ndBandBits = 4

  /** D2/D3 (embedding near-dup), the AT-SCALE contract: candidate pairs
    * must agree on all `ndBandBits` sign bits of at least one of the
    * `ndBandTables` band tables (OR-probe), then verify with exact cosine
    * ≥ 0.4 — banded LSH with a deterministic, data-derived hash. This is
    * the DECLARED semantics of the registered query, chosen so that every
    * query in the registry completes at 100× the corpus: candidate volume
    * is the banded fraction of n²/2 (0.32 on this near-orthogonal fixture
    * — θ ≈ 66° is LSH's worst regime; real embedding corpora near-dup at
    * cosine ≥ 0.9, where the same layout passes ≲ 2⁻⁴ per table), and
    * tables × bits are the scale knobs (bits grow with log n). Recall vs
    * the exact scan ([[exactCosinePairs]], fixture-bounded) is pinned
    * numerically in LlmOpsSpec (0.71 at sf0.001, floor 0.6).
    *
    * Plan shape: within each band the same one-cell-per-unordered-pair
    * block grid as [[exactCosinePairs]] distributes residual volume, so
    * the join key is (table, band, ci, cj) — a single shuffled equi-join,
    * never corpus×corpus, with hot-band work split across B(B+1)/2 cells.
    * A pair colliding in k tables surfaces k times and is deduplicated
    * after the threshold filter. The similarity runs in the codegen'd
    * cosine kernel; the oracle spells cosine as dot/(|a||b|) exactly like
    * the kernel so both engines evaluate the same double arithmetic
    * before the ROUND, and derives the identical band ids from CASE'd
    * sign tests on the same dimensions.
    */
  /** The banded candidate generator behind [[nearDupCosine]], with the
    * scale knobs as parameters: `tables` OR-probe band tables of `bits`
    * sign bits each (dims t·bits..t·bits+bits−1 — requires tables·bits ≤
    * embedding dim), block-grid distributed over `numBlocks`. Returns the
    * PRE-verification candidate rows (a pair colliding in k tables
    * appears k times — that multiplicity IS the work the verify step
    * pays), so the ×100 soak can measure candidate volume directly as
    * `bits` grows with log n. The registered query applies the cosine
    * threshold + dedup on top with the fixture constants.
    */
  private[graft] def bandedCandidates(e: DataFrame, tables: Int, bits: Int,
                                      numBlocks: Int): DataFrame = {
    // out-of-range element_at returns null and the sign test silently
    // degrades to constant-0 bits (bands collide, candidates explode
    // quadratically while looking like an algorithmic property) — fail
    // loudly instead. embedDim is the engine's fixture contract, the same
    // one the PQ geometry (pqM·pqDsub) builds on.
    require(tables * bits <= embedDim,
      s"bandedCandidates: tables($tables) * bits($bits) exceeds the $embedDim-dim embedding")
    def bandExpr(t: Int): Column =
      (0 until bits).map { i =>
        when(element_at(col("embedding"), t * bits + i + 1) >= 0,
          lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    // NOT checkpointed (r12, measured): both grid sides consume the banded
    // frame, but it carries the vectors — see the annLsh note; the band
    // projection is sign tests, far cheaper than materializing the corpus.
    val withBands = e.select(
      col("vec_id"), col("embedding"),
      array((0 until tables).map(bandExpr): _*).as("bands"),
      pmod(col("vec_id"), lit(numBlocks)).as("blk"))
    val aSide = withBands
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("blk").as("ci"), posexplode(col("bands")).as(Seq("t", "band")))
      .withColumn("cj", explode(sequence(col("ci"), lit(numBlocks - 1))))
    val bSide = withBands
      .select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("blk").as("cj"), posexplode(col("bands")).as(Seq("t", "band")))
      .withColumn("ci", explode(sequence(lit(0), col("cj"))))
    aSide
      .join(bSide, Seq("t", "band", "ci", "cj"))
      .filter(col("id_a") =!= col("id_b") &&
        (col("ci") =!= col("cj") || col("id_a") < col("id_b")))
  }

  val nearDupCosine = Q(
    "llm_neardup_cosine", {
      val bandSql = (0 until ndBandTables).map { t =>
        val bits = (0 until ndBandBits).map { i =>
          s"(CASE WHEN embedding[${t * ndBandBits + i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)"
        }.mkString(" + ")
        s"$bits AS band$t"
      }.mkString(",\n    ")
      val orProbe = (0 until ndBandTables)
        .map(t => s"a.band$t = b.band$t").mkString(" OR ")
      s"""WITH v AS (
         |  SELECT vec_id, embedding,
         |    $bandSql
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         |    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         |     * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos_sim
         |FROM v a JOIN v b ON a.vec_id < b.vec_id AND ($orProbe)
         |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         |    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         |     * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, dir) =>
    // Band id of table t = the b sign bits of dims t·b..t·b+b−1 packed
    // little-endian (element_at is 1-indexed, matching DuckDB's lists);
    // posexplode fans each vector into its (table, band) probes and the
    // block grid is a second generator on top — see [[bandedCandidates]].
    bandedPairs(Tables.embeddings(s, dir), ndBandTables, ndBandBits,
      numBlocks = 4, threshold = 0.4)
  }

  /** Full banded near-dup pipeline with the knobs exposed (the registered
    * query is this at the fixture constants): [[bandedCandidates]] →
    * exact-cosine verification → dedup of multi-table collisions.
    */
  private[graft] def bandedPairs(e: DataFrame, tables: Int, bits: Int,
                                 numBlocks: Int, threshold: Double): DataFrame = {
    val cos = vectors.cosineSim(col("emb_a"), col("emb_b"))
    bandedCandidates(e, tables, bits, numBlocks)
      // MaterializeOnce (r12, guide §4.4): otherwise the threshold filter
      // and the rounded output each evaluate the cosine kernel — the
      // verify stage's whole cost — per candidate pair
      .withColumn("cs", graft.functions.MaterializeOnce(cos))
      .filter(col("cs") >= threshold)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(col("cs"), 4).as("cos_sim"))
      // a pair can collide in up to `tables` tables; rounded cos_sim is
      // a pure function of the pair, so the 3-column dedup is deterministic
      .dropDuplicates("id_a", "id_b", "cos_sim")
      .orderBy("id_a", "id_b")
  }

  /** D3 scale path #2 (no oracle — cell ids are engine-local): IVF-style
    * ANN. Coarse cells come from signed-random-projection buckets; each
    * cell's centroid is the element-wise mean of its members (the "train"
    * step — one linear pass, no iterative k-means needed for a coarse
    * quantizer). A query probes only the `nprobe` cells whose centroids
    * score highest, then runs exact cosine inside them — the inverted-file
    * structure that keeps ANN sub-linear when the corpus outgrows LSH
    * OR-probing. Recall vs brute force is asserted in LlmOpsSpec.
    *
    * Scale note: the centroid build shuffles (cell, dim) partial sums —
    * n·d rows of partial aggregation, fully map-side combined; at 100 TB
    * the centroids would be trained on a sample and broadcast, which is
    * exactly what this plan does (the centroid side is ≤ 2^bits rows).
    */
  val annIvf = Q.noOracle("llm_ann_ivf") { (s, dir) =>
    val bits = 4       // 16 coarse cells
    val nprobe = 6
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        vectors.srpBucket(col("embedding"), bits, 0xc0ffeeL).as("cell"))
    // Train: element-wise mean per cell (posexplode → avg → re-assemble).
    val centroids = e
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cell", "pos").agg(avg("v").as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m").cast("float")).as("centroid"))
    // Probe: each query ranks cells by centroid cosine, keeps nprobe.
    val q = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cellRank = Window.partitionBy("q_id").orderBy(col("cell_sim").desc, col("cell").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cell_sim", vectors.cosineSim(col("q_emb"), col("centroid")))
      .withColumn("cell_rn", row_number().over(cellRank))
      .filter(col("cell_rn") <= nprobe)
      .select("q_id", "q_emb", "cell")
    // Search: exact cosine inside the probed cells only.
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
    broadcast(probed)
      .join(e, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", round(vectors.cosineSim(col("q_emb"), col("embedding")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("q_id", "vec_id", "cos_sim", "rn")
      .orderBy("q_id", "rn")
  }

  /** Squared L2 distance between two equal-length double arrays, in pure
    * Column algebra (zip_with + aggregate) — the PQ building block.
    */
  private def l2sqCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** PQ geometry for [[annIvfPq]]: 64-dim vectors → `pqM` subspaces of
    * `pqDsub` dims, `pqKs` centroids per subspace → an `pqM`-byte code per
    * vector (32× smaller than the float32 original). Shared with the spec.
    */
  val pqM = 8
  val pqDsub = 8
  /** The fixture embedding dimensionality (= pqM · pqDsub); the banded
    * sign-bit layout and PQ geometry both budget against it. */
  val embedDim = 64
  val pqKs = 16
  private val pqRounds = 2
  private val pqShortlist = 100
  /** Coarse-quantizer geometry for the IVF half of the index: every vector
    * is assigned to its [[pqAssign]] nearest of [[pqCells]] k-means cells
    * at BUILD time, and a query scans only its [[pqNprobe]] best cells —
    * the FAISS IVF-PQ inverted-file structure that keeps the code-table
    * scan sub-linear (flat PQ compresses the corpus 32× but still scans
    * ALL of it per query batch; at ~1.5 B vectors/PB that is the
    * difference between milliseconds and minutes). `pqAssign = 2` is
    * SPANN-style boundary replication (Chen et al. 2021): a vector near a
    * Voronoi boundary is indexed under both adjacent cells, which lifts
    * the cell-stage recall ceiling at nprobe=6/16 from a measured 0.74
    * (single assignment — under the 0.75 floor) to 0.89 on the fixture,
    * for 2× code rows (the store stays 16× smaller than the floats) and
    * an unchanged ~6/16 scan fraction.
    */
  val pqCells = 16
  val pqNprobe = 6
  val pqAssign = 2
  private val pqCoarseRounds = 4
  /** Training budget: Lloyd rounds see at most this many vectors — the
    * md5-ranked deterministic sample, FAISS's max-points-per-centroid
    * discipline (a pqKs-centroid fit saturates at a few hundred points per
    * centroid; training on more refines centroids below the quantization
    * error the code assignment makes anyway). The cap is what licenses the
    * driver-side fit in [[pqTrainEncode]]: the training slice is bounded
    * BY CONSTRUCTION no matter the corpus size, while the ENCODE is always
    * a full-corpus distributed pass.
    */
  private[graft] val pqTrainBudget = 1024

  /** D3 scale path #3 (no oracle — codebooks are engine-local): product
    * quantization, the representation EVERY billion-vector deployment
    * (FAISS IVF-PQ et al.) runs on once even int8 vectors stop fitting.
    * Each vector is cut into [[pqM]] subvectors; each subspace gets its own
    * [[pqKs]]-centroid codebook (2 Lloyd rounds, deterministic first-k
    * seeding — the [[kmeans]] convention); a vector is then just its
    * per-subspace nearest-centroid codes: 8 small ints instead of 64
    * floats. Queries score candidates by Asymmetric Distance Computation:
    * one ‖q_sub − c‖² table per (query, subspace, code) — 100 × 8 × 16
    * entries, built once and broadcast — and a candidate's approximate
    * distance is [[pqM]] table lookups, no float math per pair at all.
    * The ADC top-[[pqShortlist]] shortlist is then RE-RANKED with exact
    * cosine against the original vectors — the FAISS refine step, which
    * pays full-precision math only on queries × shortlist rows and lifts
    * recall@10 from 0.27 (raw ADC on this near-isotropic fixture) to
    * 0.82 (top-100 shortlist; top-50 gave 0.64 — the re-rank is so cheap
    * that doubling the shortlist is pure recall). Vectors are
    * unit-normalized first so L2² = 2 − 2·cos and the
    * PQ ranking approximates the brute-force COSINE ranking
    * ([[knnCosine]]) — recall@10 vs that exact baseline is pinned
    * numerically in LlmOpsSpec.
    *
    * Scale shape: codebook + coarse-centroid training and the one-time
    * encode are the INDEX BUILD — the only shuffles, carrying (vec_id,
    * cell, codes) rows, never vectors, and in production persisted like
    * any index. The query path is the part that must stay cheap at
    * 100 TB and now is on BOTH axes: the ADC tables ride in as a 100-row
    * broadcast (the [[knnCosine]] query-side discipline), and the code
    * scan itself is PRUNED by the IVF stage to the request's probed
    * cells — ~nprobe/pqCells of the compressed corpus, not all of it
    * (flat PQ's full scan was this operator's one corpus-linear edge;
    * FAISS-style IVF-PQ exists precisely to remove it). 10× more queries
    * changes the broadcast and the probed-cell union, not the corpus.
    */
  val annIvfPq = Q.noOracle("llm_ann_ivfpq") { (s, dir) =>
    val (cents, cb, codes) = pqTrainEncode(s, dir)
    // localCheckpoint: the encoded index is a REDUCTION (pqM ints + a cell
    // per vector — 32× below the embeddings; exactly the rows the store
    // persists), and materializing it separates the build stage from the
    // serve stage the way the production lifecycle does. Fused, the
    // non-codegen encode projection drags the whole ADC probe join into
    // one row-mode stage (measured 6.1 vs 3.8 s at sf0.1 local[32]).
    pqSearch(s, dir, cents, cb, codes.localCheckpoint())
  }

  /** The PERSISTED-index lifecycle behind [[annIvfPq]]: the codebook +
    * encoded corpus are trained/written ONCE (`Sinks.writePqIndex` via the
    * build-once `Stores` registry) and every query batch is served from
    * the standing parquet index — the original float vectors are touched
    * only for the shortlist re-rank fetch. Same ADC + refine query path
    * (LlmOpsSpec proves the parquet round-trip is search-equivalent, and
    * a spec pins indexed ≡ in-memory output row-for-row); what the
    * registered form adds is the real serve-from-disk plan: a 32×-smaller
    * code-table scan instead of re-training per query. No oracle for the
    * same reason as [[annIvfPq]] (engine-local codebooks); recall floors
    * are CI-pinned on the in-memory twin.
    */
  val annIvfPqIndexed = Q.noOracle("llm_ann_ivfpq_indexed") { (s, dir) =>
    val path = graft.sources.Stores.pqIndex(s, dir)
    val cents = graft.sources.Stores.readCached(s, s"$path/centroids")
    val cb = graft.sources.Stores.readCached(s, s"$path/codebook")
    // the standing code table is PARTITIONED by coarse cell, so the
    // request's literal cell IN-list lands in the scan's PartitionFilters
    // — only the probed nprobe-of-pqCells partitions are read
    val codes = graft.sources.Stores.readCached(s, s"$path/codes")
    pqSearch(s, dir, cents, cb, codes)
  }

  /** The plain-SQL face of the standing ANN index — what an ad-hoc user
    * types against the `graft_pq_codebook` / `graft_pq_codes` views
    * ([[graft.GraftSession.openStores]]): ADC scoring as a per-subspace
    * distance-lookup join + deterministic fold + windowed top-k, the
    * search/sketch SQL-surface pattern extended to vectors. The query
    * vectors arrive INLINE as a VALUES relation — the application-request
    * shape: an ANN caller holds its query vector; it is not fetched from
    * the corpus, and the final plan reads ONLY the standing index (zero
    * embeddings scans, GraftSessionSpec-pinned). The request's ADC
    * distance tables — queries × pqM × k doubles, index metadata — ride
    * in WITH the request in the inline VALUES relation, computed
    * driver-side from the codebook view with the exact float fold the
    * in-plan `aggregate(zip_with(…))` spelling performed (squared diffs
    * accumulated left-to-right in doubles; Double.toString/parse
    * round-trips exactly), and the request's probe CELLS ride in as a
    * second (q_id, cell) VALUES relation whose union doubles as the
    * literal IN-list that prunes the cell-partitioned code scan. The
    * served plan is then two inline-broadcast HASH joins over the PRUNED
    * code-table scan plus the `sequence(0, pqM−1)` fold whose fixed order
    * pins float addition and the (approx_d2, vec_id) rank —
    * transliterating [[pqAdcShortlist]] row-identically (spec-pinned,
    * including the boundary-replication DISTINCT), the same bit-for-bit
    * discipline as `log_sql_search_served` / `log_sql_sketch_served`.
    * No oracle for the same reason as its twins: the codebook is
    * engine-local (md5-sampled driver Lloyd), so DuckDB cannot rederive
    * the index; correctness is carried by the shortlist identity + the
    * recall floors CI-pinned on the in-memory twin.
    */
  val sqlAnnServed = Q.noOracle("llm_sql_ann_served") { (s, dir) =>
    sqlAnnServedFor(s, dir, sqlAnnQueries)
  }

  /** [[sqlAnnServed]]'s body with the request size exposed — the spec pins
    * the single-query case, where the probe union IS the nprobe cells and
    * the partition-pruning claim is non-vacuous.
    */
  private[graft] def sqlAnnServedFor(s: SparkSession, dir: String,
                                     nQueries: Long): DataFrame = {
    graft.GraftSession.openStores(s, dir)
    import s.implicits._
    // the "request": the query vectors, normalized + sliced driver-side.
    val qsv = pqNormSubvectors(s, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("sub"), col("sv"))
      .as[(Long, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2))
    // IVF stage, driver-side like the tabs: rank coarse cells per query
    // from the standing centroids view (pqCells rows of index metadata)
    // through the SAME pqProbes the programmatic shortlist uses. The
    // probe pairs ride in as a second inline VALUES relation, and the
    // request-wide cell union becomes a LITERAL IN-list on the code
    // table — which constant-folds into the partitioned scan's
    // PartitionFilters, so the served query reads only the probed
    // nprobe-of-pqCells cell partitions.
    val probes = pqProbes(s, dir, centsOf(s.table("graft_pq_centroids")),
      nQueries)
    val probeValues = probes
      .map { case (q, cell) => s"(${q}L, $cell)" }.mkString(", ")
    val cellInList = probes.map(_._2).distinct.sorted.mkString(", ")
    // The per-query ADC distance tables are INDEX-METADATA-sized (queries ×
    // pqM × k doubles — 1 280 here), so they are computed driver-side from
    // the standing codebook and inlined, rather than re-derived by three
    // aggregation stages inside every served query: the served plan is then
    // two inline-broadcast hash joins against the PRUNED code-table scan
    // plus the top-k window — interactive-latency shape. Bit-identity with the programmatic
    // path is preserved because the Scala loop below replays the exact
    // float fold the old `aggregate(zip_with(…))` spelled — squared diffs
    // accumulated left-to-right in doubles — and Double.toString/parse
    // round-trips exactly, so the inlined map VALUES are the same bits the
    // in-plan computation produced (the spec pins row-identity).
    val cb = s.table("graft_pq_codebook")
      .selectExpr("cast(sub as int) AS sub", "cast(code as int) AS code",
        "cast(c as array<double>) AS c")
      .as[(Int, Int, Seq[Double])].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    def d2(q: Seq[Double], c: Seq[Double]): Double = {
      val qa = q.toArray; val ca = c.toArray
      var acc = 0.0; var i = 0
      while (i < qa.length) { val dd = qa(i) - ca(i); acc += dd * dd; i += 1 }
      acc
    }
    val values = qsv.groupBy(_._1).toSeq.sortBy(_._1).map { case (q, subs) =>
      val tabs = subs.sortBy(_._2).map { case (_, sub, sv) =>
        val entries = cb(sub)
          .map { case (_, code, c) => s"$code, ${d2(sv, c)}D" }.mkString(", ")
        s"$sub, map($entries)"
      }.mkString(", ")
      s"(${q}L, map($tabs))"
    }.mkString(",\n        ")
    s.sql(
      s"""WITH tabs (q_id, tabs) AS (VALUES
         |        $values),
         |probes (q_id, cell) AS (VALUES $probeValues),
         |scored AS (
         |  SELECT DISTINCT t.q_id, c.vec_id,
         |    aggregate(sequence(0, ${pqM - 1}), 0.0D,
         |      (acc, sub) -> acc + element_at(element_at(t.tabs, sub),
         |                                     element_at(c.codes, sub + 1))) AS approx_d2
         |  FROM tabs t
         |  JOIN probes p ON p.q_id = t.q_id
         |  JOIN graft_pq_codes c ON c.cell = p.cell AND c.vec_id <> t.q_id
         |  WHERE c.cell IN ($cellInList)),
         |ranked AS (
         |  SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |                       ORDER BY approx_d2 ASC, vec_id ASC) AS arn
         |  FROM scored)
         |SELECT q_id, vec_id, arn FROM ranked
         |WHERE arn <= $pqShortlist
         |ORDER BY q_id, arn""".stripMargin)
  }

  /** Query count of the SQL ANN face — small enough that the inlined
    * VALUES text stays a few KB; the programmatic twin in the spec runs
    * [[pqAdcShortlist]] with the same bound.
    */
  private[graft] val sqlAnnQueries = 10L

  /** (vec_id, sub, sv): unit-normalized subvector rows — the shared input
    * of PQ training, encode, and the query-side ADC tables.
    */
  private def pqNormSubvectors(s: SparkSession, dir: String): DataFrame =
    pqNormSubvectorsOf(Tables.embeddings(s, dir))

  /** [[pqNormSubvectors]] over an arbitrary (vec_id, embedding) frame —
    * the append-batch entry point [[graft.sources.Sinks.refreshPqIndex]]
    * encodes through, so a refreshed batch can never normalize or slice
    * differently from the original build pass.
    */
  private[graft] def pqNormSubvectorsOf(emb: DataFrame): DataFrame = {
    val norm = vectors.l2Norm(col("embedding"))
    emb
      .filter(norm > 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") / norm).as("nv"))
      .select(col("vec_id"), explode(sequence(lit(0), lit(pqM - 1))).as("sub"), col("nv"))
      .select(col("vec_id"), col("sub"),
        slice(col("nv"), col("sub") * pqDsub + 1, lit(pqDsub)).as("sv"))
  }

  /** The IVF-PQ INDEX BUILD: (coarse centroids, codebook, encoded corpus
    * with cells). Split from the search path so the index can be persisted
    * (`Sinks.writePqIndex`) and queries reuse it — the production
    * lifecycle; the registered query re-trains per invocation only
    * because a Q is a self-contained plan.
    */
  private[graft] def pqTrainEncode(s: SparkSession,
                                   dir: String): (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    // No checkpoint here: the subvector frame CARRIES the normalized
    // corpus doubles (a payload, not a reduction — the r12 llm_ann_lsh
    // A/B rule), and since the encode below became a map-side pass over
    // the raw embeddings, `sv` is consumed only by the one training-slice
    // collect. Two cheap columnar scans inside that job beat an eager
    // row-format corpus materialization at any scale.
    val sv = pqNormSubvectors(s, dir)
    // TRAINING SET: the pqTrainBudget vectors with smallest md5(vec_id) —
    // a deterministic hash-ranked sample (TakeOrdered: scan + per-partition
    // top-k, no shuffle of unsampled rows), a pure function of the
    // surviving vec_ids so the build is engine- and run-independent. At
    // 100 TB this is the only tractable shape: the codebook fit cannot
    // Lloyd over the corpus, and every production PQ build samples here.
    val trainIds = sv.filter(col("sub") === 0)
      .select(col("vec_id"), md5(col("vec_id").cast("string")).as("h"))
      .orderBy("h", "vec_id").limit(pqTrainBudget)
      .select("vec_id")
    // The training slice is ≤ pqTrainBudget · pqM subvector rows —
    // metadata-sized BY THE BUDGET — so the Lloyd rounds run DRIVER-SIDE
    // (the PCA co-moment / union-find discipline): zero Spark jobs per
    // round, fixed-order float folds (fully deterministic, unlike a
    // shuffled avg), and the finished codebook re-enters the distributed
    // ENCODE below as a pqM·pqKs-row broadcast LocalRelation.
    val train: Array[(Long, Int, Seq[Double])] = sv
      .join(broadcast(trainIds), Seq("vec_id"))
      .select(col("vec_id"), col("sub").cast("int"), col("sv"))
      .as[(Long, Int, Seq[Double])].collect()
    val cbSeq = trainCodebookDriver(train)
    val cb = cbSeq.toDF("sub", "code", "c")
    val cents = trainCoarseDriver(train)
    val centsDf = cents.toDF("cell", "c")
    // Encode: the corpus as pqM-int code arrays, each replicated under its
    // pqAssign coarse cells — the persisted IVF-PQ index. One map-side
    // projection over the embeddings (codes + cells from the same
    // normalized vector, codebook and centroids inlined as literals):
    // zero exchanges, zero joins in the encode subtree.
    (centsDf, cb, pqEncodeWithCellsSeq(Tables.embeddings(s, dir), cbSeq, cents))
  }

  /** The full refresh-side encode: codes + coarse cells for an arbitrary
    * (vec_id, embedding) frame against a STANDING codebook + centroids —
    * what [[graft.sources.Sinks.refreshPqIndex]] routes an append batch
    * through, so a refreshed batch can never normalize, slice, code, or
    * cell-assign differently from the original build pass. The codebook
    * arrives as a frame (the store's parquet); it is index metadata
    * (pqM·pqKs rows), collected driver-side and inlined as literals —
    * parquet round-trips doubles exactly, so the refresh encode stays
    * bit-identical to the build encode (StorageLayoutSpec pins it).
    */
  private[graft] def pqEncodeWithCells(emb: DataFrame, cb: DataFrame,
                                       cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val s = cb.sparkSession
    import s.implicits._
    val cbSeq = cb.select(col("sub").cast("int"), col("code").cast("int"),
        col("c").cast("array<double>"))
      .as[(Int, Int, Seq[Double])].collect().toSeq
    pqEncodeWithCellsSeq(emb, cbSeq, cents)
  }

  /** The ENCODE half of the PQ build as ONE map-side projection: each
    * vector normalizes, codes every subspace against the LITERAL codebook,
    * and explodes under its [[pqAssign]] coarse cells — no subvector
    * fan-out, no join, no aggregation, zero exchanges. Per subspace the
    * code is the lexicographic min of (d2, code) structs — the same
    * `min(struct(d2, code))` argmin (lowest code on ties) the aggregated
    * formulation computed, over the same left-to-right
    * `aggregate(zip_with(…))` double fold, so the chosen codes are
    * bit-identical and refresh ≡ rebuild still holds file-for-row.
    */
  private[graft] def pqEncodeWithCellsSeq(emb: DataFrame,
                                          cb: Seq[(Int, Int, Seq[Double])],
                                          cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val norm = vectors.l2Norm(col("embedding"))
    // The d2 kernel against a LITERAL centroid, spelled FLAT (a left-assoc
    // chain of (v[i]−cᵢ)² terms) instead of aggregate(zip_with(…)):
    // higher-order functions are CodegenFallback, so the HOF spelling ran
    // 128 interpreted folds per row (same-JVM A/B: 0.96 → 1.25 s against
    // the r12 join encode); the flat chain whole-stage-codegens. The
    // doubles are bit-identical: zip_with's (x−y)·(x−y) is this (x−y)²,
    // and aggregate's fold (((0.0+t₁)+t₂)+…) equals the left-assoc chain
    // ((t₁+t₂)+…) exactly because t₁ ≥ +0.0 makes 0.0+t₁ ≡ t₁.
    def l2sqFlat(v: Column, off: Int, c: Seq[Double]): Column =
      c.indices.map { i =>
        val d = element_at(v, off + i + 1) - lit(c(i))
        d * d
      }.reduceLeft(_ + _)
    val bySub = cb.groupBy(_._1)
    val codesExpr = array((0 until pqM).map { sub =>
      val entries = bySub(sub).sortBy(_._2).map { case (_, code, c) =>
        struct(l2sqFlat(col("nv"), sub * pqDsub, c).as("d2"), lit(code).as("code"))
      }
      array_min(array(entries: _*)).getField("code")
    }: _*)
    val cellEntries = cents.sortBy(_._1).map { case (cell, c) =>
      struct(l2sqCol(col("nv"), typedlit(c)).as("d2"), lit(cell).as("cell"))
    }
    emb
      .filter(norm > 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") / norm).as("nv"))
      // MaterializeOnce (guide §4.4): the codes kernel (pqM·pqKs l2sq
      // folds) must evaluate once per VECTOR, below the cell explode —
      // written in one select, the optimizer hoists the projection above
      // the Generate and pays the kernel once per (vector, cell), i.e.
      // pqAssign times (measured: 2.8 → 4.5 s on the build query).
      // WscgFence on the cheap vec_id column keeps this projection OUT of
      // whole-stage codegen: the flat kernel's ~1k-term literal volume
      // exceeds Janino's method limit when inlined into processNext(),
      // while the row-mode projection compiles it with working splits.
      .select(graft.functions.WscgFence(col("vec_id")).as("vec_id"),
        graft.functions.MaterializeOnce(codesExpr).as("codes"), col("nv"))
      .select(col("vec_id"), col("codes"),
        explode(slice(array_sort(array(cellEntries: _*)), 1, pqAssign)).as("bc"))
      .select(col("vec_id"), col("codes"), col("bc.cell").as("cell"))
  }

  /** Collect a (cell, c) centroids frame back to the driver in cell order
    * — index metadata ([[pqCells]] rows), shared by every query path that
    * ranks probe cells.
    */
  private[graft] def centsOf(centsDf: DataFrame): Seq[(Int, Seq[Double])] = {
    val s = centsDf.sparkSession
    import s.implicits._
    centsDf.select(col("cell").cast("int"), col("c").cast("array<double>"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
  }

  /** Driver-side half of the PQ build: per-subspace k-means over the
    * budget-capped training slice. Seeds are the first [[pqKs]] training
    * vec_ids ascending (the surviving-seeds convention — an id gap can
    * never silently shrink the codebook); each Lloyd round assigns every
    * training subvector to its nearest centroid with lowest-code tiebreak
    * (the min(struct(d2, code)) argmin, in plain loops) and recomputes
    * means in deterministic point order. A centroid that attracts no
    * points keeps its previous value, preserving the full code range for
    * the encode.
    */
  private def trainCodebookDriver(
      train: Array[(Long, Int, Seq[Double])]): Seq[(Int, Int, Seq[Double])] = {
    val seedIds = train.iterator.filter(_._2 == 0).map(_._1).toArray.sorted.take(pqKs)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Seq[Double])]
    for (sub <- 0 until pqM) {
      val pts: Array[(Long, Array[Double])] = train.iterator
        .filter(_._2 == sub).map(t => (t._1, t._3.toArray)).toArray.sortBy(_._1)
      val byId = pts.toMap
      val cents = lloydDriver(pts, seedIds.map(byId), pqRounds, pqDsub)
      for (c <- cents.indices) out += ((sub, c, cents(c).toSeq))
    }
    out.toSeq
  }

  /** The shared driver-side Lloyd loop behind [[trainCodebookDriver]]
    * (pqDsub-dim subvectors, one run per subspace) and
    * [[trainCoarseDriver]] (full-dim coarse cells): assign every point to
    * its nearest centroid with lowest-index tiebreak (strict `<`), then
    * recompute means in deterministic point order; an empty centroid
    * keeps its previous value so no code/cell index is ever lost.
    */
  private def lloydDriver(pts: Array[(Long, Array[Double])],
                          seeds: Array[Array[Double]], rounds: Int,
                          dim: Int): Array[Array[Double]] = {
    var cents = seeds
    for (_ <- 1 to rounds) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val cnts = new Array[Long](cents.length)
      for ((_, v) <- pts) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c } // strict < = lowest-index tiebreak
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        cnts(best) += 1
      }
      cents = cents.indices.map { c =>
        if (cnts(c) == 0) cents(c)
        else {
          val m = new Array[Double](dim)
          var i = 0
          while (i < dim) { m(i) = sums(c)(i) / cnts(c); i += 1 }
          m
        }
      }.toArray
    }
    cents
  }

  /** Coarse-cell training, driver-side on the SAME budget-capped md5
    * sample the PQ codebook trains on: the sample's subvector rows are
    * re-assembled into full normalized vectors (sub order restores the
    * exact doubles) and [[pqCells]] centroids are Lloyd-fit over them —
    * seeds are the first [[pqCells]] training vec_ids ascending, the
    * surviving-seeds convention. Unit vectors make L2 ranking ≡ cosine
    * ranking, so the cell a query probes first is the cell its true
    * neighbors most likely live in.
    */
  private def trainCoarseDriver(
      train: Array[(Long, Int, Seq[Double])]): Seq[(Int, Seq[Double])] = {
    val full: Array[(Long, Array[Double])] = train.groupBy(_._1).toArray
      .map { case (id, subs) => (id, subs.sortBy(_._2).flatMap(_._3.toArray)) }
      .sortBy(_._1)
    val byId = full.toMap
    val seeds = full.map(_._1).sorted.take(pqCells).map(byId)
    val cents = lloydDriver(full, seeds, pqCoarseRounds, pqM * pqDsub)
    cents.indices.map(c => (c, cents(c).toSeq))
  }

  /** The PQ QUERY PATH over a (possibly persisted) index: ADC tables from
    * the codebook, compressed-domain shortlist over the code table, exact
    * re-rank. Takes the index as plain frames so a parquet round-trip of
    * the index is search-equivalent (spec-pinned).
    */
  /** The compressed-domain HALF of the PQ query path: ADC tables from the
    * codebook for queries `vec_id < maxQ`, then the top-[[pqShortlist]]
    * shortlist per query over the code table — (q_id, vec_id, arn), no
    * float fetch, no re-rank. Factored out so the plain-SQL face
    * ([[sqlAnnServed]]) can be pinned row-identical to exactly this stage
    * (the deterministic `sequence(0, pqM-1)` fold makes the sum order —
    * and therefore every last-ulp tie — reproducible across both forms).
    */
  private[graft] def pqAdcShortlist(s: SparkSession, dir: String,
                                    cents: DataFrame, cb: DataFrame,
                                    codes: DataFrame,
                                    maxQ: Long = 100): DataFrame = {
    import s.implicits._
    // IVF stage: rank the pqCells coarse cells per query DRIVER-SIDE (the
    // centroids are 16×64-double index metadata; the queries are the
    // bounded request batch every path here already treats as
    // driver-held) and keep the best pqNprobe. Two artifacts come out:
    // the per-query (q_id, cell) probe relation, and the REQUEST-WIDE
    // literal cell IN-list — the latter constant-folds into the code
    // scan's PartitionFilters, so a cell-partitioned standing code table
    // reads only the probed partitions (the log_sql_search_served
    // pruning pattern applied to vectors).
    val cn = centsOf(cents)
    val probes = pqProbes(s, dir, cn, maxQ)
    val probeDf = probes.toDF("q_id", "cell")
    val cellList = probes.map(_._2).distinct.sorted
    val pruned = codes.filter(col("cell").isin(cellList: _*))
    // ADC tables: map<sub, map<code, ‖q_sub − c‖²>> per query, broadcast.
    val dtabs = pqNormSubvectors(s, dir).filter(col("vec_id") < maxQ)
      .select(col("vec_id").as("q_id"), col("sub"), col("sv").as("qsv"))
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d2", l2sqCol(col("qsv"), col("c")))
      .groupBy("q_id", "sub")
      .agg(map_from_entries(array_sort(collect_list(struct(col("code"), col("d2"))))).as("sm"))
      .groupBy("q_id")
      // no array_sort here: structs holding maps aren't orderable, and a
      // map build is insertion-order-independent anyway
      .agg(map_from_entries(collect_list(struct(col("sub"), col("sm")))).as("tabs"))
    // ADC scan → top-`pqShortlist` candidates per query in the COMPRESSED
    // domain (the cheap part: pqM map lookups per pair, no float math).
    // The probe join is a broadcast HASH join on cell (the old flat-PQ
    // BNLJ is gone with the pruning); boundary-replicated vectors can
    // reach one query through BOTH probed cells with bit-identical
    // approx_d2 (same codes, same tabs), so the candidate set dedups on
    // the full (q_id, vec_id, approx_d2) row before ranking.
    val wAdc = Window.partitionBy("q_id").orderBy(col("approx_d2").asc, col("vec_id").asc)
    broadcast(dtabs.join(probeDf, Seq("q_id")))
      .join(pruned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx_d2",
        aggregate(sequence(lit(0), lit(pqM - 1)), lit(0.0),
          (acc, sub) => acc +
            element_at(element_at(col("tabs"), sub), element_at(col("codes"), sub + 1))))
      .select("q_id", "vec_id", "approx_d2").distinct()
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= pqShortlist)
      .select("q_id", "vec_id", "arn")
  }

  /** Per-query probe plan: each query's [[pqNprobe]] nearest coarse cells
    * by centroid L2 (≡ cosine on unit vectors), lowest-cell tiebreak.
    * Runs driver-side over the collected query subvectors (re-assembled
    * into full vectors — sub order restores the exact doubles) — shared
    * by the programmatic shortlist and the SQL face so the two can never
    * rank probes differently.
    */
  private[graft] def pqProbes(s: SparkSession, dir: String,
                              cents: Seq[(Int, Seq[Double])],
                              maxQ: Long): Seq[(Long, Int)] = {
    import s.implicits._
    val qsv = pqNormSubvectors(s, dir).filter(col("vec_id") < maxQ)
      .select(col("vec_id"), col("sub").cast("int"), col("sv"))
      .as[(Long, Int, Seq[Double])].collect()
    val centArr = cents.sortBy(_._1).map { case (cell, c) => (cell, c.toArray) }
    qsv.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (q, subs) =>
      val v = subs.sortBy(_._2).flatMap(_._3.toArray)
      centArr.map { case (cell, c) =>
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - c(i); d += t * t; i += 1 }
        (d, cell)
      }.sorted.take(pqNprobe).map { case (_, cell) => (q, cell) }
    }
  }

  private[graft] def pqSearch(s: SparkSession, dir: String, cents: DataFrame,
                              cb: DataFrame, codes: DataFrame): DataFrame = {
    val shortlist = pqAdcShortlist(s, dir, cents, cb, codes).select("q_id", "vec_id")
    // …then exact-cosine re-rank of the shortlist against the ORIGINAL
    // vectors — the FAISS refine step. Only queries × shortlist rows (not
    // the corpus) pay full-precision math; the fetch is a broadcast
    // equi-join on vec_id, so at 100 TB it reads back exactly the ≤ 100·50
    // vectors it re-scores.
    val raw = Tables.embeddings(s, dir)
    val q = raw.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
    broadcast(shortlist.join(q, Seq("q_id")))
      .join(raw, Seq("vec_id"))
      .withColumn("cos_sim", round(vectors.cosineSim(col("q_emb"), col("embedding")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("q_id", "vec_id", "cos_sim", "rn")
      .orderBy("q_id", "rn")
  }

  /** D4: embedding norms — the L2 kernel plus per-label stats. */
  val embedNorm = Q(
    "llm_embed_norm",
    """SELECT label, COUNT(*) AS n,
      |  ROUND(MIN(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS min_norm,
      |  ROUND(MAX(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS max_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir)
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        round(min(vectors.l2Norm(col("embedding"))), 4).as("min_norm"),
        round(max(vectors.l2Norm(col("embedding"))), 4).as("max_norm"))
      .orderBy("label")
  }

  /** D4 (quantization): symmetric per-vector int8 scalar quantization —
    * scale = max|vᵢ|/127, qᵢ = clamp(round(vᵢ/scale)), the 4× memory
    * reduction every billion-vector ANN deployment applies before
    * anything else — with the reconstruction-error profile that tells you
    * whether it was safe (max error ≤ scale/2 by construction, pinned in
    * LlmOpsSpec). Pure per-row array math in whole-stage codegen: no
    * shuffle, no state, linear at any corpus size. Both engines evaluate
    * the identical double-precision expression tree (float→double widen,
    * divide, half-away-from-zero round, clamp, multiply) so the oracle
    * hash-matches bit-for-bit at 6 decimals.
    */
  val quantizeInt8 = Q(
    "llm_quantize_int8",
    """SELECT vec_id,
      |  ROUND(s, 6) AS scale,
      |  ROUND(list_max(errs), 6) AS max_err,
      |  ROUND(list_sum(errs) / len(errs), 6) AS mean_err
      |FROM (
      |  SELECT vec_id, s,
      |    list_transform(v, x ->
      |      abs(x - greatest(-127, least(127, round(x / s))) * s)) AS errs
      |  FROM (
      |    SELECT vec_id, embedding::DOUBLE[] AS v,
      |      list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127 AS s
      |    FROM embeddings) t
      |  WHERE s > 0) t2
      |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val v = transform(col("embedding"), x => x.cast("double"))
    val scaleCol = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127
    val errs = transform(col("v"), x =>
      abs(x - greatest(lit(-127.0), least(lit(127.0), round(x / col("s")))) * col("s")))
    Tables.embeddings(s, dir)
      .select(col("vec_id"), v.as("v"), scaleCol.as("s"))
      .filter(col("s") > 0)
      .withColumn("errs", errs)
      .select(col("vec_id"),
        round(col("s"), 6).as("scale"),
        round(aggregate(col("errs"), lit(0.0), (a, x) => greatest(a, x)), 6).as("max_err"),
        round(aggregate(col("errs"), lit(0.0), _ + _) / size(col("errs")), 6).as("mean_err"))
      .orderBy("vec_id")
  }

  /** D2 perf path: MinHash + LSH banding. 16 hash slots → 4 bands of 4;
    * docs colliding on any band become candidate pairs; the
    * signature-agreement fraction estimates Jaccard. Candidate generation
    * is a hash-equi-join on (band, band_key) — no cross product at any
    * scale.
    *
    * ORACLE-CHECKED (was no-oracle through round 8): the slot hashes are
    * the repo's md5-prefix idiom (`('0x' || substr(md5(j ':' tok), 1, 8))
    * ::BIGINT` ≡ Spark's `conv(substring(md5(…), 1, 8), 16, 10)`) instead
    * of the engine-specific xxhash64 family, and the band bucket key is
    * the ':'-joined slot-value STRING rather than a second hash — both
    * engines derive identical signatures, buckets, pairs, and estimates,
    * so the whole sub-linear pipeline sits under the hard hash gate.
    */
  val minhashPairs: Q = {
    val nHash = 16
    val bands = 4
    val rowsPerBand = nHash / bands
    // Degenerate-bucket cap: a band bucket holding > maxBucket docs would
    // emit O(bucket²) candidate pairs — on near-duplicate-heavy corpora
    // (like this synthetic one, where all docs share a 31-word vocabulary)
    // that collapses back into the O(n²) cross product LSH exists to
    // avoid. Production LSH dedup (e.g. the web-crawl pipelines) drops
    // such buckets: a bucket that large means the band carries no
    // discriminating signal. The cap bounds work per bucket, so the whole
    // operator stays linear in corpus size at any scale.
    val maxBucket = 50
    // Each 128-bit md5 digest carries FOUR independent 32-bit words, so
    // 16 min-wise-independent slots need 4 digests per token, not 16 —
    // the digests were the whole cost of the r9 oracle migration (1.58 s
    // at sf0.1). NOT Kirsch–Mitzenmacher double hashing: K-M trades
    // independence for speed, which is fine for Bloom membership but
    // breaks MINHASH — the token minimizing h1 tends to win every
    // h1 + j·h2 slot, collapsing the 16 estimators into ~2 and biasing
    // est_jaccard toward 1 (measured: the 1/3-overlap spec pair estimated
    // 0.94). Slot j reads word j%4 of digest j/4.
    val slotSql = (0 until nHash).map(j =>
      s"    MIN(('0x' || substr(md5('${j / 4}:' || tok), ${1 + 8 * (j % 4)}, 8))::BIGINT) AS h$j")
      .mkString(",\n")
    val bandKeySql = (0 until bands).map { b =>
      val key = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(j => s"h$j").mkString(" || ':' || ")
      s"      WHEN $b THEN $key"
    }.mkString("\n")
    val matchSql = (0 until nHash)
      .map(j => s"CASE WHEN sa.h$j = sb.h$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    val sql =
      s"""WITH tok AS (
         |  SELECT doc_id, tok FROM (
         |    SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
         |    FROM documents) t
         |  WHERE tok <> ''),
         |sig AS MATERIALIZED (
         |  SELECT doc_id,
         |$slotSql
         |  FROM tok GROUP BY doc_id),
         |banded AS MATERIALIZED (
         |  SELECT doc_id, band_idx,
         |    CASE band_idx
         |$bandKeySql
         |    END AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band_idx) b),
         |ok AS (
         |  SELECT band_idx, band_key FROM banded
         |  GROUP BY 1, 2 HAVING COUNT(*) <= $maxBucket),
         |inb AS (SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM inb a JOIN inb b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  ROUND(CAST($matchSql AS DOUBLE) / $nHash, 4) AS est_jaccard
         |FROM pairs
         |JOIN sig sa ON pairs.id_a = sa.doc_id
         |JOIN sig sb ON pairs.id_b = sb.doc_id
         |ORDER BY id_a, id_b""".stripMargin
    Q("llm_minhash_pairs", sql) { (s, dir) =>
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
        .filter(col("tok") =!= "")
      // 16 independent 32-bit hash slots from 4 md5 digests — word j%4 of
      // digest j/4 (see the oracle-side note above on why NOT double
      // hashing); the deterministic-coin idiom both engines compute
      // identically, at 1/4 the digest cost. The digests land as explicit
      // columns in their own projection: 16 per-slot md5 trees inside the
      // aggregate would evaluate 16 digests per row (aggregate expression
      // lists don't share subexpressions the way a Project does).
      val digs = tok.select(col("doc_id") +: (0 until nHash / 4).map(k =>
        md5(concat(lit(s"$k:"), col("tok"))).as(s"d$k")): _*)
      val sigCols = (0 until nHash).map(j =>
        min(conv(substring(col(s"d${j / 4}"), 1 + 8 * (j % 4), 8), 16, 10)
          .cast("bigint")).as(s"h$j"))
      // localCheckpoint before the fan-out (r12, guide §2.4 / the
      // winnowPairs convention): sig feeds the bucket census, BOTH sides
      // of the candidate self-join, and the est_jaccard projection — the
      // before-plan re-ran the tokenize + 4-md5-digest + 16-min-agg
      // pipeline four times (8 documents scans). Doc-cardinality rows of
      // 16 longs: signature-table-sized, the thing LSH materializes.
      val sig = digs.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
        .localCheckpoint()
      val banded = sig.select(
        col("doc_id"),
        array((0 until nHash).map(j => col(s"h$j")): _*).as("sig"),
        posexplode(array((0 until bands).map(b =>
          concat_ws(":", (b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(j => col(s"h$j").cast("string")): _*)): _*))
          .as(Seq("band_idx", "band_key")))
      val smallBuckets = banded
        .groupBy("band_idx", "band_key").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") <= maxBucket)
        .select("band_idx", "band_key")
      val inBucket = banded.join(smallBuckets, Seq("band_idx", "band_key"))
      val pairs = inBucket.as("a")
        .join(inBucket.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .dropDuplicates("id_a", "id_b")
      pairs
        .withColumn("est_jaccard",
          round(aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / nHash, 4))
        .select("id_a", "id_b", "est_jaccard")
        .orderBy("id_a", "id_b")
    }
  }

  /** D6: TF-IDF, top-3 terms per document. Pure composition: tokenize →
    * tf (per-doc counts) → df (distinct-doc counts) → idf join. The corpus
    * size N joins in via a broadcast single-row aggregate, not a collect.
    *
    * The tf⋈df join carries NO broadcast hint: df has one row per distinct
    * token, and vocabulary grows with corpus size (Heaps' law — billions of
    * keys at 100 TB), so forcing a broadcast there would override Spark's
    * size threshold and OOM the executors. Both sides are already
    * hash-partitioned on `tok` by their upstream aggregations, so the join
    * reuses that partitioning; at fixture scale AQE may still pick BHJ on
    * its own (within the size threshold), which is fine — the point is the
    * planner decides from observed sizes, not a hint that lies at scale.
    */
  val tfidf = Q(
    "llm_tfidf",
    """WITH tok AS (
      |  SELECT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents) t
      |  WHERE tok <> ''),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT doc_id, tok, tfidf, rn FROM (
      |  SELECT tf.doc_id, tf.tok,
      |    ROUND(tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS tfidf,
      |    CAST(row_number() OVER (PARTITION BY tf.doc_id ORDER BY
      |      ROUND(tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) DESC, tf.tok) AS INTEGER) AS rn
      |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n) t
      |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tok = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val tfidfCol = round(col("tf") * log(col("n").cast("double") / col("df")), 4)
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok").asc)
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", tfidfCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("doc_id", "tok", "tfidf", "rn")
      .orderBy("doc_id", "rn")
  }

  /** D-family (decontamination): training docs sharing any word-8-gram
    * with the benchmark/eval set — the standard n-gram-overlap test-set
    * leak check run before every serious pretraining job (src0 stands in
    * for the benchmark; everything else is train). The eval side of the
    * join is tiny by nature (benchmarks are KBs against a 100 TB train
    * corpus), so its distinct 8-grams broadcast and the train side is one
    * scan + hash probe — no shuffle of training text at any scale; output
    * is the flagged-doc hit list with its shared-8-gram count (the
    * evidence a human reviews before dropping the doc).
    */
  val decontaminate = Q(
    "llm_decontaminate",
    """WITH g AS (
      |  SELECT doc_id, source, ng FROM (
      |    SELECT doc_id, source, unnest(list_distinct(list_transform(
      |        range(1, len(string_split(lower(text), ' ')) - 6),
      |        i -> array_to_string(string_split(lower(text), ' ')[i:i+7], ' ')))) AS ng
      |    FROM documents) t),
      |ev AS (SELECT DISTINCT ng FROM g WHERE source = 'src0')
      |SELECT g.doc_id, g.source, COUNT(DISTINCT g.ng) AS n_shared
      |FROM g JOIN ev USING (ng)
      |WHERE g.source <> 'src0'
      |GROUP BY 1, 2 ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
    val grams = docGrams(s, dir)
    val evalGrams = grams.filter(col("source") === "src0").select("ng").distinct()
    grams.filter(col("source") =!= "src0")
      .join(broadcast(evalGrams), Seq("ng"))
      .groupBy("doc_id", "source")
      .agg(countDistinct("ng").as("n_shared"))
      .orderBy("doc_id")
  }

  /** D-family (decontamination, REVERSED report): per EVAL document, how
    * compromised it is — its distinct 8-grams, how many also occur
    * anywhere in the train side, and the contaminated fraction. This is
    * the direction a benchmark owner reads (the GPT-3-appendix "dirty
    * eval doc" table): [[decontaminate]] lists the train docs to drop;
    * this lists the eval items whose scores can no longer be trusted if
    * they are NOT dropped. Same join discipline at 100 TB — the train
    * side collapses to DISTINCT grams-that-hit via the broadcast eval
    * probe (one scan, no train-text shuffle), and the per-eval-doc
    * rollup runs over eval-sized rows.
    */
  val evalContamination = Q(
    "llm_eval_contamination",
    """WITH g AS (
      |  SELECT doc_id, source, ng FROM (
      |    SELECT doc_id, source, unnest(list_distinct(list_transform(
      |        range(1, len(string_split(lower(text), ' ')) - 6),
      |        i -> array_to_string(string_split(lower(text), ' ')[i:i+7], ' ')))) AS ng
      |    FROM documents) t),
      |ev AS (SELECT doc_id, ng FROM g WHERE source = 'src0'),
      |hit_grams AS (
      |  SELECT DISTINCT g.ng FROM g
      |  JOIN (SELECT DISTINCT ng FROM ev) e USING (ng)
      |  WHERE g.source <> 'src0'),
      |per_doc AS (
      |  SELECT ev.doc_id, COUNT(*) AS n_grams,
      |    CAST(SUM(CASE WHEN h.ng IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      |  FROM ev LEFT JOIN hit_grams h ON ev.ng = h.ng
      |  GROUP BY 1)
      |SELECT doc_id, n_grams, n_contaminated,
      |  ROUND(n_contaminated * 1.0 / n_grams, 4) AS frac_contaminated
      |FROM per_doc
      |WHERE n_contaminated > 0
      |ORDER BY frac_contaminated DESC, doc_id""".stripMargin) { (s, dir) =>
    val grams = docGrams(s, dir)
    val ev = grams.filter(col("source") === "src0").select("doc_id", "ng")
    // distinct TRAIN grams that hit the eval vocabulary: the eval side
    // broadcasts (benchmarks are KBs), the train side is one scan + hash
    // probe collapsing to hit-vocabulary-sized rows
    val hitGrams = grams.filter(col("source") =!= "src0")
      .join(broadcast(ev.select("ng").distinct()), Seq("ng"))
      .select("ng").distinct()
      .withColumn("hit", lit(1))
    ev.join(hitGrams, Seq("ng"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_contaminated"))
      .filter(col("n_contaminated") > 0)
      .withColumn("frac_contaminated",
        round(col("n_contaminated") * lit(1.0) / col("n_grams"), 4))
      .select("doc_id", "n_grams", "n_contaminated", "frac_contaminated")
      .orderBy(col("frac_contaminated").desc, col("doc_id"))
  }

  /** (doc_id, source, ng): distinct word-8-grams per document — the shared
    * derivation behind [[decontaminate]] and [[bloomDecontaminate]].
    * Tokenizes once into a materialized column (same O(len²) trap as the
    * shingle builder: slice() in the lambda must reference a real column).
    */
  private def docGrams(s: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(col("text")), " ")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), toks.as("ts"))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(transform(
          when(size(col("ts")) >= lit(8), sequence(lit(1), size(col("ts")) - 7))
            .otherwise(array().cast("array<int>")),
          i => concat_ws(" ", slice(col("ts"), i, lit(8)))))).as("ng"))
  }

  /** Bloom-filter sizing for [[bloomDecontaminate]]: fixed 2^20 capacity at
    * 1% target FPP ≈ 1.2 MB of bits — benchmark suites are KB-to-MB scale,
    * so a production deployment picks this from the known eval-set size (or
    * one cheap count over the tiny side); it is NOT data-dependent on the
    * 100 TB train side. Overfilling past capacity degrades FPP only, never
    * introduces false negatives.
    */
  val bloomExpectedItems = 1L << 20
  val bloomFpp = 0.01

  /** D11 at the sketch grain (no oracle — the Bloom bit layout is
    * engine-specific): decontamination where the eval-set 8-grams compress
    * into a ~1.2 MB Bloom filter instead of a broadcast hash relation.
    * [[decontaminate]]'s broadcast join is exact but ships every distinct
    * eval gram string to every executor; at the 100 TB grain the probe-side
    * discipline is identical (one scan of train grams, map-side membership
    * test, no shuffle of training text), but the shipped state shrinks
    * 10-100× and probe cost becomes k hash evaluations independent of eval
    * vocabulary — the exact trade Spark's own injected runtime filters
    * (`BloomFilterMightContain`) make for shuffle pruning. Output is the
    * CANDIDATE list (superset of the exact hit list, FPP-bounded — the
    * Bloom no-false-negative guarantee, spec-pinned); a production pipeline
    * either drops candidates outright (cheap, slightly over-drops) or
    * re-verifies them against the exact join's output.
    *
    * The probe is a scalar UDF over the broadcast sketch — the one place
    * the UDF form is the honest choice: Spark's public Column algebra has
    * no Bloom-probe expression (BloomFilterMightContain is
    * optimizer-internal), and the alternative — exploding each gram into k
    * bit positions and semi-joining a position table — shuffles the train
    * side it exists to protect.
    */
  val bloomDecontaminate = Q.noOracle("llm_bloom_decontaminate") { (s, dir) =>
    val bf = evalGramsOf(s, dir).stat.bloomFilter("ng", bloomExpectedItems, bloomFpp)
    bloomProbe(s, dir, bf)
  }

  /** Distinct eval-set 8-grams — the item set every decontamination Bloom
    * (in-query or persisted) is built from; ONE definition so the standing
    * store can never hash a different gram derivation than the query.
    */
  private[graft] def evalGramsOf(s: SparkSession, dir: String): DataFrame =
    docGrams(s, dir).filter(col("source") === "src0").select("ng").distinct()

  /** The probe half of Bloom decontamination against a GIVEN filter: one
    * scan of train-side grams, map-side membership UDF over the broadcast
    * sketch, candidate rollup. Shared by the self-contained query and the
    * store-served twin so the two can never diverge in probe semantics.
    */
  private def bloomProbe(s: SparkSession, dir: String,
                         bf: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val bfB = s.sparkContext.broadcast(bf)
    val mightContain = udf((ng: String) => bfB.value.mightContainString(ng))
    docGrams(s, dir).filter(col("source") =!= "src0")
      .filter(mightContain(col("ng")))
      .groupBy("doc_id", "source")
      .agg(countDistinct("ng").as("n_candidate"))
      .orderBy("doc_id")
  }

  /** [[bloomDecontaminate]] served from the STANDING persisted filter
    * ([[graft.sources.Stores.bloomFilter]]): the eval-set grams were
    * hashed into the ~1.2 MB sketch ONCE at build time, and every ingest
    * batch probes the deserialized standing bytes — the eval corpus is
    * never re-tokenized. Appends to the eval set fold in through
    * [[graft.sources.Sinks.refreshBloomFilter]] (bitwise OR-merge:
    * deterministic hashing + same sizing params ⇒ refresh is
    * BYTE-identical to a rebuild over the union, spec-proved). This is
    * the production shape at 100 TB: the benchmark suite changes rarely,
    * the train stream never stops, and the filter is the only state the
    * ingest path needs. No oracle (engine-specific bit layout); a spec
    * pins served ≡ self-contained row-for-row.
    */
  val bloomDecontaminateIndexed = Q.noOracle("llm_bloom_decontaminate_indexed") { (s, dir) =>
    val bf = graft.sources.Sinks.readBloomFilter(
      graft.sources.Stores.bloomFilter(s, dir),
      s.sparkContext.hadoopConfiguration)
    bloomProbe(s, dir, bf)
  }

  /** A4 (no oracle — HLL sketches are engine-specific): approximate
    * distinct users per event type; |approx − exact| ≤ 5% is asserted in
    * LlmOpsSpec. At 100 TB this is the only affordable distinct-count.
    */
  val approxDistinct = Q.noOracle("agg_approx_distinct") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id", 0.02).as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .orderBy("event_type")
  }

  /** A4/A7 (no oracle — quantile sketches are engine-specific): streaming
    * mergeable percentile sketch per event type, the affordable form of A7
    * at scale (exact percentile materializes and sorts every group's
    * values; the sketch is fixed-size per partition and merges). The exact
    * values ride along so LlmOpsSpec can assert the rank-error bound.
    */
  val approxPercentile = Q.noOracle("agg_approx_percentile") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        round(expr("approx_percentile(value, 0.5, 10000)"), 4).as("approx_p50"),
        round(expr("approx_percentile(value, 0.95, 10000)"), 4).as("approx_p95"),
        round(expr("percentile(value, 0.5)"), 4).as("exact_p50"),
        round(expr("percentile(value, 0.95)"), 4).as("exact_p95"))
      .orderBy("event_type")
  }

  /** A4 (heavy hitters, no oracle — the datasketches binary layout is
    * engine-specific): approximate top-k most frequent tokens via Spark
    * 4's `approx_top_k` (frequent-items sketch). The affordable form of
    * "what are the dominant tokens/URLs/error codes" at 100 TB: the
    * sketch is fixed-size per partition and merges, where the exact
    * groupBy-count must shuffle one row per distinct key. On the
    * fixture's small vocabulary the sketch is exact — LlmOpsSpec asserts
    * it equals the exact top-k, which is the estimation-quality contract.
    *
    * Stays no-oracle even though counts are exact here: at sf0.01 ranks
    * 10 and 11 TIE (918 occurrences each, measured round 5), and which of
    * the two the sketch's top-10 cut keeps is its own internal tiebreak —
    * an exact-SQL oracle with a lexicographic tiebreak would flake on
    * exactly that boundary. Don't retry the migration.
    */
  val approxTopK = Q.noOracle("agg_approx_topk") { (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .agg(expr("approx_top_k(tok, 10)").as("topk"))
      .select(explode(col("topk")).as("entry"))
      .select(col("entry.item").as("tok"), col("entry.count").as("freq"))
      .orderBy(desc("freq"), asc("tok"))
  }

  /** Connected components over a near-dup pair set by min-label propagation
    * with pointer jumping: each round every node takes the minimum label
    * over itself and its neighbors (one join + one aggregation), then
    * label-of-label ("pointer jump" / path halving) so a discovered small
    * label hops TWO steps per round instead of one — convergence in
    * O(log diameter) rounds rather than diameter. Near-dup graphs are
    * shallow (dup clusters are cliques or short chains), so 10 rounds is
    * far past safe even for a 1000-node chain.
    *
    * One Spark job per round: the eager `localCheckpoint` that truncates
    * the lineage is also the job that runs the round, and the convergence
    * test rides inside it as a `Dataset.observe()` metric —
    * `count(label =!= own)` collected by the execution listener when the
    * checkpoint job completes, no separate diff/isEmpty action. Unlike
    * the earlier per-row accumulator UDF, `observe` is a declarative
    * CollectMetrics node, so whole-stage codegen survives the round's
    * projection, and the observed count is exactly-once (tied to the
    * query execution, not task attempts).
    *
    * Fixpoint ⇒ correct components: if two nodes of one component ended
    * with different labels, some edge (x, y) on the path between them has
    * label(x) < label(y), and y's neighbor-min step would have changed y —
    * contradiction. Labels are min node ids per component, matching
    * GraphX `connectedComponents` (the spec cross-checks against it).
    *
    * SIZE-ADAPTIVE execution (`driverThreshold`, default 100k pairs —
    * the autoBroadcastJoinThreshold discipline, gated on a MEASURED
    * count of the already-materialized pair list, never an assumption):
    * near-dup pair sets are usually tiny relative to their corpus (256
    * pairs from 50k docs at sf0.1), and the distributed loop's cost is
    * then pure job-launch overhead — ~5 s of scheduling for microseconds
    * of work. At or under the threshold the pairs are collected and
    * union-find with path compression runs driver-side; past it the
    * distributed pointer-jumping loop runs unchanged (and is what the
    * soak exercises). Both paths produce the IDENTICAL min-label
    * output — LlmOpsSpec pins them equal on the same pair sets, and the
    * GraphX cross-check runs the distributed path explicitly.
    */
  def clusterPairs(pairs: DataFrame, maxIter: Int = 10,
                   driverThreshold: Long = 100000L): DataFrame = {
    // Materialize the PAIR list once before anything else: the
    // symmetrization union below reads `pairs` twice, and an
    // un-materialized input would execute the whole upstream
    // pair-generation pipeline (e.g. the shingle-Jaccard postings
    // expansion) once PER BRANCH — profiled r7 at sf0.1: 7.8 s → 4.1 s
    // for the cluster query just by hoisting this checkpoint above the
    // union. It also keeps every loop round from re-running the pipeline
    // (the original r4 motivation — 87 s → 29 s before the edge
    // checkpoint existed). On a real cluster this is
    // persist-to-disk/checkpoint; localCheckpoint is the single-JVM
    // equivalent.
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    // size-adaptive gate: the count is free (p is materialized) and the
    // decision is measured, not assumed — the broadcast-threshold pattern
    if (p.count() <= driverThreshold) return unionFindDriver(p)
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val obs = org.apache.spark.sql.Observation(s"cc_changed_round_$it")
      // Min over self + neighbors in ONE aggregation: neighbor labels
      // union the node's own label (tagged so the old label rides along
      // for the change test) — no left join needed to keep isolated-ish
      // nodes, because the self row is always present.
      val self = labels.select(col("id"), col("label"), col("label").as("own"))
      val nbr = edges.join(labels, col("dst") === col("id"))
        .select(col("src").as("id"), col("label"), lit(null).cast("long").as("own"))
      val folded = self.unionByName(nbr)
        .groupBy("id")
        .agg(min("label").as("m"), min("own").as("own"))
      // Pointer jump: m is always a live node id (a min over node ids), so
      // label(m) exists in `folded`; adopting it advances two hops. The
      // left join is on the label side — one extra shuffle of the (id, m)
      // relation, repaid by halving the round count.
      val next = folded.as("a")
        .join(folded.select(col("id").as("jid"), col("m").as("jm")).as("j"),
          col("a.m") === col("j.jid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.m"), coalesce(col("jm"), col("a.m"))).as("label"),
          col("own"))
        .observe(obs, count(when(col("label") =!= col("own"), lit(1))).as("changed"))
        // Checkpoint DIRECTLY on the observed node (project `own` away only
        // afterwards): checkpointing a projection of a CollectMetrics plan
        // leaves the LogicalRDD's rewritten constraints referencing the
        // pruned attribute, and the next round's union dies in
        // rewriteConstraints with `key not found: id#N`.
        .localCheckpoint() // eager: THE round's job; completes the observation
      converged = obs.get("changed").asInstanceOf[Long] == 0L // get blocks on the job above
      labels = next.select("id", "label")
      it += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Driver-side half of [[clusterPairs]]'s size-adaptive gate: classic
    * union-find with path compression, union-by-min-root — since every
    * node starts as its own root and a union always attaches the larger
    * root under the smaller, the final root of a component IS its min
    * node id, exactly the distributed fixpoint's label. Output schema
    * and values identical to the distributed path (spec-pinned).
    */
  private def unionFindDriver(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val es = pairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- es) {
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.toSeq.sorted.map(id => (id, find(id)))
      .toDF("doc_id", "cluster_id")
  }

  /** D2 follow-through: near-dup clusters from the shingle-Jaccard pairs,
    * profiled as (cluster_id, size).
    *
    * Oracled (round 5): connected components are DETERMINISTIC — the
    * min-label fixpoint is a pure function of the pair set — so the DuckDB
    * side computes the same components via WITH RECURSIVE transitive
    * closure (`reach` UNION-distinct guarantees termination) and labels
    * each node `least(self, min(reachable))`, which is exactly the
    * min-label [[clusterPairs]] converges to. The closure is O(Σ size²)
    * over clusters — fine for an oracle at fixture scale; the Spark side
    * keeps the O(log d)-round pointer-jumping loop that scales.
    * LlmOpsSpec additionally pins the component semantics on hand-built
    * graphs and cross-checks GraphX.
    *
    * The pair set comes from the STANDING store
    * ([[graft.sources.Stores.shinglePairs]]) — clustering consumes the
    * pairs a snapshot computed once, never re-running the postings
    * expansion; at 100 TB the clustering input is the metadata-sized pair
    * list, not the corpus.
    */
  val nearDupClusters = Q(
    "llm_neardup_clusters",
    s"""WITH RECURSIVE $shinglePairCtes,
      |pairs AS MATERIALIZED (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sz sa ON inter.id_a = sa.doc_id
      |  JOIN sz sb ON inter.id_b = sb.doc_id
      |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $shingleJaccardThreshold),
      |edges AS MATERIALIZED (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
      |reach(a, b) AS (
      |  SELECT src AS a, dst AS b FROM edges
      |  UNION
      |  SELECT r.a, e.dst AS b FROM reach r JOIN edges e ON e.src = r.b),
      |labels AS (
      |  SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id FROM reach GROUP BY a)
      |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      |FROM labels GROUP BY cluster_id ORDER BY cluster_id""".stripMargin) { (s, dir) =>
    val pairs = graft.sources.Stores.readCached(s, graft.sources.Stores.shinglePairs(s, dir))
      .select("id_a", "id_b")
    clusterPairs(pairs)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy(col("cluster_id"))
  }

  /** D1/D2 at the INGEST grain: incremental dedup — a new document batch
    * deduplicated AGAINST an existing corpus, the shape every production
    * pipeline actually runs daily (the within-corpus dedups above are the
    * backfill shape). The batch is the deterministic doc_id % 5 == 0 slice
    * (~20%) so both engines split identically; the rest plays the standing
    * corpus. Two stages, each per-source profiled:
    * (1) EXACT: batch docs whose md5 digest already exists — the probe
    *     ships 16-byte digests, never text, and in production the
    *     existing-digest set is a persisted index, not a rescan;
    * (2) NEAR-DUP: exact-survivors sharing df-capped bigram shingles with
    *     an existing doc at Jaccard ≥ 0.5 — the same inverted-index
    *     discipline as [[shingleJaccard]], but the postings join is
    *     batch×existing (small×large), never existing×existing: the big
    *     side is touched once to build/refresh the capped shingle index
    *     and the per-key pair work is bounded by df_batch · df_exist ≤
    *     cap². The df-cap is computed on the EXISTING side (that is the
    *     distribution production knows ahead of the batch).
    * Output: per-source batch size, exact drops, near-dup drops,
    * survivors — the numbers an ingest dashboard reports.
    */
  val incrementalDedup = Q(
    "llm_incremental_dedup",
    s"""WITH batch AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 = 0),
      |exist AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
      |eh AS (SELECT DISTINCT md5(text) AS h FROM exist),
      |bstat AS (
      |  SELECT doc_id, source, text,
      |    CASE WHEN h IS NOT NULL THEN 1 ELSE 0 END AS is_exact
      |  FROM batch LEFT JOIN eh ON md5(batch.text) = eh.h),
      |shx0 AS (
      |  ${shingleSelectSql("exist")}),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM shx0),
      |keys AS (
      |  SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM shx0 GROUP BY 1) CROSS JOIN nd
      |  WHERE df <= least($shingleDfFrac * n_docs, $shingleDfAbs)),
      |shx AS (SELECT s.doc_id, s.sh FROM shx0 s JOIN keys USING (sh)),
      |shb0 AS (
      |  ${shingleSelectSql("bstat WHERE is_exact = 0")}),
      |shb AS (SELECT s.doc_id, s.sh FROM shb0 s JOIN keys USING (sh)),
      |szx AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY 1),
      |szb AS (SELECT doc_id, COUNT(*) AS n FROM shb GROUP BY 1),
      |inter AS (
      |  SELECT b.doc_id AS bid, x.doc_id AS xid, COUNT(*) AS c
      |  FROM shb b JOIN shx x ON b.sh = x.sh GROUP BY 1, 2),
      |nears AS (
      |  SELECT DISTINCT bid FROM inter
      |  JOIN szb ON inter.bid = szb.doc_id
      |  JOIN szx ON inter.xid = szx.doc_id
      |  WHERE CAST(c AS DOUBLE) / (szb.n + szx.n - c) >= $shingleJaccardThreshold)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_batch,
      |  CAST(SUM(is_exact) AS BIGINT) AS n_exact_dup,
      |  CAST(SUM(CASE WHEN is_exact = 0 AND bid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
      |  CAST(SUM(CASE WHEN is_exact = 0 AND bid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_survive
      |FROM bstat LEFT JOIN nears ON bstat.doc_id = nears.bid
      |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "source", "text")
    val exist = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    val eh = exist.select(md5(col("text")).as("h")).distinct()
    // bstat feeds the near-dup shingling AND the final per-source rollup —
    // checkpoint so the digest join runs once (the usual fan-out rule)
    val bstat = batch.join(eh, md5(col("text")) === col("h"), "left")
      .select(col("doc_id"), col("source"),
        when(col("h").isNotNull, 1).otherwise(0).as("is_exact"), col("text"))
      .localCheckpoint()
    val shx0 = bigramShingles(exist).localCheckpoint() // census + cap + postings
    val nd = shx0.agg(countDistinct("doc_id").as("n_docs"))
    val keys = shx0.groupBy("sh").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd))
      .filter(col("df") <= least(lit(shingleDfFrac) * col("n_docs"), lit(shingleDfAbs)))
      .select("sh")
    val shx = shx0.join(keys, Seq("sh"), "left_semi").localCheckpoint()
    val shb = bigramShingles(bstat.filter(col("is_exact") === 0))
      .join(keys, Seq("sh"), "left_semi").localCheckpoint()
    val szx = shx.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val szb = shb.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shb.select(col("doc_id").as("bid"), col("sh"))
      .join(shx.select(col("doc_id").as("xid"), col("sh")), Seq("sh"))
      .groupBy("bid", "xid").agg(count(lit(1)).as("c"))
    val jac = col("c").cast("double") / (col("bn") + col("xn") - col("c"))
    val nears = inter
      .join(szb.select(col("doc_id").as("bid"), col("n").as("bn")), Seq("bid"))
      .join(szx.select(col("doc_id").as("xid"), col("n").as("xn")), Seq("xid"))
      .filter(jac >= shingleJaccardThreshold)
      .select("bid").distinct()
    bstat.join(nears, bstat("doc_id") === nears("bid"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_batch"),
        sum("is_exact").as("n_exact_dup"),
        sum(when(col("is_exact") === 0 && col("bid").isNotNull, 1).otherwise(0)).as("n_neardup"),
        sum(when(col("is_exact") === 0 && col("bid").isNull, 1).otherwise(0)).as("n_survive"))
      .orderBy("source")
  }

  /** D4 (embedding health): per-dimension mean / spread / range over the
    * whole corpus — the drift check that catches a dead dimension, a
    * mis-scaled encoder, or a normalization bug before billions of vectors
    * are indexed. posexplode fans each vector into (dim, value) rows and a
    * partial-aggregating groupBy on the 64 dimension ids does the rest: the
    * shuffle carries one row per (partition × dim), never per vector, so
    * the pass is a single linear scan at any corpus size. Values widen
    * float→double before any arithmetic on both sides; at 4 decimals the
    * sum-order nondeterminism of a distributed mean/stddev is far below the
    * rounding quantum.
    */
  val embedDimStats = Q(
    "llm_embed_dim_stats",
    """SELECT i - 1 AS dim, COUNT(*) AS n,
      |  ROUND(AVG(CAST(x AS DOUBLE)), 4) + 0 AS mean,
      |  ROUND(STDDEV_SAMP(CAST(x AS DOUBLE)), 4) AS std,
      |  ROUND(MIN(CAST(x AS DOUBLE)), 4) + 0 AS min_v,
      |  ROUND(MAX(CAST(x AS DOUBLE)), 4) + 0 AS max_v
      |FROM (
      |  SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
      |  FROM embeddings) t
      |GROUP BY i ORDER BY dim""".stripMargin) { (s, dir) =>
    // `+ 0` on mean/min_v/max_v: a dimension whose mean rounds to zero from
    // below (dims 9 and 24 at sf0.1: means ≈ −2e−05) prints -0 in DuckDB
    // and 0 here — same sign-of-zero class as first_val/corr_qd (Funcs).
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x").cast("double").as("x"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("x")), 4).as("mean"),
        round(stddev_samp(col("x")), 4).as("std"),
        round(min(col("x")), 4).as("min_v"),
        round(max(col("x")), 4).as("max_v"))
      .orderBy("dim")
  }

  /** D4 (transform, not just profile): project every embedding onto the
    * unit sphere and ship the normalized vector itself through the hash
    * gate — the preprocessing step in front of any cosine-metric index
    * (normalize once, then cosine ≡ dot product). Map-only, codegen'd
    * kernel, no shuffle. The unit vector dumps as its components scaled to
    * 1e-4 quanta and cast to integers, joined into one scalar string: it
    * pins all 64 components bit-for-bit across engines while sidestepping
    * the one thing that CANNOT be made portable here — Java vs C float
    * repr (Jackson prints 0.0001 as 1.0E-4) and the sign of a rounded
    * −0.0 (the integer cast collapses it to 0 on both engines).
    */
  val embedNormalize = Q(
    "llm_embed_normalize",
    """WITH t AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings)
      |SELECT vec_id, ROUND(nrm, 4) AS norm,
      |  array_to_string(list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 10000 / nrm, 0) AS BIGINT)), ',')
      |    AS unit_q4
      |FROM t WHERE nrm > 0 ORDER BY vec_id""".stripMargin) { (s, dir) =>
    // nrm > 0 is a structural guard, not a fixture assumption: an all-zero
    // (dead) vector would divide by zero — NaN→0 here vs NULL in DuckDB.
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        vectors.l2Norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), round(col("nrm"), 4).as("norm"),
        concat_ws(",", transform(col("embedding"),
          x => round(x.cast("double") * 10000 / col("nrm"), 0).cast("long")))
          .as("unit_q4"))
      .orderBy("vec_id")
  }

  /** D2 (exact-substring form): per-document duplicated-span fraction —
    * what share of a doc's word-5-gram positions also occur in at least one
    * OTHER document. This is the doc-level signal behind exact-substring
    * dedup (drop or trim docs whose text is largely copied elsewhere),
    * complementing the set-similarity ops: Jaccard/MinHash ask "how similar
    * is this PAIR", this asks "how much of THIS doc is non-original".
    *
    * Shape is linear, not pairwise: positional 5-grams explode map-side,
    * collapse to the DISTINCT (doc, gram) set in one hash agg, and each
    * gram's document frequency is that set's per-gram row count — a
    * COUNT(*) window over the gram partition, no df census table and no
    * join-back. No postings self-join, so no df-cap is needed: a
    * boilerplate gram shared by every doc costs rows linear in corpus
    * size. Docs with fewer than five tokens emit no grams and drop out on
    * both sides.
    */
  val dupSpanFraction = Q(
    "llm_dup_span_fraction",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts) - 3),
      |    i -> array_to_string(ts[i:i+4], ' '))) AS gram
      |  FROM toks WHERE len(ts) >= 5),
      |dfc AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY 1)
      |SELECT g.doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  ROUND(CAST(SUM(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 4) AS dup_frac
      |FROM grams g JOIN dfc USING (gram)
      |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // tokenize ONCE into a materialized column: slice() inside the lambda
    // references the token array per gram position, and an inlined
    // filter(split(...)) tree would re-tokenize the full text for every
    // position — O(len²) per doc. As a multiply-referenced non-cheap alias
    // CollapseProject keeps `ts` a real column, so per-position work is the
    // O(5) slice alone.
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    // one explode pass, then ONE (doc, gram) pre-aggregation with a SINGLE
    // consumer: each row of perDoc is a distinct (doc, gram), so the
    // gram's document frequency is just that partition's row count —
    // COUNT(*) OVER (PARTITION BY gram) — and the df census + join-back of
    // the two-consumer shape collapses into one window pass. This retires
    // the r12 localCheckpoint here, which materialized every distinct
    // 5-gram STRING per doc (a corpus-scale payload, not a reduction —
    // the rule the r12 llm_ann_lsh A/B established); now perDoc is
    // consumed once and nothing is materialized at all.
    val perDoc = Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("ts"))
      .select(col("doc_id"),
        explode(transform(
          when(size(col("ts")) >= lit(5), sequence(lit(1), size(col("ts")) - 4))
            .otherwise(array().cast("array<int>")),
          i => concat_ws(" ", slice(col("ts"), i, lit(5))))).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("n_occ"))
    perDoc
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_grams"),
        sum(when(col("df") >= 2, col("n_occ")).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_grams"), 4).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** The ACTION to [[dupSpanFraction]]'s metric — duplicate-span REMOVAL
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better": cut the repeated substring, keep the rest of the document):
    * every token position covered by a word-5-gram that also appears in
    * ANOTHER document is dropped, and the surviving tokens re-join into
    * the cleaned text. Coverage derives from gram START positions with a
    * 4-preceding window max — token i is covered iff any dup gram starts
    * in [i−4, i] — so the whole rewrite is the dup-span gram-df join plus
    * ONE doc-ordered window pass; no pairwise document comparison exists
    * anywhere. Fully-duplicated docs clean to the empty string (their
    * text lives elsewhere); sub-5-token docs have no grams and pass
    * through verbatim (lowercased — the rewrite operates on the
    * normalized token stream).
    */
  val dupSpanRemoval = Q(
    "llm_dup_span_removal",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, u.pos AS i, u.tok AS tok FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, CAST(len(ts) AS INTEGER) + 1),
      |      i -> struct_pack(pos := i, tok := ts[i]))) AS u
      |    FROM toks) t),
      |grams AS (
      |  SELECT doc_id, u.pos AS p, u.gram AS gram FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, CAST(len(ts) AS INTEGER) - 3),
      |      i -> struct_pack(pos := i, gram := array_to_string(ts[i:i+4], ' ')))) AS u
      |    FROM toks WHERE len(ts) >= 5) t),
      |dfc AS (
      |  SELECT gram, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY 1),
      |dstart AS (
      |  SELECT g.doc_id, g.p FROM grams g JOIN dfc USING (gram) WHERE dfc.df >= 2),
      |flags AS (
      |  SELECT t.doc_id, t.i, t.tok,
      |    CASE WHEN d.p IS NOT NULL THEN 1 ELSE 0 END AS st
      |  FROM tok t LEFT JOIN dstart d ON t.doc_id = d.doc_id AND t.i = d.p),
      |cov AS (
      |  SELECT doc_id, i, tok,
      |    MAX(st) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS covered
      |  FROM flags)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tok,
      |  CAST(SUM(covered) AS BIGINT) AS n_removed,
      |  ROUND(CAST(SUM(covered) AS DOUBLE) / COUNT(*), 4) AS removed_frac,
      |  COALESCE(string_agg(CASE WHEN covered = 0 THEN tok END, ' ' ORDER BY i), '')
      |    AS cleaned_text
      |FROM cov GROUP BY doc_id
      |UNION ALL
      |SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0.0, ''
      |FROM toks WHERE len(ts) = 0
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val ts = filter(split(lower(col("text")), " "), t => t =!= "")
    val base = Tables.documents(s, dir).select(col("doc_id"), ts.as("ts"))
    val tok = base.select(col("doc_id"), posexplode(col("ts")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("i"), col("tok"))
    val grams = base
      .filter(size(col("ts")) >= 5)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ts")) - 4),
        i => struct(i.as("p"), concat_ws(" ", slice(col("ts"), i, lit(5))).as("gram")))).as("u"))
      .select(col("doc_id"), col("u.p").as("p"), col("u.gram").as("gram"))
    val dfc = grams.select("doc_id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
    val dstart = grams.join(dfc, "gram").filter(col("df") >= 2)
      .select(col("doc_id").as("d_id"), col("p"))
    val w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-4, Window.currentRow)
    val cleaned = tok
      .join(dstart, col("doc_id") === col("d_id") && col("i") === col("p"), "left")
      .select(col("doc_id"), col("i"), col("tok"),
        when(col("p").isNotNull, 1).otherwise(0).as("st"))
      .withColumn("covered", max("st").over(w))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum("covered").as("n_removed"),
        round(sum("covered").cast("double") / count(lit(1)), 4).as("removed_frac"),
        array_join(transform(
          array_sort(collect_list(when(col("covered") === 0, struct(col("i"), col("tok"))))),
          e => e.getField("tok")), " ").as("cleaned_text"))
    // zero-token (empty/whitespace) docs vanish from posexplode on both
    // engines; a consumer joining cleaned_text back would lose them. Emit
    // an explicit all-zero row so no document is ever dropped (the same
    // no-row-dropped contract gopherDocFilter documents).
    val empties = base.filter(size(col("ts")) === 0)
      .select(col("doc_id"), lit(0L).as("n_tok"), lit(0L).as("n_removed"),
        lit(0.0).as("removed_frac"), lit("").as("cleaned_text"))
    cleaned.unionByName(empties).orderBy("doc_id")
  }

  /** Embedding clustering E-step (the building block of k-means curation
    * clustering / semantic mixing): assign every vector to its
    * max-cosine centroid and profile the clusters. Centroids here are the
    * k=8 lowest vec_ids — a deterministic seed choice; a real loop feeds
    * the M-step means back in, same plan shape every iteration.
    *
    * 100 TB: the k-row centroid table broadcasts, assignment is a map-side
    * argmax over the corpus scan (corpus never shuffles — the codegen'd
    * cosine kernel runs inside the scan pipeline), and the final profile
    * aggregates on k keys. Assignment ranks on ROUND(cos,4) with
    * centroid-id tie-break, the same cross-engine-stable ordering the knn
    * top-k uses.
    */
  /** The shared E-step of the centroid family (llm_centroid_assign,
    * llm_embed_outliers, llm_semdedup): every vector's max-cosine centroid
    * as a MAP-SIDE argmax — `min(struct(−round(cos,4), c_id))` over the
    * centroids inlined as literals, the exact winner of the declared
    * `ORDER BY cos_sim DESC, c_id` window (double negation is a bit-exact
    * involution; the struct ordering ties on the same rounded doubles and
    * breaks on the same c_id). The centroids are k driver-collected rows
    * (the PCA co-moment / Lloyd metadata discipline), so the assignment
    * runs with ZERO exchanges: the window formulation this replaces
    * shuffled the whole corpus (embedding payload included) through a
    * vec_id exchange per consumer just to rank k broadcast rows that were
    * already co-resident with each vector. Returns (vec_id, embedding,
    * best) — callers project `best.c_id` / `−best.nc`.
    *
    * NaN note: a zero-norm vector or centroid would make cos NaN, which
    * Spark's struct-min ranks LAST while the window's DESC ranked it
    * first; no fixture contains a zero-norm embedding (checked at all
    * three SFs) and the PQ family already norm-filters, so the declared
    * results are unaffected.
    */
  private def centroidArgmax(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    val entries = cents.map { case (cid, cemb) =>
      struct((-round(vectors.cosineSim(col("embedding"), typedlit(cemb)), 4)).as("nc"),
        lit(cid).as("c_id"))
    }
    e.select(col("vec_id"), col("embedding"),
      array_min(array(entries: _*)).as("best"))
  }

  val centroidAssign = Q(
    "llm_centroid_assign",
    """WITH c AS (
      |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
      |sim AS (
      |  SELECT e.vec_id, c.c_id,
      |    ROUND(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
      |      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
      |       * sqrt(list_dot_product(c.c_emb::DOUBLE[], c.c_emb::DOUBLE[]))), 4)
      |      AS cos_sim
      |  FROM embeddings e CROSS JOIN c),
      |asg AS (
      |  SELECT vec_id, c_id, cos_sim,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, c_id) AS rn
      |  FROM sim)
      |SELECT c_id, COUNT(*) AS n_members, ROUND(AVG(cos_sim), 4) + 0 AS avg_sim
      |FROM asg WHERE rn = 1 GROUP BY c_id ORDER BY c_id""".stripMargin) { (s, dir) =>
    // map-side argmax (r13, [[centroidArgmax]]): the corpus never
    // shuffles; the profile aggregates on k keys
    centroidArgmax(Tables.embeddings(s, dir))
      .select(col("best.c_id").as("c_id"), (-col("best.nc")).as("cos_sim"))
      .groupBy("c_id")
      .agg(count(lit(1)).as("n_members"),
        (round(avg("cos_sim"), 4) + lit(0.0)).as("avg_sim"))
      .orderBy("c_id")
  }

  /** Embedding outlier filter: vectors whose centroid similarity sits more
    * than 1.5σ below their cluster's mean (2σ is the usual production
    * cut; the fixture embeddings are near-uniform with min z ≈ −1.8, so
    * 1.5σ keeps the gate exercising real rows) — the curation gate that drops
    * mis-embedded/garbage vectors before training. Builds on the
    * [[centroidAssign]] assignment; cluster stats (mean, σ of the rounded
    * cos) are quantized to 4 dp on BOTH sides before the z-score, so the
    * z division runs on bit-identical inputs cross-engine (avg/stddev
    * accumulation order differs between engines; quantizing first removes
    * the last-ulp exposure). σ=0 clusters (all-identical sims) are
    * structurally excluded — z would divide by zero and no member can be
    * an outlier.
    *
    * 100 TB: two map-side passes over the corpus (assign, then re-join the
    * 8-row quantized stats broadcast); nothing corpus-sized shuffles.
    */
  val embedOutliers = Q(
    "llm_embed_outliers",
    """WITH c AS (
      |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
      |sim AS (
      |  SELECT e.vec_id, c.c_id,
      |    ROUND(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
      |      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
      |       * sqrt(list_dot_product(c.c_emb::DOUBLE[], c.c_emb::DOUBLE[]))), 4)
      |      AS cos_sim
      |  FROM embeddings e CROSS JOIN c),
      |asg AS (
      |  SELECT vec_id, c_id, cos_sim,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, c_id) AS rn
      |  FROM sim),
      |stats AS (
      |  SELECT c_id, ROUND(AVG(cos_sim), 4) AS mean4,
      |    ROUND(STDDEV_SAMP(cos_sim), 4) AS std4
      |  FROM asg WHERE rn = 1 GROUP BY c_id)
      |SELECT a.vec_id, a.c_id, a.cos_sim + 0 AS cos_sim,
      |  ROUND((a.cos_sim - s.mean4) / s.std4, 4) AS z
      |FROM asg a JOIN stats s USING (c_id)
      |WHERE a.rn = 1 AND s.std4 > 0
      |  AND (a.cos_sim - s.mean4) / s.std4 < -1.5
      |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    // map-side argmax (r13, [[centroidArgmax]]): assignment costs zero
    // exchanges; only (vec_id, c_id, cos_sim) reaches the stats rollup
    val asg = centroidArgmax(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("best.c_id").as("c_id"),
        (-col("best.nc")).as("cos_sim"))
    val stats = asg.groupBy("c_id")
      .agg(round(avg("cos_sim"), 4).as("mean4"),
        round(stddev_samp("cos_sim"), 4).as("std4"))
    val z = (col("cos_sim") - col("mean4")) / col("std4")
    asg.join(broadcast(stats), "c_id")
      .filter(col("std4") > 0 && z < -1.5)
      .select(col("vec_id"), col("c_id"),
        (col("cos_sim") + lit(0.0)).as("cos_sim"), round(z, 4).as("z"))
      .orderBy("vec_id")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the corpus, then search for near-duplicate pairs ONLY within
    * each cluster, dropping every vector that has a lower-id in-cluster
    * neighbor above the similarity threshold. Output: the dropped vectors
    * with their kept representative (min-id qualifying neighbor) — the
    * artifact a curation pipeline feeds to the filter stage.
    *
    * This is the scale answer to the exact all-pairs scan's inherent n²/2
    * ([[exactCosinePairs]]): the cluster assignment (broadcast k
    * centroids, map-side argmax — corpus never shuffles) cuts candidate
    * pairs to Σ|cluster|²/2, and within each cluster the same block-grid
    * equi-join distributes the remaining work in B² bounded cells keyed on
    * (c_id, ci, cj). k and B are the two knobs: k grows with corpus size
    * (SemDeDup used 50k clusters on LAION), B with the cluster. Threshold
    * 0.4 matches the near-dup family on this near-uniform fixture (real
    * text embeddings use
    * ~0.95+); assignment ranks on ROUND(cos,4) with centroid-id tie-break,
    * the cross-engine-stable ordering centroidAssign established.
    */
  val semDedup = Q(
    "llm_semdedup",
    """WITH c AS (
      |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
      |sim AS (
      |  SELECT e.vec_id, e.embedding, c.c_id,
      |    ROUND(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
      |      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
      |       * sqrt(list_dot_product(c.c_emb::DOUBLE[], c.c_emb::DOUBLE[]))), 4) AS cos_c
      |  FROM embeddings e CROSS JOIN c),
      |asg AS (
      |  SELECT vec_id, embedding, c_id FROM (
      |    SELECT vec_id, embedding, c_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, c_id) AS rn
      |    FROM sim) t WHERE rn = 1),
      |pairs AS (
      |  SELECT a.c_id, a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      |      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
      |       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cs
      |  FROM asg a JOIN asg b ON a.c_id = b.c_id AND a.vec_id < b.vec_id),
      |drops AS (
      |  SELECT c_id, id_b AS vec_id, id_a AS dup_of, ROUND(cs, 4) AS cos_sim,
      |    row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
      |  FROM pairs WHERE cs >= 0.4)
      |SELECT vec_id, c_id, dup_of, cos_sim FROM drops WHERE rn = 1
      |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val numBlocks = 8
    // map-side argmax (r13, [[centroidArgmax]]): the r12 window form
    // shuffled the corpus (vectors included) through a vec_id exchange
    // PER GRID SIDE; now each side re-derives the assignment in its own
    // scan pipeline with zero exchanges. Still NOT checkpointed: the
    // assignment carries the vectors (the annLsh payload rule) and the
    // argmax is k codegen'd cosine kernels per row, cheaper than a
    // row-format corpus copy at any scale.
    val asg = centroidArgmax(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("best.c_id").as("c_id"), col("embedding"))
    // Same one-cell-per-unordered-pair block grid as nearDupCosine, with the
    // cluster id joined in front — pairs never cross clusters.
    val aSide = asg
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("c_id"),
        pmod(col("vec_id"), lit(numBlocks)).as("blk_a"))
      .withColumn("cj", explode(sequence(col("blk_a"), lit(numBlocks - 1))))
      .withColumnRenamed("blk_a", "ci")
    val bSide = asg
      .select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("c_id"),
        pmod(col("vec_id"), lit(numBlocks)).as("blk_b"))
      .withColumn("ci", explode(sequence(lit(0), col("blk_b"))))
      .withColumnRenamed("blk_b", "cj")
    val cos = vectors.cosineSim(col("emb_a"), col("emb_b"))
    val wDrop = Window.partitionBy("v").orderBy(col("u").asc)
    aSide.join(bSide, Seq("c_id", "ci", "cj"))
      .filter(col("id_a") =!= col("id_b") &&
        (col("ci") =!= col("cj") || col("id_a") < col("id_b")))
      // MaterializeOnce (r12, guide §4.4): the threshold filter otherwise
      // pushes into the join as a residual with the cosine kernel inlined,
      // and the rounded output re-derives it — one evaluation per pair,
      // the in-cluster pair scan's whole cost
      .withColumn("cs", graft.functions.MaterializeOnce(cos))
      .filter(col("cs") >= 0.4)
      .select(col("c_id"),
        least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"),
        round(col("cs"), 4).as("cos_sim"))
      .withColumn("rn", row_number().over(wDrop))
      .filter(col("rn") === 1)
      .select(col("v").as("vec_id"), col("c_id"), col("u").as("dup_of"), col("cos_sim"))
      .orderBy("vec_id")
  }

  /** D4 (embedding redundancy): the most-correlated dimension pairs — the
    * diagnostic run before dimensionality reduction or feature pruning
    * (|corr| ≈ 1 between two dimensions means one of them buys nothing).
    *
    * Plan: the per-partition Gram/co-moment accumulation — each vector
    * folds into ONE flat buffer of (n, Σxᵢ, Σxᵢxⱼ) in place
    * ([[graft.functions.CorrComomentAgg]]), so the scan has no row fanout
    * at all and the shuffle carries partitions × one 2145-double buffer;
    * the 2016 Pearson values are a driver-side O(d²) loop over the single
    * result row (metadata in the k-means-centroid sense), ranked by a
    * small local sort. This replaced the in-row expansion of d(d−1)/2
    * pair structs per vector (2016 generated rows × corpus feeding 2016
    * built-in `corr` aggregates) when that Generate became the suite's #1
    * cost — the rework its own docstring had named for d in the
    * thousands turns out to win at d=64 too. (The oracle spells the same
    * statistic as an unnest self-join because SQL lacks the buffer form;
    * only the values must match, not the plan.) Linear in corpus size
    * with a d² constant. Selection runs on ROUND(corr, 4) with a
    * (d_i, d_j) tiebreak so both engines pick the same top rows despite
    * sum-order float jitter (corr is consumed once, unamplified — the
    * kmeans measure-zero-midpoint precedent; contrast the PCA chain,
    * which quantizes because iteration would amplify).
    */
  val embedCorrPairs = Q(
    "llm_embed_corr_pairs",
    """WITH px AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |pairs AS (
      |  SELECT a.dim AS d_i, b.dim AS d_j,
      |    ROUND(corr(a.x, b.x), 4) + 0 AS corr_v
      |  FROM px a JOIN px b ON a.vec_id = b.vec_id AND a.dim < b.dim
      |  GROUP BY a.dim, b.dim)
      |SELECT d_i, d_j, corr_v FROM pairs
      |ORDER BY abs(corr_v) DESC, d_i, d_j LIMIT 10""".stripMargin) { (s, dir) =>
    import s.implicits._
    // null vectors are skipped, matching the old explode-of-null behavior
    // AND the oracle (unnest of a NULL array emits no rows); an EMPTY
    // corpus answers empty, like the oracle — not a driver .head crash
    val emb = Tables.embeddings(s, dir).filter(col("embedding").isNotNull)
    val pairs = emb.select(size(col("embedding"))).limit(1).collect()
      .headOption.map(_.getInt(0)) match {
      case None => Seq.empty[(Long, Long, Double)]
      case Some(d) =>
        val m = emb
          .select(transform(col("embedding"), x => x.cast("double")).as("v"))
          .agg(graft.functions.CorrComomentAgg.udaf(d)(col("v")).as("m"))
          .head.getSeq[Double](0)
        for { i <- 0 until d; j <- i + 1 until d }
          yield (i.toLong, j.toLong, graft.functions.CorrComomentAgg.corrOf(m, d, i, j))
    }
    pairs.toDF("d_i", "d_j", "c")
      .select(col("d_i"), col("d_j"), (round(col("c"), 4) + lit(0.0)).as("corr_v"))
      .orderBy(abs(col("corr_v")).desc, col("d_i"), col("d_j"))
      .limit(10)
  }

  /** One Lloyd E-step: assign each vector to its nearest centroid by
    * squared Euclidean distance (|a|² + |c|² − 2·a·c, all three terms in
    * the codegen'd kernels). The centroid side is ≤ k rows and broadcast —
    * the corpus NEVER shuffles during assignment, the one property that
    * makes distributed k-means affordable at 100 TB. Ties break on c_id
    * so assignment is a deterministic function of (vectors, centroids).
    */
  def kmeansAssign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val d2 = vectors.dotProduct(col("embedding"), col("embedding")) +
      vectors.dotProduct(col("c_emb"), col("c_emb")) -
      lit(2.0) * vectors.dotProduct(col("embedding"), col("c_emb"))
    val w = Window.partitionBy("vec_id").orderBy(col("d2").asc, col("c_id").asc)
    e.join(broadcast(centroids))
      .withColumn("d2", d2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id"), col("d2"))
  }

  /** One Lloyd M-step: recompute each centroid as the element-wise mean of
    * its members. posexplode fans (vector, dim) rows into a partial-agged
    * groupBy on ≤ k·d keys — the shuffle carries partitions × k·d partial
    * sums, never vectors — and collect_list reassembles the ≤ k result
    * arrays. Cast back to float so the next E-step's kernels see the same
    * `array<float>` type the corpus has.
    */
  def kmeansCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("c_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("c_id", "pos").agg(avg("v").as("m"))
      .groupBy("c_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m").cast("float")).as("c_emb"))

  /** Full Lloyd loop: deterministic first-k seeding (same convention as
    * [[semDedup]]'s coarse clustering; k-means++ would serialize k
    * corpus passes for a marginally better seed — not worth it when the
    * loop itself repairs the seed in 2–3 iterations), then `iters` fixed
    * E+M rounds. Fixed iteration count, no convergence probe: at 100 TB
    * each round is a full corpus scan, so production k-means budgets
    * rounds up front (LlmOpsSpec pins that SSE is non-increasing round
    * over round, the Lloyd invariant). Per round the only driver action
    * is the k-row centroid localCheckpoint that truncates lineage —
    * metadata-sized, the same pattern clusterPairs uses.
    */
  def kmeans(e: DataFrame, k: Int, iters: Int): DataFrame = {
    var c = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      c = kmeansCentroids(kmeansAssign(e, c)).localCheckpoint()
      it += 1
    }
    kmeansAssign(e, c)
  }

  /** D3/D9 (trainer): k-means cluster profile of the embedding corpus
    * after 3 Lloyd rounds — the "train" step SemDeDup-style curation, IVF
    * coarse quantizers, and domain-mixing cluster budgets all start from.
    * Output: per-cluster size and mean within-cluster squared distance
    * (the per-cluster SSE contribution).
    *
    * Oracled via the PageRank/BPE precedent (MATERIALIZED-CTE unroll):
    * the fixed 3-round loop is deterministic up to float summation order
    * — distances are the SAME |a|²+|c|²−2a·c double kernel on both
    * engines (`list_dot_product(x::DOUBLE[])` ≡ the codegen'd
    * VectorOps.dot, bit-for-bit), assignments tiebreak on c_id, and the
    * M-step means cast back to FLOAT on both sides, which absorbs
    * last-ulp summation drift far below the float gap. mean_d2 rounds at
    * 4 decimals per the embedDimStats precedent. The residual flake risk
    * (a mean landing within 1e-12 of a float-rounding midpoint, or two
    * centroids within 1e-7 of equidistant to some vector) is measure-zero
    * on this corpus — and the QUALIFY argmin mirrors the row_number
    * tiebreak exactly.
    */
  val kmeansEmbed: Q = {
    def assign(r: Int, cin: String): String =
      s"""a$r AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding, c.c_id,
         |    list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
         |    + list_dot_product(c.c_emb::DOUBLE[], c.c_emb::DOUBLE[])
         |    - 2.0 * list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) AS d2
         |  FROM embeddings e CROSS JOIN $cin c
         |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY d2 ASC, c.c_id ASC) = 1)""".stripMargin
    def mstep(r: Int): String =
      s"""c$r AS MATERIALIZED (
         |  SELECT c_id, list_transform(list(m ORDER BY pos), x -> CAST(x AS FLOAT)) AS c_emb
         |  FROM (
         |    SELECT c_id, z[2] AS pos, avg(z[1]) AS m
         |    FROM (SELECT c_id, unnest(list_zip(embedding, range(1, len(embedding) + 1))) AS z FROM a$r)
         |    GROUP BY c_id, z[2])
         |  GROUP BY c_id)""".stripMargin
    val sql =
      """WITH c0 AS MATERIALIZED (
        |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
        |""".stripMargin +
        (1 to 3).map(r => assign(r, s"c${r - 1}") + ",\n" + mstep(r)).mkString(",\n") +
        ",\n" + assign(4, "c3") + """
          |SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n, ROUND(AVG(d2), 4) AS mean_d2
          |FROM a4 GROUP BY c_id ORDER BY c_id""".stripMargin
    Q("llm_kmeans", sql) { (s, dir) =>
      kmeans(Tables.embeddings(s, dir).select("vec_id", "embedding"), 8, 3)
        .groupBy("c_id")
        .agg(count(lit(1)).as("n"), round(avg("d2"), 4).as("mean_d2"))
        .orderBy("c_id")
    }
  }

  /** Exact integer co-moments of the 1e-5-quantized embedding dimensions,
    * upper triangle (d_i ≤ d_j): n, Σqᵢ, Σqⱼ, Σqᵢqⱼ over
    * q = ROUND(x·10⁵) — all BIGINT, so every sum is fold-order-free and
    * both engines hold the IDENTICAL integers before the one double
    * division that forms the covariance. Accumulation is a typed
    * [[graft.functions.PcaComomentAgg]] aggregator: each vector folds its
    * d(d+1)/2 products into a flat per-partition Array[Long] buffer
    * in-place (no row fanout at all — r6's exploded formulation pushed
    * 10M+ pair rows through the hash aggregate at sf0.1), and the shuffle
    * carries ONE 2145-long array per partition to the single reduce group.
    * Overflow bound: |q| ≤ 5.3e4 ⇒ n·Σqᵢqⱼ ≤ 7e16 at sf0.1's 5k vectors,
    * well inside BIGINT; the 100 TB form swaps the co-moments to
    * DECIMAL(38,0), same plan.
    */
  private def pcaComoments(s: SparkSession, dir: String): DataFrame = {
    val d = 64
    // Quantization stays a Catalyst expression (same round/cast as before),
    // so the integers the aggregator folds are bit-identical to the ones
    // the old exploded formulation summed; the UDAF merely removes the
    // d(d+1)/2-per-vector row fanout. A regenerated fixture with a
    // different dimension fails loudly in PcaComomentAgg.reduce's require.
    val q = expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 100000.0, 0) as bigint))")
    val one = Tables.embeddings(s, dir)
      .select(q.as("q"))
      .agg(graft.functions.PcaComomentAgg.udaf(d)(col("q")).as("m"))
    // Unroll the flat buffer (ONE metadata row) back into the 2080
    // (d_i, d_j) co-moment rows pcaCov expects. element_at is 1-based;
    // the upper-triangle flat index of (i, j) is i·d − i(i−1)/2 + (j − i).
    one.select(explode(expr(
      s"""flatten(transform(sequence(0, ${d - 1}), i ->
         |  transform(sequence(i, ${d - 1}), j -> struct(
         |    cast(i as bigint) as d_i, cast(j as bigint) as d_j,
         |    element_at(m, 1) as n,
         |    element_at(m, 2 + i) as si,
         |    element_at(m, 2 + j) as sj,
         |    element_at(m, cast(
         |      2 + $d + i * $d - ((i * (i - 1)) div 2) + (j - i) as int))
         |      as sij))))""".stripMargin)).as("p"))
      .select(col("p.d_i"), col("p.d_j"), col("p.n"), col("p.si"),
        col("p.sj"), col("p.sij"))
  }

  /** Unrounded covariance from [[pcaComoments]]: population covariance of
    * the quantized values, (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ)/n²/10¹⁰ — ONE double
    * expression over exact BIGINTs, so the value is a deterministic
    * function of the corpus (no fold-order jitter to amplify through the
    * power iteration downstream).
    */
  private def pcaCov(co: DataFrame): DataFrame =
    co.select(col("d_i"), col("d_j"),
      ((col("n") * col("sij") - col("si") * col("sj")).cast("double")
        / (col("n").cast("double") * col("n")) / lit(1e10)).as("cov"))

  /** D4 (dimensionality reduction, step 1): the 64×64 covariance matrix of
    * the embedding corpus — the distributed half of PCA, and the only part
    * that touches the corpus. Hash-green by construction: covariance is
    * defined ON the quantized values (an exact integer computation both
    * engines reproduce bit-for-bit), not a float approximation of the
    * unquantized one; at 10⁻⁵ quantization the two differ in the 9th
    * decimal, far under the 6dp dump. One corpus scan, no shuffle of
    * vectors, 2080-row output.
    */
  val embedPcaCov = Q(
    "llm_embed_pca_cov",
    """WITH px AS (
      |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
      |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 100000, 0) AS BIGINT) AS q
      |  FROM embeddings),
      |p AS (
      |  SELECT a.dim AS d_i, b.dim AS d_j, COUNT(*) AS n,
      |    SUM(a.q) AS si, SUM(b.q) AS sj, SUM(a.q * b.q) AS sij
      |  FROM px a JOIN px b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      |  GROUP BY 1, 2)
      |SELECT d_i, d_j,
      |  ROUND(CAST(n * sij - si * sj AS DOUBLE) / (CAST(n AS DOUBLE) * n) / 1e10, 6)
      |    + 0 AS cov_v
      |FROM p ORDER BY d_i, d_j""".stripMargin) { (s, dir) =>
    pcaCov(pcaComoments(s, dir))
      .select(col("d_i"), col("d_j"),
        (round(col("cov"), 6) + lit(0.0)).as("cov_v"))
      .orderBy("d_i", "d_j")
  }

  /** D4 (dimensionality reduction, step 2): top principal component by
    * power iteration — 16 rounds of v ← Cv/‖Cv‖ on the covariance matrix
    * from [[pcaCov]], plus the Rayleigh quotient λ = vᵀCv. The corpus is
    * touched exactly once (the distributed co-moment scan); the 2080
    * covariance cells are then COLLECTED and the iteration runs
    * driver-side — they are metadata in the k-means-centroid sense, and
    * r6's bench showed 85% of the old 16-Spark-jobs formulation was pure
    * job-launch overhead on 64-row data. The round count is a knob:
    * convergence runs at (λ₂/λ₁)^k, and the synthetic fixture's spectrum
    * is flat (λ₂/λ₁ ≈ 0.97), so the spec pins the eigen-residual at 5% of
    * λ rather than a tighter bound a clustered production corpus would
    * reach in fewer rounds.
    *
    * ORACLE-CHECKED (was no-oracle through round 8), via the
    * kmeans/PageRank MATERIALIZED-CTE precedent: the 16 fixed rounds
    * unroll as paired matvec/normalize CTEs over the SAME
    * exact-integer-derived covariance the Spark side collects
    * (`llm_embed_pca_cov`'s CTE chain, unrounded). The two engines fold
    * their matvec sums in different orders, but power iteration is
    * contractive (perturbations decay by λ₂/λ₁ per round, they never
    * amplify), so the ≲1e-14 relative fold-order drift sits eight orders
    * of magnitude under the 6-decimal dump — the same measure-zero
    * midpoint argument `llm_kmeans` is green under. The sign convention
    * (component of largest |loading|, first dim on ties, made positive)
    * and the Rayleigh quotient replicate in SQL verbatim; LlmOpsSpec
    * additionally pins the eigen-residual ‖Cv − λv‖∞, λ ≥ max diagonal
    * variance, unit norm, and run-to-run identity.
    */
  val embedPca: Q = {
    val dims = 64
    def matvec(out: String, vin: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT m.i AS dim, SUM(m.cov * v.x) AS y
         |  FROM cm m JOIN $vin v ON m.j = v.dim GROUP BY m.i)""".stripMargin
    def normalize(r: Int): String =
      s"""v$r AS MATERIALIZED (
         |  SELECT dim, y / (SELECT sqrt(SUM(y * y)) FROM y$r) AS x FROM y$r)""".stripMargin
    val rounds = (1 to 16)
      .map(r => matvec(s"y$r", s"v${r - 1}") + ",\n" + normalize(r))
      .mkString(",\n")
    val sql =
      s"""WITH px AS (
         |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 100000, 0) AS BIGINT) AS q
         |  FROM embeddings),
         |p AS (
         |  SELECT a.dim AS d_i, b.dim AS d_j, COUNT(*) AS n,
         |    SUM(a.q) AS si, SUM(b.q) AS sj, SUM(a.q * b.q) AS sij
         |  FROM px a JOIN px b ON a.vec_id = b.vec_id AND a.dim <= b.dim
         |  GROUP BY 1, 2),
         |cov AS (
         |  SELECT d_i, d_j,
         |    CAST(n * sij - si * sj AS DOUBLE) / (CAST(n AS DOUBLE) * n) / 1e10 AS cov
         |  FROM p),
         |cm AS MATERIALIZED (
         |  SELECT d_i AS i, d_j AS j, cov FROM cov
         |  UNION ALL
         |  SELECT d_j AS i, d_i AS j, cov FROM cov WHERE d_i <> d_j),
         |v0 AS (SELECT CAST(range AS BIGINT) AS dim, 0.125 AS x FROM range($dims)),
         |$rounds,
         |${matvec("cvf", "v16")},
         |lam AS (
         |  SELECT SUM(c.y * v.x) AS l FROM cvf c JOIN v16 v ON c.dim = v.dim),
         |sgn AS (
         |  SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS sg
         |  FROM v16 ORDER BY abs(x) DESC, dim LIMIT 1)
         |SELECT v.dim, ROUND(s.sg * v.x, 6) + 0 AS loading, ROUND(t.l, 6) + 0 AS lambda
         |FROM v16 v CROSS JOIN sgn s CROSS JOIN lam t ORDER BY v.dim""".stripMargin
    Q("llm_embed_pca", sql) { (s, dir) =>
      val d = dims
    // The 2080 co-moment cells ARE metadata: one collect, then the 16
    // matvec rounds run driver-side in Scala — microseconds, versus 16
    // sequential Spark jobs (each a localCheckpoint) whose cost was pure
    // job-launch overhead on 64-row data. The corpus-side scan (the only
    // part that grows at 100 TB) is untouched: pcaComoments still touches
    // the corpus exactly once, distributed.
    val c = Array.ofDim[Double](d, d)
    pcaCov(pcaComoments(s, dir)).collect().foreach { r =>
      val (i, j, x) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      c(i)(j) = x; c(j)(i) = x
    }
    def matvec(w: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var acc = 0.0; var j = 0
        while (j < d) { acc += c(i)(j) * w(j); j += 1 }
        acc
      }
    // v₀ = 1/8·𝟙 (unit norm in 64-d); never orthogonal to the dominant
    // eigenvector of a covariance matrix with non-degenerate loadings.
    // Every fold below runs ascending-index left-to-right — the same
    // defined order the old sorted-list SQL formulation used — and the
    // covariance entries are exact-integer-derived doubles, so the dump
    // is a deterministic function of the corpus, run to run and JVM to JVM.
    var v = Array.fill(d)(1.0 / 8.0)
    for (_ <- 1 to 16) {
      val y = matvec(v)
      var n2 = 0.0
      var i = 0
      while (i < d) { n2 += y(i) * y(i); i += 1 }
      val norm = math.sqrt(n2)
      v = y.map(_ / norm)
    }
    val cv = matvec(v)
    var lambda = 0.0
    var i = 0
    while (i < d) { lambda += cv(i) * v(i); i += 1 }
    // Sign convention: component of largest |loading| (first index on
    // ties) made positive — pins the eigenvector's orientation.
    val absv = v.map(math.abs)
    val pos = absv.indexOf(absv.max)
    val vv = if (v(pos) < 0) v.map(x => -x) else v
    // Spark's round() is BigDecimal HALF_UP on the double; replicate it
    // exactly so the dump format is unchanged (+0.0 normalizes -0.0).
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0
    import s.implicits._
    vv.toSeq.zipWithIndex
      .map { case (x, k) => (k.toLong, r6(x), r6(lambda)) }
      .toDF("dim", "loading", "lambda")
      .orderBy("dim")
    }
  }

  val all: Seq[Q] = Seq(
    dedupExact, dedupHash, jaccardPairs, shingleJaccard, knnCosine, annLsh,
    annIvf, nearDupCosine, embedNorm, minhashPairs, tfidf, approxDistinct,
    approxPercentile, nearDupClusters, decontaminate, evalContamination, quantizeInt8, approxTopK,
    embedDimStats, embedNormalize, dupSpanFraction, dupSpanRemoval, centroidAssign,
    embedOutliers, semDedup, embedCorrPairs, nearDupFilter, kmeansEmbed,
    bloomDecontaminate, bloomDecontaminateIndexed, annIvfPq, hardNegatives, incrementalDedup,
    annIvfPqIndexed, sqlAnnServed, embedPcaCov, embedPca)
}
