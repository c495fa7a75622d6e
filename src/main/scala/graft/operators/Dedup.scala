package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deduplication suite over the `documents` table — the training-data
  * pipeline operators the north star requires (/root/repo/BASELINE.json):
  * exact, normalized (bag-of-words), MinHash+LSH, SimHash, and exact
  * n-gram Jaccard.
  *
  * Scale design (100 TB):
  *   - Exact/normalized dedup is one hash aggregation on the dedup key —
  *     the same shape as the reference's line-frequency query, one shuffle.
  *   - MinHash/SimHash signatures are computed per-row (MinHash via the
  *     native codegen expression [[graft.functions.MinHash]], SimHash via
  *     SQL bit arithmetic — no UDF, no shuffle), then candidates are
  *     found with a BUCKET join on band keys — the shuffle is on
  *     (band, key), never an all-pairs cross join. Only candidate pairs
  *     (tiny vs n²) are verified exactly.
  *   - Jaccard verification uses integer arithmetic (intersection/union
  *     sizes), so thresholds are exact and reproducible across engines —
  *     no float boundary flakiness in the oracle compare.
  */
object Dedup {

  /** Shared near-dup tuning constants. The q_dedup_minhash DuckDB oracle
    * is only valid while the LSH candidate-miss probability stays
    * negligible AND the oracle SQL builds the same shingle length —
    * SparkEntry derives both guards from these values at load, so
    * retuning here cannot silently invalidate the exact-set oracle.
    */
  val ShingleN = 3
  val MinHashK = 64
  val MinHashBands = 16

  /** Exact dedup: canonical (min) doc_id and multiplicity per distinct
    * text. Equivalent plan shape to the reference's grep aggregate.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))

  /** Normalized dedup on the sorted distinct token set ("same bag of
    * words"). Returns only groups with >1 member — actual near-identical
    * docs that exact dedup misses.
    *
    * 100 TB path (`hashKey = true`): group on `xxhash64(wordset)` — an
    * 8-byte grouping key instead of an arbitrarily long document-sized
    * string, so the exchange hashes/compares fixed-width keys — and
    * carry the string through as a `min` payload because the contract
    * surfaces it (all members of a group share one wordset, so min is
    * just "the value"; at scale you would drop the column entirely).
    * Same result modulo a ~2^-64 hash collision; equality with the
    * string-keyed spelling is asserted in DedupSpec. Default stays the
    * string key: the DuckDB oracle groups on the string, and sf-scale
    * fixtures gain nothing from the hash. (Same reasoning as [[exact]],
    * whose key the oracle also pins; [[incrementalNew]] already keys on
    * the md5 fingerprint.)
    */
  def wordset(spark: SparkSession, sfDir: String,
              hashKey: Boolean = false): DataFrame = {
    val ws = array_join(array_sort(array_distinct(TextOps.tokens(col("text")))), " ")
    val docs = Tables.documents(spark, sfDir)
    val grouped =
      if (hashKey)
        docs.select(xxhash64(ws).as("wk"), ws.as("ws"), col("doc_id"))
          .groupBy(col("wk"))
          .agg(min(col("ws")).as("wordset"),
            min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
          .select(col("wordset"), col("doc_id"), col("n"))
      else
        docs.groupBy(ws.as("wordset"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
    grouped.filter(col("n") > 1)
  }

  /** Shared: (doc_id, shingles, n_shingles) projection over any
    * (doc_id, text) input. Shingle arrays are SORTED ascending — the
    * exact-verify merge scan ([[graft.functions.SortedIntersect]])
    * requires it, and nothing downstream is order-sensitive (minhash
    * band keys take a min over element hashes; the inverted index
    * explodes the set).
    */
  private def docShingles(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), sort_array(TextOps.shingles(col("text"), n)).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)

  /** Exact Jaccard verification of candidate pairs against threshold
    * num/den (e.g. 4/5 = 0.8): keeps pairs with
    * inter/(szA+szB-inter) >= num/den  ⇔  (den+num)*inter >= num*(szA+szB).
    * Pure integer math — exact at any scale. Intersections come from the
    * native merge-scan expression over the sorted shingle arrays
    * ([[graft.functions.SortedIntersect]]) — `size(array_intersect(..))`
    * builds a boxed hash set per candidate pair and was the hottest span
    * of the round-3 bench (~7 s of a ~37 s total).
    */
  private def verifyJaccard(cands: DataFrame, docs: DataFrame,
                            num: Int, den: Int): DataFrame = {
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("sz").as("sz_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("sz").as("sz_b"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter",
        graft.functions.SortedIntersect.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * (den + num) >= (col("sz_a") + col("sz_b")) * num)
      // long ints to match the oracle's BIGINT count arithmetic exactly
      .select(col("doc_a"), col("doc_b"),
        col("inter").cast("long").as("inter"), col("uni").cast("long").as("uni"))
  }

  /** MinHash + LSH near-dup pairs at Jaccard >= 0.8 over word 3-gram
    * shingles. k=64 minhashes in 16 bands of 4: candidate-miss probability
    * for a true 0.9-Jaccard pair is (1-0.9^4)^16 ≈ 4e-8, and every
    * candidate is verified with EXACT integer Jaccard, so the output
    * equals the exact >=0.8 pair set (verified against brute force in
    * DedupSpec and by the DuckDB oracle).
    *
    * Performance shape: band keys come from the native codegen expression
    * [[graft.functions.MinHash]] (one two-pass hash per shingle, no
    * per-row signature array), and the shingle projection is
    * persist()-marked so the verification joins reuse it instead of
    * recomputing (see [[minHashNearDupsOn]] for the cache contract).
    *
    * Scale path: signatures are per-row; the only shuffles are the band
    * bucket join and the verification joins on doc ids. Hot buckets
    * (a mega-cluster of near-identical docs) would make one band bucket
    * quadratic — `maxBucket` caps them: buckets with more than
    * `maxBucket` members are dropped from candidate generation. A pair
    * is lost only if EVERY band bucket it shares exceeds the cap, i.e.
    * the pair belongs to a > maxBucket near-identical cluster — which
    * [[exact]] dedup collapses upstream in a real pipeline. This data
    * has no such cluster (recall stays 1.0; asserted vs brute force in
    * DedupSpec, cap behavior itself unit-tested with a tiny cap).
    */
  def minHashNearDups(spark: SparkSession, sfDir: String,
                      n: Int = ShingleN, k: Int = MinHashK,
                      bands: Int = MinHashBands,
                      maxBucket: Int = 10000): DataFrame =
    minHashNearDupsOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      n, k, bands, maxBucket)

  /** [[minHashNearDups]] over any (doc_id, text) DataFrame — the entry
    * ScaleSmoke drives so scale evidence covers the SHIPPED path.
    *
    * The shingle projection is persist()-marked (lazy): the banded
    * self-join's two sides share a reused exchange, but the verification
    * joins are distinct subtrees that would otherwise recompute it (the
    * round-1 bench spent 76% of its total on exactly that). The cache
    * populates on first action — plan-only consumers stay lazy — and the
    * CALLER owns cleanup: Bench/Verify/ScaleSmoke clearCache() after
    * consuming each result.
    */
  def minHashNearDupsOn(docTexts: DataFrame, n: Int = ShingleN,
                        k: Int = MinHashK, bands: Int = MinHashBands,
                        maxBucket: Int = 10000): DataFrame = {
    val docs = graft.CacheScope.track(docShingles(docTexts, n).persist())
    val banded = docs
      .select(col("doc_id"),
        posexplode(graft.functions.MinHash.minhashBandKeys(col("sh"), k, bands))
          .as(Seq("band", "key")))
    // bucket-size cap via a window over the SAME (band, key) hash
    // partitioning the self-join shuffles on — Catalyst reuses one
    // exchange for the window and both join sides
    val capped = banded
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("key"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val cands = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cands, docs, 4, 5)
  }

  /** Exact all-pairs n-gram Jaccard >= 0.5 via a PREFIX-FILTERED
    * inverted-index join (never a cross join), then exact integer-Jaccard
    * verification of each candidate.
    *
    * Prefix filtering (the AllPairs/PPJoin candidate condition — Bayardo,
    * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007;
    * public literature): order every doc's shingles by a global canonical
    * order (df ascending, rarest first), and index only each doc's first
    * p = sz - ceil(t·sz) + 1 shingles. For J(A,B) >= t the overlap is
    * >= ceil(t·|A|) (from i >= t(a+b)/(1+t) and b >= i), so the two
    * prefixes must share a shingle — candidate generation over prefixes
    * alone LOSES NOTHING while shrinking the inverted index ~2x at t=1/2
    * and, decisively, demoting boilerplate: a high-df shingle sorts LAST
    * in the canonical order and enters a doc's prefix only when most of
    * that doc is even-hotter boilerplate. Candidate partials drop from
    * Σ df² over all shingles to Σ df_prefix² over rare-half shingles.
    *
    * The stop-shingle cap stays as the hard worst-case bound: prefix
    * entries with df > `maxDocFreq` are dropped, so one boilerplate
    * shingle at 100 TB can never go quadratic. A qualifying pair is lost
    * only if EVERY shared prefix shingle is capped — i.e. the rarest
    * half of both docs is > maxDocFreq boilerplate, in practice a
    * > maxDocFreq near-identical cluster that [[exact]] dedup collapses
    * upstream (residual: tiny all-boilerplate docs, documented
    * approximation). Equality with brute force is asserted in DedupSpec;
    * soundness (no false positives) holds under ANY cap because every
    * candidate is verified on the full shingle arrays.
    */
  def ngramJaccardPairs(spark: SparkSession, sfDir: String, n: Int = ShingleN,
                        maxDocFreq: Int = 1000): DataFrame =
    ngramJaccardPairsOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      n, maxDocFreq)

  /** [[ngramJaccardPairs]] over any (doc_id, text) DataFrame (ScaleSmoke
    * entry). Shingle projection persist()-marked lazily, caller-owned
    * cleanup — same contract as [[minHashNearDupsOn]].
    *
    * Bench variance note (round-6 "2.2x regression" root cause): isolated
    * at sf0.1 this query's steady state is ~1.8 s median (5 reps: min
    * 1.55 / median 1.84 / max 3.58 — measured round 7), matching rounds
    * 4-5; the 4.89 s in BENCH_r06 was JVM-environment noise landing on
    * the suite's most persist-heavy query, not a plan change (the max
    * sample doubles the median even in isolation). The two persist()s
    * trade that variance for the guaranteed-single-compute the cold path
    * needs; target/bench_detail.json now records the spread per round so
    * noise-vs-real is decidable from artifacts. (Round-10 follow-up: the
    * absolute isolated steady state drifted to ~2.7 s median — measured
    * at BOTH the r9 and r10 commits minutes apart, ≤6% between them, so
    * host era not plan; the same-host code A/B protocol and numbers live
    * in BENCH_ISOLATION.md, and the bench canary_sec pins machine speed
    * for future cross-round normalization.)
    *
    * Candidate pruning beyond the prefix filter (round-3 generated ~410k
    * candidates at sf0.1 for 256 true pairs — verification dominated the
    * bench), both from the AllPairs/PPJoin line of work (Bayardo et al.
    * WWW 2007; Xiao et al. WWW 2008 — public literature), both provably
    * recall-free:
    *
    *   - LENGTH filter, in the join condition: J(A,B) >= t forces
    *     i >= t·max(|A|,|B|) and i <= min(|A|,|B|), hence
    *     den·min(sz) >= num·max(sz). Applied before the candidate
    *     aggregation so disqualified partials never shuffle.
    *   - POSITIONAL filter, on the aggregated candidate: shared elements
    *     appear in the same relative order in both docs under the global
    *     canonical order, so with e* = the first shared UNCAPPED element
    *     (for a qualifying pair e* lies in both prefixes — same
    *     contradiction argument as the prefix theorem — and the join's
    *     min matched positions identify it), the uncapped overlap is
    *     <= 1 + min(szu_a − pos_a(e*), szu_b − pos_b(e*)) and the capped
    *     overlap is <= min(sz_a − szu_a, sz_b − szu_b), where szu counts
    *     a doc's below-cap shingles (= sz when nothing is capped). Drop
    *     the pair when the two bounds can't reach
    *     iMin = ceil(num·(sz_a+sz_b)/(num+den)).
    */
  def ngramJaccardPairsOn(docTexts: DataFrame, n: Int = ShingleN,
                          maxDocFreq: Int = 1000): DataFrame = {
    val (num, den) = (1, 2) // threshold t = num/den, shared with verify
    val docs = graft.CacheScope.track(docShingles(docTexts, n).persist())
    val inv = docs.select(col("doc_id"), col("sz"), explode(col("sh")).as("ng"))
    val dfreq = inv.groupBy(col("ng")).agg(count(lit(1)).as("df"))
    // canonical rarest-first order; row_number over doc_id is a doc-sized
    // window (bounded by the longest doc, never key-skewed). szu = the
    // doc's uncapped-shingle count, for the positional filter's capped
    // correction term — same partition, one window pass.
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("ng").asc)
    val wDocAll = Window.partitionBy(col("doc_id"))
    // p = sz - ceil(t*sz) + 1, in exact integer math
    val prefixLen = col("sz") - expr(s"(sz * $num + ${den - 1}) DIV $den") + 1
    val prefixInv = inv.join(dfreq, "ng")
      .filter(col("df") <= maxDocFreq)
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("szu", count(lit(1)).over(wDocAll))
      .filter(col("pos") <= prefixLen)
      .select(col("doc_id"), col("ng"), col("pos"), col("sz"), col("szu"))
    // persisted: the prefix index is an expensive subtree (explode +
    // dfreq join + per-doc window) consumed by BOTH self-join sides, and
    // exchange reuse does not always canonicalize across them — caching
    // guarantees one compute under any join strategy (measured ~2x on
    // the cold path without it). Same caller-owned cleanup as `docs`.
    val pre = graft.CacheScope.track(prefixInv.persist())
    val iMin = expr(s"($num * (sz_a + sz_b) + ${num + den - 1}) DIV ${num + den}")
    val cands = pre.as("x").join(pre.as("y"),
        col("x.ng") === col("y.ng") && col("x.doc_id") < col("y.doc_id") &&
          least(col("x.sz"), col("y.sz")) * den >=
            greatest(col("x.sz"), col("y.sz")) * num)
      // the aggregation replaces the former distinct() — same shuffle
      // shape (sz/szu are functionally dependent on the doc ids), but it
      // carries the min matched positions the positional filter needs
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sz").as("sz_a"), col("y.sz").as("sz_b"),
        col("x.szu").as("szu_a"), col("y.szu").as("szu_b"))
      .agg(min(col("x.pos")).as("mpa"), min(col("y.pos")).as("mpb"))
      .filter(lit(1) +
        least(col("szu_a") - col("mpa"), col("szu_b") - col("mpb")) +
        least(col("sz_a") - col("szu_a"), col("sz_b") - col("szu_b")) >= iMin)
      .select(col("doc_a"), col("doc_b"))
    verifyJaccard(cands, docs, num, den)
  }

  /** Exact-substring (verbatim-span) dedup: doc pairs sharing a verbatim
    * run of at least `minRunTokens` consecutive tokens — the "50-token
    * repeated substring" class from public dedup literature (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", 2021 —
    * suffix-array ExactSubstr; public). Jaccard-style whole-doc dedup
    * misses this: a long quote or boilerplate block inside two otherwise
    * different docs leaves their Jaccard low while the span is verbatim.
    *
    * Spelling: k-gram runs instead of suffix arrays — a shared verbatim
    * span of T >= n tokens is EXACTLY a run of T-n+1 consecutive shared
    * n-gram shingles at one alignment offset, so positional shingles
    * recover exact span lengths with relational operators only:
    * posexplode the occurrence-preserving shingle stream, equi-join on
    * shingle value, then gaps-and-islands per (pair, diagonal = pos_a -
    * pos_b): consecutive pos_a values at one diagonal are one run of
    * length count, i.e. a shared span of count + n - 1 tokens. Output:
    * (doc_a, doc_b, max_run_tokens), one row per pair at or above the
    * threshold. Equality with a per-pair longest-common-token-substring
    * DP is asserted in DedupSpec.
    *
    * Scale design (100 TB): candidate volume is Σ occ² over shingle
    * values — `maxOccFreq` drops shingles with more than that many
    * corpus-wide OCCURRENCES from matching (the occurrence count, not
    * doc frequency, is the actual quadratic bound here since duplicates
    * are kept). A capped shingle splits any run passing through it —
    * the documented approximation, analogous to [[ngramJaccardPairsOn]]'s
    * stop-shingle cap: a span is lost only when EVERY length-n window in
    * it is > maxOccFreq boilerplate. The islands window partitions on
    * (doc_a, doc_b, diag) — bounded by a single doc's length, never
    * key-skewed. All shuffles are on shingle value or pair ids; nothing
    * is all-pairs.
    */
  def verbatimRunPairs(spark: SparkSession, sfDir: String, n: Int = ShingleN,
                       minRunTokens: Int = 20, maxOccFreq: Int = 1000): DataFrame =
    verbatimRunPairsOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      n, minRunTokens, maxOccFreq)

  /** [[verbatimRunPairs]] over any (doc_id, text) DataFrame. */
  def verbatimRunPairsOn(docTexts: DataFrame, n: Int = ShingleN,
                         minRunTokens: Int = 20, maxOccFreq: Int = 1000): DataFrame = {
    require(minRunTokens >= n, s"minRunTokens=$minRunTokens must be >= n=$n")
    runIslands(docTexts, n, maxOccFreq)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("run_tokens")).as("max_run_tokens"))
      .filter(col("max_run_tokens") >= minRunTokens)
  }

  /** Every maximal shared verbatim span at or above `minRunTokens`, WITH
    * its exact 0-based token coordinates in both docs — the artifact an
    * ExactSubstr-style REMOVAL pass consumes ("cut tokens
    * [b_start, b_start + run_tokens) from the higher-id doc"), where
    * [[verbatimRunPairs]] only flags the pair. One row per maximal run:
    * (doc_a, doc_b, a_start, b_start, run_tokens); a pair sharing two
    * disjoint long quotes yields two rows. Maximality is structural:
    * islands are maximal consecutive shingle runs, so no output span is
    * contained in or extendable to another at the same alignment.
    *
    * PERF NOTE (round-8 root cause of the round-7 "2x gap" vs
    * [[verbatimRunPairs]]): in-suite medians showed 7.07 s here vs
    * 3.36 s for the pairs spelling on the SAME runIslands pipeline.
    * Isolated re-measure (SPARK_GRAFT_BENCH_ONLY, 5 reps, sf0.1):
    * spans min 2.30 / median 2.33 / max 2.79 s vs runs 2.53 / 2.65 /
    * 2.74 s — this query is marginally FASTER than its twin once both
    * run in a quiet JVM, exactly as the shared plan predicts. The
    * in-suite inflation (min 5.2 s — every rep, not one spike) is the
    * documented [[ngramJaccardPairsOn]] measurement class: by the time
    * the timed loop reaches this first-in-map entry the JVM has run 74
    * warm-up queries, and persist-heavy plans pay the accumulated
    * code-cache/GC pressure. Plan is shared with the twin and clean;
    * the bench now times this query at 5 reps (noisy-query override)
    * and forces a GC between the warm-up pass and the timed loop.
    */
  def verbatimRunSpans(spark: SparkSession, sfDir: String, n: Int = ShingleN,
                       minRunTokens: Int = 20, maxOccFreq: Int = 1000): DataFrame =
    verbatimRunSpansOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      n, minRunTokens, maxOccFreq)

  /** [[verbatimRunSpans]] over any (doc_id, text) DataFrame. */
  def verbatimRunSpansOn(docTexts: DataFrame, n: Int = ShingleN,
                         minRunTokens: Int = 20, maxOccFreq: Int = 1000): DataFrame = {
    require(minRunTokens >= n, s"minRunTokens=$minRunTokens must be >= n=$n")
    runIslands(docTexts, n, maxOccFreq)
      .filter(col("run_tokens") >= minRunTokens)
      // BIGINT coordinates to match the oracle's generate_series math
      .select(col("doc_a"), col("doc_b"),
        col("a_start").cast("long").as("a_start"),
        (col("a_start") - col("diag")).cast("long").as("b_start"),
        col("run_tokens"))
  }

  /** CCNet/RefinedWeb-style boilerplate LINE removal: strike every line
    * that occurs in at least `minDocFreq` DISTINCT docs (site headers,
    * navigation, cookie banners — text duplicated across a source at a
    * granularity neither doc-level dedup nor span-level
    * [[applyVerbatimCuts]] targets), and re-emit each doc from its kept
    * lines in original order. Output: (doc_id, text = kept lines joined
    * by newline, n_lines_removed), one row per input doc. Lines compare
    * RAW — compose with lower/trim normalization upstream if the source
    * needs it; doc frequency is per-doc (a line repeated within one doc
    * counts once toward the threshold and is kept or struck as a unit).
    * BLANK lines (empty or whitespace-only) are exempt from striking:
    * they are paragraph STRUCTURE, not boilerplate content — a corpus
    * where 50+ docs use blank-line paragraph breaks must not have its
    * paragraphs collapsed corpus-wide (CCNet exempts short lines for the
    * same reason; stricter short-line policies compose upstream).
    *
    * Scale design (100 TB): explode to (doc, pos, line) — linear; ONE
    * hash aggregation for line doc-frequencies and one equi-join back on
    * the line key; reassembly is a per-doc aggregation whose
    * collect_list is bounded by a single doc's line count. No window
    * over anything wider than one doc, no self-join.
    *
    * 100 TB path (`hashKey = true`): the frequency aggregation AND the
    * join back key on `xxhash64(line)` — an 8-byte fixed-width key
    * instead of an arbitrarily long line string, so the two exchanges
    * hash/compare 8 bytes per row while the line string rides through as
    * payload only where reassembly needs it. Same result modulo a
    * ~2^-64 hash collision; equality with the string-keyed spelling is
    * asserted in DedupSpec and the 64× sweep lives in ScaleSmoke.
    * Default stays the string key: the DuckDB oracle joins on the
    * string (same trade as [[wordset]]).
    */
  def stripCommonLines(docTexts: DataFrame, minDocFreq: Int = 2,
                       hashKey: Boolean = false): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq=$minDocFreq must be >= 2")
    val lines = docTexts.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    // the aggregation + join key: the raw string (oracle-exact default)
    // or its 8-byte hash; either way the line string itself rides the
    // lines side ONCE (reassembly needs it)
    val key = if (hashKey) xxhash64(col("line")) else col("line")
    val lineDf = lines.groupBy(key.as("lk"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val kept = lines.join(lineDf, key === col("lk")).drop("lk")
      .filter(col("df") < minDocFreq || trim(col("line")) === "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line")), "\n").as("text"))
    docTexts.select(col("doc_id"),
        size(split(col("text"), "\n")).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_lines_removed"))
  }

  /** [[stripCommonLines]] at PARAGRAPH granularity — the CCNet trio's
    * middle member (page-level dedup, paragraph strike, line strike):
    * strike every paragraph occurring in at least `minDocFreq` DISTINCT
    * docs (shared preambles, license blocks, templated intros — units
    * too long for line-level df to catch as one piece and too short for
    * doc-level dedup). Paragraph = a maximal run of non-blank lines;
    * the split key is one-or-more blank lines (`\n{2,}`), and kept
    * paragraphs re-join under the CANONICAL `\n\n` separator — original
    * multi-blank runs normalize to one blank line, the standard
    * paragraph-strike trade. Output: (doc_id, text, n_paras_removed),
    * one row per input doc. Empty/whitespace-only paragraphs (text
    * boundary artifacts of the split) are exempt like blank lines.
    *
    * Same scale shape as the line spelling — explode, ONE df hash
    * aggregation, one equi-join back, per-doc bounded reassembly; and
    * the same `hashKey` 100 TB path (8-byte xxhash64 paragraph keys on
    * both exchanges, string payload rides once; equality asserted in
    * DedupSpec).
    */
  def stripCommonParagraphs(docTexts: DataFrame, minDocFreq: Int = 2,
                            hashKey: Boolean = false): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq=$minDocFreq must be >= 2")
    val paras = docTexts.select(col("doc_id"),
      posexplode(split(col("text"), "\n{2,}")).as(Seq("pos", "para")))
    val key = if (hashKey) xxhash64(col("para")) else col("para")
    val paraDf = paras.groupBy(key.as("pk"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val kept = paras.join(paraDf, key === col("pk")).drop("pk")
      .filter(col("df") < minDocFreq || trim(col("para")) === "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          x => x("para")), "\n\n").as("text"))
    docTexts.select(col("doc_id"),
        size(split(col("text"), "\n{2,}")).as("n_paras"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        (col("n_paras") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_paras_removed"))
  }

  /** The verbatim-dedup REMOVAL pass: the cleaned corpus after cutting
    * every [[verbatimRunSpansOn]] span from its HIGHER-id doc — the
    * ExactSubstr policy (Lee et al. 2021: keep one copy, cut the rest),
    * composing [[verbatimRunSpans]] with [[applyVerbatimCuts]]. Output:
    * one row per input doc — (doc_id, text = cleaned text,
    * n_tokens_removed); untouched docs pass through verbatim with 0.
    */
  def verbatimCleanCorpus(spark: SparkSession, sfDir: String, n: Int = ShingleN,
                          minRunTokens: Int = 20, maxOccFreq: Int = 1000): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    applyVerbatimCuts(docs, verbatimRunSpansOn(docs, n, minRunTokens, maxOccFreq))
  }

  /** [[applyVerbatimCuts]] iterated to a FIXPOINT. A single pass can
    * leave detectable runs behind: cutting butt-joins a span's flanks,
    * and the spliced text can coincidentally equal a span of some third
    * doc (planted in DedupSpec: "p q X Y Z r s" loses "X Y Z" and the
    * remaining "p q r s" now matches another doc verbatim). One pass is
    * the production default — natural text makes seam rematches rare
    * (the fixture has zero) and ExactSubstr-style pipelines accept the
    * tail; this spelling is the compaction-job variant for corpora
    * where the tail matters. Terminates: every cutting round removes at
    * least `minRunTokens` tokens from at least one doc, and `maxRounds`
    * guards adversarial corpora. The per-round isEmpty probe and the
    * round counter are control plane (one boolean per round — the data
    * path stays distributed); lineage is truncated per round via
    * localCheckpoint exactly like [[clusterPairs]]' propagation loop.
    * Each round runs inside a [[graft.CacheScope]]: the round's spans
    * persist for the isEmpty-probe + cut pair, the detector's internal
    * capped-index persist registers with the scope, and BOTH are
    * unpersisted — targeted, never `clearCache()` — once the round's
    * output is checkpointed. A caller's own persisted frames therefore
    * survive the fixpoint (round-9 contract, asserted in DedupSpec),
    * and at most one round's corpus-scale index is ever pinned.
    */
  def verbatimCleanFixpoint(docTexts: DataFrame, n: Int = ShingleN,
                            minRunTokens: Int = 20, maxOccFreq: Int = 1000,
                            maxRounds: Int = 8): DataFrame = {
    var cur = docTexts.select(col("doc_id"), col("text"),
      lit(0L).as("n_tokens_removed"))
    var round = 0
    var clean = false
    while (!clean && round < maxRounds) {
      graft.CacheScope.scoped {
        val docs = cur.select(col("doc_id"), col("text"))
        // persisted: the isEmpty probe and the cut below both consume
        // it — without the mark the detector pipeline would run twice
        // per round; tracked so the scope drops it with the round
        val spans = graft.CacheScope.track(
          verbatimRunSpansOn(docs, n, minRunTokens, maxOccFreq).persist())
        if (spans.isEmpty) clean = true
        else {
          val cut = applyVerbatimCuts(docs, spans)
          cur = cut.as("c")
            .join(cur.select(col("doc_id"), col("n_tokens_removed").as("prev")),
              "doc_id")
            .select(col("doc_id"), col("c.text").as("text"),
              (col("prev") + col("c.n_tokens_removed")).as("n_tokens_removed"))
            .localCheckpoint(false)
        }
      }
      round += 1
    }
    cur
  }

  /** Cut [[verbatimRunSpansOn]] spans out of their higher-id docs and
    * emit the cleaned corpus. Each span row claims tokens
    * [b_start, b_start + run_tokens) of doc_b; one doc's spans can
    * overlap (two different sources quoting overlapping regions), so
    * intervals are MERGED per doc before cutting — n_tokens_removed is
    * the measure of the merged union, never double-counted.
    *
    * Scale design: the interval merge is a gaps-and-islands window
    * partitioned by doc_id — bounded by one doc's span count, never
    * key-skewed. The cut itself is a pure per-row projection: merged
    * intervals are collected to a per-doc array (bounded: disjoint
    * intervals on one doc ≤ doc length), left-joined to the corpus on
    * doc_id, and applied with codegen'd higher-order functions
    * (`filter` over the token array with an `exists` interval probe) —
    * no explode of the corpus tokens, no shuffle of text bytes beyond
    * the one doc_id join.
    */
  def applyVerbatimCuts(docTexts: DataFrame, spans: DataFrame): DataFrame = {
    val iv = spans.select(col("doc_b").as("doc_id"),
      col("b_start").as("s"), (col("b_start") + col("run_tokens")).as("e"))
    // classic interval merge: a span opens a new merged group iff it
    // starts after everything before it (in (s, e) order) has ended
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val merged = iv
      .withColumn("prev_max",
        max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("fresh",
        when(col("prev_max").isNull || col("s") > col("prev_max"), 1).otherwise(0))
      .withColumn("gid", sum(col("fresh")).over(byDoc))
      .groupBy(col("doc_id"), col("gid"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("cuts"))
    // native cut filter (r21, guide §4): the composed `filter(toks,
    // (_, i) => !exists(cuts, c => i >= c.s && i < c.e))` nested two
    // interpreted HOFs — O(tokens × cuts) closures per doc on every
    // verbatim-clean pass (NativeHofParitySpec pins native == composed)
    docTexts.join(merged, Seq("doc_id"), "left")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("kept", when(col("cuts").isNull, col("toks")).otherwise(
        graft.functions.CutTokens.cutTokens(col("toks"), col("cuts"))))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("text"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_tokens_removed"))
  }

  /** Incremental verbatim-run detection: for each NEW batch doc, the
    * corpus docs it shares a verbatim run of at least `minRunTokens`
    * tokens with — the per-delivery spelling of [[verbatimRunPairs]],
    * composing its k-gram run detector with [[incrementalNearDup]]'s
    * probe contract. Output: (doc_id = batch doc, corpus_id,
    * max_run_tokens), one row per qualifying cross pair; a quote-heavy
    * delivery doc surfaces once per corpus source it copies from.
    *
    * Scale design (100 TB corpus, daily batch): the corpus NEVER
    * self-joins — batch positional shingles probe the corpus positional
    * index, so matched position pairs are bounded by batch occupancy of
    * corpus buckets, and the occurrence cap (computed corpus-side, where
    * the mass is) bounds each bucket. In production the corpus
    * (doc_id, pos, shingle) index and its occurrence table are
    * MATERIALIZED at ingest — write once, probe per delivery — exactly
    * like [[incrementalNearDup]]'s band index; here they derive inline.
    * The islands window partitions on (batch doc, corpus doc, diagonal)
    * — bounded by one doc's length, never key-skewed.
    */
  def incrementalVerbatimRuns(corpus: DataFrame, batch: DataFrame,
                              n: Int = ShingleN, minRunTokens: Int = 20,
                              maxOccFreq: Int = 1000): DataFrame = {
    // persisted: the corpus positional index feeds both the occurrence
    // aggregation and the capped probe join, and the aggregate's
    // map-side partials prevent exchange reuse between them — the
    // corpus index build is this operator's dominant linear term, so
    // compute it once (caller-owned cleanup, same contract as
    // [[incrementalNearDup]]'s shingle frames)
    val (corpusIdx, occ) = verbatimIndexFrames(corpus, n)
    incrementalVerbatimRunsFromIndex(graft.CacheScope.track(corpusIdx.persist()), occ, batch,
      n, minRunTokens, maxOccFreq)
  }

  /** The two corpus artifacts [[incrementalVerbatimRuns]] probes — the
    * occurrence-preserving positional shingle index (doc_id, pos, ng)
    * and its corpus-wide occurrence table (ng, occ) — ready to be
    * written ONCE at ingest ([[graft.sources.DedupIndexes]]) and probed
    * per delivery via [[incrementalVerbatimRunsFromIndex]]. The
    * occurrence table is materialized alongside the index (not derived
    * at probe time) so the per-delivery probe never re-aggregates the
    * 100 TB corpus.
    */
  def verbatimIndexFrames(corpus: DataFrame,
                          n: Int = ShingleN): (DataFrame, DataFrame) = {
    val pos = posIdxOf(corpus, n)
    (pos, pos.groupBy(col("ng")).agg(count(lit(1)).as("occ")))
  }

  private def posIdxOf(d: DataFrame, n: Int): DataFrame =
    d.select(col("doc_id"),
      posexplode(graft.functions.WordShingles.wordNgrams(col("text"), n))
        .as(Seq("pos", "ng")))

  /** [[incrementalVerbatimRuns]] probing a PREBUILT corpus positional
    * index + occurrence table — the production path where both were
    * materialized at ingest. The occurrence cap stays probe-side (a
    * probe parameter, not an index property); islands arithmetic is the
    * shared [[islandsOf]], so the run lengths cannot fork from the
    * inline spelling.
    */
  def incrementalVerbatimRunsFromIndex(corpusPosIndex: DataFrame,
                                       corpusOcc: DataFrame,
                                       batch: DataFrame,
                                       n: Int = ShingleN,
                                       minRunTokens: Int = 20,
                                       maxOccFreq: Int = 1000): DataFrame = {
    require(minRunTokens >= n, s"minRunTokens=$minRunTokens must be >= n=$n")
    val cappedCorpus = corpusPosIndex.join(corpusOcc, "ng")
      .filter(col("occ") <= maxOccFreq)
      .select(col("doc_id").as("corpus_id"), col("pos").as("pos_c"), col("ng"))
    val matches = posIdxOf(batch, n)
      .join(cappedCorpus, "ng")
      .select(col("doc_id").as("doc_a"), col("corpus_id").as("doc_b"),
        col("pos").as("pos_a"), (col("pos") - col("pos_c")).as("diag"))
    islandsOf(matches, n)
      .groupBy(col("doc_a").as("doc_id"), col("doc_b").as("corpus_id"))
      .agg(max(col("run_tokens")).as("max_run_tokens"))
      .filter(col("max_run_tokens") >= minRunTokens)
  }

  /** The SPAN variant of [[incrementalVerbatimRunsFromIndex]] — same
    * probe (batch positional shingles against the stored corpus index,
    * occurrence cap corpus-side, islands per (pair, diagonal)), but
    * emitting every qualifying run's BATCH-side coordinates in
    * [[applyVerbatimCuts]]'s span schema: (doc_a = corpus source,
    * doc_b = batch doc, b_start = batch token offset, run_tokens). The
    * cut side is ALWAYS the batch doc — committed corpus text is
    * immutable, so the arriving copy pays the cut regardless of id
    * order (the one deliberate asymmetry vs the batch pipeline's
    * higher-id rule; the streaming gate pins it in StreamingSpec).
    */
  def incrementalVerbatimSpansFromIndex(corpusPosIndex: DataFrame,
                                        corpusOcc: DataFrame,
                                        batch: DataFrame,
                                        n: Int = ShingleN,
                                        minRunTokens: Int = 20,
                                        maxOccFreq: Int = 1000): DataFrame = {
    require(minRunTokens >= n, s"minRunTokens=$minRunTokens must be >= n=$n")
    val cappedCorpus = corpusPosIndex.join(corpusOcc, "ng")
      .filter(col("occ") <= maxOccFreq)
      .select(col("doc_id").as("corpus_id"), col("pos").as("pos_c"), col("ng"))
    val matches = posIdxOf(batch, n)
      .join(cappedCorpus, "ng")
      .select(col("doc_id").as("doc_a"), col("corpus_id").as("doc_b"),
        col("pos").as("pos_a"), (col("pos") - col("pos_c")).as("diag"))
    // islands ran with doc_a = the batch doc, so a_start IS the batch
    // offset; re-emit with the batch doc as doc_b (the cut side)
    islandsOf(matches, n)
      .filter(col("run_tokens") >= minRunTokens)
      .select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
        col("a_start").cast("long").as("b_start"), col("run_tokens"))
  }

  /** [[incrementalVerbatimRuns]] over the documents table with the same
    * deterministic corpus/batch split as [[incrementalNewDocs]] — the
    * driver-query harness (q_verbatim_incr).
    */
  def incrementalVerbatimRunsDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    incrementalVerbatimRuns(docs.filter(col("doc_id") % 10 < 8),
      docs.filter(col("doc_id") % 10 >= 8))
  }

  /** Shared run detector for [[verbatimRunPairsOn]] / [[verbatimRunSpansOn]]:
    * one row per MAXIMAL run of consecutive shared shingles —
    * (doc_a, doc_b, diag, a_start = 0-based first shared token offset in
    * doc_a, run_tokens = shared span length in tokens).
    */
  private def runIslands(docTexts: DataFrame, n: Int, maxOccFreq: Int): DataFrame = {
    require(n >= 1, s"n=$n must be positive")
    // occurrence-preserving positional shingles: pos is the token offset
    // of the window start, so "consecutive pos at one diagonal" == a
    // verbatim token span (tokens contain no separator spaces, so the
    // space-joined shingle string is injective on token windows)
    val pos = posIdxOf(docTexts, n)
    val occ = pos.groupBy(col("ng")).agg(count(lit(1)).as("occ"))
    // persisted: the capped positional index (explode + occ join) feeds
    // BOTH self-join sides, and exchange reuse does not canonicalize
    // across them under every join strategy — same caller-owned cache
    // contract as [[ngramJaccardPairsOn]] (Bench/Verify clearCache()
    // after consuming each result); CacheScope-tracked so composing
    // pipelines (fixpoint, ingest sinks) clean up ONLY this handle
    val capped = graft.CacheScope.track(pos.join(occ, "ng")
      .filter(col("occ") <= maxOccFreq)
      .select(col("doc_id"), col("pos"), col("ng"))
      .persist())
    val matches = capped.as("x").join(capped.as("y"),
        col("x.ng") === col("y.ng") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.pos").as("pos_a"), (col("x.pos") - col("y.pos")).as("diag"))
    islandsOf(matches, n)
  }

  /** Within-doc self-repetition: docs that repeat one of their own token
    * spans of at least `minRepTokens` tokens — the single-doc analogue of
    * [[verbatimRunPairs]] (boilerplate stutter, copy-pasted paragraphs,
    * generation loops). Output: (doc_id, max_rep_tokens). Complements
    * [[graft.operators.TextAnalysis.qualityFilter]]'s duplicated-3-gram
    * RATIO with the exact longest repeated span: a doc can have a low
    * duplicate-gram share yet one long verbatim self-copy, and vice
    * versa. Same positional-shingle islands as [[runIslands]], with the
    * self-join keyed on (shingle, SAME doc) at positive alignment offset
    * (pos_a > pos_b; overlapping occurrences allowed, so periodic text
    * reports its full repeated extent).
    *
    * Scale: per-doc self-pairs are quadratic only in a shingle's
    * WITHIN-DOC occurrence count; the corpus-wide `maxOccFreq` cap
    * bounds that too (a doc made of one shingle repeated beyond the cap
    * is dropped from matching here — [[graft.operators.TextAnalysis
    * .qualityFilter]]'s rep_pct already flags that degenerate class).
    */
  def selfRepeats(spark: SparkSession, sfDir: String, n: Int = ShingleN,
                  minRepTokens: Int = 20, maxOccFreq: Int = 1000): DataFrame =
    selfRepeatsOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      n, minRepTokens, maxOccFreq)

  /** [[selfRepeats]] over any (doc_id, text) DataFrame. */
  def selfRepeatsOn(docTexts: DataFrame, n: Int = ShingleN,
                    minRepTokens: Int = 20, maxOccFreq: Int = 1000): DataFrame = {
    require(minRepTokens >= n, s"minRepTokens=$minRepTokens must be >= n=$n")
    val pos = posIdxOf(docTexts, n)
    val occ = pos.groupBy(col("ng")).agg(count(lit(1)).as("occ"))
    // persisted: the capped positional index feeds BOTH self-join sides
    // and exchange reuse is not guaranteed across them — same
    // caller-owned clearCache() contract as [[runIslands]] (the explode
    // + occurrence join would otherwise run twice)
    val capped = graft.CacheScope.track(pos.join(occ, "ng")
      .filter(col("occ") <= maxOccFreq)
      .select(col("doc_id"), col("pos"), col("ng"))
      .persist())
    // doc_b = doc_id keeps the islandsOf contract; diag > 0 by pos_a >
    // pos_b, so each unordered occurrence pair is seen once
    val matches = capped.as("x").join(capped.as("y"),
        col("x.ng") === col("y.ng") && col("x.doc_id") === col("y.doc_id") &&
          col("x.pos") > col("y.pos"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.pos").as("pos_a"), (col("x.pos") - col("y.pos")).as("diag"))
    islandsOf(matches, n)
      .groupBy(col("doc_a").as("doc_id"))
      .agg(max(col("run_tokens")).as("max_rep_tokens"))
      .filter(col("max_rep_tokens") >= minRepTokens)
  }

  /** Gaps-and-islands over matched shingle positions (doc_a, doc_b,
    * pos_a, diag): within one (pair, diagonal), pos_a values are
    * distinct (diag fixes the other side's position), so
    * pos_a - row_number is constant exactly along maximal consecutive
    * runs. One row per maximal run, carrying its first position and its
    * token length (shingle count + n - 1). Shared by the self-join
    * ([[runIslands]]) and corpus-probe ([[incrementalVerbatimRuns]])
    * spellings so the run arithmetic cannot fork.
    */
  private def islandsOf(matches: DataFrame, n: Int): DataFrame = {
    val wRun = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    matches
      .withColumn("grp", col("pos_a") - row_number().over(wRun))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(min(col("pos_a")).as("a_start"),
        (count(lit(1)) + (n - 1)).as("run_tokens"))
  }

  /** Incremental-ingestion dedup: collapse a NEW batch internally on the
    * canonical content fingerprint, then anti-join away everything whose
    * fingerprint already exists in the corpus — the per-delivery shape of
    * a continuously-fed corpus ("which of today's crawl is genuinely
    * new"). Output: one row per new-to-the-corpus fingerprint with its
    * canonical (min) doc_id and within-batch multiplicity.
    *
    * Scale design (100 TB corpus, small-by-comparison batch): both the
    * batch aggregation and the anti-join shuffle on the fingerprint — a
    * uniform hash key, so no skew story is needed. The corpus side prunes
    * to the fingerprint column; in production that column is a
    * precomputed index table ([[graft.operators.TextAnalysis.fingerprints]]
    * materialized at ingest), so the anti-join never rescans corpus text.
    * AQE broadcasts the batch side when it is small enough, making the
    * corpus pass a single scan with a broadcast anti-join — the optimal
    * plan for the daily-delta case.
    */
  def incrementalNew(corpus: DataFrame, batch: DataFrame,
                     textCol: String = "text"): DataFrame = {
    def fp(d: DataFrame) = d.withColumn("fingerprint",
      md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")))
    fp(batch)
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
      .join(fp(corpus).select(col("fingerprint")), Seq("fingerprint"), "left_anti")
  }

  /** [[incrementalNew]] over the documents table with a deterministic
    * corpus/batch partition (doc_id mod 10: 0-7 corpus, 8-9 batch) — the
    * driver-query harness for the operator; real pipelines pass their
    * own corpus and delivery frames.
    */
  def incrementalNewDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    incrementalNew(docs.filter(col("doc_id") % 10 < 8),
      docs.filter(col("doc_id") % 10 >= 8))
  }

  /** Incremental NEAR-dup ingest: each batch doc classified as NEW or as
    * a near-duplicate of the existing corpus (Jaccard >= num/den on word
    * n-gram shingles), composing [[incrementalNew]]'s ingest contract
    * with [[minHashNearDupsOn]]'s banded-LSH machinery. Output: one row
    * per batch doc — (doc_id, dup_of = canonical min matching corpus
    * doc_id or null, n_dups = matching corpus docs, is_new bit).
    *
    * Scale design (100 TB corpus, daily batch): the corpus never
    * self-joins — batch band keys PROBE the corpus (band, key) index, so
    * candidate count is bounded by batch size × bucket occupancy, and
    * `maxBucket` caps degenerate corpus buckets exactly like
    * [[minHashNearDupsOn]] (a probe loses a true match only if EVERY
    * shared bucket is a > maxBucket near-identical cluster). In
    * production the corpus index (doc_id, band, key) and shingle frame
    * are MATERIALIZED at ingest (write once, probe daily) — here they're
    * derived inline and persist()-marked as the stand-in; the caller
    * owns cache cleanup (same contract as [[minHashNearDupsOn]]).
    * Candidates are verified with exact integer Jaccard before any doc
    * is declared a duplicate, so false bucket collisions never
    * misclassify.
    */
  def incrementalNearDup(corpus: DataFrame, batch: DataFrame,
                         n: Int = ShingleN, k: Int = MinHashK,
                         bands: Int = MinHashBands,
                         num: Int = 4, den: Int = 5,
                         maxBucket: Int = 10000): DataFrame = {
    val (corpusSh, corpusIdx) = nearDupIndexFrames(corpus, n, k, bands)
    incrementalNearDupFromIndex(graft.CacheScope.track(corpusSh.persist()), corpusIdx, batch,
      n, k, bands, num, den, maxBucket)
  }

  /** The two corpus artifacts [[incrementalNearDup]] probes — the sorted
    * shingle frame (doc_id, sh, sz) and the banded LSH index
    * (doc_id, band, key) — as DataFrames ready to be written ONCE at
    * ingest ([[graft.sources.DedupIndexes]] is the parquet spelling) and
    * probed per delivery via [[incrementalNearDupFromIndex]].
    */
  def nearDupIndexFrames(corpus: DataFrame, n: Int = ShingleN,
                         k: Int = MinHashK,
                         bands: Int = MinHashBands): (DataFrame, DataFrame) = {
    val sh = docShingles(corpus, n)
    (sh, bandIndexOf(sh, k, bands))
  }

  /** The banded LSH index derived from an EXISTING shingle frame
    * (doc_id, sh, sz) — lets an index build reuse a stored/persisted
    * shingle frame instead of re-shingling text.
    */
  def bandIndexOf(sh: DataFrame, k: Int = MinHashK,
                  bands: Int = MinHashBands): DataFrame =
    sh.select(col("doc_id"),
      posexplode(graft.functions.MinHash.minhashBandKeys(col("sh"), k, bands))
        .as(Seq("band", "key")))

  /** [[incrementalNearDup]] probing a PREBUILT corpus index — the
    * production path where `corpusShingles` (doc_id, sh, sz) and
    * `corpusBandIndex` (doc_id, band, key) were materialized at ingest
    * (write once, probe per delivery) instead of derived inline. The
    * bucket cap stays probe-side: it is a tuning parameter of the probe,
    * not of the stored index, so one index serves every cap. Results are
    * identical to the inline derivation by construction AND by spec
    * (DedupIndexSpec round-trips both indexes through parquet).
    */
  def incrementalNearDupFromIndex(corpusShingles: DataFrame,
                                  corpusBandIndex: DataFrame,
                                  batch: DataFrame,
                                  n: Int = ShingleN, k: Int = MinHashK,
                                  bands: Int = MinHashBands,
                                  num: Int = 4, den: Int = 5,
                                  maxBucket: Int = 10000): DataFrame = {
    val corpusSh = corpusShingles
    val batchSh = graft.CacheScope.track(docShingles(batch, n).persist())
    val corpusIdx = corpusBandIndex
      .withColumn("bsz", count(lit(1)).over(
        Window.partitionBy(col("band"), col("key"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val cands = bandIndexOf(batchSh, k, bands)
      .join(corpusIdx.withColumnRenamed("doc_id", "corpus_id"), Seq("band", "key"))
      .select(col("doc_id"), col("corpus_id"))
      .distinct()
    val verified = cands
      .join(batchSh.select(col("doc_id"), col("sh").as("sh_a"), col("sz").as("sz_a")), "doc_id")
      .join(corpusSh.select(col("doc_id").as("corpus_id"),
        col("sh").as("sh_b"), col("sz").as("sz_b")), "corpus_id")
      .withColumn("inter",
        graft.functions.SortedIntersect.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .filter(col("inter") * (den + num) >= (col("sz_a") + col("sz_b")) * num)
      .groupBy(col("doc_id"))
      .agg(min(col("corpus_id")).as("dup_of"), count(lit(1)).as("n_dups"))
    // every batch doc gets a verdict — including sub-n-token docs that
    // produce no shingles (trivially new)
    batch.select(col("doc_id"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        when(col("dup_of").isNull, lit(1L)).otherwise(lit(0L)).as("is_new"))
  }

  /** The FULL >= num/den-Jaccard pair graph among a stored near-dup
    * index's own docs, from the index artifacts ALONE (no corpus text):
    * banded self-join over the stored (doc_id, band, key) rows with the
    * probe-side hot-bucket cap, every candidate exact-verified against
    * the stored sorted shingle frames — [[minHashNearDupsOn]]'s
    * arithmetic with the index as both sides. This is the dedup graph a
    * FULL REBUILD would compute over the indexed docs, which is what
    * makes the committed-rep-bridge audit
    * ([[graft.sources.CurateState.retroNearDup]]) a pure index read:
    * one banded self-join + candidate-bounded verification, corpus
    * never touched.
    */
  def selfNearDupPairsFromIndex(corpusShingles: DataFrame,
                                corpusBandIndex: DataFrame,
                                num: Int = 4, den: Int = 5,
                                maxBucket: Int = 10000): DataFrame = {
    val capped = corpusBandIndex
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("key"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val cands = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cands, corpusShingles, num, den)
      .select(col("doc_a"), col("doc_b"))
  }

  /** [[incrementalNearDup]] over the documents table with the same
    * deterministic corpus/batch split as [[incrementalNewDocs]] —
    * the driver-query harness (q_dedup_incr_near).
    */
  def incrementalNearDupDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    incrementalNearDup(docs.filter(col("doc_id") % 10 < 8),
      docs.filter(col("doc_id") % 10 >= 8))
  }

  /** Near-dup CLUSTERS from the MinHash pair list: connected components
    * over the >=0.8-Jaccard pair graph, labeling every member doc with
    * its component's minimum doc_id — the canonical-representative
    * artifact a dedup pipeline actually consumes ("keep cluster_id ==
    * doc_id, drop the rest"). Only docs that occur in at least one pair
    * appear; singleton docs are trivially their own cluster and need no
    * row at 100 TB.
    */
  def nearDupClusters(spark: SparkSession, sfDir: String): DataFrame =
    clusterPairs(minHashNearDups(spark, sfDir).select(col("doc_a"), col("doc_b")))

  /** KEEP-BEST dedup policy — per near-dup cluster, keep the member
    * with the HIGHEST quality (ties to the smaller doc_id), not the
    * arbitrary min-id representative: the policy production corpus
    * builds actually want ("of these five mirrors, keep the longest /
    * cleanest copy"). Singletons keep themselves (cluster_id = own id,
    * the [[clusterPairs]] label convention extended to the full
    * corpus). One arg-max hash aggregate per cluster picks the keeper
    * — `max(struct(quality, -doc_id))` — no per-cluster window, so a
    * pathological mega-cluster costs one aggregate row, not one task.
    */
  def keepBestOn(docs: DataFrame, qualityCol: String): DataFrame = {
    val clusters = clusterPairs(
      minHashNearDupsOn(docs.select(col("doc_id"), col("text")))
        .select(col("doc_a"), col("doc_b")))
    val labeled = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val keepers = labeled.groupBy(col("cluster_id"))
      .agg(max(struct(col(qualityCol), -col("doc_id"))).as("w"))
      .select(col("cluster_id"), (-col("w.col2")).as("keeper_id"))
    labeled.join(keepers, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).cast("long").as("kept"))
  }

  /** Driver spelling: quality = n_chars (longest copy wins). */
  def keepBestNearDups(spark: SparkSession, sfDir: String): DataFrame =
    keepBestOn(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars")), "n_chars")

  /** Connected components over an undirected pair list (doc_a, doc_b) →
    * (doc_id, cluster_id = min doc_id reachable). Pregel-style min-label
    * propagation: each round, every node takes the min of its own label
    * and its neighbors' labels — one shuffled join + one aggregation per
    * round, fully distributed, converging in O(graph diameter) rounds.
    *
    * Scale design (100 TB): the pair list is already the SMALL artifact
    * (near-dup candidates post-verification, linear in corpus size — see
    * [[minHashNearDups]]), and near-dup components are dense clique-like
    * clusters with single-digit diameter, so the round count stays small
    * where it matters. Each round localCheckpoint()s the label frame to
    * truncate lineage (on a cluster, prefer `checkpoint()` to a
    * replicated dir for fault tolerance). The driver-side loop is control
    * plane only — per-round data never leaves executors; the one
    * driver-visible value is the converged/changed counter. For
    * adversarial long-chain graphs the published O(log n) alternative is
    * the large-star/small-star algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014 — public literature),
    * implemented as [[clusterPairsStar]]; hitting `maxIter` here FALLS
    * BACK to it, so pathological topology degrades to O(log n) rounds,
    * never to a wrong answer or a wall.
    *
    * Convergence is detected with a MONOTONICITY argument instead of a
    * per-round diff join: labels only ever decrease under min
    * propagation, so the label SUM strictly decreases iff any label
    * changed — one tiny aggregate per round (exact decimal sum, immune
    * to long overflow at any corpus size) instead of a full join against
    * the previous round.
    *
    * `maxIter` is a correctness guard, not a truncation: non-convergence
    * within it hands the graph to [[clusterPairsStar]] rather than
    * returning a partially-propagated labeling.
    */
  def clusterPairs(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .persist()
    // initialization IS the first propagation round: every node starts
    // at min(self, neighbors) — one aggregation over the edge list,
    // saving a full join round (every node has >= 1 edge by construction)
    // localCheckpoint(eager = false) throughout: the labelSum aggregate
    // that immediately follows every checkpoint materializes it anyway,
    // so the eager default paid one full extra job per round (profiled
    // on the r20 live-judge triage — CC rounds were half checkpoint
    // overhead on small pair graphs)
    var labels = edges.groupBy(col("u").as("doc_id"))
      .agg(min(col("v")).as("mv"))
      .select(col("doc_id"), least(col("doc_id"), col("mv")).as("cluster_id"))
      .localCheckpoint(false)
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = labels.isEmpty
    while (!converged && iter < maxIter) {
      val next = edges.as("e")
        .join(labels.as("l"), col("e.v") === col("l.doc_id"))
        .select(col("e.u").as("doc_id"), col("l.cluster_id").as("cluster_id"))
        .union(labels)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint(false)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    edges.unpersist()
    if (!converged) clusterPairsStar(pairs) else labels
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014 — public literature): same (doc_a, doc_b) → (doc_id,
    * cluster_id = component min) contract as [[clusterPairs]], but
    * converging in O(log n) rounds on ANY topology — the adversarial-
    * chain path where min-label propagation needs O(diameter) rounds.
    *
    * Each round rewires the edge set toward component minima:
    *   - large-star at node u (over the bidirectional neighborhood):
    *     every neighbor v > u is re-pointed at m = min(N(u) ∪ {u}) —
    *     strictly decreases big nodes' connections;
    *   - small-star at node u (edges oriented large→small): every
    *     neighbor (all <= u) and u itself re-pointed at m = min(N(u)) —
    *     collapses local chains into stars.
    * The fixed point is one star per component centered at its minimum;
    * both steps preserve connectivity (every emitted edge connects two
    * nodes already connected through u), so the center is the true
    * component min. Per round: two join+agg shuffles over the pair list
    * (the SMALL artifact — candidates post-verification), lineage
    * truncated via localCheckpoint, driver sees only counts.
    * Convergence = edge set unchanged (distinct sets of equal size, so
    * one-sided except suffices).
    */
  def clusterPairsStar(pairs: DataFrame, maxIter: Int = 60): DataFrame = {
    val nodes = pairs.select(col("doc_a").as("n"))
      .union(pairs.select(col("doc_b").as("n"))).distinct().persist()
    var edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(false)
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIter) {
      val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = bidir.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = bidir.join(minsL, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      val oriented = large.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val minsS = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = oriented.join(minsS, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(minsS.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false)
      converged = small.count() == edges.count() && small.except(edges).isEmpty
      edges = small
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"clusterPairsStar did not converge within $maxIter rounds — " +
          "O(log n) bound exceeded; inspect the input graph")
    // fixed point is a star per component: non-centers have exactly one
    // outgoing edge (to the center); centers have none → label = self.
    // min() makes the extraction idempotent even off the fixed point.
    val labels = nodes
      .join(edges.select(col("u").as("n"), col("v").as("lab")), Seq("n"), "left")
      .groupBy(col("n"))
      .agg(min(col("lab")).as("mlab"))
      .select(col("n").as("doc_id"), coalesce(col("mlab"), col("n")).as("cluster_id"))
    nodes.unpersist()
    labels
  }

  /** 64-bit SimHash near-dup pairs at Hamming distance <= 3 over unigram
    * token counts. Banding into 4×16-bit chunks gives GUARANTEED recall:
    * two signatures within Hamming 3 must agree on at least one of 4
    * bands (pigeonhole), so the bucket join misses nothing; candidates
    * are verified with bit_count(xor). Output: (doc_a, doc_b, hamming).
    *
    * Signatures come from the native aggregate
    * [[graft.functions.SimHashAgg]]: ONE ObjectHashAggregate over the
    * exploded token stream (per-occurrence ±1 sums to the same counters
    * as per-token ±count), replacing the composed spelling's two
    * shuffled aggregations — kept as [[simHashSignaturesRef]] and
    * equivalence-asserted in DedupSpec.
    */
  def simHashNearDups(spark: SparkSession, sfDir: String,
                      maxHamming: Int = 3): DataFrame = {
    val signed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimHashAgg.simhashAgg(xxhash64(col("tok"))).as("sig"))
    val banded = signed.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "key")))
    // no persist here: both self-join sides share one subplan, so Spark's
    // exchange reuse already computes the signature aggregation once
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Composed-builtins reference spelling of the SimHash signature —
    * per-(doc, token) counts, then 64 `sum(when(bit, cnt).otherwise(-cnt))`
    * columns — kept to keep the native [[graft.functions.SimHashAgg]]
    * honest (DedupSpec asserts signature-for-signature equality), same
    * contract as shinglesHof / minHashSignature for the other native
    * expressions. Not on the production path: two shuffled aggregations
    * vs the aggregate's one.
    */
  def simHashSignaturesRef(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$b")
    }
    val sums = toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 64)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    sums.select(col("doc_id"), sig.as("sig"))
  }
}
