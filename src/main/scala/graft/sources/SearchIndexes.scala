package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{TextAnalysis, TextOps}

/** Materialized RANKED-SEARCH postings: the inverted index behind the
  * BM25 stored twin (q_search_bm25_idx) and the SQL search view — the
  * query-side counterpart of [[TextIndexes]]' trigram grep family
  * (grep finds lines; this RANKS documents).
  *
  * At 100 TB a ranked-search serving path must touch the QUERY TERMS'
  * postings, never the corpus text: the (term, doc_id, tf) postings
  * land PARTITIONED BY a term-hash bucket — the [[TextIndexes
  * .bucketOf]] spelling, shared verbatim by write and probe so pruning
  * can never drop a term — and the probe reads only the query terms'
  * buckets (partition pruning + a term row-group predicate), plus the
  * doc-length table (doc-scale, 2 columns). BM25's corpus statistics
  * (df, n_docs, avgdl) derive from the stored frames through the SAME
  * [[TextAnalysis.bm25Rank]] core the scan spelling uses, so the two
  * spellings cannot fork the score.
  *
  * Ledger mechanics are the family standard: per-ingest directories
  * with overwrite-on-own-label replay idempotence; doc_id is the
  * content identity (novel-only postings via the manifest anti-join,
  * written last); meta pins the bucket layout; tokenization is pinned
  * to the corpus-wide whitespace contract ([[TextOps.tokens]]).
  */
object SearchIndexes {

  import DedupIndexes.{BaseLabel, hasData, resolveIndex, delete,
    assertTargetNotOverInputs, writeOnce}

  /** The posting-derivation scheme this family stores — meta's
    * fork-prevention tag ([[GraphIndexes.Kind]]'s precedent, r17
    * ADVICE): another nbuckets-keyed index family landing at the same
    * path must fail the explicit kind refusal in [[readSearchMeta]],
    * not a later incidental schema error.
    */
  val Kind = "bm25"

  /** (doc_id, term, tf, positions) + (doc_id, dl) for a docs frame —
    * the shared head of the write and append paths. UNFILTERED term
    * space: the index serves any future query. `positions` (sorted
    * 1-based token offsets; tf = its size) is what upgrades the layout
    * from ranked retrieval to POSITIONAL retrieval — the phrase probe
    * ([[searchPhraseFromIndex]]) intersects shifted position lists
    * instead of re-scanning corpus text, and at 100 TB positions cost
    * one long per token against the text they replace reading.
    */
  private def postingFrames(docs: DataFrame): (DataFrame, DataFrame) = {
    val toks = docs.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"),
        // posexplode is 0-based; store the scan spelling's 1-based
        // offsets so probe arithmetic matches element_at exactly
        sort_array(collect_list(col("pos") + 1)).as("positions"))
    val dl = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("dl"))
    (tf, dl)
  }

  private def writePostings(tf: DataFrame, dir: String, nbuckets: Int): Unit =
    tf.withColumn("bucket", TextIndexes.bucketOf(col("term"), nbuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** Full (re)build over `docs(doc_id, text)`; previous index removed. */
  def writeSearchIndex(docs: DataFrame, path: String,
                       nbuckets: Int = TextIndexes.DefaultBuckets): Unit = {
    require(nbuckets > 0, s"nbuckets=$nbuckets must be positive")
    assertTargetNotOverInputs(docs, path)
    val spark = docs.sparkSession
    import spark.implicits._
    delete(spark, path)
    Seq((Kind, nbuckets)).toDF("kind", "nbuckets")
      .write.mode("overwrite").parquet(s"$path/meta")
    val (tf, dl) = postingFrames(docs)
    writePostings(tf, s"$path/postings/ingest=$BaseLabel", nbuckets)
    dl.write.mode("overwrite").parquet(s"$path/doclen/ingest=$BaseLabel")
    docs.select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$path/manifest/ingest=$BaseLabel")
  }

  /** APPEND a delivery: postings + doc lengths for the docs NOVEL to
    * the index (manifest anti-join, own label excluded so a replay
    * re-derives instead of skipping), overwrite-on-own-label, manifest
    * last — the family contract.
    */
  def appendSearch(batch: DataFrame, path0: String, label: String): Unit = {
    require(label.nonEmpty && label != BaseLabel,
      s"append label must not collide with the full-build label '$BaseLabel'")
    val spark = batch.sparkSession
    val path = resolveIndex(spark, path0)
    val nbuckets = readSearchMeta(spark, path)
    val known =
      if (!hasData(spark, s"$path/manifest"))
        spark.range(0).select(col("id").as("doc_id"))
      else spark.read.parquet(s"$path/manifest")
        .filter(col("ingest") =!= label).select(col("doc_id"))
    val novel = batch.select(col("doc_id"), col("text"))
      .join(known, Seq("doc_id"), "left_anti").persist()
    try {
      // a delivery that is ENTIRELY already-indexed must not write a
      // vacant ingest label (empty postings/doclen/manifest dirs per
      // overlapping delivery) — the streaming sink's no-vacant-label
      // guard at the API level, the appendGraphNewOrders precedent
      if (!novel.isEmpty) {
        val (tf, dl) = postingFrames(novel)
        writePostings(tf, s"$path/postings/ingest=$label", nbuckets)
        dl.write.mode("overwrite").parquet(s"$path/doclen/ingest=$label")
        novel.select(col("doc_id")).distinct()
          .write.mode("overwrite").parquet(s"$path/manifest/ingest=$label")
      }
    } finally { novel.unpersist(); () }
  }

  /** Collapse a long-appended postings ledger into a fresh
    * single-generation index at `dst` — postings, doc lengths, and the
    * manifest under `ingest=base`, reading ONLY the stored index,
    * never the corpus text (postings are novel-only by the append
    * discipline, so reconciliation is a plain re-bucketed union). The
    * caller owns the src→dst pointer flip
    * ([[DedupIndexes.flipPointer]]) — the [[GraphIndexes
    * .compactGraphTo]] contract, completing the family symmetry.
    *
    * CRASH-WINDOW HEALING AT COMPACTION (r18 ADVICE): a crashed
    * [[appendSearch]] can leave postings rows whose docs never reached
    * doclen. [[readForTerms]]' doclen semi-join keeps them invisible to
    * serving, and a same-LABEL replay heals them by overwriting the
    * label dirs — but compaction erases labels, so folding those rows
    * into `ingest=base` unhealed would make a later replay append the
    * same docs as novel and double-count their tf/df forever. The
    * compacted generation therefore persists exactly the SCOREABLE doc
    * population: postings are semi-joined to doclen's doc ids (the
    * readForTerms guard, applied structurally at rest), and the base
    * manifest IS doclen's distinct doc ids — half-claimed docs stay
    * unclaimed, so the replay that re-delivers them lands them whole as
    * genuinely novel, with no surviving base rows to duplicate.
    */
  def compactSearchTo(spark: SparkSession, src0: String, dst: String): Unit = {
    val src = resolveIndex(spark, src0)
    require(!DedupIndexes.pathsOverlap(spark, src, dst),
      "compaction rewrites into a NEW, non-overlapping path; an equal " +
        "or nested src/dst would read and delete the same files")
    val nbuckets = readSearchMeta(spark, src)
    delete(spark, dst)
    import spark.implicits._
    Seq((Kind, nbuckets)).toDF("kind", "nbuckets")
      .write.mode("overwrite").parquet(s"$dst/meta")
    val scoreable = spark.read.parquet(s"$src/doclen")
      .select(col("doc_id")).distinct()
    // positions ride the compaction — dropping them would silently
    // demote a positional index to ranked-only
    spark.read.parquet(s"$src/postings")
      .select(col("doc_id"), col("term"), col("tf"), col("positions"))
      .join(scoreable, Seq("doc_id"), "left_semi")
      .withColumn("bucket", TextIndexes.bucketOf(col("term"), nbuckets))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dst/postings/ingest=$BaseLabel")
    spark.read.parquet(s"$src/doclen").select(col("doc_id"), col("dl"))
      .write.mode("overwrite").parquet(s"$dst/doclen/ingest=$BaseLabel")
    scoreable
      .write.mode("overwrite").parquet(s"$dst/manifest/ingest=$BaseLabel")
  }

  /** The stored (postings, doclen) frames, postings PRUNED to the
    * query terms' buckets: the bucket values evaluate driver-side over
    * a terms-sized local frame with the write's own [[TextIndexes
    * .bucketOf]] spelling, so the partition filter can never disagree
    * with the layout. Postings are novel-only by the append
    * discipline — no merge-on-read aggregation is needed.
    *
    * HALF-CLAIMED-LABEL hygiene (r17 ADVICE): [[appendSearch]] writes
    * postings, then doclen, then manifest; a crash between the first
    * two leaves postings rows whose docs are absent from doclen — they
    * can never be SCORED (the doclen inner join drops them) but their
    * tf rows would inflate df, skewing every query sharing those terms
    * until the same-label replay heals the window. The returned
    * postings are therefore semi-joined to doclen's doc ids, so df and
    * scoring derive from the same healed doc population structurally —
    * no caller needs to know a crashed label (the graph family's
    * excludeIngest, made automatic). Doc-keyed like [[TextAnalysis
    * .bm25Rank]]'s own doclen join, and over the term-pruned (tiny)
    * postings side — no new corpus-scale work.
    */
  def readForTerms(spark: SparkSession, path0: String,
                   terms: Seq[String]): (DataFrame, DataFrame) =
    readForTermsCols(spark, path0, terms,
      Seq(col("doc_id"), col("term"), col("tf")))

  /** [[readForTerms]] KEEPING the stored position lists — the phrase
    * probe's read (ranked probes never pay the array bytes).
    */
  private def readForTermsPositions(spark: SparkSession, path0: String,
                                    terms: Seq[String]): (DataFrame, DataFrame) =
    readForTermsCols(spark, path0, terms,
      Seq(col("doc_id"), col("term"), col("tf"), col("positions")))

  private def readForTermsCols(spark: SparkSession, path0: String,
                               terms: Seq[String],
                               cols: Seq[org.apache.spark.sql.Column])
      : (DataFrame, DataFrame) = {
    require(terms.nonEmpty, "readForTerms needs at least one term")
    val path = resolveIndex(spark, path0)
    val nbuckets = readSearchMeta(spark, path)
    import spark.implicits._
    val buckets = terms.toDF("term")
      .select(TextIndexes.bucketOf(col("term"), nbuckets).as("bucket"))
      .as[Int].collect().toSeq.distinct
    val dl = spark.read.parquet(s"$path/doclen")
      .select(col("doc_id"), col("dl"))
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
      .select(cols: _*)
      .join(dl.select(col("doc_id")), Seq("doc_id"), "left_semi")
    (tf, dl)
  }

  /** BM25 top-k over the stored index — [[TextAnalysis.bm25Rank]] on
    * the pruned postings; identical scores to the scan spelling over
    * the same corpus by the shared core.
    */
  def searchBm25FromIndex(spark: SparkSession, path: String,
                          terms: Seq[String], k: Int): DataFrame = {
    val (tf, dl) = readForTerms(spark, path, terms)
    TextAnalysis.bm25Rank(tf, dl, terms, k)
  }

  /** PHRASE top-k over the stored POSITIONAL postings — the serving
    * spelling of [[TextAnalysis.searchPhraseOn]]: a start position i
    * matches iff i ∈ ∩ⱼ (P(termⱼ) − j), where P is the term's stored
    * 1-based position list, so the probe is one bucket-pruned read of
    * the phrase terms' postings + (|phrase| − 1) doc-keyed inner joins
    * intersecting SHIFTED position arrays in codegen — the corpus text
    * is never touched (the scan spelling folds every doc's token
    * array; on a 100 TB corpus this reads |phrase| buckets instead).
    * Duplicate phrase terms work by construction (the same list joins
    * itself at two shifts). Scan == probe is spec-pinned, so the
    * stored twin shares the scan query's oracle. Healing: positions
    * ride [[readForTerms]]' doclen semi-join, so a half-claimed label
    * can no more fabricate a phrase hit than skew df.
    */
  def searchPhraseFromIndex(spark: SparkSession, path: String,
                            phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.size >= 2,
      s"searchPhrase needs a phrase of >= 2 tokens (got ${phrase.size})")
    require(k >= 1, s"searchPhrase needs k >= 1, got $k")
    val (tfp, _) = readForTermsPositions(spark, path, phrase.distinct)
    val perSlot = phrase.zipWithIndex.map { case (p, j) =>
      tfp.filter(col("term") === lit(p))
        .select(col("doc_id"),
          transform(col("positions"), x => x - lit(j)).as(s"p$j"))
    }
    val joined = perSlot.reduceLeft((a, b) => a.join(b, Seq("doc_id")))
    joined
      .select(col("doc_id"),
        size(phrase.indices.map(j => col(s"p$j"))
          .reduceLeft(array_intersect)).cast("long").as("n_occ"))
      .filter(col("n_occ") > 0)
      .orderBy(col("n_occ").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The nbuckets the stored layout was written with, after the kind
    * refusal: a path whose meta carries no `kind` column (not this
    * family's layout) or a different kind value is rejected with the
    * explicit fork-prevention message, never an incidental downstream
    * schema error ([[GraphIndexes]]' requireGraphMeta contract).
    */
  def readSearchMeta(spark: SparkSession, path0: String): Int = {
    val path = resolveIndex(spark, path0)
    require(hasData(spark, s"$path/meta"),
      s"no search-index meta at $path — build it with writeSearchIndex " +
        "before appending or probing")
    val meta = spark.read.parquet(s"$path/meta")
    require(meta.schema.fieldNames.contains("kind"),
      s"index meta at $path carries no posting-kind tag — not a " +
        s"'$Kind' search index (or a pre-kind layout; rebuild it with " +
        "writeSearchIndex)")
    val row = meta.head()
    val kind = row.getAs[String]("kind")
    require(kind == Kind,
      s"index at $path stores posting kind '$kind', not '$Kind' — " +
        "refusing to mix derivations in one index")
    row.getAs[Int]("nbuckets")
  }

  // -- driver-query stored twin: 80% base build + 20% delta append,
  // probed with the inline query's terms — novel-only postings make
  // the reconciled index equal the full-corpus derivation, so the twin
  // shares the inline oracle. --

  private def fixturePath(spark: SparkSession, sfDir: String): String = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val path = DedupIndexes.scratch("target/search_index", "bm25", sfDir)
    writeOnce(path) {
      writeSearchIndex(docs.filter(col("doc_id") % 10 < 8), path)
      appendSearch(docs.filter(col("doc_id") % 10 >= 8), path, "delta")
    }
    path
  }

  /** [[TextAnalysis.searchBm25]] probing the stored postings. */
  def bm25Probe(spark: SparkSession, sfDir: String): DataFrame =
    searchBm25FromIndex(spark, fixturePath(spark, sfDir),
      Seq("spark", "join"), 10)

  /** [[TextAnalysis.searchPhrase]] probing the SAME stored postings —
    * one index serves ranked AND positional retrieval.
    */
  def phraseProbe(spark: SparkSession, sfDir: String): DataFrame =
    searchPhraseFromIndex(spark, fixturePath(spark, sfDir),
      Seq("spark", "join"), 10)
}
