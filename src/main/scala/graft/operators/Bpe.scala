package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE TOKENIZER INDUCTION (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units") — learning the merge
  * table is a corpus-scale counting job and belongs in the engine next
  * to the BPE-ish token *counter* ([[TextAnalysis]]): every training
  * run starts by inducing its vocabulary from the curated corpus.
  *
  * The classic algorithm: segment every word into character symbols,
  * repeatedly count adjacent symbol pairs (weighted by word frequency)
  * and merge the most frequent pair, k times. Ties break
  * deterministically by (count desc, left asc, right asc) so the merge
  * table is reproducible across engines and runs.
  *
  * 100 TB shape: the CORPUS is touched exactly once — the word-frequency
  * aggregate (one shuffle, map-side combined). Every merge iteration
  * after that runs on the distinct-WORD frame (vocabulary-sized:
  * bounded by Heaps' law at ~10⁷ rows even at web scale, ~10⁵ per
  * Zipf for common text), each iteration one tiny aggregate + a
  * 1-row `TakeOrdered` collect of the winning pair — the per-step
  * driver decision is control-plane by construction, exactly the
  * [[graft.engine.GrepEngine]] rarest-trigram precedent. The segment
  * frame is localCheckpoint'ed every [[CheckpointEvery]] merges and the
  * merge count is capped at [[MaxMerges]], so plan depth stays CONSTANT
  * in k (not O(k) nested HOFs) and the job count is bounded — the
  * lineage contract a 32000-merge production vocabulary needs.
  */
object Bpe {

  /** (word, freq) over the corpus — the single corpus-sized pass. */
  def wordFreqOn(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Character-symbol segmentation of the word column (no end-of-word
    * marker: the fixture tokenization is already word-bounded; a
    * production caller appends one before calling).
    */
  private def charSyms(word: Column): Column = split(word, "")

  /** Adjacent-symbol pair counts over a (syms, freq) segmentation
    * frame, weighted by word frequency. Pair structs are built
    * pre-explode so the symbol array never rides the exploded rows —
    * natively ([[graft.functions.AdjacentStructs]], r21 guide §4): the
    * former `transform(sequence(1, size - 1), i =>
    * struct(element_at(i), element_at(i + 1)))` spelling was an
    * interpreted HOF per row per merge iteration (BpeSpec pins the
    * native == composed parity).
    */
  def pairCountsOn(seg: DataFrame): DataFrame =
    seg.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(graft.functions.AdjacentStructs
        .adjacentStructs(col("syms"), "lsym", "rsym")).as("p"))
      .groupBy(col("p.lsym"), col("p.rsym"))
      .agg(sum(col("freq")).as("cnt"))

  /** One BPE merge applied to a symbol array: every leftmost-first
    * adjacent (l, r) becomes the fused symbol — the standard greedy
    * left-to-right application (an "aa"+merge(a,a) run becomes
    * [aa, a], matching the reference algorithm). Native one-pass loop
    * ([[graft.functions.BpeMergeApply]], r21 guide §4): the former
    * `aggregate` fold — seed `[]`, per element compare acc's last
    * symbol / append or slice+concat-merge — was an interpreted HOF
    * whose closure paid O(n) array copies per element (O(n²) per row)
    * per merge step; BpeSpec pins the native == composed parity
    * including the merged-symbol-never-re-merges and null-element
    * edges.
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    graft.functions.BpeMergeApply.bpeMerge(syms, l, r)

  /** Hard ceiling on the learnable merge count — the [[Graph]]
    * `pageRank iters <= 20` contract applied to the merge loop: the
    * loop is driver-SEQUENCED by construction (each step's winner is a
    * 1-row control-plane scalar), so an unbounded `k` is an unbounded
    * number of Spark jobs. 2^16 comfortably covers real tokenizer
    * vocabularies (GPT-2's 50k table is ~32k merges over a 256-byte
    * alphabet; callers wanting more are past what one driver loop
    * should schedule).
    */
  val MaxMerges = 65536

  /** LINEAGE CONTRACT (r18 verdict #3): `seg` is re-derived through a
    * nested [[applyMerge]] HOF per step, so the analyzed plan nests one
    * `aggregate` expression per merge since the last cut — at real
    * vocabulary sizes (k ≈ 32000) the analyzer dies long before the
    * cluster does. The loop therefore `localCheckpoint`s the vocab-sized
    * segmentation frame every [[CheckpointEvery]] merges, bounding plan
    * depth at a constant while keeping the per-step work one tiny
    * aggregate + a 1-row TakeOrdered.
    */
  val CheckpointEvery = 16

  /** Learn `k` merges from a (doc_id, text) frame. Returns
    * (step, lsym, rsym, cnt) — the merge table in learned order. Stops
    * early when no pair remains (fully merged vocabulary).
    */
  def learnMergesOn(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0 && k <= MaxMerges,
      s"learnMergesOn needs 1 <= k <= $MaxMerges (driver-sequenced merge " +
        s"loop — see the MaxMerges contract), got $k")
    val spark = docs.sparkSession
    val words = graft.CacheScope.track(wordFreqOn(docs).persist())
    var seg = words.select(charSyms(col("word")).as("syms"), col("freq"))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      // 1-row TakeOrdered: the winning pair is a control-plane scalar
      val top = pairCountsOn(seg)
        .orderBy(col("cnt").desc, col("lsym"), col("rsym"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((step, l, r, c))
        seg = seg.select(applyMerge(col("syms"), l, r).as("syms"), col("freq"))
        // cut the nested-HOF lineage on a fixed cadence (vocab-sized
        // materialization — cheap next to even one corpus pass)
        if (step % CheckpointEvery == 0) seg = seg.localCheckpoint(false)
        step += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("step", "lsym", "rsym", "cnt")
  }

  /** Segment a (word) column with an already-learned merge table,
    * applying merges in learned order — the apply-side of the
    * tokenizer, usable on any corpus once the table exists.
    */
  def segmentWith(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSyms(word)) { case (syms, (l, r)) =>
      applyMerge(syms, l, r)
    }

  /** Driver spelling of the first-iteration pair table: top 20 adjacent
    * character pairs by (weighted count desc, lsym, rsym) — the exact
    * frame the first merge decision reads, hash-checked against DuckDB.
    */
  def bpePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val words = wordFreqOn(Tables.documents(spark, sfDir).select(col("text")))
    pairCountsOn(words.select(charSyms(col("word")).as("syms"), col("freq")))
      .orderBy(col("cnt").desc, col("lsym"), col("rsym"))
      .limit(20)
  }

  /** Driver spelling of the learned merge table: 8 merges over the
    * documents corpus. Rows-only at the driver (the iteration is not
    * SQL-expressible); BpeSpec asserts equality with a first-principles
    * single-machine reimplementation.
    */
  def bpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    learnMergesOn(Tables.documents(spark, sfDir).select(col("text")), 8)
}
