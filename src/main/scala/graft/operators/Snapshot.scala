package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CORPUS SNAPSHOT DIFF — the audit artifact of an iterating corpus
  * build: given two generations of a document set (yesterday's ingest
  * and today's), report per (source, status) what changed at the
  * CONTENT level — `added` (fingerprints only in the new snapshot),
  * `removed` (only in the old), `retained` (both) — with fingerprint,
  * document, and token totals. Content-level means the diff is keyed by
  * the canonical md5 fingerprint (the [[graft.operators.Pipeline]] /
  * [[Mixture]] dedup-key spelling), so a re-crawled duplicate or a
  * re-assigned doc_id does not masquerade as churn; a fingerprint's
  * source attribution is `min(source)` over its carriers on the
  * deciding side (deterministic, engine-portable — no min_by float or
  * ordering license).
  *
  * 100 TB shape: one scan-fused (fp, source, n_tokens) aggregate per
  * side — the text never survives the scan — then a fingerprint-keyed
  * full outer join of two fp-sized frames and a final small
  * (source, status) rollup. No corpus-sized shuffle carries payload;
  * both join inputs are already one row per distinct fingerprint.
  */
object Snapshot {

  private def fpOf(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** One row per distinct fingerprint: (fp, src, n_docs, n_tokens). */
  private def summarize(docs: DataFrame): DataFrame =
    docs
      .select(fpOf(col("text")).as("fp"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("fp"))
      .agg(min(col("source")).as("src"),
        count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))

  /** Driver spelling: two deterministic overlapping snapshots carved
    * from the documents fixture (old drops doc_id ≡ 3, new drops
    * doc_id ≡ 7 mod 20), so all three statuses are non-vacuous.
    */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    snapshotDiffOn(docs.filter(col("doc_id") % 20 =!= 3),
      docs.filter(col("doc_id") % 20 =!= 7))
  }

  /** [[snapshotDiff]] over any pair of (doc_id, text, source) frames.
    * Emits (source, status, n_fps, n_docs, n_tokens); doc and token
    * totals come from the side that defines the status (`removed` →
    * old side, otherwise new side — the counts a build dashboard
    * charts as lost / gained / carried volume).
    */
  def snapshotDiffOn(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = summarize(oldDocs)
      .select(col("fp"), col("src").as("o_src"),
        col("n_docs").as("o_docs"), col("n_tokens").as("o_toks"))
    val n = summarize(newDocs)
      .select(col("fp"), col("src").as("n_src"),
        col("n_docs").as("n_docs2"), col("n_tokens").as("n_toks"))
    o.join(n, Seq("fp"), "full_outer")
      .select(
        coalesce(col("n_src"), col("o_src")).as("source"),
        when(col("o_src").isNull, lit("added"))
          .when(col("n_src").isNull, lit("removed"))
          .otherwise(lit("retained")).as("status"),
        when(col("o_src").isNull || col("n_src").isNotNull, col("n_docs2"))
          .otherwise(col("o_docs")).as("nd"),
        when(col("o_src").isNull || col("n_src").isNotNull, col("n_toks"))
          .otherwise(col("o_toks")).as("nt"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_fps"),
        sum(col("nd")).as("n_docs"), sum(col("nt")).as("n_tokens"))
  }

  /** PAIRWISE SOURCE CONTENT OVERLAP — the cross-leakage audit a
    * multi-source corpus build runs before mixing: for every ordered
    * pair of sources (src_a < src_b), how many distinct canonical
    * fingerprints they share, each side's distinct-content size, and
    * the overlap as ppm of the SMALLER side (containment — the measure
    * that catches a small source being a subset of a big one, which
    * plain Jaccard dilutes away).
    *
    * 100 TB shape: the corpus collapses to the distinct (source, fp)
    * frame at the scan (text dropped immediately); the pair counts come
    * from ONE fp-keyed self-equi-join of that fp-sized frame — the same
    * "fp-sized inputs only" contract as [[snapshotDiffOn]]. No pair of
    * sources is enumerated against the corpus; a fingerprint carried by
    * k sources contributes exactly k·(k−1)/2 pair rows, and k is
    * bounded by the source catalog, not the corpus.
    */
  /** Driver spelling: the fixture has no natural cross-source
    * duplicate content, so — per the [[Pipeline]] plantDups house
    * pattern — a deterministic slice (doc_id ≡ 1 mod 9) is re-planted
    * under a rotated source label, mirrored verbatim in the oracle, so
    * the overlap rows are non-vacuous.
    */
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val planted = docs.filter(col("doc_id") % 9 === 1)
      .select(col("text"),
        concat(lit("src"), ((col("doc_id") % 20 + 1) % 20).cast("string"))
          .as("source"))
    sourceOverlapOn(docs.select(col("text"), col("source"))
      .unionByName(planted))
  }

  /** [[sourceOverlap]] over any (text, source) frame. Emits
    * (src_a, src_b, shared_fps, n_a, n_b, containment_ppm).
    */
  def sourceOverlapOn(docs: DataFrame): DataFrame = {
    val fps = docs
      .select(col("source"), fpOf(col("text")).as("fp"))
      .distinct()
    val totals = fps.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = fps.select(col("source").as("src_a"), col("fp"))
      .join(fps.select(col("source").as("src_b"), col("fp")), "fp")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared_fps"))
    shared
      .join(broadcast(totals.select(col("source").as("src_a"),
        col("n").as("n_a"))), "src_a")
      .join(broadcast(totals.select(col("source").as("src_b"),
        col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_fps"),
        col("n_a"), col("n_b"),
        expr("shared_fps * 1000000 DIV least(n_a, n_b)")
          .as("containment_ppm"))
  }

  /** CDC CHANGELOG APPLY — merge-on-read compaction of a keyed change
    * stream onto a base snapshot: per key, the change row with the
    * HIGHEST `seq` wins; a winning `op = 'D'` is a tombstone (the key
    * disappears, even if it exists in base), any other winning op
    * replaces the key's payload, and base rows with no change pass
    * through. This is the batch half of a MERGE INTO / upsert-compaction
    * pipeline: the stored-index sinks already append deltas; this
    * operator is how a reader collapses base+delta into current state.
    *
    * `changes` must carry `keyCol`, `seqCol`, `opCol`, and exactly the
    * base payload columns; (key, seq) pairs must be unique — the
    * changelog-position contract every CDC source (binlog offset, LSN,
    * kafka offset) provides. Under that contract the winner picked by
    * `max(struct(seq, op, payload…))` is the arg-max row: structs order
    * lexicographically and seq alone already decides. The PLAN is one
    * aggregate with map-side partial combine (`partial_max` before the
    * exchange — only one combined row per touched key per partition
    * rides the shuffle), but it is a SortAggregate, not a
    * HashAggregate: Spark's hash aggregation requires fixed-width
    * mutable buffer types and a struct-typed max buffer is not one, so
    * BOTH phases sort their partition by key first (asserted in
    * SnapshotSpec so a future Spark version changing the shape is
    * noticed). At 100 TB changelog scale those per-partition sorts are
    * a real cost on top of the exchange — O(n log n) per partition over
    * the DELTA (never the base); if a profile ever shows them
    * dominating, the escape hatch is encoding (seq, op, payload) into a
    * single max-orderable BINARY so the buffer is hash-aggregable, at
    * the price of an encode/decode projection. The base merge is a
    * key-equi full outer join of two key-partitioned frames; at 100 TB
    * both sides bucket by the same key, and the changelog side has
    * already been compacted to one row per touched key (typically
    * ≪ base).
    */
  def applyChangelogOn(base: DataFrame, changes: DataFrame,
                       keyCol: String, seqCol: String,
                       opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val missing = (Seq(keyCol, seqCol, opCol) ++ payload)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes frame is missing columns: ${missing.mkString(", ")}")
    val winner = changes
      .groupBy(col(keyCol))
      .agg(max(struct((Seq(seqCol, opCol) ++ payload).map(col): _*))
        .as("w"))
      .select(Seq(col(keyCol), col(s"w.$opCol").as("_op")) ++
        payload.map(c => col(s"w.$c").as(s"_ch_$c")): _*)
    base.join(winner, Seq(keyCol), "full_outer")
      .filter(coalesce(col("_op"), lit("U")) =!= "D")
      .select(col(keyCol) +: payload.map(c =>
        when(col("_op").isNotNull, col(s"_ch_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** CHANGELOG DERIVATION — the inverse of [[applyChangelogOn]]: given
    * two keyed snapshots, emit the minimal change stream that turns the
    * old one into the new one — `I` for keys only in new, `D` for keys
    * only in old, `U` for keys whose payload differs; unchanged keys
    * emit NOTHING (the minimality that makes downstream IVM O(churn)).
    * Every row carries the caller's `seq` so the emitted batch composes
    * with later batches under the changelog-position contract; the
    * round-trip law `apply(old, derive(old, new)) == new` is the
    * operator's spec-asserted definition.
    *
    * Plan: one key-equi full outer join of the two snapshots, a
    * null-safe payload comparison (`<=>` per column — NULL payloads
    * compare equal to NULL, not to everything), one filter. At 100 TB
    * both sides are key-partitioned tables; the output is churn-sized.
    */
  def deriveChangelogOn(oldSnap: DataFrame, newSnap: DataFrame,
                        keyCol: String, seq: Long): DataFrame = {
    val payload = newSnap.columns.filterNot(_ == keyCol).toSeq
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      s"snapshot schemas differ: ${oldSnap.columns.sorted.mkString(",")} vs " +
        newSnap.columns.sorted.mkString(","))
    val o = oldSnap.select(col(keyCol) +:
      payload.map(c => col(c).as(s"_o_$c")): _*)
      .withColumn("_in_old", lit(1L))
    val n = newSnap.withColumn("_in_new", lit(1L))
    val same = payload.map(c => col(s"_o_$c") <=> col(c))
      .reduce(_ && _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("_in_old").isNull, lit("I"))
          .when(col("_in_new").isNull, lit("D"))
          .when(same, lit(null).cast("string"))
          .otherwise(lit("U")))
      .filter(col("op").isNotNull)
      .select(col(keyCol) +: lit(seq).as("seq") +: col("op") +:
        payload.map(c =>
          // tombstones carry the OLD payload (audit value); I/U the new
          when(col("op") === "D", col(s"_o_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Driver spelling: derive the change stream between the two
    * deterministic documents-table carvings [[snapshotDiff]] already
    * diffs (old drops doc_id ≡ 3, new drops ≡ 7 mod 20), with an
    * update class planted by re-sourcing the doc_id ≡ 11 mod 20 rows —
    * all three op classes non-vacuous.
    */
  /** SCD TYPE-2 dimension build from a changelog: one row per VERSION
    * of each key with its validity interval — valid_from = the
    * version's own seq, valid_to = the NEXT change's seq on that key
    * (whatever its op), open (NULL, is_current = 1) when no later
    * change exists. A delete emits no row of its own but CLOSES the
    * prior version through the same lead — tombstoned keys end with no
    * current version, exactly the warehouse contract.
    *
    * Plan: one per-key window (partition = key, order = seq — never
    * global), one filter. Everything integer/string, so the oracle's
    * LEAD spelling is bit-identical.
    */
  def scd2On(changes: DataFrame, keyCol: String, seqCol: String,
             opCol: String): DataFrame = {
    val nextSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(seqCol).asc)
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(nextSeq))
      .filter(col(opCol) =!= "D")
      .withColumn("valid_from", col(seqCol))
      .withColumn("is_current",
        when(col("valid_to").isNull, lit(1L)).otherwise(lit(0L)))
      .drop(seqCol, opCol)
  }

  /** [[scd2On]] over an orders-derived attribute stream: each order is
    * an update to its customer's "latest order total" attribute (key =
    * custkey, seq = orderkey, cents fixed-point) — the SCD2 history a
    * warehouse keeps for a slowly-changing customer attribute.
    */
  def scd2Orders(spark: SparkSession, sfDir: String): DataFrame =
    scd2On(
      Tables.orders(spark, sfDir).select(
        col("o_custkey").as("key"),
        col("o_orderkey").as("seq"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        lit("U").as("op")),
      "key", "seq", "op")

  def deriveChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val old = docs.filter(col("doc_id") % 20 =!= 3)
    val nw = docs.filter(col("doc_id") % 20 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 20 === 11, concat(col("source"), lit("-v2")))
          .otherwise(col("source")).as("source"),
        col("n_chars"))
    deriveChangelogOn(old, nw, "doc_id", seq = 1L)
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE — merge pre-aggregated partials
    * (yesterday's stored rollup + today's delta rollup) into the
    * up-to-date aggregate WITHOUT rescanning the base data: union the
    * partial frames and sum every counter per key. Sound for exactly
    * the algebraic aggregates whose state is a sum (count / sum /
    * min-max via min/max — anything expressible as a commutative
    * monoid); retractions ride along as rows with NEGATED counters,
    * the standard incremental-view-maintenance encoding.
    *
    * Plan: one union (no shuffle) + one key-keyed hash aggregate over
    * frames that are already aggregate-sized — at 100 TB the daily
    * maintenance cost is O(stored rollup + today's delta), never
    * O(history), which is the entire point.
    */
  def mergeRollupsOn(parts: Seq[DataFrame], keyCols: Seq[String],
                     counterCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergeRollupsOn needs at least one partial")
    parts.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(counterCols.head)).as(counterCols.head),
        counterCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Driver spelling of [[mergeRollupsOn]]: the per-customer order
    * rollup maintained from an 80% "stored" partial plus a 20% "delta"
    * partial (carved on o_orderkey % 10) — the merged result must
    * equal the from-scratch GROUP BY over all of orders, which is the
    * oracle.
    */
  def incrementalRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = (c: Column) =>
      (c.cast("decimal(18,2)") * 100).cast("long")
    def rollup(part: DataFrame): DataFrame = part
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
    val orders = Tables.orders(spark, sfDir)
    mergeRollupsOn(
      Seq(rollup(orders.filter(col("o_orderkey") % 10 < 8)),
        rollup(orders.filter(col("o_orderkey") % 10 >= 8))),
      Seq("o_custkey"), Seq("n_orders", "total_cents"))
  }

  /** Driver spelling of [[applyChangelogOn]] from the fixture: the
    * orders table AS the change stream for a per-customer activity
    * profile (key o_custkey, seq o_orderkey — unique, so the
    * latest-order-wins pick is exact), with every outcome class
    * non-vacuous by deterministic carving: `o_orderkey % 13 = 0` orders
    * are tombstones, `o_orderkey % 97 = 0` orders arrive for keys
    * OUTSIDE base (custkey + 1,000,000 — inserts), customers with
    * `c_custkey % 5 = 2` get no changes at all (pass-through), and the
    * rest are updates.
    */
  def cdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = (c: Column) =>
      (c.cast("decimal(18,2)") * 100).cast("long")
    val base = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("key"),
      cents(col("c_acctbal")).as("last_price_cents"),
      lit("N").as("last_status"))
    val changes = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") % 5 =!= 2)
      .select(
        when(col("o_orderkey") % 97 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("key"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 13 === 0, lit("D")).otherwise(lit("U"))
          .as("op"),
        cents(col("o_totalprice")).as("last_price_cents"),
        col("o_orderstatus").as("last_status"))
    applyChangelogOn(base, changes, "key", "seq", "op")
  }
}
