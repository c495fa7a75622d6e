package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{DedupIndexes, SimilarityIndexes => SI}

/** One embedding index family a streaming embeddings sink keeps
  * current — the [[StreamingOps.ingestEmbeddingsIndexed]] maintenance
  * contract, generalized from the IVF/PCA branches it replaced so
  * EVERY stored ANN family ([[graft.sources.SimilarityIndexes]]) can
  * ride the same sink. Each descriptor supplies four verbs; the sink
  * supplies the shared machinery (batch dedupe, corpus-membership
  * semi-join, own-label manifest exclusion, empty-delta skip,
  * manifest-gated bootstrap, crash-pinned-params refusal):
  *
  *   - `bootstrap(corpus)` — the full manifest-last build from the
  *     corpus (crash-healing: a build that died half-written left no
  *     manifest and is simply re-run);
  *   - `append(delta, label)` — fit-once/assign-forever batch append
  *     under `ingest=<label>` (overwrite-on-own-label replay
  *     idempotence);
  *   - `checkCrashed` — a SURVIVING meta without a manifest pins a
  *     crashed build's layout; a sink restarted at different params
  *     must refuse rather than silently bury it (changing the layout
  *     is a rebuild, not a restart);
  *   - `checkStored` — an ESTABLISHED index's stored config must match
  *     the sink's requested params, for the same reason.
  *
  * Families with nothing fitted and nothing pinned (SQ8 stores its
  * scale per vector; no meta exists) have vacuous checks — appends can
  * never fork a config that does not exist.
  */
sealed trait IndexMaintenance {
  def dir: String

  /** Family name for error messages. */
  def family: String

  private[streaming] def bootstrap(corpus: DataFrame): Unit
  private[streaming] def append(delta: DataFrame, label: String): Unit
  private[streaming] def checkCrashed(spark: SparkSession): Unit
  private[streaming] def checkStored(spark: SparkSession): Unit

  /** Shared refusal spelling for both check verbs. */
  protected def refuse(spark: SparkSession, crashed: Boolean,
                       stored: String, requested: String): Unit =
    require(stored == requested,
      if (crashed)
        s"a crashed $family build at $dir pinned $stored but the sink was " +
          s"started with $requested; restart the sink at the pinned params, " +
          "or rebuild to change the layout"
      else
        s"$family index at $dir was built with $stored but the sink was " +
          s"started with $requested; rebuild the index to change its layout")

  /** Does a meta table survive at `dir` (the crashed-build marker when
    * no manifest does)? */
  protected def hasMeta(spark: SparkSession): Boolean =
    DedupIndexes.hasData(spark, s"$dir/meta")
}

object IndexMaintenance {

  /** IVF inverted lists (float cells) — `writeIvfIndex`/`appendIvf`. */
  final case class Ivf(dir: String, nlist: Int = 16,
                       nassign: Int = 1) extends IndexMaintenance {
    val family = "IVF"
    private[streaming] def bootstrap(corpus: DataFrame): Unit =
      SI.writeIvfIndex(corpus, dir, qKey = dir, nlist = nlist, nassign = nassign)
    private[streaming] def append(delta: DataFrame, label: String): Unit =
      SI.appendIvf(delta, dir, label)
    private[streaming] def checkCrashed(spark: SparkSession): Unit =
      if (hasMeta(spark)) {
        val (n, a) = SI.readIvfMeta(spark, dir)
        refuse(spark, crashed = true, s"(nlist=$n, nassign=$a)",
          s"(nlist=$nlist, nassign=$nassign)")
      }
    private[streaming] def checkStored(spark: SparkSession): Unit = {
      val (n, a) = SI.readIvfMeta(spark, dir)
      refuse(spark, crashed = false, s"(nlist=$n, nassign=$a)",
        s"(nlist=$nlist, nassign=$nassign)")
    }
  }

  /** IVF-SQ8 quantized inverted lists — `writeIvfSqIndex`/`appendIvfSq`
    * (nassign pinned to 1 by the layout). */
  final case class IvfSq(dir: String, nlist: Int = 16) extends IndexMaintenance {
    val family = "IVF-SQ8"
    private[streaming] def bootstrap(corpus: DataFrame): Unit =
      SI.writeIvfSqIndex(corpus, dir, qKey = dir, nlist = nlist)
    private[streaming] def append(delta: DataFrame, label: String): Unit =
      SI.appendIvfSq(delta, dir, label)
    private[streaming] def checkCrashed(spark: SparkSession): Unit =
      if (hasMeta(spark)) {
        val (n, _) = SI.readIvfMeta(spark, dir)
        refuse(spark, crashed = true, s"(nlist=$n)", s"(nlist=$nlist)")
      }
    private[streaming] def checkStored(spark: SparkSession): Unit = {
      val (n, _) = SI.readIvfMeta(spark, dir)
      refuse(spark, crashed = false, s"(nlist=$n)", s"(nlist=$nlist)")
    }
  }

  /** PQ codes — `writePqIndex`/`appendPq`. */
  final case class Pq(dir: String, m: Int = 16,
                      ksub: Int = 32) extends IndexMaintenance {
    val family = "PQ"
    private[streaming] def bootstrap(corpus: DataFrame): Unit =
      SI.writePqIndex(corpus, dir, qKey = dir, m = m, ksub = ksub)
    private[streaming] def append(delta: DataFrame, label: String): Unit =
      SI.appendPq(delta, dir, label)
    private[streaming] def checkCrashed(spark: SparkSession): Unit =
      if (hasMeta(spark)) {
        val (sm, sk) = SI.readPqMeta(spark, dir)
        refuse(spark, crashed = true, s"(m=$sm, ksub=$sk)", s"(m=$m, ksub=$ksub)")
      }
    private[streaming] def checkStored(spark: SparkSession): Unit = {
      val (sm, sk) = SI.readPqMeta(spark, dir)
      refuse(spark, crashed = false, s"(m=$sm, ksub=$sk)", s"(m=$m, ksub=$ksub)")
    }
  }

  /** IVF-PQ coded inverted lists — `writeIvfPqIndex`/`appendIvfPq`. */
  final case class IvfPq(dir: String, nlist: Int = 16, m: Int = 16,
                         ksub: Int = 32) extends IndexMaintenance {
    val family = "IVF-PQ"
    private[streaming] def bootstrap(corpus: DataFrame): Unit =
      SI.writeIvfPqIndex(corpus, dir, qKey = dir, nlist = nlist, m = m, ksub = ksub)
    private[streaming] def append(delta: DataFrame, label: String): Unit =
      SI.appendIvfPq(delta, dir, label)
    private[streaming] def checkCrashed(spark: SparkSession): Unit =
      if (hasMeta(spark)) {
        val (n, sm, sk) = SI.readIvfPqMeta(spark, dir)
        refuse(spark, crashed = true, s"(nlist=$n, m=$sm, ksub=$sk)",
          s"(nlist=$nlist, m=$m, ksub=$ksub)")
      }
    private[streaming] def checkStored(spark: SparkSession): Unit = {
      val (n, sm, sk) = SI.readIvfPqMeta(spark, dir)
      refuse(spark, crashed = false, s"(nlist=$n, m=$sm, ksub=$sk)",
        s"(nlist=$nlist, m=$m, ksub=$ksub)")
    }
  }

  /** SQ8 codes — `writeSqIndex`/`appendSq`. Nothing fitted, nothing
    * pinned (the per-vector scale lives in the code rows), so the
    * config checks are vacuous by construction. */
  final case class Sq(dir: String) extends IndexMaintenance {
    val family = "SQ8"
    private[streaming] def bootstrap(corpus: DataFrame): Unit =
      SI.writeSqIndex(corpus, dir)
    private[streaming] def append(delta: DataFrame, label: String): Unit =
      SI.appendSq(delta, dir, label)
    private[streaming] def checkCrashed(spark: SparkSession): Unit = ()
    private[streaming] def checkStored(spark: SparkSession): Unit = ()
  }

  /** LSH sketches — `writeLshIndex`/`appendLsh`. The meta's third
    * field (dim) is measured from the corpus, not requested — appends
    * validate it themselves; the sink checks only the requested
    * (nTables, bitsPerTable). */
  final case class Lsh(dir: String, nTables: Int = 16,
                       bitsPerTable: Int = 2) extends IndexMaintenance {
    val family = "LSH"
    private[streaming] def bootstrap(corpus: DataFrame): Unit =
      SI.writeLshIndex(corpus, dir, nTables = nTables, bitsPerTable = bitsPerTable)
    private[streaming] def append(delta: DataFrame, label: String): Unit =
      SI.appendLsh(delta, dir, label)
    private[streaming] def checkCrashed(spark: SparkSession): Unit =
      if (hasMeta(spark)) {
        val (t, b, _) = SI.readLshMeta(spark, dir)
        refuse(spark, crashed = true, s"(nTables=$t, bitsPerTable=$b)",
          s"(nTables=$nTables, bitsPerTable=$bitsPerTable)")
      }
    private[streaming] def checkStored(spark: SparkSession): Unit = {
      val (t, b, _) = SI.readLshMeta(spark, dir)
      refuse(spark, crashed = false, s"(nTables=$t, bitsPerTable=$b)",
        s"(nTables=$nTables, bitsPerTable=$bitsPerTable)")
    }
  }

  /** PCA basis + reduced table — `writePcaIndex`/`appendPcaIndex`. */
  final case class Pca(dir: String, k: Int = 32) extends IndexMaintenance {
    val family = "PCA"
    private[streaming] def bootstrap(corpus: DataFrame): Unit =
      SI.writePcaIndex(corpus, dir, qKey = dir, k = k)
    private[streaming] def append(delta: DataFrame, label: String): Unit =
      SI.appendPcaIndex(delta, dir, label)
    private[streaming] def checkCrashed(spark: SparkSession): Unit =
      if (hasMeta(spark)) {
        val (_, sk) = SI.readPcaMeta(spark, dir)
        refuse(spark, crashed = true, s"k=$sk", s"k=$k")
      }
    private[streaming] def checkStored(spark: SparkSession): Unit = {
      val (_, sk) = SI.readPcaMeta(spark, dir)
      refuse(spark, crashed = false, s"k=$sk", s"k=$k")
    }
  }
}
