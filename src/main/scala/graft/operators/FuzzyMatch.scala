package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FUZZY ENTITY MATCHING — the edit-distance join of record linkage /
  * catalog reconciliation: pair every name in set A with every name in
  * set B at Levenshtein distance ≤ 1, WITHOUT the A×B product.
  *
  * Blocking is the symmetric-deletion scheme (the SymSpell construction,
  * public domain — Garbe 2012): each name emits itself plus its |name|
  * single-character deletions as join keys. Two strings within
  * Levenshtein distance 1 ALWAYS share a key — equal strings share the
  * identity key, an insertion/deletion pair shares the shorter string
  * itself, and a substitution pair shares the deletion at the
  * substituted position — so candidate generation is a plain equi-join
  * on the variant key (complete by construction, no recall knob), and an
  * exact `levenshtein` verify kills the collisions (e.g. transpositions
  * share a deletion key at distance 2). This is the standard
  * sketch-then-verify shape of the dedup suite applied to edit distance.
  *
  * 100 TB shape: each side's variant frame is |names| × (avg_len + 1)
  * rows of (short key, name) — a shuffle join on the key with no
  * payload beyond the name pair; bucket sizes are bounded by how many
  * names share a deletion variant (vocabulary-shaped, not corpus-
  * shaped, because both sides are DISTINCT name catalogs). The verify
  * is per-candidate-pair, embarrassingly parallel. Distance budgets
  * d > 1 compose by d rounds of deletion (state grows O(len^d) — the
  * standard SymSpell trade) — not needed for the driver surface.
  */
object FuzzyMatch {

  /** name plus all single-character deletions, as an array column —
    * the HOF runs once per DISTINCT catalog name, off the hot path.
    */
  private def del1Variants(name: Column): Column =
    array_union(
      array(name),
      transform(sequence(lit(1), length(name)),
        i => concat(name.substr(lit(1), i - 1),
          name.substr(i + 1, length(name)))))

  private def variants(names: DataFrame, nameCol: String): DataFrame =
    names.select(col(nameCol),
      explode(del1Variants(col(nameCol))).as("variant"))

  /** All (name_a, name_b, dist) pairs with Levenshtein ≤ 1 between two
    * single-column name frames (deduplicated internally). Exactly equal
    * to the cross-product filter — the DuckDB oracle spelling — by the
    * symmetric-deletion completeness argument above.
    */
  def matchNamesOn(a: DataFrame, b: DataFrame): DataFrame = {
    val va = variants(a.select(col(a.columns.head).as("name_a")).distinct(), "name_a")
    val vb = variants(b.select(col(b.columns.head).as("name_b")).distinct(), "name_b")
    va.join(vb, "variant")
      .select(col("name_a"), col("name_b"))
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
  }

  /** Driver spelling: reconcile two catalogs carved from the part
    * table — side A the even part keys, side B the odd keys with a
    * deterministic typo planted on every third key (3rd character
    * dropped), so both the exact-match and distance-1 classes are
    * non-vacuous at every sf (checked: 64/80 at sf0.01).
    */
  def partCatalogMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.part(spark, sfDir)
    val a = part.filter(col("p_partkey") % 2 === 0).select(col("p_name"))
    val b = part.filter(col("p_partkey") % 2 === 1)
      .select(when(col("p_partkey") % 3 === 0,
        concat(substring(col("p_name"), 1, 2),
          expr("substring(p_name, 4)")))
        .otherwise(col("p_name")).as("p_name"))
    matchNamesOn(a, b)
  }
}
