package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` corpus (SURVEY.md §2
  * "Text analysis"). Every operator is a row-local projection — a
  * single scan with zero shuffles (the trailing ORDER BY doc_id is
  * oracle-mandated determinism only). At 100 TB each runs as a pure
  * map stage with column pruning down to (doc_id, text).
  *
  * Generalizes the reference's free-text `overview` handling
  * (/root/reference/sql/01_schema.sql:14, 02_etl.py:64-105) to
  * corpus-scale statistics.
  */
object TextOps {

  /** Per-language marker words for the heuristic language ID. Small
    * closed-class words are the classic cheap LID signal.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "que", "los", "una", "es"))

  /** Stopwords for the quality heuristic (English closed-class). */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in")

  /** Marker-word-count language ID: score each language by how many
    * tokens are that language's closed-class markers; argmax with a
    * fixed tie-break order (en > de > fr > es).
    */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val scored = d.select(
      col("doc_id") +:
      langMarkers.map { case (lang, words) =>
        markerCount(col("text"), words).as(s"${lang}_score")
      }: _*)
    val Seq(en, de, fr, es) =
      Seq("en", "de", "fr", "es").map(l => col(s"${l}_score"))
    scored
      .withColumn("lang_guess",
        when(en >= de && en >= fr && en >= es, "en")
          .when(de >= fr && de >= es, "de")
          .when(fr >= es, "fr")
          .otherwise("es"))
      .select("doc_id", "lang_guess", "en_score", "de_score", "fr_score", "es_score")
      .orderBy("doc_id")
  }

  /** Length / letter-ratio / stopword-ratio quality score. All-integer
    * outputs (FLOOR(100*a/b) ratios) so the oracle matches exactly.
    */
  def textQualityScore(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val norm = normText(col("text"))
    d.select(
        col("doc_id"),
        length(norm).cast("long").as("n_chars"),
        wsTokenCount(col("text")).as("n_tokens"),
        markerCount(col("text"), stopwords).as("n_stop"),
        length(regexp_replace(norm, "[^a-z]", "")).cast("long").as("n_alpha"))
      .withColumn("stop_x100", ratioX100(col("n_stop"), col("n_tokens")))
      .withColumn("alpha_x100", ratioX100(col("n_alpha"), col("n_chars")))
      .withColumn("quality_score",
        least(lit(100L), floor((col("stop_x100") + col("alpha_x100")) / 2.0).cast("long")))
      .select("doc_id", "n_chars", "n_tokens", "stop_x100", "alpha_x100", "quality_score")
      .orderBy("doc_id")
  }

  /** Whitespace + BPE-ish-regex token counts per document. */
  def textTokenCount(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        wsTokenCount(col("text")).as("ws_tokens"),
        bpeTokenCount(col("text")).as("bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Canonical fingerprint key per document (sorted distinct tokens).
    * The 64-bit hash variant ([[graft.functions.TextFunctions.fingerprint64]])
    * is what a 100 TB dedup would shuffle; the string key is emitted
    * here because it is engine-neutral and oracle-checkable.
    */
  def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        fingerprintKey(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }
}
