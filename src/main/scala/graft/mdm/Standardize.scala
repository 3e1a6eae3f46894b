package graft.mdm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standardization stage — the page analogue of the reference's
  * `generate_standardization_sql`
  * (/root/reference/batch_mdm_gcp/bigquery_utils.py:88-151) and its
  * streaming twin `standardize_record` (streaming_processor.py:38-72).
  * Pure column expressions (P1-P8): codegen'd, pushdown-safe, no UDFs.
  */
object Standardize {

  /** Output column set (CleanPage shape). */
  val cleanColumns: Seq[String] = Seq("record_id", "url", "url_canon", "domain",
    "slug", "warc_ts", "text", "text_md5", "head", "lang", "n_tokens")

  /** The reference's literal standardization scalars (P1-P5), kept verbatim
    * for record-shaped data (used when the input is customer-like rather
    * than page-like; unit-pinned in StandardizeSpec):
    * /root/reference/batch_mdm_gcp/bigquery_utils.py:99-125 and the
    * streaming twin streaming_processor.py:43-70. */
  object ref {
    import org.apache.spark.sql.Column
    /** P1: TRIM(UPPER(REGEXP_REPLACE(x, '[^a-zA-Z\s]', ''))) */
    def nameClean(c: Column): Column =
      trim(upper(regexp_replace(c, "[^a-zA-Z\\s]", "")))
    /** P2: LOWER(TRIM(email)) */
    def emailClean(c: Column): Column = lower(trim(c))
    /** P3: strip non-digits */
    def phoneClean(c: Column): Column = regexp_replace(c, "[^0-9]", "")
    /** P4: word-boundary address abbreviations then TRIM(UPPER(...)) —
      * STREET->ST, AVENUE->AVE, BOULEVARD->BLVD, ROAD->RD, DRIVE->DR
      * (bigquery_utils.py:110-122). */
    def addressClean(c: Column): Column = {
      val up = upper(c)
      val steps = Seq(
        "\\bSTREET\\b" -> "ST", "\\bAVENUE\\b" -> "AVE",
        "\\bBOULEVARD\\b" -> "BLVD", "\\bROAD\\b" -> "RD", "\\bDRIVE\\b" -> "DR")
      trim(steps.foldLeft(up) { case (col0, (pat, rep)) => regexp_replace(col0, pat, rep) })
    }
    /** P5: UPPER(TRIM(x)) */
    def upperTrim(c: Column): Column = upper(trim(c))
  }

  /** pages(url, warc_ts, html, text, lang) -> CleanPage columns.
    *
    * Mapping of reference scalar ops (SURVEY.md §2.2):
    *  - P1 name-clean    -> url canonicalization (lower, strip query/fragment,
    *                        trailing slash, www./m./amp. host aliases)
    *  - P2 email-clean   -> lower(trim(url))
    *  - P3 phone-clean   -> domain extraction (strip scheme/path)
    *  - P4 address-abbrev-> host-alias rewrites (www->-, m->-, amp->-)
    *  - P6 null-gate     -> url AND text non-null/non-empty
    *  - P9 hash          -> deterministic record_id + content md5
    */
  def apply(pages: DataFrame): DataFrame = {
    val url = lower(trim(col("url")))
    val noScheme = regexp_replace(url, "^https?://", "")
    val host = regexp_extract(noScheme, "^([^/?#]+)", 1)
    val domain = regexp_replace(host, "^(www\\.|m\\.|amp\\.)", "")
    val pathQ = regexp_replace(noScheme, "^[^/?#]+", "")
    val path = regexp_replace(regexp_replace(pathQ, "[?#].*$", ""), "/+$", "")
    val canon = concat(lit("https://"), domain, path)
    val slug = regexp_extract(path, "([^/]+)$", 1)

    pages
      // P6 null-gate (bigquery_utils.py:149-150 analogue)
      .filter(col("url").isNotNull && col("text").isNotNull && length(col("text")) > 0)
      .withColumn("url_canon", canon)
      .withColumn("domain", domain)
      .withColumn("slug", slug)
      .withColumn("text_md5", md5(col("text")))
      .withColumn("head", substring(col("text"), 1, 64))
      // non-empty tokens only — size(split(text," ")) counts empties on
      // double-spaced text and skews the length-ratio business rule
      // (agrees with GraftFunctions.tokens, pinned in StandardizeSpec)
      .withColumn("n_tokens", size(graft.functions.GraftFunctions.tokens(col("text"))))
      // Deterministic record id — never uuid() (SURVEY.md P10 note):
      // resumable re-runs must produce identical ids.
      .withColumn("record_id",
        substring(sha2(concat_ws("|", col("url"), col("warc_ts").cast("string")), 256), 1, 36))
      // one row per (url, warc_ts): re-crawled identical captures collapse
      .dropDuplicates("record_id")
      .select(cleanColumns.map(col): _*)
  }
}
