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
      .withColumn("n_tokens", size(split(col("text"), " ")))
      // Deterministic record id — never uuid() (SURVEY.md P10 note):
      // resumable re-runs must produce identical ids.
      .withColumn("record_id",
        substring(sha2(concat_ws("|", col("url"), col("warc_ts").cast("string")), 256), 1, 36))
      // one row per (url, warc_ts): re-crawled identical captures collapse
      .dropDuplicates("record_id")
      .select("record_id", "url", "url_canon", "domain", "slug",
        "warc_ts", "text", "text_md5", "head", "lang", "n_tokens")
  }
}
