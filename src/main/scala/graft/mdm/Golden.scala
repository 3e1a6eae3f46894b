package graft.mdm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.masterId

/** Survivorship + golden-record assembly (reference
  * `generate_golden_record_sql` steps 6-7,
  * /root/reference/batch_mdm_gcp/bigquery_utils.py:719-804).
  *
  * Field-survivorship rules mapped per SURVEY.md A1-A5:
  *  - most-recent-wins (`warc_ts`) for volatile fields — the north rule's
  *    "survivorship by most-recent warc_ts" (reference: ARRAY_AGG ... ORDER
  *    BY processed_at DESC LIMIT 1, bigquery_utils.py:728-731) -> `max_by`
  *  - most-complete-wins (longest) for text surface (reference ORDER BY
  *    LENGTH(x) DESC, bigquery_utils.py:725,734-736) -> `max_by(x, length)`
  *  - lineage arrays: sorted collect_set (reference ARRAY_AGG DISTINCT)
  *  - deterministic master id: sha2 of the cluster's canonical key, first 36
  *    hex chars (F12, bigquery_utils.py:766-780).
  */
object Golden {

  /** assignments(record_id, cluster_id) x clean pages -> golden records. */
  def apply(assignments: DataFrame, clean: DataFrame): DataFrame = {
    val joined = clean.join(assignments, Seq("record_id")) // J9 inner equi-join

    joined.groupBy(col("cluster_id"))
      .agg(
        // A2 recency survivorship: url/text/lang of the most recent capture;
        // deterministic tie-break on (warc_ts, record_id)
        max_by(col("url_canon"), struct(col("warc_ts"), col("record_id"))).as("master_url"),
        max_by(col("text"), struct(col("warc_ts"), col("record_id"))).as("master_text"),
        max_by(col("lang"), struct(col("warc_ts"), col("record_id"))).as("master_lang"),
        // A1 completeness survivorship: longest text across the cluster
        max_by(col("text"), struct(length(col("text")), col("record_id"))).as("most_complete_text"),
        // canonical cluster key: lexicographically-min canonical url
        min(col("url_canon")).as("canonical_url"),
        // A3 plain aggregates
        min(col("warc_ts")).as("first_seen"),
        max(col("warc_ts")).as("last_activity"),
        // A4 / A5 lineage
        countDistinct(col("record_id")).as("source_record_count"),
        sort_array(collect_set(col("record_id"))).as("source_record_ids"),
        sort_array(collect_set(col("domain"))).as("source_domains"))
      .withColumn("master_id", masterId("url", col("canonical_url")))
      .select("master_id", "canonical_url", "master_url", "master_text",
        "master_lang", "most_complete_text", "first_seen", "last_activity",
        "source_record_count", "source_record_ids", "source_domains", "cluster_id")
  }
}
