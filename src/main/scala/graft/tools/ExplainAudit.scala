package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries so plan
  * regressions (lost pushdown, surprise shuffles, missed broadcasts)
  * are visible. Run: sbt "runMain graft.tools.ExplainAudit [queries...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q2_local_revenue", "q3_shipping_priority",
        "q11_topn_per_group", "q33_lookup_join", "v42_ann_topk",
        "v43_ivf_ann", "v44_embedding_lsh_pairs", "v45_pq_ann",
        "h09_product_profit", "h21_suppliers_waiting", "h11_important_stock",
        "q69_bucketed_join", "q70_salted_join", "t37_winnow_fingerprints",
        // round-10 re-planned rows — keep them in the default audit
        "d24_two_supplier_orders", "d25_cross_channel_intersect",
        "d05_margin_rollup_rank", "d06_rollup_topn",
        "t48_line_dedup", "t54_heavy_hitters",
        // round-12 additions: refined/filtered ANN + dynamic session gap
        "v50_pq_refine", "v51_ivfpq_refine", "v52_filtered_ann",
        "q87_dynamic_session_gap",
        // rounds 13-14: SQL-text dynamic session, staged v45/v46, IVF-SQ
        "q88_dynamic_session_sql", "v45_pq_ann", "v46_ivfpq_ann",
        "v54_ivfsq_refine",
        // late r14: TIMESTAMP→TIME cast through the Flink dialect
        "q90_time_cast", "q91_time_wrap_sql",
        // r16: TIME through the format roundtrips (map-side casts only)
        "q92_csv_time_roundtrip", "q93_json_time_roundtrip",
        "q94_avro_time_roundtrip",
        // r17: CTAS read-back + ORC numeric TIME wire
        "q95_ctas", "q96_orc_time_roundtrip",
        // r21: re-planned rows — keep the single-pass / pruned shapes
        // (conditional-sum collapses, order-grain partials, dim-first
        // pruning, payload-moves-once t59) visible in the audit
        "d17_cumulative_channels", "d21_yoy_decline", "d23_returns_adjusted",
        "h02_min_cost_supplier", "h05_local_supplier_volume",
        "h18_large_volume", "t59_exact_substr_removal")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
