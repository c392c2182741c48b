package graft.tools

import java.nio.file.{Files, Paths}

import graft.runtime.GraftSession

/** Writes `docs/PLANS.md`: the formatted physical plan of each flagship
  * query at the given SF — the artifact for reviewing pushdown, pruning,
  * broadcast choice, and codegen span per query.
  * Usage: runMain graft.tools.DumpPlans [sfDir] [outFile]
  */
object DumpPlans {

  val flagships: Seq[String] = Seq(
    "q01_pricing_summary", "q03_topk_orders", "q08_revenue_by_nation",
    "q14_window_topn", "q24_hwm_incremental", "qa01_asof_join",
    "qa03_topk_aggregate", "qa04_band_join", "qa06_percentiles",
    "qa07_sliding_window", "qa09_argmax",
    "qd07_minhash_lsh", "qd13_decontaminate", "qd15_pack_sequences",
    "qd18_repetition", "qd20_incremental_dedup",
    "qd27_span_scrub", "qd28_token_budget", "qd29_leakage_split",
    "qd32_leakage_split_lsh",
    "qe01_knn_cosine", "qe03_cosine_neardup",
    "qe04_lsh_ann", "qe07_cluster_sample", "qe09_semantic_dedup_lsh",
    "qe10_ivf_knn_join",
    "qa14_approx_percentile_gate", "qa15_heavy_hitters", "qa16_hll_contract",
    "qa17_cdc_compact", "qd33_span_dedup", "ql07_merge_upsert", "ql08_scd2",
    "ql01_daily_summary",
    "qd34_pii_classes", "qd35_normalize_text", "qd36_corpus_mix",
    "ql09_snapshot_diff",
    // round 9: every query reading >= ~0.5 s in the round-8 quiet bench
    // joins the audited set, so SHUFFLE.md rows exist for all heavy
    // queries and the next round can diff exchanges mechanically
    "qd06_jaccard_pairs", "qd08_simhash", "qd12_jaccard_cooled",
    "qd17_dup_clusters", "qd24_tfidf_terms", "qd26_domain_quota",
    "qd30_contamination_score", "qe06_semantic_dedup", "qa05_integrity_checks",
    // round 11: the incremental-view-maintenance legs — ql11 was the
    // suite's heaviest query in round 10 with no plan dump or SHUFFLE row
    "ql10_incremental_view", "ql11_incremental_minmax",
    "ql12_incremental_distinct",
    // round 12: ql11/ql12 switched to writer-side feeds (their exchanges
    // must now be change-set-sized, not the 23-25 MB state diffs) and the
    // append-fed fact view joined the suite
    "ql13_incremental_appends",
    // round 13: the large-C exactness gate — the dumped plan is the
    // cell-joined probe (the matrix-kernel assignment runs inside
    // knnJoin's bounded query-side collect, before this plan); audited
    // for the same no-cartesian/no-spill bar as qe10, and its >0.5 s
    // bench cost puts it in the SHUFFLE set
    "qe11_ivf_knn_join_bigc",
    // round 13: data skipping — both run a full table lifecycle in-query
    // (appends + sidecars + fold + pruned read) and land >0.5 s in the
    // bench; the dumped plan is the PRUNED read (the point: its scan
    // lists only the surviving batch dirs)
    "ql14_data_skipping", "ql15_bloom_lookup", "ql16_change_feed",
    // round 14: the DML trio + feeds — all full lifecycles in-query and
    // all >0.5 s in the bench. The interesting dumped plans: ql18/ql19's
    // pruned-write-set reads, ql20's change-file union, ql21's
    // broadcast-anti-join deletion mask UNDER the batch pruning (the big
    // side must never shuffle), ql22's single full-outer merge
    "ql17_schema_evolution", "ql18_delete_where", "ql19_update_where",
    "ql20_change_feed_rows", "ql21_mor_delete", "ql22_merge_into",
    // round 15: the optimistic-commit lifecycle — the dumped plan is the
    // adopted-log-tip read after appends + an OCC fold + a post-fold
    // rebased append
    "ql23_occ_commits")

  /** Strip the identifiers that churn between runs and unrelated edits —
    * expression ids (`#123`), node/codegen numbering (`(12)`,
    * `[codegen id : 3]`), plan ids, and subquery host ids — so the hash
    * moves only when the plan SHAPE moves. Node renumbering from an
    * unrelated query's added operator must not read as drift here.
    */
  private[tools] def canonicalize(formatted: String): String = formatted
    .replaceAll("#\\d+", "#")
    // node ids only — anchored to the positions FormattedMode emits them
    // (line-leading "(12) Filter" detail headers; " (12)" tree-line tails);
    // an unanchored \(\d+\) would also erase parenthesized numeric
    // LITERALS in expressions, hiding a genuine plan change (advice r10)
    .replaceAll("(?m)^\\(\\d+\\)", "()")
    .replaceAll("(?m) \\(\\d+\\)$", " ()")
    .replaceAll("Reuses operator id: \\d+", "Reuses operator id: ")
    .replaceAll("\\[codegen id : \\d+\\]", "[codegen]")
    .replaceAll("plan_id=\\d+", "plan_id=")
    .replaceAll("Subquery:.*", "Subquery:")
    .replaceAll("cteId=\\d+", "cteId=")

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("docs/PLANS.md")
    val spark = GraftSession.get("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# Physical plans of the flagship queries\n\n")
    sb.append(s"Generated by `graft.tools.DumpPlans` over `$sfDir`. Things to check\n")
    sb.append("per plan: `PushedFilters`/`ReadSchema` on every parquet scan,\n")
    sb.append("`BroadcastHashJoin` for dim joins, a single `Exchange` per\n")
    sb.append("aggregation/window, and wide `WholeStageCodegen` spans.\n")

    val digests = flagships.map { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count() // finalize AQE
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(formatted)
      sb.append("```\n")
      name -> md5(canonicalize(formatted))
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), sb.toString)
    // one line per query: diffing two rounds' digests shows WHICH plans
    // changed without reading the 9k-line PLANS.md churn (VERDICT r9 #8)
    val digestOut = out.replaceAll("PLANS\\.md$", "PLANS_DIGEST.json")
    if (digestOut != out) {
      val json = digests.sortBy(_._1)
        .map { case (n, h) => s"""  "$n": "$h"""" }
        .mkString("{\n", ",\n", "\n}\n")
      Files.writeString(Paths.get(digestOut), json)
      println(s"[plans] wrote $digestOut")
    }
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
