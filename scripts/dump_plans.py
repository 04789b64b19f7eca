"""Dump formatted physical plans of representative declared queries
to PLANS.md — the plan-shape evidence (broadcasts, pushdown, single
exchanges, WindowGroupLimit) in reviewable form. The hard guarantees
live in tests/test_plans.py; this artifact is the human-readable view.

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mrgo_spark.registry import load  # noqa: E402
from mrgo_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# (query, what the plan should show and why it scales)
PICKS = [
    ("wordcount", "MRJob RDD path (opaque to Catalyst) — see mtiming/rtiming "
     "tests for its parallelism evidence instead"),
    ("q1_pricing_summary", "filter pushed to parquet scan (PushedFilters), "
     "pruned ReadSchema, partial+final hash agg — one exchange"),
    ("q3_top_revenue_orders", "customer/orders broadcast below the lineitem "
     "join; TakeOrderedAndProject instead of global sort"),
    ("q17_small_quantity_revenue", "correlated-threshold decorrelation: "
     "per-part avg joined back without a nested loop"),
    ("events_sessionize", "single exchange on user_id shared by lag-window "
     "and groupBy — sessionization costs ONE shuffle"),
    ("range_join_errors_after_purchase", "binned equi-join reduction: no "
     "BroadcastNestedLoopJoin anywhere in the plan"),
    ("dedup_exact", "shuffle carries sha2 digests, never document bodies"),
    ("topk_cosine", "query side broadcast; WindowGroupLimit keeps per-"
     "partition top-k before the exchange"),
    ("minhash_lsh_pairs", "explode-once shingles -> ONE aggregate with 64 "
     "partial mins; band/bucket equi-join, never corpus^2"),
    ("semantic_dedup", "pair flags fold through one aggregate + one left "
     "join — the corpus shuffles once"),
    ("kv_fold_state", "dedup window + key window + fold agg; state is "
     "O(live value) via the last_put prefix filter"),
    ("kv_epoch_serving", "epoch/owner computed row-local — no config-table "
     "join; standard dedup window + one groupBy"),
    ("corpus_prep", "filter -> dedup -> split -> budget in two shuffles"),
    ("embedding_normalize", "norm materialized BEFORE the explode, division "
     "on scalars after — the r4 fix for the Generate-pushdown lambda copy"),
    ("gopher_rules_audit", "pure map-side column expressions, zero shuffles"),
    ("kmeans_lloyd", "final-iteration assignment: centroids ride as literal "
     "arrays, map-only pass, no join/shuffle"),
    ("pagerank_order_part", "final iteration: degree join + partial-agg "
     "contrib shuffle + TakeOrdered; checkpoints sever earlier rounds"),
    ("kv_rebalance_history", "7-step config fold over localCheckpointed "
     "NSHARDS-row tables; metadata-scale by design"),
    ("winnow_fingerprint_audit", "winnowing selection + set folds entirely "
     "map-side (array exprs, no explode) — zero shuffles after the scan"),
    ("winnow_overlap_pairs", "checkpoint barrier (ExistingRDD) before the "
     "fingerprint explode — the Generate-pushdown chain hazard; one hash "
     "partition by h reused by the df-cap window AND the self-join"),
    ("srp_signatures", "posexplode of the RAW vector, broadcast 8192-row "
     "plane grid join, partial-aggregated (vec_id,band,bit) shuffle, "
     "bit-pack agg — no expression fans, no Python"),
    ("semantic_dedup_srp", "SRP buckets -> candidate self-join -> explicit "
     "verify-width repartition -> per-vector-norm cosine filter -> min-id "
     "keep/drop fold; the fully oracle-checked non-quadratic semantic dedup"),
    ("exact_substring_spans", "checkpoint barrier before the gram explode; "
     "map-side-combined count by 8-byte hash; equi-join + per-doc window "
     "span merge — no all-pairs stage"),
    ("pq_codes", "map-only assignment: codebooks ride as literal arrays "
     "(one argmin struct per subspace), no join/shuffle after the scan"),
    ("pq_topk_adc", "literal integer LUT scoring (map-only) + one top-k "
     "window — the compressed-scan ANN path"),
    ("pq_topk_imi", "r5 prune-then-score: broadcast probe rows carry the "
     "query LUT, candidates join on cell0 BEFORE any ADC sum; served from "
     "the checkpointed codes frame (ExistingRDD, no re-assignment)"),
    ("minhash_md5_pairs", "explode-once shingle scan, ONE 32-min aggregate, "
     "band explode + equi-join on (band,bkey), window bucket cap, exact "
     "set verify only on survivors"),
    ("kmv_distinct_parts", "partial-aggregated DISTINCT on (grp,hash) then "
     "WindowGroupLimit top-k per group — k rows/group survive the sort"),
    ("incremental_dedup_audit", "existing side collapses to one "
     "(fingerprint,min_id) row before the probe join; batch window for "
     "intra-batch dups reuses the fingerprint partitioning"),
    ("corr_matrix_lineitem", "r5 ML-fit family: ONE scan + one partial "
     "agg computes every sum/product; pair rows unpivot via a single "
     "Generate over the aggregate row (no per-pair union re-scan)"),
    ("auc_price_returnflag", "score-bucket agg, per-group ordered cumsum "
     "over the domain-sized bucket table, one final agg — rank-sum AUC "
     "with no row-level window"),
    ("quantile_sketch_orders", "cells = one partial agg; cumsum + rank "
     "pick run over the |buckets| cell table, not the corpus"),
    ("triangle_copurchase_top", "r6 degree-ordered wedge join: edges "
     "re-oriented lower-degree endpoint first (bounds fan-out by "
     "sqrt|E| under skew), three scans of the SAME checkpointed "
     "ORIENTED edge RDD (ExistingRDD), corners credited by one "
     "Generate — no union re-running the join"),
    ("degree_assortativity_copurchase", "checkpointed edges + "
     "checkpointed degree frame (both ExistingRDD) — symmetrize and "
     "double-join without recomputing either aggregate"),
    ("profile_customer", "one-pass profiling: a single scan feeds ONE "
     "Expand + partial/final agg; per-column stats unpivot from the "
     "aggregate row — never a per-column union of scans"),
    ("classifier_quality_scores", "r6 classifier filter: tokenizer + "
     "weighted HOF fold ride in ONE projection over the scan — zero "
     "shuffles, the 256 literal weights travel in the expression"),
    ("hll_distinct_parts", "HLL registers via one partial-aggregated "
     "groupBy (grp,j) — no pre-DISTINCT shuffle (max is idempotent); "
     "estimator arithmetic on the 64-row register frame"),
    ("dsir_importance_scores", "r6 DSIR selection: gram explode feeds "
     "the 4096-cell bucket agg; the llr table comes back as a "
     "BROADCAST join onto the same gram stream — two corpus scans, "
     "per-doc agg keyed on id, no corpus-sized shuffle by bucket"),
    ("bm25_topk_docs", "r7 BM25 SERVED from the at-rest BM25Index: "
     "the corpus-side scan is the term_bucket-partitioned postings "
     "parquet with a PartitionFilters entry (only the query terms' "
     "buckets are read); the only documents scan left derives the "
     "query terms from the 1% doc_id%100 subset (filter pushed to "
     "the scan) — the corpus-sized tokenize is gone; query-term and "
     "df joins are broadcasts; WindowGroupLimit top-k per query"),
    ("rrf_hybrid_retrieval", "r6 hybrid fusion: served-BM25 subtree + "
     "broadcast-query cosine subtree union into one small groupBy — "
     "each ranked list is already top-k-bounded before the fuse"),
    ("epoch_allocation_sources", "r6 token budgeting: one tokenize "
     "scan + one partial agg to the |strata| frame; ALL water-filling "
     "windows (rank, cumsum, min-feasible-rank) run over 20 rows"),
    ("hard_negatives_imi", "r7 pruned negative mining: corpus cell0 "
     "assignments (ExistingRDD from the cached PQ codes frame) BHJ "
     "the 32-row broadcast probe set BEFORE any dot product "
     "(prune-then-score); label inequality rides the join; exact "
     "fixed-point cosine only on survivors; no "
     "BroadcastNestedLoopJoin anywhere"),
    ("dsir_resample_docs", "r7 DSIR resampling: the two-scan score "
     "subtree feeds a ≤17-row stratum agg; Hamilton windows run over "
     "that tiny frame (decimal(38,0) products); the pick is ONE "
     "window partitioned by stratum + broadcast quota join"),
    ("bigram_lm_bits", "r7 portable perplexity: bigram occurrences "
     "explode once; BOTH model joins (bg counts, condition counts) "
     "are shuffle_hash against Zipf-compressed aggregated sides (the "
     "bigram_novelty BHJ→SMJ cliff rule); V rides as a broadcast "
     "1-row crossJoin; one partial-agg per doc"),
    ("ccnet_ppl_buckets", "r7 CCNet terciles: the checkpointed score "
     "frame (ExistingRDD — the LM runs ONCE for histogram + output) "
     "feeds a ≤4001-row domain histogram; threshold windows run over "
     "that frame, thresholds broadcast back — no corpus sort"),
    ("contrastive_pairs", "r7 DPR pair assembly: two broadcast-anchor "
     "scans (positive leg label==, negative leg label!=) union into "
     "bounded top-k windows; no corpus×corpus join"),
    ("media_dedup_canonical", "r7 media dedup end-to-end: eager-"
     "checkpointed planted corpus (the Union-constraint Catalyst bug "
     "fix) → aHash bands → banded equi-join pairs → CC over pair ids "
     "only → broadcastable canonical join-back"),
    ("preference_pairs_by_quality", "r7 DPO pairs: one window "
     "partitioned by source (the pairing's inherent order) + one "
     "equi-join of the two pair sides; classifier fold rides the "
     "widened scan map-only"),
    ("token_balanced_shards", "r7 writer sharding: weighted "
     "distributed ranking — one shuffle into 4096 md5 buckets, "
     "in-bucket cumsum windows, 4096-row token prefix-sum broadcast "
     "back; NO global window (the corpus_shuffle law, weighted)"),
    ("canonical_dedup_by_quality", "r7 quality-aware canonical: the "
     "converge-CC cluster subtree + classifier-scored corpus join; "
     "rep selection is ONE running-first window by cluster — no "
     "corpus-sized rep join"),
    ("rrf_hybrid_served", "r8 FULLY index-served hybrid: lexical leg "
     "= bucket-pruned postings scan from the at-rest BM25Index "
     "(PartitionFilters INSET on term_bucket); semantic leg = IMI "
     "prune-then-score (cached PQ codes ExistingRDD BHJ the broadcast "
     "probe rows before any dot product — no exact corpus×queries "
     "scorer); both legs top-k-bounded before the RRF fuse. The one "
     "BroadcastNestedLoopJoin is the 1-ROW corpus-scalars broadcast "
     "crossJoin in the BM25 scoring tail (the blessed scalar-frame "
     "pattern), not a pair join"),
    ("ngram_precision_eval", "r8 generation eval: pair tokens "
     "checkpointed ONCE (ExistingRDD feeds all 2-side × 2-n gram "
     "consumers); gram-keyed LEFT joins and pair-keyed aggs are all "
     "pairs×length-sized"),
    ("dcg_eval_bm25_vs_cosine", "r9 graded eval: served-BM25 run + "
     "at-rest truth parquet; every join/agg is queries×k-sized; the "
     "ideal window partitions by query over the truth frame"),
    ("knn_label_eval_imi", "r9 IMI-served kNN eval: broadcast probe "
     "rows prune the cell0 candidate join BEFORE any dot product; "
     "vote tail is queries×k-sized (no BroadcastNestedLoopJoin)"),
    ("file_scan_stats", "r9 O1 file-granularity scan: one partial-agg "
     "shuffle per table grouped on input_file_name basename — group "
     "count = file count"),
    ("ngram_diversity_by_lang", "r9 distinct-n diversity: ONE tagged "
     "gram explode feeds both agg levels (no per-n corpus rescan); "
     "two hash-shuffles carrying gram strings"),
    ("classifier_calibration_bins", "r9 filter calibration: map-only "
     "score + keep fold, one partial agg to <=16 rows"),
    ("span_corruption_docs", "r8 T5 denoising transform: pure "
     "array-local projection — NO Generate anywhere (nothing for the "
     "r4 pushdown hazard to push into), zero exchanges"),
    ("bm25_topk_fixed", "r10 fixed-query BM25 serve: same bucket-"
     "pruned postings scan as bm25_topk_docs (PartitionFilters on "
     "term_bucket) but the query side is the FIXED 8-smallest-vec_id "
     "set — the bench/probe row measures the corpus-linear serve, "
     "not a corpus-sized query-set construction"),
    ("dcg_eval_fixed", "r10 fixed-query graded eval: served-BM25 run "
     "over the fixed 8-query set + the at-rest eval_truth_fixed "
     "parquet; every join/agg queries×k-sized; duplicate-truth guard "
     "(assert_true window) survives in the plan"),
    ("imi_cell_skew_audit", "r10 ANN staleness audit: ONE map-only "
     "scan carries all 16 literal-centroid distance folds; per-cell "
     "agg is ≤16 rows; the skew window + median pick run over that "
     "tiny frame (broadcast back) — no corpus-sized window"),
    ("ann_ingest_conflict_audit", "r10 re-embed conflict audit: the "
     "synthesized batch BROADCASTS into one column-pruned cells scan; "
     "the fixed-point per-dim compare rides the join projection — no "
     "shuffle, no corpus×corpus"),
    ("margin_bitext_mine", "r10s3 bitext mining: two BNLJ kNN legs "
     "(broadcast query/candidate sides), the fwd top-k frame "
     "lineage-cut (ExistingRDD) so its three consumers don't re-run "
     "the corpus scoring; widened scan parallelizes the interpreted "
     "fold"),
    ("copeland_system_ranking", "r10s3 leaderboard: ONE corpus "
     "shuffle to the checkpointed 64×4 best frame (ExistingRDD), "
     "self-join + explode-once credits all run on that tiny frame"),
    ("reward_winsorize_docs", "r10s3 winsorize: two corpus passes "
     "(sketch cells agg + clip projection), cutoffs broadcast back "
     "as a 1-row frame — no corpus-sized window"),
    ("judge_agreement_kappa", "r10s3 kappa: both judge folds ride "
     "ONE widened scan into a single partial agg to 8 rows"),
    ("ngram_containment_pairs", "r10s3 containment verify: shingle "
     "sets join onto the bounded candidate list (the jaccard "
     "verifier's shape) — never the corpus square"),
    ("margin_bitext_mine_imi", "r10s3 pruned bitext serving twin: "
     "broadcast probe rows join cell-assigned vectors BEFORE any dot "
     "product on BOTH legs (the hard_negatives_imi kernel); exact "
     "cosine only on survivors; shared _margin_stitch tail"),
    ("trajectory_returns_events", "r10s3 RL trajectories: ONE user "
     "shuffle — gap lag, episode running sum, step row_number and "
     "the return-to-go suffix sum all share the user hash partition "
     "(the finer (user, episode) windows need no second exchange)"),
    ("allpairs_jaccard_prefix", "r10s3 exact all-pairs join "
     "(VERDICT_r10 #5): NO CartesianProduct; the checkpointed "
     "(doc_id, keys) frame (ExistingRDD) feeds the prefix explode "
     "AND both verify joins — zero FileScans in the final plan"),
    ("phrase_search_fixed", "r11 positional phrase search: postings "
     "never shuffle — the phrase-term table broadcasts into the "
     "corpus scan, the anchor aggregate is candidate-sized"),
    ("kv_handoff_gc_audit", "r11 handoff GC: one write-scan "
     "aggregate to (shard,key) min-epoch, then the interval-cumsum "
     "window over the domain grid (linear in epoch count)"),
    ("kv_transfer_serving", "r11 transfer-window serving: dedup "
     "window + row-local schedule columns + ONE groupBy (no config "
     "table join)"),
    ("corpus_snapshot_diff", "r11 dataset versioning: two map-only "
     "canon projections + one full-outer doc_id join"),
    ("lsh_recall_eval", "r11 dedup-pipeline eval: truth leg = the "
     "prefix join on shingle sets (checkpointed keys frame), run "
     "leg = the banded candidates (checkpointed signature frame); "
     "full-outer pair join, one summary row"),
    ("frequent_span_audit", "r11b memorization audit (VERDICT_r11 "
     "#4): one scan + gram hash aggregate + TakeOrderedAndProject "
     "(per-partition bounded heaps); the only Window runs over the "
     "<= top_k survivors, never the gram domain"),
    ("kv_config_catchup_serving", "r12 missed-config catch-up "
     "(TestMissChange): dedup window + row-local outage schedule + "
     "ONE groupBy — no config table at any scale"),
    ("l_diversity_customer", "r12 privacy: (QI x sensitive) partial "
     "agg, per-class rank window over <=|segment|-row partitions"),
    ("t_closeness_customer", "r12 privacy: ONE checkpointed "
     "(QI x sensitive) agg feeds classes, the global distribution "
     "and the total; 5-row broadcast join; decimal(38,0) EMD"),
    ("proximity_search_fixed", "r12 proximity ranking: postings "
     "broadcast-join the fixed term set; min-window math is "
     "array-local after ONE groupBy — no pair shuffle"),
    ("kmv_jaccard_langs", "r12 sketch algebra: one tokenize+distinct "
     "pass into the checkpointed kept frame (ExistingRDD feeds BOTH "
     "pair sides); all pair math domain-bounded"),
    ("pass_at_k_events", "r12 eval: capped per-prompt window + one "
     "groupBy + 3-way k explode; binomials are literal lookups, "
     "zero joins"),
    ("min_k_prob_audit", "r12 membership inference: the bigram-LM "
     "kernel's shuffle_hash model joins + ONE per-doc window "
     "(doc-length-bounded partitions) + final groupBy"),
    ("fleiss_kappa_panel", "r12 panel agreement: map-only vote flags "
     "+ ONE shuffle to 8 rows; all kappa math in decimal(38,0) on "
     "the aggregated frame"),
    ("prf_bm25_fixed", "r12 PRF query expansion (plan record was the "
     "VERDICT_r12 #4 gap): final ranking serves entirely from "
     "checkpointed frames (zero FileScans); the candidate-term "
     "explode is feedback-pruned BELOW the Generate via a broadcast "
     "LeftSemi on the raw docs (the r13 fix — a join above an "
     "explode never pushes down, so the old shape tokenized the "
     "whole corpus)"),
    ("unigram_train_vocab", "r13 unigram-LM tokenizer training: the "
     "corpus is touched ONCE (distinct-word groupBy); the final "
     "vocab table is a driver-tiny createDataFrame (training rounds "
     "ran as map-only segmentations + vocab-sized collects, the "
     "kmeans-literal recipe)"),
    ("unigram_doc_token_counts", "r13 unigram application: one "
     "map-only segmentation of the checkpointed word table "
     "(ExistingRDD) broadcast into the occurrence explode; one "
     "per-doc partial agg"),
    ("kendall_tau_rankers", "r13 ranker-agreement eval: both BM25 "
     "legs share the checkpointed tf/dl frames; the common frame is "
     "checkpointed once for its three consumers; the pair self-join "
     "is per-query bounded (k^2), never corpus-shaped"),
    ("excess_bits_domain_weights", "r13 loss-based reweighting: the "
     "bigram-LM kernel's shuffle_hash model joins, then everything "
     "after the per-doc score is |domains|-row windows over one "
     "checkpointed frame"),
    ("unigram_fertility_by_lang", "r13 tokenizer-equity twin: the "
     "unigram application kernel re-aggregated at the language "
     "grain; segmentation stays on the checkpointed word table"),
    ("discounted_returns_events", "r13 discounted n-step "
     "return-to-go: the trajectory chain's ONE user shuffle; the "
     "16-step reward window sub-partitions (user, episode) like "
     "every other window — no second exchange"),
    ("bm25_champion_topk_fixed", "r13 impact-ordered serving: the "
     "at-rest champion scan is bucket-pruned AND <=c rows per term; "
     "no documents re-read at serve (query-side tokenize only)"),
    ("record_linkage_customer", "r13 entity resolution: sorted-"
     "neighborhood rank window + offset-explode equi-join (linear "
     "w*n candidates) — no range join, no cartesian"),
    ("matview_maintenance_orders", "r13 incremental view "
     "maintenance: base aggregate replays from ExistingRDD; only "
     "the two CDC delta branches scan orders (pushed predicates); "
     "merge is domain-sized"),
    ("kv_session_guarantees", "r13 session-guarantee audit: the "
     "as-of visibility lookup is the union + last_value window — "
     "one key shuffle + one client shuffle, no self-join"),
    ("weighted_sample_docs", "r13 priority sample: map-only "
     "fixed-point keys + distributed TakeOrdered(m) — no "
     "corpus-global window; the rank window runs on m rows only"),
    ("brier_calibration_bins", "r13 proper-scoring-rule calibration: "
     "map-only score+label folds, one <=16-row partial agg; squares "
     "in decimal(38,0)"),
    ("kv_consistent_ring_stats", "r13 consistent hashing: the "
     "successor lookup is a map-only array expression over the "
     "literal ring — zero placement shuffles; one key-count agg"),
]


def main() -> None:
    spark = get_spark(app_name="dump_plans")
    queries, _ = load()
    out = [
        "# PLANS — formatted physical plans of representative declared queries",
        "",
        f"Generated by scripts/dump_plans.py at {SF_DIR} (plan shapes are",
        "scale-independent; sizes/statistics are fixture-scale). Shape",
        "guarantees marked in annotations are enforced by tests/test_plans.py.",
        "",
    ]
    for name, note in PICKS:
        df = queries[name](spark, SF_DIR)
        out.append(f"## {name}")
        out.append("")
        out.append(f"_{note}_")
        out.append("")
        out.append("```")
        # _explainString mirrors .explain("formatted") but returns str
        out.append(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ).strip()
        )
        out.append("```")
        out.append("")
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(PICKS)} plans)")


if __name__ == "__main__":
    main()
