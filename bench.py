"""Benchmark harness: times the headline declared queries.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
    SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    (default 32)

Each query is executed with a count()/collect-free action pattern:
we force full materialization via ``df.write.format("noop")`` so
sink costs don't skew timings and nothing lands on the driver.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: every major operator family, weighted toward the
# shuffle/join-heavy ones that dominate at scale.
HEADLINE = [
    "wordcount",
    "inverted_index",
    "kv_fold_state",
    "kv_get_results",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "window_topk_parts",
    "events_sessionize",
    "events_tumbling_hour",
    "dedup_exact",
    "dedup_fingerprint",
    "topk_cosine",
    "text_token_stats",
    "ngram_bigrams_top20",
    "minhash_lsh_pairs",
    "asof_last_purchase",
    "q17_small_quantity_revenue",
    "percentiles_order_value",
    "window_running_balance",
]


def _cpu_calibration() -> dict[str, float]:
    """Fixed CPU workload timed at bench start, recorded in the JSON.

    Round-over-round totals on this box have drifted up to ~2x on
    identical code (round-2 finding: every shared query slowed by a
    near-uniform 1.3-3x, including 0.2 s pure-column queries — an
    environment signature, not a plan one; the guest can't see host
    contention). Comparing (total / single_core_sec) across rounds
    separates plan regressions from box drift.
    """
    import numpy as np

    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    single = time.perf_counter() - t0
    a = np.random.default_rng(0).random((1500, 1500))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a
        a /= np.abs(a).max()
    blas = time.perf_counter() - t0
    return {"single_core_sec": round(single, 3), "blas_matmul_sec": round(blas, 3)}


# The grading driver stores (and greps) only the LAST ~2000 chars of
# bench stdout. Keep the final line comfortably inside that window so
# it always arrives complete and parseable.
TAIL_BUDGET = 1900


def _tail_line(
    base: dict,
    timings: dict[str, float],
    warm: dict[str, float],
    headline: list[str],
    budget: int = TAIL_BUDGET,
) -> str:
    """Build the final stdout line (VERDICT_r13 #1).

    r13 lost the driver's whole per-query channel: the big JSON line
    grew past the driver's ~2000-char tail capture, and the bytes dict
    sat between the timing dicts and the end of the line, so neither
    ``queries`` nor ``queries_warm`` survived in the captured tail and
    PERF_r13.per_query came back empty. This line therefore carries
    compact (no-spaces) per-query dicts GREEDILY FITTED to the budget:
    the 20-query r1 headline set first (cold then warm — the driver's
    round-over-round and core-scaling contract), then the remaining
    warm twins, then remaining cold entries, each added only while the
    serialized line stays under ``budget``. Entries that don't fit are
    still present in the complete dicts on the big line above; nothing
    is ever dropped from those (the ADD-only contract)."""
    out = dict(base)
    out["queries"] = {}
    out["queries_warm"] = {}
    adds = (
        [("queries", n, timings[n]) for n in headline if n in timings]
        + [("queries_warm", n, warm[n]) for n in headline if n in warm]
        + [
            ("queries_warm", n, v)
            for n, v in warm.items()
            if n not in headline
        ]
        + [
            ("queries", n, v)
            for n, v in timings.items()
            if n not in headline
        ]
    )
    for dname, name, val in adds:
        out[dname][name] = val
        if len(json.dumps(out, separators=(",", ":"))) > budget:
            del out[dname][name]
    return json.dumps(out, separators=(",", ":"))


def _load_prev_warm(here: Path) -> dict[str, float]:
    """queries_warm from the newest committed BENCH_r{N}.json — the
    baseline for the retime self-defense (VERDICT_r9 #6). Empty dict
    when no prior round exists or the file doesn't parse."""
    import re

    best, best_n = None, -1
    for p in here.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json", p.name)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    if best is None:
        return {}

    def _warm_of(d: dict) -> dict[str, float] | None:
        if isinstance(d, dict) and "queries_warm" in d:
            return {k: float(v) for k, v in d["queries_warm"].items()}
        return None

    try:
        text = open(best).read()
    except OSError:
        return {}
    # the committed BENCH_r{N}.json is usually the DRIVER's wrapper:
    # a pretty-printed dict whose "tail" field holds the last ~8KB of
    # bench stdout (which, by the r6 key-order contract, includes the
    # whole queries_warm dict before the headline scalars)
    try:
        whole = json.loads(text)
    except ValueError:
        whole = None
    if whole is not None:
        got = _warm_of(whole)
        if got is not None:
            return got
        tail = whole.get("tail") if isinstance(whole, dict) else None
        if isinstance(tail, str):
            m = re.search(r'"queries_warm":\s*(\{[^{}]*\})', tail)
            if m:
                try:
                    return {
                        k: float(v) for k, v in json.loads(m.group(1)).items()
                    }
                except ValueError:
                    pass
        return {}
    # raw bench stdout: >1 line; the big dict is the first parseable
    # line holding queries_warm
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            d = json.loads(ln)
        except ValueError:
            continue
        got = _warm_of(d)
        if got is not None:
            return got
    return {}


def _select_retimes(
    warm: dict[str, float],
    prev_warm: dict[str, float],
    threshold: float = 3.0,
) -> list[str]:
    """Warm entries whose ratio vs the previous committed round
    exceeds ``threshold`` — candidates for one defensive re-run
    before emitting (VERDICT_r9 #6: the r9 driver capture printed an
    8.6x phantom regression from box load; a single warm re-time
    distinguishes a loaded-moment artifact from a plan regression).
    Tiny absolute times are exempt (sub-100ms noise doubles freely)."""
    out = []
    for name, t in warm.items():
        prev = prev_warm.get(name)
        if prev is None or prev < 0.1:
            continue
        if t > prev * threshold:
            out.append(name)
    return out


def main() -> None:
    calibration = _cpu_calibration()
    try:
        loadavg_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg_start = None
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("mrgo_spark_bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config(
            "spark.sql.warehouse.dir",
            tempfile.mkdtemp(prefix="mrgo_bench_wh_"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mrgo_spark.registry import load

    queries, _ = load()

    timings: dict[str, float] = {}
    failed: list[str] = []

    # Spawn the Python worker pool before the clock starts: the first
    # RDD job otherwise pays ~5 s of worker startup that belongs to
    # the session, not to whichever query happens to run first
    # (wordcount, in this file's order). Recorded in the JSON so the
    # exclusion is visible when comparing to rounds without it.
    t0 = time.perf_counter()
    spark.sparkContext.parallelize(range(256), int(CPUS)).map(lambda x: x).count()
    timings["session_warmup"] = round(time.perf_counter() - t0, 3)

    from mrgo_spark import metrics as _metrics

    # Per-query LOAD-INDEPENDENT byte columns (VERDICT_r12 #1): the
    # wall-clock numbers drift with box load, but shuffle/spill bytes
    # are a function of plan + data only — a round-over-round byte
    # jump is a plan regression even when the timings are noise.
    qbytes: dict[str, dict] = {}

    def timed(name, df_or_thunk):
        # Accepts a DataFrame or a thunk returning one. Thunks let the
        # clock cover plan CONSTRUCTION too — iterative operators
        # (converge-CC, eager checkpoints) run real jobs before the
        # final materialization, and those must not escape the timing.
        try:
            marker = _metrics.stage_marker(spark)
            t0 = time.perf_counter()
            df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            m = _metrics.stages_since(spark, marker)
            qbytes[name] = {
                "sr": m["shuffle_read"],
                "sw": m["shuffle_write"],
                "spill": m["spilled_disk"],
            }
        except Exception as e:  # keep the one-JSON-line contract
            # record as MISSING, not a negative time — a failure must
            # never reduce the headline total (round-2 lesson)
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            failed.append(name)

    # Headline = FIRST execution per query (comparable to earlier
    # rounds). A first execution also pays the plan's whole-stage-
    # codegen compile, which box load amplifies (measured 10-15 s on
    # heavy plans under contention vs ~1 s of real work) — so record
    # a SECOND, warm run per query separately: that's the steady-state
    # per-query cost, decoupled from JIT-under-load noise.
    warm: dict[str, float] = {}
    for name in HEADLINE:
        timed(name, lambda n=name: queries[n](spark, SF_DIR))
        if name in timings:
            try:
                t0 = time.perf_counter()
                queries[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                warm[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:
                print(f"bench: warm {name} failed: {e}", file=sys.stderr)

    # headline total covers HEADLINE successes only; a failed query
    # poisons comparability, so surface it loudly in the JSON instead
    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)

    # Round-2 operators, recorded SEPARATELY so the headline total
    # stays comparable to earlier rounds' 20-query set.
    EXTRA = [
        "hypertable_rollup",
        "range_join_errors_after_purchase",
        "bpe_token_stats",
        "wordcount_unicode",
        "salted_hot_key_agg",
        "embedding_centroids",
        "dataset_split",
        "sequence_chunks",
        "pii_scrub_audit",
        "tfidf_top_terms",
        "repetition_stats",
        "dup_cluster_components",
        "dedup_pipeline_canonical",
        "edit_distance_pairs",
        "sequence_packing",
        "corpus_prep",
        "line_dedup_stats",
        "embedding_quantize",
        "kv_state_at_seq",
        "lateral_latest_order",
        "q7_volume_shipping",
        "q10_returned_items",
        "q18_large_volume_customers",
        "q2_min_cost_supplier",
        "q8_market_share",
        "q13_customer_distribution",
        "q21_waiting_suppliers",
        "edit_distance_pairs_symdelete",
        "decontaminate_stats",
        "corpus_shuffle_order",
        # round-3 addition. semantic_dedup is deliberately NOT here:
        # its declared form is the bounded exact O(n²) verify (84 s
        # warm at sf0.1 — real pair compute, not JIT), same reason
        # embedding_near_pairs isn't benched; the scale path for both
        # is LSH/IVF candidate generation, which IS benched.
        "kv_epoch_serving",
        # round-4 additions. kv_rebalance_history is metadata-scale
        # rows — its timing records the 7-step localCheckpoint chain
        # overhead. kmeans/pagerank time the full iterative folds
        # (driver-tiny collects between rounds included).
        "kv_rebalance_history",
        "gopher_rules_audit",
        "kmeans_lloyd",
        "pagerank_order_part",
        # round-4b: winnowing (MOSS) fingerprints — audit is map-side
        # scan-bound; overlap rides the df-capped fingerprint join.
        "winnow_fingerprint_audit",
        "winnow_overlap_pairs",
        # md5-portable SRP LSH signatures (oracle-checked banding)
        "srp_signatures",
        "semantic_dedup_srp",
        # round-4c: exact-substring dedup (gram explode + hash count
        # + span merge) and PQ. NOTE the PQ/BPE session caches make
        # these entries ORDER-SEMANTIC: pq_codes runs first and
        # absorbs the one-time training (its cold number = build+
        # assign, like topk_cosine_ivf's @cold); pq_topk_adc/imi and
        # bpe entries after it are SERVE-path numbers. Compare across
        # rounds entry-by-entry with that split in mind — and their
        # warm twins diagnose serve-path drift only, not JIT-vs-plan.
        "exact_substring_audit",
        "exact_substring_scrub",
        "pq_codes",
        "pq_topk_adc",
        "pq_topk_imi",
        "bpe_train_merges",
        "media_phash_pairs",
        "kv_put_history_scd2",
        "lineitem_zorder_audit",
        "decontaminate_bloom_stats",
        # round-5: md5-portable MinHash (signatures are the shared
        # shingle+hash scan; pairs add the band join + exact set
        # verify), tokenizer application (serves from the BPE cache —
        # order-semantic after bpe_train_merges), KMV sketch, and the
        # incremental-ingestion dedup probe.
        "minhash_md5_signatures",
        "minhash_md5_pairs",
        "bpe_doc_token_counts",
        # r13: unigram tokenizer — train first (order-semantic: the
        # application entry serves from the unigram cache)
        "unigram_train_vocab",
        "unigram_doc_token_counts",
        "kmv_distinct_parts",
        "incremental_dedup_audit",
        "cms_token_heavy_hitters",
        "bigram_novelty_stats",
        "simhash_md5_pairs",
        "lang_id_confusion",
        "linreg_discount_quantity",
        "corr_matrix_lineitem",
        "auc_price_returnflag",
        "event_transition_matrix",
        "quantile_sketch_orders",
        "pr_at_price_thresholds",
        "stratified_sample_docs",
        "class_balance_docs",
        "profile_customer",
        "zipf_fit_tokens",
        # triangle_copurchase_top stays OUT (7 s warm wedge-close at
        # sf0.1 — real quadratic work, the semantic_dedup policy);
        # it is gate-cheap at sf0.01 and probed at 10x instead.
        # round-6: hashed-classifier filter (map-only), portable HLL,
        # sqrt-temperature mixture, per-language datacard, DSIR
        # selection scores, cluster-atomic split (runs the converge-CC
        # pipeline — compare to dedup_pipeline_canonical), BM25 +
        # hybrid RRF retrieval, hard-negative mining.
        "classifier_quality_scores",
        "hll_distinct_parts",
        "mixture_temperature_docs",
        "corpus_datacard",
        "dsir_importance_scores",
        "leakage_safe_split",
        # r10 (VERDICT_r9 #2): bm25_topk_fixed replaces bm25_topk_docs
        # in this slot — FIRST bm25-cache entry, so it absorbs the
        # one-time BM25Index build (order-semantic) exactly as
        # bm25_topk_docs did; everything after is serve-path numbers.
        "bm25_topk_fixed",
        "rrf_hybrid_retrieval",
        "hard_negatives_topk",
        "epoch_allocation_sources",
        # round-7: IMI-pruned hard negatives (serves from the PQ
        # session cache — order-semantic after pq_codes), the DSIR
        # importance-resampling pick (scores + Hamilton allocation),
        # and retrieval evaluation (queries×k-sized — serves from the
        # BM25 session cache, order-semantic after bm25_topk_docs).
        "hard_negatives_imi",
        "dsir_resample_docs",
        "retrieval_eval_bm25_vs_cosine",
        # portable bigram-LM perplexity (shuffle_hash model joins —
        # compare bigram_novelty_stats, the count-based stand-in),
        # CCNet terciles (LM + domain-sized threshold windows), FIM
        # transform + RAG sliding chunks (both map-only).
        "bigram_lm_bits",
        "ccnet_ppl_buckets",
        "fim_transform_docs",
        "sliding_chunks_docs",
        # embedding-space eval + training-pair assembly (both bounded
        # after the broadcast-anchor scan)
        "knn_label_eval",
        "contrastive_pairs",
        # X5 end-to-end media dedup (aHash bands -> CC -> canonical)
        "media_dedup_canonical",
        # DPO preference-pair assembly (classifier-scored, widened HOF)
        "preference_pairs_by_quality",
        # dataset-writer sharding (weighted distributed ranking)
        "token_balanced_shards",
        # padding-efficiency batching + quality-aware canonical dedup
        # (the latter runs the converge-CC pipeline — compare
        # dedup_pipeline_canonical)
        "length_bucket_batches",
        "canonical_dedup_by_quality",
        # round-8: the fully index-served hybrid (BM25 index lexical
        # leg + IMI-pruned semantic leg; serves from the PQ + BM25
        # session caches — order-semantic after pq_codes and
        # bm25_topk_docs; compare rrf_hybrid_retrieval, whose
        # semantic leg is the exact scorer), BLEU-style n-gram
        # precision eval (pair-bounded), T5 span corruption (map-only)
        "rrf_hybrid_served",
        "ngram_precision_eval",
        "span_corruption_docs",
        # round-9: graded-relevance eval with the dyadic discount
        # (serves from the BM25 cache + at-rest eval truth —
        # order-semantic after bm25_topk_docs), IMI-served k-NN eval
        # (PQ cache — order-semantic after pq_codes; compare
        # knn_label_eval, the exact scorer), per-file scan metadata
        # (one partial-agg shuffle per table).
        # r10 (VERDICT_r9 #2): the DCG bench row moved onto the FIXED
        # 8-query twin. The %100-doc entries (bm25_topk_docs,
        # dcg_eval_bm25_vs_cosine) stay DECLARED — their oracle rows
        # pin the ranking math over a corpus-sized query set — but
        # their bench/probe rows inherited the K²-by-fixture law
        # (query count grows with the corpus AND every copied query
        # hits K× duplicated candidates under the verbatim-copy scale
        # probe), which mis-graded the serve round after round.
        "dcg_eval_fixed",
        "knn_label_eval_imi",
        "file_scan_stats",
        # distinct-n diversity (one tagged gram explode, 2 shuffles)
        # and classifier-vs-heuristic calibration (map-only + <=16-row
        # agg)
        "ngram_diversity_by_lang",
        "classifier_calibration_bins",
        # easy-first curriculum schedule (compound-key distributed
        # ranking; classifier fold is the map cost)
        "curriculum_order_by_quality",
        # r10: the skew audit is one map-only scan + a ≤16-row agg
        # (serves from the PQ cache, order-semantic after pq_codes);
        # its IVF-cache sibling ann_ingest_conflict_audit is timed in
        # the IVF block below so topk_cosine_ivf@cold keeps absorbing
        # the one-time index build.
        "imi_cell_skew_audit",
        # r10 RL-data assembly: classifier fold + ONE group shuffle
        # (compare preference_pairs_by_quality, the same reward over
        # a pairing window)
        "grpo_group_advantages",
        "rejection_sample_bestofn",
        # r10 session 3: bitext mining (two exact kNN legs over a
        # bounded query set — compare topk_cosine, the one-leg form),
        # judge agreement + reward winsorize + Copeland leaderboard
        # (all classifier-fold map cost + small aggs; winsorize adds
        # a second corpus pass for the sketch cutoffs), ROUGE/F1
        # (pair-bounded, compare ngram_precision_eval), snapshot diff
        # (two folds + key join), k-anonymity (wordcount-shaped).
        "margin_bitext_mine",
        "judge_agreement_kappa",
        "copeland_system_ranking",
        "reward_winsorize_docs",
        "rouge_f_eval",
        "kv_state_diff",
        "k_anonymity_customer",
        # containment verify (bounded candidate join over the shingle
        # frame — compare ngram_jaccard's shape) + tokenizer fertility
        # (BPE cache application — order-semantic after
        # bpe_train_merges, like bpe_doc_token_counts).
        "ngram_containment_pairs",
        "bpe_fertility_by_lang",
        # pruned bitext mining (PQ session cache — order-semantic
        # after pq_codes; compare margin_bitext_mine, the exact legs)
        "margin_bitext_mine_imi",
        # RL trajectory assembly: one user shuffle, episode/step/
        # suffix windows sub-partition it
        "trajectory_returns_events",
        # r11 shardkv observables: dedup fold + row-local schedule
        # columns + one groupBy (epoch_serving's law); the handoff
        # audit adds the domain-grid interval-cumsum window
        "kv_handoff_gc_audit",
        "kv_transfer_serving",
        # r11: positional phrase search (postings broadcast-join the
        # tiny phrase-term table — corpus never shuffles) and the
        # corpus snapshot diff (two canon scans + one key join).
        # lsh_recall_eval stays OUT (the allpairs/semantic_dedup
        # policy): its truth leg IS the prefix join on shingle sets —
        # output-driven on the template-dense fixture; gate-cheap at
        # sf0.01 where the oracle checks it.
        "phrase_search_docs",
        "corpus_snapshot_diff",
        # r11b: memorization audit — gram explode + one agg +
        # TakeOrdered top-k (the wordcount law)
        "frequent_span_audit",
        # allpairs_jaccard_prefix stays OUT (the semantic_dedup
        # policy): 18 s warm at sf0.1 — 281k true J>=0.95 pairs on
        # the template-dense fixture, real output-driven verify work,
        # not JIT. Gate-cheap at sf0.01 (3075 pairs); the brute-force
        # -equality property test is its correctness evidence.
        # r12: missed-config catch-up (row-local schedule + one
        # groupBy), the privacy trio completion (wordcount-shaped QI
        # aggs), fixed-set proximity ranking (postings broadcast
        # join + array-local window math), and KMV pair overlap
        # (one tokenize+distinct pass; pair math on |langs|·64 rows)
        "kv_config_catchup_serving",
        "l_diversity_customer",
        "t_closeness_customer",
        "proximity_search_fixed",
        "kmv_jaccard_langs",
        "pass_at_k_events",
        # min-k tail of the shared bigram-bits kernel (the LM law +
        # one per-doc window)
        "min_k_prob_audit",
        # panel kappa: two interpreted text folds + one 8-row shuffle
        "fleiss_kappa_panel",
        # PRF: two bm25 passes + a feedback-sized expansion vote
        "prf_bm25_fixed",
        # r13: champion serve (order-semantic after bm25_topk_fixed —
        # cold absorbs the one-time champion build; warm twin is the
        # c-bounded bucket-pruned serve, the pair to compare against
        # bm25_topk_fixed's full-postings serve), SNM+FS linkage
        # (linear w*n pairs), IVM delta fold (delta scan +
        # domain-sized merge), session-guarantee audit (two window
        # shuffles), discounted returns (the trajectory chain), and
        # the unigram fertility rollup (serves the session unigram
        # cache like its BPE twin).
        "bm25_champion_topk_fixed",
        "record_linkage_customer",
        "matview_maintenance_orders",
        "kv_session_guarantees",
        "discounted_returns_events",
        "unigram_fertility_by_lang",
        "weighted_sample_docs",
        "brier_calibration_bins",
        "kv_consistent_ring_stats",
    ]
    # The heaviest extras are the ones box drift inflated 5-15x in
    # the round-3 driver run (q21/q8/symdelete showed 10-20 s there
    # vs 1.5-2.2 s on a calm box, identical plans). Record a warm
    # twin for each so BENCH_r{N} extras are drift-diagnosable
    # without re-running: cold≈warm → real cost; cold>>warm → JIT/
    # codegen under load, not a plan regression.
    WARM_EXTRA = {
        "q21_waiting_suppliers",
        "q8_market_share",
        "edit_distance_pairs_symdelete",
        "dedup_pipeline_canonical",
        "corpus_prep",
        "dup_cluster_components",
        "winnow_overlap_pairs",
        "srp_signatures",
        "semantic_dedup_srp",
        "exact_substring_scrub",
        "pq_topk_adc",
        "pq_topk_imi",
        "leakage_safe_split",
        "rrf_hybrid_retrieval",
        # r7 (VERDICT_r6 #8): separate first-run codegen from
        # steady-state serve cost. bm25_topk_fixed's cold number now
        # includes the one-time BM25Index build (the pq_codes
        # order-semantic note applies); its warm twin is the pure
        # at-rest serve path. (r10: was bm25_topk_docs — the fixed
        # 8-query twin replaced it in EXTRA, VERDICT_r9 #2.)
        "bm25_topk_fixed",
        "dcg_eval_fixed",
        "dsir_importance_scores",
        "rrf_hybrid_served",
        # r13: cold absorbs the one-time champion-table build; the
        # warm twin is the pure c-bounded serve
        "bm25_champion_topk_fixed",
        # r13 opt: cold-only numbers for these kept reading 2-6x
        # their steady state (JIT + one-time caches) round after
        # round — record the warm twin so the drift diagnosis needs
        # no re-run (the WARM_EXTRA charter above).
        "pagerank_order_part",
        "kmeans_lloyd",
        "prf_bm25_fixed",
        "ngram_containment_pairs",
        "media_dedup_canonical",
        "margin_bitext_mine_imi",
        "retrieval_eval_bm25_vs_cosine",
        "minhash_md5_pairs",
    }
    for name in EXTRA:
        timed(name, lambda n=name: queries[n](spark, SF_DIR))
        if name in WARM_EXTRA and name in timings:
            try:
                t0 = time.perf_counter()
                queries[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                warm[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:
                print(f"bench: warm {name} failed: {e}", file=sys.stderr)

    # Scan-parallelism variants, recorded SEPARATELY: the sf fixtures
    # are single-row-group parquet files, so every scan is ONE task
    # and the map side of each heavy query runs single-threaded — a
    # fixture artifact, not a plan property (at scale inputs arrive
    # as many splittable files). split_prep rewrites the three heavy
    # tables as CPUS files; the @split timings show what the same
    # plans do with real scan parallelism.
    from mrgo_spark.sources.tables import TABLES, load_table

    SPLIT_TABLES = {"documents", "lineitem", "events"}
    SPLIT_QUERIES = [
        "wordcount", "ngram_bigrams_top20", "minhash_lsh_pairs",
        "kv_fold_state", "dedup_fingerprint", "inverted_index",
        "repetition_stats", "tfidf_top_terms",
    ]
    try:
        t0 = time.perf_counter()
        staged = tempfile.mkdtemp(prefix="mrgo_split_")
        for t in TABLES:
            if t in SPLIT_TABLES:
                (
                    load_table(spark, SF_DIR, t)
                    .repartition(int(CPUS))
                    .write.mode("overwrite")
                    .parquet(f"{staged}/{t}.parquet")
                )
            else:
                os.symlink(f"{SF_DIR}/{t}.parquet", f"{staged}/{t}.parquet")
        timings["split_prep"] = round(time.perf_counter() - t0, 3)
        for name in SPLIT_QUERIES:
            timed(f"{name}@split", lambda n=name: queries[n](spark, staged))
    except Exception as e:
        print(f"bench: split variants failed: {e}", file=sys.stderr)

    # IVF index amortization: one-time partitioned-index build, then
    # the served query path (reads only probed cell partitions) next
    # to the one-shot form that re-assigns the corpus every call.
    from mrgo_spark.operators.similarity import IVFIndex
    from mrgo_spark.sources.tables import load_table as _load_table

    try:
        from pyspark.sql import functions as F

        emb = _load_table(spark, SF_DIR, "embeddings")
        qs = emb.filter(F.col("vec_id") % 100 == 0)
        # declared entry is the served form with a session index cache:
        # first call pays the one-time build, second shows steady state
        timed(
            "topk_cosine_ivf@cold",
            lambda: queries["topk_cosine_ivf"](spark, SF_DIR),
        )
        timed("topk_cosine_ivf", lambda: queries["topk_cosine_ivf"](spark, SF_DIR))
        # r10: re-embed conflict audit serves from the same session
        # IVF cache (@cold above already absorbed the build)
        timed(
            "ann_ingest_conflict_audit",
            lambda: queries["ann_ingest_conflict_audit"](spark, SF_DIR),
        )
        from mrgo_spark.operators.similarity import topk_cosine_numpy

        timed("topk_cosine@numpy", lambda: topk_cosine_numpy(emb, qs, k=5))
        t0 = time.perf_counter()
        idx = IVFIndex.build(emb, tempfile.mkdtemp(prefix="mrgo_ivf_"))
        timings["ivf_index_build"] = round(time.perf_counter() - t0, 3)
        timed("topk_cosine_ivf@index", idx.query(qs, k=5, n_probe=6))
    except Exception as e:
        print(f"bench: ivf index variants failed: {e}", file=sys.stderr)

    # Closure-based compressibility signal (zlib mapInPandas — the
    # topk_cosine@numpy pattern: benched directly, never declared)
    try:
        from mrgo_spark.operators.textstats import compression_ratio_stats

        timed(
            "compression_ratio@zlib",
            lambda: compression_ratio_stats(
                _load_table(spark, SF_DIR, "documents")
            ),
        )
    except Exception as e:
        print(f"bench: compression ratio failed: {e}", file=sys.stderr)

    # BM25 at-rest index amortization (r7, the ivf_index_build idiom):
    # one-time postings/df/dl build, then the served query path that
    # reads only the query terms' term_bucket partitions — next to the
    # two-pass form that re-tokenizes the corpus per call.
    try:
        from mrgo_spark.operators.retrieval import (
            BM25Index,
            bm25_topk,
            query_terms_from_docs,
        )

        docs = _load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        qterms = query_terms_from_docs(docs, F.col("doc_id") % 100 == 0)
        timed("bm25_topk@twopass", lambda: bm25_topk(docs, qterms, k=10))
        t0 = time.perf_counter()
        bm_idx = BM25Index.build(docs, tempfile.mkdtemp(prefix="mrgo_bm25_"))
        timings["bm25_index_build"] = round(time.perf_counter() - t0, 3)
        timed("bm25_topk@index", lambda: bm_idx.query(qterms, k=10))
        # fully SERVED hybrid: at-rest BM25 lexical leg + at-rest IVF
        # semantic leg fused by RRF — the production composition next
        # to the declared exact-leg rrf_hybrid_retrieval (`idx`/`qs`
        # come from the IVF block above; NameError lands in except)
        from mrgo_spark.operators.retrieval import rrf_fuse

        timed(
            "rrf_hybrid@served",
            lambda: rrf_fuse(
                [
                    bm_idx.query(qterms, k=20).select(
                        "query_id", "doc_id", "rank"
                    ),
                    idx.query(qs, k=20, n_probe=6).select(
                        "query_id",
                        F.col("neighbor_id").alias("doc_id"),
                        "rank",
                    ),
                ],
                k=10,
            ),
        )
    except Exception as e:
        print(f"bench: bm25 index variants failed: {e}", file=sys.stderr)

    # Bucketed fact-join variants, recorded SEPARATELY (not in the
    # headline total, which stays comparable round-over-round): the
    # one-time bucketing shuffle is bucket_prep; q3/q17 reruns on the
    # bucketed facts show the amortized shuffle-free join/agg cost.
    from mrgo_spark.sources import bucketed

    try:
        t0 = time.perf_counter()
        tables = bucketed.materialize_bucketed(spark, SF_DIR)
        timings["bucket_prep"] = round(time.perf_counter() - t0, 3)
        timed("q3_bucketed", bucketed.q3_bucketed(spark, SF_DIR, tables))
        timed("q17_bucketed", bucketed.q17_bucketed(spark, SF_DIR, tables))

        # Crossover probe (round-2 finding: q3_bucketed reads as a
        # regression next to plain q3). At sf0.1 orders fits under the
        # broadcast threshold, so the declared q3 plans a BHJ with no
        # shuffle at all — bucketing can't beat that and isn't meant
        # to. Its regime is the 100 TB one where NEITHER fact side
        # broadcasts; simulate it by disabling broadcast and repeat
        # the bare fact-fact join 3x: shuffle-SMJ vs zero-exchange
        # bucketed SMJ. This pair, not q3_bucketed vs q3, is the
        # apples-to-apples bucketing claim.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

            def _factjoin(li, o):
                return (
                    li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                    .groupBy("o_orderkey")
                    .agg(
                        F.count("*").alias("n_items"),
                        F.sum(
                            F.round(F.col("l_extendedprice") * 100).cast("long")
                        ).alias("cents"),
                    )
                )

            t0 = time.perf_counter()
            for _ in range(3):
                _factjoin(
                    _load_table(spark, SF_DIR, "lineitem"),
                    _load_table(spark, SF_DIR, "orders"),
                ).write.format("noop").mode("overwrite").save()
            timings["factjoin_nobhj_plain_x3"] = round(time.perf_counter() - t0, 3)

            t0 = time.perf_counter()
            for _ in range(3):
                _factjoin(
                    spark.table(tables[("lineitem", "l_orderkey")]),
                    spark.table(tables[("orders", "o_orderkey")]),
                ).write.format("noop").mode("overwrite").save()
            timings["factjoin_nobhj_bucketed_x3"] = round(
                time.perf_counter() - t0, 3
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception as e:
        print(f"bench: bucketed variants failed: {e}", file=sys.stderr)
    # Bench self-defense (VERDICT_r9 #6): the r9 driver capture
    # printed an 8.6x phantom regression (bm25 9.25 s vs 1.48 s at the
    # same HEAD) from a loaded box moment. Re-time ONCE any warm entry
    # >3x its committed previous-round warm number; the retimed value
    # is recorded alongside (never replacing) the original, so a
    # loaded-moment artifact shows as retimed<<original while a real
    # plan regression reproduces.
    prev_warm = _load_prev_warm(Path(__file__).resolve().parent)
    retimed: dict[str, float] = {}
    for name in _select_retimes(warm, prev_warm):
        try:
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            retimed[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"bench: retime {name} failed: {e}", file=sys.stderr)
    try:
        loadavg_end = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg_end = None
    loadavg = {"start": loadavg_start, "end": loadavg_end}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Key ORDER matters for auditability (VERDICT_r5 #2): the grading
    # driver keeps only the TAIL of this ~8 KB line, so the headline
    # scalars (value / warm_total / failed / calibration / sf) come
    # LAST — after the big per-query dicts — so a tail capture always
    # includes them. Still exactly ONE JSON line per the contract.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "unit": "sec",
                "note": (
                    "totals drift up to ~2x run-to-run on identical code "
                    "(r3 back-to-back: 41.1s then 50.6s; r1 23.3s); "
                    "inflation is near-uniform across queries incl. 0.2s "
                    "pure-column ones — host/VM contention, not plan "
                    "regressions. Compare per-query ratios + calibration, "
                    "not one total."
                ),
                # load-independent per-query byte columns (first
                # execution: sr/sw = shuffle read/write bytes,
                # spill = disk spill bytes) — compare THESE across
                # rounds when the box is loaded. Emitted FIRST among
                # the per-query dicts (VERDICT_r13 #1): the driver
                # keeps only the last ~2000 chars of stdout, and in
                # r13 this dict (emitted between the timing dicts and
                # the scalars) pushed BOTH timing dicts out of that
                # window — PERF_r13.per_query came back empty.
                "queries_bytes": qbytes,
                "queries": timings,
                "queries_warm": warm,
                # headline-only, so it stays comparable to BENCH_r03
                # (queries_warm additionally carries the WARM_EXTRA
                # drift-diagnosis twins from round 4 on)
                "value": total,
                "warm_total": round(
                    sum(warm[n] for n in HEADLINE if n in warm), 3
                ),
                # cold-headline hygiene (VERDICT_r12 #8): the raw cold
                # total pays first-execution codegen/JIT that grows
                # with the PLAN-CLASS count, not the engine;
                # jit_absorbed = sum over headline queries of
                # (cold - warm), value_ex_jit = value - jit_absorbed —
                # the cold headline with first-run compile backed out.
                # Raw "value" stays for r1 continuity.
                "jit_absorbed": round(
                    sum(
                        max(0.0, timings[n] - warm[n])
                        for n in HEADLINE
                        if n in timings and n in warm
                    ),
                    3,
                ),
                "value_ex_jit": round(
                    total
                    - sum(
                        max(0.0, timings[n] - warm[n])
                        for n in HEADLINE
                        if n in timings and n in warm
                    ),
                    3,
                ),
                "failed": failed,
                "calibration": calibration,
                "loadavg": loadavg,
                "retimed": retimed,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    # Second, final JSON line (VERDICT_r5 #2, preferred form): whatever
    # tail the driver captures, the last line of stdout is a complete
    # parseable summary carrying the gate-relevant scalars — and, since
    # r14 (VERDICT_r13 #1), a compact per-query channel that provably
    # fits the driver's ~2000-char tail window, so PERF per-query
    # speedups and core-scaling ratios stay computable even though the
    # big line above long outgrew that window. Measurement-bug note for
    # OPTIMIZATION_r14.md: this changes WHERE the numbers are printed,
    # not how anything is timed; the big line still carries the
    # complete dicts, unchanged.
    print(
        _tail_line(
            {
                "metric": "headline_summary",
                "value": total,
                "unit": "sec",
                "warm_total": round(
                    sum(warm[n] for n in HEADLINE if n in warm), 3
                ),
                "value_ex_jit": round(
                    total
                    - sum(
                        max(0.0, timings[n] - warm[n])
                        for n in HEADLINE
                        if n in timings and n in warm
                    ),
                    3,
                ),
                "failed": failed,
                "calibration": calibration,
                "loadavg": loadavg,
                "retimed": retimed,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            timings,
            warm,
            HEADLINE,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
