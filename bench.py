#!/usr/bin/env python
"""Benchmark harness.

Plain run: executes the headline extraction pipeline over a deterministic
bench fixture (2000 interleaved docs, shared media pool) plus a
representative query set over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1), then prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

``--scaling``: runs the plain bench twice in fresh processes at
RAY_GRAFT_CPUS=8 and =32 (override the pair with GRAFT_SCALING_LO/HI)
on the same input and reports both headline times plus scaling
efficiency = (t_lo / t_hi) / (hi/lo)  (1.0 = linear).

Env: GRAFT_SF_DIR, RAY_GRAFT_CPUS (default 32), GRAFT_BENCH_DOCS (default
2000).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_FIXTURE_ROOT = "/tmp/pid_bench_fixture_v2"
BENCH_SEED = 42
# Every image span gets its own rendered image: the CV path then does real
# per-doc work (decode+tile+detect+recognize per unique image) and the
# scaling measurement reflects compute, not fixed overheads.
MEDIA_POOL = 0


def _ensure_bench_fixture(n_docs: int):
    from p_id_text_extraction_ray.fixtures.generate import generate_fixture

    root = f"{BENCH_FIXTURE_ROOT}_{n_docs}"
    marker = os.path.join(root, ".done")
    if not os.path.exists(marker):
        generate_fixture(root, n_docs=n_docs, seed=BENCH_SEED,
                         media_pool=MEDIA_POOL)
        with open(marker, "w") as f:
            f.write("ok")
    from p_id_text_extraction_ray.fixtures.generate import FixturePaths
    return FixturePaths(root=root, docs=os.path.join(root, "docs.parquet"),
                        oracle=os.path.join(root, "oracle.parquet"),
                        golden=os.path.join(root, "golden.parquet"),
                        media_root=os.path.join(root, "media"))


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", "6000"))

    import ray
    import ray.data as rd
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    fix = _ensure_bench_fixture(n_docs)

    # Warm (untimed): OS page cache for all inputs AND a small end-to-end
    # extraction pass so Ray worker processes and both actor pools exist
    # before the timed run — we measure compute + shuffle, not process
    # spawn or cold disk reads.
    for t in ("lineitem", "orders", "customer", "documents", "embeddings",
              "events", "nation", "region", "supplier"):
        rd.read_parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    subprocess.run(["bash", "-c",
                    f"cat {fix.media_root}/media/*/* > /dev/null 2>&1 || true"])

    from p_id_text_extraction_ray.pipelines.extract import extract_spans
    extract_spans(rd.read_parquet(fix.docs).limit(64), fix.media_root).count()

    times: dict[str, float] = {}

    # --- headline: flagship extraction over the bench fixture.
    # Two timed runs, report the min: the host is shared, and the faster
    # run is the better estimate of the engine's cost (both recorded).
    # GRAFT_HEADLINE_RUNS=1 is used by the scaling legs at large
    # GRAFT_BENCH_DOCS, where a second multi-minute run buys little
    # noise reduction and doubles the measurement's wall time.
    runs = []
    n_spans = 0
    for _ in range(int(os.environ.get("GRAFT_HEADLINE_RUNS", "2"))):
        t0 = time.perf_counter()
        out = extract_spans(rd.read_parquet(fix.docs), fix.media_root)
        n_spans = out.count()
        runs.append(round(time.perf_counter() - t0, 3))
    headline = min(runs)
    times["pid_extract"] = headline

    # --- representative query set over sf_dir (skipped in scaling
    # subprocesses: the scaling metric is the headline pipeline only, and a
    # shorter run narrows the shared-host noise window)
    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        import __ray_entry__ as E
        queries = E.queries()
        for name in ("q1_pricing_summary", "q3_shipping_priority",
                     "q5_local_supplier_volume", "q6_revenue_forecast",
                     "events_hourly", "events_sessionize",
                     "events_user_profile", "order_priority_revenue",
                     "dedup_exact", "dedup_minhash_lsh",
                     "dedup_ngram_jaccard", "ann_topk_bruteforce",
                     "ann_ivf_topk", "doc_token_stats", "top_bigrams",
                     "sample_mix", "urgent_lineitem_revenue",
                     "heavy_hitter_tokens", "approx_distinct_users",
                     "events_rolling_avg", "q7_nation_volume",
                     "q10_returned_items", "q18_large_volume_orders",
                     "events_interarrival", "user_event_paths",
                     "events_props_stats", "decontaminate_train",
                     "pack_sequences", "customer_order_totals",
                     "q2_min_price_supplier", "q9_profit_by_nation_year",
                     "q13_customer_distribution", "q16_part_supplier_counts",
                     "daily_activity_full_join", "chunk_documents",
                     "vocab_oov_rate", "fuzzy_token_pairs",
                     "strip_boilerplate_ngrams", "inverted_index",
                     "bm25_search", "token_cooccurrence",
                     "profile_lineitem", "audit_lineitem",
                     "chi2_term_source", "events_running_records",
                     "weighted_sample_docs", "doc_unigram_logprob",
                     "doc_compression_ratio", "events_error_followups",
                     "event_transition_matrix", "user_decayed_value",
                     "events_trailing_window", "user_activity_streaks",
                     "user_mode_event_type", "discount_quantity_spearman",
                     "pagerank_tokens", "events_value_percentile",
                     "lineitem_corr_matrix", "q11_important_stock",
                     "cap_per_source", "shuffle_corpus",
                     "doc_length_mad_by_lang", "dedup_paragraphs",
                     "gopher_quality_flags", "html_main_content",
                     "fix_text_encoding", "curate_web_corpus",
                     "ccnet_perplexity_buckets", "pii_redact",
                     "c4_quality_flags", "quality_model_score",
                     "audio_features", "video_frame_sample",
                     "vocab_growth_curve", "resample_to_lang_mix",
                     "dsir_importance_weights", "media_near_dup_pairs",
                     "curate_web_pipeline", "doc_novelty_score",
                     "doc_char_entropy", "token_triangle_count",
                     "doc_bigram_logprob", "ngram_contamination_rate",
                     "semdedup_prune", "bpe_train_merges",
                     "bpe_encode_stats", "train_split_stats",
                     "dedup_substring", "quality_classifier_train",
                     "orders_promo_windows", "orders_skyline",
                     "ann_recall_eval", "events_trimmed_mean",
                     "resample_temperature_mix", "embedding_pq_codes",
                     "ann_pq_topk", "decontaminate_fuzzy",
                     "quality_rank_fusion", "ann_ivfpq_topk",
                     "pid_extract_spans_check", "unigram_tokenizer_train",
                     "unigram_encode_stats", "dedup_cdc_chunks",
                     "lang_confusion_matrix", "ngram_diversity",
                     "zipf_slope", "embedding_opq_codes", "ann_opq_topk",
                     "order_basket_rules", "token_burstiness",
                     "embedding_outlier_scores"):
            t0 = time.perf_counter()
            res = queries[name](sf_dir)
            if isinstance(res, ray.data.Dataset):
                res = res.to_pandas()  # Dataset -> consume (execute the plan)
            times[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": f"headline extraction wall time ({n_docs} interleaved docs, "
                  "unique media per span) + query suite",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "bench_docs": n_docs,
        "spans_out": int(n_spans),
        "docs_per_sec": round(n_docs / headline, 2),
        "headline_runs": runs,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_HEADLINE_ONLY="1")
        if int(env.get("GRAFT_BENCH_DOCS", "6000")) > 24000:
            env.setdefault("GRAFT_HEADLINE_RUNS", "1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Default 8 vs 32; override with GRAFT_SCALING_LO/HI (e.g. 4 vs 16)
    # when external host load occupies part of the machine — the ratio is
    # what the efficiency normalizes by, so any N vs 4N pair is a valid
    # two-parallelism measurement and a pair that leaves headroom above
    # the noise floor isolates the engine's scaling from the neighbors'.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "headline extraction scaling (same input, fresh sessions)",
        "cpus_lo": lo, "cpus_hi": hi,
        f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "unit": "sec", "bench_docs": r_lo["bench_docs"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
