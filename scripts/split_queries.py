"""One-shot refactor: split the queries.py monolith into a per-domain
package, keeping only registry entries traceable to SURVEY.md §2 or the
LLM-data-pipeline brief (round-4 verdict item 1: quarantine the
q288-q464 algorithm-puzzle block, registry <= ~220).

Reads basicocr_ray/pipelines/queries.py, emits
basicocr_ray/pipelines/queries/ (package) with:
  _shared.py     — helpers/constants used by >1 domain module
  <domain>.py    — query defs + single-domain helpers + QUERIES/ORACLE_SQL
  __init__.py    — merges per-module dicts, re-exports compat names
The old monolith is deleted by the caller after verification.
"""

from __future__ import annotations

import ast
import os
import re
from collections import defaultdict

SRC_PATH = "basicocr_ray/pipelines/queries.py"
OUT_DIR = "basicocr_ray/pipelines/_queries_pkg"

# ---------------------------------------------------------------------------
# Triage: kept registry (219 entries).  q01-q200 = the SURVEY §2 + LLM-data
# core judged non-padding in rounds 1-3; survivors above q200 are the
# mission-core data-shaped ops the round-3 verdict named (or their obvious
# peers: structured extraction, IO formats, eval metrics, engine ops).
# ---------------------------------------------------------------------------

SURVIVORS = {
    "q298_merge_upsert",          # CDC/lakehouse upsert (S2/engine)
    "q312_html_table_extract",    # named keeper (structured extraction)
    "q313_jsonld_extract",        # structured metadata extraction
    "q315_universe_sample",       # named keeper (sampling)
    "q320_schema_evolution_union",# named keeper (union_by_name)
    "q321_sitemap_roundtrip",     # web-crawl source shape
    "q322_mmr_diversified_topk",  # retrieval diversification (LLM-data)
    "q327_heading_outline",       # DOM structure extraction (M9 analogue)
    "q330_dehyphenate",           # text normalization (M8 family)
    "q331_ligature_fold",         # text normalization (M8 family)
    "q333_hive_partition_roundtrip",  # named keeper (partitioned IO)
    "q335_band_join",             # named keeper (range/band join)
    "q336_cer_eval",              # char error rate (reference OCR metric)
    "q337_wer_eval",              # word error rate (reference OCR metric)
    "q342_gif_roundtrip",         # multimodal codec plumbing
    "q345_html_to_markdown",      # extraction output format
    "q347_ac_replace",            # AC-automaton op (A3 family)
    "q349_mime_sniff",            # content-type probe (S3 analogue)
    "q352_ac_pattern_freq",       # AC-automaton counting (A3/G3)
}


def query_num(name: str) -> int:
    return int(re.match(r"q(\d+)_", name).group(1))


def is_kept(name: str) -> bool:
    return query_num(name) <= 200 or name in SURVIVORS


# domain module per kept query -------------------------------------------------
DOMAIN: dict[str, str] = {}


def assign(module: str, *names: str) -> None:
    for n in names:
        assert n not in DOMAIN, n
        DOMAIN[n] = module


assign(
    "relational",
    "q01_pricing_summary", "q02_orders_topk", "q03_revenue_by_status",
    "q04_region_rollup", "q18_topk_per_group", "q29_orders_by_segment",
    "q34_bucketed_join_revenue", "q36_distinct_pairs", "q44_range_join",
    "q57_anti_join_customers", "q61_chained_join_returns",
    "q62_skew_join_nation_revenue", "q67_left_join_order_counts",
    "q84_full_outer_counts", "q96_top_supplier_per_part",
    "q128_bloom_semi_audit", "q142_profile_columns", "q144_ref_integrity",
    "q158_large_orders", "q196_join_size_exact", "q298_merge_upsert",
    "q315_universe_sample", "q320_schema_evolution_union", "q335_band_join",
)
assign(
    "events",
    "q05_events_hourly", "q06_events_asof", "q17_sessionize",
    "q28_events_scalar", "q31_events_sliding", "q35_running_totals",
    "q37_event_stats", "q38_event_median", "q60_group_quantile",
    "q63_lag_delta", "q65_distinct_users", "q66_group_quantile_cont",
    "q69_window_rank", "q70_mode_user", "q71_value_histogram",
    "q73_props_json_sum", "q74_except_users", "q77_hopping_window",
    "q78_funnel_stages", "q79_cube_events", "q80_pivot_user_counts",
    "q82_intersect_users", "q83_share_of_total", "q89_group_variance",
    "q90_value_k_corr", "q93_cohort_retention", "q111_event_transitions",
    "q112_late_events", "q131_validity_intervals", "q137_trailing_distinct",
    "q145_conversion_latency", "q157_event_pairs_window",
    "q168_zorder_cells", "q170_interval_coverage", "q172_decay_leaderboard",
    "q177_locf_gapfill", "q188_longest_streak", "q192_twap_evidence",
    "q193_burst_rate", "q198_attribution",
)
assign(
    "text",
    "q07_token_freq", "q08_bigram_freq", "q12_token_count", "q16_quality",
    "q25_normalize", "q26_trigram_freq", "q40_cjk_segment", "q48_tf_df",
    "q52_pii_redact", "q54_grouped_string_agg", "q64_tfidf_topk",
    "q72_repetition_stats", "q86_dense_rank_tokens", "q87_oov_rate",
    "q94_lang_mix_weights", "q95_pmi_collocations", "q97_ngram_langid",
    "q98_importance_ratio", "q105_source_lang_entropy", "q116_gopher_rules",
    "q118_inverted_index", "q124_rare_feature_pairs", "q126_padding_waste",
    "q129_quality_classifier", "q148_pii_scrub_net",
    "q151_boilerplate_paras", "q155_pareto_docs", "q161_percent_rank_hist",
    "q176_phrase_positions", "q181_skipgram_pairs", "q184_calibration_bins",
    "q186_classifier_agreement", "q187_auc_evidence",
    "q189_lang_overlap_matrix", "q195_k_anonymity", "q197_gini_evidence",
    "q199_kwic_contexts", "q330_dehyphenate", "q331_ligature_fold",
)
assign(
    "extract",
    "q13_extract_roundtrip", "q14_extract_multiblock", "q39_staged_extract",
    "q50_conformance_accuracy", "q312_html_table_extract",
    "q313_jsonld_extract", "q327_heading_outline", "q336_cer_eval",
    "q337_wer_eval", "q345_html_to_markdown", "q349_mime_sniff",
)
assign(
    "dedup",
    "q10_dedup_exact", "q11_fingerprint", "q22_minhash_neardup",
    "q23_simhash_dup", "q36_distinct_pairs" if False else "q42_neardup_components",
    "q51_jaccard_join_exact", "q68_edit1_fuzzy_pairs", "q76_chunk_dedup",
    "q91_neardup_survivors", "q109_lsh_calibration",
    "q123_simhash_hamming", "q134_duplicate_spans", "q135_priority_dedup",
    "q136_winnow_fingerprints", "q139_cdc_chunks",
    "q140_sorted_neighborhood", "q141_snapshot_chunk_reuse",
    "q159_span_cut", "q162_incremental_neardup", "q163_incremental_exact",
    "q169_shingle_containment", "q171_edit2_fuzzy_pairs",
)
assign(
    "embed",
    "q15_ann_cosine", "q24_embed_dup_pairs", "q59_knn_join_label",
    "q92_kmeans_assign", "q115_ivf_ann_int", "q130_embedding_outliers",
    "q152_sparse_dot_topk", "q156_semdedup", "q166_rrf_fusion",
    "q167_margin_mining", "q174_grouped_covariance", "q182_quant_recall",
    "q322_mmr_diversified_topk",
)
assign(
    "multimodal",
    "q33_image_features", "q41_audio_frames", "q43_video_frames",
    "q121_image_phash_dup", "q127_video_scene_cuts", "q132_png_metadata",
    "q133_audio_silence", "q150_thumbnail_dedup", "q164_audio_fp_match",
    "q342_gif_roundtrip",
)
assign(
    "web",
    "q53_url_host_rollup", "q101_crawl_diff", "q102_warc_roundtrip",
    "q103_pagerank_hosts", "q106_url_canonicalize", "q110_robots_filter",
    "q114_blocklist_filter", "q119_latest_by_url", "q125_crawl_budget",
    "q146_crawl_plan", "q147_link_graph", "q153_doc_triangles",
    "q178_anchor_text_index", "q321_sitemap_roundtrip",
)
assign(
    "sketches",
    "q19_distinct_langs", "q30_union_distinct", "q45_heavy_hitters",
    "q117_hll_registers", "q122_cms_audit", "q173_kmv_sketch_ops",
    "q179_merkle_bucket_diff", "q183_feature_hash_collisions",
)
assign(
    "sampling",
    "q46_bottomk_sample", "q47_stratified_sample", "q55_global_rank",
    "q56_weighted_sample", "q81_hash_split", "q100_sequence_packing",
    "q107_temperature_mix_sample", "q113_chunk_windows",
    "q120_epoch_upsample", "q149_negative_samples", "q160_token_budget_mix",
    "q175_neyman_sample", "q191_weighted_draws",
)
assign(
    "lm",
    "q20_ac_strip", "q21_trie_correct", "q27_vocab_roundtrip",
    "q32_lm_score", "q49_trigram_lm_score", "q85_bpe_token_stats",
    "q104_bpe_merges", "q108_vocab_growth", "q143_bpe_apply",
    "q347_ac_replace", "q352_ac_pattern_freq",
)
assign(
    "dataops",
    "q09_lang_rollup", "q58_rollup_docs", "q99_quantile_floor",
    "q138_group_mad", "q154_group_regression", "q165_migration_checksum",
    "q180_compaction_plan", "q185_range_splits", "q190_reshard_churn",
    "q194_benford_audit", "q333_hive_partition_roundtrip",
)
assign(
    "curation",
    "q75_decontaminate", "q88_curate_corpus", "q200_release_funnel",
)

MODULES = [
    "relational", "events", "text", "extract", "dedup", "embed",
    "multimodal", "web", "sketches", "sampling", "lm", "dataops",
    "curation",
]

MODULE_DOC = {
    "relational": "TPC-H-ish relational queries: joins, aggregates, windows (SURVEY §2.4/2.5; G1/G2/G5, J-patterns).",
    "events": "Event-stream queries: windows, sessions, funnels, as-of joins (SURVEY §2.9 streaming-shaped ops).",
    "text": "Text analysis over documents: tokens, n-grams, quality, lang-id, PII (SURVEY §2.2 M7-M11, G3; LLM-data brief).",
    "extract": "Flagship extraction queries: tokenize -> score -> CTC-greedy decode, structured extraction, CER/WER (SURVEY §2.2 M5/M6).",
    "dedup": "Deduplication family: exact, MinHash-LSH, SimHash, spans, incremental (LLM-data brief; SURVEY §2.7 D3).",
    "embed": "Embedding ops: ANN top-k, IVF, k-means, semdedup, retrieval fusion (LLM-data brief: similarity search).",
    "multimodal": "Multimodal columns: image/audio/video decode, features, perceptual dedup (LLM-data brief).",
    "web": "Web/crawl ops: hosts, canonicalization, robots, link graph, crawl planning (north_star web-page domain).",
    "sketches": "Mergeable sketches: HLL, CMS, KMV, Bloom, heavy hitters (G4 partial+final shape).",
    "sampling": "Samplers, splits, packing, mixtures (SURVEY §2.6 T1/T2; LLM-data brief).",
    "lm": "Vocab/LM/BPE/trie/AC correction (SURVEY §2.3 A2/A3/A5, M3/M4).",
    "dataops": "Engine/data-ops: rollups, profiling, compaction, resharding, partitioned IO (S2/G7).",
    "curation": "End-to-end corpus curation: decontamination, curate chain, release funnel (LLM-data brief).",
}

# names that must stay importable from the package root (compat)
EXPORT_COMPAT = ["_p", "_read", "_round_half_up", "_round_col"]

# ---------------------------------------------------------------------------

src = open(SRC_PATH).read()
tree = ast.parse(src)

top_nodes: dict[str, ast.stmt] = {}
top_order: list[str] = []
import_nodes: list[ast.stmt] = []
queries_assign = oracle_assign = None

for node in tree.body:
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        import_nodes.append(node)
    elif isinstance(node, (ast.FunctionDef, ast.ClassDef)):
        top_nodes[node.name] = node
        top_order.append(node.name)
    elif isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
        name = node.targets[0].id
        if name == "QUERIES":
            queries_assign = node
        elif name == "ORACLE_SQL":
            oracle_assign = node
        else:
            top_nodes[name] = node
            top_order.append(name)

assert queries_assign is not None and oracle_assign is not None

all_queries = [n for n in top_order if re.match(r"q\d+_", n)]
kept_queries = [n for n in all_queries if is_kept(n)]
missing = [n for n in kept_queries if n not in DOMAIN]
extra = [n for n in DOMAIN if n not in kept_queries]
assert not missing, f"unassigned kept queries: {missing}"
assert not extra, f"assigned but not kept: {extra}"
print(f"total queries {len(all_queries)}, kept {len(kept_queries)}")

# oracle entries: key -> value source segment + referenced names
oracle_src: dict[str, str] = {}
oracle_refs: dict[str, set[str]] = {}
for k, v in zip(oracle_assign.value.keys, oracle_assign.value.values):
    key = ast.literal_eval(k)
    oracle_src[key] = ast.get_source_segment(src, v)
    oracle_refs[key] = {
        n.id for n in ast.walk(v) if isinstance(n, ast.Name)
    }

# imported names available module-wide
IMPORT_OF = {
    "math": "import math",
    "os": "import os",
    "datetime": "from datetime import datetime",
    "_html_escape": "from html import escape as _html_escape",
    "np": "import numpy as np",
    "pd": "import pandas as pd",
    "pa": "import pyarrow as pa",
    "pc": "import pyarrow.compute as pc",
    "pq": "import pyarrow.parquet as pq",
    "ExtractConfig": "from basicocr_ray.config import ExtractConfig",
    "collect_rows": "from basicocr_ray.core.collect import collect_rows",
    "md5_hex": "from basicocr_ray.core.textstats import md5_hex",
    "ws_tokens": "from basicocr_ray.core.textstats import ws_tokens",
    "_md5_low64": "from basicocr_ray.core.textstats import md5_low64 as _md5_low64",
    "docs_to_pages_batch": "from basicocr_ray.sources.docpages import docs_to_pages_batch",
    "extract_batch": "from basicocr_ray.stages.extract import extract_batch",
    "count_terms": "from basicocr_ray.stages.wide import count_terms",
    "make_ngram_items": "from basicocr_ray.stages.wide import make_ngram_items",
    "token_items": "from basicocr_ray.stages.wide import token_items",
    "top_k": "from basicocr_ray.stages.wide import top_k",
}


def node_refs(name: str) -> set[str]:
    return {
        n.id
        for n in ast.walk(top_nodes[name])
        if isinstance(n, ast.Name)
        and n.id in top_nodes
        and n.id != name
    }


# transitive closure of helper deps per kept query (incl. its oracle value)
def closure(seed: set[str]) -> set[str]:
    out = set()
    frontier = [s for s in seed if s in top_nodes]
    while frontier:
        cur = frontier.pop()
        if cur in out:
            continue
        out.add(cur)
        frontier.extend(node_refs(cur) - out)
    return out


# usage: helper -> set of modules using it
usage: dict[str, set[str]] = defaultdict(set)
needed: set[str] = set()
for q in kept_queries:
    mod = DOMAIN[q]
    deps = closure({q} | {r for r in oracle_refs.get(q, ()) if r in top_nodes})
    needed |= deps
    for d in deps:
        usage[d].add(mod)
for name in EXPORT_COMPAT:
    needed |= closure({name})
    usage[name].add("_compat")
    for d in closure({name}):
        usage[d].add("_compat")

helpers_needed = [n for n in top_order if n in needed and n not in kept_queries]
shared = [n for n in helpers_needed if len(usage[n]) > 1 or "_compat" in usage[n]]
single = {
    n: next(iter(usage[n]))
    for n in helpers_needed
    if n not in shared
}
print(f"helpers kept: {len(helpers_needed)} (shared {len(shared)})")
print(f"dropped queries: {len([n for n in all_queries if n not in kept_queries])}")


def seg(name: str) -> str:
    node = top_nodes[name]
    start = node.lineno
    if getattr(node, "decorator_list", None):
        start = min(d.lineno for d in node.decorator_list)
    return ast.get_source_segment(src, node) if not getattr(node, "decorator_list", None) else "\n".join(src.split("\n")[start - 1: node.end_lineno])


def imports_for(body_names: list[str], extra_exprs: list[str] = ()) -> str:
    text = "\n".join(seg(n) for n in body_names)
    used = {n.id for n in ast.walk(ast.parse(text)) if isinstance(n, ast.Name)}
    for e in extra_exprs:
        used |= {
            n.id
            for n in ast.walk(ast.parse(e, mode="eval"))
            if isinstance(n, ast.Name)
        }
    # attribute roots like math.floor appear as Name 'math'
    stmts = []
    seen = set()
    for name, stmt in IMPORT_OF.items():
        if name in used and stmt not in seen:
            stmts.append(stmt)
            seen.add(stmt)
    return "\n".join(stmts)


os.makedirs(OUT_DIR, exist_ok=True)

# _shared.py ---------------------------------------------------------------
shared_body = "\n\n\n".join(seg(n) for n in top_order if n in shared)
shared_imports = imports_for([n for n in top_order if n in shared])
with open(os.path.join(OUT_DIR, "_shared.py"), "w") as f:
    f.write(
        '"""Shared helpers for the driver-contract query modules.\n\n'
        "Float discipline: aggregates over doubles are rounded HALF-UP\n"
        "(matching DuckDB ``round()``) via `_round_half_up`; pure per-row\n"
        "arithmetic is left unrounded; int aggregates stay exact.\n"
        '"""\n\n'
        "from __future__ import annotations\n\n"
        + shared_imports + "\n\n\n" + shared_body + "\n"
    )

# domain modules -----------------------------------------------------------
for mod in MODULES:
    qnames = [n for n in top_order if n in kept_queries and DOMAIN[n] == mod]
    qnames_sorted = sorted(qnames, key=query_num)
    local_helpers = [n for n in top_order if single.get(n) == mod]
    body_names = local_helpers + qnames  # original order within each class
    # keep original source order overall:
    body_names = [n for n in top_order if n in set(local_helpers) | set(qnames)]
    oracle_part = "".join(
        f'    "{q}": {oracle_src[q]},\n' for q in qnames_sorted if q in oracle_src
    )
    extra = [oracle_src[q] for q in qnames_sorted if q in oracle_src]
    shared_used = sorted(
        {r for n in body_names for r in
         ({x.id for x in ast.walk(ast.parse(seg(n))) if isinstance(x, ast.Name)} |
          (oracle_refs.get(n, set()) if n in oracle_refs else set()))
         if r in shared},
    )
    # also shared names referenced from oracle values of this module's queries
    for q in qnames_sorted:
        for r in oracle_refs.get(q, ()):
            if r in shared and r not in shared_used:
                shared_used.append(r)
    shared_used = sorted(set(shared_used))
    imp = imports_for(body_names, extra)
    shared_imp = (
        "from ._shared import (\n"
        + "".join(f"    {n},\n" for n in shared_used)
        + ")"
        if shared_used
        else ""
    )
    body = "\n\n\n".join(seg(n) for n in body_names)
    queries_dict = (
        "QUERIES = {\n"
        + "".join(f'    "{q}": {q},\n' for q in qnames_sorted)
        + "}"
    )
    oracle_dict = "ORACLE_SQL = {\n" + oracle_part + "}"
    with open(os.path.join(OUT_DIR, f"{mod}.py"), "w") as f:
        f.write(
            f'"""{MODULE_DOC[mod]}\n\n'
            "Column names/aliases are IDENTICAL between each query and its\n"
            "DuckDB oracle twin - the driver hashes values after sorting\n"
            'columns by name."""\n\n'
            "from __future__ import annotations\n\n"
            + imp + "\n\n"
            + (shared_imp + "\n\n\n" if shared_imp else "\n")
            + body + "\n\n\n" + queries_dict + "\n\n\n" + oracle_dict + "\n"
        )

# __init__.py --------------------------------------------------------------
init_imports = "\n".join(f"from . import {m} as _{m}" for m in MODULES)
compat = "\n".join(
    f"from ._shared import {n}  # noqa: F401" for n in EXPORT_COMPAT
)
star = "\n".join(
    f"from .{m} import *  # noqa: F401,F403" for m in MODULES
)
with open(os.path.join(OUT_DIR, "__init__.py"), "w") as f:
    f.write(
        '"""Driver-contract queries: one Ray Data pipeline per operator from\n'
        "SURVEY.md §2 plus the LLM-data-pipeline brief, each with (where\n"
        "SQL-expressible) a DuckDB oracle twin in `ORACLE_SQL`.  Split into\n"
        "per-domain modules (round-4); every entry is traceable to SURVEY §2\n"
        'or the LLM-data brief - the algorithm-puzzle block was removed.\n"""\n\n'
        "from __future__ import annotations\n\n"
        + init_imports + "\n\n" + compat + "\n" + star + "\n\n"
        + "QUERIES = {}\nORACLE_SQL = {}\n"
        + "for _m in ("
        + ", ".join(f"_{m}" for m in MODULES)
        + "):\n"
        + "    QUERIES.update(_m.QUERIES)\n"
        + "    ORACLE_SQL.update(_m.ORACLE_SQL)\n"
        + "del _m\n"
    )

# per-module __all__ so star imports re-export query callables
for mod in MODULES:
    path = os.path.join(OUT_DIR, f"{mod}.py")
    text = open(path).read()
    qnames = sorted(
        [n for n in kept_queries if DOMAIN[n] == mod], key=query_num
    )
    all_line = "__all__ = [\n" + "".join(f'    "{q}",\n' for q in qnames) + "]\n\n"
    text = text.replace("QUERIES = {", all_line + "\nQUERIES = {", 1)
    open(path, "w").write(text)

print("wrote", OUT_DIR)
for mod in MODULES + ["_shared", "__init__"]:
    p = os.path.join(OUT_DIR, f"{mod}.py")
    print(mod, sum(1 for _ in open(p)))
