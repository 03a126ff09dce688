"""In-pytest oracle gate: a fast subset of the Ray-vs-DuckDB battery at
sf0.001, so `python -m pytest -x -q` alone exercises SQL-equivalence
(the full 27-query gate is tools/check_oracle.py, run at sf0.01/sf0.1)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
FAST_QUERIES = [
    "event_histogram", "lineitem_pricing", "lang_counts", "docs_filter_project",
    "top_docs", "mktsegment_revenue", "customers_without_orders", "dedup_exact",
    "stratified_sample", "token_counts", "user_sessions", "grouped_topk",
    "distinct_sources", "jaccard_verify",
    # round-2 planted-fixture oracles (cheap subset; the heavy ones —
    # minhash/keep-list/table_cells/validate_* — run in tools/check_oracle.py)
    "latest_by_url", "salted_user_value", "simhash_near_dups",
    "contract_type_histogram", "key_clause_histogram",
    # round-2 web-corpus curation family (stages/webclean.py)
    "paragraph_dedup", "repetition_stats", "decontaminate", "pii_scrub",
    "decontaminate_ngrams", "cosine_pairs_exact", "ivf_knn_fullprobe",
    "heavy_hitters_words", "bottomk_sample", "grouped_quantiles",
    "lm_perplexity", "bm25_topk", "grouped_bottomk_sample",
    "approx_quantiles", "sequence_pack", "kmeans_clusters", "semantic_dedup",
    "mixture_sample", "grouped_zscore",
    # round-3: formerly rows-only, now oracled (verdict item #6)
    "embedding_near_dups", "hll_bigrams_check", "party_histogram_golden",
    "link_graph",
    # round-4: real-PDF reader round trip + newly-oracled approx family
    "pdf_extract_roundtrip", "hamming_near_dups_planted",
    "ivf_knn_recall_check", "random_sample_check",
    # round-4 continuation: golden-twin validation + translator gates
    "validate_golden", "translate_names_check",
    # round-4 continuation: range-partitioned sorted export (TeraSort shape)
    "range_sorted_export", "range_scan_check",
    # round-4 continuation: LSM merge + compaction over the sorted layout
    "lsm_merge_check", "compaction_check",
    # round-4 continuation: organize-family golden twins
    "organize_golden", "unique_filenames_golden",
    # round-4 continuation: compression filter + sanitize planted gates
    "compression_filter_check", "sanitize_names_check",
    "pattern_probe_check",
    # round-4 continuation: co-partitioned bucketed merge join
    "layout_join_check", "url_layout_check",
    # round-4 continuation: greedy subset selection (unrolled-CTE chains —
    # the sf0.001 geometry is the one that caught the clamped-maxsim bug)
    "mmr_select", "kcenter_select",
    # round-4 continuation: iterative graph wave + composed hygiene
    # flagship (the dup-seed teleport bug surfaced in host_hygiene's
    # composition, not in trustrank's own distinct-seed fixture)
    "crawl_depth", "kcore_hosts", "trustrank", "host_reciprocity",
    "co_citation", "snapshot_change_rate", "host_hygiene",
    "page_templates", "link_prediction",
    # round-4 second continuation: structured data / linalg / retrieval-
    # context / corpus-statistics / contrastive-prep families
    "structured_data", "structured_adoption", "hard_negatives",
    "embedding_covariance", "whitening_stats", "whiten_apply",
    "readability", "search_snippets", "zipf_slope",
    "contrastive_triplets", "pca_roundtrip_check", "pca_variance_check", "corpus_card",
    "lexical_diversity", "char_entropy",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(ray_session, con, name):
    import ray.data as rd

    from pappermate_ray.queries import ORACLE_SQL, SQL_QUERIES

    res = SQL_QUERIES[name](SF)
    if isinstance(res, rd.Dataset):
        batches = list(res.iter_batches(batch_size=65536, batch_format="pyarrow"))
        got = pa.concat_tables(batches).to_pandas() if batches else pd.DataFrame()
    elif isinstance(res, pa.Table):
        got = res.to_pandas()
    else:
        got = res
    want = con.execute(ORACLE_SQL[name]).df()
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


def test_query_oracle_dict_consistency():
    """Every SQL query has an oracle and vice versa; no name overlaps."""
    from pappermate_ray.queries import NOSQL_QUERIES, ORACLE_SQL, SQL_QUERIES

    assert set(SQL_QUERIES) == set(ORACLE_SQL)
    assert not (set(SQL_QUERIES) & set(NOSQL_QUERIES))
