"""Curation chain test: quality and near-dup filters must actually bite."""

import pyarrow as pa


def test_clean_corpus_drops_errors_lowquality_and_neardups(ray_session):
    import ray.data as rd

    from pappermate_ray.fixtures import build_pages_table
    from pappermate_ray.pipelines.curate import clean_corpus
    from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline

    pages = build_pages_table(120).to_pylist()
    n_orig = len(pages)
    # plant a near-duplicate: copy of row 0's page under a new url
    dup = dict(pages[0])
    dup["url"] = dup["url"] + "-copy"
    pages.append(dup)
    # plant a junk low-quality page
    pages.append(
        {"url": "https://junk.example/x", "warc_ts": pages[0]["warc_ts"],
         "html": b"<p>!!! ??? !!! ### $$$ %%% ^^^ &amp;&amp;&amp; *** ((( )))</p>",
         "text": None, "lang": "en"}
    )
    ds = rd.from_items(pages)
    docs = build_extraction_pipeline(ds, batch_size=64)
    survivors = clean_corpus(docs, quality_min=0.5, dup_threshold=0.7)
    urls = {r["url"] for r in survivors.select_columns(["url"]).take_all()}

    # the junk page is quality-filtered out
    assert "https://junk.example/x" not in urls
    # exactly ONE of the duplicate pair survives
    pair = {pages[0]["url"], dup["url"]}
    assert len(pair & urls) == 1
    # error rows gone, most of the corpus kept
    n_err = sum(
        1 for r in docs.select_columns(["status"]).take_all() if r["status"] == "error"
    )
    assert len(urls) == (n_orig + 2) - n_err - 1 - 1  # -dup loser -junk

def test_clean_corpus_strip_boilerplate(ray_session):
    """With strip_boilerplate=True the shared nav/footer paragraph is
    removed corpus-wide BEFORE quality + near-dup: two docs that differ
    only in their unique line must NOT merge (the shared boilerplate is
    gone, so their texts stay distinct but their boilerplate never
    creates a false near-dup), and the boilerplate paragraph must not
    appear in any survivor's token stats."""
    import ray.data as rd

    from pappermate_ray.fixtures import build_pages_table
    from pappermate_ray.pipelines.curate import clean_corpus
    from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline

    pages = build_pages_table(90).to_pylist()
    ds = rd.from_items(pages)
    docs = build_extraction_pipeline(ds, batch_size=64)

    plain = clean_corpus(docs, quality_min=0.5, dup_threshold=0.7)
    stripped = clean_corpus(docs, quality_min=0.5, dup_threshold=0.7,
                            strip_boilerplate=True)
    p = {r["url"]: r["n_tokens"] for r in plain.take_all()}
    s = {r["url"]: r["n_tokens"] for r in stripped.take_all()}
    # the fixture corpus repeats section headers/furniture lines across
    # docs — after corpus-level paragraph dedup every surviving doc must
    # have strictly fewer tokens than before
    assert s, "stripped chain produced no survivors"
    common = set(p) & set(s)
    assert common
    # removal never adds tokens, and the overwhelming majority of docs
    # (everything except the all-unique 'plain' kind) must shrink
    assert all(s[u] <= p[u] for u in common)
    shrunk = sum(1 for u in common if s[u] < p[u])
    assert shrunk >= 0.7 * len(common), (shrunk, len(common))
