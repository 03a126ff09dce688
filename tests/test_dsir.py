"""DSIR importance resampling (stages/dsir.py) — planted-target
selection, gram extraction edge cases, and partitioning invariance."""

import pytest


CAT = "the cat sat on the mat and the cat purred"
FINANCE = "stock market prices fell sharply in heavy trading today"
QUANTUM = "quantum flux capacitor engaged warp drive core"


@pytest.fixture()
def corpus(ray_session):
    import ray.data as rd

    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": [CAT, FINANCE, QUANTUM][i % 3]})
    rows.append({"doc_id": 30, "text": "   "})   # whitespace-only: skipped
    rows.append({"doc_id": 31, "text": "cat"})   # single token: no bigrams
    return rd.from_items(rows, override_num_blocks=4)


def test_target_like_docs_win(corpus, ray_session):
    import ray.data as rd

    from pappermate_ray.stages.dsir import dsir_select

    # target must carry enough mass that add-1 smoothing over the 16^4
    # bucket space doesn't drown it (a 1-doc target makes EVERY gram
    # unlikely under p_t and short docs float up — raw DSIR weights are
    # unnormalized log-likelihood ratios, per the paper)
    target = rd.from_items([{"doc_id": 1000 + j, "text": CAT} for j in range(8)])
    sel = dsir_select(corpus, target, k=11).take_all()
    ids = {r["doc_id"] for r in sel}
    # the CAT family plus the one-token "cat" doc (short docs carry
    # fewer negative smoothing terms, so it legitimately ranks first)
    assert ids == {i for i in range(30) if i % 3 == 0} | {31}


def test_weights_skip_empty_and_handle_single_token(corpus, ray_session):
    import ray.data as rd

    from pappermate_ray.stages.dsir import dsir_weights

    target = rd.from_items([{"doc_id": 1000, "text": CAT}])
    w = {r["doc_id"]: r["lw"] for r in dsir_weights(corpus, target).take_all()}
    assert 30 not in w           # whitespace-only doc emits nothing
    assert 31 in w               # single-token doc scores on its unigram
    # identical text -> identical weight
    assert w[0] == w[3] == w[27]
    assert w[0] > w[1]           # CAT docs beat FINANCE docs


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.dsir import dsir_weights

    rows = [{"doc_id": i, "text": [CAT, FINANCE, QUANTUM][i % 3] + f" tail{i % 5}"}
            for i in range(40)]
    target = rd.from_items([{"doc_id": 99, "text": CAT}])
    w1 = {r["doc_id"]: r["lw"] for r in
          dsir_weights(rd.from_items(rows, override_num_blocks=1), target).take_all()}
    w8 = {r["doc_id"]: r["lw"] for r in
          dsir_weights(rd.from_items(rows, override_num_blocks=8), target).take_all()}
    assert w1 == w8


def test_select_tiebreaks_by_id(corpus, ray_session):
    import ray.data as rd

    from pappermate_ray.stages.dsir import dsir_select

    target = rd.from_items([{"doc_id": 1000 + j, "text": CAT} for j in range(8)])
    # doc 31 ranks first (see above); the 10 CAT docs are exactly tied,
    # so the remaining slots must go to the smallest ids, in order
    sel = [r["doc_id"] for r in dsir_select(corpus, target, k=5).take_all()]
    assert sel == [31, 0, 3, 6, 9]


def test_bucket_rule_matches_hex_suffix(ray_session):
    import hashlib

    import numpy as np

    from pappermate_ray.stages.dsir import _bucket_ids

    grams = np.array(["cat", "the mat", "zebra"], dtype=object)
    got = _bucket_ids(grams, hex_chars=4)
    want = [int(hashlib.md5(g.encode()).hexdigest()[-4:], 16) for g in grams]
    assert list(got) == want
