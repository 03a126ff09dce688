"""Distributed BPE merge learning (stages/bpe.py)."""

import pyarrow as pa

import ray.data as rd

from pappermate_ray.stages.bpe import (
    SENT,
    bpe_token_counts,
    learn_bpe,
    merged_symbol,
    word_counts,
    wrap_word,
)


def _docs(texts, parts=3):
    return rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})).repartition(parts)


def test_wrap_and_merge_symbol():
    assert wrap_word("ab") == f"{SENT}a{SENT} {SENT}b{SENT}"
    assert merged_symbol(f"{SENT}a{SENT} {SENT}b{SENT}") == f"{SENT}ab{SENT}"


def test_word_counts():
    wc = word_counts(_docs(["a b b", "b c"])).to_pandas()
    assert dict(zip(wc["word"], wc["cnt"])) == {"a": 1, "b": 3, "c": 1}


def test_learn_bpe_matches_handcomputed():
    # classic Sennrich example shape: 'lo' dominates, then 'low', then 'e r'.
    texts = ["low lower lowest low low", "new newer newest new", "wide wider low newer"]
    merges, state = learn_bpe(word_counts(_docs(texts)), num_merges=5)
    got = list(zip(merges["merge_rank"].to_pylist(),
                   merges["left_sym"].to_pylist(),
                   merges["right_sym"].to_pylist(),
                   merges["pair_count"].to_pylist()))
    assert got == [
        (1, "l", "o", 6),
        (2, "lo", "w", 6),
        (3, "e", "w", 5),
        (4, "n", "ew", 5),
        (5, "e", "r", 4),
    ]
    # final state: 'low' is fully merged into one symbol
    st = state.to_pandas().set_index("word")["s"]
    assert st["low"] == f"{SENT}low{SENT}"
    assert st["lower"] == f"{SENT}low{SENT} {SENT}er{SENT}"


def test_greedy_left_to_right_merge():
    # "a a a" merges left-to-right: (a,a) pairs count 2, merge yields "aa a"
    merges, state = learn_bpe(word_counts(_docs(["aaa aaa"])), num_merges=1)
    assert merges["left_sym"].to_pylist() == ["a"]
    st = state.to_pandas().set_index("word")["s"]
    assert st["aaa"] == f"{SENT}aa{SENT} {SENT}a{SENT}"


def test_early_stop_when_no_pairs():
    merges, _ = learn_bpe(word_counts(_docs(["a b c a"])), num_merges=4)
    assert merges.num_rows == 0


def test_token_counts_encode():
    texts = ["low lower lowest low low", "new newer newest new", "wide wider low newer", ""]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    _, state = learn_bpe(word_counts(docs), num_merges=5)
    got = bpe_token_counts(docs, state).to_pandas().set_index("doc_id")
    # after 5 merges: low=1 sym; lower=low+er=2; lowest=low+e,s,t=4;
    # new=n+ew=2... hand-check doc 0: low(1)+lower(2)+lowest(4)+low(1)+low(1)=9
    assert got.loc[0, "n_tokens"] == 5
    assert got.loc[0, "n_bpe_tokens"] == 9
    # empty doc dropped (oracle's trim(text) <> '' gate)
    assert 3 not in got.index


def test_deterministic_across_partitionings():
    texts = ["low lower lowest low low", "new newer newest new", "wide wider low newer"]
    a, _ = learn_bpe(word_counts(_docs(texts, parts=1)), num_merges=4)
    b, _ = learn_bpe(word_counts(_docs(texts, parts=5)), num_merges=4)
    assert a.equals(b)


def test_driver_combine_and_distributed_paths_equal(ray_session):
    texts = ["low lower lowest low low", "new newer newest new", "wide wider low newer"]
    vocab = word_counts(_docs(texts, parts=3))
    fast, fstate = learn_bpe(vocab, num_merges=4)  # small vocab -> driver combine
    slow, sstate = learn_bpe(vocab, num_merges=4, small_vocab_threshold=0)
    assert fast.equals(slow)
    key = lambda rows: sorted((r["word"], r["s"]) for r in rows)
    assert key(fstate.take_all()) == key(sstate.take_all())


def test_token_counts_join_path_equals_broadcast(ray_session):
    """Round-2 verdict item #3: above broadcast_limit the encode must
    switch to the distributed word-join path and produce identical
    counts (broadcast_limit=0 forces the join path on the same vocab)."""
    texts = ["low lower lowest low low", "new newer newest new",
             "wide wider low newer", ""]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    _, state = learn_bpe(word_counts(docs), num_merges=5)
    key = lambda rows: sorted(
        (r["doc_id"], r["n_tokens"], r["n_bpe_tokens"]) for r in rows)
    broadcast = key(bpe_token_counts(docs, state).take_all())
    joined = key(bpe_token_counts(docs, state, broadcast_limit=0).take_all())
    assert joined == broadcast


def _resegment(word, syms):
    """Split word into the character groups its symbols cover."""
    out, pos = [], 0
    for sym in syms:
        chunk = sym.replace("\x1f", "")
        assert word[pos:pos + len(chunk)] == chunk
        out.append(chunk)
        pos += len(chunk)
    assert pos == len(word)
    return out


def test_bpe_encode_ids_roundtrip_and_paths(ray_session):
    """Token-id sequences decode back to the original words (id→symbol
    →strip sentinels→concat), agree with bpe_token_counts, and the
    distributed (broadcast_limit=0) path is identical to the broadcast
    path."""
    import numpy as np
    import ray.data as rd

    from pappermate_ray.stages.bpe import (SENT, bpe_encode_ids,
                                           bpe_token_counts, learn_bpe,
                                           word_counts)

    docs = [
        {"doc_id": 1, "text": "low lower lowest low"},
        {"doc_id": 2, "text": "new newer newest"},
        {"doc_id": 3, "text": "low new low"},
        {"doc_id": 4, "text": ""},          # empty -> dropped
    ]
    ds = rd.from_items(docs)
    _, state = learn_bpe(word_counts(ds), num_merges=6)

    enc = {r["doc_id"]: r for r in bpe_encode_ids(ds, state).take_all()}
    assert sorted(enc) == [1, 2, 3]

    # rebuild id -> symbol table exactly as the operator does; the flat
    # id stream has no word delimiter (the real-tokenizer shape), so
    # round-trip at the SYMBOL level: ids must decode to exactly the
    # concatenation of each word's learned symbol sequence, in order
    state_s = {r["word"]: r["s"].split(" ") for r in state.take_all()}
    syms = sorted({x for ss in state_s.values() for x in ss})
    id2sym = dict(enumerate(syms))
    for d in docs[:3]:
        seq = enc[d["doc_id"]]["token_ids"]
        expect = [x for w in d["text"].split() for x in state_s[w]]
        assert [id2sym[i] for i in seq] == expect
        # and symbols strip back to the original words
        assert [x.replace(SENT, "") for x in expect] == [
            c for w in d["text"].split() for c in _resegment(w, state_s[w])]
        assert enc[d["doc_id"]]["n_tokens"] == len(d["text"].split())
        assert enc[d["doc_id"]]["n_bpe_tokens"] == len(seq)

    cnt = {r["doc_id"]: r for r in bpe_token_counts(ds, state).take_all()}
    assert all(cnt[i]["n_bpe_tokens"] == enc[i]["n_bpe_tokens"]
               for i in (1, 2, 3))

    dist = {r["doc_id"]: r for r in
            bpe_encode_ids(ds, state, broadcast_limit=0).take_all()}
    assert sorted(dist) == [1, 2, 3]
    for i in (1, 2, 3):
        assert list(dist[i]["token_ids"]) == list(enc[i]["token_ids"])


def test_encode_oov_paths_identical(ray_session):
    """Encoding text the state was NOT trained on: OOV words fall back
    to greedy longest-match over the learned symbol set, identically on
    the broadcast and distributed paths (no KeyError, no silent drop)."""
    import ray.data as rd

    from pappermate_ray.stages.bpe import (_oov_segment, SENT,
                                           bpe_encode_ids,
                                           bpe_token_counts, learn_bpe,
                                           word_counts)

    train = rd.from_items([{"doc_id": 0, "text": "low lower lowest low new"}])
    _, state = learn_bpe(word_counts(train), num_merges=4)

    # 'slower' is OOV (contains trained chars), 'zq' has unknown chars
    new = rd.from_items([
        {"doc_id": 1, "text": "low slower zq new"},
        {"doc_id": 2, "text": "zq"},
    ])
    b_enc = {r["doc_id"]: r for r in bpe_encode_ids(new, state).take_all()}
    d_enc = {r["doc_id"]: r for r in
             bpe_encode_ids(new, state, broadcast_limit=0).take_all()}
    assert sorted(b_enc) == sorted(d_enc) == [1, 2]
    for i in (1, 2):
        assert list(b_enc[i]["token_ids"]) == list(d_enc[i]["token_ids"])
        assert b_enc[i]["n_tokens"] == d_enc[i]["n_tokens"]
        assert b_enc[i]["n_bpe_tokens"] == d_enc[i]["n_bpe_tokens"]
    # every word (OOV or not) counts toward n_tokens
    assert b_enc[1]["n_tokens"] == 4
    # 'zq': no trained characters -> empty sequence but the doc survives
    assert b_enc[2]["n_tokens"] == 1 and b_enc[2]["n_bpe_tokens"] == 0

    b_cnt = {r["doc_id"]: r for r in bpe_token_counts(new, state).take_all()}
    d_cnt = {r["doc_id"]: r for r in
             bpe_token_counts(new, state, broadcast_limit=0).take_all()}
    for i in (1, 2):
        assert b_cnt[i]["n_bpe_tokens"] == d_cnt[i]["n_bpe_tokens"] \
            == b_enc[i]["n_bpe_tokens"]
        assert b_cnt[i]["n_tokens"] == d_cnt[i]["n_tokens"] \
            == b_enc[i]["n_tokens"]

    # fallback is longest-match: 'slower' must reuse the learned 'low'
    # symbol if present as a unit, else known chars, never crash
    known = {x for r in state.take_all() for x in r["s"].split(" ")}
    segs = _oov_segment("slower", frozenset(known),
                        max((len(s) - 2 for s in known), default=0))
    assert "".join(x.replace(SENT, "") for x in segs) in "slower"
    assert all(x in known for x in segs)
