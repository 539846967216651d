"""Text analysis kernels + stage."""

import ray.data

from document_text_extraction_ray.functions import textstats as T
from document_text_extraction_ray.stages.textstats import text_stats


def test_token_counts():
    assert T.count_tokens_ws("one two  three") == 3
    assert T.count_tokens_bpe("hello, world 123") >= 4
    assert T.count_tokens_ws("") == 0


def test_language_id():
    assert T.detect_language("the cat and the dog are in the house") == "en"
    assert T.detect_language("der Hund und die Katze sind nicht im Haus") == "de"
    assert T.detect_language("le chat est dans la maison pour une nuit") == "fr"
    assert T.detect_language("") == "und"
    assert T.detect_language("zxqj vvkpl") == "und"


def test_quality_score():
    good = T.quality_score(
        "The quick brown fox jumps over the lazy dog and runs far away into the woods."
    )
    junk = T.quality_score("!!! ??? ### $$$ %%%")
    assert good["score"] > junk["score"]
    assert good["n_tokens"] == 16
    empty = T.quality_score("")
    assert empty["score"] == 0.0


def test_rolling_hashes_and_fingerprint():
    toks = "a b c d e f g h i j".split()
    hs = T.rolling_hashes(toks, window=4)
    assert len(hs) == 7
    # Shifted window over same content reproduces hashes (rolling property).
    hs2 = T.rolling_hashes(toks[1:], window=4)
    assert hs[1:] == hs2
    fp = T.fingerprint("some repeated text " * 10)
    assert fp == sorted(set(fp))
    assert T.fingerprint("") == []


def test_content_hash_normalizes_whitespace():
    assert T.content_hash("a  b\tc") == T.content_hash("a b c")
    assert T.content_hash("a b c") != T.content_hash("a b d")


def test_text_stats_stage():
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "the cat and the dog are in the house"},
            {"doc_id": 2, "text": ""},
        ]
    )
    out = text_stats(ds, concurrency=1).to_pandas().sort_values("doc_id")
    assert list(out["pred_lang"]) == ["en", "und"]
    assert list(out["n_tokens_ws"]) == [9, 0]
    assert out["quality_score"].iloc[0] > 0


def test_hyperloglog_accuracy_and_merge():
    from document_text_extraction_ray.functions.textstats import HyperLogLog

    h = HyperLogLog()
    for i in range(50_000):
        h.add(f"user-{i}")
    est = h.estimate()
    assert abs(est - 50_000) / 50_000 < 0.05  # ~1.04/sqrt(4096) = 1.6% expected

    # Merge of disjoint halves == union estimate; determinism across builds.
    a, b, full = HyperLogLog(), HyperLogLog(), HyperLogLog()
    for i in range(10_000):
        (a if i % 2 else b).add(i)
        full.add(i)
    merged = a.merge(b)
    assert merged.to_bytes() == full.to_bytes()
    again = HyperLogLog()
    for i in range(10_000):
        again.add(i)
    assert again.to_bytes() == full.to_bytes()
    rt = HyperLogLog.from_bytes(full.to_bytes())
    assert rt.estimate() == full.estimate()


def test_corpus_grep_counts_and_cap():
    """Non-overlapping finditer semantics, 1-based first offset, per-doc
    cap, non-matching docs dropped, null text safe."""
    import ray.data as rd

    from document_text_extraction_ray.stages.textstats import corpus_grep

    docs = rd.from_items([
        {"doc_id": 1, "text": "xx aba abab xx"},     # 'aba': 2 (no overlap)
        {"doc_id": 2, "text": "no hits here"},
        {"doc_id": 3, "text": "aba" * 50},
        {"doc_id": 4, "text": None},
    ])
    out = (corpus_grep(docs, "aba", max_matches=10)
           .to_pandas().set_index("doc_id"))
    assert list(out.index) == [1, 3]
    assert (out.loc[1, "n_matches"], out.loc[1, "first_at"]) == (2, 4)
    assert out.loc[3, "n_matches"] == 10  # capped (true 50)
    assert out.loc[3, "first_at"] == 1


def test_compression_ratio_local_reference_and_signal_direction():
    """Distributed zlib ratios equal the local zlib replay; repetitive
    text compresses far below varied prose (the curation signal)."""
    import zlib

    import ray.data as rd

    from document_text_extraction_ray.stages.textstats import (
        compression_ratio,
    )

    rows = [
        {"doc_id": 0, "text": "spam " * 400},
        {"doc_id": 1, "text": " ".join(f"w{i}x{i*7%13}" for i in range(400))},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": None},
    ]
    out = compression_ratio(rd.from_items(rows)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, r in enumerate(rows):
        b = (r["text"] or "").encode("utf-8")
        c = len(zlib.compress(b, 6))
        assert out.loc[i, "raw_len"] == len(b)
        assert out.loc[i, "comp_len"] == c
        assert out.loc[i, "ratio_e6"] == c * 1_000_000 // max(len(b), 1)
    # repetitive much more compressible than varied text
    assert out.loc[0, "ratio_e6"] < out.loc[1, "ratio_e6"] // 3


def test_lang_segments_run_collapse_and_und_lines():
    """Consecutive same-language lines collapse; unknown lines form
    their own 'und' segments; empty docs produce one empty-line und
    segment."""
    import ray.data as rd

    from document_text_extraction_ray.stages.textstats import lang_segments

    rows = [
        {"doc_id": 0, "text": "the and is in for\nthe is for\n"
                              "le et des pour dans\nzzz qqq"},
        {"doc_id": 1, "text": ""},
    ]
    out = lang_segments(rd.from_items(rows)).to_pandas() \
        .sort_values(["doc_id", "seg_idx"]).reset_index(drop=True)
    d0 = out[out["doc_id"] == 0]
    assert list(d0["lang"]) == ["en", "fr", "und"]
    assert list(d0["n_lines"]) == [2, 1, 1]
    assert list(d0["n_chars"]) == [17 + 10, 19, 7]
    d1 = out[out["doc_id"] == 1]
    assert list(d1["lang"]) == ["und"] and list(d1["n_lines"]) == [1]


def test_winnow_guarantee_and_tie_rule():
    """MOSS guarantee: any shared substring of length >= w + k - 1 shares a
    selected fingerprint; ties select the rightmost position."""
    from document_text_extraction_ray.functions.textstats import winnow

    k, w = 8, 4
    shared = "abcdefghijk"  # len 11 == w + k - 1
    a = dict(winnow("xxyyzz11 " + shared + " qq22ww33", k, w))
    b = dict(winnow("totally other words " + shared + " more tail", k, w))
    assert set(a.values()) & set(b.values())

    # all-equal hashes: every window must pick its rightmost position
    rep = winnow("aaaaaaaaaaaa", k, w)  # 12 chars -> 5 identical grams
    # 2 windows ([1,4], [2,5]): each selects ITS rightmost position
    assert [p for p, _ in rep] == [4, 5]
    assert len({h for _, h in rep}) == 1

    assert winnow("short", k, w) == []  # < k chars selects nothing
    one = winnow("exactly8", k, w)  # m=1: single truncated window
    assert len(one) == 1 and one[0][0] == 1


def test_winnow_positions_are_gram_starts():
    from document_text_extraction_ray.functions.textstats import md5_u64, winnow

    text = "the quick brown fox jumps"
    out = winnow(text, 8, 4)
    mod = 1 << 52
    for pos, fp in out:
        assert md5_u64(text.lower()[pos - 1:pos - 1 + 8]) % mod == fp
