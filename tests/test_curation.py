"""Corpus-curation operators: per-key caps, n-gram decontamination,
repetition stats."""

import ray.data as rd

from document_text_extraction_ray.stages.curation import (
    benchmark_ngram_set,
    cap_per_key,
    ngram_contamination,
    repetition_stats,
    word_ngrams,
)


def test_word_ngrams_tokenization():
    assert word_ngrams("The quick, Brown FOX!", 2) == [
        "the quick", "quick brown", "brown fox"]
    assert word_ngrams("one", 2) == []
    assert word_ngrams("", 3) == []
    # digits are word chars; punctuation splits
    assert word_ngrams("v2.0 beta", 3) == ["v2 0 beta"]


def test_cap_per_key_quota_and_rank():
    ds = rd.from_items(
        [{"id": i, "dom": f"d{i % 2}"} for i in range(10)]
    )
    out = cap_per_key(ds, "dom", "id", cap=3).to_pandas()
    got = sorted(zip(out["dom"], out["id"], out["rn"]))
    # first 3 ids per domain, 1-based ranks in id order
    assert got == [("d0", 0, 1), ("d0", 2, 2), ("d0", 4, 3),
                   ("d1", 1, 1), ("d1", 3, 2), ("d1", 5, 3)]


def test_cap_per_key_small_groups_kept_whole():
    ds = rd.from_items([{"id": 7, "dom": "solo"}])
    out = cap_per_key(ds, "dom", "id", cap=10).to_pandas()
    assert list(out["id"]) == [7] and list(out["rn"]) == [1]


def test_ngram_contamination_counts_distinct_shared():
    bench = rd.from_items([{"text": "alpha beta gamma delta"}])
    grams = benchmark_ngram_set(bench, "text", n=2)
    assert grams == {"alpha beta", "beta gamma", "gamma delta"}
    docs = rd.from_items([
        # shares 'alpha beta' twice -> counted ONCE (distinct)
        {"doc_id": 1, "text": "alpha beta x alpha beta"},
        {"doc_id": 2, "text": "beta gamma delta"},  # 2 shared grams? ->
        # grams: 'beta gamma', 'gamma delta' -> both shared
        {"doc_id": 3, "text": "zeta eta theta"},    # clean
    ])
    out = (
        ngram_contamination(docs, grams, n=2)
        .to_pandas().sort_values("doc_id")
    )
    assert list(out["n_shared_grams"]) == [1, 2, 0]


def test_repetition_stats_dup_fraction():
    docs = rd.from_items([
        {"doc_id": 1, "text": "a b a b a b"},   # 5 bigrams, 2 distinct
        {"doc_id": 2, "text": "u v w x"},       # 3 bigrams, all distinct
        {"doc_id": 3, "text": "single"},        # no bigrams
    ])
    out = repetition_stats(docs, n=2).to_pandas().sort_values("doc_id")
    assert list(out["n_ngrams"]) == [5, 3, 0]
    assert list(out["n_distinct_ngrams"]) == [2, 3, 0]
    # (5-2)/5 = 0.6 -> 6000 e4; clean -> 0; empty -> 0
    assert list(out["dup_ngram_frac_e4"]) == [6000, 0, 0]


def test_redact_pii_masks_emails_and_phones():
    from document_text_extraction_ray.stages.curation import redact_pii

    docs = rd.from_items([
        {"doc_id": 1,
         "text": "mail a.b@x.co or call (123) 456-7890 / +44 20 7946 0958"},
        {"doc_id": 2, "text": "no pii here"},
        {"doc_id": 3, "text": "digits 12345678901 masked too"},
    ])
    out = redact_pii(docs).to_pandas().sort_values("doc_id")
    r1 = out.iloc[0]["redacted_text"]
    assert "<EMAIL>" in r1 and "a.b@x.co" not in r1
    assert r1.count("<PHONE>") == 2
    assert out.iloc[0]["n_emails"] == 1 and out.iloc[0]["n_phones"] == 2
    assert out.iloc[1]["redacted_text"] == "no pii here"
    assert out.iloc[2]["n_phones"] == 1 and "12345678901" not in out.iloc[2]["redacted_text"]


def test_line_dedup_first_occurrence_and_reassembly():
    """CCNet-style corpus-wide line dedup: a line repeated anywhere keeps
    only its (min doc_id, min idx) occurrence; docs reassemble from
    surviving lines in order; a doc whose every line lost stays in the
    output with empty text."""
    from document_text_extraction_ray.stages.curation import line_dedup

    docs = rd.from_items([
        {"doc_id": 1, "text": "alpha\nshared footer\nbeta"},
        {"doc_id": 2, "text": "shared footer\ngamma\nshared footer"},
        {"doc_id": 3, "text": "shared footer"},
        {"doc_id": 4, "text": "alpha\nalpha"},
    ])
    out = (line_dedup(docs, "text", "doc_id", n_buckets=4)
           .to_pandas().sort_values("doc_id").set_index("doc_id"))
    assert out.loc[1, "dedup_text"] == "alpha\nshared footer\nbeta"
    assert out.loc[1, "n_lines_kept"] == 3
    # doc 2: both copies of the footer lose to doc 1's
    assert out.loc[2, "dedup_text"] == "gamma"
    assert (out.loc[2, "n_lines_total"], out.loc[2, "n_lines_kept"]) == (3, 1)
    # doc 3: only line lost -> kept as an empty doc
    assert out.loc[3, "dedup_text"] == ""
    assert out.loc[3, "n_lines_kept"] == 0
    # doc 4: intra-doc repeat also dedups (first idx wins)
    assert out.loc[4, "dedup_text"] == ""  # both "alpha" lose to doc 1
    assert out.loc[4, "n_lines_total"] == 2


def test_boilerplate_removal_per_domain_all_occurrences():
    """Per-domain boilerplate stripping: a line in >= min_docs distinct
    docs of the SAME source loses every occurrence (no survivor, unlike
    line_dedup); intra-doc repetition alone is not boilerplate; a line
    shared only across DIFFERENT sources is content and survives."""
    from document_text_extraction_ray.stages.curation import (
        boilerplate_removal,
    )

    docs = rd.from_items([
        {"doc_id": 1, "source": "a", "text": "nav bar\nbody one\nfooter"},
        {"doc_id": 2, "source": "a", "text": "nav bar\nbody two\nfooter"},
        {"doc_id": 3, "source": "a", "text": "solo\nsolo"},
        {"doc_id": 4, "source": "b", "text": "nav bar\nother body"},
    ])
    out = (boilerplate_removal(docs, "text", "doc_id", "source",
                               min_docs=2, n_buckets=4)
           .to_pandas().sort_values("doc_id").set_index("doc_id"))
    # nav bar + footer hit 2 docs of source a: dropped everywhere.
    assert out.loc[1, "clean_text"] == "body one"
    assert (out.loc[1, "n_lines_total"], out.loc[1, "n_lines_kept"]) == (3, 1)
    assert out.loc[2, "clean_text"] == "body two"
    # intra-doc repeat in ONE doc: 1 distinct doc -> kept in full.
    assert out.loc[3, "clean_text"] == "solo\nsolo"
    assert out.loc[3, "n_lines_kept"] == 2
    # source b has only one doc with "nav bar": domain-scoped -> kept.
    assert out.loc[4, "clean_text"] == "nav bar\nother body"
    assert out.loc[4, "n_lines_kept"] == 2


def test_normalize_text_rule_chain():
    """NFC composition, control strip, space/tab collapse, newline-edge
    trim, blank-line collapse, outer trim — in that order."""
    from document_text_extraction_ray.stages.curation import normalize_text

    docs = rd.from_items([
        {"doc_id": 1, "text": "é\t  a\x00b \x0b \n \n\n\n  c  "},
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": "plain ascii"},
    ])
    out = (normalize_text(docs).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    assert out.loc[1, "norm_text"] == "é ab\n\nc"
    assert out.loc[1, "n_chars_norm"] == 7
    assert out.loc[2, "norm_text"] == ""
    assert out.loc[3, "norm_text"] == "plain ascii"


def test_dedup_against_snapshot():
    """New-slice rows whose key the old corpus holds are dropped; the rest
    first-occurrence-dedup within the slice."""
    from document_text_extraction_ray.stages.dedup import (
        dedup_against_snapshot,
    )

    old = rd.from_items([{"doc_id": 0, "k": "a"}, {"doc_id": 3, "k": "b"}])
    new = rd.from_items([
        {"doc_id": 10, "k": "a"},   # seen in old -> dropped
        {"doc_id": 11, "k": "c"},   # fresh, first -> kept
        {"doc_id": 12, "k": "c"},   # fresh, repeat -> dropped
        {"doc_id": 13, "k": "d"},   # fresh -> kept
    ])
    out = dedup_against_snapshot(new, old, "k", "doc_id", n_buckets=4) \
        .to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [11, 13]
    assert list(out["k"]) == ["c", "d"]


def test_gopher_rules_flags():
    from document_text_extraction_ray.stages.curation import gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and it is that "
            "good for a walk in the park today with friends ") * 5
    docs = rd.from_items([
        {"doc_id": 1, "text": good},               # passes everything
        {"doc_id": 2, "text": "- a\n- b\n- c"},    # bullets-only stub
        {"doc_id": 3, "text": "#### " * 60},       # symbol soup, no letters
    ])
    out = (gopher_rules(docs).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    assert bool(out.loc[1, "pass_gopher"])
    assert not out.loc[2, "r_words"] and not out.loc[2, "r_bullet"]
    assert out.loc[2, "bullet_e4"] == 10000
    assert not out.loc[3, "r_symbol"] and not out.loc[3, "r_alpha"]
    assert not out.loc[3, "r_stop"]


def test_dedup_against_snapshot_bloom():
    """Bloom method: zero false negatives by construction (every old key
    dropped); at generous sizing the test corpus has no false positives,
    so the result equals the exact anti-join plan."""
    from document_text_extraction_ray.stages.dedup import (
        dedup_against_snapshot,
    )

    old = rd.from_items([{"doc_id": i, "k": f"old-{i}"} for i in range(50)])
    new = rd.from_items(
        [{"doc_id": 100 + i, "k": f"old-{i}"} for i in range(25)]   # seen
        + [{"doc_id": 200 + i, "k": f"new-{i}"} for i in range(25)]  # fresh
        + [{"doc_id": 300, "k": "new-0"}]                    # in-slice dup
    )
    out = dedup_against_snapshot(new, old, "k", "doc_id", n_buckets=4,
                                 method="bloom", m_bits=1 << 16) \
        .to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [200 + i for i in range(25)]
    exact = dedup_against_snapshot(new, old, "k", "doc_id", n_buckets=4) \
        .to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == list(exact["doc_id"])


def test_exact_substring_dedup_spans():
    """A duplicated 8-token window keeps its first (min doc, min start)
    occurrence; later copies lose exactly the covered tokens; docs shorter
    than k are untouched."""
    from document_text_extraction_ray.stages.dedup import (
        exact_substring_dedup,
    )

    docs = rd.from_items([
        {"doc_id": 1, "text": "a b c d e f g h unique one two three"},
        {"doc_id": 2, "text": "x y a b c d e f g h z w"},
        {"doc_id": 3, "text": "short doc"},
    ])
    out = (exact_substring_dedup(docs, "text", "doc_id", k=8, n_buckets=4)
           .to_pandas().sort_values("doc_id").set_index("doc_id"))
    assert out.loc[1, "dedup_text"] == "a b c d e f g h unique one two three"
    assert out.loc[2, "dedup_text"] == "x y z w"
    assert (out.loc[2, "n_tokens_total"],
            out.loc[2, "n_tokens_kept"]) == (12, 4)
    assert out.loc[3, "dedup_text"] == "short doc"


def test_c4_filters_rules():
    """Each C4 rule fires independently: terminal punct, >=5 words,
    javascript line, lorem/brace/badword page flags, >=3-sentence gate."""
    from document_text_extraction_ray.stages.curation import c4_filters

    good = ("this is a perfectly fine sentence one.\n"
            "this is a perfectly fine sentence two.\n"
            "this is a perfectly fine sentence three.")
    docs = rd.from_items([
        {"doc_id": 1, "text": good},
        # no terminal punct + short line + javascript line: all dropped
        {"doc_id": 2, "text": "no punctuation here at all\nshort one.\n"
                              "please enable javascript to see content."},
        {"doc_id": 3, "text": good + "\nlorem ipsum dolor sit amet."},
        {"doc_id": 4, "text": good + "\nvar x = { a: 1 }"},
        {"doc_id": 5, "text": good + "\nfree xxx content right here now."},
        {"doc_id": 6, "text": "one good sentence is not enough here."},
    ])
    out = (c4_filters(docs).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    assert bool(out.loc[1, "pass_c4"]) and out.loc[1, "clean_text"] == good
    assert out.loc[2, "n_lines_kept"] == 0 and not bool(out.loc[2, "pass_c4"])
    assert bool(out.loc[3, "has_lorem"]) and not bool(out.loc[3, "pass_c4"])
    assert bool(out.loc[4, "has_brace"]) and not bool(out.loc[4, "pass_c4"])
    assert bool(out.loc[5, "has_badword"]) and not bool(out.loc[5, "pass_c4"])
    # lorem line itself survives the LINE rules (ends in '.', 5 words)
    assert out.loc[3, "n_lines_kept"] == 4
    # one sentence < 3: fails the gate with no page flag
    assert out.loc[6, "n_lines_kept"] == 1 and not bool(out.loc[6, "pass_c4"])


def test_chunk_documents_windows_and_edges():
    import ray.data as rd

    from document_text_extraction_ray.stages.curation import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    rows = [
        {"doc_id": 1, "text": " ".join(toks)},   # 10 tokens
        {"doc_id": 2, "text": "only three words"},
        {"doc_id": 3, "text": ""},                # no chunks
        {"doc_id": 4, "text": " ".join(f"x{i}" for i in range(4))},  # == size
    ]
    out = chunk_documents(rd.from_items(rows).repartition(2),
                          chunk_tokens=4, overlap_tokens=1).to_pandas()
    out = out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    # doc 1: stride 3, starts 0,3,6 (start 6 covers to 10) -> 3 chunks
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk"]) == ["t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert list(d1["n_tokens"]) == [4, 4, 4]
    # doc 2: single short chunk
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk"]) == ["only three words"]
    # doc 3: nothing
    assert (out["doc_id"] == 3).sum() == 0
    # doc 4: exactly chunk_tokens -> ONE chunk, no empty tail
    d4 = out[out["doc_id"] == 4]
    assert len(d4) == 1 and d4["n_tokens"].iloc[0] == 4
    # overlap >= size rejected
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(rd.from_items(rows), chunk_tokens=4,
                        overlap_tokens=4)


def test_greedy_coverage_select_matches_brute_force(ray_session):
    import ray.data as rd

    from document_text_extraction_ray.stages.curation import (
        greedy_coverage_select,
    )
    from document_text_extraction_ray.stages.lexicon import _tokens

    docs = {
        0: "a b c d e f",          # 5 bigrams
        1: "a b c d",              # subset of 0
        2: "x y z w",              # 3 fresh bigrams
        3: "e f g",                # 1 fresh after 0 picked
        4: "",                     # no tokens
    }
    rows = [{"doc_id": i, "text": t} for i, t in docs.items()]
    out = greedy_coverage_select(rd.from_items(rows), k=4)

    def grams(t):
        toks = _tokens(t)
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    covered, ref = set(), []
    remaining = dict(docs)
    for rank in range(1, 5):
        best = None
        for i, t in sorted(remaining.items()):
            gain = len(grams(t) - covered)
            if gain > 0 and (best is None or gain > best[1]):
                best = (i, gain)
        if best is None:
            break
        ref.append((rank, best[0], best[1]))
        covered |= grams(docs[best[0]])
        del remaining[best[0]]
    got = [(int(r), int(d), int(g)) for r, d, g in
           zip(out["rank"], out["doc_id"], out["new_terms"])]
    assert got == ref
    assert got[0] == (1, 0, 5)          # biggest doc first
    assert (2, 2, 3) in got             # diverse doc beats subset doc
    assert all(d != 1 for _, d, _ in got)  # subset doc never selected


def test_novelty_scores_matches_brute_force():
    from document_text_extraction_ray.stages.curation import (
        novelty_scores,
        word_ngrams,
    )

    texts = {
        1: "alpha beta gamma delta epsilon",
        2: "alpha beta gamma zeta eta theta",      # shares a prefix trigram
        3: "alpha beta gamma delta epsilon",       # exact dup of 1: 0 novel
        4: "totally fresh words appear here now",
        5: "to by if",                             # 1 trigram
        6: "xy",                                   # <3 tokens: no shingles
    }
    sh = {d: set(word_ngrams(t, 3)) for d, t in texts.items()}
    owner = {}
    for d in sorted(sh):
        for g in sh[d]:
            owner.setdefault(g, d)
    exp = {d: (len(s), sum(1 for g in s if owner[g] == d))
           for d, s in sh.items() if s}

    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in texts.items()])
    out = novelty_scores(ds, n_buckets=4).to_pandas()
    got = {int(r["doc_id"]): (int(r["n_shingles"]), int(r["n_novel"]))
           for _, r in out.iterrows()}
    assert got == exp
    assert got[3] == (3, 0)           # exact dup owns nothing
    assert 6 not in got               # shingle-less doc absent by contract


def test_robots_filter_precedence():
    from document_text_extraction_ray.stages.curation import robots_filter

    rules = [
        ("a.com", "/static/", 0),
        ("a.com", "/p/", 0),
        ("a.com", "/p/1", 1),        # longer allow overrides /p/ disallow
        ("a.com", "/u/", 0),
        ("a.com", "/u/", 1),         # equal length: allow wins the tie
    ]
    ds = rd.from_items([
        {"doc_id": 0, "url": "https://a.com/static/x.css"},
        {"doc_id": 1, "url": "https://a.com/p/2"},
        {"doc_id": 2, "url": "https://a.com/p/15?q=1"},   # query stripped
        {"doc_id": 3, "url": "https://a.com/u/alice"},
        {"doc_id": 4, "url": "https://a.com/open/page"},  # implicit allow
        {"doc_id": 5, "url": "https://b.com/static/x"},   # host unruled
    ])
    out = robots_filter(ds, rules).to_pandas().sort_values("doc_id")
    assert list(out["allowed"]) == [0, 0, 1, 1, 1, 1]
    assert list(out["rule_len"]) == [8, 3, 4, 3, 0, 0]


def test_filter_threshold_sweep_counts():
    from document_text_extraction_ray.stages.curation import (
        filter_threshold_sweep,
    )

    ds = rd.from_items([
        {"text": "a b c d", "lang": "en"},    # score 4, pos
        {"text": "a a a a", "lang": "en"},    # score 1, pos
        {"text": "x y z",   "lang": "de"},    # score 3, neg
        {"text": "",        "lang": None},    # score 0, neg
    ])
    out = filter_threshold_sweep(ds, [2, 4], label_column="lang") \
        .to_pandas().sort_values("threshold").reset_index(drop=True)
    assert list(out["threshold"]) == [2, 4]
    # t=2: keep scores >=2 -> docs 1,3 kept; tp=1 fp=1 fn=1 tn=1
    assert list(out.loc[0, ["tp", "fp", "fn", "tn"]]) == [1, 1, 1, 1]
    # t=4: keep score>=4 -> doc 1 only; tp=1 fp=0 fn=1 tn=2
    assert list(out.loc[1, ["tp", "fp", "fn", "tn"]]) == [1, 0, 1, 2]
    assert (out[["tp", "fp", "fn", "tn"]].sum(axis=1) == 4).all()


def test_crawl_schedule_matches_brute_force(ray_session):
    import ray.data as rd

    from document_text_extraction_ray.stages.curation import crawl_schedule

    rows = [{"url_id": i, "host": f"h{i % 3}", "prio": (i * 7) % 5}
            for i in range(40)]
    delay_map = {"h0": 1000}
    out = crawl_schedule(rd.from_items(rows), host_col="host",
                         delay_map=delay_map, default_delay_ms=200,
                         order_cols=["prio", "url_id"],
                         descending=[True, False], n_buckets=4) \
        .to_pandas().set_index("url_id").sort_index()

    ref = sorted(rows, key=lambda r: (r["host"], -r["prio"], r["url_id"]))
    slot_of_host: dict = {}
    for r in ref:
        s = slot_of_host.get(r["host"], 0)
        slot_of_host[r["host"]] = s + 1
        d = delay_map.get(r["host"], 200)
        assert out.loc[r["url_id"], "slot"] == s
        assert out.loc[r["url_id"], "fetch_at_ms"] == s * d
