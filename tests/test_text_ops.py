"""Text-analysis operator tests (token counting, quality, lang-id,
fingerprint)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from fluent_plugin_geoip_ray.stages.text import (
    LangId,
    QualityScore,
    fingerprint,
    token_count,
)


def tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


def test_token_count():
    out = token_count(tbl(["one two three", "single", ""])).to_pylist()
    assert [r["n_tokens"] for r in out] == [3, 1, 0]
    assert [r["n_chars_calc"] for r in out] == [13, 6, 0]


def test_quality_score_features():
    out = QualityScore()(tbl(["the cat sat on the mat", "zzzz!!!! ????"])).to_pylist()
    good, bad = out
    assert good["stop_ratio"] > 0.3
    assert bad["punct_ratio"] > 0.4
    assert good["quality"] > bad["quality"]
    assert good["bpe_tokens_est"] == -(-len("the cat sat on the mat") // 4)


def test_lang_id():
    out = LangId()(
        tbl([
            "the cat is in the house and it was for him",
            "el perro y la casa de los vecinos en un dia",
            "qwerty zxcvb asdfgh",
        ])
    ).to_pylist()
    assert out[0]["lang_pred"] == "en"
    assert out[1]["lang_pred"] == "es"
    assert out[2]["lang_pred"] == "unknown"


def test_fingerprint_deterministic():
    a = fingerprint(tbl(["abc", "def", "abc"])).to_pylist()
    b = fingerprint(tbl(["abc", "def", "abc"])).to_pylist()
    assert [r["fingerprint"] for r in a] == [r["fingerprint"] for r in b]
    assert a[0]["fingerprint"] == a[2]["fingerprint"]
    assert a[0]["fingerprint"] != a[1]["fingerprint"]


def test_bpe_token_count():
    from fluent_plugin_geoip_ray.stages.text import bpe_token_count

    out = bpe_token_count(tbl(["hello world", "it's 2026!", ""])).to_pylist()
    # "hello","​ world" -> 2 ; "it","'s"," 2026","!" -> 4 ; "" -> 0
    assert out[0]["n_bpe_tokens"] == 2
    assert out[1]["n_bpe_tokens"] == 4
    assert out[2]["n_bpe_tokens"] == 0


def test_redact_patterns():
    import pyarrow as pa

    from fluent_plugin_geoip_ray.stages.text import redact

    t = pa.table({"text": [
        "mail me at jo.doe+x@example.co.uk please",
        "card 4111 1111 1111 1111 leaked",
        "from 192.168.0.1 to 10.0.0.255",
        "clean line",
    ]})
    out = redact(t).column("text").to_pylist()
    assert out[0] == "mail me at <EMAIL> please"
    assert out[1] == "card <CARD> leaked"
    assert out[2] == "from <IP> to <IP>"
    assert out[3] == "clean line"


def test_chunk_tokens_windows_and_tails():
    import re

    from fluent_plugin_geoip_ray.stages.text import chunk_tokens

    texts = ["one two three four five six seven", "a  b   c", "", "solo",
             " ".join(f"t{i}" for i in range(10))]
    out = chunk_tokens(tbl(texts), window=4, stride=3).to_pandas()

    rows = []
    for i, x in enumerate(texts):
        toks = re.split(r"\s+", x)
        p = ci = 0
        while p < len(toks):
            c = toks[p:p + 4]
            rows.append((i, ci, " ".join(c), len(c)))
            p += 3
            ci += 1
    assert list(out.itertuples(index=False, name=None)) == rows


def test_chunk_tokens_no_overlap_covers_exactly():
    from fluent_plugin_geoip_ray.stages.text import chunk_tokens

    text = " ".join(f"t{i}" for i in range(100))
    out = chunk_tokens(tbl([text]), window=10, stride=10).to_pandas()
    assert len(out) == 10
    assert out["n_tokens"].sum() == 100
    assert " ".join(out["chunk_text"]) == text


def test_chunk_tokens_rejects_bad_params():
    import pytest

    from fluent_plugin_geoip_ray.stages.text import chunk_tokens

    with pytest.raises(ValueError):
        chunk_tokens(tbl(["x"]), window=0, stride=1)
    with pytest.raises(ValueError):
        chunk_tokens(tbl(["x"]), window=4, stride=0)


def test_repetition_signals_matches_bruteforce():
    import re
    from collections import Counter

    from fluent_plugin_geoip_ray.stages.text import repetition_signals

    texts = [
        "the cat sat on the cat sat again",
        "a b c d e",
        "x x x x x x",
        "one",
        "",
        "Go go GO go",
    ]
    out = repetition_signals(tbl(texts)).to_pandas()

    def ref(x, n=2):
        toks = re.split(r"\s+", x.lower())
        total = sum(len(tk) for tk in toks)
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams or total == 0:
            return 0.0, 0.0
        c = Counter(grams)
        w = {g: cnt * sum(len(tk) for tk in g) for g, cnt in c.items()}
        return (max(w.values()) / total,
                sum(v for g, v in w.items() if c[g] >= 2) / total)

    for i, x in enumerate(texts):
        rt, rdp = ref(x)
        assert abs(out.loc[i, "top_ngram_char_frac"] - rt) < 1e-12, (i, x)
        assert abs(out.loc[i, "dup_ngram_char_frac"] - rdp) < 1e-12, (i, x)


def test_repetition_signals_trigram_and_validation():
    import pytest

    from fluent_plugin_geoip_ray.stages.text import repetition_signals

    # "a b c" appears twice as a 3-gram: weight 2*3=6, total chars 7
    out = repetition_signals(tbl(["a b c a b c d"]), n=3).to_pandas()
    assert abs(out.loc[0, "top_ngram_char_frac"] - 6 / 7) < 1e-12
    assert abs(out.loc[0, "dup_ngram_char_frac"] - 6 / 7) < 1e-12
    with pytest.raises(ValueError):
        repetition_signals(tbl(["x"]), n=1)


def test_build_vocab_counts_and_topk():
    from collections import Counter

    from fluent_plugin_geoip_ray.stages.text import build_vocab

    texts = ["the cat sat on the mat", "  The DOG  ", "cat dog cat", ""]
    ref = Counter()
    for s in texts:
        ref.update(w for w in s.lower().split() if w)
    t = pa.table({"text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(3)
    full = build_vocab(ds).to_pandas().set_index("token")["count"].to_dict()
    assert full == dict(ref)
    # min_count filter
    mc = build_vocab(ds, min_count=2).to_pandas()
    assert set(mc["token"]) == {w for w, c in ref.items() if c >= 2}
    # top-k with deterministic tie-break (count desc, token asc)
    topt = build_vocab(ds, top=3).to_pandas()
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(map(tuple, topt[["token", "count"]].to_numpy())) == expect


def _lm_bruteforce(ref_texts, texts, scale=1_000_000):
    from collections import Counter

    uni, bi = Counter(), Counter()
    for s in ref_texts:
        ws = [w for w in s.lower().split() if w]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    scores = []
    for s in texts:
        ws = [w for w in s.lower().split() if w]
        total = 0
        for a, b in zip(ws, ws[1:]):
            cb = bi.get((a, b), 0)
            cu = uni.get(a, 1)        # cb=0 whenever cu missing
            total += (cb * scale) // cu
        scores.append(total)
    return scores


def test_ngram_lm_affinity_matches_bruteforce():
    import numpy as np

    from fluent_plugin_geoip_ray.stages.text import ngram_lm_affinity

    rng = np.random.default_rng(5)
    words = "the cat dog sat mat ran big red on a".split()
    ref_texts = [" ".join(rng.choice(words, size=rng.integers(2, 30)))
                 for _ in range(30)]
    texts = ([" ".join(rng.choice(words, size=rng.integers(0, 25)))
              for _ in range(20)]
             + ["", "single", "  the   cat  ", "zzz qqq unseen grams"])
    ref = _lm_bruteforce(ref_texts, texts)
    rds = rd.from_arrow(pa.table({"text": pa.array(ref_texts)})).repartition(3)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(4)
    out = ngram_lm_affinity(ds, rds).to_pandas().sort_values("doc_id")
    assert list(out["lm_affinity"]) == ref
    # in-distribution text scores higher than unseen-gram text
    assert out["lm_affinity"].iloc[-2] > out["lm_affinity"].iloc[-1] == 0


def test_ngram_lm_affinity_ref_limit():
    from fluent_plugin_geoip_ray.stages.text import ngram_lm_affinity

    t = pa.table({"text": pa.array(["a b c d e f g"])})
    with pytest.raises(ValueError, match="broadcast_limit"):
        ngram_lm_affinity(rd.from_arrow(t), rd.from_arrow(t),
                          broadcast_limit=2)


def _dsir_ref(texts, target_mask, scale=1_000_000_000):
    """Per-doc reference score via plain Python dicts and // arithmetic."""
    def grams(s):
        toks = [t for t in s.lower().split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    raw, tgt = {}, {}
    for s, is_t in zip(texts, target_mask):
        for g in grams(s):
            raw[g] = raw.get(g, 0) + 1
            if is_t:
                tgt[g] = tgt.get(g, 0) + 1
    n_raw, n_tgt = sum(raw.values()), sum(tgt.values())
    w = {g: (tgt.get(g, 0) * scale) // max(n_tgt, 1)
         - (raw[g] * scale) // max(n_raw, 1) for g in raw}
    return [sum(w.get(g, 0) for g in grams(s)) for s in texts]


def test_dsir_importance_matches_bruteforce():
    from fluent_plugin_geoip_ray.stages.text import dsir_importance

    rng = np.random.default_rng(17)
    vocab_a = ["alpha", "beta", "gamma", "delta"]
    vocab_b = ["omega", "sigma", "theta"]
    texts, is_tgt = [], []
    for i in range(120):
        t = i % 3 == 0
        words = rng.choice(vocab_a if t else vocab_b, size=rng.integers(0, 9))
        texts.append(" ".join(words))
        is_tgt.append(t)
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts),
                  "is_tgt": pa.array(is_tgt)})
    ds = rd.from_arrow(t).repartition(7)
    tgt = rd.from_arrow(t.filter(t.column("is_tgt"))).repartition(3)
    got = (dsir_importance(ds, tgt).to_pandas()
           .sort_values("doc_id")["dsir_score"].to_list())
    assert got == _dsir_ref(texts, is_tgt)


def test_dsir_hashed_equals_exact_without_collisions_and_is_invariant():
    from fluent_plugin_geoip_ray.stages.text import (_hash_strings,
                                                     dsir_importance)

    texts = ["the cat sat", "the dog ran far", "cat dog", "", "the the the"]
    t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "text": pa.array(texts)})
    tgt = rd.from_arrow(t.slice(0, 2))
    B = 1 << 22
    # confirm the fixture really is collision-free at B
    all_grams = set()
    for s in texts:
        toks = s.lower().split()
        all_grams.update(toks)
        all_grams.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    hs = _hash_strings(pa.array(sorted(all_grams))) % np.uint64(B)
    assert len(set(hs.tolist())) == len(all_grams)

    base = None
    for parts in (1, 2, 5):
        ds = rd.from_arrow(t).repartition(parts)
        ex = (dsir_importance(ds, tgt).to_pandas()
              .sort_values("doc_id")["dsir_score"].to_list())
        hsh = (dsir_importance(ds, tgt, num_buckets=B).to_pandas()
               .sort_values("doc_id")["dsir_score"].to_list())
        assert ex == hsh
        base = base or ex
        assert ex == base          # partition invariance


def test_dsir_exact_mode_broadcast_limit():
    from fluent_plugin_geoip_ray.stages.text import dsir_importance

    t = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                  "text": pa.array(["a b c", "d e f", "g h", "i"])})
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_importance(ds, ds, broadcast_limit=3).to_pandas()


def test_explode_column_unnest_semantics():
    import pyarrow as pa
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.parse import explode_column

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "tag": pa.array(["a", "b", "c", "d"]),
        "xs": pa.array([[10, 20, 30], [], None, [40]],
                       pa.list_(pa.int64())),
    })
    out = explode_column(rd.from_arrow(t).repartition(3), "xs",
                         value_col="x").to_pandas() \
        .sort_values(["id", "pos"]).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"id": 1, "tag": "a", "pos": 0, "x": 10},
        {"id": 1, "tag": "a", "pos": 1, "x": 20},
        {"id": 1, "tag": "a", "pos": 2, "x": 30},
        {"id": 4, "tag": "d", "pos": 0, "x": 40},
    ]


def test_normalize_text_matrix():
    import pyarrow as pa

    from fluent_plugin_geoip_ray.stages.text import normalize_text

    t = pa.table({"text": pa.array(["  Hello,   WORLD!!\tfoo  ",
                                    "a_b c-d", ""])})
    full = normalize_text(t, strip_punct=True)
    assert full.column("text").to_pylist() == ["hello world foo",
                                               "a_b cd", ""]
    keep_punct = normalize_text(t)
    assert keep_punct.column("text").to_pylist() == [
        "hello, world!! foo", "a_b c-d", ""]
    out_col = normalize_text(t, out_col="norm")
    assert out_col.column_names == ["text", "norm"]


def test_tfidf_known_counts_and_join_paths():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.text import tfidf

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a b a", "b c", "c c  c"],
    })
    out = (tfidf(rd.from_arrow(t)).to_pandas()
           .set_index(["doc_id", "token"]).sort_index())
    assert out.loc[(1, "a"), "tf"] == 2
    assert out.loc[(1, "b"), "df"] == 2          # docs 1 and 2
    assert out.loc[(3, "c"), "tf"] == 3
    assert out.loc[(3, "c"), "df"] == 2          # docs 2 and 3
    assert (out["n_docs"] == 3).all()
    # tfidf float column: tf * ln(n/df)
    assert out.loc[(3, "c"), "tfidf"] == 3 * np.log(3 / 2)
    # forced bucketed-join path == broadcast path
    out2 = (tfidf(rd.from_arrow(t), df_broadcast_limit=0).to_pandas()
            .set_index(["doc_id", "token"]).sort_index())
    assert out2[["tf", "df", "n_docs"]].equals(out[["tf", "df", "n_docs"]])


def test_train_bpe_hand_computed_merges():
    """BPE merges on a hand-computable corpus.  Word counts: aaab x3,
    ab x1.  Pair counts round 1: (a,a)=6, (a,b)=4, (b,</w>)=4 ->
    merge (a,a).  Round 2: (aa,a)=3, (a,b)=4, (b,</w>)=4 -> tie at 4,
    lexicographic min is ('a','b') -> merge (a,b).  Round 3: aaab =
    [aa, ab, </w>], ab = [ab, </w>]: (aa,ab)=3, (ab,</w>)=4 -> merge
    (ab, </w>)."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.text import train_bpe

    t = pa.table({"text": ["aaab aaab", "aaab ab"]})
    merges = train_bpe(rd.from_arrow(t), num_merges=3)
    assert merges == [("a", "a"), ("a", "b"), ("ab", "</w>")]


def test_bpe_encode_and_counts():
    import pyarrow as pa
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.text import (
        bpe_encode_word,
        bpe_token_counts,
        train_bpe,
    )

    t = pa.table({"doc_id": [1, 2], "text": ["aaab aaab", "aaab ab"]})
    merges = train_bpe(rd.from_arrow(t), num_merges=3)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # aaab -> aa + ab</w> (merge (a,a) then (a,b) then (ab,</w>))
    assert bpe_encode_word("aaab", ranks) == ["aa", "ab</w>"]
    assert bpe_encode_word("ab", ranks) == ["ab</w>"]
    assert bpe_encode_word("zq", ranks) == ["z", "q", "</w>"]
    out = (bpe_token_counts(rd.from_arrow(t).repartition(2), merges)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "n_bpe_tokens"] == 4   # two aaab = 2+2
    assert out.loc[2, "n_bpe_tokens"] == 3   # aaab + ab = 2+1


def test_train_bpe_matches_reference_implementation():
    """Distributed-word-count BPE == a clean-room single-process referee
    on a larger random corpus (same tie rules)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.text import train_bpe

    rng = np.random.default_rng(47)
    alphabet = list("abcdef")
    docs = [" ".join("".join(rng.choice(alphabet,
                                        rng.integers(1, 7)).tolist())
                     for _ in range(30)) for _ in range(20)]
    t = pa.table({"text": docs})
    got = train_bpe(rd.from_arrow(t).repartition(4), num_merges=12)

    # referee: plain-python BPE over exact word counts
    from collections import Counter

    wc = Counter(w for d in docs for w in d.lower().split())
    words = {tuple(w) + ("</w>",): c for w, c in wc.items()}
    expect = []
    for _ in range(12):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        expect.append(best)
        nw = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + c
        words = nw
    assert got == expect
