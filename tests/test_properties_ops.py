"""Property-based tests (hypothesis) for the round-3 operators: each must
agree with a pure-Python referee on arbitrary small inputs — duplicated
spans, count-min estimates, Bloom membership, SemDeDup keep rule."""

import pytest
from hypothesis import given, settings, strategies as st

# small lowercase-word texts: tiny alphabet forces real duplication
word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
text = st.lists(word, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(text, min_size=1, max_size=10))
def test_duplicated_spans_match_referee(spark, texts):
    from transitlog_hfp_sink_spark.operators.spans import duplicated_window_stats

    n = 3
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicated_window_stats(df, n=n).collect()}

    from collections import Counter

    wins = {
        did: [" ".join(t.split()[i : i + n]) for i in range(max(len(t.split()) - n + 1, 0))]
        if t else []
        for did, t in rows
    }
    counts = Counter(w for ws in wins.values() for w in ws)
    for did, t in rows:
        toks = t.split() if t else [""]
        starts = [i for i, w in enumerate(wins[did]) if counts[w] >= 2]
        covered = set()
        for s in starts:
            covered.update(range(s, s + n))
        assert got[did]["dup_windows"] == len(starts), (did, t)
        assert got[did]["dup_tokens"] == len(covered), (did, t)
        assert got[did]["n_tokens"] == len(toks), (did, t)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
    st.integers(2, 5),
    st.sampled_from([2, 8, 64]),
)
def test_cms_overestimate_property(spark, items, depth, width):
    from collections import Counter

    from transitlog_hfp_sink_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(x,) for x in items], "item string")
    cms = cms_build(df, "item", depth=depth, width=width)
    est = {r["item"]: r["est"]
           for r in cms_estimate(cms, df, "item", depth=depth, width=width).collect()}
    exact = Counter(items)
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert n <= est[k] <= len(items), (k, n, est[k])
    # each seed row's counters sum to the stream length
    per_seed = {}
    for r in cms.collect():
        per_seed[r["seed"]] = per_seed.get(r["seed"], 0) + r["cnt"]
    assert all(v == len(items) for v in per_seed.values())


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="xyz01", min_size=1, max_size=6),
             min_size=1, max_size=25, unique=True),
    st.lists(st.text(alphabet="xyz01", min_size=1, max_size=6),
             min_size=1, max_size=25, unique=True),
    st.sampled_from([16, 256]),
)
def test_bloom_no_false_negatives_property(spark, members, probes, m):
    from transitlog_hfp_sink_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    mdf = spark.createDataFrame([(x,) for x in members], "key string")
    pdf = spark.createDataFrame([(x,) for x in set(members) | set(probes)], "key string")
    filt = bloom_build(mdf, "key", k=3, m=m)
    verdicts = {r["key"]: r["might_contain"]
                for r in bloom_might_contain(filt, pdf, "key", k=3, m=m).collect()}
    for x in members:
        assert verdicts[x], x  # the guarantee, any m


vec = st.lists(
    st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
    min_size=4, max_size=4,
).filter(lambda v: sum(x * x for x in v) > 1e-6)


@settings(max_examples=10, deadline=None)
@given(st.lists(vec, min_size=3, max_size=12, unique_by=tuple))
def test_semdedup_keep_rule_property(spark, vecs):
    from transitlog_hfp_sink_spark.operators.similarity import semantic_dedup

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [rows[0][1], rows[-1][1]]
    pairs_df, keep_df = semantic_dedup(df, cents, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in pairs_df.collect()}
    kept = {r["vec_id"] for r in keep_df.collect()}
    # keep/drop partition the corpus, and every dropped id has a pair
    all_ids = set(range(len(rows)))
    dropped = all_ids - kept
    assert dropped <= {i for p in pairs for i in p}
    # a near-duplicate pair never keeps both of its ends
    for a, b in pairs:
        assert not (a in kept and b in kept), (a, b)


def test_nearest_lists_python_twin_matches_expression(spark):
    """_nearest_lists_py (driver-side, used by ivfpq_topk) must reproduce
    the _nearest_lists expression exactly — same sequential-fold
    distances, same stable ordering (round-4 twin introduced with the
    driver-side ADC tables)."""
    import random

    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.similarity import (
        _nearest_lists,
        _nearest_lists_py,
    )

    rng = random.Random(41)
    dim, n_lists, nprobe = 16, 7, 3
    cents = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_lists)]
    vecs = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(200)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id int, v array<double>"
    )
    got = {
        r["id"]: list(r["lists"])
        for r in df.select(
            "id", _nearest_lists(F.col("v"), cents, nprobe).alias("lists")
        ).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == _nearest_lists_py(v, cents, nprobe), f"vec {i}"


def test_adc_tables_python_twin_matches_scored_distances(spark):
    """pq_adc_topk's driver-side tables must yield the same rounded
    distances as recomputing sum_j tables[j][code_j] in Python over the
    encoded corpus — pinning the IEEE fold-order claim of _adc_tables
    (round 4)."""
    import random

    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.similarity import (
        _adc_tables,
        pq_adc_topk,
        pq_encode,
    )

    rng = random.Random(43)
    dim, m, k = 16, 4, 5
    dsub = dim // m
    books = [
        [[rng.uniform(-1, 1) for _ in range(dsub)] for _ in range(k)]
        for _ in range(m)
    ]
    vecs = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(60)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, embedding array<double>"
    )
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    queries = df.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_adc_topk(pq_encode(df, books), queries, books, k=len(vecs)).collect()
    assert got
    for r in got:
        tabs = _adc_tables(vecs[r["query_id"]], books, dsub)
        acc = 0.0
        for j, code in enumerate(codes[r["neighbor_id"]]):
            acc = acc + tabs[j][code]
        assert abs(r["approx_dist2"] - round(acc, 6)) < 1e-12, (
            f"query {r['query_id']} neighbor {r['neighbor_id']}"
        )


# gapfill property inputs: per-series sparse observations on a small
# bucket grid, values sometimes NULL (the locf/interpolate skip case)
_obs = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.integers(min_value=0, max_value=40),  # bucket index (hours)
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=10, deadline=None)
@given(_obs, st.sampled_from([1, 3, 1000]))
def test_gapfill_matches_python_referee(spark, obs, slice_buckets):
    """Round-7 rewrite guard: gapfill_buckets (observed-row fills +
    chunked densify) must agree with a brute-force Python referee on
    arbitrary sparse series with NULL-valued observations, at slice
    widths that do and do not split gaps."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.gapfill import gapfill_buckets

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        (s, t0 + _dt.timedelta(hours=b), v, 1 if v is not None else None)
        for s, b, v in obs
    ]
    df = spark.createDataFrame(
        rows, "series string, bucket timestamp, v double, n bigint"
    ).withColumn("vi", F.col("v"))
    got = {
        (r["series"], r["bucket"]): (r["n"], r["v"], r["vi"])
        for r in gapfill_buckets(
            df, "bucket", 3600, ["series"],
            fill={"n": "zero", "v": "locf", "vi": "interpolate"},
            max_slice_buckets=slice_buckets,
        ).collect()
    }

    # referee: per series, dense [min,max] grid, textbook fills
    want = {}
    by_series: dict = {}
    for s, b, v in obs:
        by_series.setdefault(s, {})[b] = v
    for s, d in by_series.items():
        lo, hi = min(d), max(d)
        obs_nn = sorted((b, v) for b, v in d.items() if v is not None)
        for b in range(lo, hi + 1):
            ts = t0 + _dt.timedelta(hours=b)
            v_obs = d.get(b)
            n = (1 if v_obs is not None else 0) if b in d else 0
            prevs = [(ob, ov) for ob, ov in obs_nn if ob <= b]
            nexts = [(ob, ov) for ob, ov in obs_nn if ob >= b]
            locf = prevs[-1][1] if prevs else None
            if v_obs is not None:
                interp = v_obs
            elif prevs and nexts:
                (pb, pv), (nb, nv) = prevs[-1], nexts[0]
                interp = pv + (nv - pv) * (
                    float((b - pb) * 3600_000_000) / ((nb - pb) * 3600_000_000)
                )
            else:
                interp = None
            want[(s, ts)] = (n, locf, interp)

    assert set(got) == set(want)
    for k in want:
        gn, gl, gi = got[k]
        wn, wl, wi = want[k]
        assert gn == wn, (k, got[k], want[k])
        assert gl == wl, (k, got[k], want[k])
        if wi is None:
            assert gi is None, (k, got[k], want[k])
        else:
            assert gi is not None and abs(gi - wi) < 1e-9, (k, got[k], want[k])


# weighted_take property inputs: unique string keys, positive weights
# spanning 4 orders of magnitude, two strata
_wrows = st.lists(
    st.tuples(
        st.text(alphabet="abcdef123", min_size=1, max_size=8),
        st.floats(min_value=1e-2, max_value=100.0, allow_nan=False),
        st.sampled_from(["g1", "g2"]),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None)
@given(_wrows, st.integers(1, 4))
def test_weighted_take_matches_es_referee(spark, rows, n_per):
    """Round 8 (VERDICT r7 #7): weighted_take must select exactly the
    rows a brute-force Python Efraimidis-Spirakis referee ranks top-n —
    same md5-derived u, same ln(u)/w key, same floor(key*1e9)
    quantization, same (quantized desc, key asc) order."""
    import hashlib
    import math

    from transitlog_hfp_sink_spark.operators.sampling import weighted_take

    df = spark.createDataFrame(rows, "k string, w double, g string")
    got = {
        (r["g"], r["k"])
        for r in weighted_take(df, ["g"], "k", "w", n_per, salt="p").collect()
    }

    def es_q(k: str, w: float) -> float:
        u = (int(hashlib.md5(("p" + k).encode()).hexdigest()[:8], 16) + 1) / (
            2**32 + 1
        )
        scaled = math.log(u) / w * 1e9
        return scaled - (scaled % 1.0)  # x - pmod(x, 1) == floor, stays double

    want = set()
    for g in {r[2] for r in rows}:
        ranked = sorted(
            ((es_q(k, w), k) for k, w, gg in rows if gg == g),
            key=lambda t: (-t[0], t[1]),
        )
        want |= {(g, k) for _, k in ranked[:n_per]}
    assert got == want


# minhash property inputs: small-alphabet word docs with planted exact
# clones (identical shingle SETS), so the guaranteed-recall case exists
_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
             min_size=1, max_size=12),
    min_size=2,
    max_size=10,
)


@settings(max_examples=10, deadline=None)
@given(_docs, st.sampled_from([0.5, 0.8]))
def test_minhash_lsh_pairs_verify_and_guaranteed_recall(spark, word_lists, thr):
    """Round 8 (VERDICT r7 #7): minhash_lsh_pairs against an exact-Jaccard
    Python referee — (a) every emitted pair's jaccard equals the referee's
    set-Jaccard (the verify stage is exact), (b) no pair below threshold
    is emitted, and (c) every pair with IDENTICAL shingle sets (jaccard 1:
    identical signatures, all bands collide, candidate guaranteed) IS
    emitted — the deterministic-recall case that needs no probability."""
    from transitlog_hfp_sink_spark.operators.dedup import minhash_lsh_pairs

    docs = word_lists + word_lists[:2]  # plant at least two exact clones
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, "text", "doc_id", num_perm=16, bands=8, threshold=thr
        ).collect()
    }

    sets = {i: frozenset(ws) for i, ws in enumerate(docs)}

    def jac(a, b):
        u = len(sets[a] | sets[b])
        return round(len(sets[a] & sets[b]) / u, 6) if u else 0.0

    for (a, b), j in got.items():
        assert a < b
        assert j == jac(a, b), (a, b)          # (a) exact verify values
        assert j >= thr, (a, b)                 # (b) threshold respected
    for a in range(len(docs)):                  # (c) identical sets found
        for b in range(a + 1, len(docs)):
            if sets[a] == sets[b]:
                assert (a, b) in got, (a, b)
    # (d) round 10 (VERDICT r9 #4): the co-occurrence-count verify is
    # output-identical to the array verify on arbitrary corpora — same
    # candidates (identical banding), same pairs, same round-to-6 values
    got_counts = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, "text", "doc_id", num_perm=16, bands=8, threshold=thr,
            verify="counts",
        ).collect()
    }
    assert got_counts == got


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(_docs, st.sampled_from([0.34, 0.5, 1.0]))
def test_jaccard_prune_equivalence_property(spark, word_lists, thr):
    """Round 8 (VERDICT r7 #1): on arbitrary small corpora (empty-set
    docs, exact clones, any length mix) both prune modes must emit the
    EXACT pair set and values of the unpruned referee. Round 9 (VERDICT
    r8 #3) extends the grid with verify='counts' — the co-occurrence
    verify must be output-identical under every prune mode too. Round
    10: the reference pins verify='arrays' EXPLICITLY (the default is
    now 'auto', which resolves to counts at thr>0 — a default-following
    reference would have quietly turned the arrays legs circular), and
    the grid additionally pins auto == both explicit modes."""
    from transitlog_hfp_sink_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(df, threshold=thr, verify="arrays").collect()
    )
    for mode in ("length", "prefix"):
        got = sorted(
            tuple(r)
            for r in ngram_jaccard_pairs(
                df, threshold=thr, prune=mode, verify="arrays"
            ).collect()
        )
        assert got == ref, (mode, thr)
    for mode in (None, "length", "prefix"):
        got = sorted(
            tuple(r)
            for r in ngram_jaccard_pairs(
                df, threshold=thr, prune=mode, verify="counts"
            ).collect()
        )
        assert got == ref, ("counts", mode, thr)
    got_auto = sorted(
        tuple(r) for r in ngram_jaccard_pairs(df, threshold=thr).collect()
    )
    assert got_auto == ref, ("auto", thr)


# --- round 8 additions: winnow / BM25 / connected-components referees ------

# winnow inputs include punctuation so normalize_text is exercised too
_wtext = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "e!f", "GG"]), min_size=0, max_size=20
).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_wtext, min_size=1, max_size=6), st.sampled_from([(4, 3), (8, 4)]))
def test_winnow_fingerprints_match_python_referee(spark, texts, kw):
    """The md5 hash mode makes winnowing fully replicable in Python:
    normalize -> char k-grams -> 48-bit md5-prefix hash -> min over every
    w-gram window (tail windows truncate) -> distinct. The Spark
    window-function formulation must select EXACTLY the referee's
    fingerprint set per document."""
    import hashlib
    import re

    from transitlog_hfp_sink_spark.operators.winnow import winnow_fingerprints

    k, window = kw
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(
        df, "text", "doc_id", k=k, window=window, hash_fn="md5"
    ).collect():
        got.setdefault(r["id"], set()).add(r["fingerprint"])

    def norm(t: str) -> str:
        t = re.sub(r"[^a-z0-9\s]", " ", t.lower())
        return re.sub(r"\s+", " ", t).strip()

    for did, t in rows:
        s = norm(t)
        grams = [s[i : i + k] for i in range(len(s) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams]
        want = {min(hs[i : i + window]) for i in range(len(hs))}
        assert got.get(did, set()) == want, (did, t)


_bm_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=8),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(
    _bm_docs,
    st.lists(st.sampled_from(["aa", "bb", "cc", "xx"]), min_size=1, max_size=3,
             unique=True),
)
def test_bm25_postings_matches_python_referee(spark, word_lists, qterms):
    """bm25_score_postings against a pure-Python Lucene-BM25 referee that
    replicates the exact cross-engine arithmetic: same idf/tf-norm
    expression order (each double op correctly rounded), the same
    double->decimal(20,8) HALF_UP quantization per term (shortest-repr
    conversion on both sides), exact decimal summation, the same
    (score desc, doc_id asc) tie-break, and the same final round-to-4.
    Ranks and scores must match EXACTLY, not approximately."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from transitlog_hfp_sink_spark.operators.search import (
        B,
        K1,
        bm25_score_postings,
        build_postings,
    )

    topk = 3
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id long, text string",
    )
    postings, doclens = build_postings(docs)
    qdf = spark.createDataFrame([(1, t) for t in qterms], "query_id int, term string")
    got = sorted(
        (r["doc_id"], r["rank"], r["score"])
        for r in bm25_score_postings(postings, doclens, qdf, topk=topk).collect()
    )

    toks = {i: " ".join(ws).split(" ") for i, ws in enumerate(word_lists)}
    n_docs = len(word_lists)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    q8 = Decimal("0.00000001")
    totals: dict[int, Decimal] = {}
    for term in qterms:
        hit = {i: Counter(t)[term] for i, t in toks.items() if term in t}
        df = len(hit)
        for i, tf in hit.items():
            dl = len(toks[i])
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            s = idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))
            totals[i] = totals.get(i, Decimal(0)) + Decimal(repr(s)).quantize(
                q8, ROUND_HALF_UP
            )
    ranked = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    want = sorted(
        (doc, rank + 1,
         float(Decimal(repr(float(total))).quantize(Decimal("0.0001"),
                                                    ROUND_HALF_UP)))
        for rank, (doc, total) in enumerate(ranked)
    )
    assert got == want, (word_lists, qterms)


_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=25
)


@settings(max_examples=10, deadline=None)
@given(_edges)
def test_connected_components_matches_union_find(spark, edges):
    """The large-star/small-star iteration must converge to exactly the
    union-find referee's answer on arbitrary small graphs: every node of
    a non-loop edge labeled with the MINIMUM reachable node id,
    self-loops ignored, isolated nodes absent."""
    from transitlog_hfp_sink_spark.operators.cluster import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, stats=stats).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u == v:
            continue
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in comps.values() for n in members}
    assert got == want, edges
    if parent:
        assert stats["rounds"] >= 1


@settings(max_examples=8, deadline=None)
@given(st.lists(_wtext, min_size=2, max_size=8))
def test_simhash_near_dups_match_python_referee(spark, texts):
    """md5-mode SimHash end to end against a pure-Python referee:
    signatures (distinct word shingles -> 48-bit-md5 sign tally -> bit
    string), band blocking (any shared band_bits substring), and the
    Hamming verify must produce EXACTLY the referee's pair set and
    distances."""
    import hashlib
    import re

    from transitlog_hfp_sink_spark.operators.dedup import simhash_near_dups

    bits, band_bits, max_h = 16, 4, 3
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(
            df, "text", "doc_id", bits=bits, band_bits=band_bits,
            max_hamming=max_h, hash_fn="md5",
        ).collect()
    }

    def norm(t: str) -> str:
        t = re.sub(r"[^a-z0-9\s]", " ", t.lower())
        return re.sub(r"\s+", " ", t).strip()

    def sig(t: str) -> str:
        shingles = set(norm(t).split(" "))
        tally = [0] * bits
        for s in shingles:
            h = int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
            for i in range(bits):
                tally[i] += 1 if (h >> i) & 1 else -1
        return "".join("1" if v > 0 else "0" for v in tally)

    sigs = {i: sig(t) for i, t in rows}
    want = {}
    n_bands = bits // band_bits
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = sigs[a], sigs[b]
            shared = any(
                sa[k * band_bits : (k + 1) * band_bits]
                == sb[k * band_bits : (k + 1) * band_bits]
                for k in range(n_bands)
            )
            ham = sum(x != y for x, y in zip(sa, sb))
            if shared and ham <= max_h:
                want[(a, b)] = ham
    assert got == want, texts
