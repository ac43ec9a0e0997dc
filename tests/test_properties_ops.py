"""Property-based tests (hypothesis) for the round-3 operators: each must
agree with a pure-Python referee on arbitrary small inputs — duplicated
spans, count-min estimates, Bloom membership, SemDeDup keep rule."""

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
