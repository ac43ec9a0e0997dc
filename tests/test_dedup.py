"""Dedup family: planted near-duplicates must be found.

The sketches (MinHash, SimHash) have no SQL oracle — their contract is
recall/precision against the exact-Jaccard ground truth, asserted here on
a corpus with PLANTED near-dups (the driver testdata has none by
construction at unigram discrimination levels).
"""

import random

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators import dedup as dd

VOCAB = [f"w{i}" for i in range(2000)]


def _make_corpus(spark, n_docs=200, seed=3):
    """Docs of ~80 random words; every 10th doc is a near-copy of the
    previous one with ~5% word edits (true near-dups), plus 3 exact dups."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        if i % 10 == 9 and rows:
            words = rows[-1][1].split(" ")
            for _ in range(4):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            text = " ".join(words)
        else:
            text = " ".join(rng.choice(VOCAB) for _ in range(80))
        rows.append((i, text))
    rows.append((n_docs, rows[0][1]))  # exact dups
    rows.append((n_docs + 1, rows[5][1]))
    rows.append((n_docs + 2, rows[0][1].upper()))  # differs only by case
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _make_corpus(spark).cache()


@pytest.fixture(scope="module")
def ground_truth(corpus):
    """Exact trigram-Jaccard >= 0.5 over ALL pairs (no blocking)."""
    pairs = dd.ngram_jaccard_pairs(
        corpus, "text", "doc_id", block_cols=None, shingle_n=3, threshold=0.5
    )
    return {(r["id_a"], r["id_b"]) for r in pairs.collect()}


def test_ground_truth_contains_planted(ground_truth):
    # planted: (8,9), (18,19)... and the exact dups (0,200),(5,201),(0,202)
    assert (8, 9) in ground_truth
    assert (0, 200) in ground_truth
    assert (0, 202) in ground_truth  # case-insensitive via normalization
    assert len(ground_truth) >= 20


def test_exact_dedup_groups(corpus):
    out = dd.exact_dedup(corpus, "text", "doc_id")
    groups = {r["keep_id"]: r["n_copies"] for r in out.collect()}
    assert groups[0] == 3  # doc 0 + verbatim copy + upper-cased copy
    assert groups[5] == 2
    assert out.agg(F.sum("n_copies")).first()[0] == corpus.count()


def test_minhash_recall_and_precision(corpus, ground_truth):
    got = dd.minhash_lsh_pairs(
        corpus, "text", "doc_id", num_perm=64, bands=16, shingle_n=3, threshold=0.5
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # verification step guarantees precision = 1.0 vs ground truth
    assert got_pairs <= ground_truth
    # banded LSH at 16x4 has >0.99 expected recall at J>=0.5
    recall = len(got_pairs & ground_truth) / len(ground_truth)
    assert recall >= 0.9, f"recall={recall}"


def test_minhash_md5_mode_recall(corpus, ground_truth):
    """The portable md5 hash mode (the registry/oracle mode since round 3)
    must keep the sketch's recall contract, not just match its SQL twin —
    hash choice changes which candidates collide, never the verify step."""
    got = dd.minhash_lsh_pairs(
        corpus, "text", "doc_id", num_perm=64, bands=16, shingle_n=3,
        threshold=0.5, hash_fn="md5",
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert got_pairs <= ground_truth  # exact-Jaccard verify: precision 1.0
    recall = len(got_pairs & ground_truth) / len(ground_truth)
    assert recall >= 0.9, f"recall={recall}"


def test_minhash_jaccard_estimates_match_exact(corpus):
    """Signature agreement rate approximates true Jaccard (property of
    MinHash); check planted near-dup pairs are estimated high."""
    sig = dd.minhash_signatures(corpus, "text", "doc_id", num_perm=64, shingle_n=3)
    cols = [c for c in sig.columns if c.startswith("m_")]
    a = sig.where(F.col("id") == 8).first()
    b = sig.where(F.col("id") == 9).first()
    agree = sum(1 for c in cols if a[c] == b[c]) / len(cols)
    assert agree >= 0.5


def test_simhash_pigeonhole_guarantee(corpus):
    """The banding contract: when n_bands > max_hamming, EVERY pair within
    the hamming radius shares at least one clean band (pigeonhole), so the
    operator's output equals the brute-force hamming ground truth."""
    sigs = {
        r["id"]: r["sh"]
        for r in dd.simhash_signatures(corpus, "text", "doc_id", 64, 3).collect()
    }
    max_h = 12
    truth = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and sum(1 for x, y in zip(sigs[a], sigs[b]) if x != y) <= max_h
    }
    # 16 bands x 4 bits -> guaranteed complete for hamming <= 15
    got = dd.simhash_near_dups(
        corpus, "text", "doc_id", band_bits=4, max_hamming=max_h, shingle_n=3
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert got_pairs == truth
    assert (0, 200) in got_pairs  # exact dup -> hamming 0
    assert (8, 9) in got_pairs  # planted near-dup (hamming 8)


def test_sketches_are_codegen_only(corpus):
    from transitlog_hfp_sink_spark.plans.inspect import has_python_eval

    assert not has_python_eval(
        dd.minhash_lsh_pairs(corpus, "text", "doc_id", shingle_n=3, threshold=0.5)
    )
    assert not has_python_eval(dd.simhash_near_dups(corpus, "text", "doc_id"))


def test_winnow_fingerprints_identity_and_planted(spark, corpus):
    """Winnowing: identical docs -> identical fingerprint sets; planted
    near-dups share many fingerprints; unrelated docs share few."""
    from transitlog_hfp_sink_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_near_dups,
    )

    fp = winnow_fingerprints(corpus, "text", "doc_id", k=8, window=4).cache()
    sets = {}
    for r in fp.collect():
        sets.setdefault(r["id"], set()).add(r["fingerprint"])
    assert sets[0] == sets[200]  # exact dup (case differs -> normalized)
    # planted near-dup (4 word edits of ~80): high containment
    inter = len(sets[8] & sets[9]) / min(len(sets[8]), len(sets[9]))
    assert inter >= 0.5, inter
    # unrelated random docs: low containment
    inter_far = len(sets[1] & sets[2]) / min(len(sets[1]), len(sets[2]))
    assert inter_far < 0.3, inter_far

    pairs = winnow_near_dups(corpus, "text", "doc_id", min_shared=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 200) in got
    assert (8, 9) in got


def test_incremental_matches_full_restriction(corpus):
    """incremental_minhash_pairs over a persisted index == the full-corpus
    run restricted to pairs touching the new batch (same params/seed)."""
    full = dd.minhash_lsh_pairs(
        corpus, "text", "doc_id", num_perm=64, bands=16, shingle_n=3, threshold=0.5
    )
    full_pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in full.collect()}
    old = corpus.where(F.col("doc_id") % 2 != 0)
    new = corpus.where(F.col("doc_id") % 2 == 0)
    bands_df, sh_df = dd.build_minhash_index(
        old, "text", "doc_id", num_perm=64, bands=16, shingle_n=3
    )
    got = dd.incremental_minhash_pairs(
        new, bands_df, sh_df, "text", "doc_id",
        num_perm=64, bands=16, shingle_n=3, threshold=0.5,
    )
    got_pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got.collect()}
    want = {k: v for k, v in full_pairs.items() if k[0] % 2 == 0 or k[1] % 2 == 0}
    assert got_pairs == want
    # and the planted cross-split near-dups survive incrementality
    assert any(k in got_pairs for k in ((8, 9), (18, 19), (0, 200), (0, 202)))


def test_incremental_without_batch_self_pairs(corpus):
    old = corpus.where(F.col("doc_id") % 2 != 0)
    new = corpus.where(F.col("doc_id") % 2 == 0)
    bands_df, sh_df = dd.build_minhash_index(
        old, "text", "doc_id", num_perm=64, bands=16, shingle_n=3
    )
    got = dd.incremental_minhash_pairs(
        new, bands_df, sh_df, "text", "doc_id",
        num_perm=64, bands=16, shingle_n=3, threshold=0.5, within_batch=False,
    )
    for r in got.collect():
        # every pair crosses the split: exactly one end is in the batch
        assert (r["id_a"] % 2 == 0) != (r["id_b"] % 2 == 0), (r["id_a"], r["id_b"])


def test_jaccard_prune_modes_preserve_exactness(spark, corpus):
    """Round 8 (VERDICT r7 #1): prune='length' and prune='prefix' are
    candidate prunes only — the emitted pair set AND the verified jaccard
    values must equal the unpruned referee exactly, on a corpus with
    planted near-dups, exact dups, and (via the varied-length frame
    below) docs the length filter genuinely separates."""
    import random as _random

    # varied-length frame: lengths 0..160 words, so |A|/|B| ratios span
    # the prune boundary; shared vocabulary keeps overlaps non-trivial
    rng = _random.Random(17)
    rows = [
        (i, " ".join(rng.choice(VOCAB[:60]) for _ in range(rng.choice(
            [0, 1, 5, 12, 40, 160]))), f"s{i % 3}")
        for i in range(90)
    ]
    varied = spark.createDataFrame(rows, "doc_id long, text string, source string")

    for df, blocks, n, t in (
        (corpus, None, 3, 0.5),
        (varied, ["source"], 1, 0.5),
        (varied, None, 1, 0.34),  # non-round threshold
    ):
        ref = sorted(
            tuple(r)
            for r in dd.ngram_jaccard_pairs(
                df, "text", "doc_id", block_cols=blocks, shingle_n=n, threshold=t
            ).collect()
        )
        for mode in ("length", "prefix"):
            got = sorted(
                tuple(r)
                for r in dd.ngram_jaccard_pairs(
                    df, "text", "doc_id", block_cols=blocks, shingle_n=n,
                    threshold=t, prune=mode,
                ).collect()
            )
            assert got == ref, (mode, blocks, t)
        # round 9: the co-occurrence-count verify is output-identical in
        # every prune mode (VERDICT r8 #3)
        for mode in (None, "length", "prefix"):
            got = sorted(
                tuple(r)
                for r in dd.ngram_jaccard_pairs(
                    df, "text", "doc_id", block_cols=blocks, shingle_n=n,
                    threshold=t, prune=mode, verify="counts",
                ).collect()
            )
            assert got == ref, ("counts", mode, blocks, t)


def test_jaccard_prune_requires_positive_threshold(corpus):
    for mode in ("length", "prefix"):
        with pytest.raises(ValueError, match="prune requires threshold > 0"):
            dd.ngram_jaccard_pairs(corpus, threshold=0.0, prune=mode)
    with pytest.raises(ValueError, match="expected None"):
        dd.ngram_jaccard_pairs(corpus, threshold=0.5, prune="bands")
    with pytest.raises(ValueError, match="verify='counts' requires"):
        dd.ngram_jaccard_pairs(corpus, threshold=0.0, verify="counts")
    with pytest.raises(ValueError, match="expected 'arrays', 'counts' or"):
        dd.ngram_jaccard_pairs(corpus, threshold=0.5, verify="sketch")


def test_jaccard_threshold_above_one_rejected_all_modes(corpus):
    """Jaccard is bounded by 1. Beyond it the unpruned path would return
    empty but the prefix prune's p_len = |A| - ceil(t*|A|) + 1 goes
    negative and F.slice throws an opaque error mid-job (round-8 review)
    — all modes must fail loud at entry instead."""
    for mode in (None, "length", "prefix"):
        with pytest.raises(ValueError, match="Jaccard similarity is <= 1"):
            dd.ngram_jaccard_pairs(corpus, threshold=1.2, prune=mode)


def test_lsh_counts_verify_output_identical(corpus):
    """Round 10 (VERDICT r9 #4): the co-occurrence-count verify for LSH
    candidates (_verify_jaccard_pairs_counts) must emit EXACTLY the array
    verify's pair set and round-to-6 jaccard values — the law is
    inter/(sza+szb-inter) over int-identical set sizes, the same argument
    that pins the exact referee's counts mode. Checked on the full path
    AND the incremental path (where the stored shingle table is the
    index side the counts mode is designed to never ship in full)."""
    ref = sorted(
        tuple(r)
        for r in dd.minhash_lsh_pairs(
            corpus, "text", "doc_id", num_perm=64, bands=16, shingle_n=3,
            threshold=0.5,
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in dd.minhash_lsh_pairs(
            corpus, "text", "doc_id", num_perm=64, bands=16, shingle_n=3,
            threshold=0.5, verify="counts",
        ).collect()
    )
    assert got == ref and got

    old = corpus.where(F.col("doc_id") % 2 != 0)
    new = corpus.where(F.col("doc_id") % 2 == 0)
    bands_df, sh_df = dd.build_minhash_index(
        old, "text", "doc_id", num_perm=64, bands=16, shingle_n=3
    )
    incr_ref = sorted(
        tuple(r)
        for r in dd.incremental_minhash_pairs(
            new, bands_df, sh_df, "text", "doc_id",
            num_perm=64, bands=16, shingle_n=3, threshold=0.5,
        ).collect()
    )
    incr_got = sorted(
        tuple(r)
        for r in dd.incremental_minhash_pairs(
            new, bands_df, sh_df, "text", "doc_id",
            num_perm=64, bands=16, shingle_n=3, threshold=0.5,
            verify="counts",
        ).collect()
    )
    assert incr_got == incr_ref and incr_got


def test_lsh_counts_verify_guards(corpus):
    import pytest

    with pytest.raises(ValueError, match="verify='counts' requires"):
        dd.minhash_lsh_pairs(corpus, threshold=0.0, verify="counts")
    with pytest.raises(ValueError, match="expected 'arrays' or 'counts'"):
        dd.minhash_lsh_pairs(corpus, threshold=0.5, verify="auto")


def test_jaccard_auto_verify_decision_pinned(spark, corpus):
    """Round 10 (VERDICT r9 #5): verify='auto' resolves to counts
    whenever it is output-preserving (threshold > 0) and to arrays at
    t=0 — pinned on BOTH regime corpora by a plan observable: the array
    verify's intersect/union expressions appear in the plan iff auto
    picked arrays (the counts plan never touches a shingle array after
    the explode). Output equality across all three modes is the
    equivalence grid's job; this pins the DECISION."""
    rows = []
    for i in range(40):  # near-dup-dense miniature: 4 copies per template
        rows.append((i, f"alpha beta gamma delta epsilon t{i // 4}", "s0"))
    dense = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def plan_of(df, **kw):
        got = dd.ngram_jaccard_pairs(df, "text", "doc_id", **kw)
        return got._jdf.queryExecution().optimizedPlan().toString()

    for docs, blocks in ((dense, ["source"]), (corpus, None)):
        auto_plan = plan_of(docs, block_cols=blocks, threshold=0.5)
        assert "array_intersect" not in auto_plan  # counts chosen
        zero_plan = plan_of(docs, block_cols=blocks, threshold=0.0)
        assert "array_intersect" in zero_plan  # arrays: the only valid mode


def test_incremental_auto_verify_decision_pinned():
    """Round 11 (VERDICT r10 #2): the cost-based verify decision for
    incremental_minhash_pairs, pinned at BOTH measured regimes
    (SCALING.md lshincr11 / round-10 bench):
    - the round-10 bench-regression point (4k index, 1k dense batch,
      ratio 4 — counts lost 3.84x normalized) must pick arrays;
    - the lshincr10/11 large-index point (500k index, 5k batch, ratio
      100 — counts won wall and 1.7x shuffle, gap linear in index size)
      must pick counts;
    - t=0 is arrays unconditionally (counts not output-preserving)."""
    auto = dd._auto_incremental_verify
    assert auto(0.5, 4_000, 1_000) == "arrays"
    assert auto(0.7, 500_000, 5_000) == "counts"
    assert auto(0.0, 500_000, 5_000) == "arrays"  # t=0: only valid mode
    # the calibrated boundary itself (AUTO_INCR_VERIFY_RATIO = 50)
    assert auto(0.5, 50 * 1_000, 1_000) == "counts"
    assert auto(0.5, 50 * 1_000 - 1, 1_000) == "arrays"
    # empty batch must not divide by zero; a non-empty index vs nothing
    # to verify is the counts regime trivially
    assert auto(0.5, 1_000, 0) == "counts"


def test_incremental_auto_verify_end_to_end(corpus):
    """verify='auto' (the round-11 default) is output-identical to both
    explicit modes, and the index_rows/batch_rows HINTS steer the
    decision without count jobs — pinned by the same plan observable as
    the jaccard auto test (the array verify's shingle-array expressions
    appear iff arrays was picked)."""
    old = corpus.where(F.col("doc_id") % 2 != 0)
    new = corpus.where(F.col("doc_id") % 2 == 0)
    bands_df, sh_df = dd.build_minhash_index(
        old, "text", "doc_id", num_perm=64, bands=16, shingle_n=3
    )

    def run(**kw):
        return dd.incremental_minhash_pairs(
            new, bands_df, sh_df, "text", "doc_id",
            num_perm=64, bands=16, shingle_n=3, threshold=0.5, **kw
        )

    ref = {tuple(r) for r in run(verify="arrays").collect()}
    assert ref  # planted cross-split near-dups exist
    # hinted-counts regime (index >> batch): identical output, counts plan
    counts_df = run(verify="auto", index_rows=10_000_000, batch_rows=10)
    plan = counts_df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" not in plan
    assert {tuple(r) for r in counts_df.collect()} == ref
    # hinted-arrays regime (comparable sizes): identical output, arrays plan
    arrays_df = run(verify="auto", index_rows=1_000, batch_rows=1_000)
    plan = arrays_df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" in plan
    assert {tuple(r) for r in arrays_df.collect()} == ref
    # unhinted auto on this half/half split (ratio ~1): arrays, same output
    assert {tuple(r) for r in run(verify="auto").collect()} == ref
