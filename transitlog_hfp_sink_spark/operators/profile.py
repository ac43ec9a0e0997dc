"""Corpus profiling: the per-source "data card" a curation run reports.

One hash-aggregation over the documents table yields, per group (source,
domain, language — any grouping), the counts a 100 TB pipeline tracks
run-over-run: document and token totals, token-length percentiles,
exact-duplicate rate, quality-gate pass rates. This is the observability
companion of the curation pipeline (queries/ml.py:q_curation_pipeline):
the gates decide per document, the profile says what the corpus looked
like before/after.

Plan shape: one map-side projection (token counts, fingerprints, gate
verdicts), then the group-by. In EXACT mode the distinct count costs a
second corpus-sized exchange: Spark plans count_distinct as an expand +
partial aggregate shuffled on (group, fingerprint), then a second
exchange on the group key — two shuffles total (visible in the
PLANS.md snapshot), and at 100 TB that first wide exchange dominates.
`exact_distinct=False` swaps in approx_count_distinct (HLL++, mergeable,
fixed memory), collapsing the plan to the single group-key exchange —
the production mode; exact is the default so tests, referees, and the
driver oracle stay deterministic.

Percentiles use Spark's exact `percentile` (full sort within group in
the agg buffer) by default; at 100 TB pass `approx_percentiles=True`
for the t-digest-style `percentile_approx` with bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.dedup import normalize_text
from transitlog_hfp_sink_spark.operators.textanalysis import (
    STOPWORDS,
    _quality_from_parts,
    punct_ratio,
    whitespace_token_count,
)


def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source",),
    exact_distinct: bool = True,
    approx_percentiles: bool = False,
) -> DataFrame:
    """Per-group corpus statistics:

    n_docs, n_tokens, p50_tokens / p90_tokens (token-length distribution),
    dup_doc_rate (1 - distinct normalized fingerprints / docs),
    mean_quality and quality_pass_rate (quality_score >= 0.5),
    empty_doc_rate.
    """
    c = F.col(text_col)
    # STAGED projection (round 11, guide §1.2/§4.2 analogue in pure
    # expressions): the flat quality_score(c) + md5(normalize_text(c))
    # select re-derives the regex-normalize chain ~7x and the word split
    # ~6x per row, because higher-order-function lambdas carry unique
    # variable ids that defeat codegen common-subexpression elimination
    # (the exact trap textanalysis.analyze_documents documents, measured
    # ~4x there). Materializing norm -> words -> wordlen/stopword as
    # aliased columns makes each expensive derivation run ONCE per row;
    # CollapseProject keeps the stages because every alias is non-cheap
    # and multiply referenced. Same math from the same staged pieces —
    # _quality_from_parts is the single shared rule set — so every
    # output value is bit-identical to the flat form.
    # round 11: words via the staged raw-split -> fixup fast tokenizer,
    # the normalized string reconstructed as concat_ws(" ", words) —
    # both value-identical to the regex chain (see dedup.raw_words)
    from transitlog_hfp_sink_spark.operators.dedup import fixup_words, raw_words

    s1 = df.select(
        *[F.col(g) for g in group_cols],
        c.alias(text_col),
        raw_words(c).alias("__w0"),
    )
    s2 = s1.select(
        *[F.col(g) for g in group_cols],
        F.col(text_col),
        fixup_words(F.col("__w0")).alias("__words"),
        whitespace_token_count(c).cast("bigint").alias("__nt"),
    ).withColumn(
        "__norm",
        F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            F.concat_ws(" ", F.col("__words"))
        ),
    )
    words = F.col("__words")
    n_words = F.size(words)
    wl = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / n_words
    sw = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))) / n_words
    staged = s2.select(
        *[F.col(g) for g in group_cols],
        F.col("__nt"),
        F.md5(F.col("__norm")).alias("__fp"),
        _quality_from_parts(F.col("__nt"), wl, sw, punct_ratio(c)).alias("__q"),
    )
    n_distinct = (
        F.count_distinct(F.col("__fp"))
        if exact_distinct
        else F.approx_count_distinct(F.col("__fp"))
    )
    pctl = (
        (lambda p: F.percentile_approx("__nt", p))
        if approx_percentiles
        else (lambda p: F.percentile("__nt", p))
    )
    n = F.count(F.lit(1))
    return (
        staged.groupBy(*group_cols)
        .agg(
            n.alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
            F.round(pctl(0.5).cast("double"), 4).alias("p50_tokens"),
            F.round(pctl(0.9).cast("double"), 4).alias("p90_tokens"),
            F.round(1.0 - n_distinct / n, 6).alias("dup_doc_rate"),
            # decimal-exact sum before the divide (the repo's cross-engine
            # float idiom): quality is a 4-dp value, so the mean is
            # bit-identical in Spark and DuckDB
            F.round(
                (F.sum(F.col("__q").cast("decimal(20,4)")) / n).cast("double"), 4
            ).alias("mean_quality"),
            F.round(
                F.sum(F.when(F.col("__q") >= 0.5, 1).otherwise(0)) / n, 6
            ).alias("quality_pass_rate"),
            F.round(
                F.sum(F.when(F.col("__nt") == 0, 1).otherwise(0)) / n, 6
            ).alias("empty_doc_rate"),
        )
    )
