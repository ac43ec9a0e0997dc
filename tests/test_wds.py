"""WebDataset-style tar-shard export sink (sinks/wds.py).

Round-trip, byte-determinism, partitioning-invariance, member order,
overwrite semantics — the same contract family as the JSONL exporter
(tests/test_export.py idiom) applied to the bytes+meta path."""

import hashlib
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.multimodal import synth_images
from transitlog_hfp_sink_spark.operators.pack import shard_of
from transitlog_hfp_sink_spark.sinks.wds import (
    read_wds_shards,
    write_wds_shards,
)
from transitlog_hfp_sink_spark.sources.files import read_table

N_SHARDS = 4


def _media(spark, sf_dir, n=60):
    docs = read_table(spark, sf_dir, "documents").limit(n)
    media = synth_images(docs)  # media_id, media_type, content (real BMP/PNG)
    return media.withColumn(
        "ext", F.when(F.col("media_id") % 2 == 1, F.lit("png")).otherwise(F.lit("bmp"))
    ).withColumn("n_bytes", F.length("content").cast("bigint"))


def _file_md5s(path):
    return {
        f: hashlib.md5(open(os.path.join(path, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(path))
        if f.startswith("shard-")
    }


def test_wds_roundtrip_bytes_and_meta(spark, sf_dir, tmp_path):
    media = _media(spark, sf_dir)
    out = str(tmp_path / "wds")
    manifest = write_wds_shards(
        media,
        out,
        N_SHARDS,
        ext_col="ext",
        meta_cols=("media_type", "n_bytes"),
    )
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert sum(s["n_items"] for s in manifest["shards"]) == media.count()

    back = read_wds_shards(spark, out)
    src = {
        r["media_id"]: (bytes(r["content"]), r["ext"], r["n_bytes"])
        for r in media.collect()
    }
    got = back.collect()
    assert len(got) == len(src)
    for r in got:
        data, ext, n_bytes = src[r["key"]]
        assert bytes(r["data"]) == data
        assert r["ext"] == ext
        meta = json.loads(r["meta"])
        assert meta == {"media_type": "image", "n_bytes": n_bytes}
        # content-keyed placement: shard is derivable from the id alone
    placed = {r["key"]: r["shard"] for r in got}
    expect = {
        r["media_id"]: r["s"]
        for r in media.select(
            "media_id", shard_of("media_id", N_SHARDS, "wds").alias("s")
        ).collect()
    }
    assert placed == expect


def test_wds_byte_determinism_and_partitioning_invariance(spark, sf_dir, tmp_path):
    media = _media(spark, sf_dir)
    a, b, c = (str(tmp_path / d) for d in ("a", "b", "c"))
    write_wds_shards(media, a, N_SHARDS, ext_col="ext", meta_cols=("n_bytes",))
    write_wds_shards(media, b, N_SHARDS, ext_col="ext", meta_cols=("n_bytes",))
    # a different input partitioning must not change a single byte
    write_wds_shards(
        media.repartition(7), c, N_SHARDS, ext_col="ext", meta_cols=("n_bytes",)
    )
    assert _file_md5s(a) == _file_md5s(b) == _file_md5s(c)
    assert len(_file_md5s(a)) > 0


def test_wds_member_order_is_md5_permutation(spark, sf_dir, tmp_path):
    media = _media(spark, sf_dir)
    out = str(tmp_path / "wds")
    write_wds_shards(media, out, 1, ext_col="ext")
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tar:
        names = [m.name for m in tar]
    # members come in (data, json) pairs per key, keys in md5-permuted order
    keys = [n.rsplit(".", 1)[0] for n in names[::2]]
    assert names[1::2] == [f"{k}.json" for k in keys]
    perm = sorted(
        keys, key=lambda k: hashlib.md5(f"wds{int(k)}".encode()).hexdigest()
    )
    assert keys == perm


def test_wds_overwrite_clears_stale_shards(spark, sf_dir, tmp_path):
    media = _media(spark, sf_dir)
    out = str(tmp_path / "wds")
    write_wds_shards(media, out, 8, ext_col="ext")
    n8 = len(_file_md5s(out))
    write_wds_shards(media, out, 2, ext_col="ext")
    files = _file_md5s(out)
    assert len(files) <= 2 < n8  # no shard-00007.tar survivor
    with pytest.raises(FileExistsError):
        write_wds_shards(media, out, 2, ext_col="ext", mode="error")


def test_wds_incremental_stability(spark, sf_dir, tmp_path):
    """Content-keyed shards: adding rows rewrites only the shards whose
    membership changed; untouched shards stay byte-identical (the
    re-export-after-upstream-change story from the module docstring)."""
    media = _media(spark, sf_dir, n=60).cache()
    grown = _media(spark, sf_dir, n=61)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_wds_shards(media, a, N_SHARDS, ext_col="ext")
    write_wds_shards(grown, b, N_SHARDS, ext_col="ext")
    new_ids = {r["media_id"] for r in grown.select("media_id").collect()} - {
        r["media_id"] for r in media.select("media_id").collect()
    }
    changed = {
        r["s"]
        for r in grown.filter(F.col("media_id").isin(list(new_ids)))
        .select(shard_of("media_id", N_SHARDS, "wds").alias("s"))
        .collect()
    }
    ma, mb = _file_md5s(a), _file_md5s(b)
    for k in ma:
        shard_no = int(k.split("-")[1].split(".")[0])
        if shard_no in changed:
            assert ma[k] != mb[k]
        else:
            assert ma[k] == mb[k]
    media.unpersist()


def test_wds_contract_errors_and_null_handling(spark, sf_dir, tmp_path):
    """Round-5 review fixes: non-integral ids fail fast, duplicate ids
    fail loudly (adjacent after the in-shard sort, zero extra passes),
    NULL meta serializes as JSON null, NULL ext falls back to default."""
    media = _media(spark, sf_dir, n=10)

    with pytest.raises(TypeError, match="integral"):
        write_wds_shards(
            media.withColumn("sid", F.concat(F.lit("u-"), F.col("media_id"))),
            str(tmp_path / "bad_id"), 2, id_col="sid",
        )

    dup = media.unionByName(media.limit(1))
    with pytest.raises(Exception, match="duplicate id"):
        write_wds_shards(dup, str(tmp_path / "dup"), 2)

    out = str(tmp_path / "nulls")
    nulled = media.withColumn(
        "ext", F.when(F.col("media_id") % 2 == 0, F.lit(None)).otherwise(F.lit("png"))
    ).withColumn(
        "note", F.when(F.col("media_id") % 2 == 0, F.lit(None)).otherwise(F.lit("x"))
    )
    write_wds_shards(nulled, out, 2, ext_col="ext", default_ext="bin",
                     meta_cols=("note",))
    back = read_wds_shards(spark, out).collect()
    assert len(back) == 10
    for r in back:
        meta = json.loads(r["meta"])  # must parse: no bare NaN
        if r["key"] % 2 == 0:
            assert r["ext"] == "bin" and meta["note"] is None
        else:
            assert r["ext"] == "png" and meta["note"] == "x"


def test_wds_prewrite_validation_preserves_previous_export(spark, sf_dir, tmp_path):
    """Round-5 review fixes: NULL ids and collision-prone extensions are
    refused by a pre-write scan BEFORE anything is deleted, and a refused
    (or failed) overwrite leaves the previous export's data shards AND
    markers intact — overwrite only becomes destructive after the new
    write has succeeded (stale shards are removed post-success)."""
    media = _media(spark, sf_dir, n=20)
    out = str(tmp_path / "wds")
    write_wds_shards(media, out, N_SHARDS, meta_cols=("n_bytes",))
    before = _file_md5s(out)
    assert before and os.path.exists(os.path.join(out, "_SUCCESS"))

    # NULL id: refused up front, previous export untouched (incl. markers)
    nulled = media.withColumn(
        "media_id",
        F.when(F.col("media_id") % 7 == 3, F.lit(None)).otherwise(F.col("media_id")),
    )
    with pytest.raises(ValueError, match="non-NULL"):
        write_wds_shards(nulled, out, N_SHARDS, meta_cols=("n_bytes",))
    assert _file_md5s(out) == before
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    # 'json' extension would collide with the meta member's basename and
    # silently drop payloads on read-back; dotted extensions break the
    # rsplit('.', 1) pairing — both refused before writing
    for bad_ext in ("json", "tar.gz"):
        with pytest.raises(ValueError, match="json|match"):
            write_wds_shards(
                media.withColumn("ext", F.lit(bad_ext)),
                out, N_SHARDS, ext_col="ext", meta_cols=("n_bytes",),
            )
    assert _file_md5s(out) == before

    # invalid default_ext is a driver-side config error (no scan, no I/O)
    with pytest.raises(ValueError, match="default_ext"):
        write_wds_shards(media, out, N_SHARDS, default_ext="json")

    # a successful overwrite with FEWER shards removes the stale ones
    # only after the write: the export converges to exactly the new set
    write_wds_shards(media, out, 2, meta_cols=("n_bytes",))
    files = sorted(f for f in os.listdir(out) if f.startswith("shard-"))
    assert files == ["shard-00000.tar", "shard-00001.tar"]
    assert {r["key"] for r in read_wds_shards(spark, out).collect()} == {
        r["media_id"] for r in media.select("media_id").collect()
    }


def test_wds_midjob_failure_keeps_previous_data_shards(spark, sf_dir, tmp_path):
    """Round-6 staged-promote contract (ADVICE r5): a write job that dies
    MID-WRITE (after real shard work has happened) must leave every
    previous data shard byte-identical — tasks only stage hidden files;
    nothing replaces a live shard-K.tar until the driver has seen the
    whole job succeed. The failure is planted in the writer itself (a
    bytes-typed meta column json.dumps cannot serialize), past all
    pre-write validation."""
    media = _media(spark, sf_dir, n=20)
    out = str(tmp_path / "wds")
    write_wds_shards(media, out, N_SHARDS, meta_cols=("n_bytes",))
    before = _file_md5s(out)
    assert before

    poisoned = media.withColumn("bad_meta", F.col("content"))
    with pytest.raises(Exception):
        write_wds_shards(poisoned, out, N_SHARDS, meta_cols=("bad_meta",))
    # data shards byte-intact; only the in-flight markers were dropped
    assert _file_md5s(out) == before
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))

    # the next successful overwrite restores markers and cleans any
    # staged litter the failed job left behind
    write_wds_shards(media, out, N_SHARDS, meta_cols=("n_bytes",))
    assert _file_md5s(out) == before
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in os.listdir(out) if f.startswith(".shard-")]


def _crash_replace_after(monkeypatch, out, n_ok):
    """Monkeypatch os.replace (as the wds module sees it) to crash on the
    (n_ok+1)-th promotion rename under `out`; other paths pass through."""
    import transitlog_hfp_sink_spark.sinks.wds as wds_mod

    real = os.replace
    calls = {"n": 0}

    def fake(src, dst, *a, **kw):
        if str(dst).startswith(out):
            if calls["n"] >= n_ok:
                raise OSError("simulated driver crash during promotion")
            calls["n"] += 1
        return real(src, dst, *a, **kw)

    monkeypatch.setattr(wds_mod.os, "replace", fake)
    return calls


def test_wds_crash_between_staging_and_promotion(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r6 #6, crash point 1: the write job succeeded, every shard
    is staged, and the driver dies BEFORE the first promotion rename.
    The previous export's data shards must be byte-identical, _SUCCESS
    must be absent (consumers gate on it, so they keep reading the old
    complete set or nothing — never a mix), and a retry must fully
    recover and clean the staged litter."""
    media = _media(spark, sf_dir, n=20)
    out = str(tmp_path / "wds")
    write_wds_shards(media, out, N_SHARDS, meta_cols=("n_bytes",))
    before = _file_md5s(out)
    assert before

    media2 = media.withColumn("n_bytes", F.col("n_bytes") + 1)  # new content
    _crash_replace_after(monkeypatch, out, n_ok=0)
    with pytest.raises(OSError, match="simulated driver crash"):
        write_wds_shards(media2, out, N_SHARDS, meta_cols=("n_bytes",))
    # nothing promoted: old data shards byte-intact, export marked
    # in-flight (_SUCCESS/manifest gone), staged files present as litter
    assert _file_md5s(out) == before
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_manifest.json"))
    assert [f for f in os.listdir(out) if f.startswith(".shard-")]

    monkeypatch.undo()
    manifest = write_wds_shards(media2, out, N_SHARDS, meta_cols=("n_bytes",))
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in os.listdir(out) if f.startswith(".shard-")]
    assert _file_md5s(out) != before  # the retry really shipped media2
    assert {s["file"] for s in manifest["shards"]} == set(_file_md5s(out))


def test_wds_crash_mid_promotion_success_gate_holds(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r6 #6, crash point 2: the driver dies MID-promotion (one
    shard renamed, the rest still staged) — the documented non-atomic
    window. The on-disk shard set IS mixed, but _SUCCESS is absent, so a
    gated consumer never reads it; a retry converges to a complete
    consistent export."""
    media = _media(spark, sf_dir, n=20)
    out = str(tmp_path / "wds")
    write_wds_shards(media, out, N_SHARDS, meta_cols=("n_bytes",))
    before = _file_md5s(out)
    assert len(before) > 1  # need >=2 shards for a mixed state to exist

    media2 = media.withColumn("n_bytes", F.col("n_bytes") + 1)
    calls = _crash_replace_after(monkeypatch, out, n_ok=1)
    with pytest.raises(OSError, match="simulated driver crash"):
        write_wds_shards(media2, out, N_SHARDS, meta_cols=("n_bytes",))
    assert calls["n"] == 1  # exactly one rename landed -> mixed set
    after_crash = _file_md5s(out)
    assert after_crash != before  # mixed: one new shard over old set
    # ... but the gate holds: no _SUCCESS, no manifest
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_manifest.json"))

    monkeypatch.undo()
    write_wds_shards(media2, out, N_SHARDS, meta_cols=("n_bytes",))
    final = _file_md5s(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in os.listdir(out) if f.startswith(".shard-")]
    # determinism: the recovered export is byte-identical to what an
    # uncrashed media2 export produces (same content-keyed members)
    ref = str(tmp_path / "wds_ref")
    write_wds_shards(media2, ref, N_SHARDS, meta_cols=("n_bytes",))
    assert final == _file_md5s(ref)


def test_wds_duplicate_ids_refused_before_any_write(spark, sf_dir, tmp_path):
    """Round 6 (ADVICE r5): the duplicate-id check moved into the
    pre-write validation — a dup frame is refused before anything is
    staged or deleted, so a previous export survives untouched."""
    media = _media(spark, sf_dir, n=20)
    out = str(tmp_path / "wds")
    write_wds_shards(media, out, N_SHARDS, meta_cols=("n_bytes",))
    before = _file_md5s(out)

    dup = media.unionByName(media.limit(1))
    with pytest.raises(ValueError, match="duplicate id"):
        write_wds_shards(dup, out, N_SHARDS, meta_cols=("n_bytes",))
    assert _file_md5s(out) == before
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in os.listdir(out) if f.startswith(".shard-")]
