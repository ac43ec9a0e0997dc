"""Multimodal training-data export sink: deterministic WebDataset-style
tar shards.

Image/audio/video trainers consume tar shards whose members group by
basename — ``{key}.jpg`` + ``{key}.json`` side by side — streamed
sequentially (the WebDataset convention popularized for large-scale
multimodal training). The reference (HSLdevcom/transitlog-hfp-sink)
stops at its SQL sink; this extends the repo's training-export family
(sinks/export.py JSONL for text) with the bytes+meta counterpart, same
determinism contract:

- shard assignment is CONTENT-keyed (``pack.shard_of`` — md5 of the
  salted id), stable across runs, partitionings, and engines; a trainer
  resumes per-shard and a re-export after an upstream change rewrites
  only shards whose membership changed;
- one Spark job: hash-repartition on the shard id, sort within each
  partition by the same md5 permutation (deterministic member order),
  then an Arrow-batched ``mapInPandas`` writer emits one tar per shard
  — bytes never hit the driver, no driver-side iteration;
- tar members are byte-reproducible: USTAR format, zeroed
  mtime/uid/gid, fixed 0o644 mode — byte-identical inputs produce
  byte-identical shard files (asserted by tests);
- crash safety (round 6, ADVICE r5): tasks write attempt-unique STAGED
  files (``.shard-K…``, hidden names); nothing replaces a live
  ``shard-K.tar`` until the WHOLE job has succeeded, at which point the
  driver promotes every staged file with atomic ``os.replace`` and only
  then stamps ``_SUCCESS`` + ``_manifest.json``. A mid-job failure
  therefore leaves the previous export's data shards byte-intact (its
  ``_SUCCESS``/manifest are dropped up front to mark the export
  in-flight — consumers gate on ``_SUCCESS``). The only remaining
  non-atomic window is the driver's promotion loop itself (a few
  renames), still signalled by the missing ``_SUCCESS``.

At cluster scale ``path`` must be storage every executor can reach —
a mounted shared filesystem (NFS/FUSE bucket mount), the standard
deployment for tar-shard writers, since tarfile needs a seekable local
file handle; the Spark-side contract (content-keyed shards, one task
per shard, deterministic bytes) is unchanged. Tests drive the sink on
a local path.

Spark can't express "write a tar container" with built-in writers, so
the per-partition Python writer is the documented escape hatch (same
tier as the repo's codec kernels in operators/multimodal.py); the
shuffle/sort that feeds it stays declarative and JVM-side.
"""

from __future__ import annotations

import io
import json
import os
import re
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transitlog_hfp_sink_spark.operators.pack import shard_of

#: key ordering inside a shard is the md5 permutation of the salted id —
#: the same law as the JSONL exporter, so mixed text+media exports of
#: one corpus visit rows in the same order.
_MANIFEST = "_manifest.json"
_SUCCESS = "_SUCCESS"


def _json_scalar(v):
    """Spec-valid JSON for a pandas cell: numpy scalars unbox, and
    NaN/NaT/None become null (json.dumps would otherwise emit bare NaN,
    which strict WebDataset consumers reject)."""
    if v is None:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v.item() if hasattr(v, "item") else v


def _member(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    tar.addfile(info, io.BytesIO(data))


def write_wds_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "media_id",
    content_col: str = "content",
    ext_col: str | None = None,
    default_ext: str = "bin",
    meta_cols: tuple[str, ...] = (),
    salt: str = "wds",
    mode: str = "overwrite",
) -> dict:
    """Write df as WebDataset-style tar shards; return the manifest dict.

    Each row becomes two tar members named by the zero-padded id:
    ``{key:020d}.{ext}`` (the raw ``content_col`` bytes; per-row
    extension from ``ext_col`` when given, e.g. 'png'/'bmp'/'wav') and
    ``{key:020d}.json`` (``meta_cols`` as one JSON object with sorted
    keys). Shard K is ``shard-{K:05d}.tar``; rows land in shard
    ``shard_of(id, n_shards, salt)`` regardless of input partitioning.
    Empty shards write no file (WebDataset readers take a file list).
    ``mode="overwrite"`` stages every new shard under a hidden
    attempt-unique name and PROMOTES them all (atomic per-file
    ``os.replace``) in the driver only after the write job succeeded;
    stale ``shard-*.tar`` (e.g. from a larger prior n_shards) are
    removed after promotion — a failed export leaves the previous one's
    data shards byte-intact (only its ``_SUCCESS``/manifest markers are
    dropped up front to mark the export in-flight); "error" refuses to
    write over an existing export.

    Extensions must be simple tokens (``[0-9A-Za-z_-]+`` and not
    'json'): a dotted or 'json' extension would collide with the meta
    member's basename parse and silently drop payloads on read-back.
    Validated — together with id non-nullness — by one column-pruned
    scan BEFORE anything is deleted or written.
    """
    if mode not in ("overwrite", "error"):
        raise ValueError(f"mode must be 'overwrite' or 'error', got {mode!r}")
    if not re.fullmatch(r"[0-9A-Za-z_-]+", default_ext) or default_ext == "json":
        raise ValueError(
            f"default_ext {default_ext!r} invalid: extensions must match "
            "[0-9A-Za-z_-]+ and not be 'json' (reserved for the meta member)"
        )
    existing = (
        [f for f in os.listdir(path) if f.startswith("shard-") or f.startswith(".shard-")]
        if os.path.isdir(path)
        else []
    )
    if existing and mode == "error":
        raise FileExistsError(f"{path} already holds {len(existing)} shard files")

    meta_cols = tuple(meta_cols)
    # integer-id contract, checked up front: the fixed-width zero-padded
    # member basenames (and read_wds_shards' int() parse) require an
    # integral key — a silent cast would NULL out string/UUID ids and
    # die mid-job with an obscure int(NaN) error instead
    id_type = dict(df.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"id_col {id_col!r} must be an integral column for WDS member "
            f"naming, got {id_type!r}; derive a surrogate (e.g. "
            "xxhash64(id)) or use the JSONL exporter for free-form ids"
        )
    # fail-loudly-before-writing scan (one job, column-pruned to id [+ext],
    # LIMIT 1 short-circuit): a NULL id would crash mid-write as int(NaN)
    # after work was already done; a 'json'/dotted/empty extension would
    # write a data member whose basename parse collides with the meta
    # member and read back as a silent payload drop
    ext_expr = (
        F.coalesce(F.col(ext_col).cast("string"), F.lit(default_ext))
        if ext_col
        else F.lit(default_ext)
    )
    bad_cond = F.col(id_col).isNull()
    if ext_col:
        bad_cond = bad_cond | ~ext_expr.rlike("^[0-9A-Za-z_-]+$") | (
            ext_expr == "json"
        )
    bad = df.where(bad_cond).select(F.col(id_col).alias("id"), ext_expr.alias("ext")).head(1)
    if bad:
        raise ValueError(
            f"WDS export refused before writing: row (id={bad[0]['id']!r}, "
            f"ext={bad[0]['ext']!r}) — ids must be non-NULL and extensions "
            "must match [0-9A-Za-z_-]+ and not be 'json' (reserved for the "
            "meta member)"
        )
    # duplicate ids break byte-determinism (tie order) and silently lose
    # rows on read-back (basename clash) — refused BEFORE any work is
    # staged (round 6, ADVICE r5: previously only caught mid-write). One
    # column-pruned map-side-combine agg; cheap next to writing the tars.
    dup = df.groupBy(F.col(id_col)).count().where(F.col("count") > 1).head(1)
    if dup:
        raise ValueError(
            f"duplicate id {dup[0][0]!r} in WDS export: member basenames "
            "must be unique — dedup the frame first"
        )
    os.makedirs(path, exist_ok=True)
    # input validated — mark the export in-flight: drop success/manifest
    # markers and any orphaned tmp files now, but keep previous DATA
    # shards until the new write has succeeded (each rewritten shard is
    # an atomic replace; stale ones are removed post-success)
    for f in [f for f in existing if f.startswith(".shard-")] + [
        f for f in (_MANIFEST, _SUCCESS) if os.path.exists(os.path.join(path, f))
    ]:
        os.remove(os.path.join(path, f))
    sel = [F.col(id_col).cast("bigint").alias("__key"), F.col(content_col).alias("__data")]
    sel.append(ext_expr.alias("__ext"))
    sel += [F.col(c) for c in meta_cols]
    keyed = (
        df.select(*sel)
        .withColumn("__shard", shard_of("__key", n_shards, salt))
        .withColumn("__ord", F.md5(F.concat(F.lit(salt), F.col("__key").cast("string"))))
    )

    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("file", T.StringType(), False),
            T.StructField("staged", T.StringType(), False),
            T.StructField("n_items", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
        ]
    )

    def write_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive clustered by __shard (sortWithinPartitions leads
        # with it) and ordered by the md5 permutation within each shard;
        # a task may own several shards (hash collision of shard ids
        # into one partition) but every shard is wholly owned by ONE
        # task, so each tar is written exactly once.
        state: dict = {
            "shard": None, "tar": None, "tmp": None, "n": 0, "last_key": None
        }
        done: list[tuple[int, str, str, int, int]] = []

        def close_current() -> None:
            # the completed shard STAYS under its hidden attempt-unique
            # staged name; the driver promotes all staged files together
            # after the whole job succeeds (never a mixed old/new set)
            if state["tar"] is None:
                return
            state["tar"].close()
            final = f"shard-{state['shard']:05d}.tar"
            done.append(
                (
                    state["shard"],
                    final,
                    os.path.basename(state["tmp"]),
                    state["n"],
                    os.path.getsize(state["tmp"]),
                )
            )
            state.update(shard=None, tar=None, tmp=None, n=0)

        for pdf in it:
            # itertuples mangles __-prefixed names; walk plain columns
            metas = [pdf[c] for c in meta_cols]
            for i, (shard, k, data, ext) in enumerate(
                zip(pdf["__shard"], pdf["__key"], pdf["__data"], pdf["__ext"])
            ):
                shard = int(shard)
                if shard != state["shard"]:
                    close_current()
                    # attempt-unique staged name: a speculative/retried
                    # task attempt writing the same shard must not share
                    # a file with its twin; only the WINNING attempt's
                    # report row gets promoted by the driver
                    from pyspark import TaskContext

                    tc = TaskContext.get()
                    attempt = tc.taskAttemptId() if tc is not None else 0
                    tmp = os.path.join(
                        path, f".shard-{shard:05d}.tar.tmp-{attempt}"
                    )
                    state.update(
                        shard=shard,
                        tmp=tmp,
                        tar=tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT),
                        n=0,
                        last_key=None,
                    )
                key = int(k)
                # defense-in-depth invariant (the pre-write agg already
                # refused dup ids): rows are sorted by (__shard, __ord,
                # __key), so a duplicate is ALWAYS adjacent — zero-cost
                if key == state["last_key"]:
                    raise ValueError(
                        f"duplicate id {key} in WDS export: member "
                        "basenames must be unique — dedup the frame first"
                    )
                state["last_key"] = key
                key = f"{key:020d}"
                _member(
                    state["tar"],
                    f"{key}.{ext}",
                    bytes(data) if data is not None else b"",
                )
                meta = {c: col.iloc[i] for c, col in zip(meta_cols, metas)}
                meta_b = json.dumps(
                    {
                        k2: _json_scalar(v)
                        for k2, v in meta.items()
                    },
                    sort_keys=True,
                ).encode()
                _member(state["tar"], f"{key}.json", meta_b)
                state["n"] += 1
        close_current()
        yield pd.DataFrame(
            done, columns=["shard", "file", "staged", "n_items", "n_bytes"]
        )

    report = (
        keyed.repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__ord", "__key")
        .mapInPandas(write_partition, schema=out_schema)
        .collect()  # bounded: one row per non-empty shard (<= n_shards)
    )
    # the whole job succeeded: PROMOTE every staged shard (atomic per-file
    # rename; report rows come only from winning task attempts, so a
    # speculative loser's staged file is never promoted), then remove
    # stale data shards from a previous export (e.g. a larger prior
    # n_shards) and any leftover staged/tmp files
    for r in report:
        os.replace(os.path.join(path, r["staged"]), os.path.join(path, r["file"]))
    written = {r["file"] for r in report}
    for f in os.listdir(path):
        stale_data = f.startswith("shard-") and f.endswith(".tar") and f not in written
        if stale_data or f.startswith(".shard-"):
            os.remove(os.path.join(path, f))
    manifest = {
        "n_shards": n_shards,
        "salt": salt,
        "shards": sorted(
            (
                {
                    "shard": r["shard"],
                    "file": r["file"],
                    "n_items": r["n_items"],
                    "n_bytes": r["n_bytes"],
                }
                for r in report
            ),
            key=lambda d: d["shard"],
        ),
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    with open(os.path.join(path, _SUCCESS), "w") as f:
        f.write("")
    return manifest


def read_wds_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read an exported shard set back as (shard, key, ext, data, meta).

    binaryFile loads each tar whole (shards are sized for streaming —
    the usual 100 MB–1 GB — so one tar per task is the intended grain),
    and an Arrow-batched parser splits members back into rows; basename
    grouping reassembles each sample's data + json meta pair.
    """
    files = spark.read.format("binaryFile").load(os.path.join(path, "shard-*.tar"))

    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("key", T.LongType(), False),
            T.StructField("ext", T.StringType(), False),
            T.StructField("data", T.BinaryType(), True),
            T.StructField("meta", T.StringType(), True),
        ]
    )

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                shard = int(os.path.basename(fpath).split("-")[1].split(".")[0])
                samples: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar:
                        base, ext = m.name.rsplit(".", 1)
                        slot = samples.setdefault(base, {})
                        payload = tar.extractfile(m).read()
                        if ext == "json":
                            slot["meta"] = payload.decode()
                        else:
                            slot["ext"], slot["data"] = ext, payload
                for base, slot in samples.items():
                    rows.append(
                        (shard, int(base), slot.get("ext", ""), slot.get("data"), slot.get("meta"))
                    )
            yield pd.DataFrame(rows, columns=["shard", "key", "ext", "data", "meta"])

    return files.mapInPandas(parse, schema=out_schema)
