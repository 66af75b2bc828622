"""Streaming ANN index maintenance: an IVF (inverted-file) cell index
over a growing embedding corpus, maintained by a pipe.

The batch twin is `queries/llm.py::x_ann_ivf`: vectors are assigned to
their nearest coarse centroid by a literal-centroid argmax evaluated in
the scan (zero exchanges), and search probes only the closest cells —
ANN reduced to an equi-join. Here the assignment runs per micro-batch
as embeddings arrive, appending to a batch-versioned parquet index
(same replay-safe layout as the dedup pipes: batch N owns `batch=N`
with overwrite), and `search_ivf_index` answers top-k queries against
everything indexed so far.

Scale shape: indexing is a stateless per-row map (the expensive
argmax literals are compiled once per micro-batch plan); the index is
partitioned parquet a cluster deployment would back with a real table,
compacted via `compact_state`. Search broadcasts the (small) query set
against only the probed cells' rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.similarity import dot
from .state import (
    compact_state,
    recover_compaction,
    reject_partitioned_source,
    reject_stale_state,
    state_dirs,
)

_CENTROIDS_FILE = "_centroids.json"


def load_index_centroids(state_dir: str) -> list[list[float]] | None:
    """The index's CURRENT coarse centroids, as persisted alongside the
    state dirs (`_centroids.json`). The file is what keeps search and
    retrained assignment in agreement: cell ids in the index are only
    meaningful under the centroids that produced them."""
    import json

    try:
        with open(os.path.join(state_dir, _CENTROIDS_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _save_centroids(state_dir: str, cents: list[list[float]]) -> None:
    import json

    tmp = os.path.join(state_dir, _CENTROIDS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(cents, f)
    os.replace(tmp, os.path.join(state_dir, _CENTROIDS_FILE))


def _sweep_retrain(state_dir: str) -> None:
    """Heal a retrain torn by a crash. The swap order in `retrain` is
    write `d.retrain.tmp` -> rename `d` aside to `d.retrain.old` ->
    rename tmp into place -> delete old, so every crash window leaves a
    recoverable state:

    - tmp + live `d`: the swap never started (or finished and only the
      old copy was reaped late) — drop the leftovers.
    - tmp, no `d`: tmp is COMPLETE (it was fully written before `d`
      moved aside) — promote it, then drop the old copy.
    - old only, no `d`: the promote itself tore (rename is atomic, so
      this means tmp was already reaped by a later sweep) — restore the
      pre-retrain copy; no vectors are lost, they just carry the prior
      centroids until the next retrain.
    """
    import shutil

    for entry in sorted(os.listdir(state_dir)):
        if not entry.endswith(".retrain.tmp"):
            continue
        tmp = os.path.join(state_dir, entry)
        d = tmp[: -len(".retrain.tmp")]
        if os.path.exists(d):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            os.rename(tmp, d)
    for entry in sorted(os.listdir(state_dir)):
        if not entry.endswith(".retrain.old"):
            continue
        old = os.path.join(state_dir, entry)
        d = old[: -len(".retrain.old")]
        if os.path.exists(d):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, d)


def _reencode_dirs(spark, dirs, encode_fn) -> None:
    """THE authoritative rename-aside swap (single copy — all three
    pipes' retrains ride it, so the ordering `_sweep_retrain`'s
    crash-healing contract depends on lives in one place): write
    `d.retrain.tmp` complete → rename `d` aside → promote tmp → delete
    old last. `encode_fn(spark, d)` returns the re-encoded frame for
    dir `d` (and must PRESERVE the `__batch` lineage column when
    present — latest-wins dedup depends on it)."""
    import shutil

    for d in dirs:
        tmp = d + ".retrain.tmp"
        old = d + ".retrain.old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        encode_fn(spark, d).write.mode("overwrite").parquet(tmp)
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old)


def _read_dirs(spark, dirs) -> DataFrame:
    """State-dir read with schema merge: a resumed pre-__batch index
    mixes legacy and stamped files, and without mergeSchema the picked
    footer could hide the stamp (breaking latest-wins) — merged, the
    legacy rows read as null __batch and sort OLDEST (nulls-last under
    the desc dedup order), which is exactly their semantics."""
    if isinstance(dirs, str):
        dirs = [dirs]
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def _retrain_src(spark, d: str) -> DataFrame:
    """A state dir's rows ready for re-encoding: (vec_id, e) plus the
    `__batch` lineage column when the dir carries it."""
    df = _read_dirs(spark, d)
    cols = ["vec_id", "e"] + (["__batch"] if "__batch" in df.columns else [])
    return df.select(*cols)


def _keep_of(df: DataFrame, with_e: bool = True) -> tuple[str, ...]:
    """Columns a re-encode must pass through: the `__batch` lineage
    stamp when present, plus `e` unless the encoder already emits it
    (ivf_assign always selects e itself — with_e=False there)."""
    keep = ("e",) if with_e else ()
    return keep + (("__batch",) if "__batch" in df.columns else ())


def _latest_rows(df: DataFrame) -> DataFrame:
    """Latest-wins per vec_id: a producer that re-sends an id in a
    later micro-batch UPDATES it — without this, both rows would score
    in search and occupy two result ranks. Keyed by the `__batch`
    column the pipes stamp at index time (compaction preserves it);
    rows within ONE batch are unique per id by producer contract, but a
    violation must not dedup NONDETERMINISTICALLY — a stable payload
    hash breaks the tie, so repeated reads of the same state always
    keep the same row. Legacy dirs without the column pass through
    unchanged."""
    if "__batch" not in df.columns:
        return df
    payload = [c for c in df.columns if c not in ("vec_id", "__batch")]
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__batch").desc(), F.xxhash64(*payload).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__batch")
    )


def _read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    dirs = state_dirs(state_dir)
    if not dirs:
        raise ValueError(f"no index under {state_dir}")
    return _latest_rows(_read_dirs(spark, dirs))


def _probe_cells(q: DataFrame, cent: DataFrame, probes: int) -> DataFrame:
    """(query_id, qe) × broadcast centroid table → the query's `probes`
    nearest cells as (query_id, qe, cell); tie discipline ROUND(cs,9)
    DESC, centroid_id ASC — shared by both search paths."""
    w_probe = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cs"), 9).desc(), F.col("centroid_id")
    )
    return (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qe",
            "centroid_id",
            (
                dot(F.col("qe"), F.col("ce"))
                / F.sqrt(dot(F.col("ce"), F.col("ce")))
            ).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= probes)
        .select("query_id", "qe", F.col("centroid_id").alias("cell"))
    )


def ivf_index_pipe(
    source,
    state_dir: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    name: str = "ivf-index",
    compact_every: int | None = None,
    retrain_on_compact: bool = False,
    retrain_seed: int = 42,
):
    """Maintain the IVF index over a stream of embeddings: each
    micro-batch assigns `vec_col` to its nearest centroid (in-scan
    argmax, same plan as the batch x_ann_ivf) and appends
    (id, e, cell) rows to the index. Returns the PipeHandle.

    `compact_every=K` folds the per-batch index dirs every K batches
    (committed-batch watermark: dirs below the current batch id are
    committed, so the merge can't swallow a replayable batch's rows).
    With `retrain_on_compact`, each compaction also RETRAINS the coarse
    centroids on everything indexed so far (distributed MLlib k-means,
    functions/similarity.py::train_ivf_centroids) and rewrites the
    merged dir's cell assignments under them — the answer to
    distribution drift: initial centroids only ever saw the corpus
    prefix. The live centroids persist in `_centroids.json` (restart
    picks them up; `search_ivf_index` reads them by default), because
    cell ids are only meaningful under the centroids that produced
    them. The per-dir swap renames the live dir aside before promoting
    the rewritten copy (never delete-then-rename), and `_sweep_retrain`
    repairs any crash-torn window on pipe startup — no dir's vectors
    are ever lost. The json update itself is os.replace-atomic; back
    the state with a transactional table at cluster scale."""
    from ..queries.llm import ivf_assign
    from ..topics.pipe import pipe
    from ..util import materialize

    reject_partitioned_source(source, "ivf_index_pipe")
    os.makedirs(state_dir, exist_ok=True)
    recover_compaction(state_dir)  # crash-interrupted swap, if any
    _sweep_retrain(state_dir)  # heal any crash-torn retrain swap
    saved = load_index_centroids(state_dir)
    live = {"centroids": saved if saved is not None else [list(map(float, c)) for c in centroids]}
    if saved is None:
        _save_centroids(state_dir, live["centroids"])

    def retrain(spark, batch_id: int) -> None:
        from ..functions.similarity import train_ivf_centroids

        dirs = state_dirs(state_dir, batch_id)
        if not dirs:
            return
        # train on LATEST rows only — superseded versions of re-sent
        # ids are dead vectors and would drift the centroids
        idx = _latest_rows(_read_dirs(spark, dirs))
        new = train_ivf_centroids(
            idx, "e", k=len(live["centroids"]), seed=retrain_seed
        )
        # reassign everything indexed so far, THEN publish the new
        # centroids — readers never see new centroids with old cells
        # (the rows-before-json crash window that remains is the
        # documented single-file caveat: back the state with a
        # transactional table at cluster scale).
        def reassign(sp, d):
            src = _retrain_src(sp, d)
            return ivf_assign(src, new, keep=_keep_of(src, with_e=False))

        _reencode_dirs(spark, dirs, reassign)
        live["centroids"] = new
        _save_centroids(state_dir, new)

    def index_batch(df, batch_id: int):
        spark = df.sparkSession
        reject_stale_state(state_dir, batch_id, "ivf_index_pipe")
        if compact_every and batch_id and batch_id % compact_every == 0:
            merged = compact_state(spark, state_dir, upto_batch=batch_id)
            if retrain_on_compact and merged > 1:
                retrain(spark, batch_id)
        v = df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("e"),
        )
        assigned = materialize(
            ivf_assign(v, live["centroids"]).withColumn(
                "__batch", F.lit(batch_id)
            )
        )
        (
            assigned.write.mode("overwrite")  # replay-safe: batch N owns it
            .parquet(os.path.join(state_dir, f"batch={batch_id}"))
        )
        return assigned.select("vec_id", "cell")

    return pipe(source, fn=index_batch, sink_fn=lambda df, b: None, name=name)


def search_ivf_index(
    spark: SparkSession,
    state_dir: str,
    queries_df: DataFrame,
    centroids: list[list[float]] | None = None,
    probes: int = 4,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine neighbors for each query vector against everything
    indexed so far: rank the query's `probes` nearest cells (broadcast
    K-row centroid table), equi-join the index on cell, score, take
    top-k. Tie discipline matches the batch x_ann_ivf (score rounded to
    9 dp, neighbor_id ascending). With `centroids=None` the index's own
    persisted centroids are used — the correct default once
    retrain-on-compaction may have replaced the construction-time ones."""
    if centroids is None:
        centroids = load_index_centroids(state_dir)
        if centroids is None:
            raise ValueError(f"no persisted centroids under {state_dir}")
    index = _read_state(spark, state_dir)  # latest-wins on re-sent ids
    cent = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(centroids)],
        "centroid_id int, ce array<double>",
    )
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qe"),
    )
    probes_df = _probe_cells(q, cent, probes)
    scored = (
        F.broadcast(probes_df)
        .join(index, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qe"), F.col("e"))
                / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("e"), F.col("e"))))
            ).alias("score"),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_k))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# Streaming PQ code maintenance (r4 VERDICT item 6)
# ---------------------------------------------------------------------------

_CODEBOOKS_FILE = "_codebooks.json"


def load_pq_codebooks(state_dir: str) -> list | None:
    """The PQ index's CURRENT per-subspace codebooks, persisted
    alongside the state dirs (`_codebooks.json`). Codes are only
    meaningful under the codebooks that produced them — same contract
    as the IVF centroids file."""
    import json

    try:
        with open(os.path.join(state_dir, _CODEBOOKS_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _save_codebooks(state_dir: str, cbs: list) -> None:
    import json

    tmp = os.path.join(state_dir, _CODEBOOKS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(cbs, f)
    os.replace(tmp, os.path.join(state_dir, _CODEBOOKS_FILE))


def pq_index_pipe(
    source,
    state_dir: str,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    name: str = "pq-index",
    compact_every: int | None = None,
    retrain_on_compact: bool = False,
    retrain_seed: int = 42,
):
    """Maintain a PQ code table over a stream of embeddings — the
    compressed-index twin of `ivf_index_pipe`: each micro-batch encodes
    `vec_col` into M sub-codes (in-scan per-subspace argmax, the same
    zero-exchange plan as the batch queries/llm.py::pq_encode) and
    appends (vec_id, e, c0..cM-1) rows to the batch-versioned index.
    Returns the PipeHandle.

    The full vectors ride along in the STATE table solely so
    retraining can re-derive codebooks and re-encode; the read path
    (`read_pq_codes`) projects codes only — parquet's columnar reads
    make the compressed-read story hold even with e stored beside the
    codes (and a cluster deployment would split the two tables).

    `compact_every=K` folds per-batch dirs as in ivf_index_pipe. With
    `retrain_on_compact`, each compaction RETRAINS the per-subspace
    codebooks on everything indexed so far (distributed k-means per
    slice) and re-encodes every dir under them, using the same
    rename-aside swap + `_sweep_retrain` crash healing as the IVF
    path. Live codebooks persist in `_codebooks.json`; restart picks
    them up, so incremental encoding stays consistent with what the
    index holds."""
    from ..queries.llm import pq_encode
    from ..topics.pipe import pipe
    from ..util import materialize

    reject_partitioned_source(source, "pq_index_pipe")
    os.makedirs(state_dir, exist_ok=True)
    recover_compaction(state_dir)  # crash-interrupted swap, if any
    _sweep_retrain(state_dir)  # heal any crash-torn retrain swap
    saved = load_pq_codebooks(state_dir)
    live = {
        "cbs": saved
        if saved is not None
        else [[list(map(float, c)) for c in cb] for cb in codebooks]
    }
    if saved is None:
        _save_codebooks(state_dir, live["cbs"])

    def retrain(spark, batch_id: int) -> None:
        from ..functions.similarity import train_ivf_centroids

        dirs = state_dirs(state_dir, batch_id)
        if not dirs:
            return
        idx = _latest_rows(_read_dirs(spark, dirs))  # train on latest only
        sub_dim = len(live["cbs"][0][0])
        new = []
        for j in range(len(live["cbs"])):
            sub = idx.select(F.slice("e", sub_dim * j + 1, sub_dim).alias("se"))
            new.append(
                train_ivf_centroids(
                    sub, "se", k=len(live["cbs"][j]), seed=retrain_seed
                )
            )
        live_new = [[list(map(float, c)) for c in cb] for cb in new]

        # re-encode everything indexed so far, THEN publish the new
        # codebooks — readers never see new codebooks with old codes
        # (shared swap: _reencode_dirs).
        def recode(sp, d):
            src = _retrain_src(sp, d)
            return pq_encode(src, live_new, keep=_keep_of(src))

        _reencode_dirs(spark, dirs, recode)
        live["cbs"] = live_new
        _save_codebooks(state_dir, live_new)

    def index_batch(df, batch_id: int):
        spark = df.sparkSession
        reject_stale_state(state_dir, batch_id, "pq_index_pipe")
        if compact_every and batch_id and batch_id % compact_every == 0:
            merged = compact_state(spark, state_dir, upto_batch=batch_id)
            if retrain_on_compact and merged > 1:
                retrain(spark, batch_id)
        v = df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("e"),
        )
        coded = materialize(
            pq_encode(v, live["cbs"], keep=("e",)).withColumn(
                "__batch", F.lit(batch_id)
            )
        )
        (
            coded.write.mode("overwrite")  # replay-safe: batch N owns it
            .parquet(os.path.join(state_dir, f"batch={batch_id}"))
        )
        return coded.drop("e", "__batch")

    return pipe(source, fn=index_batch, sink_fn=lambda df, b: None, name=name)


def read_pq_codes(spark: SparkSession, state_dir: str) -> DataFrame:
    """Everything indexed so far, codes only (columnar projection — the
    compressed read path ADC scoring consumes)."""
    return _read_codes(spark, state_dir, include_cell=False)


def _read_codes(
    spark: SparkSession, state_dir: str, include_cell: bool
) -> DataFrame:
    import re

    df = _read_state(spark, state_dir)  # latest-wins on re-sent ids
    codes = sorted(
        (c for c in df.columns if re.fullmatch(r"c\d+", c)),
        key=lambda c: int(c[1:]),
    )
    cell = ["cell"] if include_cell else []
    return df.select("vec_id", *cell, *codes)


_IVFPQ_QUANT_FILE = "_ivfpq_quantizers.json"


def load_ivfpq_quantizers(
    state_dir: str,
) -> tuple[list[list[float]], list] | None:
    """The composed index's CURRENT (centroids, codebooks) pair,
    persisted as ONE json so the two quantizer levels can never tear
    apart on disk (a crash between two separate files could publish
    new centroids beside stale codebooks — strictly worse than either
    single-level pipe's one-file window). Rows are only meaningful
    under the pair that produced them."""
    import json

    try:
        with open(os.path.join(state_dir, _IVFPQ_QUANT_FILE)) as f:
            d = json.load(f)
        return d["centroids"], d["codebooks"]
    except (OSError, ValueError, KeyError):
        return None


def _save_ivfpq_quantizers(state_dir: str, cents, cbs) -> None:
    import json

    tmp = os.path.join(state_dir, _IVFPQ_QUANT_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"centroids": cents, "codebooks": cbs}, f)
    os.replace(tmp, os.path.join(state_dir, _IVFPQ_QUANT_FILE))


def ivfpq_index_pipe(
    source,
    state_dir: str,
    centroids: list[list[float]],
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    name: str = "ivfpq-index",
    compact_every: int | None = None,
    retrain_on_compact: bool = False,
    retrain_seed: int = 42,
):
    """Maintain the COMPOSED IVF×PQ index over a stream of embeddings —
    the streaming twin of `x_ann_ivfpq` (queries/llm.py): each
    micro-batch runs the one-scan `ivfpq_encode` (coarse cell + M
    sub-codes, zero exchanges) and appends (vec_id, e, cell, c0..cM-1)
    rows to the batch-versioned index. This is the deployable
    10^9-vector architecture kept CURRENT incrementally: neither the
    IVF pipe (fat rows per cell) nor the PQ pipe (scan-all codes)
    alone is what a growing corpus serves queries from.

    With `retrain_on_compact`, each compaction retrains BOTH quantizer
    levels on everything indexed so far — coarse centroids first, then
    per-subspace codebooks — and re-encodes every dir under the new
    pair in one pass; cells and codes are only meaningful under the
    quantizers that produced them, so both json files publish AFTER
    the re-encode (readers never see new quantizers with old rows).
    Same rename-aside swap + `_sweep_retrain` crash healing as the
    single-level pipes; the live pair persists in ONE
    `_ivfpq_quantizers.json` (a single os.replace — the two levels
    can never tear apart on disk) across restarts."""
    from ..queries.llm import ivfpq_encode
    from ..topics.pipe import pipe
    from ..util import materialize

    reject_partitioned_source(source, "ivfpq_index_pipe")
    os.makedirs(state_dir, exist_ok=True)
    recover_compaction(state_dir)  # crash-interrupted swap, if any
    _sweep_retrain(state_dir)
    saved = load_ivfpq_quantizers(state_dir)
    if saved is not None:
        live = {"centroids": saved[0], "cbs": saved[1]}
    else:
        live = {
            "centroids": [list(map(float, c)) for c in centroids],
            "cbs": [[list(map(float, c)) for c in cb] for cb in codebooks],
        }
        _save_ivfpq_quantizers(state_dir, live["centroids"], live["cbs"])

    def retrain(spark, batch_id: int) -> None:
        from ..functions.similarity import train_ivf_centroids

        dirs = state_dirs(state_dir, batch_id)
        if not dirs:
            return
        idx = _latest_rows(_read_dirs(spark, dirs))  # train on latest only
        new_cents = train_ivf_centroids(
            idx, "e", k=len(live["centroids"]), seed=retrain_seed
        )
        sub_dim = len(live["cbs"][0][0])
        new_cbs = []
        for j in range(len(live["cbs"])):
            sub = idx.select(F.slice("e", sub_dim * j + 1, sub_dim).alias("se"))
            new_cbs.append(
                [
                    list(map(float, c))
                    for c in train_ivf_centroids(
                        sub, "se", k=len(live["cbs"][j]), seed=retrain_seed
                    )
                ]
            )
        def recode(sp, d):
            src = _retrain_src(sp, d)
            return ivfpq_encode(src, new_cents, new_cbs, keep=_keep_of(src))

        _reencode_dirs(spark, dirs, recode)
        live["centroids"] = new_cents
        live["cbs"] = new_cbs
        # ONE atomic replace publishes the pair together — no window
        # where new centroids sit beside stale codebooks.
        _save_ivfpq_quantizers(state_dir, new_cents, new_cbs)

    def index_batch(df, batch_id: int):
        spark = df.sparkSession
        reject_stale_state(state_dir, batch_id, "ivfpq_index_pipe")
        if compact_every and batch_id and batch_id % compact_every == 0:
            merged = compact_state(spark, state_dir, upto_batch=batch_id)
            if retrain_on_compact and merged > 1:
                retrain(spark, batch_id)
        v = df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("e"),
        )
        enc = materialize(
            ivfpq_encode(
                v, live["centroids"], live["cbs"], keep=("e",)
            ).withColumn("__batch", F.lit(batch_id))
        )
        (
            enc.write.mode("overwrite")  # replay-safe: batch N owns it
            .parquet(os.path.join(state_dir, f"batch={batch_id}"))
        )
        return enc.drop("e", "__batch")

    return pipe(source, fn=index_batch, sink_fn=lambda df, b: None, name=name)


def read_ivfpq_index(spark: SparkSession, state_dir: str) -> DataFrame:
    """Everything indexed so far: (vec_id, cell, c0..cM-1) — the
    cell-restricted compressed table ADC scoring probes (columnar
    projection leaves the ride-along full vectors unread);
    latest-wins on re-sent ids."""
    return _read_codes(spark, state_dir, include_cell=True)


def search_ivfpq_index(
    spark: SparkSession,
    state_dir: str,
    queries_df: DataFrame,
    probes: int = 4,
    k: int = 5,
    shortlist: int = 20,
    vec_col: str = "embedding",
    id_col: str = "query_id",
) -> DataFrame:
    """Serve top-k from the incrementally-maintained IVF×PQ index —
    the full composed read path of the batch x_ann_ivfpq, against
    `ivfpq_index_pipe` state: rank the query's `probes` nearest cells
    (broadcast centroid table), ADC-score the PQ CODES inside probed
    cells via M broadcast codebook joins (full vectors stay unread —
    columnar projection), shortlist, then exact-re-rank only the
    shortlist's full vectors. Uses the index's PERSISTED quantizers
    (the only pair its rows are meaningful under). Tie discipline
    matches x_ann_ivfpq (9 dp ranking keys, neighbor_id ties)."""
    pair = load_ivfpq_quantizers(state_dir)
    if pair is None:
        raise ValueError(f"no persisted quantizers under {state_dir}")
    centroids, cbs = pair
    m = len(cbs)
    sub_dim = len(cbs[0][0])
    from ..util import materialize

    # Pin before branching: raw feeds both the ADC code table and the
    # exact re-rank; unpinned, the full state scan + dedup window
    # would run twice per search (the q11/q15/q22 discipline).
    raw = materialize(_read_state(spark, state_dir))
    codes = raw.select("vec_id", "cell", *[f"c{j}" for j in range(m)])
    cent = spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(centroids)],
        "centroid_id int, ce array<double>",
    )
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qe"),
    )
    probes_df = _probe_cells(q, cent, probes)
    scored = F.broadcast(probes_df).join(codes, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    num = None
    den2 = None
    for j in range(m):
        cbj = spark.createDataFrame(
            [(i, list(map(float, c))) for i, c in enumerate(cbs[j])],
            f"c{j} int, ce{j} array<double>",
        )
        scored = scored.join(F.broadcast(cbj), f"c{j}")
        qs = F.slice("qe", sub_dim * j + 1, sub_dim)
        term = dot(qs, F.col(f"ce{j}"))
        n2 = dot(F.col(f"ce{j}"), F.col(f"ce{j}"))
        num = term if num is None else num + term
        den2 = n2 if den2 is None else den2 + n2
    adc = scored.withColumn(
        "ascore", num / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(den2))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.round(F.col("ascore"), 9).desc(), F.col("vec_id")
    )
    short = (
        adc.withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= shortlist)
        .select("query_id", "qe", F.col("vec_id").alias("neighbor_id"))
    )
    full = raw.select(F.col("vec_id").alias("neighbor_id"), "e")
    exact = F.broadcast(short).join(full, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("qe"), F.col("e"))
            / (
                F.sqrt(dot(F.col("qe"), F.col("qe")))
                * F.sqrt(dot(F.col("e"), F.col("e")))
            )
        ).alias("score"),
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rnk", F.row_number().over(w_k))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score")
        )
    )
