"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — the baseline. Per batch: one
  numpy matmul of the batch's embedding matrix (zero-copy from Arrow's
  flattened list buffer) against the broadcast, pre-normalized query
  matrix; per-batch local top-k partials, then one tiny global sort.
- ``ivf_topk``: the scale path — a one-pass IVF index: kmeans-lite
  centroids from a deterministic sample, vectors bucketed by nearest
  centroid (``groupby``), queries probe only the ``nprobe`` nearest
  buckets. Approximate; recall depends on nprobe/centroids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Arrow list<float> column → (rows, dim) float64 matrix, zero-copy on
    the flat values buffer where possible."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(batch) if len(batch) else 0
    return flat.reshape(len(batch), dim)


def brute_force_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    col: str = "embedding",
    round_decimals: int | None = None,
) -> ray.data.Dataset:
    """Exact cosine top-k of ``ds`` rows vs one query vector.

    Result: (vec_id, cos_sim) ordered by (cos_sim DESC, vec_id ASC).
    """
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _batch_matrix(batch, col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1e-30
        sims = (m @ qv) / norms
        if round_decimals is not None:
            sims = np.round(sims, round_decimals)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        take = min(k, len(sims))
        # partial top-k per batch (deterministic: sim desc, id asc)
        order = np.lexsort((ids, -sims))[:take]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "cos_sim": pa.array(sims[order]),
            }
        )

    partial = ds.map_batches(local_topk, batch_format="pyarrow")
    return partial.sort(["cos_sim", id_col], descending=[True, False]).limit(k)


class IVFIndex:
    """Driver-side handle for the IVF-bucketed dataset."""

    def __init__(self, bucketed: ray.data.Dataset, centroids: np.ndarray):
        self.bucketed = bucketed  # materialized, with "bucket" column
        self.centroids = centroids  # (C, dim), L2-normalized


def default_num_centroids(total_rows: int) -> int:
    """√N centroid heuristic: per-bucket all-pairs work is O((N/C)²·C), so
    C ≈ √N balances bucket size against centroid-assignment cost."""
    return int(np.clip(np.sqrt(max(total_rows, 1)), 4, 4096))


def _fit_centroids(
    ds: ray.data.Dataset,
    num_centroids: int | None = None,
    sample_rows: int = 2048,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> np.ndarray:
    """Deterministic centroids from a HASH-FILTERED sample — one streaming
    ``map_batches`` pass keeps rows whose multiplicative id hash ≡ 0
    (mod N/sample_rows); no global sort just to read ~2k rows. Farthest-
    point seeding + 5 Lloyd steps on the sample (driver-side numpy on the
    small sample only). ``num_centroids=None`` → √N heuristic. Returns an
    (C, dim) L2-normalized matrix."""
    total = ds.count()
    if num_centroids is None:
        num_centroids = default_num_centroids(total)
    stride = max(1, total // sample_rows)
    if stride > 1:

        def samp(batch: pa.Table) -> pa.Table:
            ids = (
                batch.column(id_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            h = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
            return batch.filter(pa.array(h % np.uint64(stride) == 0))

        sample = ds.map_batches(samp, batch_format="pyarrow").take_all()
    else:
        sample = ds.take_all()
    # deterministic regardless of block arrival order: sort by id, cap
    sample.sort(key=lambda r: r[id_col])
    sample = sample[: 2 * sample_rows]
    m = np.array([np.asarray(r[col], dtype=np.float64) for r in sample])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    c = [m[0]]
    for _ in range(1, min(num_centroids, len(m))):
        d = 1.0 - np.max(np.stack([m @ ci for ci in c]), axis=0)
        c.append(m[int(np.argmax(d))])
    cent = np.stack(c)
    for _ in range(5):  # Lloyd on the sample
        assign = np.argmax(m @ cent.T, axis=1)
        for j in range(len(cent)):
            sel = m[assign == j]
            if len(sel):
                v = sel.mean(axis=0)
                cent[j] = v / max(np.linalg.norm(v), 1e-30)
    return cent


def ivf_build(
    ds: ray.data.Dataset,
    num_centroids: int | None = None,
    sample_rows: int = 2048,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> IVFIndex:
    """Fit centroids on a deterministic sample (``None`` → √N heuristic),
    then a distributed nearest-centroid assignment pass."""
    cent = _fit_centroids(ds, num_centroids, sample_rows, id_col, col)
    cent_ref = ray.put(cent)

    def assign_bucket(batch: pa.Table) -> pa.Table:
        cc = ray.get(cent_ref)
        mm = _batch_matrix(batch, col)
        mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-30)
        b = np.argmax(mm @ cc.T, axis=1)
        return batch.append_column("bucket", pa.array(b.astype(np.int32)))

    bucketed = ds.map_batches(assign_bucket, batch_format="pyarrow").materialize()
    return IVFIndex(bucketed, cent)


def ivf_topk(
    index: IVFIndex,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> ray.data.Dataset:
    """Probe the ``nprobe`` buckets nearest the query; exact search inside."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    probes = np.argsort(-(index.centroids @ qn))[:nprobe].astype(np.int32)
    probe_arr = pa.array(sorted(set(probes.tolist())), type=pa.int32())

    def keep_probed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("bucket"), value_set=probe_arr))

    sub = index.bucketed.map_batches(keep_probed, batch_format="pyarrow")
    return brute_force_topk(sub, q, k=k, id_col=id_col, col=col)


def group_centroids(
    ds: ray.data.Dataset,
    group_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> ray.data.Dataset:
    """Per-group mean embedding — the class-prototype / cluster-seed pass
    a curation pipeline runs before IVF list assignment, semantic dedup
    tiering, or per-domain drift monitoring. Output: one row per
    (group, dim) with ``c`` = mean of that vector component, dim 1-based,
    rounded to ``decimals`` (matching the SQL oracle's ROUND).

    Scale shape: each batch emits one PARTIAL (group, dim, s, cnt) table —
    O(groups × dim) rows per block via a single label-sort +
    ``np.add.reduceat`` over the float64 matrix, never per-row — so the
    final hash groupby only sees tiny partials (fine at that size,
    CLAUDE.md) and the output is O(groups × dim). Accumulation is float64
    regardless of the stored vector dtype (the testdata stores float32)."""
    from ray.data.aggregate import Sum

    empty = pa.schema(
        [
            (group_col, pa.int64()),
            ("dim", pa.int64()),
            ("s", pa.float64()),
            ("cnt", pa.int64()),
        ]
    )

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty.empty_table()
        g = t.column(group_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _batch_matrix(t, vec_col)  # float64 (rows, dim)
        order = np.argsort(g, kind="stable")
        gs = g[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(gs)) + 1))
        sums = np.add.reduceat(m[order], starts, axis=0)
        cnts = np.diff(np.append(starts, len(gs))).astype(np.int64)
        ug = gs[starts]
        dim = m.shape[1]
        return pa.table(
            {
                group_col: pa.array(np.repeat(ug, dim)),
                "dim": pa.array(
                    np.tile(np.arange(1, dim + 1, dtype=np.int64), len(ug))
                ),
                "s": pa.array(sums.ravel()),
                "cnt": pa.array(np.repeat(cnts, dim)),
            }
        )

    agg = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby([group_col, "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: t.column(group_col),
                "dim": t.column("dim"),
                "c": pa.array(np.round(s / cnt, decimals)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
