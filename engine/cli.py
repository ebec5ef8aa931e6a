"""CLI driver — the ``ray job submit`` entrypoint (north-rule N10).

    python -m engine.cli run --input <corpus_dir_or_snap_file> \
        --algo pagerank|cc|lpa|triangles|kcore|bfs|sssp|hits \
        [--engine bsp|dataset] [--iterations K | --eps 1e-6] \
        [--stop ref [--freeze-delta 1e-16]] \
        [--ckpt DIR] [--out DIR] [--shards P] [--top-k 10]

``--stop ref`` runs the reference's exact per-vertex freeze rule
(SURVEY.md §5.4) distributed; it reproduces the reference's iteration
counts on the fixture goldens.

On a real cluster the same command runs via
``ray job submit --working-dir . -- python -m engine.cli run ...``;
here it initializes a local session (this is the ONLY module, besides
bench.py and tests, that owns ``ray.init``).

Input autodetection: a ``.txt`` path is read as a SNAP edge list
(multigraph semantics, ref: src/Graph.cpp:32-116); a directory or
``.parquet`` path is read as the corpus table and goes through sha256 +
edge extraction first (simple-graph semantics, SURVEY.md §7.6).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_edges(args):
    import ray.data

    from . import extract, ingest

    if args.input.endswith(".txt"):
        return ingest.read_snap(args.input), None
    corpus = ingest.read_corpus(args.input)
    corpus = ingest.with_sha256(corpus)
    rref = extract.repo_set(corpus)
    sedges = extract.extract_edges(corpus, repo_set_ref=rref)
    import pyarrow as pa

    return (
        sedges.map_batches(
            lambda t: pa.table(
                {"src": t.column("src_repo"), "dst": t.column("dst_repo")}
            ),
            batch_format="pyarrow",
        ),
        corpus,
    )


def cmd_run(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    edges, _corpus = _build_edges(args)
    t0 = time.perf_counter()
    report: dict = {"algo": args.algo, "input": args.input}

    if args.algo == "pagerank":
        freeze = args.freeze_delta if args.stop == "ref" else None
        if args.engine == "bsp":
            from .bsp import bsp_pagerank

            res = bsp_pagerank(
                edges,
                iterations=args.iterations,
                eps=args.eps,
                num_shards=args.shards,
                checkpoint_dir=args.ckpt,
                dictionary=args.dict,
                freeze_delta=freeze,
            )
        else:
            from .pagerank import _PreparedGraph, pagerank

            res = pagerank(
                edges,
                iterations=args.iterations,
                eps=args.eps,
                checkpoint_dir=args.ckpt,
                salted=args.salted,
                prepared=_PreparedGraph(edges, dictionary=args.dict),
                freeze_delta=freeze,
            )
        report.update(
            iterations=res.iterations,
            rank_sum=float(res.ranks.sum()),
            metrics_last=res.metrics[-1] if res.metrics else {},
            top=[
                {"id": str(r["id"]), "rank": r["rank"]}
                for r in res.top_k(args.top_k).to_pylist()
            ],
        )
        if args.out:
            import ray.data as rd

            tbl = rd.from_arrow(res.as_table())
            if args.resumable:
                from .sink import write_parquet_resumable

                report["sink"] = write_parquet_resumable(
                    tbl, args.out, key_col="id"
                )
            else:
                tbl.write_parquet(args.out)
    elif args.algo == "cc":
        if args.engine == "bsp":
            from .bsp import bsp_connected_components_dataset

            ds, rounds = bsp_connected_components_dataset(
                edges, num_shards=args.shards
            )
            label_col = "label_id"
        else:
            from .components import connected_components_dataset

            ds, rounds = connected_components_dataset(edges)
            label_col = "label"
        from . import graph as G

        # sort-based distinct count, not ds.unique (Ray's hash aggregate
        # is ~100× slower than its sort at >=10M labels)
        report.update(
            rounds=rounds, num_components=G.distinct_count(ds, label_col)
        )
        if args.out:
            ds.write_parquet(args.out)
    elif args.algo == "lpa":
        iters = args.iterations or 5
        if args.engine == "bsp":
            import pyarrow as pa
            import ray.data as rd

            from .bsp import bsp_label_propagation

            labels = bsp_label_propagation(
                edges, iterations=iters, num_shards=args.shards
            )
            report.update(num_communities=len(set(labels.values())))
            if args.out:
                ids = sorted(labels)
                rd.from_arrow(
                    pa.table(
                        {"id": pa.array(ids),
                         "label": pa.array([labels[i] for i in ids])}
                    )
                ).write_parquet(args.out)
        else:
            from .labelprop import label_propagation_dataset

            from . import graph as G

            ds = label_propagation_dataset(edges, iterations=iters)
            report.update(num_communities=G.distinct_count(ds, "label"))
            if args.out:
                ds.write_parquet(args.out)
    elif args.algo == "triangles":
        from .triangles import triangle_count

        report.update(n_triangles=triangle_count(edges))
    elif args.algo in ("bfs", "sssp"):
        import numpy as np

        from . import graph as G
        from .bsp import BSPGraph, SSSP_SENTINEL

        ids = G.vertex_ids(edges)
        enc = G.encode_edges(edges, ids)
        g = BSPGraph(
            enc, n=len(ids), num_shards=args.shards, symmetric_copy=True
        )
        src_dense = 0  # smallest original id (sorted dictionary)
        if args.source is not None:
            src_dense = int(np.searchsorted(ids, args.source))
            if src_dense >= len(ids) or int(ids[src_dense]) != args.source:
                print(f"--source {args.source} is not a vertex", file=sys.stderr)
                return 2
        if args.algo == "bfs":
            ds, rounds = g.bfs(source_vid=src_dense)
            sentinel = len(ids)  # BFS: hop counts are < n
        else:
            ds, rounds = g.sssp(source_vid=src_dense)
            sentinel = int(SSSP_SENTINEL)
        g.shutdown()
        import pyarrow as pa
        import pyarrow.compute as pc

        reached = ds.map_batches(
            lambda t: t.filter(
                pc.less(t.column("label"), pa.scalar(sentinel))
            ),
            batch_format="pyarrow",
        )
        report.update(
            source=int(ids[src_dense]),
            rounds=rounds,
            reached=int(reached.count()),
        )
        if args.algo == "bfs":
            report["eccentricity"] = rounds - 1
        if args.out:
            import ray as _ray

            ids_ref = _ray.put(ids)

            def dec(t: pa.Table) -> pa.Table:
                d = _ray.get(ids_ref)
                vid = t.column("vid").to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                return pa.table(
                    {
                        "id": pa.array(d[vid]),
                        "dist": t.column("label").cast(pa.int64()),
                    }
                )

            reached.map_batches(dec, batch_format="pyarrow").write_parquet(
                args.out
            )
    elif args.algo == "hits":
        import pyarrow as pa

        from . import graph as G
        from .hits import hits

        ids = G.vertex_ids(edges)
        enc = G.encode_edges(edges, ids)
        iters = args.iterations or 3
        auth, hub = hits(enc, n=len(ids), iterations=iters)
        order = auth.argsort()[::-1][: args.top_k]
        report.update(
            iterations=iters,
            top_auth=[
                {"id": str(ids[i]), "auth": float(auth[i])} for i in order
            ],
        )
        if args.out:
            import ray.data as rd

            rd.from_arrow(
                pa.table(
                    {"id": pa.array(ids), "auth": pa.array(auth),
                     "hub": pa.array(hub)}
                )
            ).write_parquet(args.out)
    elif args.algo == "kcore":
        from .kcore import kcore_vertices_dataset

        k = args.k
        # raw inputs (SNAP files especially) can carry duplicate edges,
        # both directions, or self-loops — all of which silently inflate
        # degrees; canonicalize to the undirected simple graph first
        ds, rounds = kcore_vertices_dataset(edges, k=k, dedupe=True)
        report.update(k=k, rounds=rounds, core_vertices=int(ds.count()))
        if args.out:
            ds.write_parquet(args.out)
    else:
        print(f"unknown algo {args.algo}", file=sys.stderr)
        return 2

    report["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="engine.cli")
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run", help="run a graph algorithm over an input")
    r.add_argument("--input", required=True)
    r.add_argument("--algo", default="pagerank",
                   choices=["pagerank", "cc", "lpa", "triangles", "kcore",
                            "bfs", "sssp", "hits"])
    r.add_argument("--engine", default="bsp", choices=["bsp", "dataset"])
    r.add_argument("--iterations", type=int, default=None)
    r.add_argument("--eps", type=float, default=None)
    r.add_argument("--ckpt", default=None)
    r.add_argument("--out", default=None)
    r.add_argument("--shards", type=int, default=8)
    r.add_argument("--top-k", type=int, default=10)
    r.add_argument("--k", type=int, default=3,
                   help="core order for --algo kcore")
    r.add_argument("--source", type=int, default=None,
                   help="source vertex id for --algo bfs/sssp (default: "
                        "smallest id)")
    r.add_argument("--salted", action="store_true")
    r.add_argument("--resumable", action="store_true",
                   help="write --out through the resumable bucketed sink "
                        "(atomic bucket=K dirs; reruns skip finished "
                        "buckets)")
    r.add_argument("--stop", default="fixed", choices=["fixed", "ref"],
                   help="'fixed': stop on --iterations/--eps (default "
                        "eps=1e-6); 'ref': the reference's per-vertex "
                        "freeze rule at --freeze-delta (reproduces the "
                        "reference's iteration counts exactly)")
    r.add_argument("--freeze-delta", type=float, default=1e-16)
    r.add_argument("--dict", default="auto",
                   choices=["auto", "broadcast", "join", "service"],
                   help="vertex dictionary: broadcast array, Dataset hash-"
                        "join, or sharded dictionary-actor service (auto "
                        "switches broadcast->service above "
                        "GRAFT_JOIN_DICT_EDGES)")
    r.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = p.parse_args(argv)
    if args.cmd == "run":
        if (
            args.algo == "pagerank"
            and args.iterations is None
            and args.eps is None
            and args.stop != "ref"
        ):
            args.eps = 1e-6
        return cmd_run(args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
