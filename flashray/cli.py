"""CLI — the ``ray job submit`` entry point (the rebuild of the reference's
``test-algs/test_algs.cpp`` runner; SURVEY.md §3.1).

    python -m flashray.cli build --transcripts T.parquet --out /g [--symmetrize]
    python -m flashray.cli run --graph /g --algorithm pagerank [--out OUT]
    python -m flashray.cli bench [--scaling]

Owns its Ray session (scripts own ray.init; the driver-contract module never
does)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None) -> bool:
    """Init Ray if no session exists; returns whether THIS call owns the
    session (an embedding caller's session — e.g. pytest's fixture — must
    not be torn down by a CLI command)."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        # under `ray job submit` RAY_ADDRESS points at the cluster — attach
        # to it; standalone runs (no/``local`` address) start a local
        # session, where per-run CPU caps are meaningful
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"num_cpus": num_cpus} if addr == "local" else {}
        ray.init(
            address=addr,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **kwargs,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owned


def cmd_build(args) -> int:
    owned = _init_ray(args.num_cpus)
    import ray
    import ray.data as rd

    from flashray import extract
    from flashray.build import build_graph

    ds = rd.read_parquet(args.transcripts)
    edges = (
        extract.extract_edges_sorted(ds)
        if args.sparse_turns
        else extract.extract_edges(ds)
    )
    t0 = time.time()
    g = build_graph(
        edges,
        args.out,
        num_partitions=args.partitions,
        symmetrize=args.symmetrize,
        skew_threshold=args.skew_threshold,
    )
    print(
        json.dumps(
            {
                "graph": args.out,
                "vertices": g.meta.num_vertices,
                "edges": g.meta.num_edges,
                "split_vertices": len(g.meta.split_vertices),
                "build_sec": round(time.time() - t0, 2),
            }
        )
    )
    if owned:
        ray.shutdown()
    return 0


def cmd_run(args) -> int:
    owned = _init_ray(args.num_cpus)
    import ray

    from flashray import algorithms, betweenness, scc, triangles
    from flashray.build import Graph

    g = Graph.load(args.graph)
    t0 = time.time()
    kw = dict(
        out_dir=args.out,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
    )
    alg = args.algorithm
    if alg == "pagerank":
        res = algorithms.pagerank(g, eps=args.eps, mode=args.mode,
                                  weighted=args.weighted, **kw)
    elif alg == "wcc":
        res = algorithms.wcc(g, **kw)
    elif alg == "labelprop":
        seeds = json.loads(args.seeds or "{}")
        res = algorithms.label_propagation(
            g, {int(k): int(v) for k, v in seeds.items()}, **kw
        )
    elif alg == "bfs":
        res = algorithms.bfs(g, [int(s) for s in (args.seeds or "").split(",")], **kw)
    elif alg == "kcore":
        res = algorithms.kcore(g, **kw)
    elif alg == "onion":
        res = algorithms.onion_layers(g)
    elif alg == "matching":
        from flashray import matching as _matching

        res = _matching.maximal_matching(g, weighted=args.weighted)
    elif alg == "nibble":
        seed = int((args.seeds or "0").split(",")[0])
        res = algorithms.local_cluster(g, seed)
    elif alg == "ppr":
        res = algorithms.multi_ppr(
            g, [int(x) for x in (args.seeds or "").split(",")], eps=args.eps
        )
    elif alg == "diameter":
        res = algorithms.pseudo_diameter(g)
    elif alg == "triangles":
        res = triangles.triangle_count(g)
    elif alg == "scan_topk":
        res = triangles.topk_scan(g, args.k).to_pandas()
    elif alg == "scc":
        res = scc.scc(g, scratch_dir=args.scratch or args.graph + "_scc",
                      out_dir=args.out)
    elif alg == "betweenness":
        res = betweenness.betweenness(
            g, scratch_dir=args.scratch or args.graph + "_bc",
            sources=args.sources,
        )
    else:
        print(f"unknown algorithm: {alg}", file=sys.stderr)
        return 2
    wall = time.time() - t0
    summary = {"algorithm": alg, "wall_sec": round(wall, 2)}
    if hasattr(res, "__len__") and not isinstance(res, (str, int)):
        summary["rows"] = len(res)
        if args.out is None and hasattr(res, "head"):
            summary["head"] = res.head(5).to_dict("records")
    else:
        summary["result"] = res
    print(json.dumps(summary, default=str))
    if owned:
        ray.shutdown()
    return 0


def cmd_bench(args) -> int:
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, "bench.py")]
    if args.scaling:
        cmd.append("--scaling")
    return subprocess.call(cmd, cwd=repo)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="flashray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="transcripts parquet -> partitioned graph")
    b.add_argument("--transcripts", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--symmetrize", action="store_true")
    b.add_argument("--sparse-turns", action="store_true",
                   help="turn_idx is gapped; use the per-conv sort extractor")
    b.add_argument("--skew-threshold", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    r = sub.add_parser("run", help="run an algorithm over a built graph")
    r.add_argument("--graph", required=True)
    r.add_argument("--algorithm", required=True,
                   choices=["pagerank", "wcc", "labelprop", "bfs", "kcore",
                            "onion", "ppr", "matching", "nibble",
                            "diameter", "triangles", "scan_topk", "scc",
                            "betweenness"])
    r.add_argument("--out", default=None)
    r.add_argument("--checkpoint-dir", default=None)
    r.add_argument("--resume", action="store_true")
    r.add_argument("--eps", type=float, default=1e-6)
    r.add_argument("--mode", default="pull", choices=["pull", "push"])
    r.add_argument("--weighted", action="store_true")
    r.add_argument("--seeds", default=None,
                   help="bfs: comma-separated ids; labelprop: JSON {id: label}")
    r.add_argument("--k", type=int, default=10)
    r.add_argument("--sources", type=int, default=16)
    r.add_argument("--scratch", default=None)
    r.set_defaults(fn=cmd_run)

    be = sub.add_parser("bench", help="run bench.py")
    be.add_argument("--scaling", action="store_true")
    be.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
