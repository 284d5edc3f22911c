"""Streaming many-case data pipeline: double-buffered host→device loading.

``FlowDataset`` (train/data.py) holds every snapshot in memory — right for
the single-case reference workload (3 snapshots).  Production multi-case
training (BASELINE.json config 5: perturbed-geometry variants sharded over a
``data`` mesh axis) iterates hundreds of cases that don't fit in host RAM at
once and whose parsing/normalization is host work that should overlap device
compute.  This module provides:

* :class:`Prefetcher` — a background-thread iterator that keeps ``depth``
  upcoming items resident **on device** (``jax.device_put`` with the target
  sharding) while the train step consumes the current one: the classic
  double-buffered input pipeline.  Host parse of chunk k+1 and the transfer
  of chunk k+1 overlap the device compute of chunk k.
* case sources producing :class:`~gnn_bfs_rans_tpu.parallel.multicase.CaseBatch`
  chunks: :func:`perturbed_case_source` (synthetic geometry family around a
  base mesh, one OpenFOAM parse total) and :func:`foam_case_source` (a list
  of real case directories sharing mesh topology — one graph, per-case
  geometry/targets, parsed lazily one case at a time).

The reference has no analog (single case, fully materialized,
``train.py:23-150``); this is the scale path SURVEY.md §5 names
("sharded case-streaming loader, double-buffered host→device").
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Callable, Iterable, Iterator

import jax
import numpy as np

from ..foam.reader import DEFAULT_FIELDS, FoamCase
from ..graph.build import build_graph, compute_edge_features
from ..graph.structs import Graph
from .normalization import FieldNormalizer, pack_targets


class Prefetcher:
    """Iterate ``source`` with ``depth`` items pre-transferred to device.

    ``put`` maps a host item to its device-resident form (default:
    ``jax.device_put`` with optional sharding); it runs on the background
    thread so host→device DMA of the next chunk overlaps compute on the
    current one.  Exceptions in the source propagate to the consumer at the
    position they occurred.  The thread is a daemon and also stops promptly
    when the consumer drops the iterator mid-stream (close()).
    """

    _STOP = object()

    def __init__(
        self,
        source: Iterable,
        sharding=None,
        depth: int = 2,
        put: Callable | None = None,
    ):
        if depth < 1:
            raise ValueError("prefetch depth must be >= 1")
        if put is None:
            def put(item):
                return jax.tree.map(
                    lambda a: jax.device_put(a, sharding)
                    if sharding is not None else jax.device_put(a),
                    item,
                )
        self._put = put
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(iter(source),), daemon=True
        )
        self._thread.start()

    def _run(self, it: Iterator):
        try:
            for item in it:
                if self._stop.is_set():
                    return
                try:
                    out = self._put(item)
                except BaseException as e:  # surface transfer errors too
                    self._q.put(("error", e))
                    return
                self._q.put(("item", out))
        except BaseException as e:
            self._q.put(("error", e))
            return
        self._q.put(("done", None))

    def __iter__(self):
        return self

    def __next__(self):
        kind, payload = self._q.get()
        if kind == "item":
            return payload
        if kind == "error":
            self.close()
            raise payload
        raise StopIteration

    def close(self):
        self._stop.set()
        # drain so the producer unblocks from a full queue
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # best-effort cleanup
        try:
            self.close()
        except Exception:
            pass


def perturbed_case_source(
    base: Graph,
    n_cases: int,
    chunk: int,
    amplitude: float = 0.02,
    seed: int = 0,
    targets_for: Callable[[int, np.ndarray], np.ndarray] | None = None,
):
    """Yield CaseBatch chunks of a synthetic perturbed-geometry family.

    Geometry generation is lazy: chunk k is synthesized only when the
    prefetcher's thread asks for it.  ``targets_for(case_id, coords)``
    supplies per-case targets ``[N_pad, 7]`` (defaults to zeros — callers
    with real data pass a loader; the geometry-generalization benchmark
    passes an analytic field of the coordinates).
    """
    from ..parallel.multicase import CaseBatch

    senders = np.asarray(base.senders)
    receivers = np.asarray(base.receivers)
    base_coords = np.asarray(base.node_feat, dtype=np.float64)
    ef = np.asarray(base.edge_feat)
    scale = float(ef[: base.n_edges, 3].mean()) if base.n_edges else 1.0
    mask = np.asarray(base.node_mask)

    def gen():
        for start in range(0, n_cases, chunk):
            ids = range(start, min(start + chunk, n_cases))
            nf = np.zeros((len(ids), base.n_pad, 3), np.float32)
            efs = np.zeros((len(ids), base.e_pad, 4), np.float32)
            tg = np.zeros((len(ids), base.n_pad, 7), np.float32)
            for j, cid in enumerate(ids):
                rng = np.random.default_rng(seed + cid)  # per-case stream
                jitter = rng.normal(size=base_coords.shape) * (amplitude * scale)
                jitter[:, 2] = 0.0
                coords = base_coords + jitter * mask[:, None]
                nf[j] = coords.astype(np.float32)
                efs[j] = compute_edge_features(coords, senders, receivers)
                efs[j, base.n_edges:] = 0.0
                if targets_for is not None:
                    tg[j] = targets_for(cid, coords.astype(np.float32))
            yield CaseBatch(node_feats=nf, edge_feats=efs, targets=tg)

    return gen()


def foam_case_source(
    case_paths: list[str | Path],
    chunk: int,
    time_dir: str,
    fields: tuple[str, ...] = DEFAULT_FIELDS,
    normalizer: FieldNormalizer | None = None,
    node_align: int = 128,
    edge_align: int = 128,
) -> tuple[Graph, FieldNormalizer, Iterator]:
    """Stream real OpenFOAM cases sharing one mesh topology.

    Returns ``(graph, normalizer, chunk_iterator)``.  The first case defines
    the canonical graph (and, when no normalizer is given, fits one on its
    fields — streaming forbids a global two-pass fit; pass a pre-fitted
    normalizer for exact parity with offline statistics).  Remaining cases
    are parsed lazily one chunk at a time on the prefetch thread; a case
    whose mesh topology differs from the first raises.
    """
    from ..parallel.multicase import CaseBatch

    if not case_paths:
        raise ValueError("no case paths")
    first = FoamCase(case_paths[0])
    mesh0 = first.load_mesh()
    graph = build_graph(mesh0, node_align=node_align, edge_align=edge_align)
    perm = (np.asarray(graph.perm)[: graph.n_nodes]
            if graph.perm is not None else None)
    f0 = first.load_fields(time_dir, fields=fields, n_cells=mesh0.n_cells,
                           strict=True)
    if normalizer is None:
        normalizer = FieldNormalizer().fit(f0)

    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)

    def load_case(path) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        case = FoamCase(path)
        mesh = case.load_mesh()
        if (mesh.n_cells != mesh0.n_cells
                or mesh.owner.shape != mesh0.owner.shape
                or not np.array_equal(mesh.owner, mesh0.owner)
                or not np.array_equal(mesh.neighbour, mesh0.neighbour)):
            raise ValueError(
                f"case {path} mesh topology differs from {case_paths[0]}"
            )
        coords = np.zeros((graph.n_pad, 3), np.float64)
        cc = mesh.cell_centers
        if perm is not None:
            cc = cc[perm]
        coords[: graph.n_nodes] = cc
        ef = compute_edge_features(coords, senders, receivers)
        ef[graph.n_edges:] = 0.0
        f = case.load_fields(time_dir, fields=fields, n_cells=mesh.n_cells,
                             strict=True)
        packed = pack_targets(normalizer.transform(f))
        if perm is not None:
            packed = packed[perm]
        tg = np.zeros((graph.n_pad, 7), np.float32)
        tg[: packed.shape[0]] = packed
        return coords.astype(np.float32), ef.astype(np.float32), tg

    def gen():
        for start in range(0, len(case_paths), chunk):
            paths = case_paths[start:start + chunk]
            nf = np.zeros((len(paths), graph.n_pad, 3), np.float32)
            efs = np.zeros((len(paths), graph.e_pad, 4), np.float32)
            tg = np.zeros((len(paths), graph.n_pad, 7), np.float32)
            for j, p in enumerate(paths):
                nf[j], efs[j], tg[j] = load_case(p)
            yield CaseBatch(node_feats=nf, edge_feats=efs, targets=tg)

    return graph, normalizer, gen()
