"""Snapshot dataset: parse once, normalize, pack static device-ready arrays.

TPU-first replacement for the reference's ``OpenFOAMDataset``
(``train.py:23-150``): the mesh is parsed once, ONE canonical padded graph is
built (not a per-snapshot rebuild), the normalizer is fitted over all usable
snapshots (pass 1, ``train.py:49-77``), and targets are packed into a single
``[S, N_pad, 7]`` array (pass 2, ``train.py:79-144``) that lives on device —
per-step work is pure indexing inside jit.

Uniform-field snapshots (e.g. t=0) are supported but excluded by default to
match the reference's effective training set (SURVEY.md §2 quirk 2: the
default ``--time_dirs 0 100 200 282`` yields 3 samples).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from ..foam.reader import DEFAULT_FIELDS, FoamCase, FoamMesh
from ..graph.build import build_graph
from ..graph.structs import Graph
from .normalization import FieldNormalizer, pack_targets


@dataclasses.dataclass
class FlowDataset:
    """A static graph plus stacked normalized target snapshots."""

    graph: Graph
    targets: np.ndarray            # [S, N_pad, 7] normalized
    raw_fields: list[dict]         # per-snapshot un-normalized field dicts
    time_dirs: list[str]           # usable snapshot names, aligned with targets
    normalizer: FieldNormalizer
    mesh: FoamMesh
    case_path: str

    @property
    def n_snapshots(self) -> int:
        return len(self.time_dirs)


def _is_uniform_snapshot(fields: dict[str, np.ndarray]) -> bool:
    return all(np.allclose(v, v.reshape(-1)[0]) for v in fields.values())


def load_dataset(
    case_path: str | Path,
    time_dirs: list[str] | None = None,
    fields: tuple[str, ...] = DEFAULT_FIELDS,
    include_uniform: bool = False,
    normalizer: FieldNormalizer | None = None,
    node_align: int = 128,
    edge_align: int = 128,
    with_band: bool = False,
    band_components: tuple[str, ...] | None = None,
) -> FlowDataset:
    """Load an OpenFOAM case into a device-ready dataset.

    ``include_uniform=False`` reproduces the reference's behavior of dropping
    snapshots whose every field is constant (time 0 initial conditions).
    """
    case = FoamCase(case_path)
    mesh = case.load_mesh()
    graph = build_graph(mesh, node_align=node_align, edge_align=edge_align,
                        with_band=with_band, band_components=band_components)

    if time_dirs is None:
        time_dirs = case.available_time_dirs()

    # Pass 1: load all usable snapshots.
    usable: list[tuple[str, dict]] = []
    for td in time_dirs:
        try:
            f = case.load_fields(td, fields=fields, n_cells=mesh.n_cells, strict=True)
        except (FileNotFoundError, ValueError) as e:
            print(f"Warning: skipping time dir {td}: {e}")
            continue
        if set(fields) - set(f):
            print(f"Warning: time dir {td} missing fields; skipping")
            continue
        if not include_uniform and _is_uniform_snapshot(f):
            print(f"Note: time dir {td} is uniform (initial conditions); skipping "
                  "(pass include_uniform=True to keep)")
            continue
        usable.append((td, f))

    if not usable:
        raise ValueError(f"no usable snapshots among {time_dirs} in {case_path}")

    # Fit normalizer on concatenated fields across snapshots.
    if normalizer is None:
        concat = {
            name: np.concatenate([f[name] for _, f in usable], axis=0)
            for name in fields
        }
        normalizer = FieldNormalizer().fit(concat)

    # Pass 2: normalize + pack into padded targets (in the graph's node
    # order — if the graph was bandwidth-reordered, targets follow perm).
    n_pad = graph.n_pad
    perm_host = (
        np.asarray(graph.perm)[: graph.n_nodes] if graph.perm is not None else None
    )
    targets = np.zeros((len(usable), n_pad, 7), dtype=np.float32)
    for i, (_, f) in enumerate(usable):
        packed = pack_targets(normalizer.transform(f))
        if perm_host is not None:
            packed = packed[perm_host]
        targets[i, : packed.shape[0]] = packed

    return FlowDataset(
        graph=graph,
        targets=targets,
        raw_fields=[f for _, f in usable],
        time_dirs=[td for td, _ in usable],
        normalizer=normalizer,
        mesh=mesh,
        case_path=str(case_path),
    )
