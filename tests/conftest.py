"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths (pjit/shard_map/psum) are exercised on fake CPU
devices per SURVEY.md §4 so CI needs no TPU pod.  Must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image pre-sets JAX_PLATFORMS=axon (tunneled TPU); the env assignment
# above can lose the race with plugin discovery, so force it via config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_CASE = "/root/reference/OpenFOAM-data"


@pytest.fixture(scope="session")
def bfs_case():
    from gnn_bfs_rans_tpu.foam import FoamCase

    return FoamCase(REFERENCE_CASE)


@pytest.fixture(scope="session")
def bfs_mesh(bfs_case):
    return bfs_case.load_mesh()


@pytest.fixture(scope="session")
def bfs_graph(bfs_mesh):
    from gnn_bfs_rans_tpu.graph import build_graph

    return build_graph(bfs_mesh)


@pytest.fixture(scope="session")
def tiny_graph():
    """A small random graph with known dense adjacency, for conv math tests."""
    from gnn_bfs_rans_tpu.graph.structs import build_padded_graph

    rng = np.random.default_rng(0)
    n = 23
    # random symmetric adjacency, no self loops
    adj = np.triu(rng.random((n, n)) < 0.25, k=1)
    adj = adj | adj.T
    src, dst = np.nonzero(adj)
    node_feat = rng.normal(size=(n, 3)).astype(np.float32)
    edge_feat = rng.normal(size=(len(src), 4)).astype(np.float32)
    g = build_padded_graph(
        src.astype(np.int32),
        dst.astype(np.int32),
        edge_feat,
        node_feat,
        node_align=32,
        edge_align=32,
        degree_align=4,
    )
    return g, adj
