"""Normalizer round-trip and loss-value tests (SURVEY.md §4 plan)."""

import jax.numpy as jnp
import numpy as np

from gnn_bfs_rans_tpu.train.normalization import (
    FieldNormalizer,
    pack_targets,
    unpack_fields,
    weighted_elementwise_mse,
    weighted_fieldwise_mse,
)


def _fake_fields(rng, n=100):
    return {
        "U": rng.normal(loc=[5, 0, 0], scale=[2, 0.5, 1e-20], size=(n, 3)),
        "p": rng.normal(loc=-3, scale=4, size=n),
        "k": rng.gamma(2.0, 1.0, size=n),
        "epsilon": rng.gamma(2.0, 10.0, size=n),
        "nut": rng.gamma(2.0, 0.01, size=n),
    }


class TestFieldNormalizer:
    def test_per_component_velocity(self):
        rng = np.random.default_rng(0)
        fields = _fake_fields(rng)
        norm = FieldNormalizer().fit(fields)
        s = norm.scalers["U"]
        assert s["per_component"] and s["mean"].shape == (3,)
        # z component has ~zero std → floored to 1.0
        assert s["std"][2] == 1.0
        t = norm.transform(fields)
        np.testing.assert_allclose(t["U"][:, 0].mean(), 0, atol=1e-10)
        np.testing.assert_allclose(t["U"][:, 0].std(), 1, rtol=1e-10)

    def test_round_trip(self):
        rng = np.random.default_rng(1)
        fields = _fake_fields(rng)
        norm = FieldNormalizer().fit(fields)
        rt = norm.inverse_transform(norm.transform(fields))
        for name in fields:
            np.testing.assert_allclose(rt[name], fields[name], rtol=1e-12)

    def test_json_round_trip(self, tmp_path):
        rng = np.random.default_rng(2)
        fields = _fake_fields(rng)
        norm = FieldNormalizer().fit(fields)
        norm.save(tmp_path / "norm.json")
        norm2 = FieldNormalizer.load(tmp_path / "norm.json")
        t1 = norm.transform(fields)
        t2 = norm2.transform(fields)
        for name in fields:
            np.testing.assert_allclose(t1[name], t2[name], rtol=1e-12)

    def test_packed_mean_std(self):
        rng = np.random.default_rng(3)
        fields = _fake_fields(rng)
        norm = FieldNormalizer().fit(fields)
        mean, std = norm.packed_mean_std()
        packed = pack_targets(fields)
        normalized = pack_targets(norm.transform(fields))
        np.testing.assert_allclose((packed - mean) / std, normalized, rtol=1e-10)

    def test_pack_unpack(self):
        rng = np.random.default_rng(4)
        fields = _fake_fields(rng)
        packed = pack_targets(fields)
        assert packed.shape == (100, 7)
        rt = unpack_fields(packed)
        np.testing.assert_allclose(rt["U"], fields["U"])
        np.testing.assert_allclose(rt["p"][:, 0], fields["p"])


class TestWeightedLoss:
    def _manual(self, pred, target, w=(1.0, 3.0, 0.5, 0.5, 0.5), pref=0.1):
        u = ((pred[:, :3] - target[:, :3]) ** 2).mean()
        p = ((pred[:, 3] - target[:, 3]) ** 2).mean()
        p = p + pref * (pred[:, 3].mean() - target[:, 3].mean()) ** 2
        k = ((pred[:, 4] - target[:, 4]) ** 2).mean()
        e = ((pred[:, 5] - target[:, 5]) ** 2).mean()
        n = ((pred[:, 6] - target[:, 6]) ** 2).mean()
        return w[0] * u + w[1] * p + w[2] * k + w[3] * e + w[4] * n

    def test_matches_manual_unpadded(self):
        rng = np.random.default_rng(5)
        pred = rng.normal(size=(50, 7))
        target = rng.normal(size=(50, 7))
        mask = np.ones(50, dtype=bool)
        loss = weighted_fieldwise_mse(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)
        )
        np.testing.assert_allclose(float(loss), self._manual(pred, target), rtol=1e-5)

    def test_padding_invariant(self):
        """Adding masked padding rows must not change the loss."""
        rng = np.random.default_rng(6)
        pred = rng.normal(size=(50, 7)).astype(np.float32)
        target = rng.normal(size=(50, 7)).astype(np.float32)
        loss0 = weighted_fieldwise_mse(
            jnp.asarray(pred), jnp.asarray(target), jnp.ones(50, bool)
        )
        pad = np.zeros((14, 7), np.float32)
        pred_p = np.concatenate([pred, pad + 99])  # garbage in padding
        target_p = np.concatenate([target, pad])
        mask = np.concatenate([np.ones(50, bool), np.zeros(14, bool)])
        loss1 = weighted_fieldwise_mse(
            jnp.asarray(pred_p), jnp.asarray(target_p), jnp.asarray(mask)
        )
        np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)

    def test_pressure_anchor_active(self):
        pred = np.zeros((10, 7), np.float32)
        target = np.zeros((10, 7), np.float32)
        pred[:, 3] = 1.0  # constant pressure offset
        mask = np.ones(10, bool)
        l_with = weighted_fieldwise_mse(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
            pressure_ref_weight=0.1,
        )
        l_without = weighted_fieldwise_mse(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
            pressure_ref_weight=0.0,
        )
        # mse term = 3.0 * 1.0; anchor adds 3.0 * 0.1 * 1.0
        np.testing.assert_allclose(float(l_without), 3.0, rtol=1e-6)
        np.testing.assert_allclose(float(l_with), 3.3, rtol=1e-6)

    def test_elementwise_mode(self):
        rng = np.random.default_rng(7)
        pred = rng.normal(size=(20, 7))
        target = rng.normal(size=(20, 7))
        w = np.array([1, 1, 1, 3, 0.5, 0.5, 0.5])
        expected = (((pred - target) ** 2) * w).mean()
        loss = weighted_elementwise_mse(
            jnp.asarray(pred), jnp.asarray(target), jnp.ones(20, bool)
        )
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
