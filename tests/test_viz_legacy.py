"""Legacy grid-interpolated contour plot (viz.fields.plot_field_2d_legacy).

Port of the pre-triangulation variant ``/root/reference/visualize.py:84-161``
— the last unported reference function (VERDICT r2 missing item 2).
"""

import numpy as np

from gnn_bfs_rans_tpu.viz.fields import plot_field_2d_legacy


def _fake_mesh(n=400, seed=0):
    rng = np.random.default_rng(seed)
    cc = np.column_stack([
        rng.uniform(0, 2, n), rng.uniform(0, 1, n), np.zeros(n)
    ])
    return cc


def test_scalar_field_png(tmp_path):
    cc = _fake_mesh()
    vals = np.sin(cc[:, 0]) * np.cos(cc[:, 1])
    out = tmp_path / "p_legacy.png"
    fig, ax = plot_field_2d_legacy(cc, vals, "p", "Pressure (legacy)",
                                   output_path=out)
    assert out.exists() and out.stat().st_size > 1000
    assert ax.get_title() == "Pressure (legacy)"
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_vector_field_collapses_to_magnitude(tmp_path):
    cc = _fake_mesh()
    u = np.column_stack([np.ones(len(cc)), np.zeros(len(cc)), np.zeros(len(cc))])
    out = tmp_path / "U_legacy.png"
    fig, _ = plot_field_2d_legacy(cc, u, "U", "Velocity (legacy)",
                                  output_path=out)
    assert out.exists()
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_constant_pressure_degenerate_norm(tmp_path):
    """The reference's TwoSlopeNorm crashes on constant fields; the port
    must fall back gracefully."""
    cc = _fake_mesh()
    vals = np.full(len(cc), 2.5)
    fig, _ = plot_field_2d_legacy(cc, vals, "p", "const",
                                  output_path=tmp_path / "c.png")
    import matplotlib.pyplot as plt

    plt.close(fig)
