"""Native C++ tokenizer tests (build on demand; skip if no toolchain)."""

import numpy as np
import pytest

from gnn_bfs_rans_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_parse_doubles():
    out = native.parse_doubles("1.5 -2e-3 (3.25 4) 7;", 10)
    np.testing.assert_allclose(out, [1.5, -0.002, 3.25, 4.0, 7.0])


def test_parse_labels():
    out = native.parse_labels("12 (34 -5) 6", 10)
    np.testing.assert_array_equal(out, [12, 34, -5, 6])


def test_parse_faces_mixed():
    body = "3(0 1 2) 4(3 4 5 6) 3(7 8 9)"
    offsets, points = native.parse_faces(body, 3, 100)
    assert offsets[:4].tolist() == [0, 3, 7, 10]
    assert points.tolist() == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_mixed_face_list_via_tokenizer():
    """Tokenizer routes mixed-size faceLists through the native walker."""
    from gnn_bfs_rans_tpu.foam.tokenizer import parse_face_list, parse_face_list_fast

    body = "4 ( 3(0 1 2) 4(3 4 5 6) 3(7 8 9) 5(1 2 3 4 5) )"
    off_fast, pts_fast = parse_face_list_fast(body)
    off_ref, pts_ref = parse_face_list(body)
    np.testing.assert_array_equal(off_fast, off_ref)
    np.testing.assert_array_equal(pts_fast, pts_ref)


def test_native_matches_numpy_on_real_faces(bfs_case):
    from gnn_bfs_rans_tpu.foam.tokenizer import strip_header

    body = strip_header(
        (bfs_case.mesh_path / "faces").read_text()
    )
    import re

    m = re.search(r"(\d+)\s*\(", body)
    n_faces = int(m.group(1))
    result = native.parse_faces(body[m.end():], n_faces, 4 * n_faces + 10)
    assert result is not None
    offsets, points = result
    assert len(offsets) == n_faces + 1
    assert offsets[-1] == len(points)
    # cross-check vs the numpy uniform fast path
    from gnn_bfs_rans_tpu.foam.tokenizer import parse_face_list_fast

    off2, pts2 = parse_face_list_fast(body)
    np.testing.assert_array_equal(offsets, off2)
    np.testing.assert_array_equal(points, pts2)
