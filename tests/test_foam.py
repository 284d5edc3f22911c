"""Parser tests against the bundled BFS case's golden numbers (SURVEY.md §4)."""

import numpy as np
import pytest

from gnn_bfs_rans_tpu.foam import FoamCase, save_fields_openfoam_format
from gnn_bfs_rans_tpu.foam.tokenizer import (
    parse_face_list,
    parse_face_list_fast,
    parse_label_list,
    parse_scalar_list,
    parse_vector_list,
    strip_header,
)


class TestTokenizer:
    def test_strip_header_removes_foamfile_ints(self):
        content = (
            "/* banner 1 2 3 */\n"
            "FoamFile\n{\n    version 2.0;\n    note \"nCells:12225\";\n}\n"
            "// comment 99\n"
            "3\n(\n7\n8\n9\n)\n"
        )
        vals = parse_label_list(strip_header(content))
        assert vals.tolist() == [7, 8, 9]

    def test_scalar_list_stops_at_count(self):
        body = "4 ( 1.5 2.5 -3e-2 4 ) ; boundaryField { 77 }"
        vals = parse_scalar_list(body)
        np.testing.assert_allclose(vals, [1.5, 2.5, -0.03, 4.0])

    def test_vector_list(self):
        body = "2 ( (1 2 3) (4 5 6) )"
        vals = parse_vector_list(body)
        np.testing.assert_allclose(vals, [[1, 2, 3], [4, 5, 6]])

    def test_face_list_mixed_sizes(self):
        body = "3 ( 3(0 1 2) 4(3 4 5 6) 3(7 8 9) )"
        off, pts = parse_face_list(body)
        assert off.tolist() == [0, 3, 7, 10]
        assert pts.tolist() == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
        off2, pts2 = parse_face_list_fast(body)
        assert off2.tolist() == off.tolist()
        assert pts2.tolist() == pts.tolist()

    def test_face_list_uniform_fast_path(self):
        body = "2 ( 4(0 1 2 3) 4(4 5 6 7) )"
        off, pts = parse_face_list_fast(body)
        assert off.tolist() == [0, 4, 8]
        assert pts.tolist() == list(range(8))


class TestBFSCaseGoldenNumbers:
    """The bug the reference had (header ints ingested) must NOT reproduce."""

    def test_mesh_counts(self, bfs_mesh):
        assert bfs_mesh.n_points == 25012
        assert bfs_mesh.n_faces == 49180
        assert bfs_mesh.n_internal_faces == 24170
        assert bfs_mesh.n_cells == 12225          # not 49181 (quirk 1 fixed)
        assert bfs_mesh.n_internal_cells == 12225

    def test_boundary_patches(self, bfs_mesh):
        b = bfs_mesh.boundaries
        assert set(b) == {"inlet", "outlet", "upperWall", "lowerWall", "frontAndBack"}
        assert b["inlet"].n_faces == 30 and b["inlet"].start_face == 24170
        assert b["frontAndBack"].type == "empty"
        assert b["frontAndBack"].n_faces == 24450
        total_boundary = sum(p.n_faces for p in b.values())
        assert total_boundary + bfs_mesh.n_internal_faces == bfs_mesh.n_faces

    def test_owner_neighbour_pairing(self, bfs_mesh):
        # owner < neighbour for internal faces is the OpenFOAM convention
        n_int = bfs_mesh.n_internal_faces
        assert (bfs_mesh.owner[:n_int] < bfs_mesh.neighbour).all()
        assert bfs_mesh.owner.max() == 12224
        assert bfs_mesh.neighbour.max() == 12224

    def test_cell_centers_match_blockmesh_domain(self, bfs_mesh):
        cc = bfs_mesh.cell_centers
        assert cc.shape == (12225, 3)
        # domain x∈[-0.0206, 0.29] (check_coordinates.py expectation)
        assert -0.0206 < cc[:, 0].min() < -0.015
        assert 0.28 < cc[:, 0].max() < 0.29
        # single-cell extrusion: centers on the z=0 midplane
        np.testing.assert_allclose(cc[:, 2], 0.0, atol=1e-12)

    def test_nonuniform_fields(self, bfs_case):
        fields = bfs_case.load_fields("282")
        assert set(fields) == {"U", "p", "k", "epsilon", "nut"}
        assert fields["U"].shape == (12225, 3)
        for name in ("p", "k", "epsilon", "nut"):
            assert fields[name].shape == (12225,)
        # spot values from the file (282/U first row, 282/p first row)
        np.testing.assert_allclose(fields["U"][0], [9.84118, -0.956371, 0.0])
        np.testing.assert_allclose(fields["p"][0], -1.70933)

    def test_uniform_fields_expand(self, bfs_case):
        """Quirk 2 fixed: t=0 uniform fields load instead of being skipped."""
        fields = bfs_case.load_fields("0", n_cells=12225)
        assert fields["U"].shape == (12225, 3)
        np.testing.assert_allclose(fields["k"], 0.375)
        np.testing.assert_allclose(fields["epsilon"], 14.855)
        np.testing.assert_allclose(fields["U"], 0.0)

    def test_available_time_dirs(self, bfs_case):
        dirs = bfs_case.available_time_dirs()
        assert dirs == ["0", "100", "200", "282"]

    def test_missing_field_warns_not_raises(self, bfs_case):
        out = bfs_case.load_fields("282", fields=("U", "doesnotexist"))
        assert "U" in out and "doesnotexist" not in out
        with pytest.raises(FileNotFoundError):
            bfs_case.load_fields("282", fields=("doesnotexist",), strict=True)


class TestWriterRoundTrip:
    def test_roundtrip(self, bfs_case, tmp_path):
        fields = bfs_case.load_fields("282")
        shaped = {
            "U": fields["U"],
            "p": fields["p"].reshape(-1, 1),
            "k": fields["k"].reshape(-1, 1),
            "epsilon": fields["epsilon"].reshape(-1, 1),
            "nut": fields["nut"].reshape(-1, 1),
        }
        out = save_fields_openfoam_format(shaped, tmp_path, "predicted")
        assert (out / "U").exists()

        from gnn_bfs_rans_tpu.foam import FoamCase

        reread = FoamCase(tmp_path)
        u2 = reread.read_vector_field("predicted", "U")
        p2 = reread.read_scalar_field("predicted", "p")
        np.testing.assert_allclose(u2, fields["U"], rtol=1e-5, atol=1e-10)
        np.testing.assert_allclose(p2, fields["p"], rtol=1e-5, atol=1e-10)

    def test_dimensions_header(self, tmp_path):
        fields = {"epsilon": np.ones(4), "U": np.zeros((4, 3))}
        out = save_fields_openfoam_format(fields, tmp_path)
        text = (out / "epsilon").read_text()
        assert "dimensions      [0 2 -3 0 0 0 0];" in text
        assert "volScalarField" in text
        text_u = (out / "U").read_text()
        assert "dimensions      [0 1 -1 0 0 0 0];" in text_u
        assert "volVectorField" in text_u


class TestTokenizerFuzz:
    """Property tests: python and native parsers agree on random faceLists."""

    def test_random_mixed_faces_native_vs_python(self):
        from gnn_bfs_rans_tpu import native
        from gnn_bfs_rans_tpu.foam.tokenizer import (
            parse_face_list,
            parse_face_list_fast,
        )

        rng = np.random.default_rng(42)
        for trial in range(5):
            n_faces = int(rng.integers(1, 60))
            parts = []
            expected_pts = []
            offsets = [0]
            for _ in range(n_faces):
                k = int(rng.integers(3, 6))
                pts = rng.integers(0, 1000, size=k)
                parts.append(f"{k}({' '.join(map(str, pts))})")
                expected_pts.extend(pts.tolist())
                offsets.append(offsets[-1] + k)
            body = f"{n_faces} ( {' '.join(parts)} )"
            off_ref, pts_ref = parse_face_list(body)
            assert off_ref.tolist() == offsets
            assert pts_ref.tolist() == expected_pts
            off_fast, pts_fast = parse_face_list_fast(body)
            np.testing.assert_array_equal(off_fast, off_ref)
            np.testing.assert_array_equal(pts_fast, pts_ref)

    def test_scientific_notation_scalars(self):
        from gnn_bfs_rans_tpu.foam.tokenizer import parse_scalar_list

        body = "5 ( 1e-30 -2.5E+10 3.0e0 -4e-2 0.5 )"
        vals = parse_scalar_list(body)
        np.testing.assert_allclose(
            vals, [1e-30, -2.5e10, 3.0, -0.04, 0.5]
        )


class TestBoundaryParser:
    """Brace-balance-aware boundary parsing (VERDICT r3 item 7).

    The reference's flat regex (`openfoam_loader.py:94-112`, `[^{}]*`) cannot
    parse a patch entry containing a nested `{}` dictionary; ours must.
    """

    HEADER = (
        "FoamFile\n{\n    version     2.0;\n    format      ascii;\n"
        "    class       polyBoundaryMesh;\n    object      boundary;\n}\n"
    )

    def _write_boundary(self, tmp_path, body):
        pm = tmp_path / "constant" / "polyMesh"
        pm.mkdir(parents=True)
        (pm / "boundary").write_text(self.HEADER + body)
        # minimal sibling files so FoamCase paths resolve
        return tmp_path

    def test_nested_dict_patch(self, tmp_path):
        from gnn_bfs_rans_tpu.foam.reader import FoamCase

        body = """
3
(
    inlet
    {
        type            patch;
        nFaces          30;
        startFace       24170;
    }
    procBoundary0to1
    {
        type            processor;
        inGroups        1(processor);
        nFaces          57;
        startFace       24200;
        transform
        {
            type        coincidentFullMatch;
            origin      (0 0 0);
        }
        matchTolerance  0.0001;
    }
    walls
    {
        type            wall;
        nFaces          223;
        startFace       24257;
    }
)
"""
        case = FoamCase(self._write_boundary(tmp_path, body))
        patches = case.read_boundary()
        assert set(patches) == {"inlet", "procBoundary0to1", "walls"}
        p = patches["procBoundary0to1"]
        assert p.type == "processor"
        assert p.n_faces == 57 and p.start_face == 24200
        # the nested transform dict must not eat the trailing flat keys
        assert patches["walls"].n_faces == 223

    def test_deeply_nested_and_quoted_names(self, tmp_path):
        from gnn_bfs_rans_tpu.foam.reader import FoamCase

        body = """
1
(
    "wall.*"
    {
        type            wall;
        meta { a { b 1; } c 2; }
        nFaces          5;
        startFace       7;
    }
)
"""
        case = FoamCase(self._write_boundary(tmp_path, body))
        patches = case.read_boundary()
        assert patches["wall.*"].n_faces == 5

    def test_parse_foam_dict_structure(self):
        from gnn_bfs_rans_tpu.foam.reader import parse_foam_dict

        kv, sub = parse_foam_dict(
            "a 1;\nouter { x 2; inner { y 3; } z 4; }\nb 5;"
        )
        assert kv == {"a": "1", "b": "5"}
        assert sub["outer"]["x"] == "2"
        assert sub["outer"]["z"] == "4"
        assert sub["outer"]["inner.y"] == "3"

    def test_truncated_entry_ignored(self):
        from gnn_bfs_rans_tpu.foam.reader import parse_foam_dict

        kv, sub = parse_foam_dict("a 1;\nbroken { x 2;")
        assert kv["a"] == "1"
        assert "broken" not in sub

    def test_bfs_case_unchanged(self, bfs_mesh):
        # golden patch set from the bundled case still parses identically
        assert set(bfs_mesh.boundaries) == {
            "inlet", "outlet", "upperWall", "lowerWall", "frontAndBack",
        }


class TestReaderWriterFuzz:
    def test_generated_case_roundtrip(self, tmp_path):
        """Property: write fields for a generated case, re-read, bit-compare;
        and the generated boundary file parses with consistent face spans."""
        from gnn_bfs_rans_tpu.foam import FoamCase, save_fields_openfoam_format
        from gnn_bfs_rans_tpu.foam.casegen import generate_box_case

        rng = np.random.default_rng(7)
        case_dir = tmp_path / "box"
        generate_box_case(case_dir, nx=4, ny=3, nz=2)
        case = FoamCase(case_dir)
        mesh = case.load_mesh()
        n = mesh.n_cells

        for trial in range(3):
            fields = {
                "U": rng.normal(size=(n, 3)) * 10.0 ** float(rng.integers(-3, 3)),
                "p": rng.normal(size=(n, 1)),
                "k": np.abs(rng.normal(size=(n, 1))) * 1e-6,
                "epsilon": np.abs(rng.normal(size=(n, 1))) * 1e8,
                "nut": np.zeros((n, 1)),
            }
            out = save_fields_openfoam_format(
                fields, case_dir, f"fuzz{trial}")
            got_u = case.read_vector_field(f"fuzz{trial}", "U")
            got_p = case.read_scalar_field(f"fuzz{trial}", "p")
            got_eps = case.read_scalar_field(f"fuzz{trial}", "epsilon")
            np.testing.assert_allclose(got_u, fields["U"], rtol=1e-6)
            np.testing.assert_allclose(got_p, fields["p"][:, 0], rtol=1e-6)
            np.testing.assert_allclose(got_eps, fields["epsilon"][:, 0], rtol=1e-6)

        # boundary spans tile the non-internal face range exactly
        spans = sorted(
            (p.start_face, p.start_face + p.n_faces)
            for p in mesh.boundaries.values()
        )
        assert spans[0][0] == mesh.n_internal_faces
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c
        assert spans[-1][1] == mesh.n_faces
