"""Wavefront .obj parser tests (reference semantics: Geometry.hs:207-285)."""
import numpy as np
import pytest

from raytrace_tpu.scene.obj import ObjParseError, parse_obj, read_obj


def test_basic():
    m = parse_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    assert m.vertices.shape == (3, 3)
    assert m.faces.tolist() == [[0, 1, 2]]
    assert m.uv_faces.tolist() == [[-1, -1, -1]]


def test_comments_and_ignored_lines():
    m = parse_obj(
        "# header\nv 0 0 0 # inline\nv 1 0 0\nv 0 1 0\n"
        "vn 0 0 1\ng name\ns off\nf 1 2 3\n"
    )
    assert m.faces.tolist() == [[0, 1, 2]]


def test_fan_triangulation():
    m = parse_obj("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0 2 0\nf 1 2 3 4 5\n")
    # pairs: (1,2,3) (1,3,4) (1,4,5) zero-based
    assert m.faces.tolist() == [[0, 1, 2], [0, 2, 3], [0, 3, 4]]


def test_negative_indices():
    m = parse_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    assert m.faces.tolist() == [[0, 1, 2]]


def test_uv_indices_and_double_slash():
    m = parse_obj(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvt 1 0\nvt 0 1\n"
        "f 1/1 2/2 3/3\nf 1//1 2//2 3//3\n"
    )
    assert m.uv_faces.tolist() == [[0, 1, 2], [-1, -1, -1]]
    assert m.uv.shape == (3, 2)


def test_vt_single_number_defaults_v0():
    m = parse_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0.5\nf 1/1 2/1 3/1\n")
    assert m.uv.tolist() == [[0.5, 0.0]]


def test_extra_fields_ignored():
    m = parse_obj("v 1 2 3 1.0\nv 4 5 6\nv 7 8 9\nvt 0.1 0.2 0.3\nf 1 2 3\n")
    assert m.vertices[0].tolist() == [1.0, 2.0, 3.0]
    assert m.uv[0].tolist() == [0.1, 0.2]


@pytest.mark.parametrize("text,msg", [
    ("v 1 2\nf 1 1 1\n", "invalid 'v'"),
    ("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt x\nf 1 2 3\n", "invalid 'vt'"),
    ("v 0 0 0\nf 1 2 3\n", "out of bounds"),
    ("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2\n", "fewer than 3"),
    ("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 x\n", "expected number"),
])
def test_errors_with_line_numbers(text, msg):
    with pytest.raises(ObjParseError) as e:
        parse_obj(text)
    assert msg in str(e.value)
    assert "line " in str(e.value)


def test_read_reference_pawn():
    # real asset exercised by the reference suite (test/Main.hs:323-344)
    m = read_obj("/root/reference/images/pawn.obj")
    assert m.vertices.shape[0] == 602
    assert m.faces.shape[0] == 1200


def test_read_reference_bunny():
    m = read_obj("/root/reference/images/bunny.obj")
    assert m.vertices.shape[0] == 2503
    assert m.faces.shape[0] == 4968


def test_transform_vertices_and_bbox():
    m = parse_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    import raytrace_tpu as rt
    m2 = m.transform_vertices(rt.compose(rt.translate([1, 0, 0]), rt.scale(2)))
    assert m2.vertices.tolist() == [[1, 0, 0], [3, 0, 0], [1, 2, 0]]
    lo, hi = m2.bounding_box()
    assert lo.tolist() == [1, 0, 0]
    assert hi.tolist() == [3, 2, 0]


# ---- native (C++) parser parity -------------------------------------------
# parse_obj() prefers native/objparse.cpp when g++ is available; the
# grammar must match the Python implementation exactly.

def _both(text):
    return parse_obj(text, native=True), parse_obj(text, native=False)


def _native_available():
    from raytrace_tpu.native import obj_lib
    return obj_lib() is not None


pytestmark_native = pytest.mark.skipif(
    not _native_available(), reason="no C++ toolchain")


@pytestmark_native
@pytest.mark.parametrize("text", [
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
    "v 0 0 0\r\nv 1 0 0\rv 0 1 0\nf -3 -2 -1",          # mixed newlines
    "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n",  # fan
    "v 1e-3 +2.5 -3E2 9\nv 4 5 6\nv 7 8 9\nvt .5\nf 1/1 2//9 3\n",
    "v 1_0 2_5.5 0\nv 4 5 6\nv 7 8 9\nf 1 2 3\n",   # PEP 515 separators
    "  v 9 9 9\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",  # leading ws ignored
    "v 0 0 0 # c\nv 1 0 0\nv 0 1 0\nvt 0 1 5\nf\t1/1  2/1\t3/1\n",
    "f 1 2 3\nv 0 0 0\nv 1 0 0\nv 0 1 0\n",             # forward refs
])
def test_native_matches_python(text):
    mn, mp = _both(text)
    np.testing.assert_array_equal(mn.vertices, mp.vertices)
    np.testing.assert_array_equal(mn.uv, mp.uv)
    np.testing.assert_array_equal(mn.faces, mp.faces)
    np.testing.assert_array_equal(mn.uv_faces, mp.uv_faces)


@pytestmark_native
@pytest.mark.parametrize("text", [
    "v 1 2\nf 1 1 1\n",
    "v 0x1 0 0\nf 1 1 1\n",                   # hex floats rejected
    "v _1 0 0\nf 1 1 1\n",                    # bad separator position
    "v 1_ 0 0\nf 1 1 1\n",
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt x\nf 1 2 3\n",
    "v 0 0 0\nf 1 2 3\n",
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2\n",
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 x\n",
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3/9\n",  # uv out of bounds
])
def test_native_errors_match_python(text):
    with pytest.raises(ObjParseError) as en:
        parse_obj(text, native=True)
    with pytest.raises(ObjParseError) as ep:
        parse_obj(text, native=False)
    assert str(en.value) == str(ep.value)


@pytestmark_native
@pytest.mark.parametrize("path", ["/root/reference/images/pawn.obj",
                                  "/root/reference/images/bunny.obj"])
def test_native_matches_python_on_reference_assets(path):
    with open(path) as f:
        text = f.read()
    mn, mp = _both(text)
    np.testing.assert_array_equal(mn.vertices, mp.vertices)
    np.testing.assert_array_equal(mn.faces, mp.faces)
    np.testing.assert_array_equal(mn.uv_faces, mp.uv_faces)
