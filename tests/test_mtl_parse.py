"""MTL parser (functions/textstats.parse_mtl_lines) vs a literal
transcription of tools/sensors.py:11 read_landsat_mtl_to_dict."""

import numpy as np

from rsgislib_ray.functions.textstats import parse_mtl_lines


def _ref_parse(text):
    header_params = {}
    c_dict = None
    for line in text.split("\n"):
        line = line.strip()
        if line:
            line_vals = line.split("=")
            if len(line_vals) == 2:
                if line_vals[0].strip() == "GROUP":
                    c_dict = {}
                    header_params[line_vals[1].strip()] = c_dict
                elif line_vals[0].strip() != "END_GROUP":
                    c_dict[line_vals[0].strip()] = (
                        line_vals[1].strip().replace('"', "")
                    )
    return header_params


TRICKY = """GROUP = OUTER
  SOME_KEY = before_nested
  GROUP = INNER
    A = "quoted value"
    B =  padded
    JUNK = X=Y
    END
  END_GROUP = INNER
  GROUP = AFTER
    C = 1.5
  END_GROUP = AFTER
END_GROUP = OUTER"""


def test_parser_matches_reference_transcription():
    want = _ref_parse(TRICKY)
    got = parse_mtl_lines(np.array([7], np.int64), [TRICKY])
    gd = {}
    for r in got.to_pylist():
        gd.setdefault(r["grp"], {})[r["key"]] = r["val"]
    # groups that end up EMPTY in the reference dict have no rows in
    # the long form — compare the non-empty projection
    assert gd == {k: v for k, v in want.items() if v}
    # quirk checks: OUTER kept one key (before the nested GROUP),
    # JUNK (two '=') skipped, quotes stripped, padding stripped
    assert want["OUTER"] == {"SOME_KEY": "before_nested"}
    assert gd["INNER"] == {"A": "quoted value", "B": "padded"}
    assert gd["AFTER"] == {"C": "1.5"}


def test_parser_multidoc_isolation():
    t1 = "GROUP = G1\n  K = 1\nEND_GROUP = G1"
    t2 = "GROUP = G2\n  K = 2\nEND_GROUP = G2"
    got = parse_mtl_lines(
        np.array([1, 2], np.int64), [t1, t2]
    ).to_pylist()
    assert got == [
        {"doc_id": 1, "grp": "G1", "key": "K", "val": "1"},
        {"doc_id": 2, "grp": "G2", "key": "K", "val": "2"},
    ]


def test_sen2_mtd_parse_quirks():
    """read_sen2_l2a_mtd_to_dict keeps the reference quirks: only the
    FIRST Granule_List is read, the Scene_Classification INDEX stays
    a string, optional Wavelength/Spectral_Response blocks are
    per-band, unknown tags are skipped, and the flat row count is
    stable."""
    from rsgislib_ray.functions.sensors import (
        build_sen2_l2a_mtd_xml,
        read_sen2_l2a_mtd_to_dict,
        sen2_mtd_flat_rows,
    )

    d = read_sen2_l2a_mtd_to_dict(build_sen2_l2a_mtd_xml())
    gl = d["Product_Info"]["Product_Organisation"]["Granule_List"]
    assert len(gl) == 2
    assert all("IGNORED" not in g["granuleIdentifier"] for g in gl)
    assert gl[0]["IMAGE_FILES"][0].startswith("GRANULE/")
    pic = d["Product_Image_Characteristics"]
    assert pic["Scene_Classification"]["SC_WATER"] == "6"
    assert isinstance(pic["Scene_Classification"]["SC_WATER"], str)
    assert pic["Special_Values"]["SATURATED"] == 65535
    sil = pic["Spectral_Information_List"]
    assert "Wavelength" not in sil[2]
    assert "Spectral_Response" not in sil[1]
    assert sil[3]["Spectral_Response"]["Values"] == [0.1, 0.7]
    assert d["Band_LUT"]["Physical_Band"]["B8A"] == 3
    assert d["Band_LUT"]["Band_ID"][0] == "B1"
    import datetime

    assert pic["Quantification_values"]["BOA_QUANTIFICATION_VALUE"] == 10000
    assert isinstance(
        d["Product_Info"]["PRODUCT_START_TIME"], datetime.datetime
    )
    assert len(sen2_mtd_flat_rows(d)) == 78
