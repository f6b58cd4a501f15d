"""Sensor-header parsers (tools/sensors.py surface).

``read_sen2_l2a_mtd_to_dict`` reimplements the reference's top-level
Sentinel-2 L2A MTD XML parse
(/root/reference/python/rsgislib/tools/sensors.py:44) from scratch
with the stdlib ElementTree: the same field set, the same type
conversions (datetimes via ``%Y-%m-%dT%H:%M:%S.%f`` after stripping
the Z, int/float casts where the reference casts, the
Scene_Classification INDEX kept as a STRING — a reference quirk), and
the same FIRST-Granule_List-only read (``find`` returns the first
match; later Granule_List tags are ignored, another reference quirk
kept).  Unknown Product_Image_Characteristics children are skipped
(the reference prints a notice; the dict is unaffected).

No network and no real ESA product is touched: the deterministic
fixture header built by ``build_sen2_l2a_mtd_xml`` exercises every
branch (optional Wavelength / Spectral_Response blocks included and
omitted, the ignored second Granule_List, an unknown tag)."""

from __future__ import annotations

import datetime
import xml.etree.ElementTree as ET

_NS = "https://psd-14.sentinel2.eo.esa.int/PSD/User_Product_Level-2A.xsd"
_EPOCH = datetime.datetime(1970, 1, 1)


def build_sen2_l2a_mtd_xml() -> str:
    """Deterministic synthetic MTD_MSIL2A header (fixture contract —
    the SQL oracle embeds the identical literal)."""
    bands = [
        # bandId, physicalBand, resolution, wl (or None), resp (or None)
        (0, "B1", 60, (412.0, 456.0, 442.7), (1.0, [0.01, 0.05, 0.8])),
        (1, "B2", 10, (456.0, 533.0, 492.4), None),
        (2, "B3", 10, None, (1.0, [0.02, 0.9, 0.02])),
        (3, "B8A", 20, (848.0, 881.0, 864.7), (2.0, [0.1, 0.7])),
    ]
    spec = []
    for bid, pb, res, wl, resp in bands:
        w = ""
        if wl is not None:
            w = (
                f"<Wavelength><MIN>{wl[0]}</MIN><MAX>{wl[1]}</MAX>"
                f"<CENTRAL>{wl[2]}</CENTRAL></Wavelength>"
            )
        r = ""
        if resp is not None:
            vals = " ".join(str(v) for v in resp[1])
            r = (
                f"<Spectral_Response><STEP>{resp[0]}</STEP>"
                f"<VALUES>{vals}</VALUES></Spectral_Response>"
            )
        spec.append(
            f'<Spectral_Information bandId="{bid}" physicalBand="{pb}">'
            f"<RESOLUTION>{res}</RESOLUTION>{w}{r}"
            f"</Spectral_Information>"
        )
    grans = []
    for g in range(2):
        files = "".join(
            f"<IMAGE_FILE>GRANULE/L2A_T30UVD_A04062{g}/IMG_DATA/"
            f"R10m/T30UVD_B0{j + 2}_10m</IMAGE_FILE>"
            for j in range(3)
        )
        grans.append(
            f'<Granule datastripIdentifier="DS_2APS_2023040{5 + g}"'
            f' granuleIdentifier="L1C_T30UVD_A04062{g}"'
            f' imageFormat="JPEG2000">{files}</Granule>'
        )
    solar = "".join(
        f'<SOLAR_IRRADIANCE bandId="{b}" unit="W/m2/um">'
        f"{1913.57 - 7 * b}</SOLAR_IRRADIANCE>"
        for b in range(4)
    )
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<n1:Level-2A_User_Product xmlns:n1="{_NS}">
<n1:General_Info>
<Product_Info>
<PRODUCT_START_TIME>2023-04-05T10:20:30.123456Z</PRODUCT_START_TIME>
<PRODUCT_STOP_TIME>2023-04-05T10:25:30.654321Z</PRODUCT_STOP_TIME>
<PRODUCT_URI>S2A_MSIL2A_20230405T102030_N0509_R122_T30UVD.SAFE</PRODUCT_URI>
<PROCESSING_LEVEL>Level-2A</PROCESSING_LEVEL>
<PRODUCT_TYPE>S2MSI2A</PRODUCT_TYPE>
<PROCESSING_BASELINE>05.09</PROCESSING_BASELINE>
<GENERATION_TIME>2023-04-05T15:00:00.000001Z</GENERATION_TIME>
<PREVIEW_IMAGE_URL>Not applicable</PREVIEW_IMAGE_URL>
<PREVIEW_GEO_INFO>Not applicable</PREVIEW_GEO_INFO>
<Datatake datatakeIdentifier="GS2A_20230405T102030_040624_N05.09">
<SPACECRAFT_NAME>Sentinel-2A</SPACECRAFT_NAME>
<DATATAKE_TYPE>INS-NOBS</DATATAKE_TYPE>
<DATATAKE_SENSING_START>2023-04-05T10:20:30.024000Z</DATATAKE_SENSING_START>
<SENSING_ORBIT_NUMBER>122</SENSING_ORBIT_NUMBER>
<SENSING_ORBIT_DIRECTION>DESCENDING</SENSING_ORBIT_DIRECTION>
</Datatake>
<Query_Options>
<PRODUCT_FORMAT>SAFE_COMPACT</PRODUCT_FORMAT>
</Query_Options>
<Product_Organisation>
<Granule_List>{''.join(grans)}</Granule_List>
<Granule_List><Granule datastripIdentifier="DS_IGNORED"
 granuleIdentifier="L1C_IGNORED" imageFormat="JPEG2000">
<IMAGE_FILE>GRANULE/IGNORED</IMAGE_FILE></Granule></Granule_List>
</Product_Organisation>
</Product_Info>
<Product_Image_Characteristics>
<Special_Values>
<SPECIAL_VALUE_TEXT>NODATA</SPECIAL_VALUE_TEXT>
<SPECIAL_VALUE_INDEX>0</SPECIAL_VALUE_INDEX>
</Special_Values>
<Special_Values>
<SPECIAL_VALUE_TEXT>SATURATED</SPECIAL_VALUE_TEXT>
<SPECIAL_VALUE_INDEX>65535</SPECIAL_VALUE_INDEX>
</Special_Values>
<Image_Display_Order>
<RED_CHANNEL>4</RED_CHANNEL>
<GREEN_CHANNEL>3</GREEN_CHANNEL>
<BLUE_CHANNEL>2</BLUE_CHANNEL>
</Image_Display_Order>
<QUANTIFICATION_VALUES_LIST>
<BOA_QUANTIFICATION_VALUE unit="none">10000</BOA_QUANTIFICATION_VALUE>
<AOT_QUANTIFICATION_VALUE unit="none">1000.0</AOT_QUANTIFICATION_VALUE>
<WVP_QUANTIFICATION_VALUE unit="cm">1000.0</WVP_QUANTIFICATION_VALUE>
</QUANTIFICATION_VALUES_LIST>
<Reflectance_Conversion>
<U>1.00393</U>
<Solar_Irradiance_List>{solar}</Solar_Irradiance_List>
</Reflectance_Conversion>
<Spectral_Information_List>{''.join(spec)}</Spectral_Information_List>
<PHYSICAL_GAINS bandId="0">3.97083</PHYSICAL_GAINS>
<PHYSICAL_GAINS bandId="1">4.01812</PHYSICAL_GAINS>
<Scene_Classification_List>
<Scene_Classification_ID>
<SCENE_CLASSIFICATION_TEXT>SC_NODATA</SCENE_CLASSIFICATION_TEXT>
<SCENE_CLASSIFICATION_INDEX>0</SCENE_CLASSIFICATION_INDEX>
</Scene_Classification_ID>
<Scene_Classification_ID>
<SCENE_CLASSIFICATION_TEXT>SC_VEGETATION</SCENE_CLASSIFICATION_TEXT>
<SCENE_CLASSIFICATION_INDEX>4</SCENE_CLASSIFICATION_INDEX>
</Scene_Classification_ID>
<Scene_Classification_ID>
<SCENE_CLASSIFICATION_TEXT>SC_WATER</SCENE_CLASSIFICATION_TEXT>
<SCENE_CLASSIFICATION_INDEX>6</SCENE_CLASSIFICATION_INDEX>
</Scene_Classification_ID>
</Scene_Classification_List>
<UNKNOWN_EXTRA_TAG>ignored</UNKNOWN_EXTRA_TAG>
</Product_Image_Characteristics>
</n1:General_Info>
</n1:Level-2A_User_Product>"""


def _dt(s: str) -> datetime.datetime:
    return datetime.datetime.strptime(
        s.strip().replace("Z", ""), "%Y-%m-%dT%H:%M:%S.%f"
    )


def read_sen2_l2a_mtd_to_dict(xml_text: str) -> dict:
    """Parse an MTD_MSIL2A header string (sensors.py:44 semantics —
    see the module docstring for the kept quirks)."""
    root = ET.fromstring(xml_text)
    gi = root.find(f"{{{_NS}}}General_Info")
    if gi is None:
        raise ValueError("Cannot open top level section 'General_Info'")
    pi = gi.find("Product_Info")
    if pi is None:
        raise ValueError("Product Info Tag is None")
    out: dict = {"Product_Info": {}}
    opi = out["Product_Info"]
    opi["PRODUCT_START_TIME"] = _dt(pi.find("PRODUCT_START_TIME").text)
    opi["PRODUCT_STOP_TIME"] = _dt(pi.find("PRODUCT_STOP_TIME").text)
    for f in (
        "PRODUCT_URI",
        "PROCESSING_LEVEL",
        "PRODUCT_TYPE",
        "PROCESSING_BASELINE",
    ):
        opi[f] = pi.find(f).text.strip()
    opi["GENERATION_TIME"] = _dt(pi.find("GENERATION_TIME").text)
    for f in ("PREVIEW_IMAGE_URL", "PREVIEW_GEO_INFO"):
        opi[f] = pi.find(f).text.strip()
    dt_tag = pi.find("Datatake")
    if dt_tag is None:
        raise ValueError("Data Take Tag is None")
    opi["datatake"] = {
        "datatakeIdentifier": dt_tag.attrib["datatakeIdentifier"].strip(),
        "SPACECRAFT_NAME": dt_tag.find("SPACECRAFT_NAME").text.strip(),
        "DATATAKE_TYPE": dt_tag.find("DATATAKE_TYPE").text.strip(),
        "DATATAKE_SENSING_START": _dt(
            dt_tag.find("DATATAKE_SENSING_START").text
        ),
        "SENSING_ORBIT_NUMBER": dt_tag.find(
            "SENSING_ORBIT_NUMBER"
        ).text.strip(),
        "SENSING_ORBIT_DIRECTION": dt_tag.find(
            "SENSING_ORBIT_DIRECTION"
        ).text.strip(),
    }
    qo = pi.find("Query_Options")
    if qo is None:
        raise ValueError("Query Options Tag is None")
    opi["Query_Options"] = {
        "PRODUCT_FORMAT": qo.find("PRODUCT_FORMAT").text.strip()
    }
    po = pi.find("Product_Organisation")
    if po is None:
        raise ValueError("Product Organisation Tag is None")
    opi["Product_Organisation"] = {"Granule_List": []}
    gl = po.find("Granule_List")  # FIRST list only (reference quirk)
    if gl is None:
        raise ValueError("Granule list Tag is None")
    for g in gl:
        if g.tag != "Granule":
            continue
        gd = {
            "datastripIdentifier": g.attrib["datastripIdentifier"].strip(),
            "granuleIdentifier": g.attrib["granuleIdentifier"].strip(),
            "imageFormat": g.attrib["imageFormat"].strip(),
            "IMAGE_FILES": [
                c.text.strip() for c in g if c.tag == "IMAGE_FILE"
            ],
        }
        opi["Product_Organisation"]["Granule_List"].append(gd)
    pic_tag = gi.find("Product_Image_Characteristics")
    if pic_tag is None:
        raise ValueError("Product Image Characteristics Tag is None")
    pic: dict = {
        "Special_Values": {},
        "Image_Display_Order": {},
        "Quantification_values": {},
        "Reflectance_Conversion": {"Solar_Irradiance": {}},
        "Spectral_Information_List": {},
        "Physical_Gains": {},
        "Scene_Classification": {},
    }
    out["Product_Image_Characteristics"] = pic
    out["Band_LUT"] = {"Physical_Band": {}, "Band_ID": {}}
    for ch in pic_tag:
        if ch.tag == "Special_Values":
            pic["Special_Values"][
                ch.find("SPECIAL_VALUE_TEXT").text.strip()
            ] = int(ch.find("SPECIAL_VALUE_INDEX").text.strip())
        elif ch.tag == "Image_Display_Order":
            for f in ("RED_CHANNEL", "GREEN_CHANNEL", "BLUE_CHANNEL"):
                pic["Image_Display_Order"][f] = int(
                    ch.find(f).text.strip()
                )
        elif ch.tag == "QUANTIFICATION_VALUES_LIST":
            pic["Quantification_values"]["BOA_QUANTIFICATION_VALUE"] = (
                int(ch.find("BOA_QUANTIFICATION_VALUE").text.strip())
            )
            for f in (
                "AOT_QUANTIFICATION_VALUE",
                "WVP_QUANTIFICATION_VALUE",
            ):
                pic["Quantification_values"][f] = float(
                    ch.find(f).text.strip()
                )
        elif ch.tag == "Reflectance_Conversion":
            pic["Reflectance_Conversion"]["U"] = float(
                ch.find("U").text.strip()
            )
            for si in ch.find("Solar_Irradiance_List"):
                if si.tag == "SOLAR_IRRADIANCE":
                    pic["Reflectance_Conversion"]["Solar_Irradiance"][
                        int(si.attrib["bandId"].strip())
                    ] = float(si.text.strip())
        elif ch.tag == "Spectral_Information_List":
            for si in ch:
                if si.tag != "Spectral_Information":
                    continue
                bid = int(si.attrib["bandId"].strip())
                pb = si.attrib["physicalBand"].strip()
                out["Band_LUT"]["Physical_Band"][pb] = bid
                out["Band_LUT"]["Band_ID"][bid] = pb
                d: dict = {
                    "RESOLUTION": int(si.find("RESOLUTION").text.strip())
                }
                wl = si.find("Wavelength")
                if wl is not None:
                    d["Wavelength"] = {
                        f: float(wl.find(f).text.strip())
                        for f in ("MIN", "MAX", "CENTRAL")
                    }
                sr = si.find("Spectral_Response")
                if sr is not None:
                    d["Spectral_Response"] = {
                        "STEP": float(sr.find("STEP").text.strip()),
                        "Values": [
                            float(v)
                            for v in sr.find("VALUES")
                            .text.strip()
                            .split(" ")
                        ],
                    }
                pic["Spectral_Information_List"][bid] = d
        elif ch.tag == "PHYSICAL_GAINS":
            pic["Physical_Gains"][int(ch.attrib["bandId"].strip())] = (
                float(ch.text.strip())
            )
        elif ch.tag == "Scene_Classification_List":
            for sc in ch:
                if sc.tag == "Scene_Classification_ID":
                    pic["Scene_Classification"][
                        sc.find("SCENE_CLASSIFICATION_TEXT").text.strip()
                    ] = sc.find(
                        "SCENE_CLASSIFICATION_INDEX"
                    ).text.strip()  # kept as str (reference quirk)
    return out


def _us(dt: datetime.datetime) -> int:
    d = dt - _EPOCH
    return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds


def sen2_mtd_flat_rows(d: dict) -> list[tuple[str, str, float | None]]:
    """Flatten the header dict to (path, val_str, val_num) rows:
    val_num carries numeric conversions (datetimes as epoch
    microseconds), val_str the string form the dict holds (datetimes
    as ISO text)."""
    rows: list[tuple[str, str, float | None]] = []

    def s(path: str, v) -> None:
        rows.append((path, str(v), None))

    def n(path: str, v) -> None:
        rows.append((path, str(v), float(v)))

    def t(path: str, v: datetime.datetime) -> None:
        rows.append((path, v.isoformat(), float(_us(v))))

    pi = d["Product_Info"]
    for f in ("PRODUCT_START_TIME", "PRODUCT_STOP_TIME",
              "GENERATION_TIME"):
        t(f"pi/{f}", pi[f])
    for f in ("PRODUCT_URI", "PROCESSING_LEVEL", "PRODUCT_TYPE",
              "PROCESSING_BASELINE", "PREVIEW_IMAGE_URL",
              "PREVIEW_GEO_INFO"):
        s(f"pi/{f}", pi[f])
    dt_d = pi["datatake"]
    for f in ("datatakeIdentifier", "SPACECRAFT_NAME", "DATATAKE_TYPE",
              "SENSING_ORBIT_NUMBER", "SENSING_ORBIT_DIRECTION"):
        s(f"pi/datatake/{f}", dt_d[f])
    t("pi/datatake/DATATAKE_SENSING_START",
      dt_d["DATATAKE_SENSING_START"])
    s("pi/query_options/PRODUCT_FORMAT",
      pi["Query_Options"]["PRODUCT_FORMAT"])
    for i, g in enumerate(pi["Product_Organisation"]["Granule_List"]):
        for f in ("datastripIdentifier", "granuleIdentifier",
                  "imageFormat"):
            s(f"pi/org/granule/{i}/{f}", g[f])
        for j, im in enumerate(g["IMAGE_FILES"]):
            s(f"pi/org/granule/{i}/image_file/{j}", im)
    pic = d["Product_Image_Characteristics"]
    for k, v in pic["Special_Values"].items():
        n(f"pic/special/{k}", v)
    for k, v in pic["Image_Display_Order"].items():
        n(f"pic/display/{k}", v)
    for k, v in pic["Quantification_values"].items():
        n(f"pic/quant/{k}", v)
    n("pic/refl_conv/U", pic["Reflectance_Conversion"]["U"])
    for b, v in pic["Reflectance_Conversion"]["Solar_Irradiance"].items():
        n(f"pic/refl_conv/solar_irradiance/{b}", v)
    for b, sd in pic["Spectral_Information_List"].items():
        n(f"pic/spectral/{b}/RESOLUTION", sd["RESOLUTION"])
        if "Wavelength" in sd:
            for f, v in sd["Wavelength"].items():
                n(f"pic/spectral/{b}/wavelength/{f}", v)
        if "Spectral_Response" in sd:
            n(f"pic/spectral/{b}/response/STEP",
              sd["Spectral_Response"]["STEP"])
            for j, v in enumerate(sd["Spectral_Response"]["Values"]):
                n(f"pic/spectral/{b}/response/val/{j}", v)
    for b, v in pic["Physical_Gains"].items():
        n(f"pic/physical_gains/{b}", v)
    for k, v in pic["Scene_Classification"].items():
        s(f"pic/scene_class/{k}", v)
    for k, v in d["Band_LUT"]["Physical_Band"].items():
        n(f"band_lut/physical_band/{k}", v)
    for k, v in d["Band_LUT"]["Band_ID"].items():
        s(f"band_lut/band_id/{k}", v)
    return rows
