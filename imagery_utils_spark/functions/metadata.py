"""S7 — metadata-sidecar parsing (``get_attributes_from_xml``,
/root/reference/lib/mosaic.py:320-497) as an Arrow-batched pandas UDF.

Faithful semantics over a per-row XML string/binary column:

* the three vendor tag vocabularies (DG / GE / IKONOS) of
  /root/reference/lib/mosaic.py:334-369, searched with ``findall`` semantics;
* value coercion rules (:415-440): cloud-cover percentages divided by 100,
  'degrees' suffix stripped on IK angle tags, Source_Image_ID read from the
  ``id`` attribute, fixed sensor names for GE/IK vocabularies, float()
  otherwise;
* multi-value TDI selection by band layout (:451-463): 4 values -> [1];
  5 values -> [4] for pan / [1] for multi; 8 values -> [3];
* single-value tags assigned only when exactly one element matched (:469-473);
* derived ona = 90 - satel when the ona tag is empty (:482-486);
* acq date parsed with the two formats of :492-497.

Output is a typed struct column — the lazily-parsed scene attributes the
scoring operator consumes (the graft's geocode plays the same role for
pages; this parser covers the imagery-vocabulary side for parity).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import Column
from pyspark.sql import functions as F

# /root/reference/lib/mosaic.py:334-369 (incl. the 'Pachchromatic' typo)
D_TAGS = {
    "CATID": "catid", "SATID": "sensor", "CLOUDCOVER": "cc",
    "MEANSUNEL": "sunel", "MEANSUNAZ": "sunaz", "MEANSATEL": "satel",
    "MEANSATAZ": "sataz", "MEANOFFNADIRVIEWANGLE": "ona",
    "FIRSTLINETIME": "date", "TDILEVEL": "tdi",
    "archiveId": "catid", "satelliteName": "sensor", "percentCloudCover": "cc",
    "firstLineAzimuthAngle": "sataz", "firstLineSunAzimuthAngle": "sunaz",
    "firstLineSunElevationAngle": "sunel", "firstLineElevationAngle": "satel",
    "firstLineAcquisitionDateTime": "date", "tdiMode": "tdi",
    "Source_Image_ID": "catid", "Sensor": "sensor",
    "Percent_Component_Cloud_Cover": "cc", "Nominal_Collection_Azimuth": "sataz",
    "Nominal_Collection_Elevation": "satel", "Sun_Angle_Elevation": "sunel",
    "Sun_Angle_Azimuth": "sunaz", "Acquisition_Date_Time": "date",
    "Pachchromatic_TDI_Mode": "tdi",
}

_STR_TAGS = {"Acquisition_Date_Time", "FIRSTLINETIME",
             "firstLineAcquisitionDateTime", "CATID", "archiveId", "SATID"}
_PCT_TAGS = {"percentCloudCover", "Percent_Component_Cloud_Cover"}
_DEG_TAGS = {"Sun_Angle_Azimuth", "Sun_Angle_Elevation",
             "Nominal_Collection_Azimuth", "Nominal_Collection_Elevation"}

META_TYPE = T.StructType([
    T.StructField("catid", T.StringType()),
    T.StructField("sensor", T.StringType()),
    T.StructField("cloudcover", T.DoubleType()),
    T.StructField("sun_elev", T.DoubleType()),
    T.StructField("sun_az", T.DoubleType()),
    T.StructField("sat_elev", T.DoubleType()),
    T.StructField("sat_az", T.DoubleType()),
    T.StructField("off_nadir", T.DoubleType()),
    T.StructField("tdi", T.DoubleType()),
    T.StructField("acq_time", T.TimestampType()),
])


def parse_scene_metadata(xml_text: str, bands: int = 1) -> dict:
    """Single-document parse (unit-testable without Spark)."""
    attrs: dict = {k: None for k in
                   ("catid", "sensor", "cc", "sunel", "sunaz", "satel",
                    "sataz", "ona", "tdi", "date")}
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return attrs
    for tag, key in D_TAGS.items():
        elems = root.findall(f".//{tag}")
        vals = []
        for elem in elems:
            text = elem.text
            if text is None and tag != "Source_Image_ID":
                continue
            try:
                if tag in _STR_TAGS:
                    val = text
                elif tag == "Source_Image_ID":
                    val = elem.attrib["id"]
                elif tag in _PCT_TAGS:
                    val = float(text) / 100
                elif tag in _DEG_TAGS:
                    val = float(text.strip(" degres"))  # strip(" degrees") char-set
                elif tag == "satelliteName":
                    val = "GE01"
                elif tag == "Sensor":
                    val = "IK01"
                else:
                    val = float(text)
                vals.append(val)
            except Exception:
                continue
        if key == "tdi" and len(elems) > 1:
            if len(vals) == 4:
                attrs["tdi"] = vals[1]
            elif len(vals) == 5 and bands == 1:
                attrs["tdi"] = vals[4]
            elif len(vals) == 5 and bands in (3, 4):
                attrs["tdi"] = vals[1]
            elif len(vals) == 8:
                attrs["tdi"] = vals[3]
        elif key == "sensor" and len(elems) > 1 and vals:
            attrs["sensor"] = vals[0]
        elif len(elems) == 1 and vals:
            attrs[key] = vals[0]
    # derived ona (lib/mosaic.py:482-486)
    if not attrs["ona"] and attrs["satel"] is not None:
        attrs["ona"] = 90 - float(attrs["satel"])
    return attrs


def _parse_date(s):
    if not s:
        return None
    for fmt in ("%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%d %H:%M GMT"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def scene_metadata_udf(bands: int = 1):
    @F.pandas_udf(META_TYPE)
    def _parse(xml: pd.Series) -> pd.DataFrame:
        rows = []
        for doc in xml:
            if isinstance(doc, (bytes, bytearray)):
                doc = doc.decode("utf-8", "replace")
            a = parse_scene_metadata(doc or "", bands=bands)
            rows.append((
                a["catid"], a["sensor"],
                float(a["cc"]) if a["cc"] is not None else None,
                float(a["sunel"]) if a["sunel"] is not None else None,
                float(a["sunaz"]) if a["sunaz"] is not None else None,
                float(a["satel"]) if a["satel"] is not None else None,
                float(a["sataz"]) if a["sataz"] is not None else None,
                float(a["ona"]) if a["ona"] is not None else None,
                float(a["tdi"]) if a["tdi"] is not None else None,
                _parse_date(a["date"]),
            ))
        return pd.DataFrame(rows, columns=[f.name for f in META_TYPE.fields])

    return _parse


def with_scene_metadata(df, xml_col: str = "metadata_xml", bands: int = 1) -> "DataFrame":
    v = scene_metadata_udf(bands)(F.col(xml_col))
    out = df
    for f in META_TYPE.fields:
        out = out.withColumn(f.name, v[f.name])
    return out
