"""S7 completion (VERDICT r2 ask #4) — GE/IK sidecar *content* parsers.

The reference turns GeoEye ``.pvl``/``.txt`` and IKONOS ``_metadata.txt``
text sidecars into searchable XML trees (``get_ge_metadata_as_xml``
/root/reference/lib/utils.py:296-371, ``get_ik_metadata_as_xml`` :372-519),
which the attribute vocabulary of ``functions.metadata`` then consumes.
These are the string-in/string-out analogs: no filesystem probes — content
arrives as a DataFrame column (from a files table / tar extraction), the
parse runs as an Arrow-batched pandas UDF, and the output XML feeds the
existing :func:`~imagery_utils_spark.functions.metadata.parse_scene_metadata`
vocabulary (GE tags ``satelliteName``/``percentCloudCover``/``firstLine*``,
IK tags ``Source_Image_ID``/``Sensor``/``Sun_Angle_*``/...), so all three
vendors' sidecars now resolve to the same typed attribute struct.

Semantics parity notes (each behavior cited to the reference):
* GE: ``tag = "value";`` pairs (utils.py:310), ``BEGIN_GROUP``/``END_GROUP``
  nesting (:342-354), group-attribute promotion for aoiGeoCoordinate /
  aoiMapCoordinate / bandSpecificInformation (:316-319, :356-358), and the
  multi-line ``tag = (...`` value accumulation INCLUDING its closing ``);``
  line (:326-334). The reference keeps scanning a multi-line body for
  ``tag = value;`` pairs (no ``continue`` after the mlstr branch,
  :327-360) — replicated faithfully.
* IK: top-level block names (:391), ID-attribute second-level blocks
  (:393), Coordinate blocks with id attributes (:476-487), coordinate-tag
  whitelists controlling when a block is popped (:394-408, :492-498),
  boilerplate-line ignores (:409-424), and space/slash/paren cleanup of
  tag names (:437, :455).
* Malformed input: the reference raises IndexError on an unbalanced stack;
  here a guard stops at root instead (a distributed parse must not kill the
  stage on one bad sidecar — the row degrades to whatever parsed).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------------- GE

_GE_PAIR = re.compile(r'(?P<tag>\w+) = "?(?P<data>.*?)"?;', re.I)
_GE_OPEN = re.compile(r"(?P<tag>\w+) = ", re.I)

# groups whose matching key/value becomes an attribute of the group element
# instead of a child node (utils.py:316-319)
_GE_GROUP_ATTRS = {
    "aoiGeoCoordinate": "coordinateNumber",
    "aoiMapCoordinate": "coordinateNumber",
    "bandSpecificInformation": "bandNumber",
}


def ge_text_to_xml(text: str) -> str:
    """GeoEye PVL-style sidecar text -> XML string (reference tree shape)."""
    root = ET.Element("root")
    current, parent = root, None
    stack: list = []
    ml_tag, ml_data = None, ""

    for line in (text or "").splitlines(keepends=True):
        if ml_tag is not None:
            ml_data += line.strip()
            if line.strip() == ");":
                ET.SubElement(current, ml_tag).text = ml_data
                ml_tag, ml_data = None, ""
        m = _GE_PAIR.search(line)
        if m:
            tag, data = m.group("tag").strip(), m.group("data").strip()
            if tag == "BEGIN_GROUP":
                child = ET.SubElement(current, data if data else "group")
                if parent is not None:
                    stack.append(parent)
                parent, current = current, child
            elif tag == "END_GROUP":
                current = parent if parent is not None else root
                parent = stack.pop() if stack else None
            elif _GE_GROUP_ATTRS.get(current.tag) == tag:
                current.set(tag, data)
            else:
                ET.SubElement(current, tag).text = data
        elif _GE_OPEN.search(line):
            ml_tag = _GE_OPEN.search(line).group("tag").strip()
            ml_data = ""
    return ET.tostring(root, encoding="unicode")


# ------------------------------------------------------------------- IK

_IK_PAIR = re.compile(r"(?P<tag>.+?): (?P<data>.+)?", re.I)
_IK_GROUP = re.compile(r"(?P<tag>[a-zA-Z ()]+)", re.I)

_IK_1L = ["Product_Order_Metadata", "Source_Image_Metadata",
          "Product_Space_Metadata", "Product_Component_Metadata"]
_IK_2L = ["Source_Image_ID", "Component_ID"]
_IK_COORD_TAGS = [
    "Latitude", "Longitude", "Map_X_Easting", "Map_Y_Northing",
    "UL_Map_X_Easting", "UL_Map_Y_Northing", "Pan_Cross_Scan",
    "Pan_Along_Scan", "MS_Cross_Scan", "MS_Along_Scan",
    "Hemisphere", "Zone_Number",
]
# coordinate-style blocks a vanilla tag pops out of (utils.py:492-495)
_IK_COORD_BLOCKS = ["Coordinate", "Component_Map_Coordinates_in_Map_Units",
                    "Acquired_Nominal_GSD", "UTM_Specific_Parameters"]
_IK_IGNORES = {
    "Company Information", "Address", "GeoEye", "12076 Grant Street",
    "Thornton, Colorado 80241", "U.S.A.", "Contact Information",
    "On the Web: http://www.geoeye.com",
    "Customer Service Phone (U.S.A.): 1.800.232.9037",
    "Customer Service Phone (World Wide): 1.703.480.5670",
    "Customer Service Fax (World Wide): 1.703.450.9570",
    "Customer Service Email: info@geoeye.com",
    "Customer Service Center hours of operation:",
    "Monday - Friday, 8:00 - 20:00 Eastern Standard Time",
}


def _clean_tag(s: str) -> str:
    return (s.strip().replace(" ", "_").replace("/", "_")
            .replace("(", "").replace(")", ""))


def ik_text_to_xml(text: str) -> str:
    """IKONOS metadata sidecar text -> XML string (reference tree shape)."""
    root = ET.Element("root")
    current, parent = root, None
    stack: list = []

    def pop_to(levels: list[str]) -> None:
        nonlocal current, parent
        while (current.tag not in levels and current.tag != "root"
               and parent is not None):
            current = parent
            parent = stack.pop() if stack else None

    for line in (text or "").splitlines(keepends=True):
        item = line.strip()
        if item in _IK_IGNORES:
            continue
        item = item.replace(" ", "_").replace("/", "_")
        if item in _IK_1L:
            child = ET.SubElement(root, item)
            stack.clear()
            parent, current = root, child
            continue
        m = _IK_PAIR.search(line)
        if m:
            tag = _clean_tag(m.group("tag"))
            data = (m.group("data") or "").strip()
            if tag in _IK_2L:
                pop_to(_IK_1L)
                child = ET.SubElement(current, tag)
                child.set("id", data)
                stack.append(parent)
                parent, current = current, child
            elif tag == "Coordinate":
                if current.tag == "Coordinate":
                    child = ET.SubElement(parent, tag)
                    child.set("id", data)
                    current = child
                else:
                    child = ET.SubElement(current, tag)
                    child.set("id", data)
                    stack.append(parent)
                    parent, current = current, child
            else:
                if tag not in _IK_COORD_TAGS and current.tag in _IK_COORD_BLOCKS:
                    pop_to(_IK_2L + _IK_1L)
                ET.SubElement(current, tag).text = data
        elif _IK_GROUP.search(line):
            tag = _clean_tag(_IK_GROUP.search(line).group("tag"))
            pop_to(_IK_2L + _IK_1L)
            child = ET.SubElement(current, tag)
            stack.append(parent)
            parent, current = current, child
    return ET.tostring(root, encoding="unicode")


# --------------------------------------------------------------- Spark UDF

def sidecar_text_to_xml_udf():
    """(content, kind) -> XML string. ``kind``: 'ge' | 'ik' | anything else
    passes through unchanged (DG sidecars are already XML). Vendor dispatch
    mirrors ortho_functions.py:404-413 (GE -> GE parser, IK -> IK parser,
    DG -> ElementTree directly)."""

    @F.pandas_udf("string")
    def _to_xml(content: pd.Series, kind: pd.Series) -> pd.Series:
        out = []
        for doc, k in zip(content, kind):
            if isinstance(doc, (bytes, bytearray)):
                doc = doc.decode("utf-8", "replace")
            if doc is None:
                out.append(None)
            elif k == "ge":
                out.append(ge_text_to_xml(doc))
            elif k == "ik":
                out.append(ik_text_to_xml(doc))
            else:
                out.append(doc)
        return pd.Series(out)

    return _to_xml


def sidecar_kind_col(metapath: Column, sat: Column) -> Column:
    """Dispatch key from the resolved sidecar path + classified satellite:
    IK sidecars are .txt (own / rgb / po-strip forms), GE sidecars .txt or
    .pvl, everything else already-XML."""
    lower = F.lower(metapath)
    return (
        F.when(sat == "IK01", F.lit("ik"))
        .when((sat == "GE01") & (lower.endswith(".txt") | lower.endswith(".pvl")),
              F.lit("ge"))
        .otherwise(F.lit("xml"))
    )


def with_sidecar_xml(df, content_col: str = "sidecar_text",
                     metapath_col: str = "metapath", sat_col: str = "sat",
                     out: str = "metadata_xml"):
    """content + resolved path + sat -> normalized XML column, ready for
    :func:`~imagery_utils_spark.functions.metadata.with_scene_metadata`."""
    kind = sidecar_kind_col(F.col(metapath_col), F.col(sat_col))
    return df.withColumn(out, sidecar_text_to_xml_udf()(F.col(content_col), kind))
