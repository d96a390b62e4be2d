"""GE/IK sidecar CONTENT parser parity (get_ge_metadata_as_xml
/root/reference/lib/utils.py:296-371, get_ik_metadata_as_xml :372-519) over
synthetic PVL/TXT layouts, end-to-end into the shared attribute struct."""

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from imagery_utils_spark.functions.metadata import parse_scene_metadata
from imagery_utils_spark.functions.sidecar_text import (
    ge_text_to_xml,
    ik_text_to_xml,
    sidecar_kind_col,
    with_sidecar_xml,
)

GE_PVL = """\
productInfo = "GE OrthoRectified";
BEGIN_GROUP = productOrderInfo;
  archiveId = "901234";
  satelliteName = "OV-2";
  percentCloudCover = 7;
END_GROUP = productOrderInfo;
BEGIN_GROUP = aoiGeoCoordinate;
  coordinateNumber = 1;
  latitude = -70.1;
  longitude = 65.2;
END_GROUP = aoiGeoCoordinate;
BEGIN_GROUP = bandSpecificInformation;
  bandNumber = 1;
  TDILevel = 13;
END_GROUP = bandSpecificInformation;
firstLineAcquisitionDateTime = 2011-08-09T15:22:31.000000Z;
firstLineSunElevationAngle = 33.5;
firstLineSunAzimuthAngle = 178.25;
firstLineElevationAngle = 71.25;
firstLineAzimuthAngle = 302.5;
productUnits = (
  meters,
  degrees
);
"""

IK_TXT = """\
Company Information
GeoEye
12076 Grant Street
Thornton, Colorado 80241
U.S.A.

Product Order Metadata

Customer Project Name: test
Output Map Projection: Universal Transverse Mercator

Source Image Metadata

Number of Source Images: 1

Source Image ID: 2005062522042450000011234567
Product Image ID: 000
Sensor: IKONOS-2
Acquired Nominal GSD
  Pan Cross Scan: 0.83 meters
  Pan Along Scan: 0.84 meters
Acquisition Date/Time: 2005-06-25 22:04 GMT
Percent Component Cloud Cover: 3
Nominal Collection Azimuth: 128.1 degrees
Nominal Collection Elevation: 71.3 degrees
Sun Angle Azimuth: 151.1 degrees
Sun Angle Elevation: 62.5 degrees

Product Space Metadata

Coordinate: 1
Latitude: 45.1 degrees
Longitude: -93.3 degrees

Product Component Metadata

Number of Components: 1

Component ID: 0000000
Component File Name: po_555555_blu_0000000.tif
Country Code: US
"""


def test_ge_tree_shape():
    root = ET.fromstring(ge_text_to_xml(GE_PVL))
    # groups nest; key/value pairs become child nodes with text
    assert root.find("./productOrderInfo/archiveId").text == "901234"
    assert root.find("./productOrderInfo/satelliteName").text == "OV-2"
    # group-attribute promotion: coordinateNumber is an ATTRIBUTE, not a node
    aoi = root.find("./aoiGeoCoordinate")
    assert aoi.get("coordinateNumber") == "1"
    assert aoi.find("./coordinateNumber") is None
    assert aoi.find("./latitude").text == "-70.1"
    band = root.find("./bandSpecificInformation")
    assert band.get("bandNumber") == "1"
    assert band.find("./TDILevel").text == "13"
    # multi-line value accumulates through the closing ');'
    assert root.find("./productUnits").text == "meters,degrees);"


def test_ge_attribute_struct():
    a = parse_scene_metadata(ge_text_to_xml(GE_PVL))
    assert a["sensor"] == "GE01"  # fixed name for the GE vocabulary
    assert a["catid"] == "901234"
    assert a["cc"] == 0.07  # percentCloudCover / 100
    assert a["sunel"] == 33.5 and a["sunaz"] == 178.25
    assert a["satel"] == 71.25 and a["sataz"] == 302.5
    assert a["date"] == "2011-08-09T15:22:31.000000Z"


def test_ik_tree_shape():
    root = ET.fromstring(ik_text_to_xml(IK_TXT))
    # boilerplate ignores never become nodes
    assert root.find(".//GeoEye") is None
    # top-level blocks are children of root
    tops = [c.tag for c in root]
    assert tops == ["Product_Order_Metadata", "Source_Image_Metadata",
                    "Product_Space_Metadata", "Product_Component_Metadata"]
    # 2L blocks carry their value as an id attribute
    sid = root.find("./Source_Image_Metadata/Source_Image_ID")
    assert sid.get("id") == "2005062522042450000011234567"
    # Sensor is a child of the 2L block
    assert sid.find("./Sensor").text == "IKONOS-2"
    # coordinate-block pop: Acquisition_Date_Time must NOT end up inside
    # Acquired_Nominal_GSD (a vanilla tag pops the GSD block first)
    gsd = sid.find("./Acquired_Nominal_GSD")
    assert gsd.find("./Pan_Cross_Scan").text == "0.83 meters"
    assert gsd.find("./Acquisition_Date_Time") is None
    assert sid.find("./Acquisition_Date_Time").text == "2005-06-25 22:04 GMT"
    # Coordinate blocks carry id attributes
    coord = root.find("./Product_Space_Metadata/Coordinate")
    assert coord.get("id") == "1"
    assert coord.find("./Latitude").text == "45.1 degrees"
    # Component_ID block under the component metadata top-level
    comp = root.find("./Product_Component_Metadata/Component_ID")
    assert comp.get("id") == "0000000"


def test_ik_attribute_struct():
    a = parse_scene_metadata(ik_text_to_xml(IK_TXT))
    assert a["sensor"] == "IK01"  # fixed name for the IK vocabulary
    assert a["catid"] == "2005062522042450000011234567"  # from the id attr
    assert a["cc"] == 0.03
    assert a["sunel"] == 62.5 and a["sunaz"] == 151.1  # 'degrees' stripped
    assert a["satel"] == 71.3 and a["sataz"] == 128.1
    assert a["date"] == "2005-06-25 22:04 GMT"
    # the reference's 'Pachchromatic' typo means IK tdi is never extracted
    assert a["tdi"] is None


def test_with_sidecar_xml_spark(spark):
    """All three vendors through the one Spark column path: kind dispatch on
    (metapath, sat), text -> XML -> attribute struct."""
    from imagery_utils_spark.functions.metadata import with_scene_metadata

    dg_xml = ("<root><IMD><IMAGE><SATID>WV02</SATID>"
              "<MEANSUNEL>41.5</MEANSUNEL></IMAGE></IMD></root>")
    rows = [
        ("a.xml", "WV02", dg_xml),
        ("b.pvl", "GE01", GE_PVL),
        ("c_metadata.txt", "IK01", IK_TXT),
    ]
    df = spark.createDataFrame(rows, "metapath string, sat string, sidecar_text string")
    out = with_scene_metadata(
        with_sidecar_xml(df), xml_col="metadata_xml"
    ).select("sat", "sensor", "sun_elev").orderBy("metapath").collect()
    assert [(r.sensor, r.sun_elev) for r in out] == [
        ("WV02", 41.5), ("GE01", 33.5), ("IK01", 62.5)]


def test_sidecar_kind_col(spark):
    df = spark.createDataFrame(
        [("x.pvl", "GE01"), ("x.txt", "GE01"), ("x.txt", "IK01"),
         ("x.xml", "WV02"), ("x.xml", "GE01")],
        "metapath string, sat string")
    got = [r.k for r in df.select(
        sidecar_kind_col(F.col("metapath"), F.col("sat")).alias("k")).collect()]
    assert got == ["ge", "ge", "ik", "xml", "xml"]
