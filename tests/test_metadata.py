"""S7 metadata parsing parity for the three vendor vocabularies
(/root/reference/lib/mosaic.py:334-497)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.functions import metadata as MD

DG_XML = """<isd><IMD>
  <IMAGE>
    <CATID>1030010003A5AC00</CATID>
    <SATID>WV02</SATID>
    <CLOUDCOVER>0.012</CLOUDCOVER>
    <MEANSUNEL>37.7</MEANSUNEL>
    <MEANSUNAZ>176.3</MEANSUNAZ>
    <MEANSATEL>72.1</MEANSATEL>
    <MEANSATAZ>88.5</MEANSATAZ>
    <MEANOFFNADIRVIEWANGLE>19.4</MEANOFFNADIRVIEWANGLE>
    <FIRSTLINETIME>2011-09-01T21:04:34.282090Z</FIRSTLINETIME>
    <TDILEVEL>24</TDILEVEL>
  </IMAGE>
</IMD></isd>"""

GE_XML = """<root>
  <archiveId>297600</archiveId>
  <satelliteName>OV-2</satelliteName>
  <percentCloudCover>5</percentCloudCover>
  <firstLineSunElevationAngle>45.98</firstLineSunElevationAngle>
  <firstLineSunAzimuthAngle>160.1</firstLineSunAzimuthAngle>
  <firstLineElevationAngle>63.14</firstLineElevationAngle>
  <firstLineAzimuthAngle>44.0</firstLineAzimuthAngle>
  <firstLineAcquisitionDateTime>2009-07-07T16:31:15.000000Z</firstLineAcquisitionDateTime>
  <tdiMode>8</tdiMode>
</root>"""

IK_XML = """<root>
  <Source_Image_ID id="2001117101234567890123456789"><x>y</x></Source_Image_ID>
  <Sensor>IKONOS-2</Sensor>
  <Percent_Component_Cloud_Cover>12</Percent_Component_Cloud_Cover>
  <Nominal_Collection_Azimuth>120.5 degrees</Nominal_Collection_Azimuth>
  <Nominal_Collection_Elevation>80.25 degrees</Nominal_Collection_Elevation>
  <Sun_Angle_Elevation>55.5 degrees</Sun_Angle_Elevation>
  <Sun_Angle_Azimuth>150.0 degrees</Sun_Angle_Azimuth>
  <Acquisition_Date_Time>2001-11-17 10:12 GMT</Acquisition_Date_Time>
</root>"""

DG_MULTI_TDI = """<isd><IMD>
  <SATID>WV02</SATID><MEANSATEL>70.0</MEANSATEL>
  <BAND_C><TDILEVEL>10</TDILEVEL></BAND_C>
  <BAND_B><TDILEVEL>24</TDILEVEL></BAND_B>
  <BAND_G><TDILEVEL>30</TDILEVEL></BAND_G>
  <BAND_R><TDILEVEL>40</TDILEVEL></BAND_R>
</IMD></isd>"""


def test_dg_parse():
    a = MD.parse_scene_metadata(DG_XML)
    assert a["sensor"] == "WV02" and a["catid"] == "1030010003A5AC00"
    assert a["cc"] == 0.012 and a["sunel"] == 37.7 and a["ona"] == 19.4
    assert a["tdi"] == 24.0
    assert a["date"] == "2011-09-01T21:04:34.282090Z"


def test_ge_parse_percent_and_name():
    a = MD.parse_scene_metadata(GE_XML)
    assert a["sensor"] == "GE01"        # fixed name, not the raw tag text
    assert a["cc"] == pytest.approx(0.05)  # percent / 100
    assert a["sunel"] == 45.98
    # no ona tag -> derived 90 - satel (lib/mosaic.py:482-486)
    assert a["ona"] == pytest.approx(90 - 63.14)


def test_ik_parse_degrees_and_id_attr():
    a = MD.parse_scene_metadata(IK_XML)
    assert a["sensor"] == "IK01"
    assert a["catid"] == "2001117101234567890123456789"
    assert a["cc"] == pytest.approx(0.12)
    assert a["sunel"] == 55.5           # ' degrees' stripped
    assert a["ona"] == pytest.approx(90 - 80.25)


def test_multi_tdi_selection():
    # 4 TDI values -> index [1] (green-band rule, lib/mosaic.py:451-455)
    a = MD.parse_scene_metadata(DG_MULTI_TDI, bands=4)
    assert a["tdi"] == 24.0


def test_garbage_xml():
    a = MD.parse_scene_metadata("<broken")
    assert all(v is None for v in a.values())


def test_spark_udf(spark):
    df = spark.createDataFrame(
        [(1, DG_XML), (2, GE_XML), (3, IK_XML)], "scene_id int, metadata_xml string"
    )
    out = {r.scene_id: r for r in MD.with_scene_metadata(df).collect()}
    assert out[1].sensor == "WV02" and out[1].acq_time == datetime(2011, 9, 1, 21, 4, 34, 282090)
    assert out[2].sensor == "GE01" and out[2].cloudcover == pytest.approx(0.05)
    assert out[3].sensor == "IK01" and out[3].acq_time == datetime(2001, 11, 17, 10, 12)
