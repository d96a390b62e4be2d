"""F1/F6/F9/C12/C16 filter + parser parity. The F1 cardinality philosophy
follows /root/reference/tests/test_mosaic_lib.py:315,323 (8 -> 7 images
across attribute/geometry filters) with an equivalent synthetic layout."""

from datetime import datetime

from pyspark.sql import functions as F

from imagery_utils_spark.functions import filters as FL

PROJ_A = "PROJCS-A"
PROJ_B = "PROJCS-B"


def test_matching_images_filter_cardinality(spark):
    rows = [
        # (proj, bands, datatype) — 8 scenes, 7 survive like the reference's fixture
        (PROJ_A, 1, 1),  # ok
        (PROJ_A, 1, 1),  # ok
        (PROJ_A, 1, 1),  # ok
        (PROJ_A, 1, 1),  # ok
        (PROJ_A, 1, 1),  # ok
        (PROJ_A, 1, 1),  # ok
        (PROJ_A, 1, 1),  # ok
        (PROJ_B, 1, 1),  # wrong projection -> dropped
    ]
    df = spark.createDataFrame(rows, "proj string, bands int, datatype int")
    pred = FL.matching_images_filter(
        F.col("proj"), F.col("bands"), F.col("datatype"), PROJ_A, 1, 1
    )
    assert df.count() == 8
    assert df.filter(pred).count() == 7


def test_band_escape_hatches(spark):
    df = spark.createDataFrame(
        [(PROJ_A, 1, 1), (PROJ_A, 4, 1), (PROJ_A, 8, 1)],
        "proj string, bands int, datatype int",
    )
    base = dict(target_proj=PROJ_A, target_bands=4, target_datatype=1)
    strict = FL.matching_images_filter(F.col("proj"), F.col("bands"), F.col("datatype"), **base)
    assert df.filter(strict).count() == 1
    pan_ok = FL.matching_images_filter(
        F.col("proj"), F.col("bands"), F.col("datatype"), force_pan_to_multi=True, **base)
    assert df.filter(pan_ok).count() == 2  # the 1-band scene joins
    all_ms = FL.matching_images_filter(
        F.col("proj"), F.col("bands"), F.col("datatype"), include_all_ms=True, **base)
    assert df.filter(all_ms).count() == 2  # 4- and 8-band pass


def test_prod_code_gate(spark):
    rows = [("P1BS", None), ("M1BS", None), ("P1MS", None),  # [3]=='M' never here
            ("P3BS", None), ("P2AS", "R1C1"), ("P2AS", None), ("P1BM", None)]
    df = spark.createDataFrame(rows, "prod_code string, tile string")
    ok = df.filter(FL.prod_code_gate(F.col("prod_code"), F.col("tile"))).collect()
    names = {(r.prod_code, r.tile) for r in ok}
    assert ("P1BS", None) in names and ("M1BS", None) in names
    assert ("P3BS", None) not in names          # 3* product
    assert ("P2AS", "R1C1") not in names        # 2A tiled
    assert ("P2AS", None) in names              # 2A untiled passes
    assert ("P1BM", None) not in names          # mosaic product ([3]=='M')


def test_status_gates(spark):
    df = spark.createDataFrame([("1",), ("0",), (None,)], "status string")
    assert df.filter(FL.tile_status_ok(F.col("status"))).count() == 1
    df2 = spark.createDataFrame([("online",), ("tape",), (None,)], "status string")
    assert df2.filter(FL.scene_not_on_tape(F.col("status"))).count() == 2


def test_parse_acq_time(spark):
    rows = [
        ("2011-09-01T21:04:34.123456Z",),
        ("2011-09-01T21:04:34",),
        ("2011-09-01 21:04 GMT",),
        ("20110901210434",),
        ("not a date",),
    ]
    df = spark.createDataFrame(rows, "ts string")
    got = [r.t for r in df.select(FL.parse_acq_time(F.col("ts")).alias("t")).collect()]
    assert got[0] == datetime(2011, 9, 1, 21, 4, 34, 123456)
    assert got[1] == datetime(2011, 9, 1, 21, 4, 34)
    assert got[2] == datetime(2011, 9, 1, 21, 4)
    assert got[3] == datetime(2011, 9, 1, 21, 4, 34)
    assert got[4] is None


def test_proj4_rewrite(spark):
    df = spark.createDataFrame(
        [("+proj=utm +zone=15 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m",)],
        "p string",
    )
    out = df.select(FL.proj4_datum_rewrite(F.col("p")).alias("o")).first().o
    assert out == "+proj=utm +zone=15 +datum=NAD83 +units=m"

def test_load_exclude_list_sources(spark, tmp_path):
    """getExcludeList parity (lib/mosaic.py:1035-1052): file, URL (JSON array
    and plain lines via a local http server), and DataFrame passthrough."""
    import http.server
    import threading

    from imagery_utils_spark.operators.catalog import (
        exclude_anti_join,
        load_exclude_list,
    )

    # file source: rstrip + dedup
    f = tmp_path / "excl.txt"
    f.write_text("sceneB \nsceneA\nsceneA\n\n")
    got = {r.pattern for r in load_exclude_list(spark, str(f)).collect()}
    assert got == {"sceneA", "sceneB"}

    # URL source: JSON array (the reference's API form) and plain lines
    payloads = {"/json": b'["sceneX", "sceneY", "sceneX"]', "/lines": b"s1\ns2\n"}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(payloads[self.path])

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        got = {r.pattern for r in load_exclude_list(spark, base + "/json").collect()}
        assert got == {"sceneX", "sceneY"}
        got = {r.pattern for r in load_exclude_list(spark, base + "/lines").collect()}
        assert got == {"s1", "s2"}
    finally:
        srv.shutdown()

    # DataFrame passthrough + composition with the anti-join; the DF branch
    # normalizes like the file/URL branches (trim + dedup, ADVICE r2)
    src = spark.createDataFrame(
        [("host13",), ("host13 ",), ("",)], "p string")
    pats = load_exclude_list(spark, src)
    assert pats.columns == ["pattern"]
    assert {r.pattern for r in pats.collect()} == {"host13"}
    df = spark.createDataFrame([("a-host13-x",), ("b-ok",)], "url string")
    kept = exclude_anti_join(df, pats, "url").collect()
    assert [r.url for r in kept] == ["b-ok"]
