"""Sidecar path-rule parity with get_dg/ik/ge_metadata_path
(/root/reference/lib/ortho_functions.py:1543-1663) over synthetic layouts.

One batched resolve call covers every rule: each case lives in its own
directory so inventories can't cross-hit (and the whole suite is a single
Spark action — the classify cascade's codegen is the dominant cost)."""

import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.sources.sidecar import (
    resolve_sidecar_paths,
    resolve_tar_sidecars,
    sidecar_candidates,
)

DG = "WV02_20110901210434_103001000B41DC00_11SEP01210434-M1BS-052730735130_01_P001"
DG_TILED = "WV02_20110901210434_103001000B41DC00_11SEP01210434-M1BS_R1C1-052730735130_01_P001"
GE = "GE01_110809M0010160234A222000100252M_000500940"
IK = "po_39324_blu_0000000"
IK_REN = "IK01_20050625220427_2005062522042450000011234567_po_555555_blu_0000000"

# case dir -> (image filename, available files, expected metapath or None)
CASES = {
    "/dg_xml_beats_XML": (DG + ".tif", [DG + ".xml", DG + ".XML"], DG + ".xml"),
    "/dg_XML_fallback": (DG + ".tif", [DG + ".XML"], DG + ".XML"),
    "/dg_no_hit": (DG + ".tif", ["other.xml"], None),
    "/dg_strip": (DG_TILED + ".tif",
                  [DG_TILED.replace("_R1C1", "") + ".xml"],
                  DG_TILED.replace("_R1C1", "") + ".xml"),
    # the reference's strip-level .XML retry is dead code (ortho_functions.py:1562)
    "/dg_strip_XML_dead": (DG_TILED + ".tif",
                           [DG_TILED.replace("_R1C1", "") + ".XML"], None),
    # ADVICE r2: a tile token inside a DIRECTORY name must survive the
    # strip-level derivation (only the basename's token is removed)
    "/tiles_r1c1": (DG_TILED + ".tif",
                    [DG_TILED.replace("_R1C1", "") + ".xml"],
                    DG_TILED.replace("_R1C1", "") + ".xml"),
    "/ge_pvl": (GE + ".tif", [GE + ".pvl"], GE + ".pvl"),
    "/ge_txt_beats_pvl": (GE + ".tif", [GE + ".txt", GE + ".pvl"], GE + ".txt"),
    "/ik_rgb": (IK + ".tif", [IK.replace("blu", "rgb") + ".txt"],
                IK.replace("blu", "rgb") + ".txt"),
    "/ik_own_beats_rgb": (IK + ".tif",
                          [IK + ".txt", IK.replace("blu", "rgb") + ".txt"],
                          IK + ".txt"),
    "/ik_meta": (IK + ".tif", [IK + "_metadata.txt"], IK + "_metadata.txt"),
    "/ik_po_strip_last": (IK + ".tif", ["po_39324_metadata.txt"],
                          "po_39324_metadata.txt"),
    "/ik_meta_beats_po": (IK + ".tif",
                          [IK + "_metadata.txt", "po_39324_metadata.txt"],
                          IK + "_metadata.txt"),
    "/ik_renamed_po": (IK_REN + ".tif",
                       [IK_REN.rsplit("_blu", 1)[0] + "_metadata.txt"],
                       IK_REN.rsplit("_blu", 1)[0] + "_metadata.txt"),
}


def test_sidecar_rules_batched(spark):
    imgs = spark.createDataFrame(
        [(f"{d}/{img}",) for d, (img, _, _) in CASES.items()], "path string")
    files = spark.createDataFrame(
        [(f"{d}/{f}",) for d, (_, fs, _) in CASES.items() for f in fs],
        "path string")
    got = {r.path: r.metapath for r in resolve_sidecar_paths(imgs, files).collect()}
    for d, (img, _, expected) in CASES.items():
        exp = f"{d}/{expected}" if expected else None
        assert got[f"{d}/{img}"] == exp, d


def test_dg_plain_never_tries_strip_rule(spark):
    imgs = spark.createDataFrame([(f"/d/{DG}.tif",)], "path string")
    cands = sidecar_candidates(imgs).collect()
    assert {c.prio for c in cands} == {0, 1}


def test_tar_member_resolution(spark):
    tar = f"/d/{DG}.tar"
    imgs = spark.createDataFrame(
        [(f"/d/{DG}.tif",),
         (f"/d/{DG.replace('052730735130', '999999999999')}.tif",)],
        "path string")
    members = spark.createDataFrame(
        [
            (tar, "052730735130_01/052730735130_01_P001.XML"),
            (tar, "052730735130_01/052730735130_01_P001.til"),
            ("/d/other.tar", "052730735130_01_P001.xml"),
        ],
        "tar_path string, member string",
    )
    got = {r.path: (r.tar_path, r.member)
           for r in resolve_tar_sidecars(imgs, members).collect()}
    assert got[f"/d/{DG}.tif"] == (tar, "052730735130_01/052730735130_01_P001.XML")
    assert got[f"/d/{DG.replace('052730735130', '999999999999')}.tif"] == (None, None)
