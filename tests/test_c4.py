"""C4 filters (functions/c4.py) vs hand expectations."""
from imagery_utils_spark.functions.c4 import c4_filter


def test_c4_rules(spark):
    rows = [
        (0, "This is a good long sentence.\nshort one.\n"
            "Another fine sentence right here!\nno terminal punct here "
            "at all\nAnd a third quite fine sentence?"),
        (1, "Lorem Ipsum dolor sit amet is here.\n"
            "A perfectly fine long sentence.\n"
            "Another perfectly fine long sentence.\n"
            "A third perfectly fine long sentence."),
        (2, "function() { return 1; } is code.\n"
            "A perfectly fine long sentence.\n"
            "Another perfectly fine long sentence.\n"
            "A third perfectly fine long sentence."),
        (3, "Only two good sentences survive here.\n"
            "This is the second surviving one.\nbad line"),
        (4, 'He said "stop right there and wait"\n'
            "A perfectly fine long sentence.\n"
            "Another perfectly fine long sentence."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in c4_filter(df).collect()}

    r0 = got[0]
    assert r0.n_lines == 5 and r0.n_lines_kept == 3
    assert r0.clean_text == ("This is a good long sentence.\n"
                             "Another fine sentence right here!\n"
                             "And a third quite fine sentence?")
    assert r0.keep

    assert not got[1].keep          # lorem ipsum (case-insensitive)
    assert got[1].n_lines_kept == 4
    assert not got[2].keep          # curly brace
    assert not got[3].keep          # only 2 surviving lines
    assert got[4].keep              # quote counts as terminal punct
    assert got[4].n_lines_kept == 3
