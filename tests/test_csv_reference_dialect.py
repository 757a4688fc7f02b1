"""CSV dialect exactness (VERDICT r1 next-round #7): fixtures mirror
/root/reference/test/core/csv.cpp — simple_csv (:49-61), empty_fields
(:63-76), quoted_csv with custom sep/quote/escape (:78-89, incl.
mid-field quotes discarded-tail + doubled-escape), invalid_csvs
(:91-108), and the writer round-trip (:180-206).
"""

import pytest

from hipipe_spark.sources.csv import parse_hipipe_csv, read_csv, write_csv

SIMPLE = "Id,  A,   B \n 1, a1, 1.1 \n 2, a2, 1.2 \n 3, a3, 1.3 \n"
EMPTY_FIELDS = 'Id,A,B\n,,\n , , \n"","",""'
# reference quoted_csv: sep='|', quote='*', escape='+'
QUOTED = ("  *Column| 1*| \t *Column| 2*  | * Column +*3+* *\n"
          "Field 1| *Field|\n 2*  | * Field 3 *    \n"
          "*Field\n1*|   *Field| 2 * |   * Field 3 *    ")
QUOTED_ROWS = [
    ["Column| 1", "Column| 2", " Column *3* "],
    ["Field 1", "Field|\n 2", " Field 3 "],
    ["Field\n1", "Field| 2 ", " Field 3 "],
]


def test_parse_simple():
    assert parse_hipipe_csv(SIMPLE) == [
        ["Id", "A", "B"], ["1", "a1", "1.1"],
        ["2", "a2", "1.2"], ["3", "a3", "1.3"]]


def test_parse_empty_fields():
    assert parse_hipipe_csv(EMPTY_FIELDS) == [
        ["Id", "A", "B"], ["", "", ""], ["", "", ""], ["", "", ""]]


def test_parse_quoted_custom_dialect():
    got = parse_hipipe_csv(QUOTED, sep="|", quote="*", escape="+")
    assert got == QUOTED_ROWS


def test_parse_quote_only_honored_at_field_start():
    # a quote mid-field is a literal char (reference csv.cpp:74-88:
    # quoting kicks in only when peek()==quote after blanks)
    assert parse_hipipe_csv('a"b,c\n') == [['a"b', "c"]]
    # doubled quotes inside a quoted field are NOT an escape: the field
    # ends at the first quote, the rest is discarded junk
    assert parse_hipipe_csv('"x""y",z\n') == [["x", "z"]]
    # tail after a closing quote is discarded (std::ignore, csv.cpp:79)
    assert parse_hipipe_csv('"x" trailing junk,z\n') == [["x", "z"]]


def test_parse_unterminated_quote_raises():
    with pytest.raises(ValueError, match="unterminated"):
        parse_hipipe_csv('Id,A\n1,"open field\n')


def test_read_csv_hipipe_dialect(spark, tmp_path):
    p = tmp_path / "q.csv"
    p.write_text(QUOTED)
    df = read_csv(spark, str(p), sep="|", quote="*", escape="+")
    assert df.columns == QUOTED_ROWS[0]
    rows = [list(r) for r in df.collect()]
    assert sorted(rows) == sorted(QUOTED_ROWS[1:])


def test_read_csv_drop_and_no_header(spark, tmp_path):
    p = tmp_path / "s.csv"
    p.write_text(SIMPLE)
    df = read_csv(spark, str(p), has_header=False, drop=1)
    assert df.columns == ["_c0", "_c1", "_c2"]
    assert sorted(r._c0 for r in df.collect()) == ["1", "2", "3"]


def test_read_csv_rectangularity_enforced(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("Id,  A,   B \n 1, a1      \n 3, a3, 1.3 \n")
    with pytest.raises(Exception, match="different length"):
        read_csv(spark, str(p)).collect()


def test_write_quoted_parity(spark, tmp_path):
    """Reference test_write_quoted_to_ostream (csv.cpp writer rules):
    fields with sep/quote/newline/boundary-whitespace are quoted with
    escape-prefixed specials; everything else bare."""
    from hipipe_spark.operators.core import create
    df = create(spark, [tuple(QUOTED_ROWS[1]), tuple(QUOTED_ROWS[2])],
                schema="`Column| 1` string, `Column| 2` string, ` Column *3* ` string")
    out = str(tmp_path / "w")
    write_csv(df, out, sep="|", quote="*", escape="+")
    import glob
    text = open(glob.glob(f"{out}/part-*")[0]).read()
    assert text.splitlines()[0] == "*Column| 1*|*Column| 2*|* Column +*3+* *"
    assert "Field 1|*Field|\n 2*|* Field 3 *" in text
    assert "*Field\n1*|*Field| 2 *|* Field 3 *" in text
    # and it round-trips through the reader (reference
    # test_compare_after_write_and_read)
    back = read_csv(spark, out, sep="|", quote="*", escape="+")
    assert back.columns == QUOTED_ROWS[0]
    assert sorted([list(r) for r in back.collect()]) == sorted(QUOTED_ROWS[1:])


def test_write_read_roundtrip_default_dialect(spark, tmp_path):
    from hipipe_spark.operators.core import create
    df = create(
        spark,
        [("1", "needs, quoting"), ("2", 'has "quotes"'), ("3", " padded "),
         ("4", "multi\nline")],
        schema="id string, payload string",
    )
    out = str(tmp_path / "rt")
    write_csv(df, out)
    back = read_csv(spark, out)
    got = {r.id: r.payload for r in back.collect()}
    assert got == {"1": "needs, quoting", "2": 'has "quotes"',
                   "3": " padded ", "4": "multi\nline"}
