"""ext.warc: WARC record parsing (web_warc_records is value-hashed
against the generation-law oracle by the registry differential test;
these tests pin the parser's strictness, totality, and the Spark
surface's corrupt-row contract)."""

from __future__ import annotations

import pytest

from spk_sl_validation_spark.ext.warc import (
    _CRLF,
    _make_warc,
    parse_warc,
    synthesize_warc_table,
    warc_records,
)


def test_law_roundtrip_all_shapes():
    for d in range(0, 24):
        recs = parse_warc(_make_warc(d))
        assert recs[0]["rec_type"] == "warcinfo"
        assert recs[0]["http_status"] is None and recs[0]["body"] == b""
        assert len(recs) == 1 + (1 + d % 3)
        for i, r in enumerate(recs[1:]):
            assert r["rec_type"] == "response"
            assert r["target_uri"] == f"https://site{d % 3}.com/w/{i}"
            assert r["http_status"] == (404 if (d + i) % 4 == 0 else 200)
            assert r["body"] == b"payload " * (1 + (d + i) % 5)
            # block length covers HTTP headers too — never equals body
            assert r["content_length"] > len(r["body"])


def test_parser_strictness():
    good = _make_warc(5)
    with pytest.raises(ValueError):
        parse_warc(b"")
    with pytest.raises(ValueError):
        parse_warc(good + b"trailing junk")
    with pytest.raises(ValueError):
        parse_warc(good.replace(b"WARC/1.1", b"WARC/9.9", 1))
    with pytest.raises(ValueError):
        parse_warc(good.replace(b"Content-Length: ", b"Content-Length: x", 1))
    # truncation anywhere inside the record is malformation
    with pytest.raises(ValueError):
        parse_warc(good[:-3])
    # header line without a colon
    bad = good.replace(b"WARC-Type: warcinfo", b"WARC-Type warcinfo", 1)
    with pytest.raises(ValueError):
        parse_warc(bad)


def test_header_folding_unfolds_onto_previous_value():
    """ISO 28500 permits header continuation lines (leading SP/HT);
    they must extend the previous header's value, not parse as
    malformed (ADVICE r9)."""
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Target-URI: https://a.com/\r\n"
        b"\tfolded/part\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    out = parse_warc(rec)
    assert out[0]["target_uri"] == "https://a.com/ folded/part"
    # SP folding too
    out2 = parse_warc(rec.replace(b"\tfolded", b"  folded"))
    assert out2[0]["target_uri"] == "https://a.com/ folded/part"


def test_continuation_before_any_header_is_malformed():
    rec = (
        b"WARC/1.0\r\n"
        b" orphan continuation\r\n"
        b"WARC-Type: resource\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    with pytest.raises(ValueError):
        parse_warc(rec)


def test_parser_total_on_arbitrary_and_mutated_bytes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = _make_warc(7)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def arbitrary(raw):
        try:
            parse_warc(raw)
        except ValueError:
            pass

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=len(base) - 1),
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=len(base)),
    )
    def mutated(pos, byte, cut):
        mut = bytearray(base)
        mut[pos] = byte
        try:
            parse_warc(bytes(mut[:cut]))
        except ValueError:
            pass

    arbitrary()
    mutated()


def test_non_http_response_block_keeps_empty_body():
    # a response record whose block is not HTTP/1.x: parsed, no status
    block = b"not an http message"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: "
        + str(len(block)).encode()
        + b"\r\n\r\n"
        + block
        + b"\r\n\r\n"
    )
    recs = parse_warc(rec)
    assert recs[0]["http_status"] is None and recs[0]["body"] == b""


def test_warc_records_flags_bad_rows(spark):
    import pyspark.sql.functions as F

    docs = spark.range(6).selectExpr("id AS doc_id")
    tab = synthesize_warc_table(docs).withColumn(
        "warc",
        F.when(F.col("doc_id") == 2, F.lit(b"WARC/1.0 garbage")).otherwise(
            F.col("warc")
        ),
    )
    rows = warc_records(tab).collect()
    bad = [r for r in rows if r.doc_id == 2]
    assert len(bad) == 1 and not bad[0].ok
    good = [r for r in rows if r.doc_id != 2]
    assert all(r.ok for r in good)
    # response bodies decode to the law's text
    r30 = next(r for r in good if r.doc_id == 3 and r.rec_idx == 1)
    assert r30.body_text == "payload " * (1 + 3 % 5)
    assert r30.http_status == 200


# ---------------------------------------------------------------------------
# charset detection + decode
# ---------------------------------------------------------------------------

from spk_sl_validation_spark.ext.warc import (  # noqa: E402
    decode_html_bytes,
    decode_html_bytes_py,
    detect_charset,
    synthesize_html_bytes_table,
)


@pytest.mark.parametrize(
    "data,want",
    [
        (b"\xef\xbb\xbfhello", ("utf-8", True)),
        (b"\xff\xfeh\x00", ("utf-16-le", True)),
        (b"\xfe\xff\x00h", ("utf-16-be", True)),
        (b"\xff\xfe\x00\x00h\x00\x00\x00", ("utf-32-le", True)),  # not utf-16!
        (b'<META CHARSET="UTF-8"><p>x</p>', ("utf-8", False)),
        (b"<meta charset=koi8-r><p>x</p>", ("koi8-r", False)),
        (b'<meta http-equiv="Content-Type" content="text/html; charset=Shift_JIS">',
         ("shift_jis", False)),
        (b"plain ascii", ("utf-8", False)),
        ("café".encode("utf-8"), ("utf-8", False)),  # valid multibyte
        (b"caf\xe9", ("windows-1252", False)),  # invalid utf-8 -> fallback
    ],
)
def test_detect_charset(data, want):
    assert detect_charset(data) == want


def test_meta_outside_prescan_window_ignored():
    data = b"<p>" + b"x" * 1100 + b'</p><meta charset="koi8-r">'
    assert detect_charset(data) == ("utf-8", False)


def test_decode_totality():
    # unknown declared charset -> fallback decode, never a raise
    text, cs, bom = decode_html_bytes_py(b'<meta charset="no-such-cs">\xe9')
    assert cs == "no-such-cs" and "é" in text
    # BOM stripped from the decoded text
    text, cs, bom = decode_html_bytes_py(b"\xef\xbb\xbfabc")
    assert text == "abc" and bom
    # undecodable bytes under the detected charset -> replacement
    text, cs, bom = decode_html_bytes_py(b"\xff\xfe\xe9")  # utf-16 odd length
    assert "�" in text


def test_decode_law_roundtrip():
    for d in range(12):
        text, cs, bom = decode_html_bytes_py(
            __import__(
                "spk_sl_validation_spark.ext.warc", fromlist=["_make_html_bytes"]
            )._make_html_bytes(d)
        )
        assert f"T{d} café" in text
        assert bom == (d % 6 in (1, 2))


def test_decode_html_bytes_spark(spark):
    docs = spark.range(12).selectExpr("id AS doc_id")
    rows = {r.doc_id: r for r in decode_html_bytes(synthesize_html_bytes_table(docs)).collect()}
    assert rows[2].charset == "utf-16-le" and rows[2].had_bom
    assert rows[5].charset == "windows-1252" and "café" in rows[5].text


# ---------------------------------------------------------------------------
# member-gzip WARC (Common Crawl framing)
# ---------------------------------------------------------------------------

from spk_sl_validation_spark.ext.warc import (  # noqa: E402
    gunzip_members,
    parse_warc_gz,
)


def _gz(b: bytes) -> bytes:
    import gzip
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(b)
    return buf.getvalue()


def test_gunzip_members_roundtrip_and_count():
    parts = [b"alpha", b"beta", b"gamma"]
    data, n = gunzip_members(b"".join(_gz(p) for p in parts))
    assert data == b"alphabetagamma" and n == 3


def test_gunzip_members_strictness():
    with pytest.raises(ValueError):
        gunzip_members(b"not gzip")
    with pytest.raises(ValueError):
        gunzip_members(_gz(b"x") + b"trailing")
    with pytest.raises(ValueError):
        gunzip_members(_gz(b"x")[:-4])  # truncated member
    corrupt = bytearray(_gz(b"hello world payload"))
    corrupt[12] ^= 0xFF
    with pytest.raises(ValueError):
        gunzip_members(bytes(corrupt))


def test_parse_warc_gz_equals_plain_parse():
    for d in (0, 5, 11):
        whole = _make_warc(d)
        recs_gz, n = parse_warc_gz(_gz(whole))
        assert recs_gz == parse_warc(whole)
        assert n == 1  # single member here; the fixture writer does per-record


def test_gz_fuzz_totality():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = _gz(_make_warc(3))

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=len(base) - 1),
        st.integers(min_value=0, max_value=255),
    )
    def mutated(pos, byte):
        mut = bytearray(base)
        mut[pos] = byte
        try:
            parse_warc_gz(bytes(mut))
        except ValueError:
            pass

    mutated()


# ---------------------------------------------------------------------------
# round-9 review fixes
# ---------------------------------------------------------------------------


def test_decode_totality_on_declared_pseudo_codecs():
    # pages can DECLARE codecs that raise even with errors='replace'
    for label in ("undefined", "idna", "punycode"):
        text, cs, bom = decode_html_bytes_py(
            f'<meta charset="{label}">caf\xe9'.encode("latin-1")
        )
        assert cs == label and "café" in text  # windows-1252 fallback


def test_null_payloads_degrade_not_kill(spark):
    import pyspark.sql.functions as F

    docs = spark.range(4).selectExpr("id AS doc_id")
    # warc_records / warc_gz_records: NULL -> single ok=false row
    tab = synthesize_warc_table(docs).withColumn(
        "warc", F.when(F.col("doc_id") == 1, F.lit(None)).otherwise(F.col("warc"))
    )
    rows = warc_records(tab).collect()
    assert [r.ok for r in rows if r.doc_id == 1] == [False]
    from spk_sl_validation_spark.ext.warc import (
        synthesize_warc_gz_table,
        warc_gz_records,
    )

    gz = synthesize_warc_gz_table(docs).withColumn(
        "warc_gz", F.when(F.col("doc_id") == 2, F.lit(None)).otherwise(F.col("warc_gz"))
    )
    rows = warc_gz_records(gz).collect()
    assert [r.ok for r in rows if r.doc_id == 2] == [False]
    # decode_html_bytes: NULL -> null text/charset row
    raw = synthesize_html_bytes_table(docs).withColumn(
        "raw", F.when(F.col("doc_id") == 3, F.lit(None)).otherwise(F.col("raw"))
    )
    got = {r.doc_id: r for r in decode_html_bytes(raw).collect()}
    assert got[3].text is None and got[3].charset is None and not got[3].had_bom
