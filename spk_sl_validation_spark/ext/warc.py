"""WARC (Web ARChive, ISO 28500) record parsing — the container
format crawls actually arrive in (Common Crawl ships WARC; every
curation layer in this package starts one step downstream of it).

REAL stdlib parser, same contract as the media codecs in
ext/multimodal.py: strict on structure (version line, header grammar,
exact Content-Length, record terminator), ValueError on malformation
— total under fuzzing — and the Spark surface is a zero-exchange
Arrow-batched ``mapInPandas`` that explodes each WARC payload into
one row per record. For ``response`` records carrying an HTTP/1.x
message, the status code and body are additionally split out (the
fields a crawl pipeline filters on before any HTML work).

Scope notes (documented, not silent): payloads are parsed UNGZIPPED
(Common Crawl's member-gzip framing is a transport detail — Spark's
file sources decompress `.gz` transparently when records are stored
one-per-file, and a splittable re-container is what a real lake
would use); WARC/1.0 and 1.1 accepted; headers are latin-1 decoded
per the spec's octet orientation.

The reference (SL_SPK_Cleansing.py — xlsx ingest only) has no crawl
source; this extends SURVEY.md §2.1's source surface the way the
parquet/CSV readers do."""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC file's records. Each record dict carries
    ``rec_type, target_uri, warc_date, content_length, http_status,
    body`` (the latter two None/empty for non-HTTP records).

    Strictness: every record must open with ``WARC/1.0`` or
    ``WARC/1.1``, carry well-formed ``Name: value`` headers
    terminated by a blank line, a ``Content-Length`` that exactly
    covers the block, and the two-CRLF record terminator; trailing
    bytes that are not a further record are malformation. Header
    CONTINUATION lines (leading SP/HT folding, which ISO 28500
    permits) are unfolded onto the previous header's value with a
    single joining space — a continuation before any header is
    malformation."""
    records: list[dict] = []
    pos = 0
    n = len(data)
    if n == 0:
        raise ValueError("empty WARC payload")
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("WARC header block not terminated")
        head = data[pos:head_end].split(_CRLF)
        version = head[0]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        headers: dict[str, str] = {}
        last_key: str | None = None
        for line in head[1:]:
            if line[:1] in (b" ", b"\t"):
                # ISO 28500 header folding: continuation extends the
                # previous header's value
                if last_key is None:
                    raise ValueError(
                        f"WARC continuation line before any header {line[:40]!r}"
                    )
                cont = line.strip().decode("latin-1")
                headers[last_key] = (headers[last_key] + " " + cont).strip()
                continue
            if b":" not in line:
                raise ValueError(f"malformed WARC header line {line[:40]!r}")
            k, v = line.split(b":", 1)
            last_key = k.strip().decode("latin-1").lower()
            headers[last_key] = v.strip().decode("latin-1")
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record without Content-Length") from None
        except ValueError:
            raise ValueError("non-integer WARC Content-Length") from None
        if length < 0:
            raise ValueError("negative WARC Content-Length")
        rec_type = headers.get("warc-type")
        if not rec_type:
            raise ValueError("WARC record without WARC-Type")
        block_start = head_end + 4
        block_end = block_start + length
        if block_end + 4 > n:
            raise ValueError("WARC block overruns payload")
        if data[block_end : block_end + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record terminator missing")
        block = data[block_start:block_end]
        http_status = None
        body = b""
        if rec_type == "response" and block[:5] == b"HTTP/":
            sep = block.find(_CRLF + _CRLF)
            if sep < 0:
                raise ValueError("HTTP headers not terminated in response block")
            status_line = block[: block.find(_CRLF)].split(b" ")
            if len(status_line) < 2 or not status_line[1].isdigit():
                raise ValueError("malformed HTTP status line")
            http_status = int(status_line[1])
            body = block[sep + 4 :]
        records.append(
            {
                "rec_type": rec_type,
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_length": length,
                "http_status": http_status,
                "body": body,
            }
        )
        pos = block_end + 4
    return records


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("body_len", T.LongType()),
        T.StructField("body_text", T.StringType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def _records_map(parse_fn, warc_col: str):
    """Shared Arrow runner for the plain and member-gzip record ops:
    one row per parsed record, a single ``ok=false`` row per corrupt
    OR NULL payload (``bytes(None)`` raises TypeError — a null column
    value must degrade like a corrupt one, never kill the stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in WARC_RECORD_SCHEMA.fields}

            def emit(doc_id, idx, rec_type, uri, status, blen, btext, ok):
                for name, v in zip(
                    ("doc_id", "rec_idx", "rec_type", "target_uri",
                     "http_status", "body_len", "body_text", "ok"),
                    (doc_id, idx, rec_type, uri, status, blen, btext, ok),
                ):
                    out[name].append(v)

            for doc_id, data in zip(pdf["doc_id"], pdf[warc_col]):
                try:
                    recs = parse_fn(bytes(data))
                except (ValueError, IndexError, TypeError):
                    emit(doc_id, 0, "", None, None, 0, "", False)
                    continue
                for i, r in enumerate(recs):
                    emit(
                        doc_id, i, r["rec_type"], r["target_uri"],
                        r["http_status"], len(r["body"]),
                        r["body"].decode("utf-8", "replace"), True,
                    )
            yield pd.DataFrame(out)

    return run


def warc_records(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """Explode each WARC payload into one row per record
    (Arrow-batched pure map, zero exchanges). A malformed or NULL
    payload yields a single ``ok=false`` row — a corrupt archive in a
    100 TB crawl must never kill the stage. ``body_text`` is the
    UTF-8 decode (replace errors) of the HTTP body for response
    records."""
    return df.mapInPandas(_records_map(parse_warc, warc_col), WARC_RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# Fixture generation law (web_warc_records' oracle replays it):
# each doc_id becomes one WARC file holding a warcinfo record plus
# r = 1 + doc_id % 3 response records i = 0..r-1 with
#
#   target_uri  = https://site<doc_id % 3>.com/w/<i>
#   http_status = 404 if (doc_id + i) % 4 == 0 else 200
#   body        = 'payload ' * (1 + (doc_id + i) % 5), utf-8
#                 (body_len = 8 * (1 + (doc_id + i) % 5))
#
# The writer varies framing the parser must not assume: WARC/1.1 vs
# 1.0 by doc parity, an extra X-Noise header on even records, and an
# HTTP X-Pad response header whose length varies per record (so block
# Content-Length never equals body length).
# ---------------------------------------------------------------------------


def _warc_record(version: bytes, rec_type: bytes, extra: list[bytes], block: bytes) -> bytes:
    """One framed WARC record (shared by both fixture writers)."""
    head = [version, b"WARC-Type: " + rec_type] + extra + [
        b"Content-Length: " + str(len(block)).encode()
    ]
    return _CRLF.join(head) + _CRLF + _CRLF + block + _CRLF + _CRLF


def _make_warc(doc_id: int) -> bytes:
    version = b"WARC/1.1" if doc_id % 2 else b"WARC/1.0"

    def record(rec_type: bytes, extra: list[bytes], block: bytes) -> bytes:
        return _warc_record(version, rec_type, extra, block)

    info = record(
        b"warcinfo",
        [b"WARC-Date: 2024-01-01T00:00:00Z"],
        b"software: spk-sl-fixture",
    )
    out = [info]
    for i in range(1 + doc_id % 3):
        body = b"payload " * (1 + (doc_id + i) % 5)
        status = 404 if (doc_id + i) % 4 == 0 else 200
        http = (
            b"HTTP/1.1 " + str(status).encode() + b" X\r\n"
            b"Content-Type: text/html\r\n"
            b"X-Pad: " + b"p" * (1 + (doc_id + i) % 3) + b"\r\n\r\n" + body
        )
        extra = [
            b"WARC-Target-URI: https://site"
            + str(doc_id % 3).encode()
            + b".com/w/"
            + str(i).encode(),
            b"WARC-Date: 2024-01-02T00:00:00Z",
        ]
        if doc_id % 2 == 0:
            extra.append(b"X-Noise: ignored")
        out.append(record(b"response", extra, http))
    return b"".join(out)


def synthesize_warc_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, warc binary) under the generation law above."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_warc(int(d)))

    return docs.select(F.col(id_col), make(F.col(id_col)).alias("warc"))


# ---------------------------------------------------------------------------
# Charset detection + decode (the bytes->text step between a WARC
# response body and html_to_text; real crawls are ~95% UTF-8 but the
# tail is exactly what breaks naive pipelines)
# ---------------------------------------------------------------------------

#: BOM table, longest first (UTF-32 LE starts with UTF-16 LE's BOM).
_BOMS = (
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

_META_CHARSET_RE = re.compile(
    rb"(?is)<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)"
)


def detect_charset(data: bytes) -> tuple[str, bool]:
    """(charset, had_bom) for an HTML byte payload, in the precedence
    order real browsers use: BOM first, then a ``<meta charset=…>`` /
    ``http-equiv`` declaration in the first 1024 bytes (the HTML5
    prescan window), then strict-UTF-8 sniff, then the windows-1252
    fallback (the de-facto web default; a superset of iso-8859-1 on
    the printable range). Charset labels are lowercased as declared —
    no alias table, documented."""
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc, True
    m = _META_CHARSET_RE.search(data[:1024])
    if m:
        return m.group(1).decode("ascii").lower(), False
    try:
        data.decode("utf-8", "strict")
        return "utf-8", False
    except UnicodeDecodeError:
        return "windows-1252", False


def decode_html_bytes_py(data: bytes) -> tuple[str, str, bool]:
    """(text, charset, had_bom): decode per :func:`detect_charset`.
    The BOM itself is stripped from the text; an unknown declared
    charset or undecodable payload falls back to windows-1252 with
    replacement (decode must be total — a mislabeled page in a 100 TB
    crawl must never kill the stage)."""
    charset, had_bom = detect_charset(data)
    if had_bom:
        bom = next(b for b, e in _BOMS if e == charset)
        data = data[len(bom):]
    try:
        return data.decode(charset, "replace"), charset, had_bom
    except (LookupError, ValueError):
        # LookupError: unknown label. ValueError (incl. UnicodeError):
        # pseudo-codecs a page can DECLARE — 'undefined' raises on any
        # input, 'idna'/'punycode' raise on non-conforming bytes even
        # with errors='replace'. Decode must be total either way.
        return data.decode("windows-1252", "replace"), charset, had_bom


HTML_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("had_bom", T.BooleanType()),
    ]
)


def decode_html_bytes(df: DataFrame, bytes_col: str = "raw") -> DataFrame:
    """bytes -> (text, charset, had_bom) per payload (Arrow-batched
    pure map, zero exchanges). Python is the right tool here — the
    decode target charset varies PER ROW, which JVM ``decode(col,
    charset)`` cannot express (its charset argument is a literal)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in HTML_DECODE_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[bytes_col]):
                if data is None:
                    text, charset, had_bom = None, None, False
                else:
                    text, charset, had_bom = decode_html_bytes_py(bytes(data))
                out["doc_id"].append(doc_id)
                out["text"].append(text)
                out["charset"].append(charset)
                out["had_bom"].append(had_bom)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, HTML_DECODE_SCHEMA)


# Fixture generation law (web_charset_decode's oracle replays it):
# the unicode document is always '<p>T<doc_id> café</p>'; its BYTES
# vary by m = doc_id % 6 (meta declarations are prepended to the
# document before encoding, so the decoded text includes them):
#
#   m  bytes                                    charset        bom
#   0  utf-8, no BOM                            utf-8          no
#   1  utf-8 with BOM                           utf-8          yes
#   2  utf-16-le with BOM                       utf-16-le      yes
#   3  '<meta charset="windows-1252">' + doc,   windows-1252   no
#      cp1252-encoded
#   4  '<meta http-equiv="Content-Type" content="text/html; '
#      'charset=iso-8859-1">' + doc, latin-1    iso-8859-1     no
#   5  doc cp1252-encoded, NO meta (0xE9 é is   windows-1252   no
#      invalid utf-8 -> sniff fails -> fallback)


def _make_html_bytes(doc_id: int) -> bytes:
    doc = f"<p>T{doc_id} café</p>"
    m = doc_id % 6
    if m == 0:
        return doc.encode("utf-8")
    if m == 1:
        return b"\xef\xbb\xbf" + doc.encode("utf-8")
    if m == 2:
        return b"\xff\xfe" + doc.encode("utf-16-le")
    if m == 3:
        return ('<meta charset="windows-1252">' + doc).encode("windows-1252")
    if m == 4:
        return (
            '<meta http-equiv="Content-Type" content="text/html; '
            "charset=iso-8859-1\">" + doc
        ).encode("iso-8859-1")
    return doc.encode("windows-1252")


def synthesize_html_bytes_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, raw binary) under the generation law above."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_html_bytes(int(d)))

    return docs.select(F.col(id_col), make(F.col(id_col)).alias("raw"))


# ---------------------------------------------------------------------------
# Composed-ingest fixture: WARC archives whose response bodies are
# HTML pages under a known main-content law (web_ingest_pipeline
# replays the composition end-to-end)
# ---------------------------------------------------------------------------


def _ingest_page_html(c: int) -> str:
    """The main-content law page, Python twin (c = (doc_id+i) % 5):
    nav / title / footer blocks fail the extractor's gates; the two
    article paragraphs survive. Any drift against the oracle's
    expected text is caught by the hash compare."""
    return (
        '<html><body><nav><a href="/">Home</a> <a href="/a">News</a></nav>'
        f"<h1>Title{c}</h1>"
        f"<p>Article c{c} paragraph one carries enough prose to pass the "
        "length gate easily.</p>"
        f"<p>Paragraph two of article c{c} also has plenty of running text "
        'around <a href="/ref">a link</a> in the middle of it.</p>'
        '<footer><a href="/about">(c) 2024 About</a></footer></body></html>'
    )


def _make_warc_html(doc_id: int) -> bytes:
    """Same WARC framing law as :func:`_make_warc` (version by parity,
    noise headers, HTTP padding) but response bodies are the
    main-content law pages for c = (doc_id + i) % 5."""
    version = b"WARC/1.1" if doc_id % 2 else b"WARC/1.0"

    def record(rec_type: bytes, extra: list[bytes], block: bytes) -> bytes:
        return _warc_record(version, rec_type, extra, block)

    out = [
        record(
            b"warcinfo",
            [b"WARC-Date: 2024-01-01T00:00:00Z"],
            b"software: spk-sl-fixture",
        )
    ]
    for i in range(1 + doc_id % 3):
        body = _ingest_page_html((doc_id + i) % 5).encode("utf-8")
        status = 404 if (doc_id + i) % 4 == 0 else 200
        http = (
            b"HTTP/1.1 " + str(status).encode() + b" X\r\n"
            b"Content-Type: text/html\r\n\r\n" + body
        )
        out.append(
            record(
                b"response",
                [
                    b"WARC-Target-URI: https://site"
                    + str(doc_id % 3).encode()
                    + b".com/w/"
                    + str(i).encode(),
                    b"WARC-Date: 2024-01-02T00:00:00Z",
                ],
                http,
            )
        )
    return b"".join(out)


def synthesize_warc_html_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, warc binary) under the composed-ingest law above."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_warc_html(int(d)))

    return docs.select(F.col(id_col), make(F.col(id_col)).alias("warc"))


# ---------------------------------------------------------------------------
# Full crawl→corpus fixture (web_corpus_pipeline replays its law):
# one response per archive, body quality class q = doc_id % 5, each
# class dying at EXACTLY ONE gate of the composed pipeline:
#
#   q=0  six good English paragraphs            → survives everything
#   q=1  six German paragraphs (de markers,
#        zero lowercase en markers)             → dies at lang-id
#   q=2  six digit-soup paragraphs seeded with
#        en markers (alpha_word_frac = 0.5)     → dies at Gopher
#   q=3  the q=0 paragraphs plus a repeat of
#        paragraph 0 (paragraph dedup drops it)
#        and a punctuation-less line (the C4
#        line filter drops it)                  → survives, 2 drops
#   q=4  HTTP 404                               → dies at ingest
#
# Every paragraph is >=40 visible chars with zero link density (the
# main-content extractor keeps them all; the nav/h1/footer chrome
# drops as usual). Good-class words: 16/paragraph × 6 = 96 (inside
# Gopher's 50..100k), mean word length 3.875, alpha fraction 0.875.


def _corpus_good_paragraph(c: int, i: int) -> str:
    return (
        f"Good article {c} section {i} talks about the state of things "
        "and is of note here."
    )


def _corpus_paragraphs(q: int, c: int) -> list[str]:
    if q in (0, 4):  # q=4's body never survives the 404 filter
        return [_corpus_good_paragraph(c, i) for i in range(6)]
    if q == 1:
        return [
            f"Die Sonne und der Mond ist am Himmel Nummer {i} Lauf {c} geblieben."
            for i in range(6)
        ]
    if q == 2:
        return [
            f"the 1234{i} and 67890 of 13579 is 24680 a 99999." for i in range(6)
        ]
    good = [_corpus_good_paragraph(c, i) for i in range(6)]
    return (
        good[:2]
        + [good[0]]  # duplicate → paragraph dedup drops it
        + [good[2]]
        + [f"trailing line {c} has no terminal punctuation at all"]  # C4 drops
        + good[3:]
    )


def _make_warc_corpus(doc_id: int) -> bytes:
    """Same WARC framing law as :func:`_make_warc` (version by
    parity); one response whose body is the quality-class page."""
    version = b"WARC/1.1" if doc_id % 2 else b"WARC/1.0"
    q, c = doc_id % 5, doc_id % 7
    body = (
        "<html><body>"
        '<nav><a href="/">Home</a> <a href="/a">News</a></nav>'
        f"<h1>Corpus{c}</h1>"
        + "".join(f"<p>{p}</p>" for p in _corpus_paragraphs(q, c))
        + '<footer><a href="/about">(c) 2024 About</a></footer>'
        "</body></html>"
    ).encode("utf-8")
    status = 404 if q == 4 else 200
    http = (
        b"HTTP/1.1 " + str(status).encode() + b" X\r\n"
        b"Content-Type: text/html\r\n\r\n" + body
    )
    return _warc_record(
        version, b"warcinfo",
        [b"WARC-Date: 2024-01-01T00:00:00Z"], b"software: spk-sl-fixture",
    ) + _warc_record(
        version,
        b"response",
        [
            b"WARC-Target-URI: https://site"
            + str(doc_id % 3).encode()
            + b".com/corpus/"
            + str(doc_id).encode(),
            b"WARC-Date: 2024-01-02T00:00:00Z",
        ],
        http,
    )


def synthesize_corpus_warc_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, warc binary) under the crawl→corpus law above."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_warc_corpus(int(d)))

    return docs.select(F.col(id_col), make(F.col(id_col)).alias("warc"))


# ---------------------------------------------------------------------------
# Member-gzip WARC (the framing Common Crawl actually ships: each
# record is its own gzip member, concatenated — so a reader can seek
# to a record without decompressing the file)
# ---------------------------------------------------------------------------

_GZIP_MAGIC = b"\x1f\x8b"


def gunzip_members(data: bytes) -> tuple[bytes, int]:
    """(decompressed, n_members) for a concatenated-member gzip
    payload. Strict: non-gzip input, a corrupt member, or trailing
    garbage after the last member raise ValueError."""
    if not data.startswith(_GZIP_MAGIC):
        raise ValueError("not a gzip payload")
    out = []
    n = 0
    rest = data
    while rest:
        if not rest.startswith(_GZIP_MAGIC):
            raise ValueError("trailing non-gzip bytes after last member")
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(rest))
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from None
        if not d.eof:
            raise ValueError("truncated gzip member")
        n += 1
        rest = d.unused_data
    return b"".join(out), n


def parse_warc_gz(data: bytes) -> tuple[list[dict], int]:
    """(records, n_members): member-gzip WARC parse — decompress all
    members (one per record in Common Crawl's layout, but the parser
    only requires that the CONCATENATION is a valid WARC stream) and
    parse. Same strictness as :func:`parse_warc`."""
    raw, n_members = gunzip_members(data)
    return parse_warc(raw), n_members


def warc_gz_records(df: DataFrame, warc_col: str = "warc_gz") -> DataFrame:
    """Member-gzip twin of :func:`warc_records` — same output schema,
    ok=false rows for corrupt/NULL archives (bad gzip OR bad WARC)."""
    return df.mapInPandas(
        _records_map(lambda b: parse_warc_gz(b)[0], warc_col), WARC_RECORD_SCHEMA
    )


def synthesize_warc_gz_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, warc_gz binary): the :func:`_make_warc` law with each
    RECORD compressed as its own gzip member (Common Crawl framing;
    mtime pinned to 0 so payloads are deterministic)."""
    import gzip as _gzip
    import io as _io

    def _gz_member(b: bytes) -> bytes:
        buf = _io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(b)
        return buf.getvalue()

    def _make(doc_id: int) -> bytes:
        whole = _make_warc(doc_id)
        # re-split into records on the WARC version line to gzip each
        # as its own member (the writer framing, not the parser's)
        recs = parse_warc(whole)
        # rebuild record byte-spans: walk again but keep raw slices
        spans = []
        pos = 0
        for _ in recs:
            head_end = whole.find(_CRLF + _CRLF, pos)
            head = whole[pos:head_end].split(_CRLF)
            length = next(
                int(line.split(b":", 1)[1])
                for line in head
                if line.lower().startswith(b"content-length")
            )
            end = head_end + 4 + length + 4
            spans.append(whole[pos:end])
            pos = end
        return b"".join(_gz_member(s) for s in spans)

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make(int(d)))

    return docs.select(F.col(id_col), make(F.col(id_col)).alias("warc_gz"))
