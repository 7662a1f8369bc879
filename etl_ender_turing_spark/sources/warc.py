"""WARC (ISO 28500 Web ARChive) record parsing — the container format a
100 TB web pipeline actually ingests (CommonCrawl publishes WARC/WET).

Shape: a WARC file is a CONCATENATION of records, each "WARC/1.0\\r\\n"
+ headers + CRLFCRLF + Content-Length payload bytes + CRLFCRLF; the
payload of a response record is a full HTTP message (status line +
headers + body). Splitting on separators is WRONG — a body may contain
anything, including things that look like record boundaries — so the
parser must walk Content-Length offsets. That offset walk is exactly
what :func:`parse_warc_records` does, for REAL, in the repo's
Arrow-batched ``mapInPandas`` stage (one Python worker per partition,
record batches amortize the per-row cost; at production scale each
input row is one WARC file chunk read as a ``binaryFile`` or blob
column, so partitioning is by chunk — embarrassingly parallel).

Planting discipline (the q_media_meta pattern): the fixture assembles
VALID multi-record WARC chunks JVM-side from doc_id arithmetic + the
documents table's own text — the Python side only ever PARSES, so an
offset bug cannot cancel out against the builder; the DuckDB oracle
regenerates every expected field arithmetically without touching the
bytes.

Reference parity: the reference engine ingests a REST API, not web
archives — this source belongs to the web-curation mandate
(SURVEY.md §6), alongside operators/web.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("chunk_id", T.LongType()),
    T.StructField("uri", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("n_body", T.LongType()),
    T.StructField("body_md5", T.StringType()),
    # the WET half: body text decoded for downstream curation (utf-8
    # with replacement — crawl bytes are never trusted to be valid)
    T.StructField("body", T.StringType()),
])


def synthesize_planted_warc(docs: DataFrame, per_chunk: int = 10,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """(chunk_id, warc): valid multi-record WARC chunks — one response
    record per document (its body is the document's own text), grouped
    ``per_chunk`` records per chunk in id order. All byte assembly is
    JVM-side string/encode work."""
    # single-split fixture input: spread the per-record string assembly
    # before the chunk groupBy (row-wise — values unchanged)
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism)
    body = F.coalesce(F.col(text_col), F.lit(""))
    uri = F.concat(F.lit("https://example-"),
                   (F.col(id_col) % 7).cast("string"),
                   F.lit(".com/page/"), F.col(id_col).cast("string"))
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
              "Content-Length: "),
        F.octet_length(F.encode(body, "utf-8")).cast("string"),
        F.lit("\r\n\r\n"), body)
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        uri, F.lit("\r\nContent-Length: "),
        F.octet_length(F.encode(http, "utf-8")).cast("string"),
        F.lit("\r\n\r\n"), http, F.lit("\r\n\r\n"))
    # integer div, not /: double division truncates wrong past 2^53
    return (docs.select(F.expr(f"{id_col} div {per_chunk}")
                        .cast("bigint").alias("chunk_id"),
                        F.struct(F.col(id_col).alias("i"),
                                 rec.alias("r")).alias("s"))
            .groupBy("chunk_id")
            .agg(F.encode(
                F.array_join(
                    F.transform(F.array_sort(F.collect_list("s")),
                                lambda s: s.getField("r")), ""),
                "utf-8").alias("warc")))


def synthesize_planted_warc_gz(docs: DataFrame, per_chunk: int = 10,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """(chunk_id, warc): the same planted records as
    :func:`synthesize_planted_warc`, but shipped the way CommonCrawl
    actually publishes them — PER-RECORD gzip members concatenated into
    one ``.warc.gz`` blob (each record its own member so consumers can
    seek to an offset and inflate one record). gzip with ``mtime=0`` is
    deterministic; members are built in an Arrow stage (stdlib gzip —
    the JVM side cannot deflate), and the ORACLE IS UNCHANGED: the
    compression must be transparent, so ``planted_warc_records_sql``
    certifies the gzip walk byte-for-byte against the plain one."""
    import gzip

    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism)
    grouped = (docs.select(
        F.expr(f"{id_col} div {per_chunk}").cast("bigint")
        .alias("chunk_id"),
        F.struct(F.col(id_col).alias("i"),
                 F.coalesce(F.col(text_col), F.lit("")).alias("t"))
        .alias("s"))
        .groupBy("chunk_id")
        .agg(F.array_sort(F.collect_list("s")).alias("xs")))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cids, blobs = [], []
            for cid, xs in zip(pdf["chunk_id"], pdf["xs"]):
                members = []
                for s in xs:
                    i, body = int(s["i"]), str(s["t"]).encode()
                    http = (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n"
                            b"Content-Length: %d\r\n\r\n"
                            % len(body)) + body
                    rec = ((f"WARC/1.0\r\nWARC-Type: response\r\n"
                            f"WARC-Target-URI: https://example-{i % 7}"
                            f".com/page/{i}\r\nContent-Length: "
                            f"{len(http)}\r\n\r\n").encode()
                           + http + b"\r\n\r\n")
                    members.append(gzip.compress(rec, mtime=0))
                cids.append(int(cid))
                blobs.append(b"".join(members))
            yield pd.DataFrame({
                "chunk_id": pd.Series(cids, dtype="int64"),
                "warc": blobs})

    schema = T.StructType([T.StructField("chunk_id", T.LongType()),
                           T.StructField("warc", T.BinaryType())])
    return grouped.mapInPandas(run, schema)


def gunzip_members(b: bytes) -> bytes:
    """Concatenated-gzip-member walk with stdlib zlib: inflate one
    member, continue from ``unused_data``, repeat to exhaustion — the
    only correct traversal of a ``.warc.gz`` (searching for magic bytes
    would mis-fire on 0x1f8b inside compressed data). Truncated or
    corrupt members raise ValueError (the caller drops the chunk)."""
    import zlib

    out = bytearray()
    while b:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(b)
            out += d.flush()
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member")
        b = d.unused_data
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    out = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("utf-8", "replace")
    return out


def parse_warc_chunk(chunk_id: int, b: bytes) -> list[dict]:
    """REAL WARC record walk: version line, header block, Content-Length
    payload slice, CRLFCRLF separator — repeated to exhaustion. Records
    with a malformed frame stop the walk (never mis-slice the rest);
    non-HTTP payloads yield NULL status/content_type."""
    out: list[dict] = []
    if b[:2] == b"\x1f\x8b":
        # .warc.gz: per-record gzip members (the CommonCrawl layout) —
        # inflate the member chain first; a corrupt/truncated chain
        # drops the whole chunk (never parse a half-inflated record)
        try:
            b = gunzip_members(b)
        except ValueError:
            return out
    off = 0
    while off < len(b):
        if not b[off:].startswith(b"WARC/1.0\r\n"):
            break
        hdr_end = b.find(b"\r\n\r\n", off)
        if hdr_end < 0:
            break
        headers = _parse_headers(b[off + 10:hdr_end])
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError):
            break
        payload = b[hdr_end + 4:hdr_end + 4 + n]
        if len(payload) != n or b[hdr_end + 4 + n:hdr_end + 8 + n] != \
                b"\r\n\r\n":
            break
        status, ctype, body = None, None, payload
        if payload.startswith(b"HTTP/"):
            pe = payload.find(b"\r\n\r\n")
            if pe >= 0:
                head = payload[:pe]
                body = payload[pe + 4:]
                line = head.split(b"\r\n", 1)[0].split(b" ")
                if len(line) >= 2 and line[1].isdigit():
                    status = int(line[1])
                ctype = _parse_headers(head).get("content-type")
        out.append({
            "chunk_id": chunk_id,
            "uri": headers.get("warc-target-uri"),
            "status": status,
            "content_type": ctype,
            "n_body": len(body),
            "body_md5": hashlib.md5(body).hexdigest(),
            "body": body.decode("utf-8", "replace"),
        })
        off = hdr_end + 8 + n
    return out


def parse_warc_records(df: DataFrame, warc_col: str = "warc",
                       chunk_col: str = "chunk_id") -> DataFrame:
    """Arrow-batched record extraction over WARC chunk blobs."""
    cols = [f.name for f in WARC_RECORD_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for cid, p in zip(pdf[chunk_col], pdf[warc_col]):
                b = (b"" if p is None else
                     (p if isinstance(p, (bytes, bytearray)) else bytes(p)))
                rows.extend(parse_warc_chunk(int(cid), b))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, WARC_RECORD_SCHEMA)


def planted_warc_records_sql(table: str = "documents",
                             per_chunk: int = 10,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """DuckDB oracle: every expected record field regenerated
    arithmetically from the planting formula — URI from the id, status/
    content-type literal, body length/md5 from the document's own text
    (DuckDB md5 hashes the VARCHAR's utf-8 bytes, same as the Python
    side hashing the sliced body bytes)."""
    return f"""
    SELECT CAST({id_col} // {per_chunk} AS BIGINT) AS chunk_id,
           'https://example-' || CAST({id_col} % 7 AS VARCHAR)
             || '.com/page/' || CAST({id_col} AS VARCHAR) AS uri,
           CAST(200 AS INTEGER) AS status,
           'text/html' AS content_type,
           CAST(octet_length(encode(COALESCE({text_col}, '')))
                AS BIGINT) AS n_body,
           md5(COALESCE({text_col}, '')) AS body_md5,
           COALESCE({text_col}, '') AS body
    FROM {table}
    """


def planted_warc_gate_sql(table: str = "documents", min_tokens: int = 40,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """Oracle for ``streaming.stream.warc_gate_stream`` over the planted
    chunks: the gated record fields regenerated arithmetically (uri /
    status from the planting formula, the quality battery over the
    document's own text — which IS the planted body)."""
    from ..operators.textstats import quality_sql_columns
    body = f"COALESCE({text_col}, '')"
    q = quality_sql_columns(body)
    return rf"""
    SELECT 'https://example-' || CAST({id_col} % 7 AS VARCHAR)
             || '.com/page/' || CAST({id_col} AS VARCHAR) AS uri,
           CAST(200 AS INTEGER) AS status,
           {q['n_tokens']} AS n_tokens,
           {q['stopword_ratio']} AS stopword_ratio,
           md5(regexp_replace(lower(trim({body})), '\s+', ' ', 'g'))
             AS fingerprint
    FROM {table}
    WHERE {q['n_tokens']} >= {min_tokens}
    """


def warc_domain_stats(records: DataFrame) -> DataFrame:
    """Ingest→analyze composition: per-registered-host page counts and
    byte/token volume straight off parsed WARC records — the first
    report a crawl operator reads after an archive lands. One hash
    aggregation over host-cardinality keys."""
    host = F.parse_url(F.col("uri"), F.lit("HOST"))
    toks = F.size(F.expr(
        "filter(split(lower(trim(body)), ' '), x -> x <> '')"))
    return (records
            .filter((F.col("status") == 200)
                    & (F.col("content_type") == "text/html"))
            .select(host.alias("host"), F.col("n_body"),
                    toks.alias("n_tokens"))
            .groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.sum("n_body").cast("long").alias("n_bytes"),
                 F.sum("n_tokens").cast("long").alias("n_tokens")))


def planted_warc_domain_stats_sql(table: str = "documents",
                                  id_col: str = "doc_id",
                                  text_col: str = "text") -> str:
    """Oracle for :func:`warc_domain_stats` over the planted chunks —
    hosts and volumes regenerated arithmetically."""
    tok = (f"len(list_filter(string_split(lower(trim("
           f"COALESCE({text_col}, ''))), ' '), x -> x <> ''))")
    return f"""
    SELECT 'example-' || CAST({id_col} % 7 AS VARCHAR) || '.com' AS host,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(octet_length(encode(COALESCE({text_col}, ''))))
                AS BIGINT) AS n_bytes,
           CAST(SUM({tok}) AS BIGINT) AS n_tokens
    FROM {table}
    GROUP BY 1
    """
