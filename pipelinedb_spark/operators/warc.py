"""WARC (Web ARChive, ISO 28500) ingestion — the container format of
the big public web crawls, i.e. what a 100 TB training-corpus
pipeline actually starts from.

Spark-first shape: `spark.read.format("binaryFile")` lists and
distributes the archive FILES (one task per file — WARC members are
not splittable mid-stream), and an Arrow-batched ``mapInPandas``
kernel walks each file's records with pure-stdlib parsing:

* WARC/1.0 and /1.1 record grammar: header block (CRLF-terminated
  ``Name: value`` lines) + Content-Length payload + CRLF CRLF.
* ``.warc.gz``: the spec's member-per-record gzip framing (also
  handles whole-file gzip) via ``zlib`` — no external libs.
* response records: the embedded HTTP response is split into status /
  headers / body, with the body's Content-Type surfaced.
* a crude-but-dependency-free HTML→text extraction for the text
  pipeline (tag/script/style strip + entity decode) — production
  swaps in a real extractor (trafilatura/justext) at this exact seam.

Scale notes: payloads dominate row size, so ``payload_limit`` caps
what is carried per record (oversized bodies are truncated with the
original length still reported).  ``binaryFile`` reads a whole file
per task — set ``spark.sql.files.maxPartitionBytes`` irrelevant here;
instead size WARC files (the crawls ship ~1 GB members) against
executor memory, and lift the per-task cap with more, smaller files.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType()),
    T.StructField("record_idx", T.IntegerType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("record_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("payload_length", T.LongType()),
    T.StructField("truncated", T.BooleanType()),
])


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members (the .warc.gz framing) → bytes.
    Handles single-member (whole-file) gzip as the degenerate case."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data[pos:]))
        out.append(d.flush())
        rest = d.unused_data
        if not rest:
            break
        pos = len(data) - len(rest)
    return b"".join(out)


def parse_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record.  Pure
    byte parsing of the ISO 28500 grammar; tolerant of leading
    garbage between records (skips to the next ``WARC/`` magic)."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        lines = data[start:hdr_end].split(b"\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = \
                    v.strip().decode("latin-1")
        clen = None
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            pass
        body_start = hdr_end + 4
        if clen is not None and clen >= 0:
            payload = data[body_start:body_start + clen]
            pos = body_start + clen
        else:
            # missing/unparseable Content-Length: the record body is
            # unterminated, so resuming the WARC/ scan INSIDE it
            # would turn literal 'WARC/' text in an HTML payload
            # into a phantom record with misattributed bytes
            # (ADVICE r7).  Recover at the next real record
            # boundary (blank line + magic) instead.
            nxt = data.find(b"\r\n\r\nWARC/", body_start)
            if nxt < 0:
                payload = data[body_start:]
                pos = n
            else:
                payload = data[body_start:nxt]
                pos = nxt + 4
        yield headers, payload


def _split_http(payload: bytes):
    """HTTP response payload → (status, content_type, body)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, payload
    head = payload[:sep].split(b"\r\n")
    status = None
    ctype = None
    parts = head[0].split(b" ", 2)
    if len(parts) >= 2:
        try:
            status = int(parts[1])
        except ValueError:
            pass
    for ln in head[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
    return status, ctype, payload[sep + 4:]


def warc_records(files: DataFrame,
                 payload_limit: int = 1 << 20,
                 record_types: tuple[str, ...] = ("response",)
                 ) -> DataFrame:
    """(path, content) archive-file rows → one row per WARC record
    (the kernel behind :func:`read_warc`, factored so the SAME parse
    runs over a streaming binaryFile source — see
    ``attach_archive_stream``)."""
    files = files.select("path", "content")
    want = {t.lower() for t in record_types}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:2] == b"\x1f\x8b":
                    try:
                        data = _gunzip_members(data)
                    except zlib.error:
                        continue  # corrupt gzip shard → skip file
                for i, (hdr, payload) in enumerate(
                        parse_warc_records(data)):
                    rtype = hdr.get("warc-type", "")
                    if want and rtype.lower() not in want:
                        continue
                    status, http_ct, body = _split_http(payload)
                    ctype = http_ct or hdr.get("content-type")
                    tr = len(body) > payload_limit
                    rows.append((
                        fpath, i, hdr.get("warc-record-id"),
                        rtype, hdr.get("warc-target-uri"),
                        hdr.get("warc-date"), status, ctype,
                        body[:payload_limit], len(body), tr))
            yield pd.DataFrame(rows, columns=[
                f.name for f in WARC_SCHEMA.fields])

    from . import spread_input
    return spread_input(files).mapInPandas(kernel, WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str,
              payload_limit: int = 1 << 20,
              record_types: tuple[str, ...] = ("response",)
              ) -> DataFrame:
    """WARC / WARC.GZ files under ``path`` → one row per record.

    One archive file per task (binaryFile distribution); records of
    ``record_types`` only (responses by default — request/metadata
    records are crawl bookkeeping).  HTTP responses are unwrapped:
    ``payload`` is the BODY, with status and Content-Type lifted into
    columns.  Bodies larger than ``payload_limit`` are truncated
    (``truncated`` flags them, ``payload_length`` keeps the true
    size) so one huge page cannot blow an Arrow batch."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path))
    return warc_records(files, payload_limit, record_types)


_TAG_DROP = re.compile(
    rb"<(script|style|noscript)\b.*?</\1\s*>", re.S | re.I)
_TAG = re.compile(rb"<[^>]+>")
_ENTITIES = {b"&amp;": b"&", b"&lt;": b"<", b"&gt;": b">",
             b"&quot;": b'"', b"&#39;": b"'", b"&apos;": b"'",
             b"&nbsp;": b" "}
_WS = re.compile(rb"[ \t\r\f\v]*\n[ \t\r\f\v]*\n[\s]*")
_SP = re.compile(rb"[ \t\r\f\v]+")


def html_to_text_py(body: bytes) -> str:
    """Dependency-free HTML→text: drop script/style subtrees, strip
    tags, decode the common entities, collapse whitespace.  The crude
    baseline — :func:`extract_main_text` layers boilerplate removal
    on top and is the default extraction for crawl documents."""
    body = _TAG_DROP.sub(b" ", body)
    body = _TAG.sub(b" ", body)
    for k, v in _ENTITIES.items():
        body = body.replace(k, v)
    body = _WS.sub(b"\n\n", body)
    body = _SP.sub(b" ", body)
    return body.decode("utf-8", errors="replace").strip()


# ---------------------------------------------------------------------------
# Boilerplate-aware main-text extraction (round-8 task 5): the
# justext/trafilatura-class method — segment the page into block-level
# text units, score each by link density + stopword density + length,
# then a context pass where borderline blocks inherit their
# neighbors' verdicts (Pomikálek 2011, "Removing boilerplate and
# duplicate content from web corpora", the public jusText algorithm).
# Pure stdlib (html.parser); runs inside the same Arrow kernel as the
# tag-strip path, so the 100 TB shape is unchanged — one mapInPandas
# over archive files.
# ---------------------------------------------------------------------------

_SKIP_TAGS = frozenset(
    "script style noscript svg template head iframe object embed".split())
_BOILER_TAGS = frozenset("nav footer header aside menu form".split())
_BLOCK_TAGS = frozenset(
    ("p div section article main li ul ol td th tr table blockquote "
     "pre h1 h2 h3 h4 h5 h6 dd dt dl figure figcaption br hr "
     "fieldset legend address summary details").split())
# function words: used for a language-agnostic-ish DENSITY signal
# (boilerplate is link lists and labels, prose has connectives), not
# for language ID — text.py owns that.  The union covers the major
# European crawl languages (the jusText approach ships per-language
# lists; a union works because function words almost never appear in
# nav/footer link labels in ANY language): en + de/fr/es/it/pt/nl.
_STOPWORDS = frozenset(
    ("the a an and or of to in is are was were be been it that this "
     "with as for on at by from not but he she they we you i his her "
     "its their our your have has had do does did will would can "
     "could should may might about into over after before more most "
     "other some such only own same so than too very just there what "
     "which who when where why how all any both each few if then "
     "because while during between against through under again out "
     "up down off above below no nor once here "
     # de
     "der die das den dem des ein eine einen einem und oder aber "
     "nicht ist sind war waren wird werden kann mit von zu für auf "
     "im am als auch wenn dass sich bei nach über unter durch "
     # fr
     "le la les un une des du de et ou mais ne pas est sont était "
     "sera avec pour sur dans par ce cette ces qui que quoi dont où "
     "il elle ils elles nous vous aux au "
     # es
     "el los las uno unos unas y o pero no es son era será con para "
     "sobre en por este esta estos estas quien cual donde cuando se "
     "lo su sus nos os al "
     # it
     "il gli i uno una e ma non è sono erano sarà con per su tra fra "
     "questo questa questi queste chi che dove quando si ci ne nel "
     "della delle dei degli dal dalla "
     # pt
     "o os as um uma uns umas e ou mas não é são foi será com para "
     "sobre em por este esta isto quem qual onde quando se seu sua "
     "nos dos das no na "
     # nl
     "de het een en of maar niet is zijn was waren wordt kan met van "
     "naar voor op bij als ook dat zich door over onder "
     ).split())


class _BlockParser(HTMLParser):
    """Streams HTML into (text, link_chars, in_boiler) block tuples."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool]] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._skip = 0
        self._boiler = 0
        self._link = 0

    def _flush(self):
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((text, self._link_chars,
                                self._boiler > 0))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if tag in _BLOCK_TAGS or tag in _BOILER_TAGS:
            self._flush()
        if tag in _BOILER_TAGS:
            self._boiler += 1
        if tag == "a":
            self._link += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag in _BLOCK_TAGS or tag in _BOILER_TAGS:
            self._flush()
        if tag in _BOILER_TAGS:
            self._boiler = max(0, self._boiler - 1)
        if tag == "a":
            self._link = max(0, self._link - 1)

    def handle_data(self, data):
        if self._skip:
            return
        self._buf.append(data)
        if self._link:
            self._link_chars += len(data)

    def close(self):
        self._flush()
        super().close()


# the stopword union covers LATIN-script languages only, so the
# density bar is meaningful exactly for characters in the Latin
# ranges (+ digits/punctuation that ride along in Latin prose).
# Every other script — CJK/kana/hangul/thai, but equally khmer, lao,
# myanmar, tibetan, hebrew, georgian, … (review r9: an explicit
# script list chases omissions forever) — has a structurally-zero
# stopword density, never evidence of boilerplate.  Keying the
# exemption on actual non-Latin characters (not a words-per-char
# heuristic) means a Latin block of long tokens (base64 blobs, bare
# URLs, minified identifiers) gets NO free pass, and
# spaced-but-stopword-free scripts like Korean are exempt per-block
# instead of relying on the page-level fallback.  Scoreable ranges:
# ASCII + Latin-1 + Latin Extended A/B/Additional, plus General
# Punctuation (curly quotes/dashes in English prose must not count
# as "blind").  Latin-script languages OUTSIDE the stopword union
# (Vietnamese, Turkish, …) intentionally stay non-exempt — the
# page-level degenerate-signal mode covers them.
_SW_BLIND_RE = re.compile(
    "[^\\u0000-\\u024f\\u1e00-\\u1eff\\u2000-\\u206f]")


def _stopword_blind(text: str) -> bool:
    """≥50% of the block's non-space characters are LETTERS of
    scripts the stopword list can't score.  The isalpha() gate keeps
    non-script junk — U+FFFD replacement runs from undecodable
    bytes, emoji, arrows/dingbats/symbol art — OUT of the blind
    count (review r9: a mojibake or star-rating block must not ride
    the exemption to 'good').  Latin pages run zero finditer
    iterations, so the hot path is untouched."""
    total = len(text) - text.count(" ")
    if total <= 0:
        return False
    blind = sum(1 for m in _SW_BLIND_RE.finditer(text)
                if m.group().isalpha())
    return 2 * blind >= total


def _first_pass(blocks, min_good_chars=60, max_link_density=0.2,
                min_stop_ratio=0.18, short_chars=20,
                require_stopwords=True):
    """Context-free verdicts: good / bad / near / short.

    Stopword handling follows jusText's published answer for
    stopword-free languages (Pomikálek 2011 runs with
    ``stopwords_low = stopwords_high = 0`` there): a block written
    predominantly in a script the stopword union is blind to
    (:func:`_stopword_blind`) is exempt from the density bar, and
    ``require_stopwords=False`` drops the bar for every block (the
    page-level mode :func:`extract_main_text` engages when NO block
    on the page carries any function-word signal — e.g. Vietnamese
    or Turkish, Latin-script languages outside the stopword union).
    Length and link-density scoring are character-based and apply
    unchanged."""
    out = []
    for text, link_chars, boiler in blocks:
        ld = link_chars / max(len(text), 1)
        if boiler or ld > 0.4:
            out.append("bad")
            continue
        # the stopword pass (lowercase + split + set lookups) and the
        # blind-script scan run ONLY for length/link-density-eligible
        # blocks — nav/footer/link-lists, a large share of every
        # crawled page, are classified from ld/boiler alone (review
        # r9: this loop is the per-document hot path of the
        # extraction kernel)
        if len(text) >= min_good_chars and ld <= max_link_density:
            if not require_stopwords:
                out.append("good")
                continue
            words = text.lower().split()
            stop = sum(w.strip('.,;:!?"()[]') in _STOPWORDS
                       for w in words)
            if (stop / max(len(words), 1) >= min_stop_ratio
                    or _stopword_blind(text)):
                out.append("good")
                continue
        out.append("short" if len(text) < short_chars else "near")
    return out


def _max_stop_ratio(blocks, min_chars=60):
    """Strongest function-word signal among candidate (non-boiler,
    substantial) blocks — ~0 across the whole page means a
    stopword-free language, not a page of boilerplate."""
    best = 0.0
    for text, link_chars, boiler in blocks:
        if boiler or len(text) < min_chars:
            continue
        words = text.lower().split()
        if not words:
            continue
        stop = sum(w.strip('.,;:!?"()[]') in _STOPWORDS for w in words)
        best = max(best, stop / len(words))
    return best


def _context_pass(cls):
    """jusText's neighborhood rule: 'near' blocks become good when
    EITHER surrounding non-ambiguous verdict is good; 'short' blocks
    become good when the NEXT one is (the headline rule: an article's
    heading sits right before its first good paragraph, while short
    nav labels are followed by more link-list blocks, which are
    bad)."""
    n = len(cls)

    def near_good(i, step):
        j = i + step
        while 0 <= j < n and cls[j] in ("short", "near"):
            j += step
        return 0 <= j < n and cls[j] == "good"

    out = []
    for i, c in enumerate(cls):
        if c == "good" or c == "bad":
            out.append(c)
        elif c == "near":
            out.append("good" if near_good(i, -1) or near_good(i, 1)
                       else "bad")
        else:
            out.append("good" if near_good(i, 1) else "bad")
    return out


def extract_main_text(body: bytes, method: str = "density") -> str:
    """HTML → MAIN text.  ``method='density'`` (default) segments
    into blocks and keeps prose-dense ones (nav/footer/link-list
    boilerplate dropped); when no block clears the bar — tiny or
    degenerate pages — it falls back to the plain tag-strip so the
    document still flows downstream.  ``method='strip'`` is the crude
    baseline unchanged."""
    if method == "strip":
        return html_to_text_py(body)
    if method != "density":
        raise ValueError(f"unknown extraction method {method!r}")
    try:
        p = _BlockParser()
        p.feed(body.decode("utf-8", errors="replace"))
        p.close()
    except Exception:   # hostile markup: never kill the batch
        return html_to_text_py(body)
    verdicts = _context_pass(_first_pass(p.blocks))
    good = [b[0] for b, c in zip(p.blocks, verdicts) if c == "good"]
    if not good and _max_stop_ratio(p.blocks) < 0.05:
        # stopword-free page (round-9 task 4): no candidate block
        # carries ANY function-word signal, so the density bar is
        # structurally unmeetable — re-score on length + link density
        # alone (jusText's stopword-free mode) instead of silently
        # tag-stripping the whole page with its boilerplate
        verdicts = _context_pass(
            _first_pass(p.blocks, require_stopwords=False))
        good = [b[0] for b, c in zip(p.blocks, verdicts) if c == "good"]
    if not good:
        return html_to_text_py(body)
    return "\n\n".join(good)


def warc_text_documents(records: DataFrame,
                        min_chars: int = 1,
                        method: str = "density") -> DataFrame:
    """WARC response rows → (doc_id, url, fetched_at, text) documents
    for the curation pipeline: HTML bodies through
    :func:`extract_main_text` (``method=`` selects 'density'
    boilerplate removal or the crude 'strip'), text/plain bodies
    decoded directly.  ``doc_id`` is a stable hash of the record id +
    URI, so re-runs key identically."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("fetched_at", T.StringType()),
        T.StructField("text", T.StringType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, uri, date, ctype, body in zip(
                    pdf["record_id"], pdf["target_uri"],
                    pdf["warc_date"], pdf["content_type"],
                    pdf["payload"]):
                ct = (ctype or "").lower()
                if "html" in ct:
                    text = extract_main_text(bytes(body or b""), method)
                elif "text/plain" in ct:
                    text = (bytes(body or b"")
                            .decode("utf-8", errors="replace").strip())
                else:
                    continue
                if len(text) < min_chars:
                    continue
                # truncated blake2b, not CRC32: CRC is linear and
                # weakly mixing, so correlated crawl URLs collide far
                # above the 2^-62 birthday floor — a collision would
                # silently alias distinct documents in every
                # downstream dedup/join (ADVICE r7).
                # MIGRATION (ADVICE r8): this re-keyed every document
                # relative to the pre-r8 CRC32 scheme.  Persisted
                # span/LSH/BM25 indexes and dedup state built from
                # pre-upgrade doc_ids never match newly extracted
                # docs — rebuild any doc_id-keyed index from
                # re-extracted text after upgrading (incremental
                # probe/append against an old-keyed index silently
                # stops deduping against the old corpus)
                did = int.from_bytes(
                    hashlib.blake2b(f"{rid}|{uri}".encode(),
                                    digest_size=8).digest(),
                    "big") & 0x7FFF_FFFF_FFFF_FFFF  # fits int64
                rows.append((did, uri, date, text))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              schema.fields])

    from . import spread_input
    sel = spread_input(records.select("record_id", "target_uri",
                                      "warc_date", "content_type",
                                      "payload"))
    return sel.mapInPandas(kernel, schema)
