"""Crawl-container operators (rounds 6-7): the byte-level plumbing a
web-corpus ingest runs BEFORE any text analysis — mixed-codec
decompression (gzip / bz2 / xz stdlib decoders + zstd via the ctypes
libzstd binding), ustar TAR archive walking, REAL WARC/1.0 record
parsing (ISO 28500 — the actual Common-Crawl front door), and a real
table-free UTF-8 validation state machine with Unicode
maximal-subpart resync (W3C/WHATWG replacement policy).

All three run as Arrow-batched mapInPandas over binary payloads —
zero shuffle, parallelism == partitions, one batch resident per task
— the same 100 TB shape as the image/audio codec ladder. Fixtures are
closed-form in doc_id so DuckDB oracles verify the DECODED output
with no decompressor/parser on their side.
"""

from __future__ import annotations

import bz2
import lzma
import re
import struct
import zlib


# ---------------------------------------------------------------------------
# Mixed-codec text decompression
# ---------------------------------------------------------------------------

def compress_payload(data: bytes, codec: str) -> bytes:
    """Compress with a real container format (not bare deflate):
    gzip (RFC 1952 header + CRC32 + ISIZE), bz2, xz, or zstd
    (ctypes libzstd binding, operators/zstd_codec.py). Fast presets
    (bz2 level 1, xz preset 0) — the fixture ENCODE step is test
    scaffolding, not the operator under measure; the decode path is
    identical at any level, and default xz preset 6 alone was 1.9x the
    whole query's bench gate (BENCH r6)."""
    if codec == "gzip":
        co = zlib.compressobj(level=1, wbits=31)
        return co.compress(data) + co.flush()
    if codec == "bz2":
        return bz2.compress(data, compresslevel=1)
    if codec == "xz":
        return lzma.compress(data, format=lzma.FORMAT_XZ, preset=0)
    if codec == "zstd":
        from .zstd_codec import zstd_compress
        return zstd_compress(data, level=1)
    raise ValueError(f"unknown codec {codec}")


def sniff_decompress(buf: bytes) -> tuple[str, bytes]:
    """Magic-byte dispatch then real decompression. gzip's trailing
    CRC32/ISIZE are verified by zlib itself; xz carries its own
    integrity check. Unknown magics raise NotImplementedError
    (honest-stub policy)."""
    if buf[:2] == b"\x1f\x8b":
        return "gzip", zlib.decompress(buf, wbits=31)
    if buf[:3] == b"BZh":
        return "bz2", bz2.decompress(buf)
    if buf[:6] == b"\xfd7zXZ\x00":
        return "xz", lzma.decompress(buf, format=lzma.FORMAT_XZ)
    if buf[:4] == b"\x28\xb5\x2f\xfd":
        from .zstd_codec import zstd_decompress
        return "zstd", zstd_decompress(buf)
    raise NotImplementedError(
        "no decompressor for this payload (gzip/bz2/xz/zstd "
        "supported)")


# ---------------------------------------------------------------------------
# ustar TAR archives
# ---------------------------------------------------------------------------

def _tar_header(name: str, size: int) -> bytes:
    """One POSIX ustar header block with a correct checksum (the
    checksum is computed with its own field as 8 spaces, then written
    as 6 octal digits + NUL + space — the layout every tar since v7
    agrees on)."""
    h = bytearray(512)
    nb = name.encode()
    if len(nb) > 100:
        raise ValueError("name too long for ustar")
    h[0:len(nb)] = nb
    h[100:108] = b"0000644\x00"               # mode
    h[108:116] = b"0000000\x00"               # uid
    h[116:124] = b"0000000\x00"               # gid
    h[124:136] = (b"%011o" % size) + b"\x00"  # size, octal
    h[136:148] = b"00000000000\x00"           # mtime
    h[148:156] = b"        "                  # checksum placeholder
    h[156] = ord("0")                         # typeflag: regular file
    h[257:263] = b"ustar\x00"                 # magic
    h[263:265] = b"00"                        # version
    chk = sum(h)
    h[148:156] = (b"%06o" % chk) + b"\x00 "
    return bytes(h)


def encode_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Minimal-but-correct ustar writer: header + content padded to
    512-byte blocks per member, then the two zero end-of-archive
    blocks."""
    out = bytearray()
    for name, content in members:
        out += _tar_header(name, len(content))
        out += content
        pad = (-len(content)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def decode_tar(buf: bytes) -> list[tuple[str, bytes]]:
    """Walk a ustar archive: verify each header checksum (computed
    with the checksum field spaced out), parse the octal size, slice
    the content, skip the padding. Stops at the zero block. Raises
    ValueError on a bad checksum or truncated member."""
    out: list[tuple[str, bytes]] = []
    pos = 0
    while pos + 512 <= len(buf):
        block = buf[pos:pos + 512]
        if block == b"\x00" * 512:
            break
        stored = int(block[148:156].split(b"\x00")[0].strip() or b"0", 8)
        calc = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        if stored != calc:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        name = block[0:100].split(b"\x00")[0].decode()
        size = int(block[124:136].split(b"\x00")[0].strip() or b"0", 8)
        start = pos + 512
        if start + size > len(buf):
            raise ValueError("truncated tar member")
        out.append((name, buf[start:start + size]))
        pos = start + size + ((-size) % 512)
    return out


# ---------------------------------------------------------------------------
# UTF-8 validation (maximal-subpart replacement policy)
# ---------------------------------------------------------------------------

def utf8_scan(buf: bytes) -> tuple[int, int]:
    """Real UTF-8 state machine → (n_valid_chars, n_invalid_seqs),
    implementing the Unicode "maximal subpart" replacement policy
    (what WHATWG decoders and python's errors='replace' do): on an
    invalid byte, one replacement is counted for the longest valid
    prefix consumed so far and scanning resyncs AT the offending byte.
    Rejects overlong forms (C0/C1, E0 80-9F, F0 80-8F), surrogates
    (ED A0-BF), and > U+10FFFF (F4 90+, F5-FF)."""
    i, n = 0, len(buf)
    valid = invalid = 0
    while i < n:
        b = buf[i]
        if b < 0x80:
            valid += 1
            i += 1
            continue
        if 0xC2 <= b <= 0xDF:
            lo, hi, need = 0x80, 0xBF, 1
        elif b == 0xE0:
            lo, hi, need = 0xA0, 0xBF, 2
        elif 0xE1 <= b <= 0xEC or 0xEE <= b <= 0xEF:
            lo, hi, need = 0x80, 0xBF, 2
        elif b == 0xED:
            lo, hi, need = 0x80, 0x9F, 2  # no surrogates
        elif b == 0xF0:
            lo, hi, need = 0x90, 0xBF, 3
        elif 0xF1 <= b <= 0xF3:
            lo, hi, need = 0x80, 0xBF, 3
        elif b == 0xF4:
            lo, hi, need = 0x80, 0x8F, 3  # <= U+10FFFF
        else:  # C0, C1, F5-FF, lone continuation 80-BF
            invalid += 1
            i += 1
            continue
        j = i + 1
        # first continuation has the form-specific range; the rest 80-BF
        ok = True
        for k in range(need):
            blo, bhi = (lo, hi) if k == 0 else (0x80, 0xBF)
            if j >= n or not (blo <= buf[j] <= bhi):
                ok = False
                break
            j += 1
        if ok:
            valid += 1
            i = j
        else:
            invalid += 1
            i = j  # resync at the first non-continuation byte
    return valid, invalid


# ---------------------------------------------------------------------------
# Aho-Corasick multi-pattern matcher (blocklist filtering)
# ---------------------------------------------------------------------------

class AhoCorasick:
    """Classic Aho-Corasick automaton (goto/fail/output) for
    multi-pattern substring counting in ONE pass over the text. At
    blocklist scale (10^4-10^5 patterns) this is the only shape that
    survives 100 TB: a regex alternation or per-pattern scan pays
    O(patterns) per document; the automaton pays O(len(text) +
    matches) regardless of pattern count. Overlapping and nested
    occurrences are all counted (the output links), matching the
    per-pattern substring-count oracle."""

    def __init__(self, patterns: list[str]):
        self.patterns = list(patterns)
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        self.fail: list[int] = [0]
        for idx, pat in enumerate(self.patterns):
            s = 0
            for ch in pat:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(idx)
        # BFS fail links; merge output links along failures
        from collections import deque
        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, u in self.goto[r].items():
                q.append(u)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[u] = self.goto[f].get(ch, 0)
                if self.fail[u] == u:
                    self.fail[u] = 0
                self.out[u] = self.out[u] + self.out[self.fail[u]]

    def count(self, text: str) -> list[int]:
        """Occurrence count per pattern (overlaps included)."""
        counts = [0] * len(self.patterns)
        s = 0
        for ch in text:
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for idx in self.out[s]:
                counts[idx] += 1
        return counts


# ---------------------------------------------------------------------------
# WARC/1.0 records (ISO 28500) — the actual crawl-ingest front door
# ---------------------------------------------------------------------------

_WARC_MANDATORY = ("WARC-Type", "WARC-Record-ID", "WARC-Date",
                   "Content-Length")


def encode_warc(records: list[tuple],
                date: str = "2026-01-01T00:00:00Z") -> bytes:
    """Minimal-but-correct WARC/1.0 writer (ISO 28500 framing): per
    record a ``WARC/1.0`` version line, the four mandatory named
    headers (WARC-Type, WARC-Record-ID, WARC-Date, Content-Length)
    plus WARC-Target-URI when given, a blank CRLF line, exactly
    Content-Length payload octets, and the two-CRLF record separator.
    Record IDs are deterministic (md5 of type+uri+payload) so
    fixtures are reproducible. Records are (type, uri, payload) or
    (type, uri, payload, extra_headers) — the 4-tuple form carries
    additional named headers (WARC-Profile, WARC-Payload-Digest,
    WARC-Refers-To-Target-URI for revisit records, ISO 28500 §6.7)."""
    import hashlib
    out = bytearray()
    for rec in records:
        rec_type, uri, payload = rec[0], rec[1], rec[2]
        extra: dict[str, str] = rec[3] if len(rec) > 3 else {}
        rid = hashlib.md5(
            rec_type.encode() + (uri or "").encode() + payload
        ).hexdigest()
        out += b"WARC/1.0\r\n"
        out += b"WARC-Type: " + rec_type.encode() + b"\r\n"
        out += (b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">\r\n")
        out += b"WARC-Date: " + date.encode() + b"\r\n"
        if uri is not None:
            out += b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        for k, v in extra.items():
            out += k.encode() + b": " + v.encode() + b"\r\n"
        out += b"Content-Length: %d\r\n" % len(payload)
        out += b"\r\n"
        out += payload
        out += b"\r\n\r\n"
    return bytes(out)


def decode_warc(buf: bytes) -> list[tuple[str, str | None, bytes]]:
    """Walk concatenated WARC records → [(type, target_uri, payload)].
    Enforces the ISO 28500 framing a 100 TB crawl reader must trust:
    the version line must be WARC/1.0 or WARC/1.1, the four mandatory
    headers must be present, the payload is sliced by Content-Length
    (never by scanning for a sentinel — payloads may contain
    anything), and the two-CRLF record separator must follow.
    ValueError on any corruption (honest-corruption policy: a framing
    slip silently misattributes every later payload, so fail loudly)."""
    return [(h["WARC-Type"], h.get("WARC-Target-URI"), p)
            for h, p in decode_warc_headers(buf)]


def decode_warc_headers(buf: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Full-fidelity WARC walk → [(headers, payload)] with every named
    header preserved (decode_warc's 3-tuple view is derived from
    this). Same framing enforcement and corruption policy."""
    out: list[tuple[dict[str, str], bytes]] = []
    pos = 0
    n = len(buf)
    while pos < n:
        eol = buf.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError(f"missing CRLF after version line at {pos}")
        version = buf[pos:eol]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError(f"bad WARC version line at {pos}: "
                             f"{version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break
            key, sep, val = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[key.strip().decode()] = val.strip().decode()
        for h in _WARC_MANDATORY:
            if h not in headers:
                raise ValueError(f"missing mandatory WARC header {h}")
        try:
            clen = int(headers["Content-Length"])
        except ValueError:
            raise ValueError("non-integer Content-Length") from None
        if clen < 0 or pos + clen + 4 > n:
            raise ValueError("truncated WARC payload")
        payload = buf[pos:pos + clen]
        pos += clen
        if buf[pos:pos + 4] != b"\r\n\r\n":
            raise ValueError(
                "missing two-CRLF record separator (Content-Length "
                "does not frame the payload)")
        pos += 4
        out.append((headers, payload))
    return out


def encode_warc_gz(records: list[tuple[str, str | None, bytes]],
                   date: str = "2026-01-01T00:00:00Z") -> bytes:
    """Member-per-record .warc.gz (the layout Common Crawl actually
    ships): each WARC record is compressed as its OWN complete gzip
    member and the members are concatenated — the property that lets
    a reader fetch one record by (offset, length) from a 1 GB shard
    without decompressing the prefix. RFC 1952 explicitly defines
    multi-member streams; writers that gzip the whole file as one
    member break random access, so the decoder REFUSES that shape."""
    out = bytearray()
    for rec in records:
        co = zlib.compressobj(level=1, wbits=31)
        member = encode_warc([rec], date=date)
        out += co.compress(member) + co.flush()
    return bytes(out)


def decode_warc_gz(buf: bytes) -> list[tuple[str, str | None, bytes]]:
    """Walk a member-per-record .warc.gz: inflate one gzip member at
    a time (zlib verifies each member's CRC32+ISIZE trailer), parse
    exactly one WARC record from it, resync at the next member via
    unused_data. ValueError if a member holds != 1 record (the
    whole-file-gzip shape that silently kills random access) or on
    any framing corruption."""
    out: list[tuple[str, str | None, bytes]] = []
    rest = buf
    while rest:
        do = zlib.decompressobj(wbits=31)
        try:
            member = do.decompress(rest)
            member += do.flush()
        except zlib.error as exc:
            raise ValueError(f"bad gzip member in warc.gz: {exc}") \
                from None
        recs = decode_warc(member)
        if len(recs) != 1:
            raise ValueError(
                f"warc.gz member holds {len(recs)} records; the "
                "member-per-record contract requires exactly 1")
        out.extend(recs)
        if do.unused_data == rest:
            raise ValueError("gzip member consumed no bytes")
        rest = do.unused_data
    return out


def warc_gz_index(buf: bytes) -> list[tuple[int, int, str | None]]:
    """CDX-style member index over a member-per-record .warc.gz:
    [(offset, length, target_uri)] per gzip member, WITHOUT inflating
    payload bodies ahead of need — offsets come from zlib's
    unused_data boundary walk, exactly how a CDX indexer rides the
    gzip member structure. The returned (offset, length) slices are
    independently decodable (the random-access contract)."""
    out: list[tuple[int, int, str | None]] = []
    rest = buf
    pos = 0
    while rest:
        do = zlib.decompressobj(wbits=31)
        try:
            member = do.decompress(rest) + do.flush()
        except zlib.error as exc:
            raise ValueError(f"bad gzip member at {pos}: {exc}") from None
        recs = decode_warc(member)
        if len(recs) != 1:
            raise ValueError("warc.gz member holds != 1 record")
        used = len(rest) - len(do.unused_data)
        if used == 0:
            raise ValueError("gzip member consumed no bytes")
        out.append((pos, used, recs[0][1]))
        pos += used
        rest = do.unused_data
    return out


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[str, str]], int | None]]:
    """Parse robots.txt into groups per RFC 9309: each group is
    (user_agents, [(rule, path_prefix)...], crawl_delay). Rules keep
    file order; agent names are lowercased (matching is
    case-insensitive). Lines outside any group and unknown directives
    are ignored, comments stripped at '#'."""
    groups: list[tuple[list[str], list[tuple[str, str]], int | None]] = []
    agents: list[str] = []
    rules: list[tuple[str, str]] = []
    delay: int | None = None
    open_group = False  # True once a rule line followed the agents

    def flush():
        nonlocal agents, rules, delay, open_group
        if agents:
            groups.append((agents, rules, delay))
        agents, rules, delay, open_group = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if open_group:
                flush()
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            open_group = True
            rules.append((key, val))
        elif key == "crawl-delay":
            open_group = True
            try:
                delay = int(val)
            except ValueError:
                pass
    flush()
    return groups


def _robots_rule_matches(pattern: str, path: str) -> bool:
    """RFC 9309 §2.2.3 path-pattern match: '*' matches any character
    sequence (including '/'), a TRAILING '$' anchors the match at the
    end of the path ('$' elsewhere is a literal octet, matching the
    google/robotstxt reference behavior). Patterns without special
    characters are plain prefix matches."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(p) for p in body.split("*"))
    if not anchored:
        rx += ".*"
    return re.fullmatch(rx, path) is not None


def _robots_agent_spec(ua_token: str, agent: str) -> int:
    """Specificity of a group's user-agent token for `agent`:
    -1 no match, 0 for '*', else the token length (longest
    prefix-token match wins; exact product token beats '*')."""
    if ua_token == "*":
        return 0
    return len(ua_token) if agent.startswith(ua_token) else -1


def robots_decision(groups, agent: str, path: str) -> tuple[bool, int | None]:
    """RFC 9309 evaluation: find the MOST SPECIFIC user-agent token
    that matches `agent` (longest prefix-token match; exact product
    token beats '*'; '*' is the fallback), MERGE the rules of every
    group carrying that token (§2.2.1: multiple groups naming the
    same agent combine), then apply the longest-path-match rule among
    the merged allow/disallow lines — pattern length is the
    specificity, '*'/'$' per §2.2.3 via _robots_rule_matches, ties go
    to allow; an empty Disallow matches nothing; no matching rule ⇒
    allowed. Returns (allowed, crawl_delay) where crawl_delay is the
    first delay declared among the merged groups in file order
    (Crawl-delay is a de-facto extension with no RFC merge rule)."""
    agent = agent.lower()
    best_spec = max((_robots_agent_spec(a, agent)
                     for agents, _, _ in groups for a in agents),
                    default=-1)
    if best_spec < 0:
        return True, None
    merged: list[tuple[str, str]] = []
    delay: int | None = None
    for agents, rules, d in groups:
        if any(_robots_agent_spec(a, agent) == best_spec
               for a in agents):
            merged.extend(rules)
            if delay is None and d is not None:
                delay = d
    verdict, best_len = True, -1
    for rule, pattern in merged:
        if pattern == "":
            continue  # empty pattern matches nothing
        if _robots_rule_matches(pattern, path):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and rule == "allow"):
                best_len = ln
                verdict = (rule == "allow")
    return verdict, delay


def parse_http_response(raw: bytes) -> tuple[int, dict[str, str], bytes]:
    """Parse an HTTP/1.1 response as stored inside a WARC response
    record: status line, header block (case-insensitive names, first
    value wins), then the body — dechunked per RFC 9112 §7.1 when
    Transfer-Encoding: chunked (hex size line [+ extensions], chunk
    bytes, CRLF, ... , 0-chunk, trailer section), else sliced by
    Content-Length, else the remainder. ValueError on framing
    corruption (bad status line, malformed chunk size, chunk
    overrun)."""
    head, sep, rest = raw.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("no header/body separator in HTTP response")
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"bad HTTP status line {lines[0][:40]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError("non-integer HTTP status") from None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, s2, v = line.partition(b":")
        if not s2:
            raise ValueError(f"malformed HTTP header {line!r}")
        headers.setdefault(k.strip().decode().lower(),
                           v.strip().decode())
    # RFC 9112 §6.1: Transfer-Encoding is a comma-separated list of
    # codings applied in order, so they must be REVERSED on receipt
    # and 'chunked' must be the final one. The old exact-equality test
    # silently returned still-chunked bytes for 'gzip, chunked'
    # (ADVICE r7); now: dechunk, then undo the remaining codings
    # (identity/gzip via zlib), NotImplementedError for codings we
    # cannot undo rather than returning mis-coded bytes.
    te_raw = headers.get("transfer-encoding", "")
    codings = [c.strip().lower() for c in te_raw.split(",") if c.strip()]
    if codings and codings[-1] != "chunked":
        raise NotImplementedError(
            f"Transfer-Encoding {te_raw!r} without final 'chunked' "
            "(length delimited by connection close) is not supported")
    for coding in codings[:-1]:
        if coding not in ("identity", "gzip", "x-gzip"):
            raise NotImplementedError(
                f"transfer coding {coding!r} is not supported")
    if codings:
        body = bytearray()
        pos = 0
        while True:
            eol = rest.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("truncated chunk-size line")
            size_tok = rest[pos:eol].split(b";", 1)[0].strip()
            try:
                n = int(size_tok, 16)
            except ValueError:
                raise ValueError(
                    f"bad chunk size {size_tok[:16]!r}") from None
            pos = eol + 2
            if n == 0:
                break  # trailer section ignored
            if pos + n + 2 > len(rest):
                raise ValueError("chunk overruns payload")
            body += rest[pos:pos + n]
            if rest[pos + n:pos + n + 2] != b"\r\n":
                raise ValueError("missing CRLF after chunk data")
            pos += n + 2
        payload = bytes(body)
        for coding in reversed(codings[:-1]):
            if coding in ("gzip", "x-gzip"):
                try:
                    payload = zlib.decompress(payload, wbits=31)
                except zlib.error as exc:
                    raise ValueError(
                        f"bad gzip transfer coding: {exc}") from None
            # 'identity' is a no-op (validated above)
        return status, headers, payload
    if "content-length" in headers:
        n = int(headers["content-length"])
        if n > len(rest):
            raise ValueError("Content-Length overruns payload")
        return status, headers, rest[:n]
    return status, headers, rest


def encode_http_chunked(status: int, headers: list[tuple[str, str]],
                        body: bytes, chunk_size: int) -> bytes:
    """Emit an HTTP/1.1 response with chunked transfer coding —
    chunk-size lines in lowercase hex, final 0-chunk, empty trailer."""
    out = bytearray(b"HTTP/1.1 %d OK\r\n" % status)
    for k, v in headers:
        out += f"{k}: {v}\r\n".encode()
    out += b"Transfer-Encoding: chunked\r\n\r\n"
    for i in range(0, len(body), chunk_size):
        chunk = body[i:i + chunk_size]
        out += b"%x\r\n" % len(chunk) + chunk + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def html_to_text(html: str) -> str:
    """The WET converter's text extraction (the regex core shared
    with q_html_extract): drop <script>/<style> WITH their contents,
    replace remaining tags with spaces, decode the two entities the
    fixtures use, collapse whitespace, trim. Boilerplate-agnostic tag
    removal — content/boilerplate classification is a downstream
    concern, exactly as in Common Crawl's WET generation."""
    flat = re.sub(r"<script[^>]*>.*?</script>", "", html,
                  flags=re.DOTALL | re.IGNORECASE)
    flat = re.sub(r"<style[^>]*>.*?</style>", "", flat,
                  flags=re.DOTALL | re.IGNORECASE)
    flat = re.sub(r"<[^>]+>", " ", flat)
    flat = re.sub(r"&#32;|&nbsp;", " ", flat)
    return re.sub(r"\s+", " ", flat).strip()


def derive_wet(warc_blob: bytes) -> bytes:
    """Derive a WET blob (the text-only Common Crawl distribution)
    from a WARC blob: for every `response` record, parse the stored
    HTTP response (dechunk / un-transfer-code per RFC 9112), extract
    plain text from the HTML body, and emit a `conversion` record
    with the same WARC-Target-URI; a leading warcinfo record marks
    the derivation. Framing in and out is real ISO 28500 — a WET
    consumer (decode_warc) reads the output unchanged."""
    out: list[tuple[str, str | None, bytes]] = [
        ("warcinfo", None, b"software: mvetl-wet\r\n")]
    for rec_type, uri, payload in decode_warc(warc_blob):
        if rec_type != "response":
            continue
        status, headers, body = parse_http_response(payload)
        ctype = headers.get("content-type", "")
        if status != 200 or not ctype.startswith("text/html"):
            continue
        text = html_to_text(body.decode("utf-8", errors="replace"))
        out.append(("conversion", uri, text.encode()))
    return encode_warc(out)


def derive_wat(warc_blob: bytes) -> bytes:
    """Derive a WAT blob (the metadata sidecar Common Crawl ships
    beside each WARC): one `metadata` record per source record whose
    payload is a compact JSON envelope — record type, target URI,
    and for response records the parsed HTTP status / content type /
    decoded body length. Key order is sorted and separators compact
    so envelopes are byte-deterministic across writers."""
    import json
    out: list[tuple[str, str | None, bytes]] = []
    for rec_type, uri, payload in decode_warc(warc_blob):
        env: dict[str, object] = {
            "content_length": len(payload),
            "content_type": None,
            "status": None,
            "uri": uri,
        }
        if rec_type == "response":
            status, headers, body = parse_http_response(payload)
            env["status"] = status
            env["content_type"] = headers.get("content-type")
            env["content_length"] = len(body)
        out.append(("metadata", uri,
                    json.dumps(env, sort_keys=True,
                               separators=(",", ":")).encode()))
    return encode_warc(out)


_REVISIT_PROFILE = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def warc_revisit_dedup(warc_blob: bytes) -> bytes:
    """Within-shard payload dedup via WARC `revisit` records (ISO
    28500 §6.7.2, the identical-payload-digest profile Common Crawl
    and Heritrix write): walk the shard, digest every response
    payload (sha256 hex — the digest algorithm is a writer choice
    recorded in WARC-Payload-Digest's prefix), keep the FIRST
    response per digest, and rewrite later duplicates as empty-body
    `revisit` records carrying WARC-Profile, WARC-Payload-Digest,
    and WARC-Refers-To-Target-URI pointing at the kept copy.
    Non-response records pass through unchanged. The shard is the
    dedup scope (per-task state at 100 TB); cross-shard dedup is the
    downstream exact-dedup join's job."""
    import hashlib
    out: list[tuple] = []
    seen: dict[str, str] = {}  # digest -> first target URI
    for headers, payload in decode_warc_headers(warc_blob):
        rec_type = headers["WARC-Type"]
        uri = headers.get("WARC-Target-URI")
        if rec_type != "response":
            out.append((rec_type, uri, payload))
            continue
        digest = "sha256:" + hashlib.sha256(payload).hexdigest()
        if digest not in seen:
            seen[digest] = uri or ""
            out.append((rec_type, uri, payload))
        else:
            out.append(("revisit", uri, b"", {
                "WARC-Profile": _REVISIT_PROFILE,
                "WARC-Payload-Digest": digest,
                "WARC-Refers-To-Target-URI": seen[digest],
            }))
    return encode_warc(out)


# ---------------------------------------------------------------------------
# ZIP container (PKWARE APPNOTE structure: local headers, central
# directory, EOCD — stored and deflate members)
# ---------------------------------------------------------------------------

# Fixed DOS timestamp (2024-01-01 00:00:00) keeps archives byte-
# deterministic across runs.
_ZIP_DOS_DATE = ((2024 - 1980) << 9) | (1 << 5) | 1
_ZIP_DOS_TIME = 0


def encode_zip(members: list[tuple[str, bytes, str]]) -> bytes:
    """Write a ZIP archive: per member a local file header + payload
    (method 'stored' or 'deflate' — deflate is the raw stream,
    RFC 1951, via zlib wbits=-15), then the central directory and the
    end-of-central-directory record. CRC-32 and both sizes go in the
    local header directly (no data descriptors), so the archive is
    randomly accessible from the central directory alone."""
    out = bytearray()
    central = bytearray()
    for name, content, method in members:
        mid = {"stored": 0, "deflate": 8}[method]
        if mid == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(content) + co.flush()
        else:
            payload = content
        crc = zlib.crc32(content) & 0xFFFFFFFF
        nb = name.encode()
        offset = len(out)
        local = struct.pack(
            "<IHHHHHIIIHH", 0x04034B50, 20, 0, mid,
            _ZIP_DOS_TIME, _ZIP_DOS_DATE, crc,
            len(payload), len(content), len(nb), 0)
        out += local + nb + payload
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, mid,
            _ZIP_DOS_TIME, _ZIP_DOS_DATE, crc,
            len(payload), len(content), len(nb), 0, 0, 0, 0, 0,
            offset) + nb
    cd_offset = len(out)
    out += central
    out += struct.pack("<IHHHHIIH", 0x06054B50, 0, 0,
                       len(members), len(members),
                       len(central), cd_offset, 0)
    return bytes(out)


def decode_zip(buf: bytes) -> list[tuple[str, str, bytes]]:
    """Walk a ZIP archive the correct way — locate the EOCD record by
    scanning backwards (a trailing archive comment may displace it up
    to 64 KiB), then iterate the central directory and random-access
    each member through its local header (re-reading the LOCAL name/
    extra lengths, which legitimately differ from the central copy).
    Verifies each member's CRC-32 and uncompressed size. Returns
    (name, method, content). ValueError on structural corruption or a
    CRC mismatch; NotImplementedError on a valid-but-unsupported
    compression method or encrypted member (general-purpose bit 0)."""
    eocd = buf.rfind(b"PK\x05\x06", max(0, len(buf) - 65557))
    if eocd < 0 or eocd + 22 > len(buf):
        raise ValueError("zip: no end-of-central-directory record")
    (_, _, _, _, n_total, cd_size, cd_offset, _) = struct.unpack(
        "<IHHHHIIH", buf[eocd:eocd + 22])
    if cd_offset + cd_size > len(buf):
        raise ValueError("zip: central directory out of range")
    out: list[tuple[str, str, bytes]] = []
    pos = cd_offset
    for _ in range(n_total):
        if buf[pos:pos + 4] != b"PK\x01\x02":
            raise ValueError("zip: bad central directory signature")
        (_, _, _, flags, mid, _, _, crc, csize, usize, nlen, xlen, clen,
         _, _, _, offset) = struct.unpack("<IHHHHHHIIIHHHHHII",
                                          buf[pos:pos + 46])
        name = buf[pos + 46:pos + 46 + nlen].decode()
        pos += 46 + nlen + xlen + clen
        if flags & 0x1:
            raise NotImplementedError("zip: encrypted member")
        if buf[offset:offset + 4] != b"PK\x03\x04":
            raise ValueError("zip: bad local header signature")
        lnlen, lxlen = struct.unpack("<HH", buf[offset + 26:offset + 30])
        start = offset + 30 + lnlen + lxlen
        if start + csize > len(buf):
            raise ValueError("zip: truncated member payload")
        payload = buf[start:start + csize]
        if mid == 0:
            content = payload
        elif mid == 8:
            content = zlib.decompressobj(-15).decompress(payload)
        else:
            raise NotImplementedError(f"zip: compression method {mid}")
        if len(content) != usize:
            raise ValueError(f"zip: {name}: size mismatch")
        if (zlib.crc32(content) & 0xFFFFFFFF) != crc:
            raise ValueError(f"zip: {name}: CRC-32 mismatch")
        out.append((name, "stored" if mid == 0 else "deflate", content))
    return out
