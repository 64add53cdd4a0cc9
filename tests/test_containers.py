"""Crawl-container operators (operators/containers.py): TAR writer/
walker cross-checked against stdlib tarfile in BOTH directions,
mixed-codec decompression round-trips, and the UTF-8 DFA
branch-covered against python's own codec (maximal-subpart
replacement counting)."""

from __future__ import annotations

import io
import tarfile

import pytest

from challenge8_movies_etl_spark.operators.containers import (
    compress_payload,
    decode_tar,
    encode_tar,
    sniff_decompress,
    utf8_scan,
)


def test_codec_roundtrip_and_sniff():
    data = b"the quick brown fox " * 50
    for codec in ("gzip", "bz2", "xz"):
        buf = compress_payload(data, codec)
        got_codec, got = sniff_decompress(buf)
        assert (got_codec, got) == (codec, data)
    with pytest.raises(NotImplementedError, match="decompressor"):
        sniff_decompress(b"\x00\x01\x02\x03\x04\x05")


def test_gzip_integrity_trailer_checked():
    buf = bytearray(compress_payload(b"payload bytes here", "gzip"))
    buf[-5] ^= 0xFF  # corrupt CRC32/ISIZE trailer
    with pytest.raises(Exception):
        sniff_decompress(bytes(buf))


def test_tar_roundtrip_ours():
    members = [("a/b.txt", b"hello"), ("c.bin", b"\x00" * 600),
               ("empty.txt", b""), ("exact.txt", b"x" * 512)]
    assert decode_tar(encode_tar(members)) == members


def test_tar_ours_readable_by_stdlib():
    members = [("doc1/part0.txt", b"en" * 5), ("doc1/part1.txt", b"fr" * 10)]
    tf = tarfile.open(fileobj=io.BytesIO(encode_tar(members)))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


def test_tar_stdlib_readable_by_ours():
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, content in [("x.txt", b"abc"), ("y/z.txt", b"d" * 700)]:
            info = tarfile.TarInfo(name)
            info.size = len(content)
            tf.addfile(info, io.BytesIO(content))
    got = decode_tar(bio.getvalue())
    assert got == [("x.txt", b"abc"), ("y/z.txt", b"d" * 700)]


def test_tar_checksum_corruption_detected():
    buf = bytearray(encode_tar([("f.txt", b"data")]))
    buf[0] ^= 0xFF  # flip a name byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        decode_tar(bytes(buf))
    with pytest.raises(ValueError, match="truncated"):
        decode_tar(encode_tar([("f.txt", b"data" * 200)])[:512 + 100])


def _python_counts(raw: bytes) -> tuple[int, int]:
    """Twin via python's codec: valid scalars + replacement count
    under errors='replace' (python implements maximal subpart)."""
    s = raw.decode("utf-8", errors="replace")
    inv = s.count("�") - raw.decode().count("�") \
        if b"\xef\xbf\xbd" in raw else s.count("�")
    return len(s) - inv, inv


@pytest.mark.parametrize("raw", [
    b"plain ascii",
    "héllo wörld".encode(),
    "日本語テキスト".encode(),
    "emoji 🎉 and 𝔘𝔫𝔦𝔠𝔬𝔡𝔢".encode(),
    b"",
    b"\xff",                      # invalid lead
    b"\x80\x80",                  # lone continuations
    b"\xc0\xaf",                  # overlong '/'
    b"\xc1\xbf",                  # overlong
    b"\xe0\x80\xaf",              # overlong 3-byte
    b"\xe0\xa0",                  # truncated 3-byte (valid prefix)
    b"\xed\xa0\x80",              # surrogate D800
    b"\xed\x9f\xbf",              # U+D7FF (valid, just below)
    b"\xf0\x8f\xbf\xbf",          # overlong 4-byte
    b"\xf0\x90\x80\x80",          # U+10000 (valid)
    b"\xf4\x8f\xbf\xbf",          # U+10FFFF (valid, max)
    b"\xf4\x90\x80\x80",          # > U+10FFFF
    b"\xf5\x80\x80\x80",          # invalid lead F5
    b"ab\xe2\x82",                # truncated euro at end
    b"\xe2\x82\xacX\xc3",         # valid euro, then truncated 2-byte
    b"a\xc3\x28b",                # 2-byte lead + non-continuation
])
def test_utf8_scan_matches_python_codec(raw):
    want = _python_counts(raw)
    assert utf8_scan(raw) == want, raw


def test_utf8_scan_exhaustive_two_bytes():
    """Every 2-byte sequence: DFA total (valid + invalid-weighted
    consumption) must agree with python's replace decoding."""
    for b0 in range(0x80, 0x100):
        for b1 in (0x00, 0x7F, 0x80, 0x9F, 0xA0, 0xBF, 0xC0, 0xFF):
            raw = bytes((b0, b1))
            assert utf8_scan(raw) == _python_counts(raw), raw


def test_pii_luhn_matches_reference_convention(spark):
    """The 12-digit static unroll must implement the standard Luhn
    convention (double every 2nd digit from the RIGHT): cross-check
    is_valid against a pure-python reference on the query's own
    output, and pin that exactly the even orderkeys validate."""
    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    from tests.conftest import SF_SMOKE
    load_all()

    def luhn_ok(s):
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2 - (9 if d >= 5 else 0)
            total += d
        return total % 10 == 0

    rows = QUERIES["q_pii_luhn"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert len(r["acct"]) == 12
        assert r["is_valid"] == luhn_ok(r["acct"])
        assert r["is_valid"] == (r["o_orderkey"] % 2 == 0)
        assert (r["residue"] == 0) == r["is_valid"]


def test_aho_corasick_classic_and_overlaps():
    """The textbook 'ushers' case plus genuinely overlapping and
    nested patterns — the cases replace()-arithmetic oracles CANNOT
    express, pinning that the automaton itself is correct (the query
    fixture then restricts to self-border-free patterns where both
    counting conventions coincide)."""
    from challenge8_movies_etl_spark.operators.containers import (
        AhoCorasick)
    ac = AhoCorasick(["he", "she", "his", "hers"])
    assert ac.count("ushers") == [1, 1, 0, 1]
    # overlapping self-bordered pattern: 'aaaa' holds THREE 'aa'
    assert AhoCorasick(["aa"]).count("aaaa") == [3]
    # nested patterns both fire at the same end position
    assert AhoCorasick(["abc", "bc", "c"]).count("xabc") == [1, 1, 1]
    # no false fires across failure transitions
    assert AhoCorasick(["ab", "ba"]).count("aba") == [1, 1]
    assert AhoCorasick(["x"]).count("") == [0]


def test_warc_roundtrip_and_framing():
    from challenge8_movies_etl_spark.operators.containers import (
        decode_warc, encode_warc)
    recs = [("warcinfo", None, b"software: mvetl\r\n"),
            ("response", "https://e.com/a", b"payload with\r\n\r\nCRLFs"),
            ("request", "https://e.com/a", b""),
            ("response", "https://e.com/b", b"x" * 1000)]
    blob = encode_warc(recs)
    assert decode_warc(blob) == recs
    # payload containing the record separator must NOT split a record
    # (Content-Length framing, not sentinel scanning)
    assert decode_warc(encode_warc(
        [("response", "u", b"\r\n\r\nWARC/1.0\r\n\r\n")]))[0][2] \
        == b"\r\n\r\nWARC/1.0\r\n\r\n"


def test_warc_refuses_malformed_records():
    import pytest
    from challenge8_movies_etl_spark.operators.containers import (
        decode_warc, encode_warc)
    blob = encode_warc([("response", "https://e.com/a", b"0123456789")])
    with pytest.raises(ValueError, match="version"):
        decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="version"):
        decode_warc(blob[1:])  # mid-stream resync is not a thing
    with pytest.raises(ValueError, match="mandatory"):
        decode_warc(blob.replace(b"WARC-Date", b"X-Date", 1))
    with pytest.raises(ValueError, match="separator|truncated"):
        decode_warc(blob.replace(b"Content-Length: 10",
                                 b"Content-Length: 9", 1))
    with pytest.raises(ValueError, match="truncated"):
        decode_warc(blob[:-6])
    with pytest.raises(ValueError, match="Content-Length"):
        decode_warc(blob.replace(b"Content-Length: 10",
                                 b"Content-Length: ten", 1))
    with pytest.raises(ValueError, match="header"):
        decode_warc(blob.replace(b"WARC-Date:", b"WARC-Date ", 1))


def test_zstd_binding_roundtrip_and_interop():
    import shutil
    import subprocess

    import pytest
    from challenge8_movies_etl_spark.operators.containers import (
        compress_payload, sniff_decompress)
    from challenge8_movies_etl_spark.operators.zstd_codec import (
        ZSTD_MAGIC, zstd_available, zstd_compress, zstd_decompress)
    if not zstd_available():
        pytest.skip("no libzstd on this host (refusal path is "
                    "exercised by the NotImplementedError contract)")
    data = b"crawl shard payload " * 500
    frame = zstd_compress(data)
    assert frame[:4] == ZSTD_MAGIC
    assert zstd_decompress(frame) == data
    assert zstd_decompress(zstd_compress(b"")) == b""
    codec, out = sniff_decompress(compress_payload(data, "zstd"))
    assert (codec, out) == ("zstd", data)
    with pytest.raises(ValueError):
        zstd_decompress(b"not a zstd frame")
    # interop with the reference implementation when the CLI exists:
    # our frames must decode there; streamed (no pledged content
    # size) and multi-frame inputs must decode here
    if shutil.which("zstd"):
        cli = subprocess.run(["zstd", "-d", "-c"], input=frame,
                             capture_output=True)
        assert cli.stdout == data
        streamed = subprocess.run(["zstd", "-c"], input=data,
                                  capture_output=True).stdout
        assert zstd_decompress(streamed) == data
        assert zstd_decompress(streamed + streamed) == data + data
        with pytest.raises(ValueError):
            zstd_decompress(streamed[:-3])


def test_warc_gz_member_per_record():
    import gzip

    import pytest
    from challenge8_movies_etl_spark.operators.containers import (
        decode_warc_gz, encode_warc, encode_warc_gz)
    recs = [("warcinfo", None, b"software: mvetl\r\n"),
            ("response", "https://e.com/a", b"hello"),
            ("response", "https://e.com/b", b"x" * 2000)]
    blob = encode_warc_gz(recs)
    assert decode_warc_gz(blob) == recs
    # each member independently decodable = random access works:
    # the second member starts where member 1's deflate stream ends
    import zlib
    do = zlib.decompressobj(wbits=31)
    do.decompress(blob); do.flush()
    assert decode_warc_gz(do.unused_data) == recs[1:]
    # whole-file gzip (all records in ONE member) must be refused
    mono = gzip.compress(encode_warc(recs))
    with pytest.raises(ValueError, match="member-per-record"):
        decode_warc_gz(mono)
    with pytest.raises(ValueError, match="gzip"):
        decode_warc_gz(b"\x1f\x8b" + b"\x00" * 20)


def test_warc_gz_index_random_access():
    from challenge8_movies_etl_spark.operators.containers import (
        decode_warc_gz, encode_warc_gz, warc_gz_index)
    recs = [("warcinfo", None, b"info"),
            ("response", "https://e.com/a", b"A" * 100),
            ("request", "https://e.com/a", b""),
            ("response", "https://e.com/b", b"B" * 3000)]
    blob = encode_warc_gz(recs)
    idx = warc_gz_index(blob)
    assert [u for _, _, u in idx] == [None, "https://e.com/a",
                                      "https://e.com/a",
                                      "https://e.com/b"]
    # offsets tile the blob exactly
    assert idx[0][0] == 0
    for (o1, l1, _), (o2, _, _) in zip(idx, idx[1:]):
        assert o1 + l1 == o2
    assert idx[-1][0] + idx[-1][1] == len(blob)
    # every member decodes standalone from its slice
    for (off, ln, uri), want in zip(idx, recs):
        got, = decode_warc_gz(blob[off:off + ln])
        assert got == want


def test_robots_rfc9309_semantics():
    from challenge8_movies_etl_spark.operators.containers import (
        parse_robots, robots_decision)
    txt = ("# example\n"
           "User-agent: *\n"
           "Disallow: /private/\n"
           "Allow: /private/ok1/\n"
           "Crawl-delay: 3\n"
           "\n"
           "User-agent: MvEtlBot\n"
           "Disallow: /p/12/\n"
           "Allow: /p/\n")
    g = parse_robots(txt)
    assert len(g) == 2
    # product-token group beats '*' for the named bot (case-insens.)
    assert robots_decision(g, "MVETLBOT/1.0", "/p/12/x") == (False, None)
    assert robots_decision(g, "mvetlbot/1.0", "/p/13/x") == (True, None)
    # '*' group: longest match + carve-out + delay
    assert robots_decision(g, "otherbot", "/private/ok1/f") == (True, 3)
    assert robots_decision(g, "otherbot", "/private/x") == (False, 3)
    assert robots_decision(g, "otherbot", "/public") == (True, 3)
    # longest-match tie goes to allow
    g2 = parse_robots("User-agent: *\nDisallow: /a/\nAllow: /a/\n")
    assert robots_decision(g2, "x", "/a/b") == (True, None)
    # empty Disallow matches nothing; no groups ⇒ allowed
    g3 = parse_robots("User-agent: *\nDisallow:\n")
    assert robots_decision(g3, "x", "/anything") == (True, None)
    assert robots_decision([], "x", "/anything") == (True, None)
    # consecutive User-agent lines share ONE group (RFC 9309 §2.1)
    g4 = parse_robots("User-agent: a\nUser-agent: b\nDisallow: /x/\n")
    assert len(g4) == 1
    assert robots_decision(g4, "b", "/x/1") == (False, None)


def test_http_chunked_roundtrip_and_refusals():
    import pytest
    from challenge8_movies_etl_spark.operators.containers import (
        encode_http_chunked, parse_http_response)
    body = b"abcdefghij" * 37
    raw = encode_http_chunked(200, [("Content-Type", "text/html")],
                              body, chunk_size=64)
    status, hdrs, got = parse_http_response(raw)
    assert (status, got) == (200, body)
    assert hdrs["content-type"] == "text/html"
    # chunk-size lines may carry extensions; sizes are hex
    raw2 = raw.replace(b"40\r\n", b"40;ext=1\r\n", 1)
    assert parse_http_response(raw2)[2] == body
    # content-length path
    cl = (b"HTTP/1.1 404 Not Found\r\nContent-Length: 5\r\n\r\n"
          b"hellogarbage")
    assert parse_http_response(cl) == (
        404, {"content-length": "5"}, b"hello")
    # corruption refusals
    with pytest.raises(ValueError, match="status"):
        parse_http_response(b"ICY 200 OK\r\n\r\nx")
    with pytest.raises(ValueError, match="chunk size"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"zz\r\nhi\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="CRLF"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"2\r\nhiXX0\r\n\r\n")
    with pytest.raises(ValueError, match="overrun"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"ff\r\nshort\r\n0\r\n\r\n")


def test_zstd_multiframe_and_streaming_boundaries():
    """ADVICE r7 regression cases: (1) multi-frame input whose FIRST
    frame pledges a content size must not one-shot into a frame-1-
    sized buffer; (2) the streaming loop must keep flushing when a
    128 KiB output chunk fills exactly with bytes still buffered in
    the DCtx."""
    import pytest
    from challenge8_movies_etl_spark.operators.zstd_codec import (
        zstd_available, zstd_compress, zstd_compress_stream,
        zstd_decompress)
    if not zstd_available():
        pytest.skip("no libzstd on this host")
    a = b"frame-one " * 400
    b = b"frame-two " * 700
    # pledged + pledged concatenation (both headers carry sizes)
    assert zstd_decompress(zstd_compress(a) + zstd_compress(b)) == a + b
    # pledged first frame + unknown-size second frame
    assert zstd_decompress(
        zstd_compress(a) + zstd_compress_stream(b)) == a + b
    # unknown-size frames force the streaming path; sweep sizes around
    # exact multiples of the 128 KiB DStream chunk (the flush edge)
    cap = 128 * 1024
    for n in (0, 1, cap - 1, cap, cap + 1, 2 * cap, 2 * cap + 7):
        data = bytes(range(256)) * (n // 256) + bytes(range(n % 256))
        frame = zstd_compress_stream(data)
        assert zstd_decompress(frame) == data
        # header pledges nothing ⇒ this really took the streaming path
        from challenge8_movies_etl_spark.operators import zstd_codec
        lib = zstd_codec._load()
        assert (lib.ZSTD_getFrameContentSize(frame, len(frame))
                == zstd_codec._CONTENTSIZE_UNKNOWN)
    # truncated unknown-size stream still refuses
    f = zstd_compress_stream(b"x" * 50_000)
    with pytest.raises(ValueError, match="zstd"):
        zstd_decompress(f[:-4])


def test_robots_wildcards_and_group_merging():
    """RFC 9309 §2.2.3 '*'/'$' patterns and §2.2.1 merging of every
    group naming the same most-specific agent (ADVICE r7)."""
    from challenge8_movies_etl_spark.operators.containers import (
        parse_robots, robots_decision)
    txt = ("User-agent: *\n"
           "Disallow: /*.gif$\n"
           "Disallow: /cgi/*/raw\n"
           "Allow: /cgi/pub/raw\n"
           "Disallow: /tmp$\n")
    g = parse_robots(txt)
    # trailing $ anchors; '*' spans '/' too
    assert robots_decision(g, "bot", "/pics/cat.gif") == (False, None)
    assert robots_decision(g, "bot", "/pics/cat.gif?x=1") == (True, None)
    assert robots_decision(g, "bot", "/cgi/a/b/raw") == (False, None)
    assert robots_decision(g, "bot", "/cgi/pub/raw") == (True, None)
    assert robots_decision(g, "bot", "/tmp") == (False, None)
    assert robots_decision(g, "bot", "/tmp/") == (True, None)
    # '$' elsewhere is a literal octet
    g2 = parse_robots("User-agent: *\nDisallow: /a$b\n")
    assert robots_decision(g2, "bot", "/a$bc") == (False, None)
    assert robots_decision(g2, "bot", "/ab") == (True, None)
    # two groups naming the same agent MERGE (rules from both apply)
    g3 = parse_robots("User-agent: mvetlbot\nDisallow: /x/\n\n"
                      "User-agent: other\nDisallow: /\n\n"
                      "User-agent: mvetlbot\nDisallow: /y/\n"
                      "Crawl-delay: 7\n")
    assert robots_decision(g3, "mvetlbot/1.0", "/x/1") == (False, 7)
    assert robots_decision(g3, "mvetlbot/1.0", "/y/1") == (False, 7)
    assert robots_decision(g3, "mvetlbot/1.0", "/z") == (True, 7)
    # crawl-delay = first declared in file order among merged groups
    g4 = parse_robots("User-agent: a\nCrawl-delay: 2\nDisallow: /q\n\n"
                      "User-agent: a\nCrawl-delay: 9\n")
    assert robots_decision(g4, "a", "/q") == (False, 2)


def test_http_transfer_coding_lists():
    """RFC 9112 §6.1 coding lists (ADVICE r7): 'gzip, chunked' must
    dechunk THEN gunzip; non-final-chunked and unknown codings refuse
    loudly instead of returning mis-coded bytes."""
    import zlib

    import pytest
    from challenge8_movies_etl_spark.operators.containers import (
        parse_http_response)
    body = b"the quick brown fox " * 100
    gz = zlib.compress(body, 6, wbits=31)
    chunks = b"".join(b"%x\r\n%s\r\n" % (len(gz[i:i + 64]),
                                         gz[i:i + 64])
                      for i in range(0, len(gz), 64)) + b"0\r\n\r\n"
    raw = (b"HTTP/1.1 200 OK\r\n"
           b"Transfer-Encoding: gzip, chunked\r\n\r\n" + chunks)
    status, hdrs, got = parse_http_response(raw)
    assert (status, got) == (200, body)
    # identity is a no-op member of the list
    raw_id = raw.replace(b"gzip, chunked", b"identity, gzip, chunked")
    assert parse_http_response(raw_id)[2] == body
    with pytest.raises(NotImplementedError, match="final 'chunked'"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\n" + gz)
    with pytest.raises(NotImplementedError, match="not supported"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\n"
            b"Transfer-Encoding: br, chunked\r\n\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\n"
            b"Transfer-Encoding: gzip, chunked\r\n\r\n"
            b"3\r\nnot\r\n0\r\n\r\n")


def test_wet_wat_derivation():
    """WET keeps only 200 text/html responses as conversion records
    (through real chunked / gzip,chunked HTTP framing); WAT describes
    EVERY record with a byte-deterministic JSON envelope."""
    import json
    import zlib

    from challenge8_movies_etl_spark.operators.containers import (
        decode_warc, derive_wat, derive_wet, encode_http_chunked,
        encode_warc, html_to_text)
    html = b"<html><head><title>T</title><script>x=1</script></head>" \
           b"<body><p>hello &#32;world</p></body></html>"
    ok = encode_http_chunked(200, [("Content-Type", "text/html")],
                             html, 32)
    gz = zlib.compress(html, 1, wbits=31)
    chunks = b"".join(b"%x\r\n%s\r\n" % (len(gz[i:i + 32]),
                                         gz[i:i + 32])
                      for i in range(0, len(gz), 32)) + b"0\r\n\r\n"
    okgz = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: gzip, chunked\r\n\r\n" + chunks)
    png = encode_http_chunked(200, [("Content-Type", "image/png")],
                              b"\x89PNG...", 32)
    nf = (b"HTTP/1.1 404 Not Found\r\nContent-Length: 4\r\n\r\ngone")
    src = encode_warc([
        ("warcinfo", None, b"software: t\r\n"),
        ("response", "https://e.com/a", ok),
        ("response", "https://e.com/b", okgz),
        ("response", "https://e.com/img", png),   # non-html: filtered
        ("request", "https://e.com/a", b"GET / HTTP/1.1\r\n\r\n"),
        ("response", "https://e.com/nf", nf),     # 404: filtered
    ])
    wet = decode_warc(derive_wet(src))
    assert [t for t, _, _ in wet] == ["warcinfo", "conversion",
                                      "conversion"]
    assert [u for _, u, _ in wet[1:]] == ["https://e.com/a",
                                          "https://e.com/b"]
    assert wet[1][2] == wet[2][2] == b"T hello world"
    assert html_to_text(html.decode()) == "T hello world"
    wat = decode_warc(derive_wat(src))
    assert len(wat) == 6 and all(t == "metadata" for t, _, _ in wat)
    envs = [json.loads(p) for _, _, p in wat]
    assert envs[0] == {"content_length": 13, "content_type": None,
                       "status": None, "uri": None}
    assert envs[1]["status"] == 200
    assert envs[1]["content_length"] == len(html)
    assert envs[2]["content_length"] == len(html)  # gunzipped length
    assert envs[3]["content_type"] == "image/png"
    assert envs[4]["status"] is None               # request record
    assert envs[5] == {"content_length": 4, "content_type": None,
                       "status": 404, "uri": "https://e.com/nf"}
    # envelopes are byte-deterministic: sorted keys, compact seps
    assert wat[5][2] == (b'{"content_length":4,"content_type":null,'
                         b'"status":404,"uri":"https://e.com/nf"}')


def test_warc_revisit_dedup():
    """ISO 28500 §6.7.2: later responses with an identical payload
    digest become empty-body revisit records pointing at the FIRST
    kept copy; non-response records pass through; the output is a
    valid WARC."""
    import hashlib

    from challenge8_movies_etl_spark.operators.containers import (
        decode_warc_headers, encode_warc, warc_revisit_dedup)
    src = encode_warc([
        ("warcinfo", None, b"software: t\r\n"),
        ("response", "https://e.com/a", b"AAAA"),
        ("response", "https://e.com/b", b"BB"),
        ("response", "https://e.com/a2", b"AAAA"),   # dup of /a
        ("request", "https://e.com/a", b"GET /"),
        ("response", "https://e.com/a3", b"AAAA"),   # dup of /a
    ])
    recs = decode_warc_headers(warc_revisit_dedup(src))
    types = [h["WARC-Type"] for h, _ in recs]
    assert types == ["warcinfo", "response", "response", "revisit",
                     "request", "revisit"]
    dig = "sha256:" + hashlib.sha256(b"AAAA").hexdigest()
    for h, p in recs:
        if h["WARC-Type"] != "revisit":
            continue
        assert p == b"" and h["Content-Length"] == "0"
        assert h["WARC-Payload-Digest"] == dig
        assert h["WARC-Refers-To-Target-URI"] == "https://e.com/a"
        assert h["WARC-Profile"].endswith("identical-payload-digest")
    # 4-tuple extra headers survive an encode->decode roundtrip
    blob = encode_warc([("revisit", "u", b"", {"X-K": "v1"})])
    (h, p), = decode_warc_headers(blob)
    assert h["X-K"] == "v1" and p == b""
