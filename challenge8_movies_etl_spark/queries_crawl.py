"""Crawl-ingest queries (round 6): the byte-level front door of a
web-corpus pipeline — structured URL parsing, mixed-codec shard
decompression, TAR archive walking, and UTF-8 validation — each with
a closed-form DuckDB oracle. documents.text is pure ASCII at every
fixture scale (octet_length == length, verified in-commit), which the
gzip/tar/utf8 closed forms rely on.

Scale: the three byte-level ops are zero-shuffle Arrow-batched
mapInPandas (decode parallelism == partitions, one batch resident per
task); URL parsing is pure codegen in the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from .operators.containers import (
    compress_payload,
    decode_tar,
    encode_tar,
    sniff_decompress,
    utf8_scan,
)
from .registry import query
from .sources.fixtures import load_table
from .session import fan_out_scan


# ---------------------------------------------------------------------------
# q_url_parse — structured URL extraction (Spark parse_url surface)
# ---------------------------------------------------------------------------

_URL_EXPR_SQL = ("'https://' || lower(source) || '.example.com:8080/p/' "
                 "|| cast(doc_id % 40 as varchar) || '?q=' || lang "
                 "|| '&page=' || cast(doc_id % 5 as varchar) "
                 "|| '#s' || cast(doc_id % 3 as varchar)")


@query(
    "q_url_parse",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents
    )
    SELECT doc_id,
           'https' AS protocol,
           regexp_extract(url, '^https://([^/:]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_param,
           regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page_param,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM urls
    """,
)
def q_url_parse(spark, sf_dir):
    """Structured URL extraction — protocol/host/path, two named query
    parameters, and the fragment — via Spark's parse_url (the JVM
    java.net.URI-backed builtin a crawl pipeline uses for host-level
    grouping and parameter stripping). Both engines synthesize the
    identical messy URL from (source, lang, doc_id); the oracle
    re-extracts with anchored regexes, so the check pins parse_url's
    component semantics (host excludes the port, path excludes query
    and fragment, QUERY takes the named key).

    Scale: pure codegen in the scan — no shuffle, no python."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.lower("source"),
        F.lit(".example.com:8080/p/"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("?q="), F.col("lang"),
        F.lit("&page="), (F.col("doc_id") % 5).cast("string"),
        F.lit("#s"), (F.col("doc_id") % 3).cast("string"))
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page"))
        .alias("page_param"),
        F.parse_url(url, F.lit("REF")).alias("fragment"))


# ---------------------------------------------------------------------------
# q_text_decompress — mixed-codec shard decompression
# ---------------------------------------------------------------------------

@query(
    "q_text_decompress",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'gzip' WHEN 1 THEN 'bz2'
                WHEN 2 THEN 'xz' ELSE 'zstd' END AS codec,
           cast(length(text) as bigint) AS n_chars,
           md5(text) AS digest
    FROM documents
    """,
)
def q_text_decompress(spark, sf_dir):
    """Mixed-codec crawl-shard decompression: per doc the text is
    stored gzip / bz2 / xz / zstd (real containers with their own
    integrity trailers — gzip's CRC32+ISIZE are verified by zlib
    itself, zstd frames by libzstd's xxhash; zstd is the round-7
    addition via the ctypes libzstd binding, operators/zstd_codec.py —
    the codec modern Common-Crawl dumps actually ship), the decoder
    magic-sniffs and decompresses, and the QUERY hashes the
    round-tripped text with Spark's md5 against the oracle's md5 of
    the original — end-to-end proof the decompressed bytes are
    identical, with no decompressor on the oracle side.

    Scale: compress+decompress run in one fused zero-shuffle
    mapInPandas chain; at 100 TB this is the per-shard ingest path
    (one shard per task, no driver involvement)."""
    d = load_table(spark, sf_dir, "documents")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codec = ("gzip", "bz2", "xz", "zstd")[int(doc_id) % 4]
                payloads.append(compress_payload(text.encode(), codec))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "codec": [], "decoded": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                codec, data = sniff_decompress(bytes(payload))
                out["doc_id"].append(doc_id)
                out["codec"].append(codec)
                out["decoded"].append(data.decode())
            yield pd.DataFrame(out)

    # ONE fused mapInPandas + scan fan-out (optimization round r12,
    # guide §4): the chained form Arrow-shipped every compressed
    # payload Python->JVM->Python between the two stages
    dec = fan_out_scan(d.select("doc_id", "text")).mapInPandas(
        lambda b: unpack(pack(b)),
        schema="doc_id bigint, codec string, decoded string")
    return dec.select(
        "doc_id", "codec",
        F.length("decoded").cast("long").alias("n_chars"),
        F.md5(F.encode("decoded", "utf-8")).alias("digest"))


# ---------------------------------------------------------------------------
# q_archive_extract — ustar TAR walk (the WARC-adjacent record shape)
# ---------------------------------------------------------------------------

@query(
    "q_archive_extract",
    oracle="""
    WITH params AS (
      SELECT doc_id, lang, 1 + doc_id % 3 AS m FROM documents
    )
    SELECT doc_id,
           m AS n_members,
           5 * m * (m + 1) AS total_bytes,
           'doc' || cast(doc_id as varchar) || '/part'
             || cast(m - 1 as varchar) || '.txt' AS last_name,
           repeat(lang, m) AS head_concat
    FROM params
    """,
)
def q_archive_extract(spark, sf_dir):
    """TAR (ustar) archive walk — the "many records in one blob"
    container shape of WARC/shard ingest: per doc an archive with
    1 + doc_id%3 members is synthesized (member j named
    doc{id}/part{j}.txt, content = lang repeated 5(j+1) times, so
    sizes are the closed form 10(j+1)), then the decoder walks
    512-byte header blocks, VERIFIES each header checksum (computed
    with the checksum field spaced out, per the tar spec), parses
    octal sizes, and slices members across block padding. Reported
    features — member count, total payload bytes, last member name,
    and the concatenation of each member's first 2 chars — are all
    closed-form; a checksum, octal-parse, or padding slip breaks them.

    Scale: zero-shuffle mapInPandas; archives never leave the task."""
    d = load_table(spark, sf_dir, "documents")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, lang in zip(pdf["doc_id"], pdf["lang"]):
                did = int(doc_id)
                m = 1 + did % 3
                members = [(f"doc{did}/part{j}.txt",
                            (lang * (5 * (j + 1))).encode())
                           for j in range(m)]
                payloads.append(encode_tar(members))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_members": [], "total_bytes": [],
                   "last_name": [], "head_concat": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                members = decode_tar(bytes(payload))
                out["doc_id"].append(doc_id)
                out["n_members"].append(len(members))
                out["total_bytes"].append(
                    sum(len(c) for _, c in members))
                out["last_name"].append(members[-1][0])
                out["head_concat"].append(
                    "".join(c[:2].decode() for _, c in members))
            yield pd.DataFrame(out)

    # ONE fused mapInPandas + scan fan-out (r12, guide §4 — see
    # q_text_decompress)
    return fan_out_scan(d.select("doc_id", "lang")).mapInPandas(
        lambda b: walk(pack(b)),
        schema=("doc_id bigint, n_members bigint, "
                "total_bytes bigint, last_name string, "
                "head_concat string"))


# ---------------------------------------------------------------------------
# q_text_utf8_validate — real UTF-8 DFA with maximal-subpart resync
# ---------------------------------------------------------------------------

@query(
    "q_text_utf8_validate",
    oracle="""
    WITH n AS (
      SELECT doc_id, cast(length(text) as bigint) AS n_bytes,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE (length(text) - 1) // 97 + 1 END AS n_inv
      FROM documents
    )
    SELECT doc_id, n_bytes,
           cast(n_inv as bigint) AS n_invalid,
           cast(n_bytes - n_inv as bigint) AS n_valid_chars,
           n_inv = 0 AS is_valid
    FROM n
    """,
)
def q_text_utf8_validate(spark, sf_dir):
    """UTF-8 validation over deliberately corrupted payloads — the
    mojibake gate a crawl pipeline runs before trusting any charset
    label: every 97th byte of the (pure-ASCII, verified) text is
    replaced with 0xFF, and a REAL table-free UTF-8 state machine
    (operators/containers.utf8_scan: overlong/surrogate/>U+10FFFF
    rejection, Unicode maximal-subpart resync) counts valid scalar
    values and invalid sequences. The oracle predicts both counts in
    closed form from the text length: positions 0, 97, 194, ... are
    invalid, every other byte is one ASCII scalar. The DFA's full
    branch coverage (truncation, surrogates, overlongs) is pinned by
    tests/test_containers.py against python's own codec.

    Scale: zero-shuffle mapInPandas; validation is a linear scan per
    payload inside the Arrow batch."""
    d = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "n_invalid": [],
                   "n_valid_chars": [], "is_valid": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = bytearray(text.encode())
                for p in range(0, len(raw), 97):
                    raw[p] = 0xFF
                valid, invalid = utf8_scan(bytes(raw))
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(raw))
                out["n_invalid"].append(invalid)
                out["n_valid_chars"].append(valid)
                out["is_valid"].append(invalid == 0)
            yield pd.DataFrame(out)

    return d.select("doc_id", "text").mapInPandas(
        run, schema=("doc_id bigint, n_bytes bigint, n_invalid bigint, "
                     "n_valid_chars bigint, is_valid boolean"))


# ---------------------------------------------------------------------------
# q_quality_gopher — the full Gopher rule battery (Rae et al. 2021)
# ---------------------------------------------------------------------------

@query(
    "q_quality_gopher",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             length(text) AS n_chars_txt
      FROM documents
    ), m AS (
      SELECT doc_id,
             cast(len(toks) as bigint) AS n_words,
             cast(length(array_to_string(toks, '')) as bigint)
               AS sum_word_len,
             cast(len(list_filter(toks,
                  w -> regexp_full_match(w, '[a-z]+'))) as bigint)
               AS n_alpha_words,
             cast(len(list_filter(toks, w -> w = 'the' OR w = 'a'))
                  as bigint) AS n_stop
      FROM t
    )
    SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_stop,
           CASE WHEN n_words BETWEEN 50 AND 100000
                     AND sum_word_len * 1 >= 3 * n_words
                     AND sum_word_len * 1 <= 10 * n_words
                     AND n_alpha_words * 5 >= 4 * n_words
                     AND n_stop >= 2
                THEN 1 ELSE 0 END AS keep
    FROM m
    """,
)
def q_quality_gopher(spark, sf_dir):
    """The named Gopher quality-filter battery (Rae et al. 2021,
    table A1 — the rule set FineWeb/Dolma descend from), as exact
    integer cross-multiplications over one token array: word count in
    [50, 100000], mean word length in [3, 10] (sum_len vs 3n / 10n),
    alpha-word fraction >= 80% (5·alpha >= 4·n), and >= 2 stopword
    hits (the fixture lexicon {'the','a'}). Completes the quality
    family beside q_quality_repetition (the same paper's repetition
    signals) and q_quality_pipeline (the C4-style composite). The
    paper's symbol-to-word rule ('#'/'...') is OMITTED: the fixture
    corpus contains no such symbols, so the rule would be vacuously
    true and hash-check nothing.

    Scale: array higher-order functions in the scan — row-local,
    whole-stage codegen, zero shuffle (the explode→groupBy form would
    shuffle every token of a 100 TB corpus for a per-row answer)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "text", F.split("text", " ").alias("toks"))
    m = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.length(F.concat_ws("", "toks")).cast("long")
        .alias("sum_word_len"),
        F.size(F.filter("toks", lambda w: w.rlike("^[a-z]+$")))
        .cast("long").alias("n_alpha_words"),
        F.size(F.filter("toks", lambda w: (w == "the") | (w == "a")))
        .cast("long").alias("n_stop"),
    )
    keep = (F.col("n_words").between(50, 100000)
            & (F.col("sum_word_len") >= 3 * F.col("n_words"))
            & (F.col("sum_word_len") <= 10 * F.col("n_words"))
            & (F.col("n_alpha_words") * 5 >= 4 * F.col("n_words"))
            & (F.col("n_stop") >= 2))
    return m.select("doc_id", "n_words", "sum_word_len",
                    "n_alpha_words", "n_stop",
                    keep.cast("int").alias("keep"))


# ---------------------------------------------------------------------------
# q_html_extract — boilerplate strip (the trafilatura-shaped crawl op)
# ---------------------------------------------------------------------------

_HTML_WRAP_SQL = (
    "'<html><head><title>doc ' || cast(doc_id as varchar) "
    "|| '</title><style>p{margin:0}</style>"
    "<script>var x=' || cast(doc_id % 7 as varchar) || ';</script>"
    "</head><body><nav>home | about</nav><p>' "
    "|| replace(text, ' ', '&#32;') "
    "|| '</p><footer>&copy; example</footer></body></html>'"
)


@query(
    "q_html_extract",
    oracle=f"""
    WITH pages AS (
      SELECT doc_id, {_HTML_WRAP_SQL} AS html FROM documents
    ), stripped AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(
                 html,
                 '<script[^>]*>.*?</script>', '', 'gs'),
               '<style[^>]*>.*?</style>', '', 'gs'),
               '<[^>]+>', ' ', 'g'),
               '&#32;|&nbsp;', ' ', 'g')) AS flat
      FROM pages
    )
    SELECT doc_id,
           regexp_replace(flat, '\\s+', ' ', 'g') AS extracted,
           md5(regexp_replace(flat, '\\s+', ' ', 'g')) AS digest
    FROM stripped
    """,
)
def q_html_extract(spark, sf_dir):
    """HTML boilerplate stripping — the main-content extraction every
    web-corpus pipeline runs (the regex core of the trafilatura /
    jusText shape): drop <script>/<style> WITH their contents
    (dot-matches-newline, non-greedy close), replace remaining tags
    with spaces, decode the numeric entity the fixture uses, and
    normalize whitespace. Both engines wrap the text in the identical
    synthetic page (head/title/style/script/nav/footer chrome +
    entity-encoded body), so the oracle checks the STRIPPER: a greedy
    .* or tag-boundary slip leaves chrome in the output and breaks
    the md5. Output keeps the title,
    nav, and footer text — tag REMOVAL is boilerplate-agnostic; the
    content/boilerplate split is the downstream classifier's job
    (q_quality_*), exactly as in production extractors.

    Scale: a codegen regexp_replace chain in the scan — no shuffle,
    no python; at 100 TB extraction cost is the scan itself."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{margin:0}</style><script>var x="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(";</script></head><body><nav>home | about</nav><p>"),
        F.regexp_replace("text", " ", "&#32;"),
        F.lit("</p><footer>&copy; example</footer></body></html>"))
    # two literal patterns, not one with a backreference: the oracle
    # runs on RE2 (DuckDB), which has no backreferences — keep the
    # regex dialect intersection on BOTH engines
    flat = F.trim(F.regexp_replace(F.regexp_replace(F.regexp_replace(
        F.regexp_replace(
            html,
            r"(?s)<script[^>]*>.*?</script>", ""),
        r"(?s)<style[^>]*>.*?</style>", ""),
        r"<[^>]+>", " "),
        r"&#32;|&nbsp;", " "))
    extracted = F.regexp_replace(flat, r"\s+", " ")
    return d.select(
        "doc_id",
        extracted.alias("extracted"),
        F.md5(F.encode(extracted, "utf-8")).alias("digest"))


# ---------------------------------------------------------------------------
# q_pii_luhn — checksum-verified account-number detection
# ---------------------------------------------------------------------------

def _luhn_terms_sql(col: str) -> str:
    """Sum of Luhn-folded digits of a 12-digit string: every 2nd digit
    from the RIGHT (positions 1,3,..,11 here) doubles, minus 9 when
    the double exceeds 9. Static unroll — identical text runs on both
    engines."""
    terms = []
    for i in range(1, 13):
        d = f"cast(substr({col}, {i}, 1) as bigint)"
        if i % 2 == 1:  # distance from right is even -> doubled
            terms.append(f"(2 * {d} - CASE WHEN {d} >= 5 THEN 9 "
                         f"ELSE 0 END)")
        else:
            terms.append(d)
    return " + ".join(terms)


_LUHN_B0 = _luhn_terms_sql("base || '0'")
_LUHN_ACCT = _luhn_terms_sql("acct")

@query(
    "q_pii_luhn",
    oracle=f"""
    WITH synth AS (
      SELECT o_orderkey,
             lpad(cast((o_orderkey * 1009) % 100000000000 as varchar),
                  11, '0') AS base
      FROM orders
    ), carded AS (
      SELECT o_orderkey,
             base || cast(
               CASE WHEN o_orderkey % 2 = 0
                    THEN (10 - ({_LUHN_B0}) % 10) % 10
                    ELSE ((10 - ({_LUHN_B0}) % 10) % 10 + 5) % 10
               END as varchar) AS acct
      FROM synth
    )
    SELECT o_orderkey, acct,
           ({_LUHN_ACCT}) % 10 = 0 AS is_valid,
           cast(({_LUHN_ACCT}) % 10 as bigint) AS residue
    FROM carded
    """,
)
def q_pii_luhn(spark, sf_dir):
    """Checksum-verified PII detection — the gate that separates real
    account/card numbers from random digit strings before redaction
    (regex alone over-fires; production PII scrubbers verify the Luhn
    checksum first): 12-digit candidates are synthesized per order —
    even keys get the CORRECT Luhn check digit, odd keys a +5-shifted
    (always wrong) one — and the VALIDATOR recomputes the folded
    digit sum on both engines as a statically-unrolled pure-integer
    expression. is_valid must be exactly (o_orderkey even); any fold
    slip (doubling parity off by one, missing -9 carry) breaks every
    row.

    Scale: pure codegen digit arithmetic in the scan — no shuffle, no
    python, no regex."""
    o = load_table(spark, sf_dir, "orders")
    base = F.lpad(((F.col("o_orderkey") * 1009) % 100000000000)
                  .cast("string"), 11, "0")

    def luhn_sum(col):
        total = F.lit(0)
        for i in range(1, 13):
            d = F.substring(col, i, 1).cast("long")
            if i % 2 == 1:
                total = total + (2 * d
                                 - F.when(d >= 5, 9).otherwise(0))
            else:
                total = total + d
        return total

    base0 = F.concat(base, F.lit("0"))
    true_digit = (10 - luhn_sum(base0) % 10) % 10
    digit = F.when(F.col("o_orderkey") % 2 == 0, true_digit) \
             .otherwise((true_digit + 5) % 10)
    carded = o.select(
        "o_orderkey",
        F.concat(base, digit.cast("string")).alias("acct"))
    s = luhn_sum(F.col("acct"))
    return carded.select(
        "o_orderkey", "acct",
        (s % 10 == 0).alias("is_valid"),
        (s % 10).cast("long").alias("residue"))


# ---------------------------------------------------------------------------
# q_blocklist_match — Aho-Corasick multi-pattern blocklist filter
# ---------------------------------------------------------------------------

# none of these is self-bordered (no proper prefix == suffix), so
# non-overlapping counts (the oracle's replace() arithmetic) equal the
# automaton's overlap-inclusive counts
_BLOCK_PATTERNS = ("scan", "slow", "join", "merge", "spark",
                   "dup", "vector", "stream")


def _pat_count_sql(p: str) -> str:
    return (f"(length(text) - length(replace(text, '{p}', '')))"
            f" // {len(p)}")


@query(
    "q_blocklist_match",
    oracle=f"""
    WITH counts AS (
      SELECT doc_id,
             {", ".join(f"cast({_pat_count_sql(p)} as bigint) AS c{i}"
                        for i, p in enumerate(_BLOCK_PATTERNS))}
      FROM documents
    )
    SELECT doc_id,
           {" + ".join(f"c{i}" for i in range(len(_BLOCK_PATTERNS)))}
             AS n_hits,
           {" + ".join(f"CASE WHEN c{i} > 0 THEN 1 ELSE 0 END"
                       for i in range(len(_BLOCK_PATTERNS)))}
             AS n_patterns_hit,
           greatest({", ".join(f"c{i}"
                               for i in range(len(_BLOCK_PATTERNS)))})
             AS max_pattern_hits
    FROM counts
    """,
)
def q_blocklist_match(spark, sf_dir):
    """Multi-pattern blocklist matching via a REAL Aho-Corasick
    automaton (goto/fail/output links, operators/containers.py) — the
    badwords/contamination filter shape: at production blocklist size
    (10^4-10^5 patterns) a regex alternation or per-pattern scan pays
    O(patterns) per document, while the automaton pays O(len(text))
    regardless, which is the only shape that survives 100 TB. The
    automaton is built ONCE per task and streamed over Arrow batches;
    the oracle recomputes per-pattern counts with replace()
    arithmetic (the fixture patterns have no self-borders, so
    non-overlapping replace counts equal the automaton's
    overlap-inclusive counts — pinned by the automaton unit tests
    with genuinely overlapping patterns).

    Scale: zero shuffle; per-doc output is three integers."""
    import pandas as pd

    from .operators.containers import AhoCorasick

    d = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = AhoCorasick(list(_BLOCK_PATTERNS))
        for pdf in batches:
            out = {"doc_id": [], "n_hits": [], "n_patterns_hit": [],
                   "max_pattern_hits": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                counts = ac.count(text)
                out["doc_id"].append(doc_id)
                out["n_hits"].append(sum(counts))
                out["n_patterns_hit"].append(
                    sum(1 for c in counts if c))
                out["max_pattern_hits"].append(max(counts))
            yield pd.DataFrame(out)

    return d.select("doc_id", "text").mapInPandas(
        run, schema=("doc_id bigint, n_hits bigint, "
                     "n_patterns_hit bigint, max_pattern_hits bigint"))


# ---------------------------------------------------------------------------
# q_warc_extract — real WARC/1.0 record parsing (ISO 28500)
# ---------------------------------------------------------------------------

@query(
    "q_warc_extract",
    oracle="""
    WITH params AS (
      SELECT doc_id, lang, 1 + doc_id % 3 AS m FROM documents
    )
    SELECT doc_id,
           cast(m + 1 as bigint) AS n_records,
           cast(m as bigint) AS n_response,
           cast(17 + 5 * m * (m + 1) as bigint) AS payload_bytes,
           'https://example.com/doc' || cast(doc_id as varchar)
             || '/p' || cast(m - 1 as varchar) AS last_uri,
           repeat(lang, m) AS head_concat
    FROM params
    """,
)
def q_warc_extract(spark, sf_dir):
    """REAL WARC/1.0 record parsing (ISO 28500 — round 7, replacing
    the round-6 TAR stand-in as the crawl front door): per doc a
    multi-record WARC blob is synthesized — one warcinfo record (17
    payload bytes) plus 1 + doc_id%3 response records (record j
    carries WARC-Target-URI doc{id}/p{j} and payload lang·5(j+1), so
    sizes are the closed form 10(j+1)) — then the decoder re-walks
    the framing the spec mandates: version line, named header block,
    the four mandatory headers, Content-Length-sliced payload (never
    sentinel-scanned), and the two-CRLF record separator. Reported
    features (record/response counts, total payload octets, last
    response URI, first-2-chars concat across responses) are all
    closed-form in (doc_id, lang); any framing slip — off-by-one in
    Content-Length handling, separator miscount, header-fold bug —
    misattributes bytes and breaks the hash. Malformed-record
    refusals are pinned in tests/test_containers.py.

    Scale: zero-shuffle Arrow-batched mapInPandas; one WARC shard per
    task, no driver involvement — the 100 TB Common-Crawl ingest
    shape."""
    d = load_table(spark, sf_dir, "documents")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import encode_warc
        for pdf in batches:
            payloads = []
            for doc_id, lang in zip(pdf["doc_id"], pdf["lang"]):
                did = int(doc_id)
                m = 1 + did % 3
                recs = [("warcinfo", None, b"software: mvetl\r\n")]
                recs += [
                    ("response",
                     f"https://example.com/doc{did}/p{j}",
                     (lang * (5 * (j + 1))).encode())
                    for j in range(m)]
                payloads.append(encode_warc(recs))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import decode_warc
        for pdf in batches:
            out = {"doc_id": [], "n_records": [], "n_response": [],
                   "payload_bytes": [], "last_uri": [],
                   "head_concat": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                recs = decode_warc(bytes(payload))
                resp = [(u, p) for t, u, p in recs if t == "response"]
                out["doc_id"].append(doc_id)
                out["n_records"].append(len(recs))
                out["n_response"].append(len(resp))
                out["payload_bytes"].append(
                    sum(len(p) for _, _, p in recs))
                out["last_uri"].append(resp[-1][0])
                out["head_concat"].append(
                    "".join(p[:2].decode() for _, p in resp))
            yield pd.DataFrame(out)

    # ONE fused mapInPandas + scan fan-out (r12, guide §4 — see
    # q_text_decompress)
    return fan_out_scan(d.select("doc_id", "lang")).mapInPandas(
        lambda b: walk(pack(b)),
        schema=("doc_id bigint, n_records bigint, "
                "n_response bigint, payload_bytes bigint, "
                "last_uri string, head_concat string"))


@query(
    "q_warcgz_extract",
    oracle="""
    WITH params AS (
      SELECT doc_id, lang, 1 + doc_id % 3 AS m FROM documents
    )
    SELECT doc_id,
           cast(m + 1 as bigint) AS n_records,
           cast(17 + 5 * m * (m + 1) as bigint) AS payload_bytes,
           md5(repeat(lang, (5 * m * (m + 1)) // 2)) AS resp_digest
    FROM params
    """,
)
def q_warcgz_extract(spark, sf_dir):
    """Member-per-record .warc.gz walk — the EXACT container Common
    Crawl ships (round 7, composing q_warc_extract's record parser
    with per-record gzip members): each record is its own complete
    RFC 1952 gzip member, concatenated, so a 100 TB reader can fetch
    one record by (offset, length) without inflating the prefix. The
    decoder inflates member-at-a-time (zlib verifies each member's
    CRC32+ISIZE), parses exactly one WARC record per member (REFUSING
    the whole-file-gzip shape that silently kills random access), and
    the QUERY md5-hashes the concatenated response payloads against
    the oracle's closed-form repeat() — end-to-end proof that
    member boundaries, Content-Length framing, and payload bytes all
    survived the double container.

    Scale: zero-shuffle Arrow-batched mapInPandas — one .warc.gz
    shard per task, the canonical crawl-ingest unit."""
    d = load_table(spark, sf_dir, "documents")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import encode_warc_gz
        for pdf in batches:
            payloads = []
            for doc_id, lang in zip(pdf["doc_id"], pdf["lang"]):
                did = int(doc_id)
                m = 1 + did % 3
                recs = [("warcinfo", None, b"software: mvetl\r\n")]
                recs += [("response",
                          f"https://example.com/doc{did}/p{j}",
                          (lang * (5 * (j + 1))).encode())
                         for j in range(m)]
                payloads.append(encode_warc_gz(recs))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import decode_warc_gz
        for pdf in batches:
            out = {"doc_id": [], "n_records": [], "payload_bytes": [],
                   "resp_concat": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                recs = decode_warc_gz(bytes(payload))
                out["doc_id"].append(doc_id)
                out["n_records"].append(len(recs))
                out["payload_bytes"].append(
                    sum(len(p) for _, _, p in recs))
                out["resp_concat"].append(b"".join(
                    p for t, _, p in recs if t == "response").decode())
            yield pd.DataFrame(out)

    # ONE fused mapInPandas + scan fan-out (r12, guide §4 — see
    # q_text_decompress)
    dec = fan_out_scan(d.select("doc_id", "lang")).mapInPandas(
        lambda b: walk(pack(b)),
        schema=("doc_id bigint, n_records bigint, "
                "payload_bytes bigint, resp_concat string"))
    return dec.select(
        "doc_id", "n_records", "payload_bytes",
        F.md5(F.encode("resp_concat", "utf-8")).alias("resp_digest"))


@query(
    "q_warc_cdx_fetch",
    oracle="""
    WITH params AS (
      SELECT doc_id, lang, 1 + doc_id % 3 AS m FROM documents
    )
    SELECT doc_id,
           cast(m + 1 as bigint) AS n_members,
           'https://example.com/doc' || cast(doc_id as varchar)
             || '/p' || cast(m - 1 as varchar) AS fetched_uri,
           cast(10 * m as bigint) AS fetched_bytes,
           md5(repeat(lang, 5 * m)) AS fetched_digest
    FROM params
    """,
)
def q_warc_cdx_fetch(spark, sf_dir):
    """CDX-style random access into .warc.gz (round 7): build the
    member index [(offset, length, uri)] by riding gzip member
    boundaries (zlib unused_data walk — no payload inflation during
    indexing), then FETCH exactly one record — the last response —
    by slicing payload[offset : offset+length] and inflating that
    slice alone, exactly what a 100 TB archive reader does with a CDX
    row and an HTTP Range request. The fetched record's URI, size,
    and md5 are closed-form in (doc_id, lang); a wrong member
    boundary, a cumulative-offset slip, or a non-self-contained
    member breaks the hash. Proves the member-per-record layout's
    random-access contract end-to-end, not just full-scan decode
    (q_warcgz_extract).

    Scale: zero-shuffle Arrow-batched mapInPandas; at 100 TB the
    index is built once per shard and persisted — every later fetch
    touches `length` compressed bytes, never the shard prefix."""
    d = load_table(spark, sf_dir, "documents")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import encode_warc_gz
        for pdf in batches:
            payloads = []
            for doc_id, lang in zip(pdf["doc_id"], pdf["lang"]):
                did = int(doc_id)
                m = 1 + did % 3
                recs = [("warcinfo", None, b"software: mvetl\r\n")]
                recs += [("response",
                          f"https://example.com/doc{did}/p{j}",
                          (lang * (5 * (j + 1))).encode())
                         for j in range(m)]
                payloads.append(encode_warc_gz(recs))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import decode_warc_gz, warc_gz_index
        for pdf in batches:
            out = {"doc_id": [], "n_members": [], "fetched_uri": [],
                   "fetched_bytes": [], "fetched_text": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(payload)
                idx = warc_gz_index(blob)
                off, length, uri = idx[-1]  # last response member
                # random access: decode ONLY the sliced member
                (rtype, ruri, rpayload), = decode_warc_gz(
                    blob[off:off + length])
                if (ruri, rtype) != (uri, "response"):
                    raise ValueError("CDX fetch mismatch")
                out["doc_id"].append(doc_id)
                out["n_members"].append(len(idx))
                out["fetched_uri"].append(ruri)
                out["fetched_bytes"].append(len(rpayload))
                out["fetched_text"].append(rpayload.decode())
            yield pd.DataFrame(out)

    # ONE fused mapInPandas + scan fan-out (r12, guide §4 — see
    # q_text_decompress)
    dec = fan_out_scan(d.select("doc_id", "lang")).mapInPandas(
        lambda b: fetch(pack(b)),
        schema=("doc_id bigint, n_members bigint, "
                "fetched_uri string, fetched_bytes bigint, "
                "fetched_text string"))
    return dec.select(
        "doc_id", "n_members", "fetched_uri", "fetched_bytes",
        F.md5(F.encode("fetched_text", "utf-8")).alias("fetched_digest"))


@query(
    "q_robots_decide",
    oracle="""
    SELECT doc_id,
           (doc_id % 7 <> doc_id % 40) AS bot_probe_allowed,
           true AS bot_root_allowed,
           (doc_id % 3 = doc_id % 5) AS star_private_allowed,
           cast(1 + doc_id % 5 as bigint) AS star_delay
    FROM documents
    """,
)
def q_robots_decide(spark, sf_dir):
    """robots.txt politeness gate (RFC 9309 — round 7, the crawl
    front door's admission control): per doc a robots.txt is
    synthesized with a '*' group (Disallow /private/ with one Allow
    carve-out and a Crawl-delay) and a product-token group for
    'mvetlbot' (Disallow /p/<doc_id%40>/ inside Allow /p/), then a
    REAL parser (group splitting at rule→agent transitions, comment
    stripping, case-insensitive agent tokens) and the RFC evaluator
    (longest agent-token group selection, longest-path-match rule
    with allow-tie, empty-Disallow-matches-nothing) decide four
    data-dependent probes whose outcomes are closed-form in doc_id:
    the bot probing /p/<doc_id%7>/x is blocked exactly when
    doc_id%7 == doc_id%40 (longest match flips to the Disallow), and
    the '*' agent probing /private/ok<doc_id%3>/f passes exactly when
    the carve-out dir <doc_id%5> coincides. A group-boundary,
    specificity-order, or tie-break slip flips decisions and breaks
    the hash.

    Scale: zero-shuffle mapInPandas — robots evaluation is per-host
    metadata riding the same partition as the URLs it gates."""
    d = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import parse_robots, robots_decision
        for pdf in batches:
            out = {"doc_id": [], "bot_probe_allowed": [],
                   "bot_root_allowed": [], "star_private_allowed": [],
                   "star_delay": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                txt = (
                    "# synthetic robots\n"
                    "User-agent: *\n"
                    "Disallow: /private/\n"
                    f"Allow: /private/ok{did % 5}/\n"
                    f"Crawl-delay: {1 + did % 5}\n"
                    "\n"
                    "User-agent: MvEtlBot\n"
                    f"Disallow: /p/{did % 40}/\n"
                    "Allow: /p/\n")
                g = parse_robots(txt)
                probe, _ = robots_decision(
                    g, "mvetlbot/2.1", f"/p/{did % 7}/x")
                root, _ = robots_decision(g, "mvetlbot/2.1", "/p/other")
                priv, delay = robots_decision(
                    g, "genericbot", f"/private/ok{did % 3}/f")
                out["doc_id"].append(doc_id)
                out["bot_probe_allowed"].append(probe)
                out["bot_root_allowed"].append(root)
                out["star_private_allowed"].append(priv)
                out["star_delay"].append(delay)
            yield pd.DataFrame(out)

    return d.select("doc_id").mapInPandas(
        run, schema=("doc_id bigint, bot_probe_allowed boolean, "
                     "bot_root_allowed boolean, "
                     "star_private_allowed boolean, star_delay bigint"))


@query(
    "q_url_frontier",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'src' || cast(doc_id % 20 as varchar) || '.example.com'
               AS host,
             doc_id % 100 AS priority,
             1 + doc_id % 20 % 5 AS delay_s
      FROM documents
    )
    SELECT doc_id, host,
           cast(row_number() OVER w - 1 as bigint) AS fetch_slot,
           cast((row_number() OVER w - 1) * delay_s as bigint)
             AS fetch_at_s
    FROM urls
    WINDOW w AS (PARTITION BY host
                 ORDER BY priority DESC, doc_id)
    """,
)
def q_url_frontier(spark, sf_dir):
    """Polite crawl-frontier scheduling (round 7): URLs are bucketed
    by host (the politeness domain), ordered by priority with a
    deterministic tie-break, and each gets a fetch slot and an
    absolute fetch time slot×crawl_delay — the scheduling kernel of
    a distributed fetcher that must never hit one host concurrently.
    One window over the host partition; both engines replay the
    identical ranking.

    Scale: the host hash IS the shuffle key — at 100 TB the frontier
    partitions by host exactly as the fetcher fleet does, so
    scheduling never needs a global sort; per-host state is a row
    counter."""
    from pyspark.sql import Window as W
    d = load_table(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"),
                 F.lit(".example.com")).alias("host"),
        (F.col("doc_id") % 100).alias("priority"),
        (1 + F.col("doc_id") % 20 % 5).alias("delay_s"))
    w = W.partitionBy("host").orderBy(F.col("priority").desc(), "doc_id")
    rn = F.row_number().over(w) - 1
    return urls.select(
        "doc_id", "host",
        rn.cast("long").alias("fetch_slot"),
        (rn * F.col("delay_s")).cast("long").alias("fetch_at_s"))


@query(
    "q_http_dechunk",
    oracle="""
    SELECT doc_id,
           200 AS status,
           'text/plain' AS content_type,
           cast(length(text) as bigint) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
)
def q_http_dechunk(spark, sf_dir):
    """The FULL crawl-record stack (round 7): each doc's text is
    served as an HTTP/1.1 response with chunked transfer coding
    (RFC 9112 §7.1 — hex size lines, per-chunk CRLFs, 0-chunk
    terminator; chunk size varies per doc, 16 + doc_id%49, so
    boundaries land everywhere), wrapped in a WARC/1.0 response
    record, gzip'd member-per-record — exactly the bytes Common Crawl
    stores. The reader reverses all three layers: member inflate →
    WARC Content-Length framing → HTTP header parse + dechunk — and
    the QUERY md5s the reassembled body against the oracle's md5 of
    the original text. A slip in ANY layer (chunk-size hex, CRLF
    accounting, WARC separator, gzip member boundary) breaks the
    digest.

    Scale: zero-shuffle Arrow-batched mapInPandas — the per-shard
    ingest decode path, parallelism == partitions."""
    d = load_table(spark, sf_dir, "documents")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import (encode_http_chunked,
                                           encode_warc_gz)
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                http = encode_http_chunked(
                    200, [("Content-Type", "text/plain")],
                    text.encode(), chunk_size=16 + did % 49)
                payloads.append(encode_warc_gz(
                    [("response",
                      f"https://example.com/doc{did}", http)]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import (decode_warc_gz,
                                           parse_http_response)
        for pdf in batches:
            out = {"doc_id": [], "status": [], "content_type": [],
                   "body": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                (_, _, http), = decode_warc_gz(bytes(payload))
                status, hdrs, body = parse_http_response(http)
                out["doc_id"].append(doc_id)
                out["status"].append(status)
                out["content_type"].append(hdrs["content-type"])
                out["body"].append(body.decode())
            yield pd.DataFrame(out)

    # ONE fused mapInPandas + scan fan-out (r12, guide §4 — see
    # q_text_decompress)
    dec = fan_out_scan(d.select("doc_id", "text")).mapInPandas(
        lambda b: unpack(pack(b)),
        schema=("doc_id bigint, status int, "
                "content_type string, body string"))
    return dec.select(
        "doc_id", "status", "content_type",
        F.length("body").cast("long").alias("n_bytes"),
        F.md5(F.encode("body", "utf-8")).alias("digest"))


@query(
    "q_xml_sitemap",
    oracle="""
    WITH params AS (
      SELECT doc_id, 1 + doc_id % 3 AS m FROM documents
    ), urls AS (
      SELECT doc_id, m, gs.j,
             'https://example.com/doc' || cast(doc_id as varchar)
               || '/p' || cast(gs.j as varchar) AS loc,
             (doc_id + gs.j) % 10 AS prio10
      FROM params, generate_series(0, 2) gs(j) WHERE gs.j < m
    )
    SELECT doc_id,
           cast(m as bigint) AS n_urls,
           min(loc) AS first_loc,
           max(loc) AS last_loc,
           cast(sum(prio10) as bigint) AS prio10_sum,
           '2026-0' || cast(1 + doc_id % 9 as varchar) || '-11'
             AS lastmod0
    FROM urls GROUP BY doc_id, m
    """,
)
def q_xml_sitemap(spark, sf_dir):
    """Sitemap XML ingestion via Spark's BUILT-IN from_xml (round 7 —
    the XML surface the registry lacked; sitemaps are how a crawler
    discovers URLs before the frontier ever schedules them): per doc
    a sitemaps.org urlset with 1 + doc_id%3 <url> entries (loc /
    lastmod / priority) is synthesized, parsed JVM-side by from_xml
    into ARRAY<STRUCT>, exploded, and aggregated. Priorities are
    carried as integer tenths (prio10) so the sum is exact on both
    engines; the oracle regenerates the entries in closed form — a
    repeated-element grouping, namespace-handling, or explode slip
    changes counts/locs and breaks the hash.

    Scale: from_xml is a codegen'd JVM expression — no python, no
    shuffle before the per-doc rollup (map-side combinable)."""
    d = load_table(spark, sf_dir, "documents")
    m = (1 + F.col("doc_id") % 3).cast("int")

    def mk(j):
        return F.concat(
            F.lit("<url><loc>https://example.com/doc"),
            F.col("doc_id").cast("string"), F.lit("/p"),
            j.cast("string"), F.lit("</loc><lastmod>2026-0"),
            (1 + F.col("doc_id") % 9).cast("string"),
            F.lit("-11</lastmod><priority>0."),
            ((F.col("doc_id") + j) % 10).cast("string"),
            F.lit("</priority></url>"))
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>'
              '<urlset xmlns="http://www.sitemaps.org/schemas/'
              'sitemap/0.9">'),
        F.array_join(F.transform(F.sequence(F.lit(0), m - 1), mk),
                     ""),
        F.lit("</urlset>"))
    parsed = d.select(
        "doc_id",
        F.from_xml(xml, "url ARRAY<STRUCT<loc: STRING, "
                        "lastmod: STRING, priority: DOUBLE>>")
        .alias("p"))
    u = parsed.select(
        "doc_id", F.explode("p.url").alias("u"))
    return (u.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.min("u.loc").alias("first_loc"),
                 F.max("u.loc").alias("last_loc"),
                 F.sum(F.round(F.col("u.priority") * 10).cast("long"))
                 .alias("prio10_sum"),
                 F.first("u.lastmod").alias("lastmod0")))


@query(
    "q_json_quarantine",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE 'doc' || cast(doc_id as varchar) END AS title,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE cast(length(text) as bigint) END AS n,
           (doc_id % 13 = 0) AS quarantined
    FROM documents
    """,
)
def q_json_quarantine(spark, sf_dir):
    """PERMISSIVE-mode JSON ingest with corrupt-record quarantine —
    the §2.A ragged-JSON surface as a first-class hash-checked query
    (previously pinned only by tests/test_sources.py): every 13th
    doc's JSON line is truncated mid-string (a real wire corruption),
    from_json(PERMISSIVE) yields a null struct for exactly those rows,
    and the query emits the parsed fields plus the quarantine flag the
    dead-letter path routes on. The oracle predicts the partition of
    good/corrupt rows in closed form — a parser that silently
    null-fills good rows or 'repairs' bad ones breaks the hash.

    Scale: from_json is a codegen'd JVM expression in the scan — no
    shuffle, no python; the quarantine split is a predicate, so the
    dead-letter write is a partition-pruned second sink, never a
    second parse."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit('{"title": "doc'), F.col("doc_id").cast("string"),
        F.lit('", "n": '), F.length("text").cast("string"),
        F.lit("}"))
    corrupted = F.when(F.col("doc_id") % 13 == 0,
                       F.substring(payload, 1, 12)).otherwise(payload)
    parsed = d.select(
        "doc_id",
        F.from_json(corrupted, "title string, n bigint").alias("j"))
    return parsed.select(
        "doc_id",
        F.col("j.title").alias("title"),
        F.col("j.n").alias("n"),
        F.col("j.title").isNull().alias("quarantined"))


# ---------------------------------------------------------------------------
# WET / WAT derivation — the actual Common Crawl distribution formats
# (round 8): a WARC of HTTP responses is derived into (a) WET
# text-only `conversion` records and (b) WAT JSON-metadata sidecars,
# both real ISO 28500 blobs readable by decode_warc.
# ---------------------------------------------------------------------------

def _pack_http_warc_batch(pdf: pd.DataFrame) -> list[bytes]:
    """Shared WET/WAT fixture: per doc a WARC with one warcinfo, m =
    1 + doc_id%3 HTTP 200 text/html responses (response j wraps the
    doc text in a small page; framing alternates plain `chunked` and
    the RFC 9112 coding LIST `gzip, chunked` so the dechunk+gunzip
    receive path stays hash-pinned), one request record, and one 404
    response — the last two so derived outputs must FILTER (WET) or
    DESCRIBE (WAT) non-content records correctly."""
    import zlib

    from .operators.containers import encode_http_chunked, encode_warc

    def chunked(body: bytes, size: int = 96) -> bytes:
        out = bytearray()
        for i in range(0, len(body), size):
            c = body[i:i + size]
            out += b"%x\r\n" % len(c) + c + b"\r\n"
        return bytes(out + b"0\r\n\r\n")

    payloads = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        did = int(doc_id)
        m = 1 + did % 3
        recs = [("warcinfo", None, b"software: mvetl\r\n")]
        for j in range(m):
            html = (f"<html><head><title>d{did}</title>"
                    f"<script>var j={j};</script></head>"
                    f"<body><p>{text} #{j}</p></body></html>").encode()
            uri = f"https://example.com/doc{did}/p{j}"
            if (did + j) % 2 == 0:
                raw = encode_http_chunked(
                    200, [("Content-Type", "text/html")], html, 96)
            else:
                gz = zlib.compress(html, 1, wbits=31)
                raw = (b"HTTP/1.1 200 OK\r\n"
                       b"Content-Type: text/html\r\n"
                       b"Transfer-Encoding: gzip, chunked\r\n\r\n"
                       + chunked(gz))
            recs.append(("response", uri, raw))
        recs.append(("request", f"https://example.com/doc{did}/req",
                     b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n"))
        recs.append(("response", f"https://example.com/doc{did}/missing",
                     b"HTTP/1.1 404 Not Found\r\nContent-Length: 9"
                     b"\r\n\r\nnot found"))
        payloads.append(encode_warc(recs))
    return payloads


_HTML_LEN_SQL = (
    "length('<html><head><title>d' || cast(doc_id as varchar)"
    " || '</title><script>var j=' || cast(r.j as varchar)"
    " || ';</script></head><body><p>' || text || ' #'"
    " || cast(r.j as varchar) || '</p></body></html>')"
)


@query(
    "q_wet_extract",
    oracle=r"""
    WITH params AS (
      SELECT doc_id, text, 1 + doc_id % 3 AS m FROM documents
    ), ex AS (
      SELECT doc_id, m, r.j,
             trim(regexp_replace(
               'd' || cast(doc_id as varchar) || ' ' || text || ' #'
                 || cast(r.j as varchar), '\s+', ' ', 'g')) AS t
      FROM params, range(3) r(j) WHERE r.j < m
    )
    SELECT doc_id,
           cast(count(*) as bigint) AS n_conversion,
           cast(sum(length(t)) as bigint) AS text_octets,
           md5(string_agg(t, '' ORDER BY j)) AS digest,
           'https://example.com/doc' || cast(doc_id as varchar)
             || '/p' || cast(max(m) - 1 as varchar) AS last_uri
    FROM ex GROUP BY doc_id
    """,
)
def q_wet_extract(spark, sf_dir):
    """WET derivation (round 8 — the text-only Common Crawl
    distribution consumers actually read): per doc a WARC of HTTP
    responses is packed (chunked and gzip,chunked framings
    alternating), derive_wet dechunks/gunzips each 200 text/html
    response, strips the HTML to plain text, and emits `conversion`
    records into a new ISO 28500 blob; the query re-reads that WET
    and reports conversion count, text octets, md5 of the
    concatenated texts, and the last target URI — all closed-form in
    (doc_id, text). The request record and the 404 response in the
    source WARC must be FILTERED (a type or status slip changes the
    digest); a dechunk/gunzip slip corrupts every text.

    Scale: ONE fused zero-shuffle Arrow-batched mapInPandas —
    pack → derive → re-walk in a single Python pass per shard (two
    chained stages Arrow-shipped every WARC payload Python→JVM→
    Python for no reason: measured 1.15 s vs 0.7 s of actual work at
    sf0.1); one shard per task, the literal shape of Common Crawl's
    wet-derivation jobs at 100 TB."""
    import hashlib

    d = load_table(spark, sf_dir, "documents")

    def wet(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import decode_warc, derive_wet
        for pdf in batches:
            out = {"doc_id": [], "n_conversion": [], "text_octets": [],
                   "digest": [], "last_uri": []}
            for doc_id, payload in zip(pdf["doc_id"],
                                       _pack_http_warc_batch(pdf)):
                recs = decode_warc(derive_wet(payload))
                conv = [(u, p) for t, u, p in recs if t == "conversion"]
                texts = [p.decode() for _, p in conv]
                out["doc_id"].append(doc_id)
                out["n_conversion"].append(len(conv))
                out["text_octets"].append(sum(len(t) for t in texts))
                out["digest"].append(
                    hashlib.md5("".join(texts).encode()).hexdigest())
                out["last_uri"].append(conv[-1][0])
            yield pd.DataFrame(out)

    # tiny projection, explicit fan-out: one local parquet file is
    # ONE input split, which would serialize the whole derive chain
    # onto a single task (at 100 TB the shard count provides this)
    return fan_out_scan(d.select("doc_id", "text")).mapInPandas(
        wet, schema=("doc_id bigint, n_conversion bigint, "
                     "text_octets bigint, digest string, "
                     "last_uri string"))


@query(
    "q_wat_extract",
    oracle=f"""
    WITH params AS (
      SELECT doc_id, text, 1 + doc_id % 3 AS m FROM documents
    ), resp AS (
      SELECT doc_id,
             string_agg(
               '{{"content_length":' || {_HTML_LEN_SQL}
               || ',"content_type":"text/html","status":200,'
               || '"uri":"https://example.com/doc'
               || cast(doc_id as varchar) || '/p'
               || cast(r.j as varchar) || '"}}', '' ORDER BY r.j)
               AS mid,
             max(m) AS m
      FROM params, range(3) r(j) WHERE r.j < m
      GROUP BY doc_id
    )
    SELECT doc_id,
           cast(m + 3 as bigint) AS n_metadata,
           cast(m as bigint) AS n_http200,
           md5('{{"content_length":17,"content_type":null,'
               || '"status":null,"uri":null}}'
               || mid
               || '{{"content_length":37,"content_type":null,'
               || '"status":null,"uri":"https://example.com/doc'
               || cast(doc_id as varchar) || '/req"}}'
               || '{{"content_length":9,"content_type":null,'
               || '"status":404,"uri":"https://example.com/doc'
               || cast(doc_id as varchar) || '/missing"}}') AS digest
    FROM resp
    """,
)
def q_wat_extract(spark, sf_dir):
    """WAT derivation (round 8 — the metadata sidecar Common Crawl
    ships beside each WARC shard): derive_wat walks the same packed
    WARC as q_wet_extract and emits one `metadata` record per source
    record whose payload is a byte-deterministic JSON envelope
    (sorted keys, compact separators) carrying record type metadata —
    for responses the PARSED HTTP status / content type / decoded
    body length (so the dechunk+gunzip path is load-bearing here
    too). The query reports the metadata count, 200-status count, and
    md5 over the concatenated envelopes; the oracle rebuilds every
    envelope byte-for-byte in SQL, warcinfo and request and 404
    included — one mis-described record breaks the digest.

    Scale: ONE fused zero-shuffle Arrow-batched mapInPandas (pack →
    derive → re-walk in a single Python pass — see q_wet_extract),
    shard-per-task."""
    import hashlib

    d = load_table(spark, sf_dir, "documents")

    def wat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import decode_warc, derive_wat
        for pdf in batches:
            out = {"doc_id": [], "n_metadata": [], "n_http200": [],
                   "digest": []}
            for doc_id, payload in zip(pdf["doc_id"],
                                       _pack_http_warc_batch(pdf)):
                recs = decode_warc(derive_wat(payload))
                envs = [p.decode() for t, _, p in recs
                        if t == "metadata"]
                # envelopes are byte-deterministic (sorted keys,
                # compact separators) so the literal substring test
                # is exact — no per-envelope json parse needed
                n200 = sum(1 for e in envs if '"status":200' in e)
                out["doc_id"].append(doc_id)
                out["n_metadata"].append(len(envs))
                out["n_http200"].append(n200)
                out["digest"].append(
                    hashlib.md5("".join(envs).encode()).hexdigest())
            yield pd.DataFrame(out)

    return fan_out_scan(d.select("doc_id", "text")).mapInPandas(
        wat, schema=("doc_id bigint, n_metadata bigint, "
                     "n_http200 bigint, digest string"))


# ---------------------------------------------------------------------------
# q_robots_wildcard — RFC 9309 §2.2.3 '*'/'$' patterns + group merging
# ---------------------------------------------------------------------------

@query(
    "q_robots_wildcard",
    oracle="""
    SELECT doc_id,
           (doc_id % 3 <> 0) AS allow_ext,
           (doc_id % 4 = 0) AS allow_mid,
           (doc_id % 7 <> doc_id % 10) AS bot_tail_allowed,
           true AS bot_keep_allowed,
           cast(1 + doc_id % 4 as bigint) AS bot_delay
    FROM documents
    """,
)
def q_robots_wildcard(spark, sf_dir):
    """RFC 9309 wildcard evaluation (round 8, closing ADVICE r7):
    per doc a robots.txt exercises '*' (spans '/'), trailing-'$'
    end-anchoring, longest-PATTERN-length precedence, and §2.2.1
    merging of TWO separate groups naming the same product token —
    the mvetlbot probes only decide correctly if both groups' rules
    apply together (bot_keep needs group 2's `Allow: /d/keep*` to
    out-rank group 1's anchored Disallow by pattern length, and
    bot_delay comes from group 2 alone). All four probe outcomes are
    closed-form in doc_id; a wildcard, anchor, precedence, or merge
    slip flips booleans and breaks the hash.

    Scale: zero-shuffle mapInPandas — robots evaluation is per-host
    metadata riding the partition of the URLs it gates."""
    d = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import parse_robots, robots_decision
        for pdf in batches:
            out = {"doc_id": [], "allow_ext": [], "allow_mid": [],
                   "bot_tail_allowed": [], "bot_keep_allowed": [],
                   "bot_delay": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                txt = ("User-agent: *\n"
                       "Disallow: /*.bin$\n"
                       "Disallow: /t/*/x\n"
                       "Allow: /t/pub/x\n"
                       "\n"
                       "User-agent: MvEtlBot\n"
                       f"Disallow: /d/*{did % 10}$\n"
                       "\n"
                       "User-agent: mvetlbot\n"
                       "Allow: /d/keep*\n"
                       f"Crawl-delay: {1 + did % 4}\n")
                g = parse_robots(txt)
                ext_path = "/a.bin" if did % 3 == 0 else "/a.binx"
                mid_dir = "pub" if did % 4 == 0 else str(did % 4)
                ext, _ = robots_decision(g, "genericbot", ext_path)
                mid, _ = robots_decision(g, "genericbot",
                                         f"/t/{mid_dir}/x")
                tail, delay = robots_decision(
                    g, "mvetlbot/2.1", f"/d/f{did % 7}")
                keep, _ = robots_decision(
                    g, "mvetlbot/2.1", f"/d/keep{did % 10}")
                out["doc_id"].append(doc_id)
                out["allow_ext"].append(ext)
                out["allow_mid"].append(mid)
                out["bot_tail_allowed"].append(tail)
                out["bot_keep_allowed"].append(keep)
                out["bot_delay"].append(delay)
            yield pd.DataFrame(out)

    return d.select("doc_id").mapInPandas(
        run, schema=("doc_id bigint, allow_ext boolean, "
                     "allow_mid boolean, bot_tail_allowed boolean, "
                     "bot_keep_allowed boolean, bot_delay bigint"))


# ---------------------------------------------------------------------------
# q_frontier_robots — admission control composed into scheduling
# ---------------------------------------------------------------------------

@query(
    "q_frontier_robots",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'src' || cast(doc_id % 20 as varchar) || '.example.com'
               AS host,
             doc_id % 100 AS priority,
             1 + (doc_id % 20) % 5 AS delay_s
      FROM documents
      WHERE doc_id % 40 <> (doc_id % 20) % 7
    )
    SELECT doc_id, host,
           cast(row_number() OVER w - 1 as bigint) AS fetch_slot,
           cast((row_number() OVER w - 1) * delay_s as bigint)
             AS fetch_at_s
    FROM urls
    WINDOW w AS (PARTITION BY host
                 ORDER BY priority DESC, doc_id)
    """,
)
def q_frontier_robots(spark, sf_dir):
    """Robots-aware frontier composition (round 8, VERDICT r7 item 8
    — what a crawler actually RUNS): each URL is first admitted
    through its host's robots.txt via the REAL RFC 9309 evaluator
    (host src<doc_id%20> disallows /p/<host%7>/, so admission is
    closed-form doc_id%40 <> (doc_id%20)%7), then the admitted set is
    politeness-scheduled exactly as q_url_frontier — per-host window,
    priority order with deterministic tie-break, fetch time = slot ×
    the crawl-delay THE ROBOTS RETURNED (not a side channel). Chains
    q_robots_decide → q_url_frontier through one pipeline; the oracle
    replays admission as a WHERE clause and scheduling as the same
    window.

    Scale: robots evaluation is a zero-shuffle map riding the scan;
    the single shuffle is the per-host window — the same hash-by-host
    the fetcher fleet needs anyway, so the plan adds NO shuffle over
    the non-robots frontier."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")

    def admit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import parse_robots, robots_decision
        for pdf in batches:
            out = {"doc_id": [], "host": [], "priority": [],
                   "delay_s": []}
            robots_cache: dict[int, object] = {}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                h = did % 20
                if h not in robots_cache:
                    robots_cache[h] = parse_robots(
                        "User-agent: *\n"
                        f"Disallow: /p/{h % 7}/\n"
                        f"Crawl-delay: {1 + h % 5}\n")
                ok, delay = robots_decision(
                    robots_cache[h], "mvetlbot/2.1",
                    f"/p/{did % 40}/x")
                if not ok:
                    continue
                out["doc_id"].append(doc_id)
                out["host"].append(f"src{h}.example.com")
                out["priority"].append(did % 100)
                out["delay_s"].append(delay)
            yield pd.DataFrame(out)

    admitted = d.select("doc_id").mapInPandas(
        admit, schema=("doc_id bigint, host string, priority bigint, "
                       "delay_s bigint"))
    w = W.partitionBy("host").orderBy(F.col("priority").desc(),
                                      "doc_id")
    rn = F.row_number().over(w) - 1
    return admitted.select(
        "doc_id", "host",
        rn.cast("long").alias("fetch_slot"),
        (rn * F.col("delay_s")).cast("long").alias("fetch_at_s"))


# ---------------------------------------------------------------------------
# q_warc_revisit — ISO 28500 §6.7.2 identical-payload-digest dedup
# ---------------------------------------------------------------------------

@query(
    "q_warc_revisit",
    oracle="""
    WITH params AS (
      SELECT doc_id, lang, 2 + doc_id % 3 AS m FROM documents
    )
    SELECT doc_id,
           cast(m + 1 as bigint) AS n_records,
           cast(2 as bigint) AS n_kept,
           cast(m - 2 as bigint) AS n_revisit,
           cast(CASE m WHEN 2 THEN 0 WHEN 3 THEN 3 * length(lang)
                ELSE 8 * length(lang) END as bigint) AS saved_octets,
           md5(CASE WHEN m >= 3 THEN
                 'https://example.com/doc' || cast(doc_id as varchar)
                 || '/p0' || 'sha256:' || sha256(repeat(lang, 3))
               ELSE '' END
               || CASE WHEN m >= 4 THEN
                 'https://example.com/doc' || cast(doc_id as varchar)
                 || '/p1' || 'sha256:' || sha256(repeat(lang, 5))
               ELSE '' END) AS ref_digest
    FROM params
    """,
)
def q_warc_revisit(spark, sf_dir):
    """WARC revisit-record payload dedup (round 8 — ISO 28500 §6.7.2,
    the identical-payload-digest profile Heritrix and Common Crawl
    write): per doc a shard holds m = 2 + doc_id%3 responses whose
    payloads alternate between two values, warc_revisit_dedup rewrites
    later duplicates as empty-body `revisit` records carrying
    WARC-Profile / WARC-Payload-Digest / WARC-Refers-To-Target-URI,
    and the query re-reads the DEDUPED shard reporting kept/revisit
    counts, octets saved, and an md5 over each revisit's
    (refers-to-URI ‖ sha256 payload digest) — the oracle recomputes
    the sha256 digests itself, so a digest, ordering, or
    first-occurrence slip breaks the hash.

    Scale: the shard is the dedup scope — per-task state, ONE fused
    zero-shuffle mapInPandas (pack → dedup → re-walk in a single
    Python pass, see q_wet_extract); cross-shard dedup is the
    downstream exact-dedup join."""
    import hashlib

    d = load_table(spark, sf_dir, "documents")

    def dedup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import (decode_warc_headers,
                                           encode_warc,
                                           warc_revisit_dedup)
        for pdf in batches:
            out = {"doc_id": [], "n_records": [], "n_kept": [],
                   "n_revisit": [], "saved_octets": [],
                   "ref_digest": []}
            for doc_id, lang in zip(pdf["doc_id"], pdf["lang"]):
                did = int(doc_id)
                m = 2 + did % 3
                src = [("warcinfo", None, b"software: mvetl\r\n")]
                src += [("response",
                         f"https://example.com/doc{did}/p{j}",
                         (lang * (3 + 2 * (j % 2))).encode())
                        for j in range(m)]
                recs = decode_warc_headers(
                    warc_revisit_dedup(encode_warc(src)))
                kept = [(h, p) for h, p in recs
                        if h["WARC-Type"] == "response"]
                rev = [h for h, _ in recs
                       if h["WARC-Type"] == "revisit"]
                # octets saved = the original payload sizes of the
                # revisits; recover them from the kept copy each
                # revisit's digest points at (a real consumer's move)
                by_digest = {
                    "sha256:" + hashlib.sha256(p).hexdigest(): len(p)
                    for _, p in kept}
                saved = sum(by_digest[h["WARC-Payload-Digest"]]
                            for h in rev)
                ref = "".join(h["WARC-Refers-To-Target-URI"]
                              + h["WARC-Payload-Digest"] for h in rev)
                out["doc_id"].append(doc_id)
                out["n_records"].append(len(recs))
                out["n_kept"].append(len(kept))
                out["n_revisit"].append(len(rev))
                out["saved_octets"].append(saved)
                out["ref_digest"].append(
                    hashlib.md5(ref.encode()).hexdigest())
            yield pd.DataFrame(out)

    return fan_out_scan(d.select("doc_id", "lang")).mapInPandas(
        dedup, schema=("doc_id bigint, n_records bigint, "
                       "n_kept bigint, n_revisit bigint, "
                       "saved_octets bigint, ref_digest string"))


# ---------------------------------------------------------------------------
# q_url_canonicalize — crawl-dedup URL normalization
# ---------------------------------------------------------------------------

@query(
    "q_url_canonicalize",
    oracle="""
    SELECT doc_id,
           'https://www.example.com/p/' || cast(doc_id % 40 as varchar)
             || '/?a=' || cast(doc_id % 3 as varchar)
             || '&b=' || cast(doc_id % 5 as varchar) AS canon_url,
           cast(count(*) OVER (
             PARTITION BY doc_id % 40, doc_id % 3, doc_id % 5)
             as bigint) AS n_dupes
    FROM documents
    """,
)
def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization (round 8 — the crawl-dedup front end
    every frontier runs before digesting): lowercase scheme and host,
    strip the scheme's default port, collapse duplicate path slashes,
    drop tracking parameters (utm_*), SORT the surviving query
    parameters, drop the fragment. The fixture URL is maximally messy
    (uppercase scheme+host, :443 on https, //p//, utm_source, unsorted
    params, #frag); the oracle states the canonical form CLOSED-FORM,
    so Spark's canonicalizer must actually perform every step — then
    both engines count per-canonical-key duplicates over the same
    window (the dedup payoff).

    Scale: pure JVM expression work in the scan (regexp extracts +
    array sort — no python, no shuffle); the window shuffles on the
    canonical key exactly as the downstream dedup join would."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW.Example.COM:443//p//"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("/?b="), (F.col("doc_id") % 5).cast("string"),
        F.lit("&utm_source=x&a="), (F.col("doc_id") % 3).cast("string"),
        F.lit("#frag"))
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/:?#]+)", 1))
    port = F.regexp_extract(url, r"^[A-Za-z]+://[^/:?#]+:(\d+)", 1)
    default = ((scheme == "https") & (port == "443")) | \
              ((scheme == "http") & (port == "80")) | (port == "")
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        "/{2,}", "/")
    qstr = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(qstr, "&"),
        lambda p: ~p.startswith("utm_") & (p != F.lit(""))))
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(default, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")))
    out = d.select("doc_id", canon.alias("canon_url"))
    from pyspark.sql import Window as W
    return out.select(
        "doc_id", "canon_url",
        F.count("*").over(W.partitionBy("canon_url"))
        .cast("long").alias("n_dupes"))


# ---------------------------------------------------------------------------
# q_recrawl_schedule — page change-rate estimation for recrawl priority
# ---------------------------------------------------------------------------

@query(
    "q_recrawl_schedule",
    oracle="""
    WITH visits AS (
      SELECT user_id % 25 AS page, ts, event_id,
             CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS changed
      FROM events
    ), gaps AS (
      SELECT page, changed,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY page ORDER BY ts, event_id) AS gap_us
      FROM visits
    ), agg AS (
      SELECT page,
             count(*) AS n_gaps,
             sum(changed) AS n_changes,
             sum(gap_us) AS sum_gap_us
      FROM gaps WHERE gap_us IS NOT NULL
      GROUP BY page
    )
    SELECT page,
           cast(n_gaps as bigint) AS n_gaps,
           cast(n_changes as bigint) AS n_changes,
           round(cast(sum_gap_us as double) / n_gaps / 1e6, 4)
             AS mean_gap_s,
           round(-ln((n_gaps - n_changes + 0.5) / (n_gaps + 0.5))
                 * 3600.0 * 1e6 * n_gaps / cast(sum_gap_us as double), 4)
             AS lambda_per_hour
    FROM agg ORDER BY page
    """,
)
def q_recrawl_schedule(spark, sf_dir):
    """Recrawl scheduling: estimate each page's Poisson change rate
    from a revisit history of binary change observations and rank pages
    for refresh. Uses the Cho & Garcia-Molina (2003) MLE-corrected
    estimator for changes observed at (roughly regular) intervals:
    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / mean_gap, where n =
    revisit gaps, X = gaps where the page had changed — the +0.5
    continuity correction keeps the estimator finite when X = n. Pages
    are synthesized from events (page = user_id bucket, change flag =
    deterministic event_id predicate); gaps come from one lag() per
    page ordered by (ts, event_id).

    Exactness: n/X/gap sums are exact bigints (epoch microseconds);
    mean gap is one division rounded 4dp; lambda is genuinely-float
    ln math rounded 4dp.

    Scale: one shuffle on page for the lag window, then a map-side-
    combined groupBy on the same key (no second shuffle — the window
    output is already hash-partitioned by page). A real frontier holds
    billions of URLs: same plan, page = URL, both steps stay keyed."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W
    visits = e.select(
        (F.col("user_id") % 25).alias("page"), "ts", "event_id",
        (F.col("event_id") % 3 == 0).cast("int").alias("changed"))
    wpage = W.partitionBy("page").orderBy("ts", "event_id")
    gaps = visits.select(
        "page", "changed",
        (F.unix_micros("ts")
         - F.lag(F.unix_micros("ts")).over(wpage)).alias("gap_us"))
    agg = (gaps.filter(F.col("gap_us").isNotNull())
           .groupBy("page")
           .agg(F.count("*").alias("n_gaps"),
                F.sum("changed").alias("n_changes"),
                F.sum("gap_us").alias("sum_gap_us")))
    lam = (-F.log((F.col("n_gaps") - F.col("n_changes") + 0.5)
                  / (F.col("n_gaps") + 0.5))
           * 3600.0 * 1e6 * F.col("n_gaps")
           / F.col("sum_gap_us").cast("double"))
    return (agg.select(
        "page",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.col("n_changes").cast("long").alias("n_changes"),
        F.round(F.col("sum_gap_us").cast("double") / F.col("n_gaps")
                / 1e6, 4).alias("mean_gap_s"),
        F.round(lam, 4).alias("lambda_per_hour"))
        .orderBy("page"))


# ---------------------------------------------------------------------------
# q_geoip_lookup — longest-prefix CIDR range join
# ---------------------------------------------------------------------------

@query(
    "q_geoip_lookup",
    oracle="""
    WITH blocks AS (
      SELECT n_nationkey,
             n_name,
             n_nationkey * 2097152 AS lo,
             n_nationkey * 2097152 + (CASE WHEN n_nationkey % 3 = 0
                  THEN 2097151 ELSE 1048575 END) AS hi
      FROM nation
    ),
    hits AS (
      SELECT e.event_id,
             (cast(('0x' || substr(md5(cast(e.event_id as varchar)
                   || ':ip8'), 1, 8)) as bigint) % 52428800) AS ip
      FROM events e
    ),
    joined AS (
      SELECT h.event_id, h.ip, b.n_name,
             row_number() OVER (PARTITION BY h.event_id
                                ORDER BY b.lo DESC) AS rk
      FROM hits h JOIN blocks b ON h.ip BETWEEN b.lo AND b.hi
    )
    SELECT n_name AS region,
           count(*) AS n_events,
           min(ip) AS min_ip,
           max(ip) AS max_ip
    FROM joined WHERE rk = 1
    GROUP BY n_name ORDER BY region
    """,
)
def q_geoip_lookup(spark, sf_dir):
    """GeoIP-style CIDR block lookup — the crawl-ops join that maps a
    request IP into its registry block: 25 address blocks (one per
    nation, /11-or-/12-sized so coverage varies), event IPs are
    md5-seeded uniforms over the space, and each IP takes the
    LONGEST-PREFIX match (highest block base that contains it — the
    actual routing-table rule, expressed as a per-event max_by over
    the containing blocks). The block table is tiny at any corpus
    size -> broadcast range join, never a shuffle of the event side;
    the per-event argmax is a groupBy(max_by) so it PARTIAL-AGGREGATES
    below the exchange (VERDICT r8 item 7 — the previous
    event_id-partitioned row_number shuffled the full hit set with no
    map-side combine), and the per-region rollup map-side combines
    too.

    Exactness: integer block bounds, integer md5-derived IPs, integer
    counts — no floats anywhere."""
    n = load_table(spark, sf_dir, "nation")
    e = load_table(spark, sf_dir, "events")
    blocks = n.select(
        "n_nationkey", "n_name",
        (F.col("n_nationkey") * 2097152).alias("lo"),
        (F.col("n_nationkey") * 2097152
         + F.when(F.col("n_nationkey") % 3 == 0, 2097151)
         .otherwise(1048575)).alias("hi"))
    hits = e.select(
        "event_id",
        (F.conv(F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"),
                           F.lit(":ip8"))), 1, 8), 16, 10)
         .cast("bigint") % 52428800).alias("ip"))
    joined = hits.join(F.broadcast(blocks),
                       (F.col("ip") >= F.col("lo"))
                       & (F.col("ip") <= F.col("hi")))
    best = (joined.groupBy("event_id")
            .agg(F.max_by(F.struct("n_name", "ip"), "lo").alias("b")))
    return (best.groupBy(F.col("b.n_name").alias("region"))
            .agg(F.count("*").alias("n_events"),
                 F.min("b.ip").alias("min_ip"),
                 F.max("b.ip").alias("max_ip"))
            .orderBy("region"))
