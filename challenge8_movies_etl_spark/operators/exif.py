"""TIFF / EXIF metadata codec — writer + reader implemented from the
public TIFF 6.0 and EXIF 2.3 specifications: both byte orders
(``II`` little-endian, ``MM`` big-endian), IFD walking, inline-vs-
offset value resolution (values whose encoded size is <= 4 bytes live
in the entry itself), and the Exif private sub-IFD behind tag 0x8769.

This is the metadata-extraction step of an image ingest pipeline: the
pixel decoders (operators/jpeg.py, png.py) handle pixels; this module
handles the APP1 ``Exif\\x00\\x00`` payload every camera JPEG carries.

ValueError = structurally corrupt TIFF; NotImplementedError = a valid
field type this reader doesn't support yet (per the repo convention).
"""

from __future__ import annotations

import struct

# field type -> (struct code, element size)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
          2: (None, 1), 7: (None, 1), 9: ("i", 4), 10: ("ii", 8)}

TAG_WIDTH = 0x0100
TAG_HEIGHT = 0x0101
TAG_MAKE = 0x010F
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_EXPOSURE = 0x829A
TAG_ISO = 0x8827


def build_exif(*, big_endian: bool, width: int, height: int, make: str,
               datetime: str, orientation: int,
               exposure: tuple[int, int], iso: int) -> bytes:
    """Serialize a two-IFD EXIF blob (IFD0 + Exif sub-IFD) in the
    requested byte order, with ASCII and RATIONAL values placed after
    the IFDs exactly as the offset rules require. Deterministic layout:
    IFD0 at 8, value area, then the Exif IFD, then its value area."""
    e = ">" if big_endian else "<"
    make_b = make.encode() + b"\x00"
    dt_b = datetime.encode() + b"\x00"

    # TIFF 6.0 value rule: payloads of <= 4 bytes live INLINE in the
    # entry; only longer ones go to the value area behind an offset
    # (the hypothesis roundtrip caught a writer that offset short
    # ASCII values — readers then misparse the offset as data).
    # IFD0: width, height, make, orientation, datetime, exifptr (6)
    ifd0_at = 8
    n0 = 6
    ifd0_end = ifd0_at + 2 + 12 * n0 + 4
    area = bytearray()

    area_frozen = False

    def place(payload: bytes) -> int:
        # Layout guard: once exif_at is computed, the IFD0 value area
        # is FROZEN — a later >4-byte payload appended here would
        # silently shift the Exif IFD past its recorded offset.
        # Currently unreachable (every post-freeze entry is <= 4
        # bytes: EXIF pointer LONG, ISO SHORT), asserted so a future
        # tag addition fails loudly instead of corrupting the blob.
        assert not area_frozen, \
            "exif: value area frozen after exif_at — give the Exif " \
            "IFD its own value area for >4-byte payloads"
        at = ifd0_end + len(area)
        area.extend(payload)
        return at

    def full(tag: int, typ: int, count: int, payload: bytes) -> bytes:
        head = struct.pack(e + "HHI", tag, typ, count)
        if len(payload) <= 4:
            return head + payload.ljust(4, b"\x00")
        return head + struct.pack(e + "I", place(payload))

    ifd0 = struct.pack(e + "H", n0)
    ifd0 += full(TAG_WIDTH, 4, 1, struct.pack(e + "I", width))
    ifd0 += full(TAG_HEIGHT, 4, 1, struct.pack(e + "I", height))
    ifd0 += full(TAG_MAKE, 2, len(make_b), make_b)
    ifd0 += full(TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation))
    ifd0 += full(TAG_DATETIME, 2, len(dt_b), dt_b)
    exif_at = ifd0_end + len(area)
    area_frozen = True
    ifd0 += full(TAG_EXIF_IFD, 4, 1, struct.pack(e + "I", exif_at))
    ifd0 += struct.pack(e + "I", 0)  # no IFD1

    n1 = 2
    expo_at = exif_at + 2 + 12 * n1 + 4
    exif = struct.pack(e + "H", n1)
    exif += struct.pack(e + "HHI", TAG_EXPOSURE, 5, 1)
    exif += struct.pack(e + "I", expo_at)
    exif += full(TAG_ISO, 3, 1, struct.pack(e + "H", iso))
    exif += struct.pack(e + "I", 0)

    tiff = struct.pack(e + "2sHI", b"MM" if big_endian else b"II",
                       42, ifd0_at)
    tiff += ifd0 + bytes(area) + exif
    tiff += struct.pack(e + "II", *exposure)
    return b"Exif\x00\x00" + tiff


def _read_entry(buf: bytes, at: int, e: str, base: int):
    tag, typ, count = struct.unpack_from(e + "HHI", buf, at)
    if typ not in _TYPES:
        raise NotImplementedError(f"exif: field type {typ}")
    code, size = _TYPES[typ]
    nbytes = size * count
    if nbytes <= 4:
        raw = buf[at + 8:at + 8 + nbytes]
    else:
        (off,) = struct.unpack_from(e + "I", buf, at + 8)
        if base + off + nbytes > len(buf):
            raise ValueError("exif: value offset out of range")
        raw = buf[base + off:base + off + nbytes]
    if typ in (2, 7):  # ASCII / UNDEFINED
        val = raw.rstrip(b"\x00").decode("ascii", "replace") \
            if typ == 2 else raw
    elif typ in (5, 10):  # (S)RATIONAL pairs
        vals = struct.unpack(e + code * count, raw)
        val = [(vals[2 * i], vals[2 * i + 1]) for i in range(count)]
        if count == 1:
            val = val[0]
    else:
        vals = struct.unpack(e + code * count, raw)
        val = vals[0] if count == 1 else list(vals)
    return tag, val


def _read_ifd(buf: bytes, at: int, e: str, base: int) -> dict[int, object]:
    if at + 2 > len(buf):
        raise ValueError("exif: IFD offset out of range")
    (n,) = struct.unpack_from(e + "H", buf, at)
    if at + 2 + 12 * n + 4 > len(buf):
        raise ValueError("exif: truncated IFD")
    out: dict[int, object] = {}
    for i in range(n):
        tag, val = _read_entry(buf, at + 2 + 12 * i, e, base)
        out[tag] = val
    return out


def parse_exif(blob: bytes) -> dict[int, object]:
    """Parse an APP1 EXIF payload (or a bare TIFF) → {tag: value},
    with the Exif sub-IFD's tags merged in. Detects the byte order
    from the TIFF header, so the same call handles II and MM files."""
    if blob[:6] == b"Exif\x00\x00":
        blob = blob[6:]
    if len(blob) < 8:
        raise ValueError("exif: too short for a TIFF header")
    order = blob[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("exif: bad byte-order mark")
    magic, ifd0_at = struct.unpack_from(e + "HI", blob, 2)
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    tags = _read_ifd(blob, ifd0_at, e, 0)
    sub = tags.get(TAG_EXIF_IFD)
    if isinstance(sub, int):
        tags.update(_read_ifd(blob, sub, e, 0))
    return tags
