"""Exif APP1 metadata: a real TIFF 6.0 IFD builder and an independent
parser (pure stdlib — no PIL/piexif).

Structure produced/consumed (Exif 2.3, JEITA CP-3451):

    b"Exif\\0\\0"
    TIFF header: "II"*2A (little-endian) or "MM"*2A (big-endian), IFD0 @ 8
    IFD0:    Make(0x010F ASCII) Model(0x0110 ASCII)
             Orientation(0x0112 SHORT) DateTime(0x0132 ASCII)
             ExifIFDPointer(0x8769 LONG) GPSIFDPointer(0x8825 LONG)
    ExifIFD: PixelXDimension(0xA002 LONG) PixelYDimension(0xA003 LONG)
    GPSIFD:  GPSLatitudeRef(0x1 ASCII N/S) GPSLatitude(0x2 RATIONAL×3)
             GPSLongitudeRef(0x3 ASCII E/W) GPSLongitude(0x4 RATIONAL×3)

Values ≤ 4 bytes are stored inline in the entry's value slot (left-
justified per spec); longer values live in a data area after each IFD.
GPS coordinates are written as ((microdegrees, 10^6), (0,1), (0,1)) —
decimal degrees carried exactly in the degrees rational, a layout real
phone firmwares also use — so parse(build(x)) is integer-exact.

The parser is deliberately more general than the builder (it skips
unknown tags, accepts either byte order, follows pointers anywhere in
the blob, and handles minute/second rationals the builder never emits);
hand-assembled vectors in tests/test_exif.py pin those paths.
"""

from __future__ import annotations

import struct

EXIF_MAGIC = b"Exif\x00\x00"

# tag ids
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_PX_X = 0xA002
TAG_PX_Y = 0xA003
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

# TIFF types: (size in bytes, struct code)
_TYPES = {1: (1, "B"), 2: (1, "s"), 3: (2, "H"), 4: (4, "I"), 5: (8, None)}
T_ASCII, T_SHORT, T_LONG, T_RATIONAL = 2, 3, 4, 5


def _pack_value(ttype: int, values, e: str) -> bytes:
    if ttype == T_ASCII:
        return values + b"\x00"
    if ttype == T_RATIONAL:
        return b"".join(struct.pack(e + "II", n, d) for n, d in values)
    code = _TYPES[ttype][1]
    return b"".join(struct.pack(e + code, v) for v in values)


def _ifd(entries, ifd_off: int, e: str, next_off: int = 0) -> bytes:
    """Serialize one IFD at absolute offset ``ifd_off``: entry table,
    next-IFD pointer, then the out-of-line data area."""
    entries = sorted(entries)  # spec: ascending tag order
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    table, data = bytearray(), bytearray()
    for tag, ttype, values in entries:
        payload = _pack_value(ttype, values, e)
        count = len(payload) if ttype == T_ASCII else len(values)
        ent = struct.pack(e + "HHI", tag, ttype, count)
        if len(payload) <= 4:
            ent += payload.ljust(4, b"\x00")
        else:
            ent += struct.pack(e + "I", data_off + len(data))
            data += payload
            if len(data) & 1:  # keep offsets even (TIFF convention)
                data += b"\x00"
        table += ent
    out = struct.pack(e + "H", len(entries)) + bytes(table) \
        + struct.pack(e + "I", next_off) + bytes(data)
    return out


def build_exif(
    *,
    make: str,
    model: str,
    orientation: int,
    datetime: str,
    px_w: int,
    px_h: int,
    lat_udeg: int,
    lon_udeg: int,
    byte_order: str = "II",
) -> bytes:
    """Serialize a 3-IFD Exif APP1 payload (without the APP1 marker)."""
    e = "<" if byte_order == "II" else ">"

    def gps_coord(udeg: int):
        return [(abs(udeg), 1_000_000), (0, 1), (0, 1)]

    gps_entries = [
        (TAG_GPS_LAT_REF, T_ASCII, (b"N" if lat_udeg >= 0 else b"S")),
        (TAG_GPS_LAT, T_RATIONAL, gps_coord(lat_udeg)),
        (TAG_GPS_LON_REF, T_ASCII, (b"E" if lon_udeg >= 0 else b"W")),
        (TAG_GPS_LON, T_RATIONAL, gps_coord(lon_udeg)),
    ]
    exif_entries = [
        (TAG_PX_X, T_LONG, [px_w]),
        (TAG_PX_Y, T_LONG, [px_h]),
    ]

    # layout: IFD0 @ 8, Exif IFD after IFD0, GPS IFD after Exif IFD.
    # IFD0 size depends only on entry count + data payload sizes, so we
    # can compute offsets in one forward pass with a placeholder build.
    def ifd0_entries(exif_off: int, gps_off: int):
        return [
            (TAG_MAKE, T_ASCII, make.encode()),
            (TAG_MODEL, T_ASCII, model.encode()),
            (TAG_ORIENTATION, T_SHORT, [orientation]),
            (TAG_DATETIME, T_ASCII, datetime.encode()),
            (TAG_EXIF_IFD, T_LONG, [exif_off]),
            (TAG_GPS_IFD, T_LONG, [gps_off]),
        ]

    ifd0_probe = _ifd(ifd0_entries(0, 0), 8, e)
    exif_off = 8 + len(ifd0_probe)
    exif_ifd = _ifd(exif_entries, exif_off, e)
    gps_off = exif_off + len(exif_ifd)
    gps_ifd = _ifd(gps_entries, gps_off, e)
    ifd0 = _ifd(ifd0_entries(exif_off, gps_off), 8, e)
    assert len(ifd0) == len(ifd0_probe)

    tiff = (byte_order.encode() + struct.pack(e + "H", 42)
            + struct.pack(e + "I", 8) + ifd0 + exif_ifd + gps_ifd)
    return EXIF_MAGIC + tiff


def attach_exif_app1(jpeg: bytes, exif_payload: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (Exif 2.3 placement)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    seg = b"\xff\xe1" + (len(exif_payload) + 2).to_bytes(2, "big") \
        + exif_payload
    return jpeg[:2] + seg + jpeg[2:]


# ------------------------------------------------------------------ parse


def _read_entries(buf: bytes, off: int, e: str):
    if off + 2 > len(buf):
        raise ValueError("IFD offset out of bounds")
    (n,) = struct.unpack_from(e + "H", buf, off)
    end = off + 2 + 12 * n + 4
    if end > len(buf):
        raise ValueError("IFD overruns blob")
    for i in range(n):
        tag, ttype, count = struct.unpack_from(e + "HHI", buf, off + 2 + 12 * i)
        vpos = off + 2 + 12 * i + 8
        size = _TYPES.get(ttype, (0,))[0] * count
        if size == 0:
            continue  # unknown type: skip (parser tolerance)
        if size > 4:
            (vpos,) = struct.unpack_from(e + "I", buf, vpos)
        if vpos + size > len(buf):
            raise ValueError(f"tag {tag:#06x} value out of bounds")
        yield tag, ttype, count, vpos


def _value(buf: bytes, ttype: int, count: int, vpos: int, e: str):
    if ttype == T_ASCII:
        raw = buf[vpos:vpos + count]
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if ttype == T_RATIONAL:
        return [struct.unpack_from(e + "II", buf, vpos + 8 * i)
                for i in range(count)]
    code = _TYPES[ttype][1]
    vals = list(struct.unpack_from(e + str(count) + code, buf, vpos))
    return vals[0] if count == 1 else vals


def _rationals_to_udeg(rs) -> int:
    """deg/min/sec rationals → microdegrees, exact for the builder's
    layout and correctly rounded for arbitrary den (sum as one rational:
    (n1/d1 + n2/(60 d2) + n3/(3600 d3)) · 10^6)."""
    (n1, d1), (n2, d2), (n3, d3) = (list(rs) + [(0, 1), (0, 1)])[:3]
    d1, d2, d3 = d1 or 1, d2 or 1, d3 or 1
    num = (n1 * 3600 * d2 * d3 + n2 * 60 * d1 * d3 + n3 * d1 * d2) * 1_000_000
    den = 3600 * d1 * d2 * d3
    return (num + den // 2) // den


def parse_exif(payload: bytes) -> dict:
    """Parse an Exif APP1 payload → flat dict. Raises ValueError on a
    malformed blob (bad magic, truncated IFD, out-of-bounds value)."""
    if payload[:6] != EXIF_MAGIC:
        raise ValueError("missing Exif magic")
    t = payload[6:]
    order = t[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte order {order!r}")
    (magic,) = struct.unpack_from(e + "H", t, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd0_off,) = struct.unpack_from(e + "I", t, 4)

    out: dict = {"byte_order": order.decode()}
    sub_offsets: dict[str, int] = {}
    for tag, ttype, count, vpos in _read_entries(t, ifd0_off, e):
        v = _value(t, ttype, count, vpos, e)
        if tag == TAG_MAKE:
            out["make"] = v
        elif tag == TAG_MODEL:
            out["model"] = v
        elif tag == TAG_ORIENTATION:
            out["orientation"] = v
        elif tag == TAG_DATETIME:
            out["datetime"] = v
        elif tag == TAG_EXIF_IFD:
            sub_offsets["exif"] = v
        elif tag == TAG_GPS_IFD:
            sub_offsets["gps"] = v

    if "exif" in sub_offsets:
        for tag, ttype, count, vpos in _read_entries(t, sub_offsets["exif"], e):
            v = _value(t, ttype, count, vpos, e)
            if tag == TAG_PX_X:
                out["px_w"] = v
            elif tag == TAG_PX_Y:
                out["px_h"] = v
    if "gps" in sub_offsets:
        gps: dict = {}
        for tag, ttype, count, vpos in _read_entries(t, sub_offsets["gps"], e):
            gps[tag] = _value(t, ttype, count, vpos, e)
        if TAG_GPS_LAT in gps:
            sign = -1 if gps.get(TAG_GPS_LAT_REF, "N").startswith("S") else 1
            out["lat_udeg"] = sign * _rationals_to_udeg(gps[TAG_GPS_LAT])
        if TAG_GPS_LON in gps:
            sign = -1 if gps.get(TAG_GPS_LON_REF, "E").startswith("W") else 1
            out["lon_udeg"] = sign * _rationals_to_udeg(gps[TAG_GPS_LON])
    return out


def find_exif_in_jpeg(jpeg: bytes) -> bytes | None:
    """Walk JPEG markers; return the first APP1 Exif payload, or None.
    Stops at SOS (entropy data follows — no more metadata segments)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = int.from_bytes(jpeg[pos + 2:pos + 4], "big")
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == EXIF_MAGIC:
            return jpeg[pos + 4:pos + 2 + seg_len]
        if marker == 0xDA:  # SOS
            return None
        pos += 2 + seg_len
    return None


# ------------------------------------------------- deterministic synth

_MAKES = ["CamCo0", "CamCo1", "CamCo2", "CamCo3", "CamCo4"]


def exif_fields_for(seed: int, w: int, h: int) -> dict:
    """Seed formula for the oracle (pure int arithmetic, SQL-replayable):
    every field below is reproduced verbatim in the DuckDB twin of the
    ``exif_extract`` catalog query."""
    lat = (seed * 2246822519 + 1013904223) % 180_000_001 - 90_000_000
    lon = (seed * 2654435761 + 40503) % 360_000_001 - 180_000_000
    return {
        "make": _MAKES[seed % 5],
        "model": f"M-{seed % 11}",
        "orientation": 1 + seed % 8,
        "datetime": (f"{2010 + seed % 15:04d}:{1 + seed % 12:02d}:"
                     f"{1 + seed % 28:02d} {seed % 24:02d}:"
                     f"{seed % 60:02d}:{(seed * 7) % 60:02d}"),
        "px_w": w,
        "px_h": h,
        "lat_udeg": lat,
        "lon_udeg": lon,
        # mod 3 decorrelates byte order from the mod-8 orientation and
        # the mod-5 exif-presence gate, so every orientation group sees
        # both endiannesses
        "byte_order": "II" if seed % 3 == 0 else "MM",
    }


def exif_app1_for(seed: int, w: int, h: int) -> bytes:
    return build_exif(**exif_fields_for(seed, w, h))
