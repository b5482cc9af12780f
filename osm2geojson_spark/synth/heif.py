"""Real HEIF container (ISO/IEC 23008-12 on ISO-BMFF) with the standard
JPEG coding item — closes the ``fmt=heif`` stub the same way mp4/mkv
closed video: the CONTAINER layer is fully real (ftyp brands, meta
full-box, hdlr/pitm/iinf/iloc/iprp walk, extent resolution into mdat),
and the payload is a standard item type this engine really decodes
(``jpeg``, ISO/IEC 23008-12 §B.2 defines the JPEG image item).  Items
declaring ``hvc1`` (HEIC/HEVC) or ``av01`` (AVIF/AV1) codec-gate to
``NotImplementedError`` — real-world iPhone HEICs quarantine honestly
rather than mis-decode, exactly like webm/VP9.

Box grammar reused from the repo's ISO-BMFF reader (synth/mp4.py
``_walk``); the HEIF-specific layer here is the item machinery:

- ``meta`` is a FullBox (4-byte version/flags before children);
- ``iinf``/``infe`` (version ≥ 2) map item_id → 4cc item_type;
- ``pitm`` names the primary item;
- ``iloc`` (versions 0-2) resolves [extent_offset, extent_length] with
  arbitrary offset/length/base_offset sizes (0/4/8 bytes),
  construction_method 0 (file offsets);
- ``iprp``/``ipco``/``ispe`` carries declared spatial extents, verified
  against the decoded payload.
"""

from __future__ import annotations

import struct

import numpy as np

from .mp4 import _box, _full, _walk


# ------------------------------------------------------------------ encoder
def encode_heif(px: np.ndarray, item_type: bytes = b"jpeg",
                payload: bytes | None = None, brand: bytes = b"mif1") -> bytes:
    """Single-item HEIF. Default: a real JPEG coding item (canonical
    4:4:4 q95 — the same re-encode convention as fmt=jpg).  Pass
    ``item_type=b'hvc1'/b'av01'`` with an opaque payload to synthesize
    structurally-valid HEIC/AVIF files whose codec this engine gates."""
    h, w = px.shape[:2]
    if payload is None:
        if item_type != b"jpeg":
            raise ValueError("only the jpeg item payload is synthesized")
        from .jpeg import encode_jpeg

        payload = encode_jpeg(px, quality=95, subsampling="444")

    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"jpeg")
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"pict" + b"\x00" * 12 + b"heif\x00")
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    infe = _full(b"infe", 2, 0,
                 struct.pack(">HH", 1, 0) + item_type + b"img\x00")
    iinf = _full(b"iinf", 0, 0, struct.pack(">H", 1) + infe)
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", w, h))
    ipco = _box(b"ipco", ispe)
    # one association: item 1 -> property 1 (essential bit set)
    ipma = _full(b"ipma", 0, 0, struct.pack(">I", 1)
                 + struct.pack(">H", 1) + bytes([1, 0x81]))
    iprp = _box(b"iprp", ipco + ipma)
    # iloc version 0: offset_size=4, length_size=4, base_offset_size=0;
    # extent offset patched once total header size is known
    iloc_body = bytearray()
    iloc_body += bytes([0x44, 0x00])            # sizes nibbles
    iloc_body += struct.pack(">H", 1)           # item count
    iloc_body += struct.pack(">HHH", 1, 0, 1)   # item 1, dataref 0, 1 extent
    iloc_off_at = len(iloc_body)
    iloc_body += struct.pack(">II", 0, len(payload))
    iloc = _full(b"iloc", 0, 0, bytes(iloc_body))

    meta_children = hdlr + pitm + iinf + iprp + iloc
    meta = _full(b"meta", 0, 0, meta_children)
    mdat_payload_off = len(ftyp) + len(meta) + 8   # mdat header is 8 bytes
    # patch the extent offset inside the assembled meta box: the iloc
    # body starts (4 size + 4 typ + 4 verflags) into the iloc box
    meta = bytearray(meta)
    iloc_start = len(meta) - len(iloc)
    off_pos = iloc_start + 12 + iloc_off_at
    meta[off_pos:off_pos + 4] = struct.pack(">I", mdat_payload_off)
    return ftyp + bytes(meta) + _box(b"mdat", payload)


def encode_avif_gated(px: np.ndarray) -> bytes:
    """Structurally-valid AVIF whose av01 payload this engine refuses."""
    return encode_heif(px, item_type=b"av01",
                       payload=b"\x0a\x0e\x00\x00AV1-OBU-STUB",
                       brand=b"avif")


# ------------------------------------------------------------------ decoder
def _fullbox_body(buf: bytes, body: int, bend: int) -> tuple[int, int, int]:
    """(version, flags, first child offset) of a FullBox."""
    verflags = struct.unpack_from(">I", buf, body)[0]
    return verflags >> 24, verflags & 0xFFFFFF, body + 4


def _uint(buf: bytes, pos: int, size: int) -> int:
    v = 0
    for k in range(size):
        v = (v << 8) | buf[pos + k]
    return v


def heif_items(buf: bytes) -> dict:
    """{item_id: {'type': 4cc, 'offset': int, 'length': int}},
    plus '_primary' and '_ispe' keys — the real container walk."""
    meta = None
    for typ, body, bend in _walk(buf, 0, len(buf)):
        if typ == b"meta":
            meta = (body, bend)
    if meta is None:
        raise ValueError("no meta box (not a HEIF)")
    _ver, _flags, start = _fullbox_body(buf, *meta)
    items: dict = {}
    primary = None
    ispe = None
    for typ, body, bend in _walk(buf, start, meta[1]):
        if typ == b"pitm":
            v, _, p = _fullbox_body(buf, body, bend)
            primary = struct.unpack_from(">H" if v == 0 else ">I", buf, p)[0]
        elif typ == b"iinf":
            v, _, p = _fullbox_body(buf, body, bend)
            n = struct.unpack_from(">H" if v == 0 else ">I", buf, p)[0]
            p += 2 if v == 0 else 4
            for t2, b2, e2 in _walk(buf, p, bend):
                if t2 != b"infe":
                    continue
                v2, _, p2 = _fullbox_body(buf, b2, e2)
                if v2 < 2:
                    raise ValueError("infe version < 2 unsupported")
                iid = struct.unpack_from(">H" if v2 == 2 else ">I", buf, p2)[0]
                p2 += 2 if v2 == 2 else 4
                p2 += 2                          # protection index
                items.setdefault(iid, {})["type"] = buf[p2:p2 + 4]
        elif typ == b"iloc":
            v, _, p = _fullbox_body(buf, body, bend)
            sizes = buf[p]
            off_sz, len_sz = sizes >> 4, sizes & 0xF
            base_sz = buf[p + 1] >> 4
            index_sz = (buf[p + 1] & 0xF) if v in (1, 2) else 0
            p += 2
            n = struct.unpack_from(">H" if v < 2 else ">I", buf, p)[0]
            p += 2 if v < 2 else 4
            for _k in range(n):
                iid = struct.unpack_from(">H" if v < 2 else ">I", buf, p)[0]
                p += 2 if v < 2 else 4
                method = 0
                if v in (1, 2):
                    method = struct.unpack_from(">H", buf, p)[0] & 0xF
                    p += 2
                p += 2                           # data reference index
                base = _uint(buf, p, base_sz)
                p += base_sz
                n_ext = struct.unpack_from(">H", buf, p)[0]
                p += 2
                if method != 0:
                    raise ValueError(f"iloc construction_method {method} unsupported")
                if n_ext != 1:
                    raise ValueError("multi-extent items unsupported")
                p += index_sz
                off = base + _uint(buf, p, off_sz)
                p += off_sz
                ln = _uint(buf, p, len_sz)
                p += len_sz
                items.setdefault(iid, {}).update(offset=off, length=ln)
        elif typ == b"iprp":
            ipco = None
            for t2, b2, e2 in _walk(buf, body, bend):
                if t2 == b"ipco":
                    ipco = (b2, e2)
            if ipco:
                for t3, b3, e3 in _walk(buf, *ipco):
                    if t3 == b"ispe":
                        _, _, p3 = _fullbox_body(buf, b3, e3)
                        ispe = struct.unpack_from(">II", buf, p3)
    if primary is None or primary not in items:
        raise ValueError("no primary item")
    items["_primary"] = primary
    items["_ispe"] = ispe
    return items


def decode_heif(buf: bytes) -> np.ndarray:
    """Primary-item decode: jpeg items decode for real; hvc1/av01 gate."""
    items = heif_items(buf)
    it = items[items["_primary"]]
    typ = it.get("type", b"????")
    if typ in (b"hvc1", b"av01"):
        codec = "hevc" if typ == b"hvc1" else "av1"
        raise NotImplementedError(
            f"HEIF item codec '{codec}' not implemented in this container; "
            "plug libheif/Pillow-heif in to enable")
    if typ != b"jpeg":
        raise ValueError(f"unknown HEIF item type {typ!r}")
    payload = buf[it["offset"]:it["offset"] + it["length"]]
    if len(payload) != it["length"]:
        raise ValueError("iloc extent out of bounds")
    from .jpeg import decode_jpeg

    px = decode_jpeg(payload)
    if items["_ispe"] is not None:
        w, h = items["_ispe"]
        if px.shape[:2] != (h, w):
            raise ValueError(
                f"ispe {w}x{h} != decoded {px.shape[1]}x{px.shape[0]}")
    return px
