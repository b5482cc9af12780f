"""Real Ogg container with the FLAC-in-Ogg mapping (RFC 3533 framing +
the Xiph "FLAC-to-Ogg mapping" version 1.0) — closes the ``fmt=ogg``
stub honestly: the container layer (page capture pattern, CRC-32 with
the Ogg polynomial, lacing/segmentation, packet reassembly across pages,
BOS/EOS flags, granule positions) is fully real, and the codec inside is
the repo's own FLAC (synth/flac.py).  Streams whose BOS packet declares
a codec this engine does not implement (Vorbis, Opus) raise
``NotImplementedError`` from the dispatch — the same honest codec-gate
as webm/VP9 — so real-world Vorbis files quarantine rather than
mis-decode.

Layout produced by :func:`encode_ogg_flac`:

- page 0 (BOS): one packet — ``0x7F 'FLAC' 1 0 <u16be n_headers> 'fLaC'
  <STREAMINFO block>``;
- page 1: one packet — VORBIS_COMMENT metadata block (last-flag set);
- audio pages: FLAC frames, one packet per frame, several frames per
  page; granule = cumulative sample count after the page's last
  completed packet; final page flagged EOS.

The decoder walks pages (verifying capture, version, and CRC),
reassembles packets honoring the continued-packet flag, then rebuilds a
native fLaC stream and hands it to the real FLAC decoder.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- Ogg CRC-32
# polynomial 0x04C11DB7, init 0, no reflection, no final xor (RFC 3533 A.2)
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(serial: int, seq: int, granule: int, flags: int,
          packets: list[bytes], continued_tail: bytes | None = None) -> bytes:
    """One complete page from whole packets (plus an optional continued
    tail written WITHOUT a terminating lacing value < 255)."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q + bytes([r])
        body += p
    if continued_tail is not None:
        q, r = divmod(len(continued_tail), 255)
        lacing += b"\xff" * q + bytes([r])
        body += continued_tail
    if len(lacing) > 255:
        raise ValueError("too many segments for one page")
    hdr = bytearray(b"OggS\x00")
    hdr.append(flags)
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<I", serial)
    hdr += struct.pack("<I", seq)
    hdr += b"\x00\x00\x00\x00"              # CRC placeholder
    hdr.append(len(lacing))
    hdr += lacing
    page = bytes(hdr) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def encode_ogg_flac(samples: np.ndarray, rate: int = 16_000,
                    serial: int = 0x600D) -> bytes:
    from .flac import encode_flac_parts

    streaminfo, frames = encode_flac_parts(samples, rate)
    first = (b"\x7fFLAC\x01\x00" + struct.pack(">H", 1) + b"fLaC"
             + bytes([0x00]) + len(streaminfo).to_bytes(3, "big") + streaminfo)
    vendor = b"osm2geojson-spark"
    vc_body = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    vcomment = bytes([0x84]) + len(vc_body).to_bytes(3, "big") + vc_body

    out = bytearray()
    out += _page(serial, 0, 0, 0x02, [first])          # BOS
    out += _page(serial, 1, 0, 0x00, [vcomment])
    seq = 2
    granule = 0
    i = 0
    block = 4096
    n = len(samples)
    while i < len(frames):
        group = frames[i:i + 4]
        granule = min((i + len(group)) * block, n)
        flags = 0x04 if i + len(group) == len(frames) else 0x00
        out += _page(serial, seq, granule, flags, group)
        seq += 1
        i += len(group)
    if not frames:                                      # degenerate: empty
        out += _page(serial, seq, 0, 0x04, [])
    return bytes(out)


def _walk_pages(buf: bytes):
    """Yield (flags, granule, serial, seq, continued_first, segments) per
    page after verifying capture, version, and CRC."""
    pos = 0
    while pos < len(buf):
        if buf[pos:pos + 4] != b"OggS":
            raise ValueError(f"bad capture pattern at {pos}")
        if buf[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        flags = buf[pos + 5]
        granule, serial, seq, crc = struct.unpack_from("<qIII", buf, pos + 6)
        nseg = buf[pos + 26]
        lacing = buf[pos + 27:pos + 27 + nseg]
        body_len = sum(lacing)
        end = pos + 27 + nseg + body_len
        if end > len(buf):
            raise ValueError("truncated page")
        page = bytearray(buf[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        # split body into packet fragments per lacing
        frags = []
        off = pos + 27 + nseg
        cur = bytearray()
        for lv in lacing:
            cur += buf[off:off + lv]
            off += lv
            if lv < 255:
                frags.append((bytes(cur), True))        # packet complete
                cur = bytearray()
        if cur:
            frags.append((bytes(cur), False))           # continues next page
        yield flags, granule, serial, seq, frags
        pos = end


def ogg_packets(buf: bytes) -> list[bytes]:
    """Reassembled packet list (continuation-aware), CRC-verified."""
    packets: list[bytes] = []
    pending = b""
    for flags, _gran, _serial, _seq, frags in _walk_pages(buf):
        for k, (data, complete) in enumerate(frags):
            if k == 0 and (flags & 0x01):
                pending += data
                if complete:
                    packets.append(pending)
                    pending = b""
                continue
            if pending and k == 0:
                raise ValueError("expected continuation flag")
            if complete:
                packets.append(pending + data)
                pending = b""
            else:
                pending = data
    return packets


def decode_ogg_flac(buf: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples, rate) — real container walk, then the repo's FLAC
    decoder over the reassembled native stream."""
    from .flac import decode_flac

    packets = ogg_packets(buf)
    if not packets:
        raise ValueError("no Ogg packets")
    p0 = packets[0]
    if len(p0) >= 5 and p0[0] == 0x7F and p0[1:5] == b"FLAC":
        n_headers = struct.unpack(">H", p0[7:9])[0]
        if p0[9:13] != b"fLaC":
            raise ValueError("FLAC mapping without fLaC signature")
        streaminfo_block = bytearray(p0[13:])
        streaminfo_block[0] |= 0x80          # force last-metadata flag
        native = b"fLaC" + bytes(streaminfo_block) \
            + b"".join(packets[1 + n_headers:])
        return decode_flac(native)
    if p0[1:7] == b"vorbis" or p0.startswith(b"OpusHead"):
        codec = "vorbis" if p0[1:7] == b"vorbis" else "opus"
        raise NotImplementedError(
            f"Ogg stream declares codec '{codec}' — DSP decoder not "
            "implemented in this container; plug ffmpeg/soundfile in")
    raise ValueError("unrecognized Ogg BOS mapping")
