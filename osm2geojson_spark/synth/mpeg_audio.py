"""MPEG audio (mp3-family) FRAMING layer — real header grammar, honest
DSP gate.

What is real here (ISO/IEC 11172-3 §2.4.1.3 + the MPEG-2/2.5 LSF
extension): the 32-bit frame header — sync, version id, layer, bitrate
index, sample-rate index, padding, channel mode — the per-layer frame
length arithmetic, samples-per-frame, free-format rejection, ID3v2
tag skipping (syncsafe size), and the Xing/Info VBR frame-count header.
:func:`mpeg_frames` walks a whole stream frame-by-frame and returns the
same stream-level metadata ffprobe would (rate, frame count, sample
count, duration, mean bitrate) WITHOUT decoding any audio.

What is gated: the subband/MDCT reconstruction itself.  Implementing
Layer II/III DSP needs the standard's 512-entry tabulated synthesis
window, which cannot be re-derived from first principles — shipping an
approximation would be a codec that only decodes its own files.  So
``decode`` raises ``NotImplementedError`` (→ quarantine), exactly like
VP9/HEVC/Vorbis elsewhere in the repo, while the metadata path stays
fully real on real-world files.

:func:`encode_mp3_gated` synthesizes structurally-valid CBR MPEG-1
Layer III streams (correct headers, correct frame lengths, deterministic
opaque payload) so tests and the probe rotation exercise the real walk.
"""

from __future__ import annotations

import struct

# bitrate tables, kbit/s, index 1..14 (0 = free format, 15 = forbidden)
_BITRATE = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    # MPEG-2 / 2.5 (LSF)
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_RATES = {3: (44100, 48000, 32000),      # version bits 11 = MPEG-1
          2: (22050, 24000, 16000),      # 10 = MPEG-2
          0: (11025, 12000, 8000)}       # 00 = MPEG-2.5


def parse_frame_header(hdr: int) -> dict:
    """One 32-bit header → dict(version, layer, bitrate, rate, padding,
    mode, frame_bytes, samples). Raises ValueError on anything invalid."""
    if (hdr >> 21) & 0x7FF != 0x7FF:
        raise ValueError("no frame sync")
    vbits = (hdr >> 19) & 0x3
    if vbits == 1:
        raise ValueError("reserved version id")
    lbits = (hdr >> 17) & 0x3
    if lbits == 0:
        raise ValueError("reserved layer")
    layer = 4 - lbits                     # bits 11/10/01 → layer 1/2/3
    bidx = (hdr >> 12) & 0xF
    if bidx == 0:
        raise ValueError("free-format bitrate unsupported")
    if bidx == 15:
        raise ValueError("forbidden bitrate index")
    ridx = (hdr >> 10) & 0x3
    if ridx == 3:
        raise ValueError("reserved sample-rate index")
    version = 1 if vbits == 3 else 2      # 2 covers MPEG-2 and 2.5
    rate = _RATES[vbits][ridx]
    bitrate = _BITRATE[(version, layer)][bidx - 1] * 1000
    padding = (hdr >> 9) & 1
    mode = (hdr >> 6) & 0x3
    if layer == 1:
        frame_bytes = (12 * bitrate // rate + padding) * 4
        samples = 384
    else:
        samples = 1152 if (layer == 2 or version == 1) else 576
        frame_bytes = samples // 8 * bitrate // rate + padding
    return {"version": version, "layer": layer, "bitrate": bitrate,
            "rate": rate, "padding": padding, "mode": mode,
            "frame_bytes": frame_bytes, "samples": samples}


def _skip_id3v2(buf: bytes) -> int:
    if buf[:3] != b"ID3" or len(buf) < 10:
        return 0
    sz = ((buf[6] & 0x7F) << 21) | ((buf[7] & 0x7F) << 14) \
        | ((buf[8] & 0x7F) << 7) | (buf[9] & 0x7F)
    return 10 + sz


def _xing_frames(buf: bytes, off: int, info: dict) -> int | None:
    """Frame count from a Xing/Info header in the first frame, if any."""
    if info["layer"] != 3:
        return None
    side = (17 if info["mode"] == 3 else 32) if info["version"] == 1 \
        else (9 if info["mode"] == 3 else 17)
    p = off + 4 + side
    if buf[p:p + 4] not in (b"Xing", b"Info"):
        return None
    flags = struct.unpack_from(">I", buf, p + 4)[0]
    if flags & 1:
        return struct.unpack_from(">I", buf, p + 8)[0]
    return None


def mpeg_frames(buf: bytes) -> dict:
    """Walk every frame: {rate, n_frames, n_samples, duration_sec,
    mean_bitrate, layer, version, vbr_frames}.  Strict: a malformed
    header mid-stream (not trailing garbage < 4 bytes) raises."""
    pos = _skip_id3v2(buf)
    n_frames = n_samples = bit_sum = 0
    rate = layer = version = None
    vbr = None
    first = True
    while pos + 4 <= len(buf):
        hdr = struct.unpack_from(">I", buf, pos)[0]
        info = parse_frame_header(hdr)
        if rate is None:
            rate, layer, version = info["rate"], info["layer"], info["version"]
        elif (info["rate"], info["layer"]) != (rate, layer):
            raise ValueError(f"stream parameters change at {pos}")
        if first:
            vbr = _xing_frames(buf, pos, info)
            first = False
        if pos + info["frame_bytes"] > len(buf):
            raise ValueError(f"truncated frame at {pos}")
        n_frames += 1
        n_samples += info["samples"]
        bit_sum += info["bitrate"]
        pos += info["frame_bytes"]
    if n_frames == 0:
        raise ValueError("no MPEG audio frames")
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes")
    return {"rate": rate, "layer": layer, "version": version,
            "n_frames": n_frames, "n_samples": n_samples,
            "duration_sec": n_samples / rate,
            "mean_bitrate": bit_sum // n_frames, "vbr_frames": vbr}


def decode_mpeg_audio(buf: bytes):
    """Honest DSP gate: framing validates, reconstruction does not ship."""
    info = mpeg_frames(buf)                # real walk first — malformed
    raise NotImplementedError(            # streams fail as ValueError
        f"MPEG-1 Layer {info['layer']} audio reconstruction (subband "
        "synthesis window) not implemented; plug ffmpeg/mad in to decode")


def encode_mp3_gated(seed: int, n_samples: int, rate: int = 32000,
                     bitrate_kbps: int = 64) -> bytes:
    """Structurally-valid CBR MPEG-1 Layer III mono stream: real headers
    and frame lengths, deterministic opaque payload (NOT decodable
    audio).  n_samples is rounded up to whole 1152-sample frames."""
    if rate not in (44100, 48000, 32000):
        raise ValueError("MPEG-1 rates only")
    ridx = (44100, 48000, 32000).index(rate)
    bidx = _BITRATE[(1, 3)].index(bitrate_kbps) + 1
    n_frames = max(1, -(-n_samples // 1152))
    out = bytearray()
    for k in range(n_frames):
        hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (bidx << 12) | (ridx << 10) | (3 << 6)   # mono, CRC-less
        info = parse_frame_header(hdr)
        out += struct.pack(">I", hdr)
        body = info["frame_bytes"] - 4
        x = (seed * 2654435761 + k * 2246822519) & 0xFFFFFFFF
        pat = bytes(((x >> (8 * (i % 4))) ^ (i * 37)) & 0xFF
                    for i in range(body))
        out += pat
    return bytes(out)
