"""Ogg container (RFC 3533) + FLAC-in-Ogg mapping: roundtrip parity,
CRC/corruption detection, cross-page packet continuation (a decoder path
the encoder never emits — hand-assembled), codec-gating of Vorbis/Opus
payloads, and the validate_audio pipeline over the 7-format rotation."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.synth.audio import gen_samples
from osm2geojson_spark.synth.ogg import (
    _page,
    decode_ogg_flac,
    encode_ogg_flac,
    ogg_crc,
    ogg_packets,
)


def test_roundtrip_bit_exact():
    for seed in (0, 7, 24, 99, 123):
        s = gen_samples(seed, 1600 + 160 * (seed % 50))
        out, rate = decode_ogg_flac(encode_ogg_flac(s))
        assert rate == 16_000
        assert np.array_equal(out, s)


def test_multi_page_and_eos():
    """>4 frames → multiple audio pages; last page flagged EOS and the
    final granule equals the sample count."""
    s = gen_samples(3, 20_000)                  # 5 frames of 4096
    buf = encode_ogg_flac(s)
    pages = []
    pos = 0
    while pos < len(buf):
        nseg = buf[pos + 26]
        body = sum(buf[pos + 27:pos + 27 + nseg])
        flags = buf[pos + 5]
        granule = struct.unpack_from("<q", buf, pos + 6)[0]
        pages.append((flags, granule))
        pos += 27 + nseg + body
    assert pages[0][0] == 0x02                  # BOS
    assert pages[-1][0] == 0x04                 # EOS
    assert pages[-1][1] == 20_000
    assert len(pages) >= 4                      # BOS + comment + 2 audio
    out, _ = decode_ogg_flac(buf)
    assert np.array_equal(out, s)


def test_crc_detects_corruption():
    buf = bytearray(encode_ogg_flac(gen_samples(5, 8000)))
    buf[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|capture|truncated"):
        decode_ogg_flac(bytes(buf))


def test_packet_spans_pages():
    """Hand-assembled: a packet whose tail continues onto the next page
    (lacing ends in 255; next page sets the continued flag) — the
    encoder never produces this, the reader must."""
    payload = bytes(range(256)) * 3             # 768 bytes
    head, tail = payload[:510], payload[510:]   # split at a 255 multiple
    # page 0: two full 255-lacing values, NO terminator (spans)
    hdr = bytearray(b"OggS\x00\x00")
    hdr += struct.pack("<q", -1) + struct.pack("<I", 9) + struct.pack("<I", 0)
    hdr += b"\x00" * 4 + bytes([2]) + b"\xff\xff"
    page0 = bytes(hdr) + head
    page0 = page0[:22] + struct.pack("<I", ogg_crc(page0)) + page0[26:]
    # page 1: continued flag, terminating lacing value
    page1 = _page(9, 1, 0, 0x01, [tail])
    pkts = ogg_packets(page0 + page1)
    assert pkts == [payload]


def test_codec_gate_vorbis_opus():
    for bos, name in ((b"\x01vorbis" + b"\x00" * 23, "vorbis"),
                      (b"OpusHead" + b"\x00" * 11, "opus")):
        stream = _page(7, 0, 0, 0x02, [bos])
        with pytest.raises(NotImplementedError, match=name):
            decode_ogg_flac(stream)


def test_validate_pipeline_seven_formats(spark):
    from osm2geojson_spark.operators.audio import validate_audio
    from osm2geojson_spark.synth.audio import AFMTS_OGG, audio_table

    aud = audio_table(spark, n=42, seed=24, fmts=AFMTS_OGG)
    v = validate_audio(aud).cache()
    rows = v.collect()
    assert {r["fmt"] for r in rows} == set(AFMTS_OGG)
    assert all(r["ok"] for r in rows), [r for r in rows if not r["ok"]][:3]
    v.unpersist()
