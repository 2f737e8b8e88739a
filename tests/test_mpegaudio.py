"""MPEG-1 Layer I subband decoder tests (operators/mpegaudio.py).

Independent encoder built from ISO 11172-3 §2.4.2 structure: header
assembly, optional CRC-16 over header bytes 2-3 + allocation bits,
allocation / scalefactor / 12x32 sample layout, slot padding to the
bitrate-derived frame length. The quantizer inverts the decoder's
requantization formula independently (encode: compress by
(2^nb-1)/2^nb, subtract the 2^(1-nb) offset, round, clamp to the
2^nb - 1 valid codes, re-invert the sign bit).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from youtube_api_data_etl_automation_spark.operators import (
    mpegaudio,
    multimodal,
)

_SF = [2.0 * 2.0 ** (-i / 3.0) for i in range(63)]


class _BW:
    def __init__(self):
        self.bits = []

    def put(self, v: int, n: int):
        self.bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    def to_bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        for i, b in enumerate(self.bits):
            acc = (acc << 1) | b
            if i % 8 == 7:
                out.append(acc)
                acc = 0
        if len(self.bits) % 8:
            out.append(acc << (8 - len(self.bits) % 8))
        return bytes(out)


def _crc16(bits):
    crc = 0xFFFF
    for b in bits:
        hi = (crc >> 15) & 1
        crc = (crc << 1) & 0xFFFF
        if hi ^ b:
            crc ^= 0x8005
    return crc


def _quantize(x: float, sf: float, nb: int) -> int:
    """Nearest valid Layer I code for sample x under scalefactor sf."""
    half = 1 << (nb - 1)
    s3 = (x / sf) * ((1 << nb) - 1) / (1 << nb) - 2.0 ** (1 - nb)
    c = round(s3 * half)
    c = max(-half, min(half - 2, c))
    return (c & ((1 << nb) - 1)) ^ half


def _pick_sf(maxabs: float) -> int:
    """Largest index (smallest scalefactor) that still covers maxabs."""
    for idx in range(62, -1, -1):
        if maxabs <= _SF[idx] * 0.95:
            return idx
    return 0


def _frame_l1(groups, *, rate=32000, bitrate=448, alloc_bands,
              mode=None, mode_ext=0, protected=False, padding=0,
              sf_override=None, code_override=None):
    """One Layer I frame from ``groups`` shaped (12, nch, 32)."""
    groups = np.asarray(groups, dtype=np.float64)
    _, nch, _ = groups.shape
    if mode is None:
        mode = 3 if nch == 1 else 0
    bound = (mode_ext + 1) * 4 if mode == 1 else 32
    rate_idx = {44100: 0, 48000: 1, 32000: 2}[rate]
    br_idx = mpegaudio._L1_BITRATES.index(bitrate) + 1

    b2 = 0xE0 | (3 << 3) | (3 << 1) | (0 if protected else 1)
    b3 = (br_idx << 4) | (rate_idx << 2) | (padding << 1)
    b4 = (mode << 6) | (mode_ext << 4)
    header = bytes([0xFF, b2, b3, b4])

    # scalefactor indices per channel/band
    sf_idx = [[0] * 32 for _ in range(nch)]
    for ch in range(nch):
        for sb in range(32):
            if alloc_bands[sb]:
                sf_idx[ch][sb] = _pick_sf(float(np.abs(
                    groups[:, ch, sb]).max()))
    if sf_override:
        for (ch, sb), idx in sf_override.items():
            sf_idx[ch][sb] = idx

    alloc_bw = _BW()
    for sb in range(bound):
        for _ch in range(nch):
            alloc_bw.put(alloc_bands[sb], 4)
    for sb in range(bound, 32):
        alloc_bw.put(alloc_bands[sb], 4)

    body = _BW()
    body.bits.extend(alloc_bw.bits)
    for sb in range(32):
        for ch in range(nch):
            if alloc_bands[sb]:
                body.put(sf_idx[ch][sb], 6)
    for s in range(12):
        for sb in range(32):
            a = alloc_bands[sb]
            if not a:
                continue
            nb = a + 1
            if sb < bound:
                for ch in range(nch):
                    code = _quantize(float(groups[s, ch, sb]),
                                     _SF[sf_idx[ch][sb]], nb)
                    body.put(code, nb)
            else:
                if code_override and (s, sb) in code_override:
                    code = code_override[(s, sb)]
                else:
                    code = _quantize(float(groups[s, 0, sb]),
                                     _SF[sf_idx[0][sb]], nb)
                body.put(code, nb)

    slots = 12 * bitrate * 1000 // rate + padding
    frame_len = slots * 4
    parts = [header]
    if protected:
        crc_bits = []
        for byte in header[2:4]:
            crc_bits.extend((byte >> (7 - i)) & 1 for i in range(8))
        crc_bits.extend(alloc_bw.bits)
        parts.append(_crc16(crc_bits).to_bytes(2, "big"))
    payload_bits = body.to_bytes()
    parts.append(payload_bits)
    raw = b"".join(parts)
    assert len(raw) <= frame_len, (
        f"frame body {len(raw)} exceeds {frame_len} bytes — lower the "
        "allocations or raise the bitrate"
    )
    return raw + b"\x00" * (frame_len - len(raw)), sf_idx


def _sine_groups(n_groups, nch, alloc_bands, seed=0):
    rng = np.random.default_rng(seed)
    g = np.zeros((n_groups, nch, 32))
    for sb in range(32):
        if alloc_bands[sb]:
            amp = 0.5 / (1 + sb % 5)
            for ch in range(nch):
                phase = rng.uniform(0, math.tau)
                g[:, ch, sb] = amp * np.sin(
                    np.arange(n_groups) / (2.0 + sb / 7.0) + phase)
    return g


_ALLOC_MIX = [8, 8, 7, 7, 6, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1,
              3, 0, 2, 0, 1, 0, 2, 0, 1, 1, 0, 0, 1, 0, 0, 1]


def test_requantize_exact_values():
    # hand-computed from s'' = 2^nb/(2^nb-1) * (s''' + 2^(1-nb)):
    # nb=2, code 0 -> c'=-2 -> s'''=-1 -> 4/3*(-1+0.5) = -2/3
    assert mpegaudio._requantize(0, 2, 1.0) == pytest.approx(-2 / 3)
    # nb=2, code 2 -> c'=0 -> s'''=0 -> 4/3*(0.5) = 2/3
    assert mpegaudio._requantize(2, 2, 1.0) == pytest.approx(2 / 3)
    # nb=2, code 1 -> c'=-1 -> s'''=-0.5 -> 4/3*0 = 0 (midtread zero)
    assert mpegaudio._requantize(1, 2, 1.0) == 0.0
    # nb=3, code 5 -> c'=1 -> s'''=0.25 -> 8/7*(0.25+0.25) = 4/7
    assert mpegaudio._requantize(5, 3, 1.0) == pytest.approx(4 / 7)
    # scalefactor scales linearly
    assert mpegaudio._requantize(5, 3, 0.5) == pytest.approx(2 / 7)
    # symmetric range at the extreme used codes
    lo = mpegaudio._requantize(0, 4, 1.0)
    hi = mpegaudio._requantize(0b1110, 4, 1.0)
    assert lo == pytest.approx(-hi) and hi == pytest.approx(14 / 15)


def test_roundtrip_mono():
    g = _sine_groups(12, 1, _ALLOC_MIX, seed=1)
    payload, sf_idx = _frame_l1(g, alloc_bands=_ALLOC_MIX)
    rate, out = mpegaudio.decode_layer1(payload)
    assert rate == 32000 and out.shape == (12, 1, 32)
    for sb in range(32):
        a = _ALLOC_MIX[sb]
        if not a:
            assert (out[:, 0, sb] == 0).all()
            continue
        step = _SF[sf_idx[0][sb]] * 2.0 ** (1 - (a + 1)) \
            * (1 << (a + 1)) / ((1 << (a + 1)) - 1)
        err = np.abs(out[:, 0, sb] - g[:, 0, sb]).max()
        assert err <= step * 0.5001 + 1e-12, (sb, err, step)


def test_roundtrip_stereo_multiframe_and_padding():
    g = _sine_groups(36, 2, _ALLOC_MIX, seed=2)
    frames = []
    for i in range(3):
        payload, _ = _frame_l1(g[i * 12 : (i + 1) * 12],
                               alloc_bands=_ALLOC_MIX,
                               padding=1 if i == 1 else 0)
        frames.append(payload)
    rate, out = mpegaudio.decode_layer1(b"".join(frames))
    assert out.shape == (36, 2, 32)
    mask = np.array([a > 0 for a in _ALLOC_MIX])
    got = out[:, :, mask]
    want = g[:, :, mask]
    assert np.abs(got - want).max() < 0.25  # coarse 2-bit bands dominate
    fine = [sb for sb in range(8) if _ALLOC_MIX[sb] >= 6]
    assert np.abs(out[:, :, fine] - g[:, :, fine]).max() < 0.01


def test_intensity_joint_per_channel_scalefactors():
    """mode 1: one shared code stream above the bound, but per-channel
    scalefactors — the decoder output ratio equals the sf ratio."""
    alloc = [0] * 32
    alloc[8] = 7  # shared band (bound=4 at mode_ext=0)
    g = np.zeros((12, 2, 32))
    g[:, 0, 8] = 0.4 * np.sin(np.arange(12) / 2.0)
    g[:, 1, 8] = g[:, 0, 8]
    payload, _ = _frame_l1(
        g, alloc_bands=alloc, mode=1, mode_ext=0,
        sf_override={(0, 8): 4, (1, 8): 10},
    )
    rate, out = mpegaudio.decode_layer1(payload)
    nz = np.abs(out[:, 0, 8]) > 1e-9
    assert nz.any()
    ratio = out[nz, 1, 8] / out[nz, 0, 8]
    assert ratio == pytest.approx(_SF[10] / _SF[4])


def test_crc_protected_and_mismatch():
    g = _sine_groups(12, 1, _ALLOC_MIX, seed=3)
    payload, _ = _frame_l1(g, alloc_bands=_ALLOC_MIX, protected=True)
    rate, out = mpegaudio.decode_layer1(payload)
    assert out.shape == (12, 1, 32)
    bad = bytearray(payload)
    bad[7] ^= 0x10  # an allocation bit inside the protected region
    with pytest.raises(ValueError, match="CRC-16"):
        mpegaudio.decode_layer1(bytes(bad))


def test_id3v2_skip_and_trailing_id3v1():
    g = _sine_groups(12, 1, _ALLOC_MIX, seed=4)
    frame, _ = _frame_l1(g, alloc_bands=_ALLOC_MIX)
    id3v2 = b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    id3v1 = b"TAG" + b"\x00" * 125
    rate, out = mpegaudio.decode_layer1(id3v2 + frame + id3v1)
    assert out.shape == (12, 1, 32)


def test_refusals():
    g = _sine_groups(12, 1, _ALLOC_MIX, seed=5)
    good, _ = _frame_l1(g, alloc_bands=_ALLOC_MIX)
    # Layer III / II / reserved
    for layer_code, match in ((1, "Layer III"), (2, "Layer II")):
        hdr = bytearray(good[:4])
        hdr[1] = 0xE0 | (3 << 3) | (layer_code << 1) | 1
        with pytest.raises(NotImplementedError, match=match):
            mpegaudio.decode_layer1(bytes(hdr) + good[4:])
    hdr = bytearray(good[:4])
    hdr[1] = 0xE0 | (3 << 3) | (0 << 1) | 1
    with pytest.raises(ValueError, match="reserved layer"):
        mpegaudio.decode_layer1(bytes(hdr) + good[4:])
    # MPEG-2 version bits
    hdr = bytearray(good)
    hdr[1] = 0xE0 | (2 << 3) | (3 << 1) | 1
    with pytest.raises(NotImplementedError, match="MPEG-2"):
        mpegaudio.decode_layer1(bytes(hdr))
    # free format
    hdr = bytearray(good)
    hdr[2] = hdr[2] & 0x0F
    with pytest.raises(NotImplementedError, match="free-format"):
        mpegaudio.decode_layer1(bytes(hdr))
    # forbidden allocation 15: craft first alloc nibble = 1111
    hdr = bytearray(good)
    hdr[4] |= 0xF0
    with pytest.raises(ValueError, match="allocation 15"):
        mpegaudio.decode_layer1(bytes(hdr))
    # truncation mid-frame
    with pytest.raises(ValueError, match="truncated frame|exhausted"):
        mpegaudio.decode_layer1(good[:-40])
    with pytest.raises(ValueError, match="no frame header|frame sync"):
        mpegaudio.decode_layer1(b"\x00\x11\x22\x33")
    with pytest.raises(NotImplementedError, match="sample budget"):
        mpegaudio.decode_layer1(good, sample_budget=100)
    with pytest.raises(NotImplementedError, match="Table 3-B.3"):
        mpegaudio.synthesize_pcm(np.zeros((12, 1, 32)))


def test_forbidden_scalefactor():
    alloc = [2] + [0] * 31
    g = np.zeros((12, 1, 32))
    payload, _ = _frame_l1(g, alloc_bands=alloc,
                           sf_override={(0, 0): 62})
    # patch the 6 scalefactor bits (right after 32 alloc nibbles =
    # 128 bits, i.e. bytes 20..20): set idx 63
    bad = bytearray(payload)
    bad[20] |= 0xFC
    with pytest.raises(ValueError, match="scalefactor 63"):
        mpegaudio.decode_layer1(bytes(bad))


def test_audio_subband_features_operator(spark):
    g = _sine_groups(24, 2, _ALLOC_MIX, seed=6)
    f1, _ = _frame_l1(g[:12], alloc_bands=_ALLOC_MIX)
    f2, _ = _frame_l1(g[12:], alloc_bands=_ALLOC_MIX)
    payload = f1 + f2
    layer3ish = b"\xff\xfb\x90\x00" + b"\x00" * 96
    rows = [
        (1, bytearray(payload)),
        (2, bytearray(layer3ish)),
        (3, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.audio_subband_features(
        df, errors="quarantine").collect()}
    r1 = out[1]
    assert r1["format"] == "mp3-layer1"
    assert (r1["sample_rate"], r1["n_channels"]) == (32000, 2)
    assert r1["n_mpeg_frames"] == 2
    assert r1["duration_sec"] == pytest.approx(2 * 384 / 32000)
    rate, sb = mpegaudio.decode_layer1(payload)
    assert r1["sb_rms"] == pytest.approx(
        float(np.sqrt(np.square(sb).mean())))
    assert r1["sb_peak"] == pytest.approx(float(np.abs(sb).max()))
    e = np.square(sb).sum(axis=(0, 1))
    assert r1["sb_centroid"] == pytest.approx(
        float((e * np.arange(32)).sum() / e.sum()))
    assert out[2]["error_kind"] == "unsupported"
    assert out[3]["error_kind"] == "corrupt"


def test_synthesize_pcm_structure():
    """The filterbank STRUCTURE with a caller-supplied window: a delta
    window isolates single FIFO taps, making the expected output a
    direct cosine-matrix evaluation (independent of the implementation's
    V/U bookkeeping)."""
    rng = np.random.default_rng(13)
    sb = rng.uniform(-1, 1, size=(3, 1, 32))
    # refusal without the table
    with pytest.raises(NotImplementedError, match="Table 3-B.3"):
        mpegaudio.synthesize_pcm(sb)
    with pytest.raises(ValueError, match="512"):
        mpegaudio.synthesize_pcm(sb, window=np.ones(100))
    with pytest.raises(ValueError, match="groups, channels"):
        mpegaudio.synthesize_pcm(np.zeros((3, 32)), window=np.ones(512))
    # delta window at index 0: out[0] of group g = V[0] right after
    # the matrixing = sum_k cos(16*(2k+1)*pi/64) * S_g[k]; all other
    # output samples zero
    d0 = np.zeros(512)
    d0[0] = 1.0
    out = mpegaudio.synthesize_pcm(sb, window=d0)
    assert out.shape == (96, 1)
    for g in range(3):
        want = sum(
            math.cos(16 * (2 * k + 1) * math.pi / 64) * sb[g, 0, k]
            for k in range(32)
        )
        assert out[g * 32, 0] == pytest.approx(want)
        assert np.abs(out[g * 32 + 1 : (g + 1) * 32, 0]).max() < 1e-12
    # delta window at index 64 reads the 128-offset FIFO block: group
    # g's output sees group g-1's matrixed V (the 64-shift x2 history)
    d64 = np.zeros(512)
    d64[64] = 1.0
    out = mpegaudio.synthesize_pcm(sb, window=d64)
    for g in range(1, 3):
        want = sum(
            math.cos((16 + 0) * (2 * k + 1) * math.pi / 64)
            * sb[g - 2, 0, k] for k in range(32)
        ) if g >= 2 else None
        # V[128] after g shifts holds the matrixing output V[0] from
        # two groups ago
        if g >= 2:
            assert out[g * 32, 0] == pytest.approx(want)
    assert np.abs(out[:32, 0]).max() < 1e-12  # no history yet


def test_triage_decode_audio_routes(spark):
    """The audio triage router: probe first, decode only in-budget
    decodable formats; Layer I goes to the subband path."""
    import sys
    sys.path.insert(0, "tests")
    from test_flac import _flac, _wave
    from test_operators import _wav

    from youtube_api_data_etl_automation_spark.operators import mediameta

    g = _sine_groups(12, 1, _ALLOC_MIX, seed=21)
    l1, _ = _frame_l1(g, alloc_bands=_ALLOC_MIX)
    wav = _wav(8000, [(int(900 * math.sin(i / 3.0)),) for i in range(32)])
    flac_payload = _flac([_wave(24, 700)],
                         sub_kw={"kind": "fixed", "order": 1})
    layer3 = b"\xff\xfb\x90\x00" + b"\x00" * 96
    rows = [
        (1, bytearray(wav)),
        (2, bytearray(flac_payload)),
        (3, bytearray(l1)),
        (4, bytearray(layer3)),
        (5, bytearray(b"nonsense")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in mediameta.triage_decode_audio(
        df).collect()}
    assert out[1]["route"] == "decoded" and out[1]["format"] == "wav"
    assert out[1]["n_frames"] == 32
    assert out[2]["route"] == "decoded" and out[2]["format"] == "flac"
    assert out[2]["n_frames"] == 24
    r3 = out[3]
    assert r3["route"] == "subband" and r3["format"] == "mp3-layer1"
    assert r3["n_frames"] == 1 and r3["sample_rate"] == 32000
    rate, sb = mpegaudio.decode_layer1(l1)
    assert r3["rms"] == pytest.approx(
        float(np.sqrt(np.square(sb).mean())))
    assert out[4]["route"] == "undecodable"
    assert out[4]["error_kind"] == "unsupported"
    assert out[5]["route"] == "probe_failed"
    # unknown container = 'unsupported' (a codec library may read it),
    # matching _parse_audio_meta's routing
    assert out[5]["error_kind"] == "unsupported"
    # budget: probe-declared duration routes out without decoding
    tiny = mediameta.triage_decode_audio(
        spark.createDataFrame([(9, bytearray(wav))],
                              "doc_id long, payload binary"),
        max_samples=8).collect()[0]
    assert tiny["route"] == "oversized"
    assert tiny["error_kind"] == "unsupported"
